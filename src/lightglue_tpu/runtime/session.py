"""Single-host inference session: bucketed compile cache + end-to-end match.

The TPU analog of the reference's L3/L4 machinery (SURVEY.md §1): where the
reference exports ONNX, builds TRT engines per precision, records a CUDA
graph at the 1024-kpt max shape and replays it after SetInputShape
(demo/demo_mono.cpp:85-140, demo/lightglue_trt.cpp:347-370), this session
jit-compiles one XLA executable per (keypoint-bucket0, keypoint-bucket1)
combination and dispatches each pair to the smallest bucket that fits —
executable replay *is* graph replay, with correct shapes instead of
replaying an oversized graph and relying on pad masking.

Everything between image tensor in and match table out runs device-side;
the only host round-trip is reading the keypoint counts to pick a bucket
(the analog of the reference's SetInputShape with actual counts,
demo/demo_mono.cpp:255-266).
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lightglue_tpu.config import PipelineConfig
from lightglue_tpu.models import lightglue, superpoint
from lightglue_tpu.pipeline.extract import Extraction, extract_keypoints
from lightglue_tpu.pipeline.match import Matches, filter_matches
from lightglue_tpu.precision import policy_for
from lightglue_tpu.runtime import weights as weights_lib
from lightglue_tpu.utils.logging import ErrorRecorder, get_logger

_log = get_logger("session")


class MatcherSession:
    """Holds device-resident weights and per-shape compiled executables."""

    def __init__(
        self,
        sp_params=None,
        lg_params=None,
        config: PipelineConfig = PipelineConfig(),
        seed: int = 0,
        compile_cache_dir: Optional[str] = "~/.cache/lightglue_tpu/xla",
    ):
        self.config = config
        self.policy = policy_for(config.precision)
        if compile_cache_dir:  # engine-file analog: warm starts skip compiles
            try:
                from lightglue_tpu.runtime.aot import enable_compile_cache

                enable_compile_cache(
                    str(Path(compile_cache_dir).expanduser())
                )
            except Exception as e:  # cache is an optimization, never fatal
                _log.warning("compile cache disabled: %s", e)
        sp_params = (
            weights_lib.init_superpoint(seed, config.superpoint)
            if sp_params is None
            else sp_params
        )
        lg_params = (
            weights_lib.init_lightglue(seed, config.lightglue)
            if lg_params is None
            else lg_params
        )
        # SuperPoint runs in the activation dtype but keeps fp32 master
        # weights (cast at trace time); LightGlue weights are cast once —
        # or quantized to int8 with fp32 per-channel scales on the INT8 rung.
        self.sp_params = weights_lib.to_jax(sp_params)
        if self.policy.int8_weights:
            from lightglue_tpu.quant import quantize_lightglue

            self.lg_params = weights_lib.to_jax(quantize_lightglue(lg_params))
        else:
            self.lg_params = weights_lib.to_jax(
                lg_params, self.policy.param_dtype
            )
        self._extract_cache: Dict[Tuple[int, int, int], jax.stages.Wrapped] = {}
        self._match_cache: Dict[Tuple[int, int], jax.stages.Wrapped] = {}
        # aggregates input-validation failures so a caller sees every
        # problem with a bad batch at once (the IErrorRecorder pattern the
        # reference vendors but never wires up — we do)
        self.errors = ErrorRecorder()

    # -- extraction ---------------------------------------------------------

    def _extract_fn(self, batch: int, h: int, w: int):
        key = (batch, h, w)
        if key not in self._extract_cache:
            _log.info("compiling extract executable batch=%d %dx%d", batch, h, w)
            config, policy = self.config, self.policy

            @jax.jit
            def run(sp_params, images):
                # nms=False + raw_scores: NMS/border/tile-candidates run
                # fused in one Pallas kernel (kernels/nms.nms_candidates)
                scores, desc = superpoint.forward(
                    sp_params, images, config=config.superpoint,
                    policy=policy, nms=False,
                )
                return extract_keypoints(
                    scores, desc, config=config.superpoint, raw_scores=True
                )

            self._extract_cache[key] = run
        return self._extract_cache[key]

    def extract(self, images: np.ndarray) -> Extraction:
        """images: (B, H, W, 1) float32 in [0,1], H/W multiples of 8."""
        self.errors.clear()  # per-call aggregation
        if images.ndim != 4 or images.shape[-1] != 1:
            self.errors.record(
                f"expected (B, H, W, 1) grayscale batch, got {images.shape}"
            )
        else:
            h, w = images.shape[1:3]
            if h % 8 or w % 8:
                self.errors.record(
                    f"H/W must be multiples of the stride-8 encoder, got "
                    f"{h}x{w} (pad with utils.image.pad_to_multiple)"
                )
            if images.dtype != np.float32:
                self.errors.record(
                    f"expected float32 in [0, 1], got {images.dtype}"
                )
        self.errors.raise_if_any("invalid extraction input", exc=ValueError)
        b, h, w, _ = images.shape
        return self._extract_fn(b, h, w)(self.sp_params, jnp.asarray(images))

    # -- matching -----------------------------------------------------------

    def _match_fn(self, bucket0: int, bucket1: int, full: bool = False):
        """``full=True`` compiles the unmasked variant for batches where every
        pair fills its bucket exactly — no pad keypoints exist, so all
        masking work is skipped (the analog of the reference plugin skipping
        pad/unpad when N %% 64 == 0, lightglue_attention_plugin.cpp:196-199).
        """
        config, policy = self.config, self.policy
        adaptive = (
            config.lightglue.depth_confidence > 0
            or config.lightglue.width_confidence > 0
        )
        # depth-only adaptive has a genuine unmasked (full-bucket) variant
        # (r5: forward_adaptive(full=True) skips the no-op masking wheres,
        # ~5% of the step). Width pruning masks via the keep rows
        # regardless, so full stays normalized out there to avoid a second
        # identical (and remotely slow) compile. For adaptive, full is
        # also restricted to the CAP bucket — the only variant warmup
        # compiles; a rarely-full smaller bucket would otherwise stall a
        # serving batch on a remote compile to save ~5% on one dispatch.
        width = config.lightglue.width_confidence > 0
        adaptive_cap_full = (
            bucket0 == bucket1 == max(config.buckets)
            if (adaptive and not width)
            else True
        )
        full = full and not width and adaptive_cap_full
        key = (bucket0, bucket1, full)
        if key not in self._match_cache:
            _log.info(
                "compiling match executable buckets=%dx%d full=%s",
                bucket0, bucket1, full,
            )
            k = min(config.max_matches, bucket0)

            @jax.jit
            def run(lg_params, kpts0, kpts1, desc0, desc1, lengths0, lengths1):
                if full and not adaptive:
                    lengths0 = lengths1 = None
                if adaptive:
                    out = lightglue.forward_adaptive(
                        lg_params,
                        kpts0,
                        kpts1,
                        desc0,
                        desc1,
                        lengths0,
                        lengths1,
                        config=config.lightglue,
                        policy=policy,
                        full=full,
                    )
                else:
                    out = lightglue.forward(
                        lg_params,
                        kpts0,
                        kpts1,
                        desc0,
                        desc1,
                        lengths0,
                        lengths1,
                        config=config.lightglue,
                        policy=policy,
                    )
                matches = filter_matches(
                    out.scores,
                    threshold=config.match_threshold,
                    max_matches=k,
                )
                if adaptive:
                    # match rows/cols live in compacted (pruned) slots; map
                    # them back to original keypoint indices device-side
                    rows = jnp.clip(matches.indices[..., 0], 0)
                    cols = jnp.clip(matches.indices[..., 1], 0)
                    orig0 = jnp.take_along_axis(out.index0, rows, axis=1)
                    orig1 = jnp.take_along_axis(out.index1, cols, axis=1)
                    indices = jnp.where(
                        matches.mask[..., None],
                        jnp.stack([orig0, orig1], axis=-1),
                        -1,
                    )
                    matches = Matches(
                        indices, matches.scores, matches.mask, matches.count
                    )
                return out, matches

            self._match_cache[key] = run
        return self._match_cache[key]

    def match_from_extractions(
        self, ext0: Extraction, ext1: Extraction
    ) -> Tuple[lightglue.LightGlueOutput, Matches]:
        """Bucket, pad-slice and run LightGlue on already-extracted features.

        Extraction outputs are score-descending, so truncating to the bucket
        keeps the strongest keypoints — the same policy as the reference's
        top-k 1024 cap (export_onnx_with_plugin.py:121-123).
        """
        # exactly TWO device->host fetches (each round trip through the
        # relay costs ~27 ms — more than the match dispatch itself); all
        # derived host values come from these arrays
        c0 = np.asarray(ext0.count)
        c1 = np.asarray(ext1.count)
        b0 = self.config.bucket_for(max(int(c0.max()), 1))
        b1 = self.config.bucket_for(max(int(c1.max()), 1))
        lengths0 = jnp.minimum(ext0.count, b0)
        lengths1 = jnp.minimum(ext1.count, b1)
        # every pair fills its bucket -> dispatch the unmasked executable
        full = bool((c0 >= b0).all() and (c1 >= b1).all())
        fn = self._match_fn(b0, b1, full)
        return fn(
            self.lg_params,
            ext0.keypoints_norm[:, :b0],
            ext1.keypoints_norm[:, :b1],
            ext0.descriptors[:, :b0],
            ext1.descriptors[:, :b1],
            lengths0,
            lengths1,
        )

    # -- end-to-end ---------------------------------------------------------

    def match_pair(
        self,
        image0: np.ndarray,
        image1: np.ndarray,
        scales0: Optional[Tuple[float, float]] = None,
        scales1: Optional[Tuple[float, float]] = None,
    ) -> Dict:
        """Full pipeline on one image pair; returns host-side numpy results.

        image0/image1: (H, W, 1) float32 grayscale in [0, 1]. When the
        images share a shape, both run through ONE batched SuperPoint call.
        scales0/scales1: optional (sx, sy) resize scales; matched keypoint
        coordinates are mapped back to the original resolution like the
        reference (utils.py:95-99: (k + 0.5) / scale - 0.5).
        """
        if image0.shape == image1.shape:
            ext = self.extract(np.stack([image0, image1]))
            ext0 = jax.tree.map(lambda a: a[0:1], ext)
            ext1 = jax.tree.map(lambda a: a[1:2], ext)
        else:
            ext0 = self.extract(image0[None])
            ext1 = self.extract(image1[None])
        out, matches = self.match_from_extractions(ext0, ext1)
        count = int(matches.count[0])
        idx = np.asarray(matches.indices[0, :count])
        kpts0 = np.asarray(ext0.keypoints[0])
        kpts1 = np.asarray(ext1.keypoints[0])
        if scales0 is not None:
            kpts0 = (kpts0 + 0.5) / np.asarray(scales0, np.float32) - 0.5
        if scales1 is not None:
            kpts1 = (kpts1 + 0.5) / np.asarray(scales1, np.float32) - 0.5
        return {
            "keypoints0": kpts0,
            "keypoints1": kpts1,
            "num_keypoints0": int(ext0.count[0]),
            "num_keypoints1": int(ext1.count[0]),
            "matches": idx,
            "match_scores": np.asarray(matches.scores[0, :count]),
            "matched_kpts0": kpts0[idx[:, 0]] if count else np.zeros((0, 2)),
            "matched_kpts1": kpts1[idx[:, 1]] if count else np.zeros((0, 2)),
            "scores": np.asarray(out.scores[0]),
        }

    def match_batch(
        self, images0: np.ndarray, images1: np.ndarray
    ) -> List[Dict]:
        """Batched full pipeline over B pairs of same-shape images.

        All B pairs run through one SuperPoint call (2B images stacked) and
        one bucketed LightGlue call; the bucket is chosen by the largest
        keypoint count in the batch (continuous cross-pair batching with
        ragged counts handled by per-pair lengths).
        """
        b = images0.shape[0]
        ext = self.extract(np.concatenate([images0, images1], axis=0))
        ext0 = jax.tree.map(lambda a: a[:b], ext)
        ext1 = jax.tree.map(lambda a: a[b:], ext)
        out, matches = self.match_from_extractions(ext0, ext1)
        counts = np.asarray(matches.count)
        indices = np.asarray(matches.indices)
        scores = np.asarray(matches.scores)
        k0 = np.asarray(ext0.keypoints)
        k1 = np.asarray(ext1.keypoints)
        results = []
        for i in range(b):
            c = int(counts[i])
            idx = indices[i, :c]
            results.append(
                {
                    "keypoints0": k0[i],
                    "keypoints1": k1[i],
                    "num_keypoints0": int(ext0.count[i]),
                    "num_keypoints1": int(ext1.count[i]),
                    "matches": idx,
                    "match_scores": scores[i, :c],
                    "matched_kpts0": k0[i][idx[:, 0]] if c else np.zeros((0, 2)),
                    "matched_kpts1": k1[i][idx[:, 1]] if c else np.zeros((0, 2)),
                }
            )
        return results

    # -- warmup (the analog of engine build + CUDA-graph record) ------------

    def warmup(
        self,
        image_hw: Tuple[int, int],
        batch: int = 1,
        pairs=None,
    ) -> None:
        """Compile the extract executable plus match executables ahead of
        serving (the analog of engine build + CUDA-graph record).

        ``pairs``: iterable of (bucket0, bucket1) to warm. Default: the
        diagonal only — with the 128-step bucket ladder the full cross
        product is len(buckets)^2 executables (49 remote compiles), while
        mixed-bucket combinations are rare, lazily compiled on first
        dispatch, and persistently cached (runtime/aot.py). Pass "all" for
        the full product.

        The LARGEST bucket also warms its full=True (unmasked) variant:
        that is the dispatch for cap-full pairs — the common case on
        texture-rich frames — and leaving it lazy cost the demo's first
        pair a ~50 s compile through the relay
        (golden/demo_mono_r4_console.txt pair 0).
        """
        h, w = image_hw
        dummy = np.zeros((batch, h, w, 1), np.float32)
        self.extract(dummy)
        if pairs is None:
            pairs = [(b, b) for b in self.config.buckets]
        elif pairs == "all":
            pairs = [
                (b0, b1)
                for b0 in self.config.buckets
                for b1 in self.config.buckets
            ]
        pairs = list(pairs)
        cap = max(self.config.buckets)
        variants = [(b0, b1, False) for b0, b1 in pairs]
        if (cap, cap) in pairs:
            variants.append((cap, cap, True))
        for b0, b1, full in variants:
            fn = self._match_fn(b0, b1, full=full)
            fn(
                self.lg_params,
                jnp.zeros((batch, b0, 2), jnp.float32),
                jnp.zeros((batch, b1, 2), jnp.float32),
                jnp.zeros((batch, b0, 256), jnp.float32),
                jnp.zeros((batch, b1, 256), jnp.float32),
                jnp.full((batch,), b0, jnp.int32),
                jnp.full((batch,), b1, jnp.int32),
            )
