"""Benchmark harness — the trtexec analog (SURVEY.md §4.3, §6).

Headline metric: LightGlue full match step (9 layers + assignment + match
filter) at the reference's profile shape, batch 1 x 1024 x 1024 keypoints,
bf16 — against the TRT fp16-with-plugin engine's 41.08 ms mean latency on
Jetson Orin (BASELINE.md). Prints ONE JSON line; extra metrics are nested
under "extra".

Methodology: per-call host timing through the remote TPU relay is unreliable
(async dispatch hides device time, and every dispatch+fetch pays a ~27 ms
fixed relay round-trip), so each measurement runs the step inside one jitted
lax.scan with a real data dependency between iterations (carry feeds back a
scalar at 1e-30 scale: exact in bf16/fp32 rounding yet unhoistable), fetches
the result, and uses a TWO-POINT estimate — (T(ITERS_HI) - T(ITERS_LO)) /
(ITERS_HI - ITERS_LO) — which cancels the fixed dispatch cost exactly. This
is the same accounting trtexec's --useCudaGraph mode gives the reference.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

SRC = Path(__file__).resolve().parent / "src"
if str(SRC) not in sys.path:
    sys.path.insert(0, str(SRC))

import jax

# Persistent compile cache: repeated bench runs (and driver rounds) skip the
# slow remote compiles — the engine-file behavior of the reference's workflow.
try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from lightglue_tpu.config import PipelineConfig
from lightglue_tpu.models import lightglue, superpoint
from lightglue_tpu.pipeline.extract import extract_keypoints
from lightglue_tpu.pipeline.match import filter_matches
from lightglue_tpu.precision import Precision, policy_for
from lightglue_tpu.runtime import weights

BASELINE_LG_FP16_MS = 41.08  # trt_engine_files/...with_plugin.fp16...txt:30443
BASELINE_SP_FP32_MS = 26.50  # trt_engine_files/superpoint...fp32...txt:5771
ITERS_LO = 25
ITERS_HI = 125
REPEATS = 5


def _run_once(fn, args):
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # force completion through the relay
    return time.perf_counter() - t0


def _timed(make_fn, *args, iters_lo=None, iters_hi=None, repeats=None):
    """Interleaved two-point estimates with error bars.

    REPEATS reps each measure a (T_lo, T_hi) pair back to back and yield one
    per-iteration estimate (T_hi - T_lo) / (ITERS_HI - ITERS_LO); the pairs
    are interleaved so slow drift of the relay hits both points of a rep
    equally (the r3 A/B methodology, golden/chip_r03/
    cross_transposed_definitive.txt, promoted into the bench). Returns
    {p50, min, spread_pct, reps}: p50 = median of REPEATS (5) estimates;
    spread_pct is computed on the TRIMMED set (min and max rep dropped), so
    one relay hiccup cannot blow the stat up — r4's bench2.out recorded
    spread_pct 1421.5 from a single bad rep over 3, making the column
    uninterpretable exactly when needed (VERDICT r4 weak #4 / next #7). Raw
    reps are kept in the artifact for audit; a row where even the trimmed
    spread exceeds 25% is flagged outlier_contaminated rather than trusted.

    Reading the raw reps: a relay hiccup during the LO point shrinks
    T_hi - T_lo and yields an implausibly FAST rep (e.g. a 1.0 ms e2e rep
    against a 2.96 ms p50); a hiccup on the HI point yields a slow one.
    Both directions are artifacts of the differencing, not real variance —
    which is exactly why p50 + min/max trimming, not mean, aggregates."""
    ilo = ITERS_LO if iters_lo is None else iters_lo
    ihi = ITERS_HI if iters_hi is None else iters_hi
    reps = REPEATS if repeats is None else repeats
    fn_lo, fn_hi = make_fn(ilo), make_fn(ihi)
    _run_once(fn_lo, args)  # compile + warmup both cache entries
    _run_once(fn_hi, args)
    est = []
    for _ in range(reps):
        t_lo = _run_once(fn_lo, args)
        t_hi = _run_once(fn_hi, args)
        est.append(max(t_hi - t_lo, 1e-9) / (ihi - ilo) * 1e3)
    p50 = float(np.median(est))
    trimmed = sorted(est)[1:-1] if len(est) >= 3 else sorted(est)
    spread = (max(trimmed) - min(trimmed)) / p50 * 100.0
    out = {
        "p50": round(p50, 3),
        "min": round(min(est), 3),
        "spread_pct": round(spread, 1),
        "reps": [round(e, 3) for e in est],
    }
    if spread > 25.0:
        out["outlier_contaminated"] = True
    return out


def _per_pair(res: dict, batch: int) -> dict:
    """Scale a _timed record to per-pair numbers; ratio/flag/rep fields are
    passed through or scaled element-wise (the r5 reps list must not be
    divided as a list — that TypeError cost bench_final.2 its tail)."""
    out = {}
    for k, v in res.items():
        if k in ("spread_pct", "outlier_contaminated"):
            out[k] = v
        elif k == "reps":
            out[k] = [round(x / batch, 3) for x in v]
        else:
            out[k] = round(v / batch, 3)
    return out


def bench_lightglue(
    precision: Precision,
    n: int = 1024,
    batch: int = 1,
    masked: bool = False,
    n1: int | None = None,
    actual: int | None = None,
    adaptive: bool = False,
    depth_only: bool = False,
    force_exit_layer: int | None = None,
    force_prune: bool = False,
    downshift: int = -1,
    full_adaptive: bool = False,
):
    """masked=False measures the unmasked executable — what the session
    dispatches for pairs that hit the 1024 extraction cap (the analog of the
    reference skipping pad/unpad when N % 64 == 0). Images yielding <1024
    keypoints land in the 1024 bucket partially filled and run the masked
    variant instead — reported separately as
    lightglue_bf16_masked_1x1024_ms (full bucket) and
    lightglue_bf16_masked_700of1024_ms (genuinely partial: quantifies the
    in-kernel masking/tail-skip machinery)."""
    from lightglue_tpu.config import LightGlueConfig

    n1 = n if n1 is None else n1
    lg_config = LightGlueConfig(
        depth_confidence=0.95 if adaptive else -1.0,
        # depth-only and depth+width both ride the in-kernel adaptive
        # megakernel (r4: width = cumulative keep mask in VMEM scratch);
        # downshift adds the bucket-ladder two-phase split
        width_confidence=0.99 if (adaptive and not depth_only) else -1.0,
        downshift_layer=downshift,
    )
    config = PipelineConfig(precision=precision, lightglue=lg_config)
    policy = policy_for(config.precision)
    raw = weights.init_lightglue(0, config.lightglue)
    if force_exit_layer is not None:
        # pin the early-exit decision: a large token-confidence bias makes
        # every token confident from layer `force_exit_layer` on (sigmoid->1)
        # and unconfident before it, so the while_loop exits exactly there —
        # random weights give near-uniform confidences, so this is the only
        # way to measure exit-at-layer-k latency deterministically
        tb = np.asarray(raw["token"]["b"])  # (L-1, 1)
        tb = np.where(
            np.arange(tb.shape[0])[:, None] >= force_exit_layer - 1, 50.0, -50.0
        ).astype(tb.dtype)
        raw = dict(raw)
        raw["token"] = dict(raw["token"], b=tb)
        # width pruning must not fire (matchability high keeps all tokens)
        raw["assign"] = dict(
            raw["assign"],
            match=dict(raw["assign"]["match"], b=np.full_like(
                np.asarray(raw["assign"]["match"]["b"]), 50.0
            )),
        )
    if force_prune:
        # the pruning-pays scenario: a wide-spread token head keeps the
        # confident fraction under the 0.95 depth ratio (no early exit)
        # while an unmatchable head (-50 bias) retires every confident
        # token — steady per-layer pruning, so the downshift boundary
        # crosses N/2 and the bucket-ladder second phase runs at half
        # width. Random weights alone neither prune nor exit.
        frng = np.random.default_rng(11)
        tw = np.asarray(raw["token"]["w"])
        raw = dict(raw)
        raw["token"] = dict(
            raw["token"],
            w=(frng.standard_normal(tw.shape) * 1.0).astype(tw.dtype),
            b=np.zeros_like(np.asarray(raw["token"]["b"])),
        )
        raw["assign"] = dict(
            raw["assign"],
            match=dict(raw["assign"]["match"], b=np.full_like(
                np.asarray(raw["assign"]["match"]["b"]), -50.0
            )),
        )
    if policy.int8_weights:
        # the INT8 rung is int8 weights + per-channel scales (what the
        # session builds); without this the "int8" bench silently measured
        # the bf16 megakernel path — r3's int8 numbers did exactly that
        from lightglue_tpu.quant import quantize_lightglue

        params = weights.to_jax(quantize_lightglue(raw))
    else:
        params = weights.to_jax(raw, policy.param_dtype)
    rng = np.random.default_rng(0)
    kpts0 = jnp.asarray(rng.uniform(-1, 1, (batch, n, 2)).astype(np.float32))
    kpts1 = jnp.asarray(rng.uniform(-1, 1, (batch, n1, 2)).astype(np.float32))
    desc0 = jnp.asarray(
        rng.standard_normal((batch, n, 256), dtype=np.float32), policy.act_dtype
    )
    desc1 = jnp.asarray(
        rng.standard_normal((batch, n1, 256), dtype=np.float32), policy.act_dtype
    )
    a0 = min(actual or n, n)
    a1 = min(actual or n1, n1)
    use_lens = masked or adaptive or (actual is not None)
    lens0 = jnp.full((batch,), a0, jnp.int32) if use_lens else None
    lens1 = jnp.full((batch,), a1, jnp.int32) if use_lens else None
    fwd = lightglue.forward_adaptive if adaptive else lightglue.forward
    fwd_kwargs = {"full": True} if (adaptive and full_adaptive) else {}

    def make_fn(iters):
        @jax.jit
        def run(params, kpts0, kpts1, desc0, desc1):
            def body(carry, _):
                d0 = desc0 + carry.astype(desc0.dtype) * 1e-30
                out = fwd(
                    params, kpts0, kpts1, d0, desc1, lens0, lens1,
                    config=config.lightglue, policy=policy, **fwd_kwargs,
                )
                m = filter_matches(
                    out.scores, config.match_threshold, config.max_matches
                )
                return out.scores[0, 0, 0] + m.scores[0, 0] * 0, ()
            return jax.lax.scan(body, jnp.float32(0), None, length=iters)

        return run

    return _timed(make_fn, params, kpts0, kpts1, desc0, desc1)


def bench_superpoint(precision: Precision, h: int = 480, w: int = 640):
    config = PipelineConfig(precision=precision)
    policy = policy_for(config.precision)
    params = weights.to_jax(weights.init_superpoint(0, config.superpoint))
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((1, h, w, 1), dtype=np.float32))

    def make_fn(iters):
        @jax.jit
        def run(params, image):
            def body(carry, _):
                img = image + carry * 1e-30
                scores, desc = superpoint.forward(
                    params, img, config=config.superpoint, policy=policy,
                    nms=False,
                )
                ext = extract_keypoints(
                    scores, desc, config=config.superpoint, raw_scores=True
                )
                # the carry must consume the extraction or XLA dead-code
                # eliminates it (it did: the old scores-only carry measured
                # forward-only, 1.27 ms vs the true 2.04 ms)
                return ext.keypoints_norm[0, 0, 0], ()
            return jax.lax.scan(body, jnp.float32(0), None, length=iters)

        return run

    return _timed(make_fn, params, image)


def bench_e2e(precision: Precision, h: int = 480, w: int = 640, n: int = 1024):
    """Full pair pipeline: SuperPoint on both images (batched) + extraction +
    LightGlue match — the demo_mono per-pair device work
    (matches_demo_mono_0/console.txt: 30.21 + 45.29 ms on Orin)."""
    config = PipelineConfig(precision=precision)
    policy = policy_for(config.precision)
    sp_params = weights.to_jax(weights.init_superpoint(0, config.superpoint))
    lg_params = weights.to_jax(
        weights.init_lightglue(0, config.lightglue), policy.param_dtype
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((2, h, w, 1), dtype=np.float32))

    def make_fn(iters):
        @jax.jit
        def run(sp_params, lg_params, images):
            def body(carry, _):
                img = images + carry * 1e-30
                scores, desc = superpoint.forward(
                    sp_params, img, config=config.superpoint, policy=policy,
                    nms=False,
                )
                ext = extract_keypoints(
                    scores, desc, config=config.superpoint, raw_scores=True
                )
                # 480x640 frames saturate the 1024-kpt cap (demo console:
                # every pair reports kpts 1024/1024), and the session
                # dispatches cap-full pairs to the UNMASKED full-bucket
                # executable (runtime/session.py:_match_fn full=True) —
                # lengths None mirrors that real dispatch; partially
                # filled buckets are covered by the masked/bucket-ladder
                # metrics above
                out = lightglue.forward(
                    lg_params,
                    ext.keypoints_norm[0:1],
                    ext.keypoints_norm[1:2],
                    ext.descriptors[0:1].astype(policy.act_dtype),
                    ext.descriptors[1:2].astype(policy.act_dtype),
                    None,
                    None,
                    config=config.lightglue,
                    policy=policy,
                )
                m = filter_matches(
                    out.scores, config.match_threshold, config.max_matches
                )
                return out.scores[0, 0, 0], ()
            return jax.lax.scan(body, jnp.float32(0), None, length=iters)

        return run

    return _timed(make_fn, sp_params, lg_params, images)


# A hung device dispatch cannot be cancelled in-process, so device
# availability is probed in a SUBPROCESS. The TPU relay has real outages
# (observed: jax.devices() blocks forever); without this gate a dead relay
# turns the whole benchmark run into a silent hang instead of a parseable
# error line.
_PROBE_SRC = (
    "import jax, numpy as np; x = jax.numpy.ones((8, 128)); "
    "print(float(np.asarray(x + x)[0, 0]))"
)


def _device_reachable(timeout_s: float = 120.0) -> bool:
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def _await_device() -> bool:
    """Retry the reachability probe until LGTPU_BENCH_WAIT_S (default 3600 s)
    expires. Returns True as soon as a probe succeeds.

    The default IS the driver's outage budget (the driver runs `python
    bench.py` bare): r4's 600 s default lost the round's official perf
    record to a relay outage that the repo-side recovery queue outlasted
    (BENCH_r04.json value null vs golden/chip_r04/bench.out committed hours
    later). One hour matches the longest observed recovery gaps."""
    deadline = float(os.environ.get("LGTPU_BENCH_WAIT_S", "3600"))
    t0 = time.time()
    while True:
        if _device_reachable():
            return True
        if time.time() - t0 >= deadline:
            return False
        time.sleep(min(30.0, max(1.0, deadline - (time.time() - t0))))


def _last_committed_chip() -> dict:
    """Provenance block for the outage error line: the newest committed
    chip-side bench artifact (golden/chip_r*/bench*.out), its git SHA and
    age, and the headline numbers parsed out of it — so even an outage
    round carries the last-good driver-grade record instead of nothing
    (VERDICT r4 next #1c)."""
    root = Path(__file__).resolve().parent
    cands = sorted(root.glob("golden/chip_r*/bench*.out"))
    best: dict = {}
    for p in reversed(cands):
        try:
            for line in p.read_text().splitlines():
                line = line.strip()
                if line.startswith("{") and '"metric"' in line:
                    rec = json.loads(line)
                    if rec.get("value") is None:
                        continue
                    rel = str(p.relative_to(root))
                    sha = subprocess.run(
                        ["git", "log", "-1", "--format=%H %cI", "--", rel],
                        cwd=root, capture_output=True, text=True, timeout=30,
                    ).stdout.strip()
                    # age from the COMMIT date (mtime is checkout time on a
                    # fresh clone and would claim a weeks-old record is new)
                    age = None
                    if sha:
                        try:
                            from datetime import datetime

                            cdate = datetime.fromisoformat(
                                sha.split(" ", 1)[1]
                            )
                            age = round(
                                (time.time() - cdate.timestamp()) / 86400.0,
                                1,
                            )
                        except Exception:
                            pass
                    best = {
                        "source": rel,
                        "git": sha,
                        "age_days": age,
                        "value_ms": rec["value"],
                        "vs_baseline": rec.get("vs_baseline"),
                        "e2e_pair_ms": (rec.get("extra", {})
                                        .get("e2e_pair_bf16_ms", {})
                                        .get("p50")),
                        "superpoint_extract_ms": (
                            rec.get("extra", {})
                            .get("superpoint_bf16_480x640_extract_ms", {})
                            .get("p50")),
                    }
                    break
        except Exception:
            continue
        if best:
            break
    return best


def main():
    if not _await_device():
        print(
            json.dumps(
                {
                    "metric": (
                        "LightGlue 1x1024x1024 bf16 full match step p50 "
                        "latency"
                    ),
                    "value": None,
                    "unit": "ms",
                    "vs_baseline": None,
                    "extra": {
                        "error": (
                            "device unreachable: relay probe subprocess "
                            "failed/hung past LGTPU_BENCH_WAIT_S"
                        ),
                        "waited_s": float(
                            os.environ.get("LGTPU_BENCH_WAIT_S", "3600")
                        ),
                        "last_committed_chip": _last_committed_chip(),
                    },
                }
            )
        )
        return
    backend = jax.default_backend()
    # every timing metric is a {p50, min, spread_pct} dict (see _timed) —
    # a regression claim against a previous round is only valid when the
    # delta exceeds both rounds' spreads
    lg_bf16 = bench_lightglue(Precision.BF16)
    extra = {
        "backend": backend,
        "lightglue_bf16_1x1024_ms": lg_bf16,
    }
    try:
        extra["lightglue_bf16_masked_1x1024_ms"] = bench_lightglue(
            Precision.BF16, masked=True
        )
        # genuinely partial bucket: 700 real keypoints in the 1024 bucket —
        # quantifies what the in-kernel masking/tail-skip machinery saves
        extra["lightglue_bf16_masked_700of1024_ms"] = bench_lightglue(
            Precision.BF16, masked=True, actual=700
        )
        # the session's actual dispatch for a 700-kpt pair under the
        # 128-step bucket ladder: the dense 768 executable (masked 700/768)
        extra["lightglue_bf16_700_bucket768_ms"] = bench_lightglue(
            Precision.BF16, n=768, masked=True, actual=700
        )
        # smaller buckets + a mixed-bucket pair (256 x 512 keypoints)
        extra["lightglue_bf16_1x256_ms"] = bench_lightglue(
            Precision.BF16, n=256
        )
        extra["lightglue_bf16_1x512_ms"] = bench_lightglue(
            Precision.BF16, n=512
        )
        extra["lightglue_bf16_mixed_256x512_ms"] = bench_lightglue(
            Precision.BF16, n=256, n1=512
        )
        # adaptive depth/width (BASELINE config 4): exit pinned at layer 3
        # and layer 9 via the token-confidence bias (see bench_lightglue) —
        # demonstrates early exit is proportional, and bounds the adaptive
        # machinery's overhead vs the fixed-depth megakernel path
        extra["lightglue_bf16_adaptive_exit3_1x1024_ms"] = bench_lightglue(
            Precision.BF16, adaptive=True, force_exit_layer=3
        )
        extra["lightglue_bf16_adaptive_exit9_1x1024_ms"] = bench_lightglue(
            Precision.BF16, adaptive=True, force_exit_layer=9
        )
        # depth-only adaptive rides the in-kernel early-exit megakernel
        # (one pallas_call for the whole loop) — width pruning off
        extra["lightglue_bf16_adaptive_depth_exit3_1x1024_ms"] = (
            bench_lightglue(
                Precision.BF16, adaptive=True, depth_only=True,
                force_exit_layer=3,
            )
        )
        extra["lightglue_bf16_adaptive_depth_exit9_1x1024_ms"] = (
            bench_lightglue(
                Precision.BF16, adaptive=True, depth_only=True,
                force_exit_layer=9,
            )
        )
        # the session's cap-full dispatch for depth-only adaptive: the
        # r5 unmasked variant (masking wheres are no-ops at full buckets)
        extra["lightglue_bf16_adaptive_depth_exit9_full_1x1024_ms"] = (
            bench_lightglue(
                Precision.BF16, adaptive=True, depth_only=True,
                force_exit_layer=9, full_adaptive=True,
            )
        )
        # pruning-pays pair: heavy per-layer width pruning with NO early
        # exit (all 9 layers run), without vs with the bucket-ladder
        # downshift — the downshift runs layers 5-9 at half width once the
        # survivor count crosses 512, converting pruning into wall-clock
        extra["lightglue_bf16_adaptive_prune_1x1024_ms"] = bench_lightglue(
            Precision.BF16, adaptive=True, force_prune=True
        )
        extra["lightglue_bf16_adaptive_prune_downshift_1x1024_ms"] = (
            bench_lightglue(
                Precision.BF16, adaptive=True, force_prune=True, downshift=4
            )
        )
        extra["lightglue_mixed_1x1024_ms"] = bench_lightglue(Precision.MIXED)
        extra["lightglue_fp32_1x1024_ms"] = bench_lightglue(Precision.FP32)
        sp = bench_superpoint(Precision.BF16)
        extra["superpoint_bf16_480x640_extract_ms"] = sp
        extra["superpoint_vs_baseline"] = round(
            BASELINE_SP_FP32_MS / sp["p50"], 2
        )
        b8 = bench_lightglue(Precision.BF16, batch=8)
        b8 = _per_pair(b8, 8)
        extra["lightglue_bf16_batch8_per_pair_ms"] = b8
        extra["lightglue_bf16_pairs_per_s_chip"] = round(1e3 / b8["p50"], 1)
        extra["lightglue_int8_1x1024_ms"] = bench_lightglue(Precision.INT8)
        # int8's one plausible win is weight streaming (the megakernel
        # streams b x weight_bytes per dispatch, kernels/layer_stack.py) —
        # measure it where halved weight bytes should actually show
        i8b8 = bench_lightglue(Precision.INT8, batch=8)
        i8b8 = _per_pair(i8b8, 8)
        extra["lightglue_int8_batch8_per_pair_ms"] = i8b8
        e2e = bench_e2e(Precision.BF16)
        extra["e2e_pair_bf16_ms"] = e2e
        extra["e2e_vs_demo_baseline"] = round(
            (30.21 + 45.29) / e2e["p50"], 2
        )
    except Exception as e:  # secondary metrics must not kill the headline
        extra["secondary_error"] = repr(e)[:200]

    print(
        json.dumps(
            {
                "metric": "LightGlue 1x1024x1024 bf16 full match step p50 latency",
                "value": lg_bf16["p50"],
                "unit": "ms",
                "vs_baseline": round(BASELINE_LG_FP16_MS / lg_bf16["p50"], 2),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
