"""End-to-end pipeline parity: JAX session vs torch-oracle pipeline.

The analog of the reference's implicit oracle — identical matches between
the plugin and no-plugin engines on the same pair (SURVEY.md §4.2, BASELINE
bar: match sets identical within 1%). Runs the full chain
image -> SuperPoint -> extraction -> LightGlue -> mutual-NN filter in both
implementations with the same random weights and compares the matched
coordinate sets (keypoint ordering differs by design, so indices are
compared via coordinates).
"""

from pathlib import Path

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lightglue_tpu.config import LightGlueConfig, PipelineConfig, SuperPointConfig
from lightglue_tpu.precision import Precision
from lightglue_tpu.runtime import weights
from lightglue_tpu.runtime.session import MatcherSession

from torch_oracle import (
    make_lightglue_state_dict,
    make_superpoint_state_dict,
    oracle_lightglue,
    oracle_superpoint,
)
from test_pipeline import numpy_filter_matches, torch_sample_descriptors

SACRE = Path("/root/reference/assets/sacre_coeur1.jpg")
N_LAYERS = 3  # small depth keeps the CPU-interpreted kernel fast; the wiring
# under test is identical at depth 9
MAX_KPTS = 128


def oracle_extract(scores_np, desc_np, threshold=0.0005, border=4, k=MAX_KPTS):
    """Reference keypoint selection (export_onnx_with_plugin.py:113-189)."""
    s = torch.as_tensor(scores_np[0])
    s[:border, :] = -1
    s[-border:, :] = -1
    s[:, :border] = -1
    s[:, -border:] = -1
    mask = s > threshold
    ys, xs = torch.nonzero(mask, as_tuple=True)
    vals = s[ys, xs]
    kcap = min(k, vals.shape[0])
    top_vals, top_idx = torch.topk(vals, kcap, sorted=True)
    kpts = torch.stack([xs[top_idx], ys[top_idx]], -1).float()  # (x, y)
    desc = torch_sample_descriptors(kpts[None].numpy(), desc_np)
    h, w = scores_np.shape[1:]
    size = torch.tensor([w, h], dtype=torch.float32)
    kpts_norm = (kpts - size / 2) / (size.max() / 2)
    return kpts.numpy(), kpts_norm[None].numpy(), desc, top_vals.numpy()


@pytest.fixture(scope="module")
def image_pair():
    from lightglue_tpu.utils.image import load_image

    if SACRE.exists():
        img0, _ = load_image(str(SACRE), resize=(120, 160))
        # second view: a shifted crop of the same image resized back
        big, _ = load_image(str(SACRE), resize=(150, 200))
        img1 = big[20:140, 30:190]
    else:  # fallback: synthetic textured pair
        rng = np.random.default_rng(0)
        base = rng.random((140, 180, 1), dtype=np.float32)
        img0 = base[:120, :160]
        img1 = base[20:140, 20:180]
    return img0.astype(np.float32), img1.astype(np.float32)


@pytest.fixture(scope="module")
def pipelines():
    sp_sd = make_superpoint_state_dict(seed=11)
    lg_sd = make_lightglue_state_dict(seed=12, n_layers=N_LAYERS)
    config = PipelineConfig(
        superpoint=SuperPointConfig(max_num_keypoints=MAX_KPTS),
        lightglue=LightGlueConfig(n_layers=N_LAYERS),
        precision=Precision.FP32,
        buckets=(64, MAX_KPTS),
        # random weights yield near-uniform assignment probabilities, so use a
        # tiny threshold: the test compares implementations, not match quality
        match_threshold=1e-6,
        max_matches=MAX_KPTS,
    )
    session = MatcherSession(
        sp_params=weights.superpoint_from_state_dict(
            {k: v.numpy() for k, v in sp_sd.items()}
        ),
        lg_params=weights.lightglue_from_state_dict(
            {k: v.numpy() for k, v in lg_sd.items()}, config.lightglue
        ),
        config=config,
    )
    return session, sp_sd, lg_sd, config


def oracle_pipeline(sp_sd, lg_sd, img0, img1, threshold):
    out = []
    for img in (img0, img1):
        scores, desc = oracle_superpoint(sp_sd, img.transpose(2, 0, 1)[None])
        out.append(oracle_extract(scores, desc))
    (k0, kn0, d0, _), (k1, kn1, d1, _) = out
    _, _, lg_scores = oracle_lightglue(
        lg_sd, kn0, kn1, d0, d1, n_layers=N_LAYERS
    )
    pairs = numpy_filter_matches(lg_scores, threshold)
    matched = {
        (tuple(k0[i0]), tuple(k1[i1])): s for (i0, i1), s in pairs.items()
    }
    return matched, k0, k1


def test_e2e_match_set_parity(pipelines, image_pair):
    session, sp_sd, lg_sd, config = pipelines
    img0, img1 = image_pair

    result = session.match_pair(img0, img1)
    ours = {
        (tuple(p0), tuple(p1)): s
        for p0, p1, s in zip(
            result["matched_kpts0"], result["matched_kpts1"], result["match_scores"]
        )
    }

    want, k0, k1 = oracle_pipeline(
        sp_sd, lg_sd, img0, img1, config.match_threshold
    )

    assert result["num_keypoints0"] > 10, "too few keypoints to be meaningful"
    assert len(want) > 0, "oracle found no matches; test is vacuous"
    common = set(ours) & set(want)
    union = set(ours) | set(want)
    iou = len(common) / max(1, len(union))
    assert iou > 0.95, (
        f"match sets diverge: ours={len(ours)} oracle={len(want)} "
        f"common={len(common)} iou={iou:.3f}"
    )
    for key in common:
        np.testing.assert_allclose(ours[key], want[key], rtol=1e-3, atol=1e-4)


def test_bucketing_picks_smallest_fit(pipelines, image_pair):
    session, *_ = pipelines
    assert session.config.bucket_for(10) == 64
    assert session.config.bucket_for(64) == 64
    assert session.config.bucket_for(65) == MAX_KPTS
    assert session.config.bucket_for(10_000) == MAX_KPTS


def test_match_pair_is_deterministic(pipelines, image_pair):
    session, *_ = pipelines
    img0, img1 = image_pair
    r1 = session.match_pair(img0, img1)
    r2 = session.match_pair(img0, img1)
    np.testing.assert_array_equal(r1["matches"], r2["matches"])
    np.testing.assert_array_equal(r1["match_scores"], r2["match_scores"])


def test_match_batch_consistent_with_match_pair(pipelines, image_pair):
    """Batched pipeline == per-pair pipeline on the same data."""
    session, *_ = pipelines
    img0, img1 = image_pair
    single = session.match_pair(img0, img1)
    batched = session.match_batch(
        np.stack([img0, img0]), np.stack([img1, img1])
    )
    assert len(batched) == 2
    for res in batched:
        assert res["num_keypoints0"] == single["num_keypoints0"]
        np.testing.assert_array_equal(res["matches"], single["matches"])
        np.testing.assert_allclose(
            res["match_scores"], single["match_scores"], rtol=1e-5
        )


def test_full_bucket_unmasked_dispatch_equals_masked(pipelines):
    """When every pair fills its bucket exactly, the session dispatches the
    unmasked executable (the analog of the reference plugin skipping
    pad/unpad when N % 64 == 0) — results must be identical to the masked
    variant at the same lengths."""
    import jax.numpy as jnp

    session, *_ = pipelines
    b = 64
    rng = np.random.default_rng(3)
    k0 = jnp.asarray(rng.uniform(-1, 1, (1, b, 2)).astype(np.float32))
    k1 = jnp.asarray(rng.uniform(-1, 1, (1, b, 2)).astype(np.float32))
    d0 = jnp.asarray(rng.standard_normal((1, b, 256)).astype(np.float32))
    d1 = jnp.asarray(rng.standard_normal((1, b, 256)).astype(np.float32))
    lens = jnp.full((1,), b, jnp.int32)

    out_m, mat_m = session._match_fn(b, b, full=False)(
        session.lg_params, k0, k1, d0, d1, lens, lens
    )
    out_f, mat_f = session._match_fn(b, b, full=True)(
        session.lg_params, k0, k1, d0, d1, lens, lens
    )
    np.testing.assert_allclose(
        np.asarray(out_f.scores), np.asarray(out_m.scores), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(mat_f.indices), np.asarray(mat_m.indices)
    )
    assert int(mat_f.count[0]) == int(mat_m.count[0])


def test_warmup_covers_cap_full_variant():
    """session.warmup must precompile the largest bucket's full=True
    (unmasked) executable — cap-full pairs dispatch it, and leaving it
    lazy cost the r4 golden demo's first pair a ~50 s relay compile."""
    from lightglue_tpu.config import PipelineConfig, SuperPointConfig
    from lightglue_tpu.precision import Precision
    from lightglue_tpu.runtime.session import MatcherSession

    config = PipelineConfig(
        superpoint=SuperPointConfig(max_num_keypoints=128),
        precision=Precision.FP32,
        buckets=(128,),
        max_matches=128,
    )
    session = MatcherSession(config=config)
    session.warmup((48, 64))
    assert (128, 128, True) in session._match_cache, (
        "cap-full unmasked variant not warmed"
    )
    assert (128, 128, False) in session._match_cache


def test_adaptive_full_restricted_to_cap_bucket():
    """Adaptive depth-only full=True dispatch is gated to the cap bucket:
    warmup only compiles the cap variant, so a rarely-full smaller bucket
    must normalize to the masked executable instead of stalling a serving
    batch on a fresh remote compile (session.py cap-bucket gate)."""
    config = PipelineConfig(
        superpoint=SuperPointConfig(max_num_keypoints=128),
        lightglue=LightGlueConfig(n_layers=2, depth_confidence=0.95),
        precision=Precision.FP32,
        buckets=(64, 128),
        max_matches=64,
    )
    session = MatcherSession(config=config)
    session._match_fn(64, 64, full=True)
    assert (64, 64, False) in session._match_cache, (
        "non-cap full dispatch did not normalize to masked"
    )
    assert (64, 64, True) not in session._match_cache
    session._match_fn(128, 128, full=True)
    assert (128, 128, True) in session._match_cache, (
        "cap-bucket full dispatch lost its unmasked variant"
    )


def test_odd_width_frame_extract_and_match():
    """480x600 (w % 128 != 0): the fused-extraction hedge routes TPU to the
    dense NMS+tiled-topk path (pipeline/extract.py fused_ok); this drives
    the full session extract+match at an odd width on whatever backend the
    suite runs on — under LGTPU_TEST_TPU=1 this is the chip evidence for
    the non-128-multiple fallback (VERDICT r4 next #6; the reference
    accepts arbitrary --img_size, export_onnx_with_plugin.py:25-58).
    The raw-scores production path must agree with the explicit dense
    simple_nms path keypoint-for-keypoint."""
    import jax.numpy as jnp

    from lightglue_tpu.config import (
        LightGlueConfig, PipelineConfig, SuperPointConfig
    )
    from lightglue_tpu.kernels.nms import simple_nms
    from lightglue_tpu.models import superpoint
    from lightglue_tpu.pipeline.extract import extract_keypoints
    from lightglue_tpu.runtime.session import MatcherSession

    h, w = 480, 600
    config = PipelineConfig(
        superpoint=SuperPointConfig(max_num_keypoints=512),
        lightglue=LightGlueConfig(n_layers=2),
        precision=Precision.FP32,
        buckets=(512,),
        match_threshold=1e-6,
        max_matches=512,
    )
    session = MatcherSession(config=config, compile_cache_dir=None)
    rng = np.random.default_rng(7)
    base = rng.random((h, w, 1), dtype=np.float32)
    img0 = base
    img1 = np.roll(base, 3, axis=1)  # shifted copy: correlated structure

    result = session.match_pair(img0, img1)
    assert result["num_keypoints0"] > 50, "too few keypoints; vacuous"
    assert result["num_keypoints1"] > 50
    kp = result["keypoints0"][: result["num_keypoints0"]]
    assert kp[:, 0].max() < w - 4 and kp[:, 1].max() < h - 4  # border mask
    assert kp[:, 0].min() >= 4 and kp[:, 1].min() >= 4

    # production raw-scores path vs explicit dense NMS path at this width
    raw, desc = superpoint.forward(
        session.sp_params,
        jnp.asarray(img0[None]),
        config=config.superpoint,
        policy=session.policy,
        nms=False,
    )
    got = extract_keypoints(
        raw, desc, config=config.superpoint, raw_scores=True
    )
    want = extract_keypoints(
        simple_nms(raw, config.superpoint.nms_radius),
        desc,
        config=config.superpoint,
    )
    n = int(want.count[0])
    assert int(got.count[0]) == n
    np.testing.assert_array_equal(
        np.asarray(got.keypoints[0, :n]), np.asarray(want.keypoints[0, :n])
    )
