"""Device-side extraction + match filtering vs torch/numpy oracles."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from lightglue_tpu.config import SuperPointConfig
from lightglue_tpu.pipeline.extract import (
    extract_keypoints,
    mask_borders,
    normalize_keypoints,
    sample_descriptors,
)
from lightglue_tpu.pipeline.match import filter_matches


def torch_sample_descriptors(kpts, desc_nchw, s=8):
    """Oracle: the reference transform (superpoint.py:72-87) verbatim in torch."""
    kpts = torch.as_tensor(kpts, dtype=torch.float32)
    desc = torch.as_tensor(desc_nchw, dtype=torch.float32)
    b, c, h, w = desc.shape
    kp = kpts - s / 2 + 0.5
    kx = kp[..., 0] / (w * s - s / 2 - 0.5)
    ky = kp[..., 1] / (h * s - s / 2 - 0.5)
    grid = torch.stack((kx, ky), -1) * 2 - 1
    out = F.grid_sample(
        desc, grid.view(b, 1, -1, 2), mode="bilinear", align_corners=True
    )
    out = F.normalize(out.reshape(b, c, -1), p=2, dim=1)
    return out.permute(0, 2, 1).numpy()  # (B, K, C)


def test_sample_descriptors_matches_grid_sample(rng):
    h, w, c = 12, 16, 32
    desc = rng.standard_normal((1, h, w, c), dtype=np.float32)
    # keypoints strictly inside the border-4 region of the 96x128 image
    kpts = np.stack(
        [
            rng.uniform(4, w * 8 - 5, (1, 50)),
            rng.uniform(4, h * 8 - 5, (1, 50)),
        ],
        axis=-1,
    ).astype(np.float32)
    ours = np.asarray(sample_descriptors(jnp.asarray(kpts), jnp.asarray(desc)))
    oracle = torch_sample_descriptors(kpts, desc.transpose(0, 3, 1, 2))
    np.testing.assert_allclose(ours, oracle, atol=1e-5, rtol=1e-4)


def test_normalize_keypoints_matches_reference_formula():
    kpts = jnp.asarray([[[0.0, 0.0], [640.0, 480.0], [320.0, 240.0]]])
    out = np.asarray(normalize_keypoints(kpts, 480, 640))
    # shift (320, 240), scale 320 (reference export_onnx_with_plugin.py:14-23)
    np.testing.assert_allclose(out[0], [[-1.0, -0.75], [1.0, 0.75], [0.0, 0.0]])


def test_extract_selects_planted_peaks(rng):
    """Plant distinct peaks; extraction must find exactly those, in score order."""
    h, w = 64, 64
    scores = np.zeros((1, h, w), np.float32)
    planted = [(10, 20, 0.9), (30, 40, 0.8), (50, 12, 0.7), (33, 8, 0.6)]
    for y, x, s in planted:
        scores[0, y, x] = s
    # sub-threshold and border points must be ignored
    scores[0, 25, 25] = 0.0004
    scores[0, 1, 1] = 0.99
    desc = rng.standard_normal((1, h // 8, w // 8, 64), dtype=np.float32)

    ext = extract_keypoints(
        jnp.asarray(scores), jnp.asarray(desc), config=SuperPointConfig(), k=16
    )
    assert int(ext.count[0]) == len(planted)
    got = np.asarray(ext.keypoints[0][: len(planted)])
    want = np.array([[x, y] for y, x, _ in planted], np.float32)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_allclose(
        np.asarray(ext.scores[0][: len(planted)]), [0.9, 0.8, 0.7, 0.6]
    )
    assert not np.asarray(ext.mask[0][len(planted):]).any()
    # padded descriptor slots are zero
    np.testing.assert_array_equal(np.asarray(ext.descriptors[0][len(planted):]), 0.0)


def test_border_mask():
    s = jnp.ones((1, 16, 16))
    out = np.asarray(mask_borders(s, 4))
    assert (out[0, :4, :] == -1).all() and (out[0, -4:, :] == -1).all()
    assert (out[0, :, :4] == -1).all() and (out[0, :, -4:] == -1).all()
    assert (out[0, 4:-4, 4:-4] == 1).all()


def numpy_filter_matches(scores, th):
    """Oracle: reference filter_matches (lightglue.py:265-288) in numpy."""
    s = np.asarray(scores)[0]
    m0 = s.argmax(1)
    m1 = s.argmax(0)
    mutual = np.arange(s.shape[0]) == m1[m0]
    mscores = np.where(mutual, np.exp(s.max(1)), 0.0)
    valid = mscores > th
    rows = np.nonzero(valid)[0]
    return {(int(r), int(m0[r])): float(mscores[r]) for r in rows}


def test_filter_matches_matches_reference_logic(rng):
    m, n = 64, 48
    # construct a scores matrix with a clear diagonal-ish structure
    s = rng.standard_normal((1, m, n)).astype(np.float32) * 2 - 4.0
    for i in range(30):
        s[0, i, i % n] = rng.uniform(-0.5, 0.0)  # strong pairs: exp in (0.6, 1)
    want = numpy_filter_matches(s, 0.1)

    out = filter_matches(jnp.asarray(s), threshold=0.1, max_matches=64)
    got = {}
    for j in range(int(out.count[0])):
        i0, i1 = np.asarray(out.indices[0, j])
        got[(int(i0), int(i1))] = float(out.scores[0, j])
    assert set(got) == set(want)
    for key in want:
        np.testing.assert_allclose(got[key], want[key], rtol=1e-5)
    # descending score order
    sc = np.asarray(out.scores[0][: int(out.count[0])])
    assert (np.diff(sc) <= 1e-6).all()


def test_filter_matches_respects_row_mask(rng):
    s = rng.standard_normal((1, 32, 32)).astype(np.float32)
    mask0 = jnp.asarray(np.arange(32)[None, :] < 16)
    out = filter_matches(jnp.asarray(s), threshold=0.0, max_matches=32, mask0=mask0)
    rows = np.asarray(out.indices[0, : int(out.count[0]), 0])
    assert (rows < 16).all()


def test_tiled_topk_matches_exact_topk(rng):
    """The NMS-sparsity two-stage top-k must equal a full top_k for every
    score above the detection threshold (extract.py:_topk_nms_tiled)."""
    from lightglue_tpu.kernels.nms import simple_nms
    from lightglue_tpu.pipeline.extract import _topk_nms_tiled, mask_borders

    h, w, k = 96, 128, 64
    dense = jnp.asarray(rng.random((2, h, w), dtype=np.float32))
    scores = simple_nms(dense, 4)
    masked = mask_borders(scores, 4)

    exact_v, exact_i = jnp.sort(
        masked.reshape(2, -1), descending=True
    )[:, :k], jnp.argsort(masked.reshape(2, -1), descending=True)[:, :k]
    tiled_v, tiled_i = _topk_nms_tiled(masked, k, h, w)

    # tile=4/cap=1: a 4x4 tile holds at most one radius-4 NMS survivor, so
    # a single per-tile max is exact (the production path for radius >= 3)
    tiled4_v, tiled4_i = _topk_nms_tiled(masked, k, h, w, tile=4, cap=1)

    thr = 0.0005
    for b in range(2):
        nv = int(np.sum(np.asarray(exact_v[b]) > thr))
        np.testing.assert_allclose(
            np.asarray(tiled_v[b, :nv]), np.asarray(exact_v[b, :nv])
        )
        assert (np.asarray(tiled_i[b, :nv]) == np.asarray(exact_i[b, :nv])).all()
        np.testing.assert_allclose(
            np.asarray(tiled4_v[b, :nv]), np.asarray(exact_v[b, :nv])
        )
        assert (
            np.asarray(tiled4_i[b, :nv]) == np.asarray(exact_i[b, :nv])
        ).all()


def test_extract_tiled_path_used_and_correct(rng):
    """extract_keypoints routes through the tiled top-k on standard shapes
    and still finds the planted peaks in order."""
    config = SuperPointConfig(max_num_keypoints=8)
    h, w = 64, 64
    scores = np.zeros((1, h, w), np.float32)
    peaks = [(10, 12, 0.9), (30, 40, 0.8), (50, 20, 0.7), (40, 55, 0.6)]
    for y, x, v in peaks:
        scores[0, y, x] = v
    desc = rng.standard_normal((1, h // 8, w // 8, 32)).astype(np.float32)
    ext = extract_keypoints(
        jnp.asarray(scores), jnp.asarray(desc), config=config
    )
    assert int(ext.count[0]) == 4
    got = np.asarray(ext.keypoints[0, :4]).astype(int).tolist()
    assert got == [[x, y] for y, x, _ in peaks]


def test_fused_extraction_matches_dense_path():
    """extract_keypoints(raw_scores=True) — the fused NMS+border+candidates
    Pallas kernel — must reproduce the dense path (simple_nms then tiled
    top-k) exactly on valid slots: same counts, same keypoints, same scores,
    same sampled descriptors. Invalid (sub-threshold) slots may reorder —
    they are exact-duplicate zeros whose tie order is
    implementation-undefined and which downstream masks out."""
    import jax.numpy as jnp

    from lightglue_tpu.config import SuperPointConfig
    from lightglue_tpu.kernels.nms import simple_nms
    from lightglue_tpu.models import superpoint
    from lightglue_tpu.pipeline.extract import extract_keypoints
    from lightglue_tpu.precision import Precision, policy_for
    from lightglue_tpu.runtime import weights

    config = SuperPointConfig(max_num_keypoints=256)
    policy = policy_for(Precision.FP32)
    params = weights.to_jax(weights.init_superpoint(3, config))
    rng = np.random.default_rng(5)
    image = jnp.asarray(rng.random((2, 64, 128, 1), dtype=np.float32))

    raw, desc = superpoint.forward(
        params, image, config=config, policy=policy, nms=False
    )
    dense = simple_nms(raw, config.nms_radius)
    want = extract_keypoints(dense, desc, config=config)
    got = extract_keypoints(raw, desc, config=config, raw_scores=True)

    np.testing.assert_array_equal(np.asarray(got.count), np.asarray(want.count))
    for b in range(2):
        n = int(want.count[b])
        assert n > 10, "too few keypoints; test is vacuous"
        np.testing.assert_array_equal(
            np.asarray(got.keypoints[b, :n]), np.asarray(want.keypoints[b, :n])
        )
        np.testing.assert_allclose(
            np.asarray(got.scores[b, :n]), np.asarray(want.scores[b, :n]),
            rtol=0, atol=0,
        )
        np.testing.assert_allclose(
            np.asarray(got.descriptors[b, :n]),
            np.asarray(want.descriptors[b, :n]),
            rtol=1e-6, atol=1e-6,
        )


def test_fused_extraction_keeps_exact_score_ties():
    """ADVICE r4 (kernels/nms.py): two above-threshold keypoints in the SAME
    8x8 tile with bitwise-equal fp32 scores must BOTH survive the fused
    candidate kernel, as they do in the dense path — a round suppresses only
    the element it emitted, not every column tied at the tile max."""
    import jax.numpy as jnp

    from lightglue_tpu.kernels.nms import nms_candidates
    from lightglue_tpu.pipeline.extract import (
        _topk_nms_tiled, mask_borders
    )
    from lightglue_tpu.kernels.nms import simple_nms

    h, w = 24, 256
    scores = np.zeros((1, h, w), np.float32)
    # same 8x8 tile (rows 8-15, cols 128-135), Chebyshev distance 5 > 4 so
    # neither NMS-suppresses the other; identical fp32 score
    scores[0, 10, 130] = 0.75
    scores[0, 10, 135] = 0.75
    # a tile with THREE ties (needs two surviving rounds after the first)
    scores[0, 10, 64] = 0.5
    scores[0, 10, 69] = 0.5
    scores[0, 15, 66] = 0.5
    sj = jnp.asarray(scores)

    cand_v, cand_i = nms_candidates(sj, nms_radius=4, border=4, cap=4)
    dense = mask_borders(simple_nms(sj, 4), 4)
    dv, di = _topk_nms_tiled(dense, 8, h, w)

    thr = 0.1
    got = {
        int(i) for v, i in zip(np.asarray(cand_v[0]), np.asarray(cand_i[0]))
        if v > thr
    }
    want = {
        int(i) for v, i in zip(np.asarray(dv[0]), np.asarray(di[0]))
        if v > thr
    }
    assert want == {
        10 * w + 130, 10 * w + 135, 10 * w + 64, 10 * w + 69, 15 * w + 66
    }
    assert got == want
