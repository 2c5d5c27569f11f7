"""Native C++ host ops: fused preprocessing + RANSAC fundamental matrix."""

import numpy as np
import pytest

from lightglue_tpu.runtime import host


def test_native_builds():
    assert host.native_available(), "native library failed to build"


def test_preprocess_matches_reference_pipeline(rng):
    rgb = (rng.random((100, 140, 3)) * 255).astype(np.uint8)
    out = host.preprocess_image(rgb, (50, 70))
    assert out.shape == (50, 70, 1)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
    # compare against cv2 resize + luma weights within loose tolerance
    try:
        import cv2
    except ImportError:
        return
    ref = cv2.resize(rgb, (70, 50), interpolation=cv2.INTER_LINEAR)
    ref = (ref.astype(np.float32) @ np.array([0.299, 0.587, 0.114], np.float32)) / 255
    diff = np.abs(out[..., 0] - ref)
    assert np.percentile(diff, 95) < 0.02


def _epipolar_pair(rng, n_inliers=60, n_outliers=15):
    """Synthesize correspondences from a known two-view geometry."""
    # camera: simple stereo with translation + small rotation
    K = np.array([[500, 0, 320], [0, 500, 240], [0, 0, 1.0]])
    angle = 0.05
    R = np.array(
        [
            [np.cos(angle), 0, np.sin(angle)],
            [0, 1, 0],
            [-np.sin(angle), 0, np.cos(angle)],
        ]
    )
    t = np.array([0.3, 0.05, 0.02])
    pts3d = np.stack(
        [
            rng.uniform(-2, 2, n_inliers),
            rng.uniform(-2, 2, n_inliers),
            rng.uniform(4, 8, n_inliers),
        ],
        -1,
    )
    p0 = (K @ pts3d.T).T
    p0 = p0[:, :2] / p0[:, 2:]
    p1c = (R @ pts3d.T).T + t
    p1 = (K @ p1c.T).T
    p1 = p1[:, :2] / p1[:, 2:]
    # inject gross outliers
    o0 = rng.uniform(0, 640, (n_outliers, 2))
    o1 = rng.uniform(0, 480, (n_outliers, 2))
    pts0 = np.concatenate([p0, o0]).astype(np.float32)
    pts1 = np.concatenate([p1, o1]).astype(np.float32)
    labels = np.concatenate([np.ones(n_inliers, bool), np.zeros(n_outliers, bool)])
    return pts0, pts1, labels


def test_ransac_recovers_epipolar_inliers(rng):
    pts0, pts1, labels = _epipolar_pair(rng)
    count, mask, F = host.ransac_fundamental(pts0, pts1, max_iters=800, threshold=2.0)
    # all true inliers recovered, no more than a couple of chance outliers
    recall = mask[labels].mean()
    false_pos = mask[~labels].sum()
    assert recall > 0.95, f"inlier recall {recall}"
    assert false_pos <= 3, f"{false_pos} outliers accepted"
    # epipolar constraint holds for inliers
    ones = np.ones((len(pts0), 1))
    h0 = np.concatenate([pts0, ones], 1)
    h1 = np.concatenate([pts1, ones], 1)
    resid = np.abs(np.einsum("ni,ij,nj->n", h1, F, h0))
    scale = np.abs(F).max()
    assert np.median(resid[labels] / scale) < 50  # pixel-scale residuals


def test_ransac_deterministic(rng):
    pts0, pts1, _ = _epipolar_pair(rng)
    r1 = host.ransac_fundamental(pts0, pts1, seed=7)
    r2 = host.ransac_fundamental(pts0, pts1, seed=7)
    assert r1[0] == r2[0]
    np.testing.assert_array_equal(r1[1], r2[1])


def test_ransac_too_few_points():
    pts = np.zeros((5, 2), np.float32)
    count, mask, F = host.ransac_fundamental(pts, pts)
    assert count == 0 and not mask.any()
