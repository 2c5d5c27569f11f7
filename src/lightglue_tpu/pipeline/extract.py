"""Device-side keypoint extraction with static shapes.

The reference splits this between Python export-time code
(export_onnx_with_plugin.py:113-189) and the LibTorch GPU post-process
(demo/superpoint_mono_trt.cpp:153-253): border mask -> threshold -> top-k ->
bilinear grid-sample of descriptors -> L2 normalize -> coordinate
normalization. Both lean on dynamic shapes (nonzero / masked_select); here
everything is fixed-k + validity masks so it stays inside one compiled XLA
program with zero host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from lightglue_tpu.config import SuperPointConfig


class Extraction(NamedTuple):
    keypoints: jax.Array       # (B, K, 2) pixel (x, y), fp32; junk beyond count
    keypoints_norm: jax.Array  # (B, K, 2) normalized to [-1, 1] for LightGlue
    descriptors: jax.Array     # (B, K, 256) L2-normalized, fp32
    scores: jax.Array          # (B, K) detection scores (descending)
    mask: jax.Array            # (B, K) bool validity
    count: jax.Array           # (B,) int32 number of valid keypoints


def mask_borders(scores: jax.Array, border: int) -> jax.Array:
    """Set a border frame to -1 (reference export_onnx_with_plugin.py:114-117,
    demo/superpoint_mono_trt.cpp:167-180)."""
    b, h, w = scores.shape
    row = jnp.arange(h)[None, :, None]
    col = jnp.arange(w)[None, None, :]
    inside = (
        (row >= border) & (row < h - border) & (col >= border) & (col < w - border)
    )
    return jnp.where(inside, scores, -1.0)


def sample_descriptors(
    keypoints: jax.Array, desc_map: jax.Array, s: int = 8
) -> jax.Array:
    """Bilinear descriptor sampling at sub-pixel keypoint locations.

    Replicates torch grid_sample(align_corners=True) composed with the
    reference's coordinate transform (superpoint.py:72-87):
      k' = k - s/2 + 0.5;  g = k' / (dim*s - s/2 - 0.5) * 2 - 1
      p = (g + 1) / 2 * (dim - 1)          [align_corners=True]
    which collapses to p = (k - (s/2 - 0.5)) / (dim*s - s/2 - 0.5) * (dim - 1).

    Implementation: four ``take_along_axis`` row gathers + a bilinear lerp.
    A one-hot interpolation-matmul form (build a (K, h*w) matrix of the 4
    bilinear coefficients by iota-compare, let the MXU do the gather) was
    prototyped and benchmarked (scripts/attrib_sp.py history); in-model it
    did NOT beat the gathers once the two-stage NMS top-k landed — the
    dominant extraction cost was the top-k sort, not this sampling. The
    gathers are kept as the simpler exact form.

    Args:
      keypoints: (B, K, 2) pixel (x, y) in the full-resolution image.
      desc_map: (B, h, w, C) dense descriptor map (stride-s grid).

    Returns:
      (B, K, C) L2-normalized descriptors.
    """
    b, h, w, c = desc_map.shape
    off = s / 2.0 - 0.5
    px = (keypoints[..., 0] - off) / (w * s - s / 2.0 - 0.5) * (w - 1)
    py = (keypoints[..., 1] - off) / (h * s - s / 2.0 - 0.5) * (h - 1)
    px = jnp.clip(px, 0.0, w - 1.0)
    py = jnp.clip(py, 0.0, h - 1.0)

    x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, h - 2)
    fx = px - x0
    fy = py - y0

    def gather(yy, xx):
        flat = desc_map.reshape(b, h * w, c)
        idx = yy * w + xx  # (B, K)
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    d00 = gather(y0, x0)
    d01 = gather(y0, x0 + 1)
    d10 = gather(y0 + 1, x0)
    d11 = gather(y0 + 1, x0 + 1)
    fx_, fy_ = fx[..., None], fy[..., None]
    desc = (
        d00 * (1 - fy_) * (1 - fx_)
        + d01 * (1 - fy_) * fx_
        + d10 * fy_ * (1 - fx_)
        + d11 * fy_ * fx_
    )
    return desc * jax.lax.rsqrt(jnp.sum(desc * desc, axis=-1, keepdims=True) + 1e-12)


def _topk_nms_tiled(
    masked: jax.Array, k: int, h: int, w: int, tile: int = 8, cap: int = 4
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k over an NMS'd score map, ~20x cheaper than a full sort.

    A device sort over H*W (jax.lax.top_k) measured 0.68 ms for 480x640 on
    v5e — the single most expensive op of the whole extraction. But NMS
    radius 4 guarantees surviving maxima are >4 apart (Chebyshev), so an
    8x8 tile holds at most 4 of them: per-tile top-``cap`` by iterative
    max+mask (pure VPU reductions, no sort) followed by one top-k over the
    16x smaller candidate list is EXACT for every score above the detection
    threshold (suppressed pixels are exactly 0 and borders -1; only those
    can exceed the per-tile cap, and they are discarded by thresholding).

    Returns (values, flat_indices) like ``jax.lax.top_k`` over (B, H*W).
    """
    b = masked.shape[0]
    th, tw = h // tile, w // tile
    tiles = (
        masked.reshape(b, th, tile, tw, tile)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, th * tw, tile * tile)
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, tiles.shape, 2)
    vals, args = [], []
    t = tiles
    for _ in range(cap):
        v = jnp.max(t, axis=-1)
        a = jnp.argmax(t, axis=-1).astype(jnp.int32)
        vals.append(v)
        args.append(a)
        t = jnp.where(lane == a[..., None], -jnp.inf, t)
    cand_v = jnp.stack(vals, axis=-1)  # (B, T, cap)
    cand_a = jnp.stack(args, axis=-1)
    # intra-tile index -> global flat index
    trow = (jnp.arange(th * tw, dtype=jnp.int32) // tw)[None, :, None]
    tcol = (jnp.arange(th * tw, dtype=jnp.int32) % tw)[None, :, None]
    gy = trow * tile + cand_a // tile
    gx = tcol * tile + cand_a % tile
    cand_i = (gy * w + gx).reshape(b, th * tw * cap)
    cand_v = cand_v.reshape(b, th * tw * cap)
    return _topk_candidates(cand_v, cand_i, k)


def _topk_candidates(
    cand_v: jax.Array, cand_i: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k over a candidate list, chunked two-stage.

    Per-chunk top-k then a top-k over the chunks*k shortlist. Exact — any
    global top-k element is within its chunk's top-k — and chip-measured
    faster than the single sort over all candidates
    (golden/chip_r04/topk_ab.out: 0.08-0.12 vs 0.15-0.16 ms at
    19200 -> 1024). Tie ORDER at the k-th value can differ from the
    single-stage form (positions permute through the chunk sort) — the
    same implementation-undefined boundary the parity bar already
    attributes (tests/test_fullscale_parity.py)."""
    b, ncand = cand_v.shape
    chunks = 4
    if ncand % chunks == 0 and ncand // chunks >= k:
        cv = cand_v.reshape(b * chunks, ncand // chunks)
        ci = cand_i.reshape(b * chunks, ncand // chunks)
        sv, ss = jax.lax.top_k(cv, k)
        si = jnp.take_along_axis(ci, ss, axis=1)
        cand_v = sv.reshape(b, chunks * k)
        cand_i = si.reshape(b, chunks * k)
    top_v, sel = jax.lax.top_k(cand_v, k)
    top_i = jnp.take_along_axis(cand_i, sel, axis=1)
    return top_v, top_i


def normalize_keypoints(
    keypoints: jax.Array, height: int, width: int
) -> jax.Array:
    """(x, y) pixels -> [-1, 1] by max(h, w)/2 around the image center
    (reference export_onnx_with_plugin.py:14-23)."""
    size = jnp.asarray([width, height], dtype=jnp.float32)
    shift = size / 2.0
    scale = jnp.max(size) / 2.0
    return (keypoints - shift) / scale


def extract_keypoints(
    scores: jax.Array,
    desc_map: jax.Array,
    *,
    config: SuperPointConfig = SuperPointConfig(),
    k: int | None = None,
    raw_scores: bool = False,
) -> Extraction:
    """Select top-k keypoints from a dense score map, device-side.

    Args:
      scores: (B, H, W) from ``models.superpoint.forward`` — NMS'd by
        default, or RAW (``forward(..., nms=False)``) with
        ``raw_scores=True``, in which case NMS + border + tile-candidate
        selection run fused in one Pallas kernel
        (``kernels.nms.nms_candidates``) — the extraction hot path.
      desc_map: (B, H/8, W/8, C) dense descriptors from the same forward.
      k: fixed keypoint capacity (defaults to config.max_num_keypoints).
    """
    k = k or config.max_num_keypoints
    b, h, w = scores.shape

    # NMS radius r leaves survivors pairwise > r apart, so a 4x4 tile with
    # cap=1 (single max, no suppress rounds) is also exact for r >= 3 — but
    # it LOSES on the chip (0.24 vs 0.20 ms standalone): the 16-lane tile
    # rows waste 7/8 of every VPU op, which costs more than the three
    # saved max/argmax/where rounds. Measured 2026-08-20; the tile=4 form
    # stays available (and tested) via the tile/cap args.
    tile, cap = 8, 4
    tiled_ok = (
        config.detection_threshold > 0  # below-threshold ties may reorder
        and config.nms_radius >= tile // 2  # cap-4-per-tile guarantee
        and h % tile == 0
        and w % tile == 0
        and (h // tile) * (w // tile) * cap >= k
    )
    # r4 hedged this to w % 128 == 0 on TPU (Mosaic whole-dim lane padding
    # at odd widths was unproven on hardware); r5 chip evidence removed the
    # hedge: the fused kernel matches the dense path candidate-for-
    # candidate at 480x600 AND 360x488 on the real chip
    # (golden/chip_r05/oddwidth.out: UNHEDGE_OK, scripts/chip_oddwidth.py)
    fused_ok = tiled_ok
    if raw_scores and fused_ok:
        from lightglue_tpu.kernels.nms import nms_candidates

        cand_v, cand_i = nms_candidates(
            scores,
            nms_radius=config.nms_radius,
            border=config.remove_borders,
            cap=cap,
        )
        top_scores, top_idx = _topk_candidates(cand_v, cand_i, k)
    else:
        if raw_scores:
            from lightglue_tpu.kernels.nms import simple_nms

            scores = simple_nms(scores, config.nms_radius)
        masked = mask_borders(
            scores.astype(jnp.float32), config.remove_borders
        )
        if tiled_ok:
            top_scores, top_idx = _topk_nms_tiled(masked, k, h, w, tile, cap)
        else:
            flat = masked.reshape(b, h * w)
            top_scores, top_idx = jax.lax.top_k(flat, k)  # descending
    ys = (top_idx // w).astype(jnp.float32)
    xs = (top_idx % w).astype(jnp.float32)
    kpts = jnp.stack([xs, ys], axis=-1)  # (x, y) column-first, like the
    # reference's .flip(1) on nonzero output (export_onnx_with_plugin.py:120)

    valid = top_scores > config.detection_threshold
    count = jnp.sum(valid.astype(jnp.int32), axis=-1)

    desc = sample_descriptors(kpts, desc_map, config.stride)
    kpts_norm = normalize_keypoints(kpts, h, w)

    # Keep padded slots harmless: zero descriptors, clamp coords to center.
    desc = jnp.where(valid[..., None], desc, 0.0)
    kpts_norm = jnp.where(valid[..., None], kpts_norm, 0.0)
    return Extraction(kpts, kpts_norm, desc, top_scores, valid, count)
