"""Non-maximum suppression for dense score maps.

XLA-native re-design of the reference's ``simple_nms``
(lightglue_pytorch_with_plugin/superpoint.py:52-69): the max_pool2d calls map
onto ``lax.reduce_window`` which XLA lowers to fused VPU reductions — no
custom kernel needed (SURVEY.md §7: "NMS via lax.reduce_window — XLA-native,
Pallas only if needed").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _max_pool_same(x: jax.Array, radius: int) -> jax.Array:
    """Sliding-window max with SAME padding over the last two dims of (B, H, W).

    Max is separable: a (2r+1, 2r+1) window is a row pass then a column
    pass — 2(2r+1) comparisons per pixel instead of (2r+1)^2 (18 vs 81 at
    the SuperPoint radius 4). XLA lowers each 1-D reduce_window to VPU
    shift-max chains; it does not separate the 2-D form itself (chip A/B:
    golden/chip_r03, scripts/attrib_sp.py extract)."""
    k = 2 * radius + 1
    rows = jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, k, 1),
        window_strides=(1, 1, 1),
        padding="SAME",
    )
    return jax.lax.reduce_window(
        rows,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 1, k),
        window_strides=(1, 1, 1),
        padding="SAME",
    )


def simple_nms(scores: jax.Array, nms_radius: int = 4) -> jax.Array:
    """Iterative NMS identical in semantics to reference superpoint.py:52-69.

    Keeps a pixel iff it is the max of its (2r+1)^2 neighborhood, with two
    refinement rounds that re-admit maxima of the suppressed-score map.

    Args:
      scores: (B, H, W) dense detection scores.
    """
    assert nms_radius >= 0
    zeros = jnp.zeros_like(scores)
    max_mask = scores == _max_pool_same(scores, nms_radius)
    for _ in range(2):
        supp_mask = _max_pool_same(max_mask.astype(scores.dtype), nms_radius) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == _max_pool_same(supp_scores, nms_radius)
        max_mask = max_mask | (new_max_mask & (~supp_mask))
    return jnp.where(max_mask, scores, zeros)
