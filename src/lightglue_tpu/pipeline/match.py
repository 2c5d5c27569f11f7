"""Mutual-nearest-neighbor match filtering, device-side with static shapes.

The analog of the reference's LibTorch GPU post-process
(demo/lightglue_trt.cpp:291-345) and the Python ``filter_matches``
(lightglue_pytorch_with_plugin/lightglue.py:265-288): row/col argmax over the
log-assignment matrix, mutual check via gather, exp(score) thresholding.
Where the reference materializes a variable-length index list with
``masked_select``, this returns a fixed-capacity (K, 2) match table ordered
by confidence plus a validity mask — no dynamic shapes, no host round-trip.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class Matches(NamedTuple):
    indices: jax.Array  # (B, K, 2) int32 [idx_in_image0, idx_in_image1]
    scores: jax.Array   # (B, K) fp32 exp'd match confidence (descending)
    mask: jax.Array     # (B, K) bool validity
    count: jax.Array    # (B,) int32 number of valid matches


def filter_matches(
    scores: jax.Array,
    threshold: float = 0.1,
    max_matches: int = 1024,
    mask0: Optional[jax.Array] = None,
) -> Matches:
    """Extract mutual-NN matches from a (B, M, N) log assignment matrix.

    Padded rows/columns must already carry -inf scores (the model's match
    head guarantees this), so they can never win an argmax.
    """
    b, m, n = scores.shape
    max0_val = jnp.max(scores, axis=2)            # (B, M) best score per row
    m0 = jnp.argmax(scores, axis=2)               # (B, M) best col per row
    m1 = jnp.argmax(scores, axis=1)               # (B, N) best row per col

    # mutual: row i's best col j must point back at i
    # (reference lightglue.py:270-272 / lightglue_trt.cpp:317-324)
    back = jnp.take_along_axis(m1, m0, axis=1)    # (B, M)
    mutual = back == jnp.arange(m)[None, :]

    probs = jnp.exp(max0_val.astype(jnp.float32))
    mscores = jnp.where(mutual, probs, 0.0)
    if mask0 is not None:
        mscores = jnp.where(mask0, mscores, 0.0)
    valid = mscores > threshold

    k = min(max_matches, m)
    sel_scores, sel_rows = jax.lax.top_k(jnp.where(valid, mscores, -1.0), k)
    sel_cols = jnp.take_along_axis(m0, sel_rows, axis=1)
    sel_valid = sel_scores > threshold
    count = jnp.sum(sel_valid.astype(jnp.int32), axis=-1)

    indices = jnp.stack(
        [sel_rows.astype(jnp.int32), sel_cols.astype(jnp.int32)], axis=-1
    )
    indices = jnp.where(sel_valid[..., None], indices, -1)
    return Matches(indices, jnp.maximum(sel_scores, 0.0), sel_valid, count)
