"""LightGlue transformer matcher as pure-pytree JAX functions.

TPU-first re-design of the reference PyTorch model
(lightglue_pytorch_with_plugin/lightglue.py:65-384). Architectural contract
honored (SURVEY.md §2.3):

- learnable Fourier positional encoding: Wr 2->head_dim/2, cos/sin duplicated
  pairwise to head_dim (lightglue.py:65-84), applied as interleaved-pair RoPE
  (t*cos + rotate_half(t)*sin, lightglue.py:154-165) to q and k in
  self-attention only;
- SelfBlock: fused Wqkv 256->768, out_proj, FFN cat(x, message) ->
  512->512 -> LayerNorm -> GELU -> 512->256 with residual (lightglue.py:127-152);
- CrossBlock: shared to_qk projection used as both query and key
  (bidirectional symmetric attention), to_v / to_out, same FFN
  (lightglue.py:177-205);
- MatchAssignment: final_proj scaled by dim**0.25 each side, dual log_softmax
  + log-sigmoid matchability (lightglue.py:229-258);
- TokenConfidence head for adaptive depth (lightglue.py:87-99) — compiled out
  of the reference's exported graph, implemented device-side here.

Differences by design (not omissions):
- All 9 layers run under one ``lax.scan`` over stacked parameters — one
  compiled layer body instead of 9 unrolled ones.
- Batched over image pairs (leading B axis) with per-pair true keypoint
  counts; padded keypoints are masked inside the attention kernel and the
  match head instead of shipping exact-shape tensors like the reference's
  dynamic ONNX axes.
- Adaptive depth runs as a ``lax.while_loop`` (see ``forward_adaptive``) with
  no host round-trip.

Parameter layout: weights are stored (in_features, out_features) so the
forward is ``x @ w + b`` (torch stores the transpose). The fused Wqkv is
pre-split at load time into component-major columns [q | k | v], each
(in, heads*head_dim) with head-major layout — the torch packing is
(head, head_dim, 3)-interleaved (lightglue.py:140-142); see
``runtime/weights.py`` for the conversion.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from lightglue_tpu.config import LightGlueConfig
from lightglue_tpu.kernels.attention import (
    bidirectional_cross_attention,
    flash_attention,
    fused_mha,
)
from lightglue_tpu.kernels import layer_stack

from lightglue_tpu.precision import DTypePolicy

# beyond this the bidirectional kernel's full S tile would overflow VMEM;
# LightGlue buckets (<= 1024) always fit. (Measured in-model: the shared-S
# kernel beats two fused_mha calls by ~9% end-to-end despite its slower
# cross-sublane axis-0 softmax, because it also removes the kv-swap gathers.)
_BIDIR_MAX_N = 1024

_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def _weight(p, dtype):
    """Weight fetch with transparent int8 weight-only dequantization (the
    TRT-"best"-engine analog, see quant.py): XLA fuses the scale multiply
    into the weight load."""
    if "w_q" in p:
        return (p["w_q"].astype(jnp.float32) * p["scale"]).astype(dtype)
    return p["w"].astype(dtype)


def _out_features(p) -> int:
    return (p["w_q"] if "w_q" in p else p["w"]).shape[-1]


def _linear(p, x):
    return x @ _weight(p, x.dtype) + p["b"].astype(x.dtype)


def _linear_rowshard(p, x, tp_axis):
    """Row-sharded linear: x holds the local feature slice, w the matching
    row slice; partial products are summed over the tensor-parallel axis."""
    partial = x @ _weight(p, x.dtype)
    if tp_axis is not None:
        partial = jax.lax.psum(partial, tp_axis)
    return partial + p["b"].astype(x.dtype)


def _layer_norm(g, b, x, eps: float = 1e-5, tp_axis=None, global_dim=None):
    """LayerNorm over the full feature dim. Under tensor parallelism x is a
    feature slice; the mean/var reduce via psum so no all-gather is needed."""
    xf = x.astype(jnp.float32)
    if tp_axis is None:
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    else:
        n = global_dim
        s = jax.lax.psum(jnp.sum(xf, axis=-1, keepdims=True), tp_axis)
        ss = jax.lax.psum(jnp.sum(jnp.square(xf), axis=-1, keepdims=True), tp_axis)
        mean = s / n
        var = ss / n - jnp.square(mean)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed * g + b).astype(x.dtype)


def posenc(p, kpts: jax.Array, head_dim: int) -> jax.Array:
    """Learnable Fourier positional encoding -> (B, 2, N, head_dim).

    reference lightglue.py:75-84: project (x, y) to head_dim/2 frequencies
    and take cos/sin. The reference duplicates each frequency *pairwise*
    ([f0,f0,f1,f1,...]) to pair with interleaved RoPE; here frequencies are
    *tiled* ([f0..f31,f0..f31]) to pair with the half-split RoPE layout the
    q/k weights are permuted into at load time
    (runtime/weights.py:rope_permutation) — exactly equivalent math, but the
    rotation becomes a lane-block swap the VPU does nearly for free.
    """
    projected = kpts @ p["wr"]  # (B, N, head_dim//2)
    emb = jnp.stack([jnp.cos(projected), jnp.sin(projected)], axis=1)
    emb = jnp.concatenate([emb, emb], axis=-1)  # (B, 2, N, head_dim), tiled
    return emb


def rotate_half(t: jax.Array) -> jax.Array:
    """Half-split rotation: (..., [x, y]) halves -> (..., [-y, x]).

    Composed with the load-time de-interleave permutation of the q/k
    weights this equals the reference's interleaved-pair rotation
    (lightglue.py:154-159); see runtime/weights.py:rope_permutation.
    """
    half = t.shape[-1] // 2
    return jnp.concatenate([-t[..., half:], t[..., :half]], axis=-1)


def apply_rotary(freqs: jax.Array, t: jax.Array) -> jax.Array:
    """t*cos + rotate_half(t)*sin, freqs (B, 2, N, D) onto t (B, H, N, D).

    Kept for the generic/off-kernel path; the model applies RoPE inside
    ``fused_mha``."""
    cos = freqs[:, 0][:, None, :, :]
    sin = freqs[:, 1][:, None, :, :]
    return t * cos.astype(t.dtype) + rotate_half(t) * sin.astype(t.dtype)


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """(B, N, H*D) -> (B, H, N, D) with head-major columns."""
    b, n, hd = x.shape
    return x.reshape(b, n, num_heads, hd // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    """(B, H, N, D) -> (B, N, H*D)."""
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def _attend(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    lengths: Optional[jax.Array],
    policy: DTypePolicy,
    num_heads: int,
    freqs: Optional[jax.Array] = None,
) -> jax.Array:
    """(B, N, H*D) q/k/v -> (B, N, H*D) via the fused kernel (no head
    transposes anywhere); optional in-kernel rotary (freqs (B, 2, N, D))."""
    out = fused_mha(
        q.astype(policy.attn_in_dtype),
        k.astype(policy.attn_in_dtype),
        v.astype(policy.attn_in_dtype),
        freqs,
        lengths,
        num_heads=num_heads,
        stat_dtype=policy.attn_stat_dtype,
        out_dtype=policy.attn_out_dtype,
    )
    return out.astype(q.dtype)


def _ffn(p, x: jax.Array, message: jax.Array, tp_axis=None, ffn_dim=None) -> jax.Array:
    """Residual FFN over cat(x, message) (reference lightglue.py:130-135,152).

    Under tensor parallelism ffn1 is column-sharded and ffn2 row-sharded;
    the LayerNorm between them reduces its statistics with a psum, so the
    whole FFN costs a single activation all-reduce (the ffn2 output).
    """
    h = jnp.concatenate([x, message], axis=-1)
    h = _linear(p["ffn1"], h)
    h = _layer_norm(
        p["ln_g"], p["ln_b"], h, tp_axis=tp_axis, global_dim=ffn_dim
    )
    h = jax.nn.gelu(h, approximate=False)
    h = _linear_rowshard(p["ffn2"], h, tp_axis)
    return x + h


def self_block(
    p,
    x: jax.Array,
    freqs: jax.Array,
    lengths: Optional[jax.Array],
    num_heads: int,
    policy: DTypePolicy,
    tp_axis=None,
    ffn_dim=None,
) -> jax.Array:
    """Self-attention block (reference lightglue.py:118-152).

    ``num_heads`` is the *local* head count under tensor parallelism (the
    'model' axis shards whole heads; qkv columns are head-major so the
    sharded weight slice is exactly the local heads' projection).
    """
    # qkv weight is (3, E, E) component-major with head-major output columns,
    # so a 'model'-axis sharding of the last dim is whole-head aligned.
    # ``freqs`` is (B, 2, N, D); the rotary embedding is applied to q and k
    # inside the attention kernel (half-split layout, weights pre-permuted).
    # q/k/v stay in activation layout (B, N, H*D) end to end.
    qkv = (
        jnp.einsum("bni,cio->cbno", x, _weight(p["qkv"], x.dtype))
        + p["qkv"]["b"].astype(x.dtype)[:, None, None, :]
    )
    lens2 = None if lengths is None else jnp.stack([lengths, lengths], axis=-1)
    context = _attend(qkv[0], qkv[1], qkv[2], lens2, policy, num_heads, freqs)
    message = _linear_rowshard(p["out"], context, tp_axis)
    return _ffn(p, x, message, tp_axis, ffn_dim)


def cross_block(
    p,
    x0: jax.Array,
    x1: jax.Array,
    lengths0: Optional[jax.Array],
    lengths1: Optional[jax.Array],
    num_heads: int,
    policy: DTypePolicy,
    tp_axis=None,
    ffn_dim=None,
) -> Tuple[jax.Array, jax.Array]:
    """Bidirectional symmetric cross-attention (reference lightglue.py:168-205).

    One shared projection produces both the queries and keys of either side.
    """
    qk0 = _linear(p["qk"], x0)
    qk1 = _linear(p["qk"], x1)
    v0 = _linear(p["v"], x0)
    v1 = _linear(p["v"], x1)
    m0, m1 = _cross_attend(
        qk0, qk1, v0, v1, lengths0, lengths1, policy, num_heads
    )
    m0 = _linear_rowshard(p["out"], m0, tp_axis)
    m1 = _linear_rowshard(p["out"], m1, tp_axis)
    return _ffn(p, x0, m0, tp_axis, ffn_dim), _ffn(p, x1, m1, tp_axis, ffn_dim)


def _cross_attend(qk0, qk1, v0, v1, lengths0, lengths1, policy, num_heads):
    """Bidirectional cross-attention over (B, N, H*D) activations
    -> ((B, N0, H*D), (B, N1, H*D)).

    Uses the shared-S single-matmul kernel when both sequences fit VMEM,
    otherwise two streaming fused_mha calls."""
    n0, n1 = qk0.shape[1], qk1.shape[1]
    dt = policy.attn_in_dtype
    if max(n0, n1) <= _BIDIR_MAX_N:
        lens = (
            None
            if lengths0 is None
            else jnp.stack([lengths0, lengths1], axis=-1)
        )
        m0, m1 = bidirectional_cross_attention(
            qk0.astype(dt),
            qk1.astype(dt),
            v0.astype(dt),
            v1.astype(dt),
            lens,
            num_heads=num_heads,
            stat_dtype=policy.attn_stat_dtype,
            out_dtype=policy.attn_out_dtype,
        )
        return m0.astype(qk0.dtype), m1.astype(qk0.dtype)
    if lengths0 is None:
        l01 = l10 = None
    else:
        l01 = jnp.stack([lengths0, lengths1], axis=-1)
        l10 = jnp.stack([lengths1, lengths0], axis=-1)
    m0 = _attend(qk0, qk1, v1, l01, policy, num_heads)
    m1 = _attend(qk1, qk0, v0, l10, policy, num_heads)
    return m0, m1


def transformer_layer(
    p,
    d0: jax.Array,
    d1: jax.Array,
    freqs0: jax.Array,
    freqs1: jax.Array,
    lengths0: Optional[jax.Array],
    lengths1: Optional[jax.Array],
    num_heads: int,
    policy: DTypePolicy,
    tp_axis=None,
    ffn_dim=None,
) -> Tuple[jax.Array, jax.Array]:
    """self(d0) -> self(d1) -> cross (reference lightglue.py:208-226).

    TPU-first restructuring: when both images share a bucket (the common
    case), the two self blocks and the two cross directions are each fused
    into ONE batched call by stacking images on the batch axis — identical
    math (parameters are shared across images, reference lightglue.py:224-226),
    half the kernel launches, and matmuls twice as tall for the MXU. Falls
    back to sequential blocks when buckets differ.
    """
    if d0.shape == d1.shape:
        b = d0.shape[0]
        x = jnp.concatenate([d0, d1], axis=0)           # (2B, N, E)
        freqs = jnp.concatenate([freqs0, freqs1], axis=0)
        if lengths0 is None:
            lens = None
        else:
            lens = jnp.concatenate([lengths0, lengths1], axis=0)
        x = self_block(
            p["self_attn"], x, freqs, lens, num_heads, policy, tp_axis, ffn_dim
        )
        x0, x1 = cross_block_fused(
            p["cross_attn"], x, b, lens, num_heads, policy, tp_axis, ffn_dim
        )
        return x0, x1
    d0 = self_block(
        p["self_attn"], d0, freqs0, lengths0, num_heads, policy, tp_axis, ffn_dim
    )
    d1 = self_block(
        p["self_attn"], d1, freqs1, lengths1, num_heads, policy, tp_axis, ffn_dim
    )
    return cross_block(
        p["cross_attn"], d0, d1, lengths0, lengths1, num_heads, policy,
        tp_axis, ffn_dim,
    )


def cross_block_fused(
    p,
    x: jax.Array,
    b: int,
    lens: Optional[jax.Array],
    num_heads: int,
    policy: DTypePolicy,
    tp_axis=None,
    ffn_dim=None,
) -> Tuple[jax.Array, jax.Array]:
    """Both cross-attention directions of a stacked [image0; image1] batch.

    Projections run once over the 2B stack; the attention itself goes
    through ``_cross_attend`` (the shared-S bidirectional kernel when the
    sequences fit VMEM).
    """
    qk = _linear(p["qk"], x)   # (2B, N, H*D)
    v = _linear(p["v"], x)
    m0, m1 = _cross_attend(
        qk[:b],
        qk[b:],
        v[:b],
        v[b:],
        None if lens is None else lens[:b],
        None if lens is None else lens[b:],
        policy,
        num_heads,
    )
    m = jnp.concatenate([m0, m1], axis=0)  # (2B, N, H*D)
    m = _linear_rowshard(p["out"], m, tp_axis)
    out = _ffn(p, x, m, tp_axis, ffn_dim)
    return out[:b], out[b:]


def _linear_maybe_batched(p, x):
    """Linear whose weights may carry a leading per-batch axis (used when
    each pair exits at its own adaptive depth and thus uses its own
    assignment head)."""
    w, bias = _weight(p, x.dtype), p["b"]
    if w.ndim == x.ndim:  # (B, in, out) @ (B, N, in)
        return jnp.einsum("bni,bio->bno", x, w) + bias.astype(x.dtype)[
            :, None, :
        ]
    return _linear(p, x)


def match_assignment(
    p,
    d0: jax.Array,
    d1: jax.Array,
    mask0: Optional[jax.Array],
    mask1: Optional[jax.Array],
    dim: int,
) -> jax.Array:
    """Log assignment matrix (reference lightglue.py:229-258).

    scores = log_softmax(sim, cols) + log_softmax(sim, rows)
           + logsigmoid(z0) + logsigmoid(z1)^T

    Softmax math runs in fp32 regardless of activation dtype; padded rows /
    columns are excluded from the softmaxes and forced to -inf so the match
    filter can never select them (the reference needs no masking because it
    ships exact shapes).
    """
    scale = float(dim) ** 0.25
    # operands stay in the activation dtype (the fp16 TRT engine computes
    # this matmul in fp16 too); accumulation is fp32, softmax math fp32
    md0 = _linear_maybe_batched(p["proj"], d0) / jnp.asarray(scale, d0.dtype)
    md1 = _linear_maybe_batched(p["proj"], d1) / jnp.asarray(scale, d1.dtype)
    sim = jnp.einsum("bmd,bnd->bmn", md0, md1, preferred_element_type=jnp.float32)
    z0 = _linear_maybe_batched(p["match"], d0).astype(jnp.float32)  # (B, M, 1)
    z1 = _linear_maybe_batched(p["match"], d1).astype(jnp.float32)  # (B, N, 1)
    certainties = jax.nn.log_sigmoid(z0) + jnp.swapaxes(
        jax.nn.log_sigmoid(z1), -1, -2
    )
    if mask1 is not None:
        sim = jnp.where(mask1[:, None, :], sim, _NEG_INF)
    scores0 = jax.nn.log_softmax(sim, axis=2)
    if mask0 is not None:
        sim = jnp.where(mask0[:, :, None], sim, _NEG_INF)
    scores1 = jax.nn.log_softmax(sim, axis=1)
    scores = scores0 + scores1 + certainties
    if mask0 is not None:
        scores = jnp.where(mask0[:, :, None], scores, _NEG_INF)
    if mask1 is not None:
        scores = jnp.where(mask1[:, None, :], scores, _NEG_INF)
    return scores


def token_confidence(p, d0: jax.Array, d1: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-token confidence in [0, 1] (reference lightglue.py:87-99)."""
    c0 = jax.nn.sigmoid(_linear(p, d0))[..., 0]
    c1 = jax.nn.sigmoid(_linear(p, d1))[..., 0]
    return c0, c1


def matchability(p, d: jax.Array) -> jax.Array:
    """sigmoid(matchability logit) (reference lightglue.py:260-262)."""
    return jax.nn.sigmoid(_linear(p["match"], d).astype(jnp.float32))[..., 0]


# ---------------------------------------------------------------------------
# full forward
# ---------------------------------------------------------------------------


class LightGlueOutput(NamedTuple):
    desc0: jax.Array    # (B, M, E) final descriptors, image 0
    desc1: jax.Array    # (B, N, E) final descriptors, image 1
    scores: jax.Array   # (B, M, N) log assignment matrix
    n_layers_run: jax.Array  # (B,) or scalar: layers executed (adaptive depth)


def _masks_from_lengths(
    lengths0: Optional[jax.Array],
    lengths1: Optional[jax.Array],
    m: int,
    n: int,
):
    mask0 = (
        None
        if lengths0 is None
        else jnp.arange(m)[None, :] < lengths0[:, None]
    )
    mask1 = (
        None
        if lengths1 is None
        else jnp.arange(n)[None, :] < lengths1[:, None]
    )
    return mask0, mask1


def forward(
    params,
    kpts0: jax.Array,
    kpts1: jax.Array,
    desc0: jax.Array,
    desc1: jax.Array,
    lengths0: Optional[jax.Array] = None,
    lengths1: Optional[jax.Array] = None,
    *,
    config: LightGlueConfig,
    policy: DTypePolicy,
    tp_axis: Optional[str] = None,
) -> LightGlueOutput:
    """Fixed-depth forward: all layers, last-layer assignment only — exactly
    the reference's exported graph (lightglue.py:359-384).

    Args:
      params: pytree from ``runtime.weights`` (layers stacked on axis 0).
        Under ``tp_axis`` (inside shard_map) the attention/FFN weights are
        the local 'model'-axis slices; heads are inferred from their shapes.
      kpts0/kpts1: (B, M, 2) / (B, N, 2) keypoints normalized to [-1, 1].
      desc0/desc1: (B, M, E) / (B, N, E) descriptors.
      lengths0/lengths1: optional (B,) true keypoint counts (bucketed pads).
      tp_axis: shard_map mesh axis name for tensor parallelism, or None.
    """
    with jax.default_matmul_precision(policy.matmul_precision):
        return _forward_impl(
            params, kpts0, kpts1, desc0, desc1, lengths0, lengths1,
            config=config, policy=policy, tp_axis=tp_axis,
        )


def _forward_impl(
    params, kpts0, kpts1, desc0, desc1, lengths0, lengths1,
    *, config, policy, tp_axis,
):
    # local head count: the 'model' axis shards whole heads
    num_heads = (
        _out_features(params["layers"]["self_attn"]["qkv"]) // config.head_dim
    )
    ffn_dim = 2 * config.descriptor_dim
    act = policy.act_dtype
    d0 = desc0.astype(act)
    d1 = desc1.astype(act)
    if "input_proj" in params:  # non-superpoint features (input_dim != E)
        d0 = _linear(params["input_proj"], d0)
        d1 = _linear(params["input_proj"], d1)
    freqs0 = posenc(params["posenc"], kpts0.astype(jnp.float32), config.head_dim)
    freqs1 = posenc(params["posenc"], kpts1.astype(jnp.float32), config.head_dim)

    if layer_stack.supports(
        params["layers"], d0.shape[1], d1.shape[1], d0.dtype, tp_axis
    ):
        # the whole 9-layer stack as ONE megakernel: activations stay
        # VMEM-resident across layers, per-layer weights stream from HBM
        # (kernels/layer_stack.py — measured ~1.6x over per-block kernels)
        d0, d1 = layer_stack.transformer_stack(
            params["layers"],
            d0,
            d1,
            freqs0,
            freqs1,
            lengths0,
            lengths1,
            num_heads=num_heads,
            head_dim=config.head_dim,
            stat_dtype=policy.attn_stat_dtype,
            attn_dtype=policy.attn_in_dtype,
        )
    else:

        def body(carry, layer_params):
            c0, c1 = carry
            c0, c1 = transformer_layer(
                layer_params,
                c0,
                c1,
                freqs0,
                freqs1,
                lengths0,
                lengths1,
                num_heads,
                policy,
                tp_axis,
                ffn_dim,
            )
            return (c0, c1), None

        (d0, d1), _ = jax.lax.scan(body, (d0, d1), params["layers"])

    mask0, mask1 = _masks_from_lengths(
        lengths0, lengths1, kpts0.shape[1], kpts1.shape[1]
    )
    last_assign = jax.tree.map(lambda a: a[-1], params["assign"])
    scores = match_assignment(
        last_assign, d0, d1, mask0, mask1, config.descriptor_dim
    )
    return LightGlueOutput(d0, d1, scores, jnp.asarray(config.n_layers))


def _rope_heads(t: jax.Array, freqs: jax.Array) -> jax.Array:
    """Half-split rotary on (B, H, N, D) heads; ``freqs`` is the (B, 2, N, D)
    tiled per-half [cos; sin] posenc output (q/k weights carry the load-time
    de-interleave permutation, runtime/weights.py:rope_permutation)."""
    half = t.shape[-1] // 2
    cos = freqs[:, 0][:, None].astype(t.dtype)  # (B, 1, N, D)
    sin = freqs[:, 1][:, None].astype(t.dtype)
    rot = jnp.concatenate([-t[..., half:], t[..., :half]], axis=-1)
    return t * cos + rot * sin


def forward_ring(
    params,
    kpts0: jax.Array,
    kpts1: jax.Array,
    desc0: jax.Array,
    desc1: jax.Array,
    lengths0: Optional[jax.Array] = None,
    lengths1: Optional[jax.Array] = None,
    *,
    config: LightGlueConfig,
    policy: DTypePolicy,
    mesh,
) -> LightGlueOutput:
    """Sequence-parallel fixed-depth forward over a ``seq`` mesh axis.

    For keypoint counts beyond one chip (the reference caps N at 2048 per
    GPU, lightglue_attention_plugin.h:21; SURVEY.md §2.5 lists sequence
    parallelism with no reference counterpart): every self/cross attention
    rides ``parallel/ring.py`` — K/V blocks rotate around the mesh ring via
    ppermute while each device accumulates its Q stripe — and the per-token
    ops (projections, FFN, LayerNorm, rotary) shard trivially on the
    sequence axis. Semantically identical to ``forward`` (tests/test_ring.py
    model-level parity); rotary is applied in jnp before the ring instead of
    in-kernel.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lightglue_tpu.parallel import ring as _ring

    num_heads = config.num_heads
    ffn_dim = 2 * config.descriptor_dim
    act = policy.act_dtype
    seq_spec = P(None, _ring.AXIS_SEQ, None)

    def shard_seq(x):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, seq_spec)
        )

    def attend(q, k, v, freqs_qk, lq, lkv):
        dt_in = policy.attn_in_dtype
        qh = _split_heads(q.astype(dt_in), num_heads)
        kh = _split_heads(k.astype(dt_in), num_heads)
        vh = _split_heads(v.astype(dt_in), num_heads)
        if freqs_qk is not None:
            qh = _rope_heads(qh, freqs_qk)
            kh = _rope_heads(kh, freqs_qk)
        lens = (
            None
            if lq is None
            else jnp.stack([lq, lkv], axis=-1).astype(jnp.int32)
        )
        out = _ring.ring_attention(qh, kh, vh, lens, mesh=mesh)
        return _merge_heads(out).astype(q.dtype)

    with jax.default_matmul_precision(policy.matmul_precision):
        d0 = shard_seq(desc0.astype(act))
        d1 = shard_seq(desc1.astype(act))
        if "input_proj" in params:
            d0 = _linear(params["input_proj"], d0)
            d1 = _linear(params["input_proj"], d1)
        freqs0 = posenc(
            params["posenc"], kpts0.astype(jnp.float32), config.head_dim
        )
        freqs1 = posenc(
            params["posenc"], kpts1.astype(jnp.float32), config.head_dim
        )

        def body(carry, p):
            c0, c1 = carry
            sp, cp = p["self_attn"], p["cross_attn"]
            new = []
            for x, freqs, lens in (
                (c0, freqs0, lengths0),
                (c1, freqs1, lengths1),
            ):
                qkv = (
                    jnp.einsum("bni,cio->cbno", x, _weight(sp["qkv"], x.dtype))
                    + sp["qkv"]["b"].astype(x.dtype)[:, None, None, :]
                )
                ctx = attend(qkv[0], qkv[1], qkv[2], freqs, lens, lens)
                message = _linear(sp["out"], ctx)
                new.append(_ffn(sp, x, message, None, ffn_dim))
            c0, c1 = new
            qk0 = _linear(cp["qk"], c0)
            qk1 = _linear(cp["qk"], c1)
            v0 = _linear(cp["v"], c0)
            v1 = _linear(cp["v"], c1)
            m0 = attend(qk0, qk1, v1, None, lengths0, lengths1)
            m1 = attend(qk1, qk0, v0, None, lengths1, lengths0)
            m0 = _linear(cp["out"], m0)
            m1 = _linear(cp["out"], m1)
            c0 = _ffn(cp, c0, m0, None, ffn_dim)
            c1 = _ffn(cp, c1, m1, None, ffn_dim)
            return (shard_seq(c0), shard_seq(c1)), None

        (d0, d1), _ = jax.lax.scan(body, (d0, d1), params["layers"])

        mask0, mask1 = _masks_from_lengths(
            lengths0, lengths1, kpts0.shape[1], kpts1.shape[1]
        )
        last_assign = jax.tree.map(lambda a: a[-1], params["assign"])
        scores = match_assignment(
            last_assign, d0, d1, mask0, mask1, config.descriptor_dim
        )
    return LightGlueOutput(d0, d1, scores, jnp.asarray(config.n_layers))


# ---------------------------------------------------------------------------
# adaptive depth + width pruning (device-side, no host round-trips)
# ---------------------------------------------------------------------------


class AdaptiveOutput(NamedTuple):
    scores: jax.Array       # (B, M, N) log assignment over *compacted* slots
    index0: jax.Array       # (B, M) compacted slot -> original keypoint index
    index1: jax.Array       # (B, N)
    lengths0: jax.Array     # (B,) surviving keypoint counts after pruning
    lengths1: jax.Array     # (B,)
    exit_layer: jax.Array   # (B,) 1-based layer at which each pair exited


def confidence_threshold(layer_index, n_layers: int) -> jax.Array:
    """Per-layer early-exit threshold (upstream LightGlue schedule; the
    TokenConfidence machinery exists in the reference at lightglue.py:87-99 +
    300-301 but is compiled out of its exported graph)."""
    return jnp.clip(
        0.8 + 0.1 * jnp.exp(-4.0 * layer_index.astype(jnp.float32) / n_layers),
        0.0,
        1.0,
    )


def _compact(keep: jax.Array, length: jax.Array, *arrays):
    """Stable-partition kept tokens to the front; returns (new_length, order,
    gathered arrays). ``keep`` is (B, N) bool. Pure gather — shapes static,
    so this composes with the attention kernel's dynamic tail-tile skipping
    to turn pruning into real FLOP savings."""
    # stable argsort of (not keep): kept tokens first, original order preserved
    order = jnp.argsort(~keep, axis=-1, stable=True)  # (B, N)
    new_len = jnp.sum(keep.astype(jnp.int32), axis=-1)
    out = []
    for a in arrays:
        if a.ndim == 2:  # (B, N)
            out.append(jnp.take_along_axis(a, order, axis=1))
        elif a.ndim == 3:  # (B, N, C)
            out.append(jnp.take_along_axis(a, order[..., None], axis=1))
        else:  # (B, 2, N, C) positional-encoding freqs
            out.append(jnp.take_along_axis(a, order[:, None, :, None], axis=2))
    return new_len, order, out


def forward_adaptive(
    params,
    kpts0: jax.Array,
    kpts1: jax.Array,
    desc0: jax.Array,
    desc1: jax.Array,
    lengths0: jax.Array,
    lengths1: jax.Array,
    *,
    config: LightGlueConfig,
    policy: DTypePolicy,
    force_loop: bool = False,
    full: bool = False,
) -> AdaptiveOutput:
    """Adaptive-depth + keypoint-pruning forward, entirely on device.

    Semantics follow upstream LightGlue's ``depth_confidence`` /
    ``width_confidence`` knobs (present-but-disabled in the reference,
    lightglue.py:300-301, SURVEY.md §2.3 adaptive note):

    - after layer i, a pair stops early when the fraction of confident
      tokens exceeds ``depth_confidence`` — implemented as a
      ``lax.while_loop`` so remaining layers are genuinely skipped;
    - tokens that are confident *and* unmatchable are pruned — implemented
      as a stable compaction (gather to front + shorter true length) so the
      attention kernel skips their KV tiles, instead of the GPU reference
      pattern of materializing smaller dynamic shapes.

    With batch > 1 the loop runs until every pair has exited; pairs that
    stopped earlier have their state frozen (their extra layers are SPMD
    ballast, exact semantics preserved). Each pair's final assignment uses
    the assignment head of the layer it exited at, like upstream.
    """
    with jax.default_matmul_precision(policy.matmul_precision):
        return _forward_adaptive_impl(
            params, kpts0, kpts1, desc0, desc1, lengths0, lengths1,
            config=config, policy=policy, force_loop=force_loop, full=full,
        )


def _forward_adaptive_impl(
    params, kpts0, kpts1, desc0, desc1, lengths0, lengths1, *, config, policy,
    force_loop=False, full=False,
):
    n_layers = config.n_layers
    num_heads = (
        _out_features(params["layers"]["self_attn"]["qkv"]) // config.head_dim
    )
    ffn_dim = 2 * config.descriptor_dim
    do_depth = config.depth_confidence > 0
    do_width = config.width_confidence > 0
    act = policy.act_dtype

    b, m = desc0.shape[:2]
    n = desc1.shape[1]
    d0 = desc0.astype(act)
    d1 = desc1.astype(act)
    if "input_proj" in params:
        d0 = _linear(params["input_proj"], d0)
        d1 = _linear(params["input_proj"], d1)
    freqs0 = posenc(params["posenc"], kpts0.astype(jnp.float32), config.head_dim)
    freqs1 = posenc(params["posenc"], kpts1.astype(jnp.float32), config.head_dim)

    idx0 = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[None], (b, m))
    idx1 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))

    # adaptive on the megakernel path: the whole early-exit loop folds INTO
    # the single pallas_call (per-layer confidence head on VMEM-resident
    # activations, pl.when-gated layer steps) — no per-layer kernel
    # launches, no separate confidence matvecs, no loop carries. Width
    # pruning rides the same kernel as a cumulative in-kernel keep mask
    # (masked-in-place == compacted, attention being the only cross-token
    # op); ONE tail compaction below replaces the while_loop path's
    # per-layer argsort+gather rounds (27% exit-9 tax, VERDICT r3 weak #3).
    if (
        (do_depth or do_width)
        and not force_loop
        and lengths0 is not None
        and layer_stack.supports(params["layers"], m, n, act, None)
    ):
        # width without depth still rides the kernel: confidence 2.0 is
        # unreachable, so only the last layer forces the exit
        dc = float(config.depth_confidence) if do_depth else 2.0
        if do_width:
            ds = int(config.downshift_layer)
            use_ds = (
                0 < ds <= n_layers - 2
                and m == n
                and (m // 2) % 128 == 0
                and layer_stack.supports(params["layers"], m // 2, m // 2,
                                         act, None)
            )
            if use_ds:
                return _adaptive_downshift(
                    params, d0, d1, freqs0, freqs1, lengths0, lengths1,
                    idx0, idx1, ds=ds, dc=dc, m=m, n=n,
                    num_heads=num_heads, config=config, policy=policy,
                    n_layers=n_layers,
                )
            fd0, fd1, exit_layer, keepf0, keepf1 = (
                layer_stack.transformer_stack_adaptive(
                    params["layers"],
                    params["token"],
                    d0,
                    d1,
                    freqs0,
                    freqs1,
                    lengths0,
                    lengths1,
                    params["assign"]["match"],
                    num_heads=num_heads,
                    head_dim=config.head_dim,
                    depth_confidence=dc,
                    width_confidence=float(config.width_confidence),
                    stat_dtype=policy.attn_stat_dtype,
                    attn_dtype=policy.attn_in_dtype,
                )
            )
            keep0 = keepf0[:, :, 0] > 0.5
            keep1 = keepf1[:, :, 0] > 0.5
            nl0, _, (cd0, cidx0) = _compact(keep0, lengths0, fd0, idx0)
            nl1, _, (cd1, cidx1) = _compact(keep1, lengths1, fd1, idx1)
            final = dict(
                d0=cd0,
                d1=cd1,
                len0=nl0,
                len1=nl1,
                idx0=cidx0,
                idx1=cidx1,
                exit_layer=exit_layer,
            )
            return _adaptive_tail(params, final, m, n, config, n_layers)
        # full=True: every pair fills its bucket exactly (the session's
        # cap-full dispatch) — the masking wheres are no-ops and the
        # unmasked adaptive variant skips them (~5% of the step)
        fd0, fd1, exit_layer = layer_stack.transformer_stack_adaptive(
            params["layers"],
            params["token"],
            d0,
            d1,
            freqs0,
            freqs1,
            lengths0,
            lengths1,
            num_heads=num_heads,
            head_dim=config.head_dim,
            depth_confidence=dc,
            stat_dtype=policy.attn_stat_dtype,
            attn_dtype=policy.attn_in_dtype,
            masked=not full,
        )
        final = dict(
            d0=fd0,
            d1=fd1,
            len0=lengths0.astype(jnp.int32),
            len1=lengths1.astype(jnp.int32),
            idx0=idx0,
            idx1=idx1,
            exit_layer=exit_layer,
        )
        return _adaptive_tail(params, final, m, n, config, n_layers)

    state = dict(
        i=jnp.asarray(0, jnp.int32),
        d0=d0,
        d1=d1,
        freqs0=freqs0,
        freqs1=freqs1,
        len0=lengths0.astype(jnp.int32),
        len1=lengths1.astype(jnp.int32),
        idx0=idx0,
        idx1=idx1,
        stopped=jnp.zeros((b,), bool),
        exit_layer=jnp.full((b,), n_layers, jnp.int32),
    )

    def cond(s):
        return (s["i"] < n_layers) & ~jnp.all(s["stopped"])

    use_stack = layer_stack.supports(
        params["layers"], m, n, act, None
    )

    def body(s):
        i = s["i"]
        if use_stack:
            # one megakernel invocation per adaptive step: the whole layer
            # body (projections, rotary, bidirectional cross, FFNs) stays
            # VMEM-resident, with the layer's weights sliced dynamically —
            # the adaptive loop no longer pays the per-block fallback
            layer_p = jax.tree.map(
                lambda a: jax.lax.dynamic_slice_in_dim(a, i, 1, 0),
                params["layers"],
            )
            nd0, nd1 = layer_stack.transformer_stack(
                layer_p,
                s["d0"],
                s["d1"],
                s["freqs0"],
                s["freqs1"],
                s["len0"],
                s["len1"],
                num_heads=num_heads,
                head_dim=config.head_dim,
                stat_dtype=policy.attn_stat_dtype,
                attn_dtype=policy.attn_in_dtype,
            )
        else:
            layer_p = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False),
                params["layers"],
            )
            nd0, nd1 = transformer_layer(
                layer_p,
                s["d0"],
                s["d1"],
                s["freqs0"],
                s["freqs1"],
                s["len0"],
                s["len1"],
                num_heads,
                policy,
                None,
                ffn_dim,
            )
        # freeze pairs that already exited
        live = ~s["stopped"]
        nd0 = jnp.where(live[:, None, None], nd0, s["d0"])
        nd1 = jnp.where(live[:, None, None], nd1, s["d1"])

        mask0 = jnp.arange(m)[None, :] < s["len0"][:, None]
        mask1 = jnp.arange(n)[None, :] < s["len1"][:, None]

        new = dict(s)
        new["d0"], new["d1"] = nd0, nd1
        new["i"] = i + 1

        is_last = i >= n_layers - 1
        if do_depth or do_width:
            tok_p = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, jnp.minimum(i, n_layers - 2), 0, keepdims=False
                ),
                params["token"],
            )
            c0, c1 = token_confidence(tok_p, nd0, nd1)
            th = confidence_threshold(i, n_layers)

        if do_depth:
            conf0 = jnp.sum(((c0 >= th) & mask0).astype(jnp.float32), axis=-1)
            conf1 = jnp.sum(((c1 >= th) & mask1).astype(jnp.float32), axis=-1)
            total = jnp.maximum((s["len0"] + s["len1"]).astype(jnp.float32), 1.0)
            ratio = (conf0 + conf1) / total
            stop_now = live & ((ratio > config.depth_confidence) | is_last)
        else:
            stop_now = live & jnp.broadcast_to(is_last, (b,))
        new["exit_layer"] = jnp.where(stop_now, i + 1, s["exit_layer"])
        new["stopped"] = s["stopped"] | stop_now

        if do_width:
            assign_p = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False),
                params["assign"],
            )
            m0 = matchability(assign_p, nd0)
            m1 = matchability(assign_p, nd1)
            # keep matchable-or-unconfident tokens (upstream get_pruning_mask)
            keep0 = ((m0 > (1 - config.width_confidence)) | (c0 <= th)) & mask0
            keep1 = ((m1 > (1 - config.width_confidence)) | (c1 <= th)) & mask1
            # pairs that just stopped (or were stopped) keep everything
            prune_live = ~new["stopped"]
            keep0 = keep0 | ~prune_live[:, None] & mask0
            keep1 = keep1 | ~prune_live[:, None] & mask1

            def _do_compact(new_d0, new_d1, s_):
                nl0, _, (pd0, pf0, pidx0) = _compact(
                    keep0, s_["len0"], new_d0, s_["freqs0"], s_["idx0"]
                )
                nl1, _, (pd1, pf1, pidx1) = _compact(
                    keep1, s_["len1"], new_d1, s_["freqs1"], s_["idx1"]
                )
                return (pd0, pf0, pidx0, nl0, pd1, pf1, pidx1, nl1)

            def _no_compact(new_d0, new_d1, s_):
                return (
                    new_d0, s_["freqs0"], s_["idx0"], s_["len0"],
                    new_d1, s_["freqs1"], s_["idx1"], s_["len1"],
                )

            # the argsort + 8 gathers only pay when a token was actually
            # pruned this step — confident scenes at high width_confidence
            # prune rarely, and the no-prune steps were 40%+ of the
            # adaptive exit-9 tax (VERDICT r2 #6 / BENCH_r02)
            any_pruned = jnp.any(keep0 != mask0) | jnp.any(keep1 != mask1)
            (
                new["d0"], new["freqs0"], new["idx0"], new["len0"],
                new["d1"], new["freqs1"], new["idx1"], new["len1"],
            ) = jax.lax.cond(
                any_pruned, _do_compact, _no_compact, new["d0"], new["d1"], s
            )
        return new

    final = jax.lax.while_loop(cond, body, state)
    return _adaptive_tail(params, final, m, n, config, n_layers)


def _adaptive_downshift(
    params, d0, d1, freqs0, freqs1, lengths0, lengths1, idx0, idx1,
    *, ds, dc, m, n, num_heads, config, policy, n_layers,
):
    """Two-phase adaptive forward with a bucket-ladder downshift.

    Phase 1 runs layers [0, ds) in the full-width adaptive megakernel
    (in-kernel depth exit + width masks). The survivors are compacted, and
    a ``lax.cond`` picks phase 2's executable: the HALF-width megakernel
    when every pair's surviving count fits N/2, else the full-width one —
    both inside the same dispatch, so pruning converts into real
    wall-clock (attention is quadratic in the bucket) with no host round
    trip. Exact vs the single-phase path: compaction only reorders memory
    (attention is the only cross-token op) and both phases evaluate
    depth/width decisions at GLOBAL layer indices; the while_loop oracle
    (force_loop=True) remains the parity reference in tests.

    Upstream semantics anchor: lightglue.py:87-99,300-301 (pruning) — the
    downshift itself has no reference analog; the reference replays one
    CUDA graph at max shape regardless of counts (BASELINE.md).
    """
    wc = float(config.width_confidence)
    half = m // 2

    def _slice_layers(lo, hi):
        return jax.tree.map(lambda a: a[lo:hi], params["layers"])

    tok_w, tok_b = params["token"]["w"], params["token"]["b"]
    match_p = params["assign"]["match"]
    common = dict(
        num_heads=num_heads,
        head_dim=config.head_dim,
        depth_confidence=dc,
        width_confidence=wc,
        total_layers=n_layers,
        stat_dtype=policy.attn_stat_dtype,
        attn_dtype=policy.attn_in_dtype,
    )

    # ---- phase 1: layers [0, ds) at full width -------------------------
    fd0, fd1, exit1, kf0, kf1 = layer_stack.transformer_stack_adaptive(
        _slice_layers(0, ds),
        {"w": tok_w[:ds], "b": tok_b[:ds]},
        d0, d1, freqs0, freqs1, lengths0, lengths1,
        {"w": match_p["w"][:ds], "b": match_p["b"][:ds]},
        layer_offset=0,
        **common,
    )
    keep0 = kf0[:, :, 0] > 0.5
    keep1 = kf1[:, :, 0] > 0.5
    nl0, _, (cd0, cf0, cidx0) = _compact(keep0, lengths0, fd0, freqs0, idx0)
    nl1, _, (cd1, cf1, cidx1) = _compact(keep1, lengths1, fd1, freqs1, idx1)
    # sentinel n_layers+1 = "still running after phase 1"
    exited1 = exit1 <= n_layers
    fits = jnp.all((nl0 <= half) & (nl1 <= half))

    layers2 = _slice_layers(ds, n_layers)
    tok2 = {"w": tok_w[ds:], "b": tok_b[ds:]}  # wrapper pads the last slot
    match2 = {"w": match_p["w"][ds:], "b": match_p["b"][ds:]}

    def _phase2(pd0, pd1, pf0, pf1):
        return layer_stack.transformer_stack_adaptive(
            layers2, tok2, pd0, pd1, pf0, pf1, nl0, nl1, match2,
            exited1, layer_offset=ds, **common,
        )

    def _small(pd0, pd1, pf0, pf1):
        o0, o1, e2, k0, k1 = _phase2(
            pd0[:, :half], pd1[:, :half],
            pf0[:, :, :half], pf1[:, :, :half],
        )
        pad = ((0, 0), (0, m - half), (0, 0))
        return (
            jnp.pad(o0, pad), jnp.pad(o1, pad), e2,
            jnp.pad(k0, pad), jnp.pad(k1, pad),
        )

    def _full(pd0, pd1, pf0, pf1):
        return _phase2(pd0, pd1, pf0, pf1)

    o0, o1, exit2, k2f0, k2f1 = jax.lax.cond(
        fits, _small, _full, cd0, cd1, cf0, cf1
    )
    # exited pairs passed through phase 2 with exit register 0
    exit_layer = jnp.where(exited1, exit1, exit2)

    # ---- tail: second compaction over phase-2 keeps --------------------
    keep2_0 = k2f0[:, :, 0] > 0.5  # padded slots are 0 by construction
    keep2_1 = k2f1[:, :, 0] > 0.5
    fl0, _, (gd0, gidx0) = _compact(keep2_0, nl0, o0, cidx0)
    fl1, _, (gd1, gidx1) = _compact(keep2_1, nl1, o1, cidx1)
    final = dict(
        d0=gd0,
        d1=gd1,
        len0=fl0,
        len1=fl1,
        idx0=gidx0,
        idx1=gidx1,
        exit_layer=exit_layer,
    )
    return _adaptive_tail(params, final, m, n, config, n_layers)


def _adaptive_tail(params, final, m, n, config, n_layers):
    """Per-pair assignment head of the exit layer + output packing (shared
    by the while_loop and in-kernel adaptive paths)."""
    exit_idx = jnp.clip(final["exit_layer"] - 1, 0, n_layers - 1)
    assign_p = jax.tree.map(lambda a: a[exit_idx], params["assign"])
    mask0 = jnp.arange(m)[None, :] < final["len0"][:, None]
    mask1 = jnp.arange(n)[None, :] < final["len1"][:, None]
    scores = match_assignment(
        assign_p, final["d0"], final["d1"], mask0, mask1, config.descriptor_dim
    )
    return AdaptiveOutput(
        scores,
        final["idx0"],
        final["idx1"],
        final["len0"],
        final["len1"],
        final["exit_layer"],
    )
