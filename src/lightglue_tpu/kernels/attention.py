"""Fused online-softmax attention (FlashAttention-2) as a Pallas TPU kernel.

This is the TPU-native replacement for the reference's hand-written
CUTLASS/CuTe TensorRT plugin (reference
lightglue_attention_plugin/attention_headdim_64_fp16in_fp16out.cu:253-733 and
attention_headdim_64_fp16in_fp32out.cu) — the centerpiece of the whole
project. Design correspondences (see SURVEY.md §2.4):

- One grid step owns one (batch, head, Q-stripe) and streams KV tiles with a
  running (row-max m, row-sum l, output O) carry — the same online-softmax
  recurrence the CUDA kernel keeps in registers/smem
  (reference ...fp16out.cu:510-644). On TPU the MXU does the two GEMMs and the
  VPU the softmax; there is no smem round-trip for P (the CUDA kernel's
  ldmatrix trick at :653-668) because Mosaic keeps tiles in VMEM/registers.
- The scale 1/sqrt(head_dim) is applied *after* the QK^T matmul, matching the
  reference (...fp16out.cu:467-470).
- Variable sequence length is handled by in-kernel masking against the true
  lengths instead of the reference's physical pad/unpad kernels
  (...fp16out.cu:736-857): padded KV columns get -inf before the softmax and
  padded Q rows are zeroed on the way out — the same contract as the CUDA
  tail-tile masking (...fp16out.cu:475-494,695-701).
- Two accumulation policies mirror the two plugin variants:
  * ``stat_dtype=float32``  == fp16in/fp32out: fp32 S accumulation, fp32
    softmax statistics, fp32 O accumulation (...fp16in_fp32out.cu:170,551-574).
  * ``stat_dtype=bfloat16`` == fp16in/fp16out: 16-bit softmax statistics and
    O accumulation (...fp16in_fp16out.cu:556-580 keeps row stats in fp16).

Shapes are (batch, heads, seq, head_dim); seq must be a multiple of the KV
block (buckets 256/512/1024 always are). head_dim=64 is the LightGlue case
but any multiple of 64 lane-packs fine.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Whole-sequence blocks: at LightGlue scales (N <= 1024, D = 64) the entire
# S tile fits VMEM comfortably (4 MB fp32 at 1024^2) and one program per
# (batch, head) sustains ~120 TFLOPs on v5e vs ~37 with 256-tiling — the
# streaming KV loop only starts mattering beyond the 2048-seq cap the
# reference plugin enforces (lightglue_attention_plugin.h:21).
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024

_NEG_INF = -1e30


def _interpret() -> bool:
    """Run in interpreter mode off-TPU (CPU test meshes)."""
    return jax.default_backend() != "tpu"


def _dot_precision(dtype) -> jax.lax.Precision:
    """fp32 operands must request HIGHEST or the MXU silently degrades them
    to bf16 passes (~1e-3 relative error) — the fp32 rung mirrors the
    reference's fp32 no-plugin engine, which is exact fp32."""
    return (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _attn_kernel(
    lens_ref,  # SMEM (B, 2) int32: [q_len, kv_len] per batch element
    q_ref,     # VMEM (1, 1, block_q, D)
    k_ref,     # VMEM (1, 1, Nk, D)
    v_ref,     # VMEM (1, 1, Nk, D)
    o_ref,     # VMEM (1, 1, block_q, D)
    *,
    scale: float,
    block_k: int,
    num_kv_blocks: int,
    stat_dtype,
    masked: bool,
):
    block_q = q_ref.shape[2]
    head_dim = q_ref.shape[3]
    b = pl.program_id(0)
    iq = pl.program_id(2)

    q = q_ref[0, 0, :, :]

    # VPU math runs in fp32 (the MXU always accumulates fp32 and the VPU
    # lacks 16-bit compare/transcendental paths); the 16-bit stat policy is
    # expressed by re-quantizing the running statistics to ``stat_dtype``
    # after every update — the same storage precision as the CUDA
    # fp16in/fp16out variant's fp16 row_max/row_sum/l (...fp16out.cu:556-644).
    low_precision_stats = stat_dtype != jnp.float32

    def _quant(x):
        return x.astype(stat_dtype).astype(jnp.float32) if low_precision_stats else x

    m0 = jnp.full((block_q, 1), _NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((block_q, head_dim), dtype=jnp.float32)

    if masked:
        kv_len = lens_ref[b, 1]
        q_len = lens_ref[b, 0]
        # Real FLOP savings from masking, not just correctness: fully-masked
        # KV tail tiles are skipped via a dynamic trip count, and Q stripes
        # entirely beyond q_len skip the loop altogether. This is what makes
        # bucketed padding and device-side keypoint pruning cheap — the CUDA
        # reference instead always runs the full padded extent
        # (lightglue_attention_plugin.cpp:196-221).
        num_kv = jnp.minimum(
            jnp.asarray(num_kv_blocks, jnp.int32),
            (kv_len + block_k - 1) // block_k,
        )
        stripe_active = iq * block_q < q_len
    else:
        num_kv = num_kv_blocks
        stripe_active = True

    def body(j, carry):
        m_prev, l_prev, acc = carry
        k_tile = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        v_tile = v_ref[0, 0, pl.ds(j * block_k, block_k), :]

        # S = Q K^T, contraction over head_dim on the MXU.
        s = jax.lax.dot_general(
            q,
            k_tile,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(q.dtype),
        )
        s = _quant(s * scale)

        if masked:
            col = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(col < kv_len, s, _NEG_INF)

        m_new = _quant(jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True)))
        p = _quant(jnp.exp(s - m_new))
        correction = _quant(jnp.exp(m_prev - m_new))
        l_new = _quant(l_prev * correction + jnp.sum(p, axis=-1, keepdims=True))

        # P V on the MXU; P is cast to the KV operand dtype like the CUDA
        # kernel's P fp32->fp16 requantization before the PV MMA
        # (reference ...fp16in_fp32out.cu:563-574).
        pv = jax.lax.dot_general(
            p.astype(v_tile.dtype),
            v_tile,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(v_tile.dtype),
        )
        acc_new = _quant(acc * correction + pv)
        return m_new, l_new, acc_new

    @pl.when(stripe_active)
    def _():
        m, l, acc = jax.lax.fori_loop(
            0, num_kv, body, (m0, l0, acc0), unroll=not masked
        )
        # Epilogue: O /= l; fully-masked (padded) rows have l == 0 and must
        # emit zeros (reference ...fp16out.cu:695-701 forces pad rows to 0).
        l_safe = jnp.where(l == 0.0, 1.0, l)
        out = acc / l_safe
        if masked:
            row = iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, head_dim), 0
            )
            out = jnp.where(row < q_len, out, jnp.zeros_like(out))
        o_ref[0, 0, :, :] = out.astype(o_ref.dtype)

    if masked:

        @pl.when(jnp.logical_not(stripe_active))
        def _():
            o_ref[0, 0, :, :] = jnp.zeros(
                (block_q, head_dim), dtype=o_ref.dtype
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale",
        "stat_dtype",
        "out_dtype",
        "block_q",
        "block_k",
    ),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    lengths: Optional[jax.Array] = None,
    *,
    scale: Optional[float] = None,
    stat_dtype=jnp.float32,
    out_dtype=None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    """Fused scaled-dot-product attention.

    Args:
      q: (B, H, Nq, D) queries.
      k: (B, H, Nk, D) keys.
      v: (B, H, Nk, D) values.
      lengths: optional (B, 2) int32 of true [q_len, kv_len] per batch
        element; positions beyond them are masked (KV) / zeroed (Q). None
        means all positions are real.
      scale: softmax scale; defaults to 1/sqrt(D) (the reference hardcodes
        0.125 for D=64, ...fp16out.cu:467).
      stat_dtype: dtype of softmax statistics and O accumulation — float32
        mirrors the fp16in/fp32out plugin variant, bfloat16 the
        fp16in/fp16out one.
      out_dtype: output dtype (defaults to q.dtype).
      block_q / block_k: Q-stripe and KV-tile sizes; seq dims must divide.

    Returns:
      (B, H, Nq, D) attention output.
    """
    batch, heads, nq, head_dim = q.shape
    nk = k.shape[2]
    if v.shape != k.shape:
        raise ValueError(f"k/v shape mismatch: {k.shape} vs {v.shape}")
    block_q = min(block_q, nq)
    block_k = min(block_k, nk)
    if nq % block_q or nk % block_k:
        raise ValueError(
            f"seq lengths ({nq}, {nk}) must be multiples of blocks "
            f"({block_q}, {block_k}) — pad to a bucket first"
        )
    if scale is None:
        scale = 1.0 / math.sqrt(head_dim)
    out_dtype = out_dtype or q.dtype
    stat_dtype = jnp.dtype(stat_dtype)

    masked = lengths is not None
    if lengths is None:
        lengths = jnp.full((batch, 2), nq, dtype=jnp.int32)
        lengths = lengths.at[:, 1].set(nk)
    lengths = lengths.astype(jnp.int32)

    num_q_blocks = nq // block_q
    num_kv_blocks = nk // block_k

    kernel = functools.partial(
        _attn_kernel,
        scale=float(scale),
        block_k=block_k,
        num_kv_blocks=num_kv_blocks,
        stat_dtype=stat_dtype,
        masked=masked,
    )

    flops = 2 * 2 * batch * heads * nq * nk * head_dim
    return pl.pallas_call(
        kernel,
        grid=(batch, heads, num_q_blocks),
        in_specs=[
            pl.BlockSpec(
                (batch, 2), lambda b, h, iq: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1, block_q, head_dim),
                lambda b, h, iq: (b, h, iq, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, nk, head_dim),
                lambda b, h, iq: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, nk, head_dim),
                lambda b, h, iq: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, head_dim),
            lambda b, h, iq: (b, h, iq, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((batch, heads, nq, head_dim), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + batch * heads * nq * head_dim * jnp.dtype(out_dtype).itemsize,
            transcendentals=batch * heads * nq * nk,
        ),
        interpret=_interpret(),
    )(lengths, q, k, v)


def _attn_step_kernel(
    lens_ref,  # SMEM (B, 2) int32 [q_len, kv_len] — GLOBAL true lengths
    offs_ref,  # SMEM (1, 2) int32 [row0, col0] — global ids of this shard's
               # first Q row / first KV column (ring position)
    q_ref,     # VMEM (1, 1, block_q, D)
    k_ref,     # VMEM (1, 1, Nk, D) — the local KV block of this ring step
    v_ref,     # VMEM (1, 1, Nk, D)
    mi_ref,    # VMEM (1, 1, block_q, 1) fp32 running row-max (carry in)
    li_ref,    # VMEM (1, 1, block_q, 1) fp32 running row-sum
    acci_ref,  # VMEM (1, 1, block_q, D) fp32 running output accumulator
    mo_ref,    # carries out (same shapes)
    lo_ref,
    acco_ref,
    *,
    scale: float,
    block_k: int,
    num_kv_blocks: int,
    stat_dtype,
    masked: bool,
):
    """One online-softmax merge step over a KV block, carries in/out — the
    ring-attention per-step body (parallel/ring.py) on the SAME math path as
    ``_attn_kernel``: whole-block S on the MXU in VMEM, fp32 statistics,
    scale after the matmul, -inf column masking with fully-masked tail
    tiles skipped by a dynamic trip count. The merge is the algebraically
    exact FA-2 recurrence, so accumulating the ring blocks in any order
    reproduces single-device attention up to fp rounding."""
    block_q = q_ref.shape[2]
    head_dim = q_ref.shape[3]
    b = pl.program_id(0)
    iq = pl.program_id(2)

    low_precision_stats = stat_dtype != jnp.float32

    def _quant(x):
        return (
            x.astype(stat_dtype).astype(jnp.float32)
            if low_precision_stats
            else x
        )

    q = q_ref[0, 0, :, :]
    m0 = mi_ref[0, 0, :, :]
    l0 = li_ref[0, 0, :, :]
    acc0 = acci_ref[0, 0, :, :]

    if masked:
        q_len = lens_ref[b, 0]
        kv_len = lens_ref[b, 1]
        row0 = offs_ref[0, 0]
        col0 = offs_ref[0, 1]
        # columns of this block live at global ids [col0, col0 + Nk); tiles
        # entirely past kv_len are skipped (they would otherwise poison the
        # carries: an all -inf tile with m still at the -inf init makes
        # exp(s - m) == 1 — the same failure mode the layer-stack guard
        # closes)
        local_kv = jnp.clip(kv_len - col0, 0, num_kv_blocks * block_k)
        num_kv = (local_kv + block_k - 1) // block_k
        stripe_active = (row0 + iq * block_q < q_len) & (num_kv > 0)
    else:
        num_kv = num_kv_blocks
        stripe_active = True

    def body(j, carry):
        m_prev, l_prev, acc = carry
        k_tile = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        v_tile = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q,
            k_tile,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(q.dtype),
        )
        s = _quant(s * scale)
        if masked:
            col = col0 + j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(col < kv_len, s, _NEG_INF)
        m_new = _quant(
            jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        )
        p = _quant(jnp.exp(s - m_new))
        correction = _quant(jnp.exp(m_prev - m_new))
        l_new = _quant(
            l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
        )
        pv = jax.lax.dot_general(
            p.astype(v_tile.dtype),
            v_tile,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(v_tile.dtype),
        )
        acc_new = _quant(acc * correction + pv)
        return m_new, l_new, acc_new

    @pl.when(stripe_active)
    def _():
        m, l, acc = jax.lax.fori_loop(
            0, num_kv, body, (m0, l0, acc0), unroll=not masked
        )
        mo_ref[0, 0, :, :] = m
        lo_ref[0, 0, :, :] = l
        acco_ref[0, 0, :, :] = acc

    @pl.when(jnp.logical_not(stripe_active))
    def _():
        # inactive stripe or fully-out-of-range block: carries pass through
        mo_ref[0, 0, :, :] = m0
        lo_ref[0, 0, :, :] = l0
        acco_ref[0, 0, :, :] = acc0


@functools.partial(
    jax.jit,
    static_argnames=("scale", "stat_dtype", "block_q", "block_k"),
)
def flash_attention_step(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    m: jax.Array,
    l: jax.Array,
    acc: jax.Array,
    lengths: Optional[jax.Array] = None,
    row0: Optional[jax.Array] = None,
    col0: Optional[jax.Array] = None,
    *,
    scale: Optional[float] = None,
    stat_dtype=jnp.float32,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
):
    """Merge one KV block into running FA-2 carries (ring-attention step).

    Args:
      q: (B, H, n, D) local Q stripe.
      k, v: (B, H, nk, D) the KV block to merge.
      m, l: (B, H, n, 1) fp32 running row-max / row-sum.
      acc: (B, H, n, D) fp32 running un-normalized output.
      lengths: optional (B, 2) int32 GLOBAL true [q_len, kv_len].
      row0 / col0: int32 scalars — global ids of q's first row and k's
        first column (required with ``lengths``; default 0).

    Returns:
      (m', l', acc') updated carries. Finalize with ``acc / max(l, eps)``
      and Q-row masking (see parallel/ring.py).
    """
    batch, heads, n, head_dim = q.shape
    nk = k.shape[2]

    def _fit_block(size, cap):
        # largest divisor of the (static) seq length <= cap — ring stripe
        # sizes are arbitrary (N / ring), so unlike flash_attention this
        # must not reject e.g. 1536; worst case degrades the block, never
        # errors
        b = min(cap, size)
        while size % b:
            b -= 1
        return b

    block_q = _fit_block(n, block_q)
    block_k = _fit_block(nk, block_k)
    if scale is None:
        scale = 1.0 / math.sqrt(head_dim)
    stat_dtype = jnp.dtype(stat_dtype)
    masked = lengths is not None
    if lengths is None:
        lengths = jnp.full((batch, 2), n, dtype=jnp.int32)
        lengths = lengths.at[:, 1].set(nk)
    lengths = lengths.astype(jnp.int32)
    offs = jnp.stack(
        [
            jnp.asarray(0 if row0 is None else row0, jnp.int32),
            jnp.asarray(0 if col0 is None else col0, jnp.int32),
        ]
    ).reshape(1, 2)

    kernel = functools.partial(
        _attn_step_kernel,
        scale=float(scale),
        block_k=block_k,
        num_kv_blocks=nk // block_k,
        stat_dtype=stat_dtype,
        masked=masked,
    )
    qspec = pl.BlockSpec(
        (1, 1, block_q, head_dim),
        lambda b, h, iq: (b, h, iq, 0),
        memory_space=pltpu.VMEM,
    )
    kvspec = pl.BlockSpec(
        (1, 1, nk, head_dim),
        lambda b, h, iq: (b, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    statspec = pl.BlockSpec(
        (1, 1, block_q, 1),
        lambda b, h, iq: (b, h, iq, 0),
        memory_space=pltpu.VMEM,
    )
    flops = 2 * 2 * batch * heads * n * nk * head_dim
    return pl.pallas_call(
        kernel,
        grid=(batch, heads, n // block_q),
        in_specs=[
            pl.BlockSpec(
                (batch, 2), lambda b, h, iq: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 2), lambda b, h, iq: (0, 0), memory_space=pltpu.SMEM
            ),
            qspec,
            kvspec,
            kvspec,
            statspec,
            statspec,
            qspec,
        ],
        out_specs=[statspec, statspec, qspec],
        out_shape=[
            jax.ShapeDtypeStruct((batch, heads, n, 1), jnp.float32),
            jax.ShapeDtypeStruct((batch, heads, n, 1), jnp.float32),
            jax.ShapeDtypeStruct((batch, heads, n, head_dim), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + 2 * (m.size + l.size + acc.size) * 4,
            transcendentals=batch * heads * n * nk,
        ),
        interpret=_interpret(),
    )(lengths, offs, q, k, v, m, l, acc.astype(jnp.float32))


def _fused_mha_kernel(
    lens_ref,   # SMEM (B, 2) int32 [q_len, kv_len]
    q_ref,      # VMEM (1, block_q, H*D) — heads-last, no transpose upstream
    k_ref,      # VMEM (1, Nk, H*D)
    v_ref,      # VMEM (1, Nk, H*D)
    freqs_ref,  # VMEM (1, 2, Nf, D) [cos; sin] (zeros when rope is off)
    o_ref,      # VMEM (1, block_q, H*D) — revisited across the hp grid dim
    *,
    scale: float,
    block_k: int,
    num_kv_blocks: int,
    stat_dtype,
    masked: bool,
    rope: bool,
    head_dim: int,
    hpack: int,
):
    """Heads-last fused attention: inputs and output live in (N, H*D)
    activation layout so no head split/merge transposes exist anywhere.
    Each grid step owns ``hpack`` heads — hpack*head_dim == 128 — so the
    dynamic lane loads/stores are 128-aligned as Mosaic requires; the two
    64-lane head halves are then split statically inside the register tile.
    """
    block_q = q_ref.shape[1]
    b = pl.program_id(0)
    iq = pl.program_id(1)
    hp = pl.program_id(2)
    lanes = hpack * head_dim
    lane0 = pl.multiple_of(hp * lanes, lanes)

    low_precision_stats = stat_dtype != jnp.float32

    def _quant(x):
        return x.astype(stat_dtype).astype(jnp.float32) if low_precision_stats else x

    def _rope(t, row0, rows):
        """Half-split rotary on (rows, D); freqs are tiled per-half
        (models/lightglue.py posenc docstring)."""
        cos = freqs_ref[0, 0, pl.ds(row0, rows), :].astype(t.dtype)
        sin = freqs_ref[0, 1, pl.ds(row0, rows), :].astype(t.dtype)
        half = head_dim // 2
        rot = jnp.concatenate([-t[:, half:], t[:, :half]], axis=-1)
        return t * cos + rot * sin

    if masked:
        kv_len = lens_ref[b, 1]
        q_len = lens_ref[b, 0]
        num_kv = jnp.minimum(
            jnp.asarray(num_kv_blocks, jnp.int32),
            (kv_len + block_k - 1) // block_k,
        )
        stripe_active = iq * block_q < q_len
    else:
        num_kv = num_kv_blocks
        stripe_active = True

    q_pack = q_ref[0, :, pl.ds(lane0, lanes)]  # (block_q, hpack*D)

    def one_head(h):
        q = q_pack[:, h * head_dim : (h + 1) * head_dim]
        if rope:
            q = _rope(q, iq * block_q, block_q)

        m0 = jnp.full((block_q, 1), _NEG_INF, dtype=jnp.float32)
        l0 = jnp.zeros((block_q, 1), dtype=jnp.float32)
        acc0 = jnp.zeros((block_q, head_dim), dtype=jnp.float32)

        def body(j, carry):
            m_prev, l_prev, acc = carry
            k_tile = k_ref[0, pl.ds(j * block_k, block_k), pl.ds(lane0, lanes)][
                :, h * head_dim : (h + 1) * head_dim
            ]
            v_tile = v_ref[0, pl.ds(j * block_k, block_k), pl.ds(lane0, lanes)][
                :, h * head_dim : (h + 1) * head_dim
            ]
            if rope:
                k_tile = _rope(k_tile, j * block_k, block_k)
            s = jax.lax.dot_general(
                q,
                k_tile,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_dot_precision(q.dtype),
            )
            s = _quant(s * scale)
            if masked:
                col = j * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1
                )
                s = jnp.where(col < kv_len, s, _NEG_INF)
            m_new = _quant(
                jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            )
            p = _quant(jnp.exp(s - m_new))
            correction = _quant(jnp.exp(m_prev - m_new))
            l_new = _quant(
                l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
            )
            pv = jax.lax.dot_general(
                p.astype(v_tile.dtype),
                v_tile,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_dot_precision(v_tile.dtype),
            )
            acc_new = _quant(acc * correction + pv)
            return m_new, l_new, acc_new

        m, l, acc = jax.lax.fori_loop(
            0, num_kv, body, (m0, l0, acc0), unroll=not masked
        )
        l_safe = jnp.where(l == 0.0, 1.0, l)
        out = acc / l_safe
        if masked:
            row = iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, head_dim), 0
            )
            out = jnp.where(row < q_len, out, jnp.zeros_like(out))
        return out

    @pl.when(stripe_active)
    def _():
        packed = jnp.concatenate(
            [one_head(h) for h in range(hpack)], axis=-1
        )
        o_ref[0, :, pl.ds(lane0, lanes)] = packed.astype(o_ref.dtype)

    if masked:

        @pl.when(jnp.logical_not(stripe_active))
        def _():
            o_ref[0, :, pl.ds(lane0, lanes)] = jnp.zeros(
                (block_q, lanes), dtype=o_ref.dtype
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads",
        "scale",
        "stat_dtype",
        "out_dtype",
        "block_q",
        "block_k",
    ),
)
def fused_mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    freqs: Optional[jax.Array] = None,
    lengths: Optional[jax.Array] = None,
    *,
    num_heads: int,
    scale: Optional[float] = None,
    stat_dtype=jnp.float32,
    out_dtype=None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    """Model-path attention in pure activation layout: (B, N, H*D) in and
    out, fused rotary embedding, per-head computation inside the kernel.

    Differences from ``flash_attention`` (the generic kernel):
    - no (B, H, N, D) staging anywhere: projections feed the kernel
      directly and the output feeds the next linear directly — the head
      split/merge relayouts (which cost more than the attention matmuls at
      LightGlue sizes) do not exist;
    - optional in-kernel half-split RoPE on q and k (``freqs`` (B, 2, N, D)
      [cos; sin], tiled per-half);
    - heads are processed ``hpack`` at a time (hpack*head_dim == 128) so all
      dynamic lane accesses are 128-aligned.

    Args:
      q: (B, Nq, H*D); k/v: (B, Nk, H*D), head-major lanes. RoPE requires
        Nq == Nk (self-attention).

    Returns:
      (B, Nq, H*D).
    """
    batch, nq, feat = q.shape
    nk = k.shape[1]
    head_dim = feat // num_heads
    block_q = min(block_q, nq)
    block_k = min(block_k, nk)
    if nq % block_q or nk % block_k:
        raise ValueError(f"seq ({nq}, {nk}) not divisible by blocks")
    if scale is None:
        scale = 1.0 / math.sqrt(head_dim)
    out_dtype = out_dtype or q.dtype
    stat_dtype = jnp.dtype(stat_dtype)

    masked = lengths is not None
    if lengths is None:
        lengths = jnp.zeros((batch, 2), jnp.int32)
    lengths = lengths.astype(jnp.int32)

    rope = freqs is not None
    if freqs is None:
        freqs = jnp.zeros((batch, 2, 1, head_dim), jnp.float32)
    if rope and freqs.shape[2] != nk:
        raise ValueError("rope requires freqs rows == kv rows (self-attention)")

    num_q_blocks = nq // block_q
    num_kv_blocks = nk // block_k

    # pack heads so every dynamic lane access covers >= 128 aligned lanes
    hpack = max(1, 128 // head_dim)
    while num_heads % hpack:
        hpack //= 2
    kernel = functools.partial(
        _fused_mha_kernel,
        scale=float(scale),
        block_k=block_k,
        num_kv_blocks=num_kv_blocks,
        stat_dtype=stat_dtype,
        masked=masked,
        rope=rope,
        head_dim=head_dim,
        hpack=hpack,
    )
    nf = freqs.shape[2]
    grid = (batch, num_q_blocks, num_heads // hpack)  # head-packs innermost:
    # the (b, iq) output block stays resident across them
    flops = 2 * 2 * batch * num_heads * nq * nk * head_dim
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (batch, 2), lambda b, iq, h: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, block_q, feat),
                lambda b, iq, h: (b, iq, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nk, feat),
                lambda b, iq, h: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nk, feat),
                lambda b, iq, h: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2, nf, head_dim),
                lambda b, iq, h: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, feat),
            lambda b, iq, h: (b, iq, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((batch, nq, feat), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q.size + k.size + v.size + freqs.size)
            * q.dtype.itemsize
            + batch * nq * feat * jnp.dtype(out_dtype).itemsize,
            transcendentals=batch * num_heads * nq * nk,
        ),
        interpret=_interpret(),
    )(lengths, q, k, v, freqs)


def _bidir_cross_kernel(
    lens_ref,   # SMEM (B, 2) int32 [n0, n1]
    qk0_ref,    # VMEM (1, N0, H*D) — heads-last activation layout
    qk1_ref,    # VMEM (1, N1, H*D)
    v0_ref,     # VMEM (1, N0, H*D)
    v1_ref,     # VMEM (1, N1, H*D)
    o0_ref,     # VMEM (1, N0, H*D)
    o1_ref,     # VMEM (1, N1, H*D)
    *,
    scale: float,
    stat_dtype,
    masked: bool,
    head_dim: int,
    hpack: int,
):
    b = pl.program_id(0)
    hp = pl.program_id(1)
    n0 = qk0_ref.shape[1]
    n1 = qk1_ref.shape[1]
    lanes = hpack * head_dim
    lane0 = pl.multiple_of(hp * lanes, lanes)
    low_precision_stats = stat_dtype != jnp.float32

    def _quant(x):
        return x.astype(stat_dtype).astype(jnp.float32) if low_precision_stats else x

    if masked:
        len0 = lens_ref[b, 0]
        len1 = lens_ref[b, 1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (n0, n1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n0, n1), 1)

    qk0_pack = qk0_ref[0, :, pl.ds(lane0, lanes)]
    qk1_pack = qk1_ref[0, :, pl.ds(lane0, lanes)]
    v0_pack = v0_ref[0, :, pl.ds(lane0, lanes)]
    v1_pack = v1_ref[0, :, pl.ds(lane0, lanes)]

    def one_head(h):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qk0 = qk0_pack[:, sl]
        qk1 = qk1_pack[:, sl]
        # the shared-projection similarity matrix, computed ONCE — direction
        # 1->0 consumes its transpose (reference computes both directions
        # with two full attention calls, lightglue.py:188-205)
        s = jax.lax.dot_general(
            qk0,
            qk1,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(qk0.dtype),
        )
        s = _quant(s * scale)

        # direction 0 -> 1: softmax over columns j (keys in image 1)
        # denominator applied AFTER the PV matmul on the (N, D) output —
        # 16x fewer divides than normalizing the (N, N) P, and the same
        # epilogue order as the reference kernel's `O *= 1/l`
        # (attention_headdim_64_fp16in_fp16out.cu:695-701)
        s_row = jnp.where(cols < len1, s, _NEG_INF) if masked else s
        m0 = _quant(jnp.max(s_row, axis=1, keepdims=True))
        p0 = _quant(jnp.exp(s_row - m0))
        l0 = _quant(jnp.sum(p0, axis=1, keepdims=True))    # (N0, 1)
        o0 = jax.lax.dot_general(
            p0.astype(v1_pack.dtype),
            v1_pack[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(v1_pack.dtype),
        ) / jnp.where(l0 == 0.0, 1.0, l0)

        # direction 1 -> 0: softmax over rows i (keys in image 0); O1 via a
        # contraction over axis 0, i.e. the transpose ride is free on the MXU
        s_col = jnp.where(rows < len0, s, _NEG_INF) if masked else s
        m1 = _quant(jnp.max(s_col, axis=0, keepdims=True))
        p1 = _quant(jnp.exp(s_col - m1)).astype(v0_pack.dtype)
        # column sums in (N1, 1) orientation via a ones-vector contraction
        # on the MXU — a (1, N1) keepdims sum would need a cross-lane
        # relayout to divide the (N1, D) output
        l1 = _quant(
            jax.lax.dot_general(
                p1,
                jnp.ones((n0, 1), v0_pack.dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_dot_precision(v0_pack.dtype),
            )
        )
        o1 = jax.lax.dot_general(
            p1,
            v0_pack[:, sl],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(v0_pack.dtype),
        ) / jnp.where(l1 == 0.0, 1.0, l1)

        if masked:
            r0 = jax.lax.broadcasted_iota(jnp.int32, (n0, head_dim), 0)
            o0 = jnp.where(r0 < len0, o0, jnp.zeros_like(o0))
            r1 = jax.lax.broadcasted_iota(jnp.int32, (n1, head_dim), 0)
            o1 = jnp.where(r1 < len1, o1, jnp.zeros_like(o1))
        return o0, o1

    outs = [one_head(h) for h in range(hpack)]
    o0_ref[0, :, pl.ds(lane0, lanes)] = jnp.concatenate(
        [o[0] for o in outs], axis=-1
    ).astype(o0_ref.dtype)
    o1_ref[0, :, pl.ds(lane0, lanes)] = jnp.concatenate(
        [o[1] for o in outs], axis=-1
    ).astype(o1_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "stat_dtype", "out_dtype")
)
def bidirectional_cross_attention(
    qk0: jax.Array,
    qk1: jax.Array,
    v0: jax.Array,
    v1: jax.Array,
    lengths: Optional[jax.Array] = None,
    *,
    num_heads: int,
    scale: Optional[float] = None,
    stat_dtype=jnp.float32,
    out_dtype=None,
):
    """Both directions of LightGlue's symmetric cross-attention in one pass.

    Because the projection is shared (reference lightglue.py:177,190-198),
    scores(1->0) == scores(0->1)^T; this kernel materializes S once per head
    in VMEM and softmax-normalizes it along both axes — one QK^T matmul
    instead of two, and the transposed PV ride is a free contraction-axis
    choice on the MXU. Inputs/outputs stay in (B, N, H*D) activation layout
    (no head transposes). Requires whole sequences in VMEM (N <= ~1024 at
    D=64, always true for LightGlue buckets); callers fall back to two
    ``fused_mha`` calls beyond that.

    Args:
      qk0/v0: (B, N0, H*D); qk1/v1: (B, N1, H*D).
      lengths: optional (B, 2) int32 [n0, n1].

    Returns:
      (O0 (B, N0, H*D), O1 (B, N1, H*D)).
    """
    batch, n0, feat = qk0.shape
    n1 = qk1.shape[1]
    head_dim = feat // num_heads
    if scale is None:
        scale = 1.0 / math.sqrt(head_dim)
    out_dtype = out_dtype or qk0.dtype
    stat_dtype = jnp.dtype(stat_dtype)
    masked = lengths is not None
    if lengths is None:
        lengths = jnp.zeros((batch, 2), jnp.int32)
    lengths = lengths.astype(jnp.int32)

    hpack = max(1, 128 // head_dim)
    while num_heads % hpack:
        hpack //= 2
    kernel = functools.partial(
        _bidir_cross_kernel,
        scale=float(scale),
        stat_dtype=stat_dtype,
        masked=masked,
        head_dim=head_dim,
        hpack=hpack,
    )
    flops = 2 * batch * num_heads * n0 * n1 * head_dim * 3
    vspec0 = pl.BlockSpec(
        (1, n0, feat), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM
    )
    vspec1 = pl.BlockSpec(
        (1, n1, feat), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(batch, num_heads // hpack),
        in_specs=[
            pl.BlockSpec(
                (batch, 2), lambda b, h: (0, 0), memory_space=pltpu.SMEM
            ),
            vspec0,
            vspec1,
            vspec0,
            vspec1,
        ],
        out_specs=(vspec0, vspec1),
        out_shape=(
            jax.ShapeDtypeStruct((batch, n0, feat), out_dtype),
            jax.ShapeDtypeStruct((batch, n1, feat), out_dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(qk0.size + qk1.size + v0.size + v1.size)
            * qk0.dtype.itemsize,
            transcendentals=2 * batch * num_heads * n0 * n1,
        ),
        interpret=_interpret(),
    )(lengths, qk0, qk1, v0, v1)


def reference_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    lengths: Optional[jax.Array] = None,
    *,
    scale: Optional[float] = None,
) -> jax.Array:
    """Naive fp32 softmax(QK^T/sqrt(D))V — the correctness oracle.

    The jnp analog of the reference's retained slow path
    (lightglue_pytorch_no_plugin/lightglue.py:110-114: query/8 -> matmul ->
    softmax -> matmul).
    """
    head_dim = q.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(head_dim)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    # HIGHEST: the oracle must be exact fp32 — on TPU the default would run
    # these einsums as bf16 passes (~1e-3 error) and the *oracle* would be
    # the imprecise side of every comparison (verified against float64).
    s = (
        jnp.einsum(
            "bhqd,bhkd->bhqk", qf, kf, precision=jax.lax.Precision.HIGHEST
        )
        * scale
    )
    if lengths is not None:
        nk = k.shape[2]
        kv_mask = jnp.arange(nk)[None, :] < lengths[:, 1][:, None]  # (B, Nk)
        s = jnp.where(kv_mask[:, None, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", p, vf, precision=jax.lax.Precision.HIGHEST
    )
    if lengths is not None:
        nq = q.shape[2]
        q_mask = jnp.arange(nq)[None, :] < lengths[:, 0][:, None]  # (B, Nq)
        out = jnp.where(q_mask[:, None, :, None], out, 0.0)
    return out.astype(q.dtype)
