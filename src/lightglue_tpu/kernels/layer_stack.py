"""Whole-transformer-stack megakernel: all LightGlue layers in ONE pallas_call.

Motivation (measured on v5e, docs/PERFORMANCE.md): with per-op kernels the
9-layer stack runs at ~63 TFLOPs — the attention kernels themselves sustain
~120, but every projection/FFN/LayerNorm between them is a separate XLA op
whose activations round-trip HBM (~30-50 MB per layer) and whose launch
boundaries serialize. This kernel keeps the pair's activations resident in
VMEM across ALL layers and streams only the per-layer weights (~2.6 MB bf16)
from HBM, which Pallas double-buffers against compute automatically.

Grid = (pairs, layers): the activation block is revisited across the whole
inner layer loop (one HBM fetch + one writeback per pair, total), while the
weight BlockSpecs walk the stacked-layer axis. This also fixes batch scaling:
pairs stream through a weight-resident pipeline instead of multiplying
HBM-bound inter-op traffic.

The layer math replicates models/lightglue.py's blocks exactly (reference
lightglue_pytorch_with_plugin/lightglue.py:118-226 — SelfBlock with fused
qkv + rotary + FFN, CrossBlock with shared to_qk bidirectional attention):
- self-attention per image with in-kernel half-split RoPE (weights carry the
  load-time de-interleave permutation, runtime/weights.py:rope_permutation);
- bidirectional cross-attention computing the shared similarity matrix ONCE
  per head and softmax-normalizing it along both axes;
- FFN cat(x, message) -> 512 -> LayerNorm(fp32) -> GELU(exact, fp32) -> 256
  with residual;
- variable-length masking identical to kernels/attention.py: padded KV
  columns -inf before softmax, padded Q rows zeroed after.

Softmax statistics honor the precision ladder's ``stat_dtype`` by
re-quantization, same as kernels/attention.py (the analog of the reference's
fp16 row stats, attention_headdim_64_fp16in_fp16out.cu:556-644).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# VMEM budget: activations (2, N, E) + qkv (2N, 3E) + one fp32 S (N, N) +
# double-buffered bf16 layer weights. N=1024 at E=256 fits a v5e core.
MAX_SEQ = 1024

def _cross_transposed_default() -> bool:
    """Default for transformer_stack's cross_transposed: OFF (shared-S).

    The round-2 chip A/B (golden/chip_r02/cross_transposed.out) suggested
    +25% for the transposed variant, but the definitive round-3 interleaved
    A/B with repeats (golden/chip_r03/cross_transposed_definitive.txt) shows
    the two are equivalent within relay variance at every shape (1024
    unmasked, 1024 masked-70%, mixed 256x512) — the r2 delta was relay
    state, not the kernel. Shared-S stays default: one fewer (N1,D)x(D,N0)
    matmul, and it slightly wins masked/mixed in the clean runs.
    LGTPU_CROSS_TRANSPOSED=1 forces the transposed variant for A/Bs; read at
    trace time (the first trace per shape pins the choice for that jit
    cache entry)."""
    return os.environ.get("LGTPU_CROSS_TRANSPOSED", "0") not in ("", "0")


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _w8a8_default() -> bool:
    """Default for the INT8 rung's W8A8 mode: OFF (weight-only dequant).

    LGTPU_W8A8=1 turns the megakernel's projection/FFN matmuls into real
    int8 arithmetic — per-row dynamic activation quantization in-kernel,
    int8 x int8 -> int32 on the MXU (v5e's int8 rate is ~2x bf16), dequant
    on the fp32 accumulator (VERDICT r4 next #4: the one remaining way the
    int8 rung could WIN rather than merely exist; weight-only's halved HBM
    bytes are already hidden). Read at trace time — A/B via subprocesses
    (scripts/bench_w8a8.py)."""
    return os.environ.get("LGTPU_W8A8", "0") not in ("", "0")


def _dot(a, b, contract=((1,), (0,))):
    # fp32 operands must request HIGHEST or the MXU silently degrades them
    # to single bf16 passes (~1e-3 relative error) — the MIXED/FP32 rungs
    # mirror engines whose non-attention layers are true fp32
    prec = (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(a.dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(contract, ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )


def _erf(x):
    """fp32 erf via Abramowitz-Stegun 7.1.26 (max abs error 1.5e-7 — far
    below bf16 resolution). Mosaic has no erf primitive."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_exact(xf):
    """Exact (erf-based) GELU in fp32 (reference uses torch.nn.GELU default
    = erf, not the tanh approximation)."""
    return 0.5 * xf * (1.0 + _erf(xf * (1.0 / math.sqrt(2.0))))


def _layer_stack_kernel(
    lens_ref,   # SMEM (B, 2) int32 true lengths per pair
    *rest,      # [tok_b SMEM, match_b SMEM when width] d0, d1, f0, f1,
                # weight refs (see _weight_args) [tok_w, match_w], then the
                # output refs: out0, out1 [, exit, keep0, keep1], then the
                # keep-mask scratch refs (width only)
    scale: float,
    num_heads: int,
    head_dim: int,
    stat_dtype,
    attn_dtype,
    masked: bool,
    quantized: bool,
    cross_transposed: bool,
    w8a8: bool = False,
    adaptive: bool = False,
    n_layers: int = 0,
    depth_confidence: float = -1.0,
    width: bool = False,
    width_confidence: float = -1.0,
    layer_offset: int = 0,
    has_exited_in: bool = False,
):
    # layer_offset > 0: this call runs layers [offset, offset+grid) of an
    # n_layers-deep stack (the bucket-ladder downshift's second phase);
    # thresholds/exit values use the GLOBAL layer index. has_exited_in: an
    # extra SMEM (B,) flag marking pairs that already exited in a previous
    # phase — they skip every layer and pass activations through.
    base = 0
    if has_exited_in:
        exited_ref = rest[0]
        base = 1
    if width:
        tokb_ref, matchb_ref = rest[base], rest[base + 1]
        d0_ref, d1_ref, f0_ref, f1_ref = rest[base + 2 : base + 6]
        wrefs = rest[base + 6 : -11]
        (
            tok_w_ref, match_w_ref,
            out0_ref, out1_ref, exit_ref, keep0_out, keep1_out,
            keep0_s, keep1_s, krow0_s, krow1_s,
        ) = rest[-11:]
    elif adaptive:
        tokb_ref = rest[base]
        d0_ref, d1_ref, f0_ref, f1_ref = rest[base + 1 : base + 5]
        wrefs = rest[base + 5 : -4]
        tok_w_ref = rest[-4]
        out0_ref, out1_ref, exit_ref = rest[-3:]
    else:
        d0_ref, d1_ref, f0_ref, f1_ref = rest[:4]
        wrefs, out0_ref, out1_ref = rest[4:-2], rest[-2], rest[-1]
    t = pl.program_id(0)
    l = pl.program_id(1)
    n0 = d0_ref.shape[1]
    n1 = d1_ref.shape[1]
    e = d0_ref.shape[2]
    half = head_dim // 2

    @pl.when(l == 0)
    def _():
        out0_ref[...] = d0_ref[...]
        out1_ref[...] = d1_ref[...]
        if adaptive:
            # sentinel "not exited": any value > n_layers; the last layer
            # forces a real exit so the sentinel never survives a full-depth
            # call (a phase-1 downshift call can return it — meaning "still
            # running", resolved by the next phase)
            if has_exited_in:
                # pairs that exited in an earlier phase: 0.0 fails the live
                # check at every l, so all layers skip and the activations
                # pass through untouched
                exit_ref[...] = jnp.where(
                    exited_ref[t, 0] > 0,
                    0.0,
                    jnp.full(exit_ref.shape, n_layers + 1.0, jnp.float32),
                )
            else:
                exit_ref[...] = jnp.full(
                    exit_ref.shape, n_layers + 1.0, jnp.float32
                )
        if width:
            # cumulative keep mask, initialized to the valid prefix; width
            # pruning (upstream get_pruning_mask) clears lanes as layers
            # retire tokens — masking below keys off THIS, not lens. The
            # OUTPUT copy is also seeded here so a pair that never runs a
            # layer (exited in a previous downshift phase) still reports
            # its valid prefix instead of uninitialized memory.
            r0 = jax.lax.broadcasted_iota(jnp.int32, keep0_s.shape, 0)
            r1 = jax.lax.broadcasted_iota(jnp.int32, keep1_s.shape, 0)
            keep0_s[...] = jnp.where(r0 < lens_ref[t, 0], 1.0, 0.0)
            keep1_s[...] = jnp.where(r1 < lens_ref[t, 1], 1.0, 0.0)
            keep0_out[...] = keep0_s[...][None]
            keep1_out[...] = keep1_s[...][None]
            # lane-oriented keep row for S-column masking, maintained in
            # scratch and refreshed ONLY when pruning actually retires a
            # token (see the decision block) — the per-layer (N, N) iota
            # identity + transpose matmul it replaces was pure adaptive tax
            c0 = jax.lax.broadcasted_iota(jnp.int32, krow0_s.shape, 1)
            c1 = jax.lax.broadcasted_iota(jnp.int32, krow1_s.shape, 1)
            krow0_s[...] = jnp.where(c0 < lens_ref[t, 0], 1.0, 0.0)
            krow1_s[...] = jnp.where(c1 < lens_ref[t, 1], 1.0, 0.0)

    x0 = out0_ref[0]                    # (N0, E)
    x1 = out1_ref[0]                    # (N1, E)
    dt = x0.dtype

    # walk the flat ref list in the exact order _weight_args produced it;
    # int8 weights carry a per-output-channel fp32 scale ref after w_q
    # (the TRT-"best"-engine analog — dequant happens in VMEM, HBM sees
    # half the weight bytes)
    cursor = [0]

    def _take():
        r = wrefs[cursor[0]]
        cursor[0] += 1
        return r

    def _take_linear():
        if quantized:
            wq, sc = _take(), _take()
            b = _take()
            if w8a8:
                # real-int8 mode: hand the raw int8 weight + per-channel
                # scale refs to _linear for an int8 x int8 MXU matmul
                return ("q8", wq, sc, b)
            return (
                "f",
                lambda: (wq[0].astype(jnp.float32) * sc[0]).astype(dt),
                b,
            )
        w = _take()
        b = _take()
        return "f", (lambda: w[0].astype(dt)), b

    sqkv = _take_linear()
    sqkv_b = sqkv[-1]
    sout = _take_linear()
    sffn1 = _take_linear()
    sln_g, sln_b = _take(), _take()
    sffn2 = _take_linear()
    cqk = _take_linear()
    cv = _take_linear()
    cout = _take_linear()
    cffn1 = _take_linear()
    cln_g, cln_b = _take(), _take()
    cffn2 = _take_linear()

    low_precision_stats = stat_dtype != jnp.float32

    def _quant(v):
        return (
            v.astype(stat_dtype).astype(jnp.float32)
            if low_precision_stats
            else v
        )

    # All-masked softmax guard (ADVICE r4): if width pruning retires every
    # token of one image (or a masked length is 0), a whole S row/column is
    # the -1e30 sentinel and its max m IS the sentinel. exp(s - m) is then
    # exp(0) = 1 under fp32 stats (o becomes a garbage mean over retired v
    # rows) or exp(+1e28) = inf under bf16-requantized stats (m rounds past
    # s, poisoning o with inf*0 NaN that `o * kouts` keeps). Clamping the
    # ROW/COLUMN max to -5e29 fixes both: an all-masked row's exponents
    # become s - m <= -5e29 -> exp == 0 exactly, so lsum == 0 and the
    # existing guard yields o == 0 (graceful empty attention); real rows
    # have maxes orders of magnitude above the clamp and are untouched.
    # Clamping the (N, 1) stats vector costs ~N VPU ops vs the N^2 of an
    # elementwise p guard — the first r5 guard did the latter and measured
    # ~5% on EVERY masked dispatch (bench_final.2: masked 1.132 vs r4 1.08).
    _DEAD = _NEG_INF * 0.5

    def _safe_max(m):
        return jnp.maximum(m, _DEAD)

    # NOTE on masking strategy (chip-measured, golden/chip_r03): a dynamic
    # KV trip count (online-softmax fori_loop over 256-col blocks, skipping
    # blocks past the true length) was built and A/B'd on the chip — it LOST
    # at every shape (1024 masked-70%: 1.39 vs 1.22 ms; mixed 256x512:
    # 0.429 vs 0.327 ms): at N <= 1024 the dense single-pass matmul is so
    # MXU-efficient that skipped FLOPs never repay the loop/carry overhead.
    # Partial buckets save wall-clock via the 128-step bucket ladder
    # instead (config.PipelineConfig.buckets — a 700-kpt pair dispatches to
    # the dense 768 executable), so the in-kernel masking below is purely
    # for correctness, like the CUDA reference's tail-tile masking
    # (attention_headdim_64_fp16in_fp16out.cu:475-494).
    if masked:
        lens = (lens_ref[t, 0], lens_ref[t, 1])
        cols0 = jax.lax.broadcasted_iota(jnp.int32, (n0, n0), 1)
        cols1 = jax.lax.broadcasted_iota(jnp.int32, (n1, n1), 1)
        cross_cols = jax.lax.broadcasted_iota(jnp.int32, (n0, n1), 1)
        if cross_transposed:
            cross_cols_t = jax.lax.broadcasted_iota(jnp.int32, (n1, n0), 1)
        else:
            cross_rows = jax.lax.broadcasted_iota(jnp.int32, (n0, n1), 0)
        out_rows0 = jax.lax.broadcasted_iota(jnp.int32, (n0, head_dim), 0)
        out_rows1 = jax.lax.broadcasted_iota(jnp.int32, (n1, head_dim), 0)
        self_cols = (cols0, cols1)
        out_rows = (out_rows0, out_rows1)

    def _run_layer():
        x0 = out0_ref[0]
        x1 = out1_ref[0]
        if width:
            # keep-mask views in both orientations. The scratch is sublane-
            # oriented (N, 128); S-matrix column masking needs a LANE vector
            # (1, N) — maintained in the krow scratch (seeded from lens at
            # l == 0, refreshed by identity matmul only on steps where
            # pruning retires a token), instead of the per-layer (N, N)
            # iota identity + transpose matmul the r4 kernel paid
            # unconditionally (VERDICT r4 next #5).
            kcol0 = keep0_s[:, 0:1]  # (N0, 1) f32 0/1
            kcol1 = keep1_s[:, 0:1]
            krow0 = krow0_s[0:1, :]  # (1, N0) f32 0/1
            krow1 = krow1_s[0:1, :]
            krows = (krow0, krow1)
            kouts = (
                keep0_s[:, 0:head_dim],
                keep1_s[:, 0:head_dim],
            )
        def _aquant(v):
            """Per-row dynamic symmetric int8 activation quantization
            (W8A8 mode): returns (int8 values, fp32 per-row scale)."""
            vf = v.astype(jnp.float32)
            amax = jnp.max(jnp.abs(vf), axis=-1, keepdims=True)
            sa = jnp.maximum(amax, 1e-6) * (1.0 / 127.0)
            vq = jnp.clip(jnp.round(vf / sa), -127.0, 127.0).astype(jnp.int8)
            return vq, sa

        def _doti8(aq, wq):
            """int8 x int8 -> int32 on the MXU (v5e: ~2x the bf16 rate)."""
            return jax.lax.dot_general(
                aq,
                wq,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        def _linear(v, lin):
            """v @ w + b with fp32 accumulation, result in the activation dtype.

            Operands run in attn_dtype: for the MIXED rung (fp32 activations,
            bf16 attn_dtype) this makes every projection a single bf16-operand
            MXU pass with fp32 accumulation instead of a HIGHEST multi-pass
            fp32 matmul — softmax stats, LayerNorm, and residual carries stay
            fp32 (VERDICT r2 #7; the FP32 rung keeps true-fp32 operands and
            infers HIGHEST in _dot). W8A8 ("q8") lins run the matmul in real
            int8 and dequantize the int32 accumulator by the per-row
            activation scale x per-output-channel weight scale."""
            if lin[0] == "q8":
                _, wq, sc, b_ref = lin
                vq, sa = _aquant(v)
                y = _doti8(vq, wq[0]).astype(jnp.float32) * sa * sc[0]
                return y.astype(dt) + b_ref[0].astype(dt)
            _, wfn, b_ref = lin
            y = _dot(v.astype(attn_dtype), wfn().astype(attn_dtype)).astype(dt)
            return y + b_ref[0].astype(dt)

        def _rope(v, f_ref):
            # cast freqs to the OPERAND dtype (not dt): in MIXED, v is already
            # the bf16 attention operand and fp32 freqs would silently promote
            # q/k back to fp32 (forcing HIGHEST matmuls on the QK dot)
            cos = f_ref[0, 0].astype(v.dtype)   # (N, D) tiled per-half freqs
            sin = f_ref[0, 1].astype(v.dtype)
            rot = jnp.concatenate([-v[:, half:], v[:, :half]], axis=-1)
            return v * cos + rot * sin

        def _ffn(xin, message, lin1, g_ref, bn_ref, lin2):
            h = jnp.concatenate([xin, message], axis=-1)     # (N, 2E)
            h = _linear(h, lin1)
            hf = h.astype(jnp.float32)
            mean = jnp.mean(hf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(hf), axis=-1, keepdims=True) - jnp.square(
                mean
            )
            normed = (hf - mean) * jax.lax.rsqrt(var + 1e-5)
            normed = normed * g_ref[0].astype(jnp.float32) + bn_ref[0].astype(
                jnp.float32
            )
            act = _gelu_exact(normed).astype(dt)
            return xin + _linear(act, lin2)

        # ---- self-attention block (reference lightglue.py:118-152) ----------
        # each image runs its own projections: (N, E) @ (E, E) keeps the MXU
        # saturated at every bucket size, and separate rows are what lets the
        # two buckets DIFFER (mixed 256x512 pairs run here, not on the ~1.6x
        # slower per-block fallback)
        # component-major (3, E, E) weights; operands in attn_dtype like
        # _linear (single-pass MXU matmuls for MIXED, true fp32 for FP32).
        # W8A8: activations quantized ONCE per image, three int8 component
        # matmuls dequantized on their int32 accumulators.
        if sqkv[0] != "q8":
            qkv_w = sqkv[1]().astype(attn_dtype)
        xs = (x0, x1)
        frefs = (f0_ref, f1_ref)
        new_xs = []
        for img in range(2):
            xi = xs[img]
            xa = xi.astype(attn_dtype)  # matmul operand; residual stays dt
            if sqkv[0] == "q8":
                xq, sa = _aquant(xi)
                wq3, sc3 = sqkv[1][0], sqkv[2][0]  # (3, E, E) i8 / (3, 1, E)

                def _qcomp(c):
                    y = (
                        _doti8(xq, wq3[c]).astype(jnp.float32) * sa * sc3[c]
                    )
                    return y.astype(dt) + sqkv_b[0, c : c + 1, :].astype(dt)

                q_img, k_img, v_img = _qcomp(0), _qcomp(1), _qcomp(2)
            else:
                q_img = (
                    _dot(xa, qkv_w[0]).astype(dt)
                    + sqkv_b[0, 0:1, :].astype(dt)
                )
                k_img = (
                    _dot(xa, qkv_w[1]).astype(dt)
                    + sqkv_b[0, 1:2, :].astype(dt)
                )
                v_img = (
                    _dot(xa, qkv_w[2]).astype(dt)
                    + sqkv_b[0, 2:3, :].astype(dt)
                )
            heads = []
            for h in range(num_heads):
                c0 = h * head_dim
                # attention operands run in attn_dtype (MIXED: fp32 activations
                # with bf16 attention inputs, mirroring the plugin's internal
                # fp32->fp16 downcast, lightglue_attention_plugin.cpp:222-267)
                q_h = _rope(
                    q_img[:, c0 : c0 + head_dim].astype(attn_dtype), frefs[img]
                )
                k_h = _rope(
                    k_img[:, c0 : c0 + head_dim].astype(attn_dtype), frefs[img]
                )
                v_h = v_img[:, c0 : c0 + head_dim].astype(attn_dtype)
                s = _quant(_dot(q_h, k_h, contract=((1,), (1,))) * scale)
                if width:
                    s = jnp.where(krows[img] >= 0.5, s, _NEG_INF)
                elif masked:
                    s = jnp.where(self_cols[img] < lens[img], s, _NEG_INF)
                m = _quant(jnp.max(s, axis=1, keepdims=True))
                if width or masked:
                    m = _safe_max(m)
                p = _quant(jnp.exp(s - m))
                lsum = _quant(jnp.sum(p, axis=1, keepdims=True))
                o = _dot(p.astype(attn_dtype), v_h) / jnp.where(
                    lsum == 0.0, 1.0, lsum
                )
                if width:
                    o = o * kouts[img]
                elif masked:
                    o = jnp.where(out_rows[img] < lens[img], o, 0.0)
                heads.append(o.astype(dt))
            ctx = jnp.concatenate(heads, axis=-1)  # (N, E)
            message = _linear(ctx, sout)
            new_xs.append(_ffn(xi, message, sffn1, sln_g, sln_b, sffn2))
        x0, x1 = new_xs

        # ---- cross-attention block (reference lightglue.py:168-205) ----------
        qk0_all = _linear(x0, cqk)
        qk1_all = _linear(x1, cqk)
        v0_all = _linear(x0, cv)
        v1_all = _linear(x1, cv)
        m0_heads, m1_heads = [], []
        for h in range(num_heads):
            c0 = h * head_dim
            qk0 = qk0_all[:, c0 : c0 + head_dim].astype(attn_dtype)
            qk1 = qk1_all[:, c0 : c0 + head_dim].astype(attn_dtype)
            v0 = v0_all[:, c0 : c0 + head_dim].astype(attn_dtype)
            v1 = v1_all[:, c0 : c0 + head_dim].astype(attn_dtype)

            # shared similarity matrix, computed once; direction 1->0 rides its
            # transpose as a free contraction-axis choice on the MXU
            s = _quant(_dot(qk0, qk1, contract=((1,), (1,))) * scale)  # (N0, N1)

            # normalization by the softmax denominator happens AFTER the PV
            # matmul on the (N, D) output, not on the (N, N) probability matrix
            # — 16x fewer VPU divides at D=64 (same algebra: l is constant along
            # the contraction)
            if width:
                s_row = jnp.where(krow1 >= 0.5, s, _NEG_INF)
            elif masked:
                s_row = jnp.where(cross_cols < lens[1], s, _NEG_INF)
            else:
                s_row = s
            m0s = _quant(jnp.max(s_row, axis=1, keepdims=True))
            if width or masked:
                m0s = _safe_max(m0s)
            p0 = _quant(jnp.exp(s_row - m0s))
            l0 = _quant(jnp.sum(p0, axis=1, keepdims=True))    # (N0, 1)
            o0 = _dot(p0.astype(attn_dtype), v1) / jnp.where(l0 == 0.0, 1.0, l0)

            if cross_transposed:
                # direction 1->0 on its own row-major similarity matrix: one
                # extra (N1, D) x (D, N0) MXU matmul buys a lane-wise (axis=1)
                # max/sum instead of the cross-sublane axis-0 reduction and the
                # ones-vector column-sum matmul. st == s.T up to the same
                # fp32-accumulated dot products; the softmax DENOMINATORS round
                # differently (the default path sums a bf16-cast p via the ones
                # matmul, this path sums fp32 p1), so parity vs the default is
                # to ~0.005*scale, not bitwise.
                st = _quant(_dot(qk1, qk0, contract=((1,), (1,))) * scale)
                if width:
                    st = jnp.where(krow0 >= 0.5, st, _NEG_INF)
                elif masked:
                    st = jnp.where(cross_cols_t < lens[0], st, _NEG_INF)
                m1s = _quant(jnp.max(st, axis=1, keepdims=True))
                if width or masked:
                    m1s = _safe_max(m1s)
                p1 = _quant(jnp.exp(st - m1s))
                l1 = _quant(jnp.sum(p1, axis=1, keepdims=True))   # (N1, 1)
                o1 = _dot(p1.astype(attn_dtype), v0)
                o1 = o1 / jnp.where(l1 == 0.0, 1.0, l1)
            else:
                if width:
                    s_col = jnp.where(kcol0 >= 0.5, s, _NEG_INF)
                elif masked:
                    s_col = jnp.where(cross_rows < lens[0], s, _NEG_INF)
                else:
                    s_col = s
                m1s = _quant(jnp.max(s_col, axis=0, keepdims=True))
                if width or masked:
                    m1s = _safe_max(m1s)
                p1 = _quant(jnp.exp(s_col - m1s)).astype(attn_dtype)
                # column sums in (N1, 1) orientation via a ones-vector
                # contraction on the MXU — a (1, N1) keepdims sum would need a
                # cross-lane relayout to divide the (N1, D) output
                l1 = _quant(
                    _dot(p1, jnp.ones((n0, 1), attn_dtype), contract=((0,), (0,)))
                )
                o1 = _dot(p1, v0, contract=((0,), (0,)))
                o1 = o1 / jnp.where(l1 == 0.0, 1.0, l1)

            if width:
                o0 = o0 * kouts[0]
                o1 = o1 * kouts[1]
            elif masked:
                o0 = jnp.where(out_rows[0] < lens[0], o0, 0.0)
                o1 = jnp.where(out_rows[1] < lens[1], o1, 0.0)
            m0_heads.append(o0.astype(dt))
            m1_heads.append(o1.astype(dt))
        m0 = _linear(jnp.concatenate(m0_heads, axis=-1), cout)
        m1 = _linear(jnp.concatenate(m1_heads, axis=-1), cout)
        x0 = _ffn(x0, m0, cffn1, cln_g, cln_b, cffn2)
        x1 = _ffn(x1, m1, cffn1, cln_g, cln_b, cffn2)

        out0_ref[...] = x0[None]
        out1_ref[...] = x1[None]

        if adaptive:
            # ---- in-kernel adaptive-depth decision (upstream LightGlue
            # depth_confidence semantics; reference lightglue.py:87-99 +
            # check_if_stop). Confidence compares happen in LOGIT space:
            # sigmoid(x@w + b) >= th  <=>  x@w >= logit(th) - b, so no
            # sigmoid materializes. tok_w lanes carry the single output
            # column REPLICATED 128x — the count divides by 128 (exact in
            # fp32) instead of lane-masking.
            #
            # r5 full-depth-tax cuts (VERDICT r4 next #5): the forced-stop
            # LAST layer only writes the exit register — no confidence or
            # matchability matvecs (they were unconditional); the depth
            # machinery (count/threshold/stop) is compiled out entirely in
            # width-only mode (depth_confidence is the unreachable >= 1
            # sentinel); keep-mask scratch, keep outputs and the lane-
            # oriented krow refresh are written only on steps where pruning
            # actually retires a kept token.
            lf = (l + layer_offset).astype(jnp.float32)
            is_last = (l + layer_offset) == (n_layers - 1)
            depth_on = depth_confidence < 1.0

            @pl.when(jnp.logical_not(is_last))
            def _decide():
                th = jnp.clip(
                    0.8 + 0.1 * jnp.exp(-4.0 * lf / float(n_layers)),
                    0.0,
                    1.0,
                )
                # th <= 0.9 so log(1 - th) is well-conditioned (no log1p
                # in Mosaic)
                thr = jnp.log(th) - jnp.log(1.0 - th) - tokb_ref[l, 0]
                tok_w = tok_w_ref[0].astype(attn_dtype)  # (E, 128) replic.
                lgt0 = _dot(x0.astype(attn_dtype), tok_w)  # (N0, 128) fp32
                lgt1 = _dot(x1.astype(attn_dtype), tok_w)
                if depth_on:
                    rows0 = jax.lax.broadcasted_iota(
                        jnp.int32, (n0, 128), 0
                    )
                    rows1 = jax.lax.broadcasted_iota(
                        jnp.int32, (n1, 128), 0
                    )
                    if width:
                        # pruned tokens neither count as confident nor
                        # toward the total — mirrors the while_loop path
                        # where compaction shrinks the true lengths before
                        # the next decision
                        valid0 = keep0_s[...] >= 0.5
                        valid1 = keep1_s[...] >= 0.5
                        total = jnp.maximum(
                            (jnp.sum(keep0_s[...]) + jnp.sum(keep1_s[...]))
                            * (1.0 / 128.0),
                            1.0,
                        )
                    elif masked:
                        valid0 = rows0 < lens[0]
                        valid1 = rows1 < lens[1]
                        total = jnp.maximum(
                            (lens[0] + lens[1]).astype(jnp.float32), 1.0
                        )
                    else:
                        valid0 = rows0 >= 0
                        valid1 = rows1 >= 0
                        total = jnp.float32(n0 + n1)
                    cnt = (
                        jnp.sum(jnp.where((lgt0 >= thr) & valid0, 1.0, 0.0))
                        + jnp.sum(
                            jnp.where((lgt1 >= thr) & valid1, 1.0, 0.0)
                        )
                    ) * (1.0 / 128.0)
                    stop = cnt / total > depth_confidence

                    @pl.when(stop)
                    def _():
                        exit_ref[...] = jnp.full(
                            exit_ref.shape, lf + 1.0, jnp.float32
                        )

                else:
                    stop = jnp.bool_(False)

                if width:
                    # ---- in-kernel width pruning (upstream
                    # get_pruning_mask, reference lightglue.py:260-262 +
                    # 300-301): keep tokens that are matchable OR
                    # unconfident, evaluated in logit space like the depth
                    # head. A pair that stops at this layer prunes nothing
                    # (while_loop parity). Instead of gather-compaction
                    # (impossible in-kernel) the keep mask masks S columns
                    # from the next layer on; compaction to
                    # AdaptiveOutput's contract happens ONCE outside the
                    # kernel (VERDICT r3 weak #3).
                    p_keep = 1.0 - width_confidence
                    mthr = (
                        math.log(p_keep) - math.log(1.0 - p_keep)
                    ) - matchb_ref[l, 0]
                    match_w = match_w_ref[0].astype(attn_dtype)  # (E, 128)
                    mlgt0 = _dot(x0.astype(attn_dtype), match_w)
                    mlgt1 = _dot(x1.astype(attn_dtype), match_w)
                    upd0 = jnp.where(
                        (mlgt0 > mthr) | (lgt0 <= thr), 1.0, 0.0
                    )
                    upd1 = jnp.where(
                        (mlgt1 > mthr) | (lgt1 <= thr), 1.0, 0.0
                    )
                    # scratch + outputs + krow are refreshed only when a
                    # currently-kept token is actually retired; multiplying
                    # by an all-ones upd is a no-op the steady state (most
                    # layers of a full-depth run) need not pay
                    fired = (
                        jnp.sum(keep0_s[...] * (1.0 - upd0))
                        + jnp.sum(keep1_s[...] * (1.0 - upd1))
                    ) > 0.0

                    @pl.when(jnp.logical_not(stop) & fired)
                    def _():
                        nk0 = keep0_s[...] * upd0
                        nk1 = keep1_s[...] * upd1
                        keep0_s[...] = nk0
                        keep1_s[...] = nk1
                        # the exit step's (un-updated) mask is what
                        # survives to the output — later steps of a stopped
                        # pair skip _run_layer, and un-fired steps keep the
                        # previous (identical) write
                        keep0_out[...] = nk0[None]
                        keep1_out[...] = nk1[None]
                        # refresh the lane-oriented keep row: (N, 1)x(N, N)
                        # identity contraction on the MXU (Mosaic has no
                        # cheap cross-layout vector transpose — CLAUDE.md
                        # lane-offset notes); ~1M MACs, and now paid only
                        # per retirement instead of per layer
                        idn0 = (
                            jax.lax.broadcasted_iota(jnp.int32, (n0, n0), 0)
                            == jax.lax.broadcasted_iota(
                                jnp.int32, (n0, n0), 1
                            )
                        ).astype(attn_dtype)
                        idn1 = (
                            jax.lax.broadcasted_iota(jnp.int32, (n1, n1), 0)
                            == jax.lax.broadcasted_iota(
                                jnp.int32, (n1, n1), 1
                            )
                        ).astype(attn_dtype)
                        krow0_s[...] = jnp.broadcast_to(
                            _dot(
                                nk0[:, 0:1].astype(attn_dtype),
                                idn0,
                                contract=((0,), (0,)),
                            ),
                            krow0_s.shape,
                        )
                        krow1_s[...] = jnp.broadcast_to(
                            _dot(
                                nk1[:, 0:1].astype(attn_dtype),
                                idn1,
                                contract=((0,), (0,)),
                            ),
                            krow1_s.shape,
                        )

            @pl.when(is_last)
            def _forced_exit():
                exit_ref[...] = jnp.full(
                    exit_ref.shape, float(n_layers), jnp.float32
                )

    if adaptive:
        if depth_confidence < 1.0 or has_exited_in:
            live = exit_ref[0, 0, 0] > l.astype(jnp.float32)

            @pl.when(live)
            def _():
                _run_layer()
        else:
            # width-only single phase: the exit register holds the sentinel
            # until the forced last-layer write, so every step is live —
            # skip the per-step register read/branch (VERDICT r4 next #5c)
            _run_layer()
    else:
        _run_layer()


def supports(layers_params, n0: int, n1: int, act_dtype, tp_axis) -> bool:
    """Gate: the megakernel handles the fixed-depth, non-TP path (bf16,
    fp32-activation MIXED/FP32, or int8-weight-only), INCLUDING mixed
    buckets (n0 != n1 — e.g. a 256x512 pair); everything else falls back to
    the per-block kernels."""
    if tp_axis is not None:
        return False
    if max(n0, n1) > MAX_SEQ or n0 % 128 or n1 % 128:
        return False
    return jnp.dtype(act_dtype) in (jnp.bfloat16, jnp.float32)


def _weight_args(layers_params, quantized: bool):
    """Flatten the layer pytree into the kernel's positional ref order.
    Per linear: (w, b) or — int8 — (w_q, scale, b); LayerNorm g/b are
    plain. Biases get a broadcast-ready singleton row axis."""

    def lin(p, bias_2d=True):
        b = p["b"][:, None, :] if bias_2d else p["b"]
        if quantized:
            return [p["w_q"], p["scale"], b]
        return [p["w"], b]

    sp = layers_params["self_attn"]
    cp = layers_params["cross_attn"]
    args = []
    args += lin(sp["qkv"], bias_2d=False)       # bias already (L, 3, E)
    args += lin(sp["out"])
    args += lin(sp["ffn1"])
    args += [sp["ln_g"][:, None, :], sp["ln_b"][:, None, :]]
    args += lin(sp["ffn2"])
    args += lin(cp["qk"])
    args += lin(cp["v"])
    args += lin(cp["out"])
    args += lin(cp["ffn1"])
    args += [cp["ln_g"][:, None, :], cp["ln_b"][:, None, :]]
    args += lin(cp["ffn2"])
    return args


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads",
        "head_dim",
        "scale",
        "stat_dtype",
        "attn_dtype",
        "cross_transposed",
    ),
)
def transformer_stack(
    layers_params,
    d0: jax.Array,
    d1: jax.Array,
    freqs0: jax.Array,
    freqs1: jax.Array,
    lengths0: Optional[jax.Array],
    lengths1: Optional[jax.Array],
    *,
    num_heads: int,
    head_dim: int,
    scale: Optional[float] = None,
    stat_dtype=jnp.float32,
    attn_dtype=None,
    cross_transposed: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Run all stacked LightGlue layers in one kernel.

    Args:
      layers_params: the ``params["layers"]`` pytree (leading layer axis L).
      d0/d1: (B, N0, E) / (B, N1, E) descriptors (buckets may differ).
      freqs0/freqs1: (B, 2, N, D) fp32 rope [cos; sin] (tiled per-half).
      lengths0/lengths1: optional (B,) true keypoint counts.
      cross_transposed: compute the 1->0 cross direction on its own
        row-major (N1, N0) similarity matmul (lane-wise softmax stats)
        instead of axis-0 stats over the shared (N0, N1) matrix. Same
        fp32-accumulated dot products (denominator rounding differs at bf16
        scale); chip A/B: scripts/bench_cross_transposed.py — the definitive
        interleaved run (golden/chip_r03/cross_transposed_definitive.txt)
        measured the variants equivalent within relay variance at every
        shape. Default: OFF unless LGTPU_CROSS_TRANSPOSED=1.

    Returns:
      (d0', d1'): same shapes after all layers.
    """
    if cross_transposed is None:
        cross_transposed = _cross_transposed_default()
    b, n0, e = d0.shape
    n1 = d1.shape[1]
    n_layers = layers_params["self_attn"]["ln_g"].shape[0]
    if scale is None:
        scale = 1.0 / math.sqrt(head_dim)
    stat_dtype = jnp.dtype(stat_dtype)
    attn_dtype = jnp.dtype(attn_dtype) if attn_dtype is not None else d0.dtype

    masked = lengths0 is not None
    if lengths0 is None:
        lens = jnp.zeros((b, 2), jnp.int32)
    else:
        lens = jnp.stack(
            [lengths0.astype(jnp.int32), lengths1.astype(jnp.int32)], axis=-1
        )

    freqs0 = freqs0.astype(jnp.float32)
    freqs1 = freqs1.astype(jnp.float32)

    quantized = "w_q" in layers_params["self_attn"]["qkv"]
    weight_args = tuple(_weight_args(layers_params, quantized))

    def _wspec(a):
        blk = (1,) + a.shape[1:]
        return pl.BlockSpec(
            blk,
            lambda t, l: (l,) + (0,) * (a.ndim - 1),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _layer_stack_kernel,
        scale=float(scale),
        num_heads=num_heads,
        head_dim=head_dim,
        stat_dtype=stat_dtype,
        attn_dtype=attn_dtype,
        masked=masked,
        quantized=quantized,
        w8a8=quantized and _w8a8_default(),
        cross_transposed=cross_transposed,
    )

    # per pair per layer: 7 ExE projections + 2 FFNs + self/cross attention
    nsum = n0 + n1
    proj_flops = (
        2 * nsum * e * e * 7
        + 2 * (2 * nsum * (2 * e) * (2 * e) + 2 * nsum * (2 * e) * e)
    )
    attn_flops = num_heads * head_dim * (
        (n0 * n0 + n1 * n1) * (2 * 2 + 3)
        + n0 * n1 * (2 * 2 + 3 + (2 if cross_transposed else 0))
    )
    flops = b * n_layers * (proj_flops + attn_flops)
    weight_bytes = sum(a.size * a.dtype.itemsize for a in weight_args)

    out0, out1 = pl.pallas_call(
        kernel,
        grid=(b, n_layers),
        in_specs=[
            pl.BlockSpec(
                (b, 2), lambda t, l: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, n0, e), lambda t, l: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n1, e), lambda t, l: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 2, n0, head_dim),
                lambda t, l: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2, n1, head_dim),
                lambda t, l: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [_wspec(a) for a in weight_args],
        out_specs=[
            pl.BlockSpec(
                (1, n0, e), lambda t, l: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n1, e), lambda t, l: (t, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n0, e), d0.dtype),
            jax.ShapeDtypeStruct((b, n1, e), d1.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2
            * (d0.size + d1.size)
            * d0.dtype.itemsize
            + b * weight_bytes
            + (freqs0.size + freqs1.size) * 4,
            transcendentals=b
            * n_layers
            * num_heads
            * (n0 * n0 + n1 * n1 + 2 * n0 * n1),
        ),
        # the default 16 MB scoped-vmem cap is too small for the resident
        # activations + double-buffered weights + one fp32 S tile (~23 MB
        # bf16, ~2x for the fp32-activation rungs)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(
                40 if d0.dtype == jnp.bfloat16 else 80
            )
            * 1024
            * 1024
        ),
        interpret=_interpret(),
    )(lens, d0, d1, freqs0, freqs1, *weight_args)
    return out0, out1


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads",
        "head_dim",
        "scale",
        "stat_dtype",
        "attn_dtype",
        "cross_transposed",
        "depth_confidence",
        "width_confidence",
        "layer_offset",
        "total_layers",
        "masked",
    ),
)
def transformer_stack_adaptive(
    layers_params,
    token_params,
    d0: jax.Array,
    d1: jax.Array,
    freqs0: jax.Array,
    freqs1: jax.Array,
    lengths0: jax.Array,
    lengths1: jax.Array,
    match_params=None,
    exited: Optional[jax.Array] = None,
    *,
    num_heads: int,
    head_dim: int,
    depth_confidence: float,
    width_confidence: float = -1.0,
    layer_offset: int = 0,
    total_layers: Optional[int] = None,
    scale: Optional[float] = None,
    stat_dtype=jnp.float32,
    attn_dtype=None,
    cross_transposed: Optional[bool] = None,
    masked: bool = True,
) -> Tuple[jax.Array, ...]:
    """All layers in one kernel WITH in-kernel adaptive depth (early exit).

    The fixed-depth megakernel extended with the upstream depth_confidence
    semantics evaluated ON DEVICE inside the SAME pallas_call: after each
    layer the token-confidence head runs on the VMEM-resident activations
    (one (N, E) x (E, 128) matmul in logit space — no sigmoid, no extra
    dispatch) and a per-pair exit register gates the remaining layer grid
    steps with ``pl.when``. A stopped pair's later steps skip ALL compute
    (weights still stream — the grid is static) and its activations stay
    frozen, exactly like the lax.while_loop path in
    models/lightglue.py:_forward_adaptive_impl — but without the per-layer
    kernel launches, separate confidence matvec kernels and loop-carry
    overhead that made adaptive exit-9 cost 27% over fixed depth
    (golden/chip_r03/bench.out). Width pruning needs gather-based
    compaction and stays on the loop path.

    Args:
      token_params: {"w": (L-1, E, 1), "b": (L-1, 1)} confidence heads
        (layer L-1 has none upstream; the last slot is padded and never
        consulted because the last layer forces an exit).
      lengths0/lengths1: (B,) true keypoint counts (required — the session
        always dispatches adaptive with lengths).
      match_params: the per-layer matchability head {"w": (L, E, 1),
        "b": (L, 1)} — supplying it together with ``width_confidence > 0``
        turns on IN-KERNEL width pruning: a cumulative per-token keep mask
        (VMEM scratch) masks retired tokens out of every S matrix from the
        next layer on, exactly the math the while_loop path gets from
        per-layer compaction (attention is the only cross-token op, so
        masked-in-place == compacted up to fp summation order). The final
        masks are returned for ONE tail compaction outside the kernel.

    Returns:
      (d0', d1', exit_layer) — depth-only; with width also
      (..., keep0, keep1): (B, N, 128) fp32 0/1 keep masks at each pair's
      exit layer (lane 0 meaningful, lanes replicated).
    """
    if cross_transposed is None:
        cross_transposed = _cross_transposed_default()
    b, n0, e = d0.shape
    n1 = d1.shape[1]
    # grid length = layers present in THIS call (a downshift phase passes a
    # slice); total_layers = the logical stack depth for thresholds/forced
    # exit at the true last layer
    phase_layers = layers_params["self_attn"]["ln_g"].shape[0]
    n_layers = (
        int(total_layers)
        if total_layers is not None
        else layer_offset + phase_layers
    )
    if scale is None:
        scale = 1.0 / math.sqrt(head_dim)
    stat_dtype = jnp.dtype(stat_dtype)
    attn_dtype = jnp.dtype(attn_dtype) if attn_dtype is not None else d0.dtype

    lens = jnp.stack(
        [lengths0.astype(jnp.int32), lengths1.astype(jnp.int32)], axis=-1
    )
    freqs0 = freqs0.astype(jnp.float32)
    freqs1 = freqs1.astype(jnp.float32)

    # token head: pad the layer axis (the padded slot is never consulted —
    # the true last layer forces an exit) and replicate the single output
    # column across 128 lanes (see the kernel's count-by-128 trick)
    tok_w = token_params["w"]                        # (phase or L-1, E, 1)
    if tok_w.shape[0] < phase_layers:
        tok_w = jnp.concatenate([tok_w, tok_w[-1:]], axis=0)
    tok_w = jnp.broadcast_to(tok_w, (phase_layers, e, 128)).astype(d0.dtype)
    tok_b = token_params["b"].astype(jnp.float32)    # matches tok_w rows
    if tok_b.shape[0] < phase_layers:
        tok_b = jnp.concatenate([tok_b, tok_b[-1:]], axis=0)

    width = match_params is not None and width_confidence > 0
    if width:
        match_w = jnp.broadcast_to(
            match_params["w"], (phase_layers, e, 128)
        ).astype(d0.dtype)
        match_b = match_params["b"].reshape(phase_layers, 1).astype(
            jnp.float32
        )

    quantized = "w_q" in layers_params["self_attn"]["qkv"]
    weight_args = tuple(_weight_args(layers_params, quantized))

    def _wspec(a):
        blk = (1,) + a.shape[1:]
        return pl.BlockSpec(
            blk,
            lambda t, l: (l,) + (0,) * (a.ndim - 1),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _layer_stack_kernel,
        scale=float(scale),
        num_heads=num_heads,
        head_dim=head_dim,
        stat_dtype=stat_dtype,
        attn_dtype=attn_dtype,
        # masked=False is the FULL-BUCKET adaptive variant (every pair's
        # length == bucket): the per-head S-masking wheres and Q-row
        # zeroing are no-ops there and cost ~5% (bench masked 1.082 vs
        # unmasked 1.031) — the session dispatches it for cap-full batches
        # (depth-only; width masks via the keep rows regardless)
        masked=masked,
        quantized=quantized,
        w8a8=quantized and _w8a8_default(),
        cross_transposed=cross_transposed,
        adaptive=True,
        n_layers=int(n_layers),
        depth_confidence=float(depth_confidence),
        width=width,
        width_confidence=float(width_confidence),
        layer_offset=int(layer_offset),
        has_exited_in=exited is not None,
    )

    nsum = n0 + n1
    proj_flops = (
        2 * nsum * e * e * 7
        + 2 * (2 * nsum * (2 * e) * (2 * e) + 2 * nsum * (2 * e) * e)
        + 2 * nsum * e * 128  # confidence head
    )
    attn_flops = num_heads * head_dim * (
        (n0 * n0 + n1 * n1) * (2 * 2 + 3)
        + n0 * n1 * (2 * 2 + 3 + (2 if cross_transposed else 0))
    )
    flops = b * n_layers * (proj_flops + attn_flops)
    weight_bytes = sum(
        a.size * a.dtype.itemsize for a in weight_args
    ) + tok_w.size * tok_w.dtype.itemsize

    in_specs = [
        pl.BlockSpec(
            (b, 2), lambda t, l: (0, 0), memory_space=pltpu.SMEM
        ),
    ]
    if exited is not None:
        in_specs.append(
            pl.BlockSpec(
                (b, 1), lambda t, l: (0, 0), memory_space=pltpu.SMEM
            )
        )
    in_specs.append(
        pl.BlockSpec(
            (phase_layers, 1), lambda t, l: (0, 0), memory_space=pltpu.SMEM
        )
    )
    if width:
        in_specs.append(
            pl.BlockSpec(
                (phase_layers, 1), lambda t, l: (0, 0),
                memory_space=pltpu.SMEM,
            )
        )
    in_specs += [
        pl.BlockSpec(
            (1, n0, e), lambda t, l: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, n1, e), lambda t, l: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, 2, n0, head_dim),
            lambda t, l: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 2, n1, head_dim),
            lambda t, l: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    in_specs += [_wspec(a) for a in weight_args]
    in_specs += [_wspec(tok_w)]
    if width:
        in_specs += [_wspec(match_w)]

    out_specs = [
        pl.BlockSpec(
            (1, n0, e), lambda t, l: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, n1, e), lambda t, l: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            # (8, 128) per pair: the minimum sublane x lane tile — a
            # (1, 128) block violates the 8-sublane divisibility rule
            # for B > 1
            (1, 8, 128), lambda t, l: (t, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, n0, e), d0.dtype),
        jax.ShapeDtypeStruct((b, n1, e), d1.dtype),
        jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
    ]
    scratch_shapes = []
    if width:
        out_specs += [
            pl.BlockSpec(
                (1, n0, 128), lambda t, l: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n1, 128), lambda t, l: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((b, n0, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, n1, 128), jnp.float32),
        ]
        scratch_shapes = [
            pltpu.VMEM((n0, 128), jnp.float32),
            pltpu.VMEM((n1, 128), jnp.float32),
            # lane-oriented keep rows (8 sublanes = minimum f32 tile),
            # refreshed only when pruning retires a token
            pltpu.VMEM((8, n0), jnp.float32),
            pltpu.VMEM((8, n1), jnp.float32),
        ]

    inputs = [lens]
    if exited is not None:
        inputs.append(exited.astype(jnp.int32).reshape(b, 1))
    inputs.append(tok_b)
    if width:
        inputs.append(match_b)
    inputs += [d0, d1, freqs0, freqs1, *weight_args, tok_w]
    if width:
        inputs.append(match_w)

    outs = pl.pallas_call(
        kernel,
        grid=(b, phase_layers),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * (d0.size + d1.size) * d0.dtype.itemsize
            + b * weight_bytes
            + (freqs0.size + freqs1.size) * 4,
            transcendentals=b
            * n_layers
            * (num_heads * (n0 * n0 + n1 * n1 + 2 * n0 * n1) + 2),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(
                40 if d0.dtype == jnp.bfloat16 else 80
            )
            * 1024
            * 1024
        ),
        interpret=_interpret(),
    )(*inputs)
    if width:
        out0, out1, exit_f, keep0, keep1 = outs
        return (
            out0, out1, exit_f[:, 0, 0].astype(jnp.int32), keep0, keep1
        )
    out0, out1, exit_f = outs
    return out0, out1, exit_f[:, 0, 0].astype(jnp.int32)
