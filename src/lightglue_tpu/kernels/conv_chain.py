"""Two-layer fused conv kernel: conv2a (offset) -> conv2b (+2x2 pool).

SuperPoint's conv2 pair runs as two pallas_calls whose 9.8 MB intermediate
round-trips HBM between them (golden/chip_r04/attrib_sp_layers.out: enc2
delta 0.173 ms vs ~0.10 theoretical). This kernel keeps the conv2a output
strip VMEM-resident and feeds conv2b directly:

  per strip of `rows` conv2b-input rows:
    DMA  input strip (rows+4, U1, 2C)   [conv2a offset-prepadded layout]
    a2 = conv2a offset matmuls          (rows+2, U, 2C) in a zero-framed
                                        scratch with a 1-unit halo — the
                                        halo stays EXACTLY zero (conv2b's
                                        SAME padding), and edge strips
                                        zero their out-of-image halo rows
    out = conv2b parity-block matmuls + bias/relu + lane/row pool

Strip overlap: adjacent strips recompute 2 rows of a2 (the conv2b row
halo) — 2/rows extra conv2a work (~6% at rows=32) against a full HBM
round trip of the intermediate. The layer math replicates
conv.conv3x3_paired(offset=True, out_paired=True) chained into
conv3x3_paired(x_paired=True, pool=True) exactly (reference semantics:
superpoint.py:146-149).

Chip A/B verdict (golden/chip_r04/chain2_fused_ab.out): LOSES ~10% —
the intermediate's HBM round trip is already hidden behind the
double-buffered strip DMA, and the zero-framed halo scratch store +
2-row recompute overlap cost more than it saves. NOT integrated; kept
as a bit-exact tested variant (tests/test_superpoint.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lightglue_tpu.kernels.conv import (
    _pack_offset_weights,
    _pack_paired_weights,
    _pick_rows,
)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _chain_kernel(x_hbm_ref, wa_ref, ba_ref, wb_ref, bb_ref, out_ref,
                  scratch, sems, a2_ref, *,
                  rows, units, c2, h, relu, out_dtype):
    """rows: conv2b-input rows per strip (even); units: W/2; c2 = 2*C."""
    t = pl.program_id(0)
    s = pl.program_id(1)
    nstrips = pl.num_programs(1)
    u1 = x_hbm_ref.shape[2]          # units+1+upad (offset layout)
    cin = c2                          # 128 for C=64

    def strip_dma(slot, idx):
        # conv2a input rows for a2 rows [idx*rows-1, idx*rows+rows+1):
        # prepadded input rows [idx*rows, idx*rows+rows+4) — the +1 halo
        # row of the prepad covers idx*rows-1 at the top edge
        return pltpu.make_async_copy(
            x_hbm_ref.at[t, pl.ds(idx * rows, rows + 4)],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(s == 0)
    def _():
        strip_dma(0, 0).start()

    @pl.when(s + 1 < nstrips)
    def _():
        strip_dma((s + 1) % 2, s + 1).start()

    strip_dma(s % 2, s).wait()
    xs = scratch[s % 2]  # (rows+4, u1, cin)

    prec = (
        jax.lax.Precision.HIGHEST
        if xs.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    # ---- conv2a (offset form) for rows+2 output rows -------------------
    n_a = (rows + 2) * u1
    o = None
    for di in range(3):
        lhs = xs[di : di + rows + 2].reshape(n_a, cin)
        d = dot(lhs, wa_ref[di])           # (n_a, 2*cin)
        o = d if o is None else o + d
    o = o.reshape(rows + 2, u1, 2 * cin)
    # fold the k=1 half in, THEN bias+relu (same order as conv.py)
    a2 = o[:, 0:units, 0:cin] + o[:, 1 : units + 1, cin : 2 * cin]
    a2 = jnp.maximum(a2 + ba_ref[...], 0.0)  # conv2a bias + relu
    # zero the out-of-image conv2b row halo at the edges (SAME padding):
    # a2 row k is global row s*rows - 1 + k, valid in [0, h)
    grow = s * rows - 1 + jax.lax.broadcasted_iota(
        jnp.int32, (rows + 2, units, cin), 0
    )
    a2 = jnp.where((grow >= 0) & (grow < h), a2, 0.0).astype(xs.dtype)

    # unit-halo frame for conv2b's parity-block taps (du = -1, 0, 1):
    # zero-initialize then store the strip at unit offset 1
    a2_ref[...] = jnp.zeros_like(a2_ref)
    a2_ref[:, 1 : units + 1, :] = a2
    af = a2_ref[...]                       # (rows+2, units+2+upad2, cin)

    # ---- conv2b (parity-block) + pool ---------------------------------
    n_b = rows * units
    ob = None
    for di in range(3):
        for du in range(3):
            lhs = af[di : di + rows, du : du + units].reshape(n_b, cin)
            d = dot(lhs, wb_ref[di, du])   # (n_b, 2*cout)
            ob = d if ob is None else ob + d
    ob = ob + bb_ref[...]
    if relu:
        ob = jnp.maximum(ob, 0.0)
    cout2 = ob.shape[-1]
    half = cout2 // 2
    ob = ob.reshape(rows, units, cout2)
    ob = jnp.maximum(ob[:, :, :half], ob[:, :, half:])   # column pool
    ob = jnp.max(ob.reshape(rows // 2, 2, units, half), axis=1)  # row pool
    out_ref[...] = ob[None].astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("relu", "out_dtype", "interpret")
)
def conv2_chain(
    x: jax.Array,
    wa: jax.Array,
    ba: jax.Array,
    wb: jax.Array,
    bb: jax.Array,
    *,
    relu: bool = True,
    out_dtype=None,
    interpret: bool | None = None,
) -> jax.Array:
    """conv2a(offset, relu) -> conv2b(relu) -> 2x2 pool, one pallas_call.

    Args:
      x: (B, H, W, C) unpaired NHWC, C=64, H % 2 == 0 and (H//? strips).
      wa/wb: (3, 3, C, C) HWIO; ba/bb: (C,).

    Returns: (B, H//2, W//2, C).
    """
    btch, h, w_dim, c = x.shape
    units = w_dim // 2
    out_dtype = jnp.dtype(out_dtype) if out_dtype is not None else x.dtype
    interpret = _interpret() if interpret is None else interpret
    rows = _pick_rows(h)

    # conv2a offset-prepad, with ONE extra halo row top/bottom for the
    # conv2b row taps (a2 rows -1 and h)
    upad = (-(units + 1)) % 8
    xp = jnp.pad(x, ((0, 0), (2, 2), (1, 1 + 2 * upad), (0, 0)))
    xp = xp.reshape(btch, h + 4, units + 1 + upad, 2 * c)
    wap = _pack_offset_weights(wa)         # (3, 2C, 4C)
    wbp = _pack_paired_weights(wb)         # (3, 3, 2C, 2C)
    bap = jnp.concatenate([ba, ba]).astype(jnp.float32)
    bbp = jnp.concatenate([bb, bb]).astype(jnp.float32)

    upad2 = (-(units + 2)) % 8
    kernel = functools.partial(
        _chain_kernel, rows=rows, units=units, c2=2 * c, h=h,
        relu=relu, out_dtype=out_dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(btch, h // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (3, 2 * c, 4 * c), lambda t, s: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2 * c), lambda t, s: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, 3, 2 * c, 2 * c), lambda t, s: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2 * c), lambda t, s: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rows // 2, units, c), lambda t, s: (t, s, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (btch, h // 2, units, c), out_dtype
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (2, rows + 4, units + 1 + upad, 2 * c), x.dtype
            ),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((rows + 2, units + 2 + upad2, 2 * c), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * btch * h * w_dim * c * c * 9 * (4 / 3 + 2)),
            bytes_accessed=xp.size * xp.dtype.itemsize
            + btch * (h // 2) * units * c * out_dtype.itemsize
            + (wap.size + wbp.size) * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, wap.astype(x.dtype), bap[None, :], wbp.astype(x.dtype),
      bbp[None, :])
