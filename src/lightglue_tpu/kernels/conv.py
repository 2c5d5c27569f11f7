"""Fused 3x3 conv (+bias, ReLU, optional 2x2 maxpool) Pallas kernel.

SuperPoint's encoder is where its time goes (docs/PERFORMANCE.md): XLA's
conv lowering on TPU pays layout conversions around every layer and runs
the 3x3 convs below MXU rate at these channel counts. This kernel
formulates a SAME 3x3 conv as 9 shifted tap matmuls — lhs (rows*W, C_in)
strip slices against (C_in, C_out) tap weights with fp32 accumulation —
and fuses bias, ReLU and the following 2x2 maxpool so the full-resolution
activation never round-trips HBM between conv and pool.

The input map stays in HBM (memory_space=ANY) and strips stream into a
double-buffered VMEM scratch via manual async DMA (grid steps prefetch the
next strip while computing the current one): a conv halo needs OVERLAPPING
strip reads, which BlockSpec pipelining cannot express, and a whole-map
VMEM block overflows scoped VMEM at 480x640x64 (the 64-channel lane
padding doubles it to ~79 MB).

Layout contract: NHWC with W a multiple of 8 (sublane tiling of the
(rows, W, C) -> (rows*W, C) flatten) and C_in/C_out multiples of 8. The
input arrives padded by 1 on H/W (SAME halo); out-of-domain halo rows/cols
are zeros by construction of jnp.pad, matching XLA's SAME conv exactly.

Used by models/superpoint.py for conv1b..convDa on TPU (conv1a's C_in=1 is
degenerate for the MXU and stays a VPU tap-shift in XLA; the 1x1 heads are
plain matmuls XLA already fuses); CPU tests run interpret mode.

Reference semantics mirrored: superpoint.py:143-173 (VGG encoder + heads).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _conv_kernel(x_hbm_ref, w_ref, b_ref, out_ref, scratch, sems, *,
                 rows, w, cin, cout, relu, pool, out_dtype,
                 lane_pool=False, offset=False, offset_lhs=False):
    t = pl.program_id(0)
    s = pl.program_id(1)
    nstrips = pl.num_programs(1)

    def strip_dma(slot, idx):
        # rows+2 is even by construction; the width slice is the full padded
        # width (8-aligned) so the DMA shape respects the (8, 128) tiling
        return pltpu.make_async_copy(
            x_hbm_ref.at[t, pl.ds(idx * rows, rows + 2)],
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
    xs = scratch[s % 2]  # (rows+2, w+2, cin)

    n = rows * w
    # fp32 operands must request HIGHEST or the MXU silently degrades them
    # to single bf16 passes (see kernels/layer_stack.py:_dot)
    prec = (
        jax.lax.Precision.HIGHEST
        if xs.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    o = None
    if offset and offset_lhs:
        # A/B variant: split the two k-taps into their own matmuls with
        # sublane-offset lhs WINDOWS (xs[:, k:k+w]) instead of one combined
        # [k0|k1] output + fp32 shifted add — trades the (rows, up, 256)
        # fp32 accumulator relayout for two bf16 lhs window reads per tap.
        # packed weights are (3, cin, 2*cout): k=0 cols [0, cout),
        # k=1 cols [cout, 2*cout) (see _pack_offset_weights)
        for di in range(3):
            for k in (0, 1):
                lhs = xs[di : di + rows, k : k + w].reshape(rows * w, cin)
                d = jax.lax.dot_general(
                    lhs,
                    w_ref[di][:, k * cout : (k + 1) * cout],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
                o = d if o is None else o + d
        o = o.reshape(rows, w, cout)
    elif offset:
        # offset-paired input (unit m = cols 2m-1, 2m — the SAME-halo pad
        # column shifts the pairing by one relative to the output pairing):
        # output unit m's 6 real (C, C) tap blocks then fall 3+3 onto input
        # units m and m+1 — 75% weight density, 6 MXU pass-equivalents per
        # point instead of the parity-block form's 9. Both units' blocks
        # ride ONE (n, cin) @ (cin, 2*cout) matmul per row tap over the
        # FULL strip (input unit j emits [to-out-j | to-out-j-1] halves),
        # so the lhs flatten is layout-free — no per-tap unit-offset slice
        # merges; the k=1 contribution folds in with a single
        # sublane-shifted add at the end.
        up = xs.shape[1]
        for di in range(3):
            lhs = xs[di : di + rows].reshape(rows * up, cin)
            d = jax.lax.dot_general(
                lhs, w_ref[di], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            o = d if o is None else o + d
        o = o.reshape(rows, up, 2 * cout)
        if (
            os.environ.get("LGTPU_CONV_EPI16", "0") not in ("", "0")
            and jnp.dtype(out_dtype) == jnp.bfloat16
        ):
            # A/B variant (VERDICT r4 next #8): run the shifted add of the
            # two accumulator halves in bf16 — halves the epilogue bytes at
            # the cost of one extra bf16 rounding (the output is rounded to
            # bf16 anyway). Trace-time flag; scripts/bench_stem_r05.py.
            ob = o.astype(jnp.bfloat16)
            o = (
                ob[:, 0:w, 0:cout] + ob[:, 1 : w + 1, cout : 2 * cout]
            ).astype(jnp.float32)
        else:
            o = o[:, 0:w, 0:cout] + o[:, 1 : w + 1, cout : 2 * cout]
    else:
        for di in range(3):
            for dj in range(3):
                lhs = xs[di : di + rows, dj : dj + w].reshape(n, cin)
                d = jax.lax.dot_general(
                    lhs, w_ref[di, dj], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
                o = d if o is None else o + d
    o = o + b_ref[...]
    if relu:
        o = jnp.maximum(o, 0.0)
    o = o.reshape(rows, w, cout)
    if lane_pool:
        # paired-column layout: each 2*C unit holds [even col | odd col];
        # the column half of the 2x2 pool is an elementwise max of the two
        # lane halves, the row half a plain adjacent-pair max
        half = cout // 2
        o = jnp.maximum(o[:, :, :half], o[:, :, half:])
        o = jnp.max(o.reshape(rows // 2, 2, w, half), axis=1)
    elif pool:
        o = jnp.max(o.reshape(rows // 2, 2, w, cout), axis=1)
        o = jnp.max(o.reshape(rows // 2, w // 2, 2, cout), axis=2)
    out_ref[...] = o[None].astype(out_dtype)


def _pick_rows(h: int) -> int:
    """Strip height: big enough to amortize per-dot overheads, small enough
    that two strip buffers + conv outputs stay comfortably in VMEM.
    LGTPU_CONV_ROWS overrides for chip A/Bs (scripts/bench_conv_ab.py
    rows)."""
    override = os.environ.get("LGTPU_CONV_ROWS", "")
    if override:
        rows = int(override)
        if h % rows == 0:
            return rows
    for rows in (32, 16, 8, 4, 2):
        if h % rows == 0:
            return rows
    return h


@functools.partial(
    jax.jit,
    static_argnames=("relu", "pool", "out_dtype", "interpret"),
)
def conv3x3(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    *,
    relu: bool = True,
    pool: bool = False,
    out_dtype=None,
    interpret: bool | None = None,
) -> jax.Array:
    """SAME 3x3 conv + bias [+ ReLU] [+ 2x2 maxpool], NHWC.

    Args:
      x: (B, H, W, C_in); H even when pool, W % 8 == 0, C % 8 == 0.
      w: (3, 3, C_in, C_out) HWIO.
      b: (C_out,).
    """
    btch, h, w_dim, cin = x.shape
    cout = w.shape[-1]
    out_dtype = jnp.dtype(out_dtype) if out_dtype is not None else x.dtype
    interpret = _interpret() if interpret is None else interpret
    rows = _pick_rows(h)
    # DMA slice shapes must align to the (8, 128) tiling: pad the haloed
    # width up to a multiple of 8 (extra zero columns on the right are never
    # read — taps stop at col w+1) and the channel dim up to 128. The
    # channel pad is FREE twice over: the HBM tiled layout already stores
    # 128 lanes physically for a 64-channel array, and the zero channels
    # contract against zero weight rows on an MXU whose depth is 128 anyway.
    wpad = (-(w_dim + 2)) % 8
    cpad = (-cin) % 128 if not interpret else 0
    cin_p = cin + cpad
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + wpad), (0, cpad)))
    w_p = jnp.pad(w, ((0, 0), (0, 0), (0, cpad), (0, 0)))
    oh = h // 2 if pool else h
    ow = w_dim // 2 if pool else w_dim
    orows = rows // 2 if pool else rows
    kernel = functools.partial(
        _conv_kernel, rows=rows, w=w_dim, cin=cin_p, cout=cout,
        relu=relu, pool=pool, out_dtype=out_dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(btch, h // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # streamed via manual DMA
            pl.BlockSpec(
                (3, 3, cin_p, cout), lambda t, s: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, cout), lambda t, s: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, orows, ow, cout), lambda t, s: (t, s, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((btch, oh, ow, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows + 2, w_dim + 2 + wpad, cin_p), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * btch * h * w_dim * cin * cout * 9,
            bytes_accessed=xp.size * xp.dtype.itemsize
            + btch * oh * ow * cout * out_dtype.itemsize
            + w.size * w.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, w_p.astype(x.dtype), b.astype(jnp.float32)[None, :])


def supports(h: int, w: int, cin: int, cout: int, act_dtype) -> bool:
    """Gate: shapes the kernel handles (strip flatten constraints + VMEM)."""
    if w % 8 or cin % 8 or cout % 8:
        return False
    if h < 2 or h % 2:
        return False
    rows = _pick_rows(h)
    itemsize = jnp.dtype(act_dtype).itemsize
    # two strip buffers (lane-padded C) + per-strip outputs, far under cap
    strip = 2 * (rows + 2) * (w + 2) * max(cin, 128) * itemsize
    return strip < 40 * 1024 * 1024


# ---------------------------------------------------------------------------
# paired-column conv: the C=64 fix
# ---------------------------------------------------------------------------
#
# A 64-out-channel conv caps at ~30 TFLOPs on the MXU regardless of who
# lowers it (measured: XLA conv1b 28.9 TF, the tap-matmul kernel above
# 28.9 TF) — N=64 uses half the systolic array's output width and the
# 64-deep contraction half its depth. Pairing adjacent columns
# (space-to-depth by 2 along W) turns the same conv into unit-space
# matmuls of shape (N', 128) @ (128, 128): out unit m = [out col 2m | 2m+1]
# depends on input units m-1, m, m+1, so the conv becomes 9 (di, du) tap
# matmuls with BLOCK-SPARSE weights
#
#   Wp[di, du][u-block, v-block] = w[di, 2*du + u - v + 1]   (or 0)
#
# where u, v index the input/output column-parity halves. Half the blocks
# are zero (du = -1 and +1 carry one quarter each), so the MXU runs 2x the
# real FLOPs — but at FULL shape: ~64 TF effective, 2.2x the direct form.
# The du = 0 block is dense. Chaining: pool=True collapses the pair into
# the pooled column (lane-halves max, see _conv_kernel) and emits the
# ordinary layout; pool=False emits the paired layout, which the next
# paired conv consumes directly (out_paired=True skips the unpair).


def _pack_paired_weights(w) -> jax.Array:
    """(3, 3, C, C_out) HWIO -> (3, 3, 2C, 2C_out) unit-space tap weights."""
    _, _, c, co = w.shape
    wp = jnp.zeros((3, 3, 2 * c, 2 * co), w.dtype)
    for du in (-1, 0, 1):
        for u in (0, 1):
            for v in (0, 1):
                dj = 2 * du + u - v + 1
                if 0 <= dj <= 2:
                    wp = wp.at[
                        :, du + 1, u * c : (u + 1) * c, v * co : (v + 1) * co
                    ].set(w[:, dj])
    return wp


def offset_prepad(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> the offset-paired padded layout (B, H+2, U', 2C).

    Halo: 1 zero row top/bottom; 1 zero col left (shifts the pairing so
    unit m = cols 2m-1, 2m) and right (covers SAME), then whole-unit zero
    cols up to the DMA sublane alignment. Input units span cols -1..W,
    i.e. units+1 of them; the kernel's two k-taps read units [0, units)
    and [1, units+1). Exposed so a producer can fuse this into its own
    epilogue (see conv3x3_paired's ``prepad_w``)."""
    btch, h, w_dim, c = x.shape
    units = w_dim // 2
    upad = (-(units + 1)) % 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + 2 * upad), (0, 0)))
    return xp.reshape(btch, h + 2, units + 1 + upad, 2 * c)


def _pack_offset_weights(w) -> jax.Array:
    """(3, 3, C, C_out) HWIO -> (3, 2C, 4C_out) combined offset tap weights.

    Input unit m+k holds cols (2(m+k)-1 [half u=0], 2(m+k) [u=1]); output
    unit m holds cols (2m [v=0], 2m+1 [v=1]). Tap index dj = 2k + u - v,
    valid 0..2 — exactly 3 of 4 (u, v) blocks are nonzero for each k. The
    k=0 and k=1 packings sit side by side in the output dim: input unit j's
    matmul row emits [contribution to out j | contribution to out j-1], and
    the kernel folds the second half in with one sublane-shifted add."""
    _, _, c, co = w.shape
    wp = jnp.zeros((3, 2 * c, 4 * co), w.dtype)
    for k in (0, 1):
        for u in (0, 1):
            for v in (0, 1):
                dj = 2 * k + u - v
                if 0 <= dj <= 2:
                    col = 2 * k * co + v * co
                    wp = wp.at[
                        :, u * c : (u + 1) * c, col : col + co
                    ].set(w[:, dj])
    return wp


@functools.partial(
    jax.jit,
    static_argnames=(
        "relu", "pool", "x_paired", "out_paired", "out_dtype", "interpret",
        "offset", "prepad_w", "offset_lhs",
    ),
)
def conv3x3_paired(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    *,
    relu: bool = True,
    pool: bool = False,
    x_paired: bool = False,
    out_paired: bool = False,
    out_dtype=None,
    interpret: bool | None = None,
    offset: bool = False,
    prepad_w: int | None = None,
    offset_lhs: bool = False,
) -> jax.Array:
    """SAME 3x3 conv via paired-column (space-to-depth-2) matmuls.

    Args:
      x: (B, H, W, C) NHWC, or (B, H, W/2, 2C) when ``x_paired``.
      w: (3, 3, C, C_out); b: (C_out,).
      pool: fuse the 2x2 maxpool; output is always unpaired (H/2, W/2, Cout).
      out_paired: (pool=False only) emit (B, H, W/2, 2*C_out) for the next
        paired conv.
      offset: pair the INPUT columns at a one-column offset from the output
        pairing (unit m = cols 2m-1, 2m — the left SAME-pad column supplies
        the shift), which redistributes each output unit's 6 real tap
        blocks as 3+3 over two input units: 75% weight density in 6 plain
        unit-aligned matmuls with no in-kernel window assembly (the
        alternative "span" window packing tied/lost on chip and could not
        compile in its concat form — retired; see docs/PERFORMANCE.md
        negative results). Requires unpaired ``x``; composes with
        pool/out_paired.
      prepad_w: (offset only) ``x`` is ALREADY in the padded offset-paired
        layout ``(B, H+2, W/2+1+upad, 2C)`` for an original width of
        ``prepad_w`` — built by ``offset_prepad``. Lets the producer (the
        conv1a tap stem) fuse the halo pad + lane repack into its own
        epilogue, so the 39 MB full-resolution activation is materialized
        once instead of three times (write + pad copy + repack).
    """
    assert not (pool and out_paired)
    assert not (offset and x_paired), "offset pairing needs the raw layout"
    assert prepad_w is None or offset, "prepad_w is an offset-form input"
    btch = x.shape[0]
    if prepad_w is not None:
        h = x.shape[1] - 2
        units = prepad_w // 2
        c = x.shape[3] // 2
    elif x_paired:
        h = x.shape[1]
        units, c2 = x.shape[2], x.shape[3]
        c = c2 // 2
        xu = x
    else:
        h = x.shape[1]
        w_dim, c = x.shape[2], x.shape[3]
        units = w_dim // 2
        if not offset:
            xu = x.reshape(btch, h, units, 2 * c)
    cout = w.shape[-1]
    w_dim = 2 * units
    out_dtype = jnp.dtype(out_dtype) if out_dtype is not None else x.dtype
    interpret = _interpret() if interpret is None else interpret
    rows = _pick_rows(h)
    if offset:
        if prepad_w is not None:
            assert x.shape[2] == units + 1 + (-(units + 1)) % 8
            xp = x
        else:
            xp = offset_prepad(x)
        wp = _pack_offset_weights(w)
    else:
        # halo: 1 zero row top/bottom, 1 zero UNIT left/right (cols -2..-1
        # and W..W+1 are all zeros, covering the SAME padding), plus DMA
        # alignment
        upad = (-(units + 2)) % 8
        xp = jnp.pad(xu, ((0, 0), (1, 1), (1, 1 + upad), (0, 0)))
        wp = _pack_paired_weights(w)
    bp = jnp.concatenate([b, b]).astype(jnp.float32)

    oh = h // 2 if pool else h
    orows = rows // 2 if pool else rows
    if pool:
        out_shape = (btch, oh, units, cout)
        out_block = (1, orows, units, cout)
    else:
        out_shape = (btch, h, units, 2 * cout)
        out_block = (1, rows, units, 2 * cout)
    kernel = functools.partial(
        _conv_kernel, rows=rows, w=units, cin=2 * c, cout=2 * cout,
        relu=relu, pool=False, lane_pool=pool, out_dtype=out_dtype,
        offset=offset, offset_lhs=offset_lhs,
    )
    if offset:
        w_spec = pl.BlockSpec(
            (3, 2 * c, 4 * cout), lambda t, s: (0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        w_spec = pl.BlockSpec(
            (3, 3, 2 * c, 2 * cout), lambda t, s: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    out = pl.pallas_call(
        kernel,
        grid=(btch, h // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # streamed via manual DMA
            w_spec,
            pl.BlockSpec(
                (1, 2 * cout), lambda t, s: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            out_block, lambda t, s: (t, s, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows + 2, xp.shape[2], 2 * c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            # offset: 6 128-deep MXU passes per point (75% dense);
            # parity-block: 9 (50% dense)
            flops=int(
                2 * btch * h * w_dim * c * cout * 9
                * (4 / 3 if offset else 2)
            ),
            bytes_accessed=xp.size * xp.dtype.itemsize
            + btch * oh * units * cout * out_dtype.itemsize
            + wp.size * wp.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, wp.astype(x.dtype), bp[None, :])
    if pool or out_paired:
        return out
    return out.reshape(btch, h, w_dim, cout)


def supports_paired(h: int, w: int, cin: int, cout: int, act_dtype) -> bool:
    """Gate for the paired form: exactly the C=64 regime it exists for
    (2C = 128 = one full MXU contraction), even dims, VMEM budget."""
    if cin != 64 or cout != 64:
        return False
    if w % 16 or h % 2:
        return False
    rows = _pick_rows(h)
    itemsize = jnp.dtype(act_dtype).itemsize
    strip = 2 * (rows + 2) * (w // 2 + 2) * 128 * itemsize
    return strip < 40 * 1024 * 1024
