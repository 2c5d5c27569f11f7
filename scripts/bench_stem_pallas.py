"""Prototype: fused Pallas SuperPoint stem (conv1b + relu + 2x2 maxpool).

The stem dominates SuperPoint forward (0.80 of 1.21 ms): conv1b at full
480x640 resolution is 22.6 of the model's 52 GFLOP, and the XLA lowering
round-trips the 39 MB conv1a activation through HBM plus layout copies.
This kernel reads the conv1a map once into VMEM and keeps every
intermediate strip-resident:

  conv1a map (bf16, VMEM-resident)
    -> conv1b as 9 shifted tap matmuls (MXU)
    -> relu -> 2x2 maxpool -> output strip (bf16)

conv1a itself stays in XLA tap-shift form (C_in=1 is VPU work either way;
an in-kernel version needs a (rows, w, 1)->(rows, w, 64) minor-dim
broadcast Mosaic cannot lower today). Tap-PAIRED (contraction-128) matmuls
via jnp.concatenate fail to lower ("result/input offset mismatch on
non-concat dimension" when concatenating differently-offset slices), so
v1 runs 9 unpaired (N, 64) @ (64, 64) dots.

Usage: python scripts/bench_stem_pallas.py  (TPU: correctness + timing)
"""
import sys
from pathlib import Path

SRC = Path(__file__).resolve().parent.parent / "src"
sys.path.insert(0, str(SRC))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import functools
import time

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS_LO, ITERS_HI, REPEATS = 25, 125, 3


def _best_total(fn, args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def timed(make_fn, *args):
    t_lo = _best_total(make_fn(ITERS_LO), args)
    t_hi = _best_total(make_fn(ITERS_HI), args)
    return max(t_hi - t_lo, 1e-9) / (ITERS_HI - ITERS_LO) * 1e3


# ---------------------------------------------------------------------------
# kernel: conv1b + relu + pool over a VMEM-resident conv1a map
# ---------------------------------------------------------------------------


def _conv1b_pool_kernel(a1_ref, w_ref, b_ref, out_ref, *,
                        rows: int, w: int, out_dtype):
    s = pl.program_id(1)
    a1s = a1_ref[0, pl.ds(s * rows, rows + 2), :, :]  # (rows+2, w+2, 64) bf16

    n = rows * w
    o = None
    for di in range(3):
        for dj in range(3):
            lhs = a1s[di : di + rows, dj : dj + w].reshape(n, 64)
            d = jax.lax.dot_general(
                lhs, w_ref[di, dj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o = d if o is None else o + d
    o = jnp.maximum(o + b_ref[...], 0.0).reshape(rows, w, 64)

    o = jnp.max(o.reshape(rows // 2, 2, w, 64), axis=1)
    o = jnp.max(o.reshape(rows // 2, w // 2, 2, 64), axis=2)
    out_ref[...] = o[None].astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("interpret", "out_dtype", "rows")
)
def conv1b_pool_pallas(a1, w1b, b1b, interpret=False,
                       out_dtype=jnp.bfloat16, rows=32):
    """a1: (B, H, W, 64) conv1a output (relu'd). Returns pooled conv1b
    (B, H/2, W/2, 64)."""
    b, h, w, _ = a1.shape
    assert h % rows == 0 and w % 2 == 0
    a1p = jnp.pad(a1, ((0, 0), (1, 1), (1, 1), (0, 0)))
    kernel = functools.partial(
        _conv1b_pool_kernel, rows=rows, w=w, out_dtype=jnp.dtype(out_dtype)
    )
    flops = b * h * w * 64 * 64 * 9 * 2
    return pl.pallas_call(
        kernel,
        grid=(b, h // rows),
        in_specs=[
            pl.BlockSpec((1, h + 2, w + 2, 64), lambda t, s: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, 64, 64), lambda t, s: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64,), lambda t, s: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows // 2, w // 2, 64), lambda t, s: (t, s, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, 64), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=a1p.size * a1p.dtype.itemsize
            + b * (h // 2) * (w // 2) * 64 * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(a1p, w1b.astype(jnp.bfloat16), b1b)


# ---------------------------------------------------------------------------
# oracle + bench
# ---------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


def conv(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME", dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    )
    return (out + b).astype(x.dtype)


def conv1a_shift(x2d, w1a, b1a, h, w, dtype):
    xp = jnp.pad(x2d, ((0, 0), (1, 1), (1, 1)))
    acc = jnp.zeros((x2d.shape[0], h, w, 64), jnp.float32)
    for di in range(3):
        for dj in range(3):
            tap = xp[:, di : di + h, dj : dj + w].astype(jnp.float32)
            acc = acc + tap[..., None] * w1a[di, dj, 0].astype(jnp.float32)
    return jax.nn.relu(acc + b1a).astype(dtype)


def stem_pallas(img, w1a, b1a, w1b, b1b, interpret=False):
    b, h, w, _ = img.shape
    a1 = conv1a_shift(img[..., 0], w1a, b1a, h, w, jnp.bfloat16)
    return conv1b_pool_pallas(a1, w1b, b1b, interpret=interpret,
                              rows=32 if h % 32 == 0 else 16)


def stem_xla(img, w1a, b1a, w1b, b1b, dtype=jnp.bfloat16):
    x = img.astype(dtype)
    x1 = conv1a_shift(x[..., 0], w1a, b1a, x.shape[1], x.shape[2], dtype)
    x2 = jax.nn.relu(conv(x1, w1b, b1b))
    return jax.lax.reduce_window(
        x2, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def main():
    B, H, W = 1, 480, 640
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((B, H, W, 1), dtype=np.float32))
    w1a = jnp.asarray((rng.standard_normal((3, 3, 1, 64)) * 0.3).astype(np.float32))
    b1a = jnp.asarray(rng.standard_normal(64).astype(np.float32) * 0.1)
    w1b = jnp.asarray((rng.standard_normal((3, 3, 64, 64)) * 0.1).astype(np.float32))
    b1b = jnp.asarray(rng.standard_normal(64).astype(np.float32) * 0.1)

    interp = jax.default_backend() != "tpu"
    ours = np.asarray(
        jax.jit(functools.partial(stem_pallas, interpret=interp))(
            img, w1a, b1a, w1b, b1b
        )
    )
    want = np.asarray(jax.jit(stem_xla)(img, w1a, b1a, w1b, b1b))
    err = np.abs(ours.astype(np.float32) - want.astype(np.float32)).max()
    rel = err / np.abs(want.astype(np.float32)).max()
    print(f"correctness: max abs err {err:.4g} (rel {rel:.2e}) vs bf16 XLA")

    if interp:
        return

    def make(fn):
        def make_fn(iters):
            @jax.jit
            def run(img, w1a, b1a, w1b, b1b):
                def body(carry, _):
                    x = img + carry * 1e-30
                    o = fn(x, w1a, b1a, w1b, b1b)
                    return o[0, 0, 0, 0].astype(jnp.float32), ()
                return jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return run
        return make_fn

    t_p = timed(make(stem_pallas), img, w1a, b1a, w1b, b1b)
    t_x = timed(make(stem_xla), img, w1a, b1a, w1b, b1b)
    print(f"pallas stem: {t_p:.3f} ms   xla stem: {t_x:.3f} ms   "
          f"({t_x / t_p:.2f}x)")


if __name__ == "__main__":
    main()
