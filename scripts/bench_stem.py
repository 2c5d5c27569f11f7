"""A/B SuperPoint stem formulations on TPU: conv1a as conv op vs tap-shift
VPU form vs patch-stack matmul form; measures conv1a+conv1b+pool chain."""
import sys
from pathlib import Path

SRC = Path(__file__).resolve().parent.parent / "src"
sys.path.insert(0, str(SRC))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import time
import functools
import jax.numpy as jnp
import numpy as np

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


B, H, W = 1, 480, 640
rng = np.random.default_rng(0)
img_np = rng.random((B, H, W, 1), dtype=np.float32)
w1a_np = (rng.standard_normal((3, 3, 1, 64)) * 0.1).astype(np.float32)
b1a_np = rng.standard_normal(64).astype(np.float32) * 0.01
w1b_np = (rng.standard_normal((3, 3, 64, 64)) * 0.05).astype(np.float32)
b1b_np = rng.standard_normal(64).astype(np.float32) * 0.01

_DN = ("NHWC", "HWIO", "NHWC")


def conv(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME", dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    )
    return (out + b).astype(x.dtype)


def pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def conv1a_shift(x2d, w1a, b1a):
    """x2d: (B, H, W) act dtype. 9 shifted broadcast-FMAs on the VPU."""
    xp = jnp.pad(x2d, ((0, 0), (1, 1), (1, 1)))
    acc = jnp.zeros((B, H, W, 64), jnp.float32)
    for di in range(3):
        for dj in range(3):
            tap = xp[:, di : di + H, dj : dj + W].astype(jnp.float32)
            acc = acc + tap[..., None] * w1a[di, dj, 0].astype(jnp.float32)
    return (acc + b1a).astype(x2d.dtype)


def conv1a_patch(x2d, w1a, b1a):
    """Patch-stack matmul: (B*H*W, 9) @ (9, 64) on the MXU."""
    xp = jnp.pad(x2d, ((0, 0), (1, 1), (1, 1)))
    taps = [
        xp[:, di : di + H, dj : dj + W]
        for di in range(3)
        for dj in range(3)
    ]
    patches = jnp.stack(taps, axis=-1)  # (B, H, W, 9)
    wmat = w1a.reshape(9, 64).astype(patches.dtype)
    out = jax.lax.dot_general(
        patches.reshape(B * H * W, 9), wmat,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (out.reshape(B, H, W, 64) + b1a).astype(x2d.dtype)


def make_variant(mode, dtype=jnp.bfloat16):
    img = jnp.asarray(img_np)
    w1a = jnp.asarray(w1a_np)
    b1a = jnp.asarray(b1a_np)
    w1b = jnp.asarray(w1b_np)
    b1b = jnp.asarray(b1b_np)

    def make_fn(iters):
        @jax.jit
        def run(img, w1a, b1a, w1b, b1b):
            def body(carry, _):
                x = (img + carry * 1e-30).astype(dtype)
                if mode == "conv":
                    x1 = jax.nn.relu(conv(x, w1a, b1a))
                elif mode == "shift":
                    x1 = jax.nn.relu(conv1a_shift(x[..., 0], w1a, b1a))
                elif mode == "patch":
                    x1 = jax.nn.relu(conv1a_patch(x[..., 0], w1a, b1a))
                x2 = jax.nn.relu(conv(x1, w1b, b1b))
                x2 = pool(x2)
                return x2[0, 0, 0, 0].astype(jnp.float32), ()
            return jax.lax.scan(body, jnp.float32(0), None, length=iters)

        return run

    return make_fn, (img, w1a, b1a, w1b, b1b)


for mode in ("conv", "shift", "patch"):
    make_fn, args = make_variant(mode)
    print(f"{mode:8s} {timed(make_fn, *args):8.3f} ms", flush=True)


def pool_reshape(x):
    b, h, w, c = x.shape
    return jnp.max(x.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4))


def make_variant2(mode, dtype=jnp.bfloat16):
    img = jnp.asarray(img_np)
    w1a = jnp.asarray(w1a_np)
    b1a = jnp.asarray(b1a_np)
    w1b = jnp.asarray(w1b_np)
    b1b = jnp.asarray(b1b_np)

    def make_fn(iters):
        @jax.jit
        def run(img, w1a, b1a, w1b, b1b):
            def body(carry, _):
                x = (img + carry * 1e-30).astype(dtype)
                if "shift" in mode:
                    x1 = jax.nn.relu(conv1a_shift(x[..., 0], w1a, b1a))
                else:
                    x1 = jax.nn.relu(conv(x, w1a, b1a))
                x2 = jax.nn.relu(conv(x1, w1b, b1b))
                x2 = pool_reshape(x2) if "rpool" in mode else pool(x2)
                return x2[0, 0, 0, 0].astype(jnp.float32), ()
            return jax.lax.scan(body, jnp.float32(0), None, length=iters)

        return run

    return make_fn, (img, w1a, b1a, w1b, b1b)


import sys as _sys
if len(_sys.argv) > 1 and _sys.argv[1] == "round2":
    for mode in ("shift_rpool", "conv_rpool", "shift_pool2"):
        make_fn, args = make_variant2(mode)
        print(f"{mode:12s} {timed(make_fn, *args):8.3f} ms", flush=True)
    _sys.exit(0)


def pool_strided(x):
    m = jnp.maximum(x[:, 0::2], x[:, 1::2])
    return jnp.maximum(m[:, :, 0::2], m[:, :, 1::2])


if len(_sys.argv) > 1 and _sys.argv[1] == "round3":
    def make3(iters):
        img = jnp.asarray(img_np); w1a = jnp.asarray(w1a_np)
        b1a = jnp.asarray(b1a_np); w1b = jnp.asarray(w1b_np)
        b1b = jnp.asarray(b1b_np)
        @jax.jit
        def run(img, w1a, b1a, w1b, b1b):
            def body(carry, _):
                x = (img + carry * 1e-30).astype(jnp.bfloat16)
                x1 = jax.nn.relu(conv1a_shift(x[..., 0], w1a, b1a))
                x2 = jax.nn.relu(conv(x1, w1b, b1b))
                x2 = pool_strided(x2)
                return x2[0, 0, 0, 0].astype(jnp.float32), ()
            return jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return run
    img = jnp.asarray(img_np); w1a = jnp.asarray(w1a_np)
    b1a = jnp.asarray(b1a_np); w1b = jnp.asarray(w1b_np)
    b1b = jnp.asarray(b1b_np)
    print(f"shift_spool {timed(make3, img, w1a, b1a, w1b, b1b):8.3f} ms", flush=True)
    _sys.exit(0)
