"""Pin the slow half of one-hot sampling: interp build vs einsum vs dtype."""
import sys
from pathlib import Path

SRC = Path(__file__).resolve().parent.parent / "src"
sys.path.insert(0, str(SRC))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import time
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


B, K, HW, C = 1, 1024, 4800, 256
rng = np.random.default_rng(0)
idx_np = rng.integers(0, HW - 81, (B, K)).astype(np.int32)
dm_np = rng.standard_normal((B, HW, C)).astype(np.float32)
interp_np = rng.standard_normal((B, K, HW)).astype(np.float32)


def variant(mode):
    idx = jnp.asarray(idx_np)
    dm = jnp.asarray(dm_np)
    interp_pre = jnp.asarray(interp_np)

    def make_fn(iters):
        @jax.jit
        def run(idx, dm, interp_pre):
            def body(carry, _):
                i = idx + (carry.astype(jnp.int32) % 2)  # data dep
                hw_iota = jax.lax.broadcasted_iota(jnp.int32, (B, K, HW), 2)
                if mode == "build_only":
                    interp = (
                        jnp.where(hw_iota == i[..., None], 0.25, 0.0)
                        + jnp.where(hw_iota == (i + 1)[..., None], 0.25, 0.0)
                        + jnp.where(hw_iota == (i + 80)[..., None], 0.25, 0.0)
                        + jnp.where(hw_iota == (i + 81)[..., None], 0.25, 0.0)
                    )
                    out = jnp.sum(interp[0, 0]) + jnp.sum(interp[0, -1])
                elif mode in ("full_f32_highest", "full_f32_default", "full_bf16"):
                    interp = (
                        jnp.where(hw_iota == i[..., None], 0.25, 0.0)
                        + jnp.where(hw_iota == (i + 1)[..., None], 0.25, 0.0)
                        + jnp.where(hw_iota == (i + 80)[..., None], 0.25, 0.0)
                        + jnp.where(hw_iota == (i + 81)[..., None], 0.25, 0.0)
                    )
                    if mode == "full_bf16":
                        s = jnp.einsum(
                            "bkh,bhc->bkc",
                            interp.astype(jnp.bfloat16),
                            dm.astype(jnp.bfloat16),
                        ).astype(jnp.float32)
                    else:
                        prec = (
                            jax.lax.Precision.HIGHEST
                            if mode == "full_f32_highest"
                            else jax.lax.Precision.DEFAULT
                        )
                        s = jnp.einsum("bkh,bhc->bkc", interp, dm, precision=prec)
                    out = jnp.sum(s[0, 0]) + jnp.sum(s[0, -1])
                elif mode == "einsum_pre_f32":
                    ip = interp_pre + carry * 1e-30
                    s = jnp.einsum(
                        "bkh,bhc->bkc", ip, dm,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    out = jnp.sum(s[0, 0]) + jnp.sum(s[0, -1])
                elif mode == "gather_take":
                    s = jnp.take_along_axis(dm, (i % HW)[..., None], axis=1)
                    out = jnp.sum(s[0, 0]) + jnp.sum(s[0, -1])
                return out.astype(jnp.float32), ()
            return jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return run

    return timed(make_fn, idx, dm, interp_pre)


if __name__ == "__main__":
    for mode in (
        "build_only",
        "full_f32_highest",
        "full_f32_default",
        "full_bf16",
        "einsum_pre_f32",
        "gather_take",
    ):
        print(f"{mode:18s}: {variant(mode):.3f} ms", flush=True)
