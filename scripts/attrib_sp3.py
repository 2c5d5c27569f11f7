"""Isolate the 0.78 ms: top_k output consumption vs interp build vs einsum."""
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

from lightglue_tpu.config import PipelineConfig
from lightglue_tpu.models import superpoint
from lightglue_tpu.pipeline import extract as ex
from lightglue_tpu.precision import Precision, policy_for
from lightglue_tpu.runtime import weights

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


def variant(mode, h=480, w=640, batch=1):
    config = PipelineConfig(precision=Precision.BF16)
    policy = policy_for(config.precision)
    params = weights.to_jax(weights.init_superpoint(0, config.superpoint))
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((batch, h, w, 1), dtype=np.float32))
    spc = config.superpoint
    k = spc.max_num_keypoints

    def make_fn(iters):
        @jax.jit
        def run(params, image):
            def body(carry, _):
                img = image + carry * 1e-30
                scores, desc = superpoint.forward(
                    params, img, config=spc, policy=policy
                )
                b2, hh, ww = scores.shape
                masked = ex.mask_borders(scores.astype(jnp.float32), 4)
                flat = masked.reshape(b2, hh * ww)
                if mode == "topk_scores":
                    ts, ti = jax.lax.top_k(flat, k)
                    out = jnp.sum(ts[0]) + jnp.sum(ti[0]).astype(jnp.float32)
                elif mode == "topk_coords":
                    ts, ti = jax.lax.top_k(flat, k)
                    ys = (ti // ww).astype(jnp.float32)
                    xs = (ti % ww).astype(jnp.float32)
                    out = jnp.sum(ys) + jnp.sum(xs) + jnp.sum(ts)
                elif mode == "einsum_only":
                    # interp independent of top_k: fixed indices
                    dm = desc.reshape(b2, -1, 256)
                    hw = dm.shape[1]
                    idx = jnp.arange(k, dtype=jnp.int32)[None].repeat(b2, 0)
                    hw_iota = jax.lax.broadcasted_iota(jnp.int32, (b2, k, hw), 2)
                    interp = jnp.where(hw_iota == idx[..., None], 0.5, 0.0)
                    sampled = jnp.einsum(
                        "bkh,bhc->bkc", interp, dm.astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    out = jnp.sum(sampled[0, 0]) + flat[0, 0]
                elif mode == "full_sample":
                    ts, ti = jax.lax.top_k(flat, k)
                    ys = (ti // ww).astype(jnp.float32)
                    xs = (ti % ww).astype(jnp.float32)
                    kpts = jnp.stack([xs, ys], axis=-1)
                    d = ex.sample_descriptors(kpts, desc, 8)
                    out = jnp.sum(d[0, 0]) + ts[0, 0]
                return out.astype(jnp.float32), ()
            return jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return run

    return timed(make_fn, params, image)


if __name__ == "__main__":
    for mode in ("topk_scores", "topk_coords", "einsum_only", "full_sample"):
        t = variant(mode)
        print(f"{mode:14s}: {t:.3f} ms", flush=True)
