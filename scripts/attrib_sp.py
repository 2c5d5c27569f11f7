"""SuperPoint attribution: conv trunk vs extraction, per-stage costs."""
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
from lightglue_tpu.pipeline.extract import extract_keypoints
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

    def make_fn(iters):
        @jax.jit
        def run(params, image):
            def body(carry, _):
                img = image + carry * 1e-30
                scores, desc = superpoint.forward(
                    params, img, config=config.superpoint, policy=policy
                )
                if mode == "full":
                    ext = extract_keypoints(scores, desc, config=config.superpoint)
                    out = ext.keypoints_norm[0, 0, 0]
                elif mode == "forward":
                    out = scores[0, 0, 0] + desc[0, 0, 0, 0].astype(jnp.float32)
                return out.astype(jnp.float32), ()
            return jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return run

    return timed(make_fn, params, image)


if __name__ == "__main__":
    full = variant("full")
    fwd = variant("forward")
    print(f"SP forward+extract : {full:.3f} ms", flush=True)
    print(f"SP forward only    : {fwd:.3f} ms", flush=True)
    print(f"extract (diff)     : {full - fwd:.3f} ms", flush=True)
    b2 = variant("full", batch=2)
    print(f"batch-2 full       : {b2:.3f} ms", flush=True)
