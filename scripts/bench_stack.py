"""Megakernel vs per-block path on the real chip."""
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
from lightglue_tpu.models import lightglue
from lightglue_tpu.kernels import layer_stack
from lightglue_tpu.pipeline.match import filter_matches
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


def bench(batch=1, n=1024, use_stack=True):
    config = PipelineConfig(precision=Precision.BF16)
    policy = policy_for(config.precision)
    params = weights.to_jax(
        weights.init_lightglue(0, config.lightglue), policy.param_dtype
    )
    rng = np.random.default_rng(0)
    kpts0 = jnp.asarray(rng.uniform(-1, 1, (batch, n, 2)).astype(np.float32))
    kpts1 = jnp.asarray(rng.uniform(-1, 1, (batch, n, 2)).astype(np.float32))
    desc0 = jnp.asarray(
        rng.standard_normal((batch, n, 256), dtype=np.float32), policy.act_dtype
    )
    desc1 = jnp.asarray(
        rng.standard_normal((batch, n, 256), dtype=np.float32), policy.act_dtype
    )
    lens = jnp.full((batch,), n, jnp.int32)

    orig = layer_stack.supports
    if not use_stack:
        layer_stack.supports = lambda *a, **k: False

    def make_fn(iters):
        @jax.jit
        def run(params, kpts0, kpts1, desc0, desc1):
            def body(carry, _):
                d0 = desc0 + carry.astype(desc0.dtype) * 1e-30
                out = lightglue.forward(
                    params, kpts0, kpts1, d0, desc1, lens, lens,
                    config=config.lightglue, policy=policy,
                )
                m = filter_matches(
                    out.scores, config.match_threshold, config.max_matches
                )
                return out.scores[0, 0, 0], ()
            return jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return run

    try:
        return timed(make_fn, params, kpts0, kpts1, desc0, desc1)
    finally:
        layer_stack.supports = orig


if __name__ == "__main__":
    for batch in (1, 8):
        new = bench(batch=batch, use_stack=True)
        print(f"batch {batch} megakernel : {new:.3f} ms "
              f"({new/batch:.3f} /pair)", flush=True)
        old = bench(batch=batch, use_stack=False)
        print(f"batch {batch} per-block  : {old:.3f} ms "
              f"({old/batch:.3f} /pair)", flush=True)
