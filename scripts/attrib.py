"""Attribution: where does the 1.44 ms LightGlue step go?

Times (two-point method, see bench.py) variants of the step on the real
chip: full step, layers-only, assignment-only, filter-only, and 1-layer.
"""
import sys
from pathlib import Path

SRC = Path(__file__).resolve().parent.parent / "src"
sys.path.insert(0, str(SRC))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import time
import dataclasses
import jax.numpy as jnp
import numpy as np

from lightglue_tpu.config import PipelineConfig
from lightglue_tpu.models import lightglue
from lightglue_tpu.models.lightglue import (
    _masks_from_lengths,
    match_assignment,
    posenc,
    transformer_layer,
    _out_features,
)
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


def setup(batch=1, n=1024):
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
    return config, policy, params, kpts0, kpts1, desc0, desc1, lens


def variant(mode, batch=1, n=1024, n_layers=9):
    config, policy, params, kpts0, kpts1, desc0, desc1, lens = setup(batch, n)
    cfg = config.lightglue
    num_heads = _out_features(params["layers"]["self_attn"]["qkv"]) // cfg.head_dim
    ffn_dim = 2 * cfg.descriptor_dim
    if n_layers != 9:
        params = dict(params)
        params["layers"] = jax.tree.map(lambda a: a[:n_layers], params["layers"])

    def make_fn(iters):
        @jax.jit
        def run(params, kpts0, kpts1, desc0, desc1):
            def body(carry, _):
                d0in = desc0 + carry.astype(desc0.dtype) * 1e-30
                with jax.default_matmul_precision(policy.matmul_precision):
                    f0 = posenc(params["posenc"], kpts0.astype(jnp.float32), cfg.head_dim)
                    f1 = posenc(params["posenc"], kpts1.astype(jnp.float32), cfg.head_dim)
                    d0, d1 = d0in, desc1

                    def lbody(c, lp):
                        c0, c1 = transformer_layer(
                            lp, c[0], c[1], f0, f1, lens, lens,
                            num_heads, policy, None, ffn_dim,
                        )
                        return (c0, c1), None

                    if mode != "head_only":
                        (d0, d1), _ = jax.lax.scan(lbody, (d0, d1), params["layers"])
                    if mode in ("full", "head_only", "no_filter"):
                        mask0, mask1 = _masks_from_lengths(lens, lens, n, n)
                        la = jax.tree.map(lambda a: a[-1], params["assign"])
                        scores = match_assignment(la, d0, d1, mask0, mask1, cfg.descriptor_dim)
                    else:
                        scores = None
                    if mode in ("full", "head_only"):
                        m = filter_matches(scores, config.match_threshold, config.max_matches)
                    if scores is not None:
                        out = scores[0, 0, 0]
                    else:
                        out = d0[0, 0, 0].astype(jnp.float32)
                return out, ()
            return jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return run

    return timed(make_fn, params, kpts0, kpts1, desc0, desc1)


if __name__ == "__main__":
    full = variant("full")
    print("full 9L+head+filter :", round(full, 3), "ms", flush=True)
    layers = variant("layers_only")
    print("layers only (9L)    :", round(layers, 3), "ms", flush=True)
    nofil = variant("no_filter")
    print("9L + head, no filter:", round(nofil, 3), "ms", flush=True)
    head = variant("head_only")
    print("head + filter only  :", round(head, 3), "ms", flush=True)
    l1 = variant("layers_only", n_layers=1)
    print("layers only (1L)    :", round(l1, 3), "ms", flush=True)
    print("per-layer estimate  :", round((layers - l1) / 8, 3), "ms", flush=True)
