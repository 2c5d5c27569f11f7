"""Shared two-point timing harness for TPU scripts (see bench.py docstring:
per-call wall clock through the relay includes a ~27 ms fixed dispatch+fetch
cost; T(125 iters) - T(25 iters) / 100 cancels it exactly)."""
import sys
import time
from pathlib import Path

SRC = Path(__file__).resolve().parent.parent / "src"
if str(SRC) not in sys.path:
    sys.path.insert(0, str(SRC))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

ITERS_LO, ITERS_HI, REPEATS = 25, 125, 3


def best_total(fn, args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # warmup + force completion
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def timed(make_fn, *args):
    """Two-point per-iteration milliseconds."""
    t_lo = best_total(make_fn(ITERS_LO), args)
    t_hi = best_total(make_fn(ITERS_HI), args)
    return max(t_hi - t_lo, 1e-9) / (ITERS_HI - ITERS_LO) * 1e3
