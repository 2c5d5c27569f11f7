"""Chip A/B of exact top-k strategies for the extraction tail (r4 #3).

The tiled-NMS candidate list is (B, 19200) fp32; we need the top 1024,
descending, exact. Variants:
  full      lax.top_k(19200 -> 1024)                       [current]
  chunk4    per-chunk top_k(4800 -> 1024) x4, then 4096 -> 1024 (exact:
            any global top-1024 element is in its chunk's top-1024)
  chunk8    8 x top_k(2400 -> 1024) -> 8192 -> 1024
  presel    threshold preselect via per-chunk top_k with k=256 (INEXACT
            unless a chunk holds <=256 winners — measured for the bound)
Interleaved reps; two-point in-jit timing like bench.py.
"""
from _timing import timed

import jax
import jax.numpy as jnp
import numpy as np

N, K = 19200, 1024


def make_variant(kind):
    def make_fn(iters):
        @jax.jit
        def run(x, idx):
            def body(carry, _):
                xi = x + carry * 1e-30
                if kind == "full":
                    tv, sel = jax.lax.top_k(xi, K)
                    ti = jnp.take_along_axis(idx, sel, axis=1)
                elif kind in ("chunk4", "chunk8"):
                    c = 4 if kind == "chunk4" else 8
                    xc = xi.reshape(x.shape[0] * c, N // c)
                    ic = idx.reshape(x.shape[0] * c, N // c)
                    cv, cs = jax.lax.top_k(xc, K)
                    ci = jnp.take_along_axis(ic, cs, axis=1)
                    cv = cv.reshape(x.shape[0], c * K)
                    ci = ci.reshape(x.shape[0], c * K)
                    tv, sel = jax.lax.top_k(cv, K)
                    ti = jnp.take_along_axis(ci, sel, axis=1)
                else:  # presel
                    c = 16
                    xc = xi.reshape(x.shape[0] * c, N // c)
                    ic = idx.reshape(x.shape[0] * c, N // c)
                    cv, cs = jax.lax.top_k(xc, 256)
                    ci = jnp.take_along_axis(ic, cs, axis=1)
                    cv = cv.reshape(x.shape[0], c * 256)
                    ci = ci.reshape(x.shape[0], c * 256)
                    tv, sel = jax.lax.top_k(cv, K)
                    ti = jnp.take_along_axis(ci, sel, axis=1)
                return tv[0, 0] + ti[0, 0].astype(jnp.float32), ()

            return jax.lax.scan(body, jnp.float32(0), None, length=iters)

        return run

    return make_fn


def main():
    rng = np.random.default_rng(0)
    # realistic sparsity: ~3% of candidates positive (post-NMS survivors),
    # rest exactly 0 / -1 like the masked map
    x = np.zeros((1, N), np.float32)
    hot = rng.choice(N, 2500, replace=False)
    x[0, hot] = rng.random(2500).astype(np.float32)
    x = jnp.asarray(x)
    idx = jnp.asarray(np.tile(np.arange(N, dtype=np.int32), (1, 1)))

    for rep in range(3):
        row = []
        for kind in ("full", "chunk4", "chunk8", "presel"):
            ms = timed(make_variant(kind), x, idx)
            row.append(f"{kind} {ms:6.3f}")
        print(f"rep{rep}: " + " | ".join(row), flush=True)


if __name__ == "__main__":
    main()
