"""Chip attribution INSIDE the extraction top-k: which of the three parts
of _topk_nms_tiled costs — the full-res -> tile relayout (a transpose that
exactly undoes the detector's pixel-shuffle), the iterative per-tile
max/argmax rounds, or the final top_k sort over ~19k candidates.

Stages (cumulative over a shared NMS'd score map input):
  tiles    build (B, T, 64) tiles (reshape+transpose) + one max reduction
  itermax  + the remaining cap-1 max/argmax/where rounds + index math
  sort     + top_k(k) + gather  (== full _topk_nms_tiled)

Run: python scripts/attrib_topk.py
"""
from _timing import timed

import jax
import jax.numpy as jnp
import numpy as np

from lightglue_tpu.pipeline import extract as ex

H, W, K = 480, 640, 1024


def main():
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.random((1, H, W), dtype=np.float32))

    def stage(kind):
        def make(iters):
            @jax.jit
            def run(scores):
                def body(carry, _):
                    s = scores + carry * 1e-30
                    tile, cap = 8, 4
                    b = s.shape[0]
                    th, tw = H // tile, W // tile
                    tiles = (
                        s.reshape(b, th, tile, tw, tile)
                        .transpose(0, 1, 3, 2, 4)
                        .reshape(b, th * tw, tile * tile)
                    )
                    if kind == "tiles":
                        return jnp.max(tiles), ()
                    lane = jax.lax.broadcasted_iota(jnp.int32, tiles.shape, 2)
                    vals, args = [], []
                    t = tiles
                    for _ in range(cap):
                        v = jnp.max(t, axis=-1)
                        a = jnp.argmax(t, axis=-1).astype(jnp.int32)
                        vals.append(v)
                        args.append(a)
                        t = jnp.where(lane == a[..., None], -jnp.inf, t)
                    cand_v = jnp.stack(vals, axis=-1).reshape(b, th * tw * cap)
                    if kind == "itermax":
                        return jnp.max(cand_v) + jnp.sum(
                            jnp.stack(args, -1).astype(jnp.float32)
                        ) * 1e-30, ()
                    tv, ti = ex._topk_nms_tiled(s, K, H, W)
                    return tv[0, 0] + ti[0, 0].astype(jnp.float32), ()

                return jax.lax.scan(body, jnp.float32(0), None, length=iters)

            return run
        return make

    prev = 0.0
    for kind in ("tiles", "itermax", "sort"):
        t = timed(stage(kind), scores)
        print(f"{kind:8s} cum {t:7.3f} ms   delta {t - prev:7.3f} ms", flush=True)
        prev = t


if __name__ == "__main__":
    main()
