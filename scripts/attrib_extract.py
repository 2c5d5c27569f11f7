"""Chip attribution of the SuperPoint extraction tail (VERDICT r2 #4).

Cumulative two-point timings of the extract pipeline stages on top of the
dense forward, isolating where the ~0.27 ms extract delta
(golden/chip_r02/attrib_sp.out) actually goes:

  forward            dense scores + descriptors (baseline)
  +topk              tile-max candidate reduction + top_k over ~19k cands
  full extract       extract_keypoints end to end (adds sampling/normalize)

Run: python scripts/attrib_extract.py
"""
from _timing import timed

import jax
import jax.numpy as jnp
import numpy as np

from lightglue_tpu.config import SuperPointConfig
from lightglue_tpu.models import superpoint
from lightglue_tpu.pipeline import extract as ex
from lightglue_tpu.precision import Precision, policy_for
from lightglue_tpu.runtime import weights

H, W, K = 480, 640, 1024


def main():
    config = SuperPointConfig(max_num_keypoints=K)
    policy = policy_for(Precision.BF16)
    params = weights.to_jax(weights.init_superpoint(0, config), policy.param_dtype)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((1, H, W, 1), dtype=np.float32))

    def stage(kind):
        def make(iters):
            @jax.jit
            def run(params, image):
                def body(carry, _):
                    img = image + carry.astype(image.dtype) * 1e-30
                    scores, desc = superpoint.forward(
                        params, img, config=config, policy=policy
                    )
                    if kind == "forward":
                        out = scores[0, 0, 0] + desc[0, 0, 0, 0]
                        return out.astype(jnp.float32), ()
                    masked = ex.mask_borders(
                        scores.astype(jnp.float32), config.remove_borders
                    )
                    if kind == "cands":
                        # candidate generation only (tile max/argmax rounds)
                        b = masked.shape[0]
                        th, tw = H // 8, W // 8
                        tiles = (
                            masked.reshape(b, th, 8, tw, 8)
                            .transpose(0, 1, 3, 2, 4)
                            .reshape(b, th * tw, 64)
                        )
                        lane = jax.lax.broadcasted_iota(jnp.int32, tiles.shape, 2)
                        vals = []
                        t = tiles
                        for _ in range(4):
                            v = jnp.max(t, axis=-1)
                            a = jnp.argmax(t, axis=-1).astype(jnp.int32)
                            vals.append(v)
                            t = jnp.where(lane == a[..., None], -jnp.inf, t)
                        out = vals[0][0, 0] + vals[3][0, 0]
                        return out + desc[0, 0, 0, 0].astype(jnp.float32), ()
                    if kind == "topk":
                        tv, ti = ex._topk_nms_tiled(masked, K, H, W)
                        out = tv[0, 0] + ti[0, 0].astype(jnp.float32)
                        return out + desc[0, 0, 0, 0].astype(jnp.float32), ()
                    if kind == "nosample":
                        # everything except descriptor sampling
                        tv, ti = ex._topk_nms_tiled(masked, K, H, W)
                        ys = (ti // W).astype(jnp.float32)
                        xs = (ti % W).astype(jnp.float32)
                        kpts = jnp.stack([xs, ys], axis=-1)
                        kn = ex.normalize_keypoints(kpts, H, W)
                        return kn[0, 0, 0] + tv[0, 0] + desc[0, 0, 0, 0].astype(jnp.float32), ()
                    e = ex.extract_keypoints(scores, desc, config=config)
                    out = e.scores[0, 0] + e.descriptors[0, 0, 0]
                    return out.astype(jnp.float32), ()

                return jax.lax.scan(body, jnp.float32(0), None, length=iters)

            return run

        return timed(make, params, image)

    prev = 0.0
    for kind in ("forward", "cands", "topk", "nosample", "full"):
        ms = stage(kind)
        print(f"{kind:>8}  cum {ms:7.3f} ms   delta {ms - prev:7.3f} ms", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
