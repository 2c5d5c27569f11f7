"""SuperPoint attribution — consolidated (was attrib_sp{,2,3,4}.py).

Modes:
  stages   forward vs forward+extract vs batch-2 (where the time goes)
  extract  NMS cost, exact vs approx vs no top-k, sampling cost
  sample   isolated descriptor-sampling formulations (gather vs one-hot
           matmul) on synthetic data — NOTE: consumption is narrow, XLA
           DCEs aggressively; prefer in-model numbers from `extract`.

Usage: python scripts/attrib_sp.py [stages|extract|sample]
"""
import sys

from _timing import timed

import jax
import jax.numpy as jnp
import numpy as np

from lightglue_tpu.config import PipelineConfig
from lightglue_tpu.models import superpoint
from lightglue_tpu.pipeline import extract as ex
from lightglue_tpu.pipeline.extract import extract_keypoints
from lightglue_tpu.precision import Precision, policy_for
from lightglue_tpu.runtime import weights


def _setup(batch=1, h=480, w=640):
    config = PipelineConfig(precision=Precision.BF16)
    policy = policy_for(config.precision)
    params = weights.to_jax(weights.init_superpoint(0, config.superpoint))
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((batch, h, w, 1), dtype=np.float32))
    return config, policy, params, image


def _scan_variant(config, policy, params, image, consume):
    def make_fn(iters):
        @jax.jit
        def run(params, image):
            def body(carry, _):
                img = image + carry * 1e-30
                scores, desc = superpoint.forward(
                    params, img, config=config.superpoint, policy=policy
                )
                return consume(scores, desc).astype(jnp.float32), ()
            return jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return run
    return timed(make_fn, params, image)


def mode_stages():
    config, policy, params, image = _setup()

    def with_extract(scores, desc):
        ext = extract_keypoints(scores, desc, config=config.superpoint)
        return ext.keypoints_norm[0, 0, 0]

    def forward_only(scores, desc):
        return scores[0, 0, 0] + desc[0, 0, 0, 0].astype(jnp.float32)

    full = _scan_variant(config, policy, params, image, with_extract)
    fwd = _scan_variant(config, policy, params, image, forward_only)
    print(f"SP forward+extract : {full:.3f} ms", flush=True)
    print(f"SP forward only    : {fwd:.3f} ms", flush=True)
    print(f"extract (diff)     : {full - fwd:.3f} ms", flush=True)
    config2, policy2, params2, image2 = _setup(batch=2)
    b2 = _scan_variant(config2, policy2, params2, image2, with_extract)
    print(f"batch-2 full       : {b2:.3f} ms", flush=True)


def mode_extract():
    config, policy, params, image = _setup()
    spc = config.superpoint
    k = spc.max_num_keypoints

    def custom(topk_mode):
        def consume(scores, desc):
            b, hh, ww = scores.shape
            masked = ex.mask_borders(scores.astype(jnp.float32), spc.remove_borders)
            flat = masked.reshape(b, hh * ww)
            if topk_mode == "exact":
                ts, ti = jax.lax.top_k(flat, k)
            elif topk_mode == "tiled":
                ts, ti = ex._topk_nms_tiled(masked, k, hh, ww)
            elif topk_mode == "approx":
                ts, ti = jax.lax.approx_max_k(flat, k)
            elif topk_mode == "nosample":
                ts, ti = jax.lax.top_k(flat, k)
                return ts[0, 0] + ti[0, 0].astype(jnp.float32)
            ys = (ti // ww).astype(jnp.float32)
            xs = (ti % ww).astype(jnp.float32)
            kpts = jnp.stack([xs, ys], axis=-1)
            d = ex.sample_descriptors(kpts, desc, spc.stride)
            return ts[0, 0] + d[0, 0, 0].astype(jnp.float32)
        return consume

    import lightglue_tpu.models.superpoint as sp_mod

    fwd = _scan_variant(config, policy, params, image,
                        lambda s, d: s[0, 0, 0])
    print(f"forward (with NMS)        : {fwd:.3f} ms", flush=True)
    orig = sp_mod.simple_nms
    sp_mod.simple_nms = lambda s, r=4: s
    fwd_nonms = _scan_variant(config, policy, params, image,
                              lambda s, d: s[0, 0, 0])
    sp_mod.simple_nms = orig
    print(f"forward (NMS patched out) : {fwd_nonms:.3f} ms  "
          f"-> NMS={fwd - fwd_nonms:.3f}", flush=True)
    for mode in ("exact", "tiled", "approx", "nosample"):
        t = _scan_variant(config, policy, params, image, custom(mode))
        print(f"fwd + topk[{mode:8s}]     : {t:.3f} ms", flush=True)


def mode_sample():
    B, K, HW, C = 1, 1024, 4800, 256
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, HW - 81, (B, K)).astype(np.int32))
    dm = jnp.asarray(rng.standard_normal((B, HW, C)).astype(np.float32))

    def variant(mode):
        def make_fn(iters):
            @jax.jit
            def run(idx, dm):
                def body(carry, _):
                    i = idx + (carry.astype(jnp.int32) % 2)
                    if mode == "onehot_matmul":
                        hw_iota = jax.lax.broadcasted_iota(
                            jnp.int32, (B, K, HW), 2
                        )
                        interp = sum(
                            jnp.where(hw_iota == (i + o)[..., None], 0.25, 0.0)
                            for o in (0, 1, 80, 81)
                        )
                        s = jnp.einsum("bkh,bhc->bkc", interp, dm)
                    else:  # gather4
                        s = sum(
                            jnp.take_along_axis(
                                dm, ((i + o) % HW)[..., None], axis=1
                            )
                            for o in (0, 1, 80, 81)
                        ) * 0.25
                    out = jnp.sum(s[0, 0]) + jnp.sum(s[0, -1])
                    return out.astype(jnp.float32), ()
                return jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return run
        return timed(make_fn, idx, dm)

    for mode in ("gather4", "onehot_matmul"):
        print(f"{mode:14s}: {variant(mode):.3f} ms", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "stages"
    {"stages": mode_stages, "extract": mode_extract, "sample": mode_sample}[
        mode
    ]()
