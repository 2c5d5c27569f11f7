"""SuperPoint sub-stage attribution: NMS, top_k (exact vs approx), sampling."""
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
from lightglue_tpu.kernels import nms as nms_lib
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

    def extract_custom(scores, desc_map, topk_mode):
        b, hh, ww = scores.shape
        masked = ex.mask_borders(scores.astype(jnp.float32), spc.remove_borders)
        flat = masked.reshape(b, hh * ww)
        if topk_mode == "exact":
            top_scores, top_idx = jax.lax.top_k(flat, k)
        elif topk_mode == "approx":
            top_scores, top_idx = jax.lax.approx_max_k(flat, k)
        elif topk_mode == "none":
            top_scores, top_idx = flat[:, :k], jnp.broadcast_to(
                jnp.arange(k, dtype=jnp.int32)[None], (b, k)
            )
        ys = (top_idx // ww).astype(jnp.float32)
        xs = (top_idx % ww).astype(jnp.float32)
        kpts = jnp.stack([xs, ys], axis=-1)
        valid = top_scores > spc.detection_threshold
        desc = ex.sample_descriptors(kpts, desc_map, spc.stride)
        kpts_norm = ex.normalize_keypoints(kpts, hh, ww)
        desc = jnp.where(valid[..., None], desc, 0.0)
        return kpts_norm, desc

    orig_nms = nms_lib.simple_nms

    def make_fn(iters):
        @jax.jit
        def run(params, image):
            def body(carry, _):
                img = image + carry * 1e-30
                if mode == "fwd_nonms":
                    try:
                        superpoint.simple_nms  # ensure import path
                    except AttributeError:
                        pass
                scores, desc = superpoint.forward(
                    params, img, config=spc, policy=policy
                )
                if mode == "fwd":
                    out = scores[0, 0, 0]
                elif mode in ("exact", "approx", "none"):
                    kn, d = extract_custom(scores, desc, mode)
                    out = kn[0, 0, 0] + d[0, 0, 0].astype(jnp.float32)
                elif mode == "nosample":
                    b2, hh, ww = scores.shape
                    masked = ex.mask_borders(
                        scores.astype(jnp.float32), spc.remove_borders
                    )
                    flat = masked.reshape(b2, hh * ww)
                    ts, ti = jax.lax.top_k(flat, k)
                    out = ts[0, 0] + ti[0, 0].astype(jnp.float32)
                return out.astype(jnp.float32), ()
            return jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return run

    return timed(make_fn, params, image)


def nms_off():
    """Patch simple_nms to identity to cost the NMS."""
    import lightglue_tpu.models.superpoint as sp
    orig = sp.simple_nms
    sp.simple_nms = lambda s, r=4: s
    return orig


if __name__ == "__main__":
    fwd = variant("fwd")
    print(f"forward (with NMS)        : {fwd:.3f} ms", flush=True)
    import lightglue_tpu.models.superpoint as sp
    orig = nms_off()
    fwd_nonms = variant("fwd")
    sp.simple_nms = orig
    print(f"forward (NMS patched out) : {fwd_nonms:.3f} ms  -> NMS={fwd-fwd_nonms:.3f}", flush=True)
    ex_exact = variant("exact")
    print(f"fwd + exact top_k + sample: {ex_exact:.3f} ms", flush=True)
    ex_nosamp = variant("nosample")
    print(f"fwd + exact top_k only    : {ex_nosamp:.3f} ms  -> sample={ex_exact-ex_nosamp:.3f}", flush=True)
    ex_approx = variant("approx")
    print(f"fwd + approx top_k + samp : {ex_approx:.3f} ms", flush=True)
    ex_none = variant("none")
    print(f"fwd + NO top_k + sample   : {ex_none:.3f} ms  -> topk_exact={ex_exact-ex_none:.3f}", flush=True)
