"""Per-stage SuperPoint attribution: cumulative prefix timing.

Times successively longer prefixes of the forward graph (each in the same
in-jit scan harness as bench.py); the difference between consecutive rows
is that stage's in-model cost. Run AFTER the chip is idle — every variant
is its own executable (first run pays compiles; cached after).

Usage: python scripts/attrib_sp_layers.py
"""
from _timing import timed

import jax
import jax.numpy as jnp
import numpy as np

from lightglue_tpu.config import PipelineConfig
from lightglue_tpu.kernels import conv as conv_kernel
from lightglue_tpu.kernels.nms import simple_nms
from lightglue_tpu.models import superpoint as sp
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


def _prefix(params, image, policy, upto, config):
    """Replicates models/superpoint.py:_forward_impl up to a named stage."""
    p = params
    with jax.default_matmul_precision(policy.matmul_precision):
        x = image.astype(policy.act_dtype)
        x = sp._relu_conv1a_shift(p["conv1a"], x)
        if upto == "conv1a":
            return x
        x = jax.lax.optimization_barrier(x)
        x = conv_kernel.conv3x3_paired(x, p["conv1b"]["w"], p["conv1b"]["b"], pool=True, offset=True)
        if upto == "stem":
            return x
        x = conv_kernel.conv3x3_paired(x, p["conv2a"]["w"], p["conv2a"]["b"], out_paired=True, offset=True)
        x = conv_kernel.conv3x3_paired(x, p["conv2b"]["w"], p["conv2b"]["b"], x_paired=True, pool=True)
        if upto == "enc2":
            return x
        x = sp._relu_conv(p["conv3a"], x)
        x = sp._relu_conv(p["conv3b"], x, pool=True)
        if upto == "enc3":
            return x
        x = sp._relu_conv(p["conv4a"], x)
        x = sp._relu_conv(p["conv4b"], x)
        if upto == "enc4":
            return x
        cpa = sp._relu_conv(p["convPa"], x)
        logits = sp._conv(p["convPb"], cpa).astype(jnp.float32)
        if upto == "logits":
            return logits
        probs = jax.nn.softmax(logits, axis=-1)[..., :-1]
        if upto == "softmax":
            return probs
        b, h, w, _ = probs.shape
        scores = probs.reshape(b, h, w, 8, 8)
        scores = scores.transpose(0, 1, 3, 2, 4).reshape(b, h * 8, w * 8)
        if upto == "headP":
            return scores
        scores = simple_nms(scores, config.superpoint.nms_radius)
        if upto == "nms":
            return scores
        cda = sp._relu_conv(p["convDa"], x)
        desc = sp._conv(p["convDb"], cda).astype(jnp.float32)
        desc = desc * jax.lax.rsqrt(jnp.sum(desc * desc, axis=-1, keepdims=True) + 1e-12)
        return scores[..., 0] + desc[:, 0, 0, :1]  # consume both heads


def main():
    config, policy, params, image = _setup()
    stages = ["conv1a", "stem", "enc2", "enc3", "enc4", "logits", "softmax", "headP", "nms", "full"]
    prev = 0.0
    for st in stages:
        def make_fn(iters, st=st):
            @jax.jit
            def run(params, image):
                def body(carry, _):
                    img = image + carry * 1e-30
                    out = _prefix(params, img, policy, st, config)
                    return out.reshape(-1)[0].astype(jnp.float32), ()
                return jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return run
        t = timed(make_fn, params, image)
        print(f"{st:8s} cum {t:7.3f} ms   delta {t - prev:7.3f} ms", flush=True)
        prev = t

    # extraction on top of full forward (for the ledger)
    def make_full(iters):
        @jax.jit
        def run(params, image):
            def body(carry, _):
                img = image + carry * 1e-30
                scores, desc = sp.forward(params, img, config=config.superpoint, policy=policy)
                ext = extract_keypoints(scores, desc, config=config.superpoint)
                return ext.keypoints_norm[0, 0, 0], ()
            return jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return run
    t = timed(make_full, params, image)
    print(f"full+extract cum {t:7.3f} ms   extract delta {t - prev:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
