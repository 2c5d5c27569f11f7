"""Int8 weight-only quantization (the TRT-"best"-engine rung)."""

import jax.numpy as jnp
import numpy as np

from lightglue_tpu.config import LightGlueConfig
from lightglue_tpu.models import lightglue as lg
from lightglue_tpu.precision import Precision, policy_for
from lightglue_tpu.quant import dequantize, quantize_lightglue, quantize_weight
from lightglue_tpu.runtime import weights


def test_quantize_roundtrip_error_bounded(rng):
    w = rng.standard_normal((256, 256), dtype=np.float32)
    q = quantize_weight(w)
    assert q["w_q"].dtype == np.int8
    w_hat = np.asarray(dequantize(q, jnp.float32))
    # per-channel symmetric int8: error <= scale/2 per element
    err = np.abs(w_hat - w)
    assert (err <= q["scale"] * 0.5 + 1e-7).all()


def test_quantized_forward_close_to_fp32(rng):
    config = LightGlueConfig(n_layers=2)
    params_np = weights.init_lightglue(3, config)
    params = weights.to_jax(params_np)
    params_q = weights.to_jax(quantize_lightglue(params_np))

    kpts0 = jnp.asarray(rng.uniform(-1, 1, (1, 96, 2)).astype(np.float32))
    kpts1 = jnp.asarray(rng.uniform(-1, 1, (1, 96, 2)).astype(np.float32))
    desc0 = jnp.asarray(rng.standard_normal((1, 96, 256), dtype=np.float32))
    desc1 = jnp.asarray(rng.standard_normal((1, 96, 256), dtype=np.float32))

    out32 = lg.forward(
        params, kpts0, kpts1, desc0, desc1,
        config=config, policy=policy_for(Precision.FP32),
    )
    out8 = lg.forward(
        params_q, kpts0, kpts1, desc0, desc1,
        config=config, policy=policy_for(Precision.INT8),
    )
    a32 = np.argmax(np.asarray(out32.scores[0]), axis=1)
    a8 = np.argmax(np.asarray(out8.scores[0], dtype=np.float32), axis=1)
    agree = np.mean(a32 == a8)
    assert agree > 0.85, f"int8 argmax agreement {agree}"


def test_quantized_tree_is_half_the_bytes():
    config = LightGlueConfig(n_layers=2)
    params = weights.init_lightglue(0, config)
    q = quantize_lightglue(params)

    def nbytes(tree):
        import jax

        return sum(np.asarray(x).nbytes for x in jax.tree.leaves(tree))

    # big linear weights go 4 bytes -> 1 byte
    assert nbytes(q) < 0.45 * nbytes(params)


def test_session_int8_runs(rng):
    from lightglue_tpu.config import PipelineConfig, SuperPointConfig
    from lightglue_tpu.runtime.session import MatcherSession

    config = PipelineConfig(
        superpoint=SuperPointConfig(max_num_keypoints=64),
        lightglue=LightGlueConfig(n_layers=2),
        precision=Precision.INT8,
        buckets=(64,),
        match_threshold=1e-9,
        max_matches=64,
    )
    session = MatcherSession(config=config)
    img = rng.random((64, 64, 1), dtype=np.float32)
    result = session.match_pair(img, img)
    # identical images: mutual-NN should produce mostly identity matches
    matches = result["matches"]
    assert result["num_keypoints0"] > 0
    if len(matches):
        assert (matches[:, 0] == matches[:, 1]).mean() > 0.9
