"""Precision-ladder policy resolution and dtype plumbing."""

import jax.numpy as jnp
import numpy as np
import pytest

from lightglue_tpu.config import LightGlueConfig
from lightglue_tpu.models import lightglue as lg
from lightglue_tpu.precision import Precision, policy_for
from lightglue_tpu.runtime import weights


def test_ladder_maps_trt_engines():
    fp32 = policy_for(Precision.FP32)
    assert fp32.attn_in_dtype == jnp.float32 and fp32.attn_fp32_stats
    assert fp32.matmul_precision == "highest"

    mixed = policy_for(Precision.MIXED)  # fp32 engine + plugin analog
    assert mixed.attn_in_dtype == jnp.bfloat16
    assert mixed.attn_stat_dtype == jnp.float32
    assert mixed.act_dtype == jnp.float32

    bf16 = policy_for(Precision.BF16)  # fp16 engine analog
    assert bf16.attn_stat_dtype == jnp.bfloat16
    assert not bf16.int8_weights

    int8 = policy_for(Precision.INT8)  # "best" engine analog
    assert int8.int8_weights


def test_policy_for_accepts_strings():
    assert policy_for("bf16") is policy_for(Precision.BF16)


@pytest.mark.parametrize("precision", ["fp32", "mixed", "bf16"])
def test_forward_emits_policy_dtypes(rng, precision):
    config = LightGlueConfig(n_layers=1)
    policy = policy_for(precision)
    params = weights.to_jax(weights.init_lightglue(0, config), policy.param_dtype)
    out = lg.forward(
        params,
        jnp.asarray(rng.uniform(-1, 1, (1, 64, 2)).astype(np.float32)),
        jnp.asarray(rng.uniform(-1, 1, (1, 64, 2)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((1, 64, 256), dtype=np.float32)),
        jnp.asarray(rng.standard_normal((1, 64, 256), dtype=np.float32)),
        config=config,
        policy=policy,
    )
    assert out.desc0.dtype == policy.act_dtype
    assert out.scores.dtype == jnp.float32  # match head always scores fp32


def test_mixed_tracks_fp32_closely(rng):
    """MIXED (the fp32-engine-with-plugin analog) must stay much closer to
    FP32 than BF16 does — same ordering as the reference's precision ladder."""
    config = LightGlueConfig(n_layers=2)
    params_np = weights.init_lightglue(1, config)
    args = (
        jnp.asarray(rng.uniform(-1, 1, (1, 128, 2)).astype(np.float32)),
        jnp.asarray(rng.uniform(-1, 1, (1, 128, 2)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((1, 128, 256), dtype=np.float32)),
        jnp.asarray(rng.standard_normal((1, 128, 256), dtype=np.float32)),
    )

    def run(precision):
        policy = policy_for(precision)
        params = weights.to_jax(params_np, policy.param_dtype)
        return np.asarray(
            lg.forward(params, *args, config=config, policy=policy).scores,
            dtype=np.float32,
        )

    s32 = run(Precision.FP32)
    s_mixed = run(Precision.MIXED)
    s_bf16 = run(Precision.BF16)
    err_mixed = np.abs(s_mixed - s32).mean()
    err_bf16 = np.abs(s_bf16 - s32).mean()
    assert err_mixed < err_bf16
