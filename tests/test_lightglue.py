"""LightGlue JAX model vs independent torch oracle (converter + forward parity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lightglue_tpu.config import LightGlueConfig
from lightglue_tpu.models import lightglue as lg
from lightglue_tpu.precision import Precision, policy_for
from lightglue_tpu.runtime import weights

from torch_oracle import make_lightglue_state_dict, oracle_lightglue


def _inputs(rng, b, m, n):
    kpts0 = rng.uniform(-1, 1, (b, m, 2)).astype(np.float32)
    kpts1 = rng.uniform(-1, 1, (b, n, 2)).astype(np.float32)
    desc0 = rng.standard_normal((b, m, 256), dtype=np.float32)
    desc1 = rng.standard_normal((b, n, 256), dtype=np.float32)
    return kpts0, kpts1, desc0, desc1


@pytest.fixture(scope="module")
def small_model():
    config = LightGlueConfig(n_layers=3)
    sd = make_lightglue_state_dict(seed=7, n_layers=3)
    sd_np = {k: v.numpy() for k, v in sd.items()}
    params = weights.to_jax(weights.lightglue_from_state_dict(sd_np, config))
    return config, sd, params


def test_forward_matches_torch_oracle(rng, small_model):
    config, sd, params = small_model
    kpts0, kpts1, desc0, desc1 = _inputs(rng, 1, 128, 96)
    out = lg.forward(
        params,
        jnp.asarray(kpts0), jnp.asarray(kpts1),
        jnp.asarray(desc0), jnp.asarray(desc1),
        config=config,
        policy=policy_for(Precision.FP32),
    )
    ref_d0, ref_d1, ref_scores = oracle_lightglue(
        sd, kpts0, kpts1, desc0, desc1, n_layers=config.n_layers
    )
    np.testing.assert_allclose(np.asarray(out.desc0), ref_d0, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(out.desc1), ref_d1, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(out.scores), ref_scores, atol=5e-3, rtol=5e-3)


def test_padded_forward_matches_unpadded(rng, small_model):
    """Bucketed padding + masks must reproduce the exact-shape computation on
    the valid region — the contract replacing the reference's dynamic axes."""
    config, sd, params = small_model
    m_real, n_real, bucket = 100, 77, 128
    kpts0, kpts1, desc0, desc1 = _inputs(rng, 1, bucket, bucket)
    lengths0 = jnp.array([m_real], jnp.int32)
    lengths1 = jnp.array([n_real], jnp.int32)
    policy = policy_for(Precision.FP32)

    out_pad = lg.forward(
        params,
        jnp.asarray(kpts0), jnp.asarray(kpts1),
        jnp.asarray(desc0), jnp.asarray(desc1),
        lengths0, lengths1,
        config=config, policy=policy,
    )
    out_exact = lg.forward(
        params,
        jnp.asarray(kpts0[:, :m_real]), jnp.asarray(kpts1[:, :n_real]),
        jnp.asarray(desc0[:, :m_real]), jnp.asarray(desc1[:, :n_real]),
        config=config, policy=policy,
    )
    np.testing.assert_allclose(
        np.asarray(out_pad.desc0[:, :m_real]),
        np.asarray(out_exact.desc0),
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_pad.scores[:, :m_real, :n_real]),
        np.asarray(out_exact.scores),
        atol=1e-3, rtol=1e-3,
    )
    # padded score entries are -inf-like so they can never be selected
    assert float(np.max(np.asarray(out_pad.scores[:, m_real:, :]))) < -1e20
    assert float(np.max(np.asarray(out_pad.scores[:, :, n_real:]))) < -1e20


def test_bf16_policy_close_to_fp32(rng, small_model):
    config, sd, params = small_model
    kpts0, kpts1, desc0, desc1 = _inputs(rng, 1, 128, 128)
    args = (
        jnp.asarray(kpts0), jnp.asarray(kpts1),
        jnp.asarray(desc0), jnp.asarray(desc1),
    )
    out32 = lg.forward(params, *args, config=config, policy=policy_for(Precision.FP32))
    params16 = weights.cast_params(params, jnp.bfloat16)
    out16 = lg.forward(
        params16, *args, config=config, policy=policy_for(Precision.BF16)
    )
    s32 = np.asarray(out32.scores)
    s16 = np.asarray(out16.scores, dtype=np.float32)
    # scores are log-probs; compare the implied match probabilities
    agree = np.mean(np.argmax(s32[0], axis=1) == np.argmax(s16[0], axis=1))
    assert agree > 0.9, f"bf16 argmax agreement {agree}"


def test_rotate_half_halfsplit_with_permutation_equals_interleaved():
    """The runtime layout is half-split; composed with the load-time q/k
    de-interleave permutation it must reproduce the reference's interleaved
    rotation (lightglue.py:154-159) exactly."""
    from lightglue_tpu.runtime.weights import rope_permutation

    d = 8
    t = np.arange(d, dtype=np.float32)
    # reference interleaved rotation on the unpermuted vector
    pairs = t.reshape(d // 2, 2)
    ref = np.stack([-pairs[:, 1], pairs[:, 0]], -1).reshape(d)
    # runtime: permute, half-split-rotate, unpermute
    perm = rope_permutation(d)
    ours = np.asarray(lg.rotate_half(jnp.asarray(t[perm])[None]))[0]
    inv = np.argsort(perm)
    np.testing.assert_array_equal(ours[inv], ref)


def test_token_confidence_and_matchability(rng, small_model):
    config, sd, params = small_model
    d0 = jnp.asarray(rng.standard_normal((1, 16, 256), dtype=np.float32))
    d1 = jnp.asarray(rng.standard_normal((1, 16, 256), dtype=np.float32))
    tok0 = jax_tree_index(params["token"], 0)
    c0, c1 = lg.token_confidence(tok0, d0, d1)
    assert c0.shape == (1, 16) and c1.shape == (1, 16)
    assert float(c0.min()) >= 0.0 and float(c0.max()) <= 1.0
    assign0 = jax_tree_index(params["assign"], 0)
    m = lg.matchability(assign0, d0)
    assert m.shape == (1, 16)
    assert float(m.min()) >= 0.0 and float(m.max()) <= 1.0


def jax_tree_index(tree, i):
    import jax

    return jax.tree.map(lambda a: a[i], tree)
