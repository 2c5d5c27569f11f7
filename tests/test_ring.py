"""Ring attention (sequence parallelism) vs the single-device oracle.

Runs on the simulated 8-CPU-device mesh (conftest). Exactness bar: the
online-softmax merge is algebraically identical to one-shot softmax, so
fp32 agreement with ``reference_attention`` is to accumulation-order noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from lightglue_tpu.kernels.attention import reference_attention
from lightglue_tpu.parallel.ring import AXIS_SEQ, ring_attention


def _mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), (AXIS_SEQ,))


def _qkv(rng, b, h, nq, nk, d, dtype=np.float32):
    q = rng.standard_normal((b, h, nq, d)).astype(dtype)
    k = rng.standard_normal((b, h, nk, d)).astype(dtype)
    v = rng.standard_normal((b, h, nk, d)).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_ring_matches_reference_fp32(rng):
    mesh = _mesh()
    q, k, v = _qkv(rng, 2, 4, 256, 256, 64)
    out = ring_attention(q, k, v, mesh=mesh)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_ring_cross_shaped(rng):
    """N_q != N_kv — the cross-attention shape (LightGlue mixed buckets)."""
    mesh = _mesh()
    q, k, v = _qkv(rng, 1, 4, 128, 512, 64)
    out = ring_attention(q, k, v, mesh=mesh)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_ring_masked_lengths(rng):
    """Global (len_q, len_kv) masking: pad KV cols ignored, pad Q rows zero.

    Lengths deliberately NOT multiples of the 32-wide per-device block so
    the valid/invalid boundary falls inside a ring step."""
    mesh = _mesh()
    q, k, v = _qkv(rng, 2, 2, 256, 256, 64)
    lengths = jnp.asarray([[200, 173], [256, 41]], jnp.int32)
    out = ring_attention(q, k, v, lengths, mesh=mesh)
    ref = reference_attention(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # pad Q rows are exactly zero
    np.testing.assert_array_equal(np.asarray(out)[0, :, 200:], 0.0)


def test_ring_fully_masked_shard(rng):
    """A device whose entire KV block is padding must not poison stats
    (its -inf block contributes exp(-inf)=0 through the merge)."""
    mesh = _mesh()
    q, k, v = _qkv(rng, 1, 2, 256, 256, 64)
    lengths = jnp.asarray([[256, 32]], jnp.int32)  # only shard 0 has real KV
    out = ring_attention(q, k, v, lengths, mesh=mesh)
    ref = reference_attention(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    assert np.isfinite(np.asarray(out)).all()


def test_ring_bf16_inputs(rng):
    mesh = _mesh()
    q, k, v = _qkv(rng, 1, 4, 256, 256, 64)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = ring_attention(qb, kb, vb, mesh=mesh)
    ref = reference_attention(qb, kb, vb)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_ring_size_validation(rng):
    mesh = _mesh()
    if mesh.devices.size < 2:
        pytest.skip("ring of 1 divides any length; needs >=2 devices")
    q, k, v = _qkv(rng, 1, 1, 100, 256, 64)  # 100 % ring != 0
    with pytest.raises(ValueError, match="divide"):
        ring_attention(q, k, v, mesh=mesh)


def test_ring_smaller_ring(rng):
    """Ring over a 4-device sub-mesh (the other axes free for data/model)."""
    mesh = _mesh(4)
    q, k, v = _qkv(rng, 1, 2, 128, 128, 64)
    lengths = jnp.asarray([[100, 77]], jnp.int32)
    out = ring_attention(q, k, v, lengths, mesh=mesh)
    ref = reference_attention(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_model_forward_ring_matches_forward(rng):
    """MODEL-LEVEL sequence parallelism: lightglue.forward_ring (every
    self/cross attention through the ppermute ring, per-token ops sharded
    on the seq axis) must reproduce the single-device forward. fp32, so
    agreement is to accumulation-order noise."""
    import jax.numpy as jnp

    from lightglue_tpu.config import LightGlueConfig
    from lightglue_tpu.models import lightglue
    from lightglue_tpu.precision import Precision, policy_for
    from lightglue_tpu.runtime import weights

    mesh = _mesh()
    config = LightGlueConfig(n_layers=2)
    policy = policy_for(Precision.FP32)
    params = weights.to_jax(weights.init_lightglue(0, config))
    b, n = 2, 256
    kpts0 = jnp.asarray(rng.uniform(-1, 1, (b, n, 2)).astype(np.float32))
    kpts1 = jnp.asarray(rng.uniform(-1, 1, (b, n, 2)).astype(np.float32))
    d0 = jnp.asarray(rng.standard_normal((b, n, 256), dtype=np.float32))
    d1 = jnp.asarray(rng.standard_normal((b, n, 256), dtype=np.float32))
    lens0 = jnp.asarray([n, 200], jnp.int32)
    lens1 = jnp.asarray([173, n], jnp.int32)

    ring_out = lightglue.forward_ring(
        params, kpts0, kpts1, d0, d1, lens0, lens1,
        config=config, policy=policy, mesh=mesh,
    )
    ref = lightglue.forward(
        params, kpts0, kpts1, d0, d1, lens0, lens1,
        config=config, policy=policy,
    )
    np.testing.assert_allclose(
        np.asarray(ring_out.scores), np.asarray(ref.scores),
        atol=5e-4, rtol=0,
    )
    np.testing.assert_allclose(
        np.asarray(ring_out.desc0), np.asarray(ref.desc0), atol=5e-5, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(ring_out.desc1), np.asarray(ref.desc1), atol=5e-5, rtol=0
    )


def test_ring_zero_length_kv(rng):
    """len_kv == 0: no valid column anywhere — output must be the kernels'
    contractual zeros (attention.py pads l==0 rows to 0), not a mean over
    the pad V rows (exp(-inf - -inf) == 1 pollution)."""
    mesh = _mesh()
    q, k, v = _qkv(rng, 2, 2, 64, 64, 64)
    lengths = jnp.asarray([[64, 0], [40, 32]], jnp.int32)
    out = np.asarray(ring_attention(q, k, v, lengths, mesh=mesh))
    assert np.all(out[0] == 0.0)
    ref = np.asarray(reference_attention(q, k, v, lengths))
    np.testing.assert_allclose(out[1], ref[1], atol=1e-5)
