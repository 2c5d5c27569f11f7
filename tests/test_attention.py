"""Pallas FlashAttention-2 kernel vs naive reference attention.

Mirrors the reference's implicit plugin-vs-no-plugin A/B oracle
(SURVEY.md §4.2) across shapes, precision policies, and variable lengths —
including N not a multiple of the KV block via bucketed padding + masking.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightglue_tpu.kernels.attention import flash_attention, reference_attention


def _make_qkv(rng, batch, heads, nq, nk, head_dim, dtype):
    shape_q = (batch, heads, nq, head_dim)
    shape_kv = (batch, heads, nk, head_dim)
    q = rng.standard_normal(shape_q, dtype=np.float32)
    k = rng.standard_normal(shape_kv, dtype=np.float32)
    v = rng.standard_normal(shape_kv, dtype=np.float32)
    return (
        jnp.asarray(q, dtype=dtype),
        jnp.asarray(k, dtype=dtype),
        jnp.asarray(v, dtype=dtype),
    )


@pytest.mark.parametrize("nq,nk", [(256, 256), (512, 256), (1024, 1024)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_matches_reference_full_length(rng, nq, nk, dtype):
    q, k, v = _make_qkv(rng, 2, 4, nq, nk, 64, dtype)
    out = flash_attention(q, k, v, stat_dtype=jnp.float32)
    ref = reference_attention(q, k, v)
    tol = 2e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=tol, rtol=tol
    )


def test_bf16_stats_policy(rng):
    """fp16in/fp16out analog: all-16-bit stats still close to fp32 oracle."""
    q, k, v = _make_qkv(rng, 1, 4, 512, 512, 64, jnp.bfloat16)
    out = flash_attention(q, k, v, stat_dtype=jnp.bfloat16)
    ref = reference_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=6e-2, rtol=6e-2
    )


@pytest.mark.parametrize("q_len,kv_len", [(1000, 777), (129, 64), (256, 1), (64, 200)])
def test_variable_lengths(rng, q_len, kv_len):
    """Bucketed padding + in-kernel masking == unpadded computation.

    The analog of the reference's pad/unpad contract
    (lightglue_attention_plugin.cpp:169-221): pad rows are zero, pad columns
    never contribute.
    """
    bucket_q, bucket_k = 1024, 1024
    q, k, v = _make_qkv(rng, 1, 4, bucket_q, bucket_k, 64, jnp.float32)
    lengths = jnp.array([[q_len, kv_len]], dtype=jnp.int32)

    out = flash_attention(q, k, v, lengths)

    # Oracle: run unpadded slices through the naive path.
    ref_valid = reference_attention(
        q[:, :, :q_len, :], k[:, :, :kv_len, :], v[:, :, :kv_len, :]
    )
    np.testing.assert_allclose(
        np.asarray(out[:, :, :q_len, :]), np.asarray(ref_valid), atol=1e-5, rtol=1e-5
    )
    # Padded query rows must be exactly zero.
    np.testing.assert_array_equal(np.asarray(out[:, :, q_len:, :]), 0.0)


def test_batched_ragged_lengths(rng):
    """Each batch element gets its own true length (continuous batching)."""
    batch, nq = 4, 512
    q, k, v = _make_qkv(rng, batch, 4, nq, nq, 64, jnp.float32)
    lens = jnp.array([[512, 512], [300, 300], [65, 100], [1, 512]], dtype=jnp.int32)
    out = flash_attention(q, k, v, lens)
    for b in range(batch):
        ql, kl = int(lens[b, 0]), int(lens[b, 1])
        ref = reference_attention(
            q[b : b + 1, :, :ql, :], k[b : b + 1, :, :kl, :], v[b : b + 1, :, :kl, :]
        )
        np.testing.assert_allclose(
            np.asarray(out[b : b + 1, :, :ql, :]), np.asarray(ref), atol=1e-5, rtol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(out[b, :, ql:, :]), 0.0)


def test_scale_matches_hardcoded_eighth(rng):
    """Reference hardcodes 0.125 for head_dim 64 (...fp16out.cu:467)."""
    q, k, v = _make_qkv(rng, 1, 1, 256, 256, 64, jnp.float32)
    out_default = flash_attention(q, k, v)
    out_eighth = flash_attention(q, k, v, scale=0.125)
    np.testing.assert_array_equal(np.asarray(out_default), np.asarray(out_eighth))


def test_non_divisible_raises(rng):
    q, k, v = _make_qkv(rng, 1, 1, 200, 200, 64, jnp.float32)
    with pytest.raises(ValueError):
        flash_attention(q, k, v, block_q=128, block_k=128)


def test_jit_and_grad_free_forward(rng):
    """Kernel works under an outer jit (the session runtime always jits)."""
    q, k, v = _make_qkv(rng, 1, 4, 256, 256, 64, jnp.bfloat16)

    @jax.jit
    def f(q, k, v):
        return flash_attention(q, k, v).sum()

    val = f(q, k, v)
    assert np.isfinite(float(val))
