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


def _merge(x):
    """(B, H, N, D) -> (B, N, H*D) head-major."""
    b, h, n, d = x.shape
    return np.asarray(x).transpose(0, 2, 1, 3).reshape(b, n, h * d)


def test_fused_mha_matches_flash_attention(rng):
    """Model-path kernel (activation layout + optional in-kernel RoPE) vs
    the generic kernel + explicit merge."""
    from lightglue_tpu.kernels.attention import fused_mha

    q, k, v = _make_qkv(rng, 2, 4, 256, 256, 64, jnp.float32)
    out = fused_mha(
        jnp.asarray(_merge(q)), jnp.asarray(_merge(k)), jnp.asarray(_merge(v)),
        num_heads=4,
    )
    ref = _merge(flash_attention(q, k, v))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)

    lens = jnp.array([[200, 150], [256, 256]], jnp.int32)
    out_m = fused_mha(
        jnp.asarray(_merge(q)), jnp.asarray(_merge(k)), jnp.asarray(_merge(v)),
        None, lens, num_heads=4,
    )
    ref_m = _merge(flash_attention(q, k, v, lens))
    np.testing.assert_allclose(np.asarray(out_m), ref_m, atol=1e-5, rtol=1e-5)


def test_fused_mha_rope_matches_external_rotary(rng):
    from lightglue_tpu.kernels.attention import fused_mha
    from lightglue_tpu.models.lightglue import apply_rotary

    q, k, v = _make_qkv(rng, 1, 4, 128, 128, 64, jnp.float32)
    freqs = jnp.asarray(
        rng.uniform(-1, 1, (1, 2, 128, 64)).astype(np.float32)
    )
    out = fused_mha(
        jnp.asarray(_merge(q)), jnp.asarray(_merge(k)), jnp.asarray(_merge(v)),
        freqs, num_heads=4,
    )
    q_r = apply_rotary(freqs, q)
    k_r = apply_rotary(freqs, k)
    ref = _merge(flash_attention(q_r, k_r, v))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_bidirectional_cross_matches_two_attentions(rng):
    """One shared-S pass == two independent attention calls (the reference's
    CrossBlock runs attention twice, lightglue.py:188-205)."""
    from lightglue_tpu.kernels.attention import bidirectional_cross_attention

    qk0 = jnp.asarray(rng.standard_normal((2, 4, 256, 64), dtype=np.float32))
    qk1 = jnp.asarray(rng.standard_normal((2, 4, 192, 64), dtype=np.float32))
    v0 = jnp.asarray(rng.standard_normal((2, 4, 256, 64), dtype=np.float32))
    v1 = jnp.asarray(rng.standard_normal((2, 4, 192, 64), dtype=np.float32))
    o0, o1 = bidirectional_cross_attention(
        jnp.asarray(_merge(qk0)), jnp.asarray(_merge(qk1)),
        jnp.asarray(_merge(v0)), jnp.asarray(_merge(v1)),
        num_heads=4,
    )
    r0 = _merge(reference_attention(qk0, qk1, v1))
    r1 = _merge(reference_attention(qk1, qk0, v0))
    np.testing.assert_allclose(np.asarray(o0), r0, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(o1), r1, atol=1e-5, rtol=1e-5)

    # masked: ragged per-pair lengths
    lens = jnp.array([[200, 100], [256, 192]], jnp.int32)
    o0m, o1m = bidirectional_cross_attention(
        jnp.asarray(_merge(qk0)), jnp.asarray(_merge(qk1)),
        jnp.asarray(_merge(v0)), jnp.asarray(_merge(v1)),
        lens, num_heads=4,
    )
    for bi in range(2):
        n0, n1 = int(lens[bi, 0]), int(lens[bi, 1])
        rr0 = _merge(reference_attention(
            qk0[bi : bi + 1, :, :n0], qk1[bi : bi + 1, :, :n1],
            v1[bi : bi + 1, :, :n1],
        ))[0]
        np.testing.assert_allclose(
            np.asarray(o0m[bi, :n0]), rr0, atol=1e-5, rtol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(o0m[bi, n0:]), 0.0)
        rr1 = _merge(reference_attention(
            qk1[bi : bi + 1, :, :n1], qk0[bi : bi + 1, :, :n0],
            v0[bi : bi + 1, :, :n0],
        ))[0]
        np.testing.assert_allclose(
            np.asarray(o1m[bi, :n1]), rr1, atol=1e-5, rtol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(o1m[bi, n1:]), 0.0)


class TestFlashAttentionStep:
    """Carry-in/carry-out step kernel (the ring-attention local body)."""

    def _merge_blocks(self, q, kb, vb, lengths, order):
        from lightglue_tpu.kernels.attention import flash_attention_step

        b, h, n, d = q.shape
        nk = kb.shape[3]
        m = jnp.full((b, h, n, 1), -1e30, jnp.float32)
        l = jnp.zeros((b, h, n, 1), jnp.float32)
        acc = jnp.zeros((b, h, n, d), jnp.float32)
        for s in order:
            m, l, acc = flash_attention_step(
                q, kb[s], vb[s], m, l, acc, lengths,
                jnp.int32(0), jnp.int32(s * nk),
            )
        out = acc / jnp.where(l == 0.0, 1.0, l)
        if lengths is not None:
            rows = jnp.arange(n)
            ok = rows[None, :] < lengths[:, 0][:, None]
            out = jnp.where(ok[:, None, :, None], out, 0.0)
        return out

    def _data(self, rng, blocks=4, n=64, nk=64, h=2, d=64):
        q = jnp.asarray(rng.standard_normal((1, h, n, d), dtype=np.float32))
        kb = jnp.asarray(
            rng.standard_normal((blocks, 1, h, nk, d), dtype=np.float32)
        )
        vb = jnp.asarray(
            rng.standard_normal((blocks, 1, h, nk, d), dtype=np.float32)
        )
        return q, kb, vb

    def test_block_accumulation_matches_reference(self, rng):
        q, kb, vb = self._data(rng)
        kfull = jnp.concatenate(list(kb), axis=2)
        vfull = jnp.concatenate(list(vb), axis=2)
        ref = reference_attention(q, kfull, vfull)
        out = self._merge_blocks(q, kb, vb, None, range(4))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-6, rtol=2e-6
        )

    def test_order_invariance(self, rng):
        """The FA-2 merge is algebraically order-free — ring rotation order
        (any start device) must give the same answer up to fp rounding."""
        q, kb, vb = self._data(rng)
        a = self._merge_blocks(q, kb, vb, None, [0, 1, 2, 3])
        b = self._merge_blocks(q, kb, vb, None, [2, 3, 0, 1])
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-6, rtol=5e-6
        )

    def test_masked_lengths_and_passthrough_blocks(self, rng):
        """kv_len cuts mid-block: later blocks are fully out of range and
        must pass carries through unchanged; the cut block masks its tail."""
        q, kb, vb = self._data(rng)
        n, nk = 64, 64
        kv_len = nk + 17  # block 0 full, block 1 partial, blocks 2-3 dead
        q_len = n - 5
        lengths = jnp.asarray([[q_len, kv_len]], jnp.int32)
        kfull = jnp.concatenate(list(kb), axis=2)
        vfull = jnp.concatenate(list(vb), axis=2)
        ref = reference_attention(
            q[:, :, :q_len], kfull[:, :, :kv_len], vfull[:, :, :kv_len]
        )
        out = self._merge_blocks(q, kb, vb, lengths, range(4))
        np.testing.assert_allclose(
            np.asarray(out[:, :, :q_len]), np.asarray(ref),
            atol=2e-6, rtol=2e-6,
        )
        # padded Q rows were zeroed by the finalize
        assert float(jnp.max(jnp.abs(out[:, :, q_len:]))) == 0.0

    def test_zero_kv_len_yields_zero(self, rng):
        q, kb, vb = self._data(rng)
        lengths = jnp.asarray([[64, 0]], jnp.int32)
        out = self._merge_blocks(q, kb, vb, lengths, range(4))
        assert float(jnp.max(jnp.abs(out))) == 0.0
