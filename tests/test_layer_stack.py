"""Parity of the whole-stack megakernel vs the per-block layer path.

The megakernel (kernels/layer_stack.py) must reproduce the composed
transformer_layer scan — same projections, rotary, bidirectional cross
attention, FFN — within 16-bit rounding, including ragged-length masking.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightglue_tpu.config import LightGlueConfig
from lightglue_tpu.kernels import layer_stack
from lightglue_tpu.models import lightglue
from lightglue_tpu.precision import Precision, policy_for
from lightglue_tpu.runtime import weights


def _setup(b, n, n_layers, seed=0):
    config = LightGlueConfig(n_layers=n_layers)
    policy = policy_for(Precision.BF16)
    params = weights.to_jax(
        weights.init_lightglue(seed, config), policy.param_dtype
    )
    rng = np.random.default_rng(seed)
    kpts0 = jnp.asarray(rng.uniform(-1, 1, (b, n, 2)).astype(np.float32))
    kpts1 = jnp.asarray(rng.uniform(-1, 1, (b, n, 2)).astype(np.float32))
    d0 = jnp.asarray(
        rng.standard_normal((b, n, 256), dtype=np.float32), policy.act_dtype
    )
    d1 = jnp.asarray(
        rng.standard_normal((b, n, 256), dtype=np.float32), policy.act_dtype
    )
    return config, policy, params, kpts0, kpts1, d0, d1


def _scan_path(params, d0, d1, freqs0, freqs1, lens0, lens1, config, policy):
    num_heads = config.num_heads
    ffn_dim = 2 * config.descriptor_dim

    def body(carry, layer_params):
        c0, c1 = lightglue.transformer_layer(
            layer_params, carry[0], carry[1], freqs0, freqs1, lens0, lens1,
            num_heads, policy, None, ffn_dim,
        )
        return (c0, c1), None

    (o0, o1), _ = jax.lax.scan(body, (d0, d1), params["layers"])
    return o0, o1


@pytest.mark.parametrize("ragged", [False, True])
def test_stack_matches_scan(ragged):
    b, n, n_layers = 2, 256, 3
    config, policy, params, kpts0, kpts1, d0, d1 = _setup(b, n, n_layers)
    if ragged:
        lens0 = jnp.asarray([256, 130], jnp.int32)
        lens1 = jnp.asarray([200, 256], jnp.int32)
    else:
        lens0 = lens1 = jnp.full((b,), n, jnp.int32)
    freqs0 = lightglue.posenc(params["posenc"], kpts0, config.head_dim)
    freqs1 = lightglue.posenc(params["posenc"], kpts1, config.head_dim)

    with jax.default_matmul_precision(policy.matmul_precision):
        ref0, ref1 = _scan_path(
            params, d0, d1, freqs0, freqs1, lens0, lens1, config, policy
        )
        got0, got1 = layer_stack.transformer_stack(
            params["layers"], d0, d1, freqs0, freqs1, lens0, lens1,
            num_heads=config.num_heads,
            head_dim=config.head_dim,
            stat_dtype=policy.attn_stat_dtype,
        )

    for ref, got, lens in ((ref0, got0, lens0), (ref1, got1, lens1)):
        ref = np.asarray(ref, np.float32)
        got = np.asarray(got, np.float32)
        # only real (unpadded) rows are contractual
        for i in range(b):
            r, g = ref[i, : int(lens[i])], got[i, : int(lens[i])]
            scale = np.abs(r).max()
            assert np.abs(r - g).max() <= 0.02 * scale, (
                np.abs(r - g).max(),
                scale,
            )


def test_stack_matches_full_forward():
    """forward() itself routes through the megakernel (gate on) and must
    produce the same match scores as the explicitly-composed path."""
    b, n, n_layers = 1, 256, 2
    config, policy, params, kpts0, kpts1, d0, d1 = _setup(b, n, n_layers)
    lens = jnp.full((b,), n, jnp.int32)
    assert layer_stack.supports(params["layers"], n, n, d0.dtype, None)

    out = lightglue.forward(
        params, kpts0, kpts1, d0, d1, lens, lens, config=config, policy=policy
    )

    with jax.default_matmul_precision(policy.matmul_precision):
        freqs0 = lightglue.posenc(params["posenc"], kpts0, config.head_dim)
        freqs1 = lightglue.posenc(params["posenc"], kpts1, config.head_dim)
        o0, o1 = _scan_path(
            params, d0, d1, freqs0, freqs1, lens, lens, config, policy
        )
        mask0, mask1 = lightglue._masks_from_lengths(lens, lens, n, n)
        last = jax.tree.map(lambda a: a[-1], params["assign"])
        scores_ref = lightglue.match_assignment(
            last, o0, o1, mask0, mask1, config.descriptor_dim
        )

    s_got = np.asarray(out.scores, np.float32)
    s_ref = np.asarray(scores_ref, np.float32)
    # bf16-rounding-level agreement (random-init weights give near-uniform
    # scores, so exact argmax identity is not a meaningful bar here — the
    # e2e match-set parity vs the torch oracle lives in test_e2e.py)
    assert np.abs(s_got - s_ref).max() < 0.15
    assert (s_got.argmax(-1) == s_ref.argmax(-1)).mean() > 0.9


def test_stack_int8_matches_per_block():
    """INT8 rung through the megakernel (in-kernel dequant) must agree with
    the per-block int8 path."""
    from lightglue_tpu.quant import quantize_lightglue

    b, n, n_layers = 1, 256, 2
    config, policy_bf16, _, kpts0, kpts1, d0, d1 = _setup(b, n, n_layers)
    policy = policy_for(Precision.INT8)
    raw = weights.init_lightglue(0, config)
    params = weights.to_jax(quantize_lightglue(raw))
    lens0 = lens1 = jnp.full((b,), n, jnp.int32)
    freqs0 = lightglue.posenc(params["posenc"], kpts0, config.head_dim)
    freqs1 = lightglue.posenc(params["posenc"], kpts1, config.head_dim)

    with jax.default_matmul_precision(policy.matmul_precision):
        ref0, ref1 = _scan_path(
            params, d0, d1, freqs0, freqs1, lens0, lens1, config, policy
        )
        got0, got1 = layer_stack.transformer_stack(
            params["layers"], d0, d1, freqs0, freqs1, lens0, lens1,
            num_heads=config.num_heads,
            head_dim=config.head_dim,
            stat_dtype=policy.attn_stat_dtype,
        )
    for ref, got in ((ref0, got0), (ref1, got1)):
        ref = np.asarray(ref, np.float32)
        got = np.asarray(got, np.float32)
        assert np.abs(ref - got).max() <= 0.02 * np.abs(ref).max()


@pytest.mark.parametrize("precision,tol", [
    (Precision.MIXED, 5e-3),
    (Precision.FP32, 1e-4),
])
def test_stack_fp32_rungs_match_per_block(precision, tol):
    """MIXED (fp32 acts, bf16 attention operands) and FP32 through the
    megakernel vs the per-block path."""
    b, n, n_layers = 1, 256, 2
    config = LightGlueConfig(n_layers=n_layers)
    policy = policy_for(precision)
    params = weights.to_jax(
        weights.init_lightglue(0, config), policy.param_dtype
    )
    rng = np.random.default_rng(0)
    kpts0 = jnp.asarray(rng.uniform(-1, 1, (b, n, 2)).astype(np.float32))
    kpts1 = jnp.asarray(rng.uniform(-1, 1, (b, n, 2)).astype(np.float32))
    d0 = jnp.asarray(rng.standard_normal((b, n, 256), dtype=np.float32))
    d1 = jnp.asarray(rng.standard_normal((b, n, 256), dtype=np.float32))
    lens = jnp.full((b,), n, jnp.int32)
    freqs0 = lightglue.posenc(params["posenc"], kpts0, config.head_dim)
    freqs1 = lightglue.posenc(params["posenc"], kpts1, config.head_dim)

    with jax.default_matmul_precision(policy.matmul_precision):
        ref0, ref1 = _scan_path(
            params, d0, d1, freqs0, freqs1, lens, lens, config, policy
        )
        got0, got1 = layer_stack.transformer_stack(
            params["layers"], d0, d1, freqs0, freqs1, lens, lens,
            num_heads=config.num_heads,
            head_dim=config.head_dim,
            stat_dtype=policy.attn_stat_dtype,
            attn_dtype=policy.attn_in_dtype,
        )
    for ref, got in ((ref0, got0), (ref1, got1)):
        ref = np.asarray(ref, np.float32)
        got = np.asarray(got, np.float32)
        assert np.abs(ref - got).max() <= tol * np.abs(ref).max(), (
            np.abs(ref - got).max(),
            np.abs(ref).max(),
        )


def test_supports_gate():
    config, policy, params, *_ = _setup(1, 256, 1)
    layers = params["layers"]
    assert layer_stack.supports(layers, 256, 256, jnp.bfloat16, None)
    assert layer_stack.supports(layers, 256, 256, jnp.float32, None)
    # mixed buckets supported since r2 (separate per-image activation refs)
    assert layer_stack.supports(layers, 256, 512, jnp.bfloat16, None)
    assert layer_stack.supports(layers, 512, 1024, jnp.bfloat16, None)
    assert not layer_stack.supports(layers, 2048, 2048, jnp.bfloat16, None)
    assert not layer_stack.supports(layers, 192, 192, jnp.bfloat16, None)
    assert not layer_stack.supports(layers, 256, 256, jnp.bfloat16, "model")


@pytest.mark.parametrize("ragged", [False, True])
def test_stack_mixed_buckets_matches_scan(ragged):
    """n0 != n1 (a 256x512 pair) runs through the megakernel since r2 and
    must match the per-block scan path."""
    b, n0, n1, n_layers = 2, 128, 256, 2
    config, policy, params, kpts0, kpts1, d0, d1 = _setup(b, n1, n_layers)
    kpts0, d0 = kpts0[:, :n0], d0[:, :n0]
    if ragged:
        lens0 = jnp.asarray([n0, 70], jnp.int32)
        lens1 = jnp.asarray([150, n1], jnp.int32)
    else:
        lens0 = jnp.full((b,), n0, jnp.int32)
        lens1 = jnp.full((b,), n1, jnp.int32)
    freqs0 = lightglue.posenc(params["posenc"], kpts0, config.head_dim)
    freqs1 = lightglue.posenc(params["posenc"], kpts1, config.head_dim)
    assert layer_stack.supports(params["layers"], n0, n1, d0.dtype, None)

    with jax.default_matmul_precision(policy.matmul_precision):
        ref0, ref1 = _scan_path(
            params, d0, d1, freqs0, freqs1, lens0, lens1, config, policy
        )
        got0, got1 = layer_stack.transformer_stack(
            params["layers"], d0, d1, freqs0, freqs1, lens0, lens1,
            num_heads=config.num_heads,
            head_dim=config.head_dim,
            stat_dtype=policy.attn_stat_dtype,
        )

    for ref, got, lens in ((ref0, got0, lens0), (ref1, got1, lens1)):
        ref = np.asarray(ref, np.float32)
        got = np.asarray(got, np.float32)
        for i in range(b):
            r, g = ref[i, : int(lens[i])], got[i, : int(lens[i])]
            scale = np.abs(r).max()
            assert np.abs(r - g).max() <= 0.02 * scale, (
                np.abs(r - g).max(), scale,
            )


@pytest.mark.parametrize("ragged", [False, True])
def test_cross_transposed_matches_default(ragged):
    """The transposed-S cross direction (its own (N1, N0) matmul, lane-wise
    softmax stats) is a pure layout change: outputs must agree with the
    shared-S default to float tolerance, including mixed ragged buckets."""
    b, n0, n1, n_layers = 2, 128, 256, 2
    config, policy, params, kpts0, kpts1, d0, d1 = _setup(b, n1, n_layers)
    kpts0, d0 = kpts0[:, :n0], d0[:, :n0]
    if ragged:
        lens0 = jnp.asarray([n0, 70], jnp.int32)
        lens1 = jnp.asarray([150, n1], jnp.int32)
    else:
        lens0 = lens1 = None
    freqs0 = lightglue.posenc(params["posenc"], kpts0, config.head_dim)
    freqs1 = lightglue.posenc(params["posenc"], kpts1, config.head_dim)

    with jax.default_matmul_precision(policy.matmul_precision):
        base0, base1 = layer_stack.transformer_stack(
            params["layers"], d0, d1, freqs0, freqs1, lens0, lens1,
            num_heads=config.num_heads,
            head_dim=config.head_dim,
            stat_dtype=policy.attn_stat_dtype,
            cross_transposed=False,
        )
        got0, got1 = layer_stack.transformer_stack(
            params["layers"], d0, d1, freqs0, freqs1, lens0, lens1,
            num_heads=config.num_heads,
            head_dim=config.head_dim,
            stat_dtype=policy.attn_stat_dtype,
            cross_transposed=True,
        )

    for base, got, lens in ((base0, got0, lens0), (base1, got1, lens1)):
        base = np.asarray(base, np.float32)
        got = np.asarray(got, np.float32)
        for i in range(b):
            k = int(lens[i]) if lens is not None else base.shape[1]
            r, g = base[i, :k], got[i, :k]
            scale = np.abs(r).max()
            # same fp32-accumulated dot products; the softmax DENOMINATORS
            # round differently (default sums bf16-cast p via the ones
            # matmul, transposed sums fp32 p1), so agreement is to ~1 bf16
            # ULP of the activation scale, not bitwise
            assert np.abs(r - g).max() <= 0.005 * scale, (
                np.abs(r - g).max(), scale,
            )
