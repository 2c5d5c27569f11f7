"""SuperPoint JAX model vs independent torch oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from lightglue_tpu.models import superpoint as sp
from lightglue_tpu.precision import Precision, policy_for
from lightglue_tpu.runtime import weights

from torch_oracle import make_superpoint_state_dict, oracle_superpoint


@pytest.fixture(scope="module")
def model():
    sd = make_superpoint_state_dict(seed=3)
    sd_np = {k: v.numpy() for k, v in sd.items()}
    params = weights.to_jax(weights.superpoint_from_state_dict(sd_np))
    return sd, params


def test_dense_outputs_match_oracle(rng, model):
    sd, params = model
    h, w = 64, 80
    img = rng.random((1, h, w), dtype=np.float32)
    scores, desc = sp.forward(
        params,
        jnp.asarray(img[..., None]),
        policy=policy_for(Precision.FP32),
    )
    ref_scores, ref_desc = oracle_superpoint(sd, img[:, None, :, :])
    assert scores.shape == (1, h, w)
    assert desc.shape == (1, h // 8, w // 8, 256)
    np.testing.assert_allclose(np.asarray(scores), ref_scores, atol=1e-5, rtol=1e-4)
    # oracle descriptors are NCHW
    np.testing.assert_allclose(
        np.asarray(desc).transpose(0, 3, 1, 2), ref_desc, atol=1e-5, rtol=1e-4
    )


def test_nms_suppresses_neighbors(model):
    """After NMS, no two surviving keypoints are within the radius."""
    from lightglue_tpu.kernels.nms import simple_nms

    rng = np.random.default_rng(5)
    scores = jnp.asarray(rng.random((1, 48, 48), dtype=np.float32))
    out = np.asarray(simple_nms(scores, 4))
    ys, xs = np.nonzero(out[0])
    pts = np.stack([ys, xs], -1)
    for i in range(len(pts)):
        d = np.abs(pts - pts[i]).max(axis=1)
        close = (d <= 4) & (d > 0)
        assert not np.any(
            close & (out[0][ys, xs] > 0)
        ) or True  # structure check below
    # stronger check: chebyshev distance between any two survivors > radius
    if len(pts) > 1:
        from scipy.spatial.distance import cdist

        cheb = cdist(pts, pts, metric="chebyshev")
        np.fill_diagonal(cheb, np.inf)
        assert cheb.min() > 4


def test_bf16_forward_runs(rng, model):
    sd, params = model
    img = rng.random((1, 32, 32), dtype=np.float32)
    scores, desc = sp.forward(
        params,
        jnp.asarray(img[..., None]),
        policy=policy_for(Precision.BF16),
    )
    assert np.isfinite(np.asarray(scores)).all()
    assert np.isfinite(np.asarray(desc)).all()


def test_bf16_descriptors_not_degenerate(rng, model):
    """Regression guard for the reference's known fp16 defect: its fp16
    SuperPoint engine produced all-zero descriptors (steps.txt:81-82). The
    bf16 rung here must keep valid unit-norm descriptors."""
    sd, params = model
    img = rng.random((1, 64, 64), dtype=np.float32)
    _, desc = sp.forward(
        params, jnp.asarray(img[..., None]), policy=policy_for(Precision.BF16)
    )
    norms = np.linalg.norm(np.asarray(desc), axis=-1)
    assert (norms > 0.5).all(), "descriptors collapsed (reference fp16 bug)"


def test_session_rejects_bad_shapes(rng):
    from lightglue_tpu.config import PipelineConfig, SuperPointConfig
    from lightglue_tpu.runtime.session import MatcherSession
    import pytest as _pytest

    session = MatcherSession(
        config=PipelineConfig(
            superpoint=SuperPointConfig(max_num_keypoints=64), buckets=(64,)
        )
    )
    with _pytest.raises(ValueError, match="multiples"):
        session.extract(np.zeros((1, 30, 64, 1), np.float32))
    with _pytest.raises(ValueError, match="grayscale"):
        session.extract(np.zeros((1, 32, 32, 3), np.float32))


def test_whiten_superpoint_descriptors(rng):
    """ZCA-whitened convDb (proxy-pretrained weights, README) restores
    descriptor DIVERSITY: random deep ReLU CNNs collapse every position's
    L2-normalized descriptor onto one direction (|cos| ~ 0.9999); after
    whitening the median pairwise |cos| must be small."""
    import jax.numpy as jnp
    from lightglue_tpu.models import superpoint
    from lightglue_tpu.precision import Precision, policy_for
    from lightglue_tpu.runtime import weights

    def median_abs_cos(params, img):
        raw = np.asarray(
            superpoint.forward_raw_descriptors(
                weights.to_jax(params), jnp.asarray(img),
                policy=policy_for(Precision.FP32),
            )
        ).reshape(-1, 256).astype(np.float64)
        d = raw / (np.linalg.norm(raw, axis=-1, keepdims=True) + 1e-12)
        g = d @ d.T
        return np.median(np.abs(g[~np.eye(len(g), dtype=bool)]))

    params = weights.init_superpoint(3)
    # calibration grid must have > 256 positions (the demo calibrates on a
    # 480x640 frame = 4800 positions)
    img = rng.random((1, 160, 224, 1)).astype(np.float32)
    before = median_abs_cos(params, img)
    wparams = weights.whiten_superpoint_descriptors(params, img)
    after = median_abs_cos(wparams, img)
    assert before > 0.99, before  # the collapse is real
    assert after < 0.35, after    # whitening restores diversity


def test_conv3x3_kernel_matches_xla(rng):
    """Pallas tap-matmul conv (kernels/conv.py) vs lax conv, with and
    without the fused pool, at a qualifying shape."""
    import jax
    import jax.numpy as jnp
    from lightglue_tpu.kernels import conv as conv_kernel

    b, h, w, cin, cout = 2, 16, 32, 8, 16
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)).astype(np.float32))
    wts = jnp.asarray(
        (rng.standard_normal((3, 3, cin, cout)) * 0.2).astype(np.float32)
    )
    bias = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    assert conv_kernel.supports(h, w, cin, cout, x.dtype)

    # HIGHEST: on TPU a default-precision XLA conv runs bf16 passes and
    # becomes the WRONG side of the 1e-5 comparison (the Pallas kernel
    # accumulates true fp32) — the oracle-precision trap from CLAUDE.md
    ref = jax.lax.conv_general_dilated(
        x, wts, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) + bias
    ref_relu = jax.nn.relu(ref)
    got = conv_kernel.conv3x3(x, wts, bias, relu=True, pool=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref_relu), rtol=1e-5, atol=1e-5
    )

    ref_pool = jax.lax.reduce_window(
        ref_relu, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    got_pool = conv_kernel.conv3x3(x, wts, bias, relu=True, pool=True)
    np.testing.assert_allclose(
        np.asarray(got_pool), np.asarray(ref_pool), rtol=1e-5, atol=1e-5
    )

    # no-relu variant (heads use conv without activation)
    got_lin = conv_kernel.conv3x3(x, wts, bias, relu=False, pool=False)
    np.testing.assert_allclose(
        np.asarray(got_lin), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_conv3x3_paired_matches_xla(rng):
    """Paired-column conv (space-to-depth-2 block matmuls) vs lax conv,
    including the fused pool, the paired-output chaining, and parity with
    the direct kernel."""
    import jax
    import jax.numpy as jnp
    from lightglue_tpu.kernels import conv as conv_kernel

    b, h, w, c = 2, 8, 32, 64
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    w1 = jnp.asarray((rng.standard_normal((3, 3, c, c)) * 0.1).astype(np.float32))
    b1 = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    w2 = jnp.asarray((rng.standard_normal((3, 3, c, c)) * 0.1).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    assert conv_kernel.supports_paired(h, w, c, c, x.dtype)

    def xla(x, wts, bias, pool):
        # HIGHEST for the same oracle-precision reason as the direct test
        o = jax.lax.conv_general_dilated(
            x, wts, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        o = jax.nn.relu(o + bias)
        if pool:
            o = jax.lax.reduce_window(
                o, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        return o

    # single conv, no pool
    got = conv_kernel.conv3x3_paired(x, w1, b1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(xla(x, w1, b1, False)), rtol=1e-5,
        atol=1e-5,
    )
    # single conv + fused pool
    got_p = conv_kernel.conv3x3_paired(x, w1, b1, pool=True)
    np.testing.assert_allclose(
        np.asarray(got_p), np.asarray(xla(x, w1, b1, True)), rtol=1e-5,
        atol=1e-5,
    )
    # chained: conv (paired out) -> conv (paired in, pooled out)
    mid = conv_kernel.conv3x3_paired(x, w1, b1, out_paired=True)
    got_c = conv_kernel.conv3x3_paired(
        mid, w2, b2, x_paired=True, pool=True
    )
    want_c = xla(xla(x, w1, b1, False), w2, b2, True)
    np.testing.assert_allclose(
        np.asarray(got_c), np.asarray(want_c), rtol=1e-5, atol=1e-5
    )

    # offset-paired input (75%-dense 6-matmul form): plain, fused pool, and
    # the model's chain shape (offset + out_paired -> x_paired + pool)
    got_o = conv_kernel.conv3x3_paired(x, w1, b1, offset=True)
    np.testing.assert_allclose(
        np.asarray(got_o), np.asarray(xla(x, w1, b1, False)), rtol=1e-5,
        atol=1e-5,
    )
    got_op = conv_kernel.conv3x3_paired(x, w1, b1, pool=True, offset=True)
    np.testing.assert_allclose(
        np.asarray(got_op), np.asarray(xla(x, w1, b1, True)), rtol=1e-5,
        atol=1e-5,
    )
    mid_o = conv_kernel.conv3x3_paired(x, w1, b1, offset=True, out_paired=True)
    got_oc = conv_kernel.conv3x3_paired(mid_o, w2, b2, x_paired=True, pool=True)
    np.testing.assert_allclose(
        np.asarray(got_oc), np.asarray(want_c), rtol=1e-5, atol=1e-5
    )


def test_conv2_chain_matches_two_call_chain():
    """Fused conv2a+conv2b+pool kernel == the two-pallas_call chain
    exactly (same packings, same fold/bias/pool order), including batch
    and edge-strip row-halo zeroing."""
    from lightglue_tpu.kernels import conv as conv_kernel
    from lightglue_tpu.kernels.conv_chain import conv2_chain

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 32, 64, 64)).astype(np.float32))
    wa = jnp.asarray(
        (rng.standard_normal((3, 3, 64, 64)) * 0.1).astype(np.float32)
    )
    ba = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    wb = jnp.asarray(
        (rng.standard_normal((3, 3, 64, 64)) * 0.1).astype(np.float32)
    )
    bb = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    mid = conv_kernel.conv3x3_paired(x, wa, ba, offset=True, out_paired=True)
    want = conv_kernel.conv3x3_paired(mid, wb, bb, x_paired=True, pool=True)
    got = conv2_chain(x, wa, ba, wb, bb)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )
