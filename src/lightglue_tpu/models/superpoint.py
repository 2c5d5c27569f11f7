"""SuperPoint detector/descriptor CNN in JAX, NHWC layout.

TPU-first re-design of the reference model
(lightglue_pytorch_with_plugin/superpoint.py:90-179): VGG-style encoder
(channels 64,64,128,128,256; three 2x2 maxpools -> stride 8), detector head
(65-channel softmax, dustbin dropped, 8x8 pixel-shuffle to a full-resolution
score map, iterative NMS radius 4) and descriptor head (256-d,
L2-normalized dense map). Keypoint selection stays outside this graph, in
``pipeline/extract.py`` — mirroring the reference where it lives in the C++
runtime (demo/superpoint_mono_trt.cpp:153-253).

NHWC is the TPU-native conv layout (channel on the 128-lane minor dim);
the reference's NCHW is a CUDA convention with no benefit here.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from lightglue_tpu.config import SuperPointConfig
from lightglue_tpu.kernels import conv as conv_kernel
from lightglue_tpu.kernels.nms import simple_nms
from lightglue_tpu.precision import DTypePolicy

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(p, x: jax.Array, *, same: bool = True) -> jax.Array:
    pad = "SAME" if same else "VALID"
    out = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(1, 1),
        padding=pad,
        dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    )
    return (out + p["b"]).astype(x.dtype)


def _relu_conv(p, x: jax.Array, pool: bool = False) -> jax.Array:
    """3x3 conv + ReLU [+ 2x2 maxpool], XLA path.

    XLA's conv lowering runs at full MXU rate once C_out >= 128 (measured
    136+ TFLOPs at conv3b/conv4x, scripts/bench_conv_ab.py), so stages 3-4
    and the heads stay here; the C=64 layers route through the
    paired-column Pallas kernel in ``_forward_impl`` instead (both the XLA
    conv and a direct tap-matmul kernel cap at ~30 TFLOPs there)."""
    out = jax.nn.relu(_conv(p, x))
    return _max_pool_2x2(out) if pool else out


def _relu_conv1a_shift(p, x: jax.Array) -> jax.Array:
    """First conv (C_in=1) as 9 shifted broadcast-FMAs on the VPU.

    A 1-channel 3x3 conv is degenerate for the MXU (contraction depth 9 of
    128) and XLA's conv lowering wraps it in layout-conversion copies that
    cost more than the math (~0.3 ms of pure `copy` at 480x640 on v5e,
    measured via scripts/bench_stem.py: conv-op stem 0.93 ms vs shift stem
    0.80 ms). The tap-shift form stays in the natural (row, col) layout and
    fuses into one VPU loop.
    """
    b, h, w, _ = x.shape
    x2d = x[..., 0]
    xp = jnp.pad(x2d, ((0, 0), (1, 1), (1, 1)))
    wf = p["w"].astype(jnp.float32)  # (3, 3, 1, C)
    acc = jnp.zeros((b, h, w, wf.shape[-1]), jnp.float32)
    for di in range(3):
        for dj in range(3):
            tap = xp[:, di : di + h, dj : dj + w].astype(jnp.float32)
            acc = acc + tap[..., None] * wf[di, dj, 0]
    return jax.nn.relu(acc + p["b"]).astype(x.dtype)


def _max_pool_2x2(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def forward(
    params,
    image: jax.Array,
    *,
    config: SuperPointConfig = SuperPointConfig(),
    policy: DTypePolicy,
    nms: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Dense forward pass.

    Args:
      params: pytree from ``runtime.weights`` (HWIO conv weights).
      image: (B, H, W, 1) grayscale in [0, 1]; H, W multiples of 8.
      nms: apply iterative NMS to the score map. The extraction hot path
        passes False and runs NMS inside the fused candidate kernel
        (``kernels.nms.nms_candidates`` via ``extract_keypoints``'s
        raw_scores path) so the dense map never round-trips HBM between
        NMS and top-k.

    Returns:
      scores: (B, H, W) detection score map (fp32), NMS'd when ``nms``.
      descriptors: (B, H/8, W/8, 256) L2-normalized dense descriptors (fp32).
    """
    with jax.default_matmul_precision(policy.matmul_precision):
        return _forward_impl(
            params, image, config=config, policy=policy, nms=nms
        )


def forward_raw_descriptors(
    params,
    image: jax.Array,
    *,
    config: SuperPointConfig = SuperPointConfig(),
    policy: DTypePolicy,
) -> jax.Array:
    """Dense descriptor map BEFORE L2 normalization, (B, H/8, W/8, 256) fp32.

    Used by ``runtime.weights.whiten_superpoint_descriptors`` to calibrate a
    ZCA whitening of the descriptor head for random-init (proxy) weights:
    deep random ReLU CNNs collapse every position's descriptor onto one
    dominant direction, and whitening the raw convDb output restores the
    diversity trained weights would have (see tests/test_fullscale_parity.py
    for the full rationale; the released checkpoints are unobtainable
    offline, README.md)."""
    with jax.default_matmul_precision(policy.matmul_precision):
        x = image.astype(policy.act_dtype)
        x = _relu_conv1a_shift(params["conv1a"], x)
        x = _relu_conv(params["conv1b"], x)
        x = _max_pool_2x2(x)
        x = _relu_conv(params["conv2a"], x)
        x = _relu_conv(params["conv2b"], x)
        x = _max_pool_2x2(x)
        x = _relu_conv(params["conv3a"], x)
        x = _relu_conv(params["conv3b"], x)
        x = _max_pool_2x2(x)
        x = _relu_conv(params["conv4a"], x)
        x = _relu_conv(params["conv4b"], x)
        cda = _relu_conv(params["convDa"], x)
        return _conv(params["convDb"], cda).astype(jnp.float32)


def _forward_impl(params, image, *, config, policy, nms=True):
    x = image.astype(policy.act_dtype)

    # Shared encoder (reference superpoint.py:143-153). The C=64 layers
    # (conv1b..conv2b — 65% of the model's FLOPs at full resolution) run as
    # paired-column Pallas matmuls (kernels/conv.py:conv3x3_paired): a
    # direct 64-channel conv caps at ~30 TFLOPs on the MXU (half output
    # width x half contraction depth) for XLA and hand-written kernels
    # alike; pairing adjacent columns makes every tap a full (128, 128)
    # matmul. conv2a's paired output feeds conv2b without unpairing, and
    # the 2x2 pools fuse into the kernels (the column half is a lane-halves
    # max), so full-resolution activations never round-trip HBM.
    x = _relu_conv1a_shift(params["conv1a"], x)
    b_, h0, w0, _ = x.shape
    if conv_kernel.supports_paired(
        h0, w0, 64, 64, x.dtype
    ) and conv_kernel.supports_paired(h0 // 2, w0 // 2, 64, 64, x.dtype):
        # conv1b/conv2a consume unpaired maps, so they run the offset-paired
        # 75%-dense form (6 MXU passes/point vs 9 — chip A/B
        # golden/chip_r03/conv_offset_ab2.out: conv1b+pool 0.51 -> 0.34 ms);
        # conv2b consumes conv2a's paired output directly and stays on the
        # parity-block form — unpair+offset loses to the paired chain
        # (golden/chip_r03/conv_chain2_ab.out). conv1b's halo pad + lane
        # repack is fused INTO conv1a's epilogue (offset_prepad before the
        # barrier): the 39 MB full-res activation materializes once, not
        # three times. The barrier itself is still REQUIRED — without it
        # XLA sinks conv1a's 9-tap sum into the pallas-call pad boundary
        # and materializes every tap broadcast separately at full
        # resolution in fp32 (~700 MB of layout copies, 2.6 ms instead of
        # 0.75 for the stem; scripts/bench_conv_ab.py chain).
        xpp = conv_kernel.offset_prepad(x)
        xpp = jax.lax.optimization_barrier(xpp)
        x = conv_kernel.conv3x3_paired(
            xpp, params["conv1b"]["w"], params["conv1b"]["b"], pool=True,
            offset=True, prepad_w=w0,
        )
        x = conv_kernel.conv3x3_paired(
            x, params["conv2a"]["w"], params["conv2a"]["b"], out_paired=True,
            offset=True,
        )
        x = conv_kernel.conv3x3_paired(
            x,
            params["conv2b"]["w"],
            params["conv2b"]["b"],
            x_paired=True,
            pool=True,
        )
    else:
        x = _relu_conv(params["conv1b"], x, pool=True)
        x = _relu_conv(params["conv2a"], x)
        x = _relu_conv(params["conv2b"], x, pool=True)
    x = _relu_conv(params["conv3a"], x)
    x = _relu_conv(params["conv3b"], x, pool=True)
    x = _relu_conv(params["conv4a"], x)
    x = _relu_conv(params["conv4b"], x)

    # Detector head (reference superpoint.py:156-167): 65-ch softmax, drop the
    # dustbin, pixel-shuffle 8x8 cells back to full resolution, NMS.
    cpa = _relu_conv(params["convPa"], x)
    logits = _conv(params["convPb"], cpa).astype(jnp.float32)  # (B, h, w, 65)
    probs = jax.nn.softmax(logits, axis=-1)[..., :-1]  # (B, h, w, 64)
    b, h, w, _ = probs.shape
    scores = probs.reshape(b, h, w, 8, 8)
    scores = scores.transpose(0, 1, 3, 2, 4).reshape(b, h * 8, w * 8)
    if nms:
        scores = simple_nms(scores, config.nms_radius)

    # Descriptor head (reference superpoint.py:171-173).
    cda = _relu_conv(params["convDa"], x)
    desc = _conv(params["convDb"], cda).astype(jnp.float32)  # (B, h, w, 256)
    desc = desc * jax.lax.rsqrt(
        jnp.sum(desc * desc, axis=-1, keepdims=True) + 1e-12
    )
    return scores, desc
