"""Independent torch oracle for parity tests.

A straight-line re-statement of the LightGlue / SuperPoint math using torch
functional primitives, driven directly by a torch-layout state dict. It is
deliberately written with different idioms than both the reference nn.Module
code and the JAX implementation (repeat_interleave instead of stack/cat for
the positional encoding, F.scaled_dot_product_attention for attention,
einsum-free heads handling) so that a shared misreading of the architecture
is unlikely to pass. Shapes/semantics follow SURVEY.md §2.3.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def make_lightglue_state_dict(seed=0, n_layers=9, dim=256, heads=4):
    """Random torch-layout LightGlue state dict (fp32)."""
    g = torch.Generator().manual_seed(seed)

    def lin(i, o):
        b = 1.0 / np.sqrt(i)
        return (
            torch.empty(o, i).uniform_(-b, b, generator=g),
            torch.empty(o).uniform_(-b, b, generator=g),
        )

    sd = {}
    sd["posenc.Wr.weight"] = torch.randn(dim // heads // 2, 2, generator=g)
    for i in range(n_layers):
        for blk, names in (
            ("self_attn", [("Wqkv", dim, 3 * dim), ("out_proj", dim, dim)]),
            (
                "cross_attn",
                [("to_qk", dim, dim), ("to_v", dim, dim), ("to_out", dim, dim)],
            ),
        ):
            for name, ci, co in names:
                w, b = lin(ci, co)
                sd[f"transformers.{i}.{blk}.{name}.weight"] = w
                sd[f"transformers.{i}.{blk}.{name}.bias"] = b
            w, b = lin(2 * dim, 2 * dim)
            sd[f"transformers.{i}.{blk}.ffn.0.weight"] = w
            sd[f"transformers.{i}.{blk}.ffn.0.bias"] = b
            sd[f"transformers.{i}.{blk}.ffn.1.weight"] = torch.rand(
                2 * dim, generator=g
            ) + 0.5
            sd[f"transformers.{i}.{blk}.ffn.1.bias"] = torch.randn(
                2 * dim, generator=g
            ) * 0.1
            w, b = lin(2 * dim, dim)
            sd[f"transformers.{i}.{blk}.ffn.3.weight"] = w
            sd[f"transformers.{i}.{blk}.ffn.3.bias"] = b
        w, b = lin(dim, dim)
        sd[f"log_assignment.{i}.final_proj.weight"] = w
        sd[f"log_assignment.{i}.final_proj.bias"] = b
        w, b = lin(dim, 1)
        sd[f"log_assignment.{i}.matchability.weight"] = w
        sd[f"log_assignment.{i}.matchability.bias"] = b
        if i < n_layers - 1:
            w, b = lin(dim, 1)
            sd[f"token_confidence.{i}.token.0.weight"] = w
            sd[f"token_confidence.{i}.token.0.bias"] = b
    return sd


@torch.no_grad()
def oracle_lightglue(
    sd, kpts0, kpts1, desc0, desc1, n_layers=9, heads=4, dtype=torch.float32
):
    """Returns (desc0, desc1, scores) like the reference exported graph.

    ``dtype=torch.float64`` (with a double state dict) gives the exact
    anchor used to adjudicate cross-backend fp32 disagreements."""
    kpts0 = torch.as_tensor(np.asarray(kpts0), dtype=dtype)
    kpts1 = torch.as_tensor(np.asarray(kpts1), dtype=dtype)
    d0 = torch.as_tensor(np.asarray(desc0), dtype=dtype)
    d1 = torch.as_tensor(np.asarray(desc1), dtype=dtype)
    dim = d0.shape[-1]
    hd = dim // heads

    def lin(x, prefix):
        return x @ sd[prefix + ".weight"].T + sd[prefix + ".bias"]

    def pos(kpts):
        proj = kpts @ sd["posenc.Wr.weight"].T  # (B, N, hd/2)
        cos = torch.repeat_interleave(proj.cos(), 2, dim=-1)
        sin = torch.repeat_interleave(proj.sin(), 2, dim=-1)
        return cos, sin

    def rope(t, cos, sin):
        pair = t.reshape(*t.shape[:-1], hd // 2, 2)
        rot = torch.stack((-pair[..., 1], pair[..., 0]), -1).reshape(t.shape)
        return t * cos.unsqueeze(1) + rot * sin.unsqueeze(1)

    def split(x):
        b, n, e = x.shape
        return x.reshape(b, n, heads, hd).permute(0, 2, 1, 3)

    def merge(x):
        b, h, n, d = x.shape
        return x.permute(0, 2, 1, 3).reshape(b, n, h * d)

    def ffn(x, msg, prefix):
        h = torch.cat([x, msg], -1)
        h = lin(h, prefix + ".0")
        h = F.layer_norm(
            h, (h.shape[-1],), sd[prefix + ".1.weight"], sd[prefix + ".1.bias"]
        )
        h = F.gelu(h)
        return x + lin(h, prefix + ".3")

    def self_block(x, cos, sin, p):
        qkv = lin(x, p + ".Wqkv")
        b, n, _ = qkv.shape
        qkv = qkv.reshape(b, n, heads, hd, 3).permute(0, 2, 1, 3, 4)
        q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
        q, k = rope(q, cos, sin), rope(k, cos, sin)
        ctx = F.scaled_dot_product_attention(q, k, v)
        msg = lin(merge(ctx), p + ".out_proj")
        return ffn(x, msg, p + ".ffn")

    def cross_block(x0, x1, p):
        qk0, qk1 = split(lin(x0, p + ".to_qk")), split(lin(x1, p + ".to_qk"))
        v0, v1 = split(lin(x0, p + ".to_v")), split(lin(x1, p + ".to_v"))
        m0 = merge(F.scaled_dot_product_attention(qk0, qk1, v1))
        m1 = merge(F.scaled_dot_product_attention(qk1, qk0, v0))
        m0, m1 = lin(m0, p + ".to_out"), lin(m1, p + ".to_out")
        return ffn(x0, m0, p + ".ffn"), ffn(x1, m1, p + ".ffn")

    cos0, sin0 = pos(kpts0)
    cos1, sin1 = pos(kpts1)
    for i in range(n_layers):
        d0 = self_block(d0, cos0, sin0, f"transformers.{i}.self_attn")
        d1 = self_block(d1, cos1, sin1, f"transformers.{i}.self_attn")
        d0, d1 = cross_block(d0, d1, f"transformers.{i}.cross_attn")

    p = f"log_assignment.{n_layers - 1}"
    scale = dim ** 0.25
    md0 = lin(d0, p + ".final_proj") / scale
    md1 = lin(d1, p + ".final_proj") / scale
    sim = md0 @ md1.transpose(1, 2)
    z0 = lin(d0, p + ".matchability")
    z1 = lin(d1, p + ".matchability")
    scores = (
        F.log_softmax(sim, 2)
        + F.log_softmax(sim, 1)
        + F.logsigmoid(z0)
        + F.logsigmoid(z1).transpose(1, 2)
    )
    return d0.numpy(), d1.numpy(), scores.numpy()


# ---------------------------------------------------------------------------
# SuperPoint oracle
# ---------------------------------------------------------------------------


def make_superpoint_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    convs = [
        ("conv1a", 1, 64, 3), ("conv1b", 64, 64, 3),
        ("conv2a", 64, 64, 3), ("conv2b", 64, 64, 3),
        ("conv3a", 64, 128, 3), ("conv3b", 128, 128, 3),
        ("conv4a", 128, 128, 3), ("conv4b", 128, 128, 3),
        ("convPa", 128, 256, 3), ("convPb", 256, 65, 1),
        ("convDa", 128, 256, 3), ("convDb", 256, 256, 1),
    ]
    sd = {}
    for name, ci, co, k in convs:
        bound = 1.0 / np.sqrt(ci * k * k)
        sd[f"{name}.weight"] = torch.empty(co, ci, k, k).uniform_(
            -bound, bound, generator=g
        )
        sd[f"{name}.bias"] = torch.empty(co).uniform_(-bound, bound, generator=g)
    return sd


@torch.no_grad()
def oracle_superpoint_raw_descriptors(sd, image):
    """Dense descriptor map BEFORE L2 normalization (B, C, H/8, W/8).

    Used to calibrate descriptor whitening for full-scale parity tests:
    random deep ReLU CNNs collapse — every position's descriptor shares one
    dominant direction (all-positive activations), so after L2 normalization
    the cosine similarity between any two keypoints is ~0.9999 and the match
    structure degenerates to rank-1. Tests fold a ZCA whitening of this raw
    map into the 1x1 convDb weights to restore the diversity trained weights
    would have (see tests/test_fullscale_parity.py).
    """
    x = torch.as_tensor(np.asarray(image), dtype=torch.float32)

    def conv(x, name, pad):
        return F.conv2d(x, sd[f"{name}.weight"], sd[f"{name}.bias"], padding=pad)

    for name in ["conv1a", "conv1b"]:
        x = F.relu(conv(x, name, 1))
    x = F.max_pool2d(x, 2, 2)
    for name in ["conv2a", "conv2b"]:
        x = F.relu(conv(x, name, 1))
    x = F.max_pool2d(x, 2, 2)
    for name in ["conv3a", "conv3b"]:
        x = F.relu(conv(x, name, 1))
    x = F.max_pool2d(x, 2, 2)
    for name in ["conv4a", "conv4b"]:
        x = F.relu(conv(x, name, 1))
    return conv(F.relu(conv(x, "convDa", 1)), "convDb", 0)


@torch.no_grad()
def oracle_superpoint(sd, image, nms_radius=4):
    """Dense (scores, descriptors) like the reference exported graph
    (superpoint.py:137-179): encoder -> detector softmax/pixel-shuffle/NMS,
    descriptor head L2-normalized."""
    x = torch.as_tensor(np.asarray(image), dtype=torch.float32)

    def conv(x, name, pad):
        return F.conv2d(x, sd[f"{name}.weight"], sd[f"{name}.bias"], padding=pad)

    for name in ["conv1a", "conv1b"]:
        x = F.relu(conv(x, name, 1))
    x = F.max_pool2d(x, 2, 2)
    for name in ["conv2a", "conv2b"]:
        x = F.relu(conv(x, name, 1))
    x = F.max_pool2d(x, 2, 2)
    for name in ["conv3a", "conv3b"]:
        x = F.relu(conv(x, name, 1))
    x = F.max_pool2d(x, 2, 2)
    for name in ["conv4a", "conv4b"]:
        x = F.relu(conv(x, name, 1))

    scores = conv(F.relu(conv(x, "convPa", 1)), "convPb", 0)
    scores = F.softmax(scores, 1)[:, :-1]
    b, _, h, w = scores.shape
    scores = scores.permute(0, 2, 3, 1).reshape(b, h, w, 8, 8)
    scores = scores.permute(0, 1, 3, 2, 4).reshape(b, h * 8, w * 8)

    # simple_nms (reference superpoint.py:52-69)
    def max_pool(t):
        return F.max_pool2d(
            t, kernel_size=nms_radius * 2 + 1, stride=1, padding=nms_radius
        )

    s = scores[None]
    zeros = torch.zeros_like(s)
    max_mask = s == max_pool(s)
    for _ in range(2):
        supp_mask = max_pool(max_mask.float()) > 0
        supp_scores = torch.where(supp_mask, zeros, s)
        new_max_mask = supp_scores == max_pool(supp_scores)
        max_mask = max_mask | (new_max_mask & (~supp_mask))
    scores = torch.where(max_mask, s, zeros)[0]

    desc = conv(F.relu(conv(x, "convDa", 1)), "convDb", 0)
    desc = F.normalize(desc, p=2, dim=1)
    return scores.numpy(), desc.numpy()
