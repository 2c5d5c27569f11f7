"""Parameter pytrees: random initialization and torch-checkpoint conversion.

The reference pulls ``superpoint_lightglue_v0-1_arxiv.pth`` /
``superpoint_v1.pth`` from the cvg/LightGlue GitHub release at model
construction (reference lightglue.py:336-341, superpoint.py:132-133). Here the
equivalent is a one-shot converter from those state dicts into JAX pytrees,
plus a random initializer with identical structure for tests and benchmarks.

Layout conventions (see models/lightglue.py docstring):
- linear weights are (in_features, out_features) — the transpose of torch;
- per-layer parameters are stacked on a leading axis for ``lax.scan``;
- the fused Wqkv is repacked from torch's (head, head_dim, 3)-interleaved
  output columns (reference lightglue.py:140-142: qkv.reshape(B, N, H, D, 3))
  into component-major [q | k | v] columns, each head-major.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lightglue_tpu.config import LightGlueConfig, SuperPointConfig

Array = np.ndarray


# ---------------------------------------------------------------------------
# generic helpers
# ---------------------------------------------------------------------------


def _linear_init(rng: np.random.Generator, fan_in: int, fan_out: int):
    bound = 1.0 / np.sqrt(fan_in)
    return {
        "w": rng.uniform(-bound, bound, (fan_in, fan_out)).astype(np.float32),
        "b": rng.uniform(-bound, bound, (fan_out,)).astype(np.float32),
    }


def _stack(trees):
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *trees)


def to_jax(params, dtype=None):
    """numpy pytree -> jnp pytree, optionally casting floating leaves."""

    def conv(x):
        a = jnp.asarray(x)
        if dtype is not None and jnp.issubdtype(a.dtype, jnp.floating):
            a = a.astype(dtype)
        return a

    return jax.tree.map(conv, params)


def cast_params(params, dtype):
    return jax.tree.map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        params,
    )


# ---------------------------------------------------------------------------
# LightGlue
# ---------------------------------------------------------------------------


def init_lightglue(
    seed: int = 0, config: LightGlueConfig = LightGlueConfig()
) -> Dict:
    """Random LightGlue parameter pytree (numpy, fp32)."""
    rng = np.random.default_rng(seed)
    e = config.descriptor_dim
    hd = config.head_dim

    def qkv_init():
        parts = [_linear_init(rng, e, e) for _ in range(3)]
        return {
            "w": np.stack([p["w"] for p in parts]),  # (3, E, E)
            "b": np.stack([p["b"] for p in parts]),  # (3, E)
        }

    def layer_params():
        return {
            "self_attn": {
                "qkv": qkv_init(),
                "out": _linear_init(rng, e, e),
                "ffn1": _linear_init(rng, 2 * e, 2 * e),
                "ln_g": np.ones(2 * e, np.float32),
                "ln_b": np.zeros(2 * e, np.float32),
                "ffn2": _linear_init(rng, 2 * e, e),
            },
            "cross_attn": {
                "qk": _linear_init(rng, e, e),
                "v": _linear_init(rng, e, e),
                "out": _linear_init(rng, e, e),
                "ffn1": _linear_init(rng, 2 * e, 2 * e),
                "ln_g": np.ones(2 * e, np.float32),
                "ln_b": np.zeros(2 * e, np.float32),
                "ffn2": _linear_init(rng, 2 * e, e),
            },
        }

    params = {
        # init N(0, gamma^-2), gamma=1 (reference lightglue.py:73)
        "posenc": {"wr": rng.standard_normal((2, hd // 2)).astype(np.float32)},
        "layers": _stack([layer_params() for _ in range(config.n_layers)]),
        "assign": _stack(
            [
                {
                    "proj": _linear_init(rng, e, e),
                    "match": _linear_init(rng, e, 1),
                }
                for _ in range(config.n_layers)
            ]
        ),
    }
    if config.n_layers > 1:
        params["token"] = _stack(
            [_linear_init(rng, e, 1) for _ in range(config.n_layers - 1)]
        )
    if config.input_dim != config.descriptor_dim:
        params["input_proj"] = _linear_init(rng, config.input_dim, e)
    return params


def _t(sd: Mapping[str, Array], key: str) -> Array:
    """torch Linear weight -> (in, out)."""
    return np.ascontiguousarray(np.asarray(sd[key]).T.astype(np.float32))


def _b(sd: Mapping[str, Array], key: str) -> Array:
    return np.asarray(sd[key]).astype(np.float32)


def rope_permutation(head_dim: int) -> np.ndarray:
    """De-interleave permutation turning interleaved-pair RoPE into
    half-split RoPE.

    The reference rotates interleaved pairs (2i, 2i+1) with frequency i
    (lightglue.py:154-165). Permuting the q/k head dims by
    perm[j] = 2j (j < d/2) else 2(j-d/2)+1 makes the identical rotation act
    on halves (j, j+d/2) — TPU-friendly lane-block swaps instead of
    per-pair shuffles — and leaves Q K^T (hence all model outputs) exactly
    invariant because q and k are permuted consistently.
    """
    half = head_dim // 2
    perm = np.empty(head_dim, np.int64)
    perm[:half] = 2 * np.arange(half)
    perm[half:] = 2 * np.arange(half) + 1
    return perm


def _repack_qkv(w_torch: Array, b_torch: Array, heads: int, head_dim: int):
    """torch Wqkv (3E, E) with (h, d, 3)-interleaved rows -> (3, E, E)
    component-major, head-major output columns, q/k RoPE-permuted.

    Row o of the torch weight corresponds to head h = o // (head_dim*3),
    d = (o % (head_dim*3)) // 3, component c = o % 3 — from
    qkv.reshape(B, N, heads, head_dim, 3) in reference lightglue.py:140.
    The q and k components additionally get the half-split RoPE permutation
    (see ``rope_permutation``).
    """
    e = heads * head_dim
    perm = rope_permutation(head_dim)
    wt = w_torch.T.astype(np.float32)  # (in=E, out=3E)
    wt = wt.reshape(e, heads, head_dim, 3)
    bt = b_torch.astype(np.float32).reshape(heads, head_dim, 3)
    ws, bs = [], []
    for c in range(3):
        wc = wt[..., c]  # (E, heads, head_dim)
        bc = bt[..., c]
        if c < 2:  # q and k feel the rotary embedding; v does not
            wc = wc[..., perm]
            bc = bc[..., perm]
        ws.append(wc.reshape(e, e))
        bs.append(bc.reshape(e))
    return {"w": np.ascontiguousarray(np.stack(ws)), "b": np.stack(bs)}


def lightglue_from_state_dict(
    sd: Mapping[str, Array], config: Optional[LightGlueConfig] = None
) -> Dict:
    """Convert a (numpy-valued) torch state dict to the JAX pytree.

    Accepts both the modern key scheme (``transformers.{i}.self_attn...``)
    and the pre-rename one (``self_attn.{i}...``) the reference shims
    (lightglue.py:347-354). Layer count is inferred from the keys when no
    config is given.
    """
    sd = dict(sd)
    if config is None:
        n_layers = 1 + max(
            int(k.split(".")[1])
            for k in sd
            if k.startswith(("transformers.", "log_assignment."))
        )
        config = LightGlueConfig(n_layers=n_layers)
    for i in range(config.n_layers):
        for old, new in (
            (f"self_attn.{i}.", f"transformers.{i}.self_attn."),
            (f"cross_attn.{i}.", f"transformers.{i}.cross_attn."),
        ):
            for k in [k for k in sd if k.startswith(old)]:
                sd[new + k[len(old):]] = sd.pop(k)

    heads, hd = config.num_heads, config.head_dim

    def layer(i: int):
        p = f"transformers.{i}."
        return {
            "self_attn": {
                "qkv": _repack_qkv(
                    np.asarray(sd[p + "self_attn.Wqkv.weight"]),
                    np.asarray(sd[p + "self_attn.Wqkv.bias"]),
                    heads,
                    hd,
                ),
                "out": {
                    "w": _t(sd, p + "self_attn.out_proj.weight"),
                    "b": _b(sd, p + "self_attn.out_proj.bias"),
                },
                "ffn1": {
                    "w": _t(sd, p + "self_attn.ffn.0.weight"),
                    "b": _b(sd, p + "self_attn.ffn.0.bias"),
                },
                "ln_g": _b(sd, p + "self_attn.ffn.1.weight"),
                "ln_b": _b(sd, p + "self_attn.ffn.1.bias"),
                "ffn2": {
                    "w": _t(sd, p + "self_attn.ffn.3.weight"),
                    "b": _b(sd, p + "self_attn.ffn.3.bias"),
                },
            },
            "cross_attn": {
                "qk": {
                    "w": _t(sd, p + "cross_attn.to_qk.weight"),
                    "b": _b(sd, p + "cross_attn.to_qk.bias"),
                },
                "v": {
                    "w": _t(sd, p + "cross_attn.to_v.weight"),
                    "b": _b(sd, p + "cross_attn.to_v.bias"),
                },
                "out": {
                    "w": _t(sd, p + "cross_attn.to_out.weight"),
                    "b": _b(sd, p + "cross_attn.to_out.bias"),
                },
                "ffn1": {
                    "w": _t(sd, p + "cross_attn.ffn.0.weight"),
                    "b": _b(sd, p + "cross_attn.ffn.0.bias"),
                },
                "ln_g": _b(sd, p + "cross_attn.ffn.1.weight"),
                "ln_b": _b(sd, p + "cross_attn.ffn.1.bias"),
                "ffn2": {
                    "w": _t(sd, p + "cross_attn.ffn.3.weight"),
                    "b": _b(sd, p + "cross_attn.ffn.3.bias"),
                },
            },
        }

    params = {
        "posenc": {"wr": _t(sd, "posenc.Wr.weight")},
        "layers": _stack([layer(i) for i in range(config.n_layers)]),
        "assign": _stack(
            [
                {
                    "proj": {
                        "w": _t(sd, f"log_assignment.{i}.final_proj.weight"),
                        "b": _b(sd, f"log_assignment.{i}.final_proj.bias"),
                    },
                    "match": {
                        "w": _t(sd, f"log_assignment.{i}.matchability.weight"),
                        "b": _b(sd, f"log_assignment.{i}.matchability.bias"),
                    },
                }
                for i in range(config.n_layers)
            ]
        ),
    }
    if f"token_confidence.0.token.0.weight" in sd:
        params["token"] = _stack(
            [
                {
                    "w": _t(sd, f"token_confidence.{i}.token.0.weight"),
                    "b": _b(sd, f"token_confidence.{i}.token.0.bias"),
                }
                for i in range(config.n_layers - 1)
            ]
        )
    if "input_proj.weight" in sd:
        params["input_proj"] = {
            "w": _t(sd, "input_proj.weight"),
            "b": _b(sd, "input_proj.bias"),
        }
    return params


# ---------------------------------------------------------------------------
# SuperPoint
# ---------------------------------------------------------------------------

_SP_CONVS = (
    # name, in, out, kernel
    ("conv1a", 1, 64, 3),
    ("conv1b", 64, 64, 3),
    ("conv2a", 64, 64, 3),
    ("conv2b", 64, 64, 3),
    ("conv3a", 64, 128, 3),
    ("conv3b", 128, 128, 3),
    ("conv4a", 128, 128, 3),
    ("conv4b", 128, 128, 3),
    ("convPa", 128, 256, 3),
    ("convPb", 256, 65, 1),
    ("convDa", 128, 256, 3),
    ("convDb", 256, 256, 1),
)


def init_superpoint(
    seed: int = 0, config: SuperPointConfig = SuperPointConfig()
) -> Dict:
    """Random SuperPoint parameter pytree. Conv weights are stored HWIO
    (height, width, in, out) for NHWC TPU convolutions."""
    rng = np.random.default_rng(seed)
    params = {}
    for name, cin, cout, ks in _SP_CONVS:
        fan_in = cin * ks * ks
        bound = 1.0 / np.sqrt(fan_in)
        params[name] = {
            "w": rng.uniform(-bound, bound, (ks, ks, cin, cout)).astype(np.float32),
            "b": rng.uniform(-bound, bound, (cout,)).astype(np.float32),
        }
    return params


def whiten_superpoint_descriptors(
    sp_params, images: np.ndarray, *, config=None, policy=None
) -> Dict:
    """Fold a ZCA whitening of the dense descriptor map into convDb (1x1).

    For RANDOM-init (proxy) weights only — the released checkpoints are
    unobtainable offline (README.md). Deep random ReLU CNNs collapse: every
    position's raw descriptor shares one dominant direction, so after L2
    normalization all keypoints are ~0.9999 cosine-similar and matching
    degenerates to rank-1. Whitening the raw convDb output over the given
    calibration images restores the diversity trained weights would have,
    making demo/golden-run match counts meaningful. Deterministic given
    (seed, calibration images); both the JAX pipeline and the torch oracle
    consume the same adjusted parameters (tests/test_fullscale_parity.py).

    Args:
      sp_params: SuperPoint pytree (numpy fp32, HWIO convs).
      images: (B, H, W, 1) float32 calibration batch.
    Returns a new pytree with convDb rewritten.
    """
    from lightglue_tpu.config import SuperPointConfig as _SPC
    from lightglue_tpu.models import superpoint as _sp
    from lightglue_tpu.precision import policy_for as _pf, Precision as _P

    config = config or _SPC()
    policy = policy or _pf(_P.FP32)
    raw = _sp.forward_raw_descriptors(
        to_jax(sp_params), jnp.asarray(images), config=config, policy=policy
    )
    flat = np.asarray(raw, np.float64).reshape(-1, raw.shape[-1])
    mu = flat.mean(0)
    cov = np.cov(flat.T)
    evals, evecs = np.linalg.eigh(cov)
    # relative floor: random-init raw descriptors are tiny (top eigenvalue
    # ~1e-5), so an absolute clip would flatten real directions; near-null
    # numerical directions stay suppressed instead of being blown up
    floor = max(float(evals.max()), 1e-30) * 1e-6
    W = evecs @ np.diag(1.0 / np.sqrt(np.clip(evals, floor, None))) @ evecs.T

    out = {k: dict(v) for k, v in sp_params.items()}
    w = np.asarray(sp_params["convDb"]["w"], np.float64)  # (1, 1, 256, 256)
    b = np.asarray(sp_params["convDb"]["b"], np.float64)
    out["convDb"] = {
        "w": np.einsum("ik,ck->ic", w[0, 0], W)[None, None].astype(np.float32),
        "b": (W @ (b - mu)).astype(np.float32),
    }
    return out


def superpoint_from_state_dict(sd: Mapping[str, Array]) -> Dict:
    """torch OIHW conv weights -> HWIO."""
    params = {}
    for name, _, _, _ in _SP_CONVS:
        w = np.asarray(sd[f"{name}.weight"]).astype(np.float32)
        params[name] = {
            "w": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "b": np.asarray(sd[f"{name}.bias"]).astype(np.float32),
        }
    return params


# ---------------------------------------------------------------------------
# checkpoint IO
# ---------------------------------------------------------------------------


def load_torch_checkpoint(path: str) -> Dict[str, Array]:
    """Load a .pth state dict to numpy without needing CUDA."""
    import torch  # local import: torch is only needed for conversion

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def save_npz(params, path: str) -> None:
    """Flatten a pytree into an .npz archive (the Orbax-free checkpoint)."""
    flat = {}

    def walk(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(tree)

    walk("", params)
    np.savez(path, **flat)


def load_npz(path: str) -> Dict:
    data = np.load(path)
    tree: Dict = {}
    for key in data.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return tree
