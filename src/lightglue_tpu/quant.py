"""Int8 weight-only quantization — the ladder rung mirroring the TRT "best"
engine (reference steps.txt:176-227 lets TensorRT pick int8 per layer; here
every LightGlue linear gets per-output-channel symmetric int8 weights, with
activations staying bf16).

Dequantization is expressed as ``(w_q * scale)`` feeding the matmul so XLA
fuses it into the weight load — halving weight HBM traffic, which is what
"weight-only" buys on an inference-bound transformer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quantize_weight(w: np.ndarray):
    """Symmetric per-output-channel int8 quantization.

    Args:
      w: float weight (..., in, out). Only the in-features axis (-2) is
        reduced, so stacked-layer / component leading axes keep independent
        scales (and stay scannable with ``lax.scan``).

    Returns:
      dict with 'w_q' int8 and 'scale' fp32 broadcastable to w.
    """
    w = np.asarray(w, np.float32)
    amax = np.max(np.abs(w), axis=-2, keepdims=True)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    w_q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {"w_q": w_q, "scale": scale}


def dequantize(p, dtype=jnp.bfloat16) -> jax.Array:
    return (p["w_q"].astype(jnp.float32) * p["scale"]).astype(dtype)


_QUANT_KEYS = ("qkv", "out", "ffn1", "ffn2", "qk", "v", "proj")


def quantize_lightglue(params):
    """Quantize every LightGlue linear weight to int8 (biases, LayerNorm,
    positional encoding, matchability and token-confidence heads stay float
    — they are tiny and accuracy-critical)."""

    def walk(tree):
        out = {}
        for key, val in tree.items():
            if key in _QUANT_KEYS and isinstance(val, dict) and "w" in val:
                q = quantize_weight(np.asarray(val["w"]))
                out[key] = {**q, "b": np.asarray(val["b"])}
            elif isinstance(val, dict):
                out[key] = walk(val)
            else:
                out[key] = val
        return out

    return walk(params)


def is_quantized(p) -> bool:
    return isinstance(p, dict) and "w_q" in p
