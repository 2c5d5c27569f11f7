"""Precision ladder.

The reference selects precision out-of-band by building three TensorRT engines
(fp32 / fp16 / "best", reference steps.txt:135-227) and ships two attention
kernel variants (fp16-in/fp16-out and fp16-in/fp32-out,
reference lightglue_attention_plugin/attention_headdim_64_*.cu). On TPU the
whole ladder collapses into a dtype policy resolved at trace time:

===================  =============================================  ==========
TRT engine            TPU policy                                     enum
===================  =============================================  ==========
fp32 (no plugin)      fp32 activations, fp32 attention stats         FP32
fp32 (with plugin)    bf16 matmul operands, fp32 accumulation,       MIXED
                      stats, activations and carries (the analog
                      of the plugin's internal fp32->fp16 downcast,
                      reference lightglue_attention_plugin.cpp:222)
fp16                  bf16 activations, bf16 attention stats         BF16
best                  bf16 activations + int8 weight-only linears    INT8
===================  =============================================  ==========

bf16 stands in for fp16: it is the TPU-native 16-bit format (MXU inputs are
bf16); fp16 has no hardware advantage on TPU and worse dynamic range for
softmax statistics.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

import jax.numpy as jnp


class Precision(str, enum.Enum):
    """Precision rung. String-valued so configs serialize naturally."""

    FP32 = "fp32"     # everything fp32 (TRT fp32-no-plugin engine)
    MIXED = "mixed"   # bf16 matmul operands, fp32 accumulation + activations
    BF16 = "bf16"     # bf16 activations and attention statistics (TRT fp16)
    INT8 = "int8"     # BF16 + int8 weight-only linear layers (TRT "best")


@dataclass(frozen=True)
class DTypePolicy:
    """Resolved dtypes for one forward pass."""

    param_dtype: jnp.dtype      # storage dtype of weights fed to matmuls
    act_dtype: jnp.dtype        # activation dtype between layers
    attn_in_dtype: jnp.dtype    # Q/K/V operand dtype inside the kernel
    attn_stat_dtype: jnp.dtype  # online-softmax running max/sum dtype
    attn_out_dtype: jnp.dtype   # attention output dtype
    acc_dtype: jnp.dtype        # matmul accumulation (preferred_element_type)
    int8_weights: bool          # quantize linear weights to int8 + scales
    # XLA matmul precision for non-kernel ops: 'highest' forces true fp32 on
    # the MXU for the fp32-activation rungs (the default silently degrades
    # fp32 matmuls to bf16 passes); 16-bit rungs keep 'default'.
    matmul_precision: str = "default"

    @property
    def attn_fp32_stats(self) -> bool:
        return self.attn_stat_dtype == jnp.float32


_POLICIES = {
    Precision.FP32: DTypePolicy(
        param_dtype=jnp.float32,
        act_dtype=jnp.float32,
        attn_in_dtype=jnp.float32,
        attn_stat_dtype=jnp.float32,
        attn_out_dtype=jnp.float32,
        acc_dtype=jnp.float32,
        int8_weights=False,
        matmul_precision="highest",
    ),
    # The analog of the reference fp32 engine *with* the plugin: matmul
    # OPERANDS are downcast to 16-bit (the plugin casts Q/K/V fp32->fp16
    # internally, reference lightglue_attention_plugin.cpp:222-267) while
    # statistics, accumulation, activations, LayerNorm and residual carries
    # stay fp32 (attention_headdim_64_fp16in_fp32out.cu:170,551-574).
    # matmul_precision "default" = single bf16-operand MXU pass with fp32
    # accumulation; "highest" (multi-pass true fp32) is reserved for the
    # FP32 rung — this is what makes MIXED the fast-accurate rung (the
    # reference's fp32+plugin engine is only 1.16x its fp16 engine).
    Precision.MIXED: DTypePolicy(
        param_dtype=jnp.float32,
        act_dtype=jnp.float32,
        attn_in_dtype=jnp.bfloat16,
        attn_stat_dtype=jnp.float32,
        attn_out_dtype=jnp.float32,
        acc_dtype=jnp.float32,
        int8_weights=False,
        matmul_precision="default",
    ),
    # The analog of the fp16 engine: all-16-bit attention including softmax
    # statistics (reference attention_headdim_64_fp16in_fp16out.cu:556-580
    # keeps row_max/row_sum/l in fp16 and uses h2exp).
    Precision.BF16: DTypePolicy(
        param_dtype=jnp.bfloat16,
        act_dtype=jnp.bfloat16,
        attn_in_dtype=jnp.bfloat16,
        attn_stat_dtype=jnp.bfloat16,
        attn_out_dtype=jnp.bfloat16,
        acc_dtype=jnp.float32,
        int8_weights=False,
    ),
    # The analog of the "best" engine: TRT was free to pick int8 per layer;
    # here linear weights are int8 with per-output-channel scales.
    Precision.INT8: DTypePolicy(
        param_dtype=jnp.bfloat16,
        act_dtype=jnp.bfloat16,
        attn_in_dtype=jnp.bfloat16,
        attn_stat_dtype=jnp.bfloat16,
        attn_out_dtype=jnp.bfloat16,
        acc_dtype=jnp.float32,
        int8_weights=True,
    ),
}


def policy_for(precision: Precision | str) -> DTypePolicy:
    return _POLICIES[Precision(precision)]
