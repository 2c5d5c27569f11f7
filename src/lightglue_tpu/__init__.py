"""lightglue_tpu — a TPU-native low-precision inference engine for the
SuperPoint + LightGlue image-matching pipeline.

Built from scratch in JAX / XLA / Pallas with the capabilities of the
reference CUDA/TensorRT engine (qdLMF/LightGlue-with-FlashAttentionV2-TensorRT):

- ``kernels.attention``   — fused online-softmax FlashAttention-2 Pallas kernel
  (head-dim 64; bf16-stat and fp32-stat accumulation policies) replacing the
  reference's hand-written CUTLASS/CuTe TensorRT plugin
  (reference: lightglue_attention_plugin/attention_headdim_64_*.cu).
- ``models``              — SuperPoint detector/descriptor CNN and the LightGlue
  9-layer transformer matcher as pure-pytree JAX functions
  (reference: lightglue_pytorch_with_plugin/{superpoint,lightglue}.py).
- ``pipeline``            — device-side keypoint extraction (NMS, top-k,
  bilinear descriptor sampling) and mutual-nearest-neighbor match filtering
  with static shapes (reference: demo/{superpoint_mono_trt,lightglue_trt}.cpp
  PostProcess).
- ``precision``           — the fp32 / bf16 / bf16-fp32acc / int8-weight-only
  precision ladder mirroring the reference's fp32 / fp16 / best TRT engines.
- ``runtime``             — bucketed AOT compile cache (the XLA analog of
  CUDA-graph record/replay), weight loading/conversion.
- ``parallel``            — device-mesh sharding for multi-chip / multi-host
  serving (no counterpart in the single-GPU reference).
"""

from lightglue_tpu.config import PipelineConfig, LightGlueConfig, SuperPointConfig
from lightglue_tpu.precision import Precision

__version__ = "0.1.0"

__all__ = [
    "PipelineConfig",
    "LightGlueConfig",
    "SuperPointConfig",
    "Precision",
    "__version__",
]
