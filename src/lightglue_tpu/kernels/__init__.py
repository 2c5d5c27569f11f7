from lightglue_tpu.kernels.attention import flash_attention, reference_attention

__all__ = ["flash_attention", "reference_attention"]
