from lightglue_tpu.models import lightglue, superpoint

__all__ = ["lightglue", "superpoint"]
