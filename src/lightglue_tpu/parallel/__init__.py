from lightglue_tpu.parallel.mesh import (
    AXIS_DATA,
    AXIS_MODEL,
    lightglue_param_specs,
    make_mesh,
    make_parallel_match_fn,
    make_parallel_extract_fn,
    shard_lightglue_params,
)

__all__ = [
    "AXIS_DATA",
    "AXIS_MODEL",
    "make_mesh",
    "lightglue_param_specs",
    "shard_lightglue_params",
    "make_parallel_match_fn",
    "make_parallel_extract_fn",
]
