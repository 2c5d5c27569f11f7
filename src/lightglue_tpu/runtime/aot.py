"""Ahead-of-time export and compile-cache persistence — the analog of the
reference's engine build step.

The reference's deployment artifact chain is ONNX -> trtexec -> serialized
``.engine`` files reloaded at startup (steps.txt:29-227,
demo/superpoint_mono_trt.cpp:13-20). The JAX-native equivalents, both here:

- ``export_matcher`` / ``load_exported``: portable StableHLO serialization
  of the per-bucket match step via ``jax.export`` (the ONNX analog — a
  self-contained graph artifact, reloadable without the model code);
- ``enable_compile_cache``: XLA persistent compilation cache (the .engine
  analog — byte-identical programs skip compilation entirely on reload).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from lightglue_tpu.models.lightglue import AdaptiveOutput, LightGlueOutput
from lightglue_tpu.pipeline.extract import Extraction
from lightglue_tpu.pipeline.match import Matches

for _nt in (LightGlueOutput, AdaptiveOutput, Extraction, Matches):
    try:
        jax_export.register_namedtuple_serialization(
            _nt, serialized_name=f"lightglue_tpu.{_nt.__name__}"
        )
    except ValueError:
        pass  # already registered (repeated import)


def enable_compile_cache(cache_dir: str) -> None:
    """Persist compiled executables across processes (engine-file analog)."""
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def export_matcher(
    session, out_dir: str, batch: int = 1, pairs=None
) -> Dict[Tuple[int, int], str]:
    """Serialize the match step per bucket pair to StableHLO.

    ``pairs``: iterable of (bucket0, bucket1); default is the ladder
    diagonal (the full cross product is len(buckets)^2 artifacts with the
    128-step ladder — pass "all" to export every combination).

    Returns {bucket_pair: file_path}. Artifacts embed the weights as
    constants? No — weights stay an argument, so one artifact serves any
    checkpoint with the same shapes (unlike TRT engines, which bake weights).

    NOTE: the artifact embeds the lowering for the platform it was exported
    on — a CPU export bakes in the *interpret-mode* Pallas kernels and a TPU
    export bakes the Mosaic custom calls; export on the platform you will
    serve on (tests/test_aot.py covers the TPU round-trip under
    LGTPU_TEST_TPU=1, including a fresh-process reload via
    scripts/aot_reload_check.py).
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = {}
    if pairs is None:
        pairs = [(b, b) for b in session.config.buckets]
    elif pairs == "all":
        pairs = [
            (b0, b1)
            for b0 in session.config.buckets
            for b1 in session.config.buckets
        ]
    for b0, b1 in pairs:
        fn = session._match_fn(b0, b1)
        args = (
            session.lg_params,
            jnp.zeros((batch, b0, 2), jnp.float32),
            jnp.zeros((batch, b1, 2), jnp.float32),
            jnp.zeros((batch, b0, 256), jnp.float32),
            jnp.zeros((batch, b1, 256), jnp.float32),
            jnp.zeros((batch,), jnp.int32),
            jnp.zeros((batch,), jnp.int32),
        )
        exported = jax_export.export(fn)(*args)
        path = out / f"match_{b0}x{b1}_b{batch}.stablehlo"
        path.write_bytes(exported.serialize())
        paths[(b0, b1)] = str(path)
    return paths


def export_extractor(
    session, out_dir: str, image_hw: Tuple[int, int], batch: int = 1
) -> str:
    """Serialize the SuperPoint + extraction step (the superpoint.engine
    analog) for a fixed image shape. Returns the artifact path."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    h, w = image_hw
    fn = session._extract_fn(batch, h, w)
    args = (session.sp_params, jnp.zeros((batch, h, w, 1), jnp.float32))
    exported = jax_export.export(fn)(*args)
    path = out / f"extract_{h}x{w}_b{batch}.stablehlo"
    path.write_bytes(exported.serialize())
    return str(path)


def load_exported(path: str):
    """Deserialize a StableHLO artifact into a callable (compiles on first
    call; pair with ``enable_compile_cache`` to skip even that)."""
    data = Path(path).read_bytes()
    exported = jax_export.deserialize(data)
    return jax.jit(exported.call)
