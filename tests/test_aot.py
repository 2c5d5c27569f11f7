"""AOT export (StableHLO artifacts) + persistent compile cache."""

import numpy as np
import jax.numpy as jnp
import pytest

from lightglue_tpu.config import LightGlueConfig, PipelineConfig, SuperPointConfig
from lightglue_tpu.precision import Precision
from lightglue_tpu.runtime import aot
from lightglue_tpu.runtime.session import MatcherSession


@pytest.fixture(scope="module")
def session():
    config = PipelineConfig(
        superpoint=SuperPointConfig(max_num_keypoints=64),
        lightglue=LightGlueConfig(n_layers=2),
        precision=Precision.FP32,
        buckets=(64,),
        match_threshold=1e-9,
        max_matches=64,
    )
    return MatcherSession(config=config)


def test_export_and_reload_produces_identical_scores(session, tmp_path, rng):
    paths = aot.export_matcher(session, str(tmp_path))
    assert (64, 64) in paths

    args = (
        session.lg_params,
        jnp.asarray(rng.uniform(-1, 1, (1, 64, 2)).astype(np.float32)),
        jnp.asarray(rng.uniform(-1, 1, (1, 64, 2)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((1, 64, 256), dtype=np.float32)),
        jnp.asarray(rng.standard_normal((1, 64, 256), dtype=np.float32)),
        jnp.full((1,), 64, jnp.int32),
        jnp.full((1,), 64, jnp.int32),
    )
    live_out, live_matches = session._match_fn(64, 64)(*args)
    reloaded = aot.load_exported(paths[(64, 64)])
    re_out, re_matches = reloaded(*args)
    np.testing.assert_allclose(
        np.asarray(live_out.scores), np.asarray(re_out[2]), atol=1e-6
    ) if not hasattr(re_out, "scores") else None
    # deserialized call returns the same pytree structure
    scores = re_out.scores if hasattr(re_out, "scores") else re_out[2]
    np.testing.assert_allclose(
        np.asarray(live_out.scores), np.asarray(scores), atol=1e-6
    )


def test_compile_cache_enable(tmp_path):
    aot.enable_compile_cache(str(tmp_path / "cache"))
    assert (tmp_path / "cache").exists()


def test_export_batch4_and_extractor(session, tmp_path, rng):
    """batch>1 matcher export + the extraction-step export (the
    superpoint.engine analog) reload in-process."""
    paths = aot.export_matcher(session, str(tmp_path), batch=4)
    args = (
        session.lg_params,
        jnp.asarray(rng.uniform(-1, 1, (4, 64, 2)).astype(np.float32)),
        jnp.asarray(rng.uniform(-1, 1, (4, 64, 2)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((4, 64, 256), dtype=np.float32)),
        jnp.asarray(rng.standard_normal((4, 64, 256), dtype=np.float32)),
        jnp.full((4,), 64, jnp.int32),
        jnp.full((4,), 64, jnp.int32),
    )
    live_out, _ = session._match_fn(64, 64)(*args)
    re_out, _ = aot.load_exported(paths[(64, 64)])(*args)
    scores = re_out.scores if hasattr(re_out, "scores") else re_out[2]
    np.testing.assert_allclose(
        np.asarray(live_out.scores), np.asarray(scores), atol=1e-6
    )

    epath = aot.export_extractor(session, str(tmp_path), (32, 48), batch=1)
    image = jnp.asarray(rng.random((1, 32, 48, 1)).astype(np.float32))
    live = session.extract(np.asarray(image))
    re_ext = aot.load_exported(epath)(session.sp_params, image)
    kpts = re_ext.keypoints if hasattr(re_ext, "keypoints") else re_ext[0]
    np.testing.assert_allclose(
        np.asarray(live.keypoints), np.asarray(kpts), atol=1e-6
    )


@pytest.mark.skipif(
    __import__("os").environ.get("LGTPU_TEST_TPU") != "1",
    reason="TPU round-trip runs with LGTPU_TEST_TPU=1",
)
def test_tpu_roundtrip_fresh_process(tmp_path):
    """Export on the REAL chip (Mosaic custom calls baked into the
    artifact), then reload + execute in a FRESH process — the actual
    engine-file serialize/load cycle the reference ships
    (demo/superpoint_mono_trt.cpp:13-20). The pytest process itself stays
    on CPU; both phases run sequentially in TPU subprocesses."""
    import subprocess
    import sys
    from pathlib import Path as _P

    script = _P(__file__).parent.parent / "scripts" / "aot_roundtrip.py"
    env = dict(__import__("os").environ)
    env.pop("JAX_PLATFORMS", None)  # subprocesses take the default (TPU)
    for phase, marker in (("export", "EXPORT OK"), ("reload", "AOT_ROUNDTRIP OK")):
        r = subprocess.run(
            [sys.executable, str(script), phase, str(tmp_path)],
            capture_output=True,
            text=True,
            timeout=1800,
            env=env,
        )
        assert r.returncode == 0, f"{phase} failed:\n{r.stdout}\n{r.stderr}"
        assert marker in r.stdout, f"{phase} output:\n{r.stdout}"
        print(f"[aot-roundtrip] {phase}: " + r.stdout.strip().splitlines()[-1])
