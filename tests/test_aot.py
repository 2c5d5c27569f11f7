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
