"""Continuous bucketed batching over the (sharded) match step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightglue_tpu.config import LightGlueConfig, PipelineConfig, SuperPointConfig
from lightglue_tpu.parallel import make_mesh, make_parallel_match_fn, shard_lightglue_params
from lightglue_tpu.parallel.batcher import ContinuousBatcher
from lightglue_tpu.precision import Precision
from lightglue_tpu.runtime import weights
from lightglue_tpu.runtime.session import MatcherSession

BUCKETS = (64, 128)


@pytest.fixture(scope="module")
def config():
    return PipelineConfig(
        superpoint=SuperPointConfig(max_num_keypoints=128),
        lightglue=LightGlueConfig(n_layers=2),
        precision=Precision.FP32,
        buckets=BUCKETS,
        match_threshold=1e-9,
        max_matches=64,
    )


def _random_pair(rng, n0, n1):
    return (
        rng.uniform(-1, 1, (n0, 2)).astype(np.float32),
        rng.uniform(-1, 1, (n1, 2)).astype(np.float32),
        rng.standard_normal((n0, 256), dtype=np.float32),
        rng.standard_normal((n1, 256), dtype=np.float32),
    )


def test_batcher_routes_to_buckets_and_matches_serial(rng, config):
    session = MatcherSession(config=config)
    batcher = ContinuousBatcher(
        lambda params, *a: session._match_fn(a[0].shape[1], a[1].shape[1])(
            params, *a
        ),
        session.lg_params,
        buckets=BUCKETS,
        batch_size=4,
    )
    pairs = [
        _random_pair(rng, *ns)
        for ns in [(50, 60), (64, 30), (100, 120), (10, 10), (128, 90), (70, 40)]
    ]
    for i, p in enumerate(pairs):
        batcher.submit(i, *p)
    results = {r.pair_id: r for r in batcher.flush()}
    assert len(results) == len(pairs)
    assert batcher.dispatches >= 2  # two buckets were exercised

    # serial reference: run each pair alone through the session path
    for i, (k0, k1, d0, d1) in enumerate(pairs):
        bucket = config.bucket_for(max(len(k0), len(k1)))
        fn = session._match_fn(bucket, bucket)
        pk0 = np.zeros((1, bucket, 2), np.float32)
        pk1 = np.zeros((1, bucket, 2), np.float32)
        pd0 = np.zeros((1, bucket, 256), np.float32)
        pd1 = np.zeros((1, bucket, 256), np.float32)
        pk0[0, : len(k0)], pk1[0, : len(k1)] = k0, k1
        pd0[0, : len(d0)], pd1[0, : len(d1)] = d0, d1
        _, m = fn(
            session.lg_params,
            jnp.asarray(pk0), jnp.asarray(pk1),
            jnp.asarray(pd0), jnp.asarray(pd1),
            jnp.asarray([len(k0)], np.int32), jnp.asarray([len(k1)], np.int32),
        )
        c = int(m.count[0])
        got = results[i]
        assert len(got.indices) == c
        np.testing.assert_array_equal(
            got.indices, np.asarray(m.indices[0, :c])
        )


def test_batcher_on_data_parallel_mesh(rng, config):
    from conftest import require_devices

    require_devices(8)
    mesh = make_mesh(data=4, model=2)
    lg_params = shard_lightglue_params(
        weights.to_jax(weights.init_lightglue(0, config.lightglue)), mesh
    )
    fn = make_parallel_match_fn(mesh, config, 128, 128)
    batcher = ContinuousBatcher(
        fn, lg_params, buckets=(128,), batch_size=4, sharding=mesh
    )
    for i in range(10):
        batcher.submit(i, *_random_pair(rng, 100 + i, 90 + i))
    results = batcher.flush()
    assert len(results) == 10
    assert batcher.dispatches == 3  # 4 + 4 + padded 2
