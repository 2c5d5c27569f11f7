"""Multi-device sharding tests on the simulated 8-CPU mesh (SURVEY.md §4d).

Verifies that data-parallel + tensor-parallel execution is numerically
identical to the single-device path — the distribution layer the single-GPU
reference never had (SURVEY.md §2.5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightglue_tpu.config import LightGlueConfig, PipelineConfig, SuperPointConfig
from lightglue_tpu.models import lightglue as lg
from lightglue_tpu.parallel import (
    make_mesh,
    make_parallel_extract_fn,
    make_parallel_match_fn,
    shard_lightglue_params,
)
from lightglue_tpu.precision import Precision, policy_for
from lightglue_tpu.runtime import weights

N_LAYERS = 2
BUCKET = 128


@pytest.fixture(scope="module")
def config():
    return PipelineConfig(
        superpoint=SuperPointConfig(max_num_keypoints=BUCKET),
        lightglue=LightGlueConfig(n_layers=N_LAYERS),
        precision=Precision.FP32,
        buckets=(BUCKET,),
        match_threshold=1e-6,
        max_matches=BUCKET,
    )


@pytest.fixture(scope="module")
def lg_params(config):
    return weights.to_jax(weights.init_lightglue(0, config.lightglue))


def _pair_batch(rng, b, n):
    return (
        jnp.asarray(rng.uniform(-1, 1, (b, n, 2)).astype(np.float32)),
        jnp.asarray(rng.uniform(-1, 1, (b, n, 2)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((b, n, 256), dtype=np.float32)),
        jnp.asarray(rng.standard_normal((b, n, 256), dtype=np.float32)),
        jnp.full((b,), n - 7, jnp.int32),
        jnp.full((b,), n - 3, jnp.int32),
    )


def _single_device_reference(lg_params, config, args):
    out = lg.forward(
        *(lg_params,) + args[:4],
        args[4],
        args[5],
        config=config.lightglue,
        policy=policy_for(config.precision),
    )
    return out


@pytest.mark.parametrize("data,model", [(8, 1), (4, 2), (2, 4), (1, 1)])
def test_sharded_match_equals_single_device(rng, config, lg_params, data, model):
    from conftest import require_devices

    require_devices(data * model)
    mesh = make_mesh(data=data, model=model, devices=jax.devices()[: data * model])
    params_sharded = shard_lightglue_params(lg_params, mesh)
    args = _pair_batch(rng, max(data, 2), BUCKET)

    fn = make_parallel_match_fn(mesh, config, BUCKET, BUCKET)
    out, matches = fn(params_sharded, *args)

    ref = _single_device_reference(lg_params, config, args)
    np.testing.assert_allclose(
        np.asarray(out.scores), np.asarray(ref.scores), atol=2e-4, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.desc0), np.asarray(ref.desc0), atol=2e-4, rtol=2e-4
    )


def test_parallel_extract_sharded_batch(rng, config):
    from conftest import require_devices

    require_devices(8)
    sp_params = weights.to_jax(weights.init_superpoint(0, config.superpoint))
    mesh = make_mesh(data=4, model=2)
    fn = make_parallel_extract_fn(mesh, config)
    images = jnp.asarray(rng.random((4, 64, 64, 1), dtype=np.float32))
    ext = fn(sp_params, images)
    assert ext.keypoints.shape == (4, BUCKET, 2)
    assert ext.descriptors.shape == (4, BUCKET, 256)
    # batch elements are independent: permuting inputs permutes outputs
    ext_perm = fn(sp_params, images[::-1])
    np.testing.assert_allclose(
        np.asarray(ext.scores[::-1]), np.asarray(ext_perm.scores), rtol=1e-5
    )


def test_multihost_helpers_single_process(rng, config):
    """Multi-host helpers degrade gracefully in a single process."""
    from conftest import require_devices
    from jax.sharding import PartitionSpec as P

    from lightglue_tpu.parallel import multihost

    require_devices(8)
    multihost.initialize(num_processes=1)  # no-op
    assert not multihost.is_multiprocess()
    mesh = make_mesh(data=4, model=2)
    arrs = multihost.global_batch_from_local(
        [np.zeros((4, 8, 2), np.float32), np.zeros((4,), np.int32)],
        mesh,
        [P("data", None, None), P("data")],
    )
    assert arrs[0].shape == (4, 8, 2)
    assert multihost.barrier(mesh) == 8
