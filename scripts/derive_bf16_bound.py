"""Derive the dryrun's bf16 sharded-vs-single gate from measured error growth.

VERDICT r4 weak #5 / next #9: the multichip dryrun gated bf16 scores at a
magic 0.3 ("because it passes"). The divergence is real and benign — the
sharded step runs per-block TP kernels while the single-device step runs
the whole-stack megakernel, and bf16 rounding differs between the two
lowerings — but the gate should be a DERIVED bound. This measures the
max |scores_sharded - scores_single| as a function of transformer depth
(layers 1..9, the SAME 9-layer weight tree sliced, identical inputs on the
simulated 8-CPU mesh with the dryrun's data x model sharding) and prints
the curve; the dryrun gate is set to 2x the layer-9 envelope and cites the
committed artifact (golden/bf16_layer_err_r05.txt).

Run: python scripts/derive_bf16_bound.py  (forces CPU; needs no chip)
"""

import os
import sys
from pathlib import Path

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from lightglue_tpu.config import LightGlueConfig, PipelineConfig
from lightglue_tpu.models import lightglue
from lightglue_tpu.parallel import (
    make_mesh,
    make_parallel_match_fn,
    shard_lightglue_params,
)
from lightglue_tpu.precision import Precision, policy_for
from lightglue_tpu.runtime import weights


def slice_layers(params, n_keep):
    out = dict(params)
    out["layers"] = jax.tree.map(lambda a: a[:n_keep], params["layers"])
    out["token"] = jax.tree.map(
        lambda a: a[: max(n_keep - 1, 1)], params["token"]
    )
    out["assign"] = jax.tree.map(lambda a: a[:n_keep], params["assign"])
    return out


def main():
    bucket, batch = 128, 8
    full = weights.init_lightglue(0, LightGlueConfig(n_layers=9))
    rng = np.random.default_rng(0)
    kpts0 = jnp.asarray(
        rng.uniform(-1, 1, (batch, bucket, 2)).astype(np.float32)
    )
    kpts1 = jnp.asarray(
        rng.uniform(-1, 1, (batch, bucket, 2)).astype(np.float32)
    )
    d0 = jnp.asarray(
        rng.standard_normal((batch, bucket, 256), dtype=np.float32),
        jnp.bfloat16,
    )
    d1 = jnp.asarray(
        rng.standard_normal((batch, bucket, 256), dtype=np.float32),
        jnp.bfloat16,
    )
    lens0 = jnp.full((batch,), bucket - 5, jnp.int32)
    lens1 = jnp.full((batch,), bucket - 9, jnp.int32)
    mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])
    policy = policy_for(Precision.BF16)

    print("layers  max|sharded - single|  (bf16, data=4 x model=2 mesh)")
    errs = []
    for n_layers in range(1, 10):
        p = slice_layers(full, n_layers)
        config = PipelineConfig(
            lightglue=LightGlueConfig(n_layers=n_layers),
            precision=Precision.BF16,
            buckets=(bucket,),
            max_matches=bucket,
        )
        sharded_params = shard_lightglue_params(weights.to_jax(p), mesh)
        match = make_parallel_match_fn(mesh, config, bucket, bucket)
        out, _ = match(
            sharded_params, kpts0, kpts1, d0, d1, lens0, lens1
        )
        ref = lightglue.forward(
            weights.to_jax(p, policy.param_dtype),
            kpts0, kpts1, d0, d1, lens0, lens1,
            config=config.lightglue, policy=policy,
        )
        err = float(
            jnp.max(
                jnp.abs(
                    out.scores.astype(jnp.float32)
                    - ref.scores.astype(jnp.float32)
                )
            )
        )
        errs.append(err)
        print(f"{n_layers:6d}  {err:.4f}")
    print(
        f"layer-9 envelope: {errs[-1]:.4f}; derived dryrun gate "
        f"(2x envelope): {2 * errs[-1]:.4f}"
    )


if __name__ == "__main__":
    main()
