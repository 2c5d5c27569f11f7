"""Worker process for test_multiprocess.py: a REAL multi-process
jax.distributed run on CPU devices.

Each worker owns 2 virtual CPU devices; N workers form a 2N-device global
mesh via a localhost coordinator. The worker:

1. initializes the distributed runtime (multihost.initialize),
2. runs the psum `barrier` and checks it counts every device in the fleet,
3. feeds its LOCAL shard of a deterministic global batch through
   `global_batch_from_local` + `make_parallel_match_fn` (data-parallel
   shard_map over all processes),
4. compares its addressable output shards against a single-device reference
   forward of the same (deterministically regenerated) global batch,
5. drains a ContinuousBatcher over the sharded match fn to exercise
   cross-host lockstep dispatch.

Invoked as:  python multiprocess_worker.py <process_id> <num_processes> <port>
Prints "WORKER<i> OK" on success; any assertion kills the exit code.
"""

import os
import sys

proc_id = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

from lightglue_tpu.config import LightGlueConfig, PipelineConfig
from lightglue_tpu.models import lightglue
from lightglue_tpu.parallel import mesh as mesh_lib
from lightglue_tpu.parallel import multihost
from lightglue_tpu.parallel.batcher import ContinuousBatcher
from lightglue_tpu.precision import Precision, policy_for
from lightglue_tpu.runtime import weights

multihost.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=proc_id,
)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 2 * nproc, jax.device_count()
assert multihost.is_multiprocess() == (nproc > 1)

mesh = mesh_lib.make_mesh(data=2 * nproc, model=1)

# 1. fail-fast barrier: a real psum over every device in the fleet
count = multihost.barrier(mesh)
assert count == 2 * nproc, f"barrier counted {count} devices"

# 2. deterministic global batch, sharded from per-process local rows
N, B = 64, 2 * nproc  # one pair per device
config = PipelineConfig(
    lightglue=LightGlueConfig(n_layers=2),
    precision=Precision.FP32,
    buckets=(N,),
    match_threshold=0.0,
    max_matches=N,
)
policy = policy_for(config.precision)
params_np = weights.init_lightglue(0, config.lightglue)
params = weights.to_jax(params_np)
params = mesh_lib.shard_lightglue_params(params, mesh)

rng = np.random.default_rng(42)  # every process regenerates the SAME batch
kpts0 = rng.uniform(-1, 1, (B, N, 2)).astype(np.float32)
kpts1 = rng.uniform(-1, 1, (B, N, 2)).astype(np.float32)
desc0 = rng.standard_normal((B, N, 256)).astype(np.float32)
desc1 = rng.standard_normal((B, N, 256)).astype(np.float32)
lens = np.full((B,), N, np.int32)

rows = slice(2 * proc_id, 2 * proc_id + 2)  # this process's data rows
local = [kpts0[rows], kpts1[rows], desc0[rows], desc1[rows],
         lens[rows], lens[rows]]
specs = [P("data", None, None)] * 4 + [P("data")] * 2
gargs = multihost.global_batch_from_local(local, mesh, specs)

match_fn = mesh_lib.make_parallel_match_fn(mesh, config, N, N)
out, matches = match_fn(params, *gargs)

# 3. single-device reference on the full batch (regenerated locally)
ref = lightglue.forward(
    weights.to_jax(params_np),
    jnp.asarray(kpts0), jnp.asarray(kpts1),
    jnp.asarray(desc0), jnp.asarray(desc1),
    jnp.asarray(lens), jnp.asarray(lens),
    config=config.lightglue, policy=policy,
)

# compare only this process's addressable shards of the global output
for shard in out.scores.addressable_shards:
    row0 = shard.index[0].start or 0
    got = np.asarray(shard.data)
    want = np.asarray(ref.scores[row0 : row0 + got.shape[0]])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

# 4. continuous batcher drains through the sharded step in lockstep:
# every process submits the same global pair stream (deterministic order);
# each host materializes only its addressable input shards and
# post-processes only the result rows its devices own
batcher = ContinuousBatcher(
    match_fn, params, buckets=(N,), batch_size=B,
    sharding=mesh,
)
for pid in range(B):
    batcher.submit(pid, kpts0[pid], kpts1[pid], desc0[pid], desc1[pid])
results = batcher.flush()
assert len(results) == B // nproc, (len(results), B, nproc)
assert batcher.dispatches >= 1
# this host's result rows are exactly its data-axis rows
assert sorted(r.pair_id for r in results) == list(range(2 * proc_id, 2 * proc_id + 2))

print(f"WORKER{proc_id} OK barrier={count} pairs={len(results)}", flush=True)
