"""Multi-host (pod-slice) runtime: process init, global arrays, fail-fast.

The reference is one process on one GPU (SURVEY.md §2.5); BASELINE.json
mandates scaling to multi-host TPU pod slices. The pieces:

- ``initialize``: ``jax.distributed.initialize`` wrapper (JAX's runtime
  discovers coordinator/topology from TPU environment variables on real pod
  slices; arguments override for manual setups).
- ``global_batch_from_local``: assemble a globally-sharded batch from each
  host's local pairs via ``jax.make_array_from_process_local_data`` — the
  feeding pattern for the continuous batcher: every host drains its own
  bucket queues in lockstep (same executable each step, SPMD-safe, because
  dispatch order is deterministic given the shared bucket configuration).
- ``barrier`` / fail-fast: a psum-of-ones over all devices doubles as a
  liveness check; any host failure surfaces as a collective timeout on every
  other host, so the job dies coherently rather than hanging partially
  (SURVEY.md §5: the reference has nothing to mirror — this is the minimum
  sane behavior for a fleet).

Single-host multi-device meshes need none of this — ``parallel.mesh`` alone
suffices; these helpers are no-ops in a single-process run so the same
program text serves both.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the JAX distributed runtime (no-op when single-process)."""
    if num_processes is not None and num_processes <= 1:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def global_batch_from_local(
    local_arrays: Sequence[np.ndarray],
    mesh: Mesh,
    specs: Sequence[P],
):
    """Per-host local shards -> globally-addressable sharded jax.Arrays.

    Each host passes only the rows of the batch it owns (its slice of the
    'data' axis); the returned arrays have the full global shape with this
    host contributing its addressable shards. In a single-process run this
    degrades to a plain device_put with the given sharding.
    """
    out = []
    for arr, spec in zip(local_arrays, specs):
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            out.append(jax.device_put(arr, sharding))
        else:
            global_shape = (
                arr.shape[0] * jax.process_count(),
            ) + arr.shape[1:]
            out.append(
                jax.make_array_from_process_local_data(
                    sharding, arr, global_shape
                )
            )
    return out


def barrier(mesh: Mesh) -> int:
    """All-device liveness check; returns the participating device count.

    Runs a REAL psum of per-device ones over every mesh axis (shard_map, one
    element per device): the result is data-dependent on every device's
    contribution, so if any host is dead the collective hangs/times out
    everywhere, turning partial failure into coherent whole-job failure
    (fail-fast, SURVEY.md §5). Verified in tests/test_multiprocess.py on a
    real 2-process jax.distributed run.
    """
    axes = tuple(mesh.axis_names)

    def local_count(x):
        s = jnp.sum(x)
        for ax in axes:
            s = jax.lax.psum(s, ax)
        return s

    fn = jax.jit(
        jax.shard_map(
            local_count, mesh=mesh, in_specs=P(axes), out_specs=P()
        )
    )
    sharding = NamedSharding(mesh, P(axes))
    host_ones = np.ones((mesh.size,), np.int32)
    if jax.process_count() == 1:
        ones = jax.device_put(host_ones, sharding)
    else:  # each process materializes only its addressable shards
        ones = jax.make_array_from_callback(
            (mesh.size,), sharding, lambda idx: host_ones[idx]
        )
    return int(np.asarray(fn(ones)))
