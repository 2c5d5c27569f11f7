"""Continuous batching of image pairs with keypoint-count buckets.

The reference processes pairs strictly serially (demo/demo_mono.cpp:211);
BASELINE.json mandates "image pairs continuously batched across hosts with
variable keypoint counts padded/bucketed". This is the host-side work queue
(SURVEY.md §2.5): pairs are routed to the queue of the smallest bucket that
fits both sides, and a fixed-size batch is dispatched to the (possibly
data-sharded) match step whenever a queue fills — so every executed program
has a static, pre-compiled shape, the XLA analog of replaying a pre-recorded
CUDA graph per shape class.

Under SPMD every host runs the same executable each step; with per-host
batchers the bucket choice is local to each host's shard, which keeps hosts
in lockstep as long as they drain queues independently (each dispatch is a
host-local program over its own data shard) — the "per-bucket queues drained
in lockstep" resolution sketched in SURVEY.md §7.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class _PairItem:
    pair_id: int
    kpts0: np.ndarray  # (N0, 2) normalized
    kpts1: np.ndarray
    desc0: np.ndarray  # (N0, E)
    desc1: np.ndarray
    n0: int
    n1: int


@dataclass
class MatchResult:
    pair_id: int
    indices: np.ndarray  # (K, 2) valid matches only
    scores: np.ndarray   # (K,)


def _addressable_rows(x) -> Dict[int, np.ndarray]:
    """{global batch row -> host row} from a sharded array's local shards."""
    rows: Dict[int, np.ndarray] = {}
    for shard in x.addressable_shards:
        start = shard.index[0].start or 0
        data = np.asarray(shard.data)
        for k in range(data.shape[0]):
            rows[start + k] = data[k]
    return rows


class ContinuousBatcher:
    """Groups pairs into per-bucket batches and dispatches fixed shapes.

    Args:
      match_fn: callable (params, kpts0, kpts1, desc0, desc1, len0, len1) ->
        (model_out, Matches); typically ``MatcherSession._match_fn(b, b)`` or
        ``parallel.make_parallel_match_fn(...)``.
      params: LightGlue parameter pytree (sharded or not).
      buckets: ascending keypoint buckets; a pair lands in the smallest
        bucket >= max(n0, n1) (one bucket for both sides keeps the number of
        compiled executables linear, not quadratic, in bucket count).
      batch_size: pairs per dispatched program; must divide by the mesh's
        data-axis size when match_fn is sharded.
    """

    def __init__(
        self,
        match_fn: Callable,
        params,
        buckets: Tuple[int, ...] = (256, 512, 1024),
        batch_size: int = 8,
        sharding=None,
    ):
        self.match_fn = match_fn
        self.params = params
        self.buckets = tuple(sorted(buckets))
        self.batch_size = batch_size
        self.sharding = sharding
        self.queues: Dict[int, List[_PairItem]] = {b: [] for b in self.buckets}
        self.results: List[MatchResult] = []
        self.dispatches = 0

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def submit(self, pair_id, kpts0, kpts1, desc0, desc1) -> None:
        n0, n1 = len(kpts0), len(kpts1)
        bucket = self._bucket_for(max(n0, n1))
        n0, n1 = min(n0, bucket), min(n1, bucket)
        self.queues[bucket].append(
            _PairItem(pair_id, kpts0[:n0], kpts1[:n1], desc0[:n0], desc1[:n1], n0, n1)
        )
        if len(self.queues[bucket]) >= self.batch_size:
            self._dispatch(bucket)

    def flush(self) -> List[MatchResult]:
        """Dispatch all partial batches (padding with replicas of the last
        pair, whose results are dropped) and return accumulated results."""
        for bucket, queue in self.queues.items():
            if queue:
                self._dispatch(bucket)
        return self.results

    def _dispatch(self, bucket: int) -> None:
        queue = self.queues[bucket]
        items = queue[: self.batch_size]
        del queue[: len(items)]
        real = len(items)
        while len(items) < self.batch_size:  # pad the batch with ballast
            items.append(items[-1])

        b = self.batch_size
        e = items[0].desc0.shape[-1]
        kpts0 = np.zeros((b, bucket, 2), np.float32)
        kpts1 = np.zeros((b, bucket, 2), np.float32)
        desc0 = np.zeros((b, bucket, e), np.float32)
        desc1 = np.zeros((b, bucket, e), np.float32)
        len0 = np.zeros((b,), np.int32)
        len1 = np.zeros((b,), np.int32)
        for i, it in enumerate(items):
            kpts0[i, : it.n0] = it.kpts0
            kpts1[i, : it.n1] = it.kpts1
            desc0[i, : it.n0] = it.desc0
            desc1[i, : it.n1] = it.desc1
            len0[i], len1[i] = it.n0, it.n1

        arrays = [kpts0, kpts1, desc0, desc1, len0, len1]
        multiprocess = jax.process_count() > 1
        if self.sharding is not None:
            shardings = self._shardings(len0.shape, kpts0.shape)
            if multiprocess:
                # cross-host lockstep: every host submitted the same pair
                # stream (deterministic dispatch order), so each host holds
                # the full global batch and materializes only the shards its
                # devices own — the SPMD feeding pattern of SURVEY.md §7
                arrays = [
                    jax.make_array_from_callback(
                        a.shape, s, lambda idx, a=a: a[idx]
                    )
                    for a, s in zip(arrays, shardings)
                ]
            else:
                arrays = [
                    jax.device_put(a, s) for a, s in zip(arrays, shardings)
                ]
        _, matches = self.match_fn(self.params, *arrays)
        self.dispatches += 1

        if self.sharding is not None and multiprocess:
            # each host post-processes the rows its devices own
            counts = _addressable_rows(matches.count)
            indices = _addressable_rows(matches.indices)
            scores = _addressable_rows(matches.scores)
            for i in range(real):
                if i in counts:
                    c = int(counts[i])
                    self.results.append(
                        MatchResult(
                            items[i].pair_id, indices[i][:c], scores[i][:c]
                        )
                    )
            return
        counts = np.asarray(matches.count)
        indices = np.asarray(matches.indices)
        scores = np.asarray(matches.scores)
        for i in range(real):
            c = int(counts[i])
            self.results.append(
                MatchResult(items[i].pair_id, indices[i, :c], scores[i, :c])
            )

    def _shardings(self, vec_shape, arr_shape):
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.sharding
        arr = NamedSharding(mesh, P("data", None, None))
        vec = NamedSharding(mesh, P("data"))
        return [arr, arr, arr, arr, vec, vec]
