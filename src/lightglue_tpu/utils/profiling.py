"""Tracing / profiling utilities (SURVEY.md §5 auxiliary subsystems).

The reference's observability is cudaEvent brackets in the demo loop
(demo/demo_mono.cpp:194-200) plus trtexec latency histograms; the TPU
equivalents are ``jax.profiler`` device traces (viewable in
TensorBoard/Perfetto) and the wall-clock section timer below. For
device-true latency free of dispatch overhead use the two-point in-jit-loop
method in bench.py.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List

import jax


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA device trace: ``with device_trace('/tmp/trace'): ...``
    then inspect in TensorBoard's profile plugin or Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SectionTimer:
    """Named wall-clock sections with mean/p50/p95 summaries — the cudaEvent
    bracket analog. Blocks on device results so a section covers real work.
    """

    def __init__(self) -> None:
        self.samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append((time.perf_counter() - t0) * 1e3)

    def block(self, tree) -> None:
        jax.block_until_ready(tree)

    def summary(self) -> Dict[str, Dict[str, float]]:
        import numpy as np

        out = {}
        for name, vals in self.samples.items():
            arr = np.asarray(vals)
            out[name] = {
                "count": int(arr.size),
                "mean_ms": float(arr.mean()),
                "p50_ms": float(np.percentile(arr, 50)),
                "p95_ms": float(np.percentile(arr, 95)),
                "min_ms": float(arr.min()),
            }
        return out

    def report(self) -> str:
        lines = []
        for name, s in self.summary().items():
            lines.append(
                f"{name:24s} n={s['count']:4d} mean {s['mean_ms']:8.3f} ms  "
                f"p50 {s['p50_ms']:8.3f}  p95 {s['p95_ms']:8.3f}"
            )
        return "\n".join(lines)
