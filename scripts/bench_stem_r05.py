"""Chip A/B: conv1b offset-stem variants (VERDICT r4 next #8).

The conv1b offset stem is the last >0.1 ms item in the extract path
(0.34 ms at ~66 TF, golden/chip_r04/attrib_sp_layers.out). Variants, each
in its own subprocess (trace-time env flags; shared persistent compile
cache):

- baseline                     — r4 shipped configuration
- LGTPU_CONV_EPI16=1           — bf16 shifted-add epilogue (halved
                                 accumulator epilogue bytes, +1 bf16 round)
- LGTPU_CONV_ROWS in {16, 48, 96} — strip-height sweep (DMA amortization vs
                                 VMEM pressure; default picks 32). NOTE the
                                 override only applies to conv layers whose
                                 strip height it divides (conv._pick_rows):
                                 96 -> h=480 only, 48/16 -> h=480 and 240;
                                 deeper layers keep their defaults. The
                                 TARGET layer (conv1b at h=480) is covered
                                 by every value, but a delta is attributable
                                 to the stem, not the whole encoder.

Metric: bench.bench_superpoint (full SuperPoint forward + fused extraction,
480x640 bf16 — the production path). Keep the winner beyond spread,
retire the rest with this artifact as the ledger entry.

Run: PYTHONPATH=src python scripts/bench_stem_r05.py
"""

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

_CHILD = r"""
import json, sys
sys.path.insert(0, {root_src!r})
sys.path.insert(0, {root!r})
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import bench
from lightglue_tpu.precision import Precision

res = bench.bench_superpoint(Precision.BF16)
print("CHILD_RESULT " + json.dumps(res))
"""


def run_variant(label, extra_env):
    env = dict(os.environ, **extra_env)
    src = _CHILD.format(root_src=str(ROOT / "src"), root=str(ROOT))
    r = subprocess.run(
        [sys.executable, "-c", src],
        env=env, capture_output=True, text=True, timeout=2400,
    )
    for line in r.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            res = json.loads(line[len("CHILD_RESULT "):])
            print(f"{label:28s} {json.dumps(res)}", flush=True)
            return res
    print(f"{label}: FAILED rc={r.returncode}", flush=True)
    print(r.stderr[-1500:], file=sys.stderr)
    return None


def main():
    run_variant("baseline", {})
    run_variant("epi16", {"LGTPU_CONV_EPI16": "1"})
    for rows in (16, 48, 96):
        run_variant(f"rows{rows}", {"LGTPU_CONV_ROWS": str(rows)})


if __name__ == "__main__":
    main()
