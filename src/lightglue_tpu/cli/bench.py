"""trtexec-equivalent benchmark CLI (reference steps.txt:50-227 recipes).

Reports per-config latency/throughput with warmup + repeated timed runs,
using the two-point in-jit-loop methodology from the repo-root bench.py
(which is the driver-facing single-line variant of this tool).

Usage examples:
  python -m lightglue_tpu.cli.bench --model lightglue --precision bf16 \
      --kpts 1024 --batch 1
  python -m lightglue_tpu.cli.bench --model superpoint --height 480 --width 640
  python -m lightglue_tpu.cli.bench --all
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[3]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", choices=["lightglue", "superpoint"],
                   default="lightglue")
    p.add_argument("--precision", default="bf16",
                   choices=["fp32", "mixed", "bf16", "int8"])
    p.add_argument("--kpts", type=int, default=1024)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--all", action="store_true",
                   help="run the full precision x model matrix")
    return p.parse_args()


def main():
    args = parse_args()
    import bench as bench_mod  # repo-root harness
    from lightglue_tpu.precision import Precision

    results = {}
    if args.all:
        for prec in ("fp32", "mixed", "bf16", "int8"):
            st = bench_mod.bench_lightglue(Precision(prec), args.kpts, args.batch)
            results[f"lightglue_{prec}_{args.batch}x{args.kpts}_ms"] = st
            ms = st["p50"]
            print(f"lightglue {prec:5s} {args.batch}x{args.kpts}: {ms:.3f} ms "
                  f"+-{st['spread_pct']:.1f}% ({1e3 / ms * args.batch:.1f} pairs/s)")
        st = bench_mod.bench_superpoint(
            Precision.BF16, args.height, args.width
        )
        results["superpoint_bf16_ms"] = st
        print(f"superpoint bf16 {args.height}x{args.width}: {st['p50']:.3f} ms "
              f"+-{st['spread_pct']:.1f}%")
    elif args.model == "lightglue":
        st = bench_mod.bench_lightglue(
            Precision(args.precision), args.kpts, args.batch
        )
        results[f"lightglue_{args.precision}_ms"] = st
        ms = st["p50"]
        print(
            f"lightglue {args.precision} {args.batch}x{args.kpts}x{args.kpts}: "
            f"{ms:.3f} ms/step +-{st['spread_pct']:.1f}% "
            f"({1e3 / ms * args.batch:.1f} pairs/s)"
        )
    else:
        st = bench_mod.bench_superpoint(
            Precision(args.precision), args.height, args.width
        )
        results["superpoint_ms"] = st
        print(
            f"superpoint {args.precision} {args.height}x{args.width}: "
            f"{st['p50']:.3f} ms +-{st['spread_pct']:.1f}% "
            f"({1e3 / st['p50']:.1f} images/s)"
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
