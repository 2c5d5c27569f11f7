#!/bin/bash
# Runs the queued chip workload in order, logging to $OUT. The relay flaps
# (observed UP 4 min then DOWN again), so availability is re-probed before
# EVERY step and a step that exits nonzero while the relay is down is
# retried once after the next recovery. Each step runs under its own
# generous timeout (fresh Mosaic compiles through the relay take minutes).
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/chip_recovery}
mkdir -p "$OUT"

probe() {
  timeout 120 python -c \
    "import jax, numpy as np; x = jax.numpy.ones((8,128)); print(float(np.asarray(x+x)[0,0]))" \
    >/dev/null 2>&1
}

wait_up() {
  until probe; do
    echo "$(date +%T) relay down, waiting..." | tee -a "$OUT/log"
    sleep 120
  done
}

run() {
  local name=$1 tmo=$2; shift 2
  for attempt in 1 2; do
    wait_up
    echo "$(date +%T) >>> $name (attempt $attempt)" | tee -a "$OUT/log"
    timeout "$tmo" "$@" >"$OUT/$name.out" 2>&1
    local rc=$?
    echo "$(date +%T) <<< $name exit=$rc" | tee -a "$OUT/log"
    [ "$rc" -eq 0 ] && return 0
    # nonzero: if the relay is still up this is a real failure — move on;
    # if it died mid-step, loop for one retry after recovery
    probe && return "$rc"
  done
}

run bench            3000 python bench.py
run cross_transposed 3000 python scripts/bench_cross_transposed.py
run attrib_sp        3000 python scripts/attrib_sp_layers.py
run tpu_suite        4800 env LGTPU_TEST_TPU=1 python -m pytest tests/ -q
echo "$(date +%T) chip queue done" | tee -a "$OUT/log"
