#!/bin/bash
# Final-bench chain: waits for the r5 extras queue, then runs the
# driver-facing bench TWICE on the final tree (first run warms the
# persistent compile cache for the driver's round-end capture; second run
# is the reproduce-within-spread evidence). Evidence into golden/chip_r05/.
set -u
cd "$(dirname "$0")/.."
EXTRAS_LOG=${EXTRAS_LOG:-/tmp/chip_r05_extras/log}
OUT=${OUT:-/tmp/chip_r05_bench}
mkdir -p "$OUT"

echo "$(date +%T) waiting for extras queue ($EXTRAS_LOG)" | tee -a "$OUT/log"
until grep -q "extras queue done" "$EXTRAS_LOG" 2>/dev/null; do
  sleep 60
done
echo "$(date +%T) extras done; final bench runs" | tee -a "$OUT/log"

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
  for attempt in 1 2 3; do
    wait_up
    echo "$(date +%T) >>> $name (attempt $attempt)" | tee -a "$OUT/log"
    timeout "$tmo" "$@" >"$OUT/$name.$attempt.out" 2>&1
    local rc=$?
    echo "$(date +%T) <<< $name exit=$rc" | tee -a "$OUT/log"
    cp -f "$OUT/$name.$attempt.out" "$OUT/$name.out"
    [ "$rc" -eq 0 ] && return 0
  done
}

run bench_final  5400 python bench.py
RC1=$?
run bench_final2 3600 python bench.py
RC2=$?
echo "$(date +%T) final bench chain done (rc $RC1/$RC2)" | tee -a "$OUT/log"

# only promote artifacts whose run actually succeeded — a truncated
# last-attempt output must never be committed as round evidence
DEST="golden/chip_r05"
mkdir -p "$DEST"
cp -f "$OUT"/bench_final*.out "$OUT"/log "$DEST"/ 2>/dev/null
[ "$RC1" -eq 0 ] && cp -f "$OUT"/bench_final.out "$DEST"/bench.out
[ "$RC2" -eq 0 ] && cp -f "$OUT"/bench_final2.out "$DEST"/bench2.out
if [ "$RC1" -ne 0 ] || [ "$RC2" -ne 0 ]; then
  echo "$(date +%T) WARNING: a bench run FAILED — inspect before committing"     | tee -a "$OUT/log"
fi
echo "$(date +%T) evidence copied to $DEST (commit it)" | tee -a "$OUT/log"
