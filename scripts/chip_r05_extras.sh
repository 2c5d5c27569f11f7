#!/bin/bash
# Round-5 A/B chip queue: waits for the base chip_recovery queue to finish
# (so the two never contend for the one chip), then runs the r5-specific
# experiments. Same evidence policy as chip_recovery.sh: per-attempt files,
# copied into golden/chip_r05/ at the end.
set -u
cd "$(dirname "$0")/.."
# chip_recovery.sh logs to $OUT/log with OUT defaulting to
# /tmp/chip_recovery — check both the per-round and default locations so a
# defaults-launched base queue is still detected
BASE_LOGS=${BASE_LOG:-"/tmp/chip_recovery_r05/log /tmp/chip_recovery/log"}
OUT=${OUT:-/tmp/chip_r05_extras}
mkdir -p "$OUT"

echo "$(date +%T) waiting for base queue ($BASE_LOGS)" | tee -a "$OUT/log"
until grep -q "chip queue done" $BASE_LOGS 2>/dev/null; do
  sleep 60
done
echo "$(date +%T) base queue done; starting extras" | tee -a "$OUT/log"

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
    timeout "$tmo" "$@" >"$OUT/$name.$attempt.out" 2>&1
    local rc=$?
    echo "$(date +%T) <<< $name exit=$rc" | tee -a "$OUT/log"
    cp -f "$OUT/$name.$attempt.out" "$OUT/$name.out"
    [ "$rc" -eq 0 ] && return 0
    probe && return "$rc"
  done
}

run oddwidth    1800 python scripts/chip_oddwidth.py
run ring_local  2400 python scripts/bench_ring_local.py
run stem_ab     4800 python scripts/bench_stem_r05.py
run w8a8_ab     4800 python scripts/bench_w8a8.py
echo "$(date +%T) extras queue done" | tee -a "$OUT/log"

DEST="golden/chip_r05"
mkdir -p "$DEST"
cp -f "$OUT"/*.out "$OUT"/log "$DEST"/ 2>/dev/null
echo "$(date +%T) evidence copied to $DEST (commit it)" | tee -a "$OUT/log"
