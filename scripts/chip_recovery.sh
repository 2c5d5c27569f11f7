#!/bin/bash
# Runs the queued chip workload in order, logging to $OUT. The relay flaps
# (observed UP 4 min then DOWN again), so availability is re-probed before
# EVERY step and a step that exits nonzero while the relay is down is
# retried once after the next recovery. Each step runs under its own
# generous timeout (fresh Mosaic compiles through the relay take minutes).
#
# Evidence policy: every attempt writes its own file ($name.$attempt.out —
# a retry must not destroy the record of what failed mid-outage) and the
# whole $OUT directory is copied into golden/chip_r$ROUND/ at the end so
# chip runs survive the session (the analog of the reference checking in
# trt_engine_files/*.engine.txt).
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/chip_recovery}
ROUND=${ROUND:-}
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
    timeout "$tmo" "$@" >"$OUT/$name.$attempt.out" 2>&1
    local rc=$?
    echo "$(date +%T) <<< $name exit=$rc" | tee -a "$OUT/log"
    # keep a stable un-suffixed name pointing at the LAST attempt
    cp -f "$OUT/$name.$attempt.out" "$OUT/$name.out"
    [ "$rc" -eq 0 ] && return 0
    # nonzero: if the relay is still up this is a real failure — move on;
    # if it died mid-step, loop for one retry after recovery
    probe && return "$rc"
  done
}

run bench            3000 python bench.py
run attrib_extract   2400 python scripts/attrib_extract.py
run tpu_suite        4800 env LGTPU_TEST_TPU=1 python -m pytest tests/ -q
run verify_session   2400 python scripts/verify_session.py
run diag_fullscale   2400 python scripts/diag_fullscale_parity.py
echo "$(date +%T) chip queue done" | tee -a "$OUT/log"

# institutionalize the evidence (VERDICT r2 next-step 9)
if [ -n "$ROUND" ]; then
  DEST="golden/chip_r$ROUND"
  mkdir -p "$DEST"
  cp -f "$OUT"/*.out "$OUT"/log "$DEST"/ 2>/dev/null
  echo "$(date +%T) evidence copied to $DEST (commit it)" | tee -a "$OUT/log"
fi
