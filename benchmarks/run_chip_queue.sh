#!/bin/bash
# Sequential chip-run queue for the outage-gated measurements (rounds 4-5).
#
# The TPU tunnel has multi-hour outages (CLAUDE.md); this script is meant
# to be launched ONCE the bounded probe says the backend is back — either
# by hand or by benchmarks/tunnel_watcher.sh — and runs every gated
# measurement in priority order, most artifact-critical first, so a
# re-outage mid-queue still lands the important numbers. Never run
# anything else (tests, probes) concurrently: the chip is time-shared and
# the host has one core.
#
# Steps that completed (rc=0) write "$OUT/<name>.OK" and are SKIPPED on
# re-invocation with the same outdir, so the watcher can resume a queue
# that a mid-run outage cut short without redoing finished work.
#
# Usage:  bash benchmarks/run_chip_queue.sh [outdir]
set -u
cd /root/repo
OUT=${1:-logs/chip_queue_$(date +%H%M%S)}
mkdir -p "$OUT"
echo "chip queue -> $OUT"

probe() {
  timeout 45 python -c "import jax; print(jax.devices())" >"$OUT/probe.log" 2>&1
}

if ! probe; then
  echo "TPU backend DOWN (probe hung/failed) — aborting queue" | tee "$OUT/ABORTED"
  exit 3
fi
rm -f "$OUT/ABORTED"
echo "probe OK: $(cat "$OUT/probe.log")"

run() {
  local name=$1 tmo=$2; shift 2
  if [ -e "$OUT/$name.OK" ]; then
    echo "=== $name already OK — skipping"
    return 0
  fi
  echo "=== $name (timeout ${tmo}s): $*"
  local t0=$SECONDS
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc elapsed=$((SECONDS-t0))s"
  [ $rc -eq 0 ] && touch "$OUT/$name.OK"
  # re-probe between steps so a mid-queue outage is named, not mistaken
  # for a slow script on the next step
  if ! probe; then
    echo "backend lost after $name — stopping queue" | tee "$OUT/LOST_AFTER_$name"
    exit 4
  fi
  return $rc
}

# 1. The artifact backbone: every headline key RESULTS.md cites
#    (incl. served-QPS 1M, IVF 10M, served-10M ANN-vs-dense sections).
run bench 2400 env IVARS_BENCH_FULL=1 python bench.py

# 2. Batched-IVF crossover at 10M (VERDICT r4 #1/#3 chip evidence:
#    dense-vs-IVF per B, feeds the self-configuring ann_max_batch).
run ivf10m 1900 python benchmarks/exp_ivf_10m.py

# 3. ViT-L per-stage profile + patch-embed GEMM + remat (VERDICT r4 #2).
run vitl 1500 python benchmarks/exp_vitl_profile.py

# 4. Batched QPS sweep over 10M int8 (refresh the round-2 2,683 QPS
#    number on current code).
# (timeout raised 900 -> 1800 after the 2026-08-19 fire lost this step
# to compile-service congestion during DB gen)
run qps10m 1800 python benchmarks/exp_qps_10m.py

# 5. Cold-start soak serve phase (VERDICT r4 #4): needs the 10M on-disk
#    container the host-side build phase produces (exp_coldstart_10m.py
#    --phase build/open run OUTSIDE the queue — they are tunnel-free and
#    take ~1 h of host time; the build phase writes the .build.OK marker
#    itself on success).
EXPECT="bench ivf10m vitl qps10m"
if [ -e logs/coldstart_10m.rvdb.build.OK ] || [ -e logs/coldstart_build.OK ]; then
  EXPECT="$EXPECT coldstart"
  run coldstart 1900 python benchmarks/exp_coldstart_10m.py --phase serve
else
  echo "=== coldstart: skipped (10M container not built yet)"
fi

# A step that failed for a NON-outage reason (own timeout, crash) has no
# .OK marker but did not abort the queue — exit nonzero so the watcher
# keeps watching and a later re-fire resumes the lost step instead of
# marking the round DONE with measurements missing (found by review).
MISSING=""
for s in $EXPECT; do
  [ -e "$OUT/$s.OK" ] || MISSING="$MISSING $s"
done
if [ -n "$MISSING" ]; then
  echo "queue INCOMPLETE (no .OK):$MISSING — exit 5 so the watcher re-fires"
  exit 5
fi
echo "queue complete: $OUT"
