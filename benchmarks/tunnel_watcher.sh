#!/bin/bash
# Tunnel watcher: probe the TPU backend on a cadence; the moment it is
# back, fire the chip queue (benchmarks/run_chip_queue.sh) into a STABLE
# outdir so a mid-queue re-outage resumes instead of restarting.
#
# Designed to run for a whole round in the background (VERDICT r4 #1:
# "automate the capture, don't wait for luck"). Exits 0 once the queue
# completes end-to-end.
#
# Host coordination on this 1-core box:
#   - /tmp/ivars_host_busy   — touched by the human/agent while running
#     the test suite or any host-heavy work; the watcher neither probes
#     nor launches the queue while it exists (probe CPU is tiny, but the
#     queue is heavy and the chip numbers would be garbage anyway).
#   - /tmp/chip_queue_running — touched by the watcher while the queue
#     runs; the agent must not start python work while it exists.
#
# Usage:  bash benchmarks/tunnel_watcher.sh [outdir] [interval_s]
set -u
cd /root/repo
OUT=${1:-logs/watcher_r5}
INTERVAL=${2:-480}
mkdir -p "$OUT"
LOG="$OUT/watcher.log"
note() { echo "$(date +%m%d-%T) $*" >>"$LOG"; }
note "watcher start (pid $$, interval ${INTERVAL}s, queue -> $OUT/queue)"

while true; do
  if [ -e /tmp/ivars_host_busy ]; then
    note "host busy — skipping probe"
    sleep 120
    continue
  fi
  if timeout 45 python -c "import jax; print(jax.devices())" \
      >"$OUT/probe.log" 2>&1; then
    note "tunnel UP ($(tr -d '\n' <"$OUT/probe.log")) — firing chip queue"
    touch /tmp/chip_queue_running
    bash benchmarks/run_chip_queue.sh "$OUT/queue" >>"$LOG" 2>&1
    rc=$?
    rm -f /tmp/chip_queue_running
    note "queue rc=$rc"
    if [ $rc -eq 0 ]; then
      touch "$OUT/DONE"
      note "queue complete — watcher exiting"
      exit 0
    fi
    # rc=3 (down again before start), rc=4 (lost mid-queue), or rc=5
    # (a step failed without an outage — own timeout/crash): keep
    # watching; finished steps are .OK-marked and will be skipped, the
    # failed step gets retried on the next fire.
  else
    note "tunnel down"
  fi
  sleep "$INTERVAL"
done
