#!/bin/bash
# Launch the sf1 evidence suite in the best host window available
# (pathology + protocol: BENCH/ROUND5.md). Prefers two consecutive
# HEALTHY canary probes (first-touch > 1 GB/s); after MAX_WAIT_S
# without one, settles for a MODERATE window (first-touch >= 0.15
# GB/s — 40x above the pathological floor); after ABS_MAX_S, runs
# unconditionally (canary-annotated DEGRADED numbers beat no full-
# scale run — ratio/bit-identity results are host-independent) so
# the round records a complete run either way.
cd /root/repo
LOG=/tmp/sf1_watcher.log
MAX_WAIT_S=${MAX_WAIT_S:-9000}
ABS_MAX_S=${ABS_MAX_S:-14400}
start=$(date +%s)
streak=0
echo "watcher started at $(date -Is)" >> "$LOG"
while :; do
  out=$(python scripts/host_canary.py 2>/dev/null)
  ft=$(echo "$out" | sed -n 's/.*first_touch_gbps=\([0-9.]*\).*/\1/p')
  now=$(date +%s)
  if echo "$out" | grep -q HEALTHY; then
    streak=$((streak+1))
  else
    streak=0
  fi
  go=""
  if [ "$streak" -ge 2 ]; then
    go="healthy streak"
  elif [ $((now - start)) -ge "$MAX_WAIT_S" ] && \
       awk -v f="$ft" 'BEGIN{exit !(f >= 0.15)}'; then
    go="moderate fallback (first_touch=$ft)"
  elif [ $((now - start)) -ge "$ABS_MAX_S" ]; then
    go="unconditional fallback (first_touch=$ft, DEGRADED-annotated)"
  fi
  if [ -n "$go" ]; then
    echo "launching sf1 at $(date -Is): $go" >> "$LOG"
    touch /tmp/sf1_running
    python scripts/bench_sf1.py > /tmp/bench_sf1.out 2> /tmp/bench_sf1.err
    echo "sf1 suite exit=$? at $(date -Is)" >> "$LOG"
    rm -f /tmp/sf1_running
    exit 0
  fi
  sleep 150
done
