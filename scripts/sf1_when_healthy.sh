#!/bin/bash
# Launch the sf1 evidence suite the moment the host reports two
# consecutive HEALTHY canary probes (pathology + protocol: BENCH/ROUND5.md).
cd /root/repo
streak=0
for i in $(seq 1 200); do
  out=$(python scripts/host_canary.py 2>/dev/null)
  if echo "$out" | grep -q HEALTHY; then
    streak=$((streak+1))
  else
    streak=0
  fi
  if [ "$streak" -ge 2 ]; then
    echo "healthy streak reached at $(date -Is); launching sf1 suite" >> /tmp/sf1_watcher.log
    python scripts/bench_sf1.py > /tmp/bench_sf1.out 2> /tmp/bench_sf1.err
    echo "sf1 suite exit=$? at $(date -Is)" >> /tmp/sf1_watcher.log
    exit 0
  fi
  sleep 150
done
echo "watcher expired without healthy window at $(date -Is)" >> /tmp/sf1_watcher.log
