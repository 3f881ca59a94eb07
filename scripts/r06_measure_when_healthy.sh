#!/bin/bash
# Round-6 final measurement campaign, canary-gated (protocol:
# BENCH/ROUND5.md + scripts/sf1_when_healthy.sh). Waits for two
# consecutive HEALTHY first-touch probes, then runs:
#   1. the FROZEN bench.py (the driver's harness) -> /tmp/bench_r06_after.json
#   2. bench_extra.py (ANN/dedup noop-isolated set) -> /tmp/bench_extra_r06.json
#   3. scripts/mutation_measure.py -> /tmp/mutation_r06.json
# Falls back to a moderate window after MAX_WAIT_S, unconditionally
# after ABS_MAX_S (degraded numbers beat no numbers; all three embed
# canary state).
cd /root/repo
LOG=/tmp/r06_measure.log
MAX_WAIT_S=${MAX_WAIT_S:-5400}
ABS_MAX_S=${ABS_MAX_S:-9000}
start=$(date +%s)
streak=0
echo "r06 watcher started at $(date -Is)" >> "$LOG"
while :; do
  ft=$(python -c "
import sys; sys.path.insert(0, '/root/repo')
from kmers_spark import hostcheck
p = hostcheck.probe()
print(p['first_touch_gbps'], 'HEALTHY' if p['healthy'] else 'DEGRADED')" 2>/dev/null)
  val=$(echo "$ft" | awk '{print $1}')
  now=$(date +%s)
  echo "$(date -Is) probe: $ft streak=$streak" >> "$LOG"
  if echo "$ft" | grep -q HEALTHY; then
    streak=$((streak+1))
  else
    streak=0
  fi
  go=""
  if [ "$streak" -ge 2 ]; then
    go="healthy streak"
  elif [ $((now - start)) -ge "$MAX_WAIT_S" ] && \
       awk -v f="$val" 'BEGIN{exit !(f >= 0.15)}'; then
    go="moderate fallback (first_touch=$val)"
  elif [ $((now - start)) -ge "$ABS_MAX_S" ]; then
    go="unconditional fallback (first_touch=$val, DEGRADED-annotated)"
  fi
  if [ -n "$go" ]; then
    echo "launching at $(date -Is): $go" >> "$LOG"
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      python bench.py > /tmp/bench_r06_after.json 2>/tmp/bench_r06_after.err
    echo "bench exit=$? at $(date -Is)" >> "$LOG"
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      python bench_extra.py > /tmp/bench_extra_r06.json 2>/dev/null
    echo "bench_extra exit=$? at $(date -Is)" >> "$LOG"
    python scripts/mutation_measure.py > /tmp/mutation_r06.json 2>/dev/null
    echo "mutation exit=$? at $(date -Is)" >> "$LOG"
    exit 0
  fi
  sleep 60
done
