"""Host-health canary CLI: appends a timestamped first-touch /
warm-write sample to BENCH/host_canary.log (probe semantics and the
pathology it detects: kmers_spark/hostcheck.py, BENCH/ROUND5.md).

Usage: python scripts/host_canary.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from kmers_spark import hostcheck  # noqa: E402

LOG = REPO / "BENCH" / "host_canary.log"


if __name__ == "__main__":
    p = hostcheck.probe()
    line = (f"{p['at']} first_touch_gbps={p['first_touch_gbps']} "
            f"warm_write_gbps={p['warm_write_gbps']} "
            f"{'HEALTHY' if p['healthy'] else 'DEGRADED'}")
    print(line)
    with LOG.open("a") as f:
        f.write(line + "\n")
