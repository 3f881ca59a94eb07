"""Host-health canary: measures first-touch page-population throughput.

The sandbox VM intermittently degrades so that the FIRST touch of newly
mapped anonymous memory runs at ~10 MB/s (healthy: >2 GB/s) while reads
and writes to already-populated pages stay at full speed — a
hypervisor-side memory-backing pathology no guest code can route around
(allocation-heavy Spark/numpy work slows 10-100x; pure compute over
existing buffers is unaffected; transparent hugepages don't help, so
the cost is per-byte populated, not per-fault).

Appends one line per run to BENCH/host_canary.log so bench evidence can
be timestamped against host state. Usage: python scripts/host_canary.py
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

LOG = Path(__file__).resolve().parents[1] / "BENCH" / "host_canary.log"


def measure() -> tuple[float, float]:
    t0 = time.perf_counter()
    y = np.empty(100_000_000, dtype=np.uint8)
    y[:] = 1
    touch = time.perf_counter() - t0
    t0 = time.perf_counter()
    y[:] = 2  # repopulate the SAME pages: healthy-path reference
    warm = time.perf_counter() - t0
    return 0.1 / touch, 0.1 / warm  # GB/s


if __name__ == "__main__":
    ft, wm = measure()
    line = (f"{time.strftime('%Y-%m-%d %H:%M:%S')} first_touch_gbps={ft:.3f} "
            f"warm_write_gbps={wm:.3f} "
            f"{'HEALTHY' if ft > 1.0 else 'DEGRADED'}")
    print(line)
    with LOG.open("a") as f:
        f.write(line + "\n")
