"""Host-health probe: first-touch page-population throughput.

The sandbox VM intermittently degrades so that the FIRST touch of newly
mapped anonymous memory runs at ~10 MB/s (healthy: >2 GB/s) while
already-populated pages read/write at full speed — a hypervisor-side
memory-backing pathology (measured round 5: THP doesn't help, CPU idle,
zero reclaim; see BENCH/ROUND5.md). Allocation-heavy Spark/Arrow work
slows 10-100x under it, so a wall-clock number is only meaningful
alongside the host state it was taken in. Benches embed probe() output
in their JSON for exactly that.
"""

from __future__ import annotations

import time


def probe(nbytes: int = 100_000_000) -> dict:
    """Measure first-touch vs warm-write throughput (GB/s) over one
    `nbytes` anonymous buffer. ~0.1 s healthy, a few seconds degraded."""
    import numpy as np

    t0 = time.perf_counter()
    y = np.empty(nbytes, dtype=np.uint8)
    y[:] = 1
    touch = time.perf_counter() - t0
    t0 = time.perf_counter()
    y[:] = 2  # same pages: the healthy-path reference
    warm = time.perf_counter() - t0
    gb = nbytes / 1e9
    return {
        "first_touch_gbps": round(gb / touch, 3),
        "warm_write_gbps": round(gb / warm, 3),
        "healthy": gb / touch > 1.0,
        "at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
