"""Re-measure the sf1 8v32 scaling pair with bench.py's interleaving.

The first full sf1 suite (BENCH/ROUND5_sf1.json) took its scaling pair
as one single-shot run per level, and the 32-core run straddled a host
collapse (canary in the JSON: first_touch 4.36 GB/s before the run,
0.021 GB/s after) — the recorded 0.182 efficiency measures the
hypervisor's page-population throughput, not the engine (BENCH/ROUND5.md
host-pathology section). This script applies the protocol bench.py has
used since r4 for exactly this failure mode: alternate hi/lo runs
(hi, lo, hi, lo), take min-of-each level, record every run + its canary
state, and splice the result into ROUND5_sf1.json as
encode.scaling_8v32_rerun (the original single-shot record is kept).

Usage: python scripts/sf1_scaling_rerun.py [--wait-healthy SECS]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import scripts.bench_sf1 as b  # noqa: E402  (reuses encode_run/CACHE)


def main() -> None:
    from kmers_spark import hostcheck

    wait_s = 0
    if "--wait-healthy" in sys.argv:
        i = sys.argv.index("--wait-healthy") + 1
        if i >= len(sys.argv) or not sys.argv[i].isdigit():
            sys.exit("--wait-healthy needs an integer seconds value")
        wait_s = int(sys.argv[i])
    b.ensure_pages()  # BEFORE the wait: don't sleep an hour into a crash
    deadline = time.time() + wait_s
    while time.time() < deadline:
        p = hostcheck.probe()
        print(f"# canary first_touch={p['first_touch_gbps']} GB/s",
              flush=True)
        if p["healthy"]:
            break
        time.sleep(120)

    hi_runs, lo_runs = [], []
    hosts = []
    raw = None
    for level in (b.HI, b.LO, b.HI, b.LO):
        r = b.encode_run(level)
        raw = r["raw"]
        (hi_runs if level == b.HI else lo_runs).append(round(r["sec"], 2))
        hosts.append({"cores": level, "sec": round(r["sec"], 2),
                      "host": r["host"]})
        print(f"# {level}-core run {r['sec']:.1f}s "
              f"(after: {r['host']['after']['first_touch_gbps']} GB/s)",
              flush=True)

    gbps_hi = raw / min(hi_runs) / 1e9
    gbps_lo = raw / min(lo_runs) / 1e9
    rerun = {
        "cores_hi": b.HI, "cores_lo": b.LO,
        "hi_secs": hi_runs, "lo_secs": lo_runs,
        "gbps_hi": round(gbps_hi, 4), "gbps_lo": round(gbps_lo, 4),
        "scaling_efficiency": round(gbps_hi / ((b.HI / b.LO) * gbps_lo), 3),
        "protocol": "interleaved hi/lo x2, min-of-each (bench.py r4+)",
        "runs": hosts,
    }
    path = REPO / "BENCH" / "ROUND5_sf1.json"
    out = json.loads(path.read_text())
    out["encode"]["scaling_8v32_rerun"] = rerun
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(rerun))


if __name__ == "__main__":
    main()
