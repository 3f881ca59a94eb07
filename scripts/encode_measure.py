"""Measure encode_table at a given core count with the bench's exact
protocol (warm pass, min-of-n, canary annotations) — the optimization
round's per-change evidence runner; bench.py stays frozen.

Usage: python scripts/encode_measure.py <cores> [n_runs]
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 1
N_RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 1
CACHE = Path(__file__).resolve().parents[1] / ".bench_cache" / "pages_4000000"


def main() -> None:
    from pyspark.sql import SparkSession

    from kmers_spark import hostcheck
    from kmers_spark.operators import encode as enc

    host_start = hostcheck.probe()
    s = (
        SparkSession.builder.master(f"local[{CORES}]")
        .appName(f"encode_measure_{CORES}")
        .config("spark.sql.shuffle.partitions", "128")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    df = s.read.parquet(str(CACHE))
    warm = tempfile.mkdtemp(prefix="em_warm_")
    enc.encode_table(df.limit(2000), warm, num_buckets=CORES,
                     detect_skew=False, snapshot_id="warm")
    shutil.rmtree(warm, ignore_errors=True)
    secs = []
    for _ in range(N_RUNS):
        out = tempfile.mkdtemp(prefix="em_run_")
        t0 = time.perf_counter()
        enc.encode_table(df, out, num_buckets=128, detect_skew=True,
                         snapshot_id="bench")
        secs.append(round(time.perf_counter() - t0, 2))
        shutil.rmtree(out, ignore_errors=True)
    s.stop()
    print(json.dumps({
        "cores": CORES, "secs": secs, "min": min(secs),
        "host_state": {"start": host_start, "end": hostcheck.probe()},
    }))


if __name__ == "__main__":
    main()
