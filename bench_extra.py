"""Extra benchmarks for the optimization rounds (guide §1.4 noop-sink
isolation). NOT the driver's bench — bench.py stays frozen; this file
exists so optimization evidence (per-query before/after, host canary
annotations) can be produced without touching the measured harness.

Usage: python bench_extra.py [query ...]   (default: the ANN + dedup set)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), N_RUNS (default 2).
Prints one JSON line: {"queries": {name: min_sec}, "query_runs": {...},
"host_state": {...}}.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_RUNS = int(os.environ.get("N_RUNS", "2"))

DEFAULT = [
    "ann_cosine_topk", "ann_store_cosine_topk", "ann_topk_lsh",
    "ann_topk_lsh_multi", "ann_ivf_topk", "ann_ivf_lloyd_topk",
    "ann_store_ivf_topk", "embedding_dup_pairs",
    "minhash_signatures", "minhash_lsh_pairs", "ngram_jaccard",
    "dedup_exact", "dedup_clusters", "simhash",
]


def main() -> None:
    from pyspark.sql import SparkSession

    from kmers_spark import hostcheck

    names = sys.argv[1:] or DEFAULT
    host_start = hostcheck.probe()
    s = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench_extra")
        .config("spark.sql.shuffle.partitions", str(4 * CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.local.dir", os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    timings: dict[str, float] = {}
    runs_all: dict[str, list[float]] = {}
    for name in names:
        runs = []
        for _ in range(N_RUNS):
            s.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.perf_counter()
            qs[name](s, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(runs)
        runs_all[name] = runs
    s.stop()
    print(json.dumps({
        "queries": timings, "query_runs": runs_all,
        "host_state": {"start": host_start, "end": hostcheck.probe()},
        "sf_dir": SF_DIR, "cpus": CPUS,
    }))


if __name__ == "__main__":
    main()
