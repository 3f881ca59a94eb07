"""Measure delete_keys/upsert_table with bench.py's exact shapes (1%
uniform key sample against the 4M-row hashed store) — per-change
evidence for the optimization round; bench.py stays frozen."""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CACHE = Path(__file__).resolve().parents[1] / ".bench_cache" / "pages_4000000"


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from kmers_spark import hostcheck
    from kmers_spark.operators import encode as enc
    from kmers_spark.operators.delete import delete_keys
    from kmers_spark.operators.upsert import upsert_table

    host_start = hostcheck.probe()
    s = (
        SparkSession.builder.master("local[32]")
        .appName("mutation_measure")
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
    out = tempfile.mkdtemp(prefix="mut_store_")
    t0 = time.perf_counter()
    enc.encode_table(df, out, num_buckets=128, detect_skew=True,
                     snapshot_id="bench")
    t_enc = round(time.perf_counter() - t0, 2)
    doomed = df.select("url").distinct().sample(0.01, seed=7)
    t0 = time.perf_counter()
    d = delete_keys(s, out, doomed)
    t_del = round(time.perf_counter() - t0, 2)
    batch = df.sample(0.01, seed=11).withColumn(
        "text", F.concat(F.lit("RECRAWL:"), F.col("text")))
    t0 = time.perf_counter()
    u = upsert_table(s, out, batch)
    t_ups = round(time.perf_counter() - t0, 2)
    shutil.rmtree(out, ignore_errors=True)
    s.stop()
    print(json.dumps({
        "encode_peak": t_enc, "delete_keys_1pct": t_del, "upsert_1pct": t_ups,
        "rows_deleted": d["rows_deleted"], "rows_inserted": u["rows_inserted"],
        "host_state": {"start": host_start, "end": hostcheck.probe()},
    }))


if __name__ == "__main__":
    main()
