"""Measure the storage-partitioned join (operators/join.py) against the
shuffled baseline (BENCH/ROUND5.md).

Builds two bucket-aligned stores from a deterministic pages slice —
left = the pages themselves keyed by url, right = a derived per-url
scores table encoded with `layout_from=` the left store — then times:

  * join_colocated (bucket-local Arrow joins, zero Exchange),
  * the shuffled baseline: decode_table both sides + a Spark equi-join
    (what a caller without aligned layouts must do),

min-of-2 each, asserts identical row counts + a value checksum, and
counts Exchange nodes in both plans. The structural numbers (exchange
count, rows shuffled: all-vs-none) are the 100 TB evidence; wall-clock
on this host tracks the hypervisor (see BENCH/ROUND5.md host
pathology).

Usage: python scripts/profile_join.py [--rows N] [--buckets B]
Prints one JSON line; paste into BENCH/ROUND5.md with the canary state.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--buckets", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kmers_spark import hostcheck, pages
    from kmers_spark.operators.decode import decode_table
    from kmers_spark.operators.encode import encode_table
    from kmers_spark.operators.join import join_colocated
    from kmers_spark.session import get_spark

    spark = get_spark("profile_join", master="local[32]",
                      shuffle_partitions=args.buckets)
    spark.sparkContext.setLogLevel("ERROR")
    host0 = hostcheck.probe()

    base = tempfile.mkdtemp(prefix="profile_join_")
    left, right = f"{base}/pages", f"{base}/scores"
    res: dict = {"rows": args.rows, "buckets": args.buckets,
                 "host_start": host0}
    try:
        df = pages.pages_df(spark, args.rows, partitions=32).cache()
        df.count()

        t0 = time.time()
        encode_table(df, left, key="url", num_buckets=args.buckets,
                     detect_skew=False)
        res["encode_left_s"] = round(time.time() - t0, 2)
        scores = df.select(
            "url",
            F.length("text").alias("score"),
            (F.xxhash64("url") % 100).alias("shard"),
        ).filter(F.xxhash64("text") % 3 != 0)
        t0 = time.time()
        encode_table(scores, right, key="url", num_buckets=args.buckets,
                     detect_skew=False, layout_from=left)
        res["encode_right_s"] = round(time.time() - t0, 2)
        df.unpersist()

        def colocated():
            return join_colocated(
                spark, left, right, how="inner",
                columns_left=["url", "lang", "warc_ts"],
                columns_right=["url", "score", "shard"],
            )

        def shuffled():
            l = decode_table(spark, left,
                             columns=["url", "lang", "warc_ts"])
            r = decode_table(spark, right)
            return l.join(r, "url", "inner")

        def run(fn):
            outs = []
            for _ in range(2):
                t0 = time.time()
                n, chk = fn().agg(
                    F.count("*"),
                    F.sum(F.pmod(F.xxhash64("url", "score"),
                                 F.lit(1_000_000_007))),
                ).collect()[0]
                outs.append((round(time.time() - t0, 2), n, int(chk)))
            return outs

        def exchanges(fn) -> int:
            plan = fn()._jdf.queryExecution().executedPlan().toString()
            return plan.count("Exchange")

        co = run(colocated)
        sh = run(shuffled)
        assert co[0][1:] == sh[0][1:] == co[1][1:], (co, sh)
        res["join_rows"] = co[0][1]
        res["checksum_equal"] = True
        res["colocated_s"] = min(t for t, *_ in co)
        res["colocated_runs"] = [t for t, *_ in co]
        res["shuffled_s"] = min(t for t, *_ in sh)
        res["shuffled_runs"] = [t for t, *_ in sh]
        res["exchanges_colocated"] = exchanges(colocated)
        res["exchanges_shuffled"] = exchanges(shuffled)
        res["host_end"] = hostcheck.probe()
        print(json.dumps(res))
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
