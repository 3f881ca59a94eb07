"""Measure compact_stream's read-amplification payoff (BENCH/ROUND5.md).

Builds a streamed store the way a long-running sink would — N_GEN
writeStream micro-batches over a pages slice, one generation per
(batch, bucket) — then times a full decode BEFORE compaction, runs
compact_stream + a decode AFTER, and reports:

  * wave-file count and per-bucket generation count (the deterministic
    read-amplification numbers — decode I/O tracks them linearly at
    any scale; wall-clock on this host tracks the hypervisor),
  * min-of-2 decode wall-clock before/after + the compaction cost,
  * bit-identity of the two decodes (checksum over all columns).

Usage: python scripts/profile_compact_stream.py [--rows N] [--gens G]
       [--buckets B]
Prints one JSON line; paste into BENCH/ROUND5.md with the canary state.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _decode_checksum(spark, out_dir: str) -> tuple[float, int, str]:
    from pyspark.sql import functions as F

    from kmers_spark.operators.decode import decode_table

    t0 = time.time()
    df = decode_table(spark, out_dir)
    # one deterministic scalar per run: sort-insensitive checksum
    agg = df.select(F.sum(F.pmod(F.xxhash64(*[
        F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
        for c in sorted(df.columns)
    ]), F.lit(2**31 - 1))).alias("sig"), F.count("*").alias("n")).collect()[0]
    return time.time() - t0, int(agg["n"]), str(agg["sig"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=400_000)
    ap.add_argument("--gens", type=int, default=16)
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kmers_spark import datasource, hostcheck, manifest, pages
    from kmers_spark.operators import partitioning
    from kmers_spark.operators.compact import compact_stream
    from kmers_spark.session import get_spark

    canary = hostcheck.probe()
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    root = tempfile.mkdtemp(prefix="compact_profile_")
    src, out, ckpt = f"{root}/src", f"{root}/snap", f"{root}/ckpt"
    try:
        df = pages.pages_df(spark, args.rows, seed=29, partitions=32).cache()
        df.count()
        datasource.register(spark)
        gen_of = F.abs(F.xxhash64("url")) % args.gens
        t_ingest = time.time()
        for i in range(args.gens):
            df.filter(gen_of == i).write.mode("append").parquet(src)
            sdf = spark.readStream.schema(df.schema).parquet(src)
            q = (
                partitioning.with_bucket(sdf, args.buckets, {})
                .repartition("bucket")
                .writeStream.format("kmers")
                .option("checkpointLocation", ckpt)
                .option("numBuckets", str(args.buckets))
                .trigger(availableNow=True)
                .start(out)
            )
            q.awaitTermination(600)
        t_ingest = time.time() - t_ingest
        def _n_blocks() -> int:
            # one row per (bucket, column, generation) block in the
            # REGISTERED waves: the unit every read pays one decode
            # call for (retired dirs linger for lagged readers until
            # the grace sweep — they are not read cost)
            dirs = [os.path.join(out, d)
                    for d in manifest.load(out)["wave_dirs"]]
            return spark.read.parquet(*dirs).select("bucket").count()

        m0 = manifest.load(out)
        files_before = len(glob.glob(f"{out}/blocks/w_*/*.parquet"))
        blocks_before = _n_blocks()
        gens_before = len(m0["wave_dirs"])

        pre = [_decode_checksum(spark, out) for _ in range(2)]
        t_c = time.time()
        res = compact_stream(spark, out)
        t_c = time.time() - t_c
        m1 = manifest.load(out)
        files_after = len(glob.glob(f"{out}/blocks/w_*/*.parquet"))
        blocks_after = _n_blocks()
        post = [_decode_checksum(spark, out) for _ in range(2)]

        assert {p[1:] for p in pre} == {p[1:] for p in post}, "decode drift!"
        print(json.dumps({
            "metric": "compact_stream_profile",
            "rows": args.rows,
            "buckets": args.buckets,
            "generations_before": gens_before,
            "generations_after": len(m1["wave_dirs"]),
            "wave_files_before": files_before,
            "wave_files_after": files_after,
            "blocks_before": blocks_before,
            "blocks_after": blocks_after,
            "ingest_sec": round(t_ingest, 2),
            "decode_before_sec": round(min(p[0] for p in pre), 2),
            "decode_before_runs": [round(p[0], 2) for p in pre],
            "decode_after_sec": round(min(p[0] for p in post), 2),
            "decode_after_runs": [round(p[0], 2) for p in post],
            "compact_sec": round(t_c, 2),
            "merged_waves": len(res["merged_waves"]),
            "bit_identical": True,
            "host_first_touch_gbps": canary["first_touch_gbps"],
            "host_state": "HEALTHY" if canary["healthy"] else "DEGRADED",
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
