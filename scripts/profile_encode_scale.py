"""Diagnose the sf1 encode nonlinearity: per-byte cost vs block size.

Encodes the same 4M-row slice of the sf1 pages cache at several bucket
counts (block size = bytes / buckets) and prints GB/s for each. If
per-byte cost grows with block size, a kernel is superlinear in block
length; if it's flat, the sf1 slowdown is elsewhere (shuffle, memory,
host throttle).
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
BUCKETS = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
                            else ["128", "51"])]
CACHE = REPO / ".bench_cache" / "pages_40000000"


def main():
    from pyspark.sql import SparkSession, functions as F

    from kmers_spark.operators import encode as enc

    s = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "128")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    df = s.read.parquet(str(CACHE)).limit(ROWS)
    slice_dir = tempfile.mkdtemp(prefix="prof_slice_")
    df.write.mode("overwrite").parquet(slice_dir)
    df = s.read.parquet(slice_dir)

    # warm python workers
    wd = tempfile.mkdtemp(prefix="prof_warm_")
    enc.encode_table(df.limit(2000), wd, num_buckets=32, detect_skew=False,
                     snapshot_id="warm")
    shutil.rmtree(wd, ignore_errors=True)

    for nb in BUCKETS:
        out = tempfile.mkdtemp(prefix=f"prof_enc_{nb}_")
        t0 = time.perf_counter()
        enc.encode_table(df, out, num_buckets=nb, detect_skew=True,
                         snapshot_id=f"prof_{nb}")
        sec = time.perf_counter() - t0
        stats = (
            enc.read_blocks(s, out)
            .agg(F.sum("raw_nbytes").alias("raw"), F.sum("enc_nbytes").alias("enc"))
            .collect()[0]
        )
        print(f"# buckets={nb} rows={ROWS} sec={sec:.1f} "
              f"raw={stats['raw']/1e9:.2f}GB gbps={stats['raw']/sec/1e9:.4f} "
              f"block={stats['raw']/nb/1e6:.1f}MB ratio={stats['enc']/stats['raw']:.4f}",
              flush=True)
        shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(slice_dir, ignore_errors=True)
    s.stop()


if __name__ == "__main__":
    main()
