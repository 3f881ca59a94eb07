"""spark-submit entry point for key-granular upsert (merge-on-write).

Usage:
  spark-submit --py-files dist/kmers_spark.zip jobs/upsert.py \
      --snapshot /path/to/snapshot --input /path/to/batch_parquet

The batch parquet must carry exactly the snapshot's columns; every
existing row whose key appears in the batch is replaced, the batch is
inserted (MERGE whole-row semantics). Re-crawl ingestion is the
motivating shape: (url, new html/text/warc_ts) batches supersede old
rows without rewriting the store.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot", required=True)
    ap.add_argument("--input", required=True,
                    help="parquet of rows to merge (snapshot schema)")
    args = ap.parse_args()

    from kmers_spark.operators.upsert import upsert_table
    from kmers_spark.session import get_spark

    spark = get_spark("kmers_spark_upsert")
    res = upsert_table(spark, args.snapshot, spark.read.parquet(args.input))
    print(json.dumps({
        "rows_inserted": res["rows_inserted"],
        "rows_replaced": res["rows_replaced"],
        "buckets_rewritten": len(res["buckets_rewritten"]),
        "waves_rewritten": len(res["waves_rewritten"]),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
