"""spark-submit entry point for key-granular delete (dedup -> prune).

Usage:
  spark-submit --py-files dist/kmers_spark.zip jobs/delete.py \
      --snapshot /path/to/snapshot --keys-parquet /path/to/doomed.parquet
  spark-submit ... jobs/delete.py --snapshot S --key url1 --key url2

The parquet form is the production path: a dedup job writes its doomed
keys (one column, named like the snapshot's key or the only column)
and this job streams them through delete_keys without a driver
collect. --key literals are the operational escape hatch.
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
    ap.add_argument("--keys-parquet", default=None,
                    help="parquet of doomed keys (single column, or one "
                    "named like the snapshot's key column)")
    ap.add_argument("--key", action="append", default=[],
                    help="literal doomed key (repeatable)")
    args = ap.parse_args()
    if bool(args.keys_parquet) == bool(args.key):
        ap.error("exactly one of --keys-parquet / --key is required")

    from kmers_spark.operators.delete import delete_keys
    from kmers_spark.session import get_spark

    spark = get_spark("kmers_spark_delete")
    keys = (spark.read.parquet(args.keys_parquet)
            if args.keys_parquet else args.key)
    res = delete_keys(spark, args.snapshot, keys)
    print(json.dumps({
        "rows_deleted": res["rows_deleted"],
        "buckets_rewritten": len(res["buckets_rewritten"]),
        "waves_rewritten": len(res["waves_rewritten"]),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
