"""spark-submit entry point for the storage-partitioned join.

Usage:
  spark-submit --py-files dist/kmers_spark.zip jobs/join.py \
      --left /path/to/pages_snapshot --right /path/to/scores_snapshot \
      --output joined_parquet/ \
      [--how inner] [--columns-left url,lang] [--columns-right url,score] \
      [--filter-left warc_ts:>=:2024-01-01T00:00:00] \
      [--filter-right score:>=:100] [--buckets-per-task 4]

Joins two bucket-ALIGNED snapshots on their key columns with zero
shuffle (operators/join.py): one bucket-local Arrow join per surviving
bucket pair, side filters pruned driver-side first. Refuses with the
mismatch reason when the manifests do not prove alignment — encode the
smaller side with `jobs/encode.py --layout-from <other snapshot>` to
mint an aligned twin. Writes parquet and prints row count JSON.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--left", required=True)
    ap.add_argument("--right", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--how", choices=("inner", "left", "semi", "anti"),
                    default="inner")
    ap.add_argument("--columns-left", default=None,
                    help="comma-separated left projection")
    ap.add_argument("--columns-right", default=None,
                    help="comma-separated right projection (right key is "
                    "always dropped — it equals the left key)")
    ap.add_argument("--filter-left", action="append", default=[],
                    help="COL:OP:VALUE on the left side, ANDed "
                    "(applied BEFORE the join; same syntax as decode)")
    ap.add_argument("--filter-right", action="append", default=[])
    ap.add_argument("--rsuffix", default="_r")
    ap.add_argument("--buckets-per-task", type=int, default=1)
    args = ap.parse_args()

    from kmers_spark import manifest, zonemap
    from kmers_spark.operators.join import join_colocated
    from kmers_spark.session import get_spark

    spark = get_spark("kmers_spark_join")

    def filters_for(snapshot: str, specs: list[str]):
        if not specs:
            return None
        m = manifest.load(snapshot)
        if m is None:
            raise FileNotFoundError(f"no manifest in {snapshot}")
        return zonemap.parse_cli_filters(specs, manifest.ordered_schema(m))

    split = lambda s: s.split(",") if s else None
    df = join_colocated(
        spark, args.left, args.right, how=args.how,
        columns_left=split(args.columns_left),
        columns_right=split(args.columns_right),
        filters_left=filters_for(args.left, args.filter_left),
        filters_right=filters_for(args.right, args.filter_right),
        rsuffix=args.rsuffix,
        buckets_per_task=args.buckets_per_task,
    )
    df.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"rows": n, "how": args.how, "output": args.output}))


if __name__ == "__main__":
    main()
