"""spark-submit entry point for metadata-only aggregates.

Usage:
  spark-submit --py-files dist/kmers_spark.zip jobs/agg.py \
      --snapshot /path/to/snapshot \
      --agg count:* --agg min:warc_ts --agg max:warc_ts \
      [--filter warc_ts:>=:2024-01-01T00:00:00] [--version N]

Aggregates run stats-first (operators/agg.py): unfiltered
count/min/max/sum over exact-bounds columns touch ZERO payload bytes —
whatever the table's size — and filtered runs decode only the
boundary-straddling buckets. Prints one JSON object of results.
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
    ap.add_argument("--agg", action="append", required=True,
                    help="FN:COLUMN with FN in count|min|max|sum|avg|"
                    "count_distinct|approx_count_distinct; "
                    "count:* for row count (repeatable)")
    ap.add_argument("--filter", action="append", default=[],
                    help="COL:OP:VALUE, ANDed (same syntax as decode)")
    ap.add_argument("--group-by", action="append", default=[],
                    metavar="COL",
                    help="GROUP BY these columns (repeatable); grouped "
                    "fns: count/min/max/sum/avg — on a store clustered "
                    "by the group column the rollup is stats-only")
    ap.add_argument("--version", type=int, default=None,
                    help="time-travel: aggregate manifest version N")
    args = ap.parse_args()

    aggs = []
    for spec in args.agg:
        fn, _, col = spec.partition(":")
        if not col:
            ap.error(f"--agg {spec!r}: expected FN:COLUMN")
        aggs.append((fn, col))

    from kmers_spark import manifest, zonemap
    from kmers_spark.operators.agg import agg_table
    from kmers_spark.session import get_spark

    spark = get_spark("kmers_spark_agg")
    filters = None
    if args.filter:
        m = manifest.load(args.snapshot, version=args.version)
        if m is None:
            raise FileNotFoundError(f"no manifest in {args.snapshot}")
        filters = zonemap.parse_cli_filters(
            args.filter, manifest.ordered_schema(m)
        )
    if args.group_by:
        from kmers_spark.operators.agg import agg_table_grouped

        rows = agg_table_grouped(spark, args.snapshot, args.group_by, aggs,
                                 filters=filters,
                                 version=args.version).collect()
        print(json.dumps([r.asDict() for r in rows], default=str,
                         sort_keys=True))
        return
    res = agg_table(spark, args.snapshot, aggs, filters=filters,
                    version=args.version)
    print(json.dumps(res, default=str, sort_keys=True))


if __name__ == "__main__":
    main()
