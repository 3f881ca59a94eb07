"""spark-submit entry point for the streaming decode job.

Usage:
  spark-submit --py-files dist/kmers_spark.zip jobs/stream_decode.py \
      --snapshot /path/to/snapshot --sink /path/to/decoded_parquet \
      --checkpoint /path/to/ckpt [--follow] [--timeout SEC]

Default is a catch-up run (availableNow): decode every committed wave
the checkpoint hasn't processed, then exit. --follow keeps the query
running, decoding new waves as a concurrent encode commits them —
exactly-once per wave (see kmers_spark.streaming.decode_stream).
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
    ap.add_argument("--sink", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--follow", action="store_true",
                    help="keep running; decode waves as they commit")
    ap.add_argument("--timeout", type=float, default=None,
                    help="stop --follow after this many seconds")
    ap.add_argument(
        "--filter", action="append", default=[], metavar="COL:OP:VALUE",
        help="maintain a FILTERED materialized view: each new wave "
        "decodes through the in-kernel filter, so only matching rows "
        "ever reach the sink (repeatable, ANDed; `in` takes a "
        "comma-separated list)",
    )
    args = ap.parse_args()

    from kmers_spark import manifest, zonemap
    from kmers_spark.session import get_spark
    from kmers_spark.streaming import decode_stream as ds

    filters = None
    if args.filter:
        m = manifest.load(args.snapshot)
        if m is not None:
            try:  # parse eagerly for early feedback when possible
                filters = zonemap.parse_cli_filters(args.filter, m["schema"])
            except ValueError as e:
                raise SystemExit(str(e))
        elif args.follow:
            # follow-from-empty: the encode hasn't committed its first
            # manifest yet — defer parsing to the per-batch handler
            filters = list(args.filter)
        else:
            raise SystemExit(f"no manifest in {args.snapshot}")

    spark = get_spark("kmers_spark_stream_decode")
    q = ds.decode_stream(
        spark, args.snapshot, args.sink, args.checkpoint,
        available_now=not args.follow, filters=filters,
    )
    if args.follow and args.timeout:
        q.awaitTermination(args.timeout)
        q.stop()
    q.awaitTermination()
    rows = ds.read_decoded(spark, args.sink).count()
    print(json.dumps({"decoded_rows_total": rows, "sink": args.sink}))
    spark.stop()


if __name__ == "__main__":
    main()
