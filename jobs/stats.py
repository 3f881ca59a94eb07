"""Snapshot observability CLI — all metadata-only modes run WITHOUT a
SparkSession (a 10^12-row snapshot answers count/min/max, commit
history, and retention from the manifest alone).

Usage:
  python jobs/stats.py --snapshot snap/ --stats            # per-column rows/min/max (zero jobs)
  python jobs/stats.py --snapshot snap/ --history          # commit log (time-travel versions)
  python jobs/stats.py --snapshot snap/ --expire-keep 10   # retention: tombstone old versions
  spark-submit ... jobs/stats.py --snapshot snap/ --summary  # sizes/skew (reads block stats)
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
    ap.add_argument("--stats", action="store_true",
                    help="per-column rows + zone-map min/max, manifest-only")
    ap.add_argument("--blocks", action="store_true",
                    help="per-column codec mix + compression ratio, manifest-only")
    ap.add_argument("--history", action="store_true",
                    help="manifest version chain (time-travel snapshot log)")
    ap.add_argument("--summary", action="store_true",
                    help="sizes/ratio/skew rollup (runs a Spark job over block stats)")
    ap.add_argument("--expire-keep", type=int, default=None, metavar="N",
                    help="retention: tombstone manifest versions older than the newest N")
    args = ap.parse_args()
    if not any((args.stats, args.blocks, args.history, args.summary,
                args.expire_keep is not None)):
        args.stats = True  # default mode

    from kmers_spark import manifest, metrics

    out: dict = {}
    if args.stats:
        out["columns"] = metrics.table_stats(args.snapshot)
        m = manifest.load(args.snapshot)
        if m and m.get("indexes"):
            out["indexes"] = m["indexes"]  # registered index artifacts
    if args.blocks:
        out["blocks"] = metrics.codec_summary(args.snapshot)
    if args.history:
        out["history"] = metrics.snapshot_history(args.snapshot)
        out["current_version"] = manifest.current_version(args.snapshot)
    if args.expire_keep is not None:
        # 0 must surface expire_versions' keep_last>=1 error, not be
        # silently skipped as falsy
        out["expired_versions"] = manifest.expire_versions(
            args.snapshot, keep_last=args.expire_keep
        )
    if args.summary:
        from kmers_spark.session import get_spark

        spark = get_spark("kmers_spark_stats")
        out["summary"] = metrics.snapshot_summary(spark, args.snapshot)
        spark.stop()
    print(json.dumps(out, default=str))


if __name__ == "__main__":
    main()
