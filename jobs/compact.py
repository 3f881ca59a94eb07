"""spark-submit entry point for wave compaction (maintenance job).

Usage:
  spark-submit --py-files dist/kmers_spark.zip jobs/compact.py \
      --snapshot /path/to/snapshot

Rewrites all committed wave directories into one (payloads verbatim —
no re-encode) and atomically swaps the manifest's wave list; orphaned
dirs from either side of a crash are swept on the next run.

--rebuild-to DST decodes the snapshot and encodes a FRESH one instead
(re-encode, not verbatim): a streamed-store compactor into a new dir
and the re-clustering tool (--cluster-by converts hash bucketing to
range bucketing so zone maps prune range scans).

--stream merges a STREAMED store's generations IN PLACE (one block
set per bucket-column) while the sink keeps appending; --keep-last N
leaves the newest N generations unmerged so active stream readers
with bounded lag keep valid offsets. --to-batch afterwards freezes a
fully-compacted streamed store into batch semantics, unlocking
delete/upsert/compact_waves (stop the sink and readers first).
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
    ap.add_argument("--rebuild-to", default=None, metavar="DST",
                    help="decode + re-encode into a fresh snapshot dir "
                    "(streamed-store compaction / re-clustering)")
    ap.add_argument("--cluster-by", default=None, metavar="COL",
                    help="with --rebuild-to: range-bucket the rebuilt "
                    "snapshot by COL")
    ap.add_argument("--num-buckets", type=int, default=None,
                    help="with --rebuild-to: bucket count of the rebuilt "
                    "snapshot (default: source's)")
    ap.add_argument("--stream", action="store_true",
                    help="streamed store: merge generations in place")
    ap.add_argument("--keep-last", type=int, default=0, metavar="N",
                    help="with --stream: leave the newest N generations "
                    "unmerged (protects lagging stream readers)")
    ap.add_argument("--to-batch", action="store_true",
                    help="freeze a fully-compacted streamed store into "
                    "batch semantics (enables delete/upsert)")
    args = ap.parse_args()

    from kmers_spark.operators import encode as enc
    from kmers_spark.session import get_spark

    spark = get_spark("kmers_spark_compact")
    if args.rebuild_to:
        m = enc.rebuild_snapshot(
            spark, args.snapshot, args.rebuild_to,
            num_buckets=args.num_buckets, cluster_by=args.cluster_by,
        )
    elif args.stream:
        from kmers_spark.operators.compact import compact_stream, to_batch

        m = compact_stream(spark, args.snapshot,
                           keep_last=args.keep_last)["manifest"]
        if args.to_batch:
            m = to_batch(args.snapshot)
    elif args.to_batch:
        from kmers_spark.operators.compact import to_batch

        m = to_batch(args.snapshot)
    else:
        m = enc.compact_waves(spark, args.snapshot)
    print(json.dumps({"wave_dirs": m["wave_dirs"],
                      "committed_buckets": len(m["committed_buckets"])}))
    spark.stop()


if __name__ == "__main__":
    main()
