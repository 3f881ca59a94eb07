"""spark-submit entry point for wave compaction (maintenance job).

Usage:
  spark-submit --py-files dist/kmers_spark.zip jobs/compact.py \
      --snapshot /path/to/snapshot

Rewrites all committed wave directories into one (payloads verbatim —
no re-encode) and atomically swaps the manifest's wave list; orphaned
dirs from either side of a crash are swept on the next run.
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
    args = ap.parse_args()

    from kmers_spark.operators import encode as enc
    from kmers_spark.session import get_spark

    spark = get_spark("kmers_spark_compact")
    m = enc.compact_waves(spark, args.snapshot)
    print(json.dumps({"wave_dirs": m["wave_dirs"],
                      "committed_buckets": len(m["committed_buckets"])}))
    spark.stop()


if __name__ == "__main__":
    main()
