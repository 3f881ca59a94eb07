"""Per-partition throughput/ratio metrics tables over encoded snapshots
(the north star's observability surface): everything is derived from the
self-describing block table + manifest, no extra bookkeeping."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import manifest
from .operators.encode import read_blocks


def block_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    """(bucket, column, codec, n_rows, raw_nbytes, enc_nbytes, ratio)."""
    return read_blocks(spark, out_dir).select(
        "bucket",
        "column",
        "codec",
        "n_rows",
        "raw_nbytes",
        "enc_nbytes",
        F.round(F.col("enc_nbytes") / F.greatest(F.col("raw_nbytes"), F.lit(1)), 4).alias("ratio"),
    )


def column_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per-column totals + the codec mix the auto-selector chose."""
    return (
        block_metrics(spark, out_dir)
        .groupBy("column")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("raw_nbytes").alias("raw_nbytes"),
            F.sum("enc_nbytes").alias("enc_nbytes"),
            F.round(F.sum("enc_nbytes") / F.sum("raw_nbytes"), 4).alias("ratio"),
            F.sort_array(F.collect_set("codec")).alias("codecs"),
        )
    )


def bucket_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per-bucket sizes — the skew histogram the salting is judged by."""
    return (
        block_metrics(spark, out_dir)
        .groupBy("bucket")
        .agg(
            F.max("n_rows").alias("n_rows"),
            F.sum("raw_nbytes").alias("raw_nbytes"),
            F.sum("enc_nbytes").alias("enc_nbytes"),
        )
    )


def snapshot_summary(spark: SparkSession, out_dir: str) -> dict:
    """Driver-side one-line summary (totals, skew, commit state)."""
    m = manifest.load(out_dir)
    rows = bucket_metrics(spark, out_dir).collect()
    raw = sum(r["raw_nbytes"] for r in rows)
    enc = sum(r["enc_nbytes"] for r in rows)
    sizes = sorted(r["raw_nbytes"] for r in rows)
    return {
        "snapshot_id": m["snapshot_id"],
        "buckets_committed": len(m["committed_buckets"]),
        "num_buckets": m["num_buckets"],
        "raw_nbytes": raw,
        "enc_nbytes": enc,
        "ratio": round(enc / max(raw, 1), 4),
        "bucket_raw_p50": sizes[len(sizes) // 2] if sizes else 0,
        "bucket_raw_max": sizes[-1] if sizes else 0,
        "skew_max_over_p50": round(sizes[-1] / max(sizes[len(sizes) // 2], 1), 2) if sizes else 0.0,
        "hot_keys": len(m.get("hot_keys", {})),
    }


def snapshot_history(out_dir: str) -> list[dict]:
    """One row per manifest version (the immutable commit chain):
    version, committed-bucket count, wave count — the snapshot log
    backing time-travel reads (decode_table(version=N))."""
    from . import manifest

    out = []
    for v in manifest._list_versions(out_dir):
        try:
            m = manifest.load(out_dir, version=v)
        except FileNotFoundError:  # expired tombstone: keep the row
            out.append({"version": v, "expired": True})
            continue
        out.append(
            {
                "version": v,
                "committed_buckets": len(m.get("committed_buckets", [])),
                "waves": len(m.get("wave_dirs", [])),
            }
        )
    return out
