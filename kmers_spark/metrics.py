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


def table_stats(out_dir: str) -> dict[str, dict]:
    """Per-column {rows, nulls?, min, max} answered from the MANIFEST
    alone — zero Spark jobs, zero file reads (the aggregate-pushdown
    shortcut a 10^12-row count(*)/min/max should take; Iceberg answers
    these from file stats the same way).

    min/max come from the committed zone bounds: exact for
    int64/timestamp/double, CONSERVATIVE for strings (bounds are
    truncated at 32 chars: real min >= reported min, real max <=
    reported max — reported as `min_bound`/`max_bound` to keep the
    distinction honest). Columns with no recorded bounds (all-null
    buckets, legacy snapshots, binary) report bounds as None; `rows`
    is always the exact LOGICAL count (schema-evolved columns read as
    null where no block exists — `physical_rows` counts rows with a
    stored block). Timestamps are reported as epoch-us ints (the
    space bounds are stored in)."""
    m = manifest.load(out_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest in {out_dir}")
    schema = manifest.ordered_schema(m)
    out: dict[str, dict] = {
        c: {"type": t, "rows": 0, "physical_rows": 0, "min_bound": None,
            "max_bound": None, "bounded_buckets": 0, "buckets": 0}
        for c, t in schema.items()
    }
    total_rows = 0
    for stats in manifest.block_stats(out_dir, m).values():
        # logical row count of the bucket: any block's n_rows (every
        # present column spans all of the bucket's rows)
        total_rows += int(stats[0]["n_rows"]) if stats else 0
        for s in stats:
            rec = out.get(s["column"])
            if rec is None:  # dropped from a projection-limited schema? keep safe
                continue
            rec["physical_rows"] += int(s["n_rows"])
            rec["buckets"] += 1
            if "zmin" in s:
                rec["bounded_buckets"] += 1
                if rec["min_bound"] is None or s["zmin"] < rec["min_bound"]:
                    rec["min_bound"] = s["zmin"]
                if rec["max_bound"] is None or s["zmax"] > rec["max_bound"]:
                    rec["max_bound"] = s["zmax"]
    for rec in out.values():
        # logical rows: schema-evolved columns read as null in buckets
        # that predate them, but every column spans every row
        rec["rows"] = total_rows
    # a column with any unbounded non-empty bucket has unknown true
    # extremes — null the bounds rather than report a partial range
    for rec in out.values():
        if rec["bounded_buckets"] < rec["buckets"]:
            rec["min_bound"] = rec["max_bound"] = None
    return out


def codec_summary(out_dir: str) -> dict[str, dict]:
    """Per-column codec mix + sizes from the MANIFEST alone (no Spark,
    no payload reads — the metadata twin of column_metrics): for each
    column, total raw/encoded bytes, ratio, and the codecs the
    auto-selector chose across buckets."""
    m = manifest.load(out_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest in {out_dir}")
    out: dict[str, dict] = {}
    for stats in manifest.block_stats(out_dir, m).values():
        for s in stats:
            rec = out.setdefault(
                s["column"],
                {"raw_nbytes": 0, "enc_nbytes": 0, "codecs": set()},
            )
            rec["raw_nbytes"] += int(s["raw_nbytes"])
            rec["enc_nbytes"] += int(s["enc_nbytes"])
            rec["codecs"].add(s["codec"])
    for rec in out.values():
        rec["ratio"] = round(rec["enc_nbytes"] / max(rec["raw_nbytes"], 1), 4)
        rec["codecs"] = sorted(rec["codecs"])
    return out


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
