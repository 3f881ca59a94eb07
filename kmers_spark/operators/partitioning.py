"""Skew-aware salted bucketing for the encode job.

Blocks are grouped by *host* (url prefix) so values inside a block are
similar — that's what makes dict/FSST pay off — but Zipf-skewed hosts
(FIXTURES.md §1: Zipf a=1.3) would make single-host blocks arbitrarily
large. Hot hosts therefore get split across `n_salts` sub-buckets via a
second hash of the full url: bucket = xxhash64(host, salt) % B.

The salt is derived from the row itself (url), so assignment is
deterministic and recorded in the manifest — decode doesn't need it
(blocks are self-describing) but resume does (identical re-assignment).

AQE's skew handling only covers joins, not applyInPandas groups — hence
explicit salting here (SURVEY.md §4).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

HOST_PATTERN = r"^[a-z]+://([^/]+)"
_HOST_RE = re.compile(HOST_PATTERN)


BUCKET_SCHEME = "host_or_key"          # written into new manifests
LEGACY_SCHEME = "host_only"            # pre-scheme snapshots


def with_host(df: DataFrame, url_col: str = "url",
              scheme: str = BUCKET_SCHEME) -> DataFrame:
    """Grouping host for bucketing: the url's host when the key is
    url-shaped, else the key value itself (cast to string). Without the
    fallback a non-url key column (event_id, doc_id) extracts host ""
    for EVERY row and the whole table degenerates into one bucket —
    zero encode parallelism at any scale.

    The scheme is part of the snapshot FORMAT: the manifest records it
    at table creation and every later operation (resume, lookups) must
    hash the way the committed blocks were hashed — re-assigning rows
    of a half-encoded legacy snapshot would duplicate already-committed
    buckets, and probing with the wrong scheme silently misses keys."""
    key = F.col(url_col).cast("string")
    host = F.regexp_extract(key, HOST_PATTERN, 1)
    if scheme == LEGACY_SCHEME:
        return df.withColumn("_host", host)
    return df.withColumn("_host", F.when(host != F.lit(""), host).otherwise(key))


def detect_hot_keys(df: DataFrame, num_buckets: int, url_col: str = "url",
                    sample_fraction: float | None = None) -> dict[str, int]:
    """hosts whose row count would overflow one bucket -> n_salts to split into.

    One aggregation over (a sample of) the input. Only hosts that exceed
    the per-bucket target reach the driver — at most `num_buckets` of them
    can exist (each holds > total/num_buckets rows), so the collected dict
    is bounded regardless of host cardinality (Common Crawl has ~10^8
    distinct hosts; collecting all their counts would OOM the driver).
    """
    d = with_host(df, url_col)
    if sample_fraction and sample_fraction < 1.0:
        d = d.sample(fraction=sample_fraction, seed=42)
    counts = d.groupBy("_host").count()
    total_row = counts.select(F.sum("count").alias("t")).collect()[0]
    total = int(total_row["t"] or 0)
    if total == 0:
        return {}
    target = max(total / num_buckets, 1.0)
    # executor-side filter: n_salts > 1  <=>  count >= target. Hot hosts
    # are few by definition; everything else never leaves the executors.
    rows = counts.filter(F.col("count") >= F.lit(target)).collect()
    return {r["_host"]: int(r["count"] // target) + 1 for r in rows}


def with_bucket(df: DataFrame, num_buckets: int, hot_keys: dict[str, int],
                url_col: str = "url", scheme: str = BUCKET_SCHEME) -> DataFrame:
    """Add a `bucket` column: hash(host, salt) % B with per-hot-host salts.

    hot_keys is a small dict -> broadcast join (no shuffle of the big side
    beyond the groupBy that follows anyway).
    """
    d = with_host(df, url_col, scheme)
    if hot_keys:
        spark = df.sparkSession
        hot_df = spark.createDataFrame(
            [(k, v) for k, v in hot_keys.items()], "_host string, _n_salts int"
        )
        d = d.join(F.broadcast(hot_df), "_host", "left")
        salt = F.when(
            F.col("_n_salts").isNotNull(),
            F.pmod(F.xxhash64(F.col(url_col)), F.col("_n_salts")),
        ).otherwise(F.lit(0))
    else:
        salt = F.lit(0)
    d = d.withColumn(
        "bucket",
        F.pmod(F.xxhash64(F.col("_host"), salt.cast("long")), F.lit(num_buckets)).cast("int"),
    )
    return d.drop("_host", "_n_salts") if hot_keys else d.drop("_host")


def bucket_for_key(key: str, num_buckets: int, hot_keys: dict[str, int],
                   scheme: str = BUCKET_SCHEME) -> int:
    """Driver-side mirror of with_bucket for ONE key: same regex host
    extraction, same salt rule, same xxhash64 chaining — golden-tested
    against the Spark expression (test_encode_e2e). Lets point lookups
    map probe keys to buckets without running a Spark job. `scheme`
    must be the snapshot's recorded bucket_scheme — probing with the
    wrong one silently misses keys in pre-scheme snapshots."""
    from .. import sparkhash

    m = _HOST_RE.match(key)
    if scheme == LEGACY_SCHEME:
        host = m.group(1) if m else ""  # regexp_extract "" on no match
    else:
        host = m.group(1) if m else key  # non-url key: the key itself
    n_salts = hot_keys.get(host)
    salt = sparkhash.pmod(sparkhash.xxhash64(key), n_salts) if n_salts else 0
    return sparkhash.pmod(sparkhash.xxhash64(host, salt), num_buckets)
