"""Generic OLAP operators (SURVEY.md §2.7: the reference has none of
these — the engine sources them from Spark built-ins; they're here so a
reference user gets the full query surface with oracle checks).

All plans are whole-stage-codegen'd built-ins: partial (map-side)
aggregation for the groupBys, broadcast-ed dimension joins, bounded
window frames, and the as-of join expressed as a running conditional
max (no all-pairs anything).
"""

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F


def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregate over lineitem."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def join_orders_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join + aggregate: revenue per customer market segment."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
    )


def topk_users_by_value(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-k per group via ranked window (TakeOrdered-style, no full sort)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 4).alias("total_value")
    )
    w = W.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), F.col("user_id")
    )
    return (
        per_user.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("event_type", "user_id", "total_value", "rank")
    )


def sessionize(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: new session when the per-user gap exceeds the
    threshold — lag + running sum over an ordered window."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, 0)).alias("session_id"),
    )


def asof_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark lacks a native one): for every click event, the
    timestamp of the user's most recent error at-or-before it — a running
    conditional max over the per-user ordered stream, not a pair join."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    last_err = F.max(
        F.when(F.col("event_type") == "error", F.col("ts"))
    ).over(w)
    return (
        ev.withColumn("last_error_ts", last_err)
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts", "last_error_ts")
    )


def kmer_orientation(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """T8/T6: orientation tag per k-mer (is_canonical = fw <= rc; the
    word-order and string-order comparisons agree for (s, rc(s)) pairs —
    proof sketch in functions/dna.py tests)."""
    from .dna import _kmers, _rc

    km = _kmers(spark, sf_dir, k)
    return km.select(
        "doc_id",
        "pos",
        "kmer",
        (F.col("kmer") <= _rc(F.col("kmer"))).alias("is_canonical"),
    )


def kmer_equivalency(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """T13: 3-way orientation-aware equality (canonical_kmer.rs:142-161)
    between each k-mer and its successor window in the same document:
    IdentityMatch / TwinMatch / NoMatch."""
    from .dna import _kmers, _rc

    km = _kmers(spark, sf_dir, k)
    w = W.partitionBy("doc_id").orderBy("pos")
    nxt = F.lead("kmer").over(w)
    return (
        km.withColumn("next_kmer", nxt)
        .filter(F.col("next_kmer").isNotNull())
        .select(
            "doc_id",
            "pos",
            F.when(F.col("kmer") == F.col("next_kmer"), "identity")
            .when(F.col("kmer") == _rc(F.col("next_kmer")), "twin")
            .otherwise("none")
            .alias("match_type"),
        )
    )
