"""Similarity search over the embeddings table (array<float> column).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant (random hyperplane signs -> bucket equi-join) is the scale path:
at 10^12 rows the all-pairs score is infeasible, but hyperplane LSH
keeps the same DataFrame shape — bucket key join + per-bucket rescore.

Dot products use F.aggregate/zip_with (JVM-side, no Python); sums are
in double precision and rounded before comparison so the DuckDB oracle
(list_* free, explicit unnest arithmetic) hashes identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(spark: SparkSession, sf_dir: str, query_id: int = 0, k: int = 10) -> DataFrame:
    """Top-k most-similar vectors to vec_id=query_id (brute force, exact).

    The query vector is a 1-row broadcast — the scan over N vectors is
    embarrassingly parallel, no shuffle until the final top-k (which is
    a TakeOrdered, not a full sort).
    """
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") == query_id).select(
        F.col("embedding").alias("q_emb")
    )
    scored = (
        e.filter(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("q_emb"))
                / (_norm(F.col("embedding")) * _norm(F.col("q_emb"))),
                6,
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def lsh_buckets(spark: SparkSession, sf_dir: str, n_planes: int = 8) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector.

    Hyperplanes are deterministic: plane p, dim d weight = sign pattern
    from a hash — portable to the SQL oracle via the same arithmetic.
    Here: weight(p,d) = +1 if (p*31 + d*17) % 7 < 3 else -1 (fixed,
    documented, seedless — determinism requirement from SURVEY §2.5 H4).
    """
    e = _emb(spark, sf_dir)
    dims = e.select(F.size("embedding").alias("nd")).limit(1).collect()[0]["nd"]
    planes = []
    for p in range(n_planes):
        w = [1.0 if (p * 31 + d * 17) % 7 < 3 else -1.0 for d in range(dims)]
        planes.append((p, w))
    planes_df = spark.createDataFrame(planes, "plane int, w array<double>")
    scored = e.crossJoin(F.broadcast(planes_df)).select(
        "vec_id",
        "plane",
        (_dot(F.col("embedding"), F.col("w")) > 0).cast("int").alias("bit"),
    )
    return scored.groupBy("vec_id").agg(
        F.sum(F.expr("bit * shiftleft(1, plane)")).alias("bucket")
    )


def ann_topk_lsh(spark: SparkSession, sf_dir: str, query_id: int = 0, k: int = 10,
                 n_planes: int = 6) -> DataFrame:
    """ANN: restrict rescoring to the query's LSH bucket, exact cosine inside."""
    buckets = lsh_buckets(spark, sf_dir, n_planes)
    e = _emb(spark, sf_dir).join(buckets, "vec_id")
    qb = e.filter(F.col("vec_id") == query_id).select(
        F.col("bucket").alias("q_bucket"), F.col("embedding").alias("q_emb")
    )
    cand = e.crossJoin(F.broadcast(qb)).filter(
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != query_id)
    )
    return (
        cand.select(
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("q_emb"))
                / (_norm(F.col("embedding")) * _norm(F.col("q_emb"))),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def _emb_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ copy(vec_id+100000): deterministic duplicate vectors
    so near-dup detection has nonempty, oracle-checkable output."""
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    dup = e.select((F.col("vec_id") + F.lit(100000)).alias("vec_id"), "embedding")
    return e.unionAll(dup)


def embedding_dup_pairs(spark: SparkSession, sf_dir: str, n_planes: int = 6,
                        threshold: float = 0.999) -> DataFrame:
    """Embedding-cosine near-duplicates: hyperplane-LSH bucket equi-join
    (identical/near vectors always share all sign bits), exact cosine
    rescoring inside buckets only — never all-pairs.

    Plane weights are the fixed deterministic pattern
    w(p, d) = +1 if (31p + 17d) % 7 < 3 else -1 (documented; the SQL
    oracle recomputes the identical planes)."""
    e = _emb_with_dups(spark, sf_dir)
    dims = e.select(F.size("embedding").alias("nd")).limit(1).collect()[0]["nd"]
    planes = [
        (p, [1.0 if (p * 31 + d * 17) % 7 < 3 else -1.0 for d in range(dims)])
        for p in range(n_planes)
    ]
    planes_df = spark.createDataFrame(planes, "plane int, w array<double>")
    bits = (
        e.crossJoin(F.broadcast(planes_df))
        .select(
            "vec_id",
            "plane",
            (_dot(F.col("embedding"), F.col("w")) > 0).cast("int").alias("bit"),
        )
        .groupBy("vec_id")
        .agg(F.sum(F.expr("bit * shiftleft(1, plane)")).alias("bucket"))
    )
    eb = e.join(bits, "vec_id")
    a = eb.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"), "bucket"
    )
    b = eb.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"), "bucket"
    )
    cand = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    return (
        cand.select(
            "vec_a",
            "vec_b",
            F.round(
                _dot(F.col("emb_a"), F.col("emb_b"))
                / (_norm(F.col("emb_a")) * _norm(F.col("emb_b"))),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
