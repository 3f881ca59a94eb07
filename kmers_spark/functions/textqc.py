"""Text-analysis operators: token counting, quality scoring, language-ID
heuristic, document fingerprinting. All pure DataFrame expressions (JVM
side, codegen'd) with exact DuckDB-SQL equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# deterministic stopword list for the quality/lang heuristics
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "on", "for"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + distinct-token count per doc.

    A doc's tokens all live in its own row, so both counts are array
    projections (size(array_remove(split)), size(array_distinct)) —
    ZERO exchanges. The old explode + groupBy + count_distinct shape
    shuffled every token row twice (count_distinct expands to a
    two-phase aggregate) to compute a per-row quantity (guide §2.4:
    remove shuffles outright). Same rows out: docs whose tokens are
    all empty strings never produced a group, so the size>0 filter
    keeps the surface identical."""
    d = _docs(spark, sf_dir).filter(F.col("text").isNotNull() & (F.col("text") != ""))
    return (
        d.select(
            "doc_id",
            F.array_remove(F.split(F.col("text"), " "), "").alias("toks"),
        )
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens"),
            F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
        )
        .filter(F.col("n_tokens") > 0)
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / mean-word-length / stopword-ratio quality features.

    Deterministic arithmetic only (round to 6dp so Spark and DuckDB
    float formatting agrees through the value-hash).
    """
    d = _docs(spark, sf_dir).filter(F.col("text").isNotNull() & (F.col("text") != ""))
    toks = d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.explode(F.split(F.col("text"), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    sw = [F.lit(s) for s in STOPWORDS]
    return toks.groupBy("doc_id").agg(
        F.max("n_chars").alias("n_chars"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg(F.length("tok")), 6).alias("mean_tok_len"),
        F.round(
            F.sum(F.when(F.col("tok").isin(STOPWORDS), 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("stopword_ratio"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: vowel ratio + mean token length buckets.

    A deterministic stand-in for n-gram LID (the real model is a later
    round / external artifact); the *shape* — per-doc char-class stats
    -> classify — is the production pattern, and both engines compute it
    identically.
    """
    d = _docs(spark, sf_dir).filter(F.col("text").isNotNull() & (F.length("text") > 0))
    feats = d.select(
        "doc_id",
        "lang",
        (
            (F.length("text") - F.length(F.regexp_replace(F.col("text"), "[aeiou]", "")))
            / F.length("text")
        ).alias("vr"),
    )
    return feats.select(
        "doc_id",
        "lang",
        F.round(F.col("vr"), 6).alias("vowel_ratio"),
        F.when(F.col("vr") >= 0.40, F.lit("vowel_heavy"))
        .when(F.col("vr") >= 0.25, F.lit("latin_like"))
        .otherwise(F.lit("other"))
        .alias("guess"),
    )


def repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality features (the RefinedWeb/Gopher-rules
    family): per doc, the share of the most frequent token and the
    duplicate-token fraction. Documents dominated by one token or by
    repeats are boilerplate/spam candidates. Two hash aggregations with
    map-side partials; no Python."""
    d = _docs(spark, sf_dir).filter(F.col("text").isNotNull() & (F.col("text") != ""))
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    per_tok = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    return per_tok.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top_token_share"),
        F.round((F.sum("c") - F.count(F.lit(1))) / F.sum("c"), 6).alias("dup_token_frac"),
    )


def source_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level quality rollup (the host/domain-level filter stage of
    a crawl pipeline: decisions are made per origin, not per page).
    Per source: doc count, mean doc length, mean vowel ratio, and the
    keep/review verdict a threshold rule would emit."""
    d = _docs(spark, sf_dir).filter(F.col("text").isNotNull() & (F.length("text") > 0))
    feats = d.select(
        "source",
        F.length("text").alias("n_chars"),
        (
            (F.length("text") - F.length(F.regexp_replace(F.col("text"), "[aeiou]", "")))
            / F.length("text")
        ).alias("vr"),
    )
    agg = feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("mean_chars"),
        F.round(F.avg("vr"), 6).alias("mean_vowel_ratio"),
    )
    return agg.select(
        "source", "n_docs", "mean_chars", "mean_vowel_ratio",
        F.when((F.col("mean_vowel_ratio") >= 0.25) & (F.col("mean_chars") >= 50),
               F.lit("keep")).otherwise(F.lit("review")).alias("verdict"),
    )


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of the normalized text (lower, collapsed
    whitespace) — the exact-dedup key used upstream of near-dup stages."""
    d = _docs(spark, sf_dir).filter(F.col("text").isNotNull())
    return d.select(
        "doc_id",
        F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), " +", " "))).alias(
            "fingerprint"
        ),
    )
