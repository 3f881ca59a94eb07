"""Deduplication operators for training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle -> md5 minhash -> band
buckets -> candidate join), SimHash, and n-gram Jaccard verification.

Cross-engine determinism: every hash is md5 (identical hex in Spark and
DuckDB), and min-hash = the lexicographic MIN of salted md5 hex digests
— a valid min-wise hash family, chosen because both engines compute it
identically (no engine-specific 64-bit hash functions anywhere).

Scale notes (the 100 TB story):
  * exact dedup: one shuffle on the digest; map-side partial agg.
  * minhash: signatures are per-doc aggregations (shuffle on doc_id is
    avoided — shingles are built with explode and aggregated right back);
    LSH banding turns all-pairs into an equi-join on (band, band_key),
    which AQE can split on skewed bands.
  * candidate verification joins only within buckets — never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

N_PERM = 8          # minhash permutations (bands of 2 rows -> 4 bands)
BAND_ROWS = 2
SHINGLE_W = 3       # word shingles


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _docs_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ copy(doc_id+100000): a deterministic corpus that
    *contains* duplicates, so dedup operators have nonempty output to
    verify against the oracle (synthetic docs are collision-free)."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    dup = d.select((F.col("doc_id") + F.lit(100000)).alias("doc_id"), "text")
    return d.unionAll(dup)


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via md5 digest: groups with >1 member, keeper = min id."""
    d = _docs_with_dups(spark, sf_dir).filter(F.col("text").isNotNull())
    return (
        d.groupBy(F.md5(F.col("text")).alias("digest"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("doc_id").alias("keeper"))
        .filter(F.col("cnt") > 1)
    )


def _shingles(d: DataFrame, w: int = SHINGLE_W) -> DataFrame:
    """(doc_id, shingle) distinct word w-shingles; split on single space
    (same semantics in DuckDB string_split)."""
    toks = d.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    ).filter(F.size("toks") >= w)
    return toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.size("toks") - w)).alias("i"),
        "toks",
    ).select(
        "doc_id",
        F.concat_ws(" ", F.slice(F.col("toks"), F.col("i") + 1, w)).alias("shingle"),
    ).distinct()


def _signatures_wide(sh: DataFrame, n_perm: int = N_PERM,
                     with_count: bool = False,
                     with_array: bool = False) -> DataFrame:
    """(doc_id, s0..s{n_perm-1}[, n_sh]): every permutation's min-hash
    computed in ONE groupBy(doc_id) pass — n_perm min() aggregates over
    the same shingle rows. The old shape crossJoined the shingle table
    with the perm table (n_perm x row blowup) and aggregated on
    (doc_id, perm): same md5 count, but n_perm times the rows through
    the partial aggregate and a shuffle keyed n_perm times wider
    (guide §2.3: aggregate before you shuffle / shuffle fewer bytes).
    Values are identical — min over the doc's shingles of
    md5('<p>:<shingle>'). `with_count` rides the per-doc shingle count
    on the same pass (ngram_jaccard's |A| sizes — no second aggregate
    over the shingle table); `with_array` rides the doc's distinct
    shingle set as an array (ngram_jaccard's exact-intersection
    operand — bounded by the document's own length)."""
    aggs = [
        F.min(
            F.md5(F.concat_ws(":", F.lit(p), F.col("shingle")))
        ).alias(f"s{p}")
        for p in range(n_perm)
    ]
    if with_count:
        aggs.append(F.count(F.lit(1)).alias("n_sh"))
    if with_array:
        aggs.append(F.collect_list("shingle").alias("sh_arr"))
    return sh.groupBy("doc_id").agg(*aggs)


def _wide_to_long(wide: DataFrame, n_perm: int) -> DataFrame:
    """(doc_id, s0..) -> (doc_id, perm, sig) — minhash_signatures'
    declared output shape (stack is a generator, no shuffle)."""
    pairs = ", ".join(f"{p}, s{p}" for p in range(n_perm))
    return wide.select(
        "doc_id", F.expr(f"stack({n_perm}, {pairs}) as (perm, sig)")
    )


def _signatures_from_shingles(sh: DataFrame, n_perm: int = N_PERM) -> DataFrame:
    return _wide_to_long(_signatures_wide(sh, n_perm), n_perm)


def minhash_signatures(spark: SparkSession, sf_dir: str, n_perm: int = N_PERM) -> DataFrame:
    """(doc_id, perm, sig): sig = min over shingles of md5(perm || ':' || shingle).

    The lexicographic min of a uniform hex hash is a valid min-hash; salt
    `perm` gives independent permutations. DuckDB computes the identical
    value (md5 + string min are engine-portable).
    """
    sh = _shingles(_docs_with_dups(spark, sf_dir).filter(F.col("text").isNotNull()))
    return _signatures_from_shingles(sh, n_perm)


def _pairs_from_wide(wide: DataFrame, n_perm: int = N_PERM,
                     band_rows: int = BAND_ROWS) -> DataFrame:
    """LSH candidate pairs from the WIDE signature table: each band's
    key is assembled directly from its signature columns (identical to
    the old collect_list+array_sort — array_sort normalizes the
    nondeterministic collect order), so the per-band groupBy shuffle
    disappears; only (band, band_key) rows reach the self-join."""
    n_bands = n_perm // band_rows
    keys = [
        F.concat_ws("|", F.array_sort(F.array(*[
            F.col(f"s{b * band_rows + r}") for r in range(band_rows)
        ]))).alias(f"b{b}")
        for b in range(n_bands)
    ]
    pairs = ", ".join(f"{b}, b{b}" for b in range(n_bands))
    bands = wide.select("doc_id", *keys).select(
        "doc_id", F.expr(f"stack({n_bands}, {pairs}) as (band, band_key)")
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str, n_perm: int = N_PERM,
                      band_rows: int = BAND_ROWS) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band.

    band key = concat of the band's signature rows; equi-join on
    (band, key) — never an all-pairs comparison.
    """
    sh = _shingles(_docs_with_dups(spark, sf_dir).filter(F.col("text").isNotNull()))
    return _pairs_from_wide(_signatures_wide(sh, n_perm), n_perm, band_rows)


def ngram_jaccard(spark: SparkSession, sf_dir: str, threshold: float = 0.8) -> DataFrame:
    """Verify LSH candidates with exact shingle Jaccard (the verify stage
    of the dedup pipeline; joins only candidate pairs).

    One groupBy over the shingle table produces the minhash signature
    columns, the |A| sizes, AND the per-doc distinct-shingle ARRAY (all
    bounded by the doc's own length); the wide table is checkpointed
    once and serves the band self-join and both sides of the candidate
    join. The exact intersection is then size(array_intersect(A, B))
    per candidate pair — a projection — instead of the old shape's two
    extra shuffles of the full shingle table (by doc_a, then by
    (doc_b, shingle)) plus a count aggregate over every matched
    shingle row (guide §2.3/§2.4: the shuffled artifact shrinks from
    the exploded shingle rows to one array per doc, moved only for
    candidate pairs). localCheckpoint (not persist): its blocks are
    released when the returned DataFrame is garbage-collected, while a
    persist'd plan would sit in the CacheManager for the session's
    lifetime."""
    sh = _shingles(
        _docs_with_dups(spark, sf_dir).filter(F.col("text").isNotNull())
    )
    wide = _signatures_wide(
        sh, with_count=True, with_array=True
    ).localCheckpoint(eager=True)
    pairs = _pairs_from_wide(wide)
    a = wide.select(F.col("doc_id").alias("doc_a"),
                    F.col("n_sh").alias("na"), F.col("sh_arr").alias("arr_a"))
    b = wide.select(F.col("doc_id").alias("doc_b"),
                    F.col("n_sh").alias("nb"), F.col("sh_arr").alias("arr_b"))
    return (
        pairs.join(a, "doc_a").join(b, "doc_b")
        # shingle sets are distinct by construction, so the intersect
        # size is exactly |A ∩ B| — same integers as the old join+count
        .withColumn("n_inter", F.size(F.array_intersect("arr_a", "arr_b")))
        .filter(F.col("n_inter") > 0)
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash from token md5 nibbles: per bit, sign of sum(±1).

    Expressed portably: bit b of token-hash = (int from md5 hex nibble)
    >> ... computed via conv(); per-doc per-bit vote, then bits -> int.
    """
    d = _docs_with_dups(spark, sf_dir).filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    # 16 bits from the first 4 hex chars of md5(tok)
    h = toks.select(
        "doc_id", F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("long").alias("h16")
    )
    # all 16 per-bit votes in ONE groupBy(doc_id) pass (16 sum()
    # aggregates over the same token rows), then bits -> int in the
    # projection. The old shape exploded every token 16x and aggregated
    # twice (per (doc_id, bit), then per doc_id) — 16x the rows through
    # the partial aggregate and an extra shuffle for identical integer
    # sums (guide §2.3).
    votes = h.groupBy("doc_id").agg(*[
        F.sum(F.expr(f"(shiftright(h16, {b}) & 1) * 2 - 1")).alias(f"v{b}")
        for b in range(16)
    ])
    bitvals = [
        F.when(F.col(f"v{b}") > 0, F.expr(f"shiftleft(1L, {b})")).otherwise(F.lit(0))
        for b in range(16)
    ]
    total = bitvals[0]
    for bv in bitvals[1:]:
        total = total + bv
    return votes.select("doc_id", total.alias("simhash"))


def dedup_clusters(spark: SparkSession, sf_dir: str, max_iter: int = 10) -> DataFrame:
    """Duplicate clusters from LSH candidate pairs via min-label
    propagation (connected components): every doc converges to the
    smallest doc_id reachable through candidate edges.

    Scale shape: each iteration is one self-join + min-aggregate on the
    label table (shuffle on doc_id); iterations ~ graph diameter, which
    for dup clusters is tiny. No driver-side graph state.

    The edge table is materialized once (eager localCheckpoint): every
    iteration (plus its convergence count) joins against it, and without
    it the full shingle->minhash->band pipeline would be recomputed each
    time. (localCheckpoint is executor-local — on a real cluster use a
    reliable checkpoint dir / write-through for fault tolerance.)
    """
    pairs = minhash_lsh_pairs(spark, sf_dir)
    edges = pairs.unionAll(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).localCheckpoint(eager=True)
    nodes = edges.select(F.col("doc_a").alias("doc_id")).distinct()
    labels = nodes.withColumn("label", F.col("doc_id"))
    # convergence check: labels are NON-INCREASING (least of self and
    # min-neighbor), so any change strictly lowers sum(label) — one
    # cheap aggregate over the fresh checkpoint replaces the old
    # join-labels-against-new-labels count job per iteration (r6;
    # guide §2.4: the join existed only to detect a scalar)
    prev_sum = None
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges.doc_b == labels.doc_id)
            .groupBy("doc_a")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neigh, labels.doc_id == neigh.doc_a, "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
            )
        )
        new_labels = new_labels.localCheckpoint()  # truncate the iterative lineage
        cur_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select("doc_id", F.col("label").alias("cluster"))
