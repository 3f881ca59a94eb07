"""Reference query semantics (SURVEY.md §2.8 crosswalk) as Spark plans.

The `documents.text` column is the sequence corpus: `seq` is its
ACGT-alphabet projection (upper + strip non-ACGT), per FIXTURES.md §2.
All operators are pure DataFrame expressions — whole-stage-codegen'd,
no Python in the hot path; the windowed ones use explode(sequence())
(the lateral-window form of SeqVecKmerIterator, seq_vector.rs:260-300)
or bounded window frames (SeqVecMinimizerIter, minimizers.rs:38-142).
"""

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

RC_FROM, RC_TO = "ACGT", "TGCA"


def _docs_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.regexp_replace(F.upper(F.col("text")), "[^ACGT]", "").alias("seq"),
    ).filter(F.col("seq").isNotNull())


def _rc(col):
    """reverse complement, string domain — oracle form of
    Kmer::to_reverse_complement (naive_impl/kmer.rs:124-136)."""
    return F.reverse(F.translate(col, RC_FROM, RC_TO))


def _kmers(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """(doc_id, pos, kmer) for all overlapping windows — W7."""
    seqs = _docs_seq(spark, sf_dir).filter(F.length("seq") >= k)
    return seqs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("seq") - (k - 1))).alias("pos"),
        "seq",
    ).select("doc_id", "pos", F.expr(f"substring(seq, pos, {k})").alias("kmer"))


def kmer_extract(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    return _kmers(spark, sf_dir, k)


def revcomp_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: per-document reverse complement of the full seq."""
    return _docs_seq(spark, sf_dir).select(
        "doc_id", "seq", _rc(F.col("seq")).alias("revcomp")
    )


def canonical_kmers(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """T7: canonical = least(kmer, rc(kmer))."""
    km = _kmers(spark, sf_dir, k)
    return km.select(
        "doc_id",
        "pos",
        "kmer",
        F.least(F.col("kmer"), _rc(F.col("kmer"))).alias("canonical"),
    )


def canonical_count(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """T7 + groupBy: abundance of each canonical k-mer (partial agg map-side;
    the shuffle key is the canonical form, mirroring canonical-key joins)."""
    return (
        canonical_kmers(spark, sf_dir, k)
        .groupBy("canonical")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def minimizer_lex(spark: SparkSession, sf_dir: str, k: int = 9, w: int = 4) -> DataFrame:
    """W10 under LexHasher (lex order == hash order, hash.rs:84-104):
    per k-window minimum w-mer via a bounded window frame — Spark's
    window exec maintains the same monotonic structure the reference's
    deque does (minimizers.rs:60-81)."""
    from pyspark.sql import Window as W

    wmers = _kmers(spark, sf_dir, w).withColumnRenamed("kmer", "wmer")
    frame = (
        W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, k - w)
    )
    n_k = F.count(F.lit(1)).over(W.partitionBy("doc_id"))
    return (
        wmers.withColumn("minimizer", F.min("wmer").over(frame))
        .withColumn("_n_wmers", n_k)
        .filter(F.col("pos") <= F.col("_n_wmers") - (k - w))
        .select("doc_id", F.col("pos").alias("kpos"), "minimizer")
    )


def valid_window_scan(spark: SparkSession, sf_dir: str, k: int = 4) -> DataFrame:
    """W8: windows over the *raw* uppercased text, emitting only windows of
    valid symbols (CanonicalKmerIterator skip rule) with their positions."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = docs.select("doc_id", F.upper(F.col("text")).alias("raw")).filter(
        F.col("raw").isNotNull() & (F.length("raw") >= k)
    )
    win = raw.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("raw") - (k - 1))).alias("pos"),
        "raw",
    ).select("doc_id", "pos", F.expr(f"substring(raw, pos, {k})").alias("window"))
    return win.filter(F.col("window").rlike("^[ACGT]+$")).select(
        "doc_id", "pos", F.col("window").alias("kmer")
    )


def kmer_pack_roundtrip(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """E4+D5 (any k, multi-word above 32): pack each k-mer into a
    [u64; B] word array and unpack it back, whole Arrow batch at a time —
    the batch is one (n, k) uint8 matrix, no per-string Python
    (kernels.domain.pack_batch/unpack_batch). Oracle: decoded ==
    lower(kmer) identity projection."""
    from ..kernels import domain

    @F.pandas_udf("string")
    def pack_unpack(kmers: pd.Series) -> pd.Series:
        if not len(kmers):
            return pd.Series([], dtype=object)
        words = domain.pack_batch(domain.codes_matrix(kmers.to_numpy(), k))
        return pd.Series(domain.unpack_batch(words, k).astype(str))

    km = _kmers(spark, sf_dir, k)
    return km.select("doc_id", "pos", "kmer", pack_unpack(F.col("kmer")).alias("decoded"))


def kmer_canonical_packed(spark: SparkSession, sf_dir: str, k: int = 45) -> DataFrame:
    """T7/E8 in the packed multi-word domain (k > 32): canonical =
    min(fw, rc) comparing the PACKED value (kmer.rs semantics — low bits
    hold the first base, so the packed order is the lex order of the
    REVERSED sequence; the SQL oracle replicates it with
    reverse-string comparison). Full pipeline: string -> [u64; B] ->
    revcomp/canonical in word domain -> decode back to string."""
    from ..kernels import domain

    @F.pandas_udf("string")
    def canonical(kmers: pd.Series) -> pd.Series:
        if not len(kmers):
            return pd.Series([], dtype=object)
        words = domain.pack_batch(domain.codes_matrix(kmers.to_numpy(), k))
        canon = domain.canonical_batch(words, k)
        return pd.Series(domain.unpack_batch(canon, k).astype(str))

    km = _kmers(spark, sf_dir, k)
    return km.select("doc_id", "pos", "kmer", canonical(F.col("kmer")).alias("canonical_packed"))


def seq_slice_lookup(spark: SparkSession, sf_dir: str, k: int = 9) -> DataFrame:
    """W6/SeqVectorSlice (seq_vector.rs:25-81): pack each document's seq
    to 2 bits ONCE, then answer point lookups — k-mer at position p —
    by reading only the ~9 payload bytes that hold it (no block decode).
    Three lookups per doc (start / middle / end); oracle is plain
    substr arithmetic on the unpacked sequence."""
    from ..kernels import domain

    # batch prep stays at the buffer level: pandas<->Arrow conversion is
    # C-side, and the kernels consume (uint8 buffer, offsets) directly —
    # no Python call or bytes materialization per document (VERDICT r2)
    import pyarrow as pa

    from .. import arrowview as av

    @F.pandas_udf("binary")
    def pack(seqs: pd.Series) -> pd.Series:
        data, offs = av.bytes_view(pa.array(seqs, type=pa.large_string()))
        out_data, out_offs = domain.pack_seq_batch(data, offs)
        return av.make_string_array(out_data, out_offs, None, "binary").to_pandas()

    @F.pandas_udf("string")
    def lookup(packed: pd.Series, pos: pd.Series) -> pd.Series:
        data, offs = av.bytes_view(pa.array(packed, type=pa.large_binary()))
        words = domain.slice_kmers_packed_view(
            data, offs, pos.to_numpy(dtype=np.int64), k
        )
        return pd.Series(domain.unpack_batch(words.reshape(-1, 1), k).astype(str))

    seqs = _docs_seq(spark, sf_dir).filter(F.length("seq") >= k)
    packed = seqs.select(
        "doc_id", F.length("seq").alias("slen"), pack(F.col("seq")).alias("packed")
    )
    lookups = packed.select(
        "doc_id",
        "packed",
        F.explode(
            F.array(
                F.struct(F.lit("start").alias("which"), F.lit(0).cast("long").alias("pos")),
                F.struct(F.lit("mid").alias("which"),
                         ((F.col("slen") - k) / 2).cast("long").alias("pos")),
                F.struct(F.lit("end").alias("which"),
                         (F.col("slen") - k).cast("long").alias("pos")),
            )
        ).alias("lk"),
    ).select("doc_id", F.col("lk.which").alias("which"), F.col("lk.pos").alias("pos"), "packed")
    return lookups.select(
        "doc_id", "which", "pos", lookup(F.col("packed"), F.col("pos")).alias("kmer")
    )


def xor10_roundtrip(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """E3+D3: the table-free arithmetic codec (xor10.rs:17-32) — encode
    each k-mer via code = (ascii >> 1) & 0b11, pack to [u64; B], decode
    back through BITS2NUC, and emit the xor10 complement (bits ^ 0b10,
    xor10.rs:34-40). rev_comp is intentionally absent (buggy upstream).

    Oracle: decoded == kmer; complemented == translate(kmer, ACGT->TGCA)
    (complement WITHOUT reversal — xor10 complement is positionwise)."""
    from ..kernels import domain

    @F.pandas_udf("decoded string, complemented string")
    def codec(kmers: pd.Series) -> pd.DataFrame:
        if not len(kmers):
            return pd.DataFrame({"decoded": [], "complemented": []}, dtype=object)
        codes = domain.xor10_codes_matrix(kmers.to_numpy(), k)
        words = domain.pack_batch(codes)
        dec = domain.xor10_unpack_batch(words, k).astype(str)
        comp_words = domain.pack_batch(domain.xor10_complement(codes))
        comp = domain.xor10_unpack_batch(comp_words, k).astype(str)
        return pd.DataFrame({"decoded": dec, "complemented": comp})

    km = _kmers(spark, sf_dir, k)
    return km.select("doc_id", "pos", "kmer", codec(F.col("kmer")).alias("x")).select(
        "doc_id", "pos", "kmer", F.col("x.decoded").alias("decoded"),
        F.col("x.complemented").alias("complemented"),
    )


def minimizer_seeded(spark: SparkSession, sf_dir: str, k: int = 9, w: int = 4,
                     seed: int = 42) -> DataFrame:
    """W9+H4: randomized minimizer selection with an explicit, recorded
    seed (the reference uses std SipHash RandomState — kmer.rs:564; our
    determinism requirement makes the seed part of the query). The hash
    is md5(seed || wmer) so the DuckDB oracle computes the identical
    permutation."""
    from pyspark.sql import Window as W

    wmers = _kmers(spark, sf_dir, w).withColumnRenamed("kmer", "wmer")
    h = F.md5(F.concat_ws(":", F.lit(seed), F.col("wmer")))
    frame = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, k - w)
    n_k = F.count(F.lit(1)).over(W.partitionBy("doc_id"))
    return (
        wmers.withColumn("minimizer_hash", F.min(h).over(frame))
        .withColumn("_n_wmers", n_k)
        .filter(F.col("pos") <= F.col("_n_wmers") - (k - w))
        .select("doc_id", F.col("pos").alias("kpos"), "minimizer_hash")
    )


def space_sizes(spark: SparkSession, sf_dir: str, max_k: int = 8) -> DataFrame:
    """S3/S4: kmer_space(k) = 4^k and canonical_space(k) *as the
    reference implements it* (utils.rs:27-38): odd k -> 4^k/2; even k ->
    4^k/2 - 2k. The even-k formula is the crate's own definition (golden
    values utils.rs:61-72, e.g. canonical_space(4)=120) — replicated as
    documented behavior, not silently 'fixed' (SURVEY.md §5.3)."""
    ks = spark.range(1, max_k + 1).select(F.col("id").cast("int").alias("k"))
    four_k = F.expr("cast(pow(4, k) as long)")
    canonical = F.when(
        F.col("k") % 2 == 1, (four_k / 2).cast("long")
    ).otherwise((four_k / 2).cast("long") - 2 * F.col("k"))
    return ks.select(
        "k", four_k.alias("kmer_space"), canonical.cast("long").alias("canonical_space")
    )
