"""kernels/vec.py — the Arrow-batched ANN math must be BIT-IDENTICAL to
the expression forms it replaced (functions/ann.py keeps _dot/_norm/
_signed_dot as the executable spec). Any pairwise-summation shortcut
(np.dot, ndarray.sum) would reorder the float adds and break the
oracle-hash contract at the last ulp — these tests pin the left-fold."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kmers_spark.functions import ann
from kmers_spark.kernels import vec as veck

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_rows(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")
    return e, e.collect()


def test_cosine_matches_expression_form_bitwise(spark, emb_rows):
    e, rows = emb_rows
    q = np.asarray(rows[0]["embedding"], dtype=np.float64)
    qdf = e.filter(F.col("vec_id") == rows[0]["vec_id"]).select(
        F.col("embedding").alias("q_emb")
    )
    expr = {
        r["vec_id"]: r["c"]
        for r in e.crossJoin(F.broadcast(qdf)).select(
            "vec_id",
            (ann._dot(F.col("embedding"), F.col("q_emb"))
             / (ann._norm(F.col("embedding")) * ann._norm(F.col("q_emb")))
             ).alias("c"),
        ).collect()
    }
    A = veck.stack_embeddings([r["embedding"] for r in rows])
    kern = veck.cosine_vs_query(A, q)
    for i, r in enumerate(rows):
        assert expr[r["vec_id"]] == float(kern[i])  # exact, not approx


def test_signed_bits_match_expression_form(spark, emb_rows):
    e, rows = emb_rows
    n_planes = 12
    pl = spark.range(n_planes).select(F.col("id").cast("int").alias("plane"))
    expr = {
        (r["vec_id"], r["plane"]): r["bit"]
        for r in e.crossJoin(F.broadcast(pl)).select(
            "vec_id", "plane",
            (ann._signed_dot(F.col("embedding"), F.col("plane")) > 0)
            .cast("long").alias("bit"),
        ).collect()
    }
    A = veck.stack_embeddings([r["embedding"] for r in rows])
    W = veck.plane_weights(list(range(n_planes)), A.shape[1])
    bits = veck.signed_bits(A, W)
    for i, r in enumerate(rows):
        for p in range(n_planes):
            assert expr[(r["vec_id"], p)] == bits[i, p]


def test_argmax_centroid_matches_max_struct(spark, emb_rows):
    """argmax vs the old max(struct(ccos, -cent_id)) aggregate on real
    centroids (a zero-norm centroid cannot be cross-checked in Spark:
    ANSI mode raises DIVIDE_BY_ZERO on the expression form — the
    kernel's NaN rules are pinned separately below)."""
    e, rows = emb_rows
    cents = [(i, [float(x) for x in rows[i]["embedding"]])
             for i in range(5)]
    cdf = spark.createDataFrame(cents, "cent_id bigint, cent_emb array<double>")
    scored = e.crossJoin(F.broadcast(cdf)).select(
        "vec_id", "cent_id",
        (ann._dot(F.col("embedding"), F.col("cent_emb"))
         / (ann._norm(F.col("embedding")) * ann._norm(F.col("cent_emb")))
         ).alias("ccos"),
    )
    want = {
        r["vec_id"]: r["cid"]
        for r in scored.groupBy("vec_id").agg(
            F.max(F.struct(F.col("ccos"), (-F.col("cent_id")).alias("nc"))).alias("m")
        ).select("vec_id", (-F.col("m.nc")).alias("cid")).collect()
    }
    ids = np.array([c[0] for c in cents], dtype=np.int64)
    C = np.stack([np.asarray(c[1]) for c in cents])
    A = veck.stack_embeddings([r["embedding"] for r in rows])
    with np.errstate(divide="ignore", invalid="ignore"):
        got = veck.argmax_centroid(A, C, ids)
    for i, r in enumerate(rows):
        assert want[r["vec_id"]] == got[i]


def test_argmax_centroid_nan_and_tie_rules():
    """Spark struct-ordering semantics the kernel preserves: NaN ranks
    greater than every double; ties (incl. NaN==NaN) pick the SMALLER
    cent_id. (The expression form cannot produce these cases under
    ANSI mode — zero-norm division raises — so the kernel's graceful
    NaN is strictly more tolerant; rules pinned here.)"""
    A = np.array([[1.0, 0.0], [0.0, 2.0]])
    ids = np.array([3, 5, 7], dtype=np.int64)
    # centroid 5 is zero-norm (NaN ccos) -> beats any finite score
    C = np.array([[1.0, 0.0], [0.0, 0.0], [0.0, 1.0]])
    with np.errstate(divide="ignore", invalid="ignore"):
        got = veck.argmax_centroid(A, C, ids)
    assert list(got) == [5, 5]
    # two identical centroids: tie -> smaller cent_id
    C2 = np.array([[1.0, 0.0], [1.0, 0.0]])
    ids2 = np.array([9, 4], dtype=np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        got2 = veck.argmax_centroid(A, C2, np.sort(ids2))
    assert list(got2) == [4, 4]
    # two zero-norm centroids: NaN == NaN, tie -> smaller cent_id
    C3 = np.array([[0.0, 0.0], [0.0, 0.0]])
    ids3 = np.array([2, 6], dtype=np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        got3 = veck.argmax_centroid(A, C3, ids3)
    assert list(got3) == [2, 2]


def test_no_pairwise_summation_regression():
    """A vector crafted so pairwise summation (np.dot) and the left
    fold disagree in the last ulp — seq_dot must take the fold value."""
    rng = np.random.RandomState(7)
    for _ in range(50):
        a = rng.randn(64)
        b = rng.randn(64)
        fold = np.float64(0.0)
        for j in range(64):
            fold = fold + a[j] * b[j]
        got = veck.seq_dot(a[None, :], b)[0]
        assert got == fold
