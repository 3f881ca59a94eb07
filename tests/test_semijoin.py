"""semijoin_scan (operators/semijoin.py): dynamic-partition-pruning
analog over the encoded store — dim keys collected driver-bounded,
buckets pruned via zone bounds + column Bloom sidecars with zero Spark
jobs, survivors decoded, broadcast join for exactness.

Covers: exact semi/inner semantics vs a plain Spark join on the raw
frame (dup dim keys, NULL keys, extra filters), bucket pruning asserted
with a decode spy on a Bloom-covered store, the three key-count regimes
(push-IN, big-key-set, overflow fallback) returning identical rows,
literal-iterable dims, empty dims, projection, and the sorted-IN zone
bisect fast path (zonemap.may_match over tuple bound lists).
"""
import pytest
from pyspark.sql import functions as F

from kmers_spark import zonemap
from kmers_spark.operators import decode as dmod
from kmers_spark.operators import semijoin as sjmod
from kmers_spark.operators.encode import encode_table
from kmers_spark.operators.semijoin import semijoin_scan


@pytest.fixture(scope="module")
def docs(spark):
    """900 rows; host is high-cardinality (bloom-covered), n int64."""
    return spark.range(900).select(
        F.concat(F.lit("k-"), F.format_string("%04d", "id")).alias("k"),
        F.concat(F.lit("host-"), F.format_string("%04d", "id")).alias("host"),
        (F.col("id") * 3).alias("n"),
        F.concat(F.lit("body "), "id").alias("body"),
    ).cache()


@pytest.fixture(scope="module")
def store(docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sj") / "snap")
    encode_table(docs, out, key="k", num_buckets=8, detect_skew=False,
                 bloom_columns=["host"])
    return out


def _spy(monkeypatch):
    calls = []
    real = dmod.decode_colocated

    def spy(spark, out_dir, **kw):
        calls.append(sorted(kw.get("buckets") or []))
        return real(spark, out_dir, **kw)

    monkeypatch.setattr(dmod, "decode_colocated", spy)
    return calls


def _rows(df, cols=("k", "host", "n", "body")):
    return sorted(tuple(r) for r in df.select(*cols).collect())


# ------------------------------------------------------------ semantics

def test_semi_matches_spark_join(spark, docs, store):
    dim = spark.createDataFrame(
        [("host-0003", "x"), ("host-0003", "y"),  # dup key: no dup rows
         ("host-0500", "z"), ("host-9999", "w"),  # absent key
         (None, "n")],                            # NULL never joins
        "host string, tag string")
    got = semijoin_scan(spark, store, "host", dim)
    want = docs.join(dim.select("host").distinct(), "host", "leftsemi")
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) == 2


def test_inner_attaches_dim_columns(spark, docs, store):
    dim = spark.createDataFrame(
        [("host-0003", "x"), ("host-0003", "y"), ("host-0500", "z")],
        "host string, tag string")
    got = semijoin_scan(spark, store, "host", dim, how="inner")
    want = docs.join(dim, "host", "inner")
    cols = ("k", "host", "n", "body", "tag")
    assert _rows(got, cols) == _rows(want, cols)
    assert len(_rows(got, cols)) == 3  # dup dim key duplicates, as SQL


def test_extra_filters_and_projection(spark, docs, store):
    dim = spark.createDataFrame(
        [(h,) for h in ("host-0003", "host-0500", "host-0700")],
        "host string")
    got = semijoin_scan(spark, store, "host", dim,
                        filters=[("n", ">=", 1500)], columns=["k", "n"])
    want = (docs.filter("n >= 1500")
            .join(dim, "host", "leftsemi").select("k", "n"))
    assert sorted(got.columns) == ["k", "n"]
    assert _rows(got, ("k", "n")) == _rows(want, ("k", "n"))


def test_literal_iterable_dim(spark, docs, store):
    got = semijoin_scan(spark, store, "host",
                        ["host-0001", "host-0042", None, "host-0042"])
    assert len(_rows(got)) == 2
    with pytest.raises(ValueError, match="inner"):
        semijoin_scan(spark, store, "host", ["host-0001"], how="inner")


def test_empty_dim(spark, store):
    got = semijoin_scan(spark, store, "host", [])
    assert got.count() == 0
    assert got.columns == ["k", "host", "n", "body"]


# -------------------------------------------------------------- pruning

def test_bloom_pruned_decode(spark, store, monkeypatch):
    """Present keys decode only their holder buckets (+fpr stragglers);
    hash-bucketed zone bounds alone could never prune equality."""
    calls = _spy(monkeypatch)
    got = semijoin_scan(spark, store, "host", ["host-0003", "host-0500"])
    assert len(_rows(got)) == 2
    assert len(calls) == 1 and calls[0] and len(calls[0]) <= 4  # of 8


def test_absent_keys_zero_decode(spark, store, monkeypatch):
    """Keys INSIDE every bucket's zone range but absent from the data:
    only the Bloom layer can prune these, and it prunes to nothing."""
    calls = _spy(monkeypatch)
    got = semijoin_scan(spark, store, "host", ["host-0003x", "host-0500x"])
    assert got.count() == 0
    assert calls == []  # all buckets Bloom-pruned: no decode at all


def test_bigkey_path_pruned_and_exact(spark, docs, store, monkeypatch):
    """push_in_max=0 forces the big-key-set path: manual prune + kernel
    IN + broadcast leftsemi (no giant JVM OR-chain)."""
    calls = _spy(monkeypatch)
    keys = ["host-0003", "host-0500", "host-9999"]
    got = semijoin_scan(spark, store, "host", keys, push_in_max=0)
    want = docs.filter(F.col("host").isin(keys))
    assert _rows(got) == _rows(want)
    assert len(calls) == 1 and len(calls[0]) <= 4


def test_overflow_fallback_exact(spark, docs, store):
    """keys_max=1 forces the uncollectable-dim fallback: full scan +
    Spark join, still exact."""
    dim = spark.createDataFrame(
        [("host-0003", "x"), ("host-0500", "y")], "host string, tag string")
    got = semijoin_scan(spark, store, "host", dim, keys_max=1)
    want = docs.join(dim.select("host").distinct(), "host", "leftsemi")
    assert _rows(got) == _rows(want)
    got_i = semijoin_scan(spark, store, "host", dim, keys_max=1, how="inner")
    want_i = docs.join(dim, "host", "inner")
    cols = ("k", "host", "n", "body", "tag")
    assert _rows(got_i, cols) == _rows(want_i, cols)


def test_overflow_literal_dim_still_filters(spark, docs, store):
    """Regression: a literal key iterable past keys_max used to fall
    through to _finish with no dim frame and NO keys — the semi filter
    silently vanished and the full store came back. The driver already
    holds the iterable, so overflow turns it into the join's dim."""
    keys = ["host-0003", "host-0500", "host-9999"]
    got = semijoin_scan(spark, store, "host", keys, keys_max=2)
    want = docs.where(F.col("host").isin(keys))
    assert _rows(got) == _rows(want)
    assert got.count() == 2  # not 900


def test_int_keys_zone_pruning_on_clustered(spark, tmp_path, monkeypatch):
    """On a store range-clustered BY the join column, zone bounds alone
    prune — no blooms needed; big sorted key list bisects per bucket."""
    df = spark.range(4000).select(
        F.format_string("u%05d", "id").alias("k"),
        F.col("id").alias("n"))
    out = str(tmp_path / "csnap")
    encode_table(df, out, key="k", num_buckets=16, detect_skew=False,
                 cluster_by="n")
    calls = _spy(monkeypatch)
    keys = list(range(100, 140))  # one narrow n-range: ~1-2 buckets
    got = semijoin_scan(spark, out, "n", keys, push_in_max=0)
    assert got.count() == 40
    assert len(calls) == 1 and len(calls[0]) <= 3


def test_inner_collision_raises(spark, store):
    dim = spark.createDataFrame([("host-0003", 5)], "host string, n long")
    with pytest.raises(ValueError, match="collide"):
        semijoin_scan(spark, store, "host", dim, how="inner")


# ------------------------------------------------- zonemap sorted bisect

def test_may_match_bisect_tuple_equals_linear():
    rng = (100, 200)
    big_in = tuple(sorted(set(range(0, 1000, 7))))
    assert zonemap.may_match(rng, "in", big_in) == any(
        100 <= v <= 200 for v in big_in)
    miss = tuple(sorted(set(range(300, 5000, 7))))
    assert zonemap.may_match(rng, "in", miss) is False
    edge_lo = tuple(sorted({50, 100}))
    edge_hi = tuple(sorted({200, 999}))
    # <=32 entries: linear path — same answers
    assert zonemap.may_match(rng, "in", edge_lo)
    assert zonemap.may_match(rng, "in", edge_hi)
    big_edge = tuple(sorted(set(range(200, 10_000))))   # lo touches hi
    assert zonemap.may_match(rng, "in", big_edge)
    big_below = tuple(sorted(set(range(-5000, 101))))   # max key == lo
    assert zonemap.may_match(rng, "in", big_below)
    all_below = tuple(sorted(set(range(-5000, 100))))   # every key < lo
    assert zonemap.may_match(rng, "in", all_below) is False


def test_normalize_sorts_in_lists():
    schema = {"n": "int64", "d": "double"}
    norm = zonemap.normalize_filters([("n", "in", [5, 1, 5, 3])], schema)
    assert norm[0][2] == (1, 3, 5)  # deduped, sorted, tuple-marked
    nan = float("nan")
    normd = zonemap.normalize_filters([("d", "in", [2.0, nan])], schema)
    assert isinstance(normd[0][2], list)  # NaN list: order preserved
