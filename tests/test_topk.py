"""topk_table (operators/topk.py): ORDER BY ... LIMIT k with
stats-driven bucket pruning — on a range-clustered store the minimal
boundary suffix decodes; on hash stores it degrades to a full scan.

Covers: exact agreement with Spark's own orderBy().limit() on the
source rows (desc + asc, NULLS LAST), minimal decode on clustered
stores (spy on decode_colocated), hash-store degradation, filters
(correct + still pruned via containment), k larger than the table,
nulls in the order column, boundary ties (strict-inequality rule),
double columns with NaN (maybe-NaN buckets rank unbounded), and
column projection."""
import pytest
from pyspark.sql import functions as F

from kmers_spark.operators import decode as dmod
from kmers_spark.operators.encode import encode_table
from kmers_spark.operators.topk import topk_table


@pytest.fixture(scope="module")
def events(spark):
    return spark.range(2000).select(
        F.concat(F.lit("e"), F.format_string("%05d", "id")).alias("eid"),
        (F.col("id") * 7 % 9973).alias("ts"),
        (F.when(F.col("id") % 13 == 0, None)
          .otherwise(F.col("id") % 5)).alias("sev"),
        F.concat(F.lit("msg "), "id").alias("msg"),
    ).cache()


@pytest.fixture(scope="module")
def clustered(events, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("topk") / "rng")
    encode_table(events, out, key="eid", num_buckets=16, cluster_by="ts")
    return out


def _spy(monkeypatch):
    import kmers_spark.operators.topk as tmod

    calls = []
    real = dmod.decode_colocated

    def spy(spark, out_dir, **kw):
        calls.append(sorted(kw.get("buckets") or []))
        return real(spark, out_dir, **kw)

    # topk binds decode_colocated at import time: patch its name too
    monkeypatch.setattr(dmod, "decode_colocated", spy)
    monkeypatch.setattr(tmod, "decode_colocated", spy)
    return calls


def _truth(events, k, desc=True, extra=None):
    df = events if extra is None else events.filter(extra)
    cols = [F.col("ts"), F.col("eid")]
    cols = [c.desc_nulls_last() for c in cols] if desc else \
        [c.asc_nulls_last() for c in cols]
    return [tuple(r) for r in
            df.orderBy(*cols).limit(k).select("eid", "ts").collect()]


def test_desc_minimal_suffix(spark, events, clustered, monkeypatch):
    calls = _spy(monkeypatch)
    got = topk_table(spark, clustered, ["ts", "eid"], 50)
    rows = [(r["eid"], r["ts"]) for r in got.select("eid", "ts").collect()]
    assert rows == _truth(events, 50)
    # 2000 rows / 16 buckets = 125 per bucket: 50 rows live in the top
    # 1-2 boundary buckets (strict-tie rule may add one more)
    assert len(calls) == 1 and len(calls[0]) <= 3


def test_asc_minimal_suffix(spark, events, clustered, monkeypatch):
    calls = _spy(monkeypatch)
    got = topk_table(spark, clustered, ["ts", "eid"], 50, descending=False)
    rows = [(r["eid"], r["ts"]) for r in got.select("eid", "ts").collect()]
    assert rows == _truth(events, 50, desc=False)
    assert len(calls) == 1 and len(calls[0]) <= 3


def test_hash_store_degrades_correctly(spark, events, tmp_path):
    out = str(tmp_path / "hash")
    encode_table(events, out, key="eid", num_buckets=8, detect_skew=False)
    got = topk_table(spark, out, ["ts", "eid"], 25)
    rows = [(r["eid"], r["ts"]) for r in got.select("eid", "ts").collect()]
    assert rows == _truth(events, 25)


def test_k_exceeds_table(spark, events, clustered):
    got = topk_table(spark, clustered, ["ts", "eid"], 10_000)
    assert got.count() == 2000
    top = [(r["eid"], r["ts"]) for r in got.select("eid", "ts").collect()]
    assert top[:100] == _truth(events, 100)


def test_filters_correct_and_pruned(spark, events, clustered, monkeypatch):
    calls = _spy(monkeypatch)
    got = topk_table(spark, clustered, ["ts", "eid"], 20,
                     filters=[("ts", "<", 5000)])
    rows = [(r["eid"], r["ts"]) for r in got.select("eid", "ts").collect()]
    assert rows == _truth(events, 20, extra=F.col("ts") < 5000)
    # zone pruning caps candidates at the < 5000 range; the top-k
    # guarantee then trims to the suffix of THAT
    assert len(calls) == 1 and len(calls[0]) <= 3


def test_nulls_order_last(spark, tmp_path):
    df = spark.range(600).select(
        F.concat(F.lit("k"), "id").alias("k"),
        F.when(F.col("id") % 3 != 0, F.col("id")).alias("v"),
    )
    out = str(tmp_path / "nulls")
    encode_table(df, out, key="k", num_buckets=4, detect_skew=False)
    got = topk_table(spark, out, ["v", "k"], 450)
    vals = [r["v"] for r in got.collect()]
    truth = [r["v"] for r in
             df.orderBy(F.col("v").desc_nulls_last(),
                        F.col("k").desc_nulls_last()).limit(450).collect()]
    assert vals == truth
    assert vals[-1] is None  # 400 non-null: the tail is the null fill


def test_boundary_ties_strict_rule(spark, tmp_path):
    # one heavy value at the top: the tie spans the greedy cut, so the
    # strict rule must pull in every bucket that may hold it (later
    # order columns break the tie across buckets)
    df = spark.range(1200).select(
        F.concat(F.lit("k"), F.format_string("%04d", "id")).alias("k"),
        F.when(F.col("id") < 400, 999).otherwise(F.col("id") % 400).alias("v"),
    )
    out = str(tmp_path / "ties")
    encode_table(df, out, key="k", num_buckets=8, cluster_by="v",
                 detect_skew=False)
    got = topk_table(spark, out, ["v", "k"], 350)
    rows = [(r["k"], r["v"]) for r in got.select("k", "v").collect()]
    truth = [tuple(r) for r in
             df.orderBy(F.col("v").desc_nulls_last(),
                        F.col("k").desc_nulls_last())
               .limit(350).select("k", "v").collect()]
    assert rows == truth


def test_double_nan_ranks_unbounded(spark, tmp_path):
    # NaN orders as the greatest double in Spark and DuckDB; zone
    # bounds are NaN-blind, so the NaN-holding bucket must be selected
    # even though its recorded zmax is tiny
    df = spark.range(800).select(
        (F.col("id")).alias("k"),
        F.when(F.col("id") % 400 == 7, float("nan"))
         .otherwise(F.col("id").cast("double") % 100).alias("d"),
    )
    out = str(tmp_path / "nan")
    encode_table(df, out, key="k", num_buckets=4, detect_skew=False)
    got = topk_table(spark, out, ["d", "k"], 5)
    vals = [r["d"] for r in got.collect()]
    import math

    assert sum(1 for v in vals if math.isnan(v)) == 2  # both NaN rows top


def test_pre_znull_clustered_store_still_early_stops(
        spark, events, tmp_path, monkeypatch):
    # older snapshots lack the znull block stat; on a store range-
    # clustered on the order column the null-pinning rule (NULL/NaN ->
    # bucket 0) still guarantees from n_rows alone for buckets > 0
    from kmers_spark import manifest

    out = str(tmp_path / "preznull")
    encode_table(events, out, key="eid", num_buckets=16, cluster_by="ts")

    def strip(m):
        for blocks in m["blocks"].values():
            for s in blocks:
                s.pop("znull", None)
        return m

    manifest.commit(out, strip)
    calls = _spy(monkeypatch)
    got = topk_table(spark, out, ["ts", "eid"], 50)
    rows = [(r["eid"], r["ts"]) for r in got.select("eid", "ts").collect()]
    assert rows == _truth(events, 50)
    assert len(calls) == 1 and len(calls[0]) <= 3


def test_projection_and_validation(spark, events, clustered):
    got = topk_table(spark, clustered, "ts", 10, columns=["eid", "msg"])
    assert got.columns == ["eid", "msg"] and got.count() == 10
    with pytest.raises(KeyError):
        topk_table(spark, clustered, ["nope"], 5)
    with pytest.raises(ValueError):
        topk_table(spark, clustered, ["ts"], 0)
    with pytest.raises(ValueError):
        topk_table(spark, clustered, [], 5)
