"""Column Bloom sidecars (encode_table bloom_columns=): per-bucket
filters over NON-key string/int64 columns, registered per wave under
manifest `bloom_cols`, probed driver-side by scan_table / the
DataSource / agg_table for `=` and `in` predicates.

Covers: registration + config validation, zero-decode pruning for
absent-but-in-zone-range equality probes (the case zone bounds cannot
prune on a hash-bucketed store), exact results for present values,
int64 columns, IN filters, mutation interplay — delete carries
count-unchanged buckets' filters, upsert NEVER carries an affected
bucket's old column filter (equal-count upserts keep the key set but
change values; a stale filter would prune live rows) — compaction and
rebuild inheritance, resume config pinning, null-heavy columns, and
pre-column-bloom degradation.
"""
import os

import pytest
from pyspark.sql import functions as F

from kmers_spark.kernels import bloom
from kmers_spark.operators import decode as dmod
from kmers_spark.operators.agg import agg_table
from kmers_spark.operators.decode import scan_table
from kmers_spark.operators.delete import delete_keys
from kmers_spark.operators.encode import (
    compact_waves,
    encode_table,
    rebuild_snapshot,
)
from kmers_spark.operators.upsert import upsert_table


@pytest.fixture(scope="module")
def docs(spark):
    """900 rows, key k, high-cardinality string host, int64 n (multiples
    of 3): every hash bucket's zone bounds span ~the whole value range,
    so equality pruning can only come from the column filters."""
    return spark.range(900).select(
        F.concat(F.lit("k-"), F.format_string("%04d", "id")).alias("k"),
        F.concat(F.lit("host-"), F.format_string("%04d", "id")).alias("host"),
        (F.col("id") * 3).alias("n"),
        F.concat(F.lit("body "), "id").alias("body"),
    ).cache()


@pytest.fixture()
def store(docs, tmp_path):
    out = str(tmp_path / "snap")
    m = encode_table(docs, out, key="k", num_buckets=8, detect_skew=False,
                     bloom_columns=["host", "n"])
    return out, m


def _spy_decode(monkeypatch):
    calls = []
    real = dmod.decode_colocated

    def spy(spark, out_dir, **kw):
        calls.append(sorted(kw.get("buckets") or []))
        return real(spark, out_dir, **kw)

    monkeypatch.setattr(dmod, "decode_colocated", spy)
    return calls


# -------------------------------------------------------- registration

def test_registration_and_config(store):
    out, m = store
    assert m["bloom_columns"] == ["host", "n"]
    wave = m["wave_dirs"][0]
    reg = m["bloom_cols"][wave]
    assert sorted(reg) == ["host", "n"]
    assert sorted(reg["host"]) == list(range(8))
    listing = bloom.list_col_sidecars(
        os.path.join(out, wave, bloom.BLOOM_DIR))
    assert sorted(listing) == ["host", "n"]
    assert sorted(listing["host"]) == list(range(8))
    # key sidecars unaffected and never misparsed as column ones
    assert sorted(bloom.list_sidecars(
        os.path.join(out, wave, bloom.BLOOM_DIR))) == list(range(8))


def test_config_validation(docs, tmp_path):
    with pytest.raises(ValueError, match="key column"):
        encode_table(docs, str(tmp_path / "a"), key="k",
                     bloom_columns=["k"])
    with pytest.raises(KeyError, match="not in input schema"):
        encode_table(docs, str(tmp_path / "b"), key="k",
                     bloom_columns=["nope"])
    df = docs.withColumn("d", F.col("n") * 1.5)
    with pytest.raises(ValueError, match="string and int64"):
        encode_table(df, str(tmp_path / "c"), key="k", bloom_columns=["d"])


def test_resume_config_pinned(docs, store):
    out, _m = store
    # omitted param resumes fine (reads recorded config, no-op here)
    encode_table(docs, out, key="k", num_buckets=8, detect_skew=False)
    with pytest.raises(ValueError, match="part of the snapshot format"):
        encode_table(docs, out, key="k", num_buckets=8, detect_skew=False,
                     bloom_columns=["host"])


# ------------------------------------------------------------- pruning

def test_scan_absent_string_prunes_all(spark, store, monkeypatch):
    out, _m = store
    calls = _spy_decode(monkeypatch)
    # lexically inside [host-0000, host-0899], present in no row
    got = scan_table(spark, out, [("host", "=", "host-0500!x")])
    assert got.count() == 0
    assert calls == []  # every bucket bloom-pruned: no Spark job at all


def test_scan_present_string_exact(spark, docs, store, monkeypatch):
    out, _m = store
    calls = _spy_decode(monkeypatch)
    got = scan_table(spark, out, [("host", "=", "host-0123")])
    assert [r["k"] for r in got.collect()] == ["k-0123"]
    assert len(calls) == 1 and 1 <= len(calls[0]) < 8  # pruned, not full


def test_scan_absent_int64_prunes_all(spark, store, monkeypatch):
    out, _m = store
    calls = _spy_decode(monkeypatch)
    # 7 is inside [0, 2697] but n holds only multiples of 3
    assert scan_table(spark, out, [("n", "=", 7)]).count() == 0
    assert calls == []
    # string literal coerces through normalize_filters like Spark's cast
    assert scan_table(spark, out, [("n", "=", "7")]).count() == 0
    assert calls == []


def test_scan_in_filter(spark, store, monkeypatch):
    out, _m = store
    calls = _spy_decode(monkeypatch)
    got = scan_table(
        spark, out,
        [("host", "in", ["host-0001", "host-0500!x", "host-0777"])],
    )
    assert sorted(r["k"] for r in got.collect()) == ["k-0001", "k-0777"]
    # holders (<=2 buckets) plus possible fpr stragglers; never full
    assert len(calls) == 1 and len(calls[0]) < 8
    calls.clear()
    assert scan_table(
        spark, out, [("host", "in", ["nope-a!", "nope-b!"])]
    ).count() == 0
    # in-range absentees prune without decode ("nope-*" > host-0899 is
    # zone-pruned anyway; make them in-range)
    calls.clear()
    assert scan_table(
        spark, out, [("host", "in", ["host-0100x", "host-0200x"])]
    ).count() == 0
    assert calls == []


def test_agg_bloom_prune(spark, store):
    out, _m = store
    res = agg_table(spark, out, [("count", "*"), ("sum", "n")],
                    filters=[("host", "=", "host-0500!x")])
    assert res["count_star"] == 0
    res2 = agg_table(spark, out, [("count", "*"), ("min", "n")],
                     filters=[("host", "=", "host-0042")])
    assert res2["count_star"] == 1 and res2["min_n"] == 126


def test_datasource_scan_bloom(spark, store):
    from kmers_spark import datasource

    datasource.register(spark)
    out, _m = store
    df = spark.read.format("kmers").load(out)
    assert df.filter(F.col("host") == "host-0500!x").count() == 0
    got = df.filter(F.col("host") == "host-0321").select("k").collect()
    assert [r["k"] for r in got] == ["k-0321"]


def test_pre_bloom_store_degrades(spark, docs, tmp_path, monkeypatch):
    out = str(tmp_path / "plain")
    encode_table(docs, out, key="k", num_buckets=8, detect_skew=False)
    calls = _spy_decode(monkeypatch)
    assert scan_table(spark, out, [("host", "=", "host-0500!x")]).count() == 0
    assert len(calls) == 1  # no filters: full decode, correct answer


def test_null_heavy_column_conservative(spark, tmp_path):
    df = spark.range(400).select(
        F.concat(F.lit("k"), "id").alias("k"),
        F.when(F.col("id") % 2 == 0,
               F.concat(F.lit("h-"), F.format_string("%03d", "id")))
         .alias("host"),
    )
    out = str(tmp_path / "nulls")
    encode_table(df, out, key="k", num_buckets=4, detect_skew=False,
                 bloom_columns=["host"])
    assert scan_table(spark, out, [("host", "=", "h-100")]).count() == 1
    assert scan_table(spark, out, [("host", "=", "h-101")]).count() == 0


# ----------------------------------------------------------- mutations

def test_delete_keeps_column_pruning(spark, docs, store, monkeypatch):
    out, _m = store
    delete_keys(spark, out, [f"k-{i:04d}" for i in range(0, 900, 7)])
    calls = _spy_decode(monkeypatch)
    assert scan_table(spark, out, [("host", "=", "host-0500!x")]).count() == 0
    assert calls == []  # rewritten buckets regenerated, verbatim carried
    calls.clear()
    # host-0007's row was deleted (k-0007): filter may keep its bucket
    # (blooms never un-learn) but the result is exact
    assert scan_table(spark, out, [("host", "=", "host-0007")]).count() == 0
    got = scan_table(spark, out, [("host", "=", "host-0008")]).collect()
    assert [r["k"] for r in got] == ["k-0008"]


def test_upsert_never_serves_stale_column_filter(spark, docs, store):
    out, _m = store
    # replace k-0100's host with a value NOT in the original data;
    # row count is unchanged, so the old KEY filter stays exact but the
    # old host filter must not be carried — it would prune the bucket
    # holding the new value and the scan would return nothing
    batch = docs.filter(F.col("k") == "k-0100").select(
        "k", F.lit("recrawl-moved-host").alias("host"), "n", "body")
    upsert_table(spark, out, batch)
    got = scan_table(
        spark, out, [("host", "=", "recrawl-moved-host")]).collect()
    assert [r["k"] for r in got] == ["k-0100"]
    assert scan_table(spark, out, [("host", "=", "host-0100")]).count() == 0
    # untouched values still served and still pruned exactly
    assert scan_table(spark, out, [("host", "=", "host-0101")]).count() == 1


def test_compact_carries_column_filters(spark, docs, tmp_path, monkeypatch):
    out = str(tmp_path / "waves")
    encode_table(docs, out, key="k", num_buckets=8, detect_skew=False,
                 commit_every=4, bloom_columns=["host"])
    m = compact_waves(spark, out)
    assert len(m["wave_dirs"]) == 1
    assert sorted(m["bloom_cols"][m["wave_dirs"][0]]["host"]) == list(range(8))
    calls = _spy_decode(monkeypatch)
    assert scan_table(spark, out, [("host", "=", "host-0500!x")]).count() == 0
    assert calls == []


def test_rebuild_inherits_bloom_columns(spark, store, tmp_path, monkeypatch):
    src, _m = store
    dst = str(tmp_path / "rebuilt")
    m2 = rebuild_snapshot(spark, src, dst, num_buckets=4)
    assert m2["bloom_columns"] == ["host", "n"]
    calls = _spy_decode(monkeypatch)
    assert scan_table(spark, dst, [("host", "=", "host-0500!x")]).count() == 0
    assert calls == []
    got = scan_table(spark, dst, [("host", "=", "host-0123")]).collect()
    assert [r["k"] for r in got] == ["k-0123"]


# --------------------------------------------------------------- sinks

def test_batch_sink_bloom_columns(spark, docs, tmp_path, monkeypatch):
    from kmers_spark import datasource, manifest
    from kmers_spark.operators import partitioning

    datasource.register(spark)
    out = str(tmp_path / "sink")
    bucketed = partitioning.with_bucket(docs, 6, {}, url_col="k") \
        .repartition("bucket")
    (
        bucketed.write.format("kmers")
        .option("key", "k").option("numBuckets", "6")
        .option("bloomColumns", "host,n")
        .mode("append").save(out)
    )
    m = manifest.load(out)
    assert m["bloom_columns"] == ["host", "n"]
    wave = m["wave_dirs"][0]
    assert sorted(m["bloom_cols"][wave]) == ["host", "n"]
    assert len(m["bloom_cols"][wave]["host"]) == 6
    calls = _spy_decode(monkeypatch)
    assert scan_table(spark, out, [("host", "=", "host-0500!x")]).count() == 0
    assert calls == []  # pruned without decoding on an EXTERNAL store
    got = scan_table(spark, out, [("host", "=", "host-0042")]).collect()
    assert [r["k"] for r in got] == ["k-0042"]
    # option validation
    with pytest.raises(Exception, match="key column"):
        (bucketed.write.format("kmers").option("key", "k")
         .option("numBuckets", "6").option("bloomColumns", "k")
         .mode("append").save(str(tmp_path / "bad")))


def test_stream_sink_bloom_columns(spark, docs, tmp_path, monkeypatch):
    from kmers_spark import datasource, manifest
    from kmers_spark.operators import partitioning

    datasource.register(spark)
    src = str(tmp_path / "src")
    out, ckpt = str(tmp_path / "snap"), str(tmp_path / "ckpt")
    docs.write.parquet(src)
    sdf = spark.readStream.schema(docs.schema).parquet(src)
    bucketed = partitioning.with_bucket(sdf, 4, {}, url_col="k") \
        .repartition("bucket")
    q = (
        bucketed.writeStream.format("kmers")
        .option("checkpointLocation", ckpt)
        .option("key", "k").option("numBuckets", "4")
        .option("bloomColumns", "host")
        .trigger(availableNow=True).start(out)
    )
    q.awaitTermination(120)
    m = manifest.load(out)
    assert m["streamed"] is True and m["bloom_columns"] == ["host"]
    wave = m["wave_dirs"][0]
    assert len(m["bloom_cols"][wave]["host"]) == 4
    # no staging leftovers
    import os

    leftovers = [n for n in os.listdir(os.path.join(out, "blocks"))
                 if n.startswith(".stream-staging")
                 and os.listdir(os.path.join(out, "blocks", n))]
    assert not leftovers or not any(
        f.startswith(".staged-cbloom") for d in leftovers
        for f in os.listdir(os.path.join(out, "blocks", d)))
    calls = _spy_decode(monkeypatch)
    assert scan_table(spark, out, [("host", "=", "host-0500!x")]).count() == 0
    assert calls == []
    got = scan_table(spark, out, [("host", "=", "host-0077")]).collect()
    assert [r["k"] for r in got] == ["k-0077"]
