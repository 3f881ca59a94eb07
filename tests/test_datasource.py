"""spark.read.format("kmers"): the store as a Catalyst-visible table.

Pins: schema from the manifest (writer order), full-table identity,
filter pushdown (results exact — Spark residual re-evaluates), column
projection, time travel via option("version"), and zone-map partition
pruning (the reader plans fewer input partitions when bounds exclude
the predicate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kmers_spark import datasource, manifest, pages
from kmers_spark.operators.encode import encode_table


@pytest.fixture(scope="module")
def ds_store(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ds") / "snap")
    df = pages.pages_df(spark, 2500, seed=61, partitions=4).cache()
    encode_table(df, out, num_buckets=8, detect_skew=False, commit_every=4)
    datasource.register(spark)
    return out, df


def test_schema_and_full_identity(spark, ds_store):
    out, df = ds_store
    t = spark.read.format("kmers").load(out)
    assert t.columns == df.columns
    got = t.toPandas().sort_values("url").reset_index(drop=True)
    want = df.toPandas().sort_values("url").reset_index(drop=True)
    assert got.equals(want)


def test_filter_and_projection(spark, ds_store):
    out, df = ds_store
    t = spark.read.format("kmers").load(out)
    got = (
        t.filter("lang = 'de' AND warc_ts >= '2024-01-01'")
        .select("url", "warc_ts")
        .toPandas().sort_values("url").reset_index(drop=True)
    )
    want = (
        df.filter((df.lang == "de") & (df.warc_ts >= "2024-01-01"))
        .select("url", "warc_ts")
        .toPandas().sort_values("url").reset_index(drop=True)
    )
    assert got.equals(want)
    assert len(got)


def test_sql_aggregate(spark, ds_store):
    out, df = ds_store
    spark.read.format("kmers").load(out).createOrReplaceTempView("kmers_snap")
    got = spark.sql(
        "SELECT lang, count(*) AS c FROM kmers_snap GROUP BY lang ORDER BY lang"
    ).collect()
    want = df.groupBy("lang").count().orderBy("lang").collect()
    assert [(r["lang"], r["c"]) for r in got] == [(r["lang"], r["count"]) for r in want]


def test_version_time_travel(spark, ds_store):
    out, df = ds_store
    hist_rows = spark.read.format("kmers").option("version", "2").load(out).count()
    latest = spark.read.format("kmers").load(out).count()
    assert 0 < hist_rows < latest == df.count()  # v2 = first wave only


def test_zone_pruning_reduces_partitions(spark, tmp_path):
    """A predicate the manifest bounds exclude for most buckets plans
    fewer input partitions — pruning INSIDE Spark's planner."""
    from pyspark.sql.datasource import EqualTo

    from kmers_spark.datasource import KmersReader
    from kmers_spark.operators import partitioning

    n_b = 8
    rows = []
    for i in range(400):
        key = f"k{i:05d}"
        b = partitioning.bucket_for_key(key, n_b, {})
        rows.append((key, b * 1000 + (i % 100)))
    df = spark.createDataFrame(rows, "url string, shard long")
    out = str(tmp_path / "clustered")
    m = encode_table(df, out, key="url", num_buckets=n_b, detect_skew=False)

    class _Opts(dict):
        pass

    class _Schema:
        fields = [type("F", (), {"name": "url"}), type("F", (), {"name": "shard"})]

    reader = KmersReader({"path": out}, _Schema, m)
    assert len(reader.partitions()) == n_b
    list(reader.pushFilters([EqualTo(("shard",), 3025)]))
    assert len(reader.partitions()) == 1

    datasource.register(spark)
    t = spark.read.format("kmers").load(out)
    got = sorted(r["url"] for r in t.filter("shard = 3025").collect())
    want = sorted(r for r, s in rows if s == 3025)
    assert got == want


def test_segmented_store_reads_identically(spark, tmp_path):
    out = str(tmp_path / "segds")
    df = pages.pages_df(spark, 1500, seed=71, partitions=4).cache()
    encode_table(df, out, num_buckets=4, detect_skew=False,
                 codec_overrides={"html": "words_seg", "text": "words_seg"})
    datasource.register(spark)
    t = spark.read.format("kmers").load(out)
    got = t.filter("lang = 'en'").toPandas().sort_values("url").reset_index(drop=True)
    want = df.filter(df.lang == "en").toPandas().sort_values("url").reset_index(drop=True)
    assert got.equals(want)


# ---------------------------------------------------------------- writer

def test_writer_roundtrip_and_manifest(spark, tmp_path):
    """df.write.format('kmers'): block files + CAS manifest commit,
    bit-identical decode, readable back through the DS reader, point
    lookups work (key ranges + bucket scheme recorded)."""
    from kmers_spark.operators import decode as dec, partitioning

    out = str(tmp_path / "wsnap")
    df = pages.pages_df(spark, 1200, seed=91, partitions=4).cache()
    bucketed = partitioning.with_bucket(df, 6, {}).repartition("bucket")
    (
        bucketed.write.format("kmers")
        .option("key", "url").option("numBuckets", "6")
        # the caller DECLARES the rule it bucketed with — without this
        # the sink records "external" and lookups scan all buckets
        .option("bucketScheme", "host_or_key")
        .mode("append").save(out)
    )
    m = manifest.load(out)
    assert sorted(m["committed_buckets"]) == list(range(6))
    assert m["bucket_scheme"] == "host_or_key"
    assert m["columns"] == df.columns

    back = dec.decode_table(spark, out)
    a = back.toPandas().sort_values("url").reset_index(drop=True)
    b = df.toPandas().sort_values("url").reset_index(drop=True)
    assert a.equals(b)

    u = df.select("url").limit(1).collect()[0]["url"]
    assert dec.lookup_keys(spark, out, [u]).count() == 1

    t = spark.read.format("kmers").load(out)
    assert t.filter("lang = 'en'").count() == df.filter(df.lang == "en").count()


def test_writer_undeclared_scheme_is_external_and_lookups_still_hit(
        spark, tmp_path):
    """A sink write WITHOUT .option('bucketScheme') must record
    'external' — the writer never verified which rule made the bucket
    column — and point lookups must still find every key by falling
    back to all committed buckets + key-range pruning. The bug this
    pins: the old sink recorded host_or_key unconditionally, so a
    stream bucketed any other way silently returned EMPTY for present
    keys (ADVICE r4)."""
    from kmers_spark.operators import decode as dec, partitioning

    out = str(tmp_path / "extsnap")
    df = pages.pages_df(spark, 800, seed=93, partitions=4).cache()
    # bucket by a rule the engine does NOT know: parity of url length
    bucketed = df.withColumn(
        "bucket", (F.length("url") % F.lit(4)).cast("int")
    ).repartition("bucket")
    (
        bucketed.write.format("kmers")
        .option("key", "url").option("numBuckets", "4")
        .mode("append").save(out)
    )
    m = manifest.load(out)
    assert m["bucket_scheme"] == partitioning.EXTERNAL_SCHEME

    urls = [r["url"] for r in df.select("url").limit(5).collect()]
    got = dec.lookup_keys(spark, out, urls)
    assert got.count() == len(set(urls))
    # under the OLD recorded-host_or_key behavior this probe would hash
    # to one wrong bucket and miss; external-scheme fallback cannot

    # encode_table must refuse to resume an externally-bucketed store
    with pytest.raises(ValueError, match="bucketed externally"):
        from kmers_spark.operators.encode import encode_table
        encode_table(df, out, num_buckets=4, detect_skew=False)

    # an invalid declaration is rejected up front
    with pytest.raises(Exception, match="bucketScheme"):
        (
            bucketed.write.format("kmers")
            .option("key", "url").option("numBuckets", "4")
            .option("bucketScheme", "range")
            .mode("append").save(str(tmp_path / "bad"))
        )


def test_writer_rejects_bucket_spanning_partitions(spark, tmp_path):
    """Without repartition('bucket') a bucket spans tasks — the commit
    must abort instead of registering duplicate block sets."""
    from kmers_spark.operators import partitioning

    out = str(tmp_path / "wsnap_bad")
    df = pages.pages_df(spark, 1200, seed=92, partitions=4)
    bucketed = partitioning.with_bucket(df, 4, {})  # NOT repartitioned
    with pytest.raises(Exception, match="spans multiple write tasks"):
        (
            bucketed.write.format("kmers").option("key", "url")
            .mode("append").save(out)
        )
    # the aborted wave never became visible
    m = manifest.load(out)
    assert m is None or not m.get("committed_buckets")


def test_writer_requires_bucket_column(spark, tmp_path):
    df = pages.pages_df(spark, 100, seed=93, partitions=2)
    with pytest.raises(Exception, match="bucket"):
        df.write.format("kmers").mode("append").save(str(tmp_path / "nob"))


def test_writer_overwrite_committed_rejected(spark, tmp_path):
    from kmers_spark.operators import partitioning

    out = str(tmp_path / "wsnap_ow")
    df = pages.pages_df(spark, 600, seed=94, partitions=2)
    bucketed = partitioning.with_bucket(df, 4, {}).repartition("bucket")
    (bucketed.write.format("kmers").option("key", "url")
     .option("numBuckets", "4").mode("append").save(out))
    with pytest.raises(Exception, match="overwrite"):
        (bucketed.write.format("kmers").option("key", "url")
         .mode("overwrite").save(out))


# ------------------------------------------------------------- streaming

def test_stream_reader_incremental_exactly_once(spark, tmp_path):
    """spark.readStream.format('kmers'): bucket-set offsets make the
    stream incremental (new buckets only), replay-stable, and
    compaction-safe — Spark's own offset log carries exactly-once."""
    from kmers_spark.operators import encode as enc

    out = str(tmp_path / "str_snap")
    sink = str(tmp_path / "str_sink")
    ckpt = str(tmp_path / "str_ckpt")
    datasource.register(spark)
    df = pages.pages_df(spark, 1200, seed=37, partitions=4).cache()
    enc.encode_table(df, out, num_buckets=6, detect_skew=False,
                     fail_buckets_over=3, commit_every=3)

    def run_once():
        q = (
            spark.readStream.format("kmers").load(out)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run_once()
    from kmers_spark.operators import decode as dec

    assert spark.read.parquet(sink).count() == dec.decode_table(spark, out).count()
    enc.encode_table(df, out, num_buckets=6, detect_skew=False, commit_every=3)
    run_once()
    got = spark.read.parquet(sink)
    assert got.count() == 1200
    assert got.select("url").distinct().count() == 1200  # no duplicates
    a = got.toPandas().sort_values("url").reset_index(drop=True)
    b = df.toPandas().sort_values("url").reset_index(drop=True)
    assert a[list(b.columns)].equals(b)
    run_once()  # idle batch: nothing new
    enc.compact_waves(spark, out)
    run_once()  # compaction registers new dirs but no new buckets
    assert spark.read.parquet(sink).count() == 1200


def test_writer_empty_append_is_noop(spark, tmp_path):
    """A write where every task saw zero rows must not register a
    nonexistent wave dir (that would fail ALL later decodes)."""
    from kmers_spark.operators import decode as dec, partitioning

    out = str(tmp_path / "wsnap_empty")
    df = pages.pages_df(spark, 400, seed=95, partitions=2)
    bucketed = partitioning.with_bucket(df, 4, {}).repartition("bucket")
    bucketed.write.format("kmers").option("key", "url").option(
        "numBuckets", "4"
    ).mode("append").save(out)
    waves_before = manifest.load(out)["wave_dirs"]
    empty = bucketed.filter("1 = 0")
    empty.write.format("kmers").option("key", "url").mode("append").save(out)
    m = manifest.load(out)
    assert m["wave_dirs"] == waves_before
    assert dec.decode_table(spark, out).count() == 400  # still readable


def test_writer_fresh_table_requires_num_buckets(spark, tmp_path):
    """Inferring the bucket space from data is wrong whenever the
    highest buckets are empty — creation must be explicit."""
    from kmers_spark.operators import partitioning

    df = pages.pages_df(spark, 200, seed=96, partitions=2)
    bucketed = partitioning.with_bucket(df, 4, {}).repartition("bucket")
    with pytest.raises(Exception, match="numBuckets"):
        bucketed.write.format("kmers").option("key", "url").mode(
            "append"
        ).save(str(tmp_path / "wsnap_nb"))


def test_writer_append_validates_bucket_space(spark, tmp_path):
    from kmers_spark.operators import partitioning

    out = str(tmp_path / "wsnap_bs")
    df = pages.pages_df(spark, 400, seed=97, partitions=2)
    partitioning.with_bucket(df, 4, {}).repartition("bucket").write.format(
        "kmers"
    ).option("key", "url").option("numBuckets", "4").mode("append").save(out)
    # re-bucketed with a different modulus: out-of-range ids must fail
    wide = partitioning.with_bucket(df, 12, {}).repartition("bucket")
    with pytest.raises(Exception, match="outside|numBuckets"):
        wide.write.format("kmers").option("key", "url").mode("append").save(out)
    # and a mismatched key column is rejected too
    with pytest.raises(Exception, match="key"):
        partitioning.with_bucket(df, 4, {}).repartition("bucket").write.format(
            "kmers"
        ).option("key", "text").mode("append").save(out)


def test_writer_publishes_only_committed_attempts(spark, tmp_path):
    """Staged (hidden) files become visible part files at commit; a
    leftover stale attempt file is removed, and readers see exactly
    the committed block rows."""
    import os

    from kmers_spark.operators import decode as dec, partitioning

    out = str(tmp_path / "wsnap_pub")
    df = pages.pages_df(spark, 400, seed=98, partitions=2)
    partitioning.with_bucket(df, 4, {}).repartition("bucket").write.format(
        "kmers"
    ).option("key", "url").option("numBuckets", "4").mode("append").save(out)
    wave_rel = manifest.load(out)["wave_dirs"][0]
    names = os.listdir(os.path.join(out, wave_rel))
    assert names and all(
        n.startswith("part-") or n == "_blooms" for n in names
    )  # _blooms: key Bloom sidecars, hidden from parquet listings
    assert dec.decode_table(spark, out).count() == 400


def test_like_prefix_pushdown(spark, ds_store):
    """col LIKE 'prefix%' becomes a [prefix, prefix+1) range in the
    reader (zone pruning + kernel range filter); Spark's residual LIKE
    keeps exactness. Results must match the plain DataFrame filter."""
    out, df = ds_store
    t = spark.read.format("kmers").load(out)
    for pat in ("https://host1%", "https://host42.example.com/%"):
        got = sorted(r["url"] for r in t.filter(f"url LIKE '{pat}'").collect())
        want = sorted(r["url"] for r in df.filter(df.url.like(pat)).collect())
        assert got == want, pat
    # triples recorded as a sound range (unit check on the translation)
    from pyspark.sql.datasource import StringStartsWith

    from kmers_spark.datasource import KmersReader

    class _S:
        fields = [type("F", (), {"name": "url"})]

    r = KmersReader({"path": out}, _S, manifest.load(out))
    list(r.pushFilters([StringStartsWith(("url",), "https://hostz")]))
    assert ("url", ">=", "https://hostz") in r.triples
    assert ("url", "<", "https://host{") in r.triples  # 'z'+1 == '{'


def test_buckets_per_task_coalescing(spark, ds_store):
    """option('bucketsPerTask', N): ceil(buckets/N) input partitions,
    identical results (VERDICT r3 #5 — a 10^5-bucket store must not
    spawn 10^5 Python tasks)."""
    import math

    from kmers_spark.datasource import KmersReader, plan_bucket_partitions

    out, df = ds_store
    m = manifest.load(out)
    committed = list(m.get("committed_buckets", []))
    for n in (1, 3, 8, 100):
        parts = plan_bucket_partitions(out, m, committed, list(df.columns),
                                       buckets_per_task=n)
        assert len(parts) == math.ceil(len(committed) / n)
        covered = sorted(b for p in parts for b in p.value[0])
        assert covered == sorted(committed)  # every bucket exactly once

    t = spark.read.format("kmers").option("bucketsPerTask", "3").load(out)
    got = t.toPandas().sort_values("url").reset_index(drop=True)
    want = df.toPandas().sort_values("url").reset_index(drop=True)
    assert got.equals(want)
    # filters still exact through a coalesced read
    sel = (
        spark.read.format("kmers").option("bucketsPerTask", "4").load(out)
        .filter("lang = 'pl'").toPandas().sort_values("url").reset_index(drop=True)
    )
    want_sel = (
        df.filter(F.col("lang") == "pl").toPandas()
        .sort_values("url").reset_index(drop=True)
    )
    assert sel.equals(want_sel)


def test_stream_sink_rejects_complete_mode(spark, tmp_path):
    """The sink is append-only: outputMode('complete') (overwrite=True)
    must fail loudly, not silently append duplicates per batch."""
    datasource.register(spark)
    df = pages.pages_df(spark, 100, seed=5, partitions=1)
    src = str(tmp_path / "src")
    df.write.parquet(src)
    sdf = (
        spark.readStream.schema(df.schema).parquet(src)
        .groupBy("lang").count()
    )
    import pyspark.errors

    with pytest.raises(Exception, match="append-only"):
        q = (
            sdf.writeStream.format("kmers")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .option("numBuckets", "2")
            .option("key", "lang")
            .trigger(availableNow=True)
            .start(str(tmp_path / "snap"))
        )
        q.awaitTermination(60)


def test_coalesced_read_of_evolved_store_projects_evolved_only(spark, tmp_path):
    """bucketsPerTask + evolution + a projection of ONLY the evolved
    column: the key anchors row counts per bucket (fetched only where
    needed) and every pre-evolution row null-fills."""
    from kmers_spark.operators.decode import decode_table

    out = str(tmp_path / "snap")
    df = pages.pages_df(spark, 600, seed=67, partitions=2).cache()
    encode_table(df, out, num_buckets=6, detect_skew=False)
    manifest.evolve_schema(out, {"score": "double"})
    t = (
        spark.read.format("kmers").option("bucketsPerTask", "3").load(out)
        .select("score")
    )
    got = t.toPandas()
    assert len(got) == 600
    assert got["score"].isna().all()
