"""df.writeStream.format("kmers"): continuous ingest into the
compressed store (VERDICT r3 #8 — the interop surface symmetric with
readStream).

Each micro-batch appends one wave as a new GENERATION of its buckets;
exactly-once rides on the manifest's stream_epochs record (the batchId
is committed in the same CAS mutation that registers the wave, so a
replayed batch drops its staged files instead of duplicating rows).
Readers: decode_colocated isolates generations per scan partition
(one wave file each), decode_table groups on (bucket, input_file), and
the DataSource read iterates parquet fragments.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kmers_spark import datasource, manifest, pages, zonemap
from kmers_spark.operators import partitioning
from kmers_spark.operators.decode import (
    decode_colocated,
    decode_table,
    lookup_keys,
    scan_table,
)
from kmers_spark.operators.encode import compact_waves

N_B = 8


def _bucketed_stream(spark, src_dir, schema):
    sdf = spark.readStream.schema(schema).parquet(src_dir)
    return partitioning.with_bucket(sdf, N_B, {}).repartition("bucket")


def _run_sink(spark, src_dir, schema, out, ckpt, stream_id=None):
    w = (
        _bucketed_stream(spark, src_dir, schema)
        .writeStream.format("kmers")
        .option("checkpointLocation", ckpt)
        .option("numBuckets", str(N_B))
    )
    if stream_id:
        w = w.option("streamId", stream_id)
    q = w.trigger(availableNow=True).start(out)
    q.awaitTermination(120)


@pytest.fixture(scope="module")
def streamed_store(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ds_sink")
    src, out, ckpt = str(root / "src"), str(root / "snap"), str(root / "ckpt")
    df = pages.pages_df(spark, 1600, seed=91, partitions=4).cache()
    half1 = df.filter(F.xxhash64("url") % 2 == 0)
    half2 = df.filter(F.xxhash64("url") % 2 != 0)
    datasource.register(spark)
    half1.write.parquet(src)  # batch 1
    _run_sink(spark, src, df.schema, out, ckpt)
    half2.write.mode("append").parquet(src)  # batch 2 = the new files
    _run_sink(spark, src, df.schema, out, ckpt)
    return out, df


def test_two_batches_decode_bit_identical(spark, streamed_store):
    out, df = streamed_store
    m = manifest.load(out)
    assert m["streamed"] is True
    assert len(m.get("stream_epochs", {}).get("stream", {})) == 2
    assert len(m["wave_dirs"]) == 2
    got = decode_colocated(spark, out).toPandas() \
        .sort_values("url").reset_index(drop=True)
    want = df.toPandas()[got.columns].sort_values("url").reset_index(drop=True)
    assert len(got) == 1600
    assert got.equals(want)


def test_shuffle_decode_groups_generations(spark, streamed_store):
    """decode_table (groupBy path) on a streamed store: the per-file
    group key keeps each generation's block set intact."""
    out, df = streamed_store
    got = decode_table(spark, out).toPandas() \
        .sort_values("url").reset_index(drop=True)
    want = df.toPandas()[got.columns].sort_values("url").reset_index(drop=True)
    assert got.equals(want)


def test_datasource_read_of_streamed_store(spark, streamed_store):
    out, df = streamed_store
    t = spark.read.format("kmers").load(out)
    got = t.toPandas().sort_values("url").reset_index(drop=True)
    want = df.toPandas()[got.columns].sort_values("url").reset_index(drop=True)
    assert got.equals(want)
    sel = t.filter("lang = 'pl'").toPandas().sort_values("url") \
        .reset_index(drop=True)
    want_sel = df.filter(F.col("lang") == "pl").toPandas()[got.columns] \
        .sort_values("url").reset_index(drop=True)
    assert sel.equals(want_sel)


def test_scan_and_lookup_on_streamed_store(spark, streamed_store):
    out, df = streamed_store
    got = scan_table(spark, out, [("lang", "=", "en")]).toPandas() \
        .sort_values("url").reset_index(drop=True)
    want = df.filter(F.col("lang") == "en").toPandas()[got.columns] \
        .sort_values("url").reset_index(drop=True)
    assert got.equals(want)
    urls = [r["url"] for r in df.select("url").limit(2).collect()]
    assert lookup_keys(spark, out, urls).count() == len(set(urls))


def test_zone_ranges_widen_across_generations(streamed_store):
    """prune_buckets must union a bucket's per-generation bounds — an
    overwrite would prune rows the earlier generation holds."""
    out, _df = streamed_store
    m = manifest.load(out)
    blocks = manifest.block_stats(out, m)
    # both generations committed warc_ts bounds; the merged range must
    # cover each generation's own range
    for b, stats in blocks.items():
        ts_stats = [s for s in stats if s["column"] == "warc_ts" and "zmin" in s]
        if len(ts_stats) < 2:
            continue
        norm = zonemap.normalize_filters(
            [("warc_ts", ">=", min(s["zmin"] for s in ts_stats))], m["schema"])
        assert int(b) in zonemap.prune_buckets(m, norm, blocks=blocks)
        break
    else:
        pytest.skip("no bucket with two bounded generations at this size")


def test_replayed_batch_is_noop(spark, streamed_store, tmp_path):
    """Simulate Spark re-running a committed batch: same batchId, new
    staged data — the sink must drop it without registering."""
    out, df = streamed_store
    from kmers_spark.datasource import KmersStreamWriter

    before = manifest.load(out)
    w = KmersStreamWriter(
        path=out, key="url", num_buckets=N_B,
        table_schema=dict(before["schema"]),
        codec_overrides=None, snapshot_id="s",
    )
    n_before = decode_colocated(spark, out).count()
    # fabricate a commit message for an ALREADY COMMITTED epoch (0)
    import os

    staging = w._staging()
    os.makedirs(staging, exist_ok=True)
    fake = ".staged-deadbeef.parquet"
    open(os.path.join(staging, fake), "wb").close()

    class Msg:
        stats = {0: [{"column": "url", "codec": "plain", "n_rows": 1,
                      "raw_nbytes": 1, "enc_nbytes": 1}]}
        key_ranges: dict = {}
        staged_file = fake

    w.commit([Msg()], 0)
    after = manifest.load(out)
    assert after["wave_dirs"] == before["wave_dirs"]  # nothing registered
    assert not os.path.exists(os.path.join(staging, fake))  # staged cleaned
    assert decode_colocated(spark, out).count() == n_before


def test_compact_refuses_streamed(spark, streamed_store):
    out, _df = streamed_store
    with pytest.raises(ValueError, match="multi-generation"):
        compact_waves(spark, out)


def test_abort_cleans_staged(streamed_store):
    import os

    out, _df = streamed_store
    from kmers_spark.datasource import KmersStreamWriter

    w = KmersStreamWriter(path=out, key="url", num_buckets=N_B,
                          table_schema={"url": "string"},
                          codec_overrides=None, snapshot_id="s")
    staging = w._staging()
    os.makedirs(staging, exist_ok=True)
    fake = ".staged-aborted.parquet"
    open(os.path.join(staging, fake), "wb").close()

    class Msg:
        stats: dict = {}
        key_ranges: dict = {}
        staged_file = fake

    w.abort([Msg()], 99)
    assert not os.path.exists(os.path.join(staging, fake))


def test_epoch_history_bounded_and_below_window_raises(tmp_path):
    """stream_epochs must stay bounded (the manifest is rewritten per
    commit); a batchId below the kept window cannot be a real replay
    (batchIds are monotone, Spark replays only the last batch) — it
    means a NEW query reused this streamId, and silently dropping its
    data would be worse than failing, so it raises."""
    import os

    out = str(tmp_path / "snap")
    manifest.init(out, snapshot_id="s", schema={"url": "string"},
                  num_buckets=4, key="url")
    keep = manifest.STREAM_EPOCHS_KEEP
    for e in range(keep + 10):
        wd = f"blocks/w_e{e}"
        os.makedirs(os.path.join(out, wd), exist_ok=True)
        manifest.commit_wave_append(out, {e % 4: []}, wd, e)
    m = manifest.load(out)
    assert len(m["stream_epochs"]["stream"]) == keep
    n_waves = len(m["wave_dirs"])
    # an IN-window batchId is a legit replay: no-op
    m2 = manifest.commit_wave_append(out, {0: []}, "blocks/w_replayK", keep + 5)
    assert len(m2["wave_dirs"]) == n_waves
    # epoch 0 fell out of the window: streamId reuse, loud failure
    with pytest.raises(ValueError, match="streamId"):
        manifest.commit_wave_append(out, {0: []}, "blocks/w_replay0", 0)


def test_rebuild_merges_generations_into_batch_snapshot(spark, streamed_store,
                                                        tmp_path):
    """rebuild_snapshot: the streamed store's per-batch generations
    merge into a fresh batch snapshot — bit-identical rows, one block
    per (bucket, column), compact_waves applies again."""
    from kmers_spark.operators.encode import rebuild_snapshot

    out, df = streamed_store
    dst = str(tmp_path / "rebuilt")
    m = rebuild_snapshot(spark, out, dst)
    assert not m.get("streamed")
    got = decode_colocated(spark, dst).toPandas() \
        .sort_values("url").reset_index(drop=True)
    want = df.toPandas()[got.columns].sort_values("url").reset_index(drop=True)
    assert got.equals(want)
    blocks = manifest.block_stats(dst, m)
    n_cols = len(m["schema"])
    assert all(len(stats) <= n_cols for stats in blocks.values())
    compact_waves(spark, dst)  # no multi-generation refusal anymore


def test_rebuild_reclusters_hash_store(spark, tmp_path):
    """rebuild --cluster-by converts a hash store to a range store: the
    zone maps go from inert to pruning on the cluster column."""
    from kmers_spark.operators.encode import encode_table, rebuild_snapshot

    src, dst = str(tmp_path / "hash"), str(tmp_path / "rng")
    df = pages.pages_df(spark, 1500, seed=23, partitions=4).cache()
    encode_table(df, src, num_buckets=8, detect_skew=False)
    m = rebuild_snapshot(spark, src, dst, cluster_by="warc_ts")
    assert m["bucket_scheme"] == partitioning.RANGE_SCHEME
    blocks = manifest.block_stats(dst, m)
    zmins = sorted(s["zmin"] for st in blocks.values()
                   for s in st if s["column"] == "warc_ts" and "zmin" in s)
    mid = zmins[len(zmins) // 2]
    norm = zonemap.normalize_filters([("warc_ts", "<", mid)], m["schema"])
    keep = zonemap.prune_buckets(m, norm, blocks=blocks)
    assert len(keep) < 8  # prunes now; on the hash store it kept all
    got = decode_colocated(spark, dst).toPandas() \
        .sort_values("url").reset_index(drop=True)
    assert got.equals(df.toPandas()[got.columns]
                      .sort_values("url").reset_index(drop=True))


def test_streamed_store_schema_evolution_generation_nullfill(spark, tmp_path):
    """Continuous ingest + schema evolution: generations written before
    evolve_schema lack the added column's block; the union of a
    bucket's per-generation stats would claim the column 'exists', so
    streamed snapshots take the null-fill allowance from the recorded
    evolved-column list instead — each generation null-fills what its
    own block set lacks."""
    src1, src2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    out, ck1, ck2 = (str(tmp_path / n) for n in ("snap", "c1", "c2"))
    df = pages.pages_df(spark, 600, seed=41, partitions=2).cache()
    datasource.register(spark)
    df.write.parquet(src1)
    _run_sink(spark, src1, df.schema, out, ck1)

    manifest.evolve_schema(out, {"score": "double"})
    df2 = pages.pages_df(spark, 400, seed=43, partitions=2) \
        .withColumn("url", F.concat(F.lit("http://g2."), F.col("url").substr(8, 999))) \
        .withColumn("score", F.length("text").cast("double")).cache()
    df2.write.parquet(src2)
    # a NEW query (fresh checkpoint: batchIds restart at 0) must carry
    # its own streamId or its batch 0 would read as a replay of the
    # first query's batch 0
    _run_sink(spark, src2, df2.schema, out, ck2, stream_id="gen2")

    for reader in (
        lambda: decode_colocated(spark, out),
        lambda: decode_table(spark, out),
        lambda: spark.read.format("kmers").load(out),
    ):
        got = reader().toPandas()
        assert len(got) == 1000
        # generation 1 (600 rows) null-fills; generation 2 carries real
        # values except its own genuinely-null-text rows
        g2_nulls = df2.filter(F.col("score").isNull()).count()
        assert got["score"].isna().sum() == 600 + g2_nulls
        assert got["score"].notna().sum() == 400 - g2_nulls
    # projection of ONLY the evolved column anchors on the key
    proj = decode_colocated(spark, out, columns=["score"]).toPandas()
    assert len(proj) == 1000


def test_streamed_post_evolution_corruption_raises(spark, tmp_path):
    """The evolution WATERMARK closes the one silent-null path in the
    engine (VERDICT r4 #1): a generation written AFTER evolve_schema
    that lost the evolved column's block must RAISE on all three read
    paths — only generations the column predates may null-fill. A
    legacy manifest without watermarks keeps the old every-generation
    allowance (it cannot prove which waves predate the evolution)."""
    import glob

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src1, src2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    out, ck1, ck2 = (str(tmp_path / n) for n in ("snap", "c1", "c2"))
    df = pages.pages_df(spark, 300, seed=61, partitions=2).cache()
    datasource.register(spark)
    df.write.parquet(src1)
    _run_sink(spark, src1, df.schema, out, ck1)

    manifest.evolve_schema(out, {"score": "double"})
    df2 = pages.pages_df(spark, 200, seed=62, partitions=2) \
        .withColumn("url", F.concat(F.lit("http://g2."), F.col("url").substr(8, 999))) \
        .withColumn("score", F.lit(1.5)).cache()
    df2.write.parquet(src2)
    _run_sink(spark, src2, df2.schema, out, ck2, stream_id="gen2")

    m = manifest.load(out)
    wm = m["evolution_waves"]["score"]
    post_waves = m["wave_dirs"][wm:]
    assert post_waves, "sink run 2 must have appended post-evolution waves"
    # sanity: the store reads clean before corruption
    assert decode_colocated(spark, out).count() == 500

    # corrupt: strip the score blocks from every post-evolution wave file
    stripped = 0
    for wd in post_waves:
        for f in glob.glob(f"{out}/{wd}/part-*"):
            t = pq.read_table(f)
            t2 = t.filter(pc.not_equal(t.column("column"), "score"))
            stripped += t.num_rows - t2.num_rows
            pq.write_table(t2, f, compression="none")
    assert stripped > 0

    for name, reader in (
        ("colocated", lambda: decode_colocated(spark, out)),
        ("shuffle", lambda: decode_table(spark, out)),
        ("datasource", lambda: spark.read.format("kmers").load(out)),
    ):
        with pytest.raises(Exception, match="corrupt"):
            reader().toPandas()

    # legacy manifests (evolution predates watermarks): the allowance
    # stays every-generation, so the same store reads with nulls
    def drop_watermarks(cur):
        cur.pop("evolution_waves", None)
        return cur

    manifest.commit(out, drop_watermarks)
    got = decode_colocated(spark, out).toPandas()
    assert len(got) == 500
    assert got["score"].isna().sum() == 500  # 300 pre-evo + 200 corrupt


def test_stream_reader_sees_new_generations(spark, tmp_path):
    """readStream over a sink-appended store: the offset carries the
    wave count, so generations appended to ALREADY-committed buckets
    are emitted (the bucket-set offset alone would silently drop every
    batch after the first — review finding r4)."""
    src1, src2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    out = str(tmp_path / "snap")
    wck1, wck2, rck = (str(tmp_path / n) for n in ("w1", "w2", "r"))
    df = pages.pages_df(spark, 800, seed=51, partitions=2).cache()
    h1 = df.filter(F.xxhash64("url") % 2 == 0)
    h2 = df.filter(F.xxhash64("url") % 2 != 0)
    datasource.register(spark)
    h1.write.parquet(src1)
    _run_sink(spark, src1, df.schema, out, wck1)

    def drain() -> int:
        seen = []
        q = (
            spark.readStream.format("kmers").load(out)
            .writeStream.foreachBatch(lambda b, i: seen.append(b.count()))
            .option("checkpointLocation", rck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sum(seen)

    assert drain() == h1.count()
    # second sink batch appends a GENERATION to the same buckets
    h2.write.parquet(src2)
    _run_sink(spark, src2, df.schema, out, wck2, stream_id="g2")
    assert drain() == h2.count()  # only the new generation re-emits
    assert drain() == 0           # nothing new: empty batch


def test_rebuild_inherits_format_properties(spark, tmp_path):
    """rebuild without overrides must carry the source's codec_overrides
    and cluster_by — a compaction run must not silently regress the
    snapshot format (review finding r4)."""
    from kmers_spark.operators.encode import encode_table, rebuild_snapshot

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = pages.pages_df(spark, 1000, seed=71, partitions=2).cache()
    encode_table(df, src, num_buckets=4, cluster_by="warc_ts",
                 codec_overrides={"url": "fsst_seg"})
    m = rebuild_snapshot(spark, src, dst)
    assert m["bucket_scheme"] == partitioning.RANGE_SCHEME
    assert m["cluster_by"] == "warc_ts"
    blocks = manifest.block_stats(dst, m)
    url_codecs = {s["codec"] for st in blocks.values()
                  for s in st if s["column"] == "url"}
    assert url_codecs == {"fsst_seg"}
    got = decode_colocated(spark, dst).toPandas() \
        .sort_values("url").reset_index(drop=True)
    assert got.equals(df.toPandas()[got.columns]
                      .sort_values("url").reset_index(drop=True))


def test_catchup_over_many_generations_is_bounded(spark, tmp_path):
    """VERDICT r4 #3 — the no-rate-cap catch-up is 'big but SAFE':
    a reader starting from scratch against a store holding O(40)
    sink generations plans ONE partition per BUCKET (not per
    bucket x generation), and each task's peak working set is one
    generation's blocks (KmersReader.read decodes fragment by
    fragment, yielding between files). Evidence: direct
    partitions(initial, latest) count == committed buckets, each
    partition's path list carries every generation, and one
    availableNow batch drains the whole history exactly once."""
    from pyspark.sql.datasource import InputPartition  # noqa: F401

    from kmers_spark.datasource import KmersStreamReader

    src, out = str(tmp_path / "src"), str(tmp_path / "snap")
    wck, rck = str(tmp_path / "wck"), str(tmp_path / "rck")
    n_files = 40
    df = pages.pages_df(spark, n_files * 5, seed=77, partitions=1).cache()
    total = df.count()
    # one parquet file per 5 rows; maxFilesPerTrigger=1 turns each into
    # its own micro-batch = its own sink GENERATION
    df.repartition(n_files).write.parquet(src)
    datasource.register(spark)
    sdf = spark.readStream.schema(df.schema) \
        .option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        partitioning.with_bucket(sdf, N_B, {}).repartition("bucket")
        .writeStream.format("kmers")
        .option("checkpointLocation", wck)
        .option("numBuckets", str(N_B))
        .trigger(availableNow=True)
        .start(out)
    )
    q.awaitTermination(300)

    m = manifest.load(out)
    n_gens = len(m["wave_dirs"])
    assert n_gens >= 30  # many generations (some triggers may batch 2 files)
    committed = sorted(m["committed_buckets"])

    # 1) planning bound: partitions == buckets, every generation inside
    reader = KmersStreamReader({"path": out}, spark.read.format("kmers").load(out).schema)
    parts = reader.partitions(reader.initialOffset(), reader.latestOffset())
    assert len(parts) == len(committed)
    wb = m.get("wave_buckets", {})
    for p in parts:
        bs, paths, _miss, aux = p.value
        assert aux["streamed"] is True  # read() takes the per-fragment path
        b = bs[0]
        expect = sum(1 for d in m["wave_dirs"] if b in wb.get(d, ()))
        assert len(paths) == expect  # all generations, one partition

    # 2) e2e: one availableNow batch drains the full history exactly once
    seen = []
    q2 = (
        spark.readStream.format("kmers").load(out)
        .writeStream.foreachBatch(lambda b, i: seen.append(b.count()))
        .option("checkpointLocation", rck)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    assert sum(seen) == total
    assert len([c for c in seen if c]) == 1  # the catch-up is ONE batch
