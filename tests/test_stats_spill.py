"""Manifest block-stats spilling (Iceberg manifest-file analogue).

The root manifest is copied on every CAS commit, so per-bucket block
stats for big snapshots spill into `_block_stats.json` INSIDE each
wave dir (same visibility discipline as the data: unregistered until
the manifest commit, swept with an orphan). Every stats consumer —
zone pruning, evolution null-fill, table_stats, the DataSource planner
— must read through manifest.block_stats and behave identically on a
spilled store."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from kmers_spark import manifest, pages, zonemap
from kmers_spark.operators.decode import decode_table, lookup_keys, scan_table
from kmers_spark.operators.encode import compact_waves, encode_table


@pytest.fixture(scope="module")
def spilled_store(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("spill") / "snap")
    df = pages.pages_df(spark, 2000, seed=77, partitions=4).cache()
    old = manifest.STATS_SPILL_ENTRIES
    manifest.STATS_SPILL_ENTRIES = 0  # force spilling at test scale
    try:
        encode_table(df, out, num_buckets=8, detect_skew=False, commit_every=4)
    finally:
        manifest.STATS_SPILL_ENTRIES = old
    return out, df


def test_root_manifest_stays_small(spilled_store):
    out, _df = spilled_store
    m = manifest.load(out)
    assert m["blocks"] == {}  # nothing inline
    assert len(m["stats_files"]) == 2  # one per wave


def test_cumulative_inline_stats_migrate_on_spill(spark, tmp_path):
    """Fine-grained commit_every whose individual waves stay under the
    threshold must still stop the root manifest from accumulating
    O(buckets x columns): once the CUMULATIVE inline stats cross it,
    the next wave's spill file absorbs them and the root empties."""
    out = str(tmp_path / "cumulative")
    df = pages.pages_df(spark, 1200, seed=79, partitions=4).cache()
    old = manifest.STATS_SPILL_ENTRIES
    # waves of 2 buckets x 5 cols = ~12 entries each stay inline until
    # the root's inline stats push the cumulative count over 30
    manifest.STATS_SPILL_ENTRIES = 30
    try:
        encode_table(df, out, num_buckets=6, detect_skew=False, commit_every=2)
    finally:
        manifest.STATS_SPILL_ENTRIES = old
    m = manifest.load(out)
    inline_entries = sum(len(v) for v in m["blocks"].values()) + len(m["blocks"])
    assert m.get("stats_files"), "cumulative growth never triggered a spill"
    assert inline_entries <= 30  # the root stayed bounded
    merged = manifest.block_stats(out, m)
    assert sorted(map(int, merged)) == m["committed_buckets"]  # nothing lost
    back = decode_table(spark, out)
    assert back.count() == 1200
    for rel in m["stats_files"]:
        assert os.path.exists(os.path.join(out, rel))
        assert rel.rsplit("/", 1)[-1].startswith("_")  # parquet readers skip it
    merged = manifest.block_stats(out, m)
    assert sorted(map(int, merged)) == m["committed_buckets"]
    # the spilled stats carry the zone bounds
    assert all("zmin" in s for ss in merged.values() for s in ss
               if s["column"] == "warc_ts")


def test_decode_and_scan_on_spilled_store(spark, spilled_store):
    out, df = spilled_store
    back = decode_table(spark, out).toPandas().sort_values("url").reset_index(drop=True)
    want = df.toPandas().sort_values("url").reset_index(drop=True)
    assert back.equals(want)

    got = scan_table(spark, out, [("lang", "=", "de")]).count()
    assert got == df.filter(df.lang == "de").count() > 0
    # zone pruning still sees the (spilled) bounds: impossible predicate
    # prunes everything driver-side
    norm = zonemap.normalize_filters([("warc_ts", ">", 2**62)], manifest.load(out)["schema"])
    assert zonemap.prune_buckets(
        manifest.load(out), norm, blocks=manifest.block_stats(out, manifest.load(out))
    ) == []


def test_lookup_and_datasource_on_spilled_store(spark, spilled_store):
    from kmers_spark import datasource

    out, df = spilled_store
    u = df.select("url").limit(1).collect()[0]["url"]
    assert lookup_keys(spark, out, [u]).count() == 1

    datasource.register(spark)
    t = spark.read.format("kmers").load(out)
    assert t.count() == 2000
    assert t.filter("lang = 'en'").count() == df.filter(df.lang == "en").count()


def test_table_stats_reads_spilled(spilled_store):
    from kmers_spark.metrics import table_stats

    out, _df = spilled_store
    stats = table_stats(out)
    assert stats["url"]["rows"] == 2000
    assert stats["warc_ts"]["min_bound"] is not None


def test_compaction_consolidates_spilled_stats(spark, tmp_path):
    # own store: compaction mutates it, and the module fixture's other
    # tests assert the two-wave layout (order independence)
    out = str(tmp_path / "spill_compact")
    df = pages.pages_df(spark, 2000, seed=77, partitions=4).cache()
    old = manifest.STATS_SPILL_ENTRIES
    manifest.STATS_SPILL_ENTRIES = 0
    try:
        encode_table(df, out, num_buckets=8, detect_skew=False, commit_every=4)
    finally:
        manifest.STATS_SPILL_ENTRIES = old
    m = compact_waves(spark, out)
    assert len(m["wave_dirs"]) == 1
    assert m["stats_files"] == [f"{m['wave_dirs'][0]}/{manifest.BLOCK_STATS_NAME}"]
    merged = manifest.block_stats(out, m)
    assert sorted(map(int, merged)) == m["committed_buckets"]
    back = decode_table(spark, out)
    assert back.count() == 2000
    # scans still prune and match after consolidation
    got = scan_table(spark, out, [("lang", "=", "de")]).count()
    assert got == df.filter(df.lang == "de").count()


def test_evolution_null_fill_reads_spilled_stats(spark, tmp_path):
    """missing_columns must see spilled stats, else evolved columns on
    old buckets would be treated as corruption."""
    out = str(tmp_path / "spill_evo")
    df = pages.pages_df(spark, 800, seed=78, partitions=2).cache()
    old = manifest.STATS_SPILL_ENTRIES
    manifest.STATS_SPILL_ENTRIES = 0
    try:
        encode_table(df, out, num_buckets=4, detect_skew=False,
                     fail_buckets_over=2)
        manifest.evolve_schema(out, {"score": "double"})
        df2 = df.withColumn("score", F.length("text").cast("double"))
        encode_table(df2, out, num_buckets=4, detect_skew=False)
    finally:
        manifest.STATS_SPILL_ENTRIES = old
    got = decode_table(spark, out)
    assert got.count() == 800
    assert got.filter(F.col("score").isNull()).count() > 0
    assert got.filter(F.col("score").isNotNull()).count() > 0


def test_lookup_opens_only_surviving_waves_spill_files(spark, tmp_path,
                                                       monkeypatch):
    """VERDICT r3 #6: on an evolved+spilled store, a bucket-restricted
    read must open only the spill files of waves holding its buckets —
    not every wave's (counted via an instrumented open)."""
    import builtins

    out = str(tmp_path / "spill_prune")
    df = pages.pages_df(spark, 1200, seed=79, partitions=4).cache()
    old = manifest.STATS_SPILL_ENTRIES
    manifest.STATS_SPILL_ENTRIES = 0
    try:
        encode_table(df, out, num_buckets=8, detect_skew=False, commit_every=2)
    finally:
        manifest.STATS_SPILL_ENTRIES = old
    manifest.evolve_schema(out, {"score": "double"})
    m = manifest.load(out)
    n_spills = len(m.get("stats_files", []))
    assert n_spills == 4  # 8 buckets / commit_every=2

    url = df.select("url").first()["url"]
    opened: list[str] = []
    real_open = builtins.open

    def counting_open(path, *a, **kw):
        if isinstance(path, str) and path.endswith(manifest.BLOCK_STATS_NAME):
            opened.append(path)
        return real_open(path, *a, **kw)

    monkeypatch.setattr(builtins, "open", counting_open)
    got = lookup_keys(spark, out, [url])
    monkeypatch.undo()
    assert 1 <= len(opened) < n_spills, opened
    # and the lookup is still correct (score null-fills on the old rows)
    row = got.collect()
    assert len(row) == 1 and row[0]["url"] == url

    # unrestricted decode still merges ALL spill files
    blocks_all = manifest.block_stats(out, manifest.load(out))
    assert len(blocks_all) == 8


# ----------------------------------------------- streamed-store spill

def _stream_docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.format_string("k-%05d", F.col("id")).alias("url"),
        F.format_string("h-%03d", (F.col("id") % 83)).alias("host"),
        F.col("id").alias("seq"),
    )


def _run_sink(spark, src, out, ck, num_buckets=4, opts=None):
    from kmers_spark import datasource
    from kmers_spark.operators import partitioning

    datasource.register(spark)
    sdf = spark.readStream.schema("url string, host string, seq bigint") \
        .parquet(src)
    b = partitioning.with_bucket(sdf, num_buckets, {}, url_col="url") \
        .repartition("bucket")
    w = (b.writeStream.format("kmers").option("checkpointLocation", ck)
         .option("key", "url").option("numBuckets", str(num_buckets)))
    for k, v in (opts or {}).items():
        w = w.option(k, v)
    q = w.trigger(availableNow=True).start(out)
    q.awaitTermination(120)


def test_streamed_commit_spills_past_threshold(spark, tmp_path,
                                               monkeypatch):
    """commit_wave_append: once root inline stats cross the threshold,
    each new generation's stats land in <wave>/_block_stats.json and
    the root freezes — the manifest stops growing per micro-batch."""
    src = str(tmp_path / "src")
    out, ck = str(tmp_path / "snap"), str(tmp_path / "ck")
    _stream_docs(spark, 0, 900).write.mode("append").parquet(src)
    _run_sink(spark, src, out, ck)  # generation 1: inline (no spill)
    m1 = manifest.load(out)
    assert m1["streamed"] and not m1.get("stats_files")
    inline_before = json.dumps(m1["blocks"], sort_keys=True)

    # generations 2..3 committed directly (the sink's commit runs in a
    # separate Python runner, so thresholds are exercised in-process)
    monkeypatch.setattr(manifest, "STATS_SPILL_ENTRIES", 1)
    for epoch, wave in ((1, "w_spill_a"), (2, "w_spill_b")):
        wave_rel = f"blocks/{wave}"
        os.makedirs(os.path.join(out, wave_rel), exist_ok=True)
        stats = {0: [{"column": "url", "codec": "fsst", "n_rows": 0,
                      "raw_nbytes": 0, "enc_nbytes": 0}]}
        m = manifest.commit_wave_append(out, stats, wave_rel, epoch)
        assert f"{wave_rel}/{manifest.BLOCK_STATS_NAME}" in m["stats_files"]
    m = manifest.load(out)
    # root inline stats byte-identical to before the spilled commits
    assert json.dumps(m["blocks"], sort_keys=True) == inline_before
    # block_stats EXTENDS bucket 0 across root + both spill files
    merged = manifest.block_stats(out, m)
    base = manifest.block_stats(out, m1)
    assert len(merged["0"]) == len(base["0"]) + 2
    # and m's own inline lists were not mutated by the merge
    assert len(m["blocks"]["0"]) == len(base["0"])


def test_streamed_spilled_store_reads_identically(spark, tmp_path):
    """Read-side contract: a streamed store whose generation stats sit
    in per-wave spill files answers every surface identically to the
    same store with inline stats — scan, filtered scan, lookup, the
    DataSource, aggregates (incl. sketch-served approx)."""
    from kmers_spark.operators.agg import agg_table

    src = str(tmp_path / "src")
    out, ck = str(tmp_path / "snap"), str(tmp_path / "ck")
    _stream_docs(spark, 0, 900).write.mode("append").parquet(src)
    _run_sink(spark, src, out, ck, opts={"ndvColumns": "host"})
    _stream_docs(spark, 600, 1500).write.mode("append").parquet(src)
    _run_sink(spark, src, out, ck, opts={"ndvColumns": "host"})

    m = manifest.load(out)
    assert len(m["wave_dirs"]) == 2 and not m.get("stats_files")

    def snapshot_answers():
        got = {}
        got["scan"] = sorted(
            r["url"] for r in scan_table(
                spark, out, [("seq", ">=", 700), ("seq", "<", 1100)]
            ).collect())
        got["lookup"] = sorted(
            r["url"] for r in lookup_keys(
                spark, out, ["k-00007", "k-01400"]).collect())
        got["agg"] = agg_table(
            spark, out, [("count", "*"),
                         ("approx_count_distinct", "host"),
                         ("min", "seq"), ("max", "seq")])
        df = (spark.read.format("kmers").load(out)
              .filter(F.col("seq") < 100))
        got["ds"] = df.count()
        return got

    before = snapshot_answers()

    # relocate each wave's inline stat entries into per-wave spill
    # files — byte-for-byte what commit_wave_append writes past the
    # threshold (entries keep their wave order within a bucket)
    m = manifest.load(out)
    per_wave: dict[str, dict] = {w: {} for w in m["wave_dirs"]}
    wb = m["wave_buckets"]
    for b, entries in m["blocks"].items():
        # generations appended in wave order; split by each wave's
        # bucket membership (a bucket may miss from a wave)
        holders = [w for w in m["wave_dirs"] if int(b) in wb[w]]
        per_col: dict[str, int] = {}
        split: dict[str, list] = {w: [] for w in holders}
        for e in entries:
            i = per_col.get(e["column"], 0)
            per_col[e["column"]] = i + 1
            split[holders[i]].append(e)
        for w, ents in split.items():
            if ents:
                per_wave[w][b] = ents

    def relocate(cur):
        cur["blocks"] = {}
        cur["stats_files"] = [
            f"{w}/{manifest.BLOCK_STATS_NAME}" for w in cur["wave_dirs"]
        ]
        return cur

    for w, payload in per_wave.items():
        with open(os.path.join(out, w, manifest.BLOCK_STATS_NAME), "w") as f:
            json.dump(payload, f, sort_keys=True)
    manifest.commit(out, relocate)
    m2 = manifest.load(out)
    assert m2["blocks"] == {} and len(m2["stats_files"]) == 2

    assert snapshot_answers() == before


def test_mutation_purges_migrated_stats(spark, tmp_path, monkeypatch):
    """A spill MIGRATION parks wave1's bucket entries inside wave2's
    stats file; deleting keys that live in wave1's buckets must not
    leave the stale migrated entries readable (reproduced pre-fix:
    count(*) answered from them was wrong, rows_deleted went negative).
    The mutation now rewrites contaminated surviving files without the
    affected buckets (manifest.amend_surviving_stats_files)."""
    from kmers_spark.operators.agg import agg_table
    from kmers_spark.operators.delete import delete_keys

    df = spark.createDataFrame(
        [(f"k{i:04d}", f"g{i % 5}", i) for i in range(400)],
        "url string, g string, n bigint").cache()
    out = str(tmp_path / "snap")
    # wave1 (4 buckets x 3 cols = 12 entries) stays inline at thr=20;
    # wave2 crosses cumulatively and MIGRATES wave1's inline entries
    # into its own spill file
    monkeypatch.setattr(manifest, "STATS_SPILL_ENTRIES", 20)
    encode_table(df, out, num_buckets=8, key="url", detect_skew=False,
                 commit_every=4)
    m = manifest.load(out)
    assert len(m.get("stats_files", [])) == 1  # wave2's absorbing file
    spill_rel = m["stats_files"][0]
    with open(os.path.join(out, spill_rel)) as f:
        absorbed = json.load(f)
    assert len(absorbed) == 8, "migration should have absorbed wave1"

    doomed = [f"k{i:04d}" for i in range(0, 400, 4)]  # every bucket
    res = delete_keys(spark, out, doomed)
    assert res["rows_deleted"] == 100

    m = manifest.load(out)
    blocks = manifest.block_stats(out, m)
    # every bucket's stats appear EXACTLY once (no stale duplicates)
    total = sum(
        int(s["n_rows"]) for bs in blocks.values() for s in bs
        if s["column"] == "url")
    assert total == 300
    r = agg_table(spark, out, [("count", "*"), ("sum", "n")])
    truth = df.filter(~F.col("url").isin(doomed))
    assert r["count_star"] == 300
    assert r["sum_n"] == truth.agg(F.sum("n")).collect()[0][0]
    got = sorted(r["url"] for r in decode_table(spark, out).select("url").collect())
    assert got == sorted(r["url"] for r in truth.select("url").collect())
