"""Key Bloom sidecars (kernels/bloom.py): per-bucket filters written by
the encode tasks, registered per wave in the manifest, probed driver-
side by lookup_keys so absent keys INSIDE a bucket's key range skip
the decode entirely.

Covers: hash-kernel equivalence (vectorized numpy vs pure-python
probe), fpr, build edge cases, sidecar file round-trip, the lookup
pruning contract (zero decode calls for definitely-absent keys,
present keys unaffected), mutation interplay (delete regenerates,
upsert regenerates for new keys, carry-forward keeps verbatim buckets
covered, compact_waves carries all), int64-key stores, range-bucketed
stores, pre-bloom snapshot degradation, and staging-dir hygiene.
"""
import os

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from kmers_spark import arrowview as av
from kmers_spark import manifest
from kmers_spark.kernels import bloom
from kmers_spark.operators import decode as dmod
from kmers_spark.operators.decode import lookup_keys
from kmers_spark.operators.delete import delete_keys
from kmers_spark.operators.encode import compact_waves, encode_table
from kmers_spark.operators.upsert import upsert_table
from kmers_spark.pages import pages_df


# ------------------------------------------------------------------ kernel

def test_hash_equivalence_strings():
    keys = ["", "a", "https://host1.example.com/p?q=1", "x" * 300,
            "héllo✓ unicode", "a" * 31, "trailing\x00", "\x00\x00"]
    arr = pa.array(keys, pa.string())
    buf, offs = av.bytes_view(arr)
    h1, h2 = bloom._poly_hashes_bytes_np(buf, offs)
    for i, k in enumerate(keys):
        p1, p2 = bloom._poly_hashes_bytes_py(k.encode())
        assert (int(h1[i]), int(h2[i])) == (p1, p2), k
    # sliced (offset) buffers hash identically
    sl = arr.slice(2, 4)
    b2, o2 = av.bytes_view(sl)
    s1, _s2 = bloom._poly_hashes_bytes_np(b2, o2)
    assert list(s1) == list(h1[2:6])


def test_hash_equivalence_ints():
    vals = np.array([0, 1, -1, 2**62, -(2**62), 12345, -99], np.int64)
    h1, h2 = bloom._poly_hashes_int_np(vals)
    for i, v in enumerate(vals):
        p1, p2 = bloom._poly_hashes_int_py(int(v))
        assert (int(h1[i]), int(h2[i])) == (p1, p2)


def test_build_probe_no_false_negatives_and_low_fpr():
    keys = [f"https://h{i % 97}.example.com/p{i}" for i in range(4000)]
    payload, meta = bloom.build_for_key_arrow(pa.array(keys), "string")
    assert all(bloom.probe(payload, meta, k) for k in keys)
    fp = sum(bloom.probe(payload, meta, f"nope://{i}") for i in range(4000))
    assert fp / 4000 < 0.03  # ~1% expected at 10 bits/key, k=7


def test_build_int64_and_edge_cases():
    p, m = bloom.build_for_key_arrow(
        pa.array(list(range(500)), pa.int64()), "int64")
    assert all(bloom.probe(p, m, v) for v in range(500))
    assert sum(bloom.probe(p, m, v)
               for v in range(10**7, 10**7 + 1000)) / 1000 < 0.03
    # nulls dropped; all-null -> None; unsupported type -> None
    assert bloom.build_for_key_arrow(
        pa.array([None, None], pa.string()), "string") is None
    p2, m2 = bloom.build_for_key_arrow(
        pa.array(["a", None, "b"]), "string")
    assert m2["n_keys"] == 2 and bloom.probe(p2, m2, "a")
    assert bloom.build_for_key_arrow(
        pa.array([1.5], pa.float64()), "double") is None
    # unknown algo never prunes
    assert bloom.probe(b"", {"algo": "other"}, "x") is True


def test_sidecar_roundtrip(tmp_path):
    d = str(tmp_path / "_blooms")
    payload, meta = bloom.build_for_key_arrow(pa.array(["k1", "k2"]),
                                              "string")
    path = bloom.write_sidecar(d, 7, payload, meta)
    assert os.path.basename(path).startswith("b7_")
    got_p, got_m = bloom.read_sidecar(path)
    assert got_p == payload and got_m == meta
    listing = bloom.list_sidecars(d)
    assert list(listing) == [7] and listing[7] == [path]
    assert bloom.list_sidecars(str(tmp_path / "nope")) == {}


# ------------------------------------------------------------- store paths

@pytest.fixture(scope="module")
def pages(spark):
    return pages_df(spark, 3000, seed=31, partitions=2).cache()


@pytest.fixture(scope="module")
def urls(pages):
    return sorted(r["url"] for r in pages.select("url").collect())


def _spy_decode(monkeypatch):
    calls = []
    real = dmod.decode_colocated

    def spy(spark, out_dir, **kw):
        calls.append(sorted(kw.get("buckets") or []))
        return real(spark, out_dir, **kw)

    monkeypatch.setattr(dmod, "decode_colocated", spy)
    return calls


def test_encode_registers_blooms(spark, pages, tmp_path):
    out = str(tmp_path / "snap")
    m = encode_table(pages, out, num_buckets=8)
    assert sorted(m["bloom_buckets"][m["wave_dirs"][0]]) == list(range(8))
    files = bloom.list_sidecars(
        os.path.join(out, m["wave_dirs"][0], bloom.BLOOM_DIR))
    assert sorted(files) == list(range(8))
    # no staging leftovers
    root = os.path.join(out, "blocks")
    assert not [n for n in os.listdir(root) if n.startswith(".bloomstage")]


def test_lookup_absent_in_range_skips_decode(
        spark, pages, urls, tmp_path, monkeypatch):
    out = str(tmp_path / "snap")
    encode_table(pages, out, num_buckets=8)
    absent = urls[50] + "!zz"  # inside [min_key, max_key], not a key
    assert urls[0] < absent < urls[-1]
    calls = _spy_decode(monkeypatch)
    assert lookup_keys(spark, out, [absent]).count() == 0
    assert calls == []  # bloom pruned every candidate: no Spark job
    assert lookup_keys(spark, out, [urls[50]]).count() == 1
    assert len(calls) == 1 and len(calls[0]) >= 1
    # mixed probe: present key decodes its bucket only
    calls.clear()
    got = lookup_keys(spark, out, [absent, urls[51]])
    assert got.count() == 1
    assert len(calls) == 1


def test_range_bucketed_store_bloom(spark, pages, urls, tmp_path,
                                    monkeypatch):
    out = str(tmp_path / "snap")
    encode_table(pages, out, num_buckets=8, cluster_by="warc_ts",
                 detect_skew=False)
    absent = urls[50] + "!zz"
    calls = _spy_decode(monkeypatch)
    # range-on-other-column: every committed bucket is a key candidate;
    # blooms must still prune all of them for an absent-in-range key
    assert lookup_keys(spark, out, [absent]).count() == 0
    assert calls == []
    assert lookup_keys(spark, out, [urls[50]]).count() == 1


def test_int64_key_store_bloom(spark, tmp_path, monkeypatch):
    df = spark.createDataFrame(
        [(i * 3, f"v{i}") for i in range(900)], "id bigint, v string"
    )
    out = str(tmp_path / "snap")
    encode_table(df, out, key="id", num_buckets=4)
    calls = _spy_decode(monkeypatch)
    # 7 is inside [0, 2697] but not a key (ids are multiples of 3)
    assert lookup_keys(spark, out, ["7"]).count() == 0
    assert calls == []
    assert lookup_keys(spark, out, ["9"]).count() == 1
    # unparseable probe against int64 keys: provably absent, no decode
    calls.clear()
    assert lookup_keys(spark, out, ["not-a-number"]).count() == 0
    assert calls == []


def test_pre_bloom_snapshot_degrades(spark, pages, urls, tmp_path,
                                     monkeypatch):
    out = str(tmp_path / "snap")
    encode_table(pages, out, num_buckets=8)
    # simulate a pre-bloom snapshot: drop the manifest registration
    m, v = manifest.load_with_version(out)
    import json
    vpath = os.path.join(out, f"{manifest.VERSION_PREFIX}{v}.json")
    with open(vpath) as f:
        raw = json.load(f)
    raw.pop("bloom_buckets", None)
    with open(vpath, "w") as f:
        json.dump(raw, f)
    absent = urls[50] + "!zz"
    calls = _spy_decode(monkeypatch)
    assert lookup_keys(spark, out, [absent]).count() == 0
    assert len(calls) == 1  # no pruning, but correct
    assert lookup_keys(spark, out, [urls[50]]).count() == 1


# --------------------------------------------------------------- mutations

def test_delete_keeps_bloom_exact(spark, pages, urls, tmp_path,
                                  monkeypatch):
    out = str(tmp_path / "snap")
    encode_table(pages, out, num_buckets=8)
    doomed = [urls[5], urls[1500]]
    delete_keys(spark, out, doomed)
    m = manifest.load(out)
    covered = {b for v in m["bloom_buckets"].values() for b in v}
    assert covered == set(range(8))  # fresh + carried-forward
    assert lookup_keys(spark, out, [doomed[0]]).count() == 0
    assert lookup_keys(spark, out, [urls[100]]).count() == 1
    # absent-in-range still fully pruned after the consolidation
    calls = _spy_decode(monkeypatch)
    assert lookup_keys(spark, out, [urls[50] + "!zz"]).count() == 0
    assert calls == []


def test_upsert_new_keys_never_false_absent(spark, pages, tmp_path):
    """THE Bloom safety property under mutation: a stale filter lacking
    upserted keys would wrongly prune them — regeneration must make
    every new key findable."""
    out = str(tmp_path / "snap")
    encode_table(pages, out, num_buckets=8)
    batch = pages.limit(40).withColumn(
        "url", F.concat(F.lit("fresh://"), F.col("url")))
    upsert_table(spark, out, batch)
    newkeys = [r["url"] for r in batch.select("url").collect()]
    assert lookup_keys(spark, out, newkeys).count() == 40
    # updated-in-place keys stay findable too
    upd = pages.limit(5).withColumn("lang", F.lit("xx"))
    upsert_table(spark, out, upd)
    keys5 = [r["url"] for r in upd.select("url").collect()]
    got = lookup_keys(spark, out, keys5)
    assert got.count() == 5
    assert {r["lang"] for r in got.collect()} == {"xx"}


def test_compact_carries_blooms(spark, pages, urls, tmp_path,
                                monkeypatch):
    out = str(tmp_path / "snap")
    encode_table(pages, out, num_buckets=8, commit_every=3)
    m = manifest.load(out)
    assert len(m["wave_dirs"]) == 3  # ceil(8/3)
    m2 = compact_waves(spark, out)
    assert len(m2["wave_dirs"]) == 1
    assert sorted(m2["bloom_buckets"][m2["wave_dirs"][0]]) == list(range(8))
    calls = _spy_decode(monkeypatch)
    assert lookup_keys(spark, out, [urls[50] + "!zz"]).count() == 0
    assert calls == []
    assert lookup_keys(spark, out, [urls[50]]).count() == 1


def test_sweep_reclaims_dead_staging(spark, pages, tmp_path):
    from kmers_spark.operators.encode import sweep_orphan_waves

    out = str(tmp_path / "snap")
    encode_table(pages, out, num_buckets=4)
    root = os.path.join(out, "blocks")
    stale = os.path.join(root, ".bloomstage-w_deadbeef")
    os.makedirs(stale)
    os.utime(stale, (1, 1))  # ancient
    live = os.path.join(root, ".bloomstage-w_inflight")
    os.makedirs(live)  # fresh mtime: in-flight write, must survive
    sweep_orphan_waves(out)
    assert not os.path.exists(stale)
    assert os.path.exists(live)


# ------------------------------------------------------------------ sinks

def test_stream_sink_registers_blooms_per_generation(
        spark, pages, urls, tmp_path, monkeypatch):
    """The exactly-once sink stages bloom files beside its data files;
    each committed micro-batch registers its generation's coverage, so
    a multi-generation streamed store still prunes absent keys."""
    from kmers_spark import datasource
    from kmers_spark.operators import partitioning

    datasource.register(spark)
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "snap", "ckpt"))
    half1 = pages.filter(F.xxhash64("url") % 2 == 0)
    half2 = pages.filter(F.xxhash64("url") % 2 != 0)

    def run_sink():
        sdf = spark.readStream.schema(pages.schema).parquet(src)
        b = partitioning.with_bucket(sdf, 8, {}).repartition("bucket")
        q = (b.writeStream.format("kmers")
             .option("checkpointLocation", ckpt)
             .option("numBuckets", "8")
             .trigger(availableNow=True).start(out))
        q.awaitTermination(120)

    half1.write.parquet(src)
    run_sink()
    half2.write.mode("append").parquet(src)
    run_sink()
    m = manifest.load(out)
    assert len(m["wave_dirs"]) == 2
    assert set(m["bloom_buckets"]) == set(m["wave_dirs"])
    # no staged bloom leftovers in the staging dir
    staging = os.path.join(out, "blocks", ".stream-staging")
    if os.path.isdir(staging):
        assert not [n for n in os.listdir(staging)
                    if n.startswith(".staged-bloom")]
    calls = _spy_decode(monkeypatch)
    assert lookup_keys(spark, out, [urls[100] + "!zz"]).count() == 0
    assert calls == []  # both generations covered: fully pruned
    assert lookup_keys(spark, out, [urls[100]]).count() == 1


def test_batch_ds_writer_registers_blooms(spark, pages, urls, tmp_path,
                                          monkeypatch):
    from kmers_spark import datasource
    from kmers_spark.operators import partitioning

    datasource.register(spark)
    out = str(tmp_path / "snap")
    bdf = partitioning.with_bucket(pages, 8, {}).repartition("bucket")
    (bdf.write.format("kmers").mode("append")
     .option("numBuckets", "8").option("bucketScheme", "host_or_key")
     .save(out))
    m = manifest.load(out)
    assert sorted(m["bloom_buckets"][m["wave_dirs"][0]]) == list(range(8))
    calls = _spy_decode(monkeypatch)
    assert lookup_keys(spark, out, [urls[100] + "!zz"]).count() == 0
    assert calls == []
    assert lookup_keys(spark, out, [urls[100]]).count() == 1
