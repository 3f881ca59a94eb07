"""Storage-partitioned join (operators/join.join_colocated): bucket-
aligned, shuffle-free equi-join of two encoded stores.

Covers: exact inner/left/semi/anti semantics vs a plain Spark join on
the raw frames (dup right keys, disjoint key tails, column-name
collision renames), filter-then-join semantics with per-side filters,
projections (including key-less output), driver-side bucket pruning
visible as the task count, a no-Exchange plan assertion, hot-key-salted
twins via encode_table(layout_from=), range-on-key aligned stores,
schema-evolved sides null-filling, a streamed (sink-ingested) right
side, and the full joinable_reason refusal matrix.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kmers_spark import datasource, manifest, pages
from kmers_spark.operators import partitioning
from kmers_spark.operators.encode import encode_table
from kmers_spark.operators.join import (
    join_colocated,
    joinable_reason,
)

N_B = 8


@pytest.fixture(scope="module")
def ldf(spark):
    """Left: 500 unique keys k-0000..k-0499."""
    return spark.range(500).select(
        F.concat(F.lit("k-"), F.format_string("%04d", "id")).alias("k"),
        (F.col("id") * 3).alias("n"),
        F.concat(F.lit("body "), "id").alias("body"),
    ).cache()


@pytest.fixture(scope="module")
def rdf(spark):
    """Right: keys k-0300..k-0799 (200 overlap), every 7th key doubled,
    `n` collides with the left column name."""
    base = spark.range(300, 800).select(
        F.concat(F.lit("k-"), F.format_string("%04d", "id")).alias("k"),
        (F.col("id") * 10).alias("n"),
        (F.col("id") / 2.0).alias("score"),
    )
    dup = base.filter(F.xxhash64("k") % 7 == 0) \
              .withColumn("score", F.col("score") + 1000.0)
    return base.unionAll(dup).cache()


@pytest.fixture(scope="module")
def stores(spark, ldf, rdf, tmp_path_factory):
    root = tmp_path_factory.mktemp("join")
    left, right = str(root / "left"), str(root / "right")
    encode_table(ldf, left, key="k", num_buckets=N_B, detect_skew=False)
    encode_table(rdf, right, key="k", num_buckets=N_B,
                 detect_skew=False, layout_from=left)
    return left, right


def _rows(df, cols):
    return sorted(
        tuple(r) for r in df.select(*[F.col(c) for c in cols]).collect()
    )


def _expected(ldf, rdf, how, cols, lfilter=None, rfilter=None):
    l = ldf.filter(lfilter) if lfilter is not None else ldf
    r = rdf.withColumnRenamed("n", "n_r")
    if rfilter is not None:
        r = r.filter(rfilter)
    spark_how = {"inner": "inner", "left": "left",
                 "semi": "leftsemi", "anti": "leftanti"}[how]
    return _rows(l.join(r, "k", spark_how), cols)


FULL_COLS = ["k", "n", "body", "n_r", "score"]
LEFT_COLS = ["k", "n", "body"]


# ------------------------------------------------------------ semantics

@pytest.mark.parametrize("how,cols", [
    ("inner", FULL_COLS), ("left", FULL_COLS),
    ("semi", LEFT_COLS), ("anti", LEFT_COLS),
])
def test_matches_spark_join(spark, ldf, rdf, stores, how, cols):
    left, right = stores
    got = join_colocated(spark, left, right, how=how, rsuffix="_r")
    assert _rows(got, cols) == _expected(ldf, rdf, how, cols)
    # sanity on the shape: overlap is 200 keys, ~1/7 of them doubled
    n = len(_rows(got, cols))
    if how == "inner":
        assert n > 200
    if how == "anti":
        assert n == 300


def test_filters_apply_before_join(spark, ldf, rdf, stores):
    left, right = stores
    got = join_colocated(
        spark, left, right, how="left", rsuffix="_r",
        filters_left=[("n", ">=", 300)],
        filters_right=[("score", "<", 250.0)],
    )
    want = _expected(ldf, rdf, "left", FULL_COLS,
                     lfilter="n >= 300", rfilter="score < 250.0")
    assert _rows(got, FULL_COLS) == want


def test_projection_and_rename(spark, ldf, rdf, stores):
    left, right = stores
    got = join_colocated(spark, left, right,
                         columns_left=["k", "body"],
                         columns_right=["score"])
    assert got.columns == ["k", "body", "score"]
    want = _rows(
        ldf.join(rdf.select("k", "score"), "k", "inner"),
        ["k", "body", "score"],
    )
    assert _rows(got, ["k", "body", "score"]) == want


def test_keyless_projection(spark, ldf, rdf, stores):
    """The join key can be projected OUT — it is still decoded and
    joined on, just not emitted."""
    left, right = stores
    got = join_colocated(spark, left, right,
                         columns_left=["body"], columns_right=["score"])
    assert got.columns == ["body", "score"]
    want = _rows(ldf.join(rdf.select("k", "score"), "k", "inner"),
                 ["body", "score"])
    assert _rows(got, ["body", "score"]) == want


def test_right_key_projection_ignored(spark, ldf, rdf, stores):
    """Asking for the right key yields it once (as the left key)."""
    left, right = stores
    got = join_colocated(spark, left, right,
                         columns_left=["k"], columns_right=["k", "score"])
    assert got.columns == ["k", "score"]


# ------------------------------------------------------------ the plan

def test_plan_has_no_exchange(spark, stores):
    left, right = stores
    got = join_colocated(spark, left, right)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_task_per_surviving_bucket(spark, stores):
    left, right = stores
    got = join_colocated(spark, left, right)
    assert got.rdd.getNumPartitions() == N_B
    chunked = join_colocated(spark, left, right, buckets_per_task=3)
    assert chunked.rdd.getNumPartitions() == (N_B + 2) // 3
    assert sorted(chunked.collect()) == sorted(got.collect())


# ------------------------------------------------------- range-aligned

@pytest.fixture(scope="module")
def range_stores(spark, ldf, rdf, tmp_path_factory):
    root = tmp_path_factory.mktemp("join_range")
    left, right = str(root / "left"), str(root / "right")
    encode_table(ldf, left, key="k", num_buckets=N_B, cluster_by="k")
    encode_table(rdf, right, key="k", num_buckets=N_B, layout_from=left)
    return left, right


def test_range_on_key_join_matches(spark, ldf, rdf, range_stores):
    left, right = range_stores
    mr = manifest.load(right)
    assert mr["bucket_scheme"] == partitioning.RANGE_SCHEME
    assert mr["range_boundaries"] == manifest.load(left)["range_boundaries"]
    got = join_colocated(spark, left, right, how="left", rsuffix="_r")
    assert _rows(got, FULL_COLS) == _expected(ldf, rdf, "left", FULL_COLS)


def test_range_filter_prunes_tasks(spark, ldf, rdf, range_stores):
    """A key-range filter on a range-on-key store drops whole bucket
    pairs driver-side: the task count IS the pruning evidence."""
    left, right = range_stores
    got = join_colocated(spark, left, right,
                         filters_left=[("k", ">=", "k-0450")])
    assert got.rdd.getNumPartitions() < N_B
    want = _expected(ldf, rdf, "inner", FULL_COLS, lfilter="k >= 'k-0450'")
    assert _rows(got, FULL_COLS) == want


def test_disjoint_key_ranges_prune_pairs(spark, ldf, tmp_path_factory):
    """Exact per-bucket key intervals drop pairs that cannot match: the
    right store shares the left's boundaries but holds keys k-0000..0436
    and k-0500..0999 — its TOP bucket's interval starts at k-0500, past
    the left top bucket's k-0499 max, so that one pair (and only it)
    is pruned driver-side."""
    root = tmp_path_factory.mktemp("join_disjoint")
    left, right = str(root / "left"), str(root / "right")
    encode_table(ldf, left, key="k", num_buckets=N_B, cluster_by="k")
    spark_ = ldf.sparkSession
    r = spark_.range(1000).filter("id < 437 or id >= 500").select(
        F.concat(F.lit("k-"), F.format_string("%04d", "id")).alias("k"),
        (F.col("id") * 10).alias("m"),
    ).cache()
    encode_table(r, right, key="k", num_buckets=N_B, layout_from=left)
    got = join_colocated(spark_, left, right)
    assert got.rdd.getNumPartitions() == N_B - 1
    want = _rows(ldf.join(r, "k", "inner"), ["k", "n", "body", "m"])
    assert _rows(got, ["k", "n", "body", "m"]) == want


def test_empty_buckets_prune_pairs(spark, ldf, rdf, range_stores):
    """Right rows (k-0300..0799) never reach the left layout's bottom
    buckets; committed-but-empty buckets are provably pathless, so the
    inner join spawns fewer tasks than the bucket count."""
    left, right = range_stores
    got = join_colocated(spark, left, right)
    assert got.rdd.getNumPartitions() < N_B
    assert _rows(got, FULL_COLS) == _expected(ldf, rdf, "inner", FULL_COLS)


def test_all_pruned_returns_empty(spark, range_stores):
    left, right = range_stores
    got = join_colocated(spark, left, right,
                         filters_left=[("k", ">", "k-9999")])
    assert got.count() == 0
    assert got.columns == FULL_COLS


# ------------------------------------------------- hot-key salted twins

def test_layout_from_copies_hot_salts(spark, tmp_path_factory):
    """URL keys with one hot host: the donor's salt table must carry to
    the twin or the hot host's rows land in different buckets."""
    root = tmp_path_factory.mktemp("join_hot")
    n = 400
    l = spark.range(n).select(
        F.when(F.col("id") % 2 == 0,
               F.concat(F.lit("http://hot.example/p"), "id"))
         .otherwise(F.concat(F.lit("http://h"), "id", F.lit(".com/")))
         .alias("url"),
        F.col("id").alias("n"),
    ).cache()
    r = l.select("url", (F.col("n") * 2).alias("m"))
    left, right = str(root / "left"), str(root / "right")
    encode_table(l, left, key="url", num_buckets=N_B)
    ml = manifest.load(left)
    assert ml["hot_keys"], "fixture must actually produce a hot host"
    encode_table(r, right, key="url", num_buckets=N_B, layout_from=left)
    assert manifest.load(right)["hot_keys"] == ml["hot_keys"]
    got = join_colocated(spark, left, right)
    want = _rows(l.join(r, "url", "inner"), ["url", "n", "m"])
    assert _rows(got, ["url", "n", "m"]) == want
    assert len(want) == n


# ------------------------------------------------------ evolved stores

def test_evolved_left_null_fills(spark, ldf, rdf, stores, tmp_path_factory):
    root = tmp_path_factory.mktemp("join_evo")
    left = str(root / "left")
    encode_table(ldf, left, key="k", num_buckets=N_B, detect_skew=False)
    manifest.evolve_schema(left, {"extra": "int64"})
    got = join_colocated(spark, left, stores[1],
                         columns_left=["k", "extra"],
                         columns_right=["score"])
    rows = _rows(got, ["k", "extra", "score"])
    assert rows and all(r[1] is None for r in rows)
    want = _rows(ldf.select("k", F.lit(None).cast("long").alias("extra"))
                    .join(rdf.select("k", "score"), "k", "inner"),
                 ["k", "extra", "score"])
    assert rows == want


# ------------------------------------------------------- streamed side

def test_streamed_sink_right_side(spark, tmp_path_factory):
    """Batch store joined against a writeStream-ingested store: the
    sink declared bucketScheme=host_or_key with the same num_buckets
    and empty salt table, so the manifests prove alignment; the right
    bucket reads union its generations."""
    root = tmp_path_factory.mktemp("join_stream")
    df = pages.pages_df(spark, 600, seed=31, partitions=4).cache()
    left = str(root / "left")
    encode_table(df.select("url", "text", "lang"), left,
                 key="url", num_buckets=N_B, detect_skew=False)
    src, out, ckpt = str(root / "src"), str(root / "right"), str(root / "ck")
    datasource.register(spark)
    rdf = df.select("url", "warc_ts").cache()
    h = F.abs(F.xxhash64("url")) % 2
    for i in range(2):  # two micro-batches -> two generations per bucket
        rdf.filter(h == i).write.mode("append").parquet(src)
        sdf = spark.readStream.schema(rdf.schema).parquet(src)
        q = (
            partitioning.with_bucket(sdf, N_B, {}).repartition("bucket")
            .writeStream.format("kmers")
            .option("checkpointLocation", ckpt)
            .option("numBuckets", str(N_B))
            .option("bucketScheme", partitioning.BUCKET_SCHEME)
            .trigger(availableNow=True)
            .start(out)
        )
        q.awaitTermination(120)
    m = manifest.load(out)
    assert m.get("streamed") and len(m["wave_dirs"]) == 2
    got = join_colocated(spark, left, out, how="left")
    cols = ["url", "text", "lang", "warc_ts"]
    want = _rows(df.select("url", "text", "lang").join(rdf, "url", "left"),
                 cols)
    assert _rows(got, cols) == want


# -------------------------------------------------------- refusals

def _m(scheme=partitioning.BUCKET_SCHEME, nb=N_B, key="k", ktype="string",
       hot=None, cluster=None, bounds=None, seed=42):
    m = {"bucket_scheme": scheme, "num_buckets": nb, "key": key,
         "schema": {key: ktype}, "seed": seed, "hot_keys": hot or {}}
    if cluster is not None:
        m["cluster_by"] = cluster
    if bounds is not None:
        m["range_boundaries"] = bounds
    return m


def test_joinable_reason_matrix():
    ok = _m()
    assert joinable_reason(ok, _m()) is None
    assert "num_buckets" in joinable_reason(ok, _m(nb=4))
    assert "key column types" in joinable_reason(ok, _m(ktype="int64"))
    assert "schemes differ" in joinable_reason(
        ok, _m(scheme=partitioning.RANGE_SCHEME, cluster="k", bounds=["a"]))
    assert "seeds" in joinable_reason(ok, _m(seed=7))
    assert "hot-key salt" in joinable_reason(ok, _m(hot={"h": 3}))
    rng = _m(scheme=partitioning.RANGE_SCHEME, cluster="k", bounds=["a"])
    assert joinable_reason(rng, _m(scheme=partitioning.RANGE_SCHEME,
                                   cluster="k", bounds=["a"])) is None
    assert "boundaries differ" in joinable_reason(
        rng, _m(scheme=partitioning.RANGE_SCHEME, cluster="k", bounds=["b"]))
    off_key = _m(scheme=partitioning.RANGE_SCHEME, cluster="other",
                 bounds=["a"])
    off_key["schema"]["other"] = "int64"
    assert "non-key column" in joinable_reason(off_key, off_key)
    for scheme in (partitioning.ZORDER_SCHEME, partitioning.EXTERNAL_SCHEME,
                   "future_scheme"):
        bad = _m(scheme=scheme)
        assert "not a function of the key" in joinable_reason(bad, bad)


def test_misaligned_stores_raise(spark, ldf, rdf, stores, tmp_path_factory):
    other = str(tmp_path_factory.mktemp("join_bad") / "nb4")
    encode_table(rdf, other, key="k", num_buckets=4, detect_skew=False)
    with pytest.raises(ValueError, match="not bucket-aligned"):
        join_colocated(spark, stores[0], other)


def test_bad_args(spark, stores):
    left, right = stores
    with pytest.raises(ValueError, match="how"):
        join_colocated(spark, left, right, how="outer")
    with pytest.raises(KeyError, match="columns_right"):
        join_colocated(spark, left, right, columns_right=["nope"])
    with pytest.raises(ValueError, match="columns_left"):
        join_colocated(spark, left, right, columns_left=[])
    with pytest.raises(ValueError, match="rsuffix"):
        join_colocated(spark, left, right, rsuffix="")  # n -> n collides


# ------------------------------------------------------- layout_from

def test_layout_from_mutually_exclusive(spark, ldf, stores, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lf") / "x")
    with pytest.raises(ValueError, match="mutually exclusive"):
        encode_table(ldf, out, key="k", cluster_by="k",
                     layout_from=stores[0])


def test_layout_from_missing_donor(spark, ldf, tmp_path_factory):
    root = tmp_path_factory.mktemp("lf2")
    with pytest.raises(FileNotFoundError, match="layout_from"):
        encode_table(ldf, str(root / "x"), key="k",
                     layout_from=str(root / "nope"))


def test_layout_from_resume_mismatch(spark, ldf, rdf, stores,
                                     tmp_path_factory):
    """An existing snapshot whose layout differs from the donor must
    refuse to resume under layout_from."""
    root = tmp_path_factory.mktemp("lf3")
    mine = str(root / "mine")
    encode_table(rdf, mine, key="k", num_buckets=4, detect_skew=False)
    with pytest.raises(ValueError, match="incompatible|different bucket layout"):
        encode_table(rdf, mine, key="k", num_buckets=4,
                     layout_from=stores[0])


# ------------------------------------------------------- NULL join keys

def test_null_keys_match_spark(spark, tmp_path_factory):
    """SQL equality never matches NULL: inner/semi drop NULL-key rows on
    both sides, left/anti keep left NULLs unmatched. NULL keys hash to
    one deterministic bucket (xxhash64(NULL) = seed) on BOTH aligned
    sides, so the bucket-local join sees them — semantics must still be
    Spark's."""
    root = tmp_path_factory.mktemp("join_nulls")
    l = spark.range(60).select(
        F.when(F.col("id") % 5 == 0, F.lit(None)).otherwise(
            F.concat(F.lit("k-"), F.format_string("%03d", "id"))).alias("k"),
        F.col("id").alias("n"),
    ).cache()
    r = spark.range(30, 90).select(
        F.when(F.col("id") % 4 == 0, F.lit(None)).otherwise(
            F.concat(F.lit("k-"), F.format_string("%03d", "id"))).alias("k"),
        (F.col("id") * 2).alias("v"),
    ).cache()
    left, right = str(root / "l"), str(root / "r")
    encode_table(l, left, key="k", num_buckets=4, detect_skew=False)
    encode_table(r, right, key="k", num_buckets=4, detect_skew=False,
                 layout_from=left)

    def rows(df, cols):  # None-tolerant deterministic order
        key = lambda t: tuple("\x00" if v is None else str(v) for v in t)
        return sorted((tuple(r) for r in df.select(*cols).collect()), key=key)

    for how, cols, spark_how in [
        ("inner", ["k", "n", "v"], "inner"),
        ("left", ["k", "n", "v"], "left"),
        ("semi", ["k", "n"], "leftsemi"),
        ("anti", ["k", "n"], "leftanti"),
    ]:
        got = rows(join_colocated(spark, left, right, how=how), cols)
        want = rows(l.join(r, "k", spark_how), cols)
        assert got == want, how
        if how == "anti":  # left NULL keys survive anti (NOT EXISTS)
            assert sum(1 for t in got if t[0] is None) == 12
