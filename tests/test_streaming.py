"""Structured Streaming encode: micro-batches -> blocks -> decode identity."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kmers_spark import pages, selector
from kmers_spark.streaming import encode_stream as es


@pytest.mark.slow
def test_stream_encode_decode(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # two parquet "arrivals" of the deterministic pages stream
    df1 = pages.pages_df(spark, 300, partitions=2)
    df1.write.mode("overwrite").parquet(src)

    schema = {f.name: selector.spark_type_name(f.dataType) for f in df1.schema.fields}
    stream = (
        spark.readStream.schema(df1.schema).option("maxFilesPerTrigger", 2).parquet(src)
    )
    q = es.encode_stream(stream, out, key="url", num_buckets=4, checkpoint=ckpt)
    q.processAllAvailable()
    q.stop()

    decoded = es.decode_stream_output(spark, out, schema)
    orig = spark.read.parquet(src)
    assert decoded.count() == orig.count()
    bad = (
        orig.alias("a")
        .join(decoded.alias("b"), "url")
        .filter(
            ~(
                (F.col("a.html") == F.col("b.html"))
                & (F.col("a.lang") == F.col("b.lang"))
                & (F.col("a.warc_ts") == F.col("b.warc_ts"))
            )
        )
        .count()
    )
    assert bad == 0


@pytest.mark.slow
def test_windowed_agg_stream_equals_batch(spark, tmp_path):
    """Watermarked windowed aggregation over the events stream matches the
    batch groupBy(window(...)) on the same data (late-data semantics are
    a no-op here because the source replays in order)."""
    src = "/root/testdata/sf0.001/events.parquet"
    batch = spark.read.parquet(src).withColumn(
        "ts", F.col("ts").cast("timestamp")  # watermarks need TZ-aware event time
    )

    agg_batch = (
        batch.groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v"))
        .collect()
    )

    import shutil as _sh

    src_dir = str(tmp_path / "events_src")
    import os as _os

    _os.makedirs(src_dir, exist_ok=True)
    _sh.copy(src, f"{src_dir}/events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_agg")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    agg_stream = spark.sql("SELECT * FROM win_agg").collect()

    key = lambda r: (r["window"]["start"], r["event_type"])
    b = {key(r): (r["n"], r["v"]) for r in agg_batch}
    s = {key(r): (r["n"], r["v"]) for r in agg_stream}
    assert b == s


@pytest.mark.slow
def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer over two arrivals == the batch
    sessionize query on the union (state carries session counters and
    last-seen across micro-batches)."""
    from kmers_spark.functions import olap
    from kmers_spark.streaming import stateful

    sf = "/root/testdata/sf0.001"
    from pyspark.sql import Window as W

    ev = spark.read.parquet(f"{sf}/events.parquet").select("event_id", "user_id", "ts")
    src = str(tmp_path / "ev_src")
    # arrival order must respect per-user ts order: split at the global
    # ts median (percent_rank is type-agnostic; NTZ won't cast to double)
    ranked = ev.withColumn("r", F.percent_rank().over(W.orderBy("ts", "event_id")))
    ranked.filter(F.col("r") <= 0.5).drop("r").coalesce(1).write.parquet(f"{src}/b=1")
    ranked.filter(F.col("r") > 0.5).drop("r").coalesce(1).write.parquet(f"{src}/b=2")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b=*")
    )
    out = stateful.sessionize_stream(stream, gap_s=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r["event_id"], r["user_id"]): r["session_id"]
        for r in spark.table("sess_out").collect()
    }
    expect = {
        (r["event_id"], r["user_id"]): r["session_id"]
        for r in olap.sessionize(spark, sf).collect()
    }
    assert len(got) == len(expect)
    assert got == expect
