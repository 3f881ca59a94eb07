"""Streaming encode: readStream -> per-micro-batch codec encode -> block
table, exactly-once via (epoch_id, bucket) idempotent commits.

The reference's iterators (CanonicalKmerIterator skipping invalid
symbols as data arrives — canonical_kmer_iterator.rs:42-70) are its
streaming-shaped operators; the engine analog is a Structured Streaming
job whose per-batch work reuses the exact batch encode kernels. Blocks
carry the epoch so replayed batches overwrite deterministically instead
of duplicating (foreachBatch + epoch-suffixed snapshot dir).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import selector
from ..operators.encode import encode_blocks_df


def encode_stream(stream_df: DataFrame, out_dir: str, *, key: str,
                  num_buckets: int = 8, checkpoint: str | None = None):
    """Start a streaming query writing encoded blocks per micro-batch.

    Returns the StreamingQuery. Exactly-once: each epoch writes to
    blocks/epoch=<id>/ with overwrite, so Spark's replay of an epoch
    after failure reproduces identical files (encode is deterministic).
    """
    schema = {f.name: selector.spark_type_name(f.dataType) for f in stream_df.schema.fields}

    def handle_batch(batch_df: DataFrame, epoch_id: int):
        bucketed = batch_df.withColumn(
            "bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets)).cast("int")
        )
        blocks = encode_blocks_df(bucketed, schema, key, None)
        (
            blocks.write.mode("overwrite")
            .option("compression", "none")
            .parquet(f"{out_dir}/blocks/epoch={epoch_id}")
        )

    writer = stream_df.writeStream.foreachBatch(handle_batch).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def decode_stream_output(spark, out_dir: str, schema: dict[str, str]) -> DataFrame:
    """Batch-decode everything a streaming encode produced."""
    from ..operators.decode import _SPARK_TYPE
    from .. import codecs

    out_schema = ", ".join(f"`{c}` {_SPARK_TYPE[t]}" for c, t in schema.items())
    cols = list(schema.keys())
    blocks = spark.read.option("basePath", f"{out_dir}/blocks").parquet(f"{out_dir}/blocks/epoch=*")

    def decode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for (_, _), grp in pdf.groupby(["epoch", "bucket"]):
            # column-wise access (decode.py's rows_by_col shape) — the
            # group is one row per column, but iterrows() materializes
            # every cell as a Python object per row; zip over the three
            # needed columns touches only them
            series = {
                cname: codecs.decode_column(bytes(payload), json.loads(meta))
                for cname, payload, meta in zip(
                    grp["column"], grp["payload"], grp["meta"]
                )
            }
            data = {}
            for c in cols:
                s = series[c]
                if schema[c] == "binary":
                    s = s.map(lambda v: None if v is None else bytes(v))
                data[c] = s.reset_index(drop=True)
            frames.append(pd.DataFrame(data, columns=cols))
        return pd.concat(frames) if frames else pd.DataFrame(columns=cols)

    return blocks.groupBy("epoch", "bucket").applyInPandas(decode_group, out_schema)
