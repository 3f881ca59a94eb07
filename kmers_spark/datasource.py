"""Spark Python DataSource over the compressed block store — the store
as a first-class `spark.read` table with Catalyst-driven pruning.

    spark.dataSource.register(KmersDataSource)
    df = spark.read.format("kmers").load("/path/to/snapshot")
    df.filter("lang = 'pl' AND warc_ts >= '2024-01-10'").select("url")

Catalyst hands the reader its column projection (reader(schema)) and
its AND-of-filters (pushFilters). Both drive the same machinery
scan_table uses, now *inside Spark's planner*:

  1. zone-map bucket pruning from the manifest (fewer input
     partitions — a predicate outside every bucket's bounds plans an
     EMPTY scan);
  2. wave-dir pruning per surviving bucket;
  3. executor-side: block rows are fetched with pyarrow.parquet
     (bucket == b row-group predicate — no nested SparkSession), the
     kernel mask late-materializes, segmented codecs skip segments;
  4. only projected columns decode (filter columns decode for the
     mask, then drop).

Every filter is returned to Spark for residual evaluation: bounds are
block-granular and string bounds truncated, so the pushdown is a
performance contract, not a correctness one — semantics stay exactly
Spark's.

One partition per surviving bucket: at 10^5 buckets that is 10^5
independent tasks, each reading only its own wave files — the same
parallelism contract as the decode jobs.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

_OPS = {
    EqualTo: "=",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
    In: "in",
}

_SPARK_TYPE = {
    "string": "string",
    "binary": "binary",
    "int64": "long",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp_ntz",
    "double": "double",
}


class KmersDataSource(DataSource):
    """format("kmers"): path = snapshot dir; option("version", N) time-travels."""

    @classmethod
    def name(cls) -> str:
        return "kmers"

    def _manifest(self) -> dict:
        from . import manifest

        path = self.options.get("path")
        if not path:
            raise ValueError("kmers source needs a snapshot path: .load('/snap')")
        version = self.options.get("version")
        m = manifest.load(path, version=int(version) if version else None)
        if m is None:
            raise FileNotFoundError(f"no manifest in {path}")
        return m

    def schema(self) -> str:
        from . import manifest

        m = self._manifest()
        return ", ".join(
            f"`{c}` {_SPARK_TYPE[t]}"
            for c, t in manifest.ordered_schema(m).items()
        )

    def reader(self, schema) -> "KmersReader":
        return KmersReader(self.options, schema, self._manifest())


class KmersReader(DataSourceReader):
    def __init__(self, options, schema, m: dict):
        from . import manifest

        self.path = options.get("path")
        self.m = m
        self.full_schema = manifest.ordered_schema(m)
        self.projected = [f.name for f in schema.fields]
        self.triples: list[tuple] = []  # (col, op, value) we act on

    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        from . import zonemap

        for f in filters:
            op = _OPS.get(type(f))
            attr = getattr(f, "attribute", None)
            if (
                op is not None
                and attr is not None
                and len(attr) == 1
                and self.full_schema.get(attr[0]) in zonemap.PRUNABLE
            ):
                value = list(f.value) if op == "in" else f.value
                self.triples.append((attr[0], op, value))
            # EVERY filter goes back to Spark: ours are used for pruning
            # and kernel-side late materialization, Spark re-evaluates
            # exactly (block-granular bounds, truncated string bounds)
            yield f

    def _norm(self):
        from . import zonemap

        if not self.triples:
            return None
        return zonemap.normalize_filters(self.triples, self.full_schema)

    def partitions(self) -> list[InputPartition]:
        from . import zonemap
        from .operators.encode import committed_wave_paths

        norm = self._norm()
        buckets = (
            zonemap.prune_buckets(self.m, norm)
            if norm
            else list(self.m.get("committed_buckets", []))
        )
        parts = []
        for b in buckets:
            paths = committed_wave_paths(self.path, self.m, buckets=[b])
            if paths:
                parts.append(InputPartition((int(b), paths)))
        return parts

    def read(self, partition: InputPartition) -> Iterator:
        import json

        import pyarrow as pa
        import pyarrow.dataset as pads

        from . import arrowcodecs, zonemap

        bucket, paths = partition.value
        # each wave path is a DIRECTORY of part files; a list of dirs
        # needs a union of per-dir datasets
        dataset = (
            pads.dataset(paths[0], format="parquet")
            if len(paths) == 1
            else pads.dataset([pads.dataset(p, format="parquet") for p in paths])
        )
        tbl = dataset.to_table(
            filter=pads.field("bucket") == bucket,
            columns=["column", "meta", "payload"],
        )
        if tbl.num_rows == 0:
            return
        col_names = tbl.column("column").to_pylist()
        metas = tbl.column("meta").to_pylist()
        payloads = tbl.column("payload")
        idx = {c: i for i, c in enumerate(col_names)}
        arrays: dict[str, pa.Array] = {}
        n_rows = json.loads(metas[next(iter(idx.values()))])["n"]

        def dec(cname: str) -> pa.Array:
            if cname not in arrays:
                if cname in idx:
                    i = idx[cname]
                    arrays[cname] = arrowcodecs.decode_column_arrow(
                        payloads[i].as_py(), json.loads(metas[i])
                    )
                else:  # schema-evolved column: null-fill
                    arrays[cname] = pa.nulls(
                        n_rows, type=zonemap.arrow_type(self.full_schema[cname])
                    )
            return arrays[cname]

        norm = self._norm()
        if norm:
            import pyarrow.compute as pc

            mask = zonemap.arrow_mask(dec, norm)
            nsel = pc.sum(mask).as_py() or 0
            if not nsel:
                return
            sel = mask.to_numpy(zero_copy_only=False)
            out = {}
            for c in self.projected:
                if c in arrays:
                    out[c] = arrays[c].filter(mask)
                elif c in idx:
                    out[c] = arrowcodecs.decode_column_arrow_selected(
                        payloads[idx[c]].as_py(), json.loads(metas[idx[c]]), sel
                    )
                else:
                    out[c] = pa.nulls(
                        nsel, type=zonemap.arrow_type(self.full_schema[c])
                    )
            table = pa.table(out)
        else:
            table = pa.table({c: dec(c) for c in self.projected})
        yield from table.to_batches()


def register(spark) -> None:
    """spark.dataSource.register for this source (idempotent), enabling
    Python-datasource filter pushdown (off by default in Spark 4.1 —
    without it, a reader implementing pushFilters is rejected)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(KmersDataSource)
