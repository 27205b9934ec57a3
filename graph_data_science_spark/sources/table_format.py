"""Table-format seam: the one place where graph exports and Pregel
vertex-state snapshots hit storage.

The north rule (BASELINE.json) names Iceberg tables and per-superstep
Iceberg snapshots. This sandbox ships no Iceberg runtime (no
iceberg-spark jar on the classpath, no catalog configured), so the
DEFAULT implementation is plain parquet — the same layout everything
else in the repo reads. The seam exists so a real deployment plugs
:class:`IcebergFormat` in and every writer (``GraphCatalog.export``,
``Pregel`` checkpoint snapshots) switches to
``writeTo(table).createOrReplace()`` plus real snapshot ids without
touching operator code. Reference anchor: the reference's export layer
is similarly format-pluggable (io/csv/.../GraphStoreToCsvExporter.java:39
vs the in-memory GraphStoreExporter contract).

Scale note: both implementations are single ``DataFrame.write`` plans —
partitioning/ordering of the state is whatever the caller's plan
carries; the format never forces a shuffle of its own. Iceberg's value
at 100 TB is transactional snapshot ids (resume points with lineage)
and file-level pruning metadata; the parquet stand-in approximates the
former with the ``superstep=NNNNN`` directory convention that
``Pregel.resume_state`` scans.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession


class TableFormat(ABC):
    """Strategy for persisting and re-reading one DataFrame 'table'.

    ``target`` is format-specific: a filesystem path for parquet, a
    catalog table identifier (``catalog.db.table``) for Iceberg.
    """

    name = "abstract"

    @abstractmethod
    def write(self, df: DataFrame, target: str) -> None:
        """Replace ``target`` with ``df``'s rows (atomic per format)."""

    @abstractmethod
    def read(self, spark: SparkSession, target: str) -> DataFrame:
        """Load ``target`` back as a DataFrame."""

    def snapshot_id(self, spark: SparkSession, target: str) -> str | None:
        """Latest committed snapshot id when the format versions tables;
        None for formats without table-level versioning."""
        return None


class ParquetFormat(TableFormat):
    """Plain-parquet stand-in (the sandbox default)."""

    name = "parquet"

    def write(self, df: DataFrame, target: str) -> None:
        df.write.mode("overwrite").parquet(target)

    def read(self, spark: SparkSession, target: str) -> DataFrame:
        return spark.read.parquet(target)


class IcebergFormat(TableFormat):
    """Iceberg tables via the DataFrameWriterV2 API.

    Requires an Iceberg-enabled SparkSession (iceberg-spark-runtime jar +
    a ``spark.sql.catalog.*`` entry) — absent from this sandbox, so the
    class is exercised only by a skipif-gated test that documents the
    gap. ``target`` must be a catalog table identifier.
    """

    name = "iceberg"

    def write(self, df: DataFrame, target: str) -> None:
        df.writeTo(target).using("iceberg").createOrReplace()

    def read(self, spark: SparkSession, target: str) -> DataFrame:
        return spark.read.table(target)

    def snapshot_id(self, spark: SparkSession, target: str) -> str | None:
        row = (spark.sql(
            f"SELECT snapshot_id FROM {target}.snapshots "
            f"ORDER BY committed_at DESC LIMIT 1").first())
        return None if row is None else str(row[0])


DEFAULT_FORMAT = ParquetFormat()


def iceberg_runtime_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on this session's classpath
    (the test gate; False in this sandbox)."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False
