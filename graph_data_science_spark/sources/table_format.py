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

Sub-table naming goes through :meth:`TableFormat.child` — a path join for
parquet, an identifier-suffix mapping for Iceberg (``/`` and ``=`` are not
legal in a multipart identifier, so ``state/superstep=00005`` becomes
``<tbl>_state_superstep_00005``) — and snapshot enumeration/removal
through :meth:`TableFormat.list_children` / :meth:`TableFormat.drop`, so
Pregel resume works against either layout. Pregel's run metadata
(manifest.json, metrics.jsonl) stays driver-local filesystem by design;
identifier-based deployments pass ``Pregel(metadata_dir=...)``.

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

    @abstractmethod
    def child(self, target: str, name: str) -> str:
        """Map a logical sub-table name under ``target`` to a valid
        format-specific target. Callers (GraphCatalog.export, Pregel
        snapshots) only ever compose targets through this hook — a path
        join is NOT a valid Iceberg identifier, so string-concatenating
        ``f"{target}/nodes"`` would break any non-path format."""

    @abstractmethod
    def list_children(self, spark: SparkSession, target: str,
                      complete_only: bool = True) -> list[str]:
        """Logical child names that exist under ``target`` (inverse of
        :meth:`child`). ``complete_only`` filters to committed/complete
        children where the format distinguishes (parquet ``_SUCCESS``;
        Iceberg commits are atomic so everything listed is complete)."""

    @abstractmethod
    def drop(self, spark: SparkSession, target: str) -> None:
        """Remove ``target`` (idempotent)."""


class ParquetFormat(TableFormat):
    """Plain-parquet stand-in (the sandbox default)."""

    name = "parquet"

    def write(self, df: DataFrame, target: str) -> None:
        df.write.mode("overwrite").parquet(target)

    def read(self, spark: SparkSession, target: str) -> DataFrame:
        return spark.read.parquet(target)

    def child(self, target: str, name: str) -> str:
        import os
        return os.path.join(target, name)

    def list_children(self, spark: SparkSession, target: str,
                      complete_only: bool = True) -> list[str]:
        import os
        if not os.path.isdir(target):
            return []
        return [d for d in os.listdir(target)
                if not complete_only
                or os.path.exists(os.path.join(target, d, "_SUCCESS"))]

    def drop(self, spark: SparkSession, target: str) -> None:
        import shutil
        shutil.rmtree(target, ignore_errors=True)


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

    def child(self, target: str, name: str) -> str:
        """``catalog.db.tbl`` + logical name → ``catalog.db.tbl_<name>``
        with every non-identifier character folded to ``_`` (the Pregel
        convention ``state/superstep=00005`` becomes
        ``..._state_superstep_00005`` — a valid multipart identifier)."""
        import re
        return f"{target}_{re.sub(r'[^A-Za-z0-9_]', '_', name)}"

    def list_children(self, spark: SparkSession, target: str,
                      complete_only: bool = True) -> list[str]:
        # children live in target's namespace as tables named <tbl>_<name>;
        # Iceberg commits are atomic, so every listed child is complete
        ns, _, tbl = target.rpartition(".")
        rows = spark.sql(
            f"SHOW TABLES IN {ns}" if ns else "SHOW TABLES").collect()
        pre = f"{tbl}_"
        return [r["tableName"][len(pre):] for r in rows
                if r["tableName"].startswith(pre)]

    def drop(self, spark: SparkSession, target: str) -> None:
        spark.sql(f"DROP TABLE IF EXISTS {target}")


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
