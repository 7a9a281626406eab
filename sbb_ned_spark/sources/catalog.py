"""Table-catalog seam: the Iceberg table-name API with a parquet fallback.

The north_star/input_hint name an *Iceberg table* of source-code
repositories. This module is the promised seam (SURVEY.md §7.4.5): every
pipeline read/write goes through ``read_table``/``write_table`` keyed by
TABLE NAME, so swapping storage is a catalog choice, not a code change:

- :class:`IcebergCatalog` — used when an ``iceberg-spark-runtime`` jar is
  on the session classpath and a Spark SQL catalog is configured
  (``spark.sql.catalog.<name>`` = SparkCatalog/HadoopCatalog). Writes via
  the DataFrameWriterV2 ``writeTo(...).using("iceberg")`` API, reads via
  ``spark.table``. Partitioned tables get their PARTITIONED BY spec from
  the same ``partition_by`` argument.
- :class:`ParquetCatalog` — the sandbox/default backend: ``<root>/<name>``
  parquet directories behind the same API, with ``partitionBy`` writes.

The reference's analog of this seam is its sqlite DDL + secondary-index
setup (`/root/reference/qurator/sbb_ned/cli.py:674-681`): a named,
indexed table the rest of the code addresses by name only.

Scale note: ``partition_by`` should carry a low-cardinality derived
column (e.g. a repo hash bucket) — at 10^12 files a per-repo partition
would blow the metastore; a fixed bucket count keeps partition pruning
useful and file counts bounded.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass
from hashlib import sha256
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.errors import AnalysisException


class TableCatalog(Protocol):
    def read_table(self, spark: SparkSession, name: str) -> DataFrame: ...

    def write_table(
        self, df: DataFrame, name: str, mode: str = "overwrite", partition_by: tuple = ()
    ) -> None: ...

    def table_exists(self, spark: SparkSession, name: str) -> bool: ...

    def drop_table(self, spark: SparkSession, name: str) -> None: ...

    def write_manifest(self, name: str, manifest: dict) -> None: ...

    def read_manifest(self, name: str) -> dict | None: ...


def manifest_digest(manifest: dict | None) -> str:
    """Stable digest of a stage manifest — chained into the downstream
    stage's manifest so resume can prove the upstream it was built from."""
    if manifest is None:
        return "none"
    return sha256(json.dumps(manifest, sort_keys=True).encode()).hexdigest()


@dataclass
class ParquetCatalog:
    """Name-addressed parquet directories under ``root``.

    ``codec`` is the parquet compression for stage checkpoints: zstd by
    default — measured on the bench features table (117k rows, pinned
    2-core, 3 runs) 27% smaller than the snappy default (53.6 vs 73.1 MB)
    with ~2x faster reads (0.25-0.36 vs 0.54-0.64 s) and faster writes
    (3.1-3.2 vs 3.6-3.9 s); at checkpoint volumes that track the corpus
    the size/IO cut is the knob that matters. (lz4 writes fastest but
    compresses no better than snappy; the checkpoint is written once and
    read on every downstream stage and resume.)
    """

    root: str
    codec: str = "zstd"

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def read_table(self, spark: SparkSession, name: str) -> DataFrame:
        # bare table names resolve to `<root>/<name>` (checkpoint dirs) or
        # `<root>/<name>.parquet` (driver testdata files) — callers address
        # tables by NAME only; the storage layout is the catalog's concern.
        # os.path probing only works for local roots; on an object-store
        # root (s3a://, hdfs://) try the bare path and fall back to the
        # `.parquet` layout on analysis failure instead.
        p = self._path(name)
        if self._is_local():
            if not os.path.exists(p) and os.path.exists(p + ".parquet"):
                p = p + ".parquet"
            return spark.read.parquet(p)
        try:
            return spark.read.parquet(p)
        except AnalysisException as e:
            # only path-NOT-FOUND falls back to the `.parquet` layout; a
            # genuine analysis failure (schema merge, access error) must
            # propagate with its real cause, not be re-raised as a
            # misleading "path not found: <p>.parquet" (ADVICE r4 #4)
            cond = getattr(e, "getCondition", getattr(e, "getErrorClass", lambda: None))()
            if cond != "PATH_NOT_FOUND":
                raise
            try:
                return spark.read.parquet(p + ".parquet")
            except AnalysisException as e2:
                raise e2 from e

    def _is_local(self) -> bool:
        scheme = self.root.split("://", 1)[0] if "://" in self.root else ""
        return scheme in ("", "file")

    def write_table(
        self, df: DataFrame, name: str, mode: str = "overwrite", partition_by: tuple = ()
    ) -> None:
        writer = df.write.mode(mode).option("compression", self.codec)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._path(name))

    def table_exists(self, spark: SparkSession, name: str) -> bool:
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS")) or os.path.exists(
            os.path.join(self._path(name), "_MANIFEST.json")
        )

    def drop_table(self, spark: SparkSession, name: str) -> None:
        shutil.rmtree(self._path(name), ignore_errors=True)

    def write_manifest(self, name: str, manifest: dict) -> None:
        os.makedirs(self._path(name), exist_ok=True)
        with open(os.path.join(self._path(name), "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, sort_keys=True)

    def read_manifest(self, name: str) -> dict | None:
        p = os.path.join(self._path(name), "_MANIFEST.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)


@dataclass
class IcebergCatalog:
    """Iceberg tables addressed as ``<catalog>.<namespace>.<name>``.

    Requires ``iceberg-spark-runtime`` on the classpath and
    ``spark.sql.catalog.<catalog>`` configured (e.g. a HadoopCatalog with a
    local warehouse dir). Manifests are JSON files under ``manifest_dir``
    (resume metadata is ours, not table data).

    Use :func:`for_root` rather than the bare constructor: the namespace
    and manifest dir are derived from the logical root so two pipelines
    with different checkpoint/data roots can NEVER collide in the same
    tables or resume from each other's manifests."""

    catalog: str = "local"
    namespace: str = "er"
    manifest_dir: str = "/tmp/sbb_ned_iceberg_manifests"
    codec: str = "zstd"  # same knob as ParquetCatalog.codec (see its docstring)

    @classmethod
    def for_root(cls, root: str, catalog: str = "local") -> "IcebergCatalog":
        tag = sha256(os.path.abspath(root).encode()).hexdigest()[:12]
        return cls(
            catalog=catalog,
            namespace=f"er_{tag}",
            manifest_dir=f"/tmp/sbb_ned_iceberg_manifests/{tag}",
        )

    def _fqn(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def read_table(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.table(self._fqn(name))

    def write_table(
        self, df: DataFrame, name: str, mode: str = "overwrite", partition_by: tuple = ()
    ) -> None:
        df.sparkSession.sql(
            f"CREATE NAMESPACE IF NOT EXISTS {self.catalog}.{self.namespace}"
        )
        writer = df.writeTo(self._fqn(name)).using("iceberg")
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "append":
            # appends inherit the codec from the existing table's properties
            writer.append()
        else:
            # same zstd default as ParquetCatalog (see its docstring for
            # the measurements); Iceberg spells it as a table property
            writer.tableProperty(
                "write.parquet.compression-codec", self.codec
            ).createOrReplace()

    def table_exists(self, spark: SparkSession, name: str) -> bool:
        return spark.catalog.tableExists(self._fqn(name))

    def drop_table(self, spark: SparkSession, name: str) -> None:
        spark.sql(f"DROP TABLE IF EXISTS {self._fqn(name)}")

    def write_manifest(self, name: str, manifest: dict) -> None:
        os.makedirs(self.manifest_dir, exist_ok=True)
        with open(os.path.join(self.manifest_dir, f"{name}.json"), "w") as f:
            json.dump(manifest, f, sort_keys=True)

    def read_manifest(self, name: str) -> dict | None:
        p = os.path.join(self.manifest_dir, f"{name}.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)


def iceberg_available(spark: SparkSession, catalog: str = "local") -> bool:
    """True when a Spark SQL catalog named ``catalog`` is configured AND
    the Iceberg classes resolve (jar actually on the classpath)."""
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}")
    except Exception:
        return False
    if not impl:
        return False
    try:
        spark._jvm.java.lang.Class.forName(impl)  # noqa: SLF001 - classpath probe
        return True
    except Exception:
        return False


def get_catalog(spark: SparkSession, root: str) -> TableCatalog:
    """The seam: Iceberg when the runtime is present, parquet dirs
    otherwise — callers only ever see read_table/write_table by name.
    The root is part of the table identity on BOTH backends (parquet: the
    directory; Iceberg: a root-hash namespace + manifest dir), so distinct
    datasets/checkpoint roots can never serve each other's tables."""
    if iceberg_available(spark):
        return IcebergCatalog.for_root(root)
    return ParquetCatalog(root)
