"""Snapshot-committed tables: Iceberg-semantics storage on plain parquet.

The sandbox has no Iceberg runtime jar, so this module provides the same
*transactional contract* the pipeline needs — atomic snapshot commits,
readers never see partial writes, idempotent upsert-merge — using a
pointer-swap protocol on the local filesystem:

    <table>/snapshots/v<N>/part-*.parquet     immutable snapshot data
    <table>/_CURRENT                          pointer file → "v<N>"

A commit writes the new snapshot directory completely, then atomically
replaces ``_CURRENT`` (os.replace is atomic on POSIX). Readers resolve
the pointer once and only ever list an immutable directory — the same
reader isolation Iceberg gets from its metadata pointer.

On a real deployment every call here maps 1:1 onto an Iceberg operation:
``merge_upsert`` → ``MERGE INTO``, ``append`` → ``INSERT INTO``/append
snapshot, ``read`` → catalog table read, and the upsert window below is
exactly the MERGE matched-clause semantics. Snapshots are copy-on-write
whole-table here (fine at sandbox scale); Iceberg's manifests make the
same commit O(delta) at warehouse scale — the calling code is unchanged.

Upsert semantics mirror the reference sinks: ``INSERT ... ON DUPLICATE
KEY UPDATE`` (/root/reference/chengyu/chengyu_mysql.py:162-180) and
``INSERT IGNORE`` (:217,239-241), made deterministic by an explicit
priority ordering instead of DB arrival order.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class SnapshotTable:
    def __init__(self, path: str, schema: StructType):
        self.path = path
        self.schema = schema
        os.makedirs(os.path.join(path, "snapshots"), exist_ok=True)

    # -- snapshot protocol ------------------------------------------------
    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def current_version(self) -> int | None:
        try:
            with open(self._pointer) as fh:
                return int(fh.read().strip().lstrip("v"))
        except (FileNotFoundError, ValueError):
            return None

    def _snapshot_dir(self, version: int) -> str:
        return os.path.join(self.path, "snapshots", f"v{version}")

    def _commit(self, df: DataFrame) -> int:
        new_version = (self.current_version() or 0) + 1
        target = self._snapshot_dir(new_version)
        df.write.mode("overwrite").parquet(target)
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(f"v{new_version}")
        os.replace(tmp, self._pointer)  # atomic commit point
        return new_version

    # -- operations ---------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame:
        version = self.current_version()
        if version is None:
            return spark.createDataFrame([], self.schema)
        return spark.read.schema(self.schema).parquet(self._snapshot_dir(version))

    def append(self, df: DataFrame) -> int:
        spark = df.sparkSession
        return self._commit(self.read(spark).unionByName(df))

    def merge_upsert(self, df: DataFrame, keys: list[str], order_by: list) -> int:
        """MERGE INTO: new rows win over existing rows on key collision,
        ties broken by the deterministic ``order_by`` columns. Replay-safe:
        merging the same df twice is a no-op."""
        spark = df.sparkSession
        current = self.read(spark).withColumn("_gen", F.lit(0))
        incoming = df.withColumn("_gen", F.lit(1))
        w = Window.partitionBy(*keys).orderBy(
            F.col("_gen").desc(), *[F.col(c).asc_nulls_last() for c in order_by]
        )
        merged = (
            current.unionByName(incoming)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "_gen")
        )
        return self._commit(merged)

    def merge_best(self, df: DataFrame, keys: list[str], priority: list) -> int:
        """Order-independent merge: the winner per key is decided by the
        ``priority`` column expressions alone (not arrival order), so any
        interleaving of partial runs converges to the same table. Used for
        nodes, where a crawled record must beat a mention-minted stub no
        matter which bucket commits first (INSERT IGNORE + ON DUP KEY
        UPDATE combined semantics, chengyu_mysql.py:162-221)."""
        spark = df.sparkSession
        w = Window.partitionBy(*keys).orderBy(*priority)
        merged = (
            self.read(spark)
            .unionByName(df)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        return self._commit(merged)

    def insert_ignore(self, df: DataFrame, keys: list[str], order_by: list) -> int:
        """INSERT IGNORE: existing rows win; among new duplicates the
        deterministic order elects the survivor (first-writer-wins
        formalization, SURVEY.md §2.5)."""
        spark = df.sparkSession
        current = self.read(spark).withColumn("_gen", F.lit(0))
        incoming = df.withColumn("_gen", F.lit(1))
        w = Window.partitionBy(*keys).orderBy(
            F.col("_gen").asc(), *[F.col(c).asc_nulls_last() for c in order_by]
        )
        merged = (
            current.unionByName(incoming)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "_gen")
        )
        return self._commit(merged)

    def overwrite(self, df: DataFrame) -> int:
        return self._commit(df)

    def truncate(self, spark: SparkSession) -> int:
        """S17 admin operation (clear_crawled_data.py:34-83)."""
        return self._commit(spark.createDataFrame([], self.schema))


class Warehouse:
    """The five output tables of the rebuilt engine (SURVEY.md §1.1)."""

    def __init__(self, root: str):
        from kgpipe import schemas

        self.root = root
        self.nodes = SnapshotTable(os.path.join(root, "nodes"), schemas.NODES_SCHEMA)
        self.edges = SnapshotTable(os.path.join(root, "edges"), schemas.EDGES_SCHEMA)
        self.run_metrics = SnapshotTable(
            os.path.join(root, "run_metrics"), schemas.RUN_METRICS_SCHEMA
        )
        self.checkpoints = SnapshotTable(
            os.path.join(root, "checkpoints"), schemas.CHECKPOINTS_SCHEMA
        )
        self.errors = SnapshotTable(os.path.join(root, "errors"), schemas.ERRORS_SCHEMA)
