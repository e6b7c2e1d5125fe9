"""Catalog & DDL layer (SURVEY.md §7.1 M1) — schemas-on-buckets,
columnar tables, and row-level DML emulation on plain Parquet.

Reference surface being reproduced (SURVEY.md §2.1):
* CREATE/DROP SCHEMA with an object-store location
  (reference: tf/test-hive.sh:19-21, README.md:104)
* CREATE/DROP TABLE, CTAS, views (tf/test-hive.sh:22,
  tf/superset/superset.tf:55-56 allow_ctas/allow_cvas)
* INSERT VALUES / INSERT SELECT (tf/test-hive.sh:23,
  tf/superset/superset.tf:57 allow_dml)
* UPDATE / DELETE / MERGE — the reference gets these from
  Trino-on-Iceberg (tf/main.tf:93-98); on plain Parquet we emulate with
  copy-on-write partition rewrite (documented deviation, SURVEY §7.4).

Scale posture:
* ``write_table`` targets ~128MB files (repartition by max-file count)
  and supports Hive-style partitioning so partition pruning works.
* DML rewrites are *partition-scoped* when the table is partitioned and
  a partition predicate is supplied: with
  ``spark.sql.sources.partitionOverwriteMode=dynamic`` only the touched
  partitions are rewritten — at 100TB you rewrite one day's partition,
  never the table.
"""

from __future__ import annotations

import tempfile
import uuid
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 * 1024 * 1024


def _q(ident: str) -> str:
    """Quote a (possibly dotted) identifier."""
    return ".".join(f"`{p}`" for p in ident.split("."))


class Catalog:
    """DDL/DML helpers over the Spark session catalog.

    Thin by design — Spark SQL already implements the semantics; this
    class only adds the location-bound-schema convention and the
    Parquet copy-on-write DML the reference gets from Iceberg.
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark

    # ---- schemas (namespaces bound to storage locations) ----

    def create_schema(self, name: str, location: str | None = None, if_not_exists: bool = True) -> None:
        ine = "IF NOT EXISTS " if if_not_exists else ""
        loc = f" LOCATION '{location}'" if location else ""
        self.spark.sql(f"CREATE DATABASE {ine}{_q(name)}{loc}")

    def drop_schema(self, name: str, cascade: bool = True, if_exists: bool = True) -> None:
        ie = "IF EXISTS " if if_exists else ""
        c = " CASCADE" if cascade else ""
        self.spark.sql(f"DROP DATABASE {ie}{_q(name)}{c}")

    def schema_location(self, name: str) -> str:
        row = self.spark.sql(f"DESCRIBE DATABASE {_q(name)}").where(
            F.col("info_name") == "Location"
        ).collect()
        return row[0]["info_value"] if row else ""

    # ---- tables ----

    def create_table(
        self,
        name: str,
        columns: str,
        partition_by: Sequence[str] | None = None,
        location: str | None = None,
        if_not_exists: bool = True,
    ) -> None:
        """``columns`` is DDL text, e.g. ``"key STRING, val BIGINT"``."""
        ine = "IF NOT EXISTS " if if_not_exists else ""
        part = f" PARTITIONED BY ({', '.join(partition_by)})" if partition_by else ""
        loc = f" LOCATION '{location}'" if location else ""
        self.spark.sql(f"CREATE TABLE {ine}{_q(name)} ({columns}) USING parquet{part}{loc}")

    def drop_table(self, name: str, if_exists: bool = True) -> None:
        ie = "IF EXISTS " if if_exists else ""
        self.spark.sql(f"DROP TABLE {ie}{_q(name)}")

    def ctas(self, name: str, select_sql: str) -> None:
        self.spark.sql(f"CREATE TABLE {_q(name)} USING parquet AS {select_sql}")

    def create_view(self, name: str, select_sql: str, temp: bool = True) -> None:
        kind = "TEMP VIEW" if temp else "VIEW"
        self.spark.sql(f"CREATE OR REPLACE {kind} {_q(name)} AS {select_sql}")

    # ---- writes ----

    def write_table(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        partition_by: Sequence[str] | None = None,
        target_file_bytes: int = TARGET_FILE_BYTES,
        approx_row_bytes: int | None = None,
    ) -> None:
        """Save a DataFrame as a managed Parquet table, sized for scans.

        If ``approx_row_bytes`` is given, repartition so output files
        land near ``target_file_bytes`` (the reference's ORC files play
        the same role; 128MB aligns with
        ``spark.sql.files.maxPartitionBytes`` so one scan task reads one
        file run).
        """
        w = df.write
        if approx_row_bytes:
            n = max(1, int(df.count() * approx_row_bytes / target_file_bytes))
            src = df.repartition(n, *partition_by) if partition_by else df.repartition(n)
            w = src.write
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.mode(mode).format("parquet").saveAsTable(name)

    def insert_values(self, table: str, rows_sql: str) -> None:
        self.spark.sql(f"INSERT INTO {_q(table)} VALUES {rows_sql}")

    def insert_select(self, table: str, select_sql: str, overwrite: bool = False) -> None:
        verb = "INSERT OVERWRITE TABLE" if overwrite else "INSERT INTO"
        self.spark.sql(f"{verb} {_q(table)} {select_sql}")

    # ---- row-level DML emulation (copy-on-write) ----

    def _rewrite(self, table: str, transform, partition_pred: Column | None) -> None:
        """Copy-on-write core: materialize transformed rows, then
        overwrite. With a partition predicate + dynamic overwrite mode,
        only touched partitions are replaced (partition-scoped rewrite —
        the 100TB path); otherwise the whole table is rewritten (the
        reference's Iceberg copy-on-write does the same per-file)."""
        spark = self.spark
        src = spark.table(table)
        scope = src.filter(partition_pred) if partition_pred is not None else src
        rewritten = transform(scope)
        # Stage to a temp location: Spark cannot overwrite a path it is
        # concurrently reading (self-overwrite), so break the lineage.
        staging = tempfile.mkdtemp(prefix=f"walden_cow_{uuid.uuid4().hex[:8]}_")
        rewritten.write.mode("overwrite").parquet(staging)
        staged = spark.read.parquet(staging)
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        try:
            if partition_pred is not None:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            staged.write.mode("overwrite").insertInto(table, overwrite=True)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    def delete_where(self, table: str, condition: Column | str, partition_pred: Column | None = None) -> None:
        cond = F.expr(condition) if isinstance(condition, str) else condition
        self._rewrite(table, lambda df: df.filter(~cond | cond.isNull()), partition_pred)

    def update_where(
        self,
        table: str,
        assignments: Mapping[str, Column | str],
        condition: Column | str,
        partition_pred: Column | None = None,
    ) -> None:
        cond = F.expr(condition) if isinstance(condition, str) else condition

        def transform(df: DataFrame) -> DataFrame:
            out = df
            for col, val in assignments.items():
                v = F.expr(val) if isinstance(val, str) else val
                out = out.withColumn(col, F.when(cond, v).otherwise(F.col(col)))
            return out

        self._rewrite(table, transform, partition_pred)

    def merge_into(
        self,
        target: str,
        source: DataFrame,
        on: Sequence[str],
        update_cols: Sequence[str] | None = None,
        insert_when_not_matched: bool = True,
        partition_pred: Column | None = None,
    ) -> None:
        """MERGE emulation: upsert ``source`` into ``target`` on key
        columns. Matched rows take source values for ``update_cols``
        (default: all non-key columns); unmatched source rows are
        appended. One shuffle on the key (full outer join)."""
        tgt_cols = self.spark.table(target).columns
        update_cols = list(update_cols or [c for c in tgt_cols if c not in on])

        def transform(df: DataFrame) -> DataFrame:
            src = source.select(*tgt_cols)
            joined = df.alias("t").join(src.alias("s"), on=list(on), how="full_outer")
            out_cols = []
            for c in tgt_cols:
                if c in on:
                    out_cols.append(F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}")).alias(c))
                elif c in update_cols:
                    out_cols.append(F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c))
                else:
                    out_cols.append(F.col(f"t.{c}").alias(c))
            if not insert_when_not_matched:
                joined = joined.filter(F.col(f"t.{on[0]}").isNotNull())
            return joined.select(*out_cols)

        self._rewrite(target, transform, partition_pred)

    # ---- introspection (information_schema-style) ----

    def show_schemas(self) -> DataFrame:
        return self.spark.sql("SHOW DATABASES")

    def show_tables(self, schema: str | None = None) -> DataFrame:
        return self.spark.sql(f"SHOW TABLES IN {_q(schema)}" if schema else "SHOW TABLES")

    def describe(self, table: str) -> DataFrame:
        return self.spark.sql(f"DESCRIBE TABLE {_q(table)}")

    def information_schema_columns(self) -> DataFrame:
        """information_schema.columns-compatible view across the session
        catalog (reference: README.md:112-116) — for BI clients."""
        spark = self.spark
        rows = []
        for db in [d.name for d in spark.catalog.listDatabases()]:
            for t in spark.catalog.listTables(db):
                if t.database is None:  # temp views surface in every db listing
                    continue
                for i, c in enumerate(spark.catalog.listColumns(f"{db}.{t.name}")):
                    rows.append((db, t.name, c.name, i + 1, c.dataType, c.nullable))
        return spark.createDataFrame(
            rows,
            "table_schema string, table_name string, column_name string, "
            "ordinal_position int, data_type string, is_nullable boolean",
        )


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (+optionally sorted) managed table.

    Bucketing is the lakehouse co-location primitive: two tables
    bucketed by the same key into the same bucket count join WITHOUT a
    shuffle exchange on either side (asserted in
    tests/test_plans.py::test_bucketed_join_no_exchange) — at 100TB the
    fact-to-fact join this enables is the difference between a full
    re-shuffle of both tables and a local zip of bucket files. The
    reference's Iceberg layer exposes the same capability via bucket
    partition transforms (tf/main.tf:93-98).
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def analyze_table(spark: SparkSession, name: str, columns: Sequence[str] | None = None) -> None:
    """ANALYZE TABLE — populate CBO statistics (row counts, sizes, and
    per-column NDV/min/max) so EXPLAIN COST and join reordering have
    real numbers (SURVEY §4: the reference's Trino CBO equivalent).
    """
    spark.sql(f"ANALYZE TABLE {_q(name)} COMPUTE STATISTICS")
    if columns:
        spark.sql(
            f"ANALYZE TABLE {_q(name)} COMPUTE STATISTICS FOR COLUMNS {', '.join(columns)}"
        )


def compact_table(
    spark: SparkSession,
    name: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
    sort_by: Sequence[str] | None = None,
) -> int:
    """Compact a managed Parquet table's small files (the Iceberg
    `rewrite_data_files` maintenance analog — streaming ingest and
    per-partition DML both fragment tables over time).

    Rewrites to ceil(bytes/target) files via the same staging path the
    DML layer uses; optional ``sort_by`` lays rows out for row-group
    min/max skipping on those columns (Z-order-lite: effective for one
    leading dimension, which is the common time-series case).
    Returns the new file count.
    """
    import math

    df = spark.table(name)
    total_bytes = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    compacted = df.repartition(n_files)
    if sort_by:
        compacted = compacted.sortWithinPartitions(*sort_by)
    staging = tempfile.mkdtemp(prefix=f"walden_compact_{uuid.uuid4().hex[:8]}_")
    compacted.write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging).write.mode("overwrite").insertInto(name, overwrite=True)
    return n_files
