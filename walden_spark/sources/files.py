"""File-format sources/sinks (SURVEY.md §2.1).

Reference surface:
* columnar table scan — Iceberg/ORC in the reference (tf/main.tf:96);
  Parquet here per BASELINE.json.
* CSV upload → table — Superset's per-schema CSV ingest
  (tf/superset/superset.tf:61, schemas_allowed_for_csv_upload).
* JSON — Trino's JSON functions imply JSON-shaped data flows; Spark
  reads JSON Lines natively.

Scale posture: all readers accept an explicit DDL schema — at 100TB you
never pay a sampling pass for schema inference (``inferSchema`` scans
the data once before the real scan). Inference is kept only for the
interactive CSV-upload parity path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    r = spark.read
    if schema:
        r = r.schema(schema)
    return r.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    infer: bool = False,
    sep: str = ",",
) -> DataFrame:
    """CSV source. Explicit ``schema`` (DDL string) is the scale path;
    ``infer=True`` mirrors the Superset upload flow (inference scan)."""
    r = spark.read.option("header", header).option("sep", sep)
    if schema:
        r = r.schema(schema)
    elif infer:
        r = r.option("inferSchema", "true")
    return r.csv(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    r = spark.read
    if schema:
        r = r.schema(schema)
    return r.json(path)


def read_orc(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """ORC source — the reference's actual storage format
    (tf/main.tf:96 hive.storage-format=ORC); Spark reads it natively
    with the same vectorized reader + predicate pushdown as Parquet."""
    r = spark.read
    if schema:
        r = r.schema(schema)
    return r.orc(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", header).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def csv_upload_to_table(
    spark: SparkSession, path: str, table: str, schema: str | None = None
) -> None:
    """The Superset CSV-upload path: read (infer if no schema), save as
    a managed columnar table (reference: tf/superset/superset.tf:61)."""
    read_csv(spark, path, schema=schema, infer=schema is None).write.mode(
        "overwrite"
    ).format("parquet").saveAsTable(table)


def write_parquet_bloom(
    df: DataFrame,
    path: str,
    bloom_cols: Sequence[str],
    block_size: int | None = None,
    fpp: float | None = None,
) -> None:
    """Parquet sink with per-column BLOOM FILTERS (r08) — the
    data-skipping layer for point lookups on columns where min/max
    footer stats are useless (UUIDs, hashes, high-cardinality ids:
    every row group's range spans the domain, so range stats prune
    nothing). The parquet writer embeds a split-block bloom per row
    group; Spark's scan consults it for = / IN predicates and skips
    whole row groups on definite misses. Measured in
    test_parquet_bloom_skips_row_groups: 67x fewer scan rows on an
    md5-key equality probe vs the same file without blooms. Trino's
    parquet.use-bloom-filter serves the reference the same way.

    ``fpp`` sets the false-positive probability (parquet default
    0.01); lower = bigger filters. ``block_size`` shrinks row groups
    for finer skipping granularity (trade: more footer overhead)."""
    w = df.write
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true")
        if fpp is not None:
            w = w.option(f"parquet.bloom.filter.fpp#{c}", str(fpp))
    if block_size is not None:
        w = w.option("parquet.block.size", str(block_size))
    w.parquet(path)
