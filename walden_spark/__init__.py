"""walden_spark — a PySpark-native analytics engine.

Re-expresses the user-visible surface of scie-nz/walden (Trino SQL over
Iceberg/MinIO, see /root/reference and SURVEY.md) as an idiomatic Spark
stack: Spark SQL + DataFrame API over Parquet on S3A-compatible storage,
plus LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) the reference never had.

Layout
------
session.py      SparkSession factory with S3A + AQE + ANSI defaults (M0)
catalog.py      schema-with-location DDL helpers (M1)
storage.py      object-store bucket utilities (M0)
tables.py       fixture table loaders / temp-view registration
registry.py     query registry powering __spark_entry__ + tests
queries/        SURVEY.md §2 relational surface as registered queries (M2)
operators/      north-star ops: dedup, similarity, text, multimodal (M4)
streaming/      Structured Streaming extension over `events` (M5)
plans/          plan inspection/EXPLAIN helpers (M6)
"""

from walden_spark.session import get_spark, WaldenSession

__all__ = ["get_spark", "WaldenSession"]
__version__ = "0.1.0"
