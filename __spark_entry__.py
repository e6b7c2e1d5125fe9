"""Driver contract for the spark-graft builder (PySpark target).

Backed by the walden_spark query registry: every operator from
SURVEY.md §2 (plus the north-star LLM-pipeline operators) registers a
(spark, sf_dir) -> DataFrame builder and, where SQL-expressible, a
DuckDB oracle. See walden_spark/registry.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from walden_spark.registry import load_all  # noqa: E402

_REGISTRY = load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return _REGISTRY["tpch_q1"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-checkable query."""
    return {name: q.oracle for name, q in _REGISTRY.items() if q.oracle}
