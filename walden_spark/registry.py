"""Query registry powering ``__spark_entry__`` and the oracle tests.

Every operator from SURVEY.md §2 (and every north-star operator) is
declared exactly once, as a ``@query``-decorated builder plus (usually)
a DuckDB-runnable oracle SQL string. ``__spark_entry__.queries()`` /
``oracle_sql()`` and the self-check test harness both read this table.

Determinism contract (critical for the driver's value-hash compare):
* Money-column aggregates are computed in DECIMAL(18,2) — exact and
  summation-order-independent — then cast to DOUBLE identically on the
  Spark and DuckDB sides, so both engines emit bit-identical doubles.
* Every computed column is aliased the same on both sides.
* collect_list-style results are sorted (`array_sort`) before emission.
* LIMIT/top-k queries carry a total order (unique-key tiebreak).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # DuckDB SQL; None → driver does rows-only check
    category: str = ""
    doc: str = ""
    tags: tuple = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: Optional[str] = None, category: str = "", tags: tuple = ()):
    """Register a query builder. ``oracle`` is ANSI SQL DuckDB runs on the
    same parquet tables (views pre-registered by the driver)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name,
            fn=fn,
            oracle=oracle,
            category=category,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query/operator module so their decorators run."""
    import walden_spark.queries.tpch  # noqa: F401
    import walden_spark.queries.relational  # noqa: F401
    import walden_spark.queries.aggregates  # noqa: F401
    import walden_spark.queries.windows  # noqa: F401
    import walden_spark.queries.setops  # noqa: F401
    import walden_spark.queries.scalar_functions  # noqa: F401
    import walden_spark.queries.events  # noqa: F401
    import walden_spark.queries.ddl  # noqa: F401
    import walden_spark.queries.sources  # noqa: F401
    import walden_spark.queries.tpcds  # noqa: F401
    import walden_spark.functions.udf  # noqa: F401
    import walden_spark.operators.dedup  # noqa: F401
    import walden_spark.operators.rangejoin  # noqa: F401
    import walden_spark.operators.rollup  # noqa: F401
    import walden_spark.operators.skew  # noqa: F401
    import walden_spark.operators.similarity  # noqa: F401
    import walden_spark.operators.text  # noqa: F401
    import walden_spark.operators.multimodal  # noqa: F401
    import walden_spark.streaming.windows  # noqa: F401
    import walden_spark.streaming.stateful  # noqa: F401

    return REGISTRY
