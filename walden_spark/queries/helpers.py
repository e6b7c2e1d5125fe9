"""Shared determinism idioms for oracle-checked queries.

Why decimals: the fixture money columns (l_extendedprice, l_discount,
l_tax, o_totalprice, *_acctbal, p_retailprice) are 2-decimal values
stored as DOUBLE. Summing doubles is order-dependent (Spark partitions
vs DuckDB's scan order), so a straight SUM(double) can differ in the
last ulps between engines and break the driver's value-hash compare.
Casting each operand to a small DECIMAL first makes the arithmetic
exact and associative — both engines compute the *same* rational
number — and a final CAST(... AS DOUBLE) maps it to the same IEEE
double on both sides. Keep operand precisions small (money 12,2;
rates 4,2) so products stay within DECIMAL(38) in both engines
without precision-loss rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(12,2)"  # prices < 1e10
RATE = "decimal(4,2)"  # discounts/taxes in [0,1)


def money(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(MONEY)


def rate(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(RATE)


def dsum(col: Column) -> Column:
    """Exact decimal sum emitted as double (bit-identical across engines)."""
    return F.sum(col).cast("double")


def davg(col: Column) -> Column:
    """Average as exact-sum / count, one double division (deterministic).

    Built-in AVG over doubles is order-dependent; AVG over decimals has
    engine-specific result scales. sum/count sidesteps both.
    """
    return F.sum(col).cast("double") / F.count(col)


def revenue() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal."""
    return money("l_extendedprice") * (F.lit(1).cast(RATE) - rate("l_discount"))


# SQL fragments valid in BOTH Spark SQL and DuckDB — reuse in oracles.
REV_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
CHARGE_SQL = REV_SQL + " * (1 + CAST(l_tax AS DECIMAL(4,2)))"


def sql_money(col: str) -> str:
    return f"CAST({col} AS DECIMAL(12,2))"


def tiny_sorted(df, *cols):
    """Total ORDER BY for a bounded-cardinality final frame without the
    range-exchange sampling pass (optimization r14, guide §2.4).

    A trailing ``.orderBy(...)`` plans Exchange rangepartitioning,
    whose boundary sampling RE-EXECUTES the post-shuffle final stage of
    the child (measured +1.6 s on agg_quantile_sketch's percentile
    aggregate at sf0.1: the sampling job re-reads the shuffle files and
    re-runs the final aggregate). For a frame that is already tiny —
    grouped aggregates with bounded group counts — shuffling everything
    to ONE partition and sorting there produces the identical total
    order (sort keys in these queries are unique, so there are no ties
    for partition boundaries to resolve differently) with no sampling
    pass and no second execution.

    ONLY for provably small final frames: a single-partition sort of a
    large result would serialize it. Queries whose output grows with
    the data keep their ``orderBy``.

    Measured scope (r14 interleaved A/B, min-of-5, noop sink, sf0.1):
    the win exists only when the re-executed final stage is itself
    expensive — agg_quantile_sketch 0.93x (its final stage re-runs the
    exact-percentile aggregate over the shuffled value maps). For six
    other headline candidates (tpch_q1/q5/q8/q13, skew_salted_agg,
    text_quality_filter_per_source) the sampled final stage is a
    trivial re-read of tiny partial-agg shuffle data and the extra
    strict exchange measured flat-to-worse (0.99-1.08x), so they keep
    the plain ``orderBy`` (guide §1.2: measure, don't assume).
    """
    return df.repartition(1).sortWithinPartitions(*cols)
