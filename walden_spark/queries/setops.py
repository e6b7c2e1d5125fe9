"""Set operations — SURVEY.md §2.7.

Operands: customers with open ('O') vs finished ('F') orders — both
sides are aggregates of the same fact table, so INTERSECT/EXCEPT hit
real overlaps. UNION/INTERSECT/EXCEPT (distinct forms) plan as
hash-aggregates; the ALL forms keep multiplicity semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from walden_spark.registry import query
from walden_spark.tables import Tables

_A_SQL = "SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'"
_B_SQL = "SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'"


def _a(t: Tables) -> DataFrame:
    return t.orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))


def _b(t: Tables) -> DataFrame:
    return t.orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))


@query(
    "setop_union_all",
    oracle=f"SELECT k, COUNT(*) AS n FROM ({_A_SQL} UNION ALL {_B_SQL}) GROUP BY k",
    category="setop",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, no dedup shuffle)."""
    t = Tables(spark, sf_dir)
    return _a(t).unionAll(_b(t)).groupBy("k").agg(F.count(F.lit(1)).alias("n"))


@query(
    "setop_union_distinct",
    oracle=f"{_A_SQL} UNION {_B_SQL}",
    category="setop",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set union → union + distinct)."""
    t = Tables(spark, sf_dir)
    return _a(t).union(_b(t)).distinct()


@query(
    "setop_intersect",
    oracle=f"{_A_SQL} INTERSECT {_B_SQL}",
    category="setop",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct)."""
    t = Tables(spark, sf_dir)
    return _a(t).intersect(_b(t))


@query(
    "setop_intersect_all",
    oracle=f"{_A_SQL} INTERSECT ALL {_B_SQL}",
    category="setop",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiplicity = min of the two sides)."""
    t = Tables(spark, sf_dir)
    return _a(t).intersectAll(_b(t))


@query(
    "setop_except",
    oracle=f"{_A_SQL} EXCEPT {_B_SQL}",
    category="setop",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) → df.subtract."""
    t = Tables(spark, sf_dir)
    return _a(t).subtract(_b(t))


@query(
    "setop_except_all",
    oracle=f"{_A_SQL} EXCEPT ALL {_B_SQL}",
    category="setop",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiplicity-aware difference)."""
    t = Tables(spark, sf_dir)
    return _a(t).exceptAll(_b(t))
