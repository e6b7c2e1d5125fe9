"""Binned range join (SURVEY §2.3 / §7.3): big-big interval joins
without a nested-loop plan.

OSS Spark executes a point-in-interval theta join as
BroadcastNestedLoopJoin (fine only when one side broadcasts). The
binning rewrite makes it an equi-join: intervals explode into the
fixed-width bins they overlap, points map to their bin, the join runs
hash-partitioned on bin, and the residual range predicate filters
within the bin — O(matches + bin collisions) instead of O(n·m).
This is the standard plan Databricks' range-join optimization and
time-series engines' interval indexes produce; here it's a reusable
composition of explode + equi-join.

Bin width trades fan-out (intervals copied per overlapped bin) against
selectivity (bin collisions to residual-filter). A good default is the
median interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from walden_spark.registry import query
from walden_spark.tables import Tables


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Inner-join `points` to `intervals` on lo <= point < hi via bin
    equi-join. Column names must be disjoint between the two inputs.
    Intervals are half-open [lo, hi).

    No dedup step is needed: a point belongs to exactly one bin, so a
    (point, interval) pair can only meet in that bin — an interval
    copied into a trailing bin it barely touches is simply filtered by
    the residual predicate."""
    p_bin = F.floor(F.col(point_col) / bin_width)
    binned_points = points.withColumn("__bin", p_bin)
    i_bins = F.sequence(
        F.floor(F.col(lo_col) / bin_width), F.floor(F.col(hi_col) / bin_width)
    )
    binned_intervals = intervals.withColumn("__bin", F.explode(i_bins))
    out = binned_points.join(binned_intervals, "__bin").filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return out.drop("__bin")


@query(
    "range_join_binned",
    oracle="""
SELECT o_orderkey, w.w_id, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders
JOIN (SELECT w_id, CAST(w_id * 40000 AS DOUBLE) AS lo, CAST((w_id + 1) * 40000 AS DOUBLE) + 20000 AS hi
      FROM (SELECT unnest(range(0, 10)) AS w_id)) w
  ON o_totalprice >= w.lo AND o_totalprice < w.hi
WHERE o_orderkey < 2000
ORDER BY o_orderkey, w.w_id
""",
    category="join",
)
def range_join_binned_query(spark, sf_dir: str) -> DataFrame:
    """Point-in-interval join of orders (price) against overlapping
    price bands, executed as the binned equi-join — the plan contains a
    hash join on __bin, no BroadcastNestedLoopJoin (asserted in
    tests/test_plans.py)."""
    t = Tables(spark, sf_dir)
    bands = spark.range(0, 10).select(
        F.col("id").alias("w_id"),
        (F.col("id") * 40000).cast("double").alias("lo"),
        ((F.col("id") + 1) * 40000 + 20000).cast("double").alias("hi"),
    )
    pts = t.orders.filter(F.col("o_orderkey") < 2000).select("o_orderkey", "o_totalprice")
    joined = range_join_binned(pts, bands, "o_totalprice", "lo", "hi", bin_width=20000.0)
    return (
        joined.select("o_orderkey", "w_id", F.col("o_totalprice").cast("double").alias("o_totalprice"))
        .orderBy("o_orderkey", "w_id")
    )
