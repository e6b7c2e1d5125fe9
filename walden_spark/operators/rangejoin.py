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


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_lo: str,
    a_hi: str,
    b_lo: str,
    b_hi: str,
    bin_width: float,
) -> DataFrame:
    """Interval × interval OVERLAP join (r08) — half-open intervals
    overlap iff ``a.lo < b.hi AND b.lo < a.hi`` — as a binned
    equi-join: BOTH sides explode into the bins they touch and pairs
    meet on the shared bin. A pair can share many bins, so instead of
    a dedup shuffle each pair is kept only in the ONE bin that
    contains the overlap's start (``floor(greatest(a.lo, b.lo)/w)``) —
    a bin both sides necessarily touch. Column names must be disjoint.
    Cost: O(matches + bin collisions), fan-out = interval length /
    bin_width per side; never a nested-loop plan."""
    a_bins = F.sequence(
        F.floor(F.col(a_lo) / bin_width), F.floor(F.col(a_hi) / bin_width)
    )
    b_bins = F.sequence(
        F.floor(F.col(b_lo) / bin_width), F.floor(F.col(b_hi) / bin_width)
    )
    ea = a.withColumn("__bin", F.explode(a_bins))
    eb = b.withColumn("__bin", F.explode(b_bins))
    out = ea.join(eb, "__bin").filter(
        (F.col(a_lo) < F.col(b_hi))
        & (F.col(b_lo) < F.col(a_hi))
        & (
            F.col("__bin")
            == F.floor(F.greatest(F.col(a_lo), F.col(b_lo)) / bin_width)
        )
    )
    return out.drop("__bin")


@query(
    "join_interval_overlap",
    oracle="""
SELECT o_orderkey, w.w_id
FROM (SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS a_lo,
             CAST(o_totalprice AS DOUBLE) + 30000.0 AS a_hi
      FROM orders WHERE o_orderkey < 500) a
JOIN (SELECT w_id, CAST(w_id * 25000 AS DOUBLE) AS b_lo,
             CAST(w_id * 25000 AS DOUBLE) + 40000.0 AS b_hi
      FROM (SELECT unnest(range(0, 12)) AS w_id)) w
  ON a.a_lo < w.b_hi AND w.b_lo < a.a_hi
ORDER BY o_orderkey, w.w_id
""",
    category="join",
)
def join_interval_overlap_query(spark, sf_dir: str) -> DataFrame:
    """Interval-overlap join of order price ranges against price bands
    through the binned rewrite — the blanket plan gate proves it stays
    an equi-join on __bin (no BroadcastNestedLoopJoin), and the oracle
    runs the naive theta join."""
    t = Tables(spark, sf_dir)
    a = t.orders.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("a_lo"),
        (F.col("o_totalprice").cast("double") + 30000.0).alias("a_hi"),
    )
    b = spark.range(0, 12).select(
        F.col("id").alias("w_id"),
        (F.col("id") * 25000).cast("double").alias("b_lo"),
        ((F.col("id") * 25000) + 40000.0).cast("double").alias("b_hi"),
    )
    joined = interval_overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 25000.0)
    return joined.select("o_orderkey", "w_id").orderBy("o_orderkey", "w_id")
