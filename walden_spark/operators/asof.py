"""Generalized as-of join (SURVEY §2.3 extension; pandas
``merge_asof`` / DuckDB ``ASOF JOIN`` parity): direction
backward/forward plus an optional tolerance window.

Strategy (the Spark-native one, same as ``join_asof``): union the two
sides, hash-partition ONCE on the key, order by time within each key,
and carry each right-side payload forward (backward as-of) or backward
(forward as-of) with ``last/first(ignorenulls)`` over a running
window. One shuffle, no range join, no nested loop — the plan is
identical in shape to a windowed aggregate, so it scales like one.
Tolerance is a residual comparison on the carried timestamp — applied
AFTER the window, it nulls out matches outside the window exactly like
``merge_asof(tolerance=...)``.

Equal timestamps match in both directions (``allow_exact_matches``
semantics of pandas' default): the union sorts right-side rows before
left-side rows at the same instant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from walden_spark.registry import query
from walden_spark.tables import Tables


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    payload: list[str],
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, matched with the nearest
    ``right`` row at-or-before (backward) / at-or-after (forward) its
    ``ts`` within the same ``on`` key — NULL payload when no match (or
    none within ``tolerance``, an INTERVAL literal string).

    Output: all ``left`` columns + ``payload`` columns (right side) +
    ``matched_ts`` (the matched right row's timestamp).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    l_cols = left.columns
    lhs = left.withColumn("_side", F.lit(1))
    rhs = right.select(
        on, ts, *payload
    ).withColumn("_side", F.lit(0))
    for c in l_cols:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None))
    for c in payload:
        if c not in lhs.columns:
            lhs = lhs.withColumn(c, F.lit(None))
    u = lhs.unionByName(rhs.select(*lhs.columns))

    # right rows sort before left rows at equal ts, so exact-time
    # matches are visible in either direction
    if direction == "backward":
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(ts).asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(ts).asc(), F.col("_side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True)  # noqa: E731

    r_ts = F.when(F.col("_side") == 0, F.col(ts))
    out = u.withColumn("matched_ts", pick(r_ts).over(w))
    for c in payload:
        out = out.withColumn(
            c, pick(F.when(F.col("_side") == 0, F.col(c))).over(w)
        )
    out = out.filter(F.col("_side") == 1)
    if tolerance is not None:
        in_tol = (
            F.col("matched_ts") >= F.col(ts) - F.expr(f"INTERVAL {tolerance}")
            if direction == "backward"
            else F.col("matched_ts") <= F.col(ts) + F.expr(f"INTERVAL {tolerance}")
        )
        out = out.withColumn("matched_ts", F.when(in_tol, F.col("matched_ts")))
        for c in payload:
            out = out.withColumn(c, F.when(in_tol, F.col(c)))
    return out.select(*l_cols, *payload, "matched_ts")


@query(
    "join_asof_tolerance",
    oracle="""
SELECT p.event_id, p.user_id,
       CASE WHEN s.ts >= p.ts - INTERVAL 1 HOUR
            THEN strftime(s.ts, '%Y-%m-%d %H:%M:%S.%f') END AS signup_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
""",
    category="join",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a 1-hour tolerance (merge_asof(tolerance=)
    semantics): signups further than an hour before the purchase don't
    count. Oracle: DuckDB native ASOF with the tolerance as a CASE."""
    t = Tables(spark, sf_dir)
    p = t.events.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    s = t.events.filter(F.col("event_type") == "signup").select("user_id", "ts")
    out = asof_join(p, s, on="user_id", ts="ts", payload=[], tolerance="1 HOUR")
    return out.select(
        "event_id",
        "user_id",
        F.date_format("matched_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("signup_ts"),
    )


@query(
    "join_asof_forward",
    oracle="""
SELECT s.event_id, s.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS next_purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'signup') s
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON s.user_id = p.user_id AND s.ts <= p.ts
""",
    category="join",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each signup matched to the user's NEXT purchase
    at-or-after it (time-to-conversion shape). Oracle: DuckDB ASOF
    with the inequality reversed."""
    t = Tables(spark, sf_dir)
    s = t.events.filter(F.col("event_type") == "signup").select("event_id", "user_id", "ts")
    p = t.events.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    out = asof_join(s, p, on="user_id", ts="ts", payload=[], direction="forward")
    return out.select(
        "event_id",
        "user_id",
        F.date_format("matched_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("next_purchase_ts"),
    )
