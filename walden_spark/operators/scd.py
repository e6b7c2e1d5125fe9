"""Slowly-changing-dimension Type 2 from a change stream — the
lakehouse dimension-history staple (the reference's Iceberg MERGE
users build exactly this; Kimball, *The Data Warehouse Toolkit*,
ch. 5 "Slowly Changing Dimension Techniques").

Plan shape: one shuffle on the key (window partition), everything else
is per-partition window arithmetic — lag to collapse no-op changes,
lead to close validity intervals. At 100TB the change stream shuffles
once by key; no self-joins, no iteration.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from walden_spark.registry import query
from walden_spark.tables import Tables


def scd2_from_changes(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Build SCD2 validity intervals from an (unordered) change stream.

    Consecutive rows per key with an unchanged attribute collapse into
    one interval (a change record that changes nothing extends the
    current version, per standard SCD2). Output: key cols, attr,
    valid_from, valid_to (NULL while current), is_current.
    """
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak_cols]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    collapsed = (
        changes.withColumn("_prev_attr", F.lag(attr_col).over(w))
        # keep only genuine transitions (first row per key included)
        .filter(
            F.col("_prev_attr").isNull() | (F.col(attr_col) != F.col("_prev_attr"))
        )
        .drop("_prev_attr")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return collapsed.select(
        *key_cols,
        F.col(attr_col).alias("attr"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


@query(
    "events_scd2_history",
    oracle="""
WITH collapsed AS (
  SELECT user_id, event_type, ts, event_id
  FROM (SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_attr
        FROM events)
  WHERE prev_attr IS NULL OR event_type <> prev_attr
)
SELECT user_id, event_type AS attr,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '%Y-%m-%d %H:%M:%S') AS valid_to,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
FROM collapsed
""",
    category="events",
)
def events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension history: each user's event_type stream becomes
    validity intervals — no-op changes collapse, lead() closes each
    version, the open version is flagged current. One key shuffle.

    Both windows tie-break on event_id, so ordering is total even when
    two transitions share a timestamp."""
    t = Tables(spark, sf_dir)
    out = scd2_from_changes(
        t.events.select("user_id", "event_type", "ts", "event_id"),
        key_cols=["user_id"],
        ts_col="ts",
        attr_col="event_type",
        tiebreak_cols=["event_id"],
    )
    return out.select(
        "user_id",
        "attr",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        "is_current",
    )
