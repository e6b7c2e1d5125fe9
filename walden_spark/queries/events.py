"""Event-table analytics: batch time-windowing over `events`.

The reference is batch-only (SURVEY §2.9); these queries cover the
batch half of the streaming extension — `F.window`/`F.session_window`
work identically on static DataFrames, so the semantics proven here
carry to the Structured Streaming versions in walden_spark/streaming.

Window-start columns are emitted as formatted strings: Spark windows
are structs of session-TZ timestamps and DuckDB buckets are naive
timestamps — strings compare cleanly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from walden_spark.registry import query
from walden_spark.tables import Tables

_FMT = "yyyy-MM-dd HH:mm:ss"


@query(
    "events_tumbling",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
    category="events",
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (F.window ≡ epoch-aligned
    date_trunc buckets)."""
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("window.start"), _FMT).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "events_sliding",
    oracle="""
WITH shifted AS (
  SELECT to_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT)) AS s0, ts, value FROM events
)
SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start, COUNT(*) AS n
FROM (
  SELECT CAST(s0 AS TIMESTAMP) AS window_start, ts FROM shifted
  UNION ALL
  SELECT CAST(s0 - INTERVAL 300 SECOND AS TIMESTAMP) AS window_start, ts FROM shifted
)
WHERE ts >= window_start AND ts < window_start + INTERVAL 600 SECOND
GROUP BY window_start
""",
    category="events",
)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10 min width, 5 min slide) — each event lands in
    2 overlapping windows; oracle expands the windows explicitly."""
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format(F.col("window.start"), _FMT).alias("window_start"), "n")
    )


@query(
    "events_session_windows",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
  FROM events
), sessions AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM ordered
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start
FROM sessions
GROUP BY user_id, session_id
""",
    category="events",
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap): lag + cumulative-sum —
    the classic batch formulation; one shuffle on user_id.

    (F.session_window gives merged intervals for streaming; the gap
    cumsum is the equivalent batch idiom and oracle-checkable.)
    """
    t = Tables(spark, sf_dir)
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = Window.partitionBy("user_id").orderBy("ts").rowsBetween(Window.unboundedPreceding, 0)
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w_order)
    sessions = t.events.withColumn(
        "is_new", F.when(gap > 30 * 60, 1).otherwise(0)
    ).withColumn("session_id", F.sum("is_new").over(w_cum).cast("bigint"))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), _FMT).alias("session_start"),
    )


@query(
    "events_json_agg",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_total,
       COUNT(*) FILTER (WHERE CAST(props->>'$.k' AS BIGINT) > 50) AS n_high
FROM events
GROUP BY event_type
""",
    category="events",
)
def events_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction feeding an aggregate (props is a JSON
    string column, the Trino-idiom semi-typed JSON per SURVEY §1.2)."""
    t = Tables(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return t.events.groupBy("event_type").agg(
        F.sum(k).alias("k_total"),
        F.count(F.when(k > 50, 1)).alias("n_high"),
    )


@query(
    "events_dedup_exact",
    oracle="""
SELECT user_id, COUNT(*) AS n
FROM (
  SELECT DISTINCT event_id, user_id, event_type FROM (
    SELECT event_id, user_id, event_type FROM events
    UNION ALL
    SELECT event_id, user_id, event_type FROM events WHERE event_id % 3 = 0
  )
)
GROUP BY user_id
""",
    category="events",
)
def events_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a key (dropDuplicates) — input artificially
    re-duplicated so the operator provably removes rows."""
    t = Tables(spark, sf_dir)
    base = t.events.select("event_id", "user_id", "event_type")
    dup = base.unionAll(base.filter(F.col("event_id") % 3 == 0))
    return (
        dup.dropDuplicates(["event_id", "user_id", "event_type"])
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
