"""Hypertable-style time rollups (north-star extension): multi-
resolution continuous aggregates over an event stream.

The time-series-engine trick: aggregate the raw stream ONCE at the
finest resolution, then derive every coarser level by re-aggregating
the previous level — sums/counts compose, so a day level reads the
hour level (24x smaller), not the raw events. At 100TB the raw scan
happens exactly once and each further level is a cheap shuffle of an
already-tiny aggregate. Averages are carried as (sum, count) pairs and
finalized per level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from walden_spark.registry import query
from walden_spark.tables import Tables

# resolutions must be multiples of the previous entry for re-aggregation
RESOLUTIONS = [("15 minutes", "15m"), ("1 hour", "1h"), ("1 day", "1d")]


def time_rollup(
    events: DataFrame, ts_col: str, value_col: str, keys: list[str] | None = None
) -> DataFrame:
    """Multi-resolution rollup: returns one DataFrame with a `level`
    column, bucket start, group keys, and composable aggregates
    (n, total as exact decimal, finalized avg)."""
    keys = keys or []
    finest, _ = RESOLUTIONS[0]
    cur = (
        events.groupBy(F.window(ts_col, finest).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(14,2)")).alias("total"),
        )
        .select(F.col("w.start").alias("bucket"), *keys, "n", "total")
    )
    # Materialize the finest level once (optimization r14, guide §2.4):
    # without this the three union branches each re-derive the 15m
    # aggregate from the raw scan — exchange reuse cannot fire because
    # each coarser level pushes an extra isnotnull(window(...)) filter
    # into ITS copy of the base subtree, de-canonicalizing the three
    # exchanges (verified in plans/r14/events_hypertable_rollup_before
    # .txt: three Scan parquet nodes). localCheckpoint runs the raw
    # scan exactly once per invocation (eager, never cached across
    # runs) and the coarser levels re-aggregate the tiny bucket frame.
    cur = cur.localCheckpoint()
    out = cur.withColumn("level", F.lit(RESOLUTIONS[0][1]))
    for res, label in RESOLUTIONS[1:]:
        # coarser level re-aggregates the PREVIOUS level: partial sums
        # and counts compose exactly (decimal totals stay exact)
        cur = (
            cur.groupBy(F.window("bucket", res).alias("w"), *keys)
            .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
            .select(F.col("w.start").alias("bucket"), *keys, "n", "total")
        )
        out = out.unionByName(cur.withColumn("level", F.lit(label)))
    return out.select(
        "level",
        "bucket",
        *keys,
        "n",
        F.col("total").cast("double").alias("total"),
        (F.col("total").cast("double") / F.col("n")).alias("avg_value"),
    )


@query(
    "events_hypertable_rollup",
    oracle="""
WITH base AS (
  SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS bucket, event_type,
         COUNT(*) AS n, SUM(CAST(value AS DECIMAL(14,2))) AS total
  FROM events GROUP BY 1, 2
)
SELECT level, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_s, event_type,
       CAST(n AS BIGINT) AS n,
       CAST(total AS DOUBLE) AS total,
       CAST(total AS DOUBLE) / CAST(n AS BIGINT) AS avg_value
FROM (
  SELECT '15m' AS level, bucket, event_type, n, total FROM base
  UNION ALL
  SELECT '1h', time_bucket(INTERVAL 1 HOUR, bucket), event_type,
         SUM(n), SUM(total)
  FROM base GROUP BY 2, 3
  UNION ALL
  SELECT '1d', time_bucket(INTERVAL 1 DAY, h.hb), h.event_type, SUM(h.hn), SUM(h.ht)
  FROM (SELECT time_bucket(INTERVAL 1 HOUR, bucket) AS hb, event_type,
               SUM(n) AS hn, SUM(total) AS ht
        FROM base GROUP BY 1, 2) h
  GROUP BY 2, 3
)
""",
    category="events",
)
def events_hypertable_rollup(spark, sf_dir: str) -> DataFrame:
    """15min → 1h → 1d continuous-aggregate rollup of events.value per
    event_type; each coarser level derives from the finer one (raw scan
    happens once). Oracle replays the same cascade with time_bucket."""
    t = Tables(spark, sf_dir)
    rolled = time_rollup(t.events, "ts", "value", keys=["event_type"])
    return rolled.select(
        "level",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_s"),
        "event_type",
        "n",
        "total",
        "avg_value",
    )
