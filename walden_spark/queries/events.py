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

from walden_spark.operators.graph import connected_components, triangle_counts
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


@query(
    "events_gapfill",
    oracle="""
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
  FROM events
),
types AS (SELECT DISTINCT event_type FROM events),
spine AS (
  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM types, bounds
),
agg AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         COUNT(*) AS n, SUM(CAST(value AS DECIMAL(12,2))) AS tv
  FROM events GROUP BY 1, 2
)
SELECT s.event_type,
       strftime(s.h, '%Y-%m-%d %H:%M:%S') AS bucket,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n,
       CAST(a.tv AS DOUBLE) AS total_value,
       CAST(last_value(a.tv IGNORE NULLS) OVER (
              PARTITION BY s.event_type ORDER BY s.h
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS locf_value
FROM spine s LEFT JOIN agg a ON s.event_type = a.event_type AND s.h = a.h
ORDER BY s.event_type, s.h
""",
    category="events",
)
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample with LOCF carry-forward — the
    TimescaleDB time_bucket_gapfill / Trino sequence+unnest idiom:
    every (event_type, hour) cell of the global span exists in the
    output, empty cells get n=0 and carry the last observed value
    forward (IGNORE NULLS last_value).

    Scale shape: the aggregate is the usual partial/final hourly
    groupBy; the spine is |types| x |hours| rows built by exploding a
    sequence against the distinct types — spine size is the REPORT
    size, independent of event volume; the left join is equi on
    (type, hour) and LOCF is one window sort per type. Bounds are one
    2-value driver fetch (same bounded-collect pattern as the ANN
    probe matrices)."""
    t = Tables(spark, sf_dir)
    b = t.events.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    ).collect()[0]
    spine = (
        t.events.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.lit(b.h0).cast("timestamp_ntz"),
                    F.lit(b.h1).cast("timestamp_ntz"),
                    F.expr("interval 1 hour"),
                )
            ).alias("h"),
        )
    )
    agg = t.events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(12,2)")).alias("tv"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(agg, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.date_format("h", _FMT).alias("bucket"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
            F.col("tv").cast("double").alias("total_value"),
            F.last(F.col("tv"), ignorenulls=True).over(w).cast("double").alias("locf_value"),
        )
        .orderBy("event_type", "bucket")
    )


@query(
    "events_funnel",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT stage, CAST(stage_no AS INT) AS stage_no, n_users FROM (
  SELECT 'view' AS stage, 1 AS stage_no, COUNT(*) AS n_users FROM v
  UNION ALL SELECT 'click', 2, COUNT(*) FROM c
  UNION ALL SELECT 'purchase', 3, COUNT(*) FROM p
)
ORDER BY stage_no
""",
    category="events",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase, strictly
    increasing timestamps): per-user first qualifying event per stage,
    counted per stage — the product-analytics sequential-match query
    (Trino serves it via windowed UDFs; here it is three
    filter+min-aggregate passes chained by time-conditioned equi-joins
    on user_id, each one shuffle on the same key so co-partitioning
    carries through)."""
    t = Tables(spark, sf_dir)
    e = t.events.select("user_id", "event_type", "ts")
    v = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("t1"))
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    def stage(df, name, no):
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("stage"), F.lit(no).cast("int").alias("stage_no"), "n_users"
        )
    return (
        stage(v, "view", 1)
        .unionByName(stage(c, "click", 2))
        .unionByName(stage(p, "purchase", 3))
        .orderBy("stage_no")
    )


@query(
    "events_retention_cohort",
    oracle="""
WITH firsts AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS first_day FROM events GROUP BY 1
),
days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT CAST(floor(datediff('day', DATE '2024-01-01', f.first_day) / 7) AS BIGINT)
         AS cohort_week,
       CAST(floor(datediff('day', f.first_day, d.day) / 7) AS BIGINT)
         AS week_offset,
       count(DISTINCT d.user_id) AS active_users
FROM days d JOIN firsts f USING (user_id)
GROUP BY 1, 2
""",
    category="events",
)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by the week of their
    first event; for each (cohort_week, weeks-since-first) cell, how
    many of them were active. The classic product-analytics triangle.

    Plan shape: one groupBy(user) for first-touch, one distinct over
    (user, day) activity, one user-keyed join (same key → no extra
    shuffle under AQE), one count-distinct agg. All keys are user_id —
    at 100 TB this is three shuffles of slim (user, day) rows, no
    row-level fan-out. Week boundaries are computed as day-arithmetic
    from a fixed epoch on BOTH engines (date_trunc('week') start-of-week
    conventions differ across engines)."""
    t = Tables(spark, sf_dir)
    ev = t.events.select("user_id", F.to_date("ts").alias("day"))
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    days = ev.distinct()
    return (
        days.join(firsts, "user_id")
        .groupBy(
            F.floor(
                F.datediff(F.col("first_day"), F.lit("2024-01-01").cast("date")) / 7
            ).alias("cohort_week"),
            F.floor(F.datediff(F.col("day"), F.col("first_day")) / 7).alias(
                "week_offset"
            ),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@query(
    "events_path_regex",
    oracle="""
WITH paths AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS path
  FROM events
  GROUP BY user_id
)
SELECT user_id, CAST(length(path) AS BIGINT) AS n_events,
       CAST(regexp_matches(path, 's[^p]*p') AS BOOLEAN) AS converted
FROM paths
""",
    category="events",
)
def events_path_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path analysis (ClickHouse sequenceMatch / funnel-
    regex shape): each user's ordered event history folds to a
    compact symbol string (first letter of the type — s=signup,
    p=purchase, ...) and a regex answers 'signup then a later
    purchase with no purchase in between'. One groupBy(user) shuffle
    with an ORDERED aggregation, then a map-only regex — the whole
    path state is one string per user, so a billion-user corpus is a
    plain aggregate, not a window. Tiebreak on (ts, event_id) keeps
    the fold deterministic across engines."""
    t = Tables(spark, sf_dir)
    paths = (
        t.events.select("user_id", "ts", "event_id", F.substring("event_type", 1, 1).alias("sym"))
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "sym"))
                ).getField("sym"),
            ).alias("path")
        )
    )
    return paths.select(
        "user_id",
        F.length("path").cast("long").alias("n_events"),
        F.col("path").rlike("s[^p]*p").alias("converted"),
    )


@query(
    "events_anomaly_zscore",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS d,
         CAST(SUM(n) AS DOUBLE) AS s,
         CAST(SUM(n * n) AS DOUBLE) AS ss
  FROM daily GROUP BY 1
)
SELECT d.event_type, CAST(d.day AS STRING) AS day, CAST(d.n AS BIGINT) AS n,
       floor(((d.n - s.s / s.d)
              / sqrt((s.ss - s.s * s.s / s.d) / (s.d - 1))) * 1000000.0)
         / 1000000.0 AS zscore
FROM daily d JOIN stats s ON d.event_type = s.event_type
WHERE abs((d.n - s.s / s.d)
          / sqrt((s.ss - s.s * s.s / s.d) / (s.d - 1))) > 1.5
""",
    category="events",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: daily event counts per type scored
    against that type's mean/stddev (z-score from exact integer sums —
    identical IEEE arithmetic on both engines), keeping |z| > 1.5
    days. Two slim aggregations plus a per-type broadcast join; at
    100 TB the daily rollup is the only pass over raw events. r10:
    re-expressed on the shared anomaly operator (moment estimator) —
    same oracle, same hash."""
    from walden_spark.operators.anomaly import moment_anomalies

    t = Tables(spark, sf_dir)
    daily = (
        t.events.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return moment_anomalies(daily, ["event_type"], "n", threshold=1.5).select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        F.col("n").cast("long").alias("n"),
        (F.floor(F.col("score") * 1e6) / 1e6).alias("zscore"),
    )


@query(
    "events_interpolate",
    oracle="""
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
  FROM events
),
types AS (SELECT DISTINCT event_type FROM events),
spine AS (
  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM types, bounds
),
agg AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS tv
  FROM events GROUP BY 1, 2
),
cells AS (
  SELECT s.event_type, s.h, a.n, a.tv,
         row_number() OVER (PARTITION BY s.event_type ORDER BY s.h) AS rn
  FROM spine s LEFT JOIN agg a ON s.event_type = a.event_type AND s.h = a.h
),
nbr AS (
  SELECT event_type, h, n, tv, rn,
         last_value(tv IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY rn
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_tv,
         last_value(CASE WHEN tv IS NOT NULL THEN rn END IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY rn
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_rn,
         first_value(tv IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY rn
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_tv,
         first_value(CASE WHEN tv IS NOT NULL THEN rn END IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY rn
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_rn
  FROM cells
)
SELECT event_type,
       strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket,
       CAST(COALESCE(n, 0) AS BIGINT) AS n,
       floor(
         (CASE WHEN tv IS NOT NULL THEN tv
               ELSE prev_tv + (next_tv - prev_tv)
                    * (CAST(rn - prev_rn AS DOUBLE) / CAST(next_rn - prev_rn AS DOUBLE))
          END) * 1000000.0) / 1000000.0 AS filled_value
FROM nbr
ORDER BY event_type, h
""",
    category="events",
)
def events_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR interpolation over time-series gaps (r08) — TimescaleDB
    ``interpolate()`` beside events_gapfill's LOCF: empty hourly cells
    get prev + (next − prev) · gap_fraction between the nearest
    observed points on each side; leading/trailing gaps (no neighbor)
    stay NULL, observed cells pass through.

    Determinism: the gap fraction is ROW-POSITION arithmetic on the
    dense hour spine (row_number deltas — no epoch/timezone math), the
    observed values are decimal sums cast to double, and both engines
    evaluate the identical prev + (next−prev)·(Δrn/Δrn) expression
    before floor-quantization, so the doubles are bit-identical.

    Scale shape: same as gapfill — the aggregate is partial/final
    hourly groupBy, the spine is report-sized, and the neighbor lookups
    are two frames over one window sort per event_type (a single
    shuffle on the partition key)."""
    t = Tables(spark, sf_dir)
    b = t.events.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    ).collect()[0]
    spine = (
        t.events.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.lit(b.h0).cast("timestamp_ntz"),
                    F.lit(b.h1).cast("timestamp_ntz"),
                    F.expr("interval 1 hour"),
                )
            ).alias("h"),
        )
    )
    agg = t.events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("tv"),
    )
    wall = Window.partitionBy("event_type").orderBy("h")
    cells = (
        spine.join(agg, ["event_type", "h"], "left")
        .withColumn("rn", F.row_number().over(wall))
    )
    wrn = Window.partitionBy("event_type").orderBy("rn")
    wprev = wrn.rowsBetween(Window.unboundedPreceding, -1)
    wnext = wrn.rowsBetween(1, Window.unboundedFollowing)
    prev_tv = F.last("tv", ignorenulls=True).over(wprev)
    prev_rn = F.last(
        F.when(F.col("tv").isNotNull(), F.col("rn")), ignorenulls=True
    ).over(wprev)
    next_tv = F.first("tv", ignorenulls=True).over(wnext)
    next_rn = F.first(
        F.when(F.col("tv").isNotNull(), F.col("rn")), ignorenulls=True
    ).over(wnext)
    frac = (F.col("rn") - prev_rn).cast("double") / (next_rn - prev_rn).cast(
        "double"
    )
    filled = F.when(F.col("tv").isNotNull(), F.col("tv")).otherwise(
        prev_tv + (next_tv - prev_tv) * frac
    )
    return (
        cells.withColumn("prev_tv", prev_tv)
        .withColumn("next_tv", next_tv)
        .select(
            "event_type",
            F.date_format("h", _FMT).alias("bucket"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
            (F.floor(filled * 1000000.0) / 1000000.0).alias("filled_value"),
        )
        .orderBy("event_type", "bucket")
    )


@query(
    "events_retention_cohorts",
    oracle="""
WITH weeks AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS week
  FROM events
), cohorts AS (
  SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY user_id
), sizes AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM cohorts GROUP BY cohort_week
)
SELECT w.week - c.cohort_week AS week_offset, c.cohort_week,
       s.cohort_size,
       CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS active_users,
       (CAST(COUNT(DISTINCT w.user_id) AS BIGINT) * 1000000) // s.cohort_size
         AS retention_ppm
FROM weeks w
JOIN cohorts c ON w.user_id = c.user_id
JOIN sizes s ON c.cohort_week = s.cohort_week
GROUP BY c.cohort_week, w.week - c.cohort_week, s.cohort_size
ORDER BY c.cohort_week, week_offset
""",
    category="events",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (r09) — the canonical product-analytics
    triangle: users are cohorted by the week of their first event
    (week = integer days-since-epoch-anchor DIV 7, engine-neutral
    integer arithmetic — date_trunc('week') ISO rules are a cross-
    engine liability), then each (cohort, offset) cell counts the
    cohort's users active that many weeks later, with retention as an
    exact integer ppm of cohort size.

    Scale shape: (user, week) dedup is one partial-agg shuffle on
    user_id; cohort min() reuses the same key so the join is
    co-partitioned; cohort sizes are a tiny broadcast. No window
    functions, no per-cohort sort."""
    t = Tables(spark, sf_dir)
    weeks = t.events.select(
        "user_id",
        # F.floor, not cast('int'): cast truncates toward zero while the
        # oracle's `//` floors, so a pre-anchor event would land in week
        # 0 here but week -1 there (ADVICE r09 #3; sibling at
        # events_streaks uses floor for the same reason)
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            / F.lit(7)
        )
        .cast("int")
        .alias("week"),
    ).distinct().persist()  # weeks feeds cohorts AND the retention join
    cohorts = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    return (
        weeks.join(cohorts, "user_id")
        .join(F.broadcast(sizes), "cohort_week")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
            "cohort_size",
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("active_users"))
        .select(
            "week_offset",
            "cohort_week",
            "cohort_size",
            "active_users",
            F.expr("(active_users * 1000000) DIV cohort_size").alias("retention_ppm"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "events_activity_streaks",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day
  FROM events
), islands AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM days
), streaks AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS streak,
         CAST(MIN(day) AS BIGINT) AS streak_start
  FROM islands GROUP BY user_id, grp
)
SELECT user_id,
       CAST(MAX(streak) AS BIGINT) AS longest_streak,
       CAST(MIN(streak_start) FILTER (
         WHERE streak = (SELECT MAX(s2.streak) FROM streaks s2
                         WHERE s2.user_id = streaks.user_id)) AS BIGINT)
         AS first_best_start,
       CAST(SUM(streak) AS BIGINT) AS n_active_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks
FROM streaks
GROUP BY user_id
ORDER BY longest_streak DESC, user_id
""",
    category="events",
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands (r09): longest run of CONSECUTIVE active days
    per user — the classic sequential-SQL shape (session streaks,
    SLA-uptime runs, habit analytics) built on the row_number-delta
    trick: within a user, day - row_number(day) is constant exactly on
    consecutive-day islands, so one window plus two aggregations
    replaces any iterative scan. Engine-neutral integer day indexes
    (days since an anchor date), no timestamps in flight.

    Scale shape: (user, day) dedup and the window shuffle on user_id
    once each; islands never materialize wider than the deduped
    activity table. Per-user day counts are bounded (days, not
    events), so window partitions stay small even for hot users."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    days = t.events.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn("grp", F.col("day") - F.row_number().over(w))
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("streak"),
        F.min("day").cast("bigint").alias("streak_start"),
    )
    best = Window.partitionBy("user_id")
    return (
        streaks.withColumn("max_streak", F.max("streak").over(best))
        .groupBy("user_id")
        .agg(
            F.max("streak").cast("bigint").alias("longest_streak"),
            F.min(F.when(F.col("streak") == F.col("max_streak"), F.col("streak_start")))
            .cast("bigint")
            .alias("first_best_start"),
            F.sum("streak").cast("bigint").alias("n_active_days"),
            F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        )
        .orderBy(F.desc("longest_streak"), "user_id")
    )


@query(
    "events_anomaly_mad",
    oracle="""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), med AS (
  SELECT event_type, n AS med FROM (
    SELECT event_type, n,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n, day) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS c
    FROM daily
  ) WHERE rn = (c + 1) // 2
), dev AS (
  SELECT d.event_type, d.day, d.n, m.med, abs(d.n - m.med) AS dv
  FROM daily d JOIN med m ON d.event_type = m.event_type
), mad AS (
  SELECT event_type, dv AS mad FROM (
    SELECT event_type, dv, day,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dv, day) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS c
    FROM dev
  ) WHERE rn = (c + 1) // 2
)
SELECT d.event_type, CAST(d.day AS BIGINT) AS day, d.n, d.med,
       CAST(m.mad AS BIGINT) AS mad
FROM dev d JOIN mad m ON d.event_type = m.event_type
WHERE d.dv > 3 * m.mad
ORDER BY d.event_type, d.day
""",
    category="events",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection (r09): flag days whose per-type event
    count deviates from the type's median by more than 3× the median
    absolute deviation — the MAD rule that survives the outliers a
    mean/stddev z-score is wrecked by. Every statistic is a rank-based
    LOWER median over integer counts (two windows per type), so the
    whole query is integer order statistics: zero float ops, bit-equal
    cross-engine, no distributional assumptions. mad=0 (a perfectly
    flat type) flags any deviating day, the conventional degenerate
    reading.

    Scale shape: the daily pre-agg collapses the corpus to
    |types|×|days| rows before any window; both medians sort only that
    collapsed set, partitioned by type. The 100 TB path for huge
    day-ranges is approx_percentile over the same pre-agg. r10:
    re-expressed on the shared anomaly operator (robust estimator) —
    same oracle, same hash."""
    from walden_spark.operators.anomaly import robust_anomalies

    t = Tables(spark, sf_dir)
    daily = t.events.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        robust_anomalies(daily, ["event_type"], ["day"], "n", threshold=3)
        .select(
            "event_type",
            "day",
            "n",
            F.col("center").alias("med"),
            F.col("spread").cast("bigint").alias("mad"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "events_anomaly_weekly",
    oracle="""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7 AS dow,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
), med AS (
  SELECT event_type, dow, n AS med FROM (
    SELECT event_type, dow, n,
           ROW_NUMBER() OVER (PARTITION BY event_type, dow ORDER BY n, day) AS rn,
           COUNT(*) OVER (PARTITION BY event_type, dow) AS c
    FROM daily
  ) WHERE rn = (c + 1) // 2
), dev AS (
  SELECT d.event_type, d.dow, d.day, d.n, m.med, abs(d.n - m.med) AS dv
  FROM daily d JOIN med m ON d.event_type = m.event_type AND d.dow = m.dow
), mad AS (
  SELECT event_type, dow, dv AS mad FROM (
    SELECT event_type, dow, dv, day,
           ROW_NUMBER() OVER (PARTITION BY event_type, dow ORDER BY dv, day) AS rn,
           COUNT(*) OVER (PARTITION BY event_type, dow) AS c
    FROM dev
  ) WHERE rn = (c + 1) // 2
)
SELECT d.event_type, CAST(d.dow AS BIGINT) AS dow, CAST(d.day AS BIGINT) AS day,
       d.n, d.med, CAST(m.mad AS BIGINT) AS mad
FROM dev d JOIN mad m ON d.event_type = m.event_type AND d.dow = m.dow
WHERE d.dv > 3 * m.mad
ORDER BY d.event_type, d.day
""",
    category="events",
)
def events_anomaly_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-split anomaly detection (r10, VERDICT r09 #7):
    weekly-periodic traffic makes a busy Saturday look anomalous
    against an all-days baseline, so each day is scored ONLY against
    its weekday cohort — MAD statistics per (event_type, day-of-week),
    the shared robust-anomaly operator with a two-column cohort key.
    dow = day % 7 from the 2024-01-01 anchor (a Monday): pure integer
    arithmetic, engine-neutral (ISO DOW functions are a cross-engine
    liability). All statistics are integer order statistics — bit-
    equal cross-engine.

    Scale shape: identical to events_anomaly_mad — one pass over raw
    events into the |types|×|days| pre-agg; the cohort split only
    changes the (tiny) statistic key space from |types| to
    |types|×7."""
    from walden_spark.operators.anomaly import robust_anomalies

    t = Tables(spark, sf_dir)
    day = (
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
    )
    daily = t.events.groupBy(
        "event_type",
        day.alias("day"),
        F.pmod(day, F.lit(7)).cast("bigint").alias("dow"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        robust_anomalies(daily, ["event_type", "dow"], ["day"], "n", threshold=3)
        .select(
            "event_type",
            "dow",
            "day",
            "n",
            F.col("center").alias("med"),
            F.col("spread").cast("bigint").alias("mad"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "events_type_pagerank",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
  FROM events
), edges AS (
  SELECT src, event_type AS dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM seq WHERE src IS NOT NULL GROUP BY 1, 2
), outw AS (
  SELECT src, CAST(SUM(w) AS BIGINT) AS tw FROM edges GROUP BY 1
), e AS (
  SELECT edges.src, edges.dst, edges.w, outw.tw
  FROM edges JOIN outw USING (src)
), nodes AS (
  SELECT DISTINCT event_type AS node FROM events
), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
it0 AS (
  SELECT node, CAST(1000000000 // nn.n AS BIGINT) AS s FROM nodes, nn
),
it1 AS (
  SELECT nodes.node,
         CAST(15000000000 // (100 * nn.n)
              + COALESCE(SUM((85 * it0.s * e.w) // (100 * e.tw)), 0)
              AS BIGINT) AS s
  FROM nodes CROSS JOIN nn
  LEFT JOIN e ON e.dst = nodes.node
  LEFT JOIN it0 ON it0.node = e.src
  GROUP BY nodes.node, nn.n
),
it2 AS (
  SELECT nodes.node,
         CAST(15000000000 // (100 * nn.n)
              + COALESCE(SUM((85 * it1.s * e.w) // (100 * e.tw)), 0)
              AS BIGINT) AS s
  FROM nodes CROSS JOIN nn
  LEFT JOIN e ON e.dst = nodes.node
  LEFT JOIN it1 ON it1.node = e.src
  GROUP BY nodes.node, nn.n
),
it3 AS (
  SELECT nodes.node,
         CAST(15000000000 // (100 * nn.n)
              + COALESCE(SUM((85 * it2.s * e.w) // (100 * e.tw)), 0)
              AS BIGINT) AS s
  FROM nodes CROSS JOIN nn
  LEFT JOIN e ON e.dst = nodes.node
  LEFT JOIN it2 ON it2.node = e.src
  GROUP BY nodes.node, nn.n
)
SELECT node AS event_type, s AS pr_scaled FROM it3 ORDER BY node
""",
    category="events",
)
def events_type_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics (r11): weighted PageRank over the event-type
    transition graph — nodes = event types, edges = consecutive
    per-user transitions (ordered by ts, event_id) weighted by count,
    3 power iterations at damping 0.85 via
    :func:`walden_spark.operators.graph.pagerank`. All arithmetic is
    BIGINT fixed-point (scale 1e9): base ``(15·1e9) DIV (100·N)`` plus
    per-edge ``(85·s·w) DIV (100·W_src)`` — order-independent integer
    sums, so the DuckDB oracle running the same three chained CTEs
    emits identical bits (a float formulation would drift with
    summation order). Dangling mass is not redistributed — documented
    operator contract.

    Scale shape: the transition edge list is one user-partitioned
    window pass + a slim groupBy; each iteration broadcasts the
    |types|-row score table to the edges and aggregates on dst — for
    web-scale node sets the same plan runs as a shuffle join
    (broadcast_scores=False)."""
    from walden_spark.operators.graph import pagerank

    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        t.events.select(
            "user_id", "ts", "event_id", "event_type",
            F.lag("event_type").over(w).alias("src"),
        )
        .filter(F.col("src").isNotNull())
        .groupBy("src", F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    nodes = t.events.select(F.col("event_type").alias("node")).distinct()
    pr = pagerank(edges, nodes, iterations=3)
    return pr.select(
        F.col("node").alias("event_type"), "pr_scaled"
    ).orderBy("event_type")


@query(
    "events_user_triangles",
    oracle="""
WITH act AS (
  SELECT DISTINCT user_id, event_type, CAST(ts AS DATE) AS d,
         EXTRACT(hour FROM ts) AS h
  FROM events WHERE user_id < 150
), pairs AS (
  SELECT a.user_id AS ua, b.user_id AS ub, CAST(COUNT(*) AS BIGINT) AS w
  FROM act a
  JOIN act b ON a.event_type = b.event_type AND a.d = b.d AND a.h = b.h
            AND a.user_id < b.user_id
  GROUP BY 1, 2
), e AS (
  SELECT ua, ub FROM pairs WHERE w >= 4
), tri AS (
  SELECT e1.ua AS a, e1.ub AS b, e2.ub AS c
  FROM e e1
  JOIN e e2 ON e2.ua = e1.ub
  JOIN e e3 ON e3.ua = e1.ua AND e3.ub = e2.ub
), corners AS (
  SELECT a AS u FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
), tcnt AS (
  SELECT u, CAST(COUNT(*) AS BIGINT) AS t FROM corners GROUP BY 1
), deg AS (
  SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT ua AS u FROM e UNION ALL SELECT ub AS u FROM e
  ) x GROUP BY 1
)
SELECT deg.u AS user_id, deg.deg,
       COALESCE(tcnt.t, 0) AS triangles,
       CASE WHEN deg.deg >= 2
            THEN (2000 * COALESCE(tcnt.t, 0)) // (deg.deg * (deg.deg - 1))
            ELSE 0 END AS clust_permille
FROM deg LEFT JOIN tcnt ON tcnt.u = deg.u
ORDER BY user_id
""",
    category="events",
)
def events_user_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + local clustering coefficient (this session
    — second graph-analytics operator after PageRank): build a user
    co-occurrence graph — an edge when two users are active in the
    same (event_type, day, hour) bucket at least 4 times — then count
    per-user triangles via
    :func:`walden_spark.operators.graph.triangle_counts` (degree-
    oriented wedge join) and report degree, triangle count, and the
    local clustering coefficient in exact integer permille
    ``(2000·T) DIV (deg·(deg−1))`` — no float division, so the DuckDB
    oracle (plain id-ordered a<b<c triangle join) emits identical bits
    even though the engine enumerates with the degree orientation.

    Scale shape: co-occurrence pairing is an equi self-join on the
    bucket key — the bucket IS the blocking key, so fan-out is bounded
    by per-bucket activity (a production path caps hot buckets exactly
    like dedup's LSH max_bucket_size); the pair aggregate shuffles on
    the (ua, ub) key; everything downstream operates on the edge list
    (≪ events) with the degree orientation bounding the wedge join.
    The explicit repartition on the bucket key keeps the exploding
    join parallel instead of letting AQE coalesce it to one task."""
    t = Tables(spark, sf_dir)
    act = (
        t.events.filter(F.col("user_id") < 150)
        .select(
            "user_id",
            "event_type",
            F.to_date("ts").alias("d"),
            F.hour("ts").alias("h"),
        )
        .distinct()
        .repartition(
            spark.sparkContext.defaultParallelism, "event_type", "d", "h"
        )
    )
    a = act.select(
        F.col("user_id").alias("ua"), "event_type", "d", "h"
    )
    b = act.select(
        F.col("user_id").alias("ub"), "event_type", "d", "h"
    )
    edges = (
        a.join(b, ["event_type", "d", "h"])
        .filter(F.col("ua") < F.col("ub"))
        .groupBy("ua", "ub")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 4)
        .select("ua", "ub")
    )
    tri = triangle_counts(edges, "ua", "ub")
    deg = (
        edges.select(F.col("ua").alias("n"))
        .unionAll(edges.select(F.col("ub").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    return (
        deg.join(tri.withColumnRenamed("node", "n"), "n")
        .select(
            F.col("n").alias("user_id"),
            "deg",
            "triangles",
            F.when(
                F.col("deg") >= 2,
                F.expr("(2000 * triangles) DIV (deg * (deg - 1))"),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("clust_permille"),
        )
        .orderBy("user_id")
    )


@query(
    "events_user_components",
    oracle="""
WITH RECURSIVE act AS (
  SELECT DISTINCT user_id, event_type, CAST(ts AS DATE) AS d,
         EXTRACT(hour FROM ts) AS h
  FROM events WHERE user_id < 150
), pairs AS (
  SELECT a.user_id AS ua, b.user_id AS ub, CAST(COUNT(*) AS BIGINT) AS w
  FROM act a
  JOIN act b ON a.event_type = b.event_type AND a.d = b.d AND a.h = b.h
            AND a.user_id < b.user_id
  GROUP BY 1, 2
), e AS (
  SELECT ua, ub FROM pairs WHERE w >= 4
), und AS (
  SELECT ua AS u, ub AS v FROM e UNION SELECT ub, ua FROM e
), reach AS (
  SELECT u, u AS v FROM (SELECT DISTINCT u FROM und) n
  UNION
  SELECT r.u, und.v FROM reach r JOIN und ON und.u = r.v
), lab AS (
  SELECT u, MIN(v) AS component FROM reach GROUP BY u
), sz AS (
  SELECT component, CAST(COUNT(*) AS BIGINT) AS comp_size
  FROM lab GROUP BY 1
)
SELECT lab.u AS user_id, lab.component, sz.comp_size
FROM lab JOIN sz USING (component)
ORDER BY user_id
""",
    category="events",
)
def events_user_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components as a first-class graph operator (this
    session — third graph-analytics entry after PageRank and triangle
    counting): label every user in the ≥4-shared-(type, day, hour)
    co-occurrence graph with its component's minimum user id plus the
    component size, via
    :func:`walden_spark.operators.graph.connected_components` —
    iterative min-label propagation, O(diameter) join+aggregate rounds
    with localCheckpoint lineage cuts (the same 100 TB CC plan the
    near-dup clusterer runs; here promoted to a generic edge-list
    API). The DuckDB oracle replays it as a recursive transitive-
    closure CTE — feasible because components are bounded at fixture
    scale; the ENGINE path never materializes reachability, only
    per-round labels. Same slice as events_user_triangles (one graph,
    three operators)."""
    t = Tables(spark, sf_dir)
    act = (
        t.events.filter(F.col("user_id") < 150)
        .select(
            "user_id",
            "event_type",
            F.to_date("ts").alias("d"),
            F.hour("ts").alias("h"),
        )
        .distinct()
        .repartition(
            spark.sparkContext.defaultParallelism, "event_type", "d", "h"
        )
    )
    a = act.select(F.col("user_id").alias("ua"), "event_type", "d", "h")
    b = act.select(F.col("user_id").alias("ub"), "event_type", "d", "h")
    edges = (
        a.join(b, ["event_type", "d", "h"])
        .filter(F.col("ua") < F.col("ub"))
        .groupBy("ua", "ub")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 4)
        .select("ua", "ub")
    )
    comp = connected_components(edges, "ua", "ub")
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("comp_size")
    )
    return (
        comp.join(sizes, "component")
        .select(
            F.col("node").alias("user_id"), "component", "comp_size"
        )
        .orderBy("user_id")
    )
