"""Window functions — SURVEY.md §2.5.

All four Trino window classes (ranking, value, aggregates-over-window,
frames) plus the GROUPS-frame emulation noted as a deviation in SURVEY
§2.5. Windows shuffle once on the partition key; rank-based ranking
functions over unique order keys are deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from walden_spark.registry import query
from walden_spark.tables import Tables, register_views
from walden_spark.queries.helpers import money


@query(
    "win_ranking",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       row_number() OVER w AS rn,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4) OVER w AS quartile,
       percent_rank() OVER w AS prank,
       cume_dist() OVER w AS cdist
FROM orders
WHERE o_custkey < 300
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
""",
    category="window",
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile / percent_rank / cume_dist."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return t.orders.filter(F.col("o_custkey") < 300).select(
        "o_orderkey",
        "o_orderpriority",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "win_value_functions",
    oracle="""
SELECT event_id, user_id,
       lag(value) OVER w AS prev_value,
       lead(value, 2) OVER w AS next2_value,
       first_value(value) OVER w AS first_val,
       last_value(value) OVER (PARTITION BY user_id ORDER BY event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_val,
       nth_value(value, 3) OVER w AS third_val,
       lag(big_val IGNORE NULLS) OVER w AS prev_big
FROM (SELECT event_id, user_id, value,
             CASE WHEN value > 50 THEN value END AS big_val
      FROM events WHERE user_id < 20)
WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
""",
    category="window",
)
def win_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / first_value / last_value / nth_value (+IGNORE NULLS)."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        SELECT event_id, user_id,
               lag(value) OVER w AS prev_value,
               lead(value, 2) OVER w AS next2_value,
               first_value(value) OVER w AS first_val,
               last_value(value) OVER (PARTITION BY user_id ORDER BY event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_val,
               nth_value(value, 3) OVER w AS third_val,
               lag(big_val) IGNORE NULLS OVER w AS prev_big
        FROM (SELECT event_id, user_id, value,
                     CASE WHEN value > 50 THEN value END AS big_val
              FROM events WHERE user_id < 20)
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        """
    )


@query(
    "win_agg_frames",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
            OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
            OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                  ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS window3_total,
       COUNT(*) OVER (PARTITION BY l_orderkey) AS n_lines,
       SUM(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                             RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS range_qty
FROM lineitem
WHERE l_orderkey < 2000
""",
    category="window",
)
def win_agg_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over ROWS / RANGE frames (running + sliding totals)."""
    t = Tables(spark, sf_dir)
    by_line = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return t.lineitem.filter(F.col("l_orderkey") < 2000).select(
        "l_orderkey",
        "l_linenumber",
        F.sum(money("l_extendedprice"))
        .over(by_line.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_total"),
        F.sum(money("l_extendedprice"))
        .over(by_line.rowsBetween(-1, 1))
        .cast("double")
        .alias("window3_total"),
        F.count(F.lit(1)).over(Window.partitionBy("l_orderkey")).alias("n_lines"),
        F.sum("l_quantity")
        .over(
            Window.partitionBy("l_orderkey")
            .orderBy("l_linenumber")
            .rangeBetween(-1, Window.currentRow)
        )
        .alias("range_qty"),
    )


@query(
    "win_range_interval",
    oracle="""
SELECT event_id, user_id,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_last_hour
FROM events
WHERE user_id < 10
""",
    category="window",
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame with a time-interval bound over event time."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        SELECT event_id, user_id,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_last_hour
        FROM events
        WHERE user_id < 10
        """
    )


def groups_frame_count(
    df: DataFrame,
    order_col: str,
    preceding: int,
    following: int,
    partition_by: tuple[str, ...] = (),
    alias: str = "n",
) -> DataFrame:
    """GROUPS-frame emulation (Spark 4.1 lacks GROUPS — SURVEY §2.5
    deviation): dense_rank over the ordering turns peer groups into
    consecutive integers, so an integer RANGE frame over the rank IS a
    GROUPS frame. ``partition_by`` keys BOTH windows, so partitioned
    use composes at scale; an empty ``partition_by`` is a global window
    and only valid on provably bounded input (VERDICT r03 #3)."""
    w_rank = Window.partitionBy(*partition_by).orderBy(order_col)
    w_frame = (
        Window.partitionBy(*partition_by).orderBy("grp").rangeBetween(preceding, following)
    )
    return (
        df.withColumn("grp", F.dense_rank().over(w_rank))
        .withColumn(alias, F.count(F.lit(1)).over(w_frame))
        .drop("grp")
    )


@query(
    "win_groups_frame",
    oracle="""
SELECT o_orderkey, odate,
       COUNT(*) OVER (ORDER BY grp RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS n_same_and_prev_day
FROM (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate,
         dense_rank() OVER (ORDER BY CAST(o_orderdate AS DATE)) AS grp
  FROM orders WHERE o_custkey < 50
)
""",
    category="window",
)
def win_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPS frame — in neither Spark nor DuckDB (SURVEY §2.5
    deviation); both sides use the dense_rank + RANGE-on-rank
    emulation, computed independently. Global (unpartitioned) variant:
    input is bounded by the o_custkey filter."""
    t = Tables(spark, sf_dir)
    src = t.orders.filter(F.col("o_custkey") < 50).select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("odate")
    )
    return groups_frame_count(
        src, "odate", -1, 0, alias="n_same_and_prev_day"
    ).select("o_orderkey", "odate", "n_same_and_prev_day")


@query(
    "win_groups_frame_partitioned",
    oracle="""
SELECT o_orderkey, o_orderpriority, odate,
       COUNT(*) OVER (PARTITION BY o_orderpriority
                      ORDER BY grp RANGE BETWEEN 1 PRECEDING AND CURRENT ROW)
         AS n_same_and_prev_day
FROM (
  SELECT o_orderkey, o_orderpriority, CAST(o_orderdate AS DATE) AS odate,
         dense_rank() OVER (PARTITION BY o_orderpriority
                            ORDER BY CAST(o_orderdate AS DATE)) AS grp
  FROM orders WHERE o_custkey < 200
)
""",
    category="window",
)
def win_groups_frame_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned GROUPS-frame emulation — the scale-composing path:
    both windows key on the partition column, so rank + frame run
    per-partition with no single-partition exchange."""
    t = Tables(spark, sf_dir)
    src = t.orders.filter(F.col("o_custkey") < 200).select(
        "o_orderkey", "o_orderpriority", F.col("o_orderdate").cast("date").alias("odate")
    )
    return groups_frame_count(
        src, "odate", -1, 0, partition_by=("o_orderpriority",), alias="n_same_and_prev_day"
    ).select("o_orderkey", "o_orderpriority", "odate", "n_same_and_prev_day")


@query(
    "win_exclude_current",
    oracle="""
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
         AS neighbor_sum,
       CAST(COUNT(*) OVER w AS BIGINT) AS neighbor_n
FROM events
WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
             EXCLUDE CURRENT ROW)
ORDER BY user_id, event_id
""",
    category="window",
)
def win_exclude_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2016 frame exclusion (r09): `EXCLUDE CURRENT ROW` — each
    row's ±2-row neighborhood WITHOUT itself, the leave-one-out shape
    smoothing/anomaly baselines use ("how do my neighbors look,
    ignoring me"). Trino supports frame exclusion natively; Spark has
    no EXCLUDE clause, so this emulates it exactly: aggregate over the
    full ROWS frame, then subtract the current row's contribution
    (sum − value, count − 1) — algebraically identical for any
    group-invertible aggregate, and the DuckDB oracle runs the NATIVE
    EXCLUDE CURRENT ROW syntax, cross-validating the emulation against
    a real implementation rather than a re-emulation. Decimal sums
    keep the subtraction exact (float sum−value would reorder
    roundings). NULL safety (ADVICE r09 #4): a NULL current value
    contributes nothing to SUM, so the subtraction must subtract
    COALESCE(value, 0) — `sum − NULL` would wrongly NULL the whole
    neighborhood where native EXCLUDE returns the neighbors' sum;
    COUNT(*) − 1 is already NULL-safe (COUNT(*) counts the row either
    way). Unique (ts, event_id) ordering makes the ROWS frame
    deterministic. Documented beside the GROUPS emulation in
    DEVIATIONS.md."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 2)
    )
    dec = F.col("value").cast("decimal(18,2)")
    dec0 = F.coalesce(dec, F.lit(0).cast("decimal(18,2)"))
    # non-null NEIGHBOR count: when it is 0, native EXCLUDE's SUM over
    # an all-NULL (or empty) remainder is NULL — guard the subtraction
    # so `value − value = 0` can't masquerade as a real neighbor sum
    nn = F.count(dec).over(w) - F.when(dec.isNotNull(), 1).otherwise(0)
    return (
        t.events.filter(F.col("user_id") < 20)
        .select(
            "user_id",
            "event_id",
            F.when(nn > 0, (F.sum(dec).over(w) - dec0))
            .cast("double")
            .alias("neighbor_sum"),
            (F.count(F.lit(1)).over(w) - 1).cast("bigint").alias("neighbor_n"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "win_exclude_group",
    oracle="""
SELECT user_id, event_id, CAST(day AS BIGINT) AS day,
       CAST(SUM(dec) OVER w AS DOUBLE) AS other_days_sum,
       CAST(COUNT(*) OVER w AS BIGINT) AS other_days_n
FROM (
  SELECT user_id, event_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
         CAST(value AS DECIMAL(18,2)) AS dec
  FROM events WHERE user_id < 20
)
WINDOW w AS (PARTITION BY user_id ORDER BY day
             RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
             EXCLUDE GROUP)
ORDER BY user_id, event_id
""",
    category="window",
)
def win_exclude_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2016 frame exclusion, `EXCLUDE GROUP` (r10, VERDICT r09
    #5): drop the current row AND its ORDER BY peers from the frame —
    "my ±2-day neighborhood, ignoring everything that happened on MY
    day". Spark has no EXCLUDE clause; on a RANGE frame the peer group
    is itself a window frame (RANGE BETWEEN CURRENT ROW AND CURRENT
    ROW), so EXCLUDE GROUP is frame_agg − peer_agg — two window
    aggregates over the same sort, one shuffle, both group-invertible.
    RANGE (not ROWS) makes this exact: a RANGE frame always contains
    the entire peer group, so the subtraction can never remove rows
    the frame didn't include. The DuckDB oracle runs the NATIVE
    EXCLUDE GROUP syntax. NULL-safe like win_exclude_current: when no
    non-null values remain after exclusion, native EXCLUDE returns
    NULL — the emulation guards on the excluded non-null count."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    base = t.events.filter(F.col("user_id") < 20).select(
        "user_id",
        "event_id",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("day"),
        F.col("value").cast("decimal(18,2)").alias("dec"),
    )
    wf = Window.partitionBy("user_id").orderBy("day").rangeBetween(-2, 2)
    wp = Window.partitionBy("user_id").orderBy("day").rangeBetween(0, 0)
    nn = F.count("dec").over(wf) - F.count("dec").over(wp)
    # the peer-group sum must coalesce to 0: an all-NULL peer group
    # sums to NULL and would poison the subtraction even when non-null
    # neighbors remain (caught by tests/test_exclude_props.py)
    psum = F.coalesce(F.sum("dec").over(wp), F.lit(0).cast("decimal(18,2)"))
    return (
        base.select(
            "user_id",
            "event_id",
            "day",
            F.when(nn > 0, F.sum("dec").over(wf) - psum)
            .cast("double")
            .alias("other_days_sum"),
            (F.count(F.lit(1)).over(wf) - F.count(F.lit(1)).over(wp))
            .cast("bigint")
            .alias("other_days_n"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "win_exclude_ties",
    oracle="""
SELECT user_id, event_id, CAST(day AS BIGINT) AS day,
       CAST(SUM(dec) OVER w AS DOUBLE) AS no_ties_sum,
       CAST(COUNT(*) OVER w AS BIGINT) AS no_ties_n
FROM (
  SELECT user_id, event_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
         CAST(value AS DECIMAL(18,2)) AS dec
  FROM events WHERE user_id < 20
)
WINDOW w AS (PARTITION BY user_id ORDER BY day
             RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
             EXCLUDE TIES)
ORDER BY user_id, event_id
""",
    category="window",
)
def win_exclude_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2016 frame exclusion, `EXCLUDE TIES` (r10, VERDICT r09 #5):
    drop the current row's ORDER BY peers but KEEP the current row —
    "my neighborhood plus me, but not the other events of my day".
    Emulated as frame_agg − peer_agg + current (the EXCLUDE GROUP
    subtraction, then the current row added back); COUNT adds back a
    constant 1, SUM adds back COALESCE(value, 0) with the same
    no-non-null-remainder NULL guard the other exclusions use. Oracle
    is DuckDB's NATIVE EXCLUDE TIES."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    base = t.events.filter(F.col("user_id") < 20).select(
        "user_id",
        "event_id",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("day"),
        F.col("value").cast("decimal(18,2)").alias("dec"),
    )
    wf = Window.partitionBy("user_id").orderBy("day").rangeBetween(-2, 2)
    wp = Window.partitionBy("user_id").orderBy("day").rangeBetween(0, 0)
    dec0 = F.coalesce(F.col("dec"), F.lit(0).cast("decimal(18,2)"))
    nn = (
        F.count("dec").over(wf)
        - F.count("dec").over(wp)
        + F.when(F.col("dec").isNotNull(), 1).otherwise(0)
    )
    # same all-NULL-peer-group coalesce as win_exclude_group
    psum = F.coalesce(F.sum("dec").over(wp), F.lit(0).cast("decimal(18,2)"))
    return (
        base.select(
            "user_id",
            "event_id",
            "day",
            F.when(nn > 0, F.sum("dec").over(wf) - psum + dec0)
            .cast("double")
            .alias("no_ties_sum"),
            (F.count(F.lit(1)).over(wf) - F.count(F.lit(1)).over(wp) + 1)
            .cast("bigint")
            .alias("no_ties_n"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "win_pattern_vshape",
    oracle="""
WITH daily AS (
  SELECT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE user_id < 30 GROUP BY 1, 2
), seq AS (
  SELECT user_id, day, n,
         LAG(day) OVER w AS prev_day, LAG(n) OVER w AS prev_n,
         ROW_NUMBER() OVER w AS pos
  FROM daily
  WINDOW w AS (PARTITION BY user_id ORDER BY day)
), dirs AS (
  SELECT *, CASE WHEN prev_n IS NULL THEN 0
                 WHEN n < prev_n THEN -1 WHEN n > prev_n THEN 1
                 ELSE 0 END AS dir
  FROM seq
), runs AS (
  SELECT *, pos - ROW_NUMBER() OVER (PARTITION BY user_id, dir ORDER BY pos) AS grp
  FROM dirs WHERE dir <> 0
), isl AS (
  SELECT user_id, dir,
         MIN(prev_day) AS first_prev_day,
         CAST(arg_min(prev_n, pos) AS BIGINT) AS anchor_n,
         MAX(day) AS last_day,
         CAST(arg_max(n, pos) AS BIGINT) AS last_n
  FROM runs GROUP BY user_id, dir, grp
)
SELECT d.user_id,
       CAST(d.first_prev_day AS BIGINT) AS anchor_day, d.anchor_n,
       CAST(d.last_day AS BIGINT) AS bottom_day, d.last_n AS bottom_n,
       CAST(u.last_day AS BIGINT) AS end_day, u.last_n AS end_n,
       d.anchor_n - d.last_n AS depth, u.last_n - d.last_n AS rebound
FROM isl d JOIN isl u
  ON d.user_id = u.user_id AND d.dir = -1 AND u.dir = 1
 AND u.first_prev_day = d.last_day
ORDER BY d.user_id, anchor_day
""",
    category="window",
)
def win_pattern_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row pattern matching (r09) — Trino ships SQL:2016
    MATCH_RECOGNIZE; Spark has no equivalent, so the canonical V-shape
    pattern (``PATTERN (STRT DOWN+ UP+)`` over per-user daily counts,
    one row per match, ``AFTER MATCH SKIP TO LAST UP`` semantics — a
    match's last row may anchor the next descent) is emulated with the
    relational pieces pattern matching compiles to anyway: a direction
    column (sign of the day-over-day delta; plateaus break runs, the
    strict </> of DOWN/UP), run-length islands via the two-row_number
    trick, and an adjacency join pairing each maximal descent with the
    ascent that starts exactly where it bottomed
    (up.first_prev_day = down.last_day). Emits anchor/bottom/end days
    and counts, depth, and rebound — all integer order statistics,
    bit-equal cross-engine.

    r10: the hand build is re-expressed on the general pattern
    compiler (``operators/pattern.py``, VERDICT r09 #4) — same oracle,
    same hash, proving the compiler reproduces the r09 semantics
    exactly for ``PATTERN (STRT DOWN+ UP+)``.

    Scale shape: the daily pre-agg collapses events to |users|×|days|
    rows; every window and the island groupBy key on user_id, so the
    whole match pipeline is one user-partitioned shuffle; the
    adjacency join is equi on (user_id, day). Documented beside the
    GROUPS / EXCLUDE emulations in DEVIATIONS.md."""
    from walden_spark.operators.pattern import DOWN, UP, Step, match_pattern

    m = match_pattern(
        _daily_counts(spark, sf_dir, max_user=30),
        "user_id",
        "day",
        "n",
        [Step("down", DOWN), Step("up", UP)],
    )
    return (
        m.select(
            "user_id",
            F.col("anchor_day").cast("bigint").alias("anchor_day"),
            F.col("anchor_val").cast("bigint").alias("anchor_n"),
            F.col("down_end").cast("bigint").alias("bottom_day"),
            F.col("down_val").cast("bigint").alias("bottom_n"),
            F.col("up_end").cast("bigint").alias("end_day"),
            F.col("up_val").cast("bigint").alias("end_n"),
            (F.col("anchor_val") - F.col("down_val"))
            .cast("bigint")
            .alias("depth"),
            (F.col("up_val") - F.col("down_val")).cast("bigint").alias("rebound"),
        )
        .orderBy("user_id", "anchor_day")
    )


def _daily_counts(spark: SparkSession, sf_dir: str, max_user: int) -> DataFrame:
    """Per-user daily event counts — the shared input of the row
    pattern queries (a MATCH_RECOGNIZE input relation)."""
    t = Tables(spark, sf_dir)
    return (
        t.events.filter(F.col("user_id") < max_user)
        .groupBy(
            "user_id",
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            .cast("bigint")
            .alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


# shared oracle CTE prologue: daily counts → transition classes →
# maximal same-class islands, mirroring operators/pattern.py (DuckDB
# gotcha: window fns aren't allowed inside WINDOW definitions — grp
# needs its own CTE). Parameterized only by the user filter.
_ISLANDS_CTE = """
WITH daily AS (
  SELECT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE user_id < {max_user} GROUP BY 1, 2
), seq AS (
  SELECT user_id, day, n,
         LAG(day) OVER w AS prev_day, LAG(n) OVER w AS prev_n,
         ROW_NUMBER() OVER w AS pos
  FROM daily
  WINDOW w AS (PARTITION BY user_id ORDER BY day)
), dirs AS (
  SELECT *, CASE WHEN n < prev_n THEN -1 WHEN n > prev_n THEN 1
                 ELSE 0 END AS dir
  FROM seq WHERE prev_n IS NOT NULL
), runs AS (
  SELECT *, pos - ROW_NUMBER() OVER (PARTITION BY user_id, dir ORDER BY pos) AS grp
  FROM dirs
), isl AS (
  SELECT user_id, dir,
         MIN(prev_day) AS sp,
         CAST(arg_min(prev_n, pos) AS BIGINT) AS av,
         MAX(day) AS ed,
         CAST(arg_max(n, pos) AS BIGINT) AS ev,
         CAST(COUNT(*) AS BIGINT) AS ln
  FROM runs GROUP BY user_id, dir, grp
)
"""


@query(
    "win_pattern_wshape",
    oracle=_ISLANDS_CTE.format(max_user=30)
    + """
SELECT d1.user_id,
       CAST(d1.sp AS BIGINT) AS anchor_day, d1.av AS anchor_n,
       CAST(d1.ed AS BIGINT) AS dip1_day, d1.ev AS dip1_n,
       CAST(u1.ed AS BIGINT) AS peak_day, u1.ev AS peak_n,
       CAST(d2.ed AS BIGINT) AS dip2_day, d2.ev AS dip2_n,
       CAST(u2.ed AS BIGINT) AS end_day, u2.ev AS end_n
FROM isl d1
JOIN isl u1 ON u1.user_id = d1.user_id AND d1.dir = -1 AND u1.dir = 1
           AND u1.sp = d1.ed
JOIN isl d2 ON d2.user_id = d1.user_id AND d2.dir = -1 AND d2.sp = u1.ed
JOIN isl u2 ON u2.user_id = d1.user_id AND u2.dir = 1 AND u2.sp = d2.ed
ORDER BY d1.user_id, anchor_day
""",
    category="window",
)
def win_pattern_wshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row pattern matching, W-shape double-dip (r10, VERDICT r09 #4):
    ``PATTERN (STRT DOWN+ UP+ DOWN+ UP+)`` — two descents separated by
    a partial recovery, the classic double-bottom. Compiled by
    ``operators/pattern.py`` into islands + a 3-fold adjacency chain
    join; the DuckDB oracle builds the same islands and chains them in
    SQL, so the compiler's k-step generalization is hash-verified, not
    just the r09 two-step case. All outputs are integer order
    statistics — bit-equal cross-engine."""
    from walden_spark.operators.pattern import DOWN, UP, Step, match_pattern

    m = match_pattern(
        _daily_counts(spark, sf_dir, max_user=30),
        "user_id",
        "day",
        "n",
        [
            Step("dip1", DOWN),
            Step("rise1", UP),
            Step("dip2", DOWN),
            Step("rise2", UP),
        ],
    )
    return (
        m.select(
            "user_id",
            F.col("anchor_day").cast("bigint").alias("anchor_day"),
            F.col("anchor_val").cast("bigint").alias("anchor_n"),
            F.col("dip1_end").cast("bigint").alias("dip1_day"),
            F.col("dip1_val").cast("bigint").alias("dip1_n"),
            F.col("rise1_end").cast("bigint").alias("peak_day"),
            F.col("rise1_val").cast("bigint").alias("peak_n"),
            F.col("dip2_end").cast("bigint").alias("dip2_day"),
            F.col("dip2_val").cast("bigint").alias("dip2_n"),
            F.col("rise2_end").cast("bigint").alias("end_day"),
            F.col("rise2_val").cast("bigint").alias("end_n"),
        )
        .orderBy("user_id", "anchor_day")
    )


@query(
    "win_pattern_breakout",
    oracle=_ISLANDS_CTE.format(max_user=100)
    + """
SELECT user_id, CAST(sp AS BIGINT) AS start_day, av AS start_n,
       CAST(ed AS BIGINT) AS end_day, ev AS end_n, ln AS n_rises
FROM isl
WHERE dir = 1 AND ln >= 2 AND ev >= 2 * av
ORDER BY user_id, start_day
""",
    category="window",
)
def win_pattern_breakout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row pattern matching, rising-streak breakout (r10, VERDICT r09
    #4): ``PATTERN (STRT UP{2,})`` with a MEASURES-style predicate —
    a maximal strictly-rising run of ≥2 day-over-day climbs whose end
    count at least DOUBLES the anchor. Exercises the compiler's
    min_len quantifier bound and single-step (no-join) path; the
    ratio predicate is exact integer arithmetic (ev ≥ 2·av)."""
    from walden_spark.operators.pattern import UP, classify_islands

    isl = classify_islands(
        _daily_counts(spark, sf_dir, max_user=100), "user_id", "day", "n"
    )
    return (
        isl.filter(
            (F.col("dir") == UP)
            & (F.col("len") >= 2)
            & (F.col("end_val") >= 2 * F.col("anchor_val"))
        )
        .select(
            "user_id",
            F.col("start_prev").cast("bigint").alias("start_day"),
            F.col("anchor_val").cast("bigint").alias("start_n"),
            F.col("end").cast("bigint").alias("end_day"),
            F.col("end_val").cast("bigint").alias("end_n"),
            F.col("len").alias("n_rises"),
        )
        .orderBy("user_id", "start_day")
    )


@query(
    "win_pattern_plateau_surge",
    oracle=_ISLANDS_CTE.format(max_user=100)
    + """
SELECT p.user_id,
       CAST(p.sp AS BIGINT) AS plateau_start, p.ev AS plateau_n,
       p.ln AS plateau_len,
       CAST(s.ed AS BIGINT) AS surge_end, s.ev AS surge_n
FROM isl p
JOIN isl s ON s.user_id = p.user_id AND p.dir = 0 AND s.dir = 1
          AND p.ln >= 2 AND s.sp = p.ed
ORDER BY p.user_id, plateau_start
""",
    category="window",
)
def win_pattern_plateau_surge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row pattern matching, plateau-then-surge (r10, VERDICT r09 #4):
    ``PATTERN (STRT FLAT{2,} UP+)`` — activity holds exactly level for
    ≥2 transitions, then climbs. Exercises the compiler's third
    transition class (FLAT: delta = 0), which the r09 V-shape build
    discarded — proving the island machinery handles the full
    UP/DOWN/FLAT partition of transitions, not just the sign pair."""
    from walden_spark.operators.pattern import FLAT, UP, Step, match_pattern

    m = match_pattern(
        _daily_counts(spark, sf_dir, max_user=100),
        "user_id",
        "day",
        "n",
        [Step("plateau", FLAT, min_len=2), Step("surge", UP)],
    )
    return (
        m.select(
            "user_id",
            F.col("anchor_day").cast("bigint").alias("plateau_start"),
            F.col("plateau_val").cast("bigint").alias("plateau_n"),
            F.col("plateau_len").alias("plateau_len"),
            F.col("surge_end").cast("bigint").alias("surge_end"),
            F.col("surge_val").cast("bigint").alias("surge_n"),
        )
        .orderBy("user_id", "plateau_start")
    )


@query(
    "win_pattern_alternation",
    oracle=_ISLANDS_CTE.format(max_user=30)
    + """
SELECT 'v' AS pattern, d.user_id,
       CAST(d.sp AS BIGINT) AS anchor_day, d.av AS anchor_n,
       CAST(d.ed AS BIGINT) AS step0_end, d.ev AS step0_val, d.ln AS step0_len,
       CAST(u.ed AS BIGINT) AS step1_end, u.ev AS step1_val, u.ln AS step1_len
FROM isl d
JOIN isl u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
          AND u.sp = d.ed
UNION ALL
SELECT 'surge' AS pattern, p.user_id,
       CAST(p.sp AS BIGINT) AS anchor_day, p.av AS anchor_n,
       CAST(p.ed AS BIGINT) AS step0_end, p.ev AS step0_val, p.ln AS step0_len,
       CAST(s.ed AS BIGINT) AS step1_end, s.ev AS step1_val, s.ln AS step1_len
FROM isl p
JOIN isl s ON s.user_id = p.user_id AND p.dir = 0 AND s.dir = 1
          AND p.ln >= 2 AND s.sp = p.ed
ORDER BY pattern, user_id, anchor_day
""",
    category="window",
)
def win_pattern_alternation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern ALTERNATION (r10): ``PATTERN ((STRT DOWN+ UP+) |
    (STRT FLAT{2,} UP+))`` — the V-shape and the plateau-surge matched
    in ONE call via :func:`match_any`, each row labeled with its
    branch. Both branches compile over the SAME islands classification
    (the input is classified once) and union with positionally-
    normalized step columns. Oracle: the same islands CTE with the two
    chain joins UNION ALLed — the alternation surface is hash-checked,
    not just unit-tested."""
    from walden_spark.operators.pattern import DOWN, FLAT, UP, Step, match_any

    out = match_any(
        _daily_counts(spark, sf_dir, max_user=30),
        "user_id",
        "day",
        "n",
        {
            "v": [Step("d", DOWN), Step("u", UP)],
            "surge": [Step("p", FLAT, min_len=2), Step("s", UP)],
        },
    )
    return (
        out.select(
            "pattern",
            "user_id",
            F.col("anchor_day").cast("bigint").alias("anchor_day"),
            F.col("anchor_val").cast("bigint").alias("anchor_n"),
            F.col("step0_end").cast("bigint").alias("step0_end"),
            F.col("step0_val").cast("bigint").alias("step0_val"),
            F.col("step0_len").cast("bigint").alias("step0_len"),
            F.col("step1_end").cast("bigint").alias("step1_end"),
            F.col("step1_val").cast("bigint").alias("step1_val"),
            F.col("step1_len").cast("bigint").alias("step1_len"),
        )
        .orderBy("pattern", "user_id", "anchor_day")
    )


@query(
    "win_pattern_span_sum",
    oracle=_ISLANDS_CTE.format(max_user=30)
    + """
SELECT m.user_id,
       CAST(m.anchor_day AS BIGINT) AS anchor_day,
       CAST(m.end_day AS BIGINT) AS end_day,
       CAST(SUM(dd.n) AS BIGINT) AS span_total,
       CAST(COUNT(*) AS BIGINT) AS span_days,
       CAST(MAX(dd.n) AS BIGINT) AS span_peak
FROM (SELECT d.user_id, d.sp AS anchor_day, u.ed AS end_day
      FROM isl d
      JOIN isl u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
                AND u.sp = d.ed) m
JOIN daily dd ON dd.user_id = m.user_id
             AND dd.day BETWEEN m.anchor_day AND m.end_day
GROUP BY 1, 2, 3
ORDER BY 1, 2
""",
    category="window",
)
def win_pattern_span_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURES over the FULL matched span (r11, VERDICT r10 #4):
    for every V-shape match, aggregates computed across ALL rows of
    the match — total events, day count, and peak count from anchor
    through rebound end, inclusive — via
    :func:`walden_spark.operators.pattern.span_measures`, which joins
    matches back to the input rows on (partition, order BETWEEN anchor
    AND end) through the binned range-join technique (equi on
    (partition, bin), BETWEEN as residual — no nested loop). The
    DuckDB oracle rebuilds the matches with the islands CTE and runs
    the literal BETWEEN join. A boundary row shared by two overlapping
    matches (SKIP TO LAST) counts in both spans — pinned by the oracle
    hash. All outputs are integer order statistics/sums — bit-equal
    cross-engine."""
    from walden_spark.operators.pattern import DOWN, UP, Step, span_measures

    m = span_measures(
        _daily_counts(spark, sf_dir, max_user=30),
        "user_id",
        "day",
        "n",
        [Step("down", DOWN), Step("up", UP)],
        {
            "span_total": F.sum("n").cast("bigint"),
            "span_days": F.count(F.lit(1)).cast("bigint"),
            "span_peak": F.max("n").cast("bigint"),
        },
        bin_width=16,
    )
    return (
        m.select(
            "user_id",
            F.col("anchor_day").cast("bigint").alias("anchor_day"),
            F.col("up_end").cast("bigint").alias("end_day"),
            "span_total",
            "span_days",
            "span_peak",
        )
        .orderBy("user_id", "anchor_day")
    )


@query(
    "win_pattern_all_rows",
    oracle=_ISLANDS_CTE.format(max_user=40)
    + """
, m AS (
  SELECT d.user_id, d.sp AS anchor_day, d.ed AS bottom_day, u.ed AS end_day
  FROM isl d
  JOIN isl u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
            AND u.sp = d.ed
), mn AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY anchor_day)
                 AS BIGINT) AS match_no
  FROM m
)
SELECT mn.user_id, mn.match_no,
       CAST(mn.anchor_day AS BIGINT) AS anchor_day,
       CAST(dd.day AS BIGINT) AS day, dd.n,
       CASE WHEN dd.day = mn.anchor_day THEN 'STRT'
            WHEN dd.day <= mn.bottom_day THEN 'down'
            ELSE 'up' END AS cls
FROM mn JOIN daily dd
  ON dd.user_id = mn.user_id AND dd.day BETWEEN mn.anchor_day AND mn.end_day
ORDER BY mn.user_id, anchor_day, day
""",
    category="window",
)
def win_pattern_all_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ALL ROWS PER MATCH`` at the SQL surface (r11): every covered
    input row of every V-shape match is emitted with MATCH_NUMBER()
    (per-partition match rank by anchor), CLASSIFIER() ('STRT' on the
    anchor row, else the covering step's name), and the STRT.day anchor
    measure — compiled through
    :func:`walden_spark.operators.pattern.expand_all_rows`: matches
    join back to rows on (partition, order BETWEEN anchor AND end) via
    the binned equi join, and the classifier is a CASE over the match's
    per-step end boundaries. A boundary row shared by two overlapping
    SKIP TO LAST matches appears once per match, per SQL:2016 — pinned
    by the oracle hash (the DuckDB side rebuilds matches with the
    islands CTE and runs the literal BETWEEN join + CASE). Distinct
    slice (user_id < 40) from the other pattern queries."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=40).createOrReplaceTempView(
        "walden_mr_daily_ar"
    )
    return ws.sql(
        """
SELECT user_id, match_no, anchor_day, day, n, cls
FROM walden_mr_daily_ar MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES MATCH_NUMBER() AS match_no, CLASSIFIER() AS cls,
           STRT.day AS anchor_day
  ALL ROWS PER MATCH
  AFTER MATCH SKIP TO LAST up
  PATTERN (STRT down+ up+)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n)
)
ORDER BY user_id, anchor_day, day
"""
    )


@query(
    "win_pattern_all_rows_final",
    oracle=_ISLANDS_CTE.format(max_user=35)
    + """
, m AS (
  SELECT d.user_id, d.sp AS anchor_day, d.ed AS bottom_day,
         u.ed AS end_day, d.ln AS n_down
  FROM isl d
  JOIN isl u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
            AND u.sp = d.ed
), mn AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY anchor_day)
                 AS BIGINT) AS match_no
  FROM m
)
SELECT mn.user_id, mn.match_no,
       CAST(mn.anchor_day AS BIGINT) AS anchor_day,
       CAST(mn.end_day AS BIGINT) AS end_day, mn.n_down,
       CAST(dd.day AS BIGINT) AS day, dd.n,
       CASE WHEN dd.day = mn.anchor_day THEN 'STRT'
            WHEN dd.day <= mn.bottom_day THEN 'down'
            ELSE 'up' END AS cls
FROM mn JOIN daily dd
  ON dd.user_id = mn.user_id AND dd.day BETWEEN mn.anchor_day AND mn.end_day
ORDER BY mn.user_id, anchor_day, day
""",
    category="window",
)
def win_pattern_all_rows_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FINAL per-step measures under ALL ROWS PER MATCH plus a
    reluctant non-final quantifier (late r11): ``FINAL LAST(up.day)``
    and ``FINAL COUNT(down.*)`` are match-level constants repeated on
    every covered row (the per-step columns ``expand_all_rows`` carries
    through the span join); the pattern spells the descent ``down+?``
    — within this compiler's class a non-final reluctant quantifier is
    provably equivalent to greedy (the next step's distinct transition
    class cannot match mid-run), so the oracle is the same islands
    join-back as the greedy form. Bare (RUNNING) LAST/COUNT stays out
    of class. Fresh slice: user_id < 35."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=35).createOrReplaceTempView(
        "walden_mr_daily_arf"
    )
    return ws.sql(
        """
SELECT user_id, match_no, anchor_day, end_day, n_down, day, n, cls
FROM walden_mr_daily_arf MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES MATCH_NUMBER() AS match_no, CLASSIFIER() AS cls,
           STRT.day AS anchor_day, FINAL LAST(up.day) AS end_day,
           FINAL COUNT(down.*) AS n_down
  ALL ROWS PER MATCH
  AFTER MATCH SKIP TO LAST up
  PATTERN (STRT down+? up+)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n)
)
ORDER BY user_id, anchor_day, day
"""
    )


@query(
    "win_pattern_all_rows_running",
    oracle=_ISLANDS_CTE.format(max_user=55)
    + """
, m AS (
  SELECT d.user_id, d.sp AS anchor_day, d.ed AS bottom_day, u.ed AS end_day
  FROM isl d
  JOIN isl u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
            AND u.sp = d.ed
), mn AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY anchor_day)
                 AS BIGINT) AS match_no
  FROM m
), x AS (
  SELECT mn.user_id, mn.match_no, dd.day, dd.n,
         CASE WHEN dd.day = mn.anchor_day THEN 'STRT'
              WHEN dd.day <= mn.bottom_day THEN 'down'
              ELSE 'up' END AS cls
  FROM mn JOIN daily dd
    ON dd.user_id = mn.user_id AND dd.day BETWEEN mn.anchor_day AND mn.end_day
)
SELECT user_id, match_no, CAST(day AS BIGINT) AS day, cls,
       CAST(COUNT(CASE WHEN cls = 'down' THEN 1 END)
              OVER w AS BIGINT) AS r_nd,
       LAST_VALUE(CASE WHEN cls = 'down' THEN n END IGNORE NULLS)
              OVER w AS r_lastdn
FROM x
WINDOW w AS (PARTITION BY user_id, match_no ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY user_id, match_no, day
""",
    category="window",
)
def win_pattern_all_rows_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNNING per-step measures under ALL ROWS PER MATCH (late r11 —
    closes the last measure-semantics row): bare ``COUNT(down.*)`` /
    ``LAST(down.n)`` are per-row prefix aggregates over the match, per
    SQL:2016 — compiled to a window over (partition, MATCH_NUMBER)
    ordered by the row order, filtered to CLASSIFIER()-mapped rows;
    the anchor row (STRT) reads 0 / NULL. The DuckDB oracle runs the
    identical windowed CASE + LAST_VALUE IGNORE NULLS over the islands
    join-back. Fresh slice: user_id < 55."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=55).createOrReplaceTempView(
        "walden_mr_daily_arr"
    )
    return ws.sql(
        """
SELECT user_id, match_no, day, cls, r_nd, r_lastdn
FROM walden_mr_daily_arr MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES MATCH_NUMBER() AS match_no, CLASSIFIER() AS cls,
           COUNT(down.*) AS r_nd, LAST(down.n) AS r_lastdn
  ALL ROWS PER MATCH
  AFTER MATCH SKIP TO LAST up
  PATTERN (STRT down+ up+)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n)
)
ORDER BY user_id, match_no, day
"""
    )


@query(
    "win_pattern_skip_past",
    oracle=_ISLANDS_CTE.format(max_user=50)
    + """
, m AS (
  SELECT d.user_id, d.sp AS anchor_day, d.av AS anchor_n,
         d.ed AS bottom_day, d.ev AS bottom_n,
         u.ed AS end_day, u.ev AS end_n
  FROM isl d
  JOIN isl u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
            AND u.sp = d.ed
), s AS (
  SELECT *, CASE WHEN anchor_day = LAG(end_day)
                   OVER (PARTITION BY user_id ORDER BY anchor_day)
                 THEN 0 ELSE 1 END AS new_chain
  FROM m
), c AS (
  SELECT *, SUM(new_chain)
              OVER (PARTITION BY user_id ORDER BY anchor_day) AS chain_id
  FROM s
), r AS (
  SELECT *, ROW_NUMBER()
              OVER (PARTITION BY user_id, chain_id ORDER BY anchor_day) AS pos
  FROM c
)
SELECT user_id, CAST(anchor_day AS BIGINT) AS anchor_day, anchor_n,
       CAST(bottom_day AS BIGINT) AS bottom_day, bottom_n,
       CAST(end_day AS BIGINT) AS end_day, end_n
FROM r WHERE pos % 2 = 1
ORDER BY user_id, anchor_day
""",
    category="window",
)
def win_pattern_skip_past(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``AFTER MATCH SKIP PAST LAST ROW`` — the SQL-standard default
    skip mode, served since r11 (closes the "SKIP semantics other than
    TO LAST" out-of-class row): matches whose anchor falls inside (or
    on the last row of) the previous kept match are dropped by the
    greedy per-partition selection
    :func:`walden_spark.operators.pattern.select_skip_past`, which runs
    over the MATCHES frame (orders of magnitude smaller than the
    input). The clause is OMITTED in the query text below — exercising
    the default — over a fresh slice (user_id < 50). Oracle: for
    V-shapes a candidate can only anchor on the previous match's final
    row, so greedy selection is exactly "chain matches on
    anchor = lag(end), keep odd chain positions" — plain SQL in DuckDB;
    hash equality pins the general pandas selection against the
    relational form."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=50).createOrReplaceTempView(
        "walden_mr_daily_sp"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, anchor_n, bottom_day, bottom_n, end_day, end_n
FROM walden_mr_daily_sp MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, STRT.n AS anchor_n,
           LAST(down.day) AS bottom_day, LAST(down.n) AS bottom_n,
           LAST(up.day) AS end_day, LAST(up.n) AS end_n
  ONE ROW PER MATCH
  PATTERN (STRT down+ up+)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n)
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_skip_to_first",
    oracle=_ISLANDS_CTE.format(max_user=45)
    + """
SELECT d.user_id,
       CAST(d.sp AS BIGINT) AS anchor_day, d.av AS anchor_n,
       CAST(d.ed AS BIGINT) AS bottom_day,
       CAST(u.ed AS BIGINT) AS end_day, u.ev AS end_n
FROM isl d
JOIN isl u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
          AND u.sp = d.ed
ORDER BY d.user_id, anchor_day
""",
    category="window",
)
def win_pattern_skip_to_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``AFTER MATCH SKIP TO FIRST <step>`` (late r11 — the skip-mode
    surface is now complete except TO NEXT ROW): served by the island
    identity *first row of step j == last row of step j−1*, so TO FIRST
    up resumes on the descent's bottom. On two-step V patterns every
    candidate anchors on or after the previous match's END (> bottom),
    so the inclusive greedy walk keeps every candidate and the oracle
    is the plain adjacency join — the hash pins the full parse →
    resume-mapping → selection path as a no-drop identity on this
    shape, while the W-shape drop semantics (inside-anchored matches
    dropped under TO LAST of the final step, kept under TO LAST of the
    2nd) are pinned by ``test_skip_to_semantics_on_w_shapes``. Fresh
    slice: user_id < 45."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=45).createOrReplaceTempView(
        "walden_mr_daily_stf"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, anchor_n, bottom_day, end_day, end_n
FROM walden_mr_daily_stf MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, STRT.n AS anchor_n,
           LAST(down.day) AS bottom_day,
           LAST(up.day) AS end_day, LAST(up.n) AS end_n
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO FIRST up
  PATTERN (STRT down+ up+)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n)
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_skip_next",
    oracle=_ISLANDS_CTE.format(max_user=33)
    + """
, m AS (
  SELECT d.user_id, d.sp AS a0, d.ed AS bottom_day, d.ev AS bottom_n,
         d.ln AS dlen, u.ed AS end_day, u.ev AS end_n
  FROM isl d
  JOIN isl u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
            AND u.sp = d.ed
), x AS (
  SELECT m.user_id, dd.day AS anchor_day, dd.n AS anchor_n,
         m.bottom_day, m.bottom_n, m.end_day, m.end_n,
         m.dlen - (ROW_NUMBER() OVER (PARTITION BY m.user_id, m.a0
                                      ORDER BY dd.day) - 1) AS n_down
  FROM m JOIN daily dd
    ON dd.user_id = m.user_id
   AND dd.day >= m.a0 AND dd.day < m.bottom_day
)
SELECT user_id, CAST(anchor_day AS BIGINT) AS anchor_day, anchor_n,
       CAST(bottom_day AS BIGINT) AS bottom_day, bottom_n,
       CAST(end_day AS BIGINT) AS end_day, end_n,
       CAST(n_down AS BIGINT) AS n_down
FROM x ORDER BY user_id, anchor_day
""",
    category="window",
)
def win_pattern_skip_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``AFTER MATCH SKIP TO NEXT ROW`` (this session — closes the
    FIRST-named out-of-class skip mode, completing the AFTER MATCH
    surface): the rescan re-anchors one row after each match, so every
    row of a descent with at least one remaining DOWN transition
    anchors its own V — the suffix-anchor expansion
    :func:`walden_spark.operators.pattern.match_skip_next` computes
    relationally (binned span join of matches to their first-island
    rows; NO greedy selection, since every successful anchor is kept
    under this mode — Trino-exact, unlike the maximal-candidate
    selections of the other skip modes). The DuckDB oracle joins each
    maximal V back to its descent rows and emits one match per suffix
    anchor with ``n_down = remaining transitions``. Fresh slice:
    user_id < 33."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=33).createOrReplaceTempView(
        "walden_mr_daily_sn"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, anchor_n, bottom_day, bottom_n, end_day, end_n,
       n_down
FROM walden_mr_daily_sn MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, STRT.n AS anchor_n,
           LAST(down.day) AS bottom_day, LAST(down.n) AS bottom_n,
           LAST(up.day) AS end_day, LAST(up.n) AS end_n,
           COUNT(down.*) AS n_down
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (STRT down+ up+)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n)
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_reluctant_final",
    oracle="""
WITH daily AS (
  SELECT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE user_id < 43 GROUP BY 1, 2
), seq AS (
  SELECT user_id, day, n,
         LAG(day) OVER w AS prev_day, LAG(n) OVER w AS prev_n,
         ROW_NUMBER() OVER w AS pos
  FROM daily
  WINDOW w AS (PARTITION BY user_id ORDER BY day)
), dirs AS (
  SELECT *, CASE WHEN n < prev_n THEN -1 WHEN n > prev_n THEN 1
                 ELSE 0 END AS dir
  FROM seq WHERE prev_n IS NOT NULL
), runs AS (
  SELECT *, pos - ROW_NUMBER() OVER (PARTITION BY user_id, dir ORDER BY pos) AS grp
  FROM dirs
), isl AS (
  SELECT user_id, dir,
         MIN(prev_day) AS sp,
         CAST(arg_min(prev_n, pos) AS BIGINT) AS av,
         MIN(day) AS fd,
         CAST(arg_min(n, pos) AS BIGINT) AS fv,
         MAX(day) AS ed,
         CAST(arg_max(n, pos) AS BIGINT) AS ev
  FROM runs GROUP BY user_id, dir, grp
), m AS (
  SELECT d.user_id, d.sp AS anchor_day, d.av AS anchor_n,
         d.ed AS bottom_day, d.ev AS bottom_n,
         u.fd AS end_day, u.fv AS end_n
  FROM isl d
  JOIN isl u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
            AND u.sp = d.ed
), s AS (
  SELECT *, CASE WHEN anchor_day = LAG(end_day)
                   OVER (PARTITION BY user_id ORDER BY anchor_day)
                 THEN 0 ELSE 1 END AS new_chain
  FROM m
), c AS (
  SELECT *, SUM(new_chain)
              OVER (PARTITION BY user_id ORDER BY anchor_day) AS chain_id
  FROM s
), r AS (
  SELECT *, ROW_NUMBER()
              OVER (PARTITION BY user_id, chain_id ORDER BY anchor_day) AS pos
  FROM c
)
SELECT user_id, CAST(anchor_day AS BIGINT) AS anchor_day, anchor_n,
       CAST(bottom_day AS BIGINT) AS bottom_day, bottom_n,
       CAST(end_day AS BIGINT) AS end_day, end_n
FROM r WHERE pos % 2 = 1
ORDER BY user_id, anchor_day
""",
    category="window",
)
def win_pattern_reluctant_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reluctant quantifier on the FINAL step (this session — closes
    the "reluctant final step" out-of-class row): ``up+?`` stops after
    ONE ascent transition, so each match ends on the first rebound row
    rather than the recovery's peak —
    :func:`walden_spark.operators.pattern.match_reluctant_final`
    re-points the match end at the row ``min_len`` transitions into the
    final island (binned span join; the first/final steps' classes must
    differ, keeping the compiled anchors rescan-complete). The omitted
    AFTER MATCH defaults to SKIP PAST LAST ROW over the TRUNCATED ends,
    so chained V's whose rebound is a single transition drop the
    boundary-anchored follower — the DuckDB oracle reproduces exactly
    that with the chain trick on the islands' FIRST-row fields. Fresh
    slice: user_id < 43."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=43).createOrReplaceTempView(
        "walden_mr_daily_rf"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, anchor_n, bottom_day, bottom_n, end_day, end_n
FROM walden_mr_daily_rf MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, STRT.n AS anchor_n,
           LAST(down.day) AS bottom_day, LAST(down.n) AS bottom_n,
           LAST(up.day) AS end_day, LAST(up.n) AS end_n
  ONE ROW PER MATCH
  PATTERN (STRT down+ up+?)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n)
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_sql_inline_group",
    oracle=_ISLANDS_CTE.format(max_user=27).replace(
        "\nWITH daily", "\nWITH RECURSIVE daily", 1
    )
    + """
, cand AS (
  SELECT d0.user_id, d0.sp AS anchor_day, d0.av AS anchor_n,
         u1.ln + u2.ln AS n_up,
         CAST(d2.ed AS BIGINT) AS last_dip_day,
         CAST(u3.ed AS BIGINT) AS end_day, u3.ev AS end_n
  FROM isl d0
  JOIN isl u1 ON u1.user_id = d0.user_id AND d0.dir = -1 AND u1.dir = 1
             AND u1.sp = d0.ed
  JOIN isl d1 ON d1.user_id = d0.user_id AND d1.dir = -1 AND d1.sp = u1.ed
  JOIN isl u2 ON u2.user_id = d0.user_id AND u2.dir = 1 AND u2.sp = d1.ed
  JOIN isl d2 ON d2.user_id = d0.user_id AND d2.dir = -1 AND d2.sp = u2.ed
  JOIN isl u3 ON u3.user_id = d0.user_id AND u3.dir = 1 AND u3.sp = d2.ed
), walk AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM cand c2 WHERE c2.user_id = c.user_id
      AND c2.anchor_day < c.anchor_day)
  UNION ALL
  SELECT n.* FROM walk w
  JOIN cand n ON n.user_id = w.user_id AND n.anchor_day > w.end_day
  WHERE NOT EXISTS (
    SELECT 1 FROM cand m WHERE m.user_id = w.user_id
      AND m.anchor_day > w.end_day
      AND m.anchor_day < n.anchor_day)
)
SELECT user_id, CAST(anchor_day AS BIGINT) AS anchor_day, anchor_n,
       CAST(n_up AS BIGINT) AS n_up, last_dip_day, end_day, end_n
FROM walk
ORDER BY user_id, anchor_day
""",
    category="window",
)
def win_pattern_sql_inline_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mid-pattern group with an exact repetition count (this session —
    closes the embedded-group row for ``{m}``): ``PATTERN (STRT down+
    (up+ dip+){2} up2+)`` — a descent, exactly two rise-then-dip
    oscillations, a final rise. The parser inlines the group's clones
    (``up__2``/``dip__2`` share the base DEFINEs); the measure layer
    resolves ``LAST(dip.day)`` to the FINAL clone and ``COUNT(up.*)``
    to the clone sum, per SQL:2016 mapped-row semantics. Default skip-past selection; the 6-step spans exercise
    inside-anchored drops, so the oracle runs the RECURSIVE greedy-walk
    CTE over the single 6-way adjacency chain. Fresh slice:
    user_id < 27."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=27).createOrReplaceTempView(
        "walden_mr_daily_ig"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, anchor_n, n_up, last_dip_day, end_day, end_n
FROM walden_mr_daily_ig MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, STRT.n AS anchor_n,
           COUNT(up.*) AS n_up, LAST(dip.day) AS last_dip_day,
           LAST(up2.day) AS end_day, LAST(up2.n) AS end_n
  ONE ROW PER MATCH
  PATTERN (STRT down+ (up+ dip+){2} up2+)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n),
         dip AS dip.n < PREV(dip.n), up2 AS up2.n > PREV(up2.n)
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_sql_inline_group_ranged",
    oracle=_ISLANDS_CTE.format(max_user=25).replace(
        "\nWITH daily", "\nWITH RECURSIVE daily", 1
    )
    + """
, cand2 AS (
  SELECT d0.user_id, d0.sp AS anchor_day, d0.av AS anchor_n,
         u1.ln + u2.ln AS n_up,
         CAST(d2.ed AS BIGINT) AS last_dip_day,
         CAST(u3.ed AS BIGINT) AS end_day, u3.ev AS end_n
  FROM isl d0
  JOIN isl u1 ON u1.user_id = d0.user_id AND d0.dir = -1 AND u1.dir = 1
             AND u1.sp = d0.ed
  JOIN isl d1 ON d1.user_id = d0.user_id AND d1.dir = -1 AND d1.sp = u1.ed
  JOIN isl u2 ON u2.user_id = d0.user_id AND u2.dir = 1 AND u2.sp = d1.ed
  JOIN isl d2 ON d2.user_id = d0.user_id AND d2.dir = -1 AND d2.sp = u2.ed
  JOIN isl u3 ON u3.user_id = d0.user_id AND u3.dir = 1 AND u3.sp = d2.ed
), cand1 AS (
  SELECT d0.user_id, d0.sp AS anchor_day, d0.av AS anchor_n,
         u1.ln AS n_up,
         CAST(d1.ed AS BIGINT) AS last_dip_day,
         CAST(u2.ed AS BIGINT) AS end_day, u2.ev AS end_n
  FROM isl d0
  JOIN isl u1 ON u1.user_id = d0.user_id AND d0.dir = -1 AND u1.dir = 1
             AND u1.sp = d0.ed
  JOIN isl d1 ON d1.user_id = d0.user_id AND d1.dir = -1 AND d1.sp = u1.ed
  JOIN isl u2 ON u2.user_id = d0.user_id AND u2.dir = 1 AND u2.sp = d1.ed
), cand AS (
  SELECT * FROM cand2
  UNION ALL
  SELECT c1.* FROM cand1 c1
  WHERE NOT EXISTS (
    SELECT 1 FROM cand2 c2 WHERE c2.user_id = c1.user_id
      AND c2.anchor_day = c1.anchor_day)
), walk AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM cand c2 WHERE c2.user_id = c.user_id
      AND c2.anchor_day < c.anchor_day)
  UNION ALL
  SELECT n.* FROM walk w
  JOIN cand n ON n.user_id = w.user_id AND n.anchor_day > w.end_day
  WHERE NOT EXISTS (
    SELECT 1 FROM cand m WHERE m.user_id = w.user_id
      AND m.anchor_day > w.end_day
      AND m.anchor_day < n.anchor_day)
)
SELECT user_id, CAST(anchor_day AS BIGINT) AS anchor_day, anchor_n,
       CAST(n_up AS BIGINT) AS n_up, last_dip_day, end_day, end_n
FROM walk
ORDER BY user_id, anchor_day
""",
    category="window",
)
def win_pattern_sql_inline_group_ranged(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mid-pattern group with a RANGED repetition (r12 — closes the
    VERDICT r11 #3 named limit): ``PATTERN (STRT down+ (up+ dip+){1,2}
    up2+)`` — a descent, one OR two rise-then-dip oscillations
    (greedily preferring two), a final rise. The compiler expands the
    range to the alternation of its exact counts, LONGEST first —
    alternation's leftmost-branch preference then IS the SQL:2016
    greedy quantifier preference (the {1} chain is a strict prefix of
    the {2} chain, so both genuinely compete at the same anchor) —
    with per-branch clone maps steering the measures: ``COUNT(up.*)``
    sums that branch's clone runs, ``LAST(dip.day)`` reads the
    branch's final clone. Default skip-past selection; the oracle
    prefers the 6-way chain over the 4-way at a shared anchor, then
    replays the greedy walk (RECURSIVE CTE). Fresh slice:
    user_id < 25."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=25).createOrReplaceTempView(
        "walden_mr_daily_igr"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, anchor_n, n_up, last_dip_day, end_day, end_n
FROM walden_mr_daily_igr MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, STRT.n AS anchor_n,
           COUNT(up.*) AS n_up, LAST(dip.day) AS last_dip_day,
           LAST(up2.day) AS end_day, LAST(up2.n) AS end_n
  ONE ROW PER MATCH
  PATTERN (STRT down+ (up+ dip+){1,2} up2+)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n),
         dip AS dip.n < PREV(dip.n), up2 AS up2.n > PREV(up2.n)
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_sql_inline_group_nested",
    oracle=_ISLANDS_CTE.format(max_user=21)
    .replace("\nWITH daily", "\nWITH RECURSIVE daily", 1)
    .replace("), isl AS (", "), isl AS MATERIALIZED (")
    + """
, cand AS (
  SELECT d0.user_id, d0.sp AS anchor_day, d0.av AS anchor_n,
         u1.ln + u2.ln + u3.ln + u4.ln AS n_up,
         CAST(d4.ed AS BIGINT) AS last_dip_day,
         CAST(u5.ed AS BIGINT) AS end_day, u5.ev AS end_n
  FROM isl d0
  JOIN isl u1 ON u1.user_id = d0.user_id AND d0.dir = -1 AND u1.dir = 1
             AND u1.sp = d0.ed
  JOIN isl d1 ON d1.user_id = d0.user_id AND d1.dir = -1 AND d1.sp = u1.ed
  JOIN isl u2 ON u2.user_id = d0.user_id AND u2.dir = 1 AND u2.sp = d1.ed
  JOIN isl d2 ON d2.user_id = d0.user_id AND d2.dir = -1 AND d2.sp = u2.ed
  JOIN isl u3 ON u3.user_id = d0.user_id AND u3.dir = 1 AND u3.sp = d2.ed
  JOIN isl d3 ON d3.user_id = d0.user_id AND d3.dir = -1 AND d3.sp = u3.ed
  JOIN isl u4 ON u4.user_id = d0.user_id AND u4.dir = 1 AND u4.sp = d3.ed
  JOIN isl d4 ON d4.user_id = d0.user_id AND d4.dir = -1 AND d4.sp = u4.ed
  JOIN isl u5 ON u5.user_id = d0.user_id AND u5.dir = 1 AND u5.sp = d4.ed
), walk AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM cand c2 WHERE c2.user_id = c.user_id
      AND c2.anchor_day < c.anchor_day)
  UNION ALL
  SELECT n.* FROM walk w
  JOIN cand n ON n.user_id = w.user_id AND n.anchor_day > w.end_day
  WHERE NOT EXISTS (
    SELECT 1 FROM cand m WHERE m.user_id = w.user_id
      AND m.anchor_day > w.end_day
      AND m.anchor_day < n.anchor_day)
)
SELECT user_id, CAST(anchor_day AS BIGINT) AS anchor_day, anchor_n,
       CAST(n_up AS BIGINT) AS n_up, last_dip_day, end_day, end_n
FROM walk
ORDER BY user_id, anchor_day
""",
    category="window",
)
def win_pattern_sql_inline_group_nested(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """NESTED inline repeated groups (r12 — closes the 'nested groups'
    named limit for exact/ranged counts): ``PATTERN (STRT down+
    ((up+ dip+){2}){2} up2+)`` — the recursive expander unrolls
    top-level-first into the 4-oscillation chain, with hierarchical
    clone allocation kept FLAT (``up__4``, never ``up__2__2``) and
    measures resolved in PATTERN order (nesting allocates outer-copy
    clones before inner-copy ones, so allocation order ≠ position
    order — the pattern-order rule is what keeps LAST(dip.day) on the
    true final dip). ``COUNT(up.*)`` sums all four rises. Oracle: the
    10-way adjacency chain (islands MATERIALIZED — DuckDB otherwise
    re-derives the CTE per self-join reference) through the greedy
    walk. Fresh slice: user_id < 21."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=21).createOrReplaceTempView(
        "walden_mr_daily_ign"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, anchor_n, n_up, last_dip_day, end_day, end_n
FROM walden_mr_daily_ign MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, STRT.n AS anchor_n,
           COUNT(up.*) AS n_up, LAST(dip.day) AS last_dip_day,
           LAST(up2.day) AS end_day, LAST(up2.n) AS end_n
  ONE ROW PER MATCH
  PATTERN (STRT down+ ((up+ dip+){2}){2} up2+)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n),
         dip AS dip.n < PREV(dip.n), up2 AS up2.n > PREV(up2.n)
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_sql_inline_group_subset",
    oracle=_ISLANDS_CTE.format(max_user=23).replace(
        "\nWITH daily", "\nWITH RECURSIVE daily", 1
    )
    + """
, cand AS (
  SELECT d0.user_id, d0.sp AS anchor_day, d0.av AS anchor_n,
         u1.ln + d1.ln + u2.ln + d2.ln AS n_osc,
         CAST(d2.ed AS BIGINT) AS last_osc_day,
         CAST(u3.ed AS BIGINT) AS end_day, u3.ev AS end_n
  FROM isl d0
  JOIN isl u1 ON u1.user_id = d0.user_id AND d0.dir = -1 AND u1.dir = 1
             AND u1.sp = d0.ed
  JOIN isl d1 ON d1.user_id = d0.user_id AND d1.dir = -1 AND d1.sp = u1.ed
  JOIN isl u2 ON u2.user_id = d0.user_id AND u2.dir = 1 AND u2.sp = d1.ed
  JOIN isl d2 ON d2.user_id = d0.user_id AND d2.dir = -1 AND d2.sp = u2.ed
  JOIN isl u3 ON u3.user_id = d0.user_id AND u3.dir = 1 AND u3.sp = d2.ed
), walk AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM cand c2 WHERE c2.user_id = c.user_id
      AND c2.anchor_day < c.anchor_day)
  UNION ALL
  SELECT n.* FROM walk w
  JOIN cand n ON n.user_id = w.user_id AND n.anchor_day > w.end_day
  WHERE NOT EXISTS (
    SELECT 1 FROM cand m WHERE m.user_id = w.user_id
      AND m.anchor_day > w.end_day
      AND m.anchor_day < n.anchor_day)
)
SELECT user_id, CAST(anchor_day AS BIGINT) AS anchor_day, anchor_n,
       CAST(n_osc AS BIGINT) AS n_osc, last_osc_day, end_day, end_n
FROM walk
ORDER BY user_id, anchor_day
""",
    category="window",
)
def win_pattern_sql_inline_group_subset(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SUBSET over an inline repeated group (r12 — closes the named
    limit the exact-count tier left): ``SUBSET osc = (up, dip)`` with
    ``PATTERN (STRT down+ (up+ dip+){2} up2+)`` — the union's members
    expand through the clone map, so ``COUNT(osc.*)`` sums all FOUR
    clone runs (both rises and both dips) and ``LAST(osc.day)``
    resolves to the final clone latest in pattern order (the second
    dip). Oracle: the 6-way adjacency chain with the member-run sum,
    replayed through the greedy walk. Fresh slice: user_id < 23."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=23).createOrReplaceTempView(
        "walden_mr_daily_igs"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, anchor_n, n_osc, last_osc_day, end_day, end_n
FROM walden_mr_daily_igs MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, STRT.n AS anchor_n,
           COUNT(osc.*) AS n_osc, LAST(osc.day) AS last_osc_day,
           LAST(up2.day) AS end_day, LAST(up2.n) AS end_n
  ONE ROW PER MATCH
  SUBSET osc = (up, dip)
  PATTERN (STRT down+ (up+ dip+){2} up2+)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n),
         dip AS dip.n < PREV(dip.n), up2 AS up2.n > PREV(up2.n)
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_sql_cycles_skip_next",
    oracle=_ISLANDS_CTE.format(max_user=37)
    + """
, isl2 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY sp) AS iseq
  FROM isl
), units AS (
  SELECT d.user_id, d.iseq AS useq, d.sp AS a_day, d.ed AS d_end,
         d.ln AS d_ln, u.ln AS u_ln, u.ed AS u_end, u.ev AS u_ev
  FROM isl2 d
  JOIN isl2 u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
             AND u.iseq = d.iseq + 1
), cruns AS (
  SELECT *, useq - 2 * ROW_NUMBER()
              OVER (PARTITION BY user_id ORDER BY useq) AS grp
  FROM units
), suff AS (
  SELECT user_id, a_day, d_end,
         SUM(d_ln) OVER w AS t_down,
         SUM(u_ln) OVER w AS t_up,
         LAST_VALUE(u_end) OVER w AS e_day,
         LAST_VALUE(u_ev) OVER w AS e_n
  FROM cruns
  WINDOW w AS (PARTITION BY user_id, grp ORDER BY useq
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
), x AS (
  SELECT s.user_id, dd.day AS anchor_day, dd.n AS anchor_n,
         s.t_down - (ROW_NUMBER() OVER (PARTITION BY s.user_id, s.a_day
                                        ORDER BY dd.day) - 1) AS total_down,
         s.t_up, s.e_day, s.e_n
  FROM suff s JOIN daily dd
    ON dd.user_id = s.user_id
   AND dd.day >= s.a_day AND dd.day < s.d_end
)
SELECT user_id, CAST(anchor_day AS BIGINT) AS anchor_day, anchor_n,
       CAST(total_down AS BIGINT) AS total_down,
       CAST(1 + total_down + t_up AS BIGINT) AS span_rows,
       CAST(e_day AS BIGINT) AS end_day, CAST(e_n AS BIGINT) AS end_n
FROM x ORDER BY user_id, anchor_day
""",
    category="window",
)
def win_pattern_sql_cycles_skip_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKIP TO NEXT ROW over a repeated group (this session — the last
    skip-mode composition): under ``PATTERN (STRT (down+ up+)+)`` the
    rescan anchors at every cycle boundary of a maximal oscillation run
    AND at every suffix offset into the anchored cycle's first descent
    — mid-cycle anchors provably fail (an unbordered cycle has no
    self-equal proper rotation), so the unit/run construction
    enumerates the complete candidate set and no greedy selection runs.
    Per-anchor measures are SUFFIX totals (COUNT(down.*) counts from
    the anchor onward) with run-final LAST fields. First step must be
    unbounded above (named limit otherwise). Oracle: the same unit/run
    construction with current-row→end window frames plus the
    descent-row suffix join. Fresh slice: user_id < 37."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=37).createOrReplaceTempView(
        "walden_mr_daily_csn"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, anchor_n, total_down, span_rows, end_day, end_n
FROM walden_mr_daily_csn MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, STRT.n AS anchor_n,
           COUNT(down.*) AS total_down, COUNT(*) AS span_rows,
           LAST(up.day) AS end_day, LAST(up.n) AS end_n
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (STRT (down+ up+)+)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n)
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_skip_next_reluctant",
    oracle="""
WITH daily AS (
  SELECT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE user_id < 53 GROUP BY 1, 2
), seq AS (
  SELECT user_id, day, n,
         LAG(day) OVER w AS prev_day, LAG(n) OVER w AS prev_n,
         ROW_NUMBER() OVER w AS pos
  FROM daily
  WINDOW w AS (PARTITION BY user_id ORDER BY day)
), dirs AS (
  SELECT *, CASE WHEN n < prev_n THEN -1 WHEN n > prev_n THEN 1
                 ELSE 0 END AS dir
  FROM seq WHERE prev_n IS NOT NULL
), runs AS (
  SELECT *, pos - ROW_NUMBER() OVER (PARTITION BY user_id, dir ORDER BY pos) AS grp
  FROM dirs
), isl AS (
  SELECT user_id, dir,
         MIN(prev_day) AS sp,
         MIN(day) AS fd,
         CAST(arg_min(n, pos) AS BIGINT) AS fv,
         MAX(day) AS ed,
         CAST(COUNT(*) AS BIGINT) AS ln
  FROM runs GROUP BY user_id, dir, grp
), m AS (
  SELECT d.user_id, d.sp AS a0, d.ed AS bottom_day, d.ln AS dlen,
         CAST(u.fd AS BIGINT) AS end_day, u.fv AS end_n
  FROM isl d
  JOIN isl u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
            AND u.sp = d.ed
), x AS (
  SELECT m.user_id, dd.day AS anchor_day, dd.n AS anchor_n,
         m.end_day, m.end_n,
         m.dlen - (ROW_NUMBER() OVER (PARTITION BY m.user_id, m.a0
                                      ORDER BY dd.day) - 1) AS n_down
  FROM m JOIN daily dd
    ON dd.user_id = m.user_id
   AND dd.day >= m.a0 AND dd.day < m.bottom_day
)
SELECT user_id, CAST(anchor_day AS BIGINT) AS anchor_day, anchor_n,
       CAST(n_down AS BIGINT) AS n_down, end_day, end_n
FROM x ORDER BY user_id, anchor_day
""",
    category="window",
)
def win_pattern_skip_next_reluctant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKIP TO NEXT ROW × reluctant FINAL step (this session — closes
    the composition row): under ``PATTERN (STRT down+ up+?)`` with the
    rescan skip mode, every descent suffix anchors its own match and
    each truncates at the FIRST rebound row. The two transformations
    touch disjoint islands (truncate the final, then suffix-expand the
    first), so sequencing them reproduces the per-anchor rescan
    exactly; the mode keeps needing NO greedy selection. Oracle: the
    islands' first-row fields give the truncated end, the descent-row
    join gives the suffix anchors — plain relational SQL, no walk.
    Fresh slice: user_id < 53."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=53).createOrReplaceTempView(
        "walden_mr_daily_snr"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, anchor_n, n_down, end_day, end_n
FROM walden_mr_daily_snr MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, STRT.n AS anchor_n,
           COUNT(down.*) AS n_down,
           LAST(up.day) AS end_day, LAST(up.n) AS end_n
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (STRT down+ up+?)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n)
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_sql_cycles_subset",
    oracle=_ISLANDS_CTE.format(max_user=57)
    + """
, isl2 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY sp) AS iseq
  FROM isl
), units AS (
  SELECT d.user_id, d.iseq AS useq, d.sp AS a_day, d.av AS a_n,
         d.ln AS d_ln, u.ln AS u_ln, u.ed AS u_end, u.ev AS u_ev
  FROM isl2 d
  JOIN isl2 u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
             AND u.iseq = d.iseq + 1
), cruns AS (
  SELECT *, useq - 2 * ROW_NUMBER()
              OVER (PARTITION BY user_id ORDER BY useq) AS grp
  FROM units
)
SELECT user_id,
       CAST(MIN(a_day) AS BIGINT) AS anchor_day,
       CAST(SUM(d_ln) + SUM(u_ln) AS BIGINT) AS n_moves,
       CAST(MAX(u_end) AS BIGINT) AS end_day,
       CAST(arg_max(u_ev, useq) AS BIGINT) AS end_n,
       CAST(1 + SUM(d_ln) + SUM(u_ln) AS BIGINT) AS span_rows
FROM cruns GROUP BY user_id, grp
ORDER BY user_id, anchor_day
""",
    category="window",
)
def win_pattern_sql_cycles_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUBSET over a repeated group (this session — closes the last
    SUBSET composition row): over ``PATTERN (STRT (down+ up+)+)`` the
    union variable ``move = (down, up)`` measures the WHOLE oscillation
    run uniformly — ``COUNT(move.*)`` sums both steps' transitions
    across every cycle, ``LAST(move.day)`` / ``LAST(move.n)`` read the
    run's final row (the member latest in cycle order, last cycle) —
    where the plain cycles query had to add per-step totals in the
    outer SELECT. Oracle: the same island-level run grouping with the
    summed aggregates. Fresh slice: user_id < 57."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=57).createOrReplaceTempView(
        "walden_mr_daily_cs"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, n_moves, end_day, end_n, span_rows
FROM walden_mr_daily_cs MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, COUNT(move.*) AS n_moves,
           LAST(move.day) AS end_day, LAST(move.n) AS end_n,
           COUNT(*) AS span_rows
  ONE ROW PER MATCH
  PATTERN (STRT (down+ up+)+)
  SUBSET move = (down, up)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n)
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_sql_alt_skip_next",
    oracle=_ISLANDS_CTE.format(max_user=47)
    + """
, mm AS (
  SELECT d.user_id, d.sp AS a0, d.ln AS dlen, 'up' AS shape,
         d.ed AS bottom_day, CAST(t.ed AS BIGINT) AS end_day, t.ev AS end_n
  FROM isl d
  JOIN isl t ON t.user_id = d.user_id AND d.dir = -1 AND t.dir = 1
            AND t.sp = d.ed
  UNION ALL
  SELECT d.user_id, d.sp, d.ln, 'flat', d.ed, CAST(f.ed AS BIGINT), f.ev
  FROM isl d
  JOIN isl f ON f.user_id = d.user_id AND d.dir = -1 AND f.dir = 0
            AND f.sp = d.ed
), x AS (
  SELECT mm.user_id, dd.day AS anchor_day, dd.n AS anchor_n, mm.shape,
         mm.bottom_day, mm.end_day, mm.end_n,
         mm.dlen - (ROW_NUMBER() OVER (PARTITION BY mm.user_id, mm.a0, mm.shape
                                       ORDER BY dd.day) - 1) AS n_down
  FROM mm JOIN daily dd
    ON dd.user_id = mm.user_id
   AND dd.day >= mm.a0 AND dd.day < mm.bottom_day
)
SELECT user_id, CAST(anchor_day AS BIGINT) AS anchor_day, anchor_n, shape,
       CAST(bottom_day AS BIGINT) AS bottom_day,
       CAST(n_down AS BIGINT) AS n_down, end_day, end_n
FROM x ORDER BY user_id, anchor_day, shape
""",
    category="window",
)
def win_pattern_sql_alt_skip_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKIP TO NEXT ROW × alternation (this session — closes the
    composition row): every descent's suffix anchors each emit a match
    classified by what follows the descent — a rebound or a plateau —
    through ONE shared classification; the only selection is the
    per-anchor leftmost-branch preference (unexercised on this shape,
    where a descent is followed by exactly one island — the preference
    arm is pinned by
    ``test_skip_next_with_alternation_leftmost_preference``). Composes
    with SUBSET: ``LAST(tail.day)`` / ``LAST(tail.n)`` read the winning
    branch's end uniformly. Oracle: both adjacency chains UNION ALL,
    suffix-expanded by joining descent rows — no walk, the rescan keeps
    every anchor. Fresh slice: user_id < 47."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=47).createOrReplaceTempView(
        "walden_mr_daily_asn"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, anchor_n, shape, bottom_day, n_down,
       end_day, end_n
FROM walden_mr_daily_asn MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, STRT.n AS anchor_n,
           CLASSIFIER() AS shape,
           LAST(down.day) AS bottom_day, COUNT(down.*) AS n_down,
           LAST(tail.day) AS end_day, LAST(tail.n) AS end_n
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN ((STRT down+ up+) | (STRT down+ flat+))
  SUBSET tail = (up, flat)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n),
         flat AS flat.n = PREV(flat.n)
)
ORDER BY user_id, anchor_day, shape
"""
    )


@query(
    "win_pattern_sql_permute_mid",
    oracle=_ISLANDS_CTE.format(max_user=63).replace(
        "\nWITH daily", "\nWITH RECURSIVE daily", 1
    )
    + """
, cand AS (
  SELECT d.user_id, d.sp AS anchor_day, d.av AS anchor_n, d.ln AS n_down,
         CAST(u.ed AS BIGINT) AS rise_day, CAST(f.ed AS BIGINT) AS plateau_day,
         CAST(d2.ed AS BIGINT) AS end_day, d2.ev AS end_n, 0 AS bidx
  FROM isl d
  JOIN isl u  ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
             AND u.sp = d.ed
  JOIN isl f  ON f.user_id = d.user_id AND f.dir = 0 AND f.sp = u.ed
  JOIN isl d2 ON d2.user_id = d.user_id AND d2.dir = -1 AND d2.sp = f.ed
  UNION ALL
  SELECT d.user_id, d.sp, d.av, d.ln,
         CAST(u.ed AS BIGINT), CAST(f.ed AS BIGINT),
         CAST(d2.ed AS BIGINT), d2.ev, 1
  FROM isl d
  JOIN isl f  ON f.user_id = d.user_id AND d.dir = -1 AND f.dir = 0
             AND f.sp = d.ed
  JOIN isl u  ON u.user_id = d.user_id AND u.dir = 1 AND u.sp = f.ed
  JOIN isl d2 ON d2.user_id = d.user_id AND d2.dir = -1 AND d2.sp = u.ed
), walk AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM cand c2 WHERE c2.user_id = c.user_id
      AND (c2.anchor_day < c.anchor_day
           OR (c2.anchor_day = c.anchor_day AND c2.bidx < c.bidx)))
  UNION ALL
  SELECT n.* FROM walk w
  JOIN cand n ON n.user_id = w.user_id AND n.anchor_day > w.end_day
  WHERE NOT EXISTS (
    SELECT 1 FROM cand m WHERE m.user_id = w.user_id
      AND m.anchor_day > w.end_day
      AND (m.anchor_day < n.anchor_day
           OR (m.anchor_day = n.anchor_day AND m.bidx < n.bidx)))
)
SELECT user_id, CAST(anchor_day AS BIGINT) AS anchor_day, anchor_n, n_down,
       rise_day, plateau_day, end_day, end_n
FROM walk
ORDER BY user_id, anchor_day
""",
    category="window",
)
def win_pattern_sql_permute_mid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mid-pattern PERMUTE (this session — closes the 'PERMUTE embedded
    mid-pattern' limit): ``PATTERN (STRT down+ PERMUTE(up+, flat+)
    down2+)`` — a descent, then a rebound and a plateau in EITHER
    order, then a second descent. The parser expands the group into an
    alternation of the two interleavings sharing the prefix/suffix
    steps verbatim, so the existing alternation machinery (one shared
    classification, leftmost preference, skip-past walk) serves it;
    both permuted variables appear in every branch, so LAST(up.day) /
    LAST(flat.day) are non-NULL on every match and their order tells
    which interleaving won. Oracle: the two 4-step adjacency chains
    UNION ALL + the RECURSIVE greedy-walk CTE (4-step spans overlap
    more deeply than boundary rows, so inside-anchored candidates must
    drop — the chain-odd trick undercounts drops here, exactly the
    win_pattern_sql_permute lesson). Fresh slice: user_id < 63."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=63).createOrReplaceTempView(
        "walden_mr_daily_pm"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, anchor_n, n_down, rise_day, plateau_day,
       end_day, end_n
FROM walden_mr_daily_pm MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, STRT.n AS anchor_n,
           COUNT(down.*) AS n_down,
           LAST(up.day) AS rise_day, LAST(flat.day) AS plateau_day,
           LAST(down2.day) AS end_day, LAST(down2.n) AS end_n
  ONE ROW PER MATCH
  PATTERN (STRT down+ PERMUTE(up+, flat+) down2+)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n),
         flat AS flat.n = PREV(flat.n), down2 AS down2.n < PREV(down2.n)
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_sql_alt_subset",
    oracle=_ISLANDS_CTE.format(max_user=67)
    + """
, mm AS (
  SELECT d.user_id, d.sp AS anchor_day, d.av AS anchor_n,
         u.ed AS end_day, 'up' AS shape, d.ln AS n_down,
         CAST(u.ed AS BIGINT) AS tail_day, u.ev AS tail_n, u.ln AS n_tail
  FROM isl d
  JOIN isl u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
            AND u.sp = d.ed
  UNION ALL
  SELECT d.user_id, d.sp, d.av, f.ed, 'flat', d.ln,
         CAST(f.ed AS BIGINT), f.ev, f.ln
  FROM isl d
  JOIN isl f ON f.user_id = d.user_id AND d.dir = -1 AND f.dir = 0
            AND f.sp = d.ed
), s AS (
  SELECT *, CASE WHEN anchor_day = LAG(end_day)
                   OVER (PARTITION BY user_id ORDER BY anchor_day)
                 THEN 0 ELSE 1 END AS new_chain
  FROM mm
), c AS (
  SELECT *, SUM(new_chain)
              OVER (PARTITION BY user_id ORDER BY anchor_day) AS chain_id
  FROM s
), r AS (
  SELECT *, ROW_NUMBER()
              OVER (PARTITION BY user_id, chain_id ORDER BY anchor_day) AS pos
  FROM c
)
SELECT user_id, CAST(anchor_day AS BIGINT) AS anchor_day, anchor_n,
       shape, n_down, tail_day, tail_n, n_tail
FROM r WHERE pos % 2 = 1
ORDER BY user_id, anchor_day
""",
    category="window",
)
def win_pattern_sql_alt_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUBSET × alternation (this session — closes the named limit):
    ``SUBSET tail = (up, flat)`` spans branch-dependent step sets, so
    the union variable resolves PER WINNING BRANCH — ``LAST(tail.day)``
    / ``LAST(tail.n)`` read the V branch's ascent end or the plateau
    branch's plateau end, and ``COUNT(tail.*)`` the winning tail's run
    length — one uniform measure over what each descent resolved into,
    where the plain alternation query needed an outer COALESCE over
    per-branch NULLs. Selection and classification are unchanged
    (shared classification, leftmost preference, skip-past walk).
    Fresh slice: user_id < 67."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=67).createOrReplaceTempView(
        "walden_mr_daily_asb"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, anchor_n, shape, n_down, tail_day, tail_n, n_tail
FROM walden_mr_daily_asb MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, STRT.n AS anchor_n,
           CLASSIFIER() AS shape, COUNT(down.*) AS n_down,
           LAST(tail.day) AS tail_day, LAST(tail.n) AS tail_n,
           COUNT(tail.*) AS n_tail
  ONE ROW PER MATCH
  PATTERN ((STRT down+ up+) | (STRT down+ flat+))
  SUBSET tail = (up, flat)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n),
         flat AS flat.n = PREV(flat.n)
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_sql_alternation",
    oracle=_ISLANDS_CTE.format(max_user=70)
    + """
, mm AS (
  SELECT d.user_id, d.sp AS anchor_day, d.av AS anchor_n,
         u.ed AS end_day, 'up' AS shape, d.ln AS n_down,
         CAST(u.ed AS BIGINT) AS rise_day,
         CAST(NULL AS BIGINT) AS plateau_day,
         u.ev AS end_n
  FROM isl d
  JOIN isl u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
            AND u.sp = d.ed
  UNION ALL
  SELECT d.user_id, d.sp, d.av, f.ed, 'flat', d.ln,
         CAST(NULL AS BIGINT), CAST(f.ed AS BIGINT), f.ev
  FROM isl d
  JOIN isl f ON f.user_id = d.user_id AND d.dir = -1 AND f.dir = 0
            AND f.sp = d.ed
), s AS (
  SELECT *, CASE WHEN anchor_day = LAG(end_day)
                   OVER (PARTITION BY user_id ORDER BY anchor_day)
                 THEN 0 ELSE 1 END AS new_chain
  FROM mm
), c AS (
  SELECT *, SUM(new_chain)
              OVER (PARTITION BY user_id ORDER BY anchor_day) AS chain_id
  FROM s
), r AS (
  SELECT *, ROW_NUMBER()
              OVER (PARTITION BY user_id, chain_id ORDER BY anchor_day) AS pos
  FROM c
)
SELECT user_id, CAST(anchor_day AS BIGINT) AS anchor_day, anchor_n,
       shape, n_down, rise_day, plateau_day, end_n
FROM r WHERE pos % 2 = 1
ORDER BY user_id, anchor_day
""",
    category="window",
)
def win_pattern_sql_alternation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PATTERN alternation at the SQL surface (r11 — closes the
    "SQL-surface alternation" out-of-class row):
    ``PATTERN ((STRT down+ up+) | (STRT down+ flat+))`` classifies each
    descent by what follows it — a rebound (V) or a plateau — through
    ONE shared classification (``match_any``), with SQL:2016 leftmost
    branch preference at shared anchors and the default SKIP PAST LAST
    ROW greedy selection. CLASSIFIER() names the winning branch (its
    final step), per-branch measures are NULL on the other branch's
    rows, and the outer SELECT COALESCEs them — ordinary Catalyst SQL
    over the spliced view. Here second steps are distinct transition
    classes, so anchors are branch-disjoint and the DuckDB oracle is a
    plain UNION ALL of both adjacency joins + the chain/odd-position
    greedy filter (boundary-only overlap, as in win_pattern_skip_past).
    Fresh slice: user_id < 70."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=70).createOrReplaceTempView(
        "walden_mr_daily_alt"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, anchor_n, shape, n_down, rise_day, plateau_day,
       COALESCE(rise_n, plateau_n) AS end_n
FROM walden_mr_daily_alt MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, STRT.n AS anchor_n, CLASSIFIER() AS shape,
           COUNT(down.*) AS n_down, LAST(up.day) AS rise_day,
           LAST(flat.day) AS plateau_day, LAST(up.n) AS rise_n,
           LAST(flat.n) AS plateau_n
  ONE ROW PER MATCH
  PATTERN ((STRT down+ up+) | (STRT down+ flat+))
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n),
         flat AS flat.n = PREV(flat.n)
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_sql_alt_all_rows",
    oracle=_ISLANDS_CTE.format(max_user=65)
    + """
, mm AS (
  SELECT d.user_id, d.sp AS anchor_day, d.ed AS bottom_day,
         u.ed AS end_day, 'up' AS shape
  FROM isl d
  JOIN isl u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
            AND u.sp = d.ed
  UNION ALL
  SELECT d.user_id, d.sp, d.ed, f.ed, 'flat'
  FROM isl d
  JOIN isl f ON f.user_id = d.user_id AND d.dir = -1 AND f.dir = 0
            AND f.sp = d.ed
), s AS (
  SELECT *, CASE WHEN anchor_day = LAG(end_day)
                   OVER (PARTITION BY user_id ORDER BY anchor_day)
                 THEN 0 ELSE 1 END AS new_chain
  FROM mm
), c AS (
  SELECT *, SUM(new_chain)
              OVER (PARTITION BY user_id ORDER BY anchor_day) AS chain_id
  FROM s
), r AS (
  SELECT *, ROW_NUMBER()
              OVER (PARTITION BY user_id, chain_id ORDER BY anchor_day) AS pos
  FROM c
), kept AS (
  SELECT * FROM r WHERE pos % 2 = 1
), mn AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY anchor_day)
                 AS BIGINT) AS match_no
  FROM kept
)
SELECT mn.user_id, mn.match_no,
       CASE WHEN dd.day = mn.anchor_day THEN 'STRT'
            WHEN dd.day <= mn.bottom_day THEN 'down'
            ELSE mn.shape END AS cls,
       CAST(mn.anchor_day AS BIGINT) AS anchor_day,
       CAST(dd.day AS BIGINT) AS day, dd.n
FROM mn JOIN daily dd
  ON dd.user_id = mn.user_id AND dd.day BETWEEN mn.anchor_day AND mn.end_day
ORDER BY mn.user_id, mn.match_no, day
""",
    category="window",
)
def win_pattern_sql_alt_all_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL ROWS PER MATCH combined with PATTERN alternation (late r11 —
    the last row of the mode × alternation matrix): matches are
    selected with the default skip-past greedy walk, numbered ACROSS
    branches, then each branch's matches expand with their own steps
    (branch-specific CLASSIFIER names: down/up vs down/flat) and the
    expansions union. Oracle: UNION ALL of both adjacency joins, the
    chain/odd greedy filter (boundary-only overlap), global
    ROW_NUMBER, then the literal BETWEEN join-back with a
    shape-dependent CASE classifier. Fresh slice: user_id < 65."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=65).createOrReplaceTempView(
        "walden_mr_daily_ara"
    )
    return ws.sql(
        """
SELECT user_id, match_no, cls, anchor_day, day, n
FROM walden_mr_daily_ara MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES MATCH_NUMBER() AS match_no, CLASSIFIER() AS cls,
           STRT.day AS anchor_day
  ALL ROWS PER MATCH
  PATTERN ((STRT down+ up+) | (STRT down+ flat+))
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n),
         flat AS flat.n = PREV(flat.n)
)
ORDER BY user_id, match_no, day
"""
    )


@query(
    "win_pattern_sql_subset",
    oracle=_ISLANDS_CTE.format(max_user=75)
    + """
SELECT d.user_id,
       CAST(d.sp AS BIGINT) AS anchor_day,
       d.ln AS n_down,
       d.ln + u.ln AS span_steps,
       CAST(u.ed AS BIGINT) AS end_day, u.ev AS end_n
FROM isl d
JOIN isl u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
          AND u.sp = d.ed
ORDER BY d.user_id, anchor_day
""",
    category="window",
)
def win_pattern_sql_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUBSET union variables (late r11 — closes the SUBSET row):
    ``SUBSET vu = (down, up)`` makes ``COUNT(vu.*)`` the member
    run-length sum and ``LAST(vu.day)`` the latest member's final row —
    resolved STATICALLY, since in this linear pattern class every
    variable is present in every match. The oracle computes the same
    sums from the islands directly. Fresh slice: user_id < 75."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=75).createOrReplaceTempView(
        "walden_mr_daily_sub"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, n_down, span_steps, end_day, end_n
FROM walden_mr_daily_sub MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, COUNT(down.*) AS n_down,
           COUNT(vu.*) AS span_steps, LAST(vu.day) AS end_day,
           LAST(vu.n) AS end_n
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO LAST up
  PATTERN (STRT down+ up+)
  SUBSET vu = (down, up)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n)
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_sql_permute",
    oracle=_ISLANDS_CTE.format(max_user=80).replace(
        "\nWITH daily", "\nWITH RECURSIVE daily", 1
    )
    + """
, cand AS (
  SELECT d.user_id, d.sp AS anchor_day, u.ed AS end_day, 0 AS bidx,
         'up' AS cls, d.ln AS n_down, u.ln AS n_up,
         CAST(d.ed AS BIGINT) AS d_end, CAST(u.ed AS BIGINT) AS u_end
  FROM isl d
  JOIN isl u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
            AND u.sp = d.ed
  UNION ALL
  SELECT u.user_id, u.sp, d.ed, 1, 'down', d.ln, u.ln,
         CAST(d.ed AS BIGINT), CAST(u.ed AS BIGINT)
  FROM isl u
  JOIN isl d ON d.user_id = u.user_id AND u.dir = 1 AND d.dir = -1
            AND d.sp = u.ed
), walk AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM cand c2 WHERE c2.user_id = c.user_id
      AND (c2.anchor_day < c.anchor_day
           OR (c2.anchor_day = c.anchor_day AND c2.bidx < c.bidx)))
  UNION ALL
  SELECT n.* FROM walk w
  JOIN cand n ON n.user_id = w.user_id AND n.anchor_day > w.end_day
  WHERE NOT EXISTS (
    SELECT 1 FROM cand m WHERE m.user_id = w.user_id
      AND m.anchor_day > w.end_day
      AND (m.anchor_day < n.anchor_day
           OR (m.anchor_day = n.anchor_day AND m.bidx < n.bidx)))
)
SELECT user_id, CAST(anchor_day AS BIGINT) AS anchor_day, cls,
       n_down, n_up, d_end, u_end
FROM walk
ORDER BY user_id, anchor_day
""",
    category="window",
)
def win_pattern_sql_permute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMUTE at the SQL surface (late r11): ``PATTERN (STRT
    PERMUTE(down+, up+))`` expands to the alternation of both orderings
    (lexicographic listed-position preference, per the standard),
    classifying every maximal two-island descent↔rebound sequence by
    which came first — with the default skip-past greedy walk, which
    here exercises INSIDE-anchored drops (an up-then-down candidate
    anchors mid-span of a down-then-up match). The DuckDB oracle
    reproduces exactly that sequential selection with a RECURSIVE
    walk CTE: base = earliest candidate per partition (min anchor, min
    branch at ties), step = unique next candidate past the kept end —
    the first recursive oracle in the registry, proving the greedy
    selection against real SQL rather than a relational special case.
    Fresh slice: user_id < 80."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=80).createOrReplaceTempView(
        "walden_mr_daily_perm"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, cls, n_down, n_up, d_end, u_end
FROM walden_mr_daily_perm MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, CLASSIFIER() AS cls,
           COUNT(down.*) AS n_down, COUNT(up.*) AS n_up,
           LAST(down.day) AS d_end, LAST(up.day) AS u_end
  ONE ROW PER MATCH
  PATTERN (STRT PERMUTE(down+, up+))
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n)
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_sql_cycles",
    oracle=_ISLANDS_CTE.format(max_user=85)
    + """
, isl2 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY sp) AS iseq
  FROM isl
), units AS (
  SELECT d.user_id, d.iseq AS useq, d.sp AS a_day, d.av AS a_n,
         d.ln AS d_ln, u.ln AS u_ln, u.ed AS u_end, u.ev AS u_ev
  FROM isl2 d
  JOIN isl2 u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
             AND u.iseq = d.iseq + 1
), cruns AS (
  SELECT *, useq - 2 * ROW_NUMBER()
              OVER (PARTITION BY user_id ORDER BY useq) AS grp
  FROM units
)
SELECT user_id,
       CAST(MIN(a_day) AS BIGINT) AS anchor_day,
       CAST(MAX(u_end) AS BIGINT) AS end_day,
       CAST(1 + SUM(d_ln) + SUM(u_ln) AS BIGINT) AS span_rows,
       CAST(SUM(d_ln) AS BIGINT) AS total_down,
       CAST(arg_max(u_ev, useq) AS BIGINT) AS end_n
FROM cruns GROUP BY user_id, grp
ORDER BY user_id, anchor_day
""",
    category="window",
)
def win_pattern_sql_cycles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated group patterns (late r11 — the grouped-sub-pattern row,
    repetition case): ``PATTERN (STRT (down+ up+)+)`` emits one row per
    MAXIMAL zigzag run — consecutive descent→rebound cycles — via
    :func:`walden_spark.operators.pattern.match_cycles`: cycle matches
    carry their first island's sequence number and group with the
    islands trick one level up (consecutive units sit exactly k islands
    apart). Measures: run anchor/end, COUNT(*) (all rows of the match),
    COUNT(down.*) (descent transitions across cycles), LAST(up.n) (the
    final cycle's last value). The DuckDB oracle runs the identical
    island-level construction (iseq adjacency join + useq−2·row_number
    grouping). Fresh slice: user_id < 85."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=85).createOrReplaceTempView(
        "walden_mr_daily_cyc"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, end_day,
       span_rows, n_d AS total_down, end_n
FROM walden_mr_daily_cyc MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, LAST(up.day) AS end_day,
           COUNT(*) AS span_rows, COUNT(down.*) AS n_d,
           LAST(up.n) AS end_n
  PATTERN (STRT (down+ up+)+)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n)
)
ORDER BY user_id, anchor_day
"""
    )


_THRESHOLD_CTE = """
WITH daily AS (
  SELECT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE user_id < 90 GROUP BY 1, 2
), seq AS (
  SELECT user_id, day, n,
         LAG(day) OVER w AS prev_day, LAG(n) OVER w AS prev_n,
         ROW_NUMBER() OVER w AS pos
  FROM daily
  WINDOW w AS (PARTITION BY user_id ORDER BY day)
), dirs AS (
  SELECT *, CASE WHEN n >= 5 THEN 1 ELSE 0 END AS dir
  FROM seq WHERE prev_n IS NOT NULL
), runs AS (
  SELECT *, pos - ROW_NUMBER() OVER (PARTITION BY user_id, dir ORDER BY pos) AS grp
  FROM dirs
), isl AS (
  SELECT user_id, dir,
         MIN(prev_day) AS sp,
         CAST(arg_min(prev_n, pos) AS BIGINT) AS av,
         MAX(day) AS ed,
         CAST(arg_max(n, pos) AS BIGINT) AS ev,
         CAST(COUNT(*) AS BIGINT) AS ln
  FROM runs GROUP BY user_id, dir, grp
)
"""


@query(
    "win_pattern_sql_threshold",
    oracle=_THRESHOLD_CTE
    + """
, m AS (
  SELECT h.user_id, h.sp AS anchor_day, h.av AS anchor_n,
         h.ed AS burst_end, h.ln AS n_hi,
         l.ed AS quiet_end, l.ln AS n_lo
  FROM isl h
  JOIN isl l ON l.user_id = h.user_id AND h.dir = 1 AND l.dir = 0
            AND l.sp = h.ed
), s AS (
  SELECT *, CASE WHEN anchor_day = LAG(quiet_end)
                   OVER (PARTITION BY user_id ORDER BY anchor_day)
                 THEN 0 ELSE 1 END AS new_chain
  FROM m
), c AS (
  SELECT *, SUM(new_chain)
              OVER (PARTITION BY user_id ORDER BY anchor_day) AS chain_id
  FROM s
), r AS (
  SELECT *, ROW_NUMBER()
              OVER (PARTITION BY user_id, chain_id ORDER BY anchor_day) AS pos
  FROM c
)
SELECT user_id, CAST(anchor_day AS BIGINT) AS anchor_day, anchor_n,
       CAST(burst_end AS BIGINT) AS burst_end, n_hi,
       CAST(quiet_end AS BIGINT) AS quiet_end, n_lo
FROM r WHERE pos % 2 = 1
ORDER BY user_id, anchor_day
""",
    category="window",
)
def win_pattern_sql_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-class DEFINEs (late r11 — DEFINE beyond PREV
    comparisons): ``DEFINE hi AS hi.n >= 5, lo AS lo.n < 5`` classifies
    each row into disjoint value bands (validated pairwise-disjoint —
    classes must partition the rows), routed through the compiler's
    pluggable classifier; ``PATTERN (STRT hi+ lo+)`` finds burst→quiet
    transitions (the canonical spike/outage detection shape) under the
    default skip-past greedy walk. The DuckDB oracle classifies on the
    same CASE, builds the same maximal band islands, and applies the
    chain/odd greedy filter (binary band classes ⇒ boundary-only
    overlap). Fresh slice: user_id < 90."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=90).createOrReplaceTempView(
        "walden_mr_daily_thr"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, anchor_n, burst_end, n_hi, quiet_end, n_lo
FROM walden_mr_daily_thr MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, STRT.n AS anchor_n,
           LAST(hi.day) AS burst_end, COUNT(hi.*) AS n_hi,
           LAST(lo.day) AS quiet_end, COUNT(lo.*) AS n_lo
  PATTERN (STRT hi+ lo+)
  DEFINE hi AS hi.n >= 5, lo AS lo.n < 5
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_sql_vshape",
    oracle=_ISLANDS_CTE.format(max_user=60)
    + """
SELECT d.user_id,
       CAST(d.sp AS BIGINT) AS anchor_day, d.av AS anchor_n,
       CAST(d.ed AS BIGINT) AS bottom_day, d.ev AS bottom_n,
       CAST(u.ed AS BIGINT) AS end_day, u.ev AS end_n,
       d.ln AS n_down, u.ln AS n_up,
       d.av - d.ev AS depth
FROM isl d
JOIN isl u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
          AND u.sp = d.ed
ORDER BY d.user_id, anchor_day
""",
    category="window",
)
def win_pattern_sql_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE at the SQL surface (r11, VERDICT r10 #2):
    the query text enters through ``WaldenSession.sql`` carrying a
    literal ``FROM … MATCH_RECOGNIZE (PARTITION BY … ORDER BY …
    MEASURES … AFTER MATCH SKIP TO LAST … PATTERN (STRT DOWN+ UP+)
    DEFINE …)`` clause — Trino's row-pattern surface is SQL, not a
    Python API (reference: Trino 468 via tf/main.tf:82-114). The
    fragment compiles through plans/matchrec.py onto the same
    operators/pattern.py pipeline; the outer SELECT (arithmetic over
    the aliased measures, ORDER BY) stays ordinary Catalyst SQL over
    the spliced temp view. Distinct slice from win_pattern_vshape
    (user_id < 60) plus COUNT(step.*) run-length measures, so this
    hash-checks the SQL path on its own data, not a repeat."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=60).createOrReplaceTempView(
        "walden_mr_daily_v"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, anchor_n, bottom_day, bottom_n,
       end_day, end_n, n_down, n_up, anchor_n - bottom_n AS depth
FROM walden_mr_daily_v MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, STRT.n AS anchor_n,
           LAST(down.day) AS bottom_day, LAST(down.n) AS bottom_n,
           LAST(up.day) AS end_day, LAST(up.n) AS end_n,
           COUNT(down.*) AS n_down, COUNT(up.*) AS n_up
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO LAST up
  PATTERN (STRT down+ up+)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n)
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_sql_same_class",
    oracle=_ISLANDS_CTE.format(max_user=31)
    + """
, isl2 AS (
  SELECT user_id, dir, grp, MIN(prev_day) AS sp,
         CAST(arg_min(prev_n, pos) AS BIGINT) AS av,
         MAX(day) AS ed, CAST(arg_max(n, pos) AS BIGINT) AS ev,
         CAST(COUNT(*) AS BIGINT) AS ln, MAX(pos) AS mpos
  FROM runs GROUP BY user_id, dir, grp
)
SELECT i.user_id AS user_id, CAST(i.sp AS BIGINT) AS anchor_day,
       i.av AS anchor_n,
       CAST(r.day AS BIGINT) AS up_day, r.n AS up_n,
       CAST(i.ln - 1 AS BIGINT) AS n_up,
       CAST(i.ed AS BIGINT) AS end_day, i.ev AS end_n
FROM isl2 i
JOIN runs r ON r.user_id = i.user_id AND r.dir = i.dir AND r.grp = i.grp
           AND r.pos = i.mpos - 1
WHERE i.dir = 1 AND i.ln >= 2
ORDER BY i.user_id, anchor_day
""",
    category="window",
)
def win_pattern_sql_same_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent SAME-class steps (r13 — closes the r12 named limit for
    the 2-step case, VERDICT r12 #2): ``PATTERN (STRT up+ up2+)`` with
    both steps DEFINEd ``n > PREV(n)`` — Trino 468 matches by splitting
    each maximal ascent greedily, up taking n−1 transitions and up2 its
    minimum 1 (reference surface: Trino 468 via
    /root/reference/tf/main.tf:82-114). Compiled by
    :func:`walden_spark.operators.pattern.match_split_pair`: the pair
    merges into one synthetic island step, then A's last row is
    recovered with the binned span join at offset c_A = n − 1. Matches
    are whole ascent islands, so the default SKIP PAST LAST ROW keeps
    every candidate (islands are disjoint and separated by ≥1
    other-class transition) — the oracle joins each ascent island
    (ln ≥ 2) back to its second-to-last row. Fresh slice: user_id < 31."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=31).createOrReplaceTempView(
        "walden_mr_daily_sc"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, anchor_n, up_day, up_n, n_up, end_day, end_n
FROM walden_mr_daily_sc MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, STRT.n AS anchor_n,
           LAST(up.day) AS up_day, LAST(up.n) AS up_n,
           COUNT(up.*) AS n_up,
           LAST(up2.day) AS end_day, LAST(up2.n) AS end_n
  ONE ROW PER MATCH
  PATTERN (STRT up+ up2+)
  DEFINE up AS up.n > PREV(up.n), up2 AS up2.n > PREV(up2.n)
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_sql_mixed_define",
    oracle="""
WITH RECURSIVE daily AS (
  SELECT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n
  FROM events WHERE user_id < 39 GROUP BY 1, 2
), seq AS (
  SELECT user_id, day, n,
         LAG(day) OVER w AS prev_day, LAG(n) OVER w AS prev_n,
         ROW_NUMBER() OVER w AS pos
  FROM daily
  WINDOW w AS (PARTITION BY user_id ORDER BY day)
), dirs AS (
  SELECT *, CASE WHEN n = 0 THEN 2 WHEN n > prev_n THEN 1
                 ELSE -1 END AS dir
  FROM seq WHERE prev_n IS NOT NULL
), runs AS (
  SELECT *, pos - ROW_NUMBER() OVER (PARTITION BY user_id, dir ORDER BY pos) AS grp
  FROM dirs
), isl AS (
  SELECT user_id, dir,
         MIN(prev_day) AS sp,
         CAST(arg_min(prev_n, pos) AS BIGINT) AS av,
         MAX(day) AS ed,
         CAST(arg_max(n, pos) AS BIGINT) AS ev,
         CAST(COUNT(*) AS BIGINT) AS ln
  FROM runs GROUP BY user_id, dir, grp
), cand AS (
  SELECT u.user_id AS user_id, CAST(u.sp AS BIGINT) AS anchor_day,
         u.av AS anchor_n, CAST(u.ed AS BIGINT) AS peak_day,
         u.ev AS peak_n, u.ln AS n_up,
         CAST(f.ed AS BIGINT) AS quiet_end, f.ln AS n_quiet
  FROM isl u
  JOIN isl f ON f.user_id = u.user_id AND u.dir = 1 AND f.dir = 2
            AND f.sp = u.ed
), walk AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM cand c2 WHERE c2.user_id = c.user_id
      AND c2.anchor_day < c.anchor_day)
  UNION ALL
  SELECT n.* FROM walk w
  JOIN cand n ON n.user_id = w.user_id AND n.anchor_day > w.quiet_end
  WHERE NOT EXISTS (
    SELECT 1 FROM cand m WHERE m.user_id = w.user_id
      AND m.anchor_day > w.quiet_end
      AND m.anchor_day < n.anchor_day)
)
SELECT user_id, anchor_day, anchor_n, peak_day, peak_n, n_up,
       quiet_end, n_quiet
FROM walk
ORDER BY user_id, anchor_day
""",
    category="window",
)
def win_pattern_sql_mixed_define(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed PREV + constant DEFINEs (r13, VERDICT r12 #6 — closes the
    named limit): ``DEFINE up AS up.n > PREV(up.n), flr AS flr.n = 0``
    mixes a direction class with a threshold class in one clause —
    error-count ramps that go quiet: the daily error count rises, then
    a run of zero-error days. Trino 468 accepts arbitrary DEFINE mixes
    (reference surface via /root/reference/tf/main.tf:82-114); this
    compiler serves the mix when the predicates PARTITION the
    transitions — direction-vs-direction and threshold-vs-threshold
    disjointness are validated statically, direction-vs-threshold by a
    RUNTIME guard compiled into the classifier (a transition satisfying
    two predicates fails with a named error instead of silently
    mis-classifying). On nonnegative counts ``n > PREV(n)`` and
    ``n = 0`` are provably disjoint, so the guard never fires here.
    The oracle mirrors the two-class islands (class 1 = rise, class 2 =
    zero) and replays the default SKIP PAST LAST ROW greedy walk with
    the recursive-CTE chain trick (a 0→positive rise re-anchors ON the
    previous match's last row and must drop). Fresh slice: user_id < 39."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    t = Tables(spark, sf_dir)
    (
        t.events.filter(F.col("user_id") < 39)
        .groupBy(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            )
            .cast("bigint")
            .alias("day"),
        )
        .agg(
            F.sum(
                F.when(F.col("event_type") == "error", F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias("n")
        )
    ).createOrReplaceTempView("walden_mr_daily_mx")
    return ws.sql(
        """
SELECT user_id, anchor_day, anchor_n, peak_day, peak_n, n_up,
       quiet_end, n_quiet
FROM walden_mr_daily_mx MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, STRT.n AS anchor_n,
           LAST(up.day) AS peak_day, LAST(up.n) AS peak_n,
           COUNT(up.*) AS n_up,
           LAST(flr.day) AS quiet_end, COUNT(flr.*) AS n_quiet
  ONE ROW PER MATCH
  PATTERN (STRT up+ flr+)
  DEFINE up AS up.n > PREV(up.n), flr AS flr.n = 0
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_sql_same_class_all_rows",
    oracle=_ISLANDS_CTE.format(max_user=41)
    + """
, isl3 AS (
  SELECT user_id, dir, grp, MIN(prev_day) AS sp, MAX(day) AS ed,
         CAST(COUNT(*) AS BIGINT) AS ln, MAX(pos) AS mpos
  FROM runs GROUP BY user_id, dir, grp
), m AS (
  SELECT i.user_id AS user_id, i.sp, i.ed, CAST(r.day AS BIGINT) AS up_end,
         ROW_NUMBER() OVER (PARTITION BY i.user_id ORDER BY i.sp) AS match_no
  FROM isl3 i
  JOIN runs r ON r.user_id = i.user_id AND r.dir = i.dir AND r.grp = i.grp
             AND r.pos = i.mpos - 1
  WHERE i.dir = 1 AND i.ln >= 2
)
SELECT d.user_id AS user_id, CAST(m.match_no AS BIGINT) AS match_no,
       d.day AS day, d.n AS n,
       CASE WHEN d.day = m.sp THEN 'STRT'
            WHEN d.day <= m.up_end THEN 'up' ELSE 'up2' END AS cls
FROM daily d
JOIN m ON d.user_id = m.user_id AND d.day BETWEEN m.sp AND m.ed
ORDER BY d.user_id, m.match_no, d.day
""",
    category="window",
)
def win_pattern_sql_same_class_all_rows(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ALL ROWS PER MATCH over an adjacent same-class pair (r13): the
    split emits exact per-step boundaries, so the expansion's
    CLASSIFIER() maps each row of the shared maximal ascent to up or
    up2 by the greedy split point (up = all but the last transition,
    up2 = the last), with MATCH_NUMBER() ranking matches by anchor —
    Trino 468 row semantics for `up+ up2+`. Same pipeline as
    win_pattern_sql_same_class plus
    :func:`walden_spark.operators.pattern.expand_all_rows`'s binned
    span join back to the input rows. The oracle replays the split on
    the islands frame and joins each ascent's span back to the daily
    rows. Fresh slice: user_id < 41."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=41).createOrReplaceTempView(
        "walden_mr_daily_scar"
    )
    return ws.sql(
        """
SELECT user_id, match_no, day, n, cls
FROM walden_mr_daily_scar MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES CLASSIFIER() AS cls, MATCH_NUMBER() AS match_no
  ALL ROWS PER MATCH
  PATTERN (STRT up+ up2+)
  DEFINE up AS up.n > PREV(up.n), up2 AS up2.n > PREV(up2.n)
)
ORDER BY user_id, match_no, day
"""
    )


@query(
    "win_pattern_sql_same_class_skip_next",
    oracle=_ISLANDS_CTE.format(max_user=29)
    + """
, isl2 AS (
  SELECT user_id, dir, grp, MAX(day) AS ed,
         CAST(arg_max(n, pos) AS BIGINT) AS ev,
         MAX(pos) AS mpos,
         CAST(arg_max(prev_day, pos) AS BIGINT) AS up_day,
         CAST(arg_max(prev_n, pos) AS BIGINT) AS up_n
  FROM runs GROUP BY user_id, dir, grp
)
SELECT r.user_id AS user_id,
       CAST(r.prev_day AS BIGINT) AS anchor_day,
       CAST(r.prev_n AS BIGINT) AS anchor_n,
       i.up_day AS up_day, i.up_n AS up_n,
       CAST(i.mpos - r.pos AS BIGINT) AS n_up,
       CAST(i.ed AS BIGINT) AS end_day, i.ev AS end_n
FROM runs r
JOIN isl2 i ON i.user_id = r.user_id AND i.dir = r.dir AND i.grp = r.grp
WHERE r.dir = 1 AND r.pos <= i.mpos - 1
ORDER BY user_id, anchor_day
""",
    category="window",
)
def win_pattern_sql_same_class_skip_next(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Same-class pair under AFTER MATCH SKIP TO NEXT ROW (r14 —
    closes the r13 named limit, VERDICT r13 #3): ``PATTERN (STRT up+
    up2+)`` with the rescan mode, so a match is attempted at EVERY
    row — the anchors are exactly the rows of each maximal ascent
    whose remaining suffix holds >= 2 transitions, and each anchor's
    suffix re-splits greedily (up = all but the last transition, up2 =
    the last), per Trino 468 rescan semantics (reference surface:
    Trino 468 via /root/reference/tf/main.tf:82-114). Compiled by
    :func:`walden_spark.operators.pattern.match_split_pair` with
    ``skip_next=True``: the pair merges into one synthetic step,
    match_skip_next's suffix-anchor expansion enumerates the
    mid-island anchors, and the binned span join recovers up's end per
    anchor. The oracle joins every non-final row of each ascent island
    (the suffix anchors) to its island's tail columns. Fresh slice:
    user_id < 29."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=29).createOrReplaceTempView(
        "walden_mr_daily_scsn"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, anchor_n, up_day, up_n, n_up, end_day, end_n
FROM walden_mr_daily_scsn MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, STRT.n AS anchor_n,
           LAST(up.day) AS up_day, LAST(up.n) AS up_n,
           COUNT(up.*) AS n_up,
           LAST(up2.day) AS end_day, LAST(up2.n) AS end_n
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (STRT up+ up2+)
  DEFINE up AS up.n > PREV(up.n), up2 AS up2.n > PREV(up2.n)
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_sql_same_class_triple",
    oracle=_ISLANDS_CTE.format(max_user=28)
    + """
, isl2 AS (
  SELECT user_id, dir, grp, MIN(prev_day) AS sp,
         CAST(arg_min(prev_n, pos) AS BIGINT) AS av,
         MAX(day) AS ed, CAST(arg_max(n, pos) AS BIGINT) AS ev,
         CAST(COUNT(*) AS BIGINT) AS ln, MAX(pos) AS mpos
  FROM runs GROUP BY user_id, dir, grp
)
SELECT i.user_id AS user_id,
       CAST(i.sp AS BIGINT) AS anchor_day, i.av AS anchor_n,
       CAST(i.ln - 2 AS BIGINT) AS n_up,
       CAST(r1.prev_day AS BIGINT) AS up_end,
       CAST(r1.prev_n AS BIGINT) AS up_n,
       CAST(r2.prev_day AS BIGINT) AS up2_end,
       CAST(r2.prev_n AS BIGINT) AS up2_n,
       CAST(i.ed AS BIGINT) AS up3_end, i.ev AS up3_n
FROM isl2 i
JOIN runs r1 ON r1.user_id = i.user_id AND r1.dir = i.dir
            AND r1.grp = i.grp AND r1.pos = i.mpos - 1
JOIN runs r2 ON r2.user_id = i.user_id AND r2.dir = i.dir
            AND r2.grp = i.grp AND r2.pos = i.mpos
WHERE i.dir = 1 AND i.ln >= 3
ORDER BY user_id, anchor_day
""",
    category="window",
)
def win_pattern_sql_same_class_triple(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Same-class TRIPLE (r14 — closes the overlapping-pairs named
    limit): ``PATTERN (STRT up+ up2+ up3+)`` with all three steps
    DEFINEd ``n > PREV(n)``. The single-island greedy split is
    LEXICOGRAPHIC — each member, left to right, keeps the maximum the
    rest allows: over an ascent of n transitions Trino 468 assigns
    n−2 / 1 / 1 (reference surface: Trino 468 via
    /root/reference/tf/main.tf:82-114). Compiled by
    :func:`walden_spark.operators.pattern.match_split_pair`'s r14 run
    merge: the triple becomes one synthetic step with bounds {3,∞},
    inner boundaries recovered by two binned span joins. Matches are
    whole ascents, so SKIP PAST LAST ROW keeps every candidate; the
    oracle joins each ascent island (ln >= 3) to its last two
    transition rows. Fresh slice: user_id < 28."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=28).createOrReplaceTempView(
        "walden_mr_daily_sct"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, anchor_n, n_up, up_end, up_n,
       up2_end, up2_n, up3_end, up3_n
FROM walden_mr_daily_sct MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, STRT.n AS anchor_n,
           COUNT(up.*) AS n_up,
           LAST(up.day) AS up_end, LAST(up.n) AS up_n,
           LAST(up2.day) AS up2_end, LAST(up2.n) AS up2_n,
           LAST(up3.day) AS up3_end, LAST(up3.n) AS up3_n
  ONE ROW PER MATCH
  PATTERN (STRT up+ up2+ up3+)
  DEFINE up AS up.n > PREV(up.n), up2 AS up2.n > PREV(up2.n),
         up3 AS up3.n > PREV(up3.n)
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_sql_same_class_skip_to_mid",
    oracle=_ISLANDS_CTE.format(max_user=32).replace(
        "\nWITH daily", "\nWITH RECURSIVE daily", 1
    )
    + """
, isl2 AS (
  SELECT user_id, dir, grp, MAX(day) AS ed,
         CAST(arg_max(n, pos) AS BIGINT) AS ev,
         MAX(pos) AS mpos
  FROM runs GROUP BY user_id, dir, grp
), cand AS (
  SELECT r.user_id AS user_id,
         CAST(r.prev_day AS BIGINT) AS anchor_day,
         CAST(r.prev_n AS BIGINT) AS anchor_n,
         CAST(r2.day AS BIGINT) AS up_end,
         CAST(r2.n AS BIGINT) AS up_n,
         CAST(LEAST(2, i.mpos - r.pos) AS BIGINT) AS n_up,
         CAST(i.ed AS BIGINT) AS up2_end, i.ev AS up2_n,
         CAST(i.mpos - r.pos + 1 - LEAST(2, i.mpos - r.pos) AS BIGINT)
           AS n_up2
  FROM runs r
  JOIN isl2 i ON i.user_id = r.user_id AND i.dir = r.dir AND i.grp = r.grp
  JOIN runs r2 ON r2.user_id = r.user_id AND r2.dir = r.dir
              AND r2.grp = r.grp
              AND r2.pos = r.pos + LEAST(2, i.mpos - r.pos) - 1
  WHERE r.dir = 1 AND r.pos <= i.mpos - 1
), walk AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM cand c2 WHERE c2.user_id = c.user_id
      AND c2.anchor_day < c.anchor_day)
  UNION ALL
  SELECT n.* FROM walk w
  JOIN cand n ON n.user_id = w.user_id AND n.anchor_day >= w.up_end
  WHERE NOT EXISTS (
    SELECT 1 FROM cand m WHERE m.user_id = w.user_id
      AND m.anchor_day >= w.up_end
      AND m.anchor_day < n.anchor_day)
)
SELECT user_id, anchor_day, anchor_n, up_end, up_n, n_up,
       up2_end, up2_n, n_up2
FROM walk
ORDER BY user_id, anchor_day
""",
    category="window",
)
def win_pattern_sql_same_class_skip_to_mid(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Skip resume ON a non-final run member (r14 — closes the r13
    "skip resume ON a pair's first step" named limit): ``PATTERN (STRT
    up{1,2} up2+)`` with ``AFTER MATCH SKIP TO LAST up`` — the resume
    row is up's end, which the greedy split places MID-island, so the
    selection walks the RESCAN-complete candidate set
    (:func:`walden_spark.operators.pattern.match_split_pair` with
    ``skip_next=True``): the first successful anchor at-or-after each
    resume point is kept whether it sits on a boundary or mid-island —
    Trino 468 rescan-with-resume semantics (reference surface:
    /root/reference/tf/main.tf:82-114). A long ascent therefore chains
    matches two transitions apart (up takes its max 2, resume on its
    end re-anchors there). The oracle enumerates the suffix-anchor
    candidates relationally and replays the inclusive walk with a
    recursive CTE. Fresh slice: user_id < 32."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=32).createOrReplaceTempView(
        "walden_mr_daily_skm"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, anchor_n, up_end, up_n, n_up,
       up2_end, up2_n, n_up2
FROM walden_mr_daily_skm MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, STRT.n AS anchor_n,
           LAST(up.day) AS up_end, LAST(up.n) AS up_n,
           COUNT(up.*) AS n_up,
           LAST(up2.day) AS up2_end, LAST(up2.n) AS up2_n,
           COUNT(up2.*) AS n_up2
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO LAST up
  PATTERN (STRT up{1,2} up2+)
  DEFINE up AS up.n > PREV(up.n), up2 AS up2.n > PREV(up2.n)
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_sql_alt_same_class",
    oracle=_ISLANDS_CTE.format(max_user=34).replace(
        "\nWITH daily", "\nWITH RECURSIVE daily", 1
    )
    + """
, isl2 AS (
  SELECT user_id, dir, grp, MIN(prev_day) AS sp,
         CAST(arg_min(prev_n, pos) AS BIGINT) AS av,
         MAX(day) AS ed, CAST(arg_max(n, pos) AS BIGINT) AS ev,
         CAST(COUNT(*) AS BIGINT) AS ln, MAX(pos) AS mpos,
         CAST(arg_max(prev_day, pos) AS BIGINT) AS penult_day,
         CAST(arg_max(prev_n, pos) AS BIGINT) AS penult_n
  FROM runs GROUP BY user_id, dir, grp
), cand AS (
  SELECT u.user_id AS user_id, CAST(u.sp AS BIGINT) AS anchor_day,
         u.av AS anchor_n, 'dn' AS cls,
         CAST(u.ed AS BIGINT) AS up_end, u.ev AS up_n, u.ln AS n_up,
         CAST(d.ed AS BIGINT) AS dn_end,
         CAST(NULL AS BIGINT) AS up2_end,
         CAST(d.ed AS BIGINT) AS end_day, 0 AS bidx
  FROM isl2 u
  JOIN isl2 d ON d.user_id = u.user_id AND u.dir = 1 AND d.dir = -1
             AND d.sp = u.ed
  UNION ALL
  SELECT user_id, CAST(sp AS BIGINT), av, 'up2',
         penult_day, penult_n, ln - 1,
         CAST(NULL AS BIGINT), CAST(ed AS BIGINT),
         CAST(ed AS BIGINT), 1
  FROM isl2 WHERE dir = 1 AND ln >= 2
), pref AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM cand c2 WHERE c2.user_id = c.user_id
      AND c2.anchor_day = c.anchor_day AND c2.bidx < c.bidx)
), walk AS (
  SELECT p.* FROM pref p
  WHERE NOT EXISTS (
    SELECT 1 FROM pref p2 WHERE p2.user_id = p.user_id
      AND p2.anchor_day < p.anchor_day)
  UNION ALL
  SELECT n.* FROM walk w
  JOIN pref n ON n.user_id = w.user_id AND n.anchor_day > w.end_day
  WHERE NOT EXISTS (
    SELECT 1 FROM pref m WHERE m.user_id = w.user_id
      AND m.anchor_day > w.end_day
      AND m.anchor_day < n.anchor_day)
)
SELECT user_id, anchor_day, anchor_n, cls, up_end, up_n, n_up,
       dn_end, up2_end, end_day
FROM walk
ORDER BY user_id, anchor_day
""",
    category="window",
)
def win_pattern_sql_alt_same_class(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Same-class run INSIDE an alternation branch (r14 — shrinks the
    "pairs under alternation" named limit to PERMUTE/groups/cycles):
    ``PATTERN ((STRT up+ dn+) | (STRT up+ up2+))`` — both branches
    anchor on ascent starts, so SQL:2016 leftmost preference decides
    rows where both match (rise-then-fall wins; a terminal ascent with
    no following descent falls to the split branch). The run branch
    compiles through
    :func:`walden_spark.operators.pattern.match_split_pair` on the
    SAME shared islands frame the plain branch uses (one
    classification shuffle), and the leftmost-preference +
    skip-past walk layers are branch-agnostic. The oracle enumerates
    both branches' candidates relationally, applies the per-anchor
    preference, and replays the exclusive greedy walk with a
    recursive CTE. Fresh slice: user_id < 34."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=34).createOrReplaceTempView(
        "walden_mr_daily_alsc"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, anchor_n, cls, up_end, up_n, n_up,
       dn_end, up2_end, COALESCE(dn_end, up2_end) AS end_day
FROM walden_mr_daily_alsc MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, STRT.n AS anchor_n,
           CLASSIFIER() AS cls,
           LAST(up.day) AS up_end, LAST(up.n) AS up_n,
           COUNT(up.*) AS n_up,
           LAST(dn.day) AS dn_end, LAST(up2.day) AS up2_end
  ONE ROW PER MATCH
  PATTERN ((STRT up+ dn+) | (STRT up+ up2+))
  DEFINE up AS up.n > PREV(up.n), dn AS dn.n < PREV(dn.n),
         up2 AS up2.n > PREV(up2.n)
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_sql_cycles_skip_next_all_rows",
    oracle=_ISLANDS_CTE.format(max_user=38)
    + """
, isl2 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY sp) AS iseq
  FROM isl
), units AS (
  SELECT d.user_id, d.iseq AS useq, d.sp AS a_day, d.ed AS d_end,
         u.ed AS u_end
  FROM isl2 d
  JOIN isl2 u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
             AND u.iseq = d.iseq + 1
), cruns AS (
  SELECT *, useq - 2 * ROW_NUMBER()
              OVER (PARTITION BY user_id ORDER BY useq) AS grp
  FROM units
), suff AS (
  SELECT user_id, a_day, d_end,
         LAST_VALUE(u_end) OVER w AS e_day
  FROM cruns
  WINDOW w AS (PARTITION BY user_id, grp ORDER BY useq
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
), anchors AS (
  SELECT s.user_id, dd.day AS anchor_day, s.e_day
  FROM suff s JOIN daily dd
    ON dd.user_id = s.user_id
   AND dd.day >= s.a_day AND dd.day < s.d_end
), numbered AS (
  SELECT user_id, anchor_day, e_day,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY anchor_day)
           AS match_no
  FROM anchors
)
SELECT a.user_id AS user_id, CAST(a.match_no AS BIGINT) AS match_no,
       CAST(dd.day AS BIGINT) AS day, dd.n AS n,
       CASE WHEN dd.day = a.anchor_day THEN 'STRT'
            WHEN dr.dir = -1 THEN 'down' ELSE 'up' END AS cls
FROM numbered a
JOIN daily dd ON dd.user_id = a.user_id
             AND dd.day >= a.anchor_day AND dd.day <= a.e_day
LEFT JOIN dirs dr ON dr.user_id = dd.user_id AND dr.day = dd.day
ORDER BY user_id, match_no, day
""",
    category="window",
)
def win_pattern_sql_cycles_skip_next_all_rows(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rescan-mode ALL ROWS over a repeated group (r14 — closes the
    r13 named limit, the last skip×rows-mode composition for the tail
    form): ``PATTERN (STRT (down+ up+)+)`` with ``AFTER MATCH SKIP TO
    NEXT ROW`` and ``ALL ROWS PER MATCH``. The rescan's anchors
    (cycle boundaries + first-descent suffixes, enumerated complete by
    :func:`walden_spark.operators.pattern.match_cycles_skip_next`) are
    distinct per partition, so the anchor-ordered MATCH_NUMBER and the
    per-match span expansion of
    :func:`walden_spark.operators.pattern.expand_all_rows_cycles`
    compose without a rescan-specific arm — each overlapping match
    emits its own covered rows, classified by transition class.
    Oracle: the unit/run suffix construction joined back to the daily
    rows per anchor span. Fresh slice: user_id < 38."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=38).createOrReplaceTempView(
        "walden_mr_daily_csna"
    )
    return ws.sql(
        """
SELECT user_id, match_no, day, n, cls
FROM walden_mr_daily_csna MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES CLASSIFIER() AS cls, MATCH_NUMBER() AS match_no
  ALL ROWS PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (STRT (down+ up+)+)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n)
)
ORDER BY user_id, match_no, day
"""
    )


@query(
    "win_pattern_sql_cycles_mid",
    oracle=_ISLANDS_CTE.format(max_user=49).replace(
        "\nWITH daily", "\nWITH RECURSIVE daily", 1
    )
    + """
, isl2 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY sp) AS iseq
  FROM isl
), units AS (
  SELECT d.user_id AS user_id, d.iseq AS useq, d.sp AS a_day,
         d.ln AS d_ln, u.ln AS u_ln, u.ed AS u_end, u.ev AS u_ev
  FROM isl2 d
  JOIN isl2 u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
             AND u.iseq = d.iseq + 1
), cruns AS (
  SELECT *, useq - 2 * ROW_NUMBER()
              OVER (PARTITION BY user_id ORDER BY useq) AS grp
  FROM units
), runs2 AS (
  SELECT user_id, MIN(useq) AS first_iseq,
         CAST(SUM(d_ln) AS BIGINT) AS n_down,
         CAST(SUM(d_ln) + SUM(u_ln) AS BIGINT) AS cyc_trans,
         CAST(MAX(u_end) AS BIGINT) AS end_day,
         CAST(arg_max(u_ev, useq) AS BIGINT) AS end_n
  FROM cruns GROUP BY user_id, grp HAVING COUNT(*) >= 2
), cand AS (
  SELECT r.user_id AS user_id, CAST(p.sp AS BIGINT) AS anchor_day,
         p.av AS anchor_n, CAST(p.ed AS BIGINT) AS rise_end,
         r.n_down, r.end_day, r.end_n,
         CAST(1 + p.ln + r.cyc_trans AS BIGINT) AS span_rows
  FROM runs2 r
  JOIN isl2 p ON p.user_id = r.user_id AND p.dir = 1
             AND p.iseq = r.first_iseq - 1
), walk AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM cand c2 WHERE c2.user_id = c.user_id
      AND c2.anchor_day < c.anchor_day)
  UNION ALL
  SELECT n.* FROM walk w
  JOIN cand n ON n.user_id = w.user_id AND n.anchor_day > w.end_day
  WHERE NOT EXISTS (
    SELECT 1 FROM cand m WHERE m.user_id = w.user_id
      AND m.anchor_day > w.end_day
      AND m.anchor_day < n.anchor_day)
)
SELECT user_id, anchor_day, anchor_n, rise_end, n_down, end_day, end_n,
       span_rows
FROM walk
ORDER BY user_id, anchor_day
""",
    category="window",
)
def win_pattern_sql_cycles_mid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded repeated group MID-pattern (r13 — closes the
    ``{m,}``-mid-pattern named limit): ``PATTERN (STRT rise+
    (down+ up+){2,})`` — an ascent, then a MAXIMAL run of at least two
    descent-rebound cycles. Compiled by
    :func:`walden_spark.operators.pattern.match_cycles_mid`: the prefix
    chain, the cycle run (islands trick one level up), and the join on
    row adjacency all share one classified islands frame. Unlike the
    bare repeated tail, these matches can re-anchor ON a previous
    match's final row (a rise starting at the run's last rebound row),
    so the default SKIP PAST LAST ROW greedy walk runs — the oracle
    replays it with the recursive-CTE chain trick over the same
    island-level construction. Fresh slice: user_id < 49."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=49).createOrReplaceTempView(
        "walden_mr_daily_mcy"
    )
    return ws.sql(
        """
SELECT user_id, anchor_day, anchor_n, rise_end, n_down, end_day, end_n,
       span_rows
FROM walden_mr_daily_mcy MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES STRT.day AS anchor_day, STRT.n AS anchor_n,
           LAST(rise.day) AS rise_end, COUNT(down.*) AS n_down,
           LAST(up.day) AS end_day, LAST(up.n) AS end_n,
           COUNT(*) AS span_rows
  ONE ROW PER MATCH
  PATTERN (STRT rise+ (down+ up+){2,})
  DEFINE rise AS rise.n > PREV(rise.n), down AS down.n < PREV(down.n),
         up AS up.n > PREV(up.n)
)
ORDER BY user_id, anchor_day
"""
    )


@query(
    "win_pattern_sql_cycles_all_rows",
    oracle=_ISLANDS_CTE.format(max_user=36)
    + """
, isl2 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY sp) AS iseq
  FROM isl
), units AS (
  SELECT d.user_id AS user_id, d.iseq AS useq, d.sp AS a_day,
         d.ln AS d_ln, u.ln AS u_ln, u.ed AS u_end, u.ev AS u_ev
  FROM isl2 d
  JOIN isl2 u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
             AND u.iseq = d.iseq + 1
), cruns AS (
  SELECT *, useq - 2 * ROW_NUMBER()
              OVER (PARTITION BY user_id ORDER BY useq) AS grp
  FROM units
), runs2 AS (
  SELECT user_id, CAST(MIN(a_day) AS BIGINT) AS anchor_day,
         CAST(MAX(u_end) AS BIGINT) AS end_day,
         CAST(SUM(d_ln) AS BIGINT) AS n_down,
         CAST(arg_max(u_ev, useq) AS BIGINT) AS last_up_n
  FROM cruns GROUP BY user_id, grp
), m AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY anchor_day)
                 AS BIGINT) AS match_no
  FROM runs2
)
SELECT d.user_id AS user_id, m.match_no, d.day AS day, d.n AS n,
       CASE WHEN d.day = m.anchor_day THEN 'STRT'
            WHEN r.dir = -1 THEN 'down' ELSE 'up' END AS cls,
       m.n_down, m.last_up_n
FROM daily d
JOIN m ON d.user_id = m.user_id AND d.day BETWEEN m.anchor_day AND m.end_day
LEFT JOIN dirs r ON r.user_id = d.user_id AND r.day = d.day
ORDER BY d.user_id, m.match_no, d.day
""",
    category="window",
)
def win_pattern_sql_cycles_all_rows(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ALL ROWS PER MATCH over a repeated group (r13 — closes the
    named limit for the tail form): ``PATTERN (STRT (down+ up+)+)``
    with ALL ROWS emits every covered row of each maximal zigzag run;
    each row's TRANSITION CLASS names its cycle step (the cycle's
    classes must be pairwise distinct — validated), with
    MATCH_NUMBER(), FINAL COUNT(down.*), and FINAL LAST(up.n) carried
    as match constants
    (:func:`walden_spark.operators.pattern.expand_all_rows_cycles` —
    the binned span join plus one lag window on the row side). Runs
    never overlap, so the default skip mode needs no walk; the oracle
    joins each run's span back to the daily rows with the same
    class-CASE. Fresh slice: user_id < 36."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=36).createOrReplaceTempView(
        "walden_mr_daily_car"
    )
    return ws.sql(
        """
SELECT user_id, match_no, day, n, cls, n_down, last_up_n
FROM walden_mr_daily_car MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES CLASSIFIER() AS cls, MATCH_NUMBER() AS match_no,
           FINAL COUNT(down.*) AS n_down, FINAL LAST(up.n) AS last_up_n
  ALL ROWS PER MATCH
  PATTERN (STRT (down+ up+)+)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n)
)
ORDER BY user_id, match_no, day
"""
    )


@query(
    "win_pattern_sql_cycles_mid_all_rows",
    oracle=_ISLANDS_CTE.format(max_user=26).replace(
        "\nWITH daily", "\nWITH RECURSIVE daily", 1
    )
    + """
, isl2 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY sp) AS iseq
  FROM isl
), units AS (
  SELECT d.user_id AS user_id, d.iseq AS useq, d.sp AS a_day,
         d.ln AS d_ln, u.ln AS u_ln, u.ed AS u_end, u.ev AS u_ev
  FROM isl2 d
  JOIN isl2 u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
             AND u.iseq = d.iseq + 1
), cruns AS (
  SELECT *, useq - 2 * ROW_NUMBER()
              OVER (PARTITION BY user_id ORDER BY useq) AS grp
  FROM units
), runs2 AS (
  SELECT user_id, MIN(useq) AS first_iseq,
         CAST(SUM(d_ln) AS BIGINT) AS n_down,
         CAST(SUM(d_ln) + SUM(u_ln) AS BIGINT) AS cyc_trans,
         CAST(MAX(u_end) AS BIGINT) AS end_day
  FROM cruns GROUP BY user_id, grp HAVING COUNT(*) >= 2
), cand AS (
  SELECT r.user_id AS user_id, CAST(p.sp AS BIGINT) AS anchor_day,
         CAST(p.ed AS BIGINT) AS rise_end,
         CAST(p.ln AS BIGINT) AS n_rise, r.n_down, r.end_day,
         CAST(1 + p.ln + r.cyc_trans AS BIGINT) AS span_rows
  FROM runs2 r
  JOIN isl2 p ON p.user_id = r.user_id AND p.dir = 1
             AND p.iseq = r.first_iseq - 1
), walk AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM cand c2 WHERE c2.user_id = c.user_id
      AND c2.anchor_day < c.anchor_day)
  UNION ALL
  SELECT n.* FROM walk w
  JOIN cand n ON n.user_id = w.user_id AND n.anchor_day > w.end_day
  WHERE NOT EXISTS (
    SELECT 1 FROM cand m WHERE m.user_id = w.user_id
      AND m.anchor_day > w.end_day
      AND m.anchor_day < n.anchor_day)
), m AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY anchor_day)
                 AS BIGINT) AS match_no
  FROM walk
)
SELECT d.user_id AS user_id, m.match_no, d.day AS day, d.n AS n,
       CASE WHEN d.day = m.anchor_day THEN 'STRT'
            WHEN d.day <= m.rise_end THEN 'rise'
            WHEN r.dir = -1 THEN 'down' ELSE 'up' END AS cls,
       m.n_rise, m.n_down, m.span_rows
FROM daily d
JOIN m ON d.user_id = m.user_id AND d.day BETWEEN m.anchor_day AND m.end_day
LEFT JOIN dirs r ON r.user_id = d.user_id AND r.day = d.day
ORDER BY d.user_id, m.match_no, d.day
""",
    category="window",
)
def win_pattern_sql_cycles_mid_all_rows(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ALL ROWS over a mid-pattern unbounded group (r13): ``PATTERN
    (STRT rise+ (down+ up+){2,})`` with ALL ROWS — the prefix region
    classifies by its step-end bound, the run region by each row's
    transition class, per-step FINAL measures mix the plain (_len) and
    cycle (_total_len) forms, and COUNT(*) spans prefix + run.
    Selection first (these matches can re-anchor on a previous match's
    final row), expansion second — the oracle replays the recursive
    greedy walk, ranks the kept matches, and joins their spans back to
    the daily rows with the same region/class CASE. Fresh slice:
    user_id < 26."""
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    _daily_counts(spark, sf_dir, max_user=26).createOrReplaceTempView(
        "walden_mr_daily_mcar"
    )
    return ws.sql(
        """
SELECT user_id, match_no, day, n, cls, n_rise, n_down, span_rows
FROM walden_mr_daily_mcar MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY day
  MEASURES CLASSIFIER() AS cls, MATCH_NUMBER() AS match_no,
           FINAL COUNT(rise.*) AS n_rise, FINAL COUNT(down.*) AS n_down,
           COUNT(*) AS span_rows
  ALL ROWS PER MATCH
  PATTERN (STRT rise+ (down+ up+){2,})
  DEFINE rise AS rise.n > PREV(rise.n), down AS down.n < PREV(down.n),
         up AS up.n > PREV(up.n)
)
ORDER BY user_id, match_no, day
"""
    )
