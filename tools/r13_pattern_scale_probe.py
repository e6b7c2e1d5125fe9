"""Scale probe for the r13 pattern tiers: same-class pair split
(one-row + all-rows), mixed PREV+constant DEFINEs, mid-pattern
unbounded groups, and ALL ROWS over repeated-group tails.

Same harness as ranged_scale_probe: the sf0.1 per-user daily counts
replicate K times under fresh user ids (replication cost excluded via
localCheckpoint), then each SQL-surface compile runs end-to-end.

Scale shapes under test:
* split pair — one extra binned span join touching only matched-span
  rows, on top of the plain chain;
* mixed defines — identical pipeline to threshold classes, the
  classifier CASE just carries the runtime disjointness guard
  (codegen'd per-transition arithmetic, no extra shuffle);
* cycles_mid — the cycle-run machinery plus two (partition, order)
  equi joins between match-sized frames;
* cycles all-rows — output grows with covered-span rows; the expansion
  is the binned span join plus ONE lag window on the row side.

Usage: python tools/r13_pattern_scale_probe.py [K ...]  (default 1 10 50)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

SAME_CLASS = """
SELECT user_id, anchor_day, up_day, n_up, end_day
FROM {view} MATCH_RECOGNIZE (
  PARTITION BY user_id ORDER BY day
  MEASURES STRT.day AS anchor_day, LAST(up.day) AS up_day,
           COUNT(up.*) AS n_up, LAST(up2.day) AS end_day
  ONE ROW PER MATCH
  PATTERN (STRT up+ up2+)
  DEFINE up AS up.n > PREV(up.n), up2 AS up2.n > PREV(up2.n)
)"""

SAME_CLASS_ALL_ROWS = """
SELECT user_id, mno, day, cls
FROM {view} MATCH_RECOGNIZE (
  PARTITION BY user_id ORDER BY day
  MEASURES CLASSIFIER() AS cls, MATCH_NUMBER() AS mno
  ALL ROWS PER MATCH
  PATTERN (STRT up+ up2+)
  DEFINE up AS up.n > PREV(up.n), up2 AS up2.n > PREV(up2.n)
)"""

MIXED = """
SELECT user_id, anchor_day, peak_n, n_quiet
FROM {view} MATCH_RECOGNIZE (
  PARTITION BY user_id ORDER BY day
  MEASURES STRT.day AS anchor_day, LAST(up.e) AS peak_n,
           COUNT(flr.*) AS n_quiet
  ONE ROW PER MATCH
  PATTERN (STRT up+ flr+)
  DEFINE up AS up.e > PREV(up.e), flr AS flr.e = 0
)"""

CYCLES_MID = """
SELECT user_id, anchor_day, n_down, end_day
FROM {view} MATCH_RECOGNIZE (
  PARTITION BY user_id ORDER BY day
  MEASURES STRT.day AS anchor_day, COUNT(down.*) AS n_down,
           LAST(up.day) AS end_day
  ONE ROW PER MATCH
  PATTERN (STRT rise+ (down+ up+){{2,}})
  DEFINE rise AS rise.n > PREV(rise.n), down AS down.n < PREV(down.n),
         up AS up.n > PREV(up.n)
)"""

CYCLES_ALL_ROWS = """
SELECT user_id, mno, day, cls
FROM {view} MATCH_RECOGNIZE (
  PARTITION BY user_id ORDER BY day
  MEASURES CLASSIFIER() AS cls, MATCH_NUMBER() AS mno
  ALL ROWS PER MATCH
  PATTERN (STRT (down+ up+)+)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n)
)"""


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 10, 50]
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("r13_pattern_scale_probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from walden_spark.session import WaldenSession

    ws = WaldenSession(spark)
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    daily0 = events.groupBy(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("day"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("e"),
    )

    for k in ks:
        daily = (
            daily0.crossJoin(
                F.broadcast(spark.range(k).withColumnRenamed("id", "rep"))
            )
            .select(
                (F.col("user_id") + F.col("rep") * 1_000_000).alias("user_id"),
                "day",
                "n",
                "e",
            )
            .repartition(32)
            .localCheckpoint(eager=True)
        )
        rows = daily.count()
        daily.createOrReplaceTempView("probe_daily13")
        out = [f"K={k:3d} rows={rows:9d}"]
        for label, sql in (
            ("split_pair", SAME_CLASS),
            ("split_all_rows", SAME_CLASS_ALL_ROWS),
            ("mixed_define", MIXED),
            ("cycles_mid", CYCLES_MID),
            ("cycles_all_rows", CYCLES_ALL_ROWS),
        ):
            t0 = time.time()
            n = ws.sql(sql.format(view="probe_daily13")).count()
            out.append(f"{label}={time.time() - t0:6.2f}s (m {n})")
        print(" ".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
