"""Scale probe for the r12 pattern tiers: ranged inline groups
(alternation of exact counts), NESTED groups, and the alternation
compiler that backs the streaming alternation matcher.

Same harness as pattern_scale_probe: the sf0.1 per-user daily counts
replicate K times under fresh user ids (replication cost excluded via
localCheckpoint), then each SQL-surface compile is timed end-to-end.

Scale shape under test: a ranged/nested group expands to B alternation
branches, but the classification shuffle — the only stage that touches
ROWS — runs ONCE (match_skip_next/match_any share one checkpointed
islands frame); each branch adds only a chain of ISLAND joins, and
islands are at most one row per transition-class change, far fewer
than rows. So wall should grow ~linearly in K with a bounded increment
per branch, NOT multiplicatively in branches × rows.

Usage: python tools/ranged_scale_probe.py [K ...]   (default 1 10 50)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

RANGED = """
SELECT user_id, anchor_day, n_up, last_dip_day, end_day
FROM {view} MATCH_RECOGNIZE (
  PARTITION BY user_id ORDER BY day
  MEASURES STRT.day AS anchor_day, COUNT(up.*) AS n_up,
           LAST(dip.day) AS last_dip_day, LAST(up2.day) AS end_day
  ONE ROW PER MATCH
  PATTERN (STRT down+ (up+ dip+){{1,2}} up2+)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n),
         dip AS dip.n < PREV(dip.n), up2 AS up2.n > PREV(up2.n)
)"""

NESTED = """
SELECT user_id, anchor_day, n_up
FROM {view} MATCH_RECOGNIZE (
  PARTITION BY user_id ORDER BY day
  MEASURES STRT.day AS anchor_day, COUNT(up.*) AS n_up
  ONE ROW PER MATCH
  PATTERN (STRT down+ ((up+ dip+){{2}}){{2}} up2+)
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n),
         dip AS dip.n < PREV(dip.n), up2 AS up2.n > PREV(up2.n)
)"""

# the batch relation the streaming alternation matcher reproduces
ALTERNATION = """
SELECT user_id, anchor_day, shape
FROM {view} MATCH_RECOGNIZE (
  PARTITION BY user_id ORDER BY day
  MEASURES STRT.day AS anchor_day, CLASSIFIER() AS shape
  ONE ROW PER MATCH
  PATTERN ((STRT down+ up+) | (STRT down+ flat+))
  DEFINE down AS down.n < PREV(down.n), up AS up.n > PREV(up.n),
         flat AS flat.n = PREV(flat.n)
)"""

# wide ranged group: 4 alternation branches ({1,4}) — the branch-count
# increment, same rows
RANGED_WIDE = RANGED.replace("{{1,2}}", "{{1,4}}")


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 10, 50]
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ranged_scale_probe")
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
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    for k in ks:
        daily = (
            daily0.crossJoin(
                F.broadcast(spark.range(k).withColumnRenamed("id", "rep"))
            )
            .select(
                (F.col("user_id") + F.col("rep") * 1_000_000).alias("user_id"),
                "day",
                "n",
            )
            .repartition(32)
            .localCheckpoint(eager=True)
        )
        rows = daily.count()
        daily.createOrReplaceTempView("probe_daily")
        out = [f"K={k:3d} rows={rows:9d}"]
        for label, sql in (
            ("ranged{1,2}", RANGED),
            ("ranged{1,4}", RANGED_WIDE),
            ("nested", NESTED),
            ("alternation", ALTERNATION),
        ):
            t0 = time.time()
            n = ws.sql(sql.format(view="probe_daily")).count()
            out.append(f"{label}={time.time() - t0:6.2f}s (m {n})")
        print(" ".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
