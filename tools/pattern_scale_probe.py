"""Scale probe for the late-r11 operators: pattern machinery and
PageRank (BENCH_NOTES evidence that the claimed scale shapes hold).

Probe 1 — pattern pipeline at K× users: the sf0.1 per-user daily
counts are replicated K times under fresh user ids, then each stage is
timed end-to-end (count() materialization):
  * match_pattern (STRT DOWN+ UP+)      — classify + islands + chain
  * + select_skip_past                  — the greedy pandas walk
  * + expand_all_rows                   — the ALL ROWS span join-back
  * match_cycles (DOWN+ UP+)+           — unit grouping one level up
Expectation: wall grows ~linearly in input rows (the classification
shuffle dominates); the selection/expansion stages add a bounded
increment because matches ≪ rows.

Probe 2 — PageRank at growing node vocabulary: a synthetic power-law-ish
edge list (spark.range-derived, no data files) with N nodes and ~8N
edges, 3 iterations, broadcast vs shuffle score join.

Usage: python tools/pattern_scale_probe.py [K ...]   (default 1 10 50)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 10, 50]
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("pattern_scale_probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from walden_spark.operators.pattern import (
        DOWN, UP, Step, expand_all_rows, match_cycles, match_pattern,
        select_skip_past,
    )

    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    daily0 = events.groupBy(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    steps = [Step("down", DOWN), Step("up", UP)]
    print("== probe 1: pattern pipeline at Kx users (sf0.1 daily counts) ==")
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
            .localCheckpoint(eager=True)  # exclude replication cost
        )
        rows = daily.count()
        t0 = time.time()
        m = match_pattern(daily, "user_id", "day", "n", steps)
        n_matches = m.count()
        t1 = time.time()
        sel = select_skip_past(
            match_pattern(daily, "user_id", "day", "n", steps),
            "user_id", "anchor_day", "up_end",
        )
        n_sel = sel.count()
        t2 = time.time()
        exp = expand_all_rows(
            daily, match_pattern(daily, "user_id", "day", "n", steps),
            "user_id", "day", steps,
        )
        n_exp = exp.count()
        t3 = time.time()
        cyc = match_cycles(daily, "user_id", "day", "n", steps)
        n_cyc = cyc.count()
        t4 = time.time()
        print(
            f"K={k:3d} rows={rows:9d} matches={n_matches:8d} "
            f"match={t1 - t0:6.2f}s skip_past={t2 - t1:6.2f}s "
            f"(kept {n_sel}) all_rows={t3 - t2:6.2f}s (out {n_exp}) "
            f"cycles={t4 - t3:6.2f}s (runs {n_cyc})"
        )

    print("== probe 2: pagerank at N nodes (~8N synthetic edges, 3 iters) ==")
    from walden_spark.operators.graph import pagerank

    for n_nodes, bcast in ((1_000, True), (100_000, True), (100_000, False)):
        edges = (
            spark.range(8 * n_nodes)
            .select(
                (F.col("id") % n_nodes).alias("src"),
                # deterministic pseudo-random destination, power-ish skew
                (
                    F.abs(F.hash(F.col("id"))) % (F.col("id") % 97 + 3)
                    * (n_nodes // 100 + 1)
                    % n_nodes
                ).alias("dst"),
                (F.col("id") % 7 + 1).alias("w"),
            )
            .repartition(32)
            .localCheckpoint(eager=True)
        )
        nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
        t0 = time.time()
        pr = pagerank(edges, nodes, broadcast_scores=bcast)
        total = pr.agg(F.sum("pr_scaled")).collect()[0][0]
        t1 = time.time()
        print(
            f"N={n_nodes:7d} broadcast={str(bcast):5s} "
            f"wall={t1 - t0:6.2f}s mass={total}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
