"""Scale probe for the r11 session-3 operators (BENCH_NOTES evidence
that the claimed scale shapes hold):

Probe 1 — match_skip_next at K× users (sf0.1 daily counts replicated
under fresh ids): the suffix-anchor expansion adds one binned span
join + one window over the joined frame on top of match_pattern, so
wall should track the match pipeline ~linearly in rows; the output is
larger than the maximal match set (one row per suffix anchor) by
construction.

Probe 2 — triangle_counts at N nodes (~6N synthetic edges): the
degree-oriented wedge join should keep wall near-linear in edges on a
skew-free graph, and the ORIENTATION is what bounds the wedge count on
the hub variant (one vertex touching N/50 others) — probed with and
without a hub.

Probe 3 — the DSIR scoring pipeline at K× documents (sf0.1 documents
replicated under fresh ids): bucket models are fixed-size (B=512)
aggregates and the weight join is broadcast, so wall should track the
token stream linearly.

Usage: python tools/session3_scale_probe.py [K ...]   (default 1 10 50)
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
        .appName("session3_scale_probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from walden_spark.operators.graph import triangle_counts
    from walden_spark.operators.pattern import (
        DOWN, UP, Step, match_cycles_skip_next, match_pattern,
        match_skip_next,
    )

    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    daily0 = events.groupBy(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    steps = [Step("down", DOWN), Step("up", UP)]
    print("== probe 1: match_skip_next at Kx users (sf0.1 daily counts) ==")
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
        t0 = time.time()
        base = match_pattern(daily, "user_id", "day", "n", steps).count()
        t1 = time.time()
        sn = match_skip_next(daily, "user_id", "day", "n", steps).count()
        t2 = time.time()
        csn = match_cycles_skip_next(
            daily, "user_id", "day", "n", steps
        ).count()
        t3 = time.time()
        print(
            f"K={k:3d} rows={rows:9d} match={t1 - t0:6.2f}s "
            f"({base} maximal) skip_next={t2 - t1:6.2f}s ({sn} anchors) "
            f"cycles_skip_next={t3 - t2:6.2f}s ({csn} anchors)"
        )

    print("== probe 2: triangle_counts at N nodes (~6N synthetic edges) ==")
    for n_nodes, hub in ((10_000, False), (100_000, False), (1_000_000, False),
                         (100_000, True)):
        e = spark.range(6 * n_nodes).select(
            (F.col("id") % n_nodes).alias("a"),
            ((F.col("id") * 2654435761 + F.abs(F.hash(F.col("id"))))
             % n_nodes).alias("b"),
        )
        if hub:
            e = e.unionAll(
                spark.range(n_nodes // 50).select(
                    F.lit(0).cast("long").alias("a"),
                    (F.col("id") + 1).alias("b"),
                )
            )
        edges = (
            e.filter(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
            )
            .distinct()
            .repartition(32)
            .localCheckpoint(eager=True)
        )
        m = edges.count()
        t0 = time.time()
        out = triangle_counts(edges, "a", "b")
        tri_total = out.agg(F.sum("triangles")).collect()[0][0]
        t1 = time.time()
        print(
            f"N={n_nodes:8d} hub={str(hub):5s} edges={m:9d} "
            f"wall={t1 - t0:6.2f}s triangle_corners={tri_total}"
        )

    print("== probe 3: DSIR scoring at Kx documents (sf0.1) ==")
    docs0 = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    for k in ks:
        docs = (
            docs0.crossJoin(
                F.broadcast(spark.range(k).withColumnRenamed("id", "rep"))
            )
            .select(
                (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
                "lang",
                "text",
            )
            .repartition(32)
            .localCheckpoint(eager=True)
        )
        n_docs = docs.count()
        t0 = time.time()
        # tokenize inline — mirrors text_dsir_select
        tok = docs.select(
            "doc_id",
            "lang",
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"),
                lambda w: F.length(w) > 0,
            ).alias("ws"),
        )
        bg = (
            tok.select(
                "doc_id",
                "lang",
                F.explode(
                    F.expr(
                        "zip_with(slice(ws, 1, greatest(size(ws) - 1, 0)), "
                        "slice(ws, 2, greatest(size(ws) - 1, 0)), "
                        "(a, b) -> concat(a, ' ', b))"
                    )
                ).alias("g"),
            )
            .select(
                "doc_id",
                "lang",
                (
                    F.conv(F.substring(F.md5(F.col("g")), 1, 15), 16, 10)
                    .cast("bigint")
                    % 512
                ).alias("b"),
            )
            .persist()
        )
        raw_c = bg.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
        tgt_c = (
            bg.filter(F.col("lang") == "en")
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("ct"))
        )
        tot = bg.agg(
            F.count(F.lit(1)).alias("r_tot"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias(
                "t_tot"
            ),
        )
        w = (
            raw_c.join(tgt_c, "b", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "b",
                (
                    F.expr(
                        "((coalesce(ct, 0) + 1) * 1000000) DIV (t_tot + 512)"
                    )
                    - F.expr("((cr + 1) * 1000000) DIV (r_tot + 512)")
                ).alias("wq"),
            )
        )
        scored = (
            bg.join(F.broadcast(w), "b")
            .groupBy("doc_id")
            .agg(F.sum("wq").alias("score_q"))
        )
        n_scored = scored.count()
        t1 = time.time()
        bg.unpersist()
        print(
            f"K={k:3d} docs={n_docs:8d} scored={n_scored:8d} "
            f"wall={t1 - t0:6.2f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
