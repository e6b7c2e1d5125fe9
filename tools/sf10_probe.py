"""sf10-equivalent scale probe (VERDICT r08 #4).

Extends the standing sf1 curve (facts ×10) to facts ×100 over sf0.1
for the two DATA-BOUND headline queries — `tpch_q18` (3.6× at ×10, the
fact-fact semi-join) and `dedup_minhash_lsh` (2.6× at ×10, candidate
growth) — and A/Bs the bucketed-table variant of q18: lineitem+orders
bucketed on orderkey turn both the HAVING-subquery groupBy and the
fact-fact joins into exchange-free operations (bucketing IS the
pre-shuffle, paid once at write time — the 1000-executor strategy for
a repeatedly-joined fact pair).

Replication mirrors tools/sf1_probe.py exactly (key offsets preserve
the orders⋈lineitem relation; per-word replica tags keep near-dup
structure linear); only the three fact tables are scaled, dims copied.

    python tools/sf10_probe.py [--rebuild]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
# REPLICAS=100 over sf0.1 = the standing facts-×100 probe; r11 adds a
# ×1000 stretch decade (WALDEN_PROBE_REPLICAS=1000, ~600M lineitem
# rows — TPC-H SF100-equivalent in the 128 GiB sandbox)
REPLICAS = int(os.environ.get("WALDEN_PROBE_REPLICAS", "100"))
DST = f"/tmp/walden_sf10" if REPLICAS == 100 else f"/tmp/walden_x{REPLICAS}"
REPS = int(os.environ.get("WALDEN_PROBE_REPS", "2"))


def build(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    okey_span = (
        spark.read.parquet(f"{SRC}/orders.parquet")
        .agg(F.max("o_orderkey")).collect()[0][0] + 1
    )
    did_span = (
        spark.read.parquet(f"{SRC}/documents.parquet")
        .agg(F.max("doc_id")).collect()[0][0] + 1
    )

    def replicate(table: str, offsets: dict[str, int], perturb_text: bool = False):
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        # one explode per source row beats a 100-way union plan
        rep = df.withColumn("_k", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))))
        for col, span in offsets.items():
            rep = rep.withColumn(col, F.col(col) + F.col("_k").cast("bigint") * span)
        if perturb_text:
            rep = rep.withColumn(
                "text",
                F.when(F.col("_k") == 0, F.col("text")).otherwise(
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(
                                F.lit("k"), F.col("_k").cast("string"), w
                            ),
                        ),
                    )
                ),
            )
        (
            rep.drop("_k")
            .repartition(64)
            .write.mode("overwrite")
            .parquet(f"{DST}/{table}.parquet")
        )

    replicate("orders", {"o_orderkey": okey_span})
    replicate("lineitem", {"l_orderkey": okey_span})
    if REPLICAS <= 100:
        replicate("documents", {"doc_id": did_span}, perturb_text=True)
    else:  # ×1000 stretch probes only the fact-pair queries
        shutil.copy(f"{SRC}/documents.parquet", f"{DST}/documents.parquet")
    for t in ("customer", "supplier", "part", "nation", "region", "events", "embeddings"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")


def bucket_tables(spark, buckets: int = 32) -> None:
    """Write lineitem+orders as orderkey-bucketed managed tables —
    the one-time pre-shuffle the bucketed variants amortize. Goes
    through the maintained-ingest API (r10), which also clears the
    stale managed dirs a previous session's run leaves behind."""
    from walden_spark.catalog import ensure_bucketed_table

    t0 = time.perf_counter()
    ensure_bucketed_table(
        spark,
        "sf10_lineitem_b",
        lambda: spark.read.parquet(f"{DST}/lineitem.parquet"),
        ["l_orderkey"],
        n_buckets=buckets,
        sort_cols=["l_orderkey"],
        source=DST,
    )
    ensure_bucketed_table(
        spark,
        "sf10_orders_b",
        lambda: spark.read.parquet(f"{DST}/orders.parquet"),
        ["o_orderkey"],
        n_buckets=buckets,
        sort_cols=["o_orderkey"],
        source=DST,
    )
    print(f"bucket build: {time.perf_counter() - t0:.1f}s", flush=True)


def q18_on(spark, lineitem, orders, customer):
    from pyspark.sql import functions as F

    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            big.withColumnRenamed("l_orderkey", "big_key"),
            F.col("o_orderkey") == F.col("big_key"),
            "left_semi",
        )
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "c_name", "c_custkey", "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"), "o_totalprice",
        )
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


def q21_on(spark, lineitem, orders, supplier):
    """Q21 shape (suppliers who kept orders waiting) — mirrors
    queries/tpch.py::tpch_q21_bucketed so the probe A/Bs the exact
    engine plan: every orderkey stage consumes the bucketing."""
    from pyspark.sql import functions as F

    l1 = (
        lineitem.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .select("l_orderkey", "l_suppkey")
    )
    l1_keys = l1.select(F.col("l_orderkey").alias("k_orderkey")).distinct()
    multi_supp = (
        lineitem.join(l1_keys, F.col("k_orderkey") == F.col("l_orderkey"), "left_semi")
        .select("l_orderkey", "l_suppkey").distinct()
        .groupBy(F.col("l_orderkey").alias("m_orderkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
        .filter(F.col("n_supp") > 1)
        .select("m_orderkey")
    )
    single_late = (
        l1.distinct()
        .groupBy(F.col("l_orderkey").alias("s_orderkey"))
        .agg(F.count(F.lit(1)).alias("n_late"))
        .filter(F.col("n_late") == 1)
        .select("s_orderkey")
    )
    return (
        l1.join(multi_supp, F.col("m_orderkey") == F.col("l_orderkey"), "left_semi")
        .join(single_late, F.col("s_orderkey") == F.col("l_orderkey"), "left_semi")
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


def q3_on(spark, lineitem, orders, customer):
    """Q3 shape — mirrors queries/tpch.py::tpch_q3_bucketed (r11
    session 3): customer broadcasts, fact-fact join and the
    orderkey-containing aggregate both consume the bucketing."""
    from pyspark.sql import functions as F

    return (
        F.broadcast(
            customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
        )
        .join(
            orders.filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            lineitem.filter(
                F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "orderdate", "l_orderkey")
        .limit(10)
    )


def q10_on(spark, lineitem, orders, customer, nation):
    """Q10 shape — mirrors queries/tpch.py::tpch_q10_bucketed."""
    from pyspark.sql import functions as F

    return (
        F.broadcast(customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey"))
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            lineitem.filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def main() -> None:
    from walden_spark.registry import load_all
    from walden_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="sf10_probe", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    if "--rebuild" in sys.argv or not os.path.isdir(f"{DST}/lineitem.parquet"):
        build(spark)
    reg = load_all()
    floors: dict[str, float] = {}
    headliners = (
        ("tpch_q18", "tpch_q21", "tpch_q3", "tpch_q10", "dedup_minhash_lsh")
        if REPLICAS <= 100
        else ("tpch_q18", "tpch_q21")
    )
    for name in headliners:
        best = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            reg[name].fn(spark, DST).write.format("noop").mode("overwrite").save()
            best_t = time.perf_counter() - t0
            best = best_t if best is None else min(best, best_t)
        floors[name] = round(best, 3)
        print(name, floors[name], flush=True)

    # bucketed A/B: same query shapes, orderkey-bucketed tables shared
    # by BOTH fact-pair queries (the maintained-layout story)
    bucket_tables(spark)
    cust = spark.read.parquet(f"{DST}/customer.parquet")
    supp = spark.read.parquet(f"{DST}/supplier.parquet")
    nat = spark.read.parquet(f"{DST}/nation.parquet")
    li_b, od_b = spark.table("sf10_lineitem_b"), spark.table("sf10_orders_b")
    exchanges: dict[str, int] = {}
    bucketed_arms = [
        ("tpch_q18_bucketed", lambda: q18_on(spark, li_b, od_b, cust)),
        ("tpch_q21_bucketed", lambda: q21_on(spark, li_b, od_b, supp)),
    ]
    if REPLICAS <= 100:
        bucketed_arms += [
            ("tpch_q3_bucketed", lambda: q3_on(spark, li_b, od_b, cust)),
            ("tpch_q10_bucketed", lambda: q10_on(spark, li_b, od_b, cust, nat)),
        ]
    for name, mk in bucketed_arms:
        plan = mk()._jdf.queryExecution().executedPlan().toString()
        exchanges[name] = plan.count("Exchange hashpartitioning")
        for _ in range(REPS):
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            floors[name] = min(floors.get(name, dt), round(dt, 3))
        print(name, floors[name], flush=True)
    print(
        json.dumps(
            {
                "sf": f"facts x{REPLICAS} over sf0.1",
                "floors": floors,
                "bucketed_exchange_counts": exchanges,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
