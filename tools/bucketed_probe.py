"""Bucketed-layout probe: quantify what co-bucketing buys the
fact-to-fact joins (the 100TB layout decision SCALING.md argues for).

Generates TPC-H at --sf, writes lineitem/orders twice — plain parquet
tables and tables bucketed by orderkey into --buckets buckets — then
runs the q18-shape (orders ⋈ big-lineitem-agg) and q21-shape
(three-pass lineitem self-coordination) against both layouts and
prints one JSON line with timings and the Exchange counts per plan.
The bucketed plans must show fewer shuffle Exchanges; wall-clock gains
grow with data (at sf1 the join inputs are small enough that shuffle
cost is a minor term — the Exchange delta is the structural evidence).

Usage: python tools/bucketed_probe.py [--sf 1.0] [--buckets 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    return plan.count("Exchange hashpartitioning")


def main() -> None:
    from pyspark.sql import functions as F

    from walden_spark.catalog import write_bucketed_table
    from walden_spark.session import get_spark
    from walden_spark.sources.datagen import TpchGen

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import tempfile

    spark = get_spark(
        app_name="walden_bucketed_probe",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        warehouse_dir=tempfile.mkdtemp(prefix="walden_bucketed_wh_"),
        # at 100TB neither fact side broadcasts — model that here, or
        # AQE broadcast-converts the sf1 join and hides the comparison
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    gen = TpchGen(spark, sf=args.sf, seed=42)
    li, od = gen.table("lineitem"), gen.table("orders")

    for name in ("bp_li_plain", "bp_od_plain", "bp_li_bucketed", "bp_od_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    li.write.mode("overwrite").saveAsTable("bp_li_plain")
    od.write.mode("overwrite").saveAsTable("bp_od_plain")
    write_bucketed_table(li, "bp_li_bucketed", ["l_orderkey"], args.buckets)
    write_bucketed_table(od, "bp_od_bucketed", ["o_orderkey"], args.buckets)

    def q18_shape(li_t: str, od_t: str):
        l = spark.table(li_t)
        o = spark.table(od_t)
        big = (
            l.groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
            .filter(F.col("qty") > 300)
        )
        return (
            o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
            .select("o_orderkey", "o_totalprice", "qty")
        )

    def fact_fact_join(li_t: str, od_t: str):
        l = spark.table(li_t)
        o = spark.table(od_t)
        return (
            l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("l_extendedprice").alias("rev"))
        )

    results = {}
    for label, (li_t, od_t) in {
        "plain": ("bp_li_plain", "bp_od_plain"),
        "bucketed": ("bp_li_bucketed", "bp_od_bucketed"),
    }.items():
        for qname, builder in (("q18_shape", q18_shape), ("fact_fact", fact_fact_join)):
            df = builder(li_t, od_t)
            n_exchange = _exchanges(df)
            df.write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            builder(li_t, od_t).write.format("noop").mode("overwrite").save()
            results[f"{qname}_{label}"] = {
                "sec": round(time.perf_counter() - t0, 3),
                "exchanges": n_exchange,
            }

    print(json.dumps({"sf": args.sf, "buckets": args.buckets, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
