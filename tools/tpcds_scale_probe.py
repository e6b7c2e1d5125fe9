"""TPC-DS q29 3-fact-chain scale probe (VERDICT r10 #5): facts ×100.

Generates the TPC-DS catalog at SF=1.0 (100× the registry's SF=0.01 —
store_sales 2.88M / catalog_sales 1.44M / store_returns ~290k rows),
materializes the three facts as parquet so generation cost never
pollutes the timings, then A/Bs the buy → return → repurchase chain:

* plain: parquet reads, Catalyst picks the join plan — at this scale
  that is fact-sized shuffles for the ticket join and the
  (customer, item) join;
* bucketed: the maintained layouts of queries/tpcds.py
  (_bucketed_tpcds_facts grain — sr+cs bucketed on (customer, item),
  ss on ticket), ingest timed separately, chain ordered so only the
  returns-sized intermediate and the item-grain aggregate shuffle.

Auto-broadcast is disabled for BOTH variants so the probe measures the
distribution story, not the sandbox's ability to broadcast a 100 MB
fact (at real scale none of these facts broadcast).

    python tools/tpcds_scale_probe.py [--rebuild]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = float(os.environ.get("WALDEN_TPCDS_PROBE_SF", "1.0"))
DST = f"/tmp/walden_tpcds_x{int(SF * 100)}"
REPS = 2


def build(spark) -> None:
    from walden_spark.sources.tpcds import TpcdsGen

    g = TpcdsGen(spark, sf=SF, seed=42)
    os.makedirs(DST, exist_ok=True)
    g.store_sales().select(
        "ss_ticket_number", "ss_item_sk", "ss_quantity"
    ).write.mode("overwrite").parquet(f"{DST}/store_sales.parquet")
    g.store_returns().write.mode("overwrite").parquet(
        f"{DST}/store_returns.parquet"
    )
    g.catalog_sales().select(
        "cs_customer_sk", "cs_item_sk", "cs_sold_date_sk", "cs_quantity"
    ).write.mode("overwrite").parquet(f"{DST}/catalog_sales.parquet")
    g.item().write.mode("overwrite").parquet(f"{DST}/item.parquet")


def q29_plain(spark, ss, sr, cs, item):
    from pyspark.sql import functions as F

    return (
        ss.join(sr, F.col("sr_ticket_number") == F.col("ss_ticket_number"))
        .join(
            cs,
            (F.col("cs_customer_sk") == F.col("sr_customer_sk"))
            & (F.col("cs_item_sk") == F.col("sr_item_sk"))
            & (F.col("cs_sold_date_sk") > F.col("sr_returned_date_sk")),
        )
        .join(F.broadcast(item), F.col("i_item_sk") == F.col("ss_item_sk"))
        .groupBy("i_item_id")
        .agg(
            F.sum("ss_quantity").cast("bigint").alias("sold_qty"),
            F.sum("sr_return_quantity").cast("bigint").alias("returned_qty"),
            F.sum("cs_quantity").cast("bigint").alias("repurchased_qty"),
        )
        .orderBy("i_item_id")
    )


def q29_bucketed(spark, ss, sr, cs, item):
    from pyspark.sql import functions as F

    chain = sr.join(
        cs,
        (F.col("cs_customer_sk") == F.col("sr_customer_sk"))
        & (F.col("cs_item_sk") == F.col("sr_item_sk"))
        & (F.col("cs_sold_date_sk") > F.col("sr_returned_date_sk")),
    )
    return (
        chain.join(ss, F.col("ss_ticket_number") == F.col("sr_ticket_number"))
        .join(F.broadcast(item), F.col("i_item_sk") == F.col("ss_item_sk"))
        .groupBy("i_item_id")
        .agg(
            F.sum("ss_quantity").cast("bigint").alias("sold_qty"),
            F.sum("sr_return_quantity").cast("bigint").alias("returned_qty"),
            F.sum("cs_quantity").cast("bigint").alias("repurchased_qty"),
        )
        .orderBy("i_item_id")
    )


def main() -> None:
    from walden_spark.catalog import ensure_bucketed_table
    from walden_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="tpcds_scale_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    if "--rebuild" in sys.argv or not os.path.isdir(f"{DST}/store_sales.parquet"):
        build(spark)
    item = spark.read.parquet(f"{DST}/item.parquet")
    ss_p = spark.read.parquet(f"{DST}/store_sales.parquet")
    sr_p = spark.read.parquet(f"{DST}/store_returns.parquet")
    cs_p = spark.read.parquet(f"{DST}/catalog_sales.parquet")

    out: dict = {
        "sf": f"tpcds x{int(SF * 100)} (SF={SF} generated, facts parquet)"
    }
    floors: dict[str, float] = {}
    for name, mk in (
        ("tpcds_q29_plain", lambda: q29_plain(spark, ss_p, sr_p, cs_p, item)),
    ):
        for _ in range(REPS):
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            floors[name] = min(floors.get(name, dt), dt)
        print(name, floors[name], flush=True)

    t0 = time.perf_counter()
    n_b = int(cpus)
    ss_b = ensure_bucketed_table(
        spark, "x100_store_sales_b",
        lambda: spark.read.parquet(f"{DST}/store_sales.parquet"),
        ["ss_ticket_number"], n_buckets=n_b, sort_cols=["ss_ticket_number"],
        source=DST,
    )
    sr_b = ensure_bucketed_table(
        spark, "x100_store_returns_b",
        lambda: spark.read.parquet(f"{DST}/store_returns.parquet"),
        ["sr_customer_sk", "sr_item_sk"], n_buckets=n_b,
        sort_cols=["sr_customer_sk", "sr_item_sk"], source=DST,
    )
    cs_b = ensure_bucketed_table(
        spark, "x100_catalog_sales_b",
        lambda: spark.read.parquet(f"{DST}/catalog_sales.parquet"),
        ["cs_customer_sk", "cs_item_sk"], n_buckets=n_b,
        sort_cols=["cs_customer_sk", "cs_item_sk"], source=DST,
    )
    out["bucket_ingest_s"] = round(time.perf_counter() - t0, 1)
    print("bucket ingest:", out["bucket_ingest_s"], "s", flush=True)

    mk = lambda: q29_bucketed(spark, ss_b, sr_b, cs_b, item)  # noqa: E731
    plan = mk()._jdf.queryExecution().executedPlan().toString()
    out["bucketed_hash_exchanges"] = plan.count("Exchange hashpartitioning")
    out["bucketed_fact_exchange_keys"] = [
        k for k in ("cs_customer_sk", "cs_item_sk", "ss_ticket_number",
                    "sr_customer_sk", "sr_item_sk")
        if f"Exchange hashpartitioning({k}" in plan
    ]
    for _ in range(REPS):
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        floors["tpcds_q29_bucketed"] = min(
            floors.get("tpcds_q29_bucketed", dt), dt
        )
    print("tpcds_q29_bucketed", floors["tpcds_q29_bucketed"], flush=True)
    out["floors"] = floors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
