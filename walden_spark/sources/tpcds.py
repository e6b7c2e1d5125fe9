"""TPC-DS-style generator catalog (SURVEY §2.1 — the reference deploys
Trino's ``tpcds`` connector alongside ``tpch``; reference:
tf/variables.tf:241-244, ``tpcds.splits-per-node=4``).

Focused subset: the 6 tables the most-cited TPC-DS queries touch
(date_dim, item, store, customer, store_sales, store_returns) with
TPC-DS-proportioned row counts. Same generation discipline as
datagen.py: pure ``spark.range`` + xxhash64-derived columns — seeded,
deterministic, no driver-side data, parallel to any cluster size.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from walden_spark.sources.datagen import _h, _money2, _pick, _uniform
from walden_spark.sources.files import write_parquet

CATEGORIES = ["Books", "Home", "Electronics", "Jewelry", "Music", "Shoes", "Sports", "Women"]
BRANDS = [f"brand_{i}" for i in range(1, 21)]
STATES = ["CA", "NY", "TX", "WA", "IL", "GA", "OH", "MI"]

D_START = datetime.date(1998, 1, 1)
N_DAYS = 365 * 5  # 1998-2002, the classic TPC-DS window


class TpcdsGen:
    def __init__(self, spark: SparkSession, sf: float = 0.01, seed: int = 42, splits: int | None = None):
        self.spark = spark
        self.sf = sf
        self.seed = seed
        self.splits = splits or spark.sparkContext.defaultParallelism

    def _range(self, n: int, key: str) -> DataFrame:
        return self.spark.range(0, n, numPartitions=self.splits).withColumnRenamed("id", key)

    def date_dim(self) -> DataFrame:
        k = F.col("d_date_sk")
        d = F.date_add(F.lit(D_START.isoformat()).cast("date"), k.cast("int"))
        return self._range(N_DAYS, "d_date_sk").select(
            "d_date_sk",
            d.alias("d_date"),
            F.year(d).alias("d_year"),
            F.month(d).cast("int").alias("d_moy"),
            F.dayofmonth(d).cast("int").alias("d_dom"),
            F.quarter(d).cast("int").alias("d_qoy"),
            F.floor(k / 7).cast("int").alias("d_week_seq"),
        )

    def item(self) -> DataFrame:
        n = max(1, int(18_000 * self.sf))
        s = self.seed
        k = F.col("i_item_sk")
        return self._range(n, "i_item_sk").select(
            "i_item_sk",
            F.concat(F.lit("item_"), k).alias("i_item_id"),
            _pick(s + 31, k, CATEGORIES).alias("i_category"),
            _pick(s + 32, k, BRANDS).alias("i_brand"),
            (_h(s + 33, k) % 100).cast("int").alias("i_manufact_id"),
            _money2(_uniform(s + 34, k, 0.5, 300.0)).alias("i_current_price"),
        )

    def store(self) -> DataFrame:
        n = max(1, int(12 * max(self.sf, 1 / 12)))
        s = self.seed
        k = F.col("s_store_sk")
        return self._range(n, "s_store_sk").select(
            "s_store_sk",
            F.concat(F.lit("store_"), k).alias("s_store_id"),
            _pick(s + 35, k, STATES).alias("s_state"),
            (_h(s + 36, k) % 500 + 50).cast("int").alias("s_number_employees"),
        )

    def customer(self) -> DataFrame:
        n = max(1, int(100_000 * self.sf))
        s = self.seed
        k = F.col("c_customer_sk")
        return self._range(n, "c_customer_sk").select(
            "c_customer_sk",
            F.concat(F.lit("cust_"), k).alias("c_customer_id"),
            (_h(s + 37, k) % 7 + 1).cast("int").alias("c_birth_month"),
            _pick(s + 38, k, STATES).alias("c_state"),
        )

    def store_sales(self) -> DataFrame:
        n = max(1, int(2_880_000 * self.sf))
        nitem = max(1, int(18_000 * self.sf))
        ncust = max(1, int(100_000 * self.sf))
        nstore = max(1, int(12 * max(self.sf, 1 / 12)))
        s = self.seed
        k = F.col("ss_ticket_number")
        qty = (_h(s + 43, k) % 100 + 1).cast("int")
        price = _uniform(s + 44, k, 0.5, 300.0)
        return self._range(n, "ss_ticket_number").select(
            "ss_ticket_number",
            (_h(s + 39, k) % N_DAYS).alias("ss_sold_date_sk"),
            (_h(s + 40, k) % nitem).alias("ss_item_sk"),
            (_h(s + 41, k) % ncust).alias("ss_customer_sk"),
            (_h(s + 42, k) % nstore).alias("ss_store_sk"),
            qty.alias("ss_quantity"),
            _money2(price).alias("ss_list_price"),
            _money2(price * qty * (1 - (_h(s + 45, k) % 30) / 100.0)).alias("ss_net_paid"),
        )

    def web_sales(self) -> DataFrame:
        """Second sales channel (~40% of store volume) — enables the
        cross-channel query family TPC-DS exists to exercise."""
        n = max(1, int(1_150_000 * self.sf))
        nitem = max(1, int(18_000 * self.sf))
        ncust = max(1, int(100_000 * self.sf))
        s = self.seed
        k = F.col("ws_order_number")
        qty = (_h(s + 53, k) % 100 + 1).cast("int")
        price = _uniform(s + 54, k, 0.5, 300.0)
        return self._range(n, "ws_order_number").select(
            "ws_order_number",
            (_h(s + 49, k) % N_DAYS).alias("ws_sold_date_sk"),
            (_h(s + 50, k) % nitem).alias("ws_item_sk"),
            (_h(s + 51, k) % ncust).alias("ws_customer_sk"),
            qty.alias("ws_quantity"),
            _money2(price).alias("ws_list_price"),
            _money2(price * qty * (1 - (_h(s + 52, k) % 30) / 100.0)).alias("ws_net_paid"),
        )

    def catalog_sales(self) -> DataFrame:
        """Third sales channel (~60% of store volume) — completes the
        store/web/catalog triad the TPC-DS cross-channel families
        (Q33/Q71/Q77) require."""
        n = max(1, int(1_440_000 * self.sf))
        nitem = max(1, int(18_000 * self.sf))
        ncust = max(1, int(100_000 * self.sf))
        s = self.seed
        k = F.col("cs_order_number")
        qty = (_h(s + 58, k) % 100 + 1).cast("int")
        price = _uniform(s + 59, k, 0.5, 300.0)
        sold = _h(s + 55, k) % N_DAYS
        return self._range(n, "cs_order_number").select(
            "cs_order_number",
            sold.alias("cs_sold_date_sk"),
            # ship lag 1-30 days (r14, for the Q72 ship-after-sold
            # predicate); clamped inside the date_dim domain
            F.least(sold + (_h(s + 61, k) % 30 + 1), F.lit(N_DAYS - 1)).alias(
                "cs_ship_date_sk"
            ),
            (_h(s + 56, k) % nitem).alias("cs_item_sk"),
            (_h(s + 57, k) % ncust).alias("cs_customer_sk"),
            qty.alias("cs_quantity"),
            _money2(price).alias("cs_list_price"),
            _money2(price * qty * (1 - (_h(s + 60, k) % 30) / 100.0)).alias("cs_net_paid"),
        )

    def store_returns(self) -> DataFrame:
        """~10% of tickets return (keyed off the sale row, so each
        return joins back to a real ticket)."""
        sales = self.store_sales().filter(F.col("ss_ticket_number") % 10 == 3)
        s = self.seed
        k = F.col("ss_ticket_number")
        return sales.select(
            F.col("ss_ticket_number").alias("sr_ticket_number"),
            F.col("ss_item_sk").alias("sr_item_sk"),
            F.col("ss_customer_sk").alias("sr_customer_sk"),
            F.least(
                (F.col("ss_sold_date_sk") + (_h(s + 46, k) % 90 + 1)), F.lit(N_DAYS - 1)
            ).alias("sr_returned_date_sk"),
            F.least((_h(s + 47, k) % 100 + 1).cast("int"), F.col("ss_quantity")).alias(
                "sr_return_quantity"
            ),
            _money2(
                F.col("ss_net_paid")
                * F.least((_h(s + 47, k) % 100 + 1).cast("int"), F.col("ss_quantity"))
                / F.col("ss_quantity")
            ).alias("sr_return_amt"),
        )

    def warehouse(self) -> DataFrame:
        """Small dim for the inventory snapshots (TPC-DS has 5 at
        sf1; floor of 2 keeps the grouping interesting at test SFs)."""
        n = max(2, int(5 * self.sf))
        k = F.col("w_warehouse_sk")
        return self._range(n, "w_warehouse_sk").select(
            "w_warehouse_sk",
            F.concat(F.lit("Warehouse_"), k).alias("w_warehouse_name"),
            _pick(self.seed + 63, k, STATES).alias("w_state"),
        )

    def inventory(self) -> DataFrame:
        """Weekly on-hand snapshot per (item, warehouse) — TPC-DS's
        BIGGEST table at low SF, and the second big fact the Q72
        date-offset join stresses. Pure index decomposition over one
        ``spark.range`` (week-major), quantity hash-derived."""
        nitem = max(1, int(18_000 * self.sf))
        nwh = max(2, int(5 * self.sf))
        n_weeks = N_DAYS // 7
        s = self.seed
        idx = F.col("inv_sk")
        week = idx % n_weeks
        rest = F.floor(idx / n_weeks)
        return self._range(n_weeks * nitem * nwh, "inv_sk").select(
            (week * 7).alias("inv_date_sk"),  # the week's first day
            (rest % nitem).alias("inv_item_sk"),
            F.floor(rest / nitem).alias("inv_warehouse_sk"),
            (_h(s + 62, idx) % 1000).cast("int").alias("inv_quantity_on_hand"),
        )

    TABLES = (
        "date_dim", "item", "store", "customer", "store_sales",
        "store_returns", "web_sales", "catalog_sales", "warehouse",
        "inventory",
    )

    def table(self, name: str) -> DataFrame:
        if name not in self.TABLES:
            raise ValueError(f"unknown tpcds table {name!r}")
        return getattr(self, name)()

    def write(self, out_dir: str, tables=None) -> None:
        for name in tables or self.TABLES:
            write_parquet(self.table(name), f"{out_dir}/{name}")

    def register_views(self, prefix: str = "") -> None:
        for name in self.TABLES:
            self.table(name).createOrReplaceTempView(prefix + name)
