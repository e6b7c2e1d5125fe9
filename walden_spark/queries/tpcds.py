"""TPC-DS-style query suite over the tpcds generator catalog
(reference intent: tf/variables.tf:241-244).

Driver note: the driver's oracle harness pre-registers only the 10
fixture tables, so these register as rows-only checks there; the FULL
DuckDB differential runs in tests/test_tpcds.py, which materializes the
generated catalog as parquet and points both engines at the same files.
Oracle SQL lives in TPCDS_ORACLES keyed by query name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from walden_spark.registry import query
from walden_spark.sources.tpcds import TpcdsGen

SF = 0.01  # in-memory generation scale for the registry entries


def _gen(spark: SparkSession) -> TpcdsGen:
    return TpcdsGen(spark, sf=SF, seed=42)


TPCDS_ORACLES: dict[str, str] = {}


def _tpcds(name: str, oracle_sql: str):
    TPCDS_ORACLES[name] = oracle_sql
    return query(name, oracle=None, category="tpcds")


@_tpcds(
    "tpcds_q3",
    """
SELECT d_year, i_brand,
       CAST(SUM(CAST(ss_net_paid AS DECIMAL(14,2))) AS DOUBLE) AS brand_revenue
FROM store_sales
JOIN date_dim ON d_date_sk = ss_sold_date_sk
JOIN item ON i_item_sk = ss_item_sk
WHERE i_manufact_id = 7 AND d_moy = 11
GROUP BY d_year, i_brand
ORDER BY d_year, brand_revenue DESC, i_brand
""",
)
def tpcds_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q3 shape: fact⋈date⋈item, manufacturer's November brand
    revenue by year (date_dim broadcast, decimal-exact revenue)."""
    g = _gen(spark)
    return (
        g.store_sales()
        .join(F.broadcast(g.date_dim().filter(F.col("d_moy") == 11)),
              F.col("d_date_sk") == F.col("ss_sold_date_sk"))
        .join(F.broadcast(g.item().filter(F.col("i_manufact_id") == 7)),
              F.col("i_item_sk") == F.col("ss_item_sk"))
        .groupBy("d_year", "i_brand")
        .agg(F.sum(F.col("ss_net_paid").cast("decimal(14,2)")).cast("double").alias("brand_revenue"))
        .orderBy("d_year", F.desc("brand_revenue"), "i_brand")
    )


@_tpcds(
    "tpcds_q42",
    """
SELECT d_year, i_category,
       CAST(SUM(CAST(ss_net_paid AS DECIMAL(14,2))) AS DOUBLE) AS cat_revenue
FROM store_sales
JOIN date_dim ON d_date_sk = ss_sold_date_sk
JOIN item ON i_item_sk = ss_item_sk
WHERE d_qoy = 4
GROUP BY d_year, i_category
ORDER BY d_year, cat_revenue DESC, i_category
""",
)
def tpcds_q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q42 shape: Q4 category revenue by year."""
    g = _gen(spark)
    return (
        g.store_sales()
        .join(F.broadcast(g.date_dim().filter(F.col("d_qoy") == 4)),
              F.col("d_date_sk") == F.col("ss_sold_date_sk"))
        .join(F.broadcast(g.item()), F.col("i_item_sk") == F.col("ss_item_sk"))
        .groupBy("d_year", "i_category")
        .agg(F.sum(F.col("ss_net_paid").cast("decimal(14,2)")).cast("double").alias("cat_revenue"))
        .orderBy("d_year", F.desc("cat_revenue"), "i_category")
    )


@_tpcds(
    "tpcds_q1_returns",
    """
WITH cust_ret AS (
  SELECT sr_customer_sk, ss_store_sk,
         SUM(CAST(sr_return_amt AS DECIMAL(14,2))) AS total_ret
  FROM store_returns JOIN store_sales ON ss_ticket_number = sr_ticket_number
  GROUP BY sr_customer_sk, ss_store_sk
),
store_avg AS (
  SELECT ss_store_sk AS a_store_sk,
         CAST(SUM(total_ret) AS DOUBLE) / COUNT(total_ret) AS avg_ret
  FROM cust_ret GROUP BY ss_store_sk
)
SELECT sr_customer_sk, ss_store_sk, CAST(total_ret AS DOUBLE) AS total_ret
FROM cust_ret JOIN store_avg ON a_store_sk = ss_store_sk
WHERE CAST(total_ret AS DOUBLE) > 1.2 * avg_ret
ORDER BY sr_customer_sk, ss_store_sk
""",
)
def tpcds_q1_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q1 shape: customers whose returns exceed 1.2x their
    store's average (correlated scalar subquery → per-store agg join;
    the store-average side is tiny and broadcasts)."""
    g = _gen(spark)
    sales = g.store_sales().select("ss_ticket_number", "ss_store_sk")
    cust_ret = (
        g.store_returns()
        .join(sales, F.col("ss_ticket_number") == F.col("sr_ticket_number"))
        .groupBy("sr_customer_sk", "ss_store_sk")
        .agg(F.sum(F.col("sr_return_amt").cast("decimal(14,2)")).alias("total_ret"))
    )
    store_avg = cust_ret.groupBy(F.col("ss_store_sk").alias("a_store_sk")).agg(
        (F.sum("total_ret").cast("double") / F.count("total_ret")).alias("avg_ret")
    )
    return (
        cust_ret.join(F.broadcast(store_avg), F.col("a_store_sk") == F.col("ss_store_sk"))
        .filter(F.col("total_ret").cast("double") > 1.2 * F.col("avg_ret"))
        .select("sr_customer_sk", "ss_store_sk", F.col("total_ret").cast("double").alias("total_ret"))
        .orderBy("sr_customer_sk", "ss_store_sk")
    )


@_tpcds(
    "tpcds_cross_channel",
    """
WITH ss AS (
  SELECT i_category, d_year,
         SUM(CAST(ss_net_paid AS DECIMAL(14,2))) AS store_rev
  FROM store_sales JOIN date_dim ON d_date_sk = ss_sold_date_sk
       JOIN item ON i_item_sk = ss_item_sk
  GROUP BY i_category, d_year
),
ws AS (
  SELECT i_category, d_year,
         SUM(CAST(ws_net_paid AS DECIMAL(14,2))) AS web_rev
  FROM web_sales JOIN date_dim ON d_date_sk = ws_sold_date_sk
       JOIN item ON i_item_sk = ws_item_sk
  GROUP BY i_category, d_year
)
SELECT COALESCE(ss.i_category, ws.i_category) AS i_category,
       COALESCE(ss.d_year, ws.d_year) AS d_year,
       CAST(COALESCE(store_rev, 0) AS DOUBLE) AS store_rev,
       CAST(COALESCE(web_rev, 0) AS DOUBLE) AS web_rev,
       CAST(COALESCE(store_rev, 0) AS DOUBLE)
         / nullif(CAST(COALESCE(web_rev, 0) AS DOUBLE), 0) AS store_to_web
FROM ss FULL OUTER JOIN ws
  ON ss.i_category = ws.i_category AND ss.d_year = ws.d_year
ORDER BY i_category, d_year
""",
)
def tpcds_cross_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-channel revenue comparison (the defining TPC-DS pattern:
    multiple fact channels conformed on shared dimensions): store vs
    web revenue per (category, year) with a full-outer channel merge.
    Each channel aggregates independently (decimal-exact), then the two
    small aggregates join — the facts themselves never co-shuffle."""
    g = _gen(spark)
    dd = F.broadcast(g.date_dim())
    it = F.broadcast(g.item())
    ss = (
        g.store_sales()
        .join(dd, F.col("d_date_sk") == F.col("ss_sold_date_sk"))
        .join(it, F.col("i_item_sk") == F.col("ss_item_sk"))
        .groupBy("i_category", "d_year")
        .agg(F.sum(F.col("ss_net_paid").cast("decimal(14,2)")).alias("store_rev"))
    )
    ws = (
        g.web_sales()
        .join(dd, F.col("d_date_sk") == F.col("ws_sold_date_sk"))
        .join(it, F.col("i_item_sk") == F.col("ws_item_sk"))
        .groupBy("i_category", "d_year")
        .agg(F.sum(F.col("ws_net_paid").cast("decimal(14,2)")).alias("web_rev"))
    )
    merged = ss.alias("s").join(
        ws.alias("w"),
        (F.col("s.i_category") == F.col("w.i_category")) & (F.col("s.d_year") == F.col("w.d_year")),
        "full_outer",
    )
    store_rev = F.coalesce(F.col("store_rev"), F.lit(0)).cast("double")
    web_rev = F.coalesce(F.col("web_rev"), F.lit(0)).cast("double")
    return merged.select(
        F.coalesce(F.col("s.i_category"), F.col("w.i_category")).alias("i_category"),
        F.coalesce(F.col("s.d_year"), F.col("w.d_year")).alias("d_year"),
        store_rev.alias("store_rev"),
        web_rev.alias("web_rev"),
        (store_rev / F.nullif(web_rev, F.lit(0.0))).alias("store_to_web"),
    ).orderBy("i_category", "d_year")


@_tpcds(
    "tpcds_q59_growth",
    """
WITH m AS (
  SELECT ss_store_sk, d_year * 12 + d_moy AS mid,
         SUM(CAST(ss_net_paid AS DECIMAL(14,2))) AS rev
  FROM store_sales JOIN date_dim ON d_date_sk = ss_sold_date_sk
  GROUP BY 1, 2
)
SELECT cur.ss_store_sk, cur.mid,
       CAST(cur.rev AS DOUBLE) AS rev,
       CAST(prev.rev AS DOUBLE) AS prev_rev,
       floor(CAST(cur.rev AS DOUBLE) / CAST(prev.rev AS DOUBLE) * 1000000.0)
         / 1000000.0 AS growth
FROM m cur JOIN m prev
  ON cur.ss_store_sk = prev.ss_store_sk AND cur.mid = prev.mid + 1
ORDER BY cur.ss_store_sk, cur.mid
""",
)
def tpcds_q59_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q59 shape: period-over-period revenue comparison per
    store. The oracle writes it as the classic self-join on
    (store, period+1); the Spark side uses the idiomatic window lag —
    ONE shuffle on store instead of re-shuffling the aggregate twice,
    same rows (month index d_year*12+d_moy keeps the period arithmetic
    engine-portable — no week()-function dialect drift)."""
    from pyspark.sql import Window

    g = _gen(spark)
    m = (
        g.store_sales()
        .join(F.broadcast(g.date_dim()), F.col("d_date_sk") == F.col("ss_sold_date_sk"))
        .groupBy("ss_store_sk", (F.col("d_year") * 12 + F.col("d_moy")).alias("mid"))
        .agg(F.sum(F.col("ss_net_paid").cast("decimal(14,2)")).alias("rev"))
    )
    w = Window.partitionBy("ss_store_sk").orderBy("mid")
    return (
        m.withColumn("prev_rev", F.lag("rev").over(w))
        .withColumn("prev_mid", F.lag("mid").over(w))
        .filter(F.col("mid") == F.col("prev_mid") + 1)
        .select(
            "ss_store_sk",
            "mid",
            F.col("rev").cast("double").alias("rev"),
            F.col("prev_rev").cast("double").alias("prev_rev"),
            (
                F.floor(F.col("rev").cast("double") / F.col("prev_rev").cast("double") * 1000000.0)
                / 1000000.0
            ).alias("growth"),
        )
        .orderBy("ss_store_sk", "mid")
    )
