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
