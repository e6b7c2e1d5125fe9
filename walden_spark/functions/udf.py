"""User-defined function surface (SURVEY.md §2.10).

The reference's deployed components expose Trino inline SQL functions
(``WITH FUNCTION``, Trino 458+) and Superset's Jinja-templated SQL —
no Python extension point. The Spark-native engine exposes the full
ladder, fastest first:

1. SQL-bodied functions (``CREATE FUNCTION``) — stay entirely in
   Catalyst, codegen'd like any expression: the Trino inline-function
   analog and always the first choice.
2. ``@pandas_udf`` scalar / grouped-agg — Arrow-batched, vectorized
   over columns; the right shape when you genuinely need Python
   (numpy/model scoring). ~10-100x faster than row UDFs.
3. Python UDTF (Spark 3.5+) — table functions producing rows.
4. Row-at-a-time ``@udf`` — deliberately NOT exported: on the 100TB
   posture it is never the right tool (per-row Python round trips).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from walden_spark.registry import query
from walden_spark.tables import Tables


# ---- 1. SQL-bodied functions (Trino WITH FUNCTION analog) ----

def register_sql_functions(spark: SparkSession) -> None:
    """Engine-bundled SQL UDFs — pure Catalyst expressions."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
        RETURNS DOUBLE
        RETURN CAST(CAST(p AS DECIMAL(12,2)) * (1 - CAST(d AS DECIMAL(4,2))) AS DOUBLE)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION word_count(s STRING)
        RETURNS INT
        RETURN size(split(s, ' '))
        """
    )


# ---- 2. pandas UDFs (Arrow-vectorized Python) ----
# Built lazily: @pandas_udf parses its DDL type against the active
# session, so decorating at import time would require a SparkContext.

def zscore_clip():
    """Vectorized scalar example: clip to [0, 500] then scale to cents —
    deterministic integer-style math so oracles can mirror it."""

    @pandas_udf("double")
    def _clip(v: pd.Series) -> pd.Series:
        return v.clip(lower=0.0, upper=500.0).mul(100).round() / 100.0

    return _clip


def batch_median():
    """Grouped-aggregate pandas UDF (whole group → one scalar)."""

    @pandas_udf("double")
    def _median(v: pd.Series) -> float:
        return float(v.median())

    return _median


# ---- 3. Python UDTF ----

def make_word_udtf(spark: SparkSession):
    """UDTF splitting text into (pos, word) rows — registered as a SQL
    table function ``word_rows(...)``."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, word string")
    class WordRows:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                yield i, w

    spark.udtf.register("word_rows", WordRows)
    return WordRows


# ---- registry queries proving each layer against the oracle ----

@query(
    "udf_sql_function",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS dp
FROM lineitem WHERE l_orderkey < 100
ORDER BY l_orderkey, l_linenumber
""",
    category="function",
)
def udf_sql_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE FUNCTION (SQL-bodied) used from SQL — stays codegen'd."""
    t = Tables(spark, sf_dir)
    register_sql_functions(spark)
    t.lineitem.createOrReplaceTempView("udf_lineitem")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, disc_price(l_extendedprice, l_discount) AS dp
        FROM udf_lineitem WHERE l_orderkey < 100
        ORDER BY l_orderkey, l_linenumber
        """
    )


@query(
    "udf_pandas_scalar",
    oracle="""
SELECT event_id, round(least(greatest(value, 0.0), 500.0) * 100) / 100.0 AS clipped
FROM events WHERE event_id < 500 ORDER BY event_id
""",
    category="function",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF over the events stream table."""
    t = Tables(spark, sf_dir)
    return (
        t.events.filter(F.col("event_id") < 500)
        .select("event_id", zscore_clip()(F.col("value")).alias("clipped"))
        .orderBy("event_id")
    )


@query(
    "udf_pandas_grouped_agg",
    oracle="""
SELECT lang, median(CAST(n_chars AS DOUBLE)) AS med_chars
FROM documents GROUP BY lang ORDER BY lang
""",
    category="function",
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (median — no exact built-in agg)."""
    t = Tables(spark, sf_dir)
    return (
        t.documents.select("lang", F.col("n_chars").cast("double").alias("nc"))
        .groupBy("lang")
        .agg(batch_median()(F.col("nc")).alias("med_chars"))
        .orderBy("lang")
    )


@query(
    "udf_python_udtf",
    oracle="""
SELECT doc_id, pos - 1 AS pos, word
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents WHERE doc_id < 20)
ORDER BY doc_id, pos
""",
    category="function",
)
def udf_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via SQL LATERAL join: text → (pos, word) rows."""
    t = Tables(spark, sf_dir)
    make_word_udtf(spark)
    t.documents.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT doc_id, w.pos, w.word
        FROM udtf_docs, LATERAL word_rows(text) AS w
        WHERE doc_id < 20
        ORDER BY doc_id, w.pos
        """
    )


@query(
    "udf_cogroup_pandas",
    oracle="""
SELECT c_custkey, c_nationkey,
       COUNT(o_orderkey) AS n_orders,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 0) AS DOUBLE) AS total_spend
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
WHERE c_custkey < 300
GROUP BY c_custkey, c_nationkey
ORDER BY c_custkey
""",
    category="function",
)
def udf_cogroup_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cogroup(...).applyInPandas — the two-sided grouped-map surface:
    each (customer-group, orders-group) pair lands in one pandas call.
    Cent-integer accumulation keeps the totals exact, so even this
    Python path hash-matches the relational oracle."""
    t = Tables(spark, sf_dir)
    cust = t.customer.filter(F.col("c_custkey") < 300).select("c_custkey", "c_nationkey")
    orders = t.orders.filter(F.col("o_custkey") < 300).select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )

    def merge(c_pdf: pd.DataFrame, o_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(c_pdf):  # orders for a customer outside the filter
            return pd.DataFrame(
                columns=["c_custkey", "c_nationkey", "n_orders", "total_spend"]
            )
        cents = int(o_pdf["o_totalprice"].mul(100).round().astype("int64").sum()) if len(o_pdf) else 0
        return pd.DataFrame(
            {
                "c_custkey": [c_pdf["c_custkey"].iloc[0]],
                "c_nationkey": [c_pdf["c_nationkey"].iloc[0]],
                "n_orders": [len(o_pdf)],
                "total_spend": [cents / 100.0],
            }
        )

    out = (
        cust.groupBy("c_custkey")
        .cogroup(orders.groupBy("o_custkey"))
        .applyInPandas(
            merge,
            schema="c_custkey long, c_nationkey int, n_orders long, total_spend double",
        )
    )
    return out.orderBy("c_custkey")


@query(
    "udf_arrow_optimized",
    oracle="""
SELECT event_id,
       CAST(length(event_type) + (event_id % 7) AS BIGINT) AS feature
FROM events WHERE event_id < 400 ORDER BY event_id
""",
    category="function",
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (Spark 4 ``useArrow=True``): row
    signature like a classic Python UDF but Arrow-batched transport —
    the migration path for legacy UDFs that can't be vectorized (the
    exported alternative to the deliberately-unexported row-at-a-time
    ``@udf``; per-row Python still caps throughput, so hot paths should
    graduate to pandas UDFs)."""
    from pyspark.sql.functions import udf as _udf

    @_udf(returnType="bigint", useArrow=True)
    def feature(event_type: str, event_id: int) -> int:
        return len(event_type) + (event_id % 7)

    t = Tables(spark, sf_dir)
    return (
        t.events.filter(F.col("event_id") < 400)
        .select("event_id", feature("event_type", "event_id").alias("feature"))
        .orderBy("event_id")
    )


@query(
    "udf_pandas_iterator",
    oracle="""
SELECT event_id,
       floor((value - (SELECT AVG(value) FROM events)) * 1000000.0) / 1000000.0 AS centered
FROM events WHERE event_id < 400 ORDER BY event_id
""",
    category="function",
)
def udf_pandas_iterator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-series pandas UDF: per-worker one-time setup (here a
    broadcast mean; in production a model/tokenizer load) amortized
    across all Arrow batches — the pattern for expensive-init inference
    UDFs."""
    t = Tables(spark, sf_dir)
    mean_val = t.events.agg(F.avg("value")).collect()[0][0]
    bc = spark.sparkContext.broadcast(mean_val)

    @pandas_udf("double")
    def center(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        mu = bc.value  # one-time per-worker setup
        import numpy as np

        for s in batches:
            yield pd.Series(np.floor((s - mu) * 1e6) / 1e6)

    return (
        t.events.filter(F.col("event_id") < 400)
        .select("event_id", center("value").alias("centered"))
        .orderBy("event_id")
    )


@query(
    "udf_pandas_window_agg",
    oracle="""
SELECT event_id, user_id,
       median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rolling_median
FROM events WHERE user_id < 20 ORDER BY event_id
""",
    category="function",
)
def udf_pandas_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF applied OVER a window frame — custom
    rolling statistics (exact rolling median) that no built-in window
    aggregate provides; the UDF evaluates once per frame on the
    Arrow-transferred slice."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        t.events.filter(F.col("user_id") < 20)
        .select(
            "event_id",
            "user_id",
            batch_median()(F.col("value")).over(w).alias("rolling_median"),
        )
        .orderBy("event_id")
    )
