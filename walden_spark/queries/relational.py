"""Projections, filters, joins, limits — SURVEY.md §2.2/2.3/2.6.

Each query exercises one operator family the reference's deployed Trino
provides (evidence rows in SURVEY §2.2-2.3); results are DuckDB-oracle
checked. Join queries carry explicit notes on the distribution strategy
Catalyst picks (broadcast vs shuffle) — the 100TB posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from walden_spark.registry import query
from walden_spark.tables import Tables, register_views


@query(
    "proj_case_cast",
    oracle="""
SELECT p_partkey,
       upper(p_brand) AS brand_uc,
       CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'medium' ELSE 'large' END AS size_class,
       coalesce(nullif(p_type, 'STANDARD'), 'DEFAULT') AS type_or_default,
       CAST(p_size AS BIGINT) AS size_l,
       CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 2 AS DOUBLE) AS double_price,
       p_name LIKE '%bolt%' AS is_bolt
FROM part
""",
    category="projection",
)
def proj_case_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed projection: CASE WHEN / COALESCE / NULLIF / CAST / LIKE."""
    t = Tables(spark, sf_dir)
    return t.part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 30, "medium")
        .otherwise("large")
        .alias("size_class"),
        F.coalesce(F.nullif(F.col("p_type"), F.lit("STANDARD")), F.lit("DEFAULT")).alias("type_or_default"),
        F.col("p_size").cast("bigint").alias("size_l"),
        (F.col("p_retailprice").cast("decimal(12,2)") * 2).cast("double").alias("double_price"),
        F.col("p_name").like("%bolt%").alias("is_bolt"),
    )


@query(
    "filter_predicates",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_orderpriority
FROM orders
WHERE o_totalprice BETWEEN 1000 AND 50000
  AND o_orderstatus IN ('F', 'P')
  AND o_orderpriority LIKE '_-%'
  AND o_orderpriority NOT LIKE '5%'
  AND o_orderdate IS NOT NULL
  AND NOT (o_orderkey % 7 = 0)
""",
    category="filter",
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE with BETWEEN / IN / LIKE / NOT LIKE / IS NOT NULL / NOT."""
    t = Tables(spark, sf_dir)
    return t.orders.filter(
        F.col("o_totalprice").between(1000, 50000)
        & F.col("o_orderstatus").isin("F", "P")
        & F.col("o_orderpriority").like("_-%")
        & ~F.col("o_orderpriority").like("5%")
        & F.col("o_orderdate").isNotNull()
        & ~(F.col("o_orderkey") % 7 == 0)
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")


@query(
    "filter_null_semantics",
    oracle="""
SELECT
  COUNT(*) AS n_rows,
  COUNT(bal) AS n_nonnull,
  COUNT(*) - COUNT(bal) AS n_null,
  COUNT(CASE WHEN bal > 0 OR bal IS NULL THEN 1 END) AS or_with_null,
  COUNT(CASE WHEN NOT (bal > 0) THEN 1 END) AS not_gt
FROM (SELECT nullif(c_acctbal, 0.0) + CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE 0.0 END AS bal
      FROM customer)
""",
    category="filter",
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued NULL logic: NULL-propagating arithmetic + predicates."""
    t = Tables(spark, sf_dir)
    bal = (
        F.nullif(F.col("c_acctbal"), F.lit(0.0))
        + F.when(F.col("c_custkey") % 10 == 0, F.lit(None).cast("double")).otherwise(F.lit(0.0))
    ).alias("bal")
    df = t.customer.select(bal)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("bal").alias("n_nonnull"),
        (F.count(F.lit(1)) - F.count("bal")).alias("n_null"),
        F.count(F.when((F.col("bal") > 0) | F.col("bal").isNull(), 1)).alias("or_with_null"),
        F.count(F.when(~(F.col("bal") > 0), 1)).alias("not_gt"),
    )


@query(
    "distinct_pairs",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    category="filter",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — duplicate elimination (hash aggregate, partial+final)."""
    t = Tables(spark, sf_dir)
    return t.lineitem.select("l_returnflag", "l_linestatus").distinct()


@query(
    "values_inline",
    oracle="""
SELECT k AS key, v AS val FROM (VALUES ('this', 1), ('is', 2), ('a', 3), ('test', 4)) AS t(k, v)
""",
    category="scan",
)
def values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES literal relation — the reference's own fixture rows
    (reference: tf/test-hive.sh:23)."""
    return spark.sql(
        "SELECT k AS key, v AS val FROM VALUES ('this', 1), ('is', 2), ('a', 3), ('test', 4) AS t(k, v)"
    )


@query(
    "explode_words",
    oracle="""
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word
LIMIT 50
""",
    category="unnest",
)
def explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST (explode array to rows) → word frequency over documents.

    Scale note: explode multiplies rows ~40x here; the downstream agg is
    partial-aggregated before the shuffle so the exchange carries one
    row per distinct word per task, not per token.
    """
    t = Tables(spark, sf_dir)
    return (
        t.documents.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(50)
    )


@query(
    "posexplode_ordinality",
    oracle="""
SELECT doc_id,
       CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) AS pos,
       unnest(string_split(text, ' ')) AS word
FROM documents
WHERE doc_id < 20
""",
    category="unnest",
)
def posexplode_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST WITH ORDINALITY → posexplode (position-preserving)."""
    t = Tables(spark, sf_dir)
    return (
        t.documents.filter(F.col("doc_id") < 20)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word"))
    )


@query(
    "lateral_topn",
    oracle="""
SELECT n_name, c_name, CAST(c_acctbal AS DOUBLE) AS acctbal
FROM nation, LATERAL (
  SELECT c_name, c_acctbal FROM customer
  WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) top_cust
ORDER BY n_name, acctbal DESC, c_name
""",
    category="join",
)
def lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (top-2 customers per nation)."""
    register_views(spark, sf_dir, ["nation", "customer"])
    return spark.sql(
        """
        SELECT n_name, c_name, CAST(c_acctbal AS DOUBLE) AS acctbal
        FROM nation, LATERAL (
          SELECT c_name, c_acctbal FROM customer
          WHERE c_nationkey = n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 2
        ) top_cust
        ORDER BY n_name, acctbal DESC, c_name
        """
    )


@query(
    "join_left_outer",
    oracle="""
SELECT c_custkey, c_name, o_orderkey, o_orderstatus
FROM customer LEFT JOIN orders
  ON c_custkey = o_custkey AND o_totalprice > 90000
WHERE c_custkey < 200
""",
    category="join",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with join-side predicate (NULL-extended rows)."""
    t = Tables(spark, sf_dir)
    o = t.orders.filter(F.col("o_totalprice") > 90000)
    return (
        t.customer.filter(F.col("c_custkey") < 200)
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select("c_custkey", "c_name", "o_orderkey", "o_orderstatus")
    )


@query(
    "join_full_outer",
    oracle="""
SELECT a.k AS left_k, a.n_f AS left_n, b.k AS right_k, b.n_o AS right_n
FROM (SELECT o_custkey AS k, COUNT(*) AS n_f FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey) a
FULL OUTER JOIN
     (SELECT o_custkey AS k, COUNT(*) AS n_o FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey) b
ON a.k = b.k
""",
    category="join",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates (sort-merge; both sides shuffle
    on the key — at scale pre-partitioning both aggs on o_custkey means
    the join reuses the exchange)."""
    t = Tables(spark, sf_dir)
    a = (
        t.orders.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_f"))
    )
    b = (
        t.orders.filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_o"))
    )
    return a.join(b, a.k == b.k, "full").select(
        a.k.alias("left_k"), F.col("n_f").alias("left_n"), b.k.alias("right_k"), F.col("n_o").alias("right_n")
    )


@query(
    "join_right_outer",
    oracle="""
SELECT s_suppkey, s_name, n_name
FROM nation RIGHT JOIN supplier ON s_nationkey = n_nationkey AND n_regionkey < 3
""",
    category="join",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join (broadcast build side stays the small dim)."""
    t = Tables(spark, sf_dir)
    return (
        F.broadcast(t.nation.filter(F.col("n_regionkey") < 3))
        .join(t.supplier, F.col("s_nationkey") == F.col("n_nationkey"), "right")
        .select("s_suppkey", "s_name", "n_name")
    )


@query(
    "join_cross",
    oracle="""
SELECT r_name, n_name FROM region CROSS JOIN nation
""",
    category="join",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN (cartesian) — only ever dim × dim; broadcast NL join."""
    t = Tables(spark, sf_dir)
    return t.region.crossJoin(t.nation).select("r_name", "n_name")


@query(
    "join_semi",
    oracle="""
SELECT p_partkey, p_name FROM part
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 45)
""",
    category="join",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join (probe side never duplicated)."""
    t = Tables(spark, sf_dir)
    return (
        t.part.join(
            t.lineitem.filter(F.col("l_quantity") > 45),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        ).select("p_partkey", "p_name")
    )


@query(
    "join_anti_null_aware",
    oracle="""
SELECT COUNT(*) AS n_not_in, CAST(SUM(p_partkey) AS BIGINT) AS key_sum
FROM part
WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)
""",
    category="join",
)
def join_anti_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery — Catalyst plans a null-aware anti join."""
    register_views(spark, sf_dir, ["part", "lineitem"])
    return spark.sql(
        """
        SELECT COUNT(*) AS n_not_in, CAST(SUM(p_partkey) AS BIGINT) AS key_sum
        FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)
        """
    )


@query(
    "join_theta_nonequi",
    oracle="""
SELECT n1.n_name AS low_nation, n2.n_name AS high_nation
FROM nation n1 JOIN nation n2
  ON n1.n_nationkey < n2.n_nationkey AND n1.n_regionkey = n2.n_regionkey
ORDER BY low_nation, high_nation
""",
    category="join",
)
def join_theta_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi part on region + non-equi `<` predicate (hash join
    on the equi key with residual filter — NOT a nested loop)."""
    t = Tables(spark, sf_dir)
    n1 = t.nation.select(F.col("n_nationkey").alias("k1"), F.col("n_name").alias("low_nation"), F.col("n_regionkey").alias("r1"))
    n2 = t.nation.select(F.col("n_nationkey").alias("k2"), F.col("n_name").alias("high_nation"), F.col("n_regionkey").alias("r2"))
    return (
        n1.join(n2, (F.col("k1") < F.col("k2")) & (F.col("r1") == F.col("r2")))
        .select("low_nation", "high_nation")
        .orderBy("low_nation", "high_nation")
    )


@query(
    "join_asof",
    oracle="""
SELECT p.event_id, p.user_id, strftime(s.ts, '%Y-%m-%d %H:%M:%S.%f') AS signup_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
""",
    category="join",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (latest signup at-or-before each purchase), emulated
    with a single window pass — no join at all.

    Scale note: this is the Spark-native as-of strategy — union the two
    event sets, hash-partition by user_id once, and carry the last
    signup timestamp forward with `last(ignorenulls)`. One shuffle on
    user_id, no range join, no skewed nested loop. DuckDB's native
    ASOF JOIN is the oracle.
    """
    t = Tables(spark, sf_dir)
    ev = t.events.filter(F.col("event_type").isin("purchase", "signup"))
    # at equal ts, signup sorts first so an equal-time signup is visible
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.when(F.col("event_type") == "signup", 0).otherwise(1), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sig_ts = F.when(F.col("event_type") == "signup", F.col("ts"))
    return (
        ev.withColumn("signup_ts", F.last(sig_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.date_format("signup_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("signup_ts"),
        )
    )


@query(
    "topk_offset",
    oracle="""
SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 15 OFFSET 5
""",
    category="sort",
)
def topk_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT + OFFSET (total order via unique-key tiebreak)."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.select("o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(5)
        .limit(15)
    )


@query(
    "topk_with_ties",
    oracle="""
SELECT o_orderpriority, qty FROM (
  SELECT o_orderpriority, rank() OVER (ORDER BY qty DESC) AS rnk, qty
  FROM (SELECT o_orderpriority, COUNT(*) AS qty FROM orders GROUP BY o_orderpriority)
) WHERE rnk <= 3
ORDER BY qty DESC, o_orderpriority
""",
    category="sort",
)
def topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FETCH FIRST n WITH TIES — rank() <= n emulation (SURVEY §2.6)."""
    t = Tables(spark, sf_dir)
    counts = t.orders.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("qty"))
    w = Window.orderBy(F.desc("qty"))
    return (
        counts.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_orderpriority", "qty")
        .orderBy(F.desc("qty"), "o_orderpriority")
    )


@query(
    "topn_per_group",
    oracle="""
SELECT * FROM (
  SELECT c_mktsegment, c_custkey, c_name,
         row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) WHERE rn <= 3
""",
    category="sort",
)
def topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group: row_number window + filter (one shuffle on the
    group key; Spark pushes a per-partition TopK below the exchange)."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        t.customer.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_name", "rn")
    )


@query(
    "sample_bernoulli",
    oracle="""
SELECT TRUE AS within_bounds,
       CAST(floor(COUNT(*) * 0.1 * 0.8) AS BIGINT) AS lo,
       CAST(ceil(COUNT(*) * 0.1 * 1.2) AS BIGINT) AS hi
FROM lineitem
""",
    category="filter",
)
def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE BERNOULLI → df.sample. Which rows are drawn is
    engine-seeded, so the checkable contract is the statistical one:
    the seeded 10% sample's row count must land within ±20% of the
    expected size (a >10-sigma band for sf>=0.001 fixtures) — the
    bound, lo, and hi are SQL-expressible, making the query driver-
    hash-checkable (VERDICT r01 'What's wrong' #4). The sampled rows
    themselves are exercised by the count."""
    import math

    t = Tables(spark, sf_dir)
    n_total = t.lineitem.count()
    lo = int(math.floor(n_total * 0.1 * 0.8))
    hi = int(math.ceil(n_total * 0.1 * 1.2))
    sampled = t.lineitem.sample(fraction=0.1, seed=42).count()
    return spark.createDataFrame(
        [(lo <= sampled <= hi, lo, hi)], "within_bounds boolean, lo bigint, hi bigint"
    )


@query(
    "sort_nulls_ordering",
    oracle="""
SELECT c_custkey, seg
FROM (SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg FROM customer
      WHERE c_custkey < 200)
ORDER BY seg ASC NULLS FIRST, c_custkey DESC
""",
    category="sort",
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ... NULLS FIRST/LAST with a DESC tiebreak (Trino default
    null placement differs from Spark's — explicit placement is the
    portable idiom; SURVEY §2.6)."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.filter(F.col("c_custkey") < 200)
        .select("c_custkey", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"))
        .orderBy(F.col("seg").asc_nulls_first(), F.col("c_custkey").desc())
    )


@query(
    "subquery_correlated_scalar",
    oracle="""
SELECT c_custkey,
       (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
       (SELECT CAST(MAX(o_totalprice) AS DOUBLE) FROM orders WHERE o_custkey = c_custkey) AS max_spend
FROM customer
WHERE c_custkey < 200
ORDER BY c_custkey
""",
    category="join",
)
def subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries in the SELECT list — run as literal
    SQL so Catalyst's decorrelation (subquery → left outer aggregate
    join) is exercised end-to-end rather than hand-rewritten. The plan
    contains no per-row subquery execution: both scalars decorrelate
    into one aggregate join."""
    from walden_spark.tables import Tables

    t = Tables(spark, sf_dir)
    t.customer.createOrReplaceTempView("sq_customer")
    t.orders.createOrReplaceTempView("sq_orders")
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT COUNT(*) FROM sq_orders WHERE o_custkey = c_custkey) AS n_orders,
               (SELECT CAST(MAX(o_totalprice) AS DOUBLE) FROM sq_orders WHERE o_custkey = c_custkey) AS max_spend
        FROM sq_customer
        WHERE c_custkey < 200
        ORDER BY c_custkey
        """
    )


@query(
    "sql_recursive_cte",
    oracle="""
WITH RECURSIVE months(mid) AS (
  SELECT 0
  UNION ALL
  SELECT mid + 1 FROM months WHERE mid < 78
)
SELECT m.mid,
       COUNT(o_orderkey) AS n_orders
FROM months m
LEFT JOIN orders
  ON (EXTRACT(YEAR FROM o_orderdate) - 1992) * 12 + EXTRACT(MONTH FROM o_orderdate) - 1 = m.mid
GROUP BY m.mid
ORDER BY m.mid
""",
    category="join",
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4 recursive CTE): generate a month spine
    and left-join order counts — the gaps-filling calendar pattern that
    previously needed sequence()+explode. Same SQL runs in DuckDB."""
    from walden_spark.tables import Tables

    t = Tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("rc_orders")
    return spark.sql(
        """
        WITH RECURSIVE months(mid) AS (
          SELECT 0
          UNION ALL
          SELECT mid + 1 FROM months WHERE mid < 78
        )
        SELECT m.mid, COUNT(o_orderkey) AS n_orders
        FROM months m
        LEFT JOIN rc_orders
          ON (EXTRACT(YEAR FROM o_orderdate) - 1992) * 12 + EXTRACT(MONTH FROM o_orderdate) - 1 = m.mid
        GROUP BY m.mid
        ORDER BY m.mid
        """
    )


@query(
    "agg_unpivot",
    oracle="""
SELECT o_orderstatus, 'n_orders' AS metric, CAST(COUNT(*) AS DOUBLE) AS value
FROM orders GROUP BY o_orderstatus
UNION ALL
SELECT o_orderstatus, 'total_price',
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
FROM orders GROUP BY o_orderstatus
ORDER BY o_orderstatus, metric
""",
    category="aggregate",
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (Spark 3.4+): melt wide aggregates into (key, metric,
    value) rows — the inverse of agg_pivot. Oracle uses the portable
    UNION ALL formulation (DuckDB's UNPIVOT dialect differs)."""
    from walden_spark.tables import Tables

    t = Tables(spark, sf_dir)
    wide = t.orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double").alias("total_price"),
    )
    wide.createOrReplaceTempView("unpivot_wide")
    return spark.sql(
        """
        SELECT o_orderstatus, metric, value
        FROM unpivot_wide
        UNPIVOT (value FOR metric IN (n_orders, total_price))
        ORDER BY o_orderstatus, metric
        """
    )


@query(
    "sql_parameterized",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n
FROM orders
WHERE o_totalprice > 50000.0 AND o_orderstatus = 'F'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    category="filter",
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (named parameter markers) — the Trino
    prepared-statement / BI-template analog: the query text is constant
    and values bind at execution, so plans cache and injection is
    structurally impossible. Spark 4 `spark.sql(..., args=...)`."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n
        FROM orders
        WHERE o_totalprice > :min_price AND o_orderstatus = :status
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={"min_price": 50000.0, "status": "F"},
    )
