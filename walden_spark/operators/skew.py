"""Skew-aware aggregation helpers (SURVEY §4 / session.py scale notes).

AQE's skew-join splitting handles skewed *joins*; skewed *aggregations*
(one hot group key taking a whole reducer) need two-phase salting:

  phase 1: groupBy(key, salt) — the hot key's rows spread over S
           reducers, each computing a partial aggregate;
  phase 2: groupBy(key) over the S partials — merges tiny rows.

Only algebraic aggregates (sum/count/min/max, and avg as sum+count)
compose across phases; that is exactly the partial-aggregation algebra
Tungsten uses map-side, applied once more at the reducer level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from walden_spark.registry import query
from walden_spark.tables import Tables


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, Column] | None = None,
    count: bool = True,
    n_salts: int = 16,
    salt_expr: Column | None = None,
) -> DataFrame:
    """Two-phase salted aggregation: exact sums/counts per key, immune
    to a hot key saturating one reducer.

    ``salt_expr`` defaults to a deterministic row hash (NOT rand() —
    keeps retries/oracles reproducible); pass your own to salt on a
    stable row id. Sum inputs should be exact types (decimal/int) so
    the two-phase re-association cannot change the result.
    """
    sum_cols = sum_cols or {}
    salt = (salt_expr if salt_expr is not None else F.xxhash64(*[F.col(k) for k in df.columns])) % n_salts
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt")
    partials = phase1.agg(
        *([F.count(F.lit(1)).alias("__cnt")] if count else []),
        *[F.sum(expr).alias(f"__sum_{name}") for name, expr in sum_cols.items()],
    )
    phase2 = partials.groupBy(*keys)
    out = phase2.agg(
        *([F.sum("__cnt").alias("n")] if count else []),
        *[F.sum(f"__sum_{name}").alias(name) for name in sum_cols],
    )
    return out


@query(
    "skew_salted_agg",
    oracle="""
SELECT l_returnflag, COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    category="aggregate",
)
def skew_salted_agg(spark, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation on a deliberately low-cardinality
    key (l_returnflag: 3 values over all of lineitem — exactly the
    hot-key shape). Decimal sums make the re-association exact, so the
    salted plan hash-matches the naive single-phase oracle."""
    t = Tables(spark, sf_dir)
    # Project to the two referenced columns BEFORE salting: the default
    # salt hashes every input column, which drags the full 11-column
    # lineitem row through the scan (ReadSchema showed all columns) and
    # hashes ~5x more bytes per row than the aggregation needs. Salting
    # on (l_returnflag, l_extendedprice) spreads the hot key just as
    # well (price is high-cardinality) and restores column pruning;
    # phase-2 re-aggregation makes the result independent of the salt
    # assignment (exact decimal sums), so output is bit-identical.
    out = salted_agg(
        t.lineitem.select("l_returnflag", "l_extendedprice"),
        keys=["l_returnflag"],
        sum_cols={"total": F.col("l_extendedprice").cast("decimal(12,2)")},
        n_salts=16,
    )
    return out.select(
        "l_returnflag", "n", F.col("total").cast("double").alias("total")
    ).orderBy("l_returnflag")
