"""Reusable anomaly-detection operator (VERDICT r09 #7): one API, two
estimators — robust (median / median-absolute-deviation) and moment
(mean / stddev z-score) — closing the events anomaly family into an
operator rather than a pair of one-off queries.

Reference parity: walden serves these as plain Trino SQL over Iceberg
(the reference ships no engine code — SURVEY.md §0); here the same
shapes are first-class, deterministic, and scale-annotated.

Determinism contract (the hard-won cross-engine rules):
* robust: every statistic is a rank-based LOWER median with a caller-
  supplied key tie-break — pure integer order statistics when the
  value column is integral, bit-equal on any engine, no interpolation.
* moment: z-scores from exact integer/decimal sums in a fixed formula
  ((v − s/d) / sqrt((ss − s²/d)/(d−1))) — identical IEEE arithmetic
  both engines; callers floor-quantize before hashing.

Scale shape: callers pre-aggregate to the scoring grain first (e.g.
daily counts), so the operator only ever sorts/aggregates the
collapsed frame; per-group statistics are tiny and broadcast back.
The 100 TB path for enormous group counts swaps the exact median for
approx_percentile over the same pre-agg (documented, not default —
exactness is what the oracle harness hashes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _lower_median(
    df: DataFrame, group_cols: list[str], order_cols: list, val_col: str, out_col: str
) -> DataFrame:
    """Rank-based lower median of ``val_col`` per group: the value at
    row_number == (count+1) DIV 2 under a total order — exact, no
    interpolation, deterministic given the tie-break columns."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    c = Window.partitionBy(*group_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_c", F.count(F.lit(1)).over(c))
        .filter(F.col("_rn") == F.expr("(_c + 1) DIV 2"))
        .select(*group_cols, F.col(val_col).alias(out_col))
    )


def robust_anomalies(
    df: DataFrame,
    group_cols: list[str],
    key_cols: list[str],
    value_col: str,
    threshold: int = 3,
) -> DataFrame:
    """MAD-rule outliers: rows where |value − median| > threshold ×
    median-absolute-deviation, statistics per ``group_cols`` cohort.
    Survives the outliers a mean/stddev score is wrecked by; spread=0
    (a perfectly constant cohort) flags any deviating row — the
    conventional degenerate reading.

    ``key_cols`` make the median tie-break total (and the output
    deterministic). Returns the input columns plus ``center`` (median)
    and ``spread`` (MAD). Input should already be at scoring grain; it
    is materialized here (localCheckpoint, NOT persist — ADVICE r10
    #4: a .persist() with no reachable unpersist point accumulates in
    the session CacheManager across bench loops and oracle re-checks,
    while checkpointed blocks are freed by the ContextCleaner once the
    result is garbage-collected) because it feeds both median passes
    and the final filter."""
    df = df.localCheckpoint(eager=True)
    med = _lower_median(df, group_cols, [value_col, *key_cols], value_col, "center")
    dev = (
        df.join(F.broadcast(med), group_cols)
        .withColumn("_dv", F.abs(F.col(value_col) - F.col("center")))
        .localCheckpoint(eager=True)
    )
    mad = _lower_median(dev, group_cols, ["_dv", *key_cols], "_dv", "spread")
    return (
        dev.join(F.broadcast(mad), group_cols)
        .filter(F.col("_dv") > threshold * F.col("spread"))
        .drop("_dv")
    )


def moment_anomalies(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    threshold: float = 1.5,
) -> DataFrame:
    """Z-score outliers: rows where |value − mean| / stddev >
    threshold, statistics per ``group_cols`` cohort from exact sums
    (sample stddev, n−1). Returns the input columns plus ``score``
    (the raw z — callers floor-quantize before hashing). Cohorts with
    fewer than two rows have undefined spread and are never flagged."""
    stats = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("double").alias("_d"),
        F.sum(value_col).cast("double").alias("_s"),
        F.sum(F.col(value_col) * F.col(value_col)).cast("double").alias("_ss"),
    )
    # F.when guards the n−1 divisor: a singleton cohort would divide by
    # zero — NULL under vanilla SQL semantics but an ArithmeticException
    # under the ANSI mode get_spark enables
    z = F.when(
        F.col("_d") > 1,
        (F.col(value_col) - F.col("_s") / F.col("_d"))
        / F.sqrt(
            (F.col("_ss") - F.col("_s") * F.col("_s") / F.col("_d"))
            / (F.col("_d") - 1)
        ),
    )
    return (
        df.join(F.broadcast(stats), group_cols)
        .withColumn("score", z)
        .filter(F.abs(F.col("score")) > threshold)
        .drop("_d", "_s", "_ss")
    )
