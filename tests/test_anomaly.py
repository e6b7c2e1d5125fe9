"""Unit tests for the shared anomaly operator (operators/anomaly.py)
on hand-computable series — the oracle queries cross-check it against
DuckDB on real data; these pin the estimator semantics directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from walden_spark.operators.anomaly import moment_anomalies, robust_anomalies


def _frame(spark, rows):
    return spark.createDataFrame(rows, "grp string, key long, v long")


def test_robust_flags_only_mad_outliers(spark):
    # grp a: values 10,10,10,10,100 → med=10, deviations 0,0,0,0,90 →
    # mad=0 → the 100 row deviates with zero spread: flagged.
    # grp b: 1..7 → med=4, devs {3,2,1,0,1,2,3} sorted 0..3 → mad=2 →
    # |v−4|>6 flags nothing.
    rows = [("a", k, v) for k, v in enumerate([10, 10, 10, 10, 100])]
    rows += [("b", k, v) for k, v in enumerate([1, 2, 3, 4, 5, 6, 7])]
    out = robust_anomalies(_frame(spark, rows), ["grp"], ["key"], "v").collect()
    assert [(r.grp, r.v, r.center, r.spread) for r in out] == [("a", 100, 10, 0)]


def test_robust_lower_median_even_count(spark):
    # even cohort: 1,2,3,100 → LOWER median = value at rank (4+1)//2=2
    # → med=2; devs 1,0,1,98 → mad at rank 2 of (0,1,1,98) = 1 →
    # flag |v−2|>3: only 100.
    rows = [("a", k, v) for k, v in enumerate([1, 2, 3, 100])]
    out = robust_anomalies(_frame(spark, rows), ["grp"], ["key"], "v").collect()
    assert [(r.v, r.center, r.spread) for r in out] == [(100, 2, 1)]


def test_robust_multi_column_cohort(spark):
    # cohort key (grp, key%2): evens 5,5,5 + odds 5,5,50 — only the 50
    # deviates within its own cohort.
    rows = [
        ("a", 0, 5), ("a", 2, 5), ("a", 4, 5),
        ("a", 1, 5), ("a", 3, 5), ("a", 5, 50),
    ]
    df = _frame(spark, rows).withColumn("par", F.pmod("key", F.lit(2)))
    out = robust_anomalies(df, ["grp", "par"], ["key"], "v").collect()
    assert [(r.par, r.v) for r in out] == [(1, 50)]


def test_moment_zscore_matches_formula(spark):
    # 0,0,0,0,8: mean=1.6, var=((0-1.6)^2*4+(8-1.6)^2)/4 = 12.8,
    # sd≈3.5777; z(8)=6.4/3.5777≈1.789 > 1.5; z(0)=-0.447 not flagged.
    rows = [("a", k, v) for k, v in enumerate([0, 0, 0, 0, 8])]
    out = moment_anomalies(_frame(spark, rows), ["grp"], "v", 1.5).collect()
    assert len(out) == 1 and out[0].v == 8
    assert abs(out[0].score - 6.4 / (12.8 ** 0.5)) < 1e-12


def test_moment_singleton_group_never_flagged(spark):
    # one row: stddev undefined (d−1 = 0) → NULL score → not flagged
    out = moment_anomalies(_frame(spark, [("a", 0, 99)]), ["grp"], "v", 0.0)
    assert out.count() == 0
