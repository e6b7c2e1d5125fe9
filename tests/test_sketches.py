"""Sketch surface: HLL estimates must be mergeable and bounded.
(Sketch bytes are engine-specific, so the registry entry emits a
bounds-check boolean the oracle can verify; this test additionally pins
the mergeable-union semantics on raw estimates.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from walden_spark.registry import load_all


def test_hll_query_within_bounds(spark, sf_dir):
    reg = load_all()
    rows = reg["agg_hll_sketch"].fn(spark, sf_dir).collect()
    segs = [r for r in rows if r.level == "segment"]
    assert segs, "expected per-segment sketches"
    assert any(r.level == "union" for r in rows), "expected a union row"
    assert all(r.within_bounds for r in rows)


def test_hll_union_is_mergeable(spark):
    # build per-part sketches, union them, and check the estimator:
    # each part within 5%, union within 5%, union >= max part.
    df = spark.range(3000).select("id", (F.col("id") % 3).alias("seg"))
    per = df.groupBy("seg").agg(
        F.expr("hll_sketch_agg(id)").alias("sk"),
        F.countDistinct("id").alias("n"),
    )
    parts = per.select(
        F.expr("hll_sketch_estimate(sk)").cast("long").alias("est"), "n"
    ).collect()
    for r in parts:
        assert abs(r.est - r.n) <= max(2, 0.05 * r.n)
    total = per.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").cast("long").alias("est")
    ).collect()[0]
    assert abs(total.est - 3000) <= 0.05 * 3000
    assert total.est >= max(r.est for r in parts)


def test_misra_gries_bounds_and_recall(spark):
    """Distributed Misra-Gries on a synthetic Zipf stream: merged
    estimates must be undercounts within n/k, and every item with
    frequency > n/k must be found — regardless of partition layout
    (checked under two layouts)."""
    from walden_spark.operators.sketch import frequent_items

    # Zipf-ish: item i appears ~ N/(i+1) times -> heavy head, long tail
    n_items, reps = 200, 3000
    df = (
        spark.range(reps)
        .select(F.explode(F.sequence(F.lit(0), F.lit(n_items - 1))).alias("x"))
        .select((F.floor(F.sqrt(F.col("x") * 1.0)) ).cast("long").alias("item"))
    )
    exact = {r.item: r.c for r in df.groupBy("item").agg(F.count("*").alias("c")).collect()}
    n = sum(exact.values())
    k = 32
    for parts in (4, 17):
        got = {
            r.item: r.est
            for r in frequent_items(df.repartition(parts), "item", k=k).collect()
        }
        for item, est in got.items():
            assert est <= exact[item] <= est + n // k + 1, (item, est, exact[item])
        for item, c in exact.items():
            if c > n / k:
                assert item in got, f"guaranteed item {item} (freq {c}) missing"
