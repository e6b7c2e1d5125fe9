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


def test_heavy_hitters_guarantee_and_exactness(spark):
    """Misra-Gries two-pass heavy hitters: (a) result equals the exact
    frequent set with exact counts, (b) the guarantee holds under a
    tiny counter budget and an adversarial partition layout, (c) the
    candidate shuffle stays bounded by partitions x counters."""
    from walden_spark.operators.sketch import heavy_hitters

    # 3 heavy keys (>1/4 each) + a long tail of singletons, scattered
    # across partitions so no partition sees a clean local majority
    rows = (
        [("a",)] * 400 + [("b",)] * 300 + [("c",)] * 260
        + [(f"tail{i}",) for i in range(40)]
    )
    df = spark.createDataFrame(rows, "k string").repartition(16)  # round-robin scatter
    got = [(r.key, r.cnt) for r in heavy_hitters(df, "k", k=4).collect()]
    assert got == [("a", 400), ("b", 300), ("c", 260)]

    # minimal counter budget (n_counters = k) still satisfies the MG
    # guarantee: every >1/k key must appear
    got_min = {r.key for r in heavy_hitters(df, "k", k=4, n_counters=4).collect()}
    assert got_min == {"a", "b", "c"}

    # no heavy key at all → empty result, not an error
    flat = spark.createDataFrame([(f"u{i}",) for i in range(100)], "k string")
    assert heavy_hitters(flat, "k", k=4).count() == 0

    # JVM-only sampled candidate path: same exact answer
    got_s = [(r.key, r.cnt) for r in heavy_hitters(df, "k", k=4, method="sample").collect()]
    assert got_s == [("a", 400), ("b", 300), ("c", 260)]


def test_heavy_hitters_non_string_key(spark):
    """Int ids are the canonical heavy-hitter key: the mapInPandas
    summary schema must carry the key's actual type, not a hardcoded
    string (ADVICE r04 medium — broke Arrow conversion / the semi
    join for long keys)."""
    from pyspark.sql import functions as F

    from walden_spark.operators.sketch import heavy_hitters

    # key 0 appears 800x (> n/2), keys 1..3 ~130x each, 100 singletons
    df = spark.range(1300).select(
        F.when(F.col("id") < 800, F.lit(0))
        .when(F.col("id") < 1200, (F.col("id") % 3 + 1))
        .otherwise(F.col("id"))
        .cast("long")
        .alias("uid")
    ).repartition(8)
    got = [(r.key, r.cnt) for r in heavy_hitters(df, "uid", k=2).collect()]
    assert got == [(0, 800)]
    got_dbl = heavy_hitters(
        df.select(F.col("uid").cast("double").alias("uid")), "uid", k=2
    ).collect()
    assert [(r.key, r.cnt) for r in got_dbl] == [(0.0, 800)]
