

def test_apply_mixture_realizes_plan(spark, sf_dir):
    """text_apply_mixture (r09): the materialized mixture must realize
    the integer-ppm plan — every doc appears exactly full_epochs or
    full_epochs+1 times, the largest source is emitted exactly once
    per doc, the realized fractional count sits within a binomial
    bound of the planned one, and (doc_id, epoch) pairs are unique
    within a source."""
    from pyspark.sql import functions as F

    from walden_spark.operators.text import text_apply_mixture
    from walden_spark.registry import load_all

    reg = load_all()
    report = {r.source: r for r in reg["text_apply_mixture"].fn(spark, sf_dir).collect()}
    assert report
    # the max-token source has upsample exactly 1.0 => planned == n_docs
    base = [r for r in report.values() if r.upsample_ppm == 1000000]
    assert base and all(r.emitted_docs == r.n_docs for r in base)
    import math

    for r in report.values():
        assert r.upsample_ppm >= 1000000
        assert r.full_epochs == r.upsample_ppm // 1000000
        assert r.planned_docs == (r.n_docs * r.upsample_ppm) // 1000000
        # binomial deviation bound on the hash-threshold fractional pick
        frac = (r.upsample_ppm % 1000000) / 1e6
        sigma = math.sqrt(max(r.n_docs * frac * (1 - frac), 1.0))
        assert abs(r.emitted_docs - r.planned_docs) <= 5 * sigma + 1

    # multiplicity + uniqueness of the materialized rows themselves
    import walden_spark.operators.text as textops

    t = textops.Tables(spark, sf_dir)
    per = t.documents.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("tokens"),
    )
    tot = per.agg(F.max("tokens").alias("max_tokens"))
    plan = per.crossJoin(F.broadcast(tot)).select(
        "source",
        F.floor(F.sqrt(F.col("max_tokens") / F.col("tokens")) * 1e6)
        .cast("bigint")
        .alias("upsample_ppm"),
    )
    mix = textops.apply_mixture(t.documents, plan)
    mult = mix.groupBy("source", "doc_id").count().collect()
    eps = {r.source: r.full_epochs for r in report.values()}
    assert all(row["count"] in (eps[row.source], eps[row.source] + 1) for row in mult)
    dup = mix.groupBy("source", "doc_id", "epoch").count().filter("count > 1").count()
    assert dup == 0


def test_dsir_select_enriches_target_domain(spark, sf_dir):
    """text_dsir_select (r11 session 3): the kept quarter must be
    ENRICHED in the target domain (lang='en') relative to the corpus —
    the whole point of importance resampling — sized at exactly
    floor(N/4) of scorable docs, ranked contiguously from 1 with
    deterministic (score DESC, doc_id) ordering."""
    from pyspark.sql import functions as F

    from walden_spark.registry import load_all
    from walden_spark.tables import Tables

    reg = load_all()
    sel = reg["text_dsir_select"].fn(spark, sf_dir).collect()
    assert sel
    ranks = [r.rnk for r in sel]
    assert ranks == list(range(1, len(ranks) + 1))
    scores = [r.score_q for r in sel]
    assert scores == sorted(scores, reverse=True)

    docs = Tables(spark, sf_dir).documents
    n_scorable = docs.filter(
        F.size(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"),
                lambda w: F.length(w) > 0,
            )
        )
        >= 2
    ).count()
    assert len(sel) == n_scorable // 4

    corpus_en = (
        docs.filter(F.col("lang") == "en").count() / docs.count()
    )
    sel_en = sum(1 for r in sel if r.lang == "en") / len(sel)
    assert sel_en > corpus_en + 0.1, (sel_en, corpus_en)
