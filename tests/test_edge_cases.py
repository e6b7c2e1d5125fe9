"""Regression tests for the ADVICE r02 findings — corpus edge cases
the fixtures don't naturally produce (short documents, sparse /
non-contiguous ids, zero-norm vectors, NULL partition values)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from walden_spark.registry import load_all


@pytest.fixture(scope="module")
def registry():
    return load_all()


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string, n_chars long").write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")


def test_decontaminate_handles_short_documents(spark, tmp_path, registry):
    """ADVICE r02 medium: docs with <8 words used to hit
    sequence(1, 0) → descending [1, 0] → element_at(w, 0) throwing
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT. They must simply contribute no
    8-grams."""
    long_text = " ".join(f"w{i}" for i in range(12))
    rows = [
        (0, long_text, 60),            # doc_id%97==0 → eval set
        (1, "too short", 9),           # 2 words — the crash case
        (2, long_text, 60),            # shares all 8-grams with doc 0
        (3, "", 0),                    # empty text
        (4, "a b c d e f g", 13),      # exactly 7 words
    ]
    _write_docs(spark, tmp_path, rows)
    out = registry["text_decontaminate"].fn(spark, str(tmp_path)).collect()
    got = {r.doc_id: r.n_contaminated_ngrams for r in out}
    assert got == {2: 5}  # 12 words → 5 distinct 8-grams, all contaminated


def test_embedding_cosine_sparse_ids_and_zero_norm(spark, tmp_path, registry):
    """ADVICE r02 low: (a) vec_ids concentrated in one pmod residue
    class used to leave off-diagonal tiles one-sided — role-L-only
    groups were mistaken for diagonal tiles (DUPLICATE pairs) and
    role-R-only groups crashed np.stack on empty; (b) zero-norm
    embeddings divided by zero."""
    rng = np.random.default_rng(7)
    dim = 8
    base = rng.normal(size=dim)
    rows = []
    n = 300
    for i in range(n):
        # every vec_id ≡ 0 (mod n_blocks) for any small block count
        vid = i * 64
        if i == 0:
            vec = [0.0] * dim  # zero-norm vector
        elif i % 2 == 0:
            vec = (base + rng.normal(scale=0.01, size=dim)).tolist()  # near-dups
        else:
            vec = rng.normal(size=dim).tolist()
        rows.append((vid, vec))
    spark.createDataFrame(rows, "vec_id long, embedding array<double>").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/embeddings.parquet")

    out = registry["dedup_embedding_cosine"].fn(spark, str(tmp_path)).collect()
    pairs = [(r.a_id, r.b_id) for r in out]
    assert len(pairs) == len(set(pairs)), "one-sided tiles must not duplicate pairs"
    assert all(np.isfinite(r.cos_sim) for r in out), "zero-norm must not yield NaN/Inf"
    assert all(r.a_id % 64 == 0 for r in out)

    # ground truth via local numpy
    ids = np.array([r[0] for r in rows])
    M = np.array([r[1] for r in rows])
    norms = np.sqrt((M * M).sum(axis=1))
    norms = np.where(norms == 0, 1.0, norms)
    S = (M @ M.T) / norms[:, None] / norms[None, :]
    iu, ju = np.nonzero(np.triu(S >= 0.45, k=1))
    expected = {(int(min(ids[i], ids[j])), int(max(ids[i], ids[j]))) for i, j in zip(iu, ju)}
    assert set(pairs) == expected


def test_drop_emptied_partition_with_null_and_int_values(spark, tmp_path):
    """ADVICE r02 low: emptied-partition DROP PARTITION used str() on
    partition values — a NULL became the literal 'None' (matching
    nothing) and typed values relied on str() round-tripping. NULL must
    map to the hive default-partition token and ints must drop clean."""
    from walden_spark.catalog import Catalog

    cat = Catalog(spark)
    schema = "walden_edge"
    t = f"{schema}.part_null"
    cat.drop_schema(schema)
    try:
        cat.create_schema(schema, location=str(tmp_path / "b"))
        df = spark.createDataFrame(
            [(1, None, 1.0), (2, None, 2.0), (3, 7, 3.0), (4, 8, 4.0)],
            "id long, bucket int, v double",
        )
        cat.write_table(df, t, partition_by=["bucket"])

        # empty the NULL partition entirely, scoped to it
        cat.delete_where(t, F.col("bucket").isNull(), partition_pred=F.col("bucket").isNull())
        assert spark.table(t).count() == 2
        parts = [r[0] for r in spark.sql(f"SHOW PARTITIONS {t}").collect()]
        assert not any("__HIVE_DEFAULT_PARTITION__" in p for p in parts), (
            f"NULL partition must be dropped, got {parts}"
        )

        # empty an int-valued partition
        cat.delete_where(t, F.col("bucket") == 7, partition_pred=F.col("bucket") == 7)
        parts = [r[0] for r in spark.sql(f"SHOW PARTITIONS {t}").collect()]
        assert parts == ["bucket=8"], f"int partition must drop clean, got {parts}"
        assert [r.id for r in spark.table(t).collect()] == [4]
    finally:
        cat.drop_schema(schema)


def test_asof_join_payload_direction_tolerance(spark):
    """Generalized as-of operator: payload carry, forward direction,
    and tolerance nulling — the merge_asof contract on a hand-checked
    fixture."""
    from datetime import datetime

    from walden_spark.operators.asof import asof_join

    T = lambda s: datetime.fromisoformat(s)  # noqa: E731
    trades = spark.createDataFrame(
        [(1, 1, T("2024-01-01 00:00:10")), (2, 1, T("2024-01-01 00:01:40")),
         (3, 2, T("2024-01-01 00:00:30"))],
        "trade_id long, uid long, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [(1, T("2024-01-01 00:00:05"), 1.0), (1, T("2024-01-01 00:00:50"), 2.0)],
        "uid long, ts timestamp, px double",
    )

    back = {
        r.trade_id: r.px
        for r in asof_join(trades, quotes, "uid", "ts", ["px"]).collect()
    }
    assert back == {1: 1.0, 2: 2.0, 3: None}  # uid 2 has no quotes at all

    fwd = {
        r.trade_id: r.px
        for r in asof_join(
            trades, quotes, "uid", "ts", ["px"], direction="forward"
        ).collect()
    }
    assert fwd == {1: 2.0, 2: None, 3: None}  # next quote at-or-after

    tol = {
        r.trade_id: r.px
        for r in asof_join(
            trades, quotes, "uid", "ts", ["px"], tolerance="10 SECONDS"
        ).collect()
    }
    # trade 1: quote 5s earlier → in tolerance; trade 2: quote 50s earlier → nulled
    assert tol == {1: 1.0, 2: None, 3: None}

    # exact-timestamp match is visible in both directions
    eq_trades = spark.createDataFrame(
        [(9, 1, T("2024-01-01 00:00:50"))], "trade_id long, uid long, ts timestamp"
    )
    for d in ("backward", "forward"):
        got = asof_join(eq_trades, quotes, "uid", "ts", ["px"], direction=d).collect()
        assert got[0].px == 2.0, d


def test_fuzzy_match_domain_blocking_cap_and_min_shared(spark):
    """fuzzy_match_domain: (a) max_token_df drops a stopword-grade
    blocking key — pairs sharing ONLY that token disappear while pairs
    also sharing a rare token survive; (b) min_shared_tokens=2 keeps
    only pairs sharing two tokens; (c) counts aggregate duplicates."""
    from walden_spark.operators.fuzzyjoin import fuzzy_match_domain

    df = spark.createDataFrame(
        [
            ("acme corp ltd",),
            ("acme corp ltd",),   # duplicate row → n=2
            ("acme corp inc",),
            ("zenith corp inc",),
            ("weird corp gmbh",),
        ],
        "name string",
    )
    out = fuzzy_match_domain(df, "name", max_dist=10).collect()
    pairs = {(r.name_a, r.name_b): (r.n_a, r.n_b, r.shared_tokens, r.lev) for r in out}
    # dup occurrence count carried through
    assert pairs[("acme corp inc", "acme corp ltd")][:2] == (1, 2)
    assert pairs[("acme corp inc", "acme corp ltd")][2] == 2  # shares acme+corp
    # "corp" is in every name: blocked pairs via it exist (within max_dist)
    assert ("acme corp inc", "zenith corp inc") in pairs

    # cap df: "corp" (df=4) excluded as a blocking key → the
    # zenith/acme pair (shared only via corp+inc... still shares inc)
    capped = fuzzy_match_domain(df, "name", max_dist=10, max_token_df=3).collect()
    cpairs = {(r.name_a, r.name_b): r.shared_tokens for r in capped}
    # corp no longer counts as a shared blocking token anywhere
    assert cpairs[("acme corp inc", "acme corp ltd")] == 1  # acme only
    # weird/zenith shared only "corp" → gone under the cap
    assert ("weird corp gmbh", "zenith corp inc") not in cpairs

    strict = fuzzy_match_domain(df, "name", max_dist=10, min_shared_tokens=2).collect()
    spairs = {(r.name_a, r.name_b) for r in strict}
    assert ("acme corp inc", "acme corp ltd") in spairs
    assert ("acme corp inc", "weird corp gmbh") not in spairs


def test_fuzzy_blocking_cap_bounds_candidate_count(spark):
    """VERDICT r05 "What's wrong" #3: the df² blow-up a stopword-grade
    blocking key causes, and the cap that bounds it. 120 names share
    one planted token — uncapped blocking emits every C(120,2) pair;
    with max_token_df below the stopword's df the candidate set
    collapses to zero (each remaining token is unique)."""
    from walden_spark.operators.fuzzyjoin import fuzzy_match_domain

    df = spark.createDataFrame(
        [(f"common u{i:03d}",) for i in range(120)], "name string"
    )
    # every pair differs only in the 3-digit suffix → lev <= 3 <= 4,
    # so the uncapped output IS the full quadratic candidate set
    assert fuzzy_match_domain(df, "name", max_dist=4).count() == 120 * 119 // 2
    assert (
        fuzzy_match_domain(df, "name", max_dist=4, max_token_df=100).count() == 0
    )
