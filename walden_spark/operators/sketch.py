"""Mergeable frequent-items summaries (Misra–Gries / space-saving) —
Trino's ``approx_most_frequent`` analog (Spark ships HLL and quantile
sketches but no queryable frequent-items aggregate).

Two surfaces over one vectorized core:

* :func:`frequent_items` — the raw mergeable summary: every partition
  builds an ≤ ``n_counters``-counter Misra–Gries summary in one
  Arrow-batched pass, the counters union into a tiny relation, and a
  final groupBy merges them. Classic guarantees carry over partition
  merging (Agarwal et al., "Mergeable Summaries", PODS 2012):
  - merged estimate for item x is an UNDERCOUNT:
    true_f(x) − n/k ≤ est(x) ≤ true_f(x), n the total stream length;
  - every item with true_f(x) > n/k survives in the merged summary.
  Which *non-guaranteed* items survive depends on partition layout —
  the guaranteed-set/bounds contract is layout-independent, the
  candidate tail is not (same reason Trino's approx_most_frequent is
  approximate).
* :func:`heavy_hitters` — the exact two-pass form: the MG summary
  bounds the CANDIDATE set, then a second pass counts the candidates
  exactly via broadcast semi-join and keeps keys whose true count
  clears the 1/k threshold. Deterministic and hash-checkable
  (registered as ``agg_freq_sketch``) — the sketch bounds memory, not
  answer accuracy.

Scale shape: the only shuffle carries ≤ n_counters rows per partition
— bounded, independent of data volume; the per-partition pass is
streaming with O(n_counters) memory, updated a whole Arrow batch at a
time (pandas ``value_counts`` + one uniform decrement when the counter
set overflows — the generalized MG step; no per-row Python). At 100 TB
this is the only viable top-k plan when the key domain itself outgrows
memory (a plain groupBy shuffles every distinct key; the sketch
shuffles n_counters × partitions rows), and pass 2 of
``heavy_hitters`` touches only candidate rows.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from walden_spark.registry import query
from walden_spark.tables import Tables


def _mg_summarize(n_counters: int):
    """Per-partition generalized Misra–Gries over Arrow batches."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            counters = counters.add(pdf["mg_key"].value_counts(), fill_value=0)
            if len(counters) > n_counters:
                # subtract the (n_counters+1)-th largest count from all
                # and drop non-positives: one vectorized decrement step
                # equivalent to that many unit MG decrements
                cut = counters.nlargest(n_counters + 1).iloc[-1]
                counters = counters.sub(cut)
                counters = counters[counters > 0]
        out = counters.reset_index()
        out.columns = ["mg_key", "mg_residual"]
        return iter([out.astype({"mg_residual": "int64"})])

    return summarize


def frequent_items(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """Distributed Misra–Gries summary: returns (item, est) candidate
    heavy hitters, ``est`` the merged lower-bound count. Guarantees
    (module docstring): est ≤ true freq ≤ est + n/k, and any item with
    freq > n/k is present. ``col`` may be any orderable type."""
    dtype = df.schema[col].dataType.simpleString()
    partials = df.select(F.col(col).alias("mg_key")).mapInPandas(
        _mg_summarize(k), schema=f"mg_key {dtype}, mg_residual long"
    )
    return partials.groupBy(F.col("mg_key").alias("item")).agg(
        F.sum("mg_residual").alias("est")
    )


def heavy_hitters(
    df: DataFrame,
    key: Column | str,
    k: int,
    n_counters: int | None = None,
    method: str = "mg",
) -> DataFrame:
    """Keys occurring in strictly more than ``1/k`` of rows, with their
    exact counts (columns: ``key``, ``cnt``, most frequent first).

    Candidate generation (``method``):

    * ``"mg"`` (default) — Misra–Gries summaries per partition:
      DETERMINISTIC guarantee, O(n_counters) memory, but Arrow-ships
      every row through Python once. ``n_counters`` (default ``4*k``)
      sizes the summary; any value ≥ k preserves the guarantee.
    * ``"sample"`` — JVM-only: candidates are keys crossing half the
      frequency threshold in a ~``4000·k``-row Bernoulli sample. With-
      high-probability guarantee (Chernoff: a true >1/k key missing the
      half-threshold in a 4000k sample is ~e^{-500}); nothing crosses
      the Python boundary, so use it when the key column is huge and
      the WHP bound is acceptable — measured 5× faster than "mg" at
      20M rows (tools/tableformat_probe.py).

    Both paths finish with an EXACT count pass over the broadcast
    candidate set, so the returned rows and counts are exact either
    way — the method only affects how candidates are found.
    """
    keyed = df.select((F.col(key) if isinstance(key, str) else key).alias("mg_key"))
    n_total = keyed.count()  # parquet-footer-priced on file sources
    if method == "mg":
        n_counters = n_counters or 4 * k
        # the summary schema must carry the KEY's actual type (int ids
        # are the canonical heavy-hitter key): a hardcoded string here
        # breaks the Arrow conversion / the left-semi join below
        dtype = keyed.schema["mg_key"].dataType.simpleString()
        candidates = (
            keyed.mapInPandas(_mg_summarize(n_counters), f"mg_key {dtype}, mg_residual long")
            .select("mg_key")
            .distinct()
        )
    elif method == "sample":
        target = 4_000 * k
        frac = min(1.0, target / max(n_total, 1))
        candidates = (
            keyed.sample(withReplacement=False, fraction=frac, seed=7)
            .groupBy("mg_key")
            .agg(F.count(F.lit(1)).alias("s_cnt"))
            .filter(F.col("s_cnt") * (2 * k) >= F.lit(frac * n_total))
            .select("mg_key")
        )
    else:
        raise ValueError("method must be 'mg' or 'sample'")
    exact = (
        keyed.join(F.broadcast(candidates), "mg_key", "left_semi")
        .groupBy("mg_key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.filter(F.col("cnt") * k > F.lit(n_total))
        .select(F.col("mg_key").alias("key"), "cnt")
        .orderBy(F.desc("cnt"), "key")
    )


@query(
    "agg_freq_sketch",
    oracle="""
WITH counts AS (
  SELECT lang AS key, COUNT(*) AS cnt FROM documents GROUP BY lang
), total AS (SELECT COUNT(*) AS n FROM documents)
SELECT key, cnt FROM counts, total
WHERE cnt * 8 > n
ORDER BY cnt DESC, key
""",
    category="aggregate",
)
def agg_freq_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters over documents.lang (Trino approx_most_frequent
    analog): languages covering more than 1/8 of the corpus, exact
    counts via the bounded-memory Misra–Gries candidate pass. The
    oracle recomputes the same frequent set exactly — the operator's
    two-pass design makes the sketch-backed answer hash-identical to
    the exact one."""
    t = Tables(spark, sf_dir)
    return heavy_hitters(t.documents, "lang", k=8)
