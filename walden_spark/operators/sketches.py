"""Frequent-items (heavy hitters) — Trino's ``approx_most_frequent``
analog (reference surface: Trino 468 aggregate functions; Spark ships
HLL and quantile sketches but no queryable frequent-items sketch).

Algorithm: two-pass distributed Misra–Gries.

1. **Summarize** (one pass, map-only): each partition maintains a
   Misra–Gries summary of at most ``n_counters`` counters, updated a
   whole Arrow batch at a time (pandas ``value_counts`` + a uniform
   decrement when the counter set overflows — the generalized MG step,
   vectorized; no per-row Python). MG summaries are mergeable with
   additive error (Agarwal et al., "Mergeable Summaries", PODS 2012):
   any key with true count > n / n_counters is GUARANTEED to survive
   in the merged candidate set. Output: ≤ n_counters rows per
   partition — the shuffle carries candidate keys only.
2. **Verify** (one pass): exact counts for the candidate set via a
   broadcast semi-join (candidates ≪ data by construction), keeping
   keys whose EXACT count clears the threshold.

The result is therefore deterministic and exact — the sketch bounds
the candidate set's size (memory), not the answer's accuracy — which
is what makes the operator driver-hashable while still being a true
bounded-memory streaming summary. At 100 TB: pass 1 is map-only with
O(partitions × n_counters) output, pass 2 scans once more with a
broadcast filter; no full groupBy over all distinct keys ever happens,
which is the point when the key space is huge (URLs, ngrams).
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
                # equivalent to many unit MG decrements
                cut = counters.nlargest(n_counters + 1).iloc[-1]
                counters = counters.sub(cut)
                counters = counters[counters > 0]
        out = counters.reset_index()
        out.columns = ["mg_key", "mg_residual"]
        return iter([out.astype({"mg_residual": "int64"})])

    return summarize


def heavy_hitters(
    df: DataFrame, key: Column | str, k: int, n_counters: int | None = None
) -> DataFrame:
    """Keys occurring in strictly more than ``1/k`` of rows, with their
    exact counts (columns: ``key``, ``cnt``, most frequent first).

    ``n_counters`` (default ``4*k``) sizes the per-partition summary;
    any value ≥ k preserves the guarantee, larger values shrink the
    candidate set's false-positive tail."""
    n_counters = n_counters or 4 * k
    keyed = df.select((F.col(key) if isinstance(key, str) else key).alias("mg_key"))
    candidates = (
        keyed.mapInPandas(_mg_summarize(n_counters), "mg_key string, mg_residual long")
        .select("mg_key")
        .distinct()
    )
    exact = (
        keyed.join(F.broadcast(candidates), "mg_key", "left_semi")
        .groupBy("mg_key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = keyed.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        exact.join(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("n_total"))
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
