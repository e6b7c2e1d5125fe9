"""Mergeable frequent-items summary (Misra–Gries / space-saving).

The reference serves approx_most_frequent through Trino; Spark has no
built-in frequent-items aggregate, so this is the distributed
formulation: every partition builds a k-counter Misra–Gries summary in
one Arrow-batched pass, the (item, count) counters union into a tiny
relation, and a final groupBy merges them. Classic guarantees carry
over partition merging (Agarwal et al., "Mergeable summaries", PODS
2012):

* merged estimate for item x is an UNDERCOUNT: true_f(x) - n/k <=
  est(x) <= true_f(x), n the total stream length;
* every item with true_f(x) > n/k survives in the merged summary.

Scale shape: the only shuffle carries <= k counters per partition —
bounded, independent of data volume; the per-partition pass is
streaming with O(k) memory. At 100TB this is the ONLY viable exact-ish
top-k plan when the key domain itself outgrows memory (a plain groupBy
shuffles every distinct key; the sketch shuffles k * partitions rows).

Determinism note: which *non-guaranteed* items survive depends on
partition layout, which is why this ships as a library operator with
property tests instead of a hash-checked registry query — the
guaranteed-set/bounds contract is layout-independent, the candidate
tail is not (same reason Trino's approx_most_frequent is approximate).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partial(k: int):
    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for item in pdf["item"]:
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "cnt": list(counters.values())}
            )

    return summarize


def frequent_items(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """Distributed Misra–Gries: returns (item, est) candidate heavy
    hitters with est the merged lower-bound count. Guarantees (see
    module docstring): est <= true freq <= est + n/k, and any item
    with freq > n/k is present. ``col`` may be any orderable type."""
    items = df.select(F.col(col).alias("item"))
    partials = items.mapInPandas(
        _mg_partial(k), schema=f"item {df.schema[col].dataType.simpleString()}, cnt long"
    )
    return partials.groupBy("item").agg(F.sum("cnt").alias("est"))
