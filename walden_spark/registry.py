"""Query registry powering ``__spark_entry__`` and the oracle tests.

Every operator from SURVEY.md §2 (and every north-star operator) is
declared exactly once, as a ``@query``-decorated builder plus (usually)
a DuckDB-runnable oracle SQL string. ``__spark_entry__.queries()`` /
``oracle_sql()`` and the self-check test harness both read this table.

Determinism contract (critical for the driver's value-hash compare):
* Money-column aggregates are computed in DECIMAL(18,2) — exact and
  summation-order-independent — then cast to DOUBLE identically on the
  Spark and DuckDB sides, so both engines emit bit-identical doubles.
* Every computed column is aliased the same on both sides.
* collect_list-style results are sorted (`array_sort`) before emission.
* LIMIT/top-k queries carry a total order (unique-key tiebreak).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # DuckDB SQL; None → driver does rows-only check
    category: str = ""
    doc: str = ""
    tags: tuple = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: Optional[str] = None, category: str = "", tags: tuple = ()):
    """Register a query builder. ``oracle`` is ANSI SQL DuckDB runs on the
    same parquet tables (views pre-registered by the driver)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name,
            fn=fn,
            oracle=oracle,
            category=category,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


# The round driver's correctness gate checks the FIRST 50 registry
# entries only (r01 evidence: the window cut mid-aggregates and 93
# queries got no driver row — VERDICT r01 "What's wrong" #3). This
# curated prefix spans every SURVEY §2 family and every north-star
# operator family so one driver pass verifies at least one
# representative of everything; remaining queries follow in module
# order. tests/test_registry.py asserts the coverage property.
#
# r11 ROTATION (VERDICT r10 next-round #1): the cumulative queue was
# drained in r10 (268/268 driver-hash-verified at least once), so this
# window is the 13 family-spanning flagships; the 4 queries ADDED in
# r11 (window-joined immediately — they are the entire
# never-driver-verified set, and the mid-round guard arm requires all
# of them); the stalest name of each family the flagships+news leave
# uncovered (events/scan/multimodal, keeping the every-family
# property); and then the stalest-by-last-hash-verified re-witnesses —
# all 9 remaining r03-vintage names and the r04 cohort in order
# (the r04 anchors the r10 digest promotions displaced head this
# queue per the r10 verdict; the rest of the r04 vintage follows in
# r12). Staleness computed from the CORRECTNESS_r*.json history via
# tools/rotation_queue.py.
#
# DRIVER_WINDOW_ROUND marks which round this window was cut FOR; the
# rotation drift-guard (tests/test_registry.py +
# tools/rotation_queue.py::window_guard_violations) uses it to stay
# green at the round boundary, and as of r09 the boundary arm demands
# FULL green (rows+schema+hash), not merely err-free.
DRIVER_WINDOW_ROUND = 11
DRIVER_WINDOW: tuple[str, ...] = (
    # -- flagship anchors: one per SURVEY family --
    "tpch_q1",
    "ddl_lifecycle",
    "streaming_session_window",
    "dedup_minhash_lsh",
    "knn_lsh_bucketed",
    "join_fuzzy_blocked",
    "udf_pandas_scalar",
    "win_ranking",
    "proj_case_cast",
    "topn_per_group",
    "filter_predicates",
    "posexplode_ordinality",
    "setop_union_distinct",
    # -- new in r11 (window-joined immediately; the entire
    # never-driver-verified set) --
    "win_pattern_sql_vshape",
    "win_pattern_span_sum",
    "win_pattern_all_rows",
    "win_pattern_all_rows_final",
    "win_pattern_all_rows_running",
    "win_pattern_skip_past",
    "win_pattern_skip_to_first",
    "win_pattern_sql_alternation",
    "win_pattern_sql_alt_all_rows",
    "win_pattern_sql_subset",
    "win_pattern_sql_permute",
    "win_pattern_sql_cycles",
    "win_pattern_sql_threshold",
    "win_pattern_skip_next",
    "win_pattern_reluctant_final",
    "win_pattern_sql_alt_subset",
    "win_pattern_sql_permute_mid",
    "win_pattern_sql_alt_skip_next",
    "win_pattern_sql_cycles_subset",
    "win_pattern_skip_next_reluctant",
    "win_pattern_sql_cycles_skip_next",
    "win_pattern_sql_inline_group",
    "streaming_pattern_skip_next",
    "text_dsir_select",
    "text_stratum_cap",
    "events_type_pagerank",
    "events_user_triangles",
    "events_user_components",
    "tpcds_q29_bucketed",
    "tpch_q3_bucketed",
    "tpch_q10_bucketed",
    "streaming_anomaly_weekly",
    # -- family coverage: stalest of events/scan/multimodal --
    "events_gapfill",
    "source_json_roundtrip",
    "multimodal_frame_sample",
    # -- re-witness: stalest remaining (last hash-verified r03) --
    "agg_count_distinct",
    # (dedup_embedding_lsh also queues for r12, displaced by
    # events_user_components; dedup stays covered by the
    # dedup_minhash_lsh flagship)
    # (join_full_outer also queues for r12, displaced by
    # win_pattern_skip_next_reluctant; joins stay covered by the
    # join_fuzzy_blocked flagship)
    # (topk_with_ties also queues for r12, displaced by
    # win_pattern_sql_cycles_skip_next; topk stays covered by the
    # topn_per_group flagship)
    # (tpch_q16 also queues for r12, displaced by
    # win_pattern_sql_inline_group; tpch stays covered by the tpch_q1
    # flagship and the q3/q10 bucketed entries)
    # (udf_python_udtf also queues for r12, displaced by
    # streaming_pattern_skip_next; udf stays covered by the
    # udf_pandas_scalar flagship)
    # -- re-witness: stalest remaining (last hash-verified r04; the
    # remainder of this vintage rotates in r12) --
    # (agg_pivot also queues for r12, displaced by
    # win_pattern_sql_alt_skip_next; agg stays covered by
    # agg_count_distinct)
    # (ann_ivf_pq also queues for r12, displaced by
    # win_pattern_sql_cycles_subset; the ann/knn family stays covered
    # by the knn_lsh_bucketed flagship and dedup_embedding_lsh)
    # (agg_percentile_exact / ddl_branch_merge also queue for r12,
    # displaced by tpch_q3_bucketed / tpch_q10_bucketed; ddl stays
    # covered by the ddl_lifecycle flagship)
    "fn_bitwise",
    # (fn_string also queues for r12, displaced by
    # win_pattern_sql_permute_mid; the fn family stays window-covered
    # by fn_bitwise)
    # (fn_variant / join_cross / join_right_outer / setop_union_all /
    # setop_intersect_all / streaming_foreachbatch_upsert /
    # sql_recursive_cte / setop_except / join_semi / join_left_outer —
    # plus win_range_interval, tpch_q12, and setop_except_all from the
    # r03 block above, and fn_struct / fn_url / agg_stats_formula /
    # fn_math displaced by the session-3 additions
    # win_pattern_skip_next / win_pattern_reluctant_final /
    # text_dsir_select / events_user_triangles — all queue for r12;
    # new names join immediately, and their families stay
    # window-covered by the entries kept here)
    # (text_span_dedup — the former stalest-text slot — also queues for
    # r12, displaced by win_pattern_sql_alt_subset; the text family
    # stays covered by text_dsir_select / text_stratum_cap)
)


def load_all() -> dict[str, Query]:
    """Import every query/operator module so their decorators run."""
    import walden_spark.queries.tpch  # noqa: F401
    import walden_spark.queries.relational  # noqa: F401
    import walden_spark.queries.aggregates  # noqa: F401
    import walden_spark.queries.windows  # noqa: F401
    import walden_spark.queries.setops  # noqa: F401
    import walden_spark.queries.scalar_functions  # noqa: F401
    import walden_spark.queries.events  # noqa: F401
    import walden_spark.queries.ddl  # noqa: F401
    import walden_spark.queries.sources  # noqa: F401
    import walden_spark.queries.tpcds  # noqa: F401
    import walden_spark.functions.udf  # noqa: F401
    import walden_spark.operators.dedup  # noqa: F401
    import walden_spark.operators.rangejoin  # noqa: F401
    import walden_spark.operators.asof  # noqa: F401
    import walden_spark.operators.fuzzyjoin  # noqa: F401
    import walden_spark.operators.rollup  # noqa: F401
    import walden_spark.operators.skew  # noqa: F401
    import walden_spark.operators.sketch  # noqa: F401
    import walden_spark.operators.scd  # noqa: F401
    import walden_spark.operators.similarity  # noqa: F401
    import walden_spark.operators.text  # noqa: F401
    import walden_spark.operators.multimodal  # noqa: F401
    import walden_spark.streaming.windows  # noqa: F401
    import walden_spark.streaming.stateful  # noqa: F401
    import walden_spark.streaming.sinks  # noqa: F401

    # Reorder: DRIVER_WINDOW prefix first, then the rest in module order.
    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in DRIVER_WINDOW}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)
    return REGISTRY
