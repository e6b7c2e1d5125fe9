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
# r12 ROTATION (VERDICT r11 next-round #1): the r11 window landed
# 50/50 full-green, so this window DRAINS the displaced staleness
# queue — the full r03 vintage (8 names) and the r04 cohort minus
# three (27 of 30; the r12-session-2 additions displaced
# tpcds_fx_channel_rollup / tpcds_fx_yoy_growth / join_cross to r13) —
# plus the 9 queries ADDED in r12 (window-joined immediately; they are
# the entire never-driver-verified set: the three inline-group pattern
# tiers, streaming alternation, versioned schema-evolution DDL, and
# the four new TPC-DS digest queries) and the stalest oracle-backed
# name of each category the drain+news leave uncovered
# (events/filter/multimodal/projection/scan/unnest — the every-family
# property). Staleness computed from the CORRECTNESS_r*.json history
# via tools/rotation_queue.py; after this round the stalest witness
# anywhere in the registry is r04 (the three displaced names).
#
# DRIVER_WINDOW_ROUND marks which round this window was cut FOR; the
# rotation drift-guard (tests/test_registry.py +
# tools/rotation_queue.py::window_guard_violations) uses it to stay
# green at the round boundary, and as of r09 the boundary arm demands
# FULL green (rows+schema+hash), not merely err-free.
DRIVER_WINDOW_ROUND = 12
DRIVER_WINDOW: tuple[str, ...] = (
    # -- new in r12 (window-joined immediately; the entire
    # never-driver-verified set) --
    "win_pattern_sql_inline_group_ranged",
    "win_pattern_sql_inline_group_subset",
    "win_pattern_sql_inline_group_nested",
    "streaming_pattern_alternation",
    "ddl_schema_evolution_versioned",
    "tpcds_q23_frequent_buyers",
    "tpcds_q49_return_ratio_rank",
    "tpcds_q54_revenue_bands",
    "tpcds_q93_net_after_returns",
    # -- re-witness: the full r03 vintage (stalest in the registry) --
    "dedup_embedding_lsh",
    "join_full_outer",
    "setop_except_all",
    "topk_with_ties",
    "tpch_q12",
    "tpch_q16",
    "udf_python_udtf",
    "win_range_interval",
    # -- re-witness: the full r04 vintage --
    "agg_percentile_exact",
    "agg_pivot",
    "agg_stats_formula",
    "ann_ivf_pq",
    "ddl_branch_merge",
    "fn_math",
    "fn_string",
    "fn_struct",
    "fn_url",
    "fn_variant",
    "join_left_outer",
    "join_right_outer",
    "join_semi",
    "setop_except",
    "setop_intersect_all",
    "setop_union_all",
    "sql_recursive_cte",
    "streaming_foreachbatch_upsert",
    "streaming_stateful_totals",
    "streaming_stream_stream_join",
    "streaming_tumbling",
    "text_span_dedup",
    # (tpcds_fx_channel_rollup / tpcds_fx_yoy_growth — r04 vintage —
    # and join_cross queue for r13, displaced by the five r12-session-2
    # additions above; the tpcds family is window-covered by the four
    # new digest queries, joins by left/right/semi/full_outer)
    "tpch_q3",
    "tpch_q6",
    "win_agg_frames",
    "win_groups_frame",
    "win_value_functions",
    # -- family coverage: stalest oracle-backed of the categories the
    # drain leaves uncovered --
    "events_scd2_history",
    "sql_parameterized",
    "multimodal_resize",
    "proj_case_cast",
    "source_partitioned_parquet",
    "explode_words",
    # (agg_freq_sketch / agg_quantile_sketch — the r05 extras — also
    # queue for r13, displaced by ddl_schema_evolution_versioned and
    # tpcds_q93; agg stays window-covered by the r04 drain block)
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

    # Reorder: DRIVER_WINDOW prefix first, then the rest in module
    # order. Idempotent-pure (VERDICT r11 #8): build and return a NEW
    # ordered dict instead of mutating REGISTRY in place — a second
    # load_all() in one process (e.g. after a partial import) must
    # yield the identical order, and decorator registration order in
    # the global stays untouched as the stable "module order" key.
    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in DRIVER_WINDOW}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
