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
DRIVER_WINDOW_ROUND = 13
DRIVER_WINDOW: tuple[str, ...] = (
    # -- new in r13 (window-joined immediately; the entire
    # never-driver-verified set): the two MATCH_RECOGNIZE limits r12
    # promoted to next-round work — adjacent same-class pair split and
    # mixed PREV+constant DEFINEs --
    "win_pattern_sql_same_class",
    "win_pattern_sql_same_class_all_rows",
    "win_pattern_sql_mixed_define",
    "win_pattern_sql_cycles_mid",
    "win_pattern_sql_cycles_all_rows",
    "win_pattern_sql_cycles_mid_all_rows",
    "streaming_pattern_mixed_define",
    "tpcds_q38_customer_intersect",
    "tpcds_q14_item_intersect_revenue",
    "tpcds_q35_store_not_web",
    "tpcds_q51_crossover",
    # -- re-witness: the three r04-vintage names the r12 rotation
    # displaced (the stalest anywhere in the registry) --
    "join_cross",
    "tpcds_fx_channel_rollup",
    "tpcds_fx_yoy_growth",
    # -- re-witness: the full r05 vintage (next-stalest cohort,
    # incl. the agg_freq/quantile_sketch pair displaced from r12) --
    "agg_quantile_sketch",
    # (win_groups_frame_partitioned queues for r14, displaced by
    # win_pattern_sql_cycles_mid_all_rows; the window family is
    # amply covered by the seven r13 pattern queries)
    "fn_array",
    "fn_map",
    "events_tumbling",
    "events_sliding",
    "events_session_windows",
    "ddl_dml_cow",
    "ddl_time_travel",
    "ddl_mor_lifecycle",
    "ddl_hidden_partition_scan",
    "tpcds_fx_cross_channel",
    "tpcds_fx_rollup_topn",
    "tpcds_fx_margin_rank",
    "udf_sql_function",
    "udf_pandas_grouped_agg",
    "udf_cogroup_pandas",
    "udf_arrow_optimized",
    "udf_pandas_iterator",
    "udf_pandas_window_agg",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "join_asof_tolerance",
    "join_asof_forward",
    "agg_freq_sketch",
    "knn_brute_force",
    "text_token_counts",
    "streaming_mor_ingest",
    # -- family coverage: stalest oracle-backed of each category the
    # drain leaves uncovered (proj_case_cast/posexplode_ordinality are
    # their categories' only oracle-backed members) --
    "proj_case_cast",
    "posexplode_ordinality",
    "setop_intersect",
    "multimodal_meta",
    "filter_null_semantics",
    "tpch_q18",
    "source_binaryfile_ingest",
    "sort_nulls_ordering",
    # -- remaining slots: stalest r06-vintage names in registry order
    # (the rest of the r06 cohort queues for r14) --
    # (agg_cube, agg_rollup, agg_hll_sketch, agg_linear_regression,
    # agg_histogram, fn_string_distance, fn_timezone, events_retention_cohort and the remaining r06 cohort queue for
    # r14, displaced by win_pattern_sql_same_class_all_rows; events
    # stays window-covered by tumbling/sliding/session_windows)
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
