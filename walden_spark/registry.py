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
# r07 ROTATION (VERDICT r06 next-round #2): 13 anchors — one per
# SURVEY family a never-verified name doesn't already cover, plus the
# flagships — and 37 slots holding EVERY remaining never-driver-
# verified oracle-backed name (the queue is auto-derived from the
# CORRECTNESS_r*.json files by tools/rotation_queue.py, asserted in
# tests/test_registry.py so it can't drift; r06's hand-counted comment
# said ~35 when the true count was 52 — VERDICT r06 #7). Excluded:
# agg_collect_sorted (emitted array columns when this window was cut;
# reworked later in r07 to serialize them — rotate it in r08) and the
# rows-only names (the window must be fully oracle-backed).
# Cumulative driver-verified going in: 170/222; this window takes the
# oracle-backed remainder to 208 if green, leaving 14 rows-only names
# + agg_collect_sorted + the r07-new queries (ddl_export_snapshot,
# ddl_add_files, text_bigram_lm_score) for r08.
DRIVER_WINDOW: tuple[str, ...] = (
    # -- anchors --
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
    # -- rotated in: never driver-verified before r07 --
    # aggregates
    "agg_percentile_approx", "agg_stats_builtin", "agg_map_entries",
    "agg_min_max_by", "agg_filter_clause", "agg_bool_bit", "agg_having",
    # scalar functions
    "fn_array_zip", "fn_conditional", "fn_uuid_typeof",
    # events
    "events_json_agg", "events_dedup_exact",
    # versioned-table layer (r06 additions)
    "ddl_ctas_view", "ddl_materialized_view", "ddl_shallow_clone",
    "ddl_partition_evolution",
    # sources
    "source_python_stream",
    # tpcds fixture-hashable shapes
    "tpcds_fx_hour_bands", "tpcds_fx_cumulative_channels",
    "tpcds_fx_trip_bands",
    # text pipeline stragglers
    "text_fingerprint", "text_pii_scan", "text_repetition",
    "text_decontaminate", "text_chunking", "text_stratified_sample",
    "text_sequence_pack", "text_shard_shuffle", "text_weighted_sample",
    # multimodal
    "multimodal_frame_sample", "multimodal_resize", "multimodal_dedup_exact",
    # streaming
    "streaming_sliding", "streaming_static_join", "streaming_available_now",
    "streaming_stateful_timeout_sessions", "streaming_change_feed",
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
