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
# r14 ROTATION (VERDICT r13 next-round #2): the r13 window landed
# 50/50 full-green, so this window drains the STALE-WITNESS TAIL —
# computed by replaying every CORRECTNESS_r*.json for the latest
# FULL-green (rows+schema+hash) witness per name: first
# win_groups_frame_partitioned (r05 — the stalest name anywhere; the
# r13 notes mis-stated the tail as r06, caught by VERDICT r13 "What's
# wrong" #1, and tools/rotation_queue.py::stalest_witness now derives
# the claim instead of a comment), then the FULL 32-name r06 cohort
# (agg_cube..streaming_table_tail), then the stalest oracle-backed
# member of each category the drain leaves uncovered (filter/join/
# multimodal/projection/setop/sort/tpch/unnest — the every-family
# property), then r07-vintage names in registry order. After this
# round the stalest witness anywhere in the registry is r07. New r14
# queries are window-joined immediately as they land, displacing the
# newest r07 fillers.
#
# DRIVER_WINDOW_ROUND marks which round this window was cut FOR; the
# rotation drift-guard (tests/test_registry.py +
# tools/rotation_queue.py::window_guard_violations) uses it to stay
# green at the round boundary, and as of r09 the boundary arm demands
# FULL green (rows+schema+hash), not merely err-free.
DRIVER_WINDOW_ROUND = 14
DRIVER_WINDOW: tuple[str, ...] = (
    # -- stalest witness anywhere (r05) --
    "win_groups_frame_partitioned",
    # -- the full r06 cohort, registry order --
    "agg_cube",
    "agg_rollup",
    "agg_hll_sketch",
    "agg_linear_regression",
    "agg_histogram",
    "fn_string_distance",
    "fn_timezone",
    "events_retention_cohort",
    "events_path_regex",
    "events_anomaly_zscore",
    "ddl_schema_evolution",
    "ddl_eq_delete_lifecycle",
    "ddl_catalog_refs",
    "ddl_pos_delete_lifecycle",
    "ddl_branch_merge_threeway",
    "ddl_change_feed",
    "ddl_incremental_mv",
    "ddl_restore_lifecycle",
    "ddl_wap_publish",
    "ddl_txn_publish",
    "ddl_maintenance_lifecycle",
    "source_xml_roundtrip",
    "dedup_semantic_cluster",
    "knn_lsh_multiprobe",
    "text_lang_id",
    "text_hash_split",
    "text_pretrain_pipeline",
    "text_tfidf_topk",
    "streaming_dedup_watermark",
    "streaming_mor_upsert",
    "streaming_incremental_mv",
    "streaming_table_tail",
    # -- family coverage: stalest oracle-backed member of each
    # category the drain leaves uncovered --
    "distinct_pairs",
    "join_anti_null_aware",
    "multimodal_decode",
    "proj_case_cast",
    "setop_union_distinct",
    "topk_offset",
    "tpch_q5",
    "explode_words",
    # -- new in r14 (window-joined immediately; the entire
    # never-driver-verified set): five MATCH_RECOGNIZE closures
    # (skip-next pairs, the lexicographic run split / triples,
    # mid-island skip resume, runs under alternation, rescan ALL ROWS
    # under cycles), the streaming split matcher, the
    # manifest-compaction maintenance op, and the TPC-DS Q72 digest.
    # Displaced to r15 (r07-vintage fillers, in displacement order):
    # fn_conditional, fn_array_zip, agg_having, agg_filter_clause,
    # agg_min_max_by, agg_map_entries, agg_bool_bit, agg_stats_builtin;
    # agg_percentile_approx keeps the aggregate family covered,
    # fn_string_distance/fn_timezone the function family --
    "win_pattern_sql_same_class_skip_next",
    "win_pattern_sql_same_class_triple",
    "win_pattern_sql_same_class_skip_to_mid",
    "win_pattern_sql_alt_same_class",
    "win_pattern_sql_cycles_skip_next_all_rows",
    "streaming_pattern_same_class",
    "ddl_manifest_compaction",
    "tpcds_q72_inventory",
    # -- remaining slots: r07-vintage names in registry order (the
    # rest of the r07 cohort queues for r15) --
    "agg_percentile_approx",
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
