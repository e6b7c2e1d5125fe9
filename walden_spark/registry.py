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
# r04 ROTATION (VERDICT r03 next-round #2, carried from r02): the r02/
# r03 windows were identical, pinning cumulative driver verification at
# 50/179. This window keeps 15 anchors (flagships + one per north-star
# family + the two streaming rows that failed in r03, so their fix is
# driver-witnessed) and fills 35 slots with names the driver has NEVER
# checked. Names rotated out stay verified by the repo's own oracle
# suite (tests/test_oracle.py runs all of them); the union of driver
# windows should keep growing round over round.
DRIVER_WINDOW: tuple[str, ...] = (
    # -- anchors (driver-verified in r02/r03; keep one per family) --
    "tpch_q1", "tpch_q3", "tpch_q6",
    "ddl_lifecycle", "ddl_dml_cow",
    "streaming_session_window", "streaming_stateful_totals",  # r03 regression rows
    "dedup_minhash_lsh",
    "knn_lsh_bucketed",
    "text_pretrain_pipeline",
    "multimodal_decode",
    "udf_pandas_scalar",
    "agg_basic",
    "win_ranking",
    "source_csv_roundtrip",
    "proj_case_cast",
    # -- rotated in: never driver-verified before r04 --
    # scalar function families (the 8 not yet driver-checked)
    "fn_string", "fn_math", "fn_bitwise", "fn_array", "fn_map",
    "fn_struct", "fn_url", "fn_variant",
    # windows (value fns, frames, GROUPS emulation)
    "win_value_functions", "win_agg_frames", "win_groups_frame",
    # set ops
    "setop_union_all", "setop_intersect_all", "setop_except",
    # joins + recursive CTE
    "join_left_outer", "join_right_outer", "join_semi", "join_cross",
    "sql_recursive_cte",
    # aggregate stragglers
    "agg_percentile_exact", "agg_stats_formula", "agg_pivot",
    # text / similarity scale paths
    "text_span_dedup", "ann_ivf_pq",
    # streaming (fixed family — get more of it independently witnessed)
    "streaming_tumbling", "streaming_stream_stream_join",
    "streaming_foreachbatch_upsert",
    # sort / filter / unnest / events family representatives
    "topn_per_group", "filter_null_semantics", "posexplode_ordinality",
    "events_funnel",
    # new in r04: Nessie-analog refs + driver-hashable TPC-DS shapes
    "ddl_branch_merge", "tpcds_fx_channel_rollup", "tpcds_fx_yoy_growth",
)

# r05 ROTATION QUEUE: 92 oracle-backed names remain never-driver-
# verified after r02∪r03∪r04 (run the snippet in tests/test_registry.py
# to regenerate). Next round: keep ~15 anchors again and fill the
# other ~35 slots from this list, preferring one per family per round —
# udf_* (6), events_* (7), text_* (12), multimodal_* (4), remaining
# tpch (16), dedup exact/jaccard/simhash/cosine, agg stragglers,
# sources, r04's own additions (ddl_mor_lifecycle,
# ddl_hidden_partition_scan, agg_freq_sketch, join_asof_tolerance,
# join_asof_forward, streaming_mor_ingest, tpcds_fx_cross_channel,
# win_groups_frame_partitioned). Cumulative target: every oracle-backed
# query driver-verified at least once by ~r07.


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
