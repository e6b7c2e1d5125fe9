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
# r10 ROTATION (VERDICT r09 next-round #2): the never-driver-verified
# oracle-backed queue is still EMPTY (cumulative 243/243 as of r09),
# so this window is pure re-witness: the 13 family-spanning
# flagships; the 10-name r03/r04 cohort the r09 news displaced
# (fn_regex … agg_grouping_sets — prescribed by VERDICT r09 #2); the
# stalest previously-witnessed names by last-hash-verified round
# (computed from the CORRECTNESS_r*.json history, r03/r04 vintage);
# and multimodal_dedup_exact / events_gapfill (stalest of their
# families, keeping the every-family coverage property). Queries
# ADDED during r10 join the window immediately, each displacing the
# least-stale re-witness anchor (the r04 tail), so the drift guard's
# invariant holds mid-round.
#
# DRIVER_WINDOW_ROUND marks which round this window was cut FOR; the
# rotation drift-guard (tests/test_registry.py +
# tools/rotation_queue.py::window_guard_violations) uses it to stay
# green at the round boundary, and as of r09 the boundary arm demands
# FULL green (rows+schema+hash), not merely err-free.
DRIVER_WINDOW_ROUND = 10
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
    # -- re-witness: the r03/r04 cohort displaced by r09's news --
    "fn_regex",
    "fn_json",
    "distinct_pairs",
    "explode_words",
    "sample_bernoulli",
    "lateral_topn",
    "join_theta_nonequi",
    "subquery_correlated_scalar",
    "ann_ivf_probe",
    "agg_grouping_sets",
    # -- re-witness: stalest remaining (last hash-verified r03) --
    "values_inline",
    # -- re-witness: stalest remaining (last hash-verified r04) --
    # -- digest-promoted r10 (VERDICT r09 #3): the 13 TPC-DS pattern
    # queries, newly oracle-backed via frozen content digests, are the
    # entire never-driver-verified queue — the rotation guard requires
    # every one in the window (displacing the freshest r04 anchors,
    # which head the r11 queue) --
    "tpcds_q3",
    "tpcds_q42",
    "tpcds_q1_returns",
    "tpcds_cross_channel",
    "tpcds_q59_growth",
    "tpcds_q71_three_channel",
    "tpcds_q74_loyalty_growth",
    "tpcds_q77_channel_rollup",
    "tpcds_q33_manufacturer",
    "tpcds_q65_low_revenue_items",
    "tpcds_q67_rollup_topn",
    "tpcds_q36_margin_rank",
    "tpcds_q97_channel_overlap",
    "tpcds_q88_count_bands",
    "tpcds_q29_repurchase",
    # -- family-coverage re-witnesses (stalest text/events/multimodal) --
    "multimodal_dedup_exact",
    # -- new in r10 (window-joined immediately, displacing the
    # least-stale re-witness anchors whose families stay covered) --
    "win_pattern_wshape",
    "win_pattern_breakout",
    "win_pattern_plateau_surge",
    "win_exclude_group",
    "win_exclude_ties",
    "events_anomaly_weekly",
    "tpch_q21_bucketed",
    "text_split_leakage_safe",
    "streaming_pattern_vshape",
    "win_pattern_alternation",
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
