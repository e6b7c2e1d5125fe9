"""Physical-plan quality gates (SURVEY §4): the optimizations the
reference gets from Trino's CBO must stay present in our Catalyst
plans. These assert on .explain output so a regression in pushdown,
pruning, or join strategy fails CI, not just the benchmark."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from walden_spark.registry import load_all


@pytest.fixture(scope="module")
def registry():
    return load_all()


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def _hash_exchange_keys(plan: str) -> list[str]:
    """The key list of every hashpartitioning Exchange in a FORMATTED
    plan. Formatted mode prints the tree line as just 'Exchange (n)'
    and the partitioning in the node's detail block ('Arguments:
    hashpartitioning(...)') — so a substring assert on
    'Exchange hashpartitioning' never fires (r11 fix: the r09/r10
    bucketed-plan gates were vacuous for exactly that reason)."""
    import re as _re

    keys = []
    for block in plan.split("\n\n"):
        lines = block.strip().splitlines()
        if lines and _re.match(r"\(\d+\) Exchange", lines[0]):
            for ln in lines:
                if ln.startswith("Arguments: hashpartitioning("):
                    keys.append(ln[len("Arguments: hashpartitioning("):])
    return keys


def test_q6_pushdown_and_pruning(spark, sf_dir, registry):
    plan = _plan(spark, registry["tpch_q6"].fn(spark, sf_dir))
    # date + discount + quantity predicates reach the parquet scan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "ReadSchema: struct<l_quantity:double,l_extendedprice:double," in plan
    # pruned to exactly the 4 referenced columns
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_q3_broadcasts_dimensions(spark, sf_dir, registry):
    plan = _plan(spark, registry["tpch_q3"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, "customer/orders sides should broadcast"
    assert "CartesianProduct" not in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # filter pushed, not post-scan


def test_q1_partial_aggregation(spark, sf_dir, registry):
    plan = _plan(spark, registry["tpch_q1"].fn(spark, sf_dir))
    # map-side partial agg before the exchange (Tungsten partial→final)
    assert "HashAggregate" in plan
    assert plan.index("HashAggregate") < plan.index("Exchange") or plan.count("HashAggregate") >= 2


def test_minhash_no_cartesian(spark, sf_dir, registry):
    plan = _plan(spark, registry["dedup_minhash_lsh"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, (
        "LSH self-join must stay an equi-join on (band, bucket)"
    )


def test_partition_pruning(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "d1" if i % 2 else "d2", float(i)) for i in range(100)],
        "id long, day string, v double",
    )
    path = str(tmp_path / "part")
    df.write.partitionBy("day").parquet(path)
    back = spark.read.parquet(path).filter(F.col("day") == "d1").select("id")
    plan = _plan(spark, back)
    assert "PartitionFilters: [isnotnull(day" in plan
    assert "PushedFilters: [IsNotNull(day" not in plan  # partition-level, not row-level


def test_events_scan_prunes_props(spark, sf_dir, registry):
    """events queries that don't touch props must not read it (it's the
    wide column of the table)."""
    plan = _plan(spark, registry["events_tumbling"].fn(spark, sf_dir))
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "props" not in read_schema


def test_range_join_binned_is_hash_join(spark, sf_dir, registry):
    """The binned range join must plan as an equi (hash/sort-merge)
    join on __bin — not BroadcastNestedLoopJoin/CartesianProduct."""
    plan = _plan(spark, registry["range_join_binned"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_join_no_exchange(spark, sf_dir):
    """Tables co-bucketed on the join key must join with no shuffle
    Exchange on either side (the 100TB fact-fact join plan)."""
    from walden_spark.catalog import write_bucketed_table
    from walden_spark.tables import Tables

    import shutil

    t = Tables(spark, sf_dir)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # the in-memory catalog forgets tables across sessions but their
    # warehouse directories persist — clear them so saveAsTable works
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for d in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"{warehouse}/{d}", ignore_errors=True)
    write_bucketed_table(t.orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed_table(t.lineitem, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # big-big scenario: neither side broadcastable
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table("b_orders")
            .join(spark.table("b_lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderstatus")
            .count()
        )
        plan = _plan(spark, joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE b_orders")
        spark.sql("DROP TABLE b_lineitem")
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Bucketed: true" in plan
    join_section = plan.split("HashAggregate")[0]
    assert "Exchange hashpartitioning(o_orderkey" not in join_section
    assert "Exchange hashpartitioning(l_orderkey" not in join_section


def test_embedding_cosine_multiblock_matches_single(spark, sf_dir, registry):
    """The block-pair matmul must return identical pairs regardless of
    block count (multi-block path = the 100TB layout; r01's driver-side
    broadcast is gone). Also assert the operator never collects the
    table driver-side: the plan keeps the scan under FlatMapGroupsInPandas."""
    from walden_spark.operators.dedup import dedup_embedding_cosine

    single = {
        (r.a_id, r.b_id, r.cos_sim)
        for r in dedup_embedding_cosine(spark, sf_dir, rows_per_block=1 << 30).collect()
    }
    multi = {
        (r.a_id, r.b_id, r.cos_sim)
        for r in dedup_embedding_cosine(spark, sf_dir, rows_per_block=64).collect()
    }
    assert single == multi and len(single) > 0

    plan = _plan(spark, dedup_embedding_cosine(spark, sf_dir, rows_per_block=64))
    assert "FlatMapGroupsInPandas" in plan


# Queries whose semantics REQUIRE a cross/nested-loop join (explicit
# CROSS JOIN, tiny literal relations) — everything else must not
# regress into one.
_CARTESIAN_OK = {
    "join_cross",          # explicit CROSS JOIN semantics
    "join_theta_nonequi",  # pure-inequality theta join on a 25-row dim
    "tpch_q11",            # scalar-subquery threshold: BNLJ against a 1-row aggregate, O(n)
    "tpch_q22",            # same — avg-balance scalar subquery comparison
    "ann_ivf_probe",       # intentional broadcast-cross against the bounded centroid table (IVF assign is map-only by design)
    "text_tfidf_topk",     # corpus-size N: BNLJ against a 1-row aggregate, O(n)
    "text_bigram_lm_score",  # vocab-size V: BNLJ against a 1-row aggregate, O(n)
    "text_dsir_select",    # model totals + doc count: BNLJ against 1-row aggregates, O(n)
    "text_temperature_mix",  # per-source totals vs a broadcast 1-row aggregate, O(sources)
    "text_apply_mixture",  # same shape: plan arithmetic vs a broadcast 1-row max, O(sources)
    "dedup_semantic_cluster",  # intentional broadcast-cross against the bounded seed-centroid table (nearest-seed assign is map-only by design)
    "dedup_source_overlap",  # pair enumeration over the bounded DISTINCT-sources relation (|sources|^2 rows, not data); every data-touching join is equi
    "text_split_leakage_safe",  # leak-audit scalar: BNLJ against a broadcast 1-row aggregate, O(splits)=3 rows
}


def test_no_accidental_cartesian_anywhere(spark, sf_dir, registry):
    """Blanket plan-hygiene gate: no registered batch query may plan a
    CartesianProduct or BroadcastNestedLoopJoin unless its semantics
    require one. Catches an operator silently losing its equi-join key
    (the classic 100TB regression) at CI time."""
    offenders = {}
    for name, q in registry.items():
        if q.category in ("streaming", "tpcds", "ddl"):
            continue  # streaming plans differ; tpcds/ddl create state
        if name in _CARTESIAN_OK:
            continue
        try:
            plan = _plan(spark, q.fn(spark, sf_dir))
        except Exception:
            continue  # queries needing special setup are covered elsewhere
        bad = [k for k in ("CartesianProduct", "BroadcastNestedLoopJoin") if k in plan]
        if bad:
            offenders[name] = bad
    assert not offenders, f"accidental cartesian/NLJ plans: {offenders}"


def test_sorted_layout_prunes_row_groups(spark, sf_dir, tmp_path):
    """compact_table(sort_by=...)'s premise, measured: a range filter
    over a SORTED parquet layout must emit far fewer scan rows than
    over a shuffled layout (parquet row-group min/max skipping — the
    Z-order-lite data-skipping story for the leading sort dimension)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "user_id", "value")
    ev.orderBy("event_id").coalesce(4).write.parquet(str(tmp_path / "sorted"))
    ev.orderBy(F.rand(7)).coalesce(4).write.parquet(str(tmp_path / "shuffled"))

    def scan_output_rows(path: str) -> tuple[int, int]:
        df = spark.read.parquet(path).filter("event_id BETWEEN 1000 AND 1999")
        n = len(df.collect())
        leaf = df._jdf.queryExecution().executedPlan().collectLeaves().head()
        met, out = leaf.metrics(), {}
        it = met.iterator()
        while it.hasNext():
            kv = it.next()
            out[kv._1()] = kv._2().value()
        return n, out["numOutputRows"]

    n_sorted, scan_sorted = scan_output_rows(str(tmp_path / "sorted"))
    n_shuffled, scan_shuffled = scan_output_rows(str(tmp_path / "shuffled"))
    assert n_sorted == n_shuffled  # same answer either way
    assert scan_sorted * 3 <= scan_shuffled, (
        f"sorted layout should skip row groups: scan emitted {scan_sorted} vs {scan_shuffled}"
    )


def test_weighted_sample_is_take_ordered(spark, sf_dir, registry):
    """ADVICE r02 low: the Efraimidis/Spirakis sample must plan its
    global top-20 as TakeOrderedAndProject (per-partition local top-k),
    not an unpartitioned-Window single-partition global sort."""
    plan = _plan(spark, registry["text_weighted_sample"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # formatted explain prints root-first: the numbering Window must sit
    # ABOVE the take (earlier in the text) — i.e. it runs on the 20
    # survivors, and the full-table scan feeds the take directly
    assert plan.index("Window") < plan.index("TakeOrderedAndProject"), (
        "row_number must run on the 20 survivors, not the full table"
    )


def test_runtime_bloom_filter(spark, sf_dir):
    """Runtime bloom-filter join pruning (the non-partition-key analog
    of DPP; together = Trino-style dynamic filtering): a selective
    dim-side filter must inject might_contain(...bloom...) into the
    fact-side scan filter. The application-side scan threshold
    (default 10GB) makes this big-data-only in production, so the test
    lowers it to observe the rewrite on fixture data."""
    thr = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    bcast = "spark.sql.autoBroadcastJoinThreshold"
    old_thr, old_bcast = spark.conf.get(thr), spark.conf.get(bcast)
    try:
        spark.conf.set(thr, "0")
        spark.conf.set(bcast, "-1")  # broadcast joins don't need blooms
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        sel = o.filter(F.col("o_totalprice") > 400000).select("o_orderkey")
        j = l.join(sel, l.l_orderkey == sel.o_orderkey)
        plan = _plan(spark, j)
        assert "might_contain" in plan and "bloom_filter_agg" in plan
    finally:
        spark.conf.set(thr, old_thr)
        spark.conf.set(bcast, old_bcast)


def test_q15_no_single_partition_exchange(spark, sf_dir, registry):
    """VERDICT r03 "What's wrong" #2: the q15 global max must be an
    agg + broadcast 1-row join, never an unpartitioned window that
    funnels every per-supplier row through one partition."""
    plan = _plan(spark, registry["tpch_q15"].fn(spark, sf_dir))
    assert "Exchange SinglePartition" not in plan
    assert "Window" not in plan


def test_jdbc_scan_pushes_filters_and_partitions(spark, sf_dir, registry):
    """Federated JDBC read (r08): the predicate must push into the
    remote WHERE clause (starred = source-evaluated, not re-checked)
    and the bounded scan must plan 4 parallel range queries — a serial
    single-cursor federated read is wrong at any scale."""
    df = registry["source_jdbc_roundtrip"].fn(spark, sf_dir)
    plan = _plan(spark, df)
    assert "JDBCRelation" in plan and "numPartitions=4" in plan
    assert "*LessThanOrEqual(n_regionkey,2)" in plan.replace(" ", ""), plan
    # the SOURCE fans out 4 range queries (numPartitions=4 above); the
    # final partition count may differ (orderBy + AQE coalesce)


def test_zorder_prunes_files_on_both_dims(spark, sf_dir, tmp_path):
    """rewrite_zorder through the SNAPSHOT SCAN path, measured: after
    the Morton rewrite, scan()'s manifest footer-stat pruning must
    skip files for a predicate on EITHER z-dimension — 1-D sort
    clustering only ever skips on its leading column. (The parquet
    row-group-level complement lives in
    test_zorder_rewrite_skips_on_every_dimension.)"""
    from pyspark.sql import functions as F

    from walden_spark.timetravel import VersionedTable

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "value")
        .orderBy(F.rand(7))
    )
    t = VersionedTable(spark, str(tmp_path / "z"))
    t.write(ev.repartition(8))
    t.rewrite_zorder(["user_id", "value"], n_files=16)
    total = len(t.read().inputFiles())
    assert total >= 12  # the rewrite actually fanned out
    by_user = len(t.scan(filters=[("user_id", "=", 7)]).inputFiles())
    by_value = len(t.scan(filters=[("value", ">=", 250.0)]).inputFiles())
    assert by_user * 2 <= total, f"user_id dim not selective: {by_user}/{total}"
    assert by_value * 2 <= total, f"value dim not selective: {by_value}/{total}"
    # answers are layout-invariant
    assert (
        t.scan(filters=[("user_id", "=", 7)]).count()
        == ev.filter("user_id = 7").count()
    )


def test_parquet_bloom_skips_row_groups(spark, tmp_path):
    """write_parquet_bloom's reason to exist, measured: an equality
    probe on a hash-valued column (min/max stats span the domain in
    every row group — range skipping impossible) must scan far fewer
    rows when the file carries blooms than without."""
    from pyspark.sql import functions as F

    from walden_spark.sources.files import write_parquet_bloom

    df = spark.range(400_000).select(
        F.md5(F.col("id").cast("string")).alias("k"), F.col("id").alias("v")
    )
    write_parquet_bloom(
        df.coalesce(1), str(tmp_path / "bloom"), ["k"], block_size=256 * 1024
    )
    df.coalesce(1).write.option("parquet.block.size", str(256 * 1024)).parquet(
        str(tmp_path / "plain")
    )
    target = df.filter("v = 123456").select("k").collect()[0].k

    def scan_rows(path: str) -> tuple[int, int]:
        q = spark.read.parquet(path).filter(F.col("k") == target)
        n = len(q.collect())
        leaf = q._jdf.queryExecution().executedPlan().collectLeaves().head()
        it = leaf.metrics().iterator()
        out = {}
        while it.hasNext():
            kv = it.next()
            out[kv._1()] = kv._2().value()
        return n, out["numOutputRows"]

    n_b, scan_b = scan_rows(str(tmp_path / "bloom"))
    n_p, scan_p = scan_rows(str(tmp_path / "plain"))
    assert n_b == n_p == 1          # same answer
    assert scan_b * 10 <= scan_p, (  # measured 67x; assert a safe 10x
        f"bloom should skip row groups: {scan_b} vs {scan_p}"
    )


def test_cbo_reorders_pessimal_join(spark, tmp_path):
    """Stats-driven join reordering (the Trino-CBO behavior; r08):
    with ANALYZE'd tables, a query written in a pessimal order —
    fact JOIN fact first, tiny selective dim last — must be reordered
    so the dim joins the fact BEFORE the fact-fact join. cbo.enabled
    alone never does this (the reorder rule has its own flag, now a
    session default)."""
    import re
    import shutil

    from pyspark.sql import functions as F

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("cb_fact", "cb_mid", "cb_dim"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    spark.range(200_000).select(
        F.col("id").alias("k"), (F.col("id") % 1000).alias("d")
    ).write.saveAsTable("cb_fact")
    spark.range(50_000).select(
        F.col("id").alias("k"), (F.col("id") % 1000).alias("m")
    ).write.saveAsTable("cb_mid")
    spark.range(100).select(
        F.col("id").alias("d"), F.lit("x").alias("nm")
    ).write.saveAsTable("cb_dim")
    try:
        for t in ("cb_fact", "cb_mid", "cb_dim"):
            spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS")
            spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")
        q = (
            "SELECT f.k FROM cb_fact f JOIN cb_mid m ON f.k = m.k "
            "JOIN cb_dim d ON f.d = d.d WHERE d.d < 5"
        )
        assert spark.conf.get("spark.sql.cbo.joinReorder.enabled") == "true"
        plan = spark.sql(q)._jdf.queryExecution().optimizedPlan().toString()
        order = []
        for r in re.findall(r"cb_(fact|mid|dim)", plan):
            if r not in order:
                order.append(r)
        assert order.index("dim") < order.index("mid"), (
            f"selective dim should join before the fact-fact join: {order}"
        )
    finally:
        for t in ("cb_fact", "cb_mid", "cb_dim"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_aqe_splits_skewed_join_partition(spark, sf_dir):
    """SCALING.md's skew story leans on AQE skew-join; this pins that
    the machinery actually engages: a hot-key join under observation-
    friendly thresholds must show SortMergeJoin(skew=true) with an
    AQEShuffleRead skewed split in the EXECUTED adaptive plan.
    (Detection is on post-compression shuffle bytes — a constant-key
    partition RLE-compresses below any threshold, which is why the
    payload is random and why production thresholds are byte-based.)"""
    from pyspark.sql import functions as F

    left = spark.range(600_000).select(
        F.when(F.col("id") < 500_000, 0).otherwise(F.col("id")).alias("k"),
        F.rand(7).alias("v"),
    )
    right = spark.range(50_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16384",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16384",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = left.join(right, "k").groupBy().count()
        # hot key (500k rows) matches right key 0; ids >= 500k miss
        assert j.collect()[0][0] == 500_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in plan, plan[:2000]
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_jdbc_catalog_pushes_aggregates(spark, sf_dir, registry):
    """Federated aggregate pushdown: the GROUP BY must execute inside
    the remote engine — PushedAggregates/PushedGroupByExpressions in
    the scan, so only group rows cross the wire."""
    df = registry["source_jdbc_agg_pushdown"].fn(spark, sf_dir)
    plan = _plan(spark, df)
    assert "PushedAggregates:" in plan and "COUNT(" in plan, plan[:1500]
    assert "PushedGroupByExpressions:" in plan


def test_q21_bucketed_no_fact_exchange(spark, sf_dir, registry):
    """tpch_q21_bucketed (r10, VERDICT r09 #6): on the maintained
    orderkey-bucketed layout, the l1 fact-fact join, both distincts,
    and both semi joins consume the bucket distribution — no
    hashpartitioning on any fact key anywhere in the plan; the only
    exchange allowed is the final tiny per-supplier-name aggregate."""
    df = registry["tpch_q21_bucketed"].fn(spark, sf_dir)
    plan = _plan(spark, df)
    exch = _hash_exchange_keys(plan)
    for key in ("l_orderkey", "o_orderkey", "k_orderkey", "m_orderkey", "s_orderkey"):
        assert not any(e.startswith(key) for e in exch), (
            f"bucketed q21 must not shuffle the facts on {key}: {exch}"
        )
    assert len(exch) <= 1, exch  # s_name agg only
    assert "CartesianProduct" not in plan


def test_ensure_bucketed_table_reuses_and_rebuilds(spark, sf_dir):
    """The maintained bucketed-ingest contract: matching layout+source
    is reused without invoking the builder; a changed source triggers
    a rebuild; TBLPROPERTIES record the contract."""
    from walden_spark.catalog import ensure_bucketed_table, table_properties

    calls = []

    def builder():
        calls.append(1)
        return spark.range(10).selectExpr("id AS k", "id * 2 AS v")

    name = "walden_test_bkt_reuse"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    ensure_bucketed_table(spark, name, builder, ["k"], 4, ["k"], source="src_a")
    assert calls == [1]
    props = table_properties(spark, name)
    assert props["walden.bucket.cols"] == "k"
    assert props["walden.bucket.n"] == "4"
    assert props["walden.ingest.source"] == "src_a"
    # same contract: reused, builder NOT invoked again
    df = ensure_bucketed_table(spark, name, builder, ["k"], 4, ["k"], source="src_a")
    assert calls == [1]
    assert df.count() == 10
    # different source (e.g. another sf dir): rebuilt
    ensure_bucketed_table(spark, name, builder, ["k"], 4, ["k"], source="src_b")
    assert calls == [1, 1]
    assert table_properties(spark, name)["walden.ingest.source"] == "src_b"
    # different bucket count: rebuilt too
    ensure_bucketed_table(spark, name, builder, ["k"], 8, ["k"], source="src_b")
    assert calls == [1, 1, 1]
    # quoted source path (ADVICE r10 #5): the TBLPROPERTIES statement
    # must escape it — and the recorded value must round-trip exactly,
    # so the reuse check still matches on the next call
    quoted = "/data/o'brien/sf0.1"
    ensure_bucketed_table(spark, name, builder, ["k"], 8, ["k"], source=quoted)
    assert calls == [1, 1, 1, 1]
    assert table_properties(spark, name)["walden.ingest.source"] == quoted
    ensure_bucketed_table(spark, name, builder, ["k"], 8, ["k"], source=quoted)
    assert calls == [1, 1, 1, 1], "escaped source must still reuse"
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_q29_bucketed_no_fact_exchange(spark, sf_dir, registry):
    """tpcds_q29_bucketed (r11, VERDICT r10 #5): on the maintained
    (customer,item)-bucketed store_returns/catalog_sales and
    ticket-bucketed store_sales, the 3-fact chain must never shuffle a
    FULL fact: the sr⋈cs join consumes the bucket distribution with
    zero exchanges, and the only hashpartitioning allowed besides the
    final i_item_id aggregate is the returns-sized intermediate being
    re-keyed onto bucketed store_sales' ticket distribution.
    Auto-broadcast is disabled so the tiny test scale can't hide the
    distribution story behind BroadcastHashJoins (the explicit
    F.broadcast hint on the item dim still applies — dims broadcast,
    facts never shuffle)."""
    from walden_spark.queries.tpcds import TPCDS_BODIES

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = TPCDS_BODIES["tpcds_q29_bucketed"](spark, sf_dir)
        plan = _plan(spark, df)
    finally:
        for k, v in prev.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)
    exch = _hash_exchange_keys(plan)
    for key in ("cs_customer_sk", "cs_item_sk", "ss_ticket_number",
                "sr_customer_sk", "sr_item_sk"):
        assert not any(e.startswith(key) for e in exch), (
            f"bucketed q29 must not shuffle a fact on {key}: {exch}"
        )
    # allowed: the sr_ticket intermediate re-key + the i_item_id agg
    assert len(exch) <= 2, exch
    assert any(e.startswith("i_item_id") for e in exch), exch
    assert any(e.startswith("sr_ticket_number") for e in exch), (
        f"the ticket re-key must hit the returns-sized intermediate, "
        f"not a fact: {exch}"
    )
    assert plan.count("SelectedBucketsCount") == 3, "all three facts bucketed-scanned"
    assert "CartesianProduct" not in plan


def test_q18_bucketed_no_fact_exchange(spark, sf_dir, registry):
    """tpch_q18_bucketed (r09): with lineitem+orders bucketed on
    orderkey, the HAVING groupBy, semi join, and fact-fact join must
    all consume the bucketing distribution — zero hashpartitioning
    exchanges anywhere in the plan (broadcast exchanges for the tiny
    customer dim are fine). This is the shuffle the plain q18 pays
    twice per run and the bucketed layout pays once at write time."""
    df = registry["tpch_q18_bucketed"].fn(spark, sf_dir)
    plan = _plan(spark, df)
    assert _hash_exchange_keys(plan) == [], (
        "bucketed q18 must not shuffle the fact tables"
    )
    assert "CartesianProduct" not in plan


def test_dsir_weight_join_broadcasts_and_no_quadratic_joins(spark, sf_dir):
    """text_dsir_select plan contract (r11 session 3): the B=512-row
    weight table must reach the n-gram stream as a BroadcastHashJoin
    (never a shuffle of the token stream on the bucket key), and the
    only nested-loop joins allowed are the scalar Cross joins against
    the single-row totals frames — anything else quadratic fails."""
    from walden_spark.registry import load_all

    reg = load_all()
    plan = _plan(spark, reg["text_dsir_select"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    import re as _re

    for line in plan.splitlines():
        if _re.match(r"^\(\d+\) ", line.strip()):
            continue  # detail-block header repeats the bare node name
        if "NestedLoopJoin" in line or "CartesianProduct" in line:
            assert "Cross" in line, line  # scalar totals joins only
    # the token stream must not hash-shuffle on the bucket key b — the
    # weight join is broadcast; only model aggregates key on b
    assert "SortMergeJoin" not in plan


def test_triangles_plan_all_equi_joins(spark, sf_dir):
    """events_user_triangles plan contract: the co-occurrence pairing,
    orientation, wedge, and closure joins are all EQUI joins — no
    nested loop, no cartesian anywhere in the tree."""
    from walden_spark.registry import load_all

    reg = load_all()
    plan = _plan(spark, reg["events_user_triangles"].fn(spark, sf_dir))
    assert "NestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q3_bucketed_zero_fact_exchanges(spark, sf_dir, registry):
    """tpch_q3_bucketed (r11 session 3): customer broadcasts, the
    fact-fact join consumes the bucket distribution, and the final
    (l_orderkey, orderdate, priority) aggregate reuses it — hash
    partitioning on the orderkey satisfies any group set containing
    it — so the plan carries ZERO hash exchanges."""
    df = registry["tpch_q3_bucketed"].fn(spark, sf_dir)
    plan = _plan(spark, df)
    exch = _hash_exchange_keys(plan)
    assert exch == [], exch
    assert "CartesianProduct" not in plan


def test_q10_bucketed_only_customer_grain_exchange(spark, sf_dir, registry):
    """tpch_q10_bucketed: dims broadcast, the orders⋈lineitem join is
    exchange-free on the bucket layout; the single remaining exchange
    is the partial-aggregated customer-grain shuffle (group keys) —
    never a fact key."""
    df = registry["tpch_q10_bucketed"].fn(spark, sf_dir)
    plan = _plan(spark, df)
    exch = _hash_exchange_keys(plan)
    for key in ("l_orderkey", "o_orderkey"):
        assert not any(e.startswith(key) for e in exch), exch
    assert len(exch) <= 1, exch  # customer-grain agg only
    assert "CartesianProduct" not in plan


def test_bucketed_contract_includes_projection(spark):
    """ensure_bucketed_table (r11 session 3): the projected column
    list is part of the layout contract — widening it must REBUILD
    rather than silently reuse the narrower table."""
    from walden_spark.catalog import ensure_bucketed_table, table_properties

    calls = []

    def make(cols):
        def builder():
            calls.append(cols)
            return spark.range(10).selectExpr(
                "id AS k", *[f"id * {i + 2} AS {c}" for i, c in enumerate(cols)]
            )
        return builder

    name = "walden_test_bkt_cols"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    ensure_bucketed_table(
        spark, name, make(["v"]), ["k"], 4, ["k"], source="s",
        columns=["k", "v"],
    )
    assert calls == [["v"]]
    assert table_properties(spark, name)["walden.ingest.cols"] == "k,v"
    # same contract → reuse
    ensure_bucketed_table(
        spark, name, make(["v"]), ["k"], 4, ["k"], source="s",
        columns=["k", "v"],
    )
    assert calls == [["v"]]
    # widened projection → rebuild, and the new column is served
    out = ensure_bucketed_table(
        spark, name, make(["v", "w"]), ["k"], 4, ["k"], source="s",
        columns=["k", "v", "w"],
    )
    assert calls == [["v"], ["v", "w"]]
    assert "w" in out.columns
    spark.sql(f"DROP TABLE IF EXISTS {name}")


# ---------------------------------------------------------------------------
# Headline plan-regression gates (r13, VERDICT r12 #4): the bench's 22
# headline plans were audited by hand each round but never FROZEN, so a
# plan regression under Spark conf drift (a lost broadcast, a new
# exchange) would surface only as noise-shrouded wall time. The
# fingerprint is deliberately coarse — hash-exchange count, broadcast-
# join count, sort-merge-join count, cartesian count — exactly the
# shapes a regression changes, while leaving codegen/statistics detail
# free to evolve. Verified identical at sf0.001 and sf0.1 before
# freezing (static plans here don't depend on row counts; broadcast
# sides are chosen structurally by the queries themselves).
# ---------------------------------------------------------------------------
HEADLINE_PLAN_FINGERPRINTS = {
    "tpch_q1": {"hash_exch": 1, "bhj": 0, "smj": 0, "cartesian": 0},
    "tpch_q3": {"hash_exch": 1, "bhj": 2, "smj": 0, "cartesian": 0},
    "tpch_q5": {"hash_exch": 1, "bhj": 5, "smj": 0, "cartesian": 0},
    "tpch_q6": {"hash_exch": 0, "bhj": 0, "smj": 0, "cartesian": 0},
    "tpch_q8": {"hash_exch": 1, "bhj": 7, "smj": 0, "cartesian": 0},
    "tpch_q10": {"hash_exch": 1, "bhj": 3, "smj": 0, "cartesian": 0},
    "tpch_q13": {"hash_exch": 2, "bhj": 1, "smj": 0, "cartesian": 0},
    # r14: single-fact-scan shape (group keys functionally determined by
    # o_orderkey) — the HAVING subquery's aggregate IS the outer sum, so
    # one lineitem aggregate + two broadcast joins replaces the
    # semi-join + second fact scan + re-aggregate (BENCH_NOTES r14).
    "tpch_q18": {"hash_exch": 1, "bhj": 2, "smj": 0, "cartesian": 0},
    "dedup_exact": {"hash_exch": 1, "bhj": 0, "smj": 0, "cartesian": 0},
    "dedup_minhash_lsh": {"hash_exch": 1, "bhj": 3, "smj": 0, "cartesian": 0},
    "dedup_simhash": {"hash_exch": 5, "bhj": 4, "smj": 0, "cartesian": 0},
    "dedup_embedding_cosine": {"hash_exch": 1, "bhj": 2, "smj": 0, "cartesian": 0},
    "knn_brute_force": {"hash_exch": 1, "bhj": 0, "smj": 0, "cartesian": 0},
    "knn_lsh_bucketed": {"hash_exch": 1, "bhj": 1, "smj": 0, "cartesian": 0},
    # r14: single-pass shape — the per-source median re-broadcasts to the
    # partition's rows as a window aggregate over the same partition key,
    # so the second scoring scan + broadcast threshold join vanish
    # (BENCH_NOTES r14).
    "text_quality_filter_per_source": {"hash_exch": 1, "bhj": 0, "smj": 0, "cartesian": 0},
    "text_quality_score": {"hash_exch": 0, "bhj": 0, "smj": 0, "cartesian": 0},
    "udf_pandas_scalar": {"hash_exch": 0, "bhj": 0, "smj": 0, "cartesian": 0},
    "events_tumbling": {"hash_exch": 1, "bhj": 0, "smj": 0, "cartesian": 0},
    # r14: the finest (15m) level is localCheckpointed once per
    # invocation, so the three union branches stop re-deriving it from
    # three copies of the raw scan — 6 exchanges -> 3 (BENCH_NOTES r14).
    "events_hypertable_rollup": {"hash_exch": 3, "bhj": 0, "smj": 0, "cartesian": 0},
    "range_join_binned": {"hash_exch": 0, "bhj": 1, "smj": 0, "cartesian": 0},
    "skew_salted_agg": {"hash_exch": 2, "bhj": 0, "smj": 0, "cartesian": 0},
    "win_ranking": {"hash_exch": 1, "bhj": 0, "smj": 0, "cartesian": 0},
}


def _plan_fingerprint(plan: str) -> dict:
    return {
        "hash_exch": len(_hash_exchange_keys(plan)),
        "bhj": plan.count(") BroadcastHashJoin"),
        "smj": plan.count(") SortMergeJoin"),
        "cartesian": plan.count("CartesianProduct"),
    }


def test_headline_bench_set_matches_bench_py():
    """The frozen table must cover exactly the queries bench.py sweeps
    — a headline added to bench.py without a frozen fingerprint (or
    a stale entry for a removed one) fails here, keeping the gate and
    the bench in lockstep."""
    import bench

    from walden_spark.registry import load_all

    reg = load_all()
    names = [n for n in bench.HEADLINE if n in reg]
    for pref in bench.EXTRA_PREFIXES:
        names += [n for n in sorted(reg) if n.startswith(pref) and n not in names]
    assert sorted(names) == sorted(HEADLINE_PLAN_FINGERPRINTS)


def test_headline_plan_fingerprints_frozen(spark, sf_dir, registry):
    """Every headline query's physical plan must keep its frozen shape:
    same hash-exchange count, same broadcast/sort-merge join counts,
    zero cartesian products. A legitimate plan improvement updates the
    table here WITH a BENCH_NOTES.md entry explaining the delta.

    Cold-plan contract: earlier tests (the oracle sweep) leave frames
    persisted, and Spark's cache substitutes InMemoryRelation into any
    later plan whose subtree matches — changing exchange/join counts
    without any code regression. The bench runs these queries in a
    fresh session, so the frozen shapes are the UNCACHED plans; clear
    the session cache before fingerprinting."""
    spark.catalog.clearCache()
    bad = {}
    for name, want in HEADLINE_PLAN_FINGERPRINTS.items():
        plan = _plan(spark, registry[name].fn(spark, sf_dir))
        got = _plan_fingerprint(plan)
        if got != want:
            bad[name] = (want, got)
    assert not bad, f"headline plan regressions (want, got): {bad}"
