"""Streaming sinks (SURVEY §7.1 M5): foreachBatch → Parquet tables.

``foreachBatch`` is the production sink shape: each micro-batch is a
normal DataFrame you write with the full batch API (Parquet/table/
JDBC/MERGE), getting exactly-once *table* semantics from the streaming
checkpoint (a replayed batchId simply overwrites its own output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def parquet_sink(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Stream → Parquet directory via foreachBatch.

    Idempotent under micro-batch replay: output lands under
    ``batch_id=<n>`` partitions, so a retried batch overwrites itself
    instead of duplicating rows (the plain file sink would rely on its
    own log; this shape also supports MERGE-style sinks)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        w = batch_df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(f"{path}/batch_id={batch_id}")

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from walden_spark.registry import query  # noqa: E402


@query(
    "streaming_foreachbatch_upsert",
    oracle="""
SELECT user_id, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM events GROUP BY user_id
""",
    category="streaming",
)
def streaming_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental streaming UPSERT into a snapshot-versioned table:
    readStream (4 time-ranged micro-batches) → foreachBatch merges each
    batch's per-user partial aggregate into a VersionedTable — the
    production sink shape (stream → continuously-maintained serving
    table with snapshot history; the reference's Iceberg streaming
    ingest analog). Partials compose in DECIMAL so the final state
    equals the batch aggregation the oracle runs; each micro-batch
    commit is a retained snapshot (asserted in tests/test_streaming.py).
    """
    import tempfile

    from walden_spark.tables import load_table
    from walden_spark.timetravel import VersionedTable

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")

    # stage 4 contiguous time ranges so the file source replays them in
    # order (mirrors streaming_stateful_timeout_sessions)
    stage = tempfile.mkdtemp(prefix="walden_upsert_stream_")
    ev_us = ev.withColumn("us", F.unix_micros("ts"))
    qs = ev_us.approxQuantile("us", [0.25, 0.5, 0.75], 0.0)
    bounds = [None, *qs, None]
    for i in range(4):
        part = ev_us
        if bounds[i] is not None:
            part = part.filter(F.col("us") > F.lit(int(bounds[i])))
        if bounds[i + 1] is not None:
            part = part.filter(F.col("us") <= F.lit(int(bounds[i + 1])))
        part.drop("us").coalesce(1).write.mode("overwrite").parquet(f"{stage}/b{i}")

    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="walden_upsert_vt_") + "/totals")

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        part = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("decimal(18,2)").alias("total_dec"),
        )
        try:
            cur = vt.read()
        except FileNotFoundError:
            vt.write(part, operation=f"batch_{batch_id}")
            return
        merged = (
            cur.unionByName(part)
            .groupBy("user_id")
            .agg(F.sum("n").alias("n"), F.sum("total_dec").cast("decimal(18,2)").alias("total_dec"))
        )
        vt.write(merged, operation=f"batch_{batch_id}")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )
    q = stream.writeStream.foreachBatch(upsert).trigger(availableNow=True).start()
    q.awaitTermination()

    out = vt.read().select(
        "user_id",
        F.col("n").cast("bigint").alias("n"),
        F.col("total_dec").cast("double").alias("total"),
    )
    # stash for the history assertion in tests
    streaming_foreachbatch_upsert.last_table = vt  # type: ignore[attr-defined]
    return out


@query(
    "streaming_mor_ingest",
    oracle="""
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events GROUP BY event_type
""",
    category="streaming",
)
def streaming_mor_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest into a merge-on-read table (the reference's
    Iceberg streaming-ingest story): readStream replays the events
    fixture as 4 time-ranged micro-batches, foreachBatch lands each as
    an O(batch) MoR append — no table rewrite per commit, one retained
    snapshot per batch — and the final aggregate over the composed
    table equals the batch aggregate the oracle computes. History
    shape (1 full + 3 append layers) is asserted in-query."""
    import tempfile

    from walden_spark.tables import load_table
    from walden_spark.timetravel import VersionedTable

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")

    stage = tempfile.mkdtemp(prefix="walden_mor_stream_")
    ev_us = ev.withColumn("us", F.unix_micros("ts"))
    qs = ev_us.approxQuantile("us", [0.25, 0.5, 0.75], 0.0)
    bounds = [None, *qs, None]
    for i in range(4):
        part = ev_us
        if bounds[i] is not None:
            part = part.filter(F.col("us") > F.lit(int(bounds[i])))
        if bounds[i + 1] is not None:
            part = part.filter(F.col("us") <= F.lit(int(bounds[i + 1])))
        part.drop("us").coalesce(1).write.mode("overwrite").parquet(f"{stage}/b{i}")

    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="walden_mor_vt_") + "/events_i")

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if vt.head() is None:  # first batch bootstraps the base snapshot
            vt.write(batch_df, operation=f"batch_{batch_id}")
        else:
            vt.append(batch_df)  # O(batch): no rewrite of prior data

    stream = (
        spark.readStream.schema("event_type string, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )
    q = stream.writeStream.foreachBatch(ingest).trigger(availableNow=True).start()
    q.awaitTermination()

    ms = vt._manifests()
    assert len(ms) == 4 and all(m.get("mor") for m in ms[1:]), (
        "expected 1 full + 3 merge-on-read append commits"
    )
    streaming_mor_ingest.last_table = vt  # type: ignore[attr-defined]
    return (
        vt.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
    )


@query(
    "streaming_mor_upsert",
    oracle="""
SELECT event_id, event_type,
       CASE WHEN event_id % 3 = 0 THEN value * 2
            WHEN event_id % 5 = 0 THEN value * 3
            ELSE value END AS value
FROM events
ORDER BY event_id
""",
    category="streaming",
)
def streaming_mor_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming UPSERT ingest into the versioned table format: the
    base snapshot holds every event, then two key-disjoint correction
    batches stream in via foreachBatch → upsert_keys — each lands as
    ONE O(batch) merge-on-read layer whose data file is both the
    equality-delete key source and the appended rows (Iceberg's
    delete-file + data-file single commit). Disjoint key sets make the
    batches commutative, so the result is deterministic under any
    micro-batch arrival order; the oracle states the final per-event
    value as a CASE over the raw fixture."""
    import tempfile

    from walden_spark.tables import load_table
    from walden_spark.timetravel import VersionedTable

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="walden_upsert_vt_") + "/events_u")
    vt.write(ev)  # base snapshot (batch bootstrap)

    b1 = ev.filter(F.col("event_id") % 3 == 0).withColumn("value", F.col("value") * 2)
    b2 = ev.filter((F.col("event_id") % 3 != 0) & (F.col("event_id") % 5 == 0)).withColumn(
        "value", F.col("value") * 3
    )
    stage = tempfile.mkdtemp(prefix="walden_upsert_stream_")
    b1.coalesce(1).write.mode("overwrite").parquet(f"{stage}/b0")
    b2.coalesce(1).write.mode("overwrite").parquet(f"{stage}/b1")

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        vt.upsert_keys(batch_df, on=["event_id"])  # O(batch), one commit

    stream = (
        spark.readStream.schema("event_id long, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )
    q = stream.writeStream.foreachBatch(upsert).trigger(availableNow=True).start()
    q.awaitTermination()

    ms = vt._manifests()
    assert [m["operation"] for m in ms[1:]] == ["upsert_mor", "upsert_mor"], (
        "expected two streaming upsert layers over the base snapshot"
    )
    return vt.read().orderBy("event_id")


@query(
    "streaming_incremental_mv",
    oracle="""
SELECT CASE WHEN event_id % 7 = 0 THEN 'corrected'
            WHEN event_id % 11 = 0 THEN 'flagged'
            ELSE event_type END AS event_type,
       CAST(SUM(event_id) AS BIGINT) AS key_total,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM events
GROUP BY 1
""",
    category="streaming",
)
def streaming_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming upserts + CDF-driven view maintenance, composed: each
    micro-batch commits an O(batch) upsert layer to the versioned
    source, and the aggregate view refreshes from the source's CHANGE
    FEED — folding the retracted pre-image rows (-) and upserted rows
    (+) for only the touched groups. Neither the per-batch commit nor
    the per-batch refresh ever re-scans the source; the final view
    state equals the oracle's full recompute over the corrected
    events. Key-disjoint batches keep the result arrival-order
    deterministic."""
    import tempfile

    from walden_spark.tables import load_table
    from walden_spark.timetravel import IncrementalAggView, VersionedTable

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    base = tempfile.mkdtemp(prefix="walden_simv_")
    vt = VersionedTable(spark, base + "/events_s")
    vt.write(ev)
    mv = IncrementalAggView(
        spark, vt, base + "/mv",
        group_by=["event_type"], sums={"key_total": "event_id"},
    )
    mv.refresh()  # materialize once against the base snapshot

    b1 = ev.filter(F.col("event_id") % 7 == 0).withColumn(
        "event_type", F.lit("corrected")
    )
    b2 = ev.filter((F.col("event_id") % 7 != 0) & (F.col("event_id") % 11 == 0)).withColumn(
        "event_type", F.lit("flagged")
    )
    stage = tempfile.mkdtemp(prefix="walden_simv_stream_")
    b1.coalesce(1).write.mode("overwrite").parquet(f"{stage}/b0")
    b2.coalesce(1).write.mode("overwrite").parquet(f"{stage}/b1")

    def upsert_and_refresh(batch_df: DataFrame, batch_id: int) -> None:
        vt.upsert_keys(batch_df, on=["event_id"])  # O(batch) commit
        mv.refresh()                               # O(changes) view delta

    stream = (
        spark.readStream.schema("event_id long, event_type string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )
    q = stream.writeStream.foreachBatch(upsert_and_refresh).trigger(availableNow=True).start()
    q.awaitTermination()

    return mv.read().select(
        "event_type",
        F.col("key_total").cast("long").alias("key_total"),
        F.col("n_rows").cast("long").alias("n_rows"),
    )


@query(
    "streaming_table_tail",
    oracle="""
SELECT event_id, user_id FROM events WHERE event_id % 4 <> 3
""",
    category="streaming",
)
def streaming_table_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned table AS a stream (Iceberg streaming read / Delta
    table-stream analog): the custom `walden_table_tail` source plans
    one executor task per data file of each append commit — offsets
    are table versions, rows never pass through the driver. The base
    snapshot streams as the first batch, two appends arrive as
    incremental batches, and the memory-sink union equals the oracle's
    static selection."""
    import tempfile

    from walden_spark.sources.tablestream import register_table_tail
    from walden_spark.tables import load_table
    from walden_spark.timetravel import VersionedTable

    register_table_tail(spark)
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="walden_tail_") + "/ev")
    t.write(ev.filter(F.col("event_id") % 4 == 0))
    t.append(ev.filter(F.col("event_id") % 4 == 1))
    t.append(ev.filter(F.col("event_id") % 4 == 2))

    stream = spark.readStream.format("walden_table_tail").option("path", t.path).load()
    name = f"tail_{abs(hash(t.path)) % 10_000_000}"
    q = (
        stream.writeStream.format("memory").queryName(name)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT event_id, user_id FROM {name}")


@query(
    "streaming_change_feed",
    oracle="""
WITH base AS (
  SELECT event_id, user_id FROM events WHERE event_id % 4 = 0
),
appended AS (
  SELECT event_id, user_id FROM events WHERE event_id % 4 = 1
)
SELECT event_id, user_id, 'insert' AS change_type,
       CAST(0 AS BIGINT) AS commit_version FROM base
UNION ALL
SELECT event_id, user_id, 'insert', CAST(1 AS BIGINT) FROM appended
UNION ALL
SELECT event_id, user_id, 'delete', CAST(2 AS BIGINT) FROM base WHERE user_id % 10 = 0
UNION ALL
SELECT event_id, user_id, 'delete', CAST(3 AS BIGINT) FROM appended WHERE user_id % 10 = 1
UNION ALL
SELECT event_id, CAST(-1 AS BIGINT), 'insert', CAST(3 AS BIGINT) FROM appended WHERE user_id % 10 = 1
""",
    category="streaming",
)
def streaming_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed STREAM (Delta CDF-streaming analog): a
    cdf-enabled versioned table materializes every commit's change
    rows under the commit's own manifest claim — appends stream as
    inserts straight from their data files, an equality delete streams
    the deleted rows, an upsert streams retraction + insert — and the
    `walden_table_changes` source tails all of it with one executor
    task per file. The memory-sink union equals the oracle's statically
    stated change log."""
    import tempfile

    from walden_spark.sources.tablestream import register_table_changes
    from walden_spark.tables import load_table
    from walden_spark.timetravel import VersionedTable

    register_table_changes(spark)
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="walden_cdfs_") + "/ev")
    t.enable_cdf()
    t.write(ev.filter(F.col("event_id") % 4 == 0))                       # v0
    t.append(ev.filter(F.col("event_id") % 4 == 1))                      # v1
    t.delete_keys(
        ev.filter((F.col("event_id") % 4 == 0) & (F.col("user_id") % 10 == 0))
        .select("event_id"),
        on=["event_id"],
    )                                                                    # v2
    t.upsert_keys(
        ev.filter((F.col("event_id") % 4 == 1) & (F.col("user_id") % 10 == 1))
        .select("event_id", F.lit(-1).cast("long").alias("user_id")),
        on=["event_id"],
    )                                                                    # v3

    stream = (
        spark.readStream.format("walden_table_changes").option("path", t.path).load()
    )
    name = f"cdfs_{abs(hash(t.path)) % 10_000_000}"
    q = (
        stream.writeStream.format("memory").queryName(name)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.sql(
        f"SELECT event_id, user_id, _change_type AS change_type, "
        f"_commit_version AS commit_version FROM {name}"
    )
