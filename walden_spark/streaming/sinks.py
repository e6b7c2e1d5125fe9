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

    from walden_spark.streaming.stateful import _stage_replay_one_job

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")

    # stage 4 contiguous time ranges so the file source replays them in
    # order (mirrors streaming_stateful_timeout_sessions); one write job
    stage = _stage_replay_one_job(spark, ev, None, "walden_upsert_stream_")

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

    from walden_spark.streaming.stateful import _stage_replay_one_job

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")

    stage = _stage_replay_one_job(spark, ev, None, "walden_mor_stream_")

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


def _streaming_minhash_oracle() -> str:
    from walden_spark.operators.dedup import (
        _HS_SQL,
        _MINHASH_SIG_SQL,
        _SHINGLES_SQL,
        JACCARD_THRESHOLD,
        N_BANDS,
        ROWS_PER_BAND,
    )

    return f"""
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
shng AS (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM docs),
hashed AS (SELECT doc_id, {_HS_SQL} AS hs FROM shng),
sig AS (SELECT doc_id, {_MINHASH_SIG_SQL} AS sig FROM hashed),
bands AS (
  SELECT doc_id, b AS band,
         array_to_string(sig[b * {ROWS_PER_BAND} + 1 : b * {ROWS_PER_BAND} + {ROWS_PER_BAND}], ',') AS bucket
  FROM sig, (SELECT unnest(range(0, {N_BANDS})) AS b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
verified AS (
  SELECT a_id, b_id,
         CAST(len(list_filter(sa.shingles, s -> list_contains(sb.shingles, s))) AS DOUBLE)
           / (len(sa.shingles) + len(sb.shingles)
              - len(list_filter(sa.shingles, s -> list_contains(sb.shingles, s)))) AS jac
  FROM cand JOIN shng sa ON sa.doc_id = a_id JOIN shng sb ON sb.doc_id = b_id
)
SELECT b_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_prior_dups
FROM verified WHERE jac >= {JACCARD_THRESHOLD}
GROUP BY b_id ORDER BY doc_id
"""


def _stage_id_ranges(spark, df: DataFrame, id_col: str, stage: str, which=range(4)) -> None:
    """Stage quartile id-ranges of ``df`` under ``stage/b=<i>`` — the
    replayable micro-batch fixture both streaming state operators
    ingest — in ONE write job (bucket column + ``partitionBy``) instead
    of one filtered scan-and-write per range; ``os.utime`` then pins
    strictly increasing mtimes so the file source replays b=0..b=3 in
    the same order the sequential writes produced implicitly. Bounds
    always come from the FULL frame so a later call staging only b3
    (the restart test) cuts identical ranges — and lands with a later
    mtime, preserving resume order."""
    import os
    import time as _time

    qs = df.approxQuantile(id_col, [0.25, 0.5, 0.75], 0.0)
    which = list(which)
    bucket = (
        F.when(F.col(id_col) <= F.lit(int(qs[0])), 0)
        .when(F.col(id_col) <= F.lit(int(qs[1])), 1)
        .when(F.col(id_col) <= F.lit(int(qs[2])), 2)
        .otherwise(3)
    )
    staged = df.withColumn("b", bucket).filter(F.col("b").isin(which))
    staged.coalesce(1).write.mode("append").partitionBy("b").parquet(stage)
    base = _time.time() - 600
    for i in which:
        d = os.path.join(stage, f"b={i}")
        if not os.path.isdir(d):
            spark.createDataFrame([], df.schema).repartition(1).write.parquet(d)
        for name in os.listdir(d):
            os.utime(os.path.join(d, name), (base + 60 * i,) * 2)


def _minhash_ingest_run(
    spark: SparkSession,
    stage: str,
    band_state,
    shingle_state,
    flagged,
    checkpoint: str | None = None,
    maintain_at: int = 2,
) -> None:
    """One availableNow pass of the MinHash-dedup ingest over whatever
    files sit (unseen) in ``stage``. With ``checkpoint`` set, a second
    call after more files land RESUMES: the file source skips
    checkpoint-seen files and batch ids continue — the restart path a
    24/7 ingest exercises (state lives in the versioned tables, not
    executor memory)."""
    from walden_spark.operators.dedup import (
        _md5int,
        _minhash_sig,
        _with_shingles,
        JACCARD_THRESHOLD,
        N_BANDS,
        ROWS_PER_BAND,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sh = _with_shingles(batch_df, "text", "shingles", "doc_id").persist()
        # Materialize the hashed-shingle array before the signature
        # (optimization r14, same contract as _minhash_sig's docstring):
        # inlining the md5 transform into _minhash_sig clones it into
        # all N_HASHES affine branches — every shingle re-md5'd 32x per
        # batch. As its own projection it hashes once.
        hashed = sh.select("doc_id", F.transform("shingles", _md5int).alias("hs"))
        sig = hashed.select("doc_id", _minhash_sig(F.col("hs")).alias("sig"))
        bands = sig.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(N_BANDS - 1))).alias("band"),
            "sig",
        ).select(
            "doc_id",
            "band",
            F.concat_ws(
                ",", F.slice("sig", F.col("band") * ROWS_PER_BAND + 1, ROWS_PER_BAND)
            ).alias("bucket"),
        )
        # the batch's band rows feed the candidate join twice (new side
        # + union into all_bands) AND the band-state append; persisting
        # them stops the md5/minhash signature expressions re-running
        # per consumer (same contract as the sh persist above)
        bands = bands.persist()
        try:
            prior_bands: DataFrame | None = band_state.read()
            prior_sh: DataFrame | None = shingle_state.read()
        except FileNotFoundError:
            prior_bands = prior_sh = None
        all_bands = (
            bands if prior_bands is None else bands.unionByName(prior_bands)
        )
        cand = (
            bands.alias("n")
            .join(all_bands.alias("p"), ["band", "bucket"])
            .filter(F.col("p.doc_id") < F.col("n.doc_id"))
            .select(
                F.col("p.doc_id").alias("a_id"), F.col("n.doc_id").alias("b_id")
            )
            .dropDuplicates(["a_id", "b_id"])
        )
        all_sh = sh if prior_sh is None else sh.unionByName(prior_sh)
        pairs = cand.join(
            all_sh.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("sa")),
            "a_id",
        ).join(
            sh.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("sb")),
            "b_id",
        )
        inter = F.size(F.array_intersect("sa", "sb")).cast("double")
        jac = inter / (F.size("sa") + F.size("sb") - inter)
        hits = (
            pairs.withColumn("jac", jac)
            .filter(F.col("jac") >= JACCARD_THRESHOLD)
            .groupBy("b_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_prior_dups"))
            .select(F.col("b_id").alias("doc_id"), "n_prior_dups")
        )
        # hits is both emptiness-tested AND appended: persist so the
        # candidate-join pipeline runs once per batch, not twice
        # (measured ~1.2 s/batch of pure recompute at sf0.1, guide §1.2)
        hits = hits.persist()
        for vt, frame in ((band_state, bands), (shingle_state, sh)):
            try:
                vt.append(frame)
            except FileNotFoundError:
                vt.write(frame, operation=f"batch_{batch_id}")
        if hits.limit(1).count():
            try:
                flagged.append(hits)
            except FileNotFoundError:
                flagged.write(hits, operation=f"batch_{batch_id}")
        hits.unpersist()
        bands.unpersist()
        sh.unpersist()
        if batch_id == maintain_at:
            # state maintenance DURING ingest (same cadence as the IVF
            # stream): collapse the append chains and expire old
            # versions while the stream keeps committing — content-
            # invariant, so detection (and the oracle) are unaffected.
            # LAST in the batch: `hits` above lazily reads the PRIOR
            # state snapshot, so expiring before materializing it
            # would delete dirs its plan still references.
            for vt in (band_state, shingle_state):
                vt.compact()
                vt.expire_versions(keep_last=1)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )
    writer = stream.writeStream.foreachBatch(process)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()


@query(
    "streaming_minhash_dedup",
    oracle=_streaming_minhash_oracle(),
    category="streaming",
)
def streaming_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup dedup over a DOCUMENT STREAM — the corpus-
    ingest shape: each arriving micro-batch is checked against every
    previously ingested document via a persisted MinHash band index,
    and newly detected near-dups are flagged with how many prior docs
    they duplicate. Semantically: doc d is flagged iff some doc p with
    p.doc_id < d.doc_id shares an LSH band AND exact Jaccard ≥ 0.8 —
    batch boundaries don't change the answer (intra-batch pairs use
    the same earlier-id rule), which is what makes the closed-input
    run oracle-exact while the mechanism is genuinely incremental.

    Scale shape per micro-batch (the 100 TB-ingest argument): the
    batch's signatures are per-row array math; the candidate join is
    (batch bands) ⋈ (band index) on (band, bucket) — key-partitioned,
    touching only colliding ids, never all prior docs; the verify
    joins fetch only candidate shingle sets by id from the persisted
    shingle store. State grows APPEND-ONLY as two snapshot commits per
    batch (band index rows: ids + 4-number buckets; shingle store:
    the arrays the verify stage needs), so per-batch cost is
    O(batch + collisions), never O(corpus). The same versioned-table
    state survives restarts — a resumed stream continues the index
    (pinned, including restart AFTER mid-stream compact+expire, by
    test_streaming_minhash_dedup_restart_after_maintenance)."""
    import tempfile

    from walden_spark.tables import load_table
    from walden_spark.timetravel import VersionedTable

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # stage 4 contiguous doc_id ranges: the file source replays them in
    # order, so "previously ingested" = lower doc_id (arrival order)
    stage = tempfile.mkdtemp(prefix="walden_mh_stream_")
    _stage_id_ranges(spark, docs, "doc_id", stage)

    root = tempfile.mkdtemp(prefix="walden_mh_state_")
    band_state = VersionedTable(spark, f"{root}/bands")
    shingle_state = VersionedTable(spark, f"{root}/shingles")
    flagged = VersionedTable(spark, f"{root}/flagged")
    _minhash_ingest_run(spark, stage, band_state, shingle_state, flagged)

    try:
        out = flagged.read()
    except FileNotFoundError:
        return spark.createDataFrame([], "doc_id long, n_prior_dups bigint")
    streaming_minhash_dedup.last_tables = (band_state, shingle_state, flagged)  # type: ignore[attr-defined]
    return out.orderBy("doc_id")


def _streaming_ivf_oracle() -> str:
    from walden_spark.operators.similarity import _COS_SQL, TOP_K

    return f"""
WITH cent AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id % 100 = 7),
assigned AS (
  SELECT vec_id, cid, embedding FROM (
    SELECT e.vec_id, cent.cid, e.embedding,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_COS_SQL.format(a='e.embedding', b='cent.ce')} DESC, cent.cid) AS rn
    FROM embeddings e CROSS JOIN cent
  ) WHERE rn = 1
),
qcells AS (
  SELECT query_id, cid, qe FROM (
    SELECT e.vec_id AS query_id, cent.cid, e.embedding AS qe,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_COS_SQL.format(a='e.embedding', b='cent.ce')} DESC, cent.cid) AS rn
    FROM embeddings e CROSS JOIN cent
    WHERE e.vec_id < 4
  ) WHERE rn <= 2
)
SELECT query_id, neighbor_id, floor(cos_sim * 1000000.0) / 1000000.0 AS cos_sim
FROM (
  SELECT q.query_id, a.vec_id AS neighbor_id,
         {_COS_SQL.format(a='q.qe', b='a.embedding')} AS cos_sim,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY {_COS_SQL.format(a='q.qe', b='a.embedding')} DESC, a.vec_id) AS rn2
  FROM qcells q JOIN assigned a ON a.cid = q.cid
  WHERE a.vec_id <> q.query_id
) WHERE rn2 <= {TOP_K}
ORDER BY query_id, cos_sim DESC, neighbor_id
"""


def _ivf_ingest_run(
    spark: SparkSession,
    stage: str,
    cent: DataFrame,
    index,
    checkpoint: str | None = None,
    maintain_at: int = 2,
) -> None:
    """One availableNow pass of the IVF ingest over unseen files in
    ``stage`` (see _minhash_ingest_run for the checkpoint/resume
    contract)."""
    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        # Norms hoisted out of the vector×centroid fan-out (optimization
        # r14, same rewrite as ann_ivf_probe): one self-dot fold per row
        # per side instead of per pair; identical ops in identical IEEE
        # order, so assignments are bit-identical.
        from walden_spark.operators.similarity import _dot

        b = batch_df.withColumn(
            "nrm", F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
        )
        c = cent.withColumn("cnrm", F.sqrt(_dot(F.col("ce"), F.col("ce"))))
        pairs = b.crossJoin(F.broadcast(c)).withColumn(
            "cos_sim", _dot(F.col("embedding"), F.col("ce")) / F.col("nrm") / F.col("cnrm")
        )
        # Argmax as max_by instead of a row_number window (r14, guide
        # §2.3, same rewrite as ann_ivf_probe): the batch×centroid fan-
        # out collapses map-side to one row per vector before the
        # exchange instead of shuffling and sorting every pair. max of
        # struct(cos_sim, -cid) == ORDER BY cos_sim DESC, cid ASC.
        assigned = (
            pairs.groupBy("vec_id")
            .agg(
                F.expr(
                    "max_by(struct(cid, embedding), struct(cos_sim, -cid))"
                ).alias("bst")
            )
            .select("vec_id", F.col("bst.cid").alias("cid"), F.col("bst.embedding").alias("embedding"))
        )
        try:
            index.append(assigned, partition_bucket=("cid", 8))
        except FileNotFoundError:
            index.write(
                assigned, operation=f"batch_{batch_id}", partition_bucket=("cid", 8)
            )
        if batch_id == maintain_at:
            # maintenance DURING ingest — the production cadence: the
            # MoR layer stack compacts into one bucketed snapshot and
            # old versions expire, all while the stream keeps
            # committing. Content-invariant, so the oracle is
            # unaffected; the behavioral test pins the layer collapse.
            index.compact(partition_bucket=("cid", 8))
            index.expire_versions(keep_last=1)

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )
    writer = stream.writeStream.foreachBatch(ingest)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()


def _ivf_probe(spark: SparkSession, e: DataFrame, cent: DataFrame, index) -> DataFrame:
    """Probe each query's 2 nearest cells against the persisted index;
    the scan prunes to those cells' buckets."""
    from pyspark.sql import Window

    from walden_spark.operators.similarity import TOP_K, _cos

    queries = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    qc_pairs = queries.crossJoin(F.broadcast(cent)).withColumn(
        "csim", _cos(F.col("qe"), F.col("ce"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("csim"), "cid")
    qcells = (
        qc_pairs.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 2)
        .select("query_id", "cid", "qe")
    )
    probed = [r.cid for r in qcells.select("cid").distinct().collect()]  # ≤ 8 ids
    cand = index.scan(filters=[("cid", "in", probed)]).join(
        F.broadcast(qcells), "cid"
    )
    scored = cand.filter(F.col("vec_id") != F.col("query_id")).withColumn(
        "cos_sim", _cos(F.col("qe"), F.col("embedding"))
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        scored.withColumn("rn2", F.row_number().over(wr))
        .filter(F.col("rn2") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (F.floor(F.col("cos_sim") * 1000000.0) / 1000000.0).alias("cos_sim"),
        )
        .orderBy("query_id", F.desc("cos_sim"), "neighbor_id")
    )


@query(
    "streaming_ivf_ingest",
    oracle=_streaming_ivf_oracle(),
    category="streaming",
)
def streaming_ivf_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN index build — the vector-ingest shape: arriving
    embedding micro-batches are assigned to their nearest (pre-trained,
    broadcast) IVF centroid MAP-SIDE and appended to a versioned index
    table BUCKET-PARTITIONED on the cell id, one snapshot commit per
    batch. Queries then probe their 2 nearest cells and rank only the
    vectors stored in those cells — scan() prunes the index read to
    the probed cells' buckets, so probe cost is O(probed cells), never
    O(index), and ingest cost is O(batch): nothing is ever rebuilt.
    Deterministic seed centroids (every 100th vector, no Lloyd
    iterations) keep the closed-input run oracle-exact; dot products
    left-fold so both engines emit bit-identical scores. Restart after
    mid-stream maintenance is pinned by
    test_streaming_ivf_ingest_restart_after_maintenance."""
    import tempfile

    from walden_spark.tables import load_table
    from walden_spark.timetravel import VersionedTable

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent = e.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )

    stage = tempfile.mkdtemp(prefix="walden_ivf_stream_")
    _stage_id_ranges(spark, e, "vec_id", stage)
    index = VersionedTable(
        spark, tempfile.mkdtemp(prefix="walden_ivf_state_") + "/index"
    )
    _ivf_ingest_run(spark, stage, cent, index)
    streaming_ivf_ingest.last_table = index  # type: ignore[attr-defined]
    # probe: each query ranks only the vectors in its 2 nearest cells;
    # the index scan prunes to those cells' buckets
    return _ivf_probe(spark, e, cent, index)
