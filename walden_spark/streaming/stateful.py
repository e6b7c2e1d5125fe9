"""Custom stateful streaming operator (SURVEY §2.10/§7.1 M5 — beyond
the batch-only reference): per-key running aggregates with
``applyInPandasWithState``.

This is the template for operators Spark's built-ins can't express —
arbitrary per-key state machines (e.g. session carts, fraud counters,
CDC reducers). State is partitioned by key across executors and
Arrow-batched into pandas, so the Python boundary is vectorized per
group-batch, not per row; watermark + GroupStateTimeout bound state
size in production.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from walden_spark.registry import query
from walden_spark.streaming.windows import _read_events_stream, _run_to_memory

_STATE_SCHEMA = "n BIGINT, total DOUBLE, last_ts TIMESTAMP"
_OUTPUT_SCHEMA = "user_id BIGINT, n BIGINT, total DOUBLE"


def _track_user(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Accumulate (count, decimal-cent total) per user across batches and
    emit the running totals each time the key appears."""
    n, cents, last = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        # sum integer cents to stay order-independent (floats drift)
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        mx = pdf["ts"].max()
        last = mx if last is None or mx > last else last
    state.update((n, float(cents), last))
    yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total": [cents / 100.0]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """events stream → per-user running (count, total value)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _track_user,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_SESS_STATE = "start_ts TIMESTAMP, last_ts TIMESTAMP, n BIGINT"
_SESS_OUT = "user_id BIGINT, session_start STRING, n_events BIGINT"
_GAP = pd.Timedelta(minutes=30)


def _sessionize_user(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Timeout-driven session state machine: maintain the open session
    per user; a >30min in-batch gap closes it immediately, and an
    event-time TIMEOUT closes it when the watermark passes last_ts+gap
    with no new data — the path plain window aggs can't express
    (emit-on-close with arbitrary per-key logic)."""
    rows: list[tuple] = []

    def close(start, n):
        rows.append((key[0], start.strftime("%Y-%m-%d %H:%M:%S"), n))

    if state.hasTimedOut:
        start, last, n = state.get
        close(start, n)
        state.remove()
    else:
        start, last, n = state.get if state.exists else (None, None, 0)
        batch = pd.concat(list(pdfs)).sort_values("ts")
        # sentinel rows (event_id < 0) flush the open session but must
        # never open one of their own — they are stream-close markers,
        # not data
        saw_sentinel = bool((batch["event_id"] < 0).any())
        for ts in batch.loc[batch["event_id"] >= 0, "ts"]:
            if last is not None and ts - last > _GAP:
                close(start, n)
                start, n = ts, 0
            if start is None:
                start = ts
            last, n = ts, n + 1
        if saw_sentinel:
            if n > 0:
                close(start, n)
            if state.exists:
                state.remove()
        else:
            state.update((start, last, n))
            # close via timeout once the watermark passes the gap
            # horizon; clamp above the current watermark (API requires
            # it strictly ahead when there is late data)
            wm = pd.Timestamp(state.getCurrentWatermarkMs(), unit="ms")
            state.setTimeoutTimestamp(
                max(last + _GAP, wm + pd.Timedelta(minutes=1)).to_pydatetime()
            )
    yield pd.DataFrame(rows, columns=["user_id", "session_start", "n_events"])


@query(
    "streaming_stateful_timeout_sessions",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
  FROM events
), sessions AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM ordered
)
SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, sid
""",
    category="streaming",
)
def streaming_stateful_timeout_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful sessionization with EventTimeTimeout
    (applyInPandasWithState): the input replays as FIVE time-ordered
    micro-batches (maxFilesPerTrigger=1), so sessions close through
    BOTH paths — in-batch gap detection and watermark-driven timeouts
    between batches. A far-future sentinel event per user flushes every
    still-open session before the stream ends; sentinel-opened sessions
    are never emitted, so the result equals batch sessionization of the
    real events (the oracle's lag/cumsum formulation)."""
    import tempfile

    from walden_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")

    # stage the stream: 4 contiguous time ranges + a sentinel file,
    # written in order so the file source replays them as 5 batches
    stage = tempfile.mkdtemp(prefix="walden_sess_stream_")
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
    sentinel = ev.groupBy("user_id").agg(F.max("ts").alias("mx")).select(
        F.lit(-1).cast("long").alias("event_id"),
        "user_id",
        (F.unix_micros(F.col("mx")) + F.lit(3 * 3600 * 1000 * 1000))
        .cast("long")
        .alias("us"),
    ).select("event_id", "user_id", F.timestamp_micros("us").alias("ts"))
    sentinel.coalesce(1).write.mode("overwrite").parquet(f"{stage}/b4")

    stream = (
        spark.readStream.schema("event_id long, user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )
    sessions = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_user,
            outputStructType=_SESS_OUT,
            stateStructType=_SESS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    out = _run_to_memory(sessions, "update")
    return out.select("user_id", "session_start", "n_events")


@query(
    "streaming_stateful_totals",
    oracle="""
SELECT user_id, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM events GROUP BY user_id
""",
    category="streaming",
)
def streaming_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState per-user totals. The closed fixture input
    arrives as one micro-batch, so each key emits exactly once with its
    complete totals — equal to the batch aggregation the oracle runs.
    (Cent-integer accumulation makes the double total exact.)"""
    ev = _read_events_stream(spark, sf_dir)
    out = _run_to_memory(running_user_totals(ev), "update")
    return out.select("user_id", "n", "total")
