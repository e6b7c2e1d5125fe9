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
from walden_spark.streaming.windows import (
    _read_events_stream,
    _run_to_memory,
    scaled_state_partitions,
)

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


def _one_batch(pdfs: Iterable[pd.DataFrame]) -> pd.DataFrame:
    """Concatenate a group's Arrow chunks. The overwhelmingly common
    case is one chunk (rows-per-key-per-batch ≪ Arrow batch size) and
    ``pd.concat`` would copy the frame for nothing; this runs once per
    key per micro-batch, ~1,500 times a batch (r15, guide §4.1)."""
    chunks = list(pdfs)
    return chunks[0] if len(chunks) == 1 else pd.concat(chunks)


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
    (emit-on-close with arbitrary per-key logic).

    Vectorized (r15, guide §4.2): the function runs ~1,500 times per
    micro-batch (once per key), so per-row Python work multiplies.
    Session boundaries come from ONE numpy diff over the sorted
    event-time array (a break is any gap > 30 min, with the open
    session's last_ts as the virtual predecessor of the first row) and
    the emitted start strings from one vectorized strftime — the
    measured Python-side cost of the old per-row loop was ~4-5 s of the
    ~14 s replay (noop-function A/B, OPTIMIZATION_r15.md)."""
    import numpy as np

    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [start.strftime("%Y-%m-%d %H:%M:%S")],
                "n_events": [n],
            }
        )
        return

    start, last, n = state.get if state.exists else (None, None, 0)
    batch = _one_batch(pdfs)
    eid = batch["event_id"].to_numpy()
    # sentinel rows (event_id < 0) flush the open session but must
    # never open one of their own — they are stream-close markers,
    # not data
    saw_sentinel = bool((eid < 0).any())
    ts = batch["ts"].to_numpy()[eid >= 0]
    ts.sort(kind="stable")

    closed_starts: list = []  # np.datetime64 of each closed session start
    closed_ns: list[int] = []
    if ts.size:
        gap = np.timedelta64(30 * 60 * 1_000_000_000, "ns")
        ts = ts.astype("datetime64[ns]")
        brk = np.empty(ts.size, dtype=bool)
        if last is not None:
            brk[0] = (ts[0] - np.datetime64(last)) > gap
        else:
            brk[0] = False
        np.greater(ts[1:] - ts[:-1], gap, out=brk[1:])
        idx = np.flatnonzero(brk)  # indices that START a new session
        first_start = np.datetime64(start) if start is not None else ts[0]
        if idx.size:
            # sessions closed inside this batch, chronological order:
            # the open session (start carried in, count n + rows before
            # the first break), then each full run between breaks
            closed_starts = [first_start] + [ts[i] for i in idx[:-1]]
            closed_ns = [n + int(idx[0])] + np.diff(idx).tolist()
            start = pd.Timestamp(ts[idx[-1]])
            n = int(ts.size - idx[-1])
        else:
            start = pd.Timestamp(first_start)
            n = n + int(ts.size)
        last = pd.Timestamp(ts[-1])

    if saw_sentinel:
        if n > 0:
            closed_starts.append(np.datetime64(start))
            closed_ns.append(n)
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
    if closed_starts:  # skip the empty-emit Arrow round-trip (r14, §4.1)
        yield pd.DataFrame(
            {
                "user_id": key[0],
                "session_start": pd.Series(
                    np.asarray(closed_starts, dtype="datetime64[ns]")
                ).dt.strftime("%Y-%m-%d %H:%M:%S"),
                "n_events": np.asarray(closed_ns, dtype="int64"),
            }
        )


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
    from walden_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")

    # stage the stream: 4 contiguous time ranges + a sentinel file,
    # replayed in mtime order by the file source as 5 batches
    stage = _stage_replay_one_job(spark, ev, "user_id", "walden_sess_stream_")

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
    out = _run_to_memory(
        sessions, "update", scaled_state_partitions(spark, stage)
    )
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
    out = _run_to_memory(
        running_user_totals(ev),
        "update",
        scaled_state_partitions(spark, f"{sf_dir}/events.parquet"),
    )
    return out.select("user_id", "n", "total")


# ---- streaming row-pattern detection (r10) ----

_PAT_STATE = (
    "last_day BIGINT, last_n BIGINT, open_day BIGINT, open_n BIGINT, "
    "phase INT, anchor_day BIGINT, anchor_n BIGINT, "
    "bottom_day BIGINT, bottom_n BIGINT, up_day BIGINT, up_n BIGINT"
)
_PAT_OUT = (
    "user_id BIGINT, anchor_day BIGINT, anchor_n BIGINT, "
    "bottom_day BIGINT, bottom_n BIGINT, end_day BIGINT, end_n BIGINT, "
    "depth BIGINT, rebound BIGINT"
)
_PHASE_NONE, _PHASE_DOWN, _PHASE_UP, _PHASE_FLAT = 0, 1, 2, 3
_DAY0 = pd.Timestamp("2024-01-01")


def _stage_replay_one_job(
    spark: SparkSession,
    ev: DataFrame,
    key_col: str | None,
    prefix: str,
    sentinel_extras: dict[str, Any] | None = None,
) -> str:
    """Stage ``ev`` as the four time-quartile files plus the per-key
    far-future sentinel file in ONE Spark write job.

    The previous per-file staging ran six jobs (approxQuantile + four
    filtered single-file writes + the sentinel write), re-scanning the
    input each time — the dominant cost of every streaming replay query
    once state partitioning was right-sized (guide §1.2: remove passes
    before tuning inside them). Here the SAME quartile bounds become a
    bucket column, the sentinel frame is unioned in as bucket 4, and a
    single ``partitionBy("b")`` write emits all five files at once.
    File CONTENTS are byte-identical per bucket (same bounds, same
    ``>lo``/``<=hi`` semantics), so every micro-batch sees exactly the
    rows it saw before; ``os.utime`` then pins strictly increasing
    mtimes b=0 < ... < b=4, deterministically reproducing the replay
    order the sequential writes produced implicitly (the file source
    orders pending files by modification time).
    """
    import tempfile
    import time as _time

    stage = tempfile.mkdtemp(prefix=prefix)
    ev_us = ev.withColumn("us", F.unix_micros("ts"))
    qs = ev_us.approxQuantile("us", [0.25, 0.5, 0.75], 0.0)
    bucket = (
        F.when(F.col("us") <= F.lit(int(qs[0])), 0)
        .when(F.col("us") <= F.lit(int(qs[1])), 1)
        .when(F.col("us") <= F.lit(int(qs[2])), 2)
        .otherwise(3)
    )
    staged = ev_us.select(*ev.columns, bucket.alias("b"))
    n_files = 4
    if key_col is not None:  # key_col=None: plain 4-batch replay, no sentinel
        n_files = 5
        extras = dict(sentinel_extras or {})
        sent_select = []
        for c in ev.columns:
            if c == "event_id":
                sent_select.append(F.lit(-1).cast("long").alias("event_id"))
            elif c == key_col:
                sent_select.append(F.col(key_col))
            elif c == "ts":
                sent_select.append(
                    F.timestamp_micros(
                        (
                            F.unix_micros(F.col("mx")) + F.lit(3 * 3600 * 1000 * 1000)
                        ).cast("long")
                    ).alias("ts")
                )
            else:
                sent_select.append(extras[c].alias(c))
        sentinel = ev.groupBy(key_col).agg(F.max("ts").alias("mx")).select(*sent_select)
        staged = staged.unionByName(sentinel.withColumn("b", F.lit(4)))
    staged.coalesce(1).write.mode("overwrite").partitionBy("b").parquet(stage)
    base = _time.time() - 600
    import os as _os

    for i in range(n_files):
        d = _os.path.join(stage, f"b={i}")
        if not _os.path.isdir(d):
            # degenerate quartiles can leave a bucket empty; keep the
            # empty micro-batch the per-file staging used to produce
            spark.createDataFrame([], ev.schema).repartition(1).write.parquet(d)
        for name in _os.listdir(d):
            _os.utime(_os.path.join(d, name), (base + 60 * i,) * 2)
    return stage


def _staged_event_replay(
    spark: SparkSession, sf_dir: str, max_user: int, prefix: str
) -> str:
    """Shared replay harness of the streaming pattern matchers: stage
    the (filtered) event table as four time-ordered quartile files
    plus a per-user far-future sentinel file (b=4) that closes the
    final day and flushes open runs. With ``maxFilesPerTrigger=1`` the
    files replay as five micro-batches, so day boundaries and pattern
    runs genuinely SPAN batches. Returns the staging directory."""
    from walden_spark.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < max_user)
        .select("event_id", "user_id", "ts")
    )
    return _stage_replay_one_job(spark, ev, "user_id", prefix)


def _pattern_user(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Incremental V-shape matcher (PATTERN (STRT DOWN+ UP+), AFTER
    MATCH SKIP TO LAST UP) with CONSTANT per-key state — the streaming
    dual of operators/pattern.py. State tracks only the last closed
    day, the day currently filling, and the open descent/ascent run; a
    match emits the moment its ascent run is maximal (next transition
    is down or flat, or the stream flushes). A day closes when a later
    day arrives for the key; the far-future sentinel closes the final
    day and flushes any open ascent."""
    vals = state.get if state.exists else (None,) * 4 + (_PHASE_NONE,) + (None,) * 6
    (last_day, last_n, open_day, open_n, phase,
     anchor_day, anchor_n, bottom_day, bottom_n, up_day, up_n) = vals
    rows: list[tuple] = []

    def emit():
        rows.append(
            (key[0], anchor_day, anchor_n, bottom_day, bottom_n,
             up_day, up_n, anchor_n - bottom_n, up_n - bottom_n)
        )

    def close_day(d, n):
        nonlocal last_day, last_n, phase
        nonlocal anchor_day, anchor_n, bottom_day, bottom_n, up_day, up_n
        if last_day is not None:
            if n < last_n:  # DOWN transition
                if phase == _PHASE_UP:
                    emit()  # ascent just proved maximal
                    # SKIP TO LAST UP: the match's last row anchors the
                    # next descent
                    anchor_day, anchor_n = last_day, last_n
                    bottom_day, bottom_n = d, n
                    phase = _PHASE_DOWN
                elif phase == _PHASE_DOWN:
                    bottom_day, bottom_n = d, n  # extend descent
                else:
                    anchor_day, anchor_n = last_day, last_n
                    bottom_day, bottom_n = d, n
                    phase = _PHASE_DOWN
            elif n > last_n:  # UP transition
                if phase == _PHASE_DOWN:
                    phase = _PHASE_UP
                    up_day, up_n = d, n
                elif phase == _PHASE_UP:
                    up_day, up_n = d, n  # extend ascent
                # ascent without a preceding adjacent descent: no-op
            else:  # FLAT breaks any run (strict </> DEFINEs)
                if phase == _PHASE_UP:
                    emit()
                phase = _PHASE_NONE
        last_day, last_n = d, n

    batch = _one_batch(pdfs).sort_values(["ts", "event_id"])
    saw_sentinel = bool((batch["event_id"] < 0).any())
    real = batch[batch["event_id"] >= 0]
    if len(real):
        days = (real["ts"].dt.normalize() - _DAY0).dt.days
        for d in days:
            d = int(d)
            if open_day is None:
                open_day, open_n = d, 1
            elif d == open_day:
                open_n += 1
            else:
                close_day(open_day, open_n)
                open_day, open_n = d, 1
    if saw_sentinel:
        if open_day is not None:
            close_day(open_day, open_n)
        if phase == _PHASE_UP:
            emit()
        if state.exists:
            state.remove()
    else:
        state.update(
            (last_day, last_n, open_day, open_n, phase,
             anchor_day, anchor_n, bottom_day, bottom_n, up_day, up_n)
        )
    if rows:  # skip the empty-emit Arrow round-trip (r14, guide §4.1)
        yield pd.DataFrame(
            rows,
            columns=[
                "user_id", "anchor_day", "anchor_n", "bottom_day", "bottom_n",
                "end_day", "end_n", "depth", "rebound",
            ],
        )


@query(
    "streaming_pattern_vshape",
    oracle="""
WITH daily AS (
  SELECT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE user_id < 30 GROUP BY 1, 2
), seq AS (
  SELECT user_id, day, n,
         LAG(day) OVER w AS prev_day, LAG(n) OVER w AS prev_n,
         ROW_NUMBER() OVER w AS pos
  FROM daily
  WINDOW w AS (PARTITION BY user_id ORDER BY day)
), dirs AS (
  SELECT *, CASE WHEN prev_n IS NULL THEN 0
                 WHEN n < prev_n THEN -1 WHEN n > prev_n THEN 1
                 ELSE 0 END AS dir
  FROM seq
), runs AS (
  SELECT *, pos - ROW_NUMBER() OVER (PARTITION BY user_id, dir ORDER BY pos) AS grp
  FROM dirs WHERE dir <> 0
), isl AS (
  SELECT user_id, dir,
         MIN(prev_day) AS first_prev_day,
         CAST(arg_min(prev_n, pos) AS BIGINT) AS anchor_n,
         MAX(day) AS last_day,
         CAST(arg_max(n, pos) AS BIGINT) AS last_n
  FROM runs GROUP BY user_id, dir, grp
)
SELECT d.user_id,
       CAST(d.first_prev_day AS BIGINT) AS anchor_day, d.anchor_n,
       CAST(d.last_day AS BIGINT) AS bottom_day, d.last_n AS bottom_n,
       CAST(u.last_day AS BIGINT) AS end_day, u.last_n AS end_n,
       d.anchor_n - d.last_n AS depth, u.last_n - d.last_n AS rebound
FROM isl d JOIN isl u
  ON d.user_id = u.user_id AND d.dir = -1 AND u.dir = 1
 AND u.first_prev_day = d.last_day
ORDER BY d.user_id, anchor_day
""",
    category="streaming",
)
def streaming_pattern_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING MATCH_RECOGNIZE (r10): the V-shape pattern detected
    incrementally over the event stream with applyInPandasWithState —
    Trino's MATCH_RECOGNIZE is batch-only; Flink's CEP is the
    streaming analog, and this is its Spark-idiomatic build. The input
    replays as five time-ordered micro-batches (quartile-staged files
    + a sentinel flush, same harness as the timeout sessions), so day
    boundaries and pattern runs genuinely SPAN batches; per-key state
    is CONSTANT-size (last closed day + the open runs — not the
    series), which is what makes the operator viable on an unbounded
    stream. Emission is latency-optimal for the semantics: each match
    fires the moment its ascent is provably maximal. The oracle is the
    BATCH vshape SQL — on a closed input the incremental matcher must
    reproduce the batch compiler's output exactly."""
    stage = _staged_event_replay(spark, sf_dir, 30, "walden_pat_stream_")
    stream = (
        spark.readStream.schema("event_id long, user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )
    matches = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _pattern_user,
            outputStructType=_PAT_OUT,
            stateStructType=_PAT_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    out = _run_to_memory(
        matches, "update", scaled_state_partitions(spark, stage)
    )
    return out.orderBy("user_id", "anchor_day")


_ANOM_STATE = (
    "days ARRAY<BIGINT>, counts ARRAY<BIGINT>, open_day BIGINT, open_count BIGINT"
)
_ANOM_OUT = (
    "event_type STRING, dow BIGINT, day BIGINT, n BIGINT, med BIGINT, mad BIGINT"
)


def _anomaly_type(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Streaming MAD anomaly scorer (r11, VERDICT r10 #7): per
    event_type, state incrementally ACCUMULATES the scoring-grain
    pre-agg — per-day counts, never raw events — across micro-batches
    (the open day spans batch boundaries; a later day closes it). The
    far-future sentinel closes the final day and finalizes: per
    weekday cohort (day % 7), the rank-based lower median with (n,
    day) tie-break, deviations, MAD with (dv, day) tie-break, and the
    |n − med| > 3·MAD outliers — the EXACT arithmetic of
    operators/anomaly.robust_anomalies, so on a closed input the
    stream reproduces the batch operator bit-for-bit (the oracle).

    MAD statistics are order statistics over the whole window — they
    cannot be emitted incrementally without being provisional — so
    emission happens at window close; what streams is the heavy part
    (the raw-event collapse into per-day counts, constant work per
    event, state bounded by |days seen| per type)."""
    days, counts, open_day, open_count = (
        state.get if state.exists else ([], [], None, None)
    )
    days, counts = list(days), list(counts)
    rows: list[tuple] = []
    batch = _one_batch(pdfs).sort_values(["ts", "event_id"])
    saw_sentinel = bool((batch["event_id"] < 0).any())
    real = batch[batch["event_id"] >= 0]
    if len(real):
        day_series = (real["ts"].dt.normalize() - _DAY0).dt.days
        for d, cnt in day_series.value_counts().sort_index().items():
            d, cnt = int(d), int(cnt)
            if open_day is None:
                open_day, open_count = d, cnt
            elif d == open_day:
                open_count += cnt
            else:
                days.append(open_day)
                counts.append(open_count)
                open_day, open_count = d, cnt
    if saw_sentinel:
        if open_day is not None:
            days.append(open_day)
            counts.append(open_count)

        def lower_median(pairs):  # pairs pre-sorted by (value, tiebreak)
            return pairs[(len(pairs) + 1) // 2 - 1][0]

        for dow in range(7):
            cohort = [(n, d) for d, n in zip(days, counts) if d % 7 == dow]
            if not cohort:
                continue
            med = lower_median(sorted(cohort))
            devs = [(abs(n - med), d, n) for n, d in cohort]
            mad = lower_median(sorted((dv, d) for dv, d, _ in devs))
            for dv, d, n in devs:
                if dv > 3 * mad:
                    rows.append((key[0], dow, d, n, med, mad))
        if state.exists:
            state.remove()
    else:
        state.update((days, counts, open_day, open_count))
    if rows:  # skip the empty-emit Arrow round-trip (r14, guide §4.1)
        yield pd.DataFrame(
            rows, columns=["event_type", "dow", "day", "n", "med", "mad"]
        )


@query(
    "streaming_anomaly_weekly",
    oracle="""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7 AS dow,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
), med AS (
  SELECT event_type, dow, n AS med FROM (
    SELECT event_type, dow, n,
           ROW_NUMBER() OVER (PARTITION BY event_type, dow ORDER BY n, day) AS rn,
           COUNT(*) OVER (PARTITION BY event_type, dow) AS c
    FROM daily
  ) WHERE rn = (c + 1) // 2
), dev AS (
  SELECT d.event_type, d.dow, d.day, d.n, m.med, abs(d.n - m.med) AS dv
  FROM daily d JOIN med m ON d.event_type = m.event_type AND d.dow = m.dow
), mad AS (
  SELECT event_type, dow, dv AS mad FROM (
    SELECT event_type, dow, dv, day,
           ROW_NUMBER() OVER (PARTITION BY event_type, dow ORDER BY dv, day) AS rn,
           COUNT(*) OVER (PARTITION BY event_type, dow) AS c
    FROM dev
  ) WHERE rn = (c + 1) // 2
)
SELECT d.event_type, CAST(d.dow AS BIGINT) AS dow, CAST(d.day AS BIGINT) AS day,
       d.n, d.med, CAST(m.mad AS BIGINT) AS mad
FROM dev d JOIN mad m ON d.event_type = m.event_type AND d.dow = m.dow
WHERE d.dv > 3 * m.mad
ORDER BY d.event_type, d.day
""",
    category="streaming",
)
def streaming_anomaly_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING anomaly detection (r11, VERDICT r10 #7): the
    events_anomaly_weekly cohort scorer composed with the incremental
    state recipe of streaming_pattern_vshape — the event stream
    replays as five time-ordered micro-batches plus a sentinel flush,
    applyInPandasWithState maintains the per-(type, day) counts across
    batches (days genuinely SPAN batch boundaries), and the sentinel
    finalizes the per-weekday-cohort MAD statistics and emits the
    outliers. Oracle: the batch operator's SQL on the closed input —
    the stream must reproduce it exactly.

    Scale shape: state per event_type is the |days|-bounded pre-agg,
    not raw events; each micro-batch does constant work per event. At
    100 TB the same operator runs keyed by (type) with a sliding
    retention window on the state arrays instead of a sentinel."""
    from walden_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "ts")
    stage = _stage_replay_one_job(spark, ev, "event_type", "walden_anom_stream_")

    stream = (
        spark.readStream.schema("event_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )
    scored = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("event_type")
        .applyInPandasWithState(
            _anomaly_type,
            outputStructType=_ANOM_OUT,
            stateStructType=_ANOM_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    out = _run_to_memory(
        scored, "update", scaled_state_partitions(spark, stage)
    )
    return out.orderBy("event_type", "day")


# ---- streaming SKIP TO NEXT ROW matcher (r11 session 3) ----

_PSN_STATE = (
    "last_day BIGINT, last_n BIGINT, open_day BIGINT, open_n BIGINT, "
    "phase INT, desc_days ARRAY<BIGINT>, desc_ns ARRAY<BIGINT>, "
    "up_day BIGINT, up_n BIGINT"
)
_PSN_OUT = (
    "user_id BIGINT, anchor_day BIGINT, anchor_n BIGINT, n_down BIGINT, "
    "bottom_day BIGINT, bottom_n BIGINT, end_day BIGINT, end_n BIGINT"
)


def _pattern_user_skip_next(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Incremental V-shape matcher under AFTER MATCH SKIP TO NEXT ROW
    — the streaming dual of operators/pattern.match_skip_next. When an
    ascent proves maximal, EVERY suffix anchor of the preceding descent
    emits its own match (the rescan keeps all of them; no selection).
    State holds the open descent's row sequence — anchor row through
    the current bottom — so state is bounded by the LENGTH OF THE OPEN
    RUN (not constant like the skip-to-last matcher, and not the
    series: a closed run's rows leave state the moment its matches
    emit). Day-close/sentinel mechanics mirror _pattern_user."""
    vals = (
        state.get
        if state.exists
        else (None, None, None, None, _PHASE_NONE, [], [], None, None)
    )
    (last_day, last_n, open_day, open_n, phase,
     desc_days, desc_ns, up_day, up_n) = vals
    desc_days, desc_ns = list(desc_days), list(desc_ns)
    rows: list[tuple] = []

    def emit_all():
        # one match per suffix anchor: descent rows 0..len-2 (the last
        # row is the bottom — a suffix needs >= 1 DOWN transition)
        bottom_day, bottom_n = desc_days[-1], desc_ns[-1]
        total = len(desc_days) - 1
        for i in range(total):
            rows.append(
                (key[0], desc_days[i], desc_ns[i], total - i,
                 bottom_day, bottom_n, up_day, up_n)
            )

    def close_day(d, n):
        nonlocal last_day, last_n, phase, desc_days, desc_ns, up_day, up_n
        if last_day is not None:
            if n < last_n:  # DOWN
                if phase == _PHASE_UP:
                    emit_all()
                    desc_days, desc_ns = [last_day, d], [last_n, n]
                    phase = _PHASE_DOWN
                elif phase == _PHASE_DOWN:
                    desc_days.append(d)
                    desc_ns.append(n)
                else:
                    desc_days, desc_ns = [last_day, d], [last_n, n]
                    phase = _PHASE_DOWN
            elif n > last_n:  # UP
                if phase == _PHASE_DOWN:
                    phase = _PHASE_UP
                    up_day, up_n = d, n
                elif phase == _PHASE_UP:
                    up_day, up_n = d, n
            else:  # FLAT breaks runs
                if phase == _PHASE_UP:
                    emit_all()
                phase = _PHASE_NONE
                desc_days, desc_ns = [], []
        last_day, last_n = d, n

    batch = _one_batch(pdfs).sort_values(["ts", "event_id"])
    saw_sentinel = bool((batch["event_id"] < 0).any())
    real = batch[batch["event_id"] >= 0]
    if len(real):
        days = (real["ts"].dt.normalize() - _DAY0).dt.days
        for d in days:
            d = int(d)
            if open_day is None:
                open_day, open_n = d, 1
            elif d == open_day:
                open_n += 1
            else:
                close_day(open_day, open_n)
                open_day, open_n = d, 1
    if saw_sentinel:
        if open_day is not None:
            close_day(open_day, open_n)
        if phase == _PHASE_UP:
            emit_all()
        if state.exists:
            state.remove()
    else:
        state.update(
            (last_day, last_n, open_day, open_n, phase,
             desc_days, desc_ns, up_day, up_n)
        )
    if rows:  # skip the empty-emit Arrow round-trip (r14, guide §4.1)
        yield pd.DataFrame(
            rows,
            columns=[
                "user_id", "anchor_day", "anchor_n", "n_down",
                "bottom_day", "bottom_n", "end_day", "end_n",
            ],
        )


@query(
    "streaming_pattern_skip_next",
    oracle="""
WITH daily AS (
  SELECT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE user_id < 25 GROUP BY 1, 2
), seq AS (
  SELECT user_id, day, n,
         LAG(day) OVER w AS prev_day, LAG(n) OVER w AS prev_n,
         ROW_NUMBER() OVER w AS pos
  FROM daily
  WINDOW w AS (PARTITION BY user_id ORDER BY day)
), dirs AS (
  SELECT *, CASE WHEN n < prev_n THEN -1 WHEN n > prev_n THEN 1
                 ELSE 0 END AS dir
  FROM seq WHERE prev_n IS NOT NULL
), runs AS (
  SELECT *, pos - ROW_NUMBER() OVER (PARTITION BY user_id, dir ORDER BY pos) AS grp
  FROM dirs
), isl AS (
  SELECT user_id, dir,
         MIN(prev_day) AS sp,
         MAX(day) AS ed,
         CAST(arg_max(n, pos) AS BIGINT) AS ev,
         CAST(COUNT(*) AS BIGINT) AS ln
  FROM runs GROUP BY user_id, dir, grp
), m AS (
  SELECT d.user_id, d.sp AS a0, d.ed AS bottom_day, d.ev AS bottom_n,
         d.ln AS dlen, u.ed AS end_day, u.ev AS end_n
  FROM isl d
  JOIN isl u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
            AND u.sp = d.ed
), x AS (
  SELECT m.user_id, dd.day AS anchor_day, dd.n AS anchor_n,
         m.bottom_day, m.bottom_n, m.end_day, m.end_n,
         m.dlen - (ROW_NUMBER() OVER (PARTITION BY m.user_id, m.a0
                                      ORDER BY dd.day) - 1) AS n_down
  FROM m JOIN daily dd
    ON dd.user_id = m.user_id
   AND dd.day >= m.a0 AND dd.day < m.bottom_day
)
SELECT user_id, CAST(anchor_day AS BIGINT) AS anchor_day, anchor_n,
       CAST(n_down AS BIGINT) AS n_down,
       CAST(bottom_day AS BIGINT) AS bottom_day, bottom_n,
       CAST(end_day AS BIGINT) AS end_day, end_n
FROM x ORDER BY user_id, anchor_day
""",
    category="streaming",
)
def streaming_pattern_skip_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING MATCH_RECOGNIZE under SKIP TO NEXT ROW (r11 session 3
    — the rescan mode's streaming dual): every suffix anchor of a
    descent emits its own V the moment the ascent proves maximal. The
    replay harness matches streaming_pattern_vshape (quartile-staged
    files + a sentinel flush, runs genuinely spanning micro-batches);
    per-key state holds the OPEN descent's row sequence — bounded by
    the open run's length, dropped at emission — which is the price of
    per-anchor emission an unbounded stream pays regardless of engine.
    Oracle: the batch suffix-anchor relation (win_pattern_skip_next's
    SQL) on the closed input — the stream must reproduce it exactly.
    Fresh slice: user_id < 25."""
    stage = _staged_event_replay(spark, sf_dir, 25, "walden_patsn_stream_")
    stream = (
        spark.readStream.schema("event_id long, user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )
    matches = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _pattern_user_skip_next,
            outputStructType=_PSN_OUT,
            stateStructType=_PSN_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    out = _run_to_memory(
        matches, "update", scaled_state_partitions(spark, stage)
    )
    return out.orderBy("user_id", "anchor_day")


_ALT_STATE = (
    "last_day BIGINT, last_n BIGINT, open_day BIGINT, open_count BIGINT, "
    "phase INT, anchor_day BIGINT, anchor_n BIGINT, n_down BIGINT, "
    "tail_day BIGINT, tail_n BIGINT, resume_after BIGINT"
)
_ALT_OUT = (
    "user_id BIGINT, anchor_day BIGINT, anchor_n BIGINT, shape STRING, "
    "n_down BIGINT, rise_day BIGINT, plateau_day BIGINT, end_n BIGINT"
)


def _pattern_user_alt(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Incremental ALTERNATION matcher (r12 — the streaming dual of
    ``match_any`` + leftmost preference + skip-past selection, i.e. of
    ``win_pattern_sql_alternation``): PATTERN ((STRT down+ up+) |
    (STRT down+ flat+)), AFTER MATCH SKIP PAST LAST ROW. The branch
    second steps carry DISTINCT transition classes, so anchors are
    branch-disjoint and leftmost preference never has a tie to break —
    a candidate's shape is simply whichever class follows its descent.
    The skip-past greedy walk streams as an emission GATE: candidates
    complete in anchor order (days arrive in order), and a completed
    candidate emits iff its anchor lies strictly AFTER the last
    EMITTED candidate's end (`resume_after`); a suppressed candidate
    does not advance the gate — exactly
    ``operators/pattern.select_skip_past``'s walk, including the
    odd-position rule on boundary-sharing chains. Per-key state is
    CONSTANT (last closed day, the open day, one candidate's anchor /
    descent count / tail, the gate)."""
    vals = (
        state.get
        if state.exists
        else (None, None, None, None, _PHASE_NONE, None, None, None, None, None, None)
    )
    (last_day, last_n, open_day, open_n, phase,
     anchor_day, anchor_n, n_down, tail_day, tail_n, resume_after) = vals
    rows: list[tuple] = []

    def complete(shape: str):
        # candidate (down+ up+|flat+) just proved maximal: emit iff
        # the skip-past gate admits its anchor
        nonlocal resume_after
        if resume_after is None or anchor_day > resume_after:
            rise = tail_day if shape == "up" else None
            plateau = tail_day if shape == "flat" else None
            rows.append(
                (key[0], anchor_day, anchor_n, shape, n_down,
                 rise, plateau, tail_n)
            )
            resume_after = tail_day

    def close_day(d, n):
        nonlocal last_day, last_n, phase
        nonlocal anchor_day, anchor_n, n_down, tail_day, tail_n
        if last_day is not None:
            if n < last_n:  # DOWN transition
                if phase == _PHASE_UP:
                    complete("up")
                elif phase == _PHASE_FLAT:
                    complete("flat")
                if phase == _PHASE_DOWN:
                    n_down += 1  # extend the descent
                else:
                    anchor_day, anchor_n = last_day, last_n
                    n_down = 1
                    phase = _PHASE_DOWN
            elif n > last_n:  # UP transition
                if phase == _PHASE_DOWN:
                    phase = _PHASE_UP
                    tail_day, tail_n = d, n
                elif phase == _PHASE_UP:
                    tail_day, tail_n = d, n  # extend the ascent
                else:
                    if phase == _PHASE_FLAT:
                        complete("flat")  # plateau proved maximal
                    phase = _PHASE_NONE  # ascent without a descent
            else:  # FLAT transition
                if phase == _PHASE_DOWN:
                    phase = _PHASE_FLAT
                    tail_day, tail_n = d, n
                elif phase == _PHASE_FLAT:
                    tail_day, tail_n = d, n  # extend the plateau
                else:
                    if phase == _PHASE_UP:
                        complete("up")  # ascent proved maximal
                    phase = _PHASE_NONE  # plateau without a descent
        last_day, last_n = d, n

    batch = _one_batch(pdfs).sort_values(["ts", "event_id"])
    saw_sentinel = bool((batch["event_id"] < 0).any())
    real = batch[batch["event_id"] >= 0]
    if len(real):
        days = (real["ts"].dt.normalize() - _DAY0).dt.days
        for d in days:
            d = int(d)
            if open_day is None:
                open_day, open_n = d, 1
            elif d == open_day:
                open_n += 1
            else:
                close_day(open_day, open_n)
                open_day, open_n = d, 1
    if saw_sentinel:
        if open_day is not None:
            close_day(open_day, open_n)
        if phase == _PHASE_UP:
            complete("up")
        elif phase == _PHASE_FLAT:
            complete("flat")
        if state.exists:
            state.remove()
    else:
        state.update(
            (last_day, last_n, open_day, open_n, phase,
             anchor_day, anchor_n, n_down, tail_day, tail_n, resume_after)
        )
    if rows:  # skip the empty-emit Arrow round-trip (r14, guide §4.1)
        yield pd.DataFrame(
            rows,
            columns=[
                "user_id", "anchor_day", "anchor_n", "shape", "n_down",
                "rise_day", "plateau_day", "end_n",
            ],
        )


@query(
    "streaming_pattern_alternation",
    oracle="""
WITH daily AS (
  SELECT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE user_id < 26 GROUP BY 1, 2
), seq AS (
  SELECT user_id, day, n,
         LAG(day) OVER w AS prev_day, LAG(n) OVER w AS prev_n,
         ROW_NUMBER() OVER w AS pos
  FROM daily
  WINDOW w AS (PARTITION BY user_id ORDER BY day)
), dirs AS (
  SELECT *, CASE WHEN n < prev_n THEN -1 WHEN n > prev_n THEN 1
                 ELSE 0 END AS dir
  FROM seq WHERE prev_n IS NOT NULL
), runs AS (
  SELECT *, pos - ROW_NUMBER() OVER (PARTITION BY user_id, dir ORDER BY pos) AS grp
  FROM dirs
), isl AS (
  SELECT user_id, dir,
         MIN(prev_day) AS sp,
         CAST(arg_min(prev_n, pos) AS BIGINT) AS av,
         MAX(day) AS ed,
         CAST(arg_max(n, pos) AS BIGINT) AS ev,
         CAST(COUNT(*) AS BIGINT) AS ln
  FROM runs GROUP BY user_id, dir, grp
), mm AS (
  SELECT d.user_id, d.sp AS anchor_day, d.av AS anchor_n,
         u.ed AS end_day, 'up' AS shape, d.ln AS n_down,
         CAST(u.ed AS BIGINT) AS rise_day,
         CAST(NULL AS BIGINT) AS plateau_day,
         u.ev AS end_n
  FROM isl d
  JOIN isl u ON u.user_id = d.user_id AND d.dir = -1 AND u.dir = 1
            AND u.sp = d.ed
  UNION ALL
  SELECT d.user_id, d.sp, d.av, f.ed, 'flat', d.ln,
         CAST(NULL AS BIGINT), CAST(f.ed AS BIGINT), f.ev
  FROM isl d
  JOIN isl f ON f.user_id = d.user_id AND d.dir = -1 AND f.dir = 0
            AND f.sp = d.ed
), s AS (
  SELECT *, CASE WHEN anchor_day = LAG(end_day)
                   OVER (PARTITION BY user_id ORDER BY anchor_day)
                 THEN 0 ELSE 1 END AS new_chain
  FROM mm
), c AS (
  SELECT *, SUM(new_chain)
              OVER (PARTITION BY user_id ORDER BY anchor_day) AS chain_id
  FROM s
), r AS (
  SELECT *, ROW_NUMBER()
              OVER (PARTITION BY user_id, chain_id ORDER BY anchor_day) AS pos
  FROM c
)
SELECT user_id, CAST(anchor_day AS BIGINT) AS anchor_day, anchor_n,
       shape, n_down, rise_day, plateau_day, end_n
FROM r WHERE pos % 2 = 1
ORDER BY user_id, anchor_day
""",
    category="streaming",
)
def streaming_pattern_alternation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING MATCH_RECOGNIZE with pattern ALTERNATION (r12 —
    VERDICT r11 #7, the third streaming pattern mode after V-shape and
    SKIP TO NEXT ROW): ``PATTERN ((STRT down+ up+) | (STRT down+
    flat+))`` with the default SKIP PAST LAST ROW selection, detected
    incrementally with ``applyInPandasWithState``. Each descent is
    classified by what follows it — a rebound or a plateau — the
    moment that tail run proves maximal; the skip-past greedy walk
    streams as a constant-size emission gate (see
    :func:`_pattern_user_alt`). Same replay harness as the other
    streaming matchers (quartile-staged files + sentinel flush, runs
    spanning micro-batches). Oracle: the batch alternation SQL
    (win_pattern_sql_alternation's oracle) on the closed input — the
    stream must reproduce the batch compiler exactly. Fresh slice:
    user_id < 26."""
    stage = _staged_event_replay(spark, sf_dir, 26, "walden_patalt_stream_")
    stream = (
        spark.readStream.schema("event_id long, user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )
    matches = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _pattern_user_alt,
            outputStructType=_ALT_OUT,
            stateStructType=_ALT_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    out = _run_to_memory(
        matches, "update", scaled_state_partitions(spark, stage)
    )
    return out.orderBy("user_id", "anchor_day")


# -- streaming MIXED-DEFINE pattern (r13): direction + threshold
# classes incrementally — the streaming dual of the r13 batch closure
# win_pattern_sql_mixed_define (PATTERN (STRT up+ flr+), up = errors
# rose day-over-day, flr = zero-error day). Classes are provably
# disjoint on counts (n = 0 excludes n > prev when prev >= 0), so the
# batch compiler's runtime disjointness guard can never fire on this
# input and the incremental classifier needs no guard of its own.
_MX_STATE = (
    "last_day BIGINT, last_n BIGINT, open_day BIGINT, open_n BIGINT, "
    "phase INT, anchor_day BIGINT, anchor_n BIGINT, up_day BIGINT, "
    "up_n BIGINT, up_cnt BIGINT, flr_end BIGINT, flr_cnt BIGINT, "
    "last_emit BIGINT"
)
_MX_OUT = (
    "user_id BIGINT, anchor_day BIGINT, anchor_n BIGINT, peak_day BIGINT, "
    "peak_n BIGINT, n_up BIGINT, quiet_end BIGINT, n_quiet BIGINT"
)
_MX_NONE, _MX_UP, _MX_FLR = 0, 1, 2


def _pattern_user_mixed(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Incremental mixed-define matcher: ``PATTERN (STRT up+ flr+)``
    with ``up AS n > PREV(n)`` (direction class) and ``flr AS n = 0``
    (threshold class) over per-day ERROR counts, default AFTER MATCH
    SKIP PAST LAST ROW. Constant per-key state: the last closed day,
    the day currently filling, the open ascent/quiet runs, and the
    last emitted match end — the greedy skip-past walk runs
    incrementally because candidates complete in anchor order (a
    candidate anchored ON the previous match's final row, a 0→positive
    rise, is checked against ``last_emit`` and dropped exactly as the
    batch walk does). A match emits the moment its zero-run is
    provably maximal (a non-zero day arrives, or the sentinel
    flushes). Days with events but no errors close with n = 0 — the
    threshold class's rows — which is why the matcher consumes ALL
    events and counts only errors."""
    vals = (
        state.get
        if state.exists
        else (None,) * 4 + (_MX_NONE,) + (None,) * 8
    )
    (last_day, last_n, open_day, open_n, phase,
     anchor_day, anchor_n, up_day, up_n, up_cnt,
     flr_end, flr_cnt, last_emit) = vals
    rows: list[tuple] = []

    def maybe_emit():
        nonlocal last_emit
        if last_emit is None or anchor_day > last_emit:
            rows.append(
                (key[0], anchor_day, anchor_n, up_day, up_n, up_cnt,
                 flr_end, flr_cnt)
            )
            last_emit = flr_end

    def close_day(d, n):
        nonlocal last_day, last_n, phase
        nonlocal anchor_day, anchor_n, up_day, up_n, up_cnt, flr_end, flr_cnt
        if last_day is not None:
            is_flr = n == 0
            is_up = (not is_flr) and n > last_n
            if phase == _MX_FLR and not is_flr:
                maybe_emit()  # quiet run just proved maximal
                phase = _MX_NONE
            if is_up:
                if phase == _MX_UP:
                    up_day, up_n, up_cnt = d, n, up_cnt + 1
                else:
                    anchor_day, anchor_n = last_day, last_n
                    up_day, up_n, up_cnt = d, n, 1
                    phase = _MX_UP
            elif is_flr:
                if phase == _MX_UP:
                    flr_end, flr_cnt = d, 1
                    phase = _MX_FLR
                elif phase == _MX_FLR:
                    flr_end, flr_cnt = d, flr_cnt + 1
                # zeros with no open ascent cannot start a match
            else:
                phase = _MX_NONE
        last_day, last_n = d, n

    batch = _one_batch(pdfs).sort_values(["ts", "event_id"])
    saw_sentinel = bool((batch["event_id"] < 0).any())
    real = batch[batch["event_id"] >= 0]
    if len(real):
        days = (real["ts"].dt.normalize() - _DAY0).dt.days
        errs = real["err"].to_numpy()
        for d, e in zip(days, errs):
            d = int(d)
            if open_day is None:
                open_day, open_n = d, int(e)
            elif d == open_day:
                open_n += int(e)
            else:
                close_day(open_day, open_n)
                open_day, open_n = d, int(e)
    if saw_sentinel:
        if open_day is not None:
            close_day(open_day, open_n)
        if phase == _MX_FLR:
            maybe_emit()  # stream end proves the quiet run maximal
        if state.exists:
            state.remove()
    else:
        state.update(
            (last_day, last_n, open_day, open_n, phase,
             anchor_day, anchor_n, up_day, up_n, up_cnt,
             flr_end, flr_cnt, last_emit)
        )
    if rows:  # skip the empty-emit Arrow round-trip (r14, guide §4.1)
        yield pd.DataFrame(
            rows,
            columns=[
                "user_id", "anchor_day", "anchor_n", "peak_day", "peak_n",
                "n_up", "quiet_end", "n_quiet",
            ],
        )


@query(
    "streaming_pattern_mixed_define",
    oracle="""
WITH RECURSIVE daily AS (
  SELECT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n
  FROM events WHERE user_id < 34 GROUP BY 1, 2
), seq AS (
  SELECT user_id, day, n,
         LAG(day) OVER w AS prev_day, LAG(n) OVER w AS prev_n,
         ROW_NUMBER() OVER w AS pos
  FROM daily
  WINDOW w AS (PARTITION BY user_id ORDER BY day)
), dirs AS (
  SELECT *, CASE WHEN n = 0 THEN 2 WHEN n > prev_n THEN 1
                 ELSE -1 END AS dir
  FROM seq WHERE prev_n IS NOT NULL
), runs AS (
  SELECT *, pos - ROW_NUMBER() OVER (PARTITION BY user_id, dir ORDER BY pos) AS grp
  FROM dirs
), isl AS (
  SELECT user_id, dir,
         MIN(prev_day) AS sp,
         CAST(arg_min(prev_n, pos) AS BIGINT) AS av,
         MAX(day) AS ed,
         CAST(arg_max(n, pos) AS BIGINT) AS ev,
         CAST(COUNT(*) AS BIGINT) AS ln
  FROM runs GROUP BY user_id, dir, grp
), cand AS (
  SELECT u.user_id AS user_id, CAST(u.sp AS BIGINT) AS anchor_day,
         u.av AS anchor_n, CAST(u.ed AS BIGINT) AS peak_day,
         u.ev AS peak_n, u.ln AS n_up,
         CAST(f.ed AS BIGINT) AS quiet_end, f.ln AS n_quiet
  FROM isl u
  JOIN isl f ON f.user_id = u.user_id AND u.dir = 1 AND f.dir = 2
            AND f.sp = u.ed
), walk AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM cand c2 WHERE c2.user_id = c.user_id
      AND c2.anchor_day < c.anchor_day)
  UNION ALL
  SELECT n.* FROM walk w
  JOIN cand n ON n.user_id = w.user_id AND n.anchor_day > w.quiet_end
  WHERE NOT EXISTS (
    SELECT 1 FROM cand m WHERE m.user_id = w.user_id
      AND m.anchor_day > w.quiet_end
      AND m.anchor_day < n.anchor_day)
)
SELECT user_id, anchor_day, anchor_n, peak_day, peak_n, n_up,
       quiet_end, n_quiet
FROM walk
ORDER BY user_id, anchor_day
""",
    category="streaming",
)
def streaming_pattern_mixed_define(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING mixed-define MATCH_RECOGNIZE (r13): the batch closure
    win_pattern_sql_mixed_define — error-count ramps that go quiet,
    one direction class + one threshold class — detected incrementally
    with applyInPandasWithState. Same five-micro-batch staged replay
    as the other pattern matchers (day boundaries and runs span
    batches), constant per-key state including the greedy skip-past
    walk's resume bound (a 0→positive re-anchor on the previous
    match's final row is dropped exactly as the batch walk does). The
    oracle is the batch two-class islands + recursive-walk SQL on the
    closed input. Fresh slice: user_id < 34."""
    from walden_spark.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 34)
        .select(
            "event_id", "user_id", "ts",
            (F.col("event_type") == "error").cast("int").alias("err"),
        )
    )
    stage = _stage_replay_one_job(
        spark, ev, "user_id", "walden_pat_mixed_",
        sentinel_extras={"err": F.lit(0)},
    )
    stream = (
        spark.readStream.schema("event_id long, user_id long, ts timestamp, err int")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )
    matches = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _pattern_user_mixed,
            outputStructType=_MX_OUT,
            stateStructType=_MX_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    out = _run_to_memory(
        matches, "update", scaled_state_partitions(spark, stage)
    )
    return out.orderBy("user_id", "anchor_day")


_SPLIT_STATE = (
    "last_day BIGINT, last_n BIGINT, open_day BIGINT, open_count BIGINT, "
    "asc_anchor_day BIGINT, asc_anchor_n BIGINT, asc_len BIGINT, "
    "penult_day BIGINT, penult_n BIGINT"
)
_SPLIT_OUT = (
    "user_id BIGINT, anchor_day BIGINT, anchor_n BIGINT, "
    "up_day BIGINT, up_n BIGINT, n_up BIGINT, end_day BIGINT, end_n BIGINT"
)


def _pattern_user_split(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Incremental SAME-CLASS split matcher (r14 — the streaming dual
    of ``match_split_pair``): ``PATTERN (STRT up+ up2+)`` with both
    steps DEFINEd ``n > PREV(n)`` under the default SKIP PAST LAST
    ROW. A maximal ascent of l >= 2 transitions is exactly one match,
    split greedily l−1 / 1, and it emits the MOMENT the ascent proves
    maximal (next transition not-up, or the sentinel flush). Per-key
    state is CONSTANT: the last closed day, the day currently
    filling, and the open ascent's (anchor, length, penultimate row)
    — the penultimate row is up's end under the split, the run's last
    row is up2's."""
    vals = state.get if state.exists else (None,) * 4 + (None, None, 0, None, None)
    (last_day, last_n, open_day, open_n,
     asc_anchor_day, asc_anchor_n, asc_len, penult_day, penult_n) = vals
    rows: list[tuple] = []

    def flush_ascent():
        nonlocal asc_len
        if asc_len >= 2:
            rows.append(
                (key[0], asc_anchor_day, asc_anchor_n,
                 penult_day, penult_n, asc_len - 1, last_day, last_n)
            )
        asc_len = 0

    def close_day(d, n):
        nonlocal last_day, last_n
        nonlocal asc_anchor_day, asc_anchor_n, asc_len, penult_day, penult_n
        if last_day is not None:
            if n > last_n:  # UP transition extends / opens the ascent
                if asc_len == 0:
                    asc_anchor_day, asc_anchor_n = last_day, last_n
                penult_day, penult_n = last_day, last_n
                asc_len += 1
            else:  # DOWN or FLAT breaks the run — ascent is maximal
                flush_ascent()
        last_day, last_n = d, n

    batch = _one_batch(pdfs).sort_values(["ts", "event_id"])
    saw_sentinel = bool((batch["event_id"] < 0).any())
    real = batch[batch["event_id"] >= 0]
    if len(real):
        days = (real["ts"].dt.normalize() - _DAY0).dt.days
        for d in days:
            d = int(d)
            if open_day is None:
                open_day, open_n = d, 1
            elif d == open_day:
                open_n += 1
            else:
                close_day(open_day, open_n)
                open_day, open_n = d, 1
    if saw_sentinel:
        if open_day is not None:
            close_day(open_day, open_n)
        flush_ascent()
        if state.exists:
            state.remove()
    else:
        state.update(
            (last_day, last_n, open_day, open_n,
             asc_anchor_day, asc_anchor_n, asc_len, penult_day, penult_n)
        )
    if rows:  # skip the empty-emit Arrow round-trip (r14, guide §4.1)
        yield pd.DataFrame(
            rows,
            columns=[
                "user_id", "anchor_day", "anchor_n", "up_day", "up_n",
                "n_up", "end_day", "end_n",
            ],
        )


@query(
    "streaming_pattern_same_class",
    oracle="""
WITH daily AS (
  SELECT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE user_id < 22 GROUP BY 1, 2
), seq AS (
  SELECT user_id, day, n,
         LAG(day) OVER w AS prev_day, LAG(n) OVER w AS prev_n,
         ROW_NUMBER() OVER w AS pos
  FROM daily
  WINDOW w AS (PARTITION BY user_id ORDER BY day)
), dirs AS (
  SELECT *, CASE WHEN n < prev_n THEN -1 WHEN n > prev_n THEN 1
                 ELSE 0 END AS dir
  FROM seq WHERE prev_n IS NOT NULL
), runs AS (
  SELECT *, pos - ROW_NUMBER() OVER (PARTITION BY user_id, dir ORDER BY pos) AS grp
  FROM dirs
), isl AS (
  SELECT user_id, dir, grp, MIN(prev_day) AS sp,
         CAST(arg_min(prev_n, pos) AS BIGINT) AS av,
         MAX(day) AS ed, CAST(arg_max(n, pos) AS BIGINT) AS ev,
         CAST(COUNT(*) AS BIGINT) AS ln, MAX(pos) AS mpos
  FROM runs GROUP BY user_id, dir, grp
)
SELECT i.user_id AS user_id, CAST(i.sp AS BIGINT) AS anchor_day,
       i.av AS anchor_n,
       CAST(r.prev_day AS BIGINT) AS up_day,
       CAST(r.prev_n AS BIGINT) AS up_n,
       CAST(i.ln - 1 AS BIGINT) AS n_up,
       CAST(i.ed AS BIGINT) AS end_day, i.ev AS end_n
FROM isl i
JOIN runs r ON r.user_id = i.user_id AND r.dir = i.dir AND r.grp = i.grp
           AND r.pos = i.mpos
WHERE i.dir = 1 AND i.ln >= 2
ORDER BY user_id, anchor_day
""",
    category="streaming",
)
def streaming_pattern_same_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING same-class split (r14 — the streaming dual of the r13
    batch closure ``match_split_pair``): ``PATTERN (STRT up+ up2+)``
    detected incrementally with applyInPandasWithState. Each maximal
    ascent is one match split greedily l−1 / 1; it emits the moment
    the run proves maximal, and per-key state is constant (open
    ascent's anchor / length / penultimate row). Replay harness as the
    other streaming matchers (quartile-staged files + sentinel flush,
    runs genuinely spanning micro-batches); oracle = the batch islands
    relation on the closed input, which the stream must reproduce
    exactly. Fresh slice: user_id < 22."""
    stage = _staged_event_replay(spark, sf_dir, 22, "walden_patsc_stream_")
    stream = (
        spark.readStream.schema("event_id long, user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )
    matches = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _pattern_user_split,
            outputStructType=_SPLIT_OUT,
            stateStructType=_SPLIT_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    out = _run_to_memory(
        matches, "update", scaled_state_partitions(spark, stage)
    )
    return out.orderBy("user_id", "anchor_day")
