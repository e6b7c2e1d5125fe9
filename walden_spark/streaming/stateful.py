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
