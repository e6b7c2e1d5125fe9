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
