"""Custom Python data source (Spark 4 DataSource API) — the engine's
extension point for new connectors, playing the role of the
reference's drop-in Trino connector catalogs (reference:
README.md:399-413, trino-catalog-extra ConfigMap).

`walden_seq` is a deterministic synthetic source with REAL partition
planning: the reader splits the row range into N input partitions and
each executor generates only its slice — the same contract a Kafka /
REST / proprietary-store connector implements (plan splits on the
driver, read one split per task). Registered per-session via
``register_python_sources(spark)``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SeqReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        step = max(1, -(-self.n // self.num_partitions))  # ceil division
        parts = []
        start = 0
        while start < self.n:
            parts.append(_RangePartition(start, min(start + step, self.n)))
            start += step
        return parts

    def read(self, partition: _RangePartition):
        # executor-side: generate only this split (no driver data)
        for i in range(partition.start, partition.end):
            h = (i * 2654435761 + self.seed) % (2**31)
            yield (i, h % 1000, float(h % 10_000) / 100.0)


class WaldenSeqDataSource(DataSource):
    """``spark.read.format("walden_seq").option("n", ...).load()``"""

    @classmethod
    def name(cls) -> str:
        return "walden_seq"

    def schema(self) -> str:
        return "id long, bucket int, value double"

    def reader(self, schema) -> DataSourceReader:
        return _SeqReader(self.options)


class _SeqStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming read of the same deterministic sequence:
    each micro-batch serves rows [pos, pos+batch_rows) until max_rows.
    This is the minimal custom streaming-connector contract — offsets
    owned by the source, replayable reads between offsets (exactly-once
    with checkpointing), no driver-side data retention."""

    def __init__(self, options):
        self.batch_rows = int(options.get("batchRows", 200))
        self.max_rows = int(options.get("maxRows", 1000))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self):
        return {"pos": 0}

    def _rows(self, start: int, end: int):
        for i in range(start, end):
            h = (i * 2654435761 + self.seed) % (2**31)
            yield (i, h % 1000, float(h % 10_000) / 100.0)

    def read(self, start):
        pos = start["pos"]
        end = min(pos + self.batch_rows, self.max_rows)
        # a picklable list_iterator, not a generator: the simple-reader
        # contract prefetches rows driver-side and ships them pickled
        return iter(list(self._rows(pos, end))), {"pos": end}

    def readBetweenOffsets(self, start, end):
        # replay path after failure recovery — must be deterministic
        return iter(list(self._rows(start["pos"], end["pos"])))


class WaldenSeqStreamDataSource(DataSource):
    """``spark.readStream.format("walden_seq_stream")…`` — bounded
    deterministic stream (maxRows), used to prove the Python streaming
    connector surface end to end."""

    @classmethod
    def name(cls) -> str:
        return "walden_seq_stream"

    def schema(self) -> str:
        return "id long, bucket int, value double"

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _SeqStreamReader(self.options)


def register_python_sources(spark: SparkSession) -> None:
    spark.dataSource.register(WaldenSeqDataSource)
    spark.dataSource.register(WaldenSeqStreamDataSource)
