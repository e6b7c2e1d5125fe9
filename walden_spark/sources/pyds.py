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
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


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


def register_python_sources(spark: SparkSession) -> None:
    spark.dataSource.register(WaldenSeqDataSource)
