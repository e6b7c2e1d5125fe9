"""TPC-H-style generator catalog (SURVEY.md §7.1 M3).

The reference deploys Trino's ``tpch``/``tpcds`` connector catalogs,
which synthesize benchmark tables on demand at a requested scale factor
(reference: tf/variables.tf:238-251, ``tpch.splits-per-node=4``). Spark
has no such connector; this module is the equivalent: deterministic,
seeded generators producing the driver-fixture schema (TESTDATA.md) at
any SF, as DataFrames or materialized Parquet.

Scale posture — generation is pure ``spark.range`` + column
expressions:
* no driver-side data, no Python UDFs — every value derives from the
  row id via ``xxhash64(id, seed)``, so generation parallelizes to any
  cluster size and is reproducible at any partition count;
* ``splits`` mirrors the reference's splits-per-node knob
  (``spark.range(..., numPartitions=splits)``);
* writing goes through sources.files.write_parquet with
  maxRecordsPerFile to hold the ~128MB file target.

Row counts follow TPC-H proportions (customer 150k·SF, supplier
10k·SF, part 200k·SF, orders 1.5M·SF, lineitem ≈ 4·orders).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from walden_spark.sources.files import write_parquet

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_NAMES1 = ["cold", "small", "large", "blue", "red", "green", "shiny", "dull"]
P_NAMES2 = ["widget", "bolt", "rod", "gear", "cog", "pin"]
P_TYPES = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
EPOCH_1992 = "1992-01-01"


def _h(seed: int, *cols) -> F.Column:
    """Deterministic 63-bit nonneg hash of (seed, cols)."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def _uniform(seed: int, col, lo: float, hi: float) -> F.Column:
    """Deterministic uniform double in [lo, hi) derived from a key."""
    return F.lit(lo) + (_h(seed, col) % 1_000_000) / 1_000_000.0 * (hi - lo)


def _pick(seed: int, col, values: list[str]) -> F.Column:
    arr = F.array(*[F.lit(v) for v in values])
    return arr[(_h(seed, col) % len(values)).cast("int")]


def _money2(col: F.Column) -> F.Column:
    return F.round(col, 2)


class TpchGen:
    def __init__(self, spark: SparkSession, sf: float = 0.01, seed: int = 42, splits: int | None = None):
        self.spark = spark
        self.sf = sf
        self.seed = seed
        self.splits = splits or spark.sparkContext.defaultParallelism

    def _range(self, n: int, key: str) -> DataFrame:
        return self.spark.range(0, n, numPartitions=self.splits).withColumnRenamed("id", key)

    def region(self) -> DataFrame:
        return self.spark.createDataFrame(
            [(i, n) for i, n in enumerate(REGIONS)], "r_regionkey int, r_name string"
        )

    def nation(self) -> DataFrame:
        return (
            self._range(25, "k")
            .select(
                F.col("k").cast("int").alias("n_nationkey"),
                F.concat(F.lit("NATION_"), F.col("k")).alias("n_name"),
                (F.col("k") % 5).cast("int").alias("n_regionkey"),
            )
        )

    def customer(self) -> DataFrame:
        n = max(1, int(150_000 * self.sf))
        s = self.seed
        return self._range(n, "c_custkey").select(
            "c_custkey",
            F.concat(F.lit("Customer#"), F.col("c_custkey")).alias("c_name"),
            (_h(s + 1, F.col("c_custkey")) % 25).cast("int").alias("c_nationkey"),
            _money2(_uniform(s + 2, F.col("c_custkey"), -999.99, 9999.99)).alias("c_acctbal"),
            _pick(s + 3, F.col("c_custkey"), SEGMENTS).alias("c_mktsegment"),
        )

    def supplier(self) -> DataFrame:
        n = max(1, int(10_000 * self.sf))
        s = self.seed
        return self._range(n, "s_suppkey").select(
            "s_suppkey",
            F.concat(F.lit("Supplier#"), F.col("s_suppkey")).alias("s_name"),
            (_h(s + 4, F.col("s_suppkey")) % 25).cast("int").alias("s_nationkey"),
            _money2(_uniform(s + 5, F.col("s_suppkey"), -999.99, 9999.99)).alias("s_acctbal"),
        )

    def part(self) -> DataFrame:
        n = max(1, int(200_000 * self.sf))
        s = self.seed
        k = F.col("p_partkey")
        return self._range(n, "p_partkey").select(
            "p_partkey",
            F.concat_ws(" ", _pick(s + 6, k, P_NAMES1), _pick(s + 7, k, P_NAMES2)).alias("p_name"),
            F.concat(F.lit("Brand#"), (_h(s + 8, k) % 5 + 1)).alias("p_brand"),
            _pick(s + 9, k, P_TYPES).alias("p_type"),
            (_h(s + 10, k) % 50 + 1).cast("int").alias("p_size"),
            _money2(_uniform(s + 11, k, 900.0, 2000.0)).alias("p_retailprice"),
        )

    def orders(self) -> DataFrame:
        n = max(1, int(1_500_000 * self.sf))
        ncust = max(1, int(150_000 * self.sf))
        s = self.seed
        k = F.col("o_orderkey")
        days = (_h(s + 12, k) % 2400).cast("int")  # 1992-01-01 .. ~1998-07
        return self._range(n, "o_orderkey").select(
            "o_orderkey",
            (_h(s + 13, k) % ncust).alias("o_custkey"),
            _pick(s + 14, k, ["O", "F", "P"]).alias("o_orderstatus"),
            _money2(_uniform(s + 15, k, 1000.0, 400000.0)).alias("o_totalprice"),
            F.timestamp_seconds(
                F.unix_timestamp(F.lit(EPOCH_1992).cast("timestamp")) + days * 86400
            ).cast("timestamp_ntz").alias("o_orderdate"),  # fixture parquet reads back NTZ
            _pick(s + 16, k, PRIORITIES).alias("o_orderpriority"),
        )

    def lineitem(self) -> DataFrame:
        """~4 lines per order (TPC-H averages 4; 1-7 uniform)."""
        s = self.seed
        npart = max(1, int(200_000 * self.sf))
        nsupp = max(1, int(10_000 * self.sf))
        o = self.orders().select("o_orderkey", "o_orderdate")
        nlines = (_h(s + 17, F.col("o_orderkey")) % 7 + 1).cast("int")
        li = o.withColumn("l_linenumber", F.explode(F.sequence(F.lit(1), nlines)))
        k = F.concat_ws("-", F.col("o_orderkey"), F.col("l_linenumber"))
        qty = (_h(s + 18, k) % 50 + 1).cast("double")
        price = _money2(_uniform(s + 19, k, 900.0, 2000.0) * qty)
        ship_lag = (_h(s + 20, k) % 121).cast("int")  # 0..120 days after order
        return li.select(
            F.col("o_orderkey").alias("l_orderkey"),
            (_h(s + 21, k) % npart).alias("l_partkey"),
            (_h(s + 22, k) % nsupp).alias("l_suppkey"),
            "l_linenumber",
            qty.alias("l_quantity"),
            price.alias("l_extendedprice"),
            (F.round((_h(s + 23, k) % 11) / 100.0, 2)).alias("l_discount"),  # 0.00-0.10
            (F.round((_h(s + 24, k) % 9) / 100.0, 2)).alias("l_tax"),  # 0.00-0.08
            _pick(s + 25, k, ["A", "N", "R"]).alias("l_returnflag"),
            _pick(s + 26, k, ["O", "F"]).alias("l_linestatus"),
            F.timestamp_seconds(
                F.unix_timestamp(F.col("o_orderdate").cast("timestamp")) + ship_lag * 86400
            ).cast("timestamp_ntz").alias("l_shipdate"),
        )

    TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

    def table(self, name: str) -> DataFrame:
        if name not in self.TABLES:
            raise ValueError(f"unknown tpch table {name!r}")
        return getattr(self, name)()

    def write(self, out_dir: str, tables=None, max_records_per_file: int | None = None) -> None:
        """Materialize the catalog as one Parquet dir per table —
        idempotent (overwrite), seeded, any SF."""
        for name in tables or self.TABLES:
            write_parquet(
                self.table(name), f"{out_dir}/{name}", max_records_per_file=max_records_per_file
            )


# Distributions profiled from the driver fixtures at sf0.1
# (TESTDATA.md): 31-word vocab, 10-100 words/doc, lang mix en 40% /
# zh,es,fr,de 15% each, 20 uniform sources, ~0.3% exact-dup docs;
# embeddings are unit-normalized uniform vectors (no cluster
# structure — label-centroid norm ≈0.06 at sf0.1), dim 64, 10 labels;
# events span 30 days, ~67 events/user, 5 uniform types,
# exponential(mean 50) value, '{"k": N}' props.
DOC_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
DOC_LANGS = ["en"] * 8 + ["zh"] * 3 + ["es"] * 3 + ["fr"] * 3 + ["de"] * 3
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
EVENTS_EPOCH = "2024-01-01"


class SyntheticGen:
    """Generator catalog for the non-TPC-H fixture tables
    (``documents`` / ``embeddings`` / ``events``, TESTDATA.md) at any
    SF — the scale path for benching the LLM-pipeline operators beyond
    the shipped sf0.1 fixtures.

    Same scale posture as TpchGen: pure ``spark.range`` + column
    expressions (every value derives from the row id via
    ``xxhash64``), no driver-side data, no Python UDFs — document
    text assembly, embedding normalization, and timestamp synthesis
    all stay in whole-stage codegen, so generation parallelizes to
    any cluster size.

    Row counts are linear anchored at the sf0.1 fixtures: documents
    50k·SF, embeddings 20k·SF (dim 64), events 1M·SF over 15k·SF
    users.
    """

    def __init__(self, spark: SparkSession, sf: float = 0.01, seed: int = 42,
                 splits: int | None = None, dim: int = 64):
        self.spark = spark
        self.sf = sf
        self.seed = seed
        self.dim = dim
        self.splits = splits or spark.sparkContext.defaultParallelism

    def _range(self, n: int, key: str) -> DataFrame:
        return self.spark.range(0, n, numPartitions=self.splits).withColumnRenamed("id", key)

    def documents(self) -> DataFrame:
        n = max(1, int(50_000 * self.sf))
        s = self.seed
        k = F.col("doc_id")
        # ~0.3% of docs are exact copies of their predecessor — the
        # near-dup structure the dedup operators key on stays linear
        # in SF instead of exploding into deep cliques.
        base = F.when(
            (k > 0) & (_h(s + 30, k) % 300 == 0), k - 1
        ).otherwise(k)
        vocab = F.array(*[F.lit(w) for w in DOC_VOCAB])
        n_words = (_h(s + 31, base) % 91 + 10).cast("int")
        words = F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: vocab[(_h(s + 32, base, i) % len(DOC_VOCAB)).cast("int")],
        )
        text = F.array_join(words, " ")
        return self._range(n, "doc_id").select(
            "doc_id",
            text.alias("text"),
            _pick(s + 33, k, DOC_LANGS).alias("lang"),
            F.concat(F.lit("src"), _h(s + 34, k) % 20).alias("source"),
            F.length(text).alias("n_chars"),
        )

    def embeddings(self) -> DataFrame:
        n = max(1, int(20_000 * self.sf))
        s = self.seed
        k = F.col("vec_id")
        raw = F.transform(
            F.sequence(F.lit(0), F.lit(self.dim - 1)),
            lambda d: F.lit(-1.0) + (_h(s + 40, k, d) % 1_000_000) / 500_000.0,
        )
        norm = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda acc, x: acc + x * x))
        return self._range(n, "vec_id").select(
            "vec_id",
            F.transform(raw, lambda x: (x / norm).cast("float")).alias("embedding"),
            (_h(s + 41, k) % 10).cast("int").alias("label"),
        )

    def events(self) -> DataFrame:
        n = max(1, int(1_000_000 * self.sf))
        nusers = max(1, int(15_000 * self.sf))
        s = self.seed
        k = F.col("event_id")
        epoch_us = F.unix_timestamp(F.lit(EVENTS_EPOCH).cast("timestamp")) * 1_000_000
        span_us = 30 * 86_400 * 1_000_000  # 30 days at microsecond grain
        # exponential(mean 50): -50·ln(U), U uniform in (0, 1]
        u = (_h(s + 52, k) % 999_999 + 1) / 1_000_000.0
        return self._range(n, "event_id").select(
            "event_id",
            F.timestamp_micros(
                (epoch_us + _h(s + 50, k) % span_us).cast("long")
            ).cast("timestamp_ntz").alias("ts"),
            (_h(s + 51, k) % nusers).alias("user_id"),
            _pick(s + 53, k, EVENT_TYPES).alias("event_type"),
            F.round(-50.0 * F.log(u), 2).alias("value"),
            F.concat(F.lit('{"k": '), _h(s + 54, k) % 100, F.lit("}")).alias("props"),
        )

    TABLES = ("documents", "embeddings", "events")

    def table(self, name: str) -> DataFrame:
        if name not in self.TABLES:
            raise ValueError(f"unknown synthetic table {name!r}")
        return getattr(self, name)()

    def write(self, out_dir: str, tables=None, max_records_per_file: int | None = None) -> None:
        for name in tables or self.TABLES:
            write_parquet(
                self.table(name), f"{out_dir}/{name}", max_records_per_file=max_records_per_file
            )
