"""Source/sink coverage queries (SURVEY.md §2.1).

Each roundtrip writes a fixture table to the format under test and
reads it back with an explicit schema; the oracle is simply the
original table — hash-match proves the sink+source pair is lossless.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from walden_spark.registry import query
from walden_spark.sources import files
from walden_spark.tables import Tables

_NATION_DDL = "n_nationkey int, n_name string, n_regionkey int"
_NATION_ORACLE = "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"


@query("source_csv_roundtrip", oracle=_NATION_ORACLE, category="scan")
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink → CSV source with explicit schema (Superset upload path,
    reference: tf/superset/superset.tf:61)."""
    t = Tables(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="walden_csv_") + "/nation"
    files.write_csv(t.nation, path)
    return files.read_csv(spark, path, schema=_NATION_DDL).orderBy("n_nationkey")


@query("source_json_roundtrip", oracle=_NATION_ORACLE, category="scan")
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink → source with explicit schema (Trino JSON flows,
    SURVEY §2.8 JSON family)."""
    t = Tables(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="walden_json_") + "/nation"
    files.write_json(t.nation, path)
    return files.read_json(spark, path, schema=_NATION_DDL).orderBy("n_nationkey")


@query("source_orc_roundtrip", oracle=_NATION_ORACLE, category="scan")
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink → ORC source: format parity with the reference's actual
    storage layer (tf/main.tf:96 sets hive.storage-format=ORC; VERDICT
    r01 'What's missing' #3). Spark's native vectorized ORC reader gives
    the same pushdown/pruning behavior as the Parquet path."""
    t = Tables(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="walden_orc_") + "/nation"
    files.write_orc(t.nation, path)
    return files.read_orc(spark, path, schema=_NATION_DDL).orderBy("n_nationkey")


@query("source_partitioned_parquet", oracle="""
SELECT c_mktsegment, COUNT(*) AS n, CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
""", category="scan")
def source_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned Parquet write + partition-pruned scan: the agg
    reads back only via the partition layout (partition pruning is the
    100TB table layout; .explain shows PartitionFilters on reads with a
    segment predicate)."""
    t = Tables(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="walden_part_") + "/customer"
    files.write_parquet(t.customer, path, partition_by=["c_mktsegment"])
    back = files.read_parquet(spark, path)
    return (
        back.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double").alias("bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "source_datagen_tpch",
    oracle="""
SELECT * FROM (VALUES
  ('customer', CAST(150 AS BIGINT), CAST(78566419120266 AS BIGINT)),
  ('lineitem', CAST(6116 AS BIGINT), CAST(3373683207592763 AS BIGINT)),
  ('nation', CAST(25 AS BIGINT), CAST(14797944301030 AS BIGINT)),
  ('orders', CAST(1500 AS BIGINT), CAST(829688923147661 AS BIGINT)),
  ('part', CAST(200 AS BIGINT), CAST(108496229454998 AS BIGINT)),
  ('region', CAST(5 AS BIGINT), CAST(3053578219458 AS BIGINT)),
  ('supplier', CAST(10 AS BIGINT), CAST(4804643623598 AS BIGINT))
) AS t(tbl, n_rows, checksum)
ORDER BY tbl
""",
    category="scan",
)
def source_datagen_tpch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator catalog check (reference: tpch connector,
    tf/variables.tf:245-248), digest form (VERDICT r08 #8): generate
    sf0.001 in-memory and emit per-table row counts plus an ORDER- and
    LAYOUT-independent content checksum (sum over rows of the first 10
    hex digits of md5(concat of all columns, sorted column order) — a
    commutative reduction, so partitioning/parallelism can't move it;
    verified identical under splits=3 vs default). The generator is
    deterministic given (sf, seed), so the oracle pins the FROZEN
    digest as literals — the driver's hash check now witnesses the
    generator's full content, not just row counts (previously
    rows-only)."""
    from walden_spark.sources.datagen import TpchGen

    gen = TpchGen(spark, sf=0.001, seed=42)
    dfs = []
    for name in gen.TABLES:
        df = gen.table(name)
        cols = sorted(df.columns)
        row = F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in cols]))
        dfs.append(
            df.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(F.conv(F.substring(row, 1, 10), 16, 10).cast("bigint"))
                .cast("bigint")
                .alias("checksum"),
            ).select(F.lit(name).alias("tbl"), "n_rows", "checksum")
        )
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out.orderBy("tbl")


@query(
    "source_python_stream",
    oracle="""
SELECT CAST(h % 1000 AS INTEGER) % 10 AS bucket_mod, COUNT(*) AS n,
       CAST(SUM(CAST(CAST(h % 10000 AS DOUBLE) / 100.0 AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM (SELECT (i * 2654435761 + 42) % 2147483648 AS h
      FROM (SELECT unnest(range(0, 1000)) AS i))
GROUP BY 1
ORDER BY 1
""",
    category="scan",
)
def source_python_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STREAMING connector in pure Python (Spark 4
    SimpleDataSourceStreamReader): the walden_seq_stream source serves
    a bounded deterministic sequence in offset-tracked micro-batches;
    the query drains it to completion and aggregates. The oracle
    replays the generator formula in SQL — proving the connector
    surface end to end, offsets included."""
    from walden_spark.sources.pyds import register_python_sources
    from walden_spark.streaming.windows import _run_to_memory

    register_python_sources(spark)
    stream = (
        spark.readStream.format("walden_seq_stream")
        .option("batchRows", "200")
        .option("maxRows", "1000")
        .load()
    )
    collected = _run_to_memory(stream, "append")
    return (
        collected.groupBy((F.col("bucket") % 10).alias("bucket_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total"),
        )
        .orderBy("bucket_mod")
    )


@query(
    "source_binaryfile_ingest",
    oracle="""
SELECT 'doc_' || lpad(CAST(doc_id AS VARCHAR), 6, '0') || '.txt' AS file_name,
       CAST(n_chars AS BIGINT) AS length,
       md5(text) AS digest
FROM documents
WHERE doc_id < 20
ORDER BY file_name
""",
    category="scan",
)
def source_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-file ingestion via the binaryFile source — the entry point
    for media/corpus files that aren't columnar yet (the multimodal
    operators consume exactly this shape). The query materializes 20
    fixture docs as loose files, reads them back as (path, bytes)
    rows, and emits name/size/content-digest; the oracle recomputes
    the digests from the documents table, proving byte-lossless
    ingestion. At scale binaryFile splits by file and supports
    pathGlobFilter/recursiveFileLookup — scan parallelism is file
    count, the right unit for opaque blobs."""
    import os

    t = Tables(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="walden_blob_")
    docs = t.documents.filter(F.col("doc_id") < 20).select("doc_id", "text").collect()
    for r in docs:  # 20 tiny fixture files; ingestion itself is the test
        with open(os.path.join(out, f"doc_{r.doc_id:06d}.txt"), "wb") as f:
            f.write(r.text.encode("utf-8"))
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .load(out)
        .select(
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("length").cast("bigint").alias("length"),
            F.md5(F.col("content").cast("string")).alias("digest"),
        )
        .orderBy("file_name")
    )


@query(
    "source_jdbc_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation "
    "WHERE n_regionkey <= 2 ORDER BY n_nationkey",
    category="scan",
)
def source_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC federation (r08; reference federates operational stores via
    Trino connector catalogs — tf/main.tf wires catalogs the same way):
    land a dim into an embedded Derby database through the JDBC sink,
    then read it back as a BOUNDED PARTITIONED scan (4 parallel range
    queries on the key) with a predicate that must push into the remote
    WHERE clause (plan-gated in test_plans: `PushedFilters: [*...]`).
    Embedded Derby stands in for Postgres/MySQL offline — same option
    surface, different URL (sources/jdbc.py)."""
    from walden_spark.sources import jdbc

    t = Tables(spark, sf_dir)
    url = jdbc.derby_url(tempfile.mkdtemp(prefix="walden_jdbc_") + "/fed")
    jdbc.write_jdbc(t.nation.select("n_nationkey", "n_name", "n_regionkey"), url, "NATION_FED")
    back = jdbc.read_jdbc(
        spark, url, "NATION_FED",
        partition_column="n_nationkey", lower_bound=0, upper_bound=25,
        num_partitions=4,
    )
    return back.filter(F.col("n_regionkey") <= 2).orderBy("n_nationkey")


@query("source_xml_roundtrip", oracle=_NATION_ORACLE, category="scan")
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink → XML source with explicit schema (Spark 4 ships the
    XML data source natively — the one structured file format beyond
    CSV/JSON/ORC/Parquet/binary the engine serves without extra jars;
    Avro remains the documented env-blocked exception)."""
    t = Tables(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="walden_xml_") + "/nation"
    nation = t.nation.select("n_nationkey", "n_name", "n_regionkey")
    nation.write.format("xml").option("rowTag", "nation").save(path)
    return (
        spark.read.format("xml")
        .schema(_NATION_DDL)
        .option("rowTag", "nation")
        .load(path)
        .orderBy("n_nationkey")
    )


@query(
    "source_python_batch",
    oracle="""
SELECT CAST(h % 1000 AS INTEGER) % 10 AS bucket_mod, COUNT(*) AS n,
       CAST(SUM(CAST(CAST(h % 10000 AS DOUBLE) / 100.0 AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM (SELECT (i * 2654435761 + 42) % 2147483648 AS h
      FROM (SELECT unnest(range(0, 2000)) AS i))
GROUP BY 1
ORDER BY 1
""",
    category="scan",
)
def source_python_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom BATCH connector in pure Python (r08; Spark 4 DataSource
    API, the batch sibling of source_python_stream): walden_seq plans
    REAL input partitions (4 range splits, each generated
    executor-side — no driver data path) and the aggregate proves the
    rows; the oracle replays the generator formula in SQL. This is the
    template for wrapping any Python-reachable system (REST APIs,
    custom binary formats) as a parallel Spark source."""
    from walden_spark.sources.pyds import register_python_sources

    register_python_sources(spark)
    df = (
        spark.read.format("walden_seq")
        .option("n", "2000")
        .option("partitions", "4")
        .load()
    )
    return (
        df.groupBy((F.col("bucket") % 10).alias("bucket_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total"),
        )
        .orderBy("bucket_mod")
    )


@query(
    "source_jdbc_agg_pushdown",
    oracle="""
SELECT n_regionkey, COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
""",
    category="scan",
)
def source_jdbc_agg_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federated AGGREGATE pushdown (r08) — the full Trino-connector
    behavior: the remote RDBMS is mounted as a DSv2 catalog
    (sources/jdbc.py register_jdbc_catalog) and the GROUP BY executes
    INSIDE the remote engine — the plan carries PushedAggregates /
    PushedGroupByExpressions (gated in
    test_plans.py::test_jdbc_catalog_pushes_aggregates) and only group
    rows cross the wire. Embedded Derby stands in for the remote."""
    import uuid as _uuid

    from walden_spark.sources import jdbc

    t = Tables(spark, sf_dir)
    cat = "fedcat"
    db = tempfile.mkdtemp(prefix="walden_jdbccat_") + "/fed"
    jdbc.register_jdbc_catalog(spark, cat, jdbc.derby_url(db))
    tbl = f"{cat}.NATION_AGG_{_uuid.uuid4().hex[:6].upper()}"
    t.nation.select("n_nationkey", "n_regionkey").writeTo(tbl).create()
    return (
        spark.table(tbl)
        .groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_nationkey").cast("bigint").alias("key_sum"),
        )
        .orderBy("n_regionkey")
    )
