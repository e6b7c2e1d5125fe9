"""Catalog/DDL lifecycle — SURVEY.md §2.1, the reference's own smoke
test (tf/test-hive.sh:19-24) expressed as a driver-checkable query.

The full lifecycle (CREATE SCHEMA with location → CREATE TABLE →
INSERT → SELECT → DROP) runs inside the query builder against a temp
warehouse; the returned DataFrame is the SELECT-back, so the oracle is
simply the VALUES relation the reference inserts.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from walden_spark.registry import query
from walden_spark.tables import Tables


@query(
    "ddl_lifecycle",
    oracle="""
SELECT k AS key, v AS val
FROM (VALUES ('this', CAST(1 AS BIGINT)), ('is', 2), ('a', 3), ('test', 4)) AS t(k, v)
ORDER BY val
""",
    category="ddl",
)
def ddl_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE SCHEMA (location) → CREATE TABLE → INSERT VALUES → SELECT
    → DROP: the reference's dim_foo fixture end to end
    (reference: tf/test-hive.sh:19-27, README.md:96-162)."""
    loc = tempfile.mkdtemp(prefix="walden_ddl_")
    spark.sql("DROP DATABASE IF EXISTS walden_direct CASCADE")
    spark.sql(f"CREATE DATABASE walden_direct LOCATION '{loc}'")
    spark.sql(
        "CREATE TABLE walden_direct.dim_foo (key STRING, val BIGINT) USING parquet"
    )
    spark.sql(
        "INSERT INTO walden_direct.dim_foo VALUES ('this',1),('is',2),('a',3),('test',4)"
    )
    out = spark.table("walden_direct.dim_foo").orderBy("val")
    rows = out.collect()  # materialize before dropping the backing files
    spark.sql("DROP TABLE walden_direct.dim_foo")
    spark.sql("DROP DATABASE walden_direct CASCADE")
    return spark.createDataFrame(rows, out.schema)


@query(
    "ddl_ctas_view",
    oracle="""
SELECT r_name, n_per_region FROM (
  SELECT r_name, COUNT(*) AS n_per_region
  FROM region JOIN nation ON n_regionkey = r_regionkey
  GROUP BY r_name
) ORDER BY r_name
""",
    category="ddl",
)
def ddl_ctas_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTAS + CREATE VIEW AS SELECT (Superset allow_ctas/allow_cvas,
    reference: tf/superset/superset.tf:55-56) — materialize an agg as a
    table, stack a view on it, query the view."""
    t = Tables(spark, sf_dir)
    t.region.createOrReplaceTempView("ddl_region")
    t.nation.createOrReplaceTempView("ddl_nation")
    spark.sql("DROP TABLE IF EXISTS walden_ctas_nations")
    spark.sql(
        """
        CREATE TABLE walden_ctas_nations USING parquet AS
        SELECT r_name, COUNT(*) AS n_per_region
        FROM ddl_region JOIN ddl_nation ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    )
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW walden_ctas_v AS SELECT * FROM walden_ctas_nations"
    )
    out = spark.sql("SELECT r_name, n_per_region FROM walden_ctas_v ORDER BY r_name")
    rows = out.collect()
    spark.sql("DROP TABLE walden_ctas_nations")
    return spark.createDataFrame(rows, out.schema)


@query(
    "ddl_introspection",
    oracle="""
SELECT 'default' AS name, 'database' AS kind, '' AS dtype
UNION ALL
SELECT 'introspect_nation' AS name, 'table' AS kind, '' AS dtype
UNION ALL
SELECT column_name AS name, 'column' AS kind,
       CASE data_type
         WHEN 'INTEGER' THEN 'int'
         WHEN 'BIGINT' THEN 'bigint'
         WHEN 'VARCHAR' THEN 'string'
         WHEN 'DOUBLE' THEN 'double'
         ELSE lower(data_type)
       END AS dtype
FROM information_schema.columns WHERE table_name = 'nation'
ORDER BY kind, name
""",
    category="ddl",
)
def ddl_introspection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHOW SCHEMAS / SHOW TABLES / DESCRIBE — information_schema-style
    introspection (reference: README.md:110-117,412-413), emitted as a
    CANONICALIZED projection (VERDICT r07 #8): the session-dependent
    catalog listing is filtered to the entities this query itself
    guarantees ('default' database, the registered view) and column
    rows carry engine-canonical lowercase type names, so the output is
    version-independent and the oracle is a true cross-engine check —
    DuckDB introspects ITS catalog's view of the same parquet via
    information_schema and must agree modulo the documented type-name
    mapping (INTEGER→int, VARCHAR→string)."""
    t = Tables(spark, sf_dir)
    t.nation.createOrReplaceTempView("introspect_nation")
    dbs = (
        spark.sql("SHOW DATABASES")
        .filter("namespace = 'default'")
        .selectExpr("namespace AS name", "'database' AS kind", "'' AS dtype")
    )
    tabs = (
        spark.sql("SHOW TABLES")
        .filter("tableName = 'introspect_nation'")
        .selectExpr("tableName AS name", "'table' AS kind", "'' AS dtype")
    )
    cols = spark.sql("DESCRIBE TABLE introspect_nation").selectExpr(
        "col_name AS name", "'column' AS kind", "lower(data_type) AS dtype"
    )
    return dbs.unionByName(tabs).unionByName(cols).orderBy("kind", "name")


@query(
    "ddl_dml_cow",
    oracle="""
WITH base AS (
  SELECT CAST(id AS BIGINT) AS id, CAST(bal AS DOUBLE) AS bal, status
  FROM (VALUES (1, 10.0, 'ok'), (2, -5.0, 'ok'), (3, 7.5, 'hold'), (4, 8.0, 'ok'))
       AS t(id, bal, status)
),
after_delete AS (SELECT * FROM base WHERE NOT (bal < 0)),
after_update AS (
  SELECT id, bal, CASE WHEN status = 'hold' THEN 'frozen' ELSE status END AS status
  FROM after_delete
),
merged AS (
  SELECT COALESCE(t.id, s.id) AS id,
         COALESCE(s.bal, t.bal) AS bal,
         COALESCE(s.status, t.status) AS status
  FROM after_update t
  FULL OUTER JOIN (SELECT CAST(id AS BIGINT) AS id, CAST(bal AS DOUBLE) AS bal, status
                   FROM (VALUES (1, 100.0, 'ok'), (9, 1.0, 'new')) AS v(id, bal, status)) s
    ON t.id = s.id
)
SELECT id, bal, status FROM merged ORDER BY id
""",
    category="ddl",
)
def ddl_dml_cow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE / DELETE / MERGE via copy-on-write rewrite on plain
    Parquet (SURVEY §2.1 — the reference gets row-level DML from
    Trino-on-Iceberg, tf/main.tf:93-98 + superset allow_dml; we emulate
    with staged rewrite, walden_spark/catalog.py). The oracle replays
    the same DML algebraically."""
    import tempfile as _tf

    from walden_spark.catalog import Catalog

    cat = Catalog(spark)
    loc = _tf.mkdtemp(prefix="walden_dml_")
    spark.sql("DROP DATABASE IF EXISTS walden_dml CASCADE")
    cat.create_schema("walden_dml", location=loc)
    t = "walden_dml.accounts"
    cat.create_table(t, "id BIGINT, bal DOUBLE, status STRING")
    cat.insert_values(t, "(1, 10.0, 'ok'), (2, -5.0, 'ok'), (3, 7.5, 'hold'), (4, 8.0, 'ok')")
    cat.delete_where(t, F.col("bal") < 0)
    cat.update_where(t, {"status": F.lit("frozen")}, F.col("status") == "hold")
    src = spark.createDataFrame([(1, 100.0, "ok"), (9, 1.0, "new")], "id long, bal double, status string")
    cat.merge_into(t, src, on=["id"])
    out = spark.table(t).orderBy("id")
    rows = out.collect()
    cat.drop_schema("walden_dml")
    return spark.createDataFrame(rows, out.schema)


@query(
    "ddl_time_travel",
    oracle="""
WITH v0 AS (SELECT n_nationkey, n_name, n_regionkey FROM nation),
v1 AS (SELECT * FROM v0 WHERE NOT (n_regionkey = 0)),
v2 AS (SELECT n_nationkey,
              CASE WHEN n_regionkey = 1 THEN lower(n_name) ELSE n_name END AS n_name,
              n_regionkey
       FROM v1),
src AS (SELECT CAST(k AS INTEGER) AS n_nationkey, nm AS n_name, CAST(r AS INTEGER) AS n_regionkey
        FROM (VALUES (10, 'xx', 9), (990, 'zz', 4)) AS s(k, nm, r)),
v3 AS (
  SELECT COALESCE(t.n_nationkey, s.n_nationkey) AS n_nationkey,
         CASE WHEN s.n_nationkey IS NOT NULL THEN s.n_name ELSE t.n_name END AS n_name,
         CASE WHEN s.n_nationkey IS NOT NULL THEN s.n_regionkey ELSE t.n_regionkey END AS n_regionkey
  FROM v2 t FULL OUTER JOIN src s ON t.n_nationkey = s.n_nationkey
),
metrics AS (
  SELECT 0 AS version, COUNT(*) AS n_rows, SUM(n_nationkey) AS key_sum,
         SUM(CASE WHEN n_name = lower(n_name) THEN 1 ELSE 0 END) AS n_lower FROM v0
  UNION ALL
  SELECT 1, COUNT(*), SUM(n_nationkey),
         SUM(CASE WHEN n_name = lower(n_name) THEN 1 ELSE 0 END) FROM v1
  UNION ALL
  SELECT 2, COUNT(*), SUM(n_nationkey),
         SUM(CASE WHEN n_name = lower(n_name) THEN 1 ELSE 0 END) FROM v2
  UNION ALL
  SELECT 3, COUNT(*), SUM(n_nationkey),
         SUM(CASE WHEN n_name = lower(n_name) THEN 1 ELSE 0 END) FROM v3
)
SELECT CAST(version AS BIGINT) AS version, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(key_sum AS BIGINT) AS key_sum, CAST(n_lower AS BIGINT) AS n_lower
FROM metrics ORDER BY version
""",
    category="ddl",
)
def ddl_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot versioning + time travel (reference capability:
    Nessie/Iceberg snapshots, tf/nessie-values.yaml:1-7): every DML op
    commits a NEW retained snapshot; afterwards ALL four versions are
    still readable and the query reports per-version metrics — the
    oracle replays the same DML algebra with CTEs."""
    from walden_spark.timetravel import VersionedTable

    t = Tables(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="walden_tt_") + "/nation_v"
    vt = VersionedTable(spark, path)
    vt.write(t.nation.select("n_nationkey", "n_name", "n_regionkey"))   # v0
    vt.delete_where(F.col("n_regionkey") == 0)                          # v1
    vt.update_where({"n_name": F.lower(F.col("n_name"))}, F.col("n_regionkey") == 1)  # v2
    src = spark.createDataFrame(
        [(10, "xx", 9), (990, "zz", 4)], "n_nationkey int, n_name string, n_regionkey int"
    )
    vt.merge_into(src, on=["n_nationkey"])                              # v3

    frames = []
    for v in range(4):
        frames.append(
            vt.read(version=v).agg(
                F.lit(v).cast("bigint").alias("version"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("n_nationkey").cast("bigint").alias("key_sum"),
                F.sum(
                    F.when(F.col("n_name") == F.lower(F.col("n_name")), 1).otherwise(0)
                ).cast("bigint").alias("n_lower"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("version")


@query(
    "ddl_schema_evolution_versioned",
    oracle="""
WITH v0 AS (SELECT n_nationkey, n_name, n_regionkey FROM nation),
metrics AS (
  SELECT 0 AS version, COUNT(*) AS n_rows, 3 AS n_cols,
         SUM(n_nationkey) AS key_sum, -1 AS flag_old FROM v0
  UNION ALL
  SELECT 1, COUNT(*), 4, SUM(n_nationkey), COUNT(*) FROM v0
  UNION ALL
  SELECT 2, COUNT(*) + 2, 4, SUM(n_nationkey) + 990 + 991,
         COUNT(*) + 1 FROM v0
  UNION ALL
  SELECT 3, COUNT(*) + 2, 3, SUM(n_nationkey) + 990 + 991,
         COUNT(*) + 1 FROM v0
)
SELECT CAST(version AS BIGINT) AS version, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_cols AS BIGINT) AS n_cols, CAST(key_sum AS BIGINT) AS key_sum,
       CAST(flag_old AS BIGINT) AS flag_old
FROM metrics ORDER BY version
""",
    category="ddl",
)
def ddl_schema_evolution_versioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution DDL on the VERSIONED table format (r12 —
    the Iceberg add/drop-column capability the reference exposes
    through Trino on Nessie tables): ``add_column`` with an initial
    default backfills pre-existing rows metadata-only (O(manifest),
    no rewrite), appends after it carry the column physically,
    ``drop_column`` projects it out from its layer upward, and every
    earlier version still reads under ITS OWN schema. The metrics
    frame reads all four versions back (rows, column count, key sum,
    default-backfill count) and the oracle replays the algebra from
    the nation view."""
    from walden_spark.timetravel import VersionedTable

    t = Tables(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="walden_evo_vt_") + "/nation_evo"
    vt = VersionedTable(spark, path)
    vt.write(t.nation.select("n_nationkey", "n_name", "n_regionkey"))  # v0
    vt.add_column("flag", "string", default="old")                     # v1
    vt.append(
        spark.createDataFrame(
            [(990, "zz", 4, "new"), (991, "yy", 4, "old")],
            "n_nationkey int, n_name string, n_regionkey int, flag string",
        )
    )                                                                  # v2
    vt.drop_column("n_name")                                           # v3

    frames = []
    for v in range(4):
        df = vt.read(version=v)
        flag_old = (
            F.sum(F.when(F.col("flag") == "old", 1).otherwise(0)).cast("bigint")
            if "flag" in df.columns
            else F.lit(-1).cast("bigint")
        )
        frames.append(
            df.agg(
                F.lit(v).cast("bigint").alias("version"),
                F.count(F.lit(1)).alias("n_rows"),
                F.lit(len(df.columns)).cast("bigint").alias("n_cols"),
                F.sum("n_nationkey").cast("bigint").alias("key_sum"),
                flag_old.alias("flag_old"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("version")


@query(
    "ddl_schema_evolution",
    oracle="""
SELECT id, v, CAST(tag AS VARCHAR) AS tag
FROM (
  SELECT CAST(id AS BIGINT) AS id, CAST(v AS DOUBLE) AS v, CAST(NULL AS VARCHAR) AS tag
  FROM (VALUES (1, 1.5), (2, 2.5)) AS a(id, v)
  UNION ALL
  SELECT CAST(id AS BIGINT), CAST(v AS DOUBLE), tag
  FROM (VALUES (3, 3.5, 'new'), (4, 4.5, 'new')) AS b(id, v, tag)
)
ORDER BY id
""",
    category="ddl",
)
def ddl_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution: ALTER TABLE ADD COLUMNS on a live parquet
    table — rows written before the evolution read back with NULL in
    the new column, new rows carry values (the Iceberg add-column
    capability the reference exposes through Trino; Spark supports it
    natively on parquet tables). The oracle replays the union."""
    import tempfile as _tf

    from walden_spark.catalog import Catalog

    cat = Catalog(spark)
    loc = _tf.mkdtemp(prefix="walden_evo_")
    spark.sql("DROP DATABASE IF EXISTS walden_evo CASCADE")
    cat.create_schema("walden_evo", location=loc)
    t = "walden_evo.metrics"
    cat.create_table(t, "id BIGINT, v DOUBLE")
    cat.insert_values(t, "(1, 1.5), (2, 2.5)")
    spark.sql(f"ALTER TABLE {t} ADD COLUMNS (tag STRING)")
    cat.insert_values(t, "(3, 3.5, 'new'), (4, 4.5, 'new')")
    out = spark.table(t).orderBy("id")
    rows = out.collect()
    cat.drop_schema("walden_evo")
    return spark.createDataFrame(rows, out.schema)


@query(
    "ddl_materialized_view",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
FROM (
  SELECT o_orderpriority, o_totalprice FROM orders
  UNION ALL
  SELECT o_orderpriority, o_totalprice FROM orders WHERE o_orderkey % 7 = 0
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    category="ddl",
)
def ddl_materialized_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE MATERIALIZED VIEW + REFRESH (the reference's
    Trino-on-Iceberg MV surface): the definition is stored in
    TBLPROPERTIES, the source table moves on (an INSERT), and REFRESH
    re-materializes through the DML staging path — the returned MV
    content must equal recomputing the definition over the moved
    source, which is exactly what the oracle does."""
    from walden_spark.catalog import Catalog

    t = Tables(spark, sf_dir)
    cat = Catalog(spark)
    spark.sql("DROP TABLE IF EXISTS walden_mv_src")
    spark.sql("DROP TABLE IF EXISTS walden_mv_rev")
    t.orders.select("o_orderkey", "o_orderpriority", "o_totalprice").write.saveAsTable(
        "walden_mv_src"
    )
    cat.create_materialized_view(
        "walden_mv_rev",
        "SELECT o_orderpriority, COUNT(*) AS n, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue "
        "FROM walden_mv_src GROUP BY o_orderpriority",
    )
    spark.sql(
        "INSERT INTO walden_mv_src "
        "SELECT * FROM walden_mv_src WHERE o_orderkey % 7 = 0"
    )
    cat.refresh_materialized_view("walden_mv_rev")
    out = spark.table("walden_mv_rev").orderBy("o_orderpriority")
    rows = out.collect()
    spark.sql("DROP TABLE walden_mv_rev")
    spark.sql("DROP TABLE walden_mv_src")
    return spark.createDataFrame(rows, out.schema)


@query(
    "ddl_branch_merge",
    oracle="""
SELECT 'branch:etl' AS ref, n_nationkey, n_name FROM nation WHERE n_regionkey <> 0
UNION ALL
SELECT 'main' AS ref, n_nationkey, n_name FROM nation WHERE n_regionkey <> 0
UNION ALL
SELECT 'tag:v0' AS ref, n_nationkey, n_name FROM nation
ORDER BY ref, n_nationkey
""",
    category="ddl",
)
def ddl_branch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nessie-analog catalog versioning (tf/nessie-values.yaml:1-7,
    tf/main.tf:34-60): tag the initial snapshot, branch, commit a
    transformation on the branch while main stays pinned, then
    fast-forward merge. The result reads all three refs after the
    merge — the tag still serves the pre-branch data, and main serves
    the merged branch head. The oracle replays the ref contents as
    plain SQL over the source table."""
    from walden_spark.timetravel import VersionedTable

    t = Tables(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="walden_branch_") + "/nation_b"
    vt = VersionedTable(spark, path)
    vt.write(t.nation.select("n_nationkey", "n_name", "n_regionkey"))  # v0 on main
    vt.create_tag("v0")
    vt.create_branch("etl")
    vt.write(
        vt.read(branch="etl").filter(F.col("n_regionkey") != 0),
        operation="etl_filter",
        branch="etl",
    )  # v1 on etl; main still v0
    assert vt.head("main") == 0 and vt.head("etl") == 1
    vt.merge_branch("etl", into="main")  # fast-forward main → v1

    def ref_rows(label: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(label).alias("ref"), "n_nationkey", "n_name"
        )

    out = (
        ref_rows("branch:etl", vt.read(branch="etl"))
        .unionByName(ref_rows("main", vt.read(branch="main")))
        .unionByName(ref_rows("tag:v0", vt.read(tag="v0")))
    )
    return out.orderBy("ref", "n_nationkey")


@query(
    "ddl_mor_lifecycle",
    oracle="""
WITH v0 AS (SELECT n_nationkey, n_name, n_regionkey FROM nation),
v1 AS (SELECT * FROM v0 UNION ALL
       SELECT 900 + r.r AS n_nationkey, 'new_' || CAST(r.r AS VARCHAR) AS n_name, 9 AS n_regionkey
       FROM (SELECT unnest(range(3)) AS r) r),
v2 AS (SELECT * FROM v1 WHERE NOT (n_regionkey = 2)),
v3 AS (SELECT n_nationkey,
              CASE WHEN n_regionkey = 9 THEN upper(n_name) ELSE n_name END AS n_name,
              n_regionkey FROM v2),
metrics AS (
  SELECT 0 AS version, COUNT(*) AS n_rows, SUM(n_nationkey) AS key_sum FROM v0
  UNION ALL SELECT 1, COUNT(*), SUM(n_nationkey) FROM v1
  UNION ALL SELECT 2, COUNT(*), SUM(n_nationkey) FROM v2
  UNION ALL SELECT 3, COUNT(*), SUM(n_nationkey) FROM v3
  UNION ALL SELECT 4, COUNT(*), SUM(n_nationkey) FROM v3
)
SELECT CAST(version AS BIGINT) AS version, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(key_sum AS BIGINT) AS key_sum
FROM metrics ORDER BY version
""",
    category="ddl",
)
def ddl_mor_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read lifecycle (Iceberg v2 analog): append / predicate
    delete / update commit O(delta) layers — the delete writes NO data
    files at all — then compaction materializes the stack. Every
    intermediate version stays readable (time travel over MoR layers),
    and the compacted snapshot equals the layered read, which is what
    version 4's metrics assert against version 3's."""
    from walden_spark.timetravel import VersionedTable

    t = Tables(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="walden_mor_") + "/nation_m"
    vt = VersionedTable(spark, path)
    vt.write(t.nation.select("n_nationkey", "n_name", "n_regionkey"))      # v0 full
    new_rows = spark.createDataFrame(
        [(900 + i, f"new_{i}", 9) for i in range(3)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    vt.append(new_rows)                                                    # v1 append-only
    vt.delete_where("n_regionkey = 2", mode="mor")                         # v2 zero-data delete
    vt.update_where({"n_name": "upper(n_name)"}, "n_regionkey = 9", mode="mor")  # v3
    assert vt._manifests()[2].get("data_dir") is None  # delete wrote no data
    v4 = vt.compact()                                                      # v4 materialized

    frames = []
    for v in range(5):
        frames.append(
            vt.read(version=v).agg(
                F.lit(v).cast("bigint").alias("version"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("n_nationkey").cast("bigint").alias("key_sum"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("version")


@query(
    "ddl_hidden_partition_scan",
    oracle="""
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
WHERE ts >= (SELECT date_trunc('day', MIN(ts)) + INTERVAL 2 DAY FROM events)
  AND ts <  (SELECT date_trunc('day', MIN(ts)) + INTERVAL 4 DAY FROM events)
GROUP BY event_type
ORDER BY event_type
""",
    category="ddl",
)
def ddl_hidden_partition_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden day partitioning end-to-end (Iceberg's headline pruning
    feature): events land in a VersionedTable partitioned by a derived
    day column the reader never sees; the query filters on raw ``ts``
    and scan() converts that into partition predicates, so only the
    two queried days' directories are touched. The oracle applies the
    same time window to the flat events table — identical rows prove
    the pruning is lossless."""
    from walden_spark.tables import load_table
    from walden_spark.timetravel import VersionedTable

    ev = load_table(spark, sf_dir, "events")
    path = tempfile.mkdtemp(prefix="walden_hidden_") + "/events_h"
    vt = VersionedTable(spark, path)
    vt.write(ev.select("event_id", "event_type", "value", "ts"), partition_day="ts")

    lo, hi = (
        ev.agg(
            F.date_trunc("day", F.min("ts")).alias("d0"),
        )
        .select(
            (F.col("d0") + F.expr("INTERVAL 2 DAY")).alias("lo"),
            (F.col("d0") + F.expr("INTERVAL 4 DAY")).alias("hi"),
        )
        .collect()[0]
    )
    scanned = vt.scan(filters=[("ts", ">=", lo), ("ts", "<", hi)])
    # prove directory-level pruning actually happened: the scan's file
    # set must be a strict subset of the full table's
    assert len(scanned.inputFiles()) < len(vt.read().inputFiles())
    return (
        scanned.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .orderBy("event_type")
    )


@query(
    "ddl_eq_delete_lifecycle",
    oracle="""
WITH v0 AS (SELECT n_nationkey, n_name, n_regionkey FROM nation),
v1 AS (SELECT * FROM v0 WHERE n_nationkey NOT IN
       (SELECT n_nationkey FROM v0 WHERE n_regionkey = 2)),
v2 AS (SELECT * FROM v1 UNION ALL
       SELECT n_nationkey, 'revived_' || CAST(n_nationkey AS VARCHAR) AS n_name, 2 AS n_regionkey
       FROM v0 WHERE n_regionkey = 2 AND n_nationkey <= 10),
v3 AS (SELECT * FROM v2 WHERE n_nationkey <> 1),
metrics AS (
  SELECT 0 AS version, COUNT(*) AS n_rows, SUM(n_nationkey) AS key_sum FROM v0
  UNION ALL SELECT 1, COUNT(*), SUM(n_nationkey) FROM v1
  UNION ALL SELECT 2, COUNT(*), SUM(n_nationkey) FROM v2
  UNION ALL SELECT 3, COUNT(*), SUM(n_nationkey) FROM v3
  UNION ALL SELECT 4, COUNT(*), SUM(n_nationkey) FROM v3
)
SELECT CAST(version AS BIGINT) AS version, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(key_sum AS BIGINT) AS key_sum
FROM metrics ORDER BY version
""",
    category="ddl",
)
def ddl_eq_delete_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v2 EQUALITY-DELETE lifecycle: delete-by-key commits store
    the key rows (O(|keys|), no predicate, no table rewrite) and compose
    with later appends — re-appending a deleted key above the delete
    layer revives it, exactly the interleaving predicate deletes can't
    express. Replays deletes-then-appends-then-deletes and checks every
    version's metrics, plus the compacted snapshot, against a plain-SQL
    replay (reference capability: Iceberg v2 delete files via
    tf/main.tf:93-98)."""
    from walden_spark.timetravel import VersionedTable

    t = Tables(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="walden_eqdel_") + "/nation_e"
    vt = VersionedTable(spark, path)
    base = t.nation.select("n_nationkey", "n_name", "n_regionkey")
    vt.write(base)                                                      # v0 full
    region2 = base.filter(F.col("n_regionkey") == 2).select("n_nationkey")
    vt.delete_keys(region2, on=["n_nationkey"])                         # v1 eq-delete
    revived = (
        base.filter((F.col("n_regionkey") == 2) & (F.col("n_nationkey") <= 10))
        .select(
            "n_nationkey",
            F.concat(F.lit("revived_"), F.col("n_nationkey").cast("string")).alias("n_name"),
            F.lit(2).cast("int").alias("n_regionkey"),
        )
    )
    vt.append(revived)                                                  # v2 revive subset
    vt.delete_keys(
        spark.createDataFrame([(1,)], "n_nationkey int"), on=["n_nationkey"]
    )                                                                   # v3
    vt.compact()                                                        # v4 == v3

    frames = []
    for v in range(5):
        frames.append(
            vt.read(version=v).agg(
                F.lit(v).cast("bigint").alias("version"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("n_nationkey").cast("bigint").alias("key_sum"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("version")


@query(
    "ddl_catalog_refs",
    oracle="""
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, upper(r_name) AS r_name
FROM nation JOIN region ON r_regionkey = n_regionkey
WHERE n_regionkey <> 0
ORDER BY n_nationkey
""",
    category="ddl",
)
def ddl_catalog_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-level refs (Nessie's cross-table pitch,
    tf/nessie-values.yaml): ONE branch versions two tables; commits on
    the branch leave both mains pinned, and the catalog merge lands
    both tables' changes atomically (validate-then-apply). The result
    joins the two merged mains — nation filtered on the branch, region
    uppercased on the branch — which the oracle states as plain SQL
    over the raw fixtures."""
    from walden_spark.timetravel import VersionedCatalog

    t = Tables(spark, sf_dir)
    cat = VersionedCatalog(spark, tempfile.mkdtemp(prefix="walden_catref_") + "/cat")
    nat, reg = cat.table("nat"), cat.table("reg")
    nat.write(t.nation.select("n_nationkey", "n_name", "n_regionkey"))
    reg.write(t.region.select("r_regionkey", "r_name"))
    cat.create_branch("etl", ["nat", "reg"])
    nat.write(
        nat.read(branch="etl").filter(F.col("n_regionkey") != 0),
        operation="etl_filter",
        branch="etl",
    )
    reg.write(
        reg.read(branch="etl").withColumn("r_name", F.upper("r_name")),
        operation="etl_upper",
        branch="etl",
    )
    assert nat.head("main") == 0 and reg.head("main") == 0  # pinned until merge
    merged = cat.merge("etl", into="main")
    assert merged == {"nat": 1, "reg": 1}
    return (
        nat.read(branch="main")
        .join(reg.read(branch="main"), F.col("r_regionkey") == F.col("n_regionkey"))
        .select(F.col("n_nationkey").cast("bigint").alias("n_nationkey"), "n_name", "r_name")
        .orderBy("n_nationkey")
    )


@query(
    "ddl_pos_delete_lifecycle",
    oracle="""
WITH v0 AS (SELECT n_nationkey, n_name, n_regionkey FROM nation),
v1 AS (SELECT * FROM v0 WHERE n_regionkey <> 2),
v2 AS (SELECT * FROM v1 UNION ALL
       SELECT n_nationkey, 'back_' || CAST(n_nationkey AS VARCHAR) AS n_name, 2 AS n_regionkey
       FROM v0 WHERE n_regionkey = 2),
metrics AS (
  SELECT 0 AS version, COUNT(*) AS n_rows, SUM(n_nationkey) AS key_sum FROM v0
  UNION ALL SELECT 1, COUNT(*), SUM(n_nationkey) FROM v1
  UNION ALL SELECT 2, COUNT(*), SUM(n_nationkey) FROM v2
  UNION ALL SELECT 3, COUNT(*), SUM(n_nationkey) FROM v2
)
SELECT CAST(version AS BIGINT) AS version, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(key_sum AS BIGINT) AS key_sum
FROM metrics ORDER BY version
""",
    category="ddl",
)
def ddl_pos_delete_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v2 POSITION-DELETE lifecycle: the commit resolves a
    predicate once against the live snapshot and stores (file,
    row_index) pairs — frozen-at-commit semantics, so re-appending
    rows that match the original predicate leaves them alive (here the
    whole deleted region is appended back and version 2 shows it
    restored; a predicate delete would re-hide it). Metrics for every
    version plus the compacted head are hash-checked against a plain
    SQL replay."""
    from walden_spark.timetravel import VersionedTable

    t = Tables(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="walden_posdel_") + "/nation_p"
    vt = VersionedTable(spark, path)
    base = t.nation.select("n_nationkey", "n_name", "n_regionkey")
    vt.write(base)                                                      # v0 full
    vt.delete_positions_where("n_regionkey = 2")                        # v1 pos-delete
    back = base.filter(F.col("n_regionkey") == 2).select(
        "n_nationkey",
        F.concat(F.lit("back_"), F.col("n_nationkey").cast("string")).alias("n_name"),
        F.lit(2).cast("int").alias("n_regionkey"),
    )
    vt.append(back)                                                     # v2: revived
    vt.compact()                                                        # v3 == v2

    frames = []
    for v in range(4):
        frames.append(
            vt.read(version=v).agg(
                F.lit(v).cast("bigint").alias("version"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("n_nationkey").cast("bigint").alias("key_sum"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("version")


@query(
    "ddl_branch_merge_threeway",
    oracle="""
SELECT n_nationkey, n_name FROM (
  SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name
  FROM nation WHERE n_regionkey NOT IN (0, 4)
  UNION ALL
  SELECT 900 + r.r AS n_nationkey, 'etl_' || CAST(r.r AS VARCHAR) AS n_name
  FROM (SELECT unnest(range(3)) AS r) r
) ORDER BY n_nationkey
""",
    category="ddl",
)
def ddl_branch_merge_threeway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-aware THREE-WAY branch merge (the Nessie delta VERDICT
    r04 called out, tf/main.tf:34-60): branches that diverged but
    touched disjoint key sets merge by replaying the source's
    merge-on-read layers onto the target — data files shared, no
    rewrite. Here the etl branch appends rows and equality-deletes
    region-0 keys while main predicate-deletes region-4 keys; the
    merged main must show all three changes, which the oracle states as
    one SQL expression."""
    from walden_spark.timetravel import VersionedTable

    t = Tables(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="walden_3way_") + "/nation_t"
    vt = VersionedTable(spark, path)
    base = t.nation.select("n_nationkey", "n_name", "n_regionkey")
    vt.write(base)                                                      # v0 on main
    vt.create_branch("etl")
    new_rows = spark.createDataFrame(
        [(900 + i, f"etl_{i}", 7) for i in range(3)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    vt.append(new_rows, branch="etl")                                   # etl: append
    vt.delete_keys(
        base.filter(F.col("n_regionkey") == 0).select("n_nationkey"),
        on=["n_nationkey"],
        branch="etl",
    )                                                                   # etl: eq-delete
    vt.delete_where("n_regionkey = 4", mode="mor")                      # main diverges
    vt.merge_branch("etl", into="main", keys=["n_nationkey"])
    return (
        vt.read(branch="main")
        .select(F.col("n_nationkey").cast("bigint").alias("n_nationkey"), "n_name")
        .orderBy("n_nationkey")
    )


@query(
    "ddl_change_feed",
    oracle="""
WITH v0 AS (SELECT n_nationkey, n_name, n_regionkey FROM nation),
newrows AS (
  SELECT 900 + r.r AS n_nationkey, 'new_' || CAST(r.r AS VARCHAR) AS n_name,
         9 AS n_regionkey
  FROM (SELECT unnest(range(3)) AS r) r
),
v1 AS (SELECT * FROM v0 UNION ALL SELECT * FROM newrows),
v2 AS (SELECT * FROM v1 WHERE n_nationkey NOT IN (0, 901)),
changes AS (
  SELECT *, 'insert' AS _change_type, 1 AS _commit_version FROM newrows
  UNION ALL
  SELECT *, 'delete', 2 FROM v1 WHERE n_nationkey IN (0, 901)
  UNION ALL
  SELECT *, 'delete', 3 FROM v2 WHERE n_regionkey = 4
  UNION ALL
  SELECT n_nationkey, upper(n_name), n_regionkey, 'insert', 3
  FROM v2 WHERE n_regionkey = 4
)
SELECT n_nationkey, n_name, n_regionkey, _change_type,
       CAST(_commit_version AS BIGINT) AS _commit_version
FROM changes
""",
    category="ddl",
)
def ddl_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed over a merge-on-read table (Delta
    ``table_changes`` / Iceberg incremental-read analog): append,
    equality-delete and predicate-update commits replay as
    insert/delete rows tagged with their commit version; every MoR
    layer contributes O(delta) rows, never a table diff. The oracle
    reconstructs the same feed relationally from the nation fixture."""
    from walden_spark.timetravel import VersionedTable

    t = Tables(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="walden_cdf_") + "/nation_c"
    vt = VersionedTable(spark, path)
    vt.write(t.nation.select("n_nationkey", "n_name", "n_regionkey"))   # v0
    vt.append(
        spark.createDataFrame(
            [(900 + i, f"new_{i}", 9) for i in range(3)],
            "n_nationkey int, n_name string, n_regionkey int",
        )
    )                                                                   # v1
    vt.delete_keys(
        spark.createDataFrame([(0,), (901,)], "n_nationkey int"),
        on=["n_nationkey"],
    )                                                                   # v2
    vt.update_where(
        {"n_name": "upper(n_name)"}, "n_regionkey = 4", mode="mor"
    )                                                                   # v3
    return vt.read_changes(0)


@query(
    "ddl_incremental_mv",
    oracle="""
WITH v0 AS (SELECT o_orderkey, o_orderpriority FROM orders),
v1 AS (SELECT * FROM v0 UNION ALL
       SELECT 9000001, '9-TEST' UNION ALL SELECT 9000002, '9-TEST'
       UNION ALL SELECT 9000003, '1-URGENT'),
v2 AS (SELECT * FROM v1 WHERE o_orderkey NOT IN (1, 9000002)),
v3 AS (SELECT o_orderkey,
              CASE WHEN o_orderkey = 9000001 THEN '2-HIGH' ELSE o_orderpriority END
                AS o_orderpriority
       FROM v2)
SELECT o_orderpriority, CAST(SUM(o_orderkey) AS BIGINT) AS key_total,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM v3 GROUP BY 1
""",
    category="ddl",
)
def ddl_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally maintained aggregate view: the MV is refreshed
    from the source's CHANGE FEED after each commit — appends add,
    deletes retract, an upsert does both — and the final MV state
    equals the oracle's full recompute over the same edit history.
    Refreshes after the first materialization commit O(touched groups)
    to the view table (upsert/delete-key MoR layers, never a rewrite)."""
    from walden_spark.timetravel import IncrementalAggView, VersionedTable

    t = Tables(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="walden_imv_")
    src = VersionedTable(spark, base + "/src")
    src.write(t.orders.select("o_orderkey", "o_orderpriority"))
    mv = IncrementalAggView(
        spark, src, base + "/mv",
        group_by=["o_orderpriority"], sums={"key_total": "o_orderkey"},
    )
    mv.refresh()                                                       # full once
    src.append(
        spark.createDataFrame(
            [(9000001, "9-TEST"), (9000002, "9-TEST"), (9000003, "1-URGENT")],
            "o_orderkey long, o_orderpriority string",
        )
    )
    mv.refresh()                                                       # delta only
    src.delete_keys(
        spark.createDataFrame([(1,), (9000002,)], "o_orderkey long"),
        on=["o_orderkey"],
    )
    src.upsert_keys(
        spark.createDataFrame([(9000001, "2-HIGH")], "o_orderkey long, o_orderpriority string"),
        on=["o_orderkey"],
    )
    mv.refresh()                                                       # two commits folded
    return mv.read().select(
        "o_orderpriority",
        F.col("key_total").cast("long").alias("key_total"),
        F.col("n_rows").cast("long").alias("n_rows"),
    )


@query(
    "ddl_restore_lifecycle",
    oracle="""
WITH v0 AS (SELECT n_nationkey, n_name, n_regionkey FROM nation),
v1 AS (SELECT * FROM v0 WHERE n_regionkey <> 1),
metrics AS (
  SELECT 0 AS version, 'write' AS operation, COUNT(*) AS n_rows,
         SUM(n_nationkey) AS key_sum FROM v0
  UNION ALL SELECT 1, 'delete_mor', COUNT(*), SUM(n_nationkey) FROM v1
  UNION ALL SELECT 2, 'restore', COUNT(*), SUM(n_nationkey) FROM v0
)
SELECT CAST(version AS BIGINT) AS version, operation,
       CAST(n_rows AS BIGINT) AS n_rows, CAST(key_sum AS BIGINT) AS key_sum
FROM metrics ORDER BY version
""",
    category="ddl",
)
def ddl_restore_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE lifecycle: a bad merge-on-read delete is rolled back by
    committing a restore snapshot that SHARES the original files (zero
    data movement, O(manifest)); the bad version stays readable for
    audit. Metrics per version assert the roll-forward history."""
    from walden_spark.timetravel import VersionedTable

    t = Tables(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="walden_restore_") + "/nation_r"
    vt = VersionedTable(spark, path)
    vt.write(t.nation.select("n_nationkey", "n_name", "n_regionkey"))   # v0
    vt.delete_where("n_regionkey = 1", mode="mor")                      # v1 (bad)
    vt.restore(0)                                                       # v2
    frames = []
    for v, op in [(0, "write"), (1, "delete_mor"), (2, "restore")]:
        frames.append(
            vt.read(version=v).agg(
                F.lit(v).cast("bigint").alias("version"),
                F.lit(op).alias("operation"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("n_nationkey").cast("bigint").alias("key_sum"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("version")


@query(
    "ddl_wap_publish",
    oracle="""
WITH staged AS (
  SELECT n_nationkey, n_name, n_regionkey FROM nation
  UNION ALL
  SELECT 900 + r.r, 'audited_' || CAST(r.r AS VARCHAR), 9
  FROM (SELECT unnest(range(4)) AS r) r
)
SELECT n_nationkey, n_name, n_regionkey FROM staged
""",
    category="ddl",
)
def ddl_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-Audit-Publish (Iceberg's marquee branch workflow): the
    ingest lands on an 'audit' branch (main never sees it), audit
    checks run against the branch head — here a row-count delta and a
    no-null-keys assertion — and only then does a fast-forward merge
    publish the commit to main atomically. A failed audit would leave
    main untouched (the branch is simply dropped). The oracle states
    main's post-publish content."""
    from walden_spark.timetravel import VersionedTable

    t = Tables(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="walden_wap_") + "/nation_w"
    vt = VersionedTable(spark, path)
    vt.write(t.nation.select("n_nationkey", "n_name", "n_regionkey"))   # main v0
    vt.create_branch("audit")
    staged = spark.createDataFrame(
        [(900 + i, f"audited_{i}", 9) for i in range(4)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    vt.append(staged, branch="audit")                                   # invisible to main
    base_n = vt.read(branch="main").count()
    # ---- audit gates against the BRANCH head ----
    audited = vt.read(branch="audit")
    assert audited.count() == base_n + 4, "audit: row-count delta"
    assert audited.filter(F.col("n_nationkey").isNull()).count() == 0, "audit: null keys"
    # ---- publish: atomic fast-forward of main's pointer ----
    vt.merge_branch("audit", into="main")
    vt.delete_ref("branch", "audit")
    return vt.read(branch="main").select("n_nationkey", "n_name", "n_regionkey")


@query(
    "ddl_txn_publish",
    oracle="""
SELECT 'a' AS tbl, CAST(n_nationkey AS BIGINT) AS key_id
FROM nation WHERE n_regionkey <> 0
UNION ALL
SELECT 'b' AS tbl, CAST(r_regionkey AS BIGINT) AS key_id FROM region
UNION ALL
SELECT 'b' AS tbl, 99 AS key_id
ORDER BY tbl, key_id
""",
    category="ddl",
)
def ddl_txn_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-statement ACID transaction witnessed end-to-end (VERDICT
    r05 next-round #6): two versioned tables change inside ONE
    transaction — a DELETE on one, an INSERT on the other — staged on
    per-table transaction branches, validated, CAS-claimed, and
    published together. A deliberately aborted transaction first
    proves rollback leaves both tables untouched. The output is both
    tables' post-commit key sets; the oracle states them statically."""
    from walden_spark.session import WaldenSession
    from walden_spark.timetravel import VersionedTable

    t = Tables(spark, sf_dir)
    ws = WaldenSession(spark)
    root = tempfile.mkdtemp(prefix="walden_txn_")
    va = VersionedTable(spark, f"{root}/a")
    vb = VersionedTable(spark, f"{root}/b")
    va.write(t.nation.select("n_nationkey", "n_name", "n_regionkey"))
    vb.write(t.region.select("r_regionkey", "r_name"))
    ws.register_versioned("txa", va.path)
    ws.register_versioned("txb", vb.path)
    # aborted transaction: nothing publishes
    try:
        with ws.transaction():
            ws.sql("DELETE FROM txa WHERE n_nationkey >= 0")  # would empty it
            raise RuntimeError("abort on purpose")
    except RuntimeError:
        pass
    assert va.read(branch="main").count() == t.nation.count(), "rollback leaked"
    # committed transaction: both tables publish atomically
    with ws.transaction():
        ws.sql("DELETE FROM txa WHERE n_regionkey = 0")
        ws.sql("INSERT INTO txb VALUES (99, 'TXNREGION')")
    a_post = va.read(branch="main").select(
        F.lit("a").alias("tbl"), F.col("n_nationkey").cast("bigint").alias("key_id")
    )
    b_post = vb.read(branch="main").select(
        F.lit("b").alias("tbl"), F.col("r_regionkey").cast("bigint").alias("key_id")
    )
    return a_post.unionByName(b_post).orderBy("tbl", "key_id")


@query(
    "ddl_maintenance_lifecycle",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey
FROM nation WHERE n_regionkey <> 2
ORDER BY n_nationkey
""",
    category="ddl",
)
def ddl_maintenance_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintenance SQL surface witnessed end-to-end (VERDICT r05
    next-round #6): a merge-on-read DELETE stacks a layer, OPTIMIZE
    compacts the stack into one full snapshot, VACUUM expires the
    pre-compaction versions and removes orphans — and the table's
    CONTENT is invariant through all of it, which is exactly what the
    oracle states. In-code asserts pin the mechanics (layer count,
    expiry)."""
    from walden_spark.session import WaldenSession
    from walden_spark.timetravel import VersionedTable

    t = Tables(spark, sf_dir)
    ws = WaldenSession(spark)
    path = tempfile.mkdtemp(prefix="walden_mnt_") + "/nation_m"
    vt = VersionedTable(spark, path)
    vt.write(t.nation.select("n_nationkey", "n_name", "n_regionkey"))   # v0
    ws.register_versioned("mnt", vt.path)
    ws.sql("DELETE FROM mnt WHERE n_regionkey = 2")                     # v1 (MoR)
    assert vt._manifests()[-1].get("mor"), "SQL DELETE must stack a MoR layer"
    ws.sql("OPTIMIZE mnt")                                              # v2 compact
    assert not vt._manifests()[-1].get("mor"), "OPTIMIZE must materialize"
    res = ws.sql("VACUUM mnt RETAIN 1 VERSIONS").collect()[0]
    assert res.expired_versions >= 2, "VACUUM must expire the stack"
    assert len(vt._manifests()) == 1, "only the compacted snapshot remains"
    return (
        vt.read(branch="main")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    )


@query(
    "ddl_shallow_clone",
    oracle="""
WITH post_del AS (
  SELECT CAST(n_nationkey AS BIGINT) AS key_id FROM nation WHERE n_regionkey <> 2
)
SELECT 'clone' AS side, key_id FROM post_del
UNION ALL SELECT 'clone', 999
UNION ALL SELECT 'src', key_id FROM post_del
UNION ALL SELECT 'src', 888
ORDER BY side, key_id
""",
    category="ddl",
)
def ddl_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta SHALLOW CLONE analog: a zero-copy table whose initial
    state references the source's files through its merge-on-read
    chain (O(manifests), no data movement), after which both sides
    commit independently. The output is both tables' post-divergence
    key sets — each carries the shared pre-clone state plus only its
    own append."""
    from walden_spark.timetravel import VersionedTable

    t = Tables(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="walden_clone_")
    src = VersionedTable(spark, f"{root}/src")
    src.write(t.nation.select("n_nationkey", "n_name", "n_regionkey"))
    src.delete_where("n_regionkey = 2", mode="mor")      # MoR chain to clone
    clone = src.shallow_clone(f"{root}/clone")
    clone.append(
        spark.createDataFrame([(999, "CLONED", 9)], "n_nationkey int, n_name string, n_regionkey int")
    )
    src.append(
        spark.createDataFrame([(888, "SOURCED", 8)], "n_nationkey int, n_name string, n_regionkey int")
    )
    c = clone.read().select(
        F.lit("clone").alias("side"), F.col("n_nationkey").cast("bigint").alias("key_id")
    )
    s = src.read().select(
        F.lit("src").alias("side"), F.col("n_nationkey").cast("bigint").alias("key_id")
    )
    return c.unionByName(s).orderBy("side", "key_id")


@query(
    "ddl_partition_evolution",
    oracle="""
SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(event_id) AS BIGINT) AS id_sum
FROM events
WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
GROUP BY 1 ORDER BY 1
""",
    category="ddl",
)
def ddl_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg partition SPEC EVOLUTION: the base snapshot is
    day-partitioned, the later append switches the spec to a
    user_id-bucket transform — a pure metadata decision, no rewrite —
    and scan() prunes each layer under the spec its files were written
    with (time filters skip base partitions via day dirs and the
    bucket layer's files via footer stats). The oracle is the same
    daily rollup computed directly on the events table."""
    from walden_spark.timetravel import VersionedTable

    t = Tables(spark, sf_dir)
    ev = t.events.select("event_id", "ts", "user_id")
    path = tempfile.mkdtemp(prefix="walden_specevo_") + "/events_pe"
    vt = VersionedTable(spark, path)
    vt.write(ev.filter("ts < TIMESTAMP '2024-01-16 00:00:00'"), partition_day="ts")
    vt.append(
        ev.filter("ts >= TIMESTAMP '2024-01-16 00:00:00'"),
        partition_bucket=("user_id", 8),
    )
    return (
        vt.scan(filters=[("ts", ">=", "2024-01-20 00:00:00")])
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("event_id").cast("bigint").alias("id_sum"),
        )
        .orderBy("day")
    )


@query(
    "ddl_export_snapshot",
    oracle="""
SELECT CAST(n_nationkey AS BIGINT) AS key_id, n_name AS nation_name
FROM nation WHERE n_regionkey <> 2
ORDER BY key_id
""",
    category="ddl",
)
def ddl_export_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External-reader export path (VERDICT r06 'Next' #3): the
    versioned table's resolved state — THROUGH a merge-on-read delete
    stack and a column rename — materialized as plain parquet any
    engine reads without this repo's code. The returned frame is
    spark.read.parquet over the exported directory (never the engine's
    own read()), so a value match against the oracle proves the
    exported bytes carry the fully resolved snapshot; the companion
    pytest additionally has DuckDB read the same files
    (tests/test_timetravel.py::test_export_snapshot_duckdb_reads)."""
    from walden_spark.timetravel import VersionedTable

    t = Tables(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="walden_export_")
    vt = VersionedTable(spark, f"{root}/src")
    vt.write(t.nation.select("n_nationkey", "n_name", "n_regionkey"))
    vt.delete_where("n_regionkey = 2", mode="mor")  # MoR layer to resolve
    vt.rename_column("n_name", "nation_name")       # rename to carry through
    info = vt.export_snapshot(f"{root}/exported")
    assert info["version"] == 2
    out = spark.read.parquet(f"{root}/exported")    # plain files, no engine
    return out.select(
        F.col("n_nationkey").cast("bigint").alias("key_id"), "nation_name"
    ).orderBy("key_id")


@query(
    "ddl_add_files",
    oracle="""
SELECT CAST(n_nationkey AS BIGINT) AS key_id, n_name,
       CAST(n_regionkey AS BIGINT) AS region_id
FROM nation WHERE n_regionkey <> 0
UNION ALL
SELECT 999, 'ADDED', 9
ORDER BY key_id
""",
    category="ddl",
)
def ddl_add_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy convert-in-place (Iceberg add_files / Delta CONVERT TO
    DELTA — the import direction of interop; export_snapshot is the
    export): an EXISTING parquet directory becomes the table's initial
    snapshot with no bytes copied, a second external dir lands as an
    append-shaped layer, and row-level DML then runs over the external
    data. The output is the final state; the oracle recomputes it from
    the nation fixture directly."""
    from walden_spark.timetravel import VersionedTable

    t = Tables(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="walden_addfiles_")
    lake = f"{root}/lake"
    t.nation.select("n_nationkey", "n_name", "n_regionkey").write.parquet(lake)
    extra = f"{root}/extra"
    spark.createDataFrame(
        [(999, "ADDED", 9)], "n_nationkey int, n_name string, n_regionkey int"
    ).write.parquet(extra)
    vt = VersionedTable(spark, f"{root}/tbl")
    vt.add_files(lake)                              # v0: convert in place
    vt.add_files(extra)                             # v1: incremental add
    vt.delete_where("n_regionkey = 0", mode="mor")  # v2: DML over externals
    return vt.read(branch="main").select(
        F.col("n_nationkey").cast("bigint").alias("key_id"),
        "n_name",
        F.col("n_regionkey").cast("bigint").alias("region_id"),
    ).orderBy("key_id")


@query(
    "ddl_zorder_cluster",
    oracle="""
SELECT event_id, user_id, floor(value * 1000000.0) / 1000000.0 AS value
FROM events WHERE user_id = 7 AND value >= 50.0 ORDER BY event_id
""",
    category="ddl",
)
def ddl_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER served end-to-end (r08): ingest events shuffled
    (worst-case layout), rewrite with rewrite_zorder(user_id, value) —
    the existing quantile-bucketed Morton rewrite,
    timetravel.py:rewrite_zorder — then serve a BOTH-dimension
    predicate through scan()'s footer-stat file pruning. Content is
    layout-invariant, so the oracle is the plain selection; the
    file-skipping win itself is pinned by
    test_zorder_prunes_files_on_both_dims (snapshot scan path) and
    test_zorder_rewrite_skips_on_every_dimension (row-group path)."""
    from walden_spark.timetravel import VersionedTable

    ev = (
        Tables(spark, sf_dir)
        .events.select("event_id", "user_id", "value")
        .orderBy(F.rand(7))
    )
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="walden_zorder_") + "/t")
    vt.write(ev.repartition(8))
    vt.rewrite_zorder(["user_id", "value"], n_files=16)
    return (
        vt.scan(filters=[("user_id", "=", 7), ("value", ">=", 50.0)])
        .select(
            "event_id",
            "user_id",
            (F.floor(F.col("value") * 1000000.0) / 1000000.0).alias("value"),
        )
        .orderBy("event_id")
    )


@query(
    "ddl_mv_rollup_rewrite",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n,
       floor(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) * 1000000.0) / 1000000.0 AS avg_qty,
       CAST(MIN(l_quantity) AS DOUBLE) AS min_qty
FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
""",
    category="ddl",
)
def ddl_mv_rollup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view ROLLUP SERVING (r08) — the Trino/Calcite MV
    query-rewrite idea in its declarative form (catalog.py
    create_agg_mv/serve_agg): an agg MV over lineitem keyed by
    (returnflag, linestatus, linenumber) answers the COARSER
    (returnflag, linestatus) aggregate by re-aggregation — SUM/COUNT
    re-sum, MIN re-mins, AVG derives as SUM/COUNT — never rescanning
    the base. The oracle aggregates the base directly: rollup serving
    must be value-identical (decimal sums make two-level == one-level
    exactly). The serving-path evidence (the plan reads MV files, not
    the base) is pinned by test_agg_mv_rollup_serves_from_mv."""
    from walden_spark.catalog import Catalog

    cat = Catalog(spark)
    t = Tables(spark, sf_dir)
    t.lineitem.createOrReplaceTempView("mv_li_base")
    spark.sql("DROP TABLE IF EXISTS walden_mv_li_rollup")
    dec_q = "CAST(l_quantity AS DECIMAL(18,2))"
    cat.create_agg_mv(
        "walden_mv_li_rollup",
        "mv_li_base",
        keys=["l_returnflag", "l_linestatus", "l_linenumber"],
        aggs={
            "sum_q": ("sum", dec_q),
            "n_rows": ("count", "*"),
            "min_q": ("min", "l_quantity"),
        },
    )
    served = cat.serve_agg(
        "mv_li_base",
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("sum", dec_q),
            "n": ("count", "*"),
            "avg_qty": ("avg", dec_q),
            "min_qty": ("min", "l_quantity"),
        },
    )
    out = served.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        "n",
        (F.floor(F.col("avg_qty") * 1000000.0) / 1000000.0).alias("avg_qty"),
        F.col("min_qty").cast("double").alias("min_qty"),
    ).orderBy("l_returnflag", "l_linestatus")
    rows = out.collect()
    spark.sql("DROP TABLE walden_mv_li_rollup")
    return spark.createDataFrame(rows, out.schema)


@query(
    "ddl_manifest_compaction",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey,
       CAST(7 AS BIGINT) AS zone, 'ref' AS origin
FROM nation
UNION ALL
SELECT n_nationkey + 100, 'X_' || n_name, n_regionkey,
       CAST(n_nationkey AS BIGINT) AS zone, 'new' AS origin
FROM nation WHERE n_regionkey = 0
ORDER BY n_nationkey
""",
    category="ddl",
)
def ddl_manifest_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest compaction maintenance op (r14, VERDICT r13 #4 — the
    depth probe's one growth term): a versioned table takes a DDL
    storm (ADD/WIDEN/RENAME/DROP COLUMN, all metadata-only layers),
    then ``compact_manifests()`` collapses the run into ONE
    schema_project summary whose parent skips it — the Iceberg
    rewrite_manifests analog (the reference's tables live on
    Nessie-versioned Iceberg manifests, tf/main.tf:93-98). The read
    after compaction must equal the layer-by-layer replay, appends
    land on the compacted head, and the oracle recomputes the final
    frame from the fixture directly."""
    import shutil as _sh
    import tempfile as _tf

    from walden_spark.timetravel import VersionedTable

    t = Tables(spark, sf_dir)
    loc = _tf.mkdtemp(prefix="walden_mc_")
    try:
        vt = VersionedTable(spark, f"{loc}/nation_evo")
        vt.write(t.nation.select("n_nationkey", "n_name", "n_regionkey"))
        vt.add_column("zone", "int", default=7)
        vt.add_column("tmp", "int")
        vt.widen_column("zone", "bigint")
        vt.add_column("origin", "string", default="ref")
        vt.drop_column("tmp")
        v = vt.compact_manifests()
        assert v is not None, "schema run must compact"
        # the summary must have re-rooted the replay chain at the base
        head_m = {m["version"]: m for m in vt._manifests()}[vt.head()]
        assert head_m["parent"] == 0 and "schema_project" in head_m
        vt.append(
            t.nation.filter(F.col("n_regionkey") == 0).select(
                (F.col("n_nationkey") + 100).alias("n_nationkey"),
                F.concat(F.lit("X_"), F.col("n_name")).alias("n_name"),
                "n_regionkey",
                F.col("n_nationkey").cast("bigint").alias("zone"),
                F.lit("new").alias("origin"),
            )
        )
        out = vt.read().orderBy("n_nationkey")
        rows = out.collect()
        schema = out.schema
    finally:
        _sh.rmtree(loc, ignore_errors=True)
    return spark.createDataFrame(rows, schema)
