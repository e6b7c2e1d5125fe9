"""JDBC federation source/sink (SURVEY §2.1 external catalogs).

The reference federates operational stores through Trino connectors
(catalog = connector config); Spark's equivalent surface is the JDBC
data source. Embedded Derby (bundled with Spark for the Hive
metastore) stands in for the remote RDBMS offline — the option
surface (`url`, `dbtable`/`query`, `partitionColumn` bounds) is
identical for Postgres/MySQL, only the URL/driver changes.

Scale shape: a bounded partitioned read issues `numPartitions` range
queries in parallel (one per executor task) — the right way to lift a
dimension table out of an operational store; Spark pushes filters
into the remote WHERE clause (plan shows `PushedFilters: [*...]` —
the `*` marks source-evaluated predicates) so federation doesn't ship
the whole table. Big facts should NOT be federated — land them as
parquet; JDBC is the dims/metadata path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_path: str, create: bool = True) -> str:
    return f"jdbc:derby:{db_path}{';create=true' if create else ''}"


def register_jdbc_catalog(
    spark: SparkSession,
    name: str,
    url: str,
    driver: str = DERBY_DRIVER,
    push_agg: bool = True,
) -> None:
    """Mount a remote RDBMS as a Spark CATALOG (DSv2 JDBCTableCatalog)
    — the full Trino-connector-catalog analog: `spark.table("name.T")`
    plans against the remote table and Spark pushes FILTERS,
    AGGREGATES, GROUP BY, and LIMIT into the remote SQL (plan shows
    `PushedAggregates` / `PushedGroupByExpressions`), so a federated
    `GROUP BY` ships back only group rows, not the table. Catalogs are
    instantiated lazily, so runtime conf registration works."""
    spark.conf.set(
        f"spark.sql.catalog.{name}",
        "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog",
    )
    spark.conf.set(f"spark.sql.catalog.{name}.url", url)
    spark.conf.set(f"spark.sql.catalog.{name}.driver", driver)
    spark.conf.set(f"spark.sql.catalog.{name}.pushDownAggregate", str(push_agg).lower())
    spark.conf.set(f"spark.sql.catalog.{name}.pushDownLimit", "true")


def write_jdbc(
    df: DataFrame, url: str, table: str, driver: str = DERBY_DRIVER,
    mode: str = "error",
) -> None:
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .mode(mode)
        .save()
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str = DERBY_DRIVER,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Read a remote table; with bounds set, the scan becomes
    ``num_partitions`` parallel range queries instead of one serial
    cursor — required for any federated read that isn't tiny."""
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 4))
        )
    return r.load()
