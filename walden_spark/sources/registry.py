"""Config-driven source registry — the `trino-catalog-extra` analog.

The reference lets users add arbitrary Trino connector catalogs by
dropping properties files into a ConfigMap (reference: README.md:399-413,
tf/variables.tf:250) — new sources are *config, not code*. This module
reproduces that: a catalog is a dict of properties; ``connect`` turns
(catalog, object-name) into a DataFrame via the matching Spark reader.

Supported connector kinds (extensible via ``register_connector``):
* ``parquet`` / ``csv`` / ``json`` — path-based lake catalogs
  (``base_path`` + table name → directory).
* ``jdbc`` — RDBMS federation (Trino's postgresql/mysql connectors);
  predicate pushdown + partitioned parallel reads via the standard
  Spark JDBC options. Needs a JDBC driver jar on the classpath — gated
  with a clear error, none is bundled in this runtime.
"""

from __future__ import annotations

from typing import Callable, Mapping

from pyspark.sql import DataFrame, SparkSession

from walden_spark.sources import files

Connector = Callable[[SparkSession, Mapping[str, str], str], DataFrame]

_CONNECTORS: dict[str, Connector] = {}


def register_connector(kind: str, fn: Connector) -> None:
    _CONNECTORS[kind] = fn


def _path_connector(fmt: str) -> Connector:
    def conn(spark: SparkSession, props: Mapping[str, str], name: str) -> DataFrame:
        base = props["base_path"].rstrip("/")
        schema = props.get(f"schema.{name}")
        reader = {"parquet": files.read_parquet, "csv": files.read_csv, "json": files.read_json}[fmt]
        return reader(spark, f"{base}/{name}", schema=schema)

    return conn


def _jdbc_connector(spark: SparkSession, props: Mapping[str, str], name: str) -> DataFrame:
    r = (
        spark.read.format("jdbc")
        .option("url", props["url"])
        .option("dbtable", name)
    )
    for k in ("user", "password", "driver", "partitionColumn", "lowerBound", "upperBound", "numPartitions", "fetchsize"):
        if k in props:
            r = r.option(k, props[k])
    return r.load()


for _fmt in ("parquet", "csv", "json"):
    register_connector(_fmt, _path_connector(_fmt))
register_connector("jdbc", _jdbc_connector)


class SourceRegistry:
    """Named catalogs of external sources.

    >>> reg = SourceRegistry(spark)
    >>> reg.add_catalog("lake", {"connector": "parquet", "base_path": "/data"})
    >>> df = reg.table("lake", "lineitem.parquet")
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._catalogs: dict[str, Mapping[str, str]] = {}

    def add_catalog(self, name: str, properties: Mapping[str, str]) -> None:
        kind = properties.get("connector")
        if kind not in _CONNECTORS:
            raise ValueError(f"unknown connector {kind!r}; known: {sorted(_CONNECTORS)}")
        self._catalogs[name] = dict(properties)

    def catalogs(self) -> list[str]:
        return sorted(self._catalogs)

    def table(self, catalog: str, name: str) -> DataFrame:
        props = self._catalogs[catalog]
        return _CONNECTORS[props["connector"]](self.spark, props, name)

    def register_view(self, catalog: str, name: str, view_name: str | None = None) -> None:
        """Expose a source table to SQL (`SELECT ... FROM view_name`)."""
        self.table(catalog, name).createOrReplaceTempView(view_name or name.split(".")[0])
