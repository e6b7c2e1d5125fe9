"""Sources layer tests: file formats, the config-driven source
registry (trino-catalog-extra analog), and the TPC-H datagen."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from walden_spark.sources import files
from walden_spark.sources.datagen import TpchGen
from walden_spark.sources.registry import SourceRegistry
from walden_spark.tables import load_table


def test_csv_upload_to_table(spark, tmp_path):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    files.write_csv(df, str(tmp_path / "up"))
    files.csv_upload_to_table(spark, str(tmp_path / "up"), "walden_csv_up")
    got = spark.table("walden_csv_up").orderBy("v").collect()
    assert [(r.k, r.v) for r in got] == [("a", 1), ("b", 2)]
    spark.sql("DROP TABLE walden_csv_up")


def test_source_registry_path_catalog(spark, sf_dir):
    reg = SourceRegistry(spark)
    reg.add_catalog("fixtures", {"connector": "parquet", "base_path": sf_dir})
    assert reg.catalogs() == ["fixtures"]
    df = reg.table("fixtures", "nation.parquet")
    assert df.count() == 25
    reg.register_view("fixtures", "region.parquet", "reg_region")
    assert spark.table("reg_region").count() == 5


def test_source_registry_rejects_unknown_connector(spark):
    reg = SourceRegistry(spark)
    with pytest.raises(ValueError, match="unknown connector"):
        reg.add_catalog("bad", {"connector": "nope"})


def test_datagen_schema_matches_fixture(spark, sf_dir):
    """Generated tables must be drop-in for the driver fixtures."""
    gen = TpchGen(spark, sf=0.001)
    for name in gen.TABLES:
        fixture = load_table(spark, sf_dir, name)
        generated = gen.table(name)
        assert dict(generated.dtypes) == dict(fixture.dtypes), name


def test_datagen_deterministic_and_scaled(spark):
    g1 = TpchGen(spark, sf=0.001, seed=42)
    g2 = TpchGen(spark, sf=0.001, seed=42)
    a = g1.customer().orderBy("c_custkey").collect()
    b = g2.customer().orderBy("c_custkey").collect()
    assert a == b
    assert len(a) == 150
    # different seed → different data
    c = TpchGen(spark, sf=0.001, seed=7).customer().orderBy("c_custkey").collect()
    assert a != c
    # lineitem fans out ~4x orders, keys land in range
    li = TpchGen(spark, sf=0.001).lineitem()
    n_orders = 1500
    n_li = li.count()
    assert 1 * n_orders <= n_li <= 7 * n_orders
    mx = li.agg(F.max("l_partkey"), F.max("l_suppkey")).collect()[0]
    assert mx[0] < 200 and mx[1] < 10


def test_datagen_write_idempotent(spark, tmp_path):
    gen = TpchGen(spark, sf=0.001)
    gen.write(str(tmp_path), tables=["region", "nation"])
    gen.write(str(tmp_path), tables=["region", "nation"])  # overwrite, no error
    assert spark.read.parquet(str(tmp_path / "nation")).count() == 25


def test_python_datasource_partition_planning(spark):
    """Spark 4 Python DataSource API: custom connector with real split
    planning — rows generated executor-side, one task per split."""
    from walden_spark.sources.pyds import register_python_sources

    register_python_sources(spark)
    df = (
        spark.read.format("walden_seq")
        .option("n", 10_000).option("partitions", 6).option("seed", 42)
        .load()
    )
    assert df.rdd.getNumPartitions() == 6
    assert df.count() == 10_000
    # deterministic content: same options → same data
    again = (
        spark.read.format("walden_seq")
        .option("n", 10_000).option("partitions", 3).option("seed", 42)
        .load()
    )
    # exact (int/decimal) aggregates: partition count must not change data
    exact = lambda d: tuple(  # noqa: E731
        d.agg(
            F.sum("id"), F.sum("bucket"), F.sum(F.col("value").cast("decimal(12,2)"))
        ).collect()[0]
    )
    assert exact(df) == exact(again)
    # predicate/limit still work through the python reader
    assert df.filter(F.col("bucket") == 7).count() > 0
