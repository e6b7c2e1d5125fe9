"""TPC-DS differential tests: materialize the generated catalog once,
point Spark and DuckDB at the SAME parquet files, and hash-compare
each ANALYTIC body column by column (the driver can't — its oracle
views cover only the 10 fixture tables; the registry entries it sees
are frozen-digest checks over these same bodies, r10)."""

from __future__ import annotations

import duckdb
import pytest

from walden_spark.queries.tpcds import SF, TPCDS_BODIES, TPCDS_ORACLES
from walden_spark.registry import load_all
from walden_spark.sources.tpcds import TpcdsGen
from tests.oracle_utils import compare_results


@pytest.fixture(scope="module")
def tpcds_env(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tpcds"))
    gen = TpcdsGen(spark, sf=SF, seed=42)
    gen.write(out)
    con = duckdb.connect()
    for name in gen.TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
    # Spark side reads the SAME files (not a re-generation) so both
    # engines see identical bits
    for name in gen.TABLES:
        spark.read.parquet(f"{out}/{name}").createOrReplaceTempView(f"tpcds_{name}")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(TPCDS_ORACLES))
def test_tpcds_differential(spark, tpcds_env, name):
    sdf = TPCDS_BODIES[name](spark, "")  # generator queries ignore sf_dir
    duck = tpcds_env.execute(TPCDS_ORACLES[name])
    ok, msg = compare_results(sdf, duck)
    assert ok, f"{name}: {msg}"


def test_tpcds_registry_digest_matches_frozen(spark):
    """The frozen digest literals each registry entry is hash-checked
    against must equal a live recomputation — the standing witness
    that the pinned values track the deterministic generator."""
    from walden_spark.queries.tpcds import FROZEN_DIGESTS, digest

    assert set(FROZEN_DIGESTS) == set(TPCDS_BODIES)
    reg = load_all()
    for name in sorted(TPCDS_BODIES):
        row = digest(TPCDS_BODIES[name](spark, "")).collect()[0]
        assert (row.n_rows, row.checksum) == FROZEN_DIGESTS[name], name
        assert reg[name].oracle and str(FROZEN_DIGESTS[name][1]) in reg[name].oracle


def test_digest_distinguishes_nulls_and_separators(spark):
    """ADVICE r10 #2: the r10 concat_ws('|') row encoding collided
    ('a', NULL) with (NULL, 'a') and ('a|b', 'c') with ('a', 'b|c').
    The JSON-struct encoding must give every such pair distinct
    checksums, and still be layout-independent (single vs repartitioned
    frame digests equal)."""
    from walden_spark.queries.tpcds import digest

    def chk(rows):
        df = spark.createDataFrame(rows, "a string, b string")
        r = digest(df).collect()[0]
        return (r.n_rows, r.checksum)

    assert chk([("a", None)]) != chk([(None, "a")])
    assert chk([("a|b", "c")]) != chk([("a", "b|c")])
    assert chk([("a", None)]) != chk([("a", "")])  # NULL vs empty string
    df = spark.createDataFrame(
        [(str(i), None if i % 3 == 0 else str(i * 7)) for i in range(200)],
        "a string, b string",
    )
    one = digest(df.coalesce(1)).collect()[0]
    many = digest(df.repartition(13)).collect()[0]
    assert (one.n_rows, one.checksum) == (many.n_rows, many.checksum)


def test_tpcds_datagen_deterministic(spark):
    g1 = TpcdsGen(spark, sf=0.001, seed=42).store_sales().orderBy("ss_ticket_number").limit(50).collect()
    g2 = TpcdsGen(spark, sf=0.001, seed=42).store_sales().orderBy("ss_ticket_number").limit(50).collect()
    assert g1 == g2


def test_tpcds_returns_join_back(spark):
    """Every return references a real ticket and never returns more
    than was bought."""
    from pyspark.sql import functions as F

    g = TpcdsGen(spark, sf=0.001, seed=42)
    joined = g.store_returns().join(
        g.store_sales(), F.col("ss_ticket_number") == F.col("sr_ticket_number"), "left"
    )
    assert joined.filter(F.col("ss_ticket_number").isNull()).count() == 0
    assert joined.filter(F.col("sr_return_quantity") > F.col("ss_quantity")).count() == 0
