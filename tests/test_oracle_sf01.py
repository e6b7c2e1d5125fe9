"""sf0.1 full-suite oracle lane (r13, VERDICT r12 #8).

The standing differential (`tests/test_oracle.py`) runs at
WALDEN_TEST_SF_DIR (default sf0.001); selected queries are separately
rehearsed at sf0.1. This opt-in lane re-runs EVERY oracle-backed
registry query against DuckDB at sf0.1 in one sweep, so scale-
sensitive determinism drift — boundary-hitting float values, ties that
only materialize as data grows, the bug class floor-quantization fixed
— is caught by the repo's own suite before a driver window trips on
it.

Opt-in because of runtime (the whole registry at 100× default test
scale): excluded from `pytest tests/` via pytest.ini's addopts; run

    python -m pytest -m sf01_full tests/test_oracle_sf01.py -q

Reuses the session `spark` fixture (scale is per-query input, not
session config) with its own DuckDB connection over the sf0.1
parquet. Serial-exclusivity note: queries on the maintained bucketed
layouts re-ingest them for sf0.1 on first touch (the documented
contract-mismatch rebuild), so never run this lane concurrently with
another Spark process.
"""

from __future__ import annotations

import pytest

from tests.oracle_utils import compare_results
from walden_spark.registry import load_all

SF01_DIR = "/root/testdata/sf0.1"

REGISTRY = load_all()
WITH_ORACLE = sorted(name for name, q in REGISTRY.items() if q.oracle)


@pytest.fixture(scope="module")
def duck01():
    import duckdb

    con = duckdb.connect()
    for name in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF01_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.sf01_full
@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match_sf01(spark, duck01, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF01_DIR)
    rel = duck01.sql(q.oracle)
    ok, msg = compare_results(sdf, rel, strict_float=True)
    assert ok, f"{name} @ sf0.1: {msg}"
