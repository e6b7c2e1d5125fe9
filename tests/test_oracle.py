"""Differential correctness: every registered query with an oracle is run
through Spark AND DuckDB and compared (mirrors the driver's t2 gate)."""

import pytest

from walden_spark.registry import load_all
from tests.oracle_utils import compare_results

REGISTRY = load_all()
WITH_ORACLE = sorted(name for name, q in REGISTRY.items() if q.oracle)
ROWS_ONLY = sorted(name for name, q in REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, duck, sf_dir, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    rel = duck.sql(q.oracle)
    ok, msg = compare_results(sdf, rel, strict_float=True)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    n = sdf.count()
    assert n >= 0
