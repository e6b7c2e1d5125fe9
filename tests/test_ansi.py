"""ANSI-mode strictness tests (SURVEY §2.2): the session runs with
spark.sql.ansi.enabled=true for Trino-like semantics — errors where
lax engines return NULL, with try_* as the explicit safe escape."""

from __future__ import annotations

import pytest
from pyspark.errors.exceptions.captured import (
    ArithmeticException,
    NumberFormatException,
)


def test_division_by_zero_errors(spark):
    with pytest.raises(ArithmeticException):
        spark.sql("SELECT 1 / 0").collect()


def test_try_divide_returns_null(spark):
    assert spark.sql("SELECT try_divide(1, 0) AS x").collect()[0].x is None


def test_invalid_cast_errors(spark):
    with pytest.raises(NumberFormatException):
        spark.sql("SELECT CAST('abc' AS INT)").collect()


def test_try_cast_returns_null(spark):
    assert spark.sql("SELECT try_cast('abc' AS INT) AS x").collect()[0].x is None


def test_integer_overflow_errors(spark):
    with pytest.raises(ArithmeticException):
        spark.sql("SELECT CAST(9223372036854775807 AS BIGINT) + 1").collect()


def test_try_sum_overflow_null(spark):
    out = spark.sql(
        "SELECT try_sum(v) AS s FROM VALUES (9223372036854775807), (1) AS t(v)"
    ).collect()[0].s
    assert out is None


def test_array_index_oob_errors(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises((SparkRuntimeException, Exception)):
        spark.sql("SELECT array(1, 2)[5]").collect()


def test_try_element_at_null(spark):
    assert spark.sql("SELECT try_element_at(array(1, 2), 5) AS x").collect()[0].x is None
