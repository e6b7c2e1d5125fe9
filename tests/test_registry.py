"""Registry/driver-contract hygiene: invariants the round driver
depends on, enforced so future additions can't silently break them."""

from __future__ import annotations

import re

from walden_spark.registry import load_all


def test_every_query_documented_and_categorized():
    reg = load_all()
    for name, q in reg.items():
        assert q.doc, f"{name} has no docstring"
        assert q.category, f"{name} has no category"
        assert re.fullmatch(r"[a-z0-9_]+", name), f"{name} is not a clean identifier"


def test_oracle_sql_targets_fixture_views_only():
    """Driver oracles may only reference the 10 pre-registered fixture
    views (TPC-DS tables live behind rows-only entries by design)."""
    fixture_tables = {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    tpcds_tables = {"date_dim", "item", "store", "store_sales", "store_returns", "web_sales"}
    reg = load_all()
    for name, q in reg.items():
        if not q.oracle:
            continue
        used = set(re.findall(r"\bFROM\s+([a-z_][a-z0-9_]*)", q.oracle, re.IGNORECASE))
        used |= set(re.findall(r"\bJOIN\s+([a-z_][a-z0-9_]*)", q.oracle, re.IGNORECASE))
        bad = (used & tpcds_tables) - fixture_tables
        assert not bad, f"{name} oracle references driver-unavailable tables: {bad}"


def test_driver_window_spans_every_family():
    """The driver hash-checks only the first 50 registry entries; that
    prefix must (a) be exactly the curated DRIVER_WINDOW, (b) cover
    every category in the registry except tpcds (rows-only by design,
    its tables aren't driver views), and (c) be fully oracle-backed so
    every checked row is a hash check, not rows-only."""
    from walden_spark.registry import DRIVER_WINDOW

    reg = load_all()
    assert len(DRIVER_WINDOW) == 50
    first50 = list(reg)[:50]
    assert first50 == list(DRIVER_WINDOW)

    all_cats = {q.category for q in reg.values()}
    window_cats = {reg[n].category for n in DRIVER_WINDOW}
    assert all_cats - window_cats <= {"tpcds"}, (
        f"families missing from driver window: {all_cats - window_cats}"
    )
    no_oracle = [n for n in DRIVER_WINDOW if not reg[n].oracle]
    assert not no_oracle, f"driver-window queries without oracle: {no_oracle}"


def test_driver_window_emits_hashable_types(spark, sf_dir):
    """The driver canonicalizer sort_values a pandas frame of the output;
    cells that are Python lists/dicts make pandas factorize throw
    (r04: fn_array/fn_map ERR'd this way). Nothing in the hash-checked
    window may emit nested (array/map/struct) columns — queries must
    serialize them (concat_ws / to_json) before emission."""
    from pyspark.sql import types as T

    from walden_spark.registry import DRIVER_WINDOW

    reg = load_all()
    bad = {}
    for name in DRIVER_WINDOW:
        schema = reg[name].fn(spark, sf_dir).schema
        nested = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if nested:
            bad[name] = nested
    assert not bad, f"driver-window queries emit nested-typed columns: {bad}"


def test_rotation_queue_cannot_drift():
    """VERDICT r06 #7 / r07 "What's wrong": the rotation queue is
    DERIVED from the recorded CORRECTNESS files
    (tools/rotation_queue.py), never hand-counted, and the guard is
    ROUND-BOUNDARY-AWARE. Three states, keyed by DRIVER_WINDOW_ROUND
    vs the newest CORRECTNESS_r*.json round:

    * window round > newest file round (mid-round, window rotated):
      the window must hold at least min(37, len(queue)) of the
      never-driver-verified oracle-backed names — the r06 tripwire.
    * window round == newest file round (the handover boundary: the
      driver just landed THIS window's results): the window already
      ran; queries added during the round are allowed to be
      un-rotated for exactly one boundary. Require instead that the
      window itself is green in its own round's file — proof the
      rotation happened and worked. (The r07 guard lacked this arm
      and was guaranteed-red at every handover.)
    * window round < newest file round: the window is more than one
      rotation behind — hard fail, rotate now.
    """
    import glob
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from rotation_queue import never_driver_verified

    from walden_spark.registry import DRIVER_WINDOW, DRIVER_WINDOW_ROUND

    repo = os.path.join(os.path.dirname(__file__), "..")
    rounds = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rounds[int(f.rsplit("_r", 1)[1].split(".")[0])] = f
    newest_round = max(rounds)

    assert DRIVER_WINDOW_ROUND >= newest_round, (
        f"DRIVER_WINDOW was cut for round {DRIVER_WINDOW_ROUND} but "
        f"CORRECTNESS_r{newest_round:02d}.json exists — the window is more "
        "than one rotation behind; regenerate via python tools/rotation_queue.py"
    )

    if DRIVER_WINDOW_ROUND > newest_round:
        oracle_backed, _rows_only = never_driver_verified()
        in_window = [n for n in oracle_backed if n in DRIVER_WINDOW]
        assert len(in_window) >= min(37, len(oracle_backed)), (
            f"DRIVER_WINDOW rotates only {len(in_window)} of "
            f"{len(oracle_backed)} never-driver-verified oracle-backed "
            "names; regenerate via python tools/rotation_queue.py"
        )
    else:  # boundary: this window's own results just landed
        data = json.load(open(rounds[newest_round]))
        not_green = [
            n for n in DRIVER_WINDOW
            if not (isinstance(data.get(n), dict) and not data[n].get("err"))
        ]
        assert not not_green, (
            f"window round {DRIVER_WINDOW_ROUND} results landed but these "
            f"window queries aren't green in it: {not_green}"
        )


def test_entry_schema_stable(spark):
    """The driver smoke-checks entry() for a stable schema — two builds
    must agree exactly."""
    import __spark_entry__ as e

    s1 = e.entry(spark).schema
    s2 = e.entry(spark).schema
    assert s1 == s2


def test_queries_and_oracles_consistent():
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in osql.values())
