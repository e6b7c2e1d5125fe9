"""Unit tests for operators/graph.py triangle counting — hand-checked
graphs pin per-vertex counts, orientation invariance (endpoints given
in either order), and the zero-triangle / isolated-from-triangles
cases. PageRank is hash-verified by the events_type_pagerank oracle."""

from __future__ import annotations

from walden_spark.operators.graph import triangle_counts


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a int, b int")


def _counts(df):
    return {r.node: r.triangles for r in df.collect()}


def test_single_triangle_plus_tail(spark):
    # 1-2-3 triangle with a pendant edge 3-4: the tail vertex is
    # edge-incident (reported) but in no triangle
    got = _counts(
        triangle_counts(_edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)]))
    )
    assert got == {1: 1, 2: 1, 3: 1, 4: 0}


def test_two_triangles_share_an_edge(spark):
    # K4 minus edge (1,4): triangles {1,2,3} and {2,3,4}
    got = _counts(
        triangle_counts(
            _edges(spark, [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)])
        )
    )
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_k4_and_endpoint_order_irrelevant(spark):
    # complete K4: every vertex is in C(3,2) = 3 triangles; endpoints
    # deliberately listed in mixed order
    pairs = [(2, 1), (1, 3), (4, 1), (3, 2), (2, 4), (4, 3)]
    got = _counts(triangle_counts(_edges(spark, pairs)))
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_free_square(spark):
    got = _counts(
        triangle_counts(_edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)]))
    )
    assert got == {1: 0, 2: 0, 3: 0, 4: 0}


# ---- property test: degree-oriented join vs brute-force enumeration ----

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _brute_triangles(pairs):
    from itertools import combinations

    edges = set()
    nodes = set()
    for a, b in pairs:
        if a != b:
            edges.add((min(a, b), max(a, b)))
            nodes.update((a, b))
    tri = {n: 0 for n in nodes}
    for x, y, z in combinations(sorted(nodes), 3):
        if (
            (x, y) in edges and (y, z) in edges and (x, z) in edges
        ):
            tri[x] += 1
            tri[y] += 1
            tri[z] += 1
    return {n: t for n, t in tri.items()}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=7),
        ),
        min_size=1,
        max_size=16,
    )
)
def test_triangle_counts_match_brute_force(spark, pairs):
    """The degree-oriented wedge join must equal brute-force
    enumeration on random multigraph inputs (self-loops and duplicate
    edges dropped/deduped before the operator, per its contract)."""
    clean = {
        (min(a, b), max(a, b)) for a, b in pairs if a != b
    }
    if not clean:
        return
    got = _counts(triangle_counts(_edges(spark, sorted(clean))))
    assert got == _brute_triangles(sorted(clean))
