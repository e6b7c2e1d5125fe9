"""Graph analytics over DataFrame edge lists (north-star extension).

The reference stack serves graph-shaped questions as SQL over Trino
(reference: tf/main.tf:82-114 deploys plain Trino 468 — no graph
engine); the canonical lakehouse idiom is the same one used here:
an edge list as a table and iterative algorithms as a fixed number of
join+aggregate rounds, each of which Catalyst plans like any other
relational query (cf. connected-components in operators/dedup.py).

PageRank arithmetic contract (cross-engine bit-exactness): scores are
BIGINT fixed-point at ``scale`` (default 1e9). Every operation is
integer — ``base = ((100-d)·scale) DIV (100·N)`` and per-edge
contribution ``(d·s·w) DIV (100·W_src)`` — so sums are
order-independent and a DuckDB oracle running the same chained CTEs
emits identical bits (the float formulation would drift by summation
order). Dangling-node mass is NOT redistributed (documented contract;
with it the result stops being expressible as one aggregate per
iteration). Overflow headroom: d·s·w ≤ 85·1e9·w — safe for per-edge
weights to ~1e8 in int64.

Scale shape: the edge list is built map-side + one groupBy; each
iteration is one join of edges to the score table and one groupBy on
dst. Scores are |nodes| rows — broadcast when the node set is small
(event-type graphs, category graphs); for web-scale node sets drop the
broadcast hint and the same plan runs as a shuffle join on src, still
one shuffle per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    node_col: str = "node",
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = 10**9,
    broadcast_scores: bool = True,
) -> DataFrame:
    """Weighted PageRank, ``iterations`` exact-integer power steps.

    ``edges``: (src, dst, weight) rows; ``nodes``: one row per node
    (pass the full node set — isolated and dangling nodes keep the
    teleport base score). Returns ``(node, pr_scaled)`` with
    ``pr_scaled`` the BIGINT fixed-point score at ``scale``.
    """
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("bigint").alias("w"),
    )
    outw = e.groupBy("src").agg(F.sum("w").cast("bigint").alias("tw"))
    # reused every iteration — cut the lineage once (checkpointed blocks
    # are ContextCleaner-freed with the result; see match_pattern note)
    e = e.join(outw, "src").localCheckpoint(eager=True)
    nd = nodes.select(F.col(node_col).alias("node")).localCheckpoint(eager=True)
    n = nd.count()  # bounded driver scalar: |node vocabulary|
    if n == 0:
        return nd.withColumn("pr_scaled", F.lit(0).cast("bigint"))
    base = ((100 - damping_pct) * scale) // (100 * n)
    s = nd.withColumn("s", F.lit(scale // n).cast("bigint"))
    contrib_expr = f"({damping_pct} * s * w) DIV (100 * tw)"
    for _ in range(iterations):
        sc = F.broadcast(s) if broadcast_scores else s
        contrib = e.join(sc, e["src"] == sc["node"]).select(
            F.col("dst"), F.expr(contrib_expr).alias("c")
        )
        agg = contrib.groupBy("dst").agg(F.sum("c").cast("bigint").alias("c"))
        s = nd.join(agg, nd["node"] == agg["dst"], "left").select(
            "node",
            (F.lit(base) + F.coalesce(F.col("c"), F.lit(0)))
            .cast("bigint")
            .alias("s"),
        )
    return s.select("node", F.col("s").alias("pr_scaled"))


def triangle_counts(
    edges: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Per-vertex triangle counts over an undirected simple graph
    (this session — widens the graph family beyond PageRank and the
    connected components in operators/dedup.py).

    ``edges``: one row per undirected edge, endpoints in either order,
    no self-loops, no duplicates. Returns ``(node, triangles)`` — one
    row per node incident to at least one edge; nodes in no triangle
    report 0.

    Algorithm (the standard relational triangle join with DEGREE
    ORIENTATION): orient every edge toward the endpoint higher in the
    total order (degree, node); enumerate wedges by self-joining the
    oriented edges on their shared source with the two targets ordered;
    close each wedge against the oriented edge set. Orientation does
    not change WHICH triangles exist — each is found exactly once, as
    (x, a, b) with x lowest in the order — but it bounds the wedge
    fan-out of any vertex by its oriented out-degree, which degree
    ordering caps near the graph degeneracy (~sqrt(m) for real graphs)
    instead of the raw max degree. That is the difference between a
    hot celebrity vertex exploding the wedge join and the same plan
    running flat at 100 TB: the wedge count is Σ out_deg², minimized
    by pointing edges at the high-degree side.

    Scale shape: degree = one groupBy on node; orientation = two
    broadcast-or-shuffle joins of edges to the degree table; wedges =
    one self-equi-join on the shared source; closure = one equi-join
    on the (lo, hi) edge key; counting = one groupBy on node. Every
    join is equi; nothing is quadratic in a partition beyond the
    oriented fan-out the orientation just bounded."""
    e = edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
            F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("hideg"),
        )
        # three consumers: two wedge sides + the closure probe
        .localCheckpoint(eager=True)
    )
    w1 = o.select(
        F.col("lo").alias("x"), F.col("hi").alias("a"), F.col("hideg").alias("da")
    )
    w2 = o.select(
        F.col("lo").alias("x"), F.col("hi").alias("b"), F.col("hideg").alias("db")
    )
    wedges = w1.join(w2, "x").filter(
        (F.col("da") < F.col("db"))
        | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    )
    closed = wedges.join(
        o.select(F.col("lo").alias("a"), F.col("hi").alias("b")), ["a", "b"]
    )
    corners = (
        closed.select(F.col("x").alias("n"))
        .unionAll(closed.select(F.col("a").alias("n")))
        .unionAll(closed.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("triangles"))
    )
    return (
        deg.select("n")
        .join(corners, "n", "left")
        .select(
            F.col("n").alias("node"),
            F.coalesce(F.col("triangles"), F.lit(0))
            .cast("bigint")
            .alias("triangles"),
        )
    )


def connected_components(
    edges: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Connected components over an undirected edge list via iterative
    min-label propagation (this session — promotes the dedup-cluster
    machinery to a first-class graph operator): every node ends
    labeled with its component's minimum node id.

    The driver loop of join+aggregate rounds converges in O(graph
    diameter) iterations, with ``localCheckpoint()`` truncating the
    lineage between rounds (the iterative-algorithm template — cf.
    label propagation in Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC 2014); each round shuffles one frame
    keyed by node id. Returns ``(node, component)`` for every node
    incident to at least one edge."""
    e = edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    und = (
        e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = und.select("u").distinct().withColumn("label", F.col("u"))
    while True:
        neigh = (
            und.join(
                labels.select(
                    F.col("u").alias("v"), F.col("label").alias("vlabel")
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("vlabel").alias("nlabel"))
        )
        # the changed flag rides the SAME join that builds the new
        # labels (r14, guide §1.2): the old convergence probe re-joined
        # new labels against old ones — a second shuffle join per
        # round; the flag is a byte per row and the probe becomes a
        # plain scan of the checkpointed frame
        new_labels = (
            labels.join(neigh, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("label"), F.coalesce("nlabel", "label")
                ).alias("label"),
                (F.col("nlabel") < F.col("label")).alias("chg"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("chg")).count()
        labels = new_labels.select("u", "label")
        if changed == 0:
            break
    return labels.select(
        F.col("u").alias("node"), F.col("label").alias("component")
    )
