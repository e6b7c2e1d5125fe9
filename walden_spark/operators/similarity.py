"""Similarity search over `embeddings` (north star, SURVEY §7.1 M4).

Two tiers:
* brute-force cosine top-k — the exact baseline (O(Q·N), fine when the
  query set is small or as a per-bucket kernel);
* hyperplane-LSH bucketed ANN — the scale path: deterministic random
  hyperplanes → sign bits → bucket key; candidates only within the
  probe's bucket, so the join is equi on bucket instead of a cross
  join. An IVF variant (coarse quantizer from seed vectors) covers the
  cluster-probe family.

The hyperplane weights are a fixed integer formula (no RNG), so the
whole ANN pipeline is reproducible in DuckDB and oracle-checked.

Literature (public): random-hyperplane LSH — Charikar (STOC 2002);
IVF coarse quantization — Jégou/Douze/Schmid, "Product quantization
for nearest neighbor search" (TPAMI 2011, the IVF part without PQ);
general LSH — Indyk/Motwani (STOC 1998).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from walden_spark.registry import query
from walden_spark.tables import Tables

N_PLANES = 6
DIM = 64
TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the probe vectors


def _dot(x, y):
    """Sequential-fold dot product (same order as DuckDB list_reduce,
    so doubles match the oracle bit-for-bit). Kept as the fold rather
    than an expanded 64-term expression: the r14 optimization pass
    measured the expanded tree SLOWER end to end — ~2k-node Column
    trees cost more in py4j construction + per-action optimizer walks
    than the interpreted fold costs to evaluate at these row counts."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


_DOT_SQL = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (x, y) -> x + y)"
)

_COS_SQL = (
    f"{_DOT_SQL.format(a='{a}', b='{b}')}"
    f" / sqrt({_DOT_SQL.format(a='{a}', b='{a}')})"
    f" / sqrt({_DOT_SQL.format(a='{b}', b='{b}')})"
)


def _cos(x, y):
    return _dot(x, y) / F.sqrt(_dot(x, x)) / F.sqrt(_dot(y, y))


@query(
    "knn_brute_force",
    oracle=f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
     c AS (SELECT vec_id, embedding FROM embeddings)
SELECT query_id, neighbor_id, floor(cos_sim * 1000000.0) / 1000000.0 AS cos_sim, CAST(rn AS INT) AS rn
FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_COS_SQL.format(a='q.embedding', b='c.embedding')} AS cos_sim,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY {_COS_SQL.format(a='q.embedding', b='c.embedding')} DESC, c.vec_id) AS rn
  FROM q JOIN c ON q.vec_id <> c.vec_id
)
WHERE rn <= {TOP_K}
""",
    category="similarity",
)
def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for a probe set (brute force): the
    probe matrix is broadcast as dense numpy and the corpus scan is a
    single Arrow-batched map — each batch does ONE matmul against all
    probes (C_batch @ Q.T), no corpus shuffle, no per-pair folds. The
    per-query TopK window then ranks the emitted Q·|corpus| pairs.
    Float note: the matmul's 1e-16 drift vs the oracle's sequential
    fold is absorbed by floor-quantization on emitted values and is
    orders below any realistic rank gap between distinct vectors."""
    import numpy as np
    import pandas as pd

    t = Tables(spark, sf_dir)
    e = t.embeddings.select("vec_id", "embedding")
    q_pdf = e.filter(F.col("vec_id") < N_QUERIES).toPandas()
    q_ids = q_pdf["vec_id"].to_numpy()
    Q = np.stack(q_pdf["embedding"].to_numpy()).astype(np.float64)
    qn = np.sqrt((Q * Q).sum(axis=1))
    bc = spark.sparkContext.broadcast((q_ids, Q, qn))

    def score(batches):
        q_ids_, Qm, qn_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf["vec_id"].to_numpy()
            C = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            cn = np.sqrt((C * C).sum(axis=1))
            S = (C @ Qm.T) / cn[:, None] / qn_[None, :]  # |batch| x |probes|
            ci, qi = np.nonzero(c_ids[:, None] != q_ids_[None, :])
            yield pd.DataFrame(
                {"query_id": q_ids_[qi], "neighbor_id": c_ids[ci], "cos_sim": S[ci, qi]}
            )

    scored = e.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        score, schema="query_id long, neighbor_id long, cos_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id", "neighbor_id",
            (F.floor(F.col("cos_sim") * 1000000.0) / 1000000.0).alias("cos_sim"),
            F.col("rn").cast("int").alias("rn"),
        )
    )


# Deterministic hyperplane weights: w[p][j] = ((1 + p*131 + j*17) % 997) / 997 - 0.5
_PLANES_SQL = (
    f"[[((1 + p * 131 + j * 17) % 997) / 997.0 - 0.5 for j in range(0, {DIM})]"
    f" for p in range(0, {N_PLANES})]"
)


def _bucket_expr(emb_col: str) -> F.Column:
    """LSH bucket id: Σ_p (dot(emb, plane_p) > 0 ? 2^p : 0).

    Nested-transform HOF form, kept after an r14 A/B: rewriting the
    plane weights as per-plane Python literals (16 expanded
    when(aggregate(zip_with(emb, lit(ws)))) trees) looked cheaper —
    no per-row rebuild of the constant weight matrix — and indeed won
    a single-select microbench (0.132 s vs 0.142 s), but LOST on the
    full knn_lsh_bucketed query (1.42 s vs 0.96 s min, interleaved
    5-round A/B at sf0.1): the query plans the bucket subtree twice
    (probe + candidate side), and 2×N_PLANES expanded fold trees cost
    more in planning/codegen than the interpreted weight rebuild costs
    to run. Details in OPTIMIZATION_r14.md; measurement wins."""
    plane_weights = F.transform(
        F.sequence(F.lit(0), F.lit(N_PLANES - 1)),
        lambda p: F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda j: ((F.lit(1) + p * 131 + j * 17) % 997) / 997.0 - 0.5,
        ),
    )
    bits = F.transform(
        plane_weights,
        lambda w, p: F.when(
            _dot(F.col(emb_col), w) > 0, F.pow(F.lit(2.0), p.cast("double")).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint")),
    )
    return F.aggregate(bits, F.lit(0).cast("bigint"), lambda acc, v: acc + v)


_BUCKET_SQL = f"""
list_reduce(list_prepend(CAST(0 AS BIGINT),
  [CASE WHEN {_DOT_SQL.format(a='embedding', b=f'planes[p + 1]')} > 0
        THEN CAST(power(2, p) AS BIGINT) ELSE 0 END
   for p in range(0, {N_PLANES})]), (a, b) -> a + b)
"""


@query(
    "knn_lsh_bucketed",
    oracle=f"""
WITH planes_t AS (SELECT {_PLANES_SQL} AS planes),
e AS (
  SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket
  FROM embeddings, planes_t
),
q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM e WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id AS neighbor_id, embedding AS ce, bucket FROM e)
SELECT query_id, neighbor_id, floor(cos_sim * 1000000.0) / 1000000.0 AS cos_sim
FROM (
  SELECT query_id, neighbor_id,
         {_COS_SQL.format(a='qe', b='ce')} AS cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_COS_SQL.format(a='qe', b='ce')} DESC, neighbor_id) AS rn
  FROM q JOIN c USING (bucket)
  WHERE query_id <> neighbor_id
)
WHERE rn <= {TOP_K}
""",
    category="similarity",
)
def knn_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: 6 deterministic planes → 64
    buckets → candidates share the probe's bucket → exact cosine top-k
    within candidates only.

    Scale shape: bucket assignment is a zero-shuffle map; the candidate
    join is equi on bucket (hash join), reducing compared pairs by
    ~2^planes vs brute force. Recall is tunable with multi-probe /
    more tables; determinism makes the oracle reproduce results
    exactly.

    Tuned recipe (tools/ann_tuning_probe.py, clustered 64-d corpus):
    the demo 6-plane/1-table point is for oracle cheapness; production
    runs 8 tables x ~14 planes with hamming-1 multiprobe ->
    recall@10 = 0.94 scanning 2.8% of the corpus (SCALING.md).
    """
    t = Tables(spark, sf_dir)
    e = (
        t.embeddings.repartition(spark.sparkContext.defaultParallelism)
        .select(
            "vec_id",
            "embedding",
            F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
        )
        .withColumn("bucket", _bucket_expr("embedding"))
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"), "bucket",
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"),
        F.col("nrm").alias("cn"), "bucket",
    )
    pairs = q.join(c, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn(
        "cos_sim", _dot(F.col("qe"), F.col("ce")) / F.col("qn") / F.col("cn")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", (F.floor(F.col("cos_sim") * 1000000.0) / 1000000.0).alias("cos_sim"))
    )


@query(
    "ann_ivf_probe",
    oracle=f"""
WITH cent AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id % 100 = 7),
assigned AS (
  SELECT vec_id, cid, cos_sim FROM (
    SELECT e.vec_id, cent.cid,
           {_COS_SQL.format(a='e.embedding', b='cent.ce')} AS cos_sim,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_COS_SQL.format(a='e.embedding', b='cent.ce')} DESC, cent.cid) AS rn
    FROM embeddings e CROSS JOIN cent
  ) WHERE rn = 1
)
SELECT cid, COUNT(*) AS n_members, floor(MIN(cos_sim) * 1000000.0) / 1000000.0 AS min_cos
FROM assigned
GROUP BY cid
""",
    category="similarity",
)
def ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization: fixed seed centroids (every 100th
    vector), assign each vector to its nearest centroid (broadcast
    centroids — map-only), report cluster sizes + worst member
    similarity. The probe stage of an IVF ANN index, built without
    iterative k-means so it stays deterministic.

    Tuned recipe (tools/ann_tuning_probe.py, clustered 64-d corpus):
    cells ~ corpus/target-cell-size with probes ~ cells/32 — 256
    cells x 4 probes -> recall@10 = 0.92 at 1.8% scanned; x 8 probes
    -> 0.999 at 3.2% (SCALING.md)."""
    t = Tables(spark, sf_dir)
    # Norms hoisted out of the fan-out (optimization r14, guide §1.2
    # "don't compute things you throw away"): _cos inside the
    # vector×centroid cross join re-ran the vector's self-dot fold once
    # PER CENTROID (~n/100 times per vector) and the centroid's once
    # per pair. Computing sqrt(dot(x,x)) once per row on each side and
    # dividing by the attributes is the same ops in the same IEEE order
    # — cos_sim stays bit-identical to the oracle — but the dominant
    # stage now folds once per pair instead of three times.
    e = t.embeddings.select(
        "vec_id",
        "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    cent = e.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("cnrm"),
    )
    pairs = e.crossJoin(F.broadcast(cent)).withColumn(
        "cos_sim", _dot(F.col("embedding"), F.col("ce")) / F.col("nrm") / F.col("cnrm")
    )
    # Argmax as max_by instead of a row_number window (r14, guide §2.3
    # "aggregate before you shuffle"): the window shuffled and sorted
    # the FULL vector×centroid fan-out (n_vectors × n_cells rows) by
    # vec_id; max_by partial-aggregates map-side, so each vector's fan-
    # out collapses to one row before the exchange — the shuffle carries
    # n_vectors rows, not n_vectors × n_cells. Identical pick: max of
    # struct(cos_sim, -cid) == ORDER BY cos_sim DESC, cid ASC first row
    # (struct comparison is lexicographic; NaN orders greatest in both
    # forms; cid is unique so full ties cannot occur).
    assigned = (
        pairs.groupBy("vec_id")
        .agg(F.expr("max_by(struct(cid, cos_sim), struct(cos_sim, -cid))").alias("b"))
        .select(F.col("b.cid").alias("cid"), F.col("b.cos_sim").alias("cos_sim"))
    )
    return assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members"),
        (F.floor(F.min("cos_sim") * 1000000.0) / 1000000.0).alias("min_cos"),
    )


@query(
    "knn_lsh_multiprobe",
    oracle=f"""
WITH planes_t AS (SELECT {_PLANES_SQL} AS planes),
e AS (
  SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket
  FROM embeddings, planes_t
),
q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM e WHERE vec_id < {N_QUERIES}),
qp AS (
  SELECT query_id, qe,
         unnest([bucket] || [xor(bucket, CAST(power(2, p) AS BIGINT)) for p in range(0, {N_PLANES})]) AS probe
  FROM q
),
c AS (SELECT vec_id AS neighbor_id, embedding AS ce, bucket FROM e)
SELECT query_id, neighbor_id, floor(cos_sim * 1000000.0) / 1000000.0 AS cos_sim
FROM (
  SELECT query_id, neighbor_id,
         {_COS_SQL.format(a='qe', b='ce')} AS cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_COS_SQL.format(a='qe', b='ce')} DESC, neighbor_id) AS rn
  FROM qp JOIN c ON probe = c.bucket
  WHERE query_id <> neighbor_id
)
WHERE rn <= {TOP_K}
""",
    category="similarity",
)
def knn_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: probe the query's own bucket plus every
    hamming-1 neighbor bucket (7 probes over 6 planes) — the standard
    recall lever that avoids building more hash tables (Lv et al.,
    "Multi-probe LSH", VLDB 2007). A candidate lives in exactly one
    bucket and probes are distinct, so no pair-dedup step is needed;
    the probe explode multiplies only the tiny query side."""
    t = Tables(spark, sf_dir)
    e = (
        t.embeddings.repartition(spark.sparkContext.defaultParallelism)
        .select(
            "vec_id",
            "embedding",
            F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
        )
        .withColumn("bucket", _bucket_expr("embedding"))
    )
    probes = F.array(
        F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(N_PLANES)]
    )
    q = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"),
            F.col("nrm").alias("qn"), F.explode(probes).alias("probe"),
        )
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"),
        F.col("nrm").alias("cn"), "bucket",
    )
    pairs = q.join(c, F.col("probe") == F.col("bucket")).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.withColumn(
        "cos_sim", _dot(F.col("qe"), F.col("ce")) / F.col("qn") / F.col("cn")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id", "neighbor_id",
            (F.floor(F.col("cos_sim") * 1000000.0) / 1000000.0).alias("cos_sim"),
        )
    )


# ---- Product-quantization parameters (mirrored in oracle SQL) ----
# 64-dim vectors split into M=8 subspaces of 8 dims; each subspace
# quantizes to its nearest coarse centroid (seed vectors vec_id%100==7,
# same deterministic codebook rule as ann_ivf_probe). A vector becomes
# an 8-byte code — 32x smaller than 64 floats, which is what lets a
# 100TB embedding corpus fit executor memory as ~3TB of codes.
PQ_M = 8
PQ_SUBDIM = 8  # DIM / PQ_M
# Bounded codebook: the first PQ_MAX_K seed vectors only. The seed rule
# alone (vec_id %% 100 == 7) grows K with the corpus, making encode
# O(n*K) unbounded; production IVF-PQ fixes K (training-set-sized), so
# the deterministic analog is "seeds among the first 100*PQ_MAX_K ids".
PQ_MAX_K = 256

_L2_SQL = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(list_zip({a}, {b}),"
    " p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
    " * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), (x, y) -> x + y)"
)


# ADC ranking core shared by ann_ivf_pq (limit=TOP_K) and
# ann_pq_rerank (limit=PQ_RERANK_R): identical CTE text guarantees the
# two queries rank candidates identically before their final stage.
_PQ_ADC_RANKED_SQL = f"""
WITH cent AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
              WHERE vec_id % 100 = 7 AND vec_id < {PQ_MAX_K * 100}),
sub AS (
  SELECT e.vec_id, r.m, e.embedding[r.m * {PQ_SUBDIM} + 1 : r.m * {PQ_SUBDIM} + {PQ_SUBDIM}] AS sv
  FROM embeddings e, range(0, {PQ_M}) AS r(m)
),
csub AS (
  SELECT cid, r.m, ce[r.m * {PQ_SUBDIM} + 1 : r.m * {PQ_SUBDIM} + {PQ_SUBDIM}] AS cv
  FROM cent, range(0, {PQ_M}) AS r(m)
),
code AS (
  SELECT vec_id, m, cid, cv FROM (
    SELECT s.vec_id, s.m, c.cid, c.cv,
           row_number() OVER (PARTITION BY s.vec_id, s.m
                              ORDER BY {_L2_SQL.format(a='s.sv', b='c.cv')}, c.cid) AS rn
    FROM sub s JOIN csub c ON s.m = c.m
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, m, sv AS qv FROM sub WHERE vec_id < {N_QUERIES}),
adc AS (
  SELECT q.query_id, k.vec_id AS neighbor_id,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list({_DOT_SQL.format(a='q.qv', b='k.cv')} ORDER BY q.m)),
           (x, y) -> x + y) AS adc
  FROM q JOIN code k ON q.m = k.m
  WHERE q.query_id <> k.vec_id
  GROUP BY q.query_id, k.vec_id
)
SELECT query_id, neighbor_id, adc, rn
FROM (
  SELECT query_id, neighbor_id, adc,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc DESC, neighbor_id) AS rn
  FROM adc
)
WHERE rn <= {{limit}}
"""

# exact-rerank survivor count: ADC keeps this many candidates per
# query before the exact-cosine re-rank (the production IVF-PQ shape)
PQ_RERANK_R = 25


@query(
    "ann_ivf_pq",
    oracle=f"""
SELECT query_id, neighbor_id,
       floor(adc * 1000000.0) / 1000000.0 AS adc_score, CAST(rn AS INT) AS rn
FROM ({_PQ_ADC_RANKED_SQL.format(limit=TOP_K)})
""",
    category="similarity",
)
def ann_ivf_pq(spark: SparkSession, sf_dir: str, top_k: int = TOP_K) -> DataFrame:
    """Product-quantization ANN (Jégou/Douze/Schmid, TPAMI 2011): each
    vector is encoded as M=8 sub-centroid ids; query-vs-corpus scoring
    is the asymmetric distance computation (ADC) — one M-entry lookup
    per candidate into a per-query table of dot(query_subvector,
    centroid_subvector), never touching the original corpus floats.

    Scale shape: the codebook (K centroids) and per-query LUTs are a
    tiny broadcast; encoding + scoring is ONE zero-shuffle Arrow map
    over the corpus (each batch: one vectorized distance tensor to
    encode, one LUT gather to score); the only shuffle is the final
    per-query TopK window. The 32x code compression is the point at
    100TB — re-ranking survivors against true floats is knn_brute_force
    composed after this operator. Codebooks come from the same
    deterministic seed rule as ann_ivf_probe (vec_id % 100 == 7), so
    DuckDB replays encode + ADC exactly; the oracle folds ADC terms in
    fixed m-order so equal-code candidates tie bit-identically and fall
    back to the neighbor_id tie-break in both engines.
    """
    import numpy as np
    import pandas as pd

    t = Tables(spark, sf_dir)
    e = t.embeddings.select("vec_id", "embedding")
    cent_pdf = (
        e.filter((F.col("vec_id") % 100 == 7) & (F.col("vec_id") < PQ_MAX_K * 100))
        .toPandas()
        .sort_values("vec_id")
    )
    Csub = (
        np.stack(cent_pdf["embedding"].to_numpy())
        .astype(np.float64)
        .reshape(len(cent_pdf), PQ_M, PQ_SUBDIM)
    )  # (K, M, d)
    q_pdf = e.filter(F.col("vec_id") < N_QUERIES).toPandas().sort_values("vec_id")
    Qsub = (
        np.stack(q_pdf["embedding"].to_numpy())
        .astype(np.float64)
        .reshape(len(q_pdf), PQ_M, PQ_SUBDIM)
    )
    # LUT[qi, m, k] = dot(query qi's m-th subvector, centroid k's m-th)
    LUT = np.einsum("qmd,kmd->qmk", Qsub, Csub)
    q_ids = q_pdf["vec_id"].to_numpy()
    bc = spark.sparkContext.broadcast((q_ids, LUT, Csub))

    def score(batches):
        q_ids_, LUT_, Csub_ = bc.value
        m_idx = np.arange(PQ_M)[:, None]
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            X = (
                np.stack(pdf["embedding"].to_numpy())
                .astype(np.float64)
                .reshape(len(ids), PQ_M, PQ_SUBDIM)
            )
            # encode: d2[n, m, k] = ||X[n,m,:]||^2 - 2 X·C + ||C[k,m,:]||^2
            # via einsum — O(n·M·K) memory instead of the O(n·M·K·d)
            # broadcast-subtraction tensor (which was ~400MB/batch at
            # 50k vectors x 500 centroids and thrashed every executor
            # thread; found by tools/corpus_probe.py). argmin returns
            # the FIRST minimum → lowest cid (cids sorted), the same
            # tie-break as the oracle's ORDER BY l2, cid
            x2 = (X * X).sum(-1)  # (n, M)
            c2 = (Csub_ * Csub_).sum(-1)  # (K, M)
            xc = np.einsum("nmd,kmd->nmk", X, Csub_)  # (n, M, K)
            d2 = x2[:, :, None] - 2.0 * xc + c2.T[None, :, :]
            codes = d2.argmin(-1)  # (n, M)
            out = []
            for qi, qid in enumerate(q_ids_):
                adc = LUT_[qi][m_idx, codes.T].sum(axis=0)  # (n,)
                mask = ids != qid
                out.append(
                    pd.DataFrame(
                        {"query_id": qid, "neighbor_id": ids[mask], "adc": adc[mask]}
                    )
                )
            yield pd.concat(out)

    scored = e.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        score, schema="query_id long, neighbor_id long, adc double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select(
            "query_id",
            "neighbor_id",
            (F.floor(F.col("adc") * 1000000.0) / 1000000.0).alias("adc_score"),
            F.col("rn").cast("int").alias("rn"),
        )
    )


@query(
    "ann_pq_rerank",
    oracle=f"""
WITH surv AS ({_PQ_ADC_RANKED_SQL.format(limit=PQ_RERANK_R)}),
sq AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
       WHERE vec_id < {N_QUERIES})
SELECT query_id, neighbor_id,
       floor(cos_sim * 1000000.0) / 1000000.0 AS cos_sim, CAST(rn2 AS INT) AS rk
FROM (
  SELECT s.query_id, s.neighbor_id,
         {_COS_SQL.format(a='sq.qe', b='ne.embedding')} AS cos_sim,
         row_number() OVER (PARTITION BY s.query_id
                            ORDER BY {_COS_SQL.format(a='sq.qe', b='ne.embedding')} DESC,
                                     s.neighbor_id) AS rn2
  FROM surv s
  JOIN sq ON sq.query_id = s.query_id
  JOIN embeddings ne ON ne.vec_id = s.neighbor_id
) WHERE rn2 <= {TOP_K}
ORDER BY query_id, rk
""",
    category="similarity",
)
def ann_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ + exact re-rank — the PRODUCTION IVF-PQ serving shape the
    recall probe motivates (ADC alone measured recall@5 = 0.06 at
    sf0.1; re-ranked = near-brute): the ADC stage keeps
    PQ_RERANK_R=25 survivors per query from 8-byte codes (the 32×
    memory tier doing the heavy pruning), then ONLY those survivors'
    true float vectors are fetched by id and scored with exact cosine.
    At 100 TB the float fetch is R rows per query — the corpus stays
    in codes; the re-rank join is broadcast-query × id-keyed fetch,
    and the final top-K window is the only shuffle.

    Tuned recipe (tools/ann_tuning_probe.py, clustered 64-d corpus):
    R is the recall lever at constant memory — R ~ 40x k (e.g. R=400
    for top-10) over 128 cells x 8 probes reaches recall@10 = 1.00
    with only 2% of the corpus ever fetched as floats (SCALING.md)."""
    surv = ann_ivf_pq(spark, sf_dir, top_k=PQ_RERANK_R).select(
        "query_id", "neighbor_id"
    )
    t = Tables(spark, sf_dir)
    e = t.embeddings.select("vec_id", "embedding")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    n = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    pairs = surv.join(F.broadcast(q), "query_id").join(n, "neighbor_id")
    scored = pairs.withColumn("cos_sim", _cos(F.col("qe"), F.col("ne")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            (F.floor(F.col("cos_sim") * 1000000.0) / 1000000.0).alias("cos_sim"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("query_id", "rk")
    )


@query(
    "knn_graph",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings)
SELECT vec_id, neighbor_id,
       floor(cos_sim * 1000000.0) / 1000000.0 AS cos_sim,
       CAST(rn AS INT) AS rn
FROM (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         {_COS_SQL.format(a='a.embedding', b='b.embedding')} AS cos_sim,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY {_COS_SQL.format(a='a.embedding', b='b.embedding')} DESC,
                                     b.vec_id) AS rn
  FROM e a JOIN e b ON a.vec_id <> b.vec_id
)
WHERE rn <= 3
""",
    category="similarity",
)
def knn_graph(spark: SparkSession, sf_dir: str, rows_per_block: int = 8192, k: int = 3) -> DataFrame:
    """kNN-GRAPH construction (r09): exact top-k cosine neighbors for
    EVERY vector — the primitive under semantic clustering, label
    propagation, and graph-based dedup, distinct from knn_brute_force
    (neighbors for a small probe set only). Built on the same
    distributed block-pair matmul as dedup_embedding_cosine
    (operators/dedup.py:471): vectors hash into blocks, each (i<=j)
    block pair becomes one numpy tile task, and each tile emits BOTH
    directions' LOCAL top-k (rows of i scored against j and vice
    versa), so the global shuffle carries at most k rows per (vector,
    block) — never the O(n^2) score matrix. A final per-vector window
    over <= k * n_blocks candidates picks the true top-k (local top-k
    per block provably contains the global top-k).

    Exact all-pairs is the oracle-checked tier; at 100 TB the same
    reduce shape runs over LSH/IVF candidate buckets instead of all
    block pairs (similarity.py's bucketed operators). Float note: tile
    matmul drift vs the oracle's sequential fold is absorbed by
    floor-quantization, as in knn_brute_force."""
    import math

    import numpy as np
    import pandas as pd

    from ..tables import fast_row_count

    t = Tables(spark, sf_dir)
    e = t.embeddings.select("vec_id", "embedding")
    n = fast_row_count(sf_dir, "embeddings")
    par_blocks = math.ceil((2 * spark.sparkContext.defaultParallelism) ** 0.5)
    n_blocks = max(
        math.ceil(n / rows_per_block),
        min(par_blocks, math.ceil(n / 64)),
        1,
    )
    blocked = e.withColumn("blk", F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int"))
    pairs = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(n_blocks) if i <= j],
        "bi int, bj int",
    )
    left = blocked.join(F.broadcast(pairs), F.col("blk") == F.col("bi")).select(
        "bi", "bj", "vec_id", "embedding", F.lit("L").alias("role")
    )
    right = blocked.join(
        F.broadcast(pairs.filter(F.col("bi") != F.col("bj"))), F.col("blk") == F.col("bj")
    ).select("bi", "bj", "vec_id", "embedding", F.lit("R").alias("role"))
    fanout = left.unionByName(right)

    empty = pd.DataFrame(
        {
            "vec_id": pd.Series(dtype="int64"),
            "neighbor_id": pd.Series(dtype="int64"),
            "cos_sim": pd.Series(dtype="float64"),
        }
    )

    def tile(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        bi_key, bj_key = key
        lp = pdf[pdf["role"] == "L"]
        rp = lp if bi_key == bj_key else pdf[pdf["role"] == "R"]
        if not len(lp) or not len(rp):
            return empty
        ids_a, ids_b = lp["vec_id"].to_numpy(), rp["vec_id"].to_numpy()
        A = np.stack(lp["embedding"].to_numpy()).astype(np.float64)
        B = np.stack(rp["embedding"].to_numpy()).astype(np.float64)
        S = (A @ B.T) / np.sqrt((A * A).sum(1))[:, None] / np.sqrt((B * B).sum(1))[None, :]
        if bi_key == bj_key:
            np.fill_diagonal(S, -np.inf)  # no self-neighbors
        directions = [(ids_a, ids_b, S)]
        if bi_key != bj_key:  # diagonal tile: both directions identical
            directions.append((ids_b, ids_a, S.T))
        out = []
        for ids_q, ids_c, M in directions:
            kk = min(k, M.shape[1])
            # local top-k per row with a DETERMINISTIC tie-break
            # (ADVICE r09 #5): raw argpartition keeps boundary ties in
            # shuffle-dependent pandas row order, so a tied candidate
            # with the smaller neighbor_id could be dropped inside the
            # tile before the global (cos_sim desc, neighbor_id)
            # window ever sees it — duplicate embeddings made runs
            # diverge. lexsort (last key primary) orders each row by
            # score desc then candidate id asc, matching the global
            # window's order exactly, so per-tile truncation keeps
            # precisely the candidates the global top-k would keep.
            order = np.lexsort(
                (np.broadcast_to(ids_c, M.shape), -M), axis=1
            )[:, :kk]
            rows = np.repeat(np.arange(M.shape[0]), kk)
            cols = order.ravel()
            mask = np.isfinite(M[rows, cols])
            out.append(
                pd.DataFrame(
                    {
                        "vec_id": ids_q[rows[mask]],
                        "neighbor_id": ids_c[cols[mask]],
                        "cos_sim": M[rows[mask], cols[mask]],
                    }
                )
            )
        return pd.concat(out) if out else empty

    cand = fanout.groupBy("bi", "bj").applyInPandas(
        tile, schema="vec_id long, neighbor_id long, cos_sim double"
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "vec_id",
            "neighbor_id",
            (F.floor(F.col("cos_sim") * 1000000.0) / 1000000.0).alias("cos_sim"),
            F.col("rn").cast("int").alias("rn"),
        )
    )
