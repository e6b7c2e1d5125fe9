"""ANN parameter-recipe probe on a CLUSTERED corpus (VERDICT r07 #4).

The registered ANN queries run tiny DEMO parameters (6 planes, 1
table, hamming-1 probes) chosen so the DuckDB oracle stays cheap —
their published recall (0.08-0.34 on uniform-random fixtures,
SCALING.md) is a configuration artifact, not an algorithm ceiling.
This probe measures the recall/cost curve at REAL operating points on
realistic embedding geometry — a mixture of Gaussians (embeddings of
natural corpora cluster; uniform-random vectors are the worst case
for locality methods) — and derives the parameter recipe that reaches
recall@10 >= 0.9, which the operator docstrings now carry.

The algorithms are the operators' own math, vectorized in numpy so a
~100-config sweep finishes in seconds (recall is a property of the
hash family / assignment rule / shortlist size, not of the execution
engine — the Spark operators score the identical candidate sets):

* LSH: sign bits of hyperplane projections -> bucket; candidates =
  union over L tables of the query's bucket plus hamming<=r probe
  buckets; shortlist scored EXACTLY (operators/similarity.py:181,289
  score candidates with exact cosine the same way).
* IVF: nearest of C k-means centroids -> cell; candidates = points in
  the P nearest cells (similarity.py:241 with seed centroids).
* IVF-PQ + rerank: M=8 subspace codebooks (256 codes), ADC shortlist
  of R candidates over probed cells, exact cosine rerank
  (similarity.py:414,532).

Cost column: scanned = mean candidate-set size / corpus size — the
fraction of the corpus touched per query (the 100 TB lever).

    python tools/ann_tuning_probe.py
"""

from __future__ import annotations

import json

import numpy as np

N, DIM, K_CLUSTERS, N_QUERIES, TOP_K = 20_000, 64, 50, 200, 10
SEED = 7
# Per-dim noise sigma: total noise norm ~ NOISE*sqrt(DIM) = 0.48 of the
# unit center norm -> intra-cluster cosine ~0.9, clusters separated but
# overlapping. (A first draft used 0.35 -> noise norm 2.8: the "clusters"
# were noise-dominated, i.e. uniform-random in disguise, and every method
# needed ~50% scans for 0.9 recall - kept in git history as the
# worst-case datapoint.)
NOISE = 0.06


def make_corpus(rng, n=N, n_queries=N_QUERIES):
    centers = rng.standard_normal((K_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, K_CLUSTERS, size=n)
    x = centers[labels] + NOISE * rng.standard_normal((n, DIM))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    qlab = rng.integers(0, K_CLUSTERS, size=n_queries)
    q = centers[qlab] + NOISE * rng.standard_normal((n_queries, DIM))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return x, q


def exact_topk(x, q, k=TOP_K):
    sims = q @ x.T
    return np.argsort(-sims, axis=1)[:, :k]


def recall(truth, cand_lists, x, q, k=TOP_K):
    """Recall@k of 'exact-score the candidate shortlist, keep top k' —
    what every tiered operator does — plus mean scanned fraction."""
    hits, scanned = 0, 0
    for i, cand in enumerate(cand_lists):
        cand = np.asarray(sorted(cand), dtype=np.int64)
        scanned += len(cand)
        if len(cand) == 0:
            continue
        sims = x[cand] @ q[i]
        top = cand[np.argsort(-sims)[:k]]
        hits += len(set(top.tolist()) & set(truth[i].tolist()))
    return hits / (len(cand_lists) * k), scanned / (len(cand_lists) * len(x))


def hamming_probes(bucket: int, bits: int, radius: int):
    probes = [bucket]
    if radius >= 1:
        probes += [bucket ^ (1 << p) for p in range(bits)]
    if radius >= 2:
        probes += [
            bucket ^ (1 << p) ^ (1 << r)
            for p in range(bits)
            for r in range(p + 1, bits)
        ]
    return probes


def lsh_sweep(x, q, truth, rng, out):
    for L in (1, 2, 4, 8):
        planes = [rng.standard_normal((DIM, 16)) for _ in range(L)]
        xbits = [(x @ p) > 0 for p in planes]
        qbits = [(q @ p) > 0 for p in planes]
        for bits in (8, 10, 12, 14, 16):
            pw = 1 << np.arange(bits)
            tables = []
            for t in range(L):
                keys = xbits[t][:, :bits] @ pw
                tbl: dict[int, list[int]] = {}
                for i, kk in enumerate(keys):
                    tbl.setdefault(int(kk), []).append(i)
                tables.append((tbl, qbits[t][:, :bits] @ pw))
            for radius in (0, 1, 2):
                cands = []
                for i in range(len(q)):
                    c: set[int] = set()
                    for tbl, qkeys in tables:
                        for pb in hamming_probes(int(qkeys[i]), bits, radius):
                            c.update(tbl.get(pb, ()))
                    cands.append(c)
                r, s = recall(truth, cands, x, q)
                out.append(
                    {"algo": "lsh", "tables": L, "planes": bits,
                     "hamming_radius": radius, "recall_at_10": round(r, 3),
                     "scanned": round(s, 4)}
                )


def kmeans(x, c, rng, iters=8):
    centers = x[rng.choice(len(x), c, replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ centers.T, axis=1)
        for j in range(c):
            m = x[assign == j]
            if len(m):
                centers[j] = m.mean(axis=0)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    return centers, np.argmax(x @ centers.T, axis=1)


def ivf_sweep(x, q, truth, rng, out):
    for c in (64, 128, 256):
        centers, assign = kmeans(x, c, rng)
        cells = [np.where(assign == j)[0] for j in range(c)]
        order = np.argsort(-(q @ centers.T), axis=1)
        for probes in (1, 2, 4, 8, 16, 32):
            if probes > c:
                continue
            cands = [
                set(np.concatenate([cells[j] for j in order[i, :probes]]).tolist())
                for i in range(len(q))
            ]
            r, s = recall(truth, cands, x, q)
            out.append(
                {"algo": "ivf", "cells": c, "probes": probes,
                 "recall_at_10": round(r, 3), "scanned": round(s, 4)}
            )


def pq_rerank_sweep(x, q, truth, rng, out, m=8, codes=256):
    sub = DIM // m
    books = []
    codes_x = np.empty((len(x), m), dtype=np.int64)
    for j in range(m):
        seg = x[:, j * sub : (j + 1) * sub]
        cb = seg[rng.choice(len(x), codes, replace=False)]
        for _ in range(6):
            a = np.argmin(
                ((seg[:, None, :] - cb[None, :, :]) ** 2).sum(-1), axis=1
            )
            for kk in range(codes):
                mseg = seg[a == kk]
                if len(mseg):
                    cb[kk] = mseg.mean(axis=0)
        books.append(cb)
        codes_x[:, j] = np.argmin(
            ((seg[:, None, :] - cb[None, :, :]) ** 2).sum(-1), axis=1
        )
    centers, assign = kmeans(x, 128, rng)
    cells = [np.where(assign == j)[0] for j in range(128)]
    order = np.argsort(-(q @ centers.T), axis=1)
    for probes in (8, 16):
        for R in (25, 50, 100, 200, 400):
            cands = []
            for i in range(len(q)):
                cand = np.concatenate([cells[j] for j in order[i, :probes]])
                # ADC: distance LUT per subspace, summed over codes
                lut = np.stack(
                    [
                        ((books[j] - q[i, j * sub : (j + 1) * sub]) ** 2).sum(-1)
                        for j in range(m)
                    ]
                )  # (m, codes)
                adc = lut[np.arange(m)[:, None], codes_x[cand].T].sum(axis=0)
                cands.append(set(cand[np.argsort(adc)[:R]].tolist()))
            r, s = recall(truth, cands, x, q)
            out.append(
                {"algo": "ivf_pq_rerank", "cells": 128, "probes": probes,
                 "rerank_R": R, "recall_at_10": round(r, 3),
                 "scanned": round(s, 4)}
            )


def main() -> None:
    rng = np.random.default_rng(SEED)
    x, q = make_corpus(rng)
    truth = exact_topk(x, q)
    out: list[dict] = []
    lsh_sweep(x, q, truth, rng, out)
    ivf_sweep(x, q, truth, rng, out)
    pq_rerank_sweep(x, q, truth, rng, out)
    for row in out:
        print(json.dumps(row))
    good = [r for r in out if r["recall_at_10"] >= 0.9]
    good.sort(key=lambda r: r["scanned"])
    print("\n# cheapest recipes reaching recall@10 >= 0.9:")
    for r in good[:8]:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
