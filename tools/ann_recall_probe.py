"""ANN recall probe: accuracy side of the speed/accuracy trade.

Each ANN tier's registered query returns per-query top-K neighbors;
this probe scores them against the exact brute-force top-K on the
same fixtures — recall@K averaged over the probe queries — so the
SCALING.md claim "recall is a parameter, never nondeterminism"
carries a measured number per tier.

    python tools/ann_recall_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
TIERS = ["knn_lsh_bucketed", "knn_lsh_multiprobe", "ann_ivf_pq", "ann_pq_rerank"]


def topk_sets(df) -> dict:
    out = defaultdict(set)
    cols = df.columns
    qcol = "query_id"
    ncol = "neighbor_id" if "neighbor_id" in cols else cols[1]
    for r in df.collect():
        out[r[qcol]].add(r[ncol])
    return out


def main() -> None:
    from walden_spark.registry import load_all
    from walden_spark.session import get_spark

    spark = get_spark(
        app_name="ann_recall_probe", master="local[8]", shuffle_partitions=8
    )
    reg = load_all()
    truth = topk_sets(reg["knn_brute_force"].fn(spark, SF_DIR))
    k = max(len(v) for v in truth.values())
    report = {}
    for tier in TIERS:
        got = topk_sets(reg[tier].fn(spark, SF_DIR))
        recalls = [
            len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth
        ]
        report[tier] = round(sum(recalls) / len(recalls), 4)
    print(json.dumps({"sf_dir": SF_DIR, "k": k, "recall_at_k": report}))


if __name__ == "__main__":
    main()
