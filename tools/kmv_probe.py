"""KMV sketch calibration (r08): estimated vs exact Jaccard by K.

dedup_source_overlap's bottom-k estimator has a standard error of
~sqrt(J(1-J)/K); this probe measures it empirically on the fixture
sources so the K knob carries a number, the same way
ann_tuning_probe.py put numbers on the ANN recipes. For each
K ∈ {16, 64, 256} it runs the sketch and the exact Jaccard over the
same source pairs and reports the max and mean absolute error.

    python tools/kmv_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    from walden_spark.operators.dedup import dedup_source_overlap
    from walden_spark.session import get_spark

    spark = get_spark(app_name="kmv_probe", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sources = tuple(f"src{i}" for i in range(10))
    for k in (16, 64, 256):
        rows = dedup_source_overlap(
            spark, SF_DIR, sources=sources, include_exact=True, kmv_k=k
        ).collect()
        errs = [abs(r.est_jaccard - r.exact_jaccard) for r in rows]
        print(
            json.dumps(
                {
                    "k": k,
                    "pairs": len(rows),
                    "mean_abs_err": round(sum(errs) / len(errs), 4),
                    "max_abs_err": round(max(errs), 4),
                    "mean_exact_j": round(
                        sum(r.exact_jaccard for r in rows) / len(rows), 4
                    ),
                }
            )
        )


if __name__ == "__main__":
    main()
