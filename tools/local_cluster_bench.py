"""Headline bench under local-cluster (r13 follow-on to the multi-JVM
smoke): the TPC-H headline subset + one operator from each north-star
family, run on `local-cluster[2,8,4096]` — two REAL executor JVMs, so
every shuffle crosses a process boundary through the netty transfer
service and every broadcast serializes to remote executors.

Purpose: a measured multi-JVM throughput datapoint beside the
single-JVM bench.py numbers (recorded in BENCH_NOTES r13). Not a
replacement for bench.py — the driver contract stays local[N].

Usage: SPARK_GRAFT_SF_DIR=... python tools/local_cluster_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q18",
    "dedup_exact", "dedup_minhash_lsh", "knn_brute_force",
    "text_quality_score", "events_hypertable_rollup", "win_ranking",
]


def main() -> None:
    from pyspark.sql import SparkSession

    from walden_spark.registry import load_all

    spark = (
        SparkSession.builder.master("local-cluster[2,8,4096]")
        .appName("walden_lc_bench")
        .config("spark.executor.memory", "3g")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    def run(name: str) -> None:
        reg[name].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    # warm-up (JIT + codegen), then 2 interleaved timed rounds, best
    for name in QUERIES:
        run(name)
    best: dict[str, float] = {}
    for _ in range(2):
        for name in QUERIES:
            t0 = time.time()
            run(name)
            w = time.time() - t0
            best[name] = min(best.get(name, 1e9), w)
    execs = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
    print(
        json.dumps(
            {
                "metric": "local_cluster_headline_wall_clock",
                "value": round(sum(best.values()), 3),
                "unit": "sec",
                "executors_incl_driver": execs,
                "queries": {k: round(v, 3) for k, v in best.items()},
                "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
