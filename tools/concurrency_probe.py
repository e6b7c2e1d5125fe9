"""BI-concurrency probe: N simultaneous clients against one engine —
the serving scenario the reference's Trino handles for Superset
dashboards. Runs the same query mix sequentially and then from N
threads (each thread in its own FAIR pool), printing one JSON line
with both wall-clocks and the speedup. Spark's scheduler multiplexes
stages from concurrent jobs across the cores, so concurrent wall-clock
should approach max(query) not sum(query).

Usage: python tools/concurrency_probe.py [--clients 8] [--sf-dir ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MIX = ["tpch_q1", "tpch_q3", "tpch_q6", "tpch_q13", "win_ranking", "agg_basic", "tpch_q10", "tpch_q14"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from walden_spark.registry import load_all
    from walden_spark.session import get_spark

    spark = get_spark(
        app_name="walden_concurrency_probe",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        fair_scheduling=True,
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    queries = [MIX[i % len(MIX)] for i in range(args.clients)]

    def run_one(i: int) -> float:
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", f"client_{i}")
        t0 = time.perf_counter()
        reg[queries[i]].fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for i in range(len(queries)):  # warm (codegen/JIT)
        run_one(i)

    t0 = time.perf_counter()
    seq_times = [run_one(i) for i in range(len(queries))]
    sequential = time.perf_counter() - t0

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=args.clients) as ex:
        conc_times = list(ex.map(run_one, range(len(queries))))
    concurrent = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "clients": args.clients,
                "mix": queries,
                "sequential_sec": round(sequential, 3),
                "concurrent_sec": round(concurrent, 3),
                "speedup": round(sequential / concurrent, 2),
                "max_single_sec": round(max(seq_times), 3),
                "slowest_concurrent_client_sec": round(max(conc_times), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
