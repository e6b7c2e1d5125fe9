"""Headline bench under local-cluster (r13; r14 extends it per VERDICT
r13 #5): the FULL 22-query headline set + a MATCH_RECOGNIZE tier
(win_pattern_sql_same_class) + a streaming windowed query
(events_tumbling, already in the 22) on `local-cluster[2,8,4096]` —
two REAL executor JVMs, so every shuffle crosses a process boundary
through the netty transfer service, every broadcast serializes to
remote executors, and Python UDF workers launch on the executors.

r14 also runs the SAME set on `local[16]` (equal core count) in the
same process run, so the multi-JVM overhead ratio is host-drift-free.
Pass bar: no query degrading >2x vs the single-JVM lane.

Purpose: a measured multi-JVM throughput datapoint beside the
single-JVM bench.py numbers (recorded in BENCH_NOTES). Not a
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
REPS = int(os.environ.get("WALDEN_LC_REPS", "2"))


def _headline_queries(reg) -> list[str]:
    import bench

    names = [n for n in bench.HEADLINE if n in reg]
    for pref in bench.EXTRA_PREFIXES:
        names += [n for n in sorted(reg) if n.startswith(pref) and n not in names]
    # beyond the 22: a pattern tier that has never crossed a process
    # boundary (VERDICT r13 #5); events_tumbling (streaming-shaped
    # windowed agg) is already in the 22
    names.append("win_pattern_sql_same_class")
    return names


def _sweep(master: str, confs: dict[str, str], names: list[str]) -> dict[str, float]:
    from pyspark.sql import SparkSession

    from walden_spark.registry import load_all

    b = SparkSession.builder.master(master).appName(f"walden_lc_{master[:12]}")
    for k, v in confs.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    def run(name: str) -> None:
        reg[name].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    for name in names:  # warm-up (JIT + codegen)
        run(name)
    best: dict[str, float] = {}
    for _ in range(REPS):
        for name in names:
            t0 = time.time()
            run(name)
            w = time.time() - t0
            best[name] = min(best.get(name, 1e9), w)
    execs = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
    spark.stop()
    best["__executors_incl_driver"] = execs
    return best


def main() -> None:
    from walden_spark.registry import load_all

    names = _headline_queries(load_all())
    confs = {
        "spark.sql.shuffle.partitions": "16",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
    }
    lc = _sweep(
        "local-cluster[2,8,4096]", {**confs, "spark.executor.memory": "3g"}, names
    )
    sj = _sweep("local[16]", {**confs, "spark.driver.memory": "8g"}, names)
    lc_execs = lc.pop("__executors_incl_driver")
    sj.pop("__executors_incl_driver")
    queries = {
        n: {
            "local_cluster": round(lc[n], 3),
            "local16": round(sj[n], 3),
            "ratio": round(lc[n] / sj[n], 2),
        }
        for n in names
    }
    worst = max(queries.values(), key=lambda q: q["ratio"])
    print(
        json.dumps(
            {
                "metric": "local_cluster_vs_single_jvm_headline",
                "value": round(sum(lc[n] for n in names), 3),
                "unit": "sec",
                "local16_total": round(sum(sj[n] for n in names), 3),
                "total_ratio": round(
                    sum(lc[n] for n in names) / sum(sj[n] for n in names), 2
                ),
                "worst_ratio": worst["ratio"],
                "executors_incl_driver": lc_execs,
                "queries": queries,
                "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
                "notes": f"min of {REPS} rounds after 1 warm-up, both lanes "
                "in one process run; pass bar = no query >2x vs local[16]",
            }
        )
    )


if __name__ == "__main__":
    main()
