"""Scale probe: generate TPC-H at a requested SF with the engine's own
datagen and run the full 22-query suite against it — evidence that the
plans survive data 10-100x beyond the driver fixtures.

Usage:
    python tools/scale_probe.py [--sf 1.0] [--out /tmp/walden_sfN]

Prints one JSON line: {"sf": N, "datagen_sec": ..., "queries": {...},
"total_sec": ...}. (At sf1.0: ~6M lineitem, ~140MB parquet, all 22
queries complete in seconds on local[32]; q18's semi-join side stays
broadcastable because AQE sizes it at runtime — see
walden_spark/session.py driver-memory note.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    out = args.out or f"/tmp/walden_scaleprobe_sf{args.sf}"

    from walden_spark.registry import load_all
    from walden_spark.session import get_spark
    from walden_spark.sources.datagen import TpchGen

    spark = get_spark(
        app_name="walden_scale_probe", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    gen = TpchGen(spark, sf=args.sf, seed=42, splits=args.cpus)
    for name in gen.TABLES:
        # fixture layout: {dir}/{table}.parquet as a directory
        gen.table(name).write.mode("overwrite").parquet(f"{out}/{name}.parquet")
    datagen_sec = round(time.perf_counter() - t0, 2)

    reg = load_all()
    names = sorted(n for n in reg if n.startswith("tpch_"))
    reg[names[0]].fn(spark, out).count()  # warm
    timings = {}
    for n in names:
        t0 = time.perf_counter()
        reg[n].fn(spark, out).write.format("noop").mode("overwrite").save()
        timings[n] = round(time.perf_counter() - t0, 2)

    print(
        json.dumps(
            {
                "sf": args.sf,
                "datagen_sec": datagen_sec,
                "queries": timings,
                "total_sec": round(sum(timings.values()), 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
