"""sf10 tail profile for tpch_q1 / tpch_q8 (VERDICT r14 #8).

The r14 generated-sf10 sweep put q1 at exponent 0.548 and q8 at 0.585
(worst of the relational set, still sub-linear). This probe answers
WHAT dominates at sf10 and whether guide §5/§6 knobs move it:

1. build (or reuse) the generated sf10 TPC-H catalog at
   /tmp/walden_gen_sf10 (TpchGen only — q1/q8 touch no synthetic
   tables; documents/embeddings are skipped to keep the build short);
2. decompose q1: full query vs scan+decode+filter only (the same
   7-column projection noop-written) — splits scan cost from the
   decimal aggregate CPU;
3. decompose q8: full query vs fact-scan-only;
4. A/B runtime knobs, interleaved min-of-REPS in ONE process:
   - spark.sql.files.maxPartitionBytes 128m (default) vs 32m
     (4x more scan tasks — §6 scan parallelism),
   - spark.sql.adaptive.advisoryPartitionSizeInBytes 64m (default)
     vs 16m (more post-shuffle reducers — §5).

    python tools/r15_sf10_tail_probe.py [--rebuild]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DST = "/tmp/walden_gen_sf10"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("WALDEN_PROBE_REPS", "3"))


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    from pyspark.sql import functions as F

    from walden_spark.registry import load_all
    from walden_spark.session import get_spark
    from walden_spark.tables import Tables

    os.environ.setdefault("WALDEN_DRIVER_MEMORY", "48g")
    registry = load_all()
    spark = get_spark(
        app_name="r15_sf10_tail_probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )

    if "--rebuild" in sys.argv or not os.path.isdir(f"{DST}/lineitem.parquet"):
        from walden_spark.sources.datagen import TpchGen
        from walden_spark.sources.files import write_parquet

        t0 = time.perf_counter()
        gen = TpchGen(spark, sf=10.0)
        for name in gen.TABLES:
            write_parquet(gen.table(name), f"{DST}/{name}.parquet")
        print(f"# built sf10 TPC-H catalog in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

    t = Tables(spark, DST)
    q1_scan = t.lineitem.select(
        "l_shipdate", "l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax",
    ).filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    q8_scan = t.lineitem.select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )

    def q1(_s, d):
        return registry["tpch_q1"].fn(spark, d)

    def q8(_s, d):
        return registry["tpch_q8"].fn(spark, d)

    knob_sets = {
        "default": {},
        "scan32m": {"spark.sql.files.maxPartitionBytes": "33554432"},
        "advisory16m": {
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16777216"
        },
    }
    lanes = {
        "q1_full": lambda: registry["tpch_q1"].fn(spark, DST),
        "q1_scan_only": lambda: q1_scan,
        "q8_full": lambda: registry["tpch_q8"].fn(spark, DST),
        "q8_factscan_only": lambda: q8_scan,
    }

    defaults = {k: spark.conf.get(k) for ks in knob_sets.values() for k in ks}
    runs: dict[tuple[str, str], list[float]] = {}
    for rnd in range(REPS + 1):
        for lane, mk in lanes.items():
            for kname, kset in knob_sets.items():
                for k, v in kset.items():
                    spark.conf.set(k, v)
                spark.sparkContext.setJobDescription(f"{lane}:{kname} r{rnd}")
                dt = noop(mk())
                for k in kset:
                    spark.conf.set(k, defaults[k])
                if rnd > 0:
                    runs.setdefault((lane, kname), []).append(dt)
        print(f"# round {rnd} done", file=sys.stderr)

    out = {
        f"{lane}:{kname}": round(min(v), 3) for (lane, kname), v in runs.items()
    }
    # scan share of the full query under defaults
    for q in ("q1", "q8"):
        scan = out.get(f"{q}_scan_only:default") or out.get(
            f"{q}_factscan_only:default"
        )
        full = out[f"{q}_full:default"]
        out[f"{q}_scan_share"] = round(scan / full, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
