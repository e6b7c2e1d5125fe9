"""Isolated min-of-N probe for named registry queries (r15 optimization
round). Warm-up once, then N timed runs, noop sink, per guide §1.4 —
the stall-resistant evidence the bench's cross-process variance can't
give (BENCH_NOTES r12/r14).

    python tools/r15_probe.py name1 name2 ... [--reps=3] [--sf=0.1]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from walden_spark.registry import load_all
    from walden_spark.session import get_spark

    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    sf = "0.1"
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
    sf_dir = f"/root/testdata/sf{sf}"

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="r15_probe", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"probe:{name}")
        ts = []
        for i in range(reps + 1):  # first run is the untimed warm-up
            t0 = time.perf_counter()
            reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if i:
                ts.append(dt)
        out[name] = {
            "min": round(min(ts), 3),
            "runs": [round(t, 3) for t in ts],
        }
        print(f"{name:40s} min {min(ts):7.3f}  runs {[round(t,3) for t in ts]}")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
