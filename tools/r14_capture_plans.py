"""Capture .explain('formatted') for every bench headline query →
plans/r14/<query>_<tag>.txt  (tag = before|after, argv[1]).

Optimization-round evidence (guide §1): the judge diffs these files
against the code's plan claims. Uses sf0.1 (the bench scale) so the
PushedFilters/statistics in the dump match the benched plans.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import bench
    from walden_spark.registry import load_all
    from walden_spark.session import get_spark

    registry = load_all()
    names = [n for n in bench.HEADLINE if n in registry]
    for pref in bench.EXTRA_PREFIXES:
        names += [
            n for n in sorted(registry) if n.startswith(pref) and n not in names
        ]

    spark = get_spark(app_name="r14_plan_capture", master="local[4]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
    )
    os.makedirs(out_dir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        df = registry[name].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(mode)
        with open(os.path.join(out_dir, f"{name}_{TAG}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: wrote {name}_{TAG}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
