"""Capture .explain('formatted') for NAMED queries →
plans/r15/<query>_<tag>.txt  (tag = before|after).

Optimization-round evidence (guide §1): the judge diffs these files
against the code's plan claims. Uses sf0.1 (the bench scale) so the
PushedFilters/statistics in the dump match the benched plans.

    python tools/r15_capture_plans.py <before|after> name1 name2 ...

Streaming / DDL-lifecycle queries execute commits while BUILDING the
returned frame; the dump is the final returned DataFrame's plan (for
streaming memory-sink queries that is just the sink scan — noted in
OPTIMIZATION_r15.md where it applies).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from walden_spark.registry import load_all
    from walden_spark.session import get_spark

    tag = sys.argv[1]
    names = sys.argv[2:]
    registry = load_all()

    spark = get_spark(
        app_name="r15_plan_capture", master="local[4]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
    )
    os.makedirs(out_dir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = registry[name].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(mode)
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: wrote {name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
