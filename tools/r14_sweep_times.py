"""One-pass wall-clock sweep of every registry query at sf0.1 →
/tmp/r14_sweep.json, sorted descending. Finds where optimization-round
attention should go (guide §1: measure first). Single run per query
(ranking signal, not a bench); noop sink; failures recorded, not fatal.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from walden_spark.registry import load_all
    from walden_spark.session import get_spark

    spark = get_spark(app_name="r14_sweep", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    out: dict[str, float] = {}
    errs: dict[str, str] = {}
    for name in sorted(reg):
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        t0 = time.perf_counter()
        try:
            reg[name].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            out[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            errs[name] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:120]}"
        spark.catalog.clearCache()
    ranked = dict(sorted(out.items(), key=lambda kv: -kv[1]))
    with open("/tmp/r14_sweep.json", "w") as f:
        json.dump({"times": ranked, "errors": errs, "total": round(sum(out.values()), 1)}, f, indent=1)
    for n, t in list(ranked.items())[:40]:
        print(f"{t:8.2f}  {n}")
    print(f"total {sum(out.values()):.1f}s over {len(out)} queries; {len(errs)} errors")
    if errs:
        print(json.dumps(errs, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
