"""Spot-check named queries against their DuckDB oracles at one or
more scale factors — the fast loop while restructuring a query in the
optimization round.

    python tools/r14_check.py q1 q2 ... [--sf 0.001,0.01,0.1]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"),
)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    from oracle_utils import compare_results
    from walden_spark.registry import load_all

    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfs = ["0.001", "0.01", "0.1"]
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sfs = a.split("=", 1)[1].split(",")

    spark = (
        SparkSession.builder.appName("r14_check")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    failed = []
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in names:
            q = reg[name]
            try:
                ok, msg = compare_results(q.fn(spark, sf_dir), con.sql(q.oracle))
            except Exception as exc:  # noqa: BLE001
                ok, msg = False, f"{type(exc).__name__}: {str(exc).splitlines()[0][:150]}"
            print(f"sf{sf} {name:36s} {'ok' if ok else 'FAIL: ' + msg}")
            if not ok:
                failed.append((sf, name))
        con.close()
    spark.stop()
    if failed:
        print("FAILED:", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
