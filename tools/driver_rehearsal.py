"""Rehearse the driver's correctness gate under a VANILLA session.

The per-round driver runs DRIVER_WINDOW queries under ITS OWN
SparkSession — not our get_spark() factory — so none of our session
conf (ANSI mode, Arrow, CBO, broadcast threshold, bloom filters) can
be assumed. This script reproduces that environment: a bare builder
with only master/shuffle/UTC set (the confs the driver demonstrably
sets), then runs every DRIVER_WINDOW query against its DuckDB oracle
with the same canonicalization the oracle tests use.

Run before every round ships, after any window rotation:
    python tools/driver_rehearsal.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
SF_DIR = _pos[0] if _pos else "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    from oracle_utils import compare_results
    from walden_spark.registry import DRIVER_WINDOW, load_all

    spark = (
        SparkSession.builder.appName("driver_rehearsal")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    reg = load_all()
    # --all: sweep EVERY oracle-backed registry query, not just the
    # 50-name window — the r08-prep check that queries destined for
    # future windows also hold under the driver's vanilla session
    names = (
        [n for n, q in reg.items() if q.oracle]
        if "--all" in sys.argv
        else list(DRIVER_WINDOW)
    )
    failed = []
    for name in names:
        q = reg[name]
        try:
            df = q.fn(spark, SF_DIR)
            if q.oracle is None:
                n = df.count()
                status = f"rows-only ({n} rows)"
            else:
                ok, msg = compare_results(df, con.sql(q.oracle))
                status = "ok" if ok else f"MISMATCH: {msg}"
                if not ok:
                    failed.append(name)
        except Exception as exc:  # noqa: BLE001 — rehearsal must survive any query error
            status = f"ERROR: {type(exc).__name__}: {str(exc).splitlines()[0][:120]}"
            failed.append(name)
        print(f"{name:36s} {status}")
    print(f"\n{len(names) - len(failed)}/{len(names)} pass under vanilla session")
    if failed:
        print("FAILED:", ", ".join(failed))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
