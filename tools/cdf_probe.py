"""Measured evidence for the change-feed / incremental-view scale
claims (SCALING.md "Late-r05 additions"): at N source rows, compare

1. incremental MV refresh after a small delta  vs  full recompute
2. read_changes() over an append/delete-key delta  vs  exceptAll diff

Run isolated (timings):  python tools/cdf_probe.py [N]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
DELTA = max(N // 1000, 1000)


def main() -> None:
    from pyspark.sql import functions as F

    from walden_spark.session import get_spark
    from walden_spark.timetravel import IncrementalAggView, VersionedTable

    spark = get_spark(app_name="cdf_probe")
    base = tempfile.mkdtemp(prefix="cdf_probe_")
    src = VersionedTable(spark, f"{base}/src")
    df = spark.range(N).select(
        F.col("id"),
        (F.col("id") % 1000).alias("grp"),
        (F.col("id") % 97).alias("amt"),
    )
    t0 = time.perf_counter()
    src.write(df, sort_by=["id"], n_files=32)
    print(f"base write {N} rows: {time.perf_counter() - t0:.2f}s")

    mv = IncrementalAggView(
        spark, src, f"{base}/mv", group_by=["grp"], sums={"total": "amt"}
    )
    t0 = time.perf_counter()
    mv.refresh()
    t_full = time.perf_counter() - t0
    print(f"MV full materialize: {t_full:.2f}s")

    # delta: append + delete a small key range
    src.append(
        spark.range(N, N + DELTA).select(
            F.col("id"),
            (F.col("id") % 1000).alias("grp"),
            (F.col("id") % 97).alias("amt"),
        )
    )
    src.delete_keys(spark.range(DELTA).select("id"), on=["id"])

    t0 = time.perf_counter()
    mv.refresh()
    t_inc = time.perf_counter() - t0
    print(f"MV incremental refresh ({2 * DELTA} changed rows): {t_inc:.2f}s "
          f"({t_full / t_inc:.1f}x faster than full)")

    t0 = time.perf_counter()
    n_ch = src.read_changes(0).count()
    t_cdf = time.perf_counter() - t0
    print(f"read_changes over the delta: {n_ch} rows in {t_cdf:.2f}s")

    # the alternative a consumer WITHOUT a change feed pays: diff two
    # snapshots (what CoW commits force)
    new = src.read()
    old = src.read(version=0)
    t0 = time.perf_counter()
    n_diff = new.exceptAll(old).count() + old.exceptAll(new).count()
    t_diff = time.perf_counter() - t0
    print(f"full exceptAll diff: {n_diff} rows in {t_diff:.2f}s "
          f"({t_diff / t_cdf:.1f}x slower than the feed)")


if __name__ == "__main__":
    main()
