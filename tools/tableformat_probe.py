"""Measured probes for the r04 table-format mechanics + heavy hitters.

Backs the SCALING.md claims with numbers the way corpus_probe.py does
for the dedup tier: synthetic data ~200x the sf0.1 bench fixture row
count, wall-clock per operation.

    python tools/tableformat_probe.py

Probes:
1. DELETE commit cost: copy-on-write (rewrites table) vs merge-on-read
   (writes a ~200-byte manifest) on a 20M-row table.
2. Read overhead of a deep MoR stack (10 predicate layers) vs the
   compacted equivalent — the compaction-cadence trade.
3. Frequent items: bounded-memory two-pass heavy_hitters vs plain
   groupBy-count over a high-cardinality key domain (5M distinct).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:58s} {dt:8.2f}s")
    return out, dt


def main() -> None:
    from pyspark.sql import functions as F

    from walden_spark.operators.sketch import heavy_hitters
    from walden_spark.session import get_spark
    from walden_spark.timetravel import VersionedTable

    spark = get_spark(app_name="tableformat_probe", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    N = 20_000_000

    base = spark.range(N).select(
        F.col("id"),
        (F.col("id") % 97).alias("k"),
        (F.rand(42) * 100).alias("v"),
    )

    # -- probe 1: CoW vs MoR delete commit cost --
    cow = VersionedTable(spark, tempfile.mkdtemp(prefix="probe_cow_") + "/t")
    mor = VersionedTable(spark, tempfile.mkdtemp(prefix="probe_mor_") + "/t")
    timed(f"baseline write ({N//1_000_000}M rows)", lambda: cow.write(base))
    mor.write(base)
    _, t_cow = timed("DELETE 1% copy-on-write (full rewrite)",
                     lambda: cow.delete_where("k = 13"))
    _, t_mor = timed("DELETE 1% merge-on-read (manifest-only commit)",
                     lambda: mor.delete_where("k = 13", mode="mor"))
    print(f"  -> MoR commit is {t_cow / t_mor:.0f}x cheaper; read-side equality:",
          cow.read().count() == mor.read().count())

    # -- probe 2: deep MoR stack read cost vs compacted --
    for i in range(9):  # 10 predicate layers total
        mor.delete_where(f"k = {i}", mode="mor")
    _, t_stack = timed("read+agg through 10-layer MoR stack",
                       lambda: mor.read().agg(F.sum("v")).collect())
    mor.compact()
    _, t_flat = timed("read+agg after compact()",
                      lambda: mor.read().agg(F.sum("v")).collect())
    print(f"  -> stack overhead {t_stack / t_flat:.1f}x; compaction resets it")

    # -- probe 4 (r05): delete-file commit + read costs at 20M rows --
    eq = VersionedTable(spark, tempfile.mkdtemp(prefix="probe_eq_") + "/t")
    eq.write(base)
    del_keys = spark.range(0, N, 100).select(F.col("id"))  # 1% of keys
    _, t_eqc = timed("DELETE 1% by equality-delete file (200k key rows)",
                     lambda: eq.delete_keys(del_keys, on=["id"]))
    _, t_eqr = timed("read+agg through equality-delete layer (anti join)",
                     lambda: eq.read().agg(F.sum("v")).collect())
    pos = VersionedTable(spark, tempfile.mkdtemp(prefix="probe_pos_") + "/t")
    pos.write(base)
    _, t_poc = timed("DELETE 1% by position-delete file (commit-time scan)",
                     lambda: pos.delete_positions_where("id % 100 = 0"))
    _, t_por = timed("read+agg through position-delete layer",
                     lambda: pos.read().agg(F.sum("v")).collect())
    _, t_ups = timed("UPSERT 1% batch (single delete+data commit)",
                     lambda: eq.upsert_keys(
                         spark.range(0, N, 100).select(
                             F.col("id"), (F.col("id") % 97).alias("k"),
                             F.lit(-1.0).alias("v")),
                         on=["id"]))
    base_read = VersionedTable(spark, tempfile.mkdtemp(prefix="probe_fl_") + "/t")
    base_read.write(base)
    _, t_flat2 = timed("read+agg flat baseline (no layers)",
                       lambda: base_read.read().agg(F.sum("v")).collect())
    print(f"  -> eq-delete commit {t_cow / t_eqc:.1f}x cheaper than CoW; "
          f"read overhead eq {t_eqr / t_flat2:.2f}x, pos {t_por / t_flat2:.2f}x; "
          f"pos commit pays its scan ({t_poc:.2f}s), upsert commit {t_ups:.2f}s")

    # -- probe 3: heavy hitters vs full groupBy on wide key domain --
    skewed = spark.range(N).select(
        F.when(F.rand(7) < 0.5, (F.col("id") % 3).cast("string"))
        .otherwise(F.concat(F.lit("tail"), (F.col("id") % 5_000_000).cast("string")))
        .alias("key")
    )
    skewed.write.mode("overwrite").parquet(tempfile.gettempdir() + "/probe_keys")
    keys = spark.read.parquet(tempfile.gettempdir() + "/probe_keys")
    _, t_full = timed("exact top via full groupBy (5M distinct keys shuffled)",
                      lambda: keys.groupBy("key").count().orderBy(F.desc("count")).limit(5).collect())
    _, t_hh = timed("heavy_hitters k=8, method=mg (deterministic, Python pass)",
                    lambda: heavy_hitters(keys, "key", k=8).collect())
    _, t_hs = timed("heavy_hitters k=8, method=sample (JVM-only, WHP)",
                    lambda: heavy_hitters(keys, "key", k=8, method="sample").collect())
    print(f"  -> vs full groupBy at 5M distinct: mg {t_full / t_hh:.1f}x, sample {t_full / t_hs:.1f}x")
    spark.stop()


if __name__ == "__main__":
    main()
