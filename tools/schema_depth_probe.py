"""Schema-evolution depth probe (r13, VERDICT r12 #5).

Each versioned-table DDL commit (add/drop/widen column) is a
metadata-only MoR layer that `_dataframe_for` replays at read time —
per-layer column masks/renames/casts stack in the logical plan. A
table accumulating hundreds of DDL commits therefore pays a per-layer
PLANNING cost on every scan. This probe measures scan wall-clock vs
DDL-layer depth (x10 / x50 / x100 layers over the same data) so the
growth curve is recorded in SCALING.md, and decides whether a
compaction path is needed.

Usage: python tools/schema_depth_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEPTHS = [0, 10, 50, 100]
N_ROWS = 200_000


def main() -> None:
    from walden_spark.session import get_spark
    from walden_spark.timetravel import VersionedTable

    spark = get_spark(
        app_name="schema_depth_probe", master="local[8]", shuffle_partitions=8
    )
    base = tempfile.mkdtemp(prefix="walden_schema_depth_")
    print(f"# rows={N_ROWS}; layers = alternating add_column/widen/append")
    prev_wall = None
    try:
        for depth in DEPTHS:
            path = os.path.join(base, f"t_{depth}")
            t = VersionedTable(spark, path)
            t.write(
                spark.range(N_ROWS).selectExpr(
                    "id", "CAST(id % 97 AS INT) AS k", "CAST(id AS DOUBLE) AS v"
                )
            )
            t0 = time.time()
            for i in range(depth):
                # the common evolution mix: mostly adds, periodic widens
                if i % 10 == 9:
                    t.widen_column(f"c{i - 1}", "bigint")
                else:
                    t.add_column(f"c{i}", "int", default=i)
            ddl_wall = time.time() - t0
            # steady-state scan: one warm-up, then best-of-3 full reads
            df = t.read()
            df.count()
            walls = []
            for _ in range(3):
                s = time.time()
                n = t.read().count()
                walls.append(time.time() - s)
            assert n == N_ROWS
            w = min(walls)
            # filtered scan: exercises the per-layer filter-mask
            # translation (head-name filters withheld below add layers)
            fwalls = []
            for _ in range(3):
                s = time.time()
                nf = t.scan(filters=[("k", "<", 10)]).count()
                fwalls.append(time.time() - s)
            assert nf > 0
            fw = min(fwalls)
            ncols = len(df.columns)
            ratio = f" ({w / prev_wall:.2f}x prev)" if prev_wall else ""
            print(
                f"depth={depth:4d} cols={ncols:4d} ddl_commit_wall={ddl_wall:7.2f}s "
                f"scan_wall={w:6.3f}s filtered_scan_wall={fw:6.3f}s{ratio}"
            )
            prev_wall = w
        # r14 lane (VERDICT r13 #4): the same DDL storm with
        # maybe_compact_manifests after each commit — the per-commit
        # wall must stay FLAT in layer count (it may still track the
        # assembled WIDTH, like the scans above)
        print("# compacted lane: maybe_compact_manifests(max_schema_layers=8)")
        path = os.path.join(base, "t_compacted")
        t = VersionedTable(spark, path)
        t.write(
            spark.range(N_ROWS).selectExpr(
                "id", "CAST(id % 97 AS INT) AS k", "CAST(id AS DOUBLE) AS v"
            )
        )
        depth = DEPTHS[-1]
        walls = []
        for i in range(depth):
            s = time.time()
            if i % 10 == 9:
                t.widen_column(f"c{i - 1}", "bigint")
            else:
                t.add_column(f"c{i}", "int", default=i)
            t.maybe_compact_manifests(max_schema_layers=8)
            walls.append(time.time() - s)
        for lo in range(0, depth, 25):
            seg = walls[lo : lo + 25]
            print(
                f"commits {lo:3d}-{lo + len(seg) - 1:3d}: "
                f"avg_commit_wall={sum(seg) / len(seg):6.3f}s"
            )
        n = t.read().count()
        assert n == N_ROWS
        s = time.time()
        t.read().count()
        print(f"post-storm scan_wall={time.time() - s:6.3f}s "
              f"cols={len(t.read().columns)}")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
