"""Full 22-query headline sweep at GENERATED sf1 (VERDICT r13 #1).

Every committed bench number so far is sf0.1 (~600k-row lineitem); the
standing scale probes (tools/sf1_probe.py / sf10_probe.py) replicate
fact rows synthetically, which preserves shuffle volume but not key
cardinality growth in the dims or the documents/embeddings corpora.
This tool closes that gap with REAL generated data:

1. materialize sf0.1 AND sf1 catalogs from the seeded generators
   (TpchGen for the 7 TPC-H tables, SyntheticGen for documents/
   embeddings/events) under /tmp/walden_gen_sf{0.1,1};
2. run the SAME 22-query headline list bench.py uses, interleaved at
   both scales in ONE process (1 untimed warm-up + N timed rounds,
   per-query min) — within-process comparison cancels host drift;
3. print one JSON line with per-query floors at both scales, the
   sf0.1→sf1 ratio, and the scaling exponent log10(t_sf1/t_sf0.1)
   (1.0 = linear in the 10× data growth; the pass bar is exponent
   ≤ 1.0 within noise for scan-bound queries, and a named explanation
   for anything super-linear).

Also reports the fixture-sf0.1 floor per query so generated-vs-fixture
distribution drift is visible (generated sf0.1 should run within noise
of the fixture sf0.1).

    python tools/sf1_full_sweep.py [--rebuild] [--reps N]
    WALDEN_SWEEP_SF=10 python tools/sf1_full_sweep.py   # second decade:
        sf1 -> sf10 (60M-row lineitem), exponents vs the sf1 lane
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE = "/root/testdata/sf0.1"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("WALDEN_SWEEP_REPS", "2"))
# target scale (default 1.0); WALDEN_SWEEP_SF=10 extends the measured
# curve a second decade (60M-row lineitem) — exponents then read
# against the sf1 lane instead of sf0.1
TARGET_SF = float(os.environ.get("WALDEN_SWEEP_SF", "1"))
BASE_SF = TARGET_SF / 10.0
GEN_DIR = {
    f"sf{BASE_SF:g}_gen": f"/tmp/walden_gen_sf{BASE_SF:g}",
    f"sf{TARGET_SF:g}_gen": f"/tmp/walden_gen_sf{TARGET_SF:g}",
}


def build(spark, sf: float, dst: str) -> None:
    from walden_spark.sources.datagen import SyntheticGen, TpchGen
    from walden_spark.sources.files import write_parquet

    for gen in (TpchGen(spark, sf=sf), SyntheticGen(spark, sf=sf)):
        for name in gen.TABLES:
            write_parquet(gen.table(name), f"{dst}/{name}.parquet")


def main() -> None:
    import bench  # repo-root bench.py: the authoritative headline list

    from walden_spark.registry import load_all
    from walden_spark.session import get_spark

    reps = REPS
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])

    registry = load_all()
    names = [n for n in bench.HEADLINE if n in registry]
    for pref in bench.EXTRA_PREFIXES:
        names += [n for n in sorted(registry) if n.startswith(pref) and n not in names]

    spark = get_spark(
        app_name="walden_sf1_full_sweep", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    for sf, dst in zip((BASE_SF, TARGET_SF), GEN_DIR.values()):
        if "--rebuild" in sys.argv or not os.path.isdir(f"{dst}/lineitem.parquet"):
            t0 = time.perf_counter()
            build(spark, sf, dst)
            print(f"# built sf{sf} catalog at {dst} in "
                  f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    lanes = dict(GEN_DIR, fixture=FIXTURE)
    runs: dict[tuple[str, str], list[float]] = {}

    def _run(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm-up round (untimed), then `reps` interleaved timed rounds
    for rnd in range(reps + 1):
        for name in names:
            for lane, sf_dir in lanes.items():
                dt = _run(name, sf_dir)
                if rnd > 0:
                    runs.setdefault((name, lane), []).append(dt)
        print(f"# round {rnd} done", file=sys.stderr)

    base_key, tgt_key = list(GEN_DIR)
    queries = {}
    for name in names:
        t0 = min(runs[(name, base_key)])
        t1 = min(runs[(name, tgt_key)])
        tfx = min(runs[(name, "fixture")])
        queries[name] = {
            base_key: round(t0, 3),
            tgt_key: round(t1, 3),
            "fixture_sf0.1": round(tfx, 3),
            "ratio_10x": round(t1 / t0, 2),
            "exponent": round(math.log10(t1 / t0), 3),
        }
    total0 = sum(q[base_key] for q in queries.values())
    total1 = sum(q[tgt_key] for q in queries.values())
    print(json.dumps({
        "metric": f"sf{TARGET_SF:g}_generated_headline_sweep",
        "value": round(total1, 3),
        "unit": "sec",
        f"{base_key}_total": round(total0, 3),
        "total_ratio_10x": round(total1 / total0, 2),
        "queries": queries,
        "sf": TARGET_SF,
        "notes": f"min of {reps} interleaved rounds after 1 warm-up; data "
        "generated by TpchGen/SyntheticGen seed=42; exponent = "
        "log10(t_target/t_base), 1.0 = linear in 10x rows",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
