"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The per-query number is wall-clock seconds for plan + execution with a
terminal count-style action (driver does not collect result rows).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline set: the flagship relational queries + one of each north-star
# operator family, exercising scan/filter pushdown, big joins, window
# functions, and the LSH/text paths.
HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q8",
    "tpch_q10",
    "tpch_q13",
    "tpch_q18",
]
# ---------------------------------------------------------------------------
# PINNED CALIBRATION QUERIES (VERDICT r08 #1) — DO NOT EDIT.
#
# Three frozen probes defined HERE (not in the evolving registry) using
# only pyspark builtins, so their physical plans are byte-stable across
# rounds regardless of engine changes. They run interleaved with the
# headline sweep, sampling the same host conditions, and every headline
# number is additionally reported as a RATIO to the calibration total.
# Comparing ratios round-over-round cancels host drift (three straight
# rounds burned effort adjudicating 10-40% absolute swings that were
# pure environment noise — BENCH_NOTES.md).
# ---------------------------------------------------------------------------
def _cal_scan_agg(spark, sf_dir):
    # scan + hash-agg: parquet read bandwidth and partial aggregation
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("s"),
            F.count(F.lit(1)).alias("n"),
            F.avg("l_extendedprice").alias("a"),
        )
    )


def _cal_shuffle_join(spark, sf_dir):
    # fact-fact shuffle join: exchange + sort-merge machinery
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("l_extendedprice").alias("rev"))
    )


def _cal_cpu_hash(spark, sf_dir):
    # CPU-bound codegen: wide hashing inside whole-stage codegen
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            F.sha2(
                F.concat_ws("|", "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"),
                256,
            ).alias("h")
        )
        .agg(F.count(F.when(F.substring("h", 1, 1) == "0", 1)).alias("n"))
    )


CALIBRATION = {
    "cal_scan_agg": _cal_scan_agg,
    "cal_shuffle_join": _cal_shuffle_join,
    "cal_cpu_hash": _cal_cpu_hash,
}

# Extended set appended when the operators land (kept in registry order).
EXTRA_PREFIXES = (
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "knn_brute_force",
    "knn_lsh_bucketed",
    "text_quality",
    "udf_pandas_scalar",
    "events_tumbling",
    "events_hypertable_rollup",
    "range_join_binned",
    "skew_salted_agg",
    "win_ranking",
)


def main_sf1() -> None:
    """`python bench.py --sf1` — the standing scale gate (VERDICT r07
    #7): drive the sf1-equivalent headline subset (facts ×10, built
    once under /tmp/walden_sf1 by tools/sf1_probe.build) and print ONE
    JSON line of per-query floors. Recorded in BENCH_NOTES.md each
    round so scale regressions surface without a judge asking; the
    pass bar is every floor sub-linear (<10×) vs the same query's
    sf0.1 number."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    import sf1_probe

    from walden_spark.registry import load_all
    from walden_spark.session import get_spark

    spark = get_spark(
        app_name="walden_bench_sf1", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    if "--rebuild" in sys.argv or not os.path.isdir(
        f"{sf1_probe.DST}/lineitem.parquet"
    ):
        sf1_probe.build(spark)
    registry = load_all()
    floors: dict[str, float] = {}
    # The pinned calibration probes ride the sf1 sweep too (reading the
    # UNSCALED sf0.1 inputs, so their work is byte-stable like the main
    # bench) — sf1 floors then carry host-independent ratios and the
    # sub-linearity trend survives host drift (VERDICT r09 #8).
    sweep = list(sf1_probe.QUERIES) + list(CALIBRATION)
    for name in sweep:
        best = None
        for _ in range(sf1_probe.REPS):
            t0 = time.perf_counter()
            fn = CALIBRATION.get(name) or registry[name].fn
            sf = SF_DIR if name in CALIBRATION else sf1_probe.DST
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        floors[name] = round(best, 3)
    cal_total = sum(floors.pop(n) for n in CALIBRATION)
    print(
        json.dumps(
            {
                "metric": "sf1_equivalent_headline_floors",
                "value": round(sum(floors.values()), 3),
                "unit": "sec",
                "queries": floors,
                "calibration_total": round(cal_total, 3),
                "ratio_to_calibration": {
                    n: round(t / cal_total, 3) for n, t in floors.items()
                },
                "sf": "sf1-equivalent (facts x10 over sf0.1)",
                "notes": "min of 3 runs per query; compare per-query vs the "
                "sf0.1 line — sub-linear (<10x) is the pass bar; calibration "
                "probes read the unscaled sf0.1 inputs, so ratios compare "
                "across rounds and hosts",
            }
        )
    )
    spark.stop()


def main() -> None:
    from walden_spark.registry import load_all
    from walden_spark.session import get_spark

    registry = load_all()
    names = [n for n in HEADLINE if n in registry]
    for pref in EXTRA_PREFIXES:
        names += [n for n in sorted(registry) if n.startswith(pref) and n not in names]

    spark = get_spark(app_name="walden_bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)

    def _run(name):
        fn = CALIBRATION.get(name) or registry[name].fn
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    sweep = names + list(CALIBRATION)

    # Steady-state methodology: one untimed warm-up run per query (JVM
    # JIT + whole-stage-codegen compilation are one-time costs a long-
    # running engine amortizes), then two timed runs keeping the best —
    # GC pauses in a shared JVM otherwise add 10-30% run-to-run noise.
    for name in sweep:
        _run(name)

    # Three interleaved timed rounds (full sweep per round, not 3× per
    # query back-to-back) keeping per-query best: interleaving spreads
    # GC/compaction pauses across queries instead of pinning them to
    # whichever query they land under, and the min over 3 is a
    # stable steady-state estimate (r03's +9.8% drift was uniform
    # environment noise — VERDICT r03 perf section). The pinned
    # CALIBRATION probes ride the same rounds so they sample the same
    # host conditions as the queries they normalize.
    runs: dict[str, list[float]] = {n: [] for n in sweep}
    for _ in range(3):
        for name in sweep:
            t0 = time.perf_counter()
            # force full execution without driver-side collection of data
            _run(name)
            runs[name].append(time.perf_counter() - t0)

    timings = {n: round(min(ts), 3) for n, ts in runs.items() if n in names}
    calibration = {n: round(min(ts), 3) for n, ts in runs.items() if n in CALIBRATION}
    cal_total = sum(calibration.values())
    # host-independent column: each headline number as a ratio to the
    # frozen calibration total — compare THESE round-over-round
    ratios = {n: round(t / cal_total, 3) for n, t in timings.items()}
    # per-query run-to-run spread — the noise floor readers should use
    # before calling a round-over-round delta a regression
    spread_pct = {
        n: round(100.0 * (max(ts) - min(ts)) / min(ts), 1)
        for n, ts in runs.items()
        if n in names
    }
    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    full_payload = {
        "metric": "headline_queries_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
        "timed_rounds": 3,
        "spread_pct": spread_pct,
        "calibration": calibration,
        "calibration_total": round(cal_total, 3),
        # the denominator's OWN noise (r12 attribution sweep: cal_total
        # spread 52% across five identical-code runs — the probes total
        # ~1.3 s, so min-of-3 is jitter-bound). A per-query
        # ratio_to_calibration delta smaller than this is denominator
        # noise, not a query regression; BENCH_NOTES r12 has the full
        # cross-process variance table and the signal rule.
        "calibration_spread_pct": {
            n: round(100.0 * (max(ts) - min(ts)) / min(ts), 1)
            for n, ts in runs.items()
            if n in CALIBRATION
        },
        "ratio_to_calibration": ratios,
        "value_ratio": round(total / cal_total, 3),
        "notes": "value=sum of per-query min over 3 interleaved rounds "
        "(1 untimed warm-up); deltas smaller than spread_pct are noise. "
        "calibration = pinned engine-independent probes (frozen in "
        "bench.py, plans byte-stable across rounds) run interleaved "
        "with the sweep; compare ratio_to_calibration / value_ratio "
        "round-over-round — absolute seconds drift with the host, "
        "ratios do not, but their resolution is bounded by "
        "calibration_spread_pct (cross-process variance is ~2-5x the "
        "in-process spread_pct; see BENCH_NOTES r12)",
    }
    # Full per-query payload: printed for humans AND persisted to a file
    # so no detail is lost if stdout is truncated.
    print(json.dumps(full_payload))
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"),
            "w",
        ) as f:
            json.dump(full_payload, f, indent=1)
    except OSError:
        pass
    # Compact PER-QUERY line (VERDICT r14 #2): the full payload above
    # overflows the driver's ~2.2 KB tail capture, so PERF_r14.json came
    # back with per_query={} / n_common=0 — the driver could not compare
    # queries round-over-round. This line carries ONLY {"queries": ...}
    # (22 queries ≈ 600 B), so tail capture holds it PLUS the final
    # total line below. Additions-only: the full payload line and the
    # final compact total line are unchanged.
    sys.stdout.flush()
    print(json.dumps({"queries": timings}, separators=(",", ":")))
    # FINAL compact line (VERDICT r09 #1): the r09 full payload grew past
    # the driver's ~2.2 KB tail capture and the stored line was cut
    # mid-dict ("parsed": null). The LAST line printed is this <200-byte
    # summary so any tail capture, however short, still machine-parses;
    # per-query detail lives on the previous line and in BENCH_FULL.json.
    sys.stdout.flush()
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "value_ratio": round(total / cal_total, 3),
                "calibration_total": round(cal_total, 3),
                "sf": float(sf) if sf else None,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main_sf1() if "--sf1" in sys.argv else main()
