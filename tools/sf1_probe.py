"""sf1-equivalent bench probe (VERDICT r06 'Next' #6).

The driver ships only sf{0.001,0.01,0.1} fixtures; this probe scales
the sf0.1 tables 10× (fact tables replicated with key offsets, dims
kept — the shuffle/agg volume is what stresses a plan, and TPC-H fact
rows dominate bytes) into /tmp/walden_sf1 and drives the headline
queries there on local[32], confirming the plans that are clean at
sf0.1 hold an order of magnitude up: shuffle sizes scale linearly, no
driver-side swell, no query >10× its sf0.1 floor.

Replication details (shape-preserving, not TPC-H-spec sf1):
- lineitem/orders: ×10 with o_orderkey/l_orderkey offset per replica,
  so the orders⋈lineitem key relation is preserved and key
  cardinality grows 10× (no artificial hot keys).
- documents: ×10 with doc_id offsets; each replica's text gets a
  replica tag appended so MinHash near-dup structure scales ~linearly
  instead of exploding into 10-deep exact-dup cliques.
- embeddings: ×10 with vec_id offsets (identical vectors across
  replicas — ANN scoring cost is what's probed, ties are fine).
- events/customer/supplier/part/nation/region: copied as-is.

    python tools/sf1_probe.py [--rebuild]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/walden_sf1"
REPLICAS = 10
QUERIES = ["tpch_q1", "tpch_q5", "tpch_q18", "dedup_minhash_lsh", "knn_lsh_bucketed"]
REPS = 3


def build(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    okey_span = (
        spark.read.parquet(f"{SRC}/orders.parquet")
        .agg(F.max("o_orderkey")).collect()[0][0] + 1
    )
    did_span = (
        spark.read.parquet(f"{SRC}/documents.parquet")
        .agg(F.max("doc_id")).collect()[0][0] + 1
    )
    vid_span = (
        spark.read.parquet(f"{SRC}/embeddings.parquet")
        .agg(F.max("vec_id")).collect()[0][0] + 1
    )

    def replicate(table: str, offsets: dict[str, int], perturb_text: bool = False):
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        parts = []
        for k in range(REPLICAS):
            r = df
            for col, span in offsets.items():
                r = r.withColumn(col, F.col(col) + F.lit(k * span))
            if perturb_text and k > 0:
                # tag EVERY word: replica k's shingle set becomes
                # disjoint from replica j's, so the near-dup structure
                # scales linearly (appending one token had left ~all
                # shingles shared — every doc gained 9 artificial
                # near-dups and candidate cliques grew quadratically,
                # a generator artifact, not corpus shape)
                r = r.withColumn(
                    "text",
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(F.lit(f"k{k}"), w),
                        ),
                    ),
                )
            parts.append(r)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(f"{DST}/{table}.parquet")

    replicate("orders", {"o_orderkey": okey_span})
    replicate("lineitem", {"l_orderkey": okey_span})
    replicate("documents", {"doc_id": did_span}, perturb_text=True)
    replicate("embeddings", {"vec_id": vid_span})
    for t in ("customer", "supplier", "part", "nation", "region", "events"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")


def main() -> None:
    from walden_spark.registry import load_all
    from walden_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="sf1_probe", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    if "--rebuild" in sys.argv or not os.path.isdir(f"{DST}/lineitem.parquet"):
        build(spark)
    reg = load_all()
    floors = {}
    for name in QUERIES:
        best = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            reg[name].fn(spark, DST).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        floors[name] = round(best, 3)
        print(name, floors[name], flush=True)
    print(json.dumps({"sf": "sf1-equivalent (facts x10)", "floors": floors}))


if __name__ == "__main__":
    main()
