"""Corpus scale probe: generate documents+embeddings at a multiple of
the sf0.1 fixture and time the north-star dedup/ANN/text pipelines —
evidence those plans survive 10-100x the bench corpus, same as
scale_probe.py does for TPC-H.

Usage:
    python tools/corpus_probe.py [--docs 50000] [--out /tmp/walden_corpus]

Generation is fully distributed (spark.range + xxhash64-derived
columns, no driver loops) and plants both exact duplicates (every 53rd
doc) and near duplicates (every 37th doc = its predecessor-37 with one
appended word; every 23rd embedding = a jittered copy) so the dedup
operators have real work at every size.

Prints one JSON line: {"docs": N, "datagen_sec": ..., "queries": {...},
"total_sec": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = (
    "the a key agg row scan slow fast table value part hash merge batch "
    "spark line sort window data column join small customer query big "
    "order group stream filter vector"
).split()

PROBE_QUERIES = (
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "text_span_dedup",
    "text_shard_shuffle",
    "text_pretrain_pipeline",
    "text_weighted_sample",
    "knn_lsh_bucketed",
    "ann_ivf_pq",
    "dedup_source_overlap",
)


def generate(spark, out: str, n_docs: int) -> None:
    from pyspark.sql import functions as F

    vocab = F.array(*[F.lit(w) for w in VOCAB])
    ids = spark.range(n_docs).repartition(spark.sparkContext.defaultParallelism)
    # exact dup every 53rd doc, near dup (one appended word) every 37th
    seed = (
        F.when((F.col("id") % 53 == 0) & (F.col("id") >= 53), F.col("id") - 53)
        .when((F.col("id") % 37 == 0) & (F.col("id") >= 37), F.col("id") - 37)
        .otherwise(F.col("id"))
    )
    nw = (F.xxhash64(seed, F.lit(1)) % 21 + 40).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), nw),
        lambda i: F.element_at(vocab, (F.pmod(F.xxhash64(seed, i), F.lit(len(VOCAB))) + 1).cast("int")),
    )
    text = F.concat_ws(" ", words)
    near = (F.col("id") % 37 == 0) & (F.col("id") >= 37) & ~((F.col("id") % 53 == 0) & (F.col("id") >= 53))
    text = F.when(near, F.concat(text, F.lit(" extra"))).otherwise(text)
    docs = ids.select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr")), (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(3)) + 1).cast("int")).alias("lang"),
        F.element_at(F.array(F.lit("web"), F.lit("book"), F.lit("code")), (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(3)) + 1).cast("int")).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("bigint"))
    docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    vids = spark.range(n_docs).repartition(spark.sparkContext.defaultParallelism)
    vseed = F.when((F.col("id") % 23 == 0) & (F.col("id") >= 23), F.col("id") - 23).otherwise(F.col("id"))
    dup = (F.col("id") % 23 == 0) & (F.col("id") >= 23)
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: (
            (F.pmod(F.xxhash64(vseed, j), F.lit(1000)) / 1000.0 - 0.5)
            + F.when(dup, F.pmod(F.xxhash64(F.col("id"), j + 100), F.lit(100)) / 5000.0).otherwise(F.lit(0.0))
        ).cast("float"),
    )
    vids.select(
        F.col("id").alias("vec_id"),
        emb.alias("embedding"),
        (F.pmod(F.xxhash64("id", F.lit(4)), F.lit(10))).cast("int").alias("label"),
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    out = args.out or f"/tmp/walden_corpusprobe_{args.docs}"

    from walden_spark.registry import load_all
    from walden_spark.session import get_spark

    spark = get_spark(
        app_name="walden_corpus_probe", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    generate(spark, out, args.docs)
    datagen_sec = round(time.perf_counter() - t0, 2)

    reg = load_all()
    reg["dedup_exact"].fn(spark, out).count()  # warm
    # production LSH geometry: planes grow with log2(n / target bucket
    # occupancy) — the fixture default (5 planes = 32 buckets) would
    # re-approach O(n^2) candidates at this size (see the operator's
    # docstring); target ~12 vectors per bucket (bucket skew against
    # near-uniform synthetic vectors runs ~30x the mean, so aim low)
    import math

    planes = max(5, int(math.log2(max(args.docs, 1) / 12) + 0.5))
    timings = {}
    total0 = time.perf_counter()
    for n in PROBE_QUERIES:
        t0 = time.perf_counter()
        if n == "dedup_embedding_lsh":
            from walden_spark.operators.dedup import dedup_embedding_lsh

            df = dedup_embedding_lsh(
                spark, out, n_tables=4, n_planes=planes, arrow_verify=True
            )
        elif n == "dedup_source_overlap":
            # sketch-only production shape on this corpus's 3 sources:
            # the exact self-join is the cost the sketch exists to avoid
            from walden_spark.operators.dedup import dedup_source_overlap

            df = dedup_source_overlap(
                spark, out, sources=("web", "book", "code"), include_exact=False
            )
        else:
            df = reg[n].fn(spark, out)
        df.write.format("noop").mode("overwrite").save()
        timings[n] = round(time.perf_counter() - t0, 2)

    print(
        json.dumps(
            {
                "docs": args.docs,
                "datagen_sec": datagen_sec,
                "queries": timings,
                "total_sec": round(time.perf_counter() - total0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
