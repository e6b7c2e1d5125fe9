"""Multimodal column conventions (north star, SURVEY §7.1 M4).

Convention: media payloads are opaque BINARY columns + a typed metadata
struct (modality, byte size, content digest). Decode / feature-extract
runs as Arrow-batched Pandas UDFs over ``mapInPandas`` — the real
Spark-side plumbing (schema, batch iteration, binary handling) with the
codec itself STUBBED: the container ships no image/audio libraries, so
``_decode_stub`` derives deterministic fake dimensions from the bytes
(clearly marked; swap in PIL/ffmpeg by replacing that one function).

The fixture has no binary table, so payloads are synthesized from
documents.text (utf-8 bytes) — the plumbing is identical.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from walden_spark.registry import query
from walden_spark.tables import Tables

DECODE_SCHEMA = (
    "doc_id BIGINT, modality STRING, n_bytes BIGINT, width INT, height INT, "
    "n_frames INT, feat_mean DOUBLE"
)


def with_media_columns(df: DataFrame) -> DataFrame:
    """Attach the multimodal convention columns: payload BINARY +
    metadata STRUCT(modality, n_bytes, sha)."""
    payload = F.col("text").cast("binary")
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        modality.alias("modality"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha"),
    )
    return df.select("doc_id", payload.alias("payload"), meta.alias("media_meta"))


def _decode_input(media: DataFrame) -> DataFrame:
    """Project the media frame to exactly what the decode kernels read:
    (doc_id, payload, modality). mapInPandas is opaque to Spark's
    column pruning, so without this the full metadata struct — the
    sha-256 digest included — is computed AND shipped through the Arrow
    boundary only to be dropped in Python (r15, guide §4.1/§2.3:
    project before the opaque operator)."""
    return media.select(
        "doc_id", "payload", F.col("media_meta.modality").alias("modality")
    )


def _decode_stub(payload: bytes, modality: str) -> tuple[int, int, int, float]:
    """STUB codec — deterministic fake decode.

    Real deployments replace this with PIL / soundfile / pyav; the
    surrounding mapInPandas plumbing (Arrow batches, binary columns,
    output schema) is production-shaped and unchanged by that swap.
    """
    n = len(payload)
    width = 32 + (n % 600)
    height = 32 + ((n * 7) % 400)
    n_frames = 1 if modality == "image" else 1 + (n % 120)
    # fake feature: mean byte value (deterministic, exact in double)
    feat_mean = (sum(payload) / n) if n else 0.0
    return width, height, n_frames, feat_mean


def _decode_columns(pdf: pd.DataFrame, with_features: bool) -> dict:
    """Vectorized batch decode (r15, guide §4.2): one numpy pass over
    the batch instead of a per-row ``_decode_stub`` call. The byte sum
    feeding ``feat_mean`` — the only O(payload bytes) part — runs as a
    cumsum over the batch's concatenated payload buffer (exact int64,
    so ``sum/n`` is bit-identical to the per-row Python division), and
    is skipped entirely when the caller doesn't consume features
    (resize / frame-sample pipelines). Dimension math matches
    ``_decode_stub`` exactly; that stub stays as the documented
    swap-in point for a real codec."""
    import numpy as np

    payloads = pdf["payload"]
    n = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=len(payloads))
    modality = pdf["modality"]
    out = {
        "doc_id": pdf["doc_id"].values,
        "modality": modality,
        "n_bytes": n,
        "width": (32 + (n % 600)).astype("int32"),
        "height": (32 + ((n * 7) % 400)).astype("int32"),
        "n_frames": np.where(
            modality.to_numpy() == "image", 1, 1 + (n % 120)
        ).astype("int32"),
    }
    if with_features:
        data = np.frombuffer(b"".join(payloads), dtype=np.uint8)
        cs = np.concatenate(([0], np.cumsum(data, dtype=np.int64)))
        ends = np.cumsum(n)
        byte_sum = cs[ends] - cs[ends - n]
        out["feat_mean"] = np.where(n > 0, byte_sum / np.maximum(n, 1), 0.0)
    return out


def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: per Arrow batch, decode payloads → features.
    Input is the PRUNED projection (doc_id, payload, modality) — the
    metadata struct's sha-256 was shipped through Arrow and never read
    (guide §4.1: pass only the columns the function needs)."""
    for pdf in batches:
        yield pd.DataFrame(_decode_columns(pdf, with_features=True))


DIMS_SCHEMA = (
    "doc_id BIGINT, modality STRING, n_bytes BIGINT, width INT, height INT, "
    "n_frames INT"
)


def decode_dims_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Dimensions-only decode for pipelines that never read
    ``feat_mean`` (resize planning, frame sampling): mapInPandas is
    opaque to Spark's column pruning, so the O(payload bytes) feature
    sum must be skipped HERE, not downstream (r15, guide §4.1)."""
    for pdf in batches:
        yield pd.DataFrame(_decode_columns(pdf, with_features=False))


@query(
    "multimodal_meta",
    oracle="""
SELECT doc_id,
       ['image', 'audio', 'video'][(doc_id % 3) + 1] AS modality,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha
FROM documents
""",
    category="multimodal",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata struct (flattened projection for
    the oracle — struct internals are engine-specific)."""
    t = Tables(spark, sf_dir)
    media = with_media_columns(t.documents)
    return media.select(
        "doc_id",
        F.col("media_meta.modality").alias("modality"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.sha").alias("sha"),
    )


@query(
    "multimodal_decode",
    oracle="""
SELECT doc_id,
       ['image', 'audio', 'video'][(doc_id % 3) + 1] AS modality,
       CAST(n AS BIGINT) AS n_bytes,
       CAST(32 + (n % 600) AS INT) AS width,
       CAST(32 + ((n * 7) % 400) AS INT) AS height,
       CAST(CASE WHEN (doc_id % 3) = 0 THEN 1 ELSE 1 + (n % 120) END AS INT) AS n_frames,
       byte_sum / n AS feat_mean
FROM (
  SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n,
         CAST(list_reduce(list_prepend(0, list_transform(string_split(text, ''), c -> ascii(c))),
                          (a, b) -> a + b) AS DOUBLE) AS byte_sum
  FROM documents
)
""",
    category="multimodal",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract via Arrow-batched mapInPandas (stubbed
    codec, real plumbing). The fake decode is deterministic, so even
    the Pandas-UDF path is oracle-checked: DuckDB recomputes the same
    features from byte length + byte sum (text is ASCII, so ascii(c)
    == byte value)."""
    t = Tables(spark, sf_dir)
    media = _decode_input(with_media_columns(t.documents))
    return media.mapInPandas(decode_batch, schema=DECODE_SCHEMA)


@query(
    "multimodal_frame_sample",
    oracle="""
SELECT doc_id,
       CAST(unnest(range(0, 1 + (octet_length(CAST(text AS BLOB)) % 120), 30)) AS BIGINT) AS frame_idx
FROM documents WHERE doc_id % 3 = 2
""",
    category="multimodal",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video payloads: explode decoded frame indexes
    (every 30th frame) — the downstream shape of a video pipeline. The
    stub codec is deterministic (n_frames = 1 + bytes % 120), so the
    oracle replays it: r02 upgrade from rows-only to hash-checked."""
    t = Tables(spark, sf_dir)
    media = _decode_input(with_media_columns(t.documents))
    # dims-only kernel: this pipeline never reads feat_mean, and the
    # opaque map would otherwise compute the O(bytes) feature sum for
    # every payload just to drop it (r15, guide §4.1)
    decoded = media.mapInPandas(decode_dims_batch, schema=DIMS_SCHEMA)
    return (
        decoded.filter(F.col("modality") == "video")
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(30))).alias("frame_idx"),
        )
    )


RESIZE_SCHEMA = "doc_id BIGINT, width INT, height INT, out_w INT, out_h INT"
_TARGET = 224


def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: aspect-preserving fit into TARGETxTARGET.
    Pure integer math ((dim * TARGET) // max_side) so the stubbed
    transform stays engine-reproducible; a real deployment swaps the
    body for PIL.Image.resize and keeps the batch shape."""
    for pdf in batches:
        mx = pdf[["width", "height"]].max(axis=1)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": pdf["width"],
                "height": pdf["height"],
                "out_w": (pdf["width"] * _TARGET // mx).astype("int32"),
                "out_h": (pdf["height"] * _TARGET // mx).astype("int32"),
            }
        )


@query(
    "multimodal_resize",
    oracle=f"""
SELECT doc_id, width, height,
       CAST(width * {_TARGET} // greatest(width, height) AS INT) AS out_w,
       CAST(height * {_TARGET} // greatest(width, height) AS INT) AS out_h
FROM (
  SELECT doc_id,
         CAST(32 + (n % 600) AS INT) AS width,
         CAST(32 + ((n * 7) % 400) AS INT) AS height
  FROM (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n FROM documents)
)
WHERE (doc_id % 3) + 1 = 1
""",
    category="multimodal",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize planning (aspect-preserving fit to 224) over decoded
    image payloads — second mapInPandas stage chained after decode, the
    shape of a real preprocessing pipeline (decode → resize →
    feature-extract), each stage an Arrow-batched map."""
    t = Tables(spark, sf_dir)
    media = _decode_input(with_media_columns(t.documents))
    # dims-only decode: feat_mean is never consumed here (r15, §4.1)
    decoded = media.mapInPandas(decode_dims_batch, schema=DIMS_SCHEMA)
    images = decoded.filter(F.col("modality") == "image").select("doc_id", "width", "height")
    return images.mapInPandas(resize_batch, schema=RESIZE_SCHEMA)


@query(
    "multimodal_dedup_exact",
    oracle="""
SELECT modality, keep_id, n_copies
FROM (
  SELECT ['image', 'audio', 'video'][(doc_id % 3) + 1] AS modality,
         MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n_copies
  FROM (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 3 = 1
  )
  GROUP BY sha256(text), ['image', 'audio', 'video'][(doc_id % 3) + 1]
)
WHERE n_copies > 1
ORDER BY modality, keep_id
""",
    category="multimodal",
)
def multimodal_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup: group binary payloads by content digest
    (sha-256 from the metadata struct) per modality, keep the minimum
    id — the image/audio dedup step of a multimodal training pipeline.
    Input is re-duplicated (ids shifted by 3M preserve doc_id%3, hence
    modality) so the operator provably collapses copies. Scale shape:
    identical to text dedup_exact — one shuffle on the 256-bit digest,
    uniform keys, payload bytes never leave their partition (only the
    digest shuffles)."""
    t = Tables(spark, sf_dir)
    base = t.documents.select("doc_id", "text")
    dup = base.unionAll(
        base.filter(F.col("doc_id") % 3 == 1).select(
            (F.col("doc_id") + 3000000).alias("doc_id"), "text"
        )
    )
    media = with_media_columns(dup)
    return (
        media.groupBy(F.col("media_meta.sha").alias("sha"), F.col("media_meta.modality").alias("modality"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .select("modality", "keep_id", "n_copies")
        .orderBy("modality", "keep_id")
    )
