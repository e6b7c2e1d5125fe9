"""Text-analysis operators over `documents` (north star, SURVEY §7.1 M4).

Language-ID, quality scoring, token counting, fingerprinting — all
expressed with JVM-side higher-order array functions (no Python UDFs in
the hot path), so they stay inside whole-stage codegen and scale as
pure map work: zero shuffles except the final aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from walden_spark.registry import query
from walden_spark.tables import Tables

# Tiny per-language stopword marker lists for the n-gram/stopword
# language-ID heuristic. Deterministic and mirrored in the oracle SQL.
_LANG_MARKERS = {
    "en": ["the", "a", "and", "of", "to"],
    "de": ["der", "die", "das", "und", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
    "zh": ["de5", "shi4", "le5", "zai4", "wo3"],
}

_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"]


def _words(col: str = "text"):
    return F.split(F.col(col), " ")


def _q6(col):
    """Quantize to 6 decimals via floor — rounding-rule-free, so it is
    bit-portable across engines (see text_quality_score comment)."""
    return F.floor(col * 1000000.0) / 1000000.0


@query(
    "text_token_counts",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[a-z0-9]+')) AS n_re_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_types,
       length(text) AS n_chars_computed,
       n_chars,
       floor(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) * 1000000.0) / 1000000.0 AS type_token_ratio
FROM documents
""",
    category="text",
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, regex tokens (BPE-ish
    pre-tokenizer proxy), distinct types, type/token ratio."""
    t = Tables(spark, sf_dir)
    w = _words()
    return t.documents.select(
        "doc_id",
        F.size(w).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z0-9]+"), 0)).cast("long").alias("n_re_tokens"),
        F.size(F.array_distinct(w)).cast("long").alias("n_types"),
        F.length("text").cast("long").alias("n_chars_computed"),
        "n_chars",
        (F.floor(F.size(F.array_distinct(w)).cast("double") / F.size(w) * 1000000.0) / 1000000.0).alias("type_token_ratio"),
    )


@query(
    "text_quality_score",
    oracle=f"""
SELECT doc_id, n_words, floor(mean_word_len * 1000000.0) / 1000000.0 AS mean_word_len,
       floor(stopword_ratio * 1000000.0) / 1000000.0 AS stopword_ratio,
       floor((0.4 * least(n_words / 100.0, 1.0)
             + 0.3 * least(stopword_ratio * 5, 1.0)
             + 0.3 * least(mean_word_len / 8.0, 1.0)) * 1000000.0) / 1000000.0 AS quality
FROM (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS mean_word_len,
         CAST(len(list_filter(string_split(text, ' '),
                              w -> list_contains({_STOPWORDS!r}, w))) AS DOUBLE)
           / len(string_split(text, ' ')) AS stopword_ratio
  FROM documents
)
""",
    category="text",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, stopword ratio, mean word length →
    weighted [0,1] score (heuristic quality filter for training data)."""
    t = Tables(spark, sf_dir)
    w = _words()
    n_words = F.size(w)
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    mean_word_len = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double") / n_words
    stopword_ratio = (
        F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x))).cast("double") / n_words
    )
    # floor-quantize instead of round: both engines compute the same
    # IEEE double, and floor of the same double is always identical,
    # while round-half rules differ (Spark HALF_UP vs DuckDB half-even)
    # exactly on .5e-6 boundaries, which real scores do hit.
    quality = _q6(
        0.4 * F.least(n_words / 100.0, F.lit(1.0))
        + 0.3 * F.least(stopword_ratio * 5, F.lit(1.0))
        + 0.3 * F.least(mean_word_len / 8.0, F.lit(1.0))
    )
    return t.documents.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        _q6(mean_word_len).alias("mean_word_len"),
        _q6(stopword_ratio).alias("stopword_ratio"),
        quality.alias("quality"),
    )


def _lang_score_sql(lang: str) -> str:
    markers = _LANG_MARKERS[lang]
    return (
        f"CAST(len(list_filter(string_split(text, ' '), w -> list_contains({markers!r}, w))) AS DOUBLE)"
        " / len(string_split(text, ' '))"
    )


@query(
    "text_lang_id",
    oracle=f"""
SELECT lang AS labeled_lang, predicted, COUNT(*) AS n
FROM (
  SELECT lang,
         CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
              WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
              WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
              WHEN s_es >= s_zh THEN 'es'
              ELSE 'zh' END AS predicted
  FROM (
    SELECT lang,
           {_lang_score_sql('en')} AS s_en,
           {_lang_score_sql('de')} AS s_de,
           {_lang_score_sql('fr')} AS s_fr,
           {_lang_score_sql('es')} AS s_es,
           {_lang_score_sql('zh')} AS s_zh
    FROM documents
  )
)
GROUP BY lang, predicted
""",
    category="text",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language identification via stopword-marker scoring (n-gram
    heuristic family): argmax over per-language marker-hit ratios,
    confusion-matrix output against the labeled lang column."""
    t = Tables(spark, sf_dir)
    w = _words()
    n = F.size(w)

    def score(lang: str):
        markers = F.array(*[F.lit(m) for m in _LANG_MARKERS[lang]])
        return F.size(F.filter(w, lambda x: F.array_contains(markers, x))).cast("double") / n

    scored = t.documents.select(
        "lang",
        score("en").alias("s_en"),
        score("de").alias("s_de"),
        score("fr").alias("s_fr"),
        score("es").alias("s_es"),
        score("zh").alias("s_zh"),
    )
    predicted = (
        F.when(
            (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_zh")),
            "en",
        )
        .when(
            (F.col("s_de") >= F.col("s_fr")) & (F.col("s_de") >= F.col("s_es")) & (F.col("s_de") >= F.col("s_zh")),
            "de",
        )
        .when((F.col("s_fr") >= F.col("s_es")) & (F.col("s_fr") >= F.col("s_zh")), "fr")
        .when(F.col("s_es") >= F.col("s_zh"), "es")
        .otherwise("zh")
    )
    return (
        scored.select(F.col("lang").alias("labeled_lang"), predicted.alias("predicted"))
        .groupBy("labeled_lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "text_fingerprint",
    oracle="""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint,
       md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS prefix_hash
FROM documents
""",
    category="text",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: bag-of-words fingerprint (md5 of sorted
    distinct tokens — robust to word order) + head fingerprint (first 8
    tokens — the rolling-hash prefix idiom)."""
    t = Tables(spark, sf_dir)
    w = _words()
    return t.documents.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(w)))).alias("fingerprint"),
        F.md5(F.concat_ws(" ", F.slice(w, 1, 8))).alias("prefix_hash"),
    )


@query(
    "text_pii_scan",
    oracle=r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[a-z0-9._]+@[a-z0-9.]+')) AS n_emails,
       len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3,4}-[0-9]{4}')) AS n_phones,
       len(regexp_extract_all(text, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS n_ssn_like,
       (len(regexp_extract_all(text, '[a-z0-9._]+@[a-z0-9.]+'))
        + len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3,4}-[0-9]{4}'))
        + len(regexp_extract_all(text, '[0-9]{3}-[0-9]{2}-[0-9]{4}'))) > 0 AS has_pii
FROM documents
""",
    category="text",
)
def text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII pattern scan (emails / phone-shaped / SSN-shaped) — the
    filter stage every training-data pipeline runs before release.
    Patterns restricted to the regex subset where Java (Spark) and RE2
    (DuckDB) agree: char classes, bounded repeats, literals — no
    backrefs/lookarounds (SURVEY §7.4 dialect risk)."""
    t = Tables(spark, sf_dir)
    email = r"[a-z0-9._]+@[a-z0-9.]+"
    phone = r"[0-9]{3}-[0-9]{3,4}-[0-9]{4}"
    ssn = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"
    n = lambda p: F.size(F.regexp_extract_all("text", F.lit(p), 0))  # noqa: E731
    return t.documents.select(
        "doc_id",
        n(email).cast("long").alias("n_emails"),
        n(phone).cast("long").alias("n_phones"),
        n(ssn).cast("long").alias("n_ssn_like"),
        ((n(email) + n(phone) + n(ssn)) > 0).alias("has_pii"),
    )


@query(
    "text_hash_split",
    oracle=f"""
SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (
  SELECT n_chars,
         CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90
              THEN 'train' ELSE 'val' END AS split
  FROM documents
)
GROUP BY split ORDER BY split
""",
    category="text",
)
def text_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/val split by content-stable hash of the
    document id — the reproducible-split idiom every training pipeline
    needs (no rand(): same doc always lands in the same split, across
    reruns, engines, and partitionings). Uses the same portable
    md5→int60 bridge as the MinHash pipeline."""
    t = Tables(spark, sf_dir)
    raw = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast("bigint")
    split = F.when(raw % 100 < 90, "train").otherwise("val")
    return (
        t.documents.select("n_chars", split.alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("split")
    )


@query(
    "text_repetition",
    oracle="""
SELECT doc_id,
       n_grams,
       n_distinct,
       floor((1.0 - CAST(n_distinct AS DOUBLE) / nullif(n_grams, 0)) * 1000000.0)
         / 1000000.0 AS dup_gram_frac,
       (1.0 - CAST(n_distinct AS DOUBLE) / nullif(n_grams, 0)) > 0.3 AS is_repetitive
FROM (
  SELECT doc_id,
         len(w) - 2 AS n_grams,
         len(list_distinct([w[i] || '_' || w[i+1] || '_' || w[i+2]
                            for i in range(1, len(w) - 1)])) AS n_distinct
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  WHERE len(w) >= 3
)
""",
    category="text",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition: duplicate word-3-gram fraction — the
    Gopher-style quality signal for boilerplate/looping text (Rae et
    al., "Scaling Language Models: ... Gopher", 2021, §A1.1 repetition
    filters). A doc with >30% duplicate 3-grams is flagged. Pure map
    work: per-row array ops, no shuffle at all."""
    t = Tables(spark, sf_dir)
    # Materialize the words array as its own projection (optimization
    # r14, guide §4.1): inlining split(text) into the 3-gram transform
    # lambda re-splits the document on every lambda call — no CSE
    # exists inside higher-order-function bodies — i.e. O(words²)
    # character work per doc. As an attribute, the split runs once.
    w = F.col("__w")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - 2),
        lambda i: F.concat_ws("_", F.element_at(w, i), F.element_at(w, i + 1), F.element_at(w, i + 2)),
    )
    n_grams = (F.size(w) - 2).cast("long")
    n_distinct = F.size(F.array_distinct(grams)).cast("long")
    dup_frac = F.lit(1.0) - n_distinct.cast("double") / F.nullif(n_grams, F.lit(0))
    return (
        t.documents.select("doc_id", F.split(F.col("text"), " ").alias("__w"))
        .filter(F.size(w) >= 3)
        .select(
            "doc_id",
            n_grams.alias("n_grams"),
            n_distinct.alias("n_distinct"),
            (F.floor(dup_frac * 1000000.0) / 1000000.0).alias("dup_gram_frac"),
            (dup_frac > 0.3).alias("is_repetitive"),
        )
    )


@query(
    "text_decontaminate",
    oracle="""
WITH bench AS (
  SELECT DISTINCT s FROM (
    SELECT doc_id AS b_id, w[i] || '_' || w[i+1] || '_' || w[i+2] || '_' || w[i+3] || '_' ||
           w[i+4] || '_' || w[i+5] || '_' || w[i+6] || '_' || w[i+7] AS s
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id % 97 = 0),
         (SELECT unnest(range(1, 2000)) AS i)
    WHERE i + 7 <= len(w)
  )
),
corpus AS (
  SELECT doc_id, w[i] || '_' || w[i+1] || '_' || w[i+2] || '_' || w[i+3] || '_' ||
         w[i+4] || '_' || w[i+5] || '_' || w[i+6] || '_' || w[i+7] AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id % 97 <> 0),
       (SELECT unnest(range(1, 2000)) AS i)
  WHERE i + 7 <= len(w)
)
SELECT doc_id, COUNT(DISTINCT s) AS n_contaminated_ngrams
FROM corpus JOIN bench USING (s)
GROUP BY doc_id
ORDER BY doc_id
""",
    category="text",
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word-8-gram with a held-out evaluation set (the GPT-3 appendix-C /
    PaLM-style n-gram overlap rule; Brown et al. 2020). The eval set
    (every 97th doc here) is tiny relative to the corpus, so its
    distinct-8-gram index BROADCASTS and contamination detection is a
    map-side semi-join — the corpus never shuffles at any scale. Emits
    (doc_id, overlapping-ngram count) for flagged docs only."""
    t = Tables(spark, sf_dir)

    def grams8(df):
        # Docs shorter than 8 words contribute no 8-grams. The guard
        # matters: sequence(1, 0) is DESCENDING [1, 0] on Spark and
        # element_at(w, 0) throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT.
        # Words materialized as their own projection (optimization r14,
        # guide §4.1): inlined split(text) would re-split the document
        # on every lambda call — 8 element_at per 8-gram — since HOF
        # lambda bodies get no CSE; as an attribute it splits once.
        w = F.col("__w")
        return (
            df.select("doc_id", F.split("text", " ").alias("__w"))
            .filter(F.size(w) >= 8)
            .select(
                "doc_id",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size(w) - 7),
                        lambda i: F.concat_ws(
                            "_", *[F.element_at(w, i + j) for j in range(8)]
                        ),
                    )
                ).alias("s"),
            )
        )

    bench = (
        grams8(t.documents.filter(F.col("doc_id") % 97 == 0)).select("s").distinct()
    )
    corpus = grams8(t.documents.filter(F.col("doc_id") % 97 != 0)).distinct()
    return (
        corpus.join(F.broadcast(bench), "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
        .orderBy("doc_id")
    )


@query(
    "text_chunking",
    oracle="""
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 300),
chunks AS (
  SELECT doc_id, CAST((c - 1) / 24 AS BIGINT) AS chunk_id,
         array_to_string(w[c : c + 31], ' ') AS chunk_text,
         least(32, len(w) - c + 1) AS n_tokens
  FROM docs, (SELECT unnest(range(1, 4000)) AS c)
  WHERE c <= len(w) AND (c - 1) % 24 = 0
)
SELECT doc_id, chunk_id, chunk_text, CAST(n_tokens AS BIGINT) AS n_tokens
FROM chunks
ORDER BY doc_id, chunk_id
""",
    category="text",
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split each document into 32-token
    chunks with 8-token overlap (stride 24) — the standard LLM
    pretraining/RAG windowing step. Pure per-row array arithmetic
    (sequence + slice), zero shuffle, embarrassingly parallel at any
    corpus size."""
    t = Tables(spark, sf_dir)
    w = F.split("text", " ")
    chunk_starts = F.sequence(F.lit(1), F.greatest(F.size(w), F.lit(1)), F.lit(24))
    return (
        t.documents.filter(F.col("doc_id") < 300)
        .select(
            "doc_id",
            F.size(w).alias("_n"),
            F.explode(chunk_starts).alias("c"),
            w.alias("_w"),
        )
        .filter(F.col("c") <= F.col("_n"))
        .select(
            "doc_id",
            ((F.col("c") - 1) / 24).cast("bigint").alias("chunk_id"),
            F.concat_ws(" ", F.slice("_w", F.col("c"), 32)).alias("chunk_text"),
            F.least(F.lit(32), F.col("_n") - F.col("c") + 1).cast("bigint").alias("n_tokens"),
        )
        .orderBy("doc_id", "chunk_id")
    )


@query(
    "text_stratified_sample",
    oracle="""
WITH strata AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang)
SELECT lang, n_docs, TRUE AS within_bounds
FROM strata
ORDER BY lang
""",
    category="text",
)
def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture sampling: draw a per-language stratified sample
    (sampleBy) to hit a target data mixture — the domain/language
    re-weighting step every pretraining corpus goes through. Which rows
    are drawn is engine-seeded, so the checkable contract is
    statistical: each stratum's sampled count must land within ±30% of
    fraction x stratum size (>6 sigma at fixture sizes); the oracle
    carries the exact stratum sizes and the bound verdict."""
    from itertools import chain

    t = Tables(spark, sf_dir)
    fractions = {"en": 0.5, "de": 0.2, "es": 0.2, "zh": 0.1, "fr": 0.3}
    docs = t.documents
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    fr = {lg: fractions.get(lg, 0.25) for lg in langs}
    sampled = docs.sampleBy("lang", fractions=fr, seed=42)
    per_stratum = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    got = sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled"))
    frac_map = F.create_map(*list(chain(*[(F.lit(k), F.lit(v)) for k, v in fr.items()])))
    expected = F.col("n_docs") * frac_map[F.col("lang")]
    # tolerance: ±30% of the expectation OR 4 binomial sigmas + 1,
    # whichever is larger — small fixture strata (tens of docs) need
    # the sigma term; at corpus scale the 30% relative band dominates
    tol = F.greatest(0.3 * expected, 4 * F.sqrt(expected) + 1)
    return (
        per_stratum.join(got, "lang", "left")
        .select(
            "lang",
            "n_docs",
            (F.abs(F.coalesce(F.col("n_sampled"), F.lit(0)) - expected) <= tol).alias(
                "within_bounds"
            ),
        )
        .orderBy("lang")
    )


@query(
    "text_sequence_pack",
    oracle="""
WITH RECURSIVE docs AS (
  SELECT doc_id, doc_id % 8 AS bucket, len(string_split(text, ' ')) AS tok,
         ROW_NUMBER() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
  FROM documents WHERE doc_id < 1000
),
pack(bucket, rn, doc_id, tok, bin_id, bin_fill) AS (
  SELECT bucket, rn, doc_id, tok, CAST(0 AS BIGINT), tok FROM docs WHERE rn = 1
  UNION ALL
  SELECT d.bucket, d.rn, d.doc_id, d.tok,
         CASE WHEN p.bin_fill + d.tok > 256 THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.bin_fill + d.tok > 256 THEN d.tok ELSE p.bin_fill + d.tok END
  FROM pack p JOIN docs d ON d.bucket = p.bucket AND d.rn = p.rn + 1
)
SELECT CAST(bucket AS BIGINT) AS bucket, bin_id,
       COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS total_tokens
FROM pack
GROUP BY bucket, bin_id
ORDER BY bucket, bin_id
""",
    category="text",
)
def text_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: next-fit token packing of documents into
    256-token context bins — the pretraining batching step that turns
    variable-length docs into fixed windows with minimal padding.
    Packing is order-dependent, so docs hash into buckets (the parallel
    unit at corpus scale: one packer task per bucket, deterministic
    doc_id order inside) and applyInPandas runs the next-fit loop per
    bucket. The oracle replays the identical fold as a recursive CTE."""
    import pandas as pd

    t = Tables(spark, sf_dir)
    docs = (
        t.documents.filter(F.col("doc_id") < 1000)
        .select(
            "doc_id",
            (F.col("doc_id") % 8).alias("bucket"),
            F.size(F.split("text", " ")).cast("bigint").alias("tok"),
        )
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        bins, fills = [], 0
        bin_id, fill = 0, 0
        first = True
        for tok in pdf["tok"]:
            if not first and fill + tok > 256:
                bin_id, fill = bin_id + 1, tok
            else:
                fill += tok
            first = False
            bins.append(bin_id)
        out = pdf.assign(bin_id=bins)
        g = out.groupby("bin_id", as_index=False).agg(
            bucket=("bucket", "first"), n_docs=("doc_id", "count"), total_tokens=("tok", "sum")
        )
        return g[["bucket", "bin_id", "n_docs", "total_tokens"]]

    return (
        docs.groupBy("bucket")
        .applyInPandas(pack, schema="bucket long, bin_id long, n_docs long, total_tokens long")
        .orderBy("bucket", "bin_id")
    )


@query(
    "text_span_dedup",
    oracle="""
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
segs AS (
  SELECT doc_id, CAST((c - 1) / 8 AS BIGINT) AS seg_no,
         array_to_string(w[c : c + 7], ' ') AS seg_text
  FROM docs, (SELECT unnest(range(1, 4000)) AS c)
  WHERE c <= len(w) AND (c - 1) % 8 = 0
),
flagged AS (
  SELECT doc_id, seg_no, seg_text,
         row_number() OVER (PARTITION BY md5(seg_text)
                            ORDER BY doc_id, seg_no) = 1 AS keep
  FROM segs
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
       COALESCE(array_to_string(list(seg_text ORDER BY seg_no) FILTER (WHERE keep), ' '),
                '') AS cleaned_text
FROM flagged
GROUP BY doc_id
ORDER BY doc_id
""",
    category="text",
)
def text_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span removal (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL 2022): documents
    are cut into fixed 8-word spans, every span that repeats anywhere
    in the corpus keeps only its first occurrence (min (doc_id,
    position) — a total order, so the survivor is deterministic), and
    each document is reassembled from its surviving spans. Production
    pipelines use ~50-token spans; 8 fits this fixture's vocabulary.

    Scale shape: span extraction is a zero-shuffle codegen map
    (sequence + slice); the survivor choice is one shuffle on the span
    DIGEST (uniform md5 keys — no skew; the window's per-key groups are
    occurrence counts, i.e. tiny); reassembly is one shuffle on doc_id
    with sort_array(collect_list(struct)) fixing intra-doc order
    without a global sort. Same two-shuffle budget as exact dedup plus
    the rebuild — the plan a suffix-array pipeline collapses to when
    spans are fixed-width.
    """
    t = Tables(spark, sf_dir)
    w = _words()
    starts = F.sequence(F.lit(1), F.greatest(F.size(w), F.lit(1)), F.lit(8))
    segs = (
        t.documents.repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            F.size(w).alias("_n"),
            F.explode(starts).alias("c"),
            w.alias("_w"),
        )
        .filter(F.col("c") <= F.col("_n"))
        .select(
            "doc_id",
            ((F.col("c") - 1) / 8).cast("bigint").alias("seg_no"),
            F.concat_ws(" ", F.slice("_w", F.col("c"), 8)).alias("seg_text"),
        )
    )
    from pyspark.sql import Window

    first = Window.partitionBy(F.md5("seg_text")).orderBy("doc_id", "seg_no")
    flagged = segs.withColumn("keep", F.row_number().over(first) == 1)
    kept_spans = F.array_sort(
        F.collect_list(F.when(F.col("keep"), F.struct("seg_no", "seg_text")))
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.when(F.col("keep"), 0).otherwise(1)).cast("bigint").alias("n_dropped"),
            F.concat_ws(
                " ", F.transform(kept_spans, lambda s: s["seg_text"])
            ).alias("cleaned_text"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_shard_shuffle",
    oracle="""
WITH h AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
         ('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hkey
  FROM documents
),
placed AS (
  SELECT doc_id, n_tokens, hkey % 8 AS shard_id,
         row_number() OVER (PARTITION BY hkey % 8 ORDER BY hkey, doc_id) AS pos,
         SUM(n_tokens) OVER (PARTITION BY hkey % 8 ORDER BY hkey, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS tok_before
  FROM h
)
SELECT CAST(shard_id AS BIGINT) AS shard_id, CAST(pos AS BIGINT) AS pos, doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(COALESCE(tok_before, 0) AS BIGINT) AS token_offset
FROM placed
ORDER BY shard_id, pos
""",
    category="text",
)
def text_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the step that
    turns a curated corpus into training input: every document gets a
    pseudo-random but reproducible position (order by a salted md5 of
    its id — same permutation on every rerun, engine, and layout), a
    shard (hash mod 8; a real run uses num_workers x files_per_worker),
    and the running token offset at which it starts inside its shard
    (prefix-sum, so trainers can seek without scanning).

    Scale shape: the hash is a zero-shuffle map; placement is ONE
    shuffle on shard_id with an in-shard sort (window: row_number +
    running SUM share the same sort — Spark evaluates both over one
    exchange, and per-shard sorts are independent, so 100TB spreads
    across however many shards the trainer asked for). No global
    total-order sort anywhere — the output contract (shard_id, pos) is
    already the consumable order.
    """
    t = Tables(spark, sf_dir)
    from pyspark.sql import Window

    hkey = F.conv(
        F.substring(F.md5(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    h = t.documents.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        hkey.alias("hkey"),
    ).withColumn("shard_id", F.col("hkey") % 8)
    w = Window.partitionBy("shard_id").orderBy("hkey", "doc_id")
    return (
        h.select(
            "shard_id",
            F.row_number().over(w).cast("bigint").alias("pos"),
            "doc_id",
            "n_tokens",
            F.coalesce(
                F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("token_offset"),
        )
        .orderBy("shard_id", "pos")
    )


@query(
    "text_pretrain_pipeline",
    oracle="""
WITH toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
),
quality AS (
  SELECT doc_id, text, len(w) AS n_tokens
  FROM toks
  WHERE len(w) >= 20
    AND CAST(len(list_distinct(w)) AS DOUBLE) / len(w) >= 0.45
),
canon AS (
  SELECT doc_id, n_tokens FROM (
    SELECT doc_id, n_tokens,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM quality
  ) WHERE rn = 1
),
placed AS (
  SELECT doc_id, n_tokens,
         ('0x' || substr(md5('pipe:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hkey
  FROM canon
)
SELECT CAST(hkey % 4 AS BIGINT) AS shard_id,
       CAST(row_number() OVER (PARTITION BY hkey % 4 ORDER BY hkey, doc_id) AS BIGINT) AS pos,
       doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
FROM placed
ORDER BY shard_id, pos
""",
    category="text",
)
def text_pretrain_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end pretraining corpus pipeline in ONE declarative plan:
    quality gate (length >= 20 tokens, type-token ratio >= 0.45) →
    exact dedup (first doc per content digest survives) → deterministic
    shuffle into 4 shards with in-shard positions. The composition is
    the product a reference user actually runs — each stage is also
    available standalone (text_quality_score, dedup_exact,
    text_shard_shuffle).

    Scale shape: quality is a zero-shuffle codegen map and runs FIRST,
    so later shuffles only carry survivors (filter-early is the 100TB
    win — Catalyst cannot reorder across the dedup window, so stage
    order is the design choice here); dedup is one shuffle on the
    content digest; sharding is one shuffle on shard_id. Three stages,
    two shuffles, no global sort, nothing on the driver.
    """
    t = Tables(spark, sf_dir)
    from pyspark.sql import Window

    w = F.split("text", " ")
    quality = t.documents.select(
        "doc_id", "text", F.size(w).cast("bigint").alias("n_tokens"),
        (F.size(F.array_distinct(w)).cast("double") / F.size(w)).alias("ttr"),
    ).filter((F.col("n_tokens") >= 20) & (F.col("ttr") >= 0.45))
    wd = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    canon = (
        quality.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .select("doc_id", "n_tokens")
    )
    hkey = F.conv(
        F.substring(F.md5(F.concat(F.lit("pipe:"), F.col("doc_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    placed = canon.withColumn("hkey", hkey).withColumn("shard_id", F.col("hkey") % 4)
    ws = Window.partitionBy("shard_id").orderBy("hkey", "doc_id")
    return (
        placed.select(
            "shard_id",
            F.row_number().over(ws).cast("bigint").alias("pos"),
            "doc_id",
            "n_tokens",
        )
        .orderBy("shard_id", "pos")
    )


@query(
    "text_weighted_sample",
    oracle="""
SELECT doc_id, n_chars,
       floor(k * 1000000.0) / 1000000.0 AS key6,
       CAST(rn AS INT) AS rn
FROM (
  SELECT doc_id, n_chars, k,
         row_number() OVER (ORDER BY k DESC, doc_id) AS rn
  FROM (
    SELECT doc_id, n_chars,
           pow((('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                % 1000000007 + 1) / 1000000008.0,
               1.0 / n_chars) AS k
    FROM documents
  )
)
WHERE rn <= 20
ORDER BY rn
""",
    category="text",
)
def text_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis/Spirakis,
    "Weighted random sampling with a reservoir", IPL 2006): each doc
    draws key u^(1/w) from a hash-derived uniform (salted md5 → u in
    (0,1], weight = n_chars) and the global top-20 keys are the sample
    — longer documents proportionally likelier, yet fully reproducible
    across reruns, engines, and layouts (no rand()).

    Scale shape: key assignment is a zero-shuffle map; ORDER BY key
    LIMIT k plans as TakeOrderedAndProject — each partition keeps its
    local top-20 and only k rows per partition reach the driver-side
    merge, the distributed-reservoir plan (never a full global sort).
    Per-stratum variants compose with a partitionBy window instead.
    """
    t = Tables(spark, sf_dir)
    u = (
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 15),
                16,
                10,
            ).cast("bigint")
            % 1000000007
            + 1
        )
        / 1000000008.0
    )
    keyed = t.documents.select(
        "doc_id", "n_chars", F.pow(u, 1.0 / F.col("n_chars")).alias("k")
    )
    from pyspark.sql import Window

    # Global sort+limit over the full table plans as
    # TakeOrderedAndProject (per-partition local top-20, k rows per
    # partition to the merge) — the distributed-reservoir shape. The
    # row_number window then runs over the 20 surviving rows only, so
    # its single-partition sort is constant-size at any corpus scale.
    top = keyed.orderBy(F.desc("k"), "doc_id").limit(20)
    w = Window.orderBy(F.desc("k"), "doc_id")
    return (
        top.withColumn("rn", F.row_number().over(w))
        .select(
            "doc_id",
            "n_chars",
            (F.floor(F.col("k") * 1000000.0) / 1000000.0).alias("key6"),
            F.col("rn").cast("int").alias("rn"),
        )
        .orderBy("rn")
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    key_col: str,
    salt: str = "strat:",
) -> DataFrame:
    """Deterministic stratified sampling — exactly ``min(k, |stratum|)``
    rows per stratum (the training-data curation staple: cap every
    (lang, source) cell so no stratum dominates the mixture), chosen by
    salted-md5 order of the key so the sample is reproducible across
    reruns, engines, and partition layouts (no ``rand()``), and
    re-salting draws an independent sample.

    Scale shape: one shuffle on the strata columns; within each stratum
    ``row_number`` needs the stratum sorted, which is the exact-k price.
    At 100 TB with million-row strata, pre-filter candidates with a
    generous hash threshold first (keep rows whose md5 is below
    ~(k/|stratum|)·2 of the key space via approximate stratum counts),
    then run this exact pass over the survivors — the same
    two-phase trick the ANN operators use; k ≪ stratum keeps phase two
    trivial."""
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(*strata_cols).orderBy(h, F.col(key_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


@query(
    "text_stratum_cap",
    oracle="""
SELECT doc_id, lang, source, n_chars
FROM (
  SELECT doc_id, lang, source, n_chars,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents
)
WHERE rk <= 7
ORDER BY lang, source, doc_id
""",
    category="text",
)
def text_stratum_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) deterministic stratum cap over documents —
    7 docs per stratum via :func:`stratified_sample` (salted-md5 order,
    fully deterministic; the DuckDB oracle runs the identical
    row_number-over-md5 plan, so the hash pins both the stratum
    partitioning and the tie-broken selection order bit-for-bit)."""
    t = Tables(spark, sf_dir)
    return (
        stratified_sample(
            t.documents.select("doc_id", "lang", "source", "n_chars"),
            ["lang", "source"],
            7,
            "doc_id",
        )
        .orderBy("lang", "source", "doc_id")
    )


@query(
    "text_tfidf_topk",
    oracle="""
WITH terms AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w
    FROM documents WHERE doc_id < 200
  ) WHERE w <> ''
),
tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM terms GROUP BY doc_id, w),
dfreq AS (SELECT w, COUNT(DISTINCT doc_id) AS dfreq FROM terms GROUP BY w),
n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM terms),
scored AS (
  SELECT doc_id, w, CAST(tf * n AS DOUBLE) / dfreq AS score
  FROM tf JOIN dfreq USING (w) CROSS JOIN n
)
SELECT doc_id, w AS term, score, CAST(rk AS INT) AS rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, w) AS rk
  FROM scored
) WHERE rk <= 5
ORDER BY doc_id, rk
""",
    category="text",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 salient terms by tf-idf — the keyword /
    topicality signal training-data pipelines use for quality filtering
    and corpus inspection. The idf is the RATIONAL form tf·N/df (no
    log): the score is then one IEEE division of exact integers, so
    ranking can never flip between engines on a last-ulp log
    difference — log-idf would order identically anyway since log is
    monotone.

    Scale shape: one explode → (doc, word) shuffle for tf, a word-keyed
    aggregate for df (stopword skew absorbed by AQE/partial aggs), a
    word-keyed join tf⋈df, and a per-doc top-k window — every stage is
    key-partitioned, nothing is driver-side; N arrives via a broadcast
    1-row cross join."""
    t = Tables(spark, sf_dir)
    terms = (
        t.documents.filter(F.col("doc_id") < 200)
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    tf = terms.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = terms.groupBy("w").agg(F.countDistinct("doc_id").alias("dfreq"))
    n = terms.agg(F.countDistinct("doc_id").alias("n"))
    scored = (
        tf.join(dfreq, "w")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "w",
            ((F.col("tf") * F.col("n")).cast("double") / F.col("dfreq")).alias("score"),
        )
    )
    from pyspark.sql import Window

    win = Window.partitionBy("doc_id").orderBy(F.desc("score"), "w")
    return (
        scored.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= 5)
        .select("doc_id", F.col("w").alias("term"), "score", F.col("rk").cast("int").alias("rk"))
        .orderBy("doc_id", "rk")
    )


@query(
    "text_bigram_lm_score",
    oracle="""
WITH wlists AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     w -> len(w) > 0) AS ws
  FROM documents WHERE doc_id < 300
),
bg AS (
  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
  FROM wlists CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(ws) - 1)) AS i
  ) gs
),
big_counts AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2
),
uni_counts AS (
  SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1
),
vocab AS (
  SELECT COUNT(DISTINCT w) AS v FROM (
    SELECT w1 AS w FROM bg UNION SELECT w2 FROM bg
  ) uw
)
SELECT bg.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(((bc.c12 + 1) * 1000000) // (uc.c1 + vocab.v)) AS BIGINT)
         AS lm_score_q
FROM bg
JOIN big_counts bc ON bg.w1 = bc.w1 AND bg.w2 = bc.w2
JOIN uni_counts uc ON bg.w1 = uc.w1
CROSS JOIN vocab
GROUP BY bg.doc_id
ORDER BY bg.doc_id
""",
    category="text",
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained smoothed bigram language-model score per document
    — the statistical fluency/quality signal (KenLM-style perplexity
    filtering) pretrain pipelines apply, here self-trained on the
    corpus with add-one smoothing. Scoring stays ENTIRELY in integer
    arithmetic: each bigram contributes
    floor(1e6·(c(w1,w2)+1)/(c(w1)+V)) — exact BIGINT multiply and
    integer division in both engines, so no float log/ulp can ever
    flip a hash (same determinism posture as the rational tf-idf
    above; log would only compress the same ranking monotonically).

    Scale shape: bigrams come from per-row zip_with over each doc's
    own word array — NO positional self-join. Then two key-partitioned
    aggregates (bigram counts, unigram counts), two shuffle joins on
    those keys (hot-word skew absorbed by AQE), the vocab size V as a
    broadcast scalar, and a per-doc aggregate. Every stage is
    key-partitioned; nothing touches the driver but V."""
    t = Tables(spark, sf_dir)
    docs = t.documents.filter(F.col("doc_id") < 300).select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z]+"),
            lambda w: F.length(w) > 0,
        ).alias("ws"),
    )
    bg = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(slice(ws, 1, greatest(size(ws) - 1, 0)), "
                    "slice(ws, 2, greatest(size(ws) - 1, 0)), "
                    "(a, b) -> struct(a AS w1, b AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
        # four consumers (bigram counts, unigram counts, vocab, the
        # scoring join) — without persist each recomputes the tokenize
        # + explode lineage (the minhash-shingles lesson)
        .persist()
    )
    big_counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni_counts = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        bg.select(F.col("w1").alias("w"))
        .union(bg.select(F.col("w2").alias("w")))
        .distinct()
        .agg(F.count(F.lit(1)).alias("v"))
    )
    return (
        bg.join(big_counts, ["w1", "w2"])
        .join(uni_counts, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.expr("((c12 + 1) * 1000000) DIV (c1 + v)").alias("term"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("term").cast("bigint").alias("lm_score_q"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_corpus_report",
    oracle="""
SELECT COALESCE(lang, 'ALL') AS lang_g,
       COALESCE(source, 'ALL') AS source_g,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS avg_chars,
       CAST((1000 * COUNT(*) FILTER (WHERE n_chars < 200)) // COUNT(*) AS BIGINT)
         AS short_permille
FROM documents
GROUP BY GROUPING SETS ((lang, source), (lang), ())
ORDER BY lang_g, source_g
""",
    category="text",
)
def text_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report — the rollup a data curation run
    publishes per ingest: document counts, volume, and a short-doc
    rate per (lang, source), per lang, and overall, in ONE pass via
    GROUPING SETS (each row is computed from map-side partials; no
    per-slice re-scan). All metrics are integer arithmetic (sums,
    integer division, permille counts) so the cross-engine hash can
    never hinge on a float ulp."""
    t = Tables(spark, sf_dir)
    return (
        t.documents.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_p"),
            F.sum("n_chars").alias("chars_p"),
            F.count_if(F.col("n_chars") < 200).alias("short_p"),
        )
        .rollup("lang", "source")
        .agg(
            F.sum("n_docs_p").alias("n_docs"),
            F.sum("chars_p").alias("total_chars"),
            F.sum("short_p").alias("short_n"),
        )
        .select(
            F.coalesce(F.col("lang"), F.lit("ALL")).alias("lang_g"),
            F.coalesce(F.col("source"), F.lit("ALL")).alias("source_g"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("total_chars").cast("bigint").alias("total_chars"),
            F.expr("total_chars DIV n_docs").cast("bigint").alias("avg_chars"),
            F.expr("(1000 * short_n) DIV n_docs").cast("bigint").alias("short_permille"),
        )
        .orderBy("lang_g", "source_g")
    )


@query(
    "text_temperature_mix",
    oracle="""
WITH per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(SUM(tokens) AS BIGINT) AS total_tokens,
         CAST(MAX(tokens) AS BIGINT) AS max_tokens
  FROM per
)
SELECT source, n_docs, tokens,
       CAST(floor(tokens * 1000000 / total_tokens) AS BIGINT) AS nat_share_ppm,
       floor(sqrt(CAST(max_tokens AS DOUBLE) / CAST(tokens AS DOUBLE))
             * 1000000.0) / 1000000.0 AS temp_upsample6
FROM per, tot
ORDER BY source
""",
    category="text",
)
def text_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing weights (r08) — the data-mixing
    step every multi-source pretraining corpus goes through (GPT-3 /
    PaLM style): at temperature alpha = 0.5 a source's sampling weight
    is proportional to its token share raised to alpha, which means a
    source gets upsampled relative to the LARGEST source by
    sqrt(max_tokens / tokens). The report emits per-source doc/token
    counts, the natural token share (exact integer ppm), and that
    relative upsample factor.

    Determinism: the only float op is ONE division + ONE sqrt on exact
    bigint token counts — both IEEE-correctly-rounded and identical
    cross-engine (libm pow(x, 0.5) is NOT guaranteed correctly rounded,
    and normalizing by sum-of-doubles would be summation-order-
    dependent, so the factor normalizes by max instead). Scale shape:
    one partial/final groupBy over the corpus + a broadcast one-row
    total."""
    t = Tables(spark, sf_dir)
    per = t.documents.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint").alias("tokens"),
    )
    tot = per.agg(
        F.sum("tokens").cast("bigint").alias("total_tokens"),
        F.max("tokens").cast("bigint").alias("max_tokens"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "tokens",
            F.floor(F.col("tokens") * 1000000 / F.col("total_tokens"))
            .cast("bigint")
            .alias("nat_share_ppm"),
            (
                F.floor(
                    F.sqrt(
                        F.col("max_tokens").cast("double")
                        / F.col("tokens").cast("double")
                    )
                    * 1000000.0
                )
                / 1000000.0
            ).alias("temp_upsample6"),
        )
        .orderBy("source")
    )


def apply_mixture(docs: DataFrame, plan: DataFrame) -> DataFrame:
    """Materialize a temperature-mixed corpus from a per-source plan
    (VERDICT r08 #7 — closes the loop from text_temperature_mix's
    "compute the mix" to "produce the mixture").

    ``plan`` carries (source, upsample_ppm) with upsample_ppm =
    floor(sqrt(max_tokens / tokens) * 1e6) >= 1e6. Each document is
    emitted ``upsample_ppm DIV 1e6`` times (whole epochs, epoch index
    0..k-1), and the fractional remainder ``upsample_ppm % 1e6`` is
    realized by deterministic hash-threshold selection: a doc joins
    the extra epoch iff md5('mix:' || doc_id) % 1e6 < frac_ppm —
    reproducible across reruns, engines, and layouts (no rand()), with
    the realized fractional count within binomial O(sqrt(n)) of
    n * frac_ppm / 1e6.

    Scale shape: the plan is one-row-per-source (broadcast); whole-
    epoch replication is a map-side explode and the fractional pick a
    map-side filter — ZERO shuffles, no per-source sort (an exact-rank
    top-frac pick would need a row_number partitioned by source, a
    single-task sort on the largest source at corpus scale; the hash
    threshold is the 100 TB path)."""
    joined = docs.join(F.broadcast(plan), "source")
    epochs = joined.select(
        "source",
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), (F.expr("upsample_ppm DIV 1000000") - 1).cast("int"))
        ).alias("epoch"),
    )
    hash_ppm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % 1000000
    )
    extras = joined.filter(hash_ppm < F.col("upsample_ppm") % 1000000).select(
        "source",
        "doc_id",
        F.expr("upsample_ppm DIV 1000000").cast("int").alias("epoch"),
    )
    return epochs.unionByName(extras)


@query(
    "text_apply_mixture",
    oracle="""
WITH per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(MAX(tokens) AS BIGINT) AS max_tokens FROM per
), plan AS (
  SELECT source, n_docs,
         CAST(floor(sqrt(CAST(max_tokens AS DOUBLE) / CAST(tokens AS DOUBLE))
                    * 1000000.0) AS BIGINT) AS upsample_ppm
  FROM per, tot
), ext AS (
  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_extra
  FROM documents d JOIN plan p ON d.source = p.source
  WHERE ('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
        % 1000000 < p.upsample_ppm % 1000000
  GROUP BY d.source
)
SELECT p.source, p.n_docs, p.upsample_ppm,
       p.upsample_ppm // 1000000 AS full_epochs,
       (p.n_docs * p.upsample_ppm) // 1000000 AS planned_docs,
       p.n_docs * (p.upsample_ppm // 1000000) + COALESCE(e.n_extra, 0) AS emitted_docs
FROM plan p LEFT JOIN ext e ON p.source = e.source
ORDER BY p.source
""",
    category="text",
)
def text_apply_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the temperature-mixing plan (r09): build the per-source
    integer-ppm plan exactly as text_temperature_mix does, MATERIALIZE
    the mixed corpus via apply_mixture (whole-epoch explode + hash-
    threshold fractional pick), and report per-source planned vs
    actually-emitted document counts. The oracle derives emitted_docs
    arithmetically (n_docs * full_epochs + |{hash < frac}|), so a
    hash match proves the materialization realizes the plan exactly.

    Determinism: upsample_ppm uses one correctly-rounded sqrt on exact
    bigint token counts, then everything downstream is integer
    arithmetic (DIV / %% / md5-derived ppm buckets) — no float sums,
    no rand(). Scale shape: plan = one partial/final groupBy + a
    broadcast one-row max; materialization is shuffle-free (see
    apply_mixture); the final per-source count is a partial agg over
    the mixture."""
    t = Tables(spark, sf_dir)
    per = t.documents.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint").alias("tokens"),
    )
    tot = per.agg(F.max("tokens").cast("bigint").alias("max_tokens"))
    plan = (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.floor(
                F.sqrt(F.col("max_tokens").cast("double") / F.col("tokens").cast("double"))
                * 1000000.0
            )
            .cast("bigint")
            .alias("upsample_ppm"),
        )
    )
    # plan is consumed twice (mixture join + final report join); persist
    # the per-source frame or the full-corpus groupBy behind it runs
    # once per consumer (the multi-consumer recompute rule)
    plan = plan.persist()
    mixture = apply_mixture(t.documents, plan.select("source", "upsample_ppm"))
    emitted = mixture.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("emitted_docs")
    )
    return (
        plan.join(emitted, "source", "left")
        .select(
            "source",
            "n_docs",
            "upsample_ppm",
            F.expr("upsample_ppm DIV 1000000").alias("full_epochs"),
            F.expr("(n_docs * upsample_ppm) DIV 1000000").alias("planned_docs"),
            F.coalesce(F.col("emitted_docs"), F.lit(0).cast("bigint")).alias(
                "emitted_docs"
            ),
        )
        .orderBy("source")
    )


@query(
    "text_quality_filter_per_source",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, source,
         floor((0.4 * least(n_words / 100.0, 1.0)
               + 0.3 * least(stopword_ratio * 5, 1.0)
               + 0.3 * least(mean_word_len / 8.0, 1.0)) * 1000000.0)
           / 1000000.0 AS quality
  FROM (
    SELECT doc_id, source,
           len(string_split(text, ' ')) AS n_words,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / len(string_split(text, ' ')) AS mean_word_len,
           CAST(len(list_filter(string_split(text, ' '),
                                w -> list_contains({_STOPWORDS!r}, w))) AS DOUBLE)
             / len(string_split(text, ' ')) AS stopword_ratio
    FROM documents
  )
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY quality, doc_id) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_docs
  FROM scored
), med AS (
  SELECT source, n_docs, quality AS med_quality
  FROM ranked WHERE rn = (n_docs + 1) // 2
)
SELECT m.source, m.n_docs, m.med_quality,
       CAST(COUNT(*) FILTER (WHERE s.quality >= m.med_quality) AS BIGINT)
         AS n_kept,
       (CAST(COUNT(*) FILTER (WHERE s.quality >= m.med_quality) AS BIGINT)
         * 1000000) // m.n_docs AS kept_ppm
FROM scored s JOIN med m ON s.source = m.source
GROUP BY m.source, m.n_docs, m.med_quality
ORDER BY m.source
""",
    category="text",
)
def text_quality_filter_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source adaptive quality filtering (r09) — the CCNet-style
    move: instead of one global quality cutoff (which empties
    low-resource sources and barely touches clean ones), each source
    is thresholded at ITS OWN median quality and the filter keeps its
    upper half. The threshold is the rank-based LOWER median (the
    value at row (n+1) DIV 2 ordered by (quality, doc_id)) — pure
    order statistics, zero float interpolation, so it is bit-identical
    cross-engine where percentile interpolation arithmetic would be a
    liability.

    Scale shape: scoring is map-side (JVM higher-order functions);
    the median needs a per-source ordered row_number — fine while
    sources are shard-sized, and the documented 100 TB path swaps the
    exact rank for approx_percentile (mergeable sketch, no per-source
    sort) with an epsilon-rank guarantee. Keep-counting happens inside
    the same windowed pass (the median is re-broadcast to the
    partition's rows as a window aggregate), so documents are scored
    exactly once."""
    t = Tables(spark, sf_dir)
    w = _words()
    n_words = F.size(w)
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    mean_word_len = (
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double") / n_words
    )
    stopword_ratio = (
        F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x))).cast("double")
        / n_words
    )
    quality = _q6(
        0.4 * F.least(n_words / 100.0, F.lit(1.0))
        + 0.3 * F.least(stopword_ratio * 5, F.lit(1.0))
        + 0.3 * F.least(mean_word_len / 8.0, F.lit(1.0))
    )
    scored = t.documents.select("doc_id", "source", quality.alias("quality"))
    from pyspark.sql import Window

    # Single-pass shape (optimization r14, guide §2.4): the old plan
    # scored every document TWICE — once under the median window and
    # once as the probe side of a broadcast threshold join — so the
    # expensive per-word quality expression (split + stopword filter)
    # ran over two full scans. The median is just the quality value at
    # rank (n+1) DIV 2, so broadcast it to the partition's rows as a
    # third window aggregate over the SAME partition key: one scan, one
    # exchange, no join, bit-identical keep counts.
    win = Window.partitionBy("source").orderBy("quality", "doc_id")
    win_all = Window.partitionBy("source")
    ranked = (
        scored.withColumn("rn", F.row_number().over(win))
        .withColumn("n_docs", F.count(F.lit(1)).over(win_all).cast("bigint"))
        .withColumn(
            "med_quality",
            F.max(
                F.when(F.col("rn") == F.expr("(n_docs + 1) DIV 2"), F.col("quality"))
            ).over(win_all),
        )
    )
    return (
        ranked.groupBy("source", "n_docs", "med_quality")
        .agg(
            F.count(F.when(F.col("quality") >= F.col("med_quality"), 1))
            .cast("bigint")
            .alias("n_kept")
        )
        .select(
            "source",
            "n_docs",
            "med_quality",
            "n_kept",
            F.expr("(n_kept * 1000000) DIV n_docs").alias("kept_ppm"),
        )
        .orderBy("source")
    )


@query(
    "text_normalize_dedup",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
         upper(text) || '!!! ' || upper(text)
  FROM documents WHERE doc_id % 4 = 0
  UNION ALL
  SELECT doc_id + 2000000,
         '  ' || replace(text, ' ', '   ') || ', ' || replace(text, ' ', '   ') || '.'
  FROM documents WHERE doc_id % 4 = 0
), norm AS (
  SELECT doc_id,
         trim(regexp_replace(
           regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
           ' +', ' ', 'g')) AS norm_text
  FROM corpus
)
SELECT md5(norm_text) AS norm_hash,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_variants,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS variant_ids
FROM norm
GROUP BY md5(norm_text)
HAVING COUNT(*) > 1
ORDER BY keeper_doc_id
""",
    category="dedup",
)
def text_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-aware exact dedup (r09): documents that differ
    only in case, punctuation, or whitespace runs are the cheapest
    near-dups a corpus carries, and catching them with a canonical-form
    hash (lowercase -> strip non-alphanumerics -> collapse spaces ->
    md5) costs ONE digest shuffle — no shingles, no bands. Run it
    before MinHash so the LSH stage spends its candidate budget on
    real paraphrases instead of trivial variants. Emits one row per
    surviving cluster (keeper = min doc_id, Iceberg-style pick).

    Scale shape: normalization is map-side JVM regex inside codegen;
    the groupBy shuffles 32-char digests + doc ids only (never text);
    identical to dedup_exact's digest-shuffle bound.

    The fixture corpus is already lowercase/punctuation-free, so the
    query derives the adversarial input itself: every 4th doc gains an
    UPPERCASED '!!!'-doubled variant and a whitespace-exploded
    comma/period variant (same derivation in the oracle) — each must
    collapse... except doubling changes content: the uppercase variant
    doubles the text and the whitespace variant doubles it too, so the
    two VARIANTS pair with each other while the original stays
    distinct, a sharper check than variant==original."""
    t = Tables(spark, sf_dir)
    base = t.documents.select("doc_id", "text")
    quarter = base.filter(F.col("doc_id") % 4 == 0)
    v_upper = quarter.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("!!! "), F.upper("text")).alias("text"),
    )
    v_space = quarter.select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(
            F.lit("  "),
            F.replace(F.col("text"), F.lit(" "), F.lit("   ")),
            F.lit(", "),
            F.replace(F.col("text"), F.lit(" "), F.lit("   ")),
            F.lit("."),
        ).alias("text"),
    )
    corpus = base.unionByName(v_upper).unionByName(v_space)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return (
        corpus.select("doc_id", F.md5(norm).alias("norm_hash"))
        .groupBy("norm_hash")
        .agg(
            F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_variants"),
            F.concat_ws(",", F.sort_array(F.collect_list("doc_id")).cast("array<string>"))
            .alias("variant_ids"),
        )
        .filter(F.col("n_variants") > 1)
        .select("norm_hash", "keeper_doc_id", "n_variants", "variant_ids")
        .orderBy("keeper_doc_id")
    )


@query(
    "text_split_leakage_safe",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
         upper(text) || '!!! ' || upper(text)
  FROM documents WHERE doc_id % 4 = 0
  UNION ALL
  SELECT doc_id + 2000000,
         '  ' || replace(text, ' ', '   ') || ', ' || replace(text, ' ', '   ') || '.'
  FROM documents WHERE doc_id % 4 = 0
), norm AS (
  SELECT doc_id,
         md5(trim(regexp_replace(
           regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
           ' +', ' ', 'g'))) AS norm_hash
  FROM corpus
), labeled AS (
  SELECT doc_id, norm_hash,
         CASE WHEN ('0x' || substr(md5('split:' || norm_hash), 1, 15))::BIGINT % 100 < 80
              THEN 'train'
              WHEN ('0x' || substr(md5('split:' || norm_hash), 1, 15))::BIGINT % 100 < 90
              THEN 'val' ELSE 'test' END AS split,
         CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 80
              THEN 'train'
              WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90
              THEN 'val' ELSE 'test' END AS naive_split
  FROM norm
), naive_leaks AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS naive_leaky_clusters FROM (
    SELECT norm_hash FROM labeled
    GROUP BY norm_hash HAVING COUNT(DISTINCT naive_split) > 1
  )
)
SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT norm_hash) AS BIGINT) AS n_clusters,
       naive_leaky_clusters
FROM labeled, naive_leaks
GROUP BY split, naive_leaky_clusters
ORDER BY split
""",
    category="text",
)
def text_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split (r10): assigning splits by a
    hash of the DOCUMENT ID puts trivial variants of the same content
    on both sides of the train/eval fence — the classic contamination
    path benchmark-decontamination papers warn about. Splitting by the
    CANONICAL-CONTENT hash instead (the text_normalize_dedup canonical
    form) pins every normalization-equivalent variant to one split by
    construction. The query builds the same adversarial variant corpus
    as text_normalize_dedup, emits per-split doc/cluster counts under
    the content split, and carries `naive_leaky_clusters` — how many
    clusters the doc-id split would have TORN ACROSS splits (non-zero
    on this corpus; exactly zero by construction for the content
    split, which is why the per-split n_clusters sum equals the global
    cluster count the oracle hashes).

    Scale shape: one map-side normalize+md5 pass, one digest-grain
    shuffle for the leak audit, one split-grain aggregate — same
    digest-shuffle bound as dedup_exact; no text moves after the hash.
    For real pipelines the split hash ('split:' salt) is independent
    of the dedup hash, so re-salting re-rolls splits without touching
    cluster identity."""
    t = Tables(spark, sf_dir)
    base = t.documents.select("doc_id", "text")
    quarter = base.filter(F.col("doc_id") % 4 == 0)
    v_upper = quarter.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("!!! "), F.upper("text")).alias("text"),
    )
    v_space = quarter.select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(
            F.lit("  "),
            F.replace(F.col("text"), F.lit(" "), F.lit("   ")),
            F.lit(", "),
            F.replace(F.col("text"), F.lit(" "), F.lit("   ")),
            F.lit("."),
        ).alias("text"),
    )
    corpus = base.unionByName(v_upper).unionByName(v_space)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )

    def ppm_split(key_col):
        raw = F.conv(F.substring(F.md5(key_col), 1, 15), 16, 10).cast("bigint") % 100
        return (
            F.when(raw < 80, "train").when(raw < 90, "val").otherwise("test")
        )

    labeled = corpus.select(
        "doc_id",
        F.md5(norm).alias("norm_hash"),
    ).select(
        "doc_id",
        "norm_hash",
        ppm_split(F.concat(F.lit("split:"), F.col("norm_hash"))).alias("split"),
        ppm_split(F.col("doc_id").cast("string")).alias("naive_split"),
    ).localCheckpoint(eager=True)  # feeds the leak audit AND the
    # per-split aggregate; localCheckpoint not persist (ADVICE r10 #4)
    # so repeated invocations don't accumulate in the CacheManager —
    # blocks are ContextCleaner-freed once the result is GC'd
    naive_leaks = (
        labeled.groupBy("norm_hash")
        .agg(F.countDistinct("naive_split").alias("k"))
        .filter(F.col("k") > 1)
        .agg(F.count(F.lit(1)).cast("bigint").alias("naive_leaky_clusters"))
    )
    return (
        labeled.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("norm_hash").cast("bigint").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(naive_leaks))
        .select("split", "n_docs", "n_clusters", "naive_leaky_clusters")
        .orderBy("split")
    )


@query(
    "text_dsir_select",
    oracle="""
WITH wl AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     w -> len(w) > 0) AS ws
  FROM documents
), bg AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(ws[i] || ' ' || ws[i + 1]), 1, 15))::BIGINT
           % 512 AS b
  FROM wl CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(ws) - 1)) AS i
  ) gs
), raw_c AS (
  SELECT b, COUNT(*) AS cr FROM bg GROUP BY b
), tgt_c AS (
  SELECT b, COUNT(*) AS ct FROM bg WHERE lang = 'en' GROUP BY b
), tot AS (
  SELECT (SELECT COUNT(*) FROM bg) AS r_tot,
         (SELECT COUNT(*) FROM bg WHERE lang = 'en') AS t_tot
), w AS (
  SELECT raw_c.b,
         ((COALESCE(tgt_c.ct, 0) + 1) * 1000000) // (tot.t_tot + 512)
       - ((raw_c.cr + 1) * 1000000) // (tot.r_tot + 512) AS wq
  FROM raw_c LEFT JOIN tgt_c ON raw_c.b = tgt_c.b CROSS JOIN tot
), scored AS (
  SELECT bg.doc_id, bg.lang,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(w.wq) AS BIGINT) AS score_q
  FROM bg JOIN w ON bg.b = w.b
  GROUP BY bg.doc_id, bg.lang
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY score_q DESC, doc_id) AS rnk,
         COUNT(*) OVER () AS n
  FROM scored
)
SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, lang, n_grams, score_q
FROM ranked WHERE rnk <= n // 4
ORDER BY rnk
""",
    category="text",
)
def text_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection via importance resampling (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling") — the pretrain-pipeline stage that picks raw documents
    resembling a target domain: hash each document's bag of word
    bigrams into B=512 buckets, fit target (lang='en') and raw (whole
    corpus) bucket unigram models with add-one smoothing, weight each
    bucket by its likelihood ratio, score every document by the sum of
    its occurrences' weights, and keep the top quarter.

    Determinism posture: the paper's log-likelihood ratio is replaced
    by the LINEAR ratio difference in exact BIGINT fixed-point — each
    bucket contributes floor(1e6·(ct+1)/(T+B)) − floor(1e6·(cr+1)/(R+B))
    — because float log sums are ulp-unstable across engines while
    integer multiply/divide is bit-exact (the text_bigram_lm_score
    rule); log would only compress the same per-bucket ordering. The
    feature hash is the portable md5→int60 bridge the hash-split and
    MinHash paths use, so Spark and DuckDB bucket identically.

    Scale shape: tokenize + hash are per-row map work inside codegen;
    the two models are B-bucket aggregates (tiny); the weight table is
    a BROADCAST join back onto the n-gram stream (B=512 rows — no
    shuffle); per-doc scoring is one doc-keyed aggregate. The global
    top-fraction window is doc-grain (one row per document, orders of
    magnitude under the token stream); at 100 TB replace it with a
    score threshold from approx_percentile — the scoring pipeline
    upstream is unchanged. Reference surface: Trino serves this as
    plain SQL over the same hash/agg primitives
    (/root/reference/tf/main.tf:82-114)."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    docs = t.documents.select(
        "doc_id",
        "lang",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z]+"),
            lambda w: F.length(w) > 0,
        ).alias("ws"),
    )
    bg = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "zip_with(slice(ws, 1, greatest(size(ws) - 1, 0)), "
                    "slice(ws, 2, greatest(size(ws) - 1, 0)), "
                    "(a, b) -> concat(a, ' ', b))"
                )
            ).alias("g"),
        )
        .select(
            "doc_id",
            "lang",
            (
                F.conv(F.substring(F.md5(F.col("g")), 1, 15), 16, 10)
                .cast("bigint")
                % 512
            ).alias("b"),
        )
        # four consumers (raw counts, target counts, totals, scoring
        # join) — persist or each recomputes tokenize+explode+md5
        .persist()
    )
    raw_c = bg.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt_c = (
        bg.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    tot = bg.agg(
        F.count(F.lit(1)).alias("r_tot"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("t_tot"),
    )
    w = (
        raw_c.join(tgt_c, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.expr("((coalesce(ct, 0) + 1) * 1000000) DIV (t_tot + 512)")
                - F.expr("((cr + 1) * 1000000) DIV (r_tot + 512)")
            ).alias("wq"),
        )
    )
    scored = (
        bg.join(F.broadcast(w), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum("wq").cast("bigint").alias("score_q"),
        )
    )
    n = scored.agg(F.count(F.lit(1)).alias("n"))
    ranked = scored.withColumn(
        "rnk",
        F.row_number()
        .over(Window.orderBy(F.desc("score_q"), F.asc("doc_id")))
        .cast("bigint"),
    )
    return (
        ranked.crossJoin(F.broadcast(n))
        .filter(F.col("rnk") <= F.expr("n DIV 4"))
        .select("rnk", "doc_id", "lang", "n_grams", "score_q")
        .orderBy("rnk")
    )
