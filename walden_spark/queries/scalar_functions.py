"""Scalar function families — SURVEY.md §2.8.

One query per family, each emitting several representative functions
over fixture rows. Trino↔Spark name drift is resolved per SURVEY §2.8
(strpos→instr/locate, split_part→element_at(split), random→rand, …);
Spark↔DuckDB drift is resolved in the oracle text.

Transcendental functions (sin/exp/ln) go through floor-quantization at 1e-9: libm vs
Java Math can differ in the final ulp; everything else is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from walden_spark.registry import query
from walden_spark.tables import Tables, register_views


@query(
    "fn_string",
    oracle="""
SELECT p_partkey,
       concat(p_brand, ':', p_name) AS branded,
       length(p_name) AS name_len,
       upper(p_name) AS uc, lower(p_brand) AS lc,
       trim('  pad  ') AS trimmed,
       substr(p_name, 1, 3) AS first3,
       replace(p_name, ' ', '_') AS underscored,
       split_part(p_name, ' ', 1) AS first_word,
       strpos(p_name, 'e') AS e_pos,
       reverse(p_brand) AS rev,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded,
       rpad(p_brand, 10, '.') AS rpadded,
       starts_with(p_name, 'red') AS is_red,
       p_name[1:1] = 's' AS starts_s
FROM part WHERE p_partkey < 500
""",
    category="function",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: concat/length/case/trim/substr/replace/split_part/
    strpos/reverse/pads/starts_with (1-based substr like Trino)."""
    t = Tables(spark, sf_dir)
    return t.part.filter(F.col("p_partkey") < 500).select(
        "p_partkey",
        F.concat("p_brand", F.lit(":"), "p_name").alias("branded"),
        F.length("p_name").cast("long").alias("name_len"),
        F.upper("p_name").alias("uc"),
        F.lower("p_brand").alias("lc"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.substring("p_name", 1, 3).alias("first3"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("underscored"),
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
        F.instr("p_name", "e").cast("long").alias("e_pos"),
        F.reverse("p_brand").alias("rev"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded"),
        F.rpad("p_brand", 10, ".").alias("rpadded"),
        F.startswith("p_name", F.lit("red")).alias("is_red"),
        (F.substring("p_name", 1, 1) == "s").alias("starts_s"),
    )


@query(
    "fn_regex",
    oracle="""
SELECT doc_id,
       regexp_matches(source, '^src[0-9]+$') AS src_like,
       regexp_extract(source, '([0-9]+)', 1) AS src_num,
       regexp_replace(text, '[aeiou]', '*', 'g') AS devoweled_prefix,
       len(regexp_extract_all(text, '[a-z]+')) AS n_tokens
FROM (SELECT doc_id, source, substr(text, 1, 40) AS text FROM documents WHERE doc_id < 50)
""",
    category="function",
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family: rlike / regexp_extract(_all) / regexp_replace
    (patterns restricted to the Java∩RE2 common dialect, SURVEY §2.8)."""
    t = Tables(spark, sf_dir)
    src = t.documents.filter(F.col("doc_id") < 50).select(
        "doc_id", "source", F.substring("text", 1, 40).alias("text")
    )
    return src.select(
        "doc_id",
        F.col("source").rlike("^src[0-9]+$").alias("src_like"),
        F.regexp_extract("source", "([0-9]+)", 1).alias("src_num"),
        F.regexp_replace("text", "[aeiou]", "*").alias("devoweled_prefix"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), 0)).cast("long").alias("n_tokens"),
    )


@query(
    "fn_datetime",
    oracle="""
SELECT o_orderkey,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
       CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS dy,
       CAST(EXTRACT(DOW FROM o_orderdate) AS INT) AS dow_sun0,
       CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
       date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS days_to_y2k,
       strftime(o_orderdate, '%Y-%m-%d') AS formatted,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m
FROM orders WHERE o_orderkey < 500
""",
    category="function",
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: date_trunc/extract/interval arithmetic/
    date_diff/format/epoch/last_day/add_months."""
    t = Tables(spark, sf_dir)
    return t.orders.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("dy"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow_sun0"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).cast("date").alias("plus30"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), "o_orderdate").cast("long").alias("days_to_y2k"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("formatted"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.last_day("o_orderdate").alias("month_end"),
        F.add_months("o_orderdate", 3).alias("plus3m"),
    )


@query(
    "fn_math",
    oracle="""
SELECT vec_id,
       abs(x) AS ax, CAST(ceil(x) AS BIGINT) AS cx, CAST(floor(x) AS BIGINT) AS fx, round(x, 2) AS rx,
       floor(power(abs(x), 2.0) * 1000000000.0) / 1000000000.0 AS p2,
       floor(exp(x / 100) * 1000000000.0) / 1000000000.0 AS ex,
       floor(ln(abs(x) + 1) * 1000000000.0) / 1000000000.0 AS lnx,
       floor(log10(abs(x) + 1) * 1000000000.0) / 1000000000.0 AS log10x,
       floor(sqrt(abs(x)) * 1000000000.0) / 1000000000.0 AS sqx,
       CAST(vec_id % 7 AS BIGINT) AS m7,
       CAST(sign(x - 50) AS DOUBLE) AS sgn,
       floor(sin(x / 10) * 1000000000.0) / 1000000000.0 AS sx,
       greatest(x, 50.0) AS gr, least(x, 50.0) AS le,
       floor(pi() * 1000000000.0) / 1000000000.0 AS pi_val
FROM (SELECT vec_id, CAST(vec_id AS DOUBLE) + 0.25 AS x FROM embeddings WHERE vec_id < 200)
""",
    category="function",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: abs/ceil/floor/round/power/exp/ln/log10/sqrt/mod/
    sign/sin/greatest/least/pi (transcendentals rounded: libm ulps)."""
    t = Tables(spark, sf_dir)
    src = t.embeddings.filter(F.col("vec_id") < 200).select(
        "vec_id", (F.col("vec_id").cast("double") + 0.25).alias("x")
    )
    x = F.col("x")
    return src.select(
        "vec_id",
        F.abs(x).alias("ax"),
        F.ceil(x).alias("cx"),
        F.floor(x).alias("fx"),
        F.round(x, 2).alias("rx"),
        (F.floor(F.pow(F.abs(x), 2.0) * 1e9) / 1e9).alias("p2"),
        (F.floor(F.exp(x / 100) * 1e9) / 1e9).alias("ex"),
        (F.floor(F.log(F.abs(x) + 1) * 1e9) / 1e9).alias("lnx"),
        (F.floor(F.log10(F.abs(x) + 1) * 1e9) / 1e9).alias("log10x"),
        (F.floor(F.sqrt(F.abs(x)) * 1e9) / 1e9).alias("sqx"),
        (F.col("vec_id") % 7).cast("long").alias("m7"),
        F.signum(x - 50).alias("sgn"),
        (F.floor(F.sin(x / 10) * 1e9) / 1e9).alias("sx"),
        F.greatest(x, F.lit(50.0)).alias("gr"),
        F.least(x, F.lit(50.0)).alias("le"),
        (F.floor(F.lit(3.141592653589793) * 1e9) / 1e9).alias("pi_val"),
    )


@query(
    "fn_bitwise",
    oracle="""
SELECT o_orderkey,
       o_orderkey & 255 AS band,
       o_orderkey | 4096 AS bor,
       xor(o_orderkey, 1023) AS bxor,
       o_orderkey << 2 AS shl,
       o_orderkey >> 3 AS shr
FROM orders WHERE o_orderkey < 1000
""",
    category="function",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor/shifts."""
    t = Tables(spark, sf_dir)
    k = F.col("o_orderkey")
    return t.orders.filter(k < 1000).select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(4096)).alias("bor"),
        k.bitwiseXOR(F.lit(1023)).alias("bxor"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
    )


@query(
    "fn_array",
    oracle="""
SELECT doc_id,
       len(words) AS cardinality,
       words[1] AS first_word,
       words[-1] AS last_word,
       list_contains(words, 'data') AS has_data,
       len(list_distinct(words)) AS n_distinct,
       array_to_string(list_sort(list_distinct(words))[1:3], '|') AS first3_sorted,
       list_position(words, 'the') AS the_pos,
       array_to_string(flatten([words[1:2], words[3:4]]), '|') AS reflat,
       list_transform(words, w -> upper(w))[1] AS first_uc,
       len(list_filter(words, w -> length(w) > 4)) AS n_long,
       list_reduce(list_transform(words, w -> length(w)), (a, b) -> a + b) AS total_chars,
       array_to_string([doc_id, doc_id + 1, doc_id + 2], '|') AS seq3
FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents WHERE doc_id < 30)
""",
    category="function",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family incl. higher-order fns: cardinality/element_at/
    contains/distinct/sort/slice/position/flatten/transform/filter/
    reduce/sequence (near-1:1 with Trino per SURVEY §2.8).

    Array-valued outputs are emitted as '|'-joined strings: the driver's
    pandas canonicalizer cannot sort list-valued cells (r04 driver ERR),
    and a delimiter join is escaping-proof on both engines — the array
    functions themselves still run, only the emission is serialized."""
    t = Tables(spark, sf_dir)
    src = t.documents.filter(F.col("doc_id") < 30).select(
        "doc_id", F.split("text", " ").alias("words")
    )
    w = F.col("words")
    return src.select(
        "doc_id",
        F.size(w).cast("long").alias("cardinality"),
        F.element_at(w, 1).alias("first_word"),
        F.element_at(w, -1).alias("last_word"),
        F.array_contains(w, "data").alias("has_data"),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct"),
        F.concat_ws("|", F.slice(F.array_sort(F.array_distinct(w)), 1, 3)).alias("first3_sorted"),
        F.array_position(w, "the").cast("long").alias("the_pos"),
        F.concat_ws("|", F.flatten(F.array(F.slice(w, 1, 2), F.slice(w, 3, 2)))).alias("reflat"),
        F.element_at(F.transform(w, lambda x: F.upper(x)), 1).alias("first_uc"),
        F.size(F.filter(w, lambda x: F.length(x) > 4)).cast("long").alias("n_long"),
        F.aggregate(
            F.transform(w, lambda x: F.length(x).cast("long")), F.lit(0).cast("long"), lambda a, b: a + b
        ).alias("total_chars"),
        F.concat_ws(
            "|", F.transform(F.sequence(F.col("doc_id"), F.col("doc_id") + 2), lambda x: x.cast("string"))
        ).alias("seq3"),
    )


@query(
    "fn_array_zip",
    oracle="""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       list_reduce(list_transform(list_zip(a.embedding, b.embedding),
                                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                   (x, y) -> x + y) AS dot
FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
WHERE a.vec_id < 20
""",
    category="function",
)
def fn_array_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zip_with + aggregate → dot product of adjacent embedding vectors
    (sequential left-fold in both engines → identical doubles)."""
    t = Tables(spark, sf_dir)
    a = t.embeddings.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea")
    )
    b = t.embeddings.select((F.col("vec_id")).alias("id_b"), F.col("embedding").alias("eb"))
    joined = a.join(b, F.col("id_b") == F.col("id_a") + 1)
    dot = F.aggregate(
        F.zip_with(F.col("ea"), F.col("eb"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return joined.select("id_a", "id_b", dot.alias("dot"))


@query(
    "fn_map",
    oracle="""
SELECT doc_id,
       m['lang'][1] AS lang_val,
       len(map_keys(m)) AS n_keys,
       array_to_string(list_sort(map_keys(m)), '|') AS keys_sorted,
       array_to_string(list_sort(map_values(m)), '|') AS vals_sorted
FROM (SELECT doc_id, MAP {'lang': lang, 'source': source} AS m
      FROM documents WHERE doc_id < 30)
""",
    category="function",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: construction/element_at/map_keys/map_values (scalar
    or sorted projections — raw map values compare engine-specifically).

    Sorted key/value lists are '|'-joined so the driver canonicalizer
    can hash them (r04 driver ERR on list-valued cells)."""
    t = Tables(spark, sf_dir)
    src = t.documents.filter(F.col("doc_id") < 30).select(
        "doc_id", F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")).alias("m")
    )
    return src.select(
        "doc_id",
        F.element_at(F.col("m"), "lang").alias("lang_val"),
        F.size(F.map_keys(F.col("m"))).cast("long").alias("n_keys"),
        F.concat_ws("|", F.array_sort(F.map_keys(F.col("m")))).alias("keys_sorted"),
        F.concat_ws("|", F.array_sort(F.map_values(F.col("m")))).alias("vals_sorted"),
    )


@query(
    "fn_json",
    oracle="""
SELECT event_id,
       CAST(props->>'$.k' AS BIGINT) AS k_val,
       json_extract_string(props, '$.k') AS k_str,
       json_valid(props) AS is_valid,
       CAST(json_array_length('[1,2,3]') AS BIGINT) AS arr_len
FROM events WHERE event_id < 200
""",
    category="function",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family over events.props: get_json_object / from_json /
    json_array_length (Trino json_extract* ↔ Spark get_json_object)."""
    t = Tables(spark, sf_dir)
    return t.events.filter(F.col("event_id") < 200).select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k BIGINT").isNotNull().alias("is_valid"),
        F.json_array_length(F.lit("[1,2,3]")).cast("bigint").alias("arr_len"),
    )


@query(
    "fn_struct",
    oracle="""
SELECT n_nationkey,
       {'name': n_name, 'region': n_regionkey}.name AS s_name,
       {'name': n_name, 'region': n_regionkey}.region AS s_region
FROM nation
""",
    category="function",
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW construction + field access (struct → .field)."""
    t = Tables(spark, sf_dir)
    s = F.struct(F.col("n_name").alias("name"), F.col("n_regionkey").alias("region"))
    return t.nation.select(
        "n_nationkey", s.getField("name").alias("s_name"), s.getField("region").alias("s_region")
    )


@query(
    "fn_hash",
    oracle="""
SELECT doc_id,
       md5(source) AS h_md5,
       sha256(source) AS h_sha256,
       lower(to_hex(CAST(doc_id AS BIGINT))) AS hx,
       to_base64(CAST(source AS BLOB)) AS b64,
       CAST(from_base64(to_base64(CAST(source AS BLOB))) AS VARCHAR) AS roundtrip
FROM documents WHERE doc_id < 100
""",
    category="function",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/binary family: md5/sha256/hex/base64 (xxhash64 excluded:
    Spark's seed differs from other engines — exercised in dedup ops)."""
    t = Tables(spark, sf_dir)
    return t.documents.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.md5("source").alias("h_md5"),
        F.sha2("source", 256).alias("h_sha256"),
        F.lower(F.hex(F.col("doc_id"))).alias("hx"),
        F.base64(F.col("source").cast("binary")).alias("b64"),
        F.unbase64(F.base64(F.col("source").cast("binary"))).cast("string").alias("roundtrip"),
    )


@query(
    "fn_url",
    oracle="""
SELECT doc_id, url,
       regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
       regexp_extract(url, '\\?(.*)$', 1) AS query_str,
       regexp_extract(url, '[?&]id=([^&]*)', 1) AS id_param
FROM (SELECT doc_id, concat('https://', source, '.example.com/docs/', CAST(doc_id AS VARCHAR), '?id=', CAST(doc_id AS VARCHAR), '&lang=', lang) AS url
      FROM documents WHERE doc_id < 50)
""",
    category="function",
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL family: parse_url(HOST/PATH/QUERY) + parameter extraction
    (oracle reimplements via regex — DuckDB has no URL functions)."""
    t = Tables(spark, sf_dir)
    src = t.documents.filter(F.col("doc_id") < 50).select(
        "doc_id",
        F.concat(
            F.lit("https://"), "source", F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"), F.lit("?id="), F.col("doc_id").cast("string"),
            F.lit("&lang="), "lang",
        ).alias("url"),
    )
    return src.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query_str"),
        F.parse_url("url", F.lit("QUERY"), F.lit("id")).alias("id_param"),
    )


@query(
    "fn_conditional",
    oracle="""
SELECT c_custkey,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
       CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bal_class,
       CASE WHEN c_custkey % 5 = 0 THEN NULL
            ELSE c_acctbal / (c_custkey % 5) END AS try_div,
       if(c_nationkey < 12, 'low', 'high') AS hemisphere
FROM customer WHERE c_custkey < 300
""",
    category="function",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: coalesce/nullif/CASE/try_divide/if (Trino TRY
    → Spark try_* functions)."""
    t = Tables(spark, sf_dir)
    return t.customer.filter(F.col("c_custkey") < 300).select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias("seg"),
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_class"),
        F.try_divide(F.col("c_acctbal"), F.col("c_custkey") % 5).alias("try_div"),
        F.when(F.col("c_nationkey") < 12, "low").otherwise("high").alias("hemisphere"),
    )


@query(
    "fn_uuid_typeof",
    oracle="""
SELECT COUNT(*) AS n_rows, COUNT(*) AS n_valid_uuid,
       COUNT(*) AS n_distinct_uuid, COUNT(*) AS n_string_typed
FROM nation
""",
    category="function",
)
def fn_uuid_typeof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """uuid() + typeof. The generated ids are nondeterministic by
    design, so the checkable contract is structural: every row gets a
    syntactically valid RFC-4122 v4 uuid, all generated ids are
    distinct, and typeof reports string for a varchar column (r02
    upgrade from rows-only)."""
    t = Tables(spark, sf_dir)
    g = t.nation.select(
        F.expr("uuid()").alias("id"),
        F.expr("typeof(n_name)").alias("name_type"),
    )
    uuid_re = "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    return g.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("id").rlike(uuid_re), 1).otherwise(0)).cast("bigint").alias("n_valid_uuid"),
        F.countDistinct("id").alias("n_distinct_uuid"),
        F.sum(F.when(F.col("name_type") == "string", 1).otherwise(0)).cast("bigint").alias("n_string_typed"),
    )


@query(
    "fn_variant",
    oracle="""
SELECT event_id,
       CAST(props->>'$.k' AS BIGINT) AS k_typed,
       props->>'$.k' AS k_str,
       CAST(props->>'$.k' AS BIGINT) IS NULL AS k_missing
FROM events WHERE event_id < 300
ORDER BY event_id
""",
    category="function",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured type (Spark 4): parse_json into an
    open-schema variant column, then typed path extraction with
    variant_get — the engine-native upgrade over string JSON
    functions (binary-encoded, no re-parse per access; the reference's
    Trino json type plays the same role). Oracle extracts the same
    paths through DuckDB's JSON operators."""
    t = Tables(spark, sf_dir)
    v = F.parse_json("props")
    return (
        t.events.filter(F.col("event_id") < 300)
        .select(
            "event_id",
            F.try_variant_get(v, "$.k", "bigint").alias("k_typed"),
            F.try_variant_get(v, "$.k", "string").alias("k_str"),
            F.try_variant_get(v, "$.k", "bigint").isNull().alias("k_missing"),
        )
        .orderBy("event_id")
    )


@query(
    "fn_string_distance",
    oracle="""
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev,
       floor((1.0 - CAST(levenshtein(a.p_name, b.p_name) AS DOUBLE)
                    / greatest(length(a.p_name), length(b.p_name))) * 1e6) / 1e6
         AS name_sim
FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
WHERE a.p_partkey <= 200
ORDER BY key_a
""",
    category="function",
)
def fn_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance family (Trino levenshtein_distance parity):
    levenshtein between adjacent part names plus a length-normalized
    similarity, floor-quantized — the fuzzy-matching primitive record
    linkage and near-dup triage build on."""
    t = Tables(spark, sf_dir)
    a = t.part.filter(F.col("p_partkey") <= 200).select(
        F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a")
    )
    b = t.part.select((F.col("p_partkey")).alias("key_b"), F.col("p_name").alias("name_b"))
    lev = F.levenshtein("name_a", "name_b")
    sim = (
        F.floor(
            (F.lit(1.0) - lev.cast("double") / F.greatest(F.length("name_a"), F.length("name_b")))
            * 1e6
        )
        / 1e6
    )
    return (
        a.join(b, F.col("key_b") == F.col("key_a") + 1)
        .select("key_a", "key_b", lev.cast("bigint").alias("lev"), sim.alias("name_sim"))
        .orderBy("key_a")
    )


@query(
    "fn_timezone",
    oracle="""
SELECT event_id,
       strftime(timezone('America/New_York', timezone('UTC', ts)),
                '%Y-%m-%d %H:%M:%S') AS ny_time,
       strftime(timezone('Asia/Tokyo', timezone('UTC', ts)),
                '%Y-%m-%d %H:%M:%S') AS tokyo_time,
       strftime(timezone('Australia/Sydney', timezone('UTC', ts)),
                '%Y-%m-%d %H:%M:%S') AS sydney_time,
       CAST(EXTRACT(HOUR FROM timezone('America/New_York', timezone('UTC', ts)))
            AS BIGINT) AS ny_hour
FROM events
WHERE event_id % 20 = 0
""",
    category="function",
)
def fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AT TIME ZONE family (Trino ts AT TIME ZONE 'zone' /
    from_utc_timestamp parity): UTC event times rendered as wall-clock
    in three named zones (one of them DST-active for the fixture
    window), plus an EXTRACT over the converted value. Emitted as
    formatted strings — cross-engine tz conversion is IANA-table
    identical, but raw timestamp hashing would trip on session-TZ
    re-encoding."""
    t = Tables(spark, sf_dir)
    ev = t.events.filter(F.col("event_id") % 20 == 0)
    fmt = "yyyy-MM-dd HH:mm:ss"
    ny = F.from_utc_timestamp("ts", "America/New_York")
    return ev.select(
        "event_id",
        F.date_format(ny, fmt).alias("ny_time"),
        F.date_format(F.from_utc_timestamp("ts", "Asia/Tokyo"), fmt).alias("tokyo_time"),
        F.date_format(F.from_utc_timestamp("ts", "Australia/Sydney"), fmt).alias("sydney_time"),
        F.hour(ny).cast("long").alias("ny_hour"),
    )
