"""M4 scalar function groups (SURVEY.md §2.8).

Each query exercises one function family as a multi-expression
projection. Everything stays JVM-side inside whole-stage codegen — no
Python in any of these paths. Cross-dialect notes are inline where Spark
and DuckDB spell or type a function differently (casts added so the
result schema matches exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from micmac_li3ds_spark.registry import register
from micmac_li3ds_spark.tables import load


@register(
    "q_fn_string",
    oracle="""
SELECT c_custkey,
       concat(c_name, '|', c_mktsegment) AS tagged,
       upper(c_name) AS name_uc,
       lower(c_mktsegment) AS seg_lc,
       substring(c_name, 1, 8) AS name_prefix,
       CAST(length(c_name) AS INTEGER) AS name_len,
       trim(concat('  ', c_name, '  ')) AS name_trim,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad,
       replace(c_mktsegment, 'MACHINERY', 'MACH') AS seg_repl,
       array_to_string(string_split(c_name, '#'), '|') AS name_parts
FROM customer
""",
    tags=("scalar", "string"),
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: concat/case/substring/length/trim/pad/replace/split.
    DuckDB length() returns BIGINT vs Spark INT → cast on the oracle side.
    Split output re-joined to a string: the driver canonicalizer cannot
    hash list cells (CORRECTNESS_r01)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws("|", "c_name", "c_mktsegment").alias("tagged"),
        F.upper("c_name").alias("name_uc"),
        F.lower("c_mktsegment").alias("seg_lc"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("name_trim"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_pad"),
        F.replace(F.col("c_mktsegment"), F.lit("MACHINERY"), F.lit("MACH")).alias(
            "seg_repl"
        ),
        F.array_join(F.split("c_name", "#"), "|").alias("name_parts"),
    )


@register(
    "q_fn_regex",
    oracle="""
SELECT p_partkey, p_brand,
       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
       regexp_replace(p_type, '[AEIOU]', '_', 'g') AS type_devoweled,
       regexp_matches(p_type, '^PROMO') AS is_promo,
       regexp_extract(p_name, '^([a-z]+) ', 1) AS first_word
FROM part
""",
    tags=("scalar", "regex"),
)
def q_fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family. Patterns kept POSIX-simple (both engines use
    RE2-compatible subsets here). Spark regexp_replace is global by
    default; DuckDB needs the 'g' flag."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_brand",
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_type", r"[AEIOU]", "_").alias("type_devoweled"),
        F.col("p_type").rlike("^PROMO").alias("is_promo"),
        F.regexp_extract("p_name", r"^([a-z]+) ", 1).alias("first_word"),
    )


@register(
    "q_fn_datetime",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
       CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INTEGER) AS days_to_2002,
       CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec,
       CAST(o_orderdate AS DATE) AS order_day
FROM orders
""",
    tags=("scalar", "datetime"),
)
def q_fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family. Dialect deltas handled: Spark dayofweek is
    1=Sunday vs DuckDB 0=Sunday (+1), DuckDB date parts return BIGINT
    (cast to INT), both engines truncate weeks to Monday."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.dayofweek(d).alias("dow"),
        F.date_trunc("month", d).alias("month_start"),
        F.date_trunc("week", d).alias("week_start"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), d).alias("days_to_2002"),
        (d + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.unix_timestamp(d).alias("epoch_sec"),
        d.cast("date").alias("order_day"),
    )


@register(
    "q_fn_math",
    oracle="""
SELECT p_partkey,
       round(p_retailprice, 1) AS price_r1,
       abs(p_retailprice - 1000.0) AS dist_1000,
       round(power(CAST(p_size AS DOUBLE), 2), 6) AS size_sq,
       round(sqrt(p_retailprice), 6) AS price_sqrt,
       round(ln(p_retailprice), 6) AS price_ln,
       round(log10(p_retailprice), 6) AS price_log10,
       least(p_retailprice, 500.0) AS capped,
       greatest(CAST(p_size AS DOUBLE), 25.0) AS floored_size,
       CAST(sign(p_retailprice - 1000.0) AS DOUBLE) AS sign_delta,
       floor(p_retailprice) AS price_floor,
       ceil(p_retailprice) AS price_ceil
FROM part
""",
    tags=("scalar", "math"),
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. Transcendentals (ln/log10/sqrt/pow) rounded to 6dp —
    IEEE-correct to well past that, but libm ulp differences exist.
    Spark floor/ceil(double) return BIGINT? No — DOUBLE in ANSI mode is
    LONG; DuckDB floor returns DOUBLE, so Spark casts to double."""
    p = load(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    size_d = F.col("p_size").cast("double")
    return p.select(
        "p_partkey",
        F.round(price, 1).alias("price_r1"),
        F.abs(price - 1000.0).alias("dist_1000"),
        F.round(F.pow(size_d, 2), 6).alias("size_sq"),
        F.round(F.sqrt(price), 6).alias("price_sqrt"),
        F.round(F.log(price), 6).alias("price_ln"),
        F.round(F.log10(price), 6).alias("price_log10"),
        F.least(price, F.lit(500.0)).alias("capped"),
        F.greatest(size_d, F.lit(25.0)).alias("floored_size"),
        F.signum(price - 1000.0).alias("sign_delta"),
        F.floor(price).cast("double").alias("price_floor"),
        F.ceil(price).cast("double").alias("price_ceil"),
    )


@register(
    "q_fn_cond",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000.0 THEN 'jumbo'
            WHEN o_totalprice > 100000.0 THEN 'large'
            WHEN o_totalprice > 30000.0  THEN 'medium'
            ELSE 'small' END AS size_class,
       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
       nullif(o_orderpriority, '4-NOT SPECIFIED') AS priority_or_null,
       if(o_orderstatus = 'F', 1, 0) AS is_finished
FROM orders
""",
    tags=("scalar", "cond"),
)
def q_fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE WHEN chain, coalesce, nullif, if."""
    o = load(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(tp > 300000.0, "jumbo")
        .when(tp > 100000.0, "large")
        .when(tp > 30000.0, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")).alias(
            "priority_or_null"
        ),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_finished"),
    )


@register(
    "q_fn_array",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
)
SELECT doc_id,
       CAST(length(tokens) AS INTEGER) AS n_tokens,
       tokens[1] AS first_token,
       list_contains(tokens, 'join') AS has_join,
       array_to_string(list_sort(list_distinct(tokens))[1:5], ',') AS first5_sorted,
       array_to_string(list_transform(tokens[1:10], t -> CAST(length(t) AS VARCHAR)), ',') AS first10_lens,
       CAST(length(list_filter(tokens, t -> length(t) > 5)) AS INTEGER) AS n_long,
       CAST(list_sum(list_transform(tokens, t -> length(t))) AS BIGINT) AS total_len,
       array_to_string(list_transform(range(1, 4), x -> CAST(x AS VARCHAR)), ',') AS seq_1_3
FROM toks
""",
    tags=("scalar", "array"),
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order family over tokenized documents: size,
    element_at, contains, slice, sort+distinct, transform, filter,
    aggregate (sum-of-lengths), sequence. The reference's vector/matrix
    payloads ride exactly these primitives (SURVEY.md §2.8). Array
    outputs re-joined to strings for the driver canonicalizer
    (CORRECTNESS_r01 `unhashable type: 'list'`)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_contains(toks, "join").alias("has_join"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(toks)), 1, 5), ","
        ).alias("first5_sorted"),
        F.array_join(
            F.transform(F.slice(toks, 1, 10), lambda t: F.length(t).cast("string")),
            ",",
        ).alias("first10_lens"),
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).alias("n_long"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("total_len"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(3)), lambda x: x.cast("string")
            ),
            ",",
        ).alias("seq_1_3"),
    )


@register(
    "q_fn_map",
    oracle="""
SELECT doc_id,
       map_extract(MAP(['lang','source'], [lang, source]), 'lang')[1] AS lang_val,
       array_to_string(list_sort(map_keys(MAP(['lang','source'], [lang, source]))), ',') AS keys_sorted,
       CAST(cardinality(MAP(['lang','source'], [lang, source])) AS INTEGER) AS n_keys
FROM documents
""",
    tags=("scalar", "map"),
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: create_map, element lookup, keys, cardinality. Raw map
    values are never emitted (engines disagree on map output encoding);
    scalars extracted instead."""
    d = load(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return d.select(
        "doc_id",
        F.element_at(m, "lang").alias("lang_val"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.size(m).alias("n_keys"),
    )


@register(
    "q_fn_json",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
       CAST(json_extract(props, '$.k') AS INTEGER) * 2 AS k_doubled,
       to_json(struct_pack(k := CAST(json_extract(props, '$.k') AS INTEGER))) AS rebuilt
FROM events
""",
    tags=("scalar", "json"),
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family over events.props (the reference keeps model-specific
    coefficients in exactly such JSON columns): path extraction as string
    and typed, from_json → struct field, to_json round-trip."""
    ev = load(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed["k"].alias("k_int"),
        (parsed["k"] * 2).alias("k_doubled"),
        F.to_json(F.struct(parsed["k"].alias("k"))).alias("rebuilt"),
    )


@register(
    "q_fn_variant",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k_typed,
       json_extract_string(props, '$.k') AS k_string,
       CAST(json_extract(props, '$.missing') AS INTEGER) AS absent
FROM events
""",
    tags=("scalar", "json", "variant"),
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-schema columns via Spark 4 VariantType (SURVEY.md §1.3: the
    idiomatic carrier for the reference's model-specific
    `transfo.parameters` / `sensor.specifications` JSON): parse once
    into a binary variant, then typed path extraction with
    `variant_get` — no per-query re-parse of the JSON text, and the
    variant binary is columnar-shreddable in parquet at scale. Missing
    paths yield NULL (try-semantics), matching the oracle's CAST of a
    missing json_extract."""
    ev = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_typed"),
        F.variant_get(v, "$.k", "string").alias("k_string"),
        F.try_variant_get(v, "$.missing", "int").alias("absent"),
    )


@register(
    "q_fn_bitwise",
    oracle="""
SELECT c_custkey,
       c_custkey & 255 AS low_byte,
       c_custkey | 4096 AS with_flag,
       xor(c_custkey, 170) AS xored,
       c_custkey << 4 AS shl,
       c_custkey >> 2 AS shr,
       CAST(bit_count(c_custkey) AS INTEGER) AS popcount,
       ~c_custkey AS inverted
FROM customer
""",
    tags=("scalar", "bitwise"),
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family — and/or/xor/shifts/popcount/not over 64-bit keys
    (the primitives under bitmap indexes, bloom-filter probes, and the
    engine's own hash bucketing). Pure codegen arithmetic, map-only."""
    c = load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    return c.select(
        "c_custkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(170)).alias("xored"),
        F.shiftleft(k, 4).alias("shl"),
        F.shiftright(k, 2).alias("shr"),
        F.bit_count(k).alias("popcount"),
        F.bitwise_not(k).alias("inverted"),
    )


@register(
    "q_fn_hash",
    oracle="""
SELECT c_custkey,
       md5(c_name) AS name_md5,
       sha256(c_name) AS name_sha256,
       substring(md5(c_name), 1, 8) AS md5_prefix
FROM customer
""",
    tags=("scalar", "hash"),
)
def q_fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash family — md5/sha-256 (content fingerprints,
    deterministic sampling keys, cache keys). Both engines emit
    lowercase hex, so parity is byte-exact. Spark-only fast hashes
    (xxhash64, crc32, murmur3 `hash`) are deliberately excluded from
    oracle-checked output: engine-internal, not portable — the engine
    uses them only where values never cross the boundary (MinHash
    signatures)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5(F.col("c_name")).alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
        F.substring(F.md5(F.col("c_name")), 1, 8).alias("md5_prefix"),
    )


@register(
    "q_fn_interval",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3mo,
       CAST(o_orderdate - INTERVAL 45 DAY AS DATE) AS minus_45d,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       make_date(CAST(year(o_orderdate) AS INTEGER),
                 CAST(month(o_orderdate) AS INTEGER), 1) AS month_first
FROM orders
""",
    tags=("scalar", "interval"),
)
def q_fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval arithmetic: month addition (both engines clamp
    to the shorter target month, e.g. Jan 31 + 1 month = Feb 28), day
    offsets, end-of-month, quarter, and date construction. Complements
    q_fn_datetime's extraction family."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.add_months(d, 3).alias("plus_3mo"),
        F.date_sub(d.cast("date"), 45).alias("minus_45d"),
        F.last_day(d).alias("month_end"),
        F.quarter(d).alias("qtr"),
        F.make_date(F.year(d), F.month(d), F.lit(1)).alias("month_first"),
    )
