"""Deterministic sampling & dataset-splitting operators (training-data
pipeline surface, SURVEY.md §2.11 adjunct).

Random sampling (``df.sample``) is seed-dependent and engine-internal, so
it can never hash-match an oracle. Every operator here instead samples by
**content hash** (md5 of the row's natural key — identical bytes in Spark
and DuckDB, see functions.text.token_hash32): the sample is a pure
function of the data. That is also the property a 100 TB training
pipeline needs — re-running the job, on any cluster layout, selects the
same rows, so samples/splits are reproducible and joinable across stages.

Scale notes: hash-sampling is a narrow map-side filter — no shuffle, full
predicate fusion into the scan stage; stratified thresholds ride a
broadcast CASE; the split operator's groupBy shuffles only (split, lang)
aggregate rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from micmac_li3ds_spark.functions.text import duck_token_hash32, token_hash32
from micmac_li3ds_spark.registry import register
from micmac_li3ds_spark.tables import load

# 0..9999 bucket from the key hash: per-myriad sampling resolution.
_BUCKETS = 10000


def _bucket(key: Column) -> Column:
    return F.pmod(token_hash32(key), F.lit(_BUCKETS))


def _duck_bucket(expr: str) -> str:
    return f"(({duck_token_hash32(expr)}) % {_BUCKETS} + {_BUCKETS}) % {_BUCKETS}"


@register(
    "q_sample_hash",
    oracle=f"""
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
         AS sum_price
FROM lineitem
WHERE {_duck_bucket("CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)")} < 1000
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    tags=("sampling",),
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample of lineitem by key-hash bucket, then a
    summary aggregate over the sample. The filter is a scan-stage map
    predicate (no shuffle, no seed); the same rows are selected at any
    scale factor, parallelism, or engine."""
    li = load(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    return (
        li.filter(_bucket(key) < 1000)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast(
                    "double"
                )
                / 100.0
            ).alias("sum_price"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# Per-language sampling rates in hash buckets out of 10000.
_STRATA = {"en": 1000, "fr": 2500, "es": 5000, "zh": 7500, "de": 10000}


@register(
    "q_sample_stratified",
    oracle=f"""
SELECT lang, count(*) AS n_sampled, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE {_duck_bucket("CAST(doc_id AS VARCHAR)")} <
  CASE lang WHEN 'en' THEN 1000 WHEN 'fr' THEN 2500 WHEN 'es' THEN 5000
            WHEN 'zh' THEN 7500 WHEN 'de' THEN 10000 ELSE 0 END
GROUP BY lang
ORDER BY lang
""",
    tags=("sampling",),
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: a different hash-bucket rate
    per language (down-sample dominant strata, keep rare ones whole) —
    the standard data-mixture rebalancing step before LLM training.
    Thresholds are a literal CASE fused into the scan filter."""
    docs = load(spark, sf_dir, "documents")
    threshold = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in _STRATA.items()],
        F.lit(0),
    )
    return (
        docs.filter(_bucket(F.col("doc_id").cast("string")) < threshold)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


@register(
    "q_llm_train_split",
    oracle=f"""
WITH b AS (
  SELECT lang, n_chars, {_duck_bucket("CAST(doc_id AS VARCHAR)")} AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 8000 THEN 'train'
            WHEN bucket < 9000 THEN 'val' ELSE 'test' END AS split,
       lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM b
GROUP BY split, lang
ORDER BY split, lang
""",
    tags=("sampling", "llm"),
)
def q_llm_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 train/val/test assignment by doc_id hash
    bucket. Membership is a pure function of the document key — stable
    under re-runs, repartitioning, and engine choice, which is the
    contamination-safety property an eval split must have."""
    docs = load(spark, sf_dir, "documents")
    bucket = _bucket(F.col("doc_id").cast("string"))
    split = (
        F.when(bucket < 8000, "train").when(bucket < 9000, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("split", "lang")
    )


@register(
    "q_llm_seq_pack",
    oracle="""
WITH t AS (
  SELECT source, doc_id, CAST(ceil(n_chars / 4.0) AS BIGINT) AS est_tokens
  FROM documents
), c AS (
  SELECT source, est_tokens,
         sum(est_tokens) OVER (PARTITION BY source ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tokens
  FROM t
)
SELECT source,
       CAST(floor((cum_tokens - est_tokens) / 2048.0) AS BIGINT) AS bin,
       count(*) AS n_docs, CAST(sum(est_tokens) AS BIGINT) AS bin_tokens
FROM c
GROUP BY source, bin
ORDER BY source, bin
""",
    tags=("sampling", "llm"),
)
def q_llm_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: estimate tokens per document (~4 chars/
    token), stream documents per source in doc_id order, and open a new
    2048-token bin whenever the running total crosses the budget — the
    standard packing step that turns variable-length documents into
    fixed-size training sequences. One window shuffle on source; bin
    assignment is exclusive-prefix-sum integer arithmetic (exact in any
    engine). At 100 TB the partition key becomes (source, day-bucket) so
    no single source serializes a window."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    est = F.ceil(F.col("n_chars") / 4.0).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = docs.select(
        "source",
        est.alias("est_tokens"),
        F.sum(est).over(w).alias("cum_tokens"),
    ).select(
        "source",
        F.floor((F.col("cum_tokens") - F.col("est_tokens")) / F.lit(2048.0)).alias(
            "bin"
        ),
        "est_tokens",
    )
    return (
        packed.groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("est_tokens").alias("bin_tokens"),
        )
        .orderBy("source", "bin")
    )


@register(
    "q_sample_weighted",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         ({duck_token_hash32("CAST(doc_id AS VARCHAR)")})
           // CAST(GREATEST(n_chars, 1) AS BIGINT) AS priority
  FROM documents
)
SELECT doc_id, n_chars
FROM keyed
ORDER BY priority, doc_id
LIMIT 200
""",
    tags=("sampling", "weighted"),
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weight-proportional sampling: priority =
    content_hash / weight (integer division), keep the 200 smallest —
    heavier documents draw smaller priorities more often, so inclusion
    probability grows with weight (here n_chars as a stand-in for a
    quality score). This is the integer-arithmetic cousin of
    Efraimidis–Elias reservoir sampling (their u^(1/w) key needs
    float pow, whose last-ulp differences across engines would make
    the rank cut non-reproducible; hash/w keeps every comparison
    exact). Same scale shape as all hash sampling here: map-side
    priority, one TakeOrderedAndProject — no shuffle of the corpus,
    identical selection at any parallelism."""
    d = load(spark, sf_dir, "documents")
    # explicit floor division on both sides (DuckDB `//`): positive
    # operands, so floor == truncation and every comparison is integer
    priority = F.floor(
        token_hash32(F.col("doc_id").cast("string"))
        / F.greatest(F.col("n_chars"), F.lit(1))
    ).cast("long")
    return (
        d.select("doc_id", "n_chars", priority.alias("priority"))
        .orderBy("priority", "doc_id")
        .limit(200)
        .select("doc_id", "n_chars")
    )


# Target mixture: per-language character budgets (chars, not fractions, so
# every comparison is integer-exact across engines). Sums to 30k ≈ 40/20/
# 20/10/10% of a 30k-char training slice.
_MIXTURE_BUDGET = {"en": 12000, "fr": 6000, "es": 6000, "zh": 3000, "de": 3000}


@register(
    "q_llm_mixture_sample",
    oracle=f"""
WITH d AS (
  SELECT doc_id, lang, n_chars,
         {_duck_bucket("CAST(doc_id AS VARCHAR)")} AS pri
  FROM documents
),
c AS (
  SELECT lang, n_chars,
         SUM(n_chars) OVER (PARTITION BY lang ORDER BY pri, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
)
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM c
WHERE cum <= CASE lang WHEN 'en' THEN 12000 WHEN 'fr' THEN 6000
                       WHEN 'es' THEN 6000 WHEN 'zh' THEN 3000
                       WHEN 'de' THEN 3000 ELSE 0 END
GROUP BY lang
ORDER BY lang
""",
    tags=("sampling", "llm", "mixture"),
)
def q_llm_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture sampling to a per-language character budget: the
    step that turns 'train on 40% en / 20% fr / ...' into a concrete
    document subset. Documents stream per language in hash-priority
    order (a pure function of doc_id — reproducible on any engine or
    cluster layout) and are kept while the running character total
    stays within that language's budget. One window shuffle on lang;
    at 100 TB the budgets come from a broadcast mixture spec and the
    partition key gains a salt so no single language serializes a
    window (same note as q_llm_seq_pack)."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    pri = _bucket(F.col("doc_id").cast("string"))
    w = (
        Window.partitionBy("lang")
        .orderBy("pri", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in _MIXTURE_BUDGET.items()],
        F.lit(0),
    )
    kept = (
        docs.withColumn("pri", pri)
        .withColumn("cum", F.sum("n_chars").over(w))
        .filter(F.col("cum") <= budget)
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )
