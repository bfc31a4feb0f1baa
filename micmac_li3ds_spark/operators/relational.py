"""M1 core relational operators: projection, filter, distinct + the
flagship pricing-summary query (SURVEY.md §2.2, §7.1).

All queries here compile to a single parquet scan with pushed filters and
pruned columns — verify with ``df.explain("formatted")``: the scan must
show PushedFilters and a minimal ReadSchema. At 100 TB these are the
cheapest ops in the engine precisely because Catalyst pushes them into
the scan; nothing shuffles except the flagship's aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from micmac_li3ds_spark.functions.exact import cents, duck_cents, duck_pct, pct
from micmac_li3ds_spark.registry import register
from micmac_li3ds_spark.tables import load


@register(
    "q_pricing_summary",
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  SUM({duck_cents('l_extendedprice')}) / 100.0 AS sum_base_price,
  SUM({duck_cents('l_extendedprice')} * (100 - {duck_pct('l_discount')})) / 10000.0 AS sum_disc_price,
  SUM({duck_cents('l_extendedprice')} * (100 - {duck_pct('l_discount')})
      * (100 + {duck_pct('l_tax')})) / 1000000.0 AS sum_charge,
  round(SUM(CAST(l_quantity AS BIGINT)) / COUNT(*), 6) AS avg_qty,
  round(SUM({duck_cents('l_extendedprice')}) / COUNT(*) / 100.0, 6) AS avg_price,
  round(SUM({duck_pct('l_discount')}) / COUNT(*) / 100.0, 6) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    tags=("flagship", "agg"),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (TPC-H Q1 shape): scan → pushed filter → hash agg → sort.

    Money aggregation runs in exact integer cents (functions/exact.py) so
    the result hash-matches any oracle engine regardless of fp order.
    Plan shape: single scan, partial+final hash aggregate (map-side
    combine), tiny final sort — the aggregate output is 6 rows, so the
    shuffle moves only partial states. Scales linearly with input.
    """
    li = load(spark, sf_dir, "lineitem")
    cents_price = cents("l_extendedprice")
    disc = pct("l_discount")
    tax = pct("l_tax")
    qty = F.col("l_quantity").cast("long")
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            (F.sum(cents_price) / 100.0).alias("sum_base_price"),
            (F.sum(cents_price * (100 - disc)) / 10000.0).alias("sum_disc_price"),
            (F.sum(cents_price * (100 - disc) * (100 + tax)) / 1000000.0).alias(
                "sum_charge"
            ),
            F.round(F.sum(qty) / n, 6).alias("avg_qty"),
            F.round(F.sum(cents_price) / n / 100.0, 6).alias("avg_price"),
            F.round(F.sum(disc) / n / 100.0, 6).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q_project_select",
    oracle="""
SELECT
  p_partkey,
  upper(p_brand) AS brand_uc,
  p_retailprice,
  round(p_retailprice * 1.1, 2) AS inflated_price,
  p_size + 1 AS size_next
FROM part
""",
    tags=("projection",),
)
def q_project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection: column subset + computed columns + rename.

    Column pruning: the scan must read only 4 of part's 6 columns —
    check ReadSchema in the formatted plan. Narrow ops, zero shuffle.
    """
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        "p_retailprice",
        F.round(F.col("p_retailprice") * 1.1, 2).alias("inflated_price"),
        (F.col("p_size") + 1).alias("size_next"),
    )


@register(
    "q_filter_simple",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2000-01-01'
""",
    tags=("filter",),
)
def q_filter_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-predicate filter; must appear in PushedFilters (row-group
    skipping via parquet min/max stats at scale)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp")).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"
    )


@register(
    "q_filter_compound",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE (o_orderstatus = 'F' AND o_totalprice > 50000.0)
   OR (NOT o_orderpriority = '5-LOW' AND o_totalprice <= 1000.0)
""",
    tags=("filter",),
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound AND/OR/NOT predicate with Column operators (& | ~)."""
    o = load(spark, sf_dir, "orders")
    cond = ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 50000.0)) | (
        (~(F.col("o_orderpriority") == "5-LOW")) & (F.col("o_totalprice") <= 1000.0)
    )
    return o.filter(cond).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )


@register(
    "q_filter_in_between_like",
    oracle="""
SELECT p_partkey, p_brand, p_type, p_size
FROM part
WHERE p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
  AND p_size BETWEEN 10 AND 30
  AND p_type LIKE 'PROMO%'
""",
    tags=("filter",),
)
def q_filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership + range + pattern predicates (IN / BETWEEN / LIKE)."""
    part = load(spark, sf_dir, "part")
    return part.filter(
        F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33")
        & F.col("p_size").between(10, 30)
        & F.col("p_type").like("PROMO%")
    ).select("p_partkey", "p_brand", "p_type", "p_size")


@register(
    "q_filter_null",
    oracle="""
SELECT
  c_custkey,
  seg,
  seg IS NULL AS seg_is_null,
  coalesce(seg, 'UNKNOWN') AS seg_filled
FROM (
  SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg
  FROM customer
)
WHERE seg IS NULL OR seg = 'MACHINERY'
""",
    tags=("filter", "null"),
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: nullif to manufacture NULLs (corpus has none),
    IS NULL filter, coalesce back-fill."""
    c = load(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return (
        c.select("c_custkey", seg.alias("seg"))
        .filter(F.col("seg").isNull() | (F.col("seg") == "MACHINERY"))
        .select(
            "c_custkey",
            "seg",
            F.col("seg").isNull().alias("seg_is_null"),
            F.coalesce("seg", F.lit("UNKNOWN")).alias("seg_filled"),
        )
    )


@register(
    "q_project_distinct",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus
FROM lineitem
""",
    tags=("projection", "distinct"),
)
def q_project_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct projection. Physical plan = hash aggregate on the two
    columns; partial distinct runs map-side so the shuffle carries only
    unique pairs (6 here; bounded by domain size at any scale)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()
