"""M1 set operations + sorts/limits/top-k (SURVEY.md §2.6, §2.7).

Set ops are hash-based in Spark (aggregate or shuffle-join plans).
orderBy+limit compiles to TakeOrderedAndProject — per-partition top-k
then a k-sized merge on the driver, never a full global sort; that is
the plan that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from micmac_li3ds_spark.registry import register
from micmac_li3ds_spark.tables import load


# ---------------------------------------------------------------- sorts


@register(
    "q_sort_multi",
    oracle="""
SELECT c_custkey, c_name, c_nationkey, c_acctbal
FROM customer
ORDER BY c_acctbal DESC NULLS LAST, c_name ASC
""",
    tags=("sort",),
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort, mixed direction, explicit null placement. Spark
    range-partitions by sample then sorts per partition (no single-node
    sort at scale)."""
    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_name", "c_nationkey", "c_acctbal").orderBy(
        F.col("c_acctbal").desc_nulls_last(), F.col("c_name").asc()
    )


@register(
    "q_limit",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_orderdate ASC, o_orderkey ASC
LIMIT 20
""",
    tags=("sort", "limit"),
)
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic LIMIT: always paired with a total order (unique
    tiebreaker key) — an unordered limit is nondeterministic in any
    distributed engine."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .limit(20)
    )


@register(
    "q_topk_global",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
""",
    tags=("sort", "topk"),
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: plans as TakeOrderedAndProject (verify in explain)
    — O(n log k) per partition + k-row merge, no shuffle of the input."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


# -------------------------------------------------------------- set ops


def _hi_value(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("value") > 400.0).select("user_id", "event_type")


def _purchases(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "purchase").select("user_id", "event_type")


_DUCK_HI = "SELECT user_id, event_type FROM events WHERE value > 400.0"
_DUCK_PUR = "SELECT user_id, event_type FROM events WHERE event_type = 'purchase'"


@register(
    "q_set_union_all",
    oracle=f"SELECT * FROM ({_DUCK_HI} UNION ALL {_DUCK_PUR})",
    tags=("setop",),
)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union via unionByName (schema-by-name, not positional) — a
    zero-shuffle concatenation of partitions."""
    return _hi_value(spark, sf_dir).unionByName(_purchases(spark, sf_dir))


@register(
    "q_set_union_distinct",
    oracle=f"{_DUCK_HI} UNION {_DUCK_PUR}",
    tags=("setop",),
)
def q_set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union = unionByName + distinct (hash aggregate on all cols)."""
    return _hi_value(spark, sf_dir).unionByName(_purchases(spark, sf_dir)).distinct()


@register(
    "q_set_intersect",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0
""",
    tags=("setop",),
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): customers having both a finished
    order and a big order."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 100000.0).select("o_custkey")
    return a.intersect(b)


@register(
    "q_set_except",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
    tags=("setop",),
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): customers with finished but no open
    orders."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.subtract(b)


@register(
    "q_set_except_all",
    oracle="""
SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
EXCEPT ALL
SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
""",
    tags=("setop",),
)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics — multiplicity-aware difference)."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    b = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    return a.exceptAll(b)


@register(
    "q_set_intersect_all",
    oracle="""
SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
INTERSECT ALL
SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
""",
    tags=("setop",),
)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics)."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    b = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    return a.intersectAll(b)


@register(
    "q_set_dedup_subset",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("setop", "dedup"),
)
def q_set_dedup_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a key subset. The surviving payload row is
    nondeterministic by definition, so only the key columns are emitted;
    when the survivor matters use q_win_dedup_latest instead."""
    ev = load(spark, sf_dir, "events")
    return ev.dropDuplicates(["user_id", "event_type"]).select("user_id", "event_type")
