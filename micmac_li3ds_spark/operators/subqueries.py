"""Subquery forms — scalar, IN, and correlated (SURVEY.md §2.2/§2.3 adjunct).

The reference has no query language at all (it is a file-to-DB loader;
SURVEY.md §2 exhaustiveness note), but "same query capabilities" requires
the full relational subquery surface. These run through entry point B
(``spark.sql`` over temp views, SURVEY.md §3.3) on purpose: subqueries
are a parser/analyzer feature, and Catalyst's decorrelation rules
(RewriteCorrelatedScalarSubquery, exists→semi/anti — SURVEY.md §4) turn
them into the same join plans the DataFrame API would build.

Scale notes: a scalar subquery becomes a 1-row broadcast (subquery reuse,
no per-row evaluation); IN becomes a left-semi hash join; a correlated
aggregate decorrelates to agg-then-join shuffling on the correlation key.
All verified with .explain — no nested-loop re-execution anywhere.

Cross-engine float note: the correlated-average predicate compares exact
integer cents (see functions.exact) so the row membership cannot flip on
last-ulp aggregation-order differences between Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from micmac_li3ds_spark.registry import register
from micmac_li3ds_spark.tables import load


def _view(spark: SparkSession, sf_dir: str, name: str) -> None:
    load(spark, sf_dir, name).createOrReplaceTempView(name)


@register(
    "q_subquery_scalar",
    oracle="""
SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
FROM customer
WHERE c_acctbal > 2 * (SELECT avg(c_acctbal) FROM customer)
ORDER BY c_custkey
""",
    tags=("subquery",),
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: customers with more than twice the
    global average balance. Plans as a 1-row subquery broadcast into the
    scan filter — the aggregate runs once, not per row. The 2× margin
    keeps the threshold far from any actual 2-dp balance, so sub-ulp
    aggregation-order differences between engines cannot flip a row."""
    _view(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
        FROM customer
        WHERE c_acctbal > 2 * (SELECT avg(c_acctbal) FROM customer)
        ORDER BY c_custkey
        """
    )


@register(
    "q_subquery_in",
    oracle="""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("subquery",),
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (uncorrelated) subquery → Catalyst rewrites to a left-semi
    join on o_custkey (hash-broadcast here; shuffle-able at scale)."""
    _view(spark, sf_dir, "orders")
    _view(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_custkey IN
          (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "q_subquery_corr_agg",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey
FROM supplier s
WHERE CAST(round(s_acctbal * 100, 0) AS BIGINT) >
  (SELECT avg(CAST(round(s2.s_acctbal * 100, 0) AS BIGINT))
   FROM supplier s2 WHERE s2.s_nationkey = s.s_nationkey)
ORDER BY s_suppkey
""",
    tags=("subquery",),
)
def q_subquery_corr_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar-aggregate subquery: suppliers above their own
    nation's average balance. Decorrelates to groupBy(nation)-agg +
    equi-join — one shuffle on the correlation key, never a per-row
    re-execution. The comparison runs on exact integer cents: the inner
    avg is sum(int)/count (one double division, bit-identical in both
    engines), so row membership is deterministic."""
    _view(spark, sf_dir, "supplier")
    return spark.sql(
        """
        SELECT s_suppkey, s_name, s_nationkey
        FROM supplier s
        WHERE CAST(round(s_acctbal * 100, 0) AS BIGINT) >
          (SELECT avg(CAST(round(s2.s_acctbal * 100, 0) AS BIGINT))
           FROM supplier s2 WHERE s2.s_nationkey = s.s_nationkey)
        ORDER BY s_suppkey
        """
    )


@register(
    "q_subquery_exists_range",
    oracle="""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("subquery", "analytics"),
)
def q_subquery_exists_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders (in a date window) having at least one
    line item shipped more than 60 days after the order date, counted
    per priority. The correlated EXISTS with an extra non-equi conjunct
    becomes a left-semi join whose condition carries both the key
    equality and the date comparison — still hash-joinable on the
    equality, with the range predicate evaluated on matches."""
    _view(spark, sf_dir, "orders")
    _view(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-07-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )
