"""Scalable exact distributed selection (order statistics).

The building block behind equi-depth histograms and quantile scoring
(q_event_rfm, q_agg_equidepth_hist): the value at ascending rank p of a
column's multiset, computed EXACTLY with no global sort and no
single-partition WindowExec — the plan that survives 10⁹ rows where
``Window.orderBy(col)`` serializes and Spark's exact ``percentile``
buffers every value on one reducer.

Plan shape (every stage parallel):
  1. per-value histogram       — groupBy(value), parallel shuffle
  2. range-partition by value  — partition ids ascend with value
  3. per-partition cumsum      — Window PARTITIONED by pid
  4. cross-partition offsets   — broadcast self-join over the P-row
     totals table (P = partition count — bounded by cluster size,
     never by data size)
  5. boundary lookup           — min(value where cum ≥ p) per target
     rank, a map-side-combining aggregate.

Tie behavior: the result is a pure function of the value MULTISET
(the p-th smallest element, duplicates counted), so any engine — and
any partitioning — computes the identical answer. That property is what
makes the RFM and histogram oracles hard-deterministic cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_rank_values(df: DataFrame, col: str, pos_df: DataFrame) -> DataFrame:
    """Exact order statistics of ``df[col]`` at multiple rank positions.

    ``pos_df``: rows (k: any id column, p: long 1-based ascending rank).
    Returns rows (k, c) where c = the value of ``col`` at rank p —
    NULL if p is out of range (p < 1 or p > n).
    """
    nparts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    hist = df.groupBy(F.col(col).alias("v")).agg(F.count("*").alias("cnt"))
    h = hist.repartitionByRange(nparts, F.col("v").asc()).withColumn(
        "pid", F.spark_partition_id()
    )
    h = h.withColumn(
        "cum_in", F.sum("cnt").over(Window.partitionBy("pid").orderBy("v"))
    )
    totals = h.groupBy("pid").agg(F.sum("cnt").alias("tot"))
    offs = (
        totals.join(
            F.broadcast(
                totals.select(
                    F.col("pid").alias("bpid"), F.col("tot").alias("btot")
                )
            ),
            F.col("bpid") < F.col("pid"),
            "left",
        )
        .groupBy("pid")
        .agg(F.coalesce(F.sum("btot"), F.lit(0)).alias("off"))
    )
    h = h.join(F.broadcast(offs), "pid").withColumn(
        "cum", F.col("cum_in") + F.col("off")
    )
    return (
        h.crossJoin(F.broadcast(pos_df))
        .groupBy("k")
        .agg(F.min(F.when(F.col("cum") >= F.col("p"), F.col("v"))).alias("c"))
    )
