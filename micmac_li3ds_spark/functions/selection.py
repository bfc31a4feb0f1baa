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

from micmac_li3ds_spark.session import shuffle_partitions


def with_global_prefix(
    df: DataFrame,
    order_cols: list,
    val_col: str,
    agg: str = "sum",
    inclusive: bool = True,
    out: str = "cum",
    rank_out: str | None = None,
) -> DataFrame:
    """Exact GLOBAL prefix aggregate (running sum / running min) and
    optional global 1-based row rank over ``df`` ordered by
    ``order_cols`` — with no single-partition ``Window.orderBy``.

    Same plan family as :func:`exact_rank_values`: range-partition on
    the order (partition ids ascend with the sort), per-partition
    window (parallel), then a broadcast join against the P-row
    per-partition totals to add cross-partition offsets. P is bounded
    by cluster size, never data size, so the shape survives 10⁹ rows
    where a global window serializes onto one reducer.

    ``order_cols`` must define a TOTAL order (include a tiebreaker
    key): the result is then a pure function of the data, independent
    of how the range sampler draws partition boundaries.

    ``agg='sum'`` → ``out`` = running sum of ``val_col``;
    ``agg='min'`` → ``out`` = running min. ``inclusive=False`` makes
    the prefix STRICT (rows strictly before the current row; NULL for
    the global first row) — the primitive behind skyline dominance.
    """
    if agg not in ("sum", "min"):
        raise ValueError(f"unsupported prefix agg: {agg}")
    fn = F.sum if agg == "sum" else F.min
    nparts = shuffle_partitions(df.sparkSession)
    d = df.repartitionByRange(nparts, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    frame = (
        w.rowsBetween(Window.unboundedPreceding, 0)
        if inclusive
        else w.rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn("_in", fn(val_col).over(frame)).withColumn(
        "_rn", F.row_number().over(w)
    )
    totals = d.groupBy("_pid").agg(
        fn(val_col).alias("_tot"), F.count(F.lit(1)).alias("_cnt")
    )
    prior = F.col("_bpid") < F.col("_pid")
    offs = (
        totals.join(
            F.broadcast(
                totals.select(
                    F.col("_pid").alias("_bpid"),
                    F.col("_tot").alias("_btot"),
                    F.col("_cnt").alias("_bcnt"),
                )
            ),
            prior,
            "left",
        )
        .groupBy("_pid")
        .agg(
            (F.sum("_btot") if agg == "sum" else F.min("_btot")).alias("_off"),
            F.coalesce(F.sum("_bcnt"), F.lit(0)).alias("_roff"),
        )
    )
    d = d.join(F.broadcast(offs), "_pid")
    if agg == "sum":
        combined = F.col("_in") + F.coalesce(F.col("_off"), F.lit(0))
        # strict prefix of the global first row is an empty sum → NULL
        if not inclusive:
            combined = F.when(
                F.col("_in").isNull() & F.col("_off").isNull(), F.lit(None)
            ).otherwise(
                F.coalesce(F.col("_in"), F.lit(0))
                + F.coalesce(F.col("_off"), F.lit(0))
            )
        d = d.withColumn(out, combined)
    else:
        d = d.withColumn(out, F.least("_in", "_off"))
    if rank_out is not None:
        d = d.withColumn(rank_out, F.col("_rn") + F.col("_roff"))
    return d.drop("_pid", "_in", "_rn", "_off", "_roff")


def exact_rank_values(df: DataFrame, col: str, pos_df: DataFrame) -> DataFrame:
    """Exact order statistics of ``df[col]`` at multiple rank positions.

    ``pos_df``: rows (k: any id column, p: long 1-based ascending rank).
    Returns rows (k, c) where c = the value of ``col`` at rank p —
    NULL if p is out of range (p < 1 or p > n).
    """
    nparts = shuffle_partitions(df.sparkSession)
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
