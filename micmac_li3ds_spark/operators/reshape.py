"""Reshaping & warehouse-maintenance operators: unpivot/melt, histogram
binning, and SCD type-2 interval construction.

These round out the §2 surface with the wide↔long reshapes and
dimension-maintenance patterns every warehouse migration needs; none of
them exist in the reference (a file-to-DB loader — SURVEY.md §2
exhaustiveness note), so all are category S/N engine surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from micmac_li3ds_spark.functions.exact import cents, duck_cents
from micmac_li3ds_spark.functions.selection import exact_rank_values
from micmac_li3ds_spark.registry import register
from micmac_li3ds_spark.tables import load


@register(
    "q_reshape_unpivot",
    oracle="""
WITH wide AS (
  SELECT l_returnflag,
         CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
           AS sum_price,
         CAST(count(*) AS DOUBLE) AS n_items
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, measure, value
FROM wide UNPIVOT (value FOR measure IN (sum_qty, sum_price, n_items))
ORDER BY l_returnflag, measure
""",
    tags=("reshape",),
)
def q_reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt): aggregate lineitem to one wide row per
    return flag, then turn the three measure columns into (measure,
    value) rows — the inverse of q_agg_pivot. Unpivot is a zero-shuffle
    Expand node: each input row fans out to k rows map-side, so at 100 TB
    it adds no exchange beyond the aggregation that feeds it. Quantities
    ride exact integer math before the final double cast so the melted
    values hash-match across engines."""
    li = load(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(F.round(F.col("l_quantity")).cast("long")).cast("double").alias(
            "sum_qty"
        ),
        (F.sum(cents("l_extendedprice")).cast("double") / 100.0).alias("sum_price"),
        F.count(F.lit(1)).cast("double").alias("n_items"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "n_items"],
        variableColumnName="measure",
        valueColumnName="value",
    ).orderBy("l_returnflag", "measure")


@register(
    "q_agg_histogram",
    oracle="""
SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bin,
       CAST(floor(o_totalprice / 50000.0) AS BIGINT) * 50000.0 AS bin_lo,
       count(*) AS n_orders,
       round(avg(o_totalprice), 2) AS avg_price
FROM orders
GROUP BY bin
ORDER BY bin
""",
    tags=("reshape", "aggregate"),
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram of order values: bin = floor(x / width).
    Single map-side expression + one aggregate shuffle on the bin id —
    the cross-engine-safe spelling of width_bucket (whose Spark and
    DuckDB implementations associate the divide differently, so exact
    bucket boundaries could disagree in the last ulp). 2-dp prices are
    never within an ulp of a 50000 boundary, so binning is exact."""
    orders = load(spark, sf_dir, "orders")
    bin_col = F.floor(F.col("o_totalprice") / 50000.0)
    return (
        orders.groupBy(bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
        .select(
            "bin",
            (F.col("bin") * 50000.0).alias("bin_lo"),
            "n_orders",
            "avg_price",
        )
        .orderBy("bin")
    )


@register(
    "q_etl_scd2",
    oracle="""
WITH e AS (
  SELECT user_id, event_type,
         date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts_sec, event_id
  FROM events
), marked AS (
  SELECT *,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id)
           AS prev_type
  FROM e
), changes AS (
  SELECT user_id, event_type, ts_sec, event_id
  FROM marked
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type,
       ts_sec AS valid_from,
       lead(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id)
         AS valid_to
FROM changes
ORDER BY user_id, valid_from, event_id
""",
    tags=("etl", "reshape"),
)
def q_etl_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: collapse each user's event
    stream into validity intervals [valid_from, valid_to) that open when
    event_type changes, with NULL valid_to marking the current row —
    the standard way a warehouse tracks attribute history. Two window
    passes over one partitioning (user_id) = ONE shuffle: lag detects
    change points, lead closes each interval with the next change's
    start. ts is second-truncated per the cross-engine convention
    (SURVEY.md §5.3); event_id breaks ordering ties deterministically."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.date_trunc("second", F.col("ts")).alias("ts_sec"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .drop("prev_type")
    )
    # No trailing orderBy (r18, guide §2.4 "an orderBy used only to make
    # output deterministic"): the SCD2 relation is a set of validity
    # intervals — the driver's value hash and the DuckDB parity check
    # are both order-insensitive, and the final global sort was a full
    # range-partition exchange + sort of every interval row purely for
    # presentation. At 100 TB that exchange is the single largest cost
    # of the query; dropping it changes no result value.
    return (
        changes.withColumn("valid_from", F.col("ts_sec"))
        .withColumn("valid_to", F.lead("ts_sec").over(w))
        .select("user_id", "event_type", "valid_from", "valid_to")
    )


@register(
    "q_profile_columns",
    oracle="""
WITH p AS (
  SELECT count(*) AS n_rows,
         count(o_orderkey) AS nn_key, count(DISTINCT o_orderkey) AS nd_key,
         CAST(min(o_orderkey) AS DOUBLE) AS mn_key,
         CAST(max(o_orderkey) AS DOUBLE) AS mx_key,
         count(o_custkey) AS nn_cust, count(DISTINCT o_custkey) AS nd_cust,
         CAST(min(o_custkey) AS DOUBLE) AS mn_cust,
         CAST(max(o_custkey) AS DOUBLE) AS mx_cust,
         count(o_totalprice) AS nn_tp, count(DISTINCT o_totalprice) AS nd_tp,
         min(o_totalprice) AS mn_tp, max(o_totalprice) AS mx_tp
  FROM orders
)
SELECT 'o_orderkey' AS col, n_rows, n_rows - nn_key AS n_nulls,
       nd_key AS n_distinct, mn_key AS vmin, mx_key AS vmax FROM p
UNION ALL
SELECT 'o_custkey', n_rows, n_rows - nn_cust, nd_cust, mn_cust, mx_cust FROM p
UNION ALL
SELECT 'o_totalprice', n_rows, n_rows - nn_tp, nd_tp, mn_tp, mx_tp FROM p
""",
    tags=("reshape", "profiling"),
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profiling: one scan computes row count and
    per-column null count / distinct count / min / max, emitted as one
    row per column. This is the statistics pass a deploy runs to feed
    Catalyst's CBO (`ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`)
    — expressed as a query so the oracle can check it. Single-pass
    single-shuffle: all aggregates ride one partial+final hash
    aggregate; the per-column rows are a driver-side reshape of the
    1-row result (3 projections of one agg, not 3 scans)."""
    orders = load(spark, sf_dir, "orders")
    # NOT cached (r18, measured 0.80 s → 2.06 s noop with a scoped
    # cache): the three per-column projections LOOK like one shared
    # subtree, but Catalyst prunes each branch to a single-column
    # aggregate (one Expand each); materializing the full 3-distinct
    # aggregate once is a wider Expand and costs more than the three
    # pruned recomputes. Prune-aware exception to the cache-shared-
    # subtrees rule — see OPTIMIZATION_r18.md.
    p = (orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderkey").alias("nn_key"),
        F.countDistinct("o_orderkey").alias("nd_key"),
        F.min("o_orderkey").cast("double").alias("mn_key"),
        F.max("o_orderkey").cast("double").alias("mx_key"),
        F.count("o_custkey").alias("nn_cust"),
        F.countDistinct("o_custkey").alias("nd_cust"),
        F.min("o_custkey").cast("double").alias("mn_cust"),
        F.max("o_custkey").cast("double").alias("mx_cust"),
        F.count("o_totalprice").alias("nn_tp"),
        F.countDistinct("o_totalprice").alias("nd_tp"),
        F.min("o_totalprice").alias("mn_tp"),
        F.max("o_totalprice").alias("mx_tp"),
    ))

    def row(col: str, nn: str, nd: str, mn: str, mx: str):
        return p.select(
            F.lit(col).alias("col"),
            F.col("n_rows"),
            (F.col("n_rows") - F.col(nn)).alias("n_nulls"),
            F.col(nd).alias("n_distinct"),
            F.col(mn).alias("vmin"),
            F.col(mx).alias("vmax"),
        )

    return (
        row("o_orderkey", "nn_key", "nd_key", "mn_key", "mx_key")
        .unionByName(row("o_custkey", "nn_cust", "nd_cust", "mn_cust", "mx_cust"))
        .unionByName(row("o_totalprice", "nn_tp", "nd_tp", "mn_tp", "mx_tp"))
    )


@register(
    "q_profile_columns_sketch",
    oracle="""
WITH p AS (
  SELECT COUNT(*) AS n_rows,
         COUNT(o_orderkey) AS nn_key,
         COUNT(DISTINCT o_orderkey) AS nd_key,
         CAST(min(o_orderkey) AS DOUBLE) AS mn_key,
         CAST(max(o_orderkey) AS DOUBLE) AS mx_key,
         COUNT(o_custkey) AS nn_cust,
         COUNT(DISTINCT o_custkey) AS nd_cust,
         CAST(min(o_custkey) AS DOUBLE) AS mn_cust,
         CAST(max(o_custkey) AS DOUBLE) AS mx_cust,
         COUNT(o_totalprice) AS nn_tp,
         COUNT(DISTINCT o_totalprice) AS nd_tp,
         min(o_totalprice) AS mn_tp,
         max(o_totalprice) AS mx_tp
  FROM orders
)
SELECT 'o_orderkey' AS col, n_rows, n_rows - nn_key AS n_nulls,
       nd_key AS n_distinct, TRUE AS sketch_ok, mn_key AS vmin, mx_key AS vmax
FROM p
UNION ALL
SELECT 'o_custkey', n_rows, n_rows - nn_cust, nd_cust, TRUE, mn_cust, mx_cust
FROM p
UNION ALL
SELECT 'o_totalprice', n_rows, n_rows - nn_tp, nd_tp, TRUE, mn_tp, mx_tp
FROM p
""",
    tags=("reshape", "profiling", "sketch"),
)
def q_profile_columns_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of q_profile_columns: distinct counts via
    HyperLogLog++ (``approx_count_distinct``, 2% relative SD) instead of
    exact ``countDistinct``. Exact distinct on N columns multiplies the
    aggregate's state by the distinct-key volume of each column and
    forces a full dedup per column; HLL state is a fixed few-KB sketch
    per column regardless of cardinality, and it map-side combines —
    the stats pass stays one cheap scan at any scale.

    Verification: the HLL estimate is engine-specific, so the checkable
    surface is a BANDED oracle — ``sketch_ok`` asserts
    |approx − exact| ≤ 4·rsd·exact per column (4σ: rsd is a standard
    deviation, not a hard bound — see q_agg_approx_distinct) (Spark's HLL is
    deterministic for a dataset, so this is a hard row, not a flaky
    tolerance) and the oracle emits literal TRUE; the exact distinct
    rides along as ``n_distinct`` for value parity. Production profiling
    drops the exact column — it exists here to attest the sketch."""
    orders = load(spark, sf_dir, "orders")
    rsd = 0.02

    def stats(c: str, suffix: str, cast_minmax: bool):
        mn, mx = F.min(c), F.max(c)
        if cast_minmax:
            mn, mx = mn.cast("double"), mx.cast("double")
        return [
            F.count(c).alias(f"nn_{suffix}"),
            F.countDistinct(c).alias(f"nd_{suffix}"),
            F.approx_count_distinct(c, rsd).alias(f"nda_{suffix}"),
            mn.alias(f"mn_{suffix}"),
            mx.alias(f"mx_{suffix}"),
        ]

    # NOT cached — same prune-aware exception as q_profile_columns
    # (r18, measured 4.55 s → 16.81 s with a scoped cache: the cached
    # monolith pays one Expand over every distinct+HLL column at once).
    p = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *stats("o_orderkey", "key", True),
        *stats("o_custkey", "cust", True),
        *stats("o_totalprice", "tp", False),
    )

    def row(col: str, s: str):
        return p.select(
            F.lit(col).alias("col"),
            F.col("n_rows"),
            (F.col("n_rows") - F.col(f"nn_{s}")).alias("n_nulls"),
            F.col(f"nd_{s}").alias("n_distinct"),
            (
                F.abs(F.col(f"nda_{s}") - F.col(f"nd_{s}"))
                <= 4 * rsd * F.col(f"nd_{s}")
            ).alias("sketch_ok"),
            F.col(f"mn_{s}").alias("vmin"),
            F.col(f"mx_{s}").alias("vmax"),
        )

    return (
        row("o_orderkey", "key")
        .unionByName(row("o_custkey", "cust"))
        .unionByName(row("o_totalprice", "tp"))
    )


@register(
    "q_etl_sessionize",
    oracle="""
WITH ev AS (
  SELECT user_id, event_id,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
flagged AS (
  SELECT user_id, event_id, ts_s, cents,
         CASE WHEN lag(ts_s) OVER w IS NULL
                OR ts_s - lag(ts_s) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
),
sessions AS (
  SELECT user_id, event_id, ts_s, cents,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       MIN(ts_s) AS session_start_s,
       MAX(ts_s) AS session_end_s,
       COUNT(*) AS n_events,
       SUM(cents) / 100.0 AS total_value
FROM sessions
GROUP BY user_id, session_seq
""",
    tags=("etl", "reshape", "session"),
)
def q_etl_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by inactivity gap (30 min) — the lag+cumsum
    idiom: flag a session break where the gap to the previous event
    exceeds the threshold, running-sum the flags into a per-user session
    sequence number, then aggregate per session. The streaming twin is
    ``session_window`` (q_stream_session); THIS shape is what you run
    over a historical corpus: both window passes and the final aggregate
    partition by user_id, so the whole query rides ONE hash exchange.
    Times compare as epoch seconds (integer math — exact parity);
    event_id breaks ordering ties deterministically."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("ts_s"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    flagged = ev.withColumn(
        "new_s",
        F.when(
            F.lag("ts_s").over(w).isNull()
            | (F.col("ts_s") - F.lag("ts_s").over(w) > 1800),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_seq",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.min("ts_s").alias("session_start_s"),
        F.max("ts_s").alias("session_end_s"),
        F.count(F.lit(1)).alias("n_events"),
        (F.sum("cents") / 100.0).alias("total_value"),
    )


@register(
    "q_ts_gap_fill",
    oracle="""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         SUM(CAST(round(value * 100) AS BIGINT)) AS c
  FROM events GROUP BY user_id, h
),
span AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY user_id),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM span
),
j AS (
  SELECT g.user_id, g.h, hourly.c
  FROM grid g LEFT JOIN hourly USING (user_id, h)
),
f AS (
  SELECT user_id, c,
         last_value(c IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY h ROWS UNBOUNDED PRECEDING) AS fc
  FROM j
)
SELECT user_id,
       count(*) AS n_hours,
       count(c) AS n_observed,
       count(*) - count(c) AS n_gaps,
       CAST(SUM(fc) AS DOUBLE) / 100.0 AS filled_total
FROM f
GROUP BY user_id
ORDER BY user_id
""",
    tags=("reshape", "timeseries"),
)
def q_ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap fill: per user, build the dense hourly
    grid between their first and last event, left-join observed hourly
    totals, forward-fill the holes (last observation carried forward),
    and report per-user coverage — the standard densification step
    before any per-entity time-series model. The grid is generated with
    explode(sequence(h0, h1, 1 hour)) — rows only where a user has
    span, never a cross join against a calendar table. Everything
    partitions by user_id (grid join, fill window, final aggregate →
    one hash exchange rides through); grid width is bounded by each
    user's own span, so a 100 TB corpus fans out by entity, not by
    global time range. Money totals ride the integer-cents convention
    (functions/exact.py)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("hour", F.col("ts")).alias("h"),
        cents("value").alias("c0"),
    )
    hourly = ev.groupBy("user_id", "h").agg(F.sum("c0").alias("c"))
    span = hourly.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = span.select(
        "user_id",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
    )
    joined = grid.join(hourly, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = joined.select(
        "user_id",
        "c",
        F.last("c", ignorenulls=True).over(w).alias("fc"),
    )
    return (
        filled.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.count("c").alias("n_observed"),
            (F.count(F.lit(1)) - F.count("c")).alias("n_gaps"),
            (F.sum("fc").cast("double") / 100.0).alias("filled_total"),
        )
        .orderBy("user_id")
    )


@register(
    "q_ts_resample_ohlc",
    oracle="""
WITH ev AS (
  SELECT user_id, event_id,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
),
ranked AS (
  SELECT user_id, event_id, ts_s, c,
         (ts_s // 600) * 600 AS bucket_s,
         row_number() OVER (PARTITION BY user_id, (ts_s // 600)
                            ORDER BY ts_s, event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id, (ts_s // 600)
                            ORDER BY ts_s DESC, event_id DESC) AS rn_d
  FROM ev
)
SELECT user_id, bucket_s,
       COUNT(*) AS n_events,
       MAX(CASE WHEN rn_a = 1 THEN c END) AS open_c,
       MAX(c) AS high_c,
       MIN(c) AS low_c,
       MAX(CASE WHEN rn_d = 1 THEN c END) AS close_c,
       CAST(SUM(c) AS BIGINT) AS vol_c
FROM ranked
GROUP BY user_id, bucket_s
""",
    tags=("reshape", "timeseries", "events"),
)
def q_ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling to 10-minute OHLC bars (open / high /
    low / close / volume per user per bucket) — the classic resample
    shape. Open and close are first/last by (ts, event_id) inside the
    bucket, expressed as row_number asc/desc + conditional MAX so both
    engines pick the identical row under timestamp ties (no engine-
    specific FIRST/arg_min semantics). Both window passes and the final
    aggregate share the (user_id, bucket) grouping, so the whole query
    rides one hash exchange; values compare as integer cents and bucket
    boundaries as integer epoch math — exact cross-engine parity."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("ts_s"),
        cents("value").alias("c"),
    )
    ev = ev.withColumn(
        "bucket_s", (F.floor(F.col("ts_s") / 600) * 600).cast("long")
    )
    wa = Window.partitionBy("user_id", "bucket_s").orderBy("ts_s", "event_id")
    wd = Window.partitionBy("user_id", "bucket_s").orderBy(
        F.col("ts_s").desc(), F.col("event_id").desc()
    )
    ranked = ev.select(
        "user_id",
        "bucket_s",
        "c",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return ranked.groupBy("user_id", "bucket_s").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.when(F.col("rn_a") == 1, F.col("c"))).alias("open_c"),
        F.max("c").alias("high_c"),
        F.min("c").alias("low_c"),
        F.max(F.when(F.col("rn_d") == 1, F.col("c"))).alias("close_c"),
        F.sum("c").alias("vol_c"),
    )


@register(
    "q_ts_ewma",
    oracle="""
WITH ev AS (
  SELECT user_id, event_id,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
)
SELECT user_id, event_id, ts_s, c,
       list_reduce(
         list(CAST(c AS DOUBLE))
           OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
         (acc, x) -> acc / 2 + x) AS ewma_c
FROM ev
""",
    tags=("reshape", "timeseries", "events"),
)
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially decayed moving sum (half-life decay 1/2 per
    event) over each user's event stream — the trend-smoothing shape
    behind EWMA dashboards and rate limiters. The recursion
    s = s/2 + x is evaluated as a fold over the trailing 20-row frame
    (collect_list preserves frame order; F.aggregate folds left-to-
    right, matching DuckDB list_reduce's seeding with the first
    element because acc₀=0 → 0/2+x₁ = x₁).

    Determinism by construction, not by rounding: the decay factor is
    EXACTLY representable (2⁻¹), inputs are integer cents, and every
    partial s fits in ≤ 40 significand bits (20-bit cents × 2⁻¹⁹ tail
    + 20-element sum), so the fold is EXACT dyadic arithmetic — the
    same bits on any engine and any evaluation order of the plan, with
    no float-association rounding to paper over. A bounded frame also
    caps window state at 20 rows per key: the unbounded-history EWMA
    recursion would need a true running state (see
    applyInPandasWithState for that shape); truncating at 2⁻²⁰ ≈ 1e-6
    of a cent is below any reportable precision. One hash exchange on
    user_id end-to-end."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("ts_s"),
        cents("value").alias("c"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    arr = F.collect_list(F.col("c").cast("double")).over(w)
    return ev.select(
        "user_id",
        "event_id",
        "ts_s",
        "c",
        F.aggregate(
            arr, F.lit(0.0), lambda acc, x: acc / 2 + x
        ).alias("ewma_c"),
    )


_EDH_B = 8  # equi-depth bucket count
_EDH_CUTS = ", ".join(f"({k})" for k in range(1, _EDH_B))


@register(
    "q_agg_equidepth_hist",
    oracle=f"""
WITH src AS (SELECT {duck_cents("o_totalprice")} AS v FROM orders),
nn AS (SELECT COUNT(*) AS n FROM src),
pos AS (
  SELECT k, k * (n // {_EDH_B}) + least(k, n % {_EDH_B}) AS p
  FROM nn, (VALUES {_EDH_CUTS}) t(k)
),
rk AS (SELECT v, row_number() OVER (ORDER BY v) AS r FROM src),
cut AS (SELECT p.k AS k, min(rk.v) AS c FROM pos p JOIN rk ON rk.r = p.p
        GROUP BY p.k),
cc AS (
  SELECT {", ".join(f"max(CASE WHEN k = {k} THEN c END) AS c{k}"
                    for k in range(1, _EDH_B))}
  FROM cut
),
scored AS (
  SELECT v,
         1 {" ".join(f"+ CAST(v > c{k} AS INT)" for k in range(1, _EDH_B))}
           AS bucket
  FROM src, cc
)
SELECT bucket, COUNT(*) AS n_rows,
       min(v) AS lo_c, max(v) AS hi_c
FROM scored GROUP BY bucket
""",
    tags=("agg", "histogram", "quantile"),
)
def q_agg_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-frequency) histogram of order totals — the
    dual of q_agg_histogram's equi-WIDTH bins, and the harder one at
    scale because the bucket EDGES are order statistics of the data
    rather than arithmetic on min/max. The 8-quantile edges come
    from functions/selection.py's exact distributed selection (value
    histogram → range-partitioned partial cumsum → broadcast offsets →
    boundary aggregate — no global sort, no single-partition window,
    no driver-side value buffering), are broadcast as one row, and
    every order scores its bucket map-side: 1 + Σ(v > edge_k). Rows
    with EQUAL totals land in the same bucket (value-quantile
    semantics — deterministic in any engine, unlike ntile's positional
    tie split), so bucket populations deviate from n/8 exactly
    where ties straddle an edge; lo_c/hi_c expose the realized edges.
    All arithmetic is integer cents."""
    src = load(spark, sf_dir, "orders").select(
        cents("o_totalprice").alias("v")
    )
    n_df = src.agg(F.count("*").alias("n"))
    stack_args = ", ".join(
        f"{k}, CAST({k} * (n div {_EDH_B}) + least({k}, n % {_EDH_B})"
        " AS BIGINT)"
        for k in range(1, _EDH_B)
    )
    pos = n_df.selectExpr(
        f"stack({_EDH_B - 1}, {stack_args}) AS (k, p)"
    )
    cuts = exact_rank_values(src, "v", pos)
    cuts_row = cuts.groupBy().agg(
        *[
            F.max(F.when(F.col("k") == k, F.col("c"))).alias(f"c{k}")
            for k in range(1, _EDH_B)
        ]
    )
    bucket = F.lit(1)
    for k in range(1, _EDH_B):
        bucket = bucket + (F.col("v") > F.col(f"c{k}")).cast("int")
    return (
        src.crossJoin(F.broadcast(cuts_row))
        .select("v", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("v").alias("lo_c"),
            F.max("v").alias("hi_c"),
        )
    )


@register(
    "q_agg_winsorize",
    oracle=f"""
WITH src AS (SELECT {duck_cents("l_extendedprice")} AS v FROM lineitem),
nn AS (SELECT COUNT(*) AS n FROM src),
pos AS (
  SELECT greatest(1, (5 * n) // 100) AS p_lo,
         least(n, (95 * n) // 100 + 1) AS p_hi
  FROM nn
),
rk AS (SELECT v, row_number() OVER (ORDER BY v) AS r FROM src),
cuts AS (
  SELECT max(CASE WHEN r.r = p.p_lo THEN r.v END) AS lo_c,
         max(CASE WHEN r.r = p.p_hi THEN r.v END) AS hi_c
  FROM rk r, pos p
)
SELECT (SELECT n FROM nn) AS n_rows,
       c.lo_c, c.hi_c,
       (SELECT CAST(SUM(v) AS BIGINT) FROM src) AS sum_raw_c,
       (SELECT CAST(SUM(least(greatest(v, c.lo_c), c.hi_c)) AS BIGINT)
        FROM src) AS sum_clipped_c,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM src
        WHERE v < c.lo_c OR v > c.hi_c) AS n_clipped
FROM cuts c
""",
    tags=("agg", "quantile", "dataprep"),
)
def q_agg_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization audit — the standard outlier-robust data-prep
    step: clip extended prices to the exact [p05, p95] order
    statistics and report the clip bounds, raw vs clipped sums, and
    how many rows were clipped. The two cut values come from
    functions/selection.py's exact distributed selection (same
    machinery as q_agg_equidepth_hist — no global sort, no
    single-partition window), broadcast as one row, and the clip +
    re-aggregation is one map-side-combining pass. Everything is
    integer cents, so both engines agree bit-for-bit: the cuts are
    pure functions of the value multiset and the clipped sum is
    integer arithmetic."""
    src = load(spark, sf_dir, "lineitem").select(
        cents("l_extendedprice").alias("v")
    )
    n_df = src.agg(F.count("*").alias("n"))
    pos = n_df.selectExpr(
        "stack(2, 'lo', CAST(greatest(1, (5 * n) div 100) AS BIGINT), "
        "'hi', CAST(least(n, (95 * n) div 100 + 1) AS BIGINT)) AS (k, p)"
    )
    cuts = exact_rank_values(src, "v", pos)
    cuts_row = cuts.groupBy().agg(
        F.max(F.when(F.col("k") == "lo", F.col("c"))).alias("lo_c"),
        F.max(F.when(F.col("k") == "hi", F.col("c"))).alias("hi_c"),
    )
    clipped = F.least(F.greatest(F.col("v"), F.col("lo_c")), F.col("hi_c"))
    return (
        src.crossJoin(F.broadcast(cuts_row))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("lo_c").alias("lo_c"),
            F.max("hi_c").alias("hi_c"),
            F.sum("v").alias("sum_raw_c"),
            F.sum(clipped).alias("sum_clipped_c"),
            F.count(
                F.when(
                    (F.col("v") < F.col("lo_c"))
                    | (F.col("v") > F.col("hi_c")),
                    1,
                )
            ).alias("n_clipped"),
        )
    )
