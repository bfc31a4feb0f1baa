"""M3 window functions (SURVEY.md §2.5).

Every window here partitions on a bounded-cardinality key (segment,
user_id, brand) — at 100 TB the partition key IS the scalability story:
one shuffle on the key, per-partition sort, streaming frame evaluation.
Determinism convention (SURVEY.md §5.3): any ordering that selects
surviving rows or assigns ordinal numbers includes a unique tiebreaker
key; timestamps are second-truncated so Spark (µs) and the oracle (ns)
order identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from micmac_li3ds_spark.functions.exact import cents
from micmac_li3ds_spark.registry import register
from micmac_li3ds_spark.tables import load


def _events_sec(spark, sf_dir):
    return load(spark, sf_dir, "events").withColumn(
        "ts_sec", F.date_trunc("second", F.col("ts"))
    )


_DUCK_TS_SEC = "date_trunc('second', CAST(ts AS TIMESTAMP))"


@register(
    "q_win_rank",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal,
       row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn,
       rank()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rnk,
       dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS drnk
FROM customer
""",
    tags=("window", "rank"),
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking trio. row_number orders with a unique tiebreaker (custkey)
    for determinism; rank/dense_rank deliberately order by the non-unique
    value so ties are exercised."""
    c = load(spark, sf_dir, "customer")
    w_unique = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_ties = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w_unique).alias("rn"),
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
    )


@register(
    "q_win_ntile",
    oracle="""
SELECT s_suppkey, s_nationkey, s_acctbal,
       ntile(4)       OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cdist
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
""",
    tags=("window", "ntile"),
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution functions (ntile/percent_rank/cume_dist) per nation:
    the window is PARTITIONED, so rows hash-shuffle across executors by
    s_nationkey and every partition sorts independently — no
    single-task global sort. (An unpartitioned distribution window
    serializes the whole table through one WindowExec task — Spark even
    warns "Moving all data to a single partition"; if a truly global
    quantile assignment is ever needed at scale, compute cutpoints with
    approx_percentile and join them, rather than sorting the world.)"""
    s = load(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    return s.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "q_win_lag_lead",
    oracle=f"""
SELECT event_id, user_id, value,
       lag(value, 1, 0.0)  OVER w AS prev_value,
       lead(value, 1, -1.0) OVER w AS next_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY {_DUCK_TS_SEC}, event_id)
""",
    tags=("window", "offset"),
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with explicit defaults per user timeline."""
    ev = _events_sec(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value", 1, 0.0).over(w).alias("prev_value"),
        F.lead("value", 1, -1.0).over(w).alias("next_value"),
    )


@register(
    "q_win_first_last",
    oracle="""
SELECT DISTINCT o_custkey,
       first_value(o_totalprice) OVER w AS first_total,
       last_value(o_totalprice)  OVER w AS last_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    tags=("window", "frame"),
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last order value per customer over an unbounded frame
    (last_value needs the explicit frame — the default frame stops at
    CURRENT ROW in both engines)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_total"),
        F.last("o_totalprice").over(w).alias("last_total"),
    ).distinct()


@register(
    "q_win_running",
    oracle=f"""
SELECT event_id, user_id,
       SUM(CAST(round(value * 100, 0) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY {_DUCK_TS_SEC}, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
         AS running_value
FROM events
""",
    tags=("window", "running"),
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per user — integer-cents sum keeps every prefix
    exact (double prefix sums drift between engines)."""
    ev = _events_sec(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        (F.sum(cents("value")).over(w) / 100.0).alias("running_value"),
    )


@register(
    "q_win_moving",
    oracle=f"""
SELECT event_id, user_id,
       round(SUM(CAST(round(value * 100, 0) AS BIGINT))
               OVER w / 100.0 / COUNT(*) OVER w, 6) AS moving_avg_24h
FROM events
WINDOW w AS (PARTITION BY user_id
             ORDER BY CAST(epoch({_DUCK_TS_SEC}) AS BIGINT)
             RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
""",
    tags=("window", "moving"),
)
def q_win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based (RANGE) moving average over a 24 h trailing window,
    ordered by epoch seconds. Peer rows (same second) share a frame in
    both engines; the average is exact-cents-sum / count."""
    ev = _events_sec(spark, sf_dir).withColumn(
        "epoch_sec", F.unix_timestamp("ts_sec")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_sec")
        .rangeBetween(-86400, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum(cents("value")).over(w) / 100.0 / F.count(F.lit(1)).over(w), 6).alias(
            "moving_avg_24h"
        ),
    )


@register(
    "q_win_topk_group",
    oracle="""
SELECT p_brand, p_partkey, p_retailprice, rn
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
)
WHERE rn <= 3
""",
    tags=("window", "topk"),
)
def q_win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: row_number + filter. Spark pushes a per-partition
    k-limit into the sort (WindowGroupLimit) — no full materialization
    of each group at scale."""
    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        p.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.row_number().over(w).alias("rn"),
        ).filter(F.col("rn") <= 3)
    )


@register(
    "q_win_dedup_latest",
    oracle=f"""
SELECT user_id, event_type, event_id, value
FROM (
  SELECT user_id, event_type, event_id, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY {_DUCK_TS_SEC} DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
""",
    tags=("window", "dedup"),
)
def q_win_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest dedup: one deterministic survivor per key by recency
    (ties → largest event_id). This is the engine's idempotent-reimport
    primitive (the reference re-imports files without duplicating rows)
    and the batch twin of streaming dropDuplicatesWithinWatermark."""
    ev = _events_sec(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts_sec").desc(), F.col("event_id").desc()
    )
    return (
        ev.select(
            "user_id",
            "event_type",
            "event_id",
            "value",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "q_win_range_frame",
    oracle="""
WITH ev AS (
  SELECT event_id, user_id,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id, ts_s,
       SUM(cents) OVER (PARTITION BY user_id ORDER BY ts_s
                        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
         / 100.0 AS trailing_1h,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY ts_s
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
         AS n_trailing
FROM ev
""",
    tags=("window", "range"),
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window (value-based frame, vs the ROWS frames of
    q_win_moving): per-user trailing 1-hour totals by EVENT TIME — rows
    whose ts falls within [t-3600 s, t] contribute, however many there
    are. RANGE frames are tie-safe by construction (all peers of the
    current ts share one frame → identical output for tied rows, no
    tiebreaker column needed). Same scale shape as every keyed window:
    one hash exchange on user_id, per-partition sort."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("ts_s"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s")
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_s",
        (F.sum("cents").over(w) / 100.0).alias("trailing_1h"),
        F.count(F.lit(1)).over(w).alias("n_trailing"),
    )


@register(
    "q_win_nth_value",
    oracle="""
SELECT DISTINCT o_custkey,
       nth_value(o_totalprice, 2) OVER w AS second_total,
       nth_value(o_orderkey, 2)  OVER w AS second_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    tags=("window", "nth"),
)
def q_win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over the full partition frame: each customer's SECOND
    order by date (NULL where fewer than two exist) — the offset lookup
    first/last can't express. The explicit unbounded frame matters:
    the default frame stops at CURRENT ROW, which would make nth_value
    row-dependent; with the full frame the value is constant per
    partition, so DISTINCT collapses to one row per customer
    identically in both engines. Ordering ties broken by o_orderkey."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.nth_value("o_totalprice", 2).over(w).alias("second_total"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_orderkey"),
    ).distinct()


@register(
    "q_win_percent_rank",
    oracle="""
SELECT c_custkey, c_nationkey, c_acctbal,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cum_dist
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
""",
    tags=("window", "rank"),
)
def q_win_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-standing window pair: percent_rank ((rank-1)/(n-1)) and
    cume_dist (peers/n) of every customer within their nation by
    balance. The unique tiebreaker (custkey) makes every frame unique,
    so both measures are exact small-integer ratios — bit-identical
    double division in any engine. Same scale shape as all keyed
    windows: one exchange on the partition key."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
    )


@register(
    "q_win_cumulative_distinct",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(epoch({_DUCK_TS_SEC}) AS BIGINT) AS ts_s
  FROM events
),
flagged AS (
  SELECT user_id, event_id, ts_s,
         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts_s, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM ev
)
SELECT user_id, event_id, ts_s,
       CAST(SUM(first_seen) OVER (PARTITION BY user_id
                                  ORDER BY ts_s, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS n_types_seen
FROM flagged
""",
    tags=("window", "events"),
)
def q_win_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over an ordered stream — a frame no SQL
    window can express directly (DISTINCT aggregates reject ORDER BY
    frames in both engines). The scalable rewrite: flag each row that is
    the FIRST occurrence of its (user, event_type) with row_number()=1,
    then running-sum the flags per user. Cost is two sort-window passes
    (keys (user_id, event_type) then user_id) — no distinct state grows
    with history, so the 100 TB shape is two exchanges regardless of
    how many events each user accumulates. Times compare as epoch
    seconds; event_id breaks ordering ties deterministically."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("ts_s"),
    )
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts_s", "event_id"
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = ev.withColumn(
        "first_seen",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
    )
    return flagged.select(
        "user_id",
        "event_id",
        "ts_s",
        F.sum("first_seen").over(w_cum).cast("long").alias("n_types_seen"),
    )


@register(
    "q_win_anomaly_zscore",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_id,
         CAST(epoch({_DUCK_TS_SEC}) AS BIGINT) AS ts_s,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
),
scored AS (
  SELECT user_id, event_id, ts_s, c,
         avg(c)         OVER w AS mu,
         stddev_samp(c) OVER w AS sigma,
         COUNT(*)       OVER w AS n_frame
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id
               ROWS BETWEEN 19 PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id, ts_s, c,
       round((c - mu) / sigma, 4) AS z
FROM scored
WHERE n_frame >= 10 AND sigma > 0
  AND abs(round((c - mu) / sigma, 4)) > 2.5
""",
    tags=("window", "events", "anomaly"),
)
def q_win_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: flag events whose value is
    more than 2.5 sample standard deviations from the mean of the
    previous (up to) 19 events of the same user — the self-exclusive
    frame (19 PRECEDING .. 1 PRECEDING) keeps an outlier from masking
    itself by inflating its own baseline. One sort-window pass per
    user: streamable state of 19 rows per key regardless of history,
    the shape that scores an unbounded event log in one exchange.
    Frames under 10 observations don't fire (cold-start guard).
    Values compare as integer cents; z rounds to 4 dp (stddev float
    association differs across engines below that) and the >2.5 CUT is
    taken on the ROUNDED z in both engines — on the raw float a
    borderline row could pass the threshold in one engine only, a
    row-membership divergence that output rounding can't repair."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("ts_s"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s", "event_id")
        .rowsBetween(-19, -1)
    )
    scored = ev.select(
        "user_id",
        "event_id",
        "ts_s",
        "c",
        F.avg("c").over(w).alias("mu"),
        F.stddev_samp("c").over(w).alias("sigma"),
        F.count(F.lit(1)).over(w).alias("n_frame"),
    )
    z4 = F.round((F.col("c") - F.col("mu")) / F.col("sigma"), 4)
    return (
        scored.filter(
            (F.col("n_frame") >= 10) & (F.col("sigma") > 0) & (F.abs(z4) > 2.5)
        )
        .select(
            "user_id",
            "event_id",
            "ts_s",
            "c",
            z4.alias("z"),
        )
    )


@register(
    "q_event_attribution",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(epoch({_DUCK_TS_SEC}) AS BIGINT) AS ts_s
  FROM events
),
tagged AS (
  SELECT user_id, event_id, event_type, ts_s,
         max(CASE WHEN event_type = 'click' THEN ts_s END)
           OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_click_s
  FROM ev
)
SELECT user_id, event_id, ts_s,
       CASE WHEN last_click_s >= ts_s - 604800 THEN last_click_s END
         AS attributed_click_s,
       coalesce(last_click_s >= ts_s - 604800, FALSE) AS attributed
FROM tagged
WHERE event_type = 'purchase'
""",
    tags=("window", "events", "attribution"),
)
def q_event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: credit each purchase to the
    user's most recent PRIOR click, provided it happened within the
    7-day lookback. Expressed as one conditional running MAX over each
    user's event stream (max click-time over the self-exclusive
    unbounded-preceding frame) — the classic attribution self-join
    ("purchases × earlier clicks, keep latest") collapses into a
    single window pass: one exchange on user_id, state of one
    timestamp per row, no join, no per-user explosion for heavy
    clickers. Strictly-prior frame (…, 1 PRECEDING) keeps a same-
    second click from attributing its own purchase row under ties;
    integer epoch-second math end-to-end."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("ts_s"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = ev.withColumn(
        "last_click_s",
        F.max(F.when(F.col("event_type") == "click", F.col("ts_s"))).over(w),
    )
    week = 604800
    in_window = F.col("last_click_s") >= F.col("ts_s") - week
    return tagged.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        "ts_s",
        F.when(in_window, F.col("last_click_s")).alias("attributed_click_s"),
        F.coalesce(in_window, F.lit(False)).alias("attributed"),
    )


@register(
    "q_win_streaks",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_type, event_id,
         CAST(epoch({_DUCK_TS_SEC}) AS BIGINT) AS ts_s,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY {_DUCK_TS_SEC}, event_id) AS rn,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY {_DUCK_TS_SEC}, event_id) AS rn_t
  FROM events
),
islands AS (
  SELECT user_id, event_type,
         COUNT(*) AS streak_len,
         min(ts_s) AS streak_start_s,
         min(event_id) AS first_event_id
  FROM ev
  GROUP BY user_id, event_type, rn - rn_t
)
SELECT user_id, event_type, streak_len, streak_start_s
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                ORDER BY streak_len DESC, streak_start_s, first_event_id) AS rk
      FROM islands)
WHERE rk = 1
""",
    tags=("window", "events", "islands"),
)
def q_win_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-run detection (gaps-and-islands): each
    user's longest unbroken streak of same-type events. The island key
    is the classic row_number difference — rn over the user's whole
    timeline minus rn within (user, type) is constant exactly while
    consecutive rows share a type — turning an inherently sequential
    'consecutive runs' question into two window passes plus a groupBy,
    all partitioned by user_id (the two row_numbers and the island
    aggregate ride ONE exchange; no self-join, no iteration). Ties on
    streak length resolve by earliest start then event id, so the
    per-user winner is engine-deterministic."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("ts_s"),
    )
    w_all = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy(
        "ts_s", "event_id"
    )
    islands = (
        ev.withColumn(
            "grp", F.row_number().over(w_all) - F.row_number().over(w_typ)
        )
        .groupBy("user_id", "event_type", "grp")
        .agg(
            F.count(F.lit(1)).alias("streak_len"),
            F.min("ts_s").alias("streak_start_s"),
            F.min("event_id").alias("first_event_id"),
        )
    )
    w_best = Window.partitionBy("user_id").orderBy(
        F.col("streak_len").desc(), "streak_start_s", "first_event_id"
    )
    return (
        islands.withColumn("rk", F.row_number().over(w_best))
        .filter(F.col("rk") == 1)
        .select("user_id", "event_type", "streak_len", "streak_start_s")
    )


@register(
    "q_win_pct_of_total",
    oracle="""
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
)
SELECT o_orderkey, o_custkey, c / 100.0 AS order_total,
       round(CAST(c AS DOUBLE)
             / SUM(c) OVER (PARTITION BY o_custkey), 6) AS pct_of_customer,
       CAST(SUM(c) OVER (PARTITION BY o_custkey) AS BIGINT) / 100.0
         AS customer_total
FROM o
""",
    tags=("window", "ratio"),
)
def q_win_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each order's share of its customer's lifetime
    total — the per-entity normalization window (feature scaling,
    contribution reports). One unordered window partition per
    customer; the denominator is an integer-cents sum so the only
    float is the final ratio, rounded identically on both engines.
    Unordered partition-wide frames need no sort at all — cheaper than
    any ordered window at scale."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("c")
    )
    w = Window.partitionBy("o_custkey")
    total = F.sum("c").over(w)
    return o.select(
        "o_orderkey",
        "o_custkey",
        (F.col("c") / 100.0).alias("order_total"),
        F.round(F.col("c").cast("double") / total, 6).alias(
            "pct_of_customer"
        ),
        (total.cast("long") / 100.0).alias("customer_total"),
    )


@register(
    "q_win_moving_median",
    oracle="""
SELECT o_custkey, o_orderkey,
       quantile_cont(CAST(round(o_totalprice * 100, 0) AS BIGINT), 0.5)
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med_c
FROM orders
""",
    tags=("window", "percentile", "robust"),
)
def q_win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving MEDIAN — the robust-statistics window the moving average
    (q_win_moving) can't be: a single whale order drags a trailing mean
    for its whole frame lifetime but moves the median at most one rank.
    Per customer, the median of the trailing 5 orders' totals in order
    date sequence — the shape behind robust baselines and
    median-absolute-deviation alerting.

    Spark has no median window function, but ``F.percentile(x, 0.5)``
    IS frameable (exact percentile over the frame); DuckDB's twin is
    ``quantile_cont``. Both engines interpolate the even-count midpoint
    as the mean of the two central values — on integer cents that is
    k.0 or k.5 exactly (a dyadic double), so parity is exact with no
    rounding fence. Frames are ROWS-bounded (≤ 5 values buffered per
    row), the window is customer-partitioned — fully parallel, state
    O(frame), the same 100-TB posture as every other §2.5 window."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-4, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.percentile(cents("o_totalprice"), F.lit(0.5)).over(w).alias("med_c"),
    )
