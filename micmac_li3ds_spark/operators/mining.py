"""Data-mining / BI composites (round 7): concentration analysis,
sequence mining, interpolation, Pareto-optimality, and cohort economics.

These are the warehouse-analytics shapes that sit one level above the
single-operator inventory: each composes aggregation, windowing, and the
distributed order-statistics machinery (functions/selection.py) into a
query a BI or growth team runs daily. The unifying scale discipline is
the same one that drove the round-7 RFM rewrite: NOTHING here puts a
global ``Window.orderBy`` on a data-sized input. Global running sums,
ranks, and prefix minima all go through ``with_global_prefix`` — a
range-partitioned scan whose only serial structure is a broadcast join
over the P-row partition-totals table (P = cluster parallelism, not data
size).

Cross-engine exactness follows SURVEY.md §5.3: money in integer cents,
ratios as a single double division of identical integers (IEEE-identical
in both engines), comparisons in pure integer algebra, and `round(,6)`
only on final reported ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from micmac_li3ds_spark.functions.exact import cents, duck_cents, duck_pct, pct
from micmac_li3ds_spark.functions.selection import with_global_prefix
from micmac_li3ds_spark.registry import register
from micmac_li3ds_spark.tables import load


@register(
    "q_abc_pareto",
    oracle=f"""
WITH rev AS (
  SELECT l_partkey,
         SUM({duck_cents('l_extendedprice')}
             * (100 - {duck_pct('l_discount')})) AS r
  FROM lineitem GROUP BY l_partkey
),
c AS (
  SELECT r,
         SUM(r) OVER (ORDER BY r DESC, l_partkey
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(r) OVER () AS tot
  FROM rev
)
SELECT CASE WHEN cum * 100 <= 80 * tot THEN 'A'
            WHEN cum * 100 <= 95 * tot THEN 'B'
            ELSE 'C' END AS abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(r) AS DOUBLE) / 10000.0 AS class_revenue
FROM c GROUP BY abc_class
""",
    tags=("mining", "analytics", "prefix-scan"),
)
def q_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto inventory classification: rank parts by discounted
    revenue, classify by cumulative revenue share (A ≤ 80 %, B ≤ 95 %,
    C = tail) and report each class's size and revenue. The canonical
    "20 % of SKUs drive 80 % of revenue" audit.

    The global running sum over revenue-descending order is the trap:
    ``Window.orderBy(rev.desc())`` serializes every part through one
    reducer. Here it rides ``with_global_prefix`` — range-partition on
    (rev DESC, partkey), per-partition cumsum, broadcast offsets — so
    the scan stays parallel at any part count. Class cuts compare in
    integer algebra (cum·100 ≤ 80·tot): bit-exact cross-engine, no
    float share ever materialized. Revenue units are cents·percent
    (longs); at true 100 TB row counts the running sum would move to
    decimal(38,0) — same plan, wider type."""
    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(cents("l_extendedprice") * (100 - pct("l_discount"))).alias("r")
    )
    d = with_global_prefix(
        rev,
        [F.col("r").desc(), F.col("l_partkey").asc()],
        "r",
        agg="sum",
        out="cum",
    )
    tot = rev.agg(F.sum("r").alias("tot"))
    cls = (
        F.when(F.col("cum") * 100 <= 80 * F.col("tot"), "A")
        .when(F.col("cum") * 100 <= 95 * F.col("tot"), "B")
        .otherwise("C")
    )
    return (
        d.crossJoin(F.broadcast(tot))
        .groupBy(cls.alias("abc_class"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            (F.sum("r").cast("double") / 10000.0).alias("class_revenue"),
        )
    )


@register(
    "q_agg_gini",
    oracle=f"""
WITH spend AS (
  SELECT o_custkey, SUM({duck_cents('o_totalprice')}) AS x
  FROM orders GROUP BY o_custkey
),
r AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS rk FROM spend
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(x) AS DOUBLE) / 100.0 AS total_spend,
       round(CAST(2 * SUM(rk * x) - (COUNT(*) + 1) * SUM(x) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * SUM(x)), 6) AS gini
FROM r
""",
    tags=("mining", "aggregate", "prefix-scan"),
)
def q_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend concentration — the standard
    single-number inequality audit (0 = uniform, →1 = one whale), via
    the rank formula G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over spend
    sorted ascending.

    The global rank i comes from ``with_global_prefix``'s rank channel
    (range partition + row_number per partition + broadcast count
    offsets) — not a global window. Ties rank deterministically by
    (x, custkey), and since Σ i·xᵢ sums i over equal x in both engines
    the tie permutation cancels: the statistic is a pure function of
    the multiset. BOTH large terms run as decimal(38,0): Σ i·xᵢ
    (rank ~1.5e5 × cents ~5e8 crosses int64's 9.2e18 ceiling at sf1+)
    AND (n+1)·Σx (~1.1e19 at the same magnitudes) — Spark's non-ANSI
    bigint arithmetic wraps silently where DuckDB promotes to
    HUGEINT, so every multiply that can exceed int64 is widened, not
    just the flagged sum. The single closing division is the only
    float op, identical IEEE in both engines."""
    spend = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(cents("o_totalprice")).alias("x"))
    )
    d = with_global_prefix(
        spend,
        [F.col("x").asc(), F.col("o_custkey").asc()],
        "x",
        agg="sum",
        out="cum",
        rank_out="rk",
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum("x").cast("double") / 100.0).alias("total_spend"),
        F.round(
            (
                2
                * F.sum(
                    F.col("rk").cast("decimal(38,0)") * F.col("x")
                )
                - (F.count(F.lit(1)) + 1)
                * F.sum("x").cast("decimal(38,0)")
            ).cast("double")
            / (F.count(F.lit(1)).cast("double") * F.sum("x")),
            6,
        ).alias("gini"),
    )


@register(
    "q_event_transitions",
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
c AS (
  SELECT prev_type, event_type AS next_type,
         COUNT(*) AS n_transitions
  FROM s WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, n_transitions,
       round(CAST(n_transitions AS DOUBLE)
             / SUM(n_transitions) OVER (PARTITION BY prev_type), 6) AS p
FROM c
""",
    tags=("mining", "sequence", "window"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every (prev_type → next_type) adjacent pair, the
    transition count and row-normalized probability. The sequence-
    mining primitive behind next-action prediction and journey-flow
    (Sankey) dashboards.

    One user-partitioned lag window (parallel across users — the
    partition key IS the sequence key, so this scales with user count),
    then a groupBy onto the k×k type matrix, which is tiny: the
    normalizing window runs on ≤ |types|² rows. Probability is one
    double division of identical longs → IEEE-identical cross-engine;
    round(,6) is belt-and-braces. Ordering ties break by event_id."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .select("prev_type", F.col("event_type").alias("next_type"))
    )
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wt = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wt),
            6,
        ).alias("p"),
    )


@register(
    "q_event_cohort_ltv",
    oracle="""
WITH ev AS (
  SELECT user_id, event_type,
         CAST(date_trunc('month', ts) AS DATE) AS mo,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
),
firsts AS (
  SELECT user_id, MIN(mo) AS cohort_mo FROM ev GROUP BY user_id
)
SELECT f.cohort_mo,
       CAST(datediff('month', f.cohort_mo, e.mo) AS INTEGER) AS month_offset,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_buyers,
       CAST(SUM(e.c) AS DOUBLE) / 100.0 AS revenue
FROM ev e JOIN firsts f ON f.user_id = e.user_id
WHERE e.event_type = 'purchase'
GROUP BY f.cohort_mo, month_offset
""",
    tags=("mining", "analytics", "cohort"),
)
def q_event_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix — the revenue companion to
    q_event_retention's activity triangle: cohort = calendar month of
    each user's FIRST event (any type), and for each months-since
    offset, the purchasing-user count and purchase revenue. Reading a
    row left-to-right is the cohort's cumulative LTV curve.

    Both heavy stages key on user_id (first-touch aggregate, then the
    fact join back), so they share one hash partitioning; the final
    rollup shuffles only the tiny (cohort × offset) triangle. Month
    offsets are exact integer calendar arithmetic on month-truncated
    dates; revenue sums in cents."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.date_trunc("month", F.col("ts")).cast("date").alias("mo"),
        cents("value").alias("c"),
    )
    firsts = ev.groupBy("user_id").agg(F.min("mo").alias("cohort_mo"))
    j = ev.filter(F.col("event_type") == "purchase").join(firsts, "user_id")
    return (
        j.select(
            "user_id",
            "cohort_mo",
            F.months_between(F.col("mo"), F.col("cohort_mo"))
            .cast("int")
            .alias("month_offset"),
            "c",
        )
        .groupBy("cohort_mo", "month_offset")
        .agg(
            F.countDistinct("user_id").alias("n_buyers"),
            (F.sum("c").cast("double") / 100.0).alias("revenue"),
        )
    )


@register(
    "q_skyline",
    oracle="""
WITH p AS (
  SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
         p_size
  FROM part
)
SELECT a.p_partkey,
       CAST(a.price_c AS DOUBLE) / 100.0 AS p_retailprice,
       a.p_size
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.price_c <= a.price_c AND b.p_size <= a.p_size
    AND (b.price_c < a.price_c OR b.p_size < a.p_size)
)
""",
    tags=("mining", "skyline", "prefix-scan"),
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of parts under minimize-price,
    minimize-size: a part survives iff no other part is ≤ on both
    dimensions and < on at least one. The multi-objective "best
    tradeoff" operator behind product search and query optimization.

    The naive formulation is an O(n²) dominance anti-join — the oracle
    does exactly that, and it is the scale trap. The engine side uses
    the sort-based identity instead: group to per-price min size
    (one shuffle on a bounded price domain), take the STRICT global
    prefix minimum of size over ascending price (range-partitioned
    scan, ``with_global_prefix(inclusive=False)``), and a part is on
    the skyline iff its size equals its price-group minimum AND beats
    every strictly-cheaper price's best size. Equal (price, size)
    duplicates co-survive, matching the strict-dominance definition.
    All comparisons in integer cents — exact parity with the brute
    oracle."""
    p = load(spark, sf_dir, "part").select(
        "p_partkey", cents("p_retailprice").alias("price_c"), "p_size"
    )
    per_price = p.groupBy("price_c").agg(F.min("p_size").alias("min_s"))
    d = with_global_prefix(
        per_price,
        [F.col("price_c").asc()],
        "min_s",
        agg="min",
        inclusive=False,
        out="pm_strict",
    )
    return (
        p.join(d, "price_c")
        .filter(
            (F.col("p_size") == F.col("min_s"))
            & (
                F.col("pm_strict").isNull()
                | (F.col("pm_strict") > F.col("p_size"))
            )
        )
        .select(
            "p_partkey",
            (F.col("price_c").cast("double") / 100.0).alias("p_retailprice"),
            "p_size",
        )
    )


@register(
    "q_ts_interpolate",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST((SUM(CAST(round(value * 100) AS BIGINT)) * 1000)
              // COUNT(*) AS BIGINT) AS v
  FROM events GROUP BY event_type, h
),
span AS (
  SELECT event_type, min(h) AS h0, max(h) AS h1
  FROM hourly GROUP BY event_type
),
grid AS (
  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM span
),
j AS (
  SELECT g.event_type, g.h,
         CAST(epoch(g.h) AS BIGINT) AS t, hourly.v
  FROM grid g LEFT JOIN hourly USING (event_type, h)
),
ctx AS (
  SELECT event_type, h, t, v,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
         first_value(v IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY h
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY h
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
  FROM j
)
SELECT event_type, h AS hour,
       CAST(CASE WHEN v IS NOT NULL THEN v
            WHEN pv IS NOT NULL AND nv IS NOT NULL
              THEN (pv * (nt - t) + nv * (t - pt)) // (nt - pt)
            ELSE coalesce(pv, nv) END AS BIGINT) AS value_mc,
       CASE WHEN v IS NOT NULL THEN 'obs'
            WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
            ELSE 'edge' END AS src
FROM ctx
""",
    tags=("mining", "timeseries", "window"),
)
def q_ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of gaps in an hourly series — the numeric
    upgrade of q_ts_gap_fill's last-observation carry-forward: per
    event_type, densify the hour grid and fill each missing hour with
    the time-weighted average of its nearest observed neighbours
    (edges carry the single available neighbour). src labels each row
    obs / interp / edge.

    Exactness: hourly means are integer milli-cents via integer
    division, and the interpolation uses the cross-multiplied form
    (pv·(nt−t) + nv·(t−pt)) div (nt−pt) — all-long arithmetic, no
    float drift. Spark's `div` and DuckDB's `//` BOTH truncate toward
    zero (probed: −7//2 = −3 in DuckDB), so the division parity is
    unconditional — it does not depend on the corpus keeping `value`
    non-negative across regenerations.

    Scale: windows partition by the series key; real telemetry has
    millions of series so the neighbour-scan parallelizes naturally
    (per-series hours are bounded by the time span, not data volume).
    The grid explode is `sequence()` on the per-series [min,max] span
    — rows generated at the executors, never the driver."""
    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
        )
        .agg(
            F.expr(
                "(sum(cast(round(value * 100) as bigint)) * 1000)"
                " div count(*)"
            ).alias("v")
        )
    )
    span = hourly.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = span.select(
        "event_type",
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("h"),
    )
    j = grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        F.unix_timestamp("h").alias("t"),
        "v",
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    t_obs = F.when(F.col("v").isNotNull(), F.col("t"))
    ctx = j.select(
        "event_type",
        "h",
        "t",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(t_obs, ignorenulls=True).over(wp).alias("pt"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(t_obs, ignorenulls=True).over(wn).alias("nt"),
    )
    both = F.col("pv").isNotNull() & F.col("nv").isNotNull()
    interp = F.expr("(pv * (nt - t) + nv * (t - pt)) div (nt - pt)")
    return ctx.select(
        "event_type",
        F.col("h").alias("hour"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(both, interp)
        .otherwise(F.coalesce("pv", "nv"))
        .alias("value_mc"),
        F.when(F.col("v").isNotNull(), "obs")
        .when(both, "interp")
        .otherwise("edge")
        .alias("src"),
    )


@register(
    "q_agg_corr",
    oracle="""
WITH b AS (
  SELECT CAST(round(l_quantity) AS BIGINT) AS x,
         CAST(round(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM b
)
SELECT n AS n_rows,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS corr_qty_price,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
       round((CAST(sy AS DOUBLE)
              - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS intercept
FROM m
""",
    tags=("mining", "aggregate", "statistics"),
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + OLS fit (slope, intercept) of extended
    price on quantity — computed from INTEGER MOMENTS, not
    ``F.corr``: the five sums (Σx, Σy, Σx², Σy², Σxy) accumulate as
    longs (exact, associative, lossless map-side combine — the same
    argument as cents money sums), and the closing formula is a fixed
    double expression over those identical integers, so both engines
    produce the bit-same IEEE result where a float-accumulating
    ``corr()`` drifts with partition order. Quantity and price are
    whole-unit quantized (round to unit) to keep Σy² in long range;
    the quantization is applied identically in both engines, so
    parity is exact by construction.

    Scale: one map-side-combining aggregate over the fact table, no
    shuffle beyond the 1-row partial merge — the cheapest possible
    shape. At 10¹² rows Σy² would move to decimal(38,0); same plan."""
    li = load(spark, sf_dir, "lineitem").select(
        F.round("l_quantity").cast("long").alias("x"),
        F.round("l_extendedprice").cast("long").alias("y"),
    )
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_n / var_x
    return m.select(
        F.col("n").alias("n_rows"),
        F.round(cov_n / (F.sqrt(var_x) * F.sqrt(var_y)), 6).alias(
            "corr_qty_price"
        ),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


@register(
    "q_ts_rollup_multires",
    oracle="""
SELECT CASE WHEN h IS NOT NULL THEN 'hour'
            WHEN d IS NOT NULL THEN 'day'
            WHEN m IS NOT NULL THEN 'month'
            ELSE 'total' END AS level,
       m AS month_start, d AS day_start, h AS hour_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_value
FROM (
  SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS m,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
         CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
         value
  FROM events
)
GROUP BY ROLLUP (m, d, h)
""",
    tags=("mining", "timeseries", "rollup"),
)
def q_ts_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution time rollup — the hypertable "continuous
    aggregate" ladder: hour, day, month, and grand-total event counts
    and value sums from ONE scan via ``rollup`` over the truncation
    hierarchy (hour ⊂ day ⊂ month makes the lattice a clean chain, so
    every coarser row is the exact partial-merge of its finer rows).
    The level label decodes which truncations are populated.

    This differs from q_agg_rollup (categorical dims) in what makes it
    scale: Spark expands rollup grouping sets BEFORE the exchange, and
    partial aggregation compresses each level to its bucket count
    map-side, so the shuffle carries ~(hours+days+months) rows per
    task, not 4× the fact table. Money in cents; bucket timestamps are
    exact truncations."""
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("month", F.col("ts")).alias("m"),
        F.date_trunc("day", F.col("ts")).alias("d"),
        F.date_trunc("hour", F.col("ts")).alias("h"),
        cents("value").alias("c"),
    )
    return (
        ev.rollup("m", "d", "h")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("c").cast("double") / 100.0).alias("total_value"),
        )
        .select(
            F.when(F.col("h").isNotNull(), "hour")
            .when(F.col("d").isNotNull(), "day")
            .when(F.col("m").isNotNull(), "month")
            .otherwise("total")
            .alias("level"),
            F.col("m").alias("month_start"),
            F.col("d").alias("day_start"),
            F.col("h").alias("hour_start"),
            "n_events",
            "total_value",
        )
    )


@register(
    "q_profile_entropy",
    oracle="""
WITH c AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt
  FROM customer GROUP BY c_nationkey, c_mktsegment
),
n AS (
  SELECT c_nationkey, SUM(cnt) AS tot, COUNT(*) AS n_segments
  FROM c GROUP BY c_nationkey
)
SELECT c.c_nationkey,
       CAST(MAX(n.tot) AS BIGINT) AS n_customers,
       CAST(MAX(n.n_segments) AS BIGINT) AS n_segments,
       round(SUM(-(CAST(c.cnt AS DOUBLE) / n.tot)
                 * log2(CAST(c.cnt AS DOUBLE) / n.tot)), 6) AS entropy_bits
FROM c JOIN n USING (c_nationkey)
GROUP BY c.c_nationkey
""",
    tags=("mining", "profile", "statistics"),
)
def q_profile_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the market-segment distribution within each
    nation — the information-theoretic column profile (0 bits = one
    segment dominates totally, log₂k = uniform over k segments) that
    drives skew detection, join-key diagnostics, and feature-selection
    heuristics.

    Two cheap aggregations on the same grouping prefix (the (nation,
    segment) count reuses its shuffle for the per-nation totals via
    partial re-aggregation), then a per-group sum of −p·log₂p over at
    most |segments| terms. The probabilities are divisions of exact
    integers and the term count per group is the segment cardinality
    (a schema constant), so the float sum has O(k) terms regardless of
    data volume; round(,6) absorbs the ≤ 1-ulp association difference
    between engines."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n = c.groupBy("c_nationkey").agg(
        F.sum("cnt").alias("tot"), F.count(F.lit(1)).alias("n_segments")
    )
    p = F.col("cnt").cast("double") / F.col("tot")
    return (
        c.join(n, "c_nationkey")
        .groupBy("c_nationkey")
        .agg(
            F.max("tot").alias("n_customers"),
            F.max("n_segments").alias("n_segments"),
            F.round(F.sum(-p * F.log2(p)), 6).alias("entropy_bits"),
        )
    )


@register(
    "q_ts_anomaly",
    oracle="""
WITH hourly AS (
  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
win AS (
  SELECT event_type, h, cnt,
         CAST(COUNT(*) OVER w AS BIGINT) AS n_win,
         CAST(coalesce(SUM(cnt) OVER w, 0) AS BIGINT) AS sum_win,
         CAST(coalesce(SUM(cnt * cnt) OVER w, 0) AS BIGINT) AS sumsq_win
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, h AS hour_start, cnt, n_win, sum_win, sumsq_win,
       (n_win >= 12
        AND CAST(n_win * cnt - sum_win AS HUGEINT)
            * CAST(n_win * cnt - sum_win AS HUGEINT) * (n_win - 1)
            > 9 * n_win
              * (CAST(n_win AS HUGEINT) * sumsq_win
                 - CAST(sum_win AS HUGEINT) * sum_win))
         AS is_anomaly
FROM win
""",
    tags=("mining", "timeseries", "anomaly", "window"),
)
def q_ts_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection over hourly event-rate series —
    the standard telemetry alert: flag an hour whose event count
    deviates > 3σ from the trailing 24 observed hours' mean (needing
    ≥ 12 trailing hours so cold starts don't alert).

    Cross-engine determinism is the design point: the z-test fires on
    FLOATS in every textbook spelling, and windowed stddev is exactly
    where engines disagree (DuckDB's segment-tree window aggregation
    associates float sums differently from Spark's streaming frame
    fold). So the test is algebraically cleared of division and
    square root: with n = trailing count, S = Σcnt, Q = Σcnt², flag
        (n·x − S)² · (n−1)  >  9 · n · (n·Q − S²)
    — identical to (x−μ)²>9σ² but pure integer, so the boolean (and
    every output column) is engine-exact with no rounding escape
    hatch. The comparison's products cross int64 near ~6·10⁶
    events/hour, where Spark's non-ANSI longs would wrap silently and
    DuckDB would error — so the comparison runs wide on BOTH sides
    (decimal(38,0) / HUGEINT). The binding limit is now the BIGINT
    sumsq accumulation feeding it (Σcnt², wraps near ~6·10⁸
    events/hour per type — far beyond any real per-type rate); past
    that, the audit columns themselves migrate to decimal(38,0), the
    q_agg_corr pattern (the driver canonicalizer hashes BIGINT
    columns, so the wide type is a deployment choice, not a default).

    Scale: one groupBy onto the (type, hour) bucket grid — partial
    aggregation compresses map-side, the shuffle carries bucket counts
    not events — then a window PARTITIONED by event_type over ~10³
    rows per type-year. The frame is ROWS (observed hours), so gaps
    don't stretch memory; at 100 TB the bucket grid is still tiny."""
    hourly = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-24, -1)
    )
    n = F.count(F.lit(1)).over(w)
    s = F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("long")
    q = F.coalesce(F.sum(F.col("cnt") * F.col("cnt")).over(w), F.lit(0)).cast(
        "long"
    )
    d = hourly.select(
        "event_type",
        F.col("h").alias("hour_start"),
        "cnt",
        n.cast("long").alias("n_win"),
        s.alias("sum_win"),
        q.alias("sumsq_win"),
    )
    dec = "decimal(38,0)"
    dev = (F.col("n_win") * F.col("cnt") - F.col("sum_win")).cast(dec)
    var_n = F.col("n_win").cast(dec) * F.col("sumsq_win") - F.col(
        "sum_win"
    ).cast(dec) * F.col("sum_win")
    return d.withColumn(
        "is_anomaly",
        (F.col("n_win") >= 12)
        & (dev * dev * (F.col("n_win") - 1) > 9 * F.col("n_win") * var_n),
    )


def make_lttb_kernel():
    """Factory for the per-series LTTB pick walk (grouped-pandas kernel
    of q_ts_downsample_lttb; the hypothesis property test exercises
    the SAME shipped kernel against an independent reference).

    A factory, deliberately: the returned closure has a non-importable
    qualname, so cloudpickle serializes it BY VALUE to the python
    workers. A module-level function is pickled by reference and
    requires ``import micmac_li3ds_spark`` to succeed on the worker —
    which fails whenever the driver process added the repo to sys.path
    at runtime (importlib by path, the driver contract) without the
    repo on the workers' PYTHONPATH. Every pandas-UDF callable in this
    package is a closure for the same reason; the kernel also
    references no module globals."""

    def lttb_kernel(pdf):
        import pandas as pd

        pdf = pdf.sort_values("t").reset_index(drop=True)
        n = len(pdf)
        out = {"event_type": [], "pick_k": [], "t": [], "v": []}
        if n < 40:
            return pd.DataFrame(out)
        et = pdf["event_type"].iloc[0]
        ts = [int(x) for x in pdf["t"]]
        vs = [int(x) for x in pdf["v"]]
        n_int = n - 2
        # interior rank buckets 1..18 (same integer split as the oracle)
        buckets: dict[int, list[int]] = {}
        for idx0 in range(n_int):
            b = (idx0 * 18) // n_int + 1
            buckets.setdefault(b, []).append(idx0 + 1)  # point index
        at, av = ts[0], vs[0]
        out["event_type"].append(et)
        out["pick_k"].append(0)
        out["t"].append(at)
        out["v"].append(av)
        for j in range(1, 19):
            if j < 18:
                nxt = buckets[j + 1]
                cn = len(nxt)
                sx = sum(ts[i] for i in nxt)
                sy = sum(vs[i] for i in nxt)
            else:
                cn, sx, sy = 1, ts[n - 1], vs[n - 1]
            best = None
            for i in buckets[j]:
                a2 = abs(
                    (at * cn - sx) * (vs[i] - av)
                    - (at - ts[i]) * (sy - av * cn)
                )
                cand = (-a2, ts[i], i)
                if best is None or cand < best:
                    best = cand
            i = best[2]
            at, av = ts[i], vs[i]
            out["event_type"].append(et)
            out["pick_k"].append(j)
            out["t"].append(at)
            out["v"].append(av)
        out["event_type"].append(et)
        out["pick_k"].append(19)
        out["t"].append(ts[n - 1])
        out["v"].append(vs[n - 1])
        return pd.DataFrame(out)

    return lttb_kernel


@register(
    "q_ts_downsample_lttb",
    oracle="""
WITH RECURSIVE hourly AS (
  SELECT event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
pts AS (
  SELECT event_type, t, v,
         row_number() OVER (PARTITION BY event_type ORDER BY t) AS r,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM hourly
),
okpts AS (SELECT * FROM pts WHERE n >= 40),
interior AS (
  SELECT event_type, t, v,
         ((r - 2) * 18) // (n - 2) + 1 AS b
  FROM okpts WHERE r BETWEEN 2 AND n - 1
),
lastpt AS (SELECT event_type, t, v FROM okpts WHERE r = n),
bsum AS (
  SELECT event_type, b, COUNT(*) AS cn, SUM(t) AS sx, SUM(v) AS sy
  FROM interior GROUP BY event_type, b
),
nxtc AS (
  SELECT event_type, b - 1 AS j, cn, sx, sy FROM bsum WHERE b >= 2
  UNION ALL
  SELECT event_type, 18 AS j, 1 AS cn, t AS sx, v AS sy FROM lastpt
),
walk AS (
  SELECT event_type, 0 AS k, t AS at, v AS av FROM okpts WHERE r = 1
  UNION
  SELECT w.event_type, w.k + 1 AS k, s.t AS at, s.v AS av
  FROM walk w
  JOIN nxtc x ON x.event_type = w.event_type AND x.j = w.k + 1,
  LATERAL (
    SELECT p.t, p.v
    FROM interior p
    WHERE p.event_type = w.event_type AND p.b = w.k + 1
    ORDER BY abs((w.at * x.cn - x.sx) * (p.v - w.av)
                 - (w.at - p.t) * (x.sy - w.av * x.cn)) DESC, p.t
    LIMIT 1
  ) s
  WHERE w.k < 18
)
SELECT event_type, CAST(k AS INTEGER) AS pick_k, at AS t, av AS v FROM walk
UNION ALL
SELECT event_type, 19 AS pick_k, t, v FROM lastpt
""",
    tags=("mining", "timeseries", "downsample", "applyinpandas"),
)
def q_ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013 —
    the standard dashboard decimation: keep the 20 points per series
    that best preserve visual shape). First/last points always kept;
    interior points split into 18 equal-count rank buckets; walking
    left→right, each bucket contributes the point forming the largest
    triangle with the PREVIOUSLY SELECTED point and the NEXT bucket's
    centroid — an inherently sequential per-series recurrence, which
    makes this the registered showcase for the grouped-pandas pattern:
    ``applyInPandas`` per series key runs the O(n) loop vectorized-ish
    in Python while Spark parallelizes ACROSS series (millions of
    series at 100 TB; the per-series loop is the part that cannot be
    a join, and series fit executors by construction after the tiny
    hourly pre-aggregation).

    Cross-engine exactness: triangle areas compare as the integer
    |cross product| scaled by the next-bucket count (centroids never
    materialize as floats — A' = |(aₜ·cₙ−Σx)(pᵥ−aᵥ) − (aₜ−pₜ)(Σy−aᵥ·cₙ)|),
    ties break toward the earlier timestamp, so the pick sequence is
    a pure integer function of the series in both engines. The oracle
    runs the SAME walk as a recursive CTE with a LATERAL argmax per
    step. Series shorter than 40 points are passed over (downsampling
    to 20 would distort, and empty rank buckets would stall the
    walk); the corpus series are ~700 points."""
    hourly = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
        )
        .agg(F.count(F.lit(1)).alias("v"))
        .select(
            "event_type",
            F.unix_timestamp("h").alias("t"),
            F.col("v").cast("long"),
        )
    )
    return hourly.groupBy("event_type").applyInPandas(
        make_lttb_kernel(), "event_type string, pick_k int, t long, v long"
    )


@register(
    "q_ts_seasonal_profile",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
hod AS (
  SELECT event_type, CAST(EXTRACT(hour FROM h) AS INTEGER) AS hour_of_day,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(cnt) AS BIGINT) AS n_events
  FROM hourly GROUP BY event_type, EXTRACT(hour FROM h)
),
tot AS (
  SELECT event_type,
         CAST(SUM(n_hours) AS BIGINT) AS t_hours,
         CAST(SUM(n_events) AS BIGINT) AS t_events
  FROM hod GROUP BY event_type
)
SELECT h.event_type, h.hour_of_day, h.n_hours, h.n_events,
       round(CAST(h.n_events AS DOUBLE) / h.n_hours, 6) AS mean_per_hour,
       round((CAST(h.n_events AS DOUBLE) * t.t_hours)
             / (CAST(h.n_hours AS DOUBLE) * t.t_events), 6)
         AS seasonal_factor
FROM hod h JOIN tot t ON h.event_type = t.event_type
""",
    tags=("mining", "timeseries", "seasonal"),
)
def q_ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile per event type — the decomposition
    step under load forecasting and the denominator q_ts_anomaly would
    use to alert on SEASONALLY-ADJUSTED deviations (a 9am spike is
    news at 3am): for each (type, hour-of-day), observed hours, total
    events, mean events/hour, and the seasonal factor = hod mean ÷
    the type's overall hourly mean (>1 = peak hour, <1 = trough).

    Exactness: the factor is a ratio of two integer ratios, computed
    as ONE double expression over four exact BIGINTs
    ((n_events·t_hours)/(n_hours·t_events)) — products stay < 2⁶³ at
    any realistic rate and avoid the engine-divergent
    double÷double-of-divisions spelling; round(,6) belts. Scale: the
    bucket-grid aggregation compresses map-side; everything after the
    first groupBy runs on ≤ |types|·24 rows."""
    hourly = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hod = hourly.groupBy(
        "event_type", F.hour("h").cast("int").alias("hour_of_day")
    ).agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("cnt").alias("n_events"),
    )
    tot = hod.groupBy("event_type").agg(
        F.sum("n_hours").alias("t_hours"),
        F.sum("n_events").alias("t_events"),
    )
    return hod.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "hour_of_day",
        "n_hours",
        "n_events",
        F.round(
            F.col("n_events").cast("double") / F.col("n_hours"), 6
        ).alias("mean_per_hour"),
        F.round(
            (F.col("n_events").cast("double") * F.col("t_hours"))
            / (F.col("n_hours").cast("double") * F.col("t_events")),
            6,
        ).alias("seasonal_factor"),
    )
