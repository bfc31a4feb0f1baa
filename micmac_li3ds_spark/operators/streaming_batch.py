"""§2.9 streaming operators — batch-checkable halves.

Spark's windowing API is identical in batch and streaming
(`F.window` / `F.session_window` work on a static DataFrame exactly as
on readStream), so each operator here is hash-checked against the
DuckDB oracle in batch mode, and `micmac_li3ds_spark.streaming.jobs`
runs the SAME expressions through a real readStream → memory-sink
harness; tests/test_streaming.py asserts batch ≡ stream.

Scale notes: windowed aggs shuffle on (window, key) — bounded state as
long as the watermark advances; the session window is the stateful one
(gap merging) and its state is bounded by active sessions per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from micmac_li3ds_spark.functions.exact import cents
from micmac_li3ds_spark.registry import register
from micmac_li3ds_spark.tables import load

# DuckDB: ts is TIMESTAMP_NS on disk; CAST to TIMESTAMP *rounds*, while
# Spark's loader *floors* — so bucket on integer floor-division of
# epoch_ns instead (exactly Spark's truncation semantics).
_DUCK_EPOCH = "(epoch_ns(ts) // 1000000000)"
_DUCK_EPOCH_US = "(epoch_ns(ts) // 1000)"


def events_with_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events")


@register(
    "q_stream_tumbling",
    oracle=f"""
SELECT make_timestamp(({_DUCK_EPOCH} // 600) * 600 * 1000000) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       SUM(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS total_value
FROM events
GROUP BY window_start, event_type
""",
    tags=("streaming", "window"),
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute windows per event type. Same expression runs
    under readStream with a watermark (streaming/jobs.py)."""
    ev = events_with_epoch(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents("value")) / 100.0).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "q_stream_sliding",
    oracle=f"""
WITH slid AS (
  SELECT (({_DUCK_EPOCH} // 300) * 300 - off.o) AS win_start_sec, value
  FROM events, (SELECT unnest([0, 300]) AS o) off
  WHERE {_DUCK_EPOCH} < (({_DUCK_EPOCH} // 300) * 300 - off.o) + 600
)
SELECT make_timestamp(win_start_sec * 1000000) AS window_start,
       COUNT(*) AS n_events,
       SUM(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS total_value
FROM slid
GROUP BY window_start
""",
    tags=("streaming", "window"),
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 10-minute length, 5-minute slide — every event
    lands in exactly two windows (the oracle replicates via the
    two-offset expansion)."""
    ev = events_with_epoch(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents("value")) / 100.0).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


@register(
    "q_stream_session",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, {_DUCK_EPOCH_US} AS ep, value,
         lag({_DUCK_EPOCH_US}) OVER (PARTITION BY user_id ORDER BY {_DUCK_EPOCH_US}, event_id)
           AS prev_ep
  FROM events
),
flagged AS (
  SELECT user_id, ep, value,
         CASE WHEN prev_ep IS NULL OR ep - prev_ep > 1800000000 THEN 1 ELSE 0 END AS new_s
  FROM ordered
),
sessions AS (
  SELECT user_id, ep, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ep
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       make_timestamp(min(ep)) AS session_start,
       make_timestamp(max(ep) + 1800000000) AS session_end,
       COUNT(*) AS n_events,
       SUM(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS total_value
FROM sessions
GROUP BY user_id, sid
""",
    tags=("streaming", "session"),
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30-minute inactivity gap) per user —
    F.session_window in Spark; the oracle is the canonical
    lag-gap-flag + running-sum rewrite. Session end = last event +
    gap (Spark's [start, end) convention)."""
    ev = events_with_epoch(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents("value")) / 100.0).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def _ohlc_agg(grouped):
    """Shared OHLC aggregate expressions (batch twin ≡ streaming job):
    open/close via min_by/max_by over one BIGINT (second, event_id)
    ordering key — declarative aggregates, so they run unchanged under
    a streaming groupBy and partial-combine map-side in batch."""
    return grouped.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min_by("c", "ord").alias("open_c"),
        F.max("c").alias("high_c"),
        F.min("c").alias("low_c"),
        F.max_by("c", "ord").alias("close_c"),
        F.sum("c").alias("vol_c"),
    )


def _with_ohlc_cols(df: DataFrame) -> DataFrame:
    ts_s = F.unix_timestamp(F.date_trunc("second", F.col("ts")))
    return df.select(
        "ts",
        "event_type",
        cents("value").alias("c"),
        (ts_s * F.lit(1_000_000_000).cast("long") + F.col("event_id")).alias("ord"),
    )


@register(
    "q_stream_ohlc",
    oracle=f"""
WITH ev AS (
  SELECT event_type,
         ({_DUCK_EPOCH} // 600) * 600 AS w_start_s,
         CAST(round(value * 100) AS BIGINT) AS c,
         ({_DUCK_EPOCH}) * 1000000000 + event_id AS ord
  FROM events
)
SELECT w_start_s, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       arg_min(c, ord) AS open_c,
       MAX(c) AS high_c,
       MIN(c) AS low_c,
       arg_max(c, ord) AS close_c,
       CAST(SUM(c) AS BIGINT) AS vol_c
FROM ev
GROUP BY w_start_s, event_type
""",
    tags=("streaming", "window", "timeseries"),
)
def q_stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute OHLC bars per event type — the streaming
    market-data shape. Unlike q_ts_resample_ohlc's row_number
    formulation (sort-window, batch-only), open/close here are
    min_by/max_by over an integer (second, event_id) ordering key:
    pure declarative aggregates, so the IDENTICAL expression runs under
    readStream with a watermark (streaming/jobs.py ohlc_bars; state is
    one partially-merged bar per open window) and partial-combines
    map-side in batch — the dual-mode formulation. Exact integer math
    throughout; the ordering key is collision-free for event_id < 10⁹ (asserted in
    tests/test_round5_ops.py) and stays inside BIGINT:
    epoch-seconds (< 2³¹) × 10⁹ < 2⁶³."""
    ev = _with_ohlc_cols(events_with_epoch(spark, sf_dir))
    bars = _ohlc_agg(
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
    )
    return bars.select(
        F.unix_timestamp(F.col("w.start")).alias("w_start_s"),
        "event_type",
        "n_events",
        "open_c",
        "high_c",
        "low_c",
        "close_c",
        "vol_c",
    )
