"""§2.1 scans / sources / sinks.

Every reader declares an explicit schema (inference is a dev-only
convenience — at 100 TB schema inference is a full extra pass). The
parquet scan demonstrates pushdown+pruning; the partitioned sink writes
and re-reads, proving round-trip.

JDBC source/sink: no database exists in this environment. The engine's
JDBC surface is `micmac_li3ds_spark.sources.sinks` (interface +
foreachBatch MERGE pattern), exercised by the parquet "twin" here and
unit-tested for plan shape only.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from micmac_li3ds_spark.registry import register
from micmac_li3ds_spark.tables import load

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
TEXT_DIR = os.path.join(_REPO, "fixtures", "text")
SCRATCH = os.path.join(_REPO, ".scratch")


@register(
    "q_scan_parquet",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2001-01-01' AND l_quantity < 10.0
""",
    tags=("scan",),
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed columnar scan with both predicates pushed to the parquet
    reader (row-group min/max skipping) and a 3-column ReadSchema —
    verify via explain: PushedFilters + pruned schema."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp"))
        & (F.col("l_quantity") < 10.0)
    ).select("l_orderkey", "l_linenumber", "l_extendedprice")


ACCOUNTS_SCHEMA = T.StructType(
    [
        T.StructField("acct_id", T.LongType()),
        T.StructField("segment", T.StringType()),
        T.StructField("balance", T.DoubleType()),
        T.StructField("opened", T.DateType()),
    ]
)


@register(
    "q_scan_csv",
    oracle=f"""
SELECT segment,
       COUNT(*) AS n_accts,
       SUM(CAST(round(balance * 100, 0) AS BIGINT)) / 100.0 AS total_balance
FROM read_csv('{TEXT_DIR}/accounts.csv',
              columns = {{'acct_id': 'BIGINT', 'segment': 'VARCHAR',
                          'balance': 'DOUBLE', 'opened': 'DATE'}})
WHERE balance > 0.0
GROUP BY segment
""",
    tags=("scan", "csv"),
)
def q_scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan with declared schema + header; filter and aggregate
    downstream (CSV gets no pushdown — the reason the engine's interchange
    format is parquet and CSV is ingest-only)."""
    df = (
        spark.read.schema(ACCOUNTS_SCHEMA)
        .option("header", "true")
        .csv(os.path.join(TEXT_DIR, "accounts.csv"))
    )
    cents = F.round(F.col("balance") * 100).cast("long")
    return (
        df.filter(F.col("balance") > 0.0)
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_accts"),
            (F.sum(cents) / 100.0).alias("total_balance"),
        )
    )


CLICKS_SCHEMA = T.StructType(
    [
        T.StructField("click_id", T.LongType()),
        T.StructField("page", T.StringType()),
        T.StructField("ms", T.LongType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


@register(
    "q_scan_json",
    oracle=f"""
SELECT page,
       COUNT(*) AS n_clicks,
       COUNT(*) FILTER (WHERE ok) AS n_ok,
       CAST(SUM(ms) AS BIGINT) AS total_ms
FROM read_json('{TEXT_DIR}/clicks.jsonl',
               columns = {{'click_id': 'BIGINT', 'page': 'VARCHAR',
                           'ms': 'BIGINT', 'ok': 'BOOLEAN'}})
GROUP BY page
""",
    tags=("scan", "json"),
)
def q_scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines scan with declared schema (no inference pass)."""
    df = spark.read.schema(CLICKS_SCHEMA).json(os.path.join(TEXT_DIR, "clicks.jsonl"))
    return df.groupBy("page").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.count(F.when(F.col("ok"), 1)).alias("n_ok"),
        F.sum("ms").alias("total_ms"),
    )


@register("q_scan_xml", tags=("scan", "xml"))
def q_scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML scan — the reference's core input format (MicMac orientation
    files): nested document → typed rows via the native XML source.
    Rows-only (DuckDB has no XML reader); the calibration variant is
    twin-checked in tests."""
    raw = (
        spark.read.format("xml")
        .option("rowTag", "OrientationConique")
        .load(os.path.join(_REPO, "fixtures", "xml", "ori_*.xml"))
    )
    center = F.transform(
        F.split(F.trim(F.col("Externe.Centre")), " +"), lambda x: x.cast("double")
    )
    return raw.select(
        F.col("NameSensor").alias("sensor_name"),
        F.col("NameFrame").alias("frame"),
        F.col("FileInterne").alias("calib_name"),
        center.alias("center"),
        F.col("ConvOri.KnownConv").alias("conv"),
    )


@register(
    "q_sink_parquet_partitioned",
    oracle="""
SELECT o_orderstatus, CAST(year(o_orderdate) AS INTEGER) AS yr,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus, yr
""",
    tags=("sink", "parquet"),
)
def q_sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink + re-read: write orders partitioned by
    (status, year), read the partitioned layout back, aggregate per
    partition. Proves round-trip AND that the re-read scan can
    partition-prune (the count groups are exactly the directory keys).
    At 100 TB this layout (low-cardinality dirs, sized files) is what
    makes downstream queries prunable."""
    out = os.path.join(SCRATCH, "orders_partitioned")
    shutil.rmtree(out, ignore_errors=True)
    o = load(spark, sf_dir, "orders").withColumn(
        "yr", F.year("o_orderdate")
    )
    o.write.mode("overwrite").partitionBy("o_orderstatus", "yr").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("o_orderstatus", "yr").agg(F.count(F.lit(1)).alias("n_orders"))
