"""Typed access to the driver corpus (TESTDATA.md / FIXTURES.md §1).

One parquet file per table. Schemas are carried by parquet; we still
declare expected column sets so a drifted corpus fails fast rather than
mid-query. Scans go through ``spark.read.parquet`` → DataSource V2, which
gives us predicate pushdown + column pruning for free (SURVEY.md §4).

100 TB note: at scale these would be partitioned tables (events by date,
lineitem by shipdate month) registered in a metastore; the loaders keep
that behind one function so call sites don't change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions we always broadcast in joins.
BROADCAST_TABLES = {"region", "nation"}

EXPECTED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
    "orders": {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    },
    "lineitem": {
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table; fail fast on schema drift.

    ``events.ts`` has shipped in two physical encodings across corpus
    generations: parquet timestamp[ns] (which Spark 4 refuses to read as a
    timestamp — PARQUET_TYPE_ILLEGAL — so we read nanos as long via the
    legacy conf and floor-convert, the same truncation direction DuckDB's
    ns→µs cast uses) and parquet timestamp[us] (read natively as
    TIMESTAMP_NTZ). Either way we normalize to session-tz TimestampType
    (session tz is pinned UTC, session.py:35) so every downstream operator
    and oracle sees one ts type regardless of corpus vintage (SURVEY.md
    §5.3).
    """
    if name not in EXPECTED_COLUMNS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(EXPECTED_COLUMNS)}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # integer `div`, NOT `/`: float division of an epoch-ns long
            # loses low bits (|ns| > 2^53) and rounds some microseconds up
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            # timestamp[us] → TIMESTAMP_NTZ; reinterpret the wall-clock in
            # the UTC session tz (no-op if already TimestampType)
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        df = spark.read.parquet(table_path(sf_dir, name))
    missing = EXPECTED_COLUMNS[name] - set(df.columns)
    if missing:
        raise ValueError(f"table {name} missing expected columns: {sorted(missing)}")
    return df
