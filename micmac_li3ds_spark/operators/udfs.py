"""§2.10 UDF / UDAF / UDTF surface.

Policy (SURVEY.md §7.0): UDFs are the slow path. Each operator here
exists to prove the full Python-extension surface works — but each
docstring states the built-in replacement, and none of these shapes is
used by any other operator in the engine. Everything Python crosses via
Arrow batches (pandas UDFs / applyInPandas / mapInPandas); the
row-at-a-time q_udf_python is Arrow-optimized (useArrow=True).

The one legitimate 100 TB role for these: logic that genuinely cannot
be expressed as column algebra (external model scoring, bespoke
per-group algorithms) — then batch size and schema stability are the
levers, and these operators are the templates.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from micmac_li3ds_spark.registry import register
from micmac_li3ds_spark.tables import load


@register(
    "q_udf_python",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'expedite'
            WHEN o_orderpriority = '3-MEDIUM' THEN 'standard'
            ELSE 'relaxed' END AS sla_class
FROM orders
""",
    tags=("udf",),
)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Python UDF (Arrow-optimized) — the direct analogue of the
    reference's row-at-a-time Python. Built-in replacement: the CASE
    expression in the oracle; a UDF like this costs ~10-100× more than
    the CASE at scale."""

    @F.udf(returnType=T.StringType(), useArrow=True)
    def sla_class(priority: str) -> str:
        if priority in ("1-URGENT", "2-HIGH"):
            return "expedite"
        if priority == "3-MEDIUM":
            return "standard"
        return "relaxed"

    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", sla_class("o_orderpriority").alias("sla_class"))


@register(
    "q_udf_pandas",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1.0 - l_discount), 2) AS net_price
FROM lineitem
""",
    tags=("udf", "pandas"),
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Arrow batch in, numpy math, Arrow
    batch out). Deterministic elementwise arithmetic → exact parity."""

    @F.pandas_udf(T.DoubleType())
    def net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        import numpy as np

        # half-up (SQL) rounding — pandas .round() is half-even and
        # disagrees with both engines on exact .xx5 halves
        return np.floor(price * (1.0 - discount) * 100 + 0.5) / 100


    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_price("l_extendedprice", "l_discount").alias("net_price"),
    )


@register(
    "q_udaf_pandas",
    oracle="""
SELECT l_returnflag,
       round(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * CAST(l_quantity AS BIGINT))
             / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / 100.0, 6)
         AS wavg_price
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("udf", "udaf"),
)
def q_udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF: quantity-weighted mean price. The
    UDF accumulates in integer cents so the result is order-independent
    and hash-matches the oracle (the general lesson for custom
    aggregates: make the accumulator exact, not float)."""

    @F.pandas_udf(T.DoubleType())
    def wavg_price(price: pd.Series, qty: pd.Series) -> float:
        cents = (price * 100).round().astype("int64")
        q = qty.astype("int64")
        return round(int((cents * q).sum()) / int(q.sum()) / 100.0, 6)

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        wavg_price("l_extendedprice", "l_quantity").alias("wavg_price")
    )


@register(
    "q_udtf_applyinpandas",
    oracle="""
SELECT l_returnflag, l_orderkey, l_linenumber,
       round(l_extendedprice
             - SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                 OVER (PARTITION BY l_returnflag) / 100.0
               / COUNT(*) OVER (PARTITION BY l_returnflag), 6) AS demeaned_price
FROM lineitem
""",
    tags=("udf", "udtf"),
)
def q_udtf_applyinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map (applyInPandas): per-group demeaning, whole group as
    one pandas DataFrame. The group mean is computed from exact integer
    cents (numpy float sums would drift from the oracle). Built-in
    replacement: the window expression in the oracle. Skew warning: one
    group = one pandas frame in one task's memory — never key this on a
    heavy-hitter column at scale."""

    schema = T.StructType(
        [
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("demeaned_price", T.DoubleType()),
        ]
    )

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = (pdf["l_extendedprice"] * 100).round().astype("int64")
        mean = int(cents.sum()) / len(cents) / 100.0
        return pd.DataFrame(
            {
                "l_returnflag": pdf["l_returnflag"],
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "demeaned_price": (pdf["l_extendedprice"] - mean).round(6),
            }
        )

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return li.groupBy("l_returnflag").applyInPandas(demean, schema)


@register(
    "q_udf_mapinpandas",
    oracle="""
SELECT event_id, user_id, round(value * 0.9, 2) AS value_eur
FROM events
WHERE value > 100.0
""",
    tags=("udf", "mapinpandas"),
)
def q_udf_mapinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-partition iterator transform (mapInPandas): filter+project
    in pandas, streaming over Arrow batches — constant memory per task
    regardless of partition size (the iterator is the point; a collect-
    the-partition UDF would OOM at scale)."""

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value_eur", T.DoubleType()),
        ]
    )

    def convert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hit = pdf[pdf["value"] > 100.0]
            import numpy as np

            yield pd.DataFrame(
                {
                    "event_id": hit["event_id"],
                    "user_id": hit["user_id"],
                    # half-up rounding (see q_udf_pandas)
                    "value_eur": np.floor(hit["value"] * 0.9 * 100 + 0.5) / 100,
                }
            )

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return ev.mapInPandas(convert, schema)


@register(
    "q_udtf_python",
    oracle="""
SELECT o_orderkey, 'rank' AS part_kind, string_split(o_orderpriority, '-')[1] AS part_value
FROM orders
UNION ALL
SELECT o_orderkey, 'label' AS part_kind, string_split(o_orderpriority, '-')[2] AS part_value
FROM orders
""",
    tags=("udf", "udtf"),
)
def q_udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): explode each order's priority code
    into (kind, value) rows — 1 input row → 2 output rows via a lateral
    join. Built-in replacement: posexplode(split(...))."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="part_kind: string, part_value: string")
    class PrioritySplit:
        def eval(self, priority: str):
            rank, label = priority.split("-", 1)
            yield "rank", rank
            yield "label", label

    spark.udtf.register("priority_split", PrioritySplit)
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_udtf_orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, p.part_kind, p.part_value
        FROM _udtf_orders o,
             LATERAL priority_split(o.o_orderpriority) p
        """
    )


@register(
    "q_udf_cogrouped",
    oracle="""
SELECT c.c_custkey,
       COUNT(o.o_orderkey) AS n_orders,
       COALESCE(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0) / 100.0
         AS total_spent
FROM customer c LEFT JOIN orders o ON o_custkey = c_custkey
GROUP BY c.c_custkey
""",
    tags=("udf", "cogroup"),
)
def q_udf_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cogroup(...).applyInPandas``: both tables hash-partition on the
    key and each key's two pandas frames arrive in ONE python call —
    the escape hatch for bespoke per-key merge logic (as-of matching,
    custom reconciliation) that a join can't express. Built-in
    replacement for THIS payload: the left-join aggregate in the oracle
    — which is also the 100 TB answer whenever the logic is expressible;
    cogroup costs two shuffles plus Arrow transfer of both sides.
    Exact integer cents inside pandas keep parity bit-stable."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", (F.col("c_custkey") % 100).alias("bkt")
    )
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        (F.col("o_custkey") % 100).alias("bkt"),
    )

    # Cogroup on a BUCKET of keys, not the raw key: applyInPandas pays a
    # Python call + two Arrow transfers PER GROUP, so per-customer groups
    # (15k calls at sf0.1, ~2 ms each) spent ~34 s in pure invocation
    # overhead (round-7 timing audit). Bucketing to ~100 groups amortizes
    # that to ~100 calls with substantial frames, and the per-key logic
    # becomes a vectorized pandas groupby INSIDE the bucket — the
    # standard production shape for cogrouped python logic. Same output,
    # same oracle; measured ~6× faster.
    def merge(key, cust: pd.DataFrame, orders: pd.DataFrame) -> pd.DataFrame:
        if cust.empty:  # orders-only bucket: outside the oracle's LEFT join
            return pd.DataFrame(
                {"c_custkey": [], "n_orders": [], "total_spent": []}
            )
        cents = orders.assign(
            c=orders["o_totalprice"].mul(100).round().astype("int64")
        )
        per_key = cents.groupby("o_custkey").agg(
            n_orders=("o_orderkey", "size"), tot=("c", "sum")
        )
        out = cust.merge(
            per_key, left_on="c_custkey", right_index=True, how="left"
        )
        return pd.DataFrame(
            {
                "c_custkey": out["c_custkey"],
                "n_orders": out["n_orders"].fillna(0).astype("int64"),
                "total_spent": out["tot"].fillna(0).astype("int64") / 100.0,
            }
        )

    return (
        c.groupBy("bkt")
        .cogroup(o.groupBy("bkt"))
        .applyInPandas(
            merge, "c_custkey long, n_orders long, total_spent double"
        )
    )


@register(
    "q_scan_python_datasource",
    oracle="""
SELECT 'seq' AS src, i, i * i + i % 7 AS v FROM range(0, 100) t(i)
UNION ALL
SELECT 'seq_part' AS src, i, i * i + i % 7 AS v FROM range(0, 100) t(i)
""",
    tags=("scan", "datasource"),
)
def q_scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom source via the Spark 4 Python Data Source API — the
    extension point for readers Spark lacks natively (bespoke formats,
    internal services). The demo source generates a deterministic
    integer sequence across 4 partitions, so the DuckDB oracle can
    recompute it exactly; what's under test is the full API surface:
    registration, schema declaration, partition planning (4 splits →
    4 parallel tasks), and per-partition iteration. At scale a real
    implementation controls parallelism exactly like this —
    ``partitions()`` returns one split per shard/file/offset-range.
    Since round 14 the source family also exposes a STREAMING side —
    the Simple (driver-side) reader on seq_demo, and since round 15
    the partitioned executor-side DataSourceStreamReader on
    seq_demo_part (see SeqPartSource; both harness-tested in
    tests/test_streaming.py) — so one registration serves both
    spark.read and spark.readStream, the way production custom
    sources ship. The query reads BOTH registered formats
    source-tagged, so the driver value hash covers the partitioned
    source's (inherited) batch path at birth."""
    spark.dataSource.register(SeqSource)
    spark.dataSource.register(SeqPartSource)
    return (
        spark.read.format("seq_demo")
        .load()
        .select(F.lit("seq").alias("src"), "i", "v")
        .unionByName(
            spark.read.format("seq_demo_part")
            .load()
            .select(F.lit("seq_part").alias("src"), "i", "v")
        )
    )


def _seq_rows(lo: int, hi: int):
    return iter([(i, i * i + i % 7) for i in range(lo, hi)])


class _SeqReader(DataSourceReader):
    def __init__(self, n_parts: int = 4, per_part: int = 25):
        self.n_parts = n_parts
        self.per_part = per_part

    def partitions(self):
        return [InputPartition(k) for k in range(self.n_parts)]

    def read(self, partition):
        lo = partition.value * self.per_part
        return _seq_rows(lo, lo + self.per_part)


class _SeqStreamReader(SimpleDataSourceStreamReader):
    """Streaming side of the demo source (round 14): the Spark 4
    ``SimpleDataSourceStreamReader`` contract — driver-side reads with
    engine-managed offsets. ``read(start)`` returns (rows, nextOffset)
    and advances ``per_batch`` rows per micro-batch until ``max_rows``;
    ``readBetweenOffsets(start, end)`` is the REPLAY path the engine
    calls when recovering a batch after a crash — it must reproduce
    exactly the rows the original read returned, which a deterministic
    generator does by construction and the harness test pins. At scale
    this simple (non-partitioned) form suits low-volume control feeds;
    high-volume sources implement DataSourceStreamReader with
    per-partition splits instead — same offset algebra, executor-side
    reads — which _SeqPartStreamReader below does for the same
    generator (round 15)."""

    def __init__(self, per_batch: int = 20, max_rows: int = 100):
        self.per_batch = per_batch
        self.max_rows = max_rows

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = start["pos"]
        if pos >= self.max_rows:
            return iter([]), start
        end = min(pos + self.per_batch, self.max_rows)
        return _seq_rows(pos, end), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return _seq_rows(start["pos"], end["pos"])


class _SeqPartStreamReader(DataSourceStreamReader):
    """Partitioned streaming side (round 15) — the full Spark 4
    ``DataSourceStreamReader`` contract the r14 docstring below calls
    the high-volume shape. Unlike the Simple form (driver-side reads,
    engine-prefetched), here the DRIVER only does offset algebra —
    ``latestOffset`` advances an availability watermark, ``partitions
    (start, end)`` splits the micro-batch's offset range into
    ``n_parts`` contiguous sub-ranges — and the actual ``read`` of each
    split runs ON EXECUTORS, one task per split, exactly how a Kafka/
    Kinesis-class source scales reads across a 1000-executor cluster.

    Replay exactness is structural, not stateful: ``partitions`` is a
    pure function of (start, end) and ``read`` a pure function of its
    split, so when the engine recovers a write-ahead-logged batch after
    a crash it replans the SAME splits and re-reads the SAME rows — no
    readBetweenOffsets analogue is needed in this contract. The
    harness pins both properties (tests/test_streaming.py): engine-run
    stream ≡ batch-reader rows, and per-offset-pair replan/re-read
    determinism across every committed offset pair.

    ``commit(end)`` is where a real source releases upstream resources
    (acknowledge a queue, advance a retention cursor); the generator
    has none, so it inherits the no-op default."""

    def __init__(
        self, n_parts: int = 4, per_batch: int = 20, max_rows: int = 100
    ):
        self.n_parts = n_parts
        self.per_batch = per_batch
        self.max_rows = max_rows
        self._available = 0  # driver-side availability watermark

    def initialOffset(self):
        return {"pos": 0}

    def latestOffset(self):
        # one per_batch tranche becomes available per trigger until
        # the generator is exhausted — a real source would ask the
        # external system instead of a counter
        self._available = min(
            self._available + self.per_batch, self.max_rows
        )
        return {"pos": self._available}

    def partitions(self, start, end):
        lo, hi = start["pos"], end["pos"]
        if lo >= hi:  # start == end: the engine plans an empty batch
            return []
        step = -(-(hi - lo) // self.n_parts)  # ceil → n_parts splits
        return [
            InputPartition((s, min(s + step, hi)))
            for s in range(lo, hi, step)
        ]

    def read(self, partition):
        lo, hi = partition.value
        return _seq_rows(lo, hi)


class SeqSource(DataSource):
    @classmethod
    def name(cls):
        return "seq_demo"

    def schema(self):
        return "i bigint, v bigint"

    def reader(self, schema):
        return _SeqReader()

    def simpleStreamReader(self, schema):
        return _SeqStreamReader()


class SeqPartSource(SeqSource):
    """The same generator under the PARTITIONED streaming contract —
    batch reader and schema are inherited (one source family, two
    streaming shapes, the way a production custom source graduates
    from the Simple driver-side form to executor-side splits without
    touching its batch path). ``streamReader`` takes precedence over
    the inherited ``simpleStreamReader`` (pyspark's
    datasource_internal._streamReader falls back to the Simple form
    only when streamReader raises NOT_IMPLEMENTED)."""

    @classmethod
    def name(cls):
        return "seq_demo_part"

    def streamReader(self, schema):
        return _SeqPartStreamReader()


@register(
    "q_udf_sql",
    oracle="""
SELECT l_returnflag,
       SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
         AS net_revenue
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("udf", "sql"),
)
def q_udf_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar function (CREATE TEMPORARY FUNCTION ... RETURN
    expr) — the zero-cost UDF: Catalyst inlines the body at analysis
    time, so unlike every Python UDF in this module it keeps whole-stage
    codegen, pushdown, and map-side aggregation fully intact. This is
    the FIRST tool to reach for shared business logic (here: exact
    net-revenue cents); the oracle simply inlines the same body, which
    is also precisely what the Spark plan does."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION net_cents2(p DOUBLE, d DOUBLE)
        RETURNS BIGINT
        RETURN CAST(round(p * 100) AS BIGINT)
               * (100 - CAST(round(d * 100) AS BIGINT))
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(SUM(net_cents2(l_extendedprice, l_discount)) / 10000.0
                    AS DOUBLE) AS net_revenue
        FROM lineitem
        GROUP BY l_returnflag
        """
    )
