"""§2.1 scans / sources / sinks.

Every reader declares an explicit schema (inference is a dev-only
convenience — at 100 TB schema inference is a full extra pass). The
parquet scan demonstrates pushdown+pruning; the partitioned sink writes
and re-reads, proving round-trip.

JDBC source/sink: `micmac_li3ds_spark.sources` (jdbc.py read surface,
sinks.py write/upsert) — exercised for REAL against embedded Derby
(jars ship inside Spark): `q_jdbc_roundtrip` below pushes customer
through the JDBC sink and partitioned JDBC source and is value-checked
against the DuckDB oracle; tests/test_jdbc.py covers pushdown,
partitioned reads, and exactly-once MERGE upserts.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from micmac_li3ds_spark.registry import register
from micmac_li3ds_spark.sources.sinks import write_partitioned_parquet
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
-- valid channel: DuckDB's typed read with ignore_errors drops exactly
-- the rows Spark's PERMISSIVE mode flags corrupt (the fixture's
-- corruption modes are controlled: always 4 fields, untypeable
-- acct_id/balance/opened); corrupt channel: raw all-VARCHAR row count
-- minus the typed row count
-- MATERIALIZED is load-bearing: with an inline CTE, DuckDB's
-- projection pushdown prunes unread columns out of the scan, and
-- ignore_errors only drops a row when a SCANNED column fails its cast
-- — COUNT(*) would then count every structurally-valid row (casting
-- nothing), and the per-segment channel would keep rows whose only
-- corruption is in a pruned column. Materializing casts all four
-- declared columns, which is exactly Spark's PERMISSIVE row rule.
WITH v AS MATERIALIZED (
  SELECT * FROM read_csv('{TEXT_DIR}/accounts_dirty.csv',
              columns = {{'acct_id': 'BIGINT', 'segment': 'VARCHAR',
                          'balance': 'DOUBLE', 'opened': 'DATE'}},
              header = true, ignore_errors = true)
)
SELECT segment,
       COUNT(*) AS n_accts,
       SUM(CAST(round(balance * 100, 0) AS BIGINT)) / 100.0 AS total_balance,
       MIN(opened) AS first_opened,
       MAX(acct_id) AS last_acct
FROM v
WHERE balance > 0.0
GROUP BY segment
UNION ALL
SELECT '__corrupt__' AS segment,
       (SELECT COUNT(*)
        FROM read_csv('{TEXT_DIR}/accounts_dirty.csv',
                      columns = {{'a': 'VARCHAR', 'b': 'VARCHAR',
                                  'c': 'VARCHAR', 'd': 'VARCHAR'}},
                      header = true))
       - (SELECT COUNT(*) FROM v) AS n_accts,
       0.0 AS total_balance,
       CAST(NULL AS DATE) AS first_opened,
       CAST(NULL AS BIGINT) AS last_acct
""",
    tags=("scan", "csv"),
)
def q_scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan with declared schema + header over a DIRTY input, in
    PERMISSIVE mode with the corrupt-record channel (round 14, r13
    verdict item 8): real ingest at 100 TB never gets clean files, and
    FAILFAST turns one bad row in a billion into a dead job. Malformed
    rows surface as a counted '__corrupt__' channel row (count only —
    partially-parsed fields of a corrupt row never leak into the
    totals) instead of being silently dropped (DROPMALFORMED) or
    killing the load. Valid rows filter and aggregate exactly as
    before — downstream, since CSV gets no pushdown: the reason the
    engine's interchange format is parquet and CSV is ingest-only.

    PRUNING TRAP, deliberately closed on both engines: Spark's CSV
    parser only parses the columns the plan requires, and the corrupt
    flag fires only for failures in PARSED columns — a parse-audit
    query that reads (segment, balance) would silently accept a row
    whose only corruption is a bad date. So the audit references every
    declared column in its output (first_opened / last_acct per
    segment). DuckDB has the mirror-image behavior (ignore_errors only
    drops rows whose SCANNED columns fail), closed in the oracle with
    a MATERIALIZED CTE. A parse audit must touch every column it
    claims to audit."""
    df = (
        # a FRESH StructType per call: StructType.add mutates the
        # receiver, so reusing the module-level schema would append a
        # second _corrupt_record on the next invocation
        spark.read.schema(
            T.StructType(
                ACCOUNTS_SCHEMA.fields
                + [T.StructField("_corrupt_record", T.StringType())]
            )
        )
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(os.path.join(TEXT_DIR, "accounts_dirty.csv"))
    )
    corrupt = F.col("_corrupt_record").isNotNull()
    cents = F.round(F.col("balance") * 100).cast("long")
    return (
        # corrupt rows are kept regardless of their (partially parsed)
        # balance; valid rows keep the balance > 0 business filter
        df.filter(corrupt | (F.col("balance") > 0.0))
        .groupBy(
            F.when(corrupt, F.lit("__corrupt__"))
            .otherwise(F.col("segment"))
            .alias("segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_accts"),
            (
                F.coalesce(
                    F.sum(F.when(~corrupt, cents)), F.lit(0)
                )
                / 100.0
            ).alias("total_balance"),
            F.min(F.when(~corrupt, F.col("opened"))).alias("first_opened"),
            F.max(F.when(~corrupt, F.col("acct_id"))).alias("last_acct"),
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
-- DuckDB's read_json(ignore_errors) NULLs failing fields instead of
-- skipping rows, so it cannot mirror Spark's row-level corrupt
-- classification; the oracle re-derives it from raw lines instead:
-- a line is corrupt iff it is not valid JSON, or a declared-BIGINT
-- key holds a non-numeric JSON type, or the BOOLEAN key holds a
-- non-boolean — exactly Spark's PERMISSIVE rule over the fixture's
-- controlled corruption modes (no numeric strings, which the two
-- engines coerce differently)
WITH lines AS (
  SELECT line FROM (
    SELECT unnest(string_split(content, chr(10))) AS line
    FROM read_text('{TEXT_DIR}/clicks_dirty.jsonl')
  ) WHERE line <> ''
),
cls AS (
  -- CASE, not OR: json_extract THROWS on invalid JSON and vectorized
  -- OR does not short-circuit, so the validity test must gate the
  -- extraction structurally
  SELECT line,
         CASE WHEN NOT json_valid(line) THEN TRUE
              ELSE (json_extract(line, '$.click_id') IS NOT NULL AND
                    json_type(json_extract(line, '$.click_id'))
                      NOT IN ('BIGINT', 'UBIGINT', 'NULL'))
                OR (json_extract(line, '$.ms') IS NOT NULL AND
                    json_type(json_extract(line, '$.ms'))
                      NOT IN ('BIGINT', 'UBIGINT', 'NULL'))
                OR (json_extract(line, '$.ok') IS NOT NULL AND
                    json_type(json_extract(line, '$.ok'))
                      NOT IN ('BOOLEAN', 'NULL'))
         END AS corrupt
  FROM lines
)
SELECT line ->> '$.page' AS page,
       COUNT(*) AS n_clicks,
       COUNT(*) FILTER (WHERE CAST(line ->> '$.ok' AS BOOLEAN)) AS n_ok,
       CAST(SUM(CAST(line ->> '$.ms' AS BIGINT)) AS BIGINT) AS total_ms,
       MAX(CAST(line ->> '$.click_id' AS BIGINT)) AS last_click
FROM cls WHERE NOT corrupt
GROUP BY page
UNION ALL
SELECT '__corrupt__' AS page,
       COUNT(*) AS n_clicks,
       0 AS n_ok,
       0 AS total_ms,
       CAST(NULL AS BIGINT) AS last_click
FROM cls WHERE corrupt
""",
    tags=("scan", "json"),
)
def q_scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines scan with declared schema (no inference pass) over a
    DIRTY input, PERMISSIVE mode + corrupt-record channel (round 14,
    same rationale as q_scan_csv): syntactically broken lines and
    type-mismatched fields become a counted '__corrupt__' channel row
    — count only, since Spark still parses the GOOD fields of a
    type-mismatched row and those partial values must not leak into
    per-page totals. Valid rows aggregate exactly as before, plus a
    last_click channel so every declared column is referenced: like
    the CSV parser (see q_scan_csv), Spark's JSON parser only
    type-checks the fields the plan requires — an audit that ignored
    click_id would silently accept a row whose only corruption is
    there (pinned by a fixture line)."""
    df = spark.read.schema(
        T.StructType(
            CLICKS_SCHEMA.fields
            + [T.StructField("_corrupt_record", T.StringType())]
        )
    ).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    ).json(os.path.join(TEXT_DIR, "clicks_dirty.jsonl"))
    corrupt = F.col("_corrupt_record").isNotNull()
    return (
        df.groupBy(
            F.when(corrupt, F.lit("__corrupt__"))
            .otherwise(F.col("page"))
            .alias("page")
        ).agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.count(F.when(~corrupt & F.col("ok"), 1)).alias("n_ok"),
            F.coalesce(
                F.sum(F.when(~corrupt, F.col("ms"))), F.lit(0)
            ).alias("total_ms"),
            F.max(F.when(~corrupt, F.col("click_id"))).alias("last_click"),
        )
    )


@register(
    "q_scan_xml",
    oracle=f"""
SELECT sensor_name, frame, calib_name,
       center[1] AS cx, center[2] AS cy, center[3] AS cz,
       'eConvApero_DistM2C' AS conv
FROM read_parquet('{os.path.join(_REPO, "fixtures", "parquet", "orientation.parquet")}')
""",
    tags=("scan", "xml"),
)
def q_scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML scan — the reference's core input format (MicMac orientation
    files): nested document → typed rows via the native XML source.
    DuckDB has no XML reader, so the oracle reads the generator's
    parquet TWIN of the same fixtures (fixtures/parquet/orientation
    .parquet): the XML parse + space-separated-vector split must
    round-trip the generator's doubles bitwise to pass. The center
    vector is unpacked to scalar columns (the driver canonicalizer
    cannot hash list cells); ``conv`` is a fixture-wide constant the
    twin doesn't carry, pinned literally."""
    raw = (
        spark.read.format("xml")
        .option("rowTag", "OrientationConique")
        # pathGlobFilter instead of a glob in the path: a glob path makes
        # the reader's streaming-sink metadata probe log a noisy (benign)
        # FileNotFoundException stack on every run
        .option("pathGlobFilter", "ori_*.xml")
        .load(os.path.join(_REPO, "fixtures", "xml"))
    )
    center = F.transform(
        F.split(F.trim(F.col("Externe.Centre")), " +"), lambda x: x.cast("double")
    )
    return raw.select(
        F.col("NameSensor").alias("sensor_name"),
        F.col("NameFrame").alias("frame"),
        F.col("FileInterne").alias("calib_name"),
        F.element_at(center, 1).alias("cx"),
        F.element_at(center, 2).alias("cy"),
        F.element_at(center, 3).alias("cz"),
        F.col("ConvOri.KnownConv").alias("conv"),
    )


@register(
    "q_jdbc_roundtrip",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n_custs,
       SUM(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS total_bal
FROM customer
GROUP BY c_mktsegment
""",
    tags=("scan", "jdbc", "sink"),
)
def q_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's database path, end-to-end and for real: write
    customer through the executor-parallel JDBC sink into embedded
    Derby, read it back through the range-partitioned JDBC source
    (8 splits on c_custkey — one connection per split), aggregate.
    Value-parity against the oracle proves the sink+source round-trip
    is lossless (DOUBLE is IEEE-exact through Derby; strings forced to
    VARCHAR via createTableColumnTypes so they stay comparable).
    Approximate split bounds are safe: rows outside land in the edge
    partitions, nothing is filtered."""
    from micmac_li3ds_spark.sources import derby_config, read_table, write_jdbc

    db = os.path.join(
        SCRATCH, f"derby_{os.path.basename(os.path.normpath(sf_dir))}"
    )
    cfg = derby_config(db)
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    write_jdbc(
        c,
        cfg,
        "customer_rt",
        mode="overwrite",
        create_table_column_types="c_mktsegment VARCHAR(16)",
    )
    back = read_table(
        spark,
        cfg,
        "customer_rt",
        partition_column="c_custkey",
        lower_bound=1,
        upper_bound=200_000,
        num_partitions=8,
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_custs"),
        (F.sum(cents) / 100.0).alias("total_bal"),
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
    makes downstream queries prunable. Since round 14 the write goes
    through write_partitioned_parquet (sources/sinks.py) with its
    production knobs live: zstd compression (codec + knob effect pinned
    by tests/test_round14_ops.py against the parquet footers) and a
    records-per-file cap so one skewed partition directory cannot
    become one giant straggler file."""
    out = os.path.join(SCRATCH, "orders_partitioned")
    shutil.rmtree(out, ignore_errors=True)
    o = load(spark, sf_dir, "orders").withColumn(
        "yr", F.year("o_orderdate")
    )
    write_partitioned_parquet(
        o, out, ["o_orderstatus", "yr"], max_records_per_file=500_000
    )
    back = spark.read.parquet(out)
    return back.groupBy("o_orderstatus", "yr").agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "q_sink_orc_roundtrip",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_lines,
       SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS total_price
FROM lineitem
WHERE l_quantity >= 25.0
GROUP BY l_returnflag, l_linestatus
""",
    tags=("sink", "orc"),
)
def q_sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second columnar interchange format (SURVEY.md §2.1): write
    lineitem to ORC, read it back with a pushed predicate, aggregate in
    exact cents. ORC gives the same row-group min/max skipping as
    parquet (the filter lands in the ORC scan as a search argument), so
    the round-trip proves both lossless type mapping (timestamps stay
    µs) and that downstream queries on the ORC copy still prune. Avro
    is NOT registered: its Spark connector module is absent from this
    environment (only the core avro jars ship), and a source that can't
    execute here would be untestable surface."""
    out = os.path.join(SCRATCH, "lineitem_orc")
    shutil.rmtree(out, ignore_errors=True)
    li = load(spark, sf_dir, "lineitem")
    # zstd for ORC too (round 14, mirroring write_partitioned_parquet's
    # default): same storage/scan-bandwidth trade, verified against the
    # ORC footer in tests/test_round14_ops.py
    li.write.mode("overwrite").option("compression", "zstd").orc(out)
    back = spark.read.orc(out).filter(F.col("l_quantity") >= 25.0)
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        (F.sum(cents) / 100.0).alias("total_price"),
    )


@register(
    "q_scan_binaryfile",
    oracle=f"""
SELECT parse_filename(filename) AS file_name,
       CAST(size AS BIGINT) AS n_bytes,
       sha256(hex(content)) AS content_sha
FROM read_blob('{os.path.join(_REPO, "fixtures", "xml")}/*.xml')
""",
    tags=("scan", "binary"),
)
def q_scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-file binary ingestion (``format("binaryFile")``) — how raw
    media/model artifacts enter the lake before any parser exists for
    them: one row per file with path, length, and payload. Emits
    basename + size + payload sha-256 (DuckDB's read_blob is the
    oracle twin). At 100 TB this is the bridge format: land bytes
    first, parse later — the 4 MB-default ``maxPartitionBytes`` has no
    effect here since a file is never split; parallelism = file count."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.xml")
        .load(os.path.join(_REPO, "fixtures", "xml"))
    )
    return raw.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").alias("n_bytes"),
        F.sha2(F.hex(F.col("content")), 256).alias("content_sha"),
    )


_TS_US_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


@register(
    "q_sink_csv_roundtrip",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price,
       CAST(min(epoch(date_trunc('second', o_orderdate))) AS BIGINT) AS min_ts_s,
       CAST(max(epoch(date_trunc('second', o_orderdate))) AS BIGINT) AS max_ts_s
FROM orders
GROUP BY o_orderstatus
""",
    tags=("sink", "csv"),
)
def q_sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text interchange sink #1: write orders to headered CSV (explicit
    µs timestamp format), read it back with the DECLARED schema (no
    inference pass — an extra full scan at 100 TB), aggregate. The
    oracle reads the ORIGINAL parquet, so value parity proves the
    text round-trip is lossless for longs, strings, doubles (Spark
    emits shortest-round-trip decimal reprs) and timestamps at µs.
    CSV remains the interchange of last resort at scale — row-wise, no
    pushdown, no stats — which is exactly why the round-trip contract
    deserves a pinned check."""
    out = os.path.join(SCRATCH, "orders_csv")
    shutil.rmtree(out, ignore_errors=True)
    o = load(spark, sf_dir, "orders")
    (
        o.write.mode("overwrite")
        .option("header", True)
        .option("timestampFormat", _TS_US_FMT)
        .csv(out)
    )
    back = (
        spark.read.schema(o.schema)
        .option("header", True)
        .option("timestampFormat", _TS_US_FMT)
        .csv(out)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    ts_s = F.unix_timestamp(F.date_trunc("second", F.col("o_orderdate")))
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum(cents) / 100.0).alias("total_price"),
        F.min(ts_s).alias("min_ts_s"),
        F.max(ts_s).alias("max_ts_s"),
    )


@register(
    "q_sink_json_roundtrip",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(min(epoch_ns(ts) // 1000) AS BIGINT) AS min_ts_us,
       CAST(max(epoch_ns(ts) // 1000) AS BIGINT) AS max_ts_us
FROM events
GROUP BY event_type
""",
    tags=("sink", "json"),
)
def q_sink_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text interchange sink #2: events → JSON lines → re-read with the
    declared schema → aggregate, checked against the ORIGINAL parquet.
    min/max ride MICROSECOND epochs on purpose: the default JSON
    timestamp format truncates to milliseconds, so the round-trip is
    only lossless with an explicit 6-digit fraction format on both
    write and read — the exact bug class (silent sub-second loss) that
    cost round 4 seven red rows when the corpus switched timestamp
    encodings. JSON-lines shares CSV's scale caveats (row-wise, no
    pushdown) but is schema-self-describing and splittable, the usual
    landing format before columnar compaction."""
    out = os.path.join(SCRATCH, "events_json")
    shutil.rmtree(out, ignore_errors=True)
    ev = load(spark, sf_dir, "events")
    (
        ev.write.mode("overwrite")
        .option("timestampFormat", _TS_US_FMT)
        .json(out)
    )
    back = (
        spark.read.schema(ev.schema)
        .option("timestampFormat", _TS_US_FMT)
        .json(out)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_cents"),
        F.min(F.unix_micros("ts")).alias("min_ts_us"),
        F.max(F.unix_micros("ts")).alias("max_ts_us"),
    )


@register(
    "q_audit_small_files",
    oracle=f"""
WITH per_file AS (
  SELECT o_orderstatus, filename, COUNT(*) AS rows_in_file
  FROM read_parquet('{os.path.join(SCRATCH, "orders_compaction")}/*/*.parquet',
                    filename = true, hive_partitioning = true)
  GROUP BY o_orderstatus, filename
)
SELECT o_orderstatus,
       COUNT(*) AS n_files,
       CAST(SUM(rows_in_file) AS BIGINT) AS n_rows,
       CAST(min(rows_in_file) AS BIGINT) AS min_file_rows,
       CAST(max(rows_in_file) AS BIGINT) AS max_file_rows,
       COUNT(*) FILTER (WHERE rows_in_file < 1000) AS n_small_files
FROM per_file
GROUP BY o_orderstatus
""",
    tags=("sink", "maintenance"),
)
def q_audit_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file audit — the table-maintenance report that decides
    when a partitioned dataset needs compaction (small files are the
    classic silent killer of 100 TB scan throughput: per-file open
    cost, starved row groups, metadata bloat). Writes orders
    partitioned by status with a FIXED 4-way repartition on the
    partition key (deterministic file layout regardless of session
    parallelism — the unpinned default would make file counts vary
    with spark.sql.shuffle.partitions), then audits the layout it
    wrote via input_file_name(): files, rows, per-file row spread, and
    the under-threshold count that triggers compaction. The oracle
    reads the same files with DuckDB's filename=true, so file-level
    parity proves both engines see the identical physical layout. At
    scale this query IS the compaction planner's input; the fix it
    feeds is a repartition-and-rewrite of exactly the flagged
    partitions."""
    out = os.path.join(SCRATCH, "orders_compaction")
    shutil.rmtree(out, ignore_errors=True)
    o = load(spark, sf_dir, "orders")
    (
        o.repartition(4, "o_orderstatus")
        .write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .parquet(out)
    )
    back = spark.read.parquet(out).withColumn("fname", F.input_file_name())
    per_file = back.groupBy("o_orderstatus", "fname").agg(
        F.count(F.lit(1)).alias("rows_in_file")
    )
    return per_file.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("rows_in_file").alias("n_rows"),
        F.min("rows_in_file").alias("min_file_rows"),
        F.max("rows_in_file").alias("max_file_rows"),
        F.count(F.when(F.col("rows_in_file") < 1000, 1)).alias(
            "n_small_files"
        ),
    )


def _zorder_spark_expr(xcol: str, ycol: str, bits: int = 16) -> str:
    """Spark SQL expression interleaving the low ``bits`` bits of two
    non-negative ints into a Z-value (x even positions, y odd)."""
    terms = []
    for i in range(bits):
        terms.append(f"shiftleft(shiftright({xcol}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({ycol}, {i}) & 1, {2 * i + 1})")
    return " + ".join(terms)


def _zorder_duck_expr(xcol: str, ycol: str, bits: int = 16) -> str:
    """DuckDB spelling of the same interleave (operators, not fns)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "q_layout_zorder",
    oracle=f"""
WITH d AS (
  SELECT o_custkey AS ck,
         CAST(datediff('day', DATE '1992-01-01',
                       CAST(o_orderdate AS DATE)) AS BIGINT) AS dd
  FROM orders
),
mm AS (
  SELECT MIN(ck) AS ck0, MAX(ck) AS ck1, MIN(dd) AS dd0, MAX(dd) AS dd1
  FROM d
),
nrm AS (
  SELECT ck, dd,
         ((ck - ck0) * 1024) // (ck1 - ck0 + 1) AS cn,
         ((dd - dd0) * 1024) // (dd1 - dd0 + 1) AS dn
  FROM d, mm
),
z AS (
  SELECT ck, dd, {_zorder_duck_expr('cn', 'dn', 10)} AS zval FROM nrm
),
b AS (SELECT ck, dd, zval >> 14 AS zbucket FROM z)
SELECT CAST(zbucket AS BIGINT) AS zbucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(ck) AS min_custkey, MAX(ck) AS max_custkey,
       MIN(dd) AS min_day, MAX(dd) AS max_day
FROM b GROUP BY zbucket
""",
    tags=("layout", "zorder", "data-skipping"),
)
def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering audit — the multi-dimensional
    data-skipping layout behind Delta/Iceberg OPTIMIZE ZORDER: single-
    column sort bounds min/max skipping to ONE dimension, while
    interleaving bits of (custkey, order-day) into a Z-value and
    range-bucketing on it keeps EVERY interleaved dimension's min/max
    tight per bucket. Each dimension is first NORMALIZED to a common
    10-bit rank scale from its broadcast min/max (the step naive
    Z-ordering botches: interleaving dims of unequal bit width puts
    only the wide dim in the high bits and degenerates to a
    single-key sort — observed and fixed here, then pinned by the
    both-dims-bounded test), then the Z-value is pure integer bit
    algebra and the top 6 bits split the curve into 64 buckets (the
    file-boundary stand-in). Output is per-bucket row counts and
    per-dimension min/max envelopes — exactly the parquet footer
    stats a scan planner prunes against; both envelopes are narrow
    simultaneously, which no single-key sort achieves.

    Scale: the Z-value is a map-side expression; clustering a real
    table is `repartitionByRange(zval) + sortWithinPartitions(zval)`
    on write (same machinery as the partitioned sinks here), after
    which min/max pruning works on BOTH join/filter dims. One
    aggregation on the bucket id; exact integer output, exact oracle."""
    o = load(spark, sf_dir, "orders")
    d = o.select(
        F.col("o_custkey").alias("ck"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("long")
        .alias("dd"),
    )
    mm = d.agg(
        F.min("ck").alias("ck0"), F.max("ck").alias("ck1"),
        F.min("dd").alias("dd0"), F.max("dd").alias("dd1"),
    )
    nrm = d.crossJoin(F.broadcast(mm)).select(
        "ck", "dd",
        F.expr("((ck - ck0) * 1024) div (ck1 - ck0 + 1)").alias("cn"),
        F.expr("((dd - dd0) * 1024) div (dd1 - dd0 + 1)").alias("dn"),
    )
    z = nrm.withColumn("zval", F.expr(_zorder_spark_expr("cn", "dn", 10)))
    b = z.withColumn("zbucket", F.expr("zval >> 14"))
    return b.groupBy(F.col("zbucket").cast("long").alias("zbucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("ck").alias("min_custkey"),
        F.max("ck").alias("max_custkey"),
        F.min("dd").alias("min_day"),
        F.max("dd").alias("max_day"),
    )


@register(
    "q_layout_bucketed_join",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
""",
    tags=("layout", "bucketing", "join"),
)
def q_layout_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located fact⋈fact join — THE layout that deletes the
    dominant shuffle at 100 TB: both fact tables are written
    ``bucketBy(N, join_key)`` + ``sortBy`` as catalog tables, after
    which the orders⋈lineitem sort-merge join reads bucket i against
    bucket i directly — NO exchange on either side, no sort, at any
    scale, for every future join on that key. This operator runs the
    WHOLE story end-to-end in one plan: write both bucketed tables,
    join the bucketed scans, aggregate — and the shuffle-freeness is
    pinned by tests/test_plans.py::test_bucketed_join_has_no_join_
    exchange (the join's only exchange budget is the final tiny
    groupBy on priority).

    This is the materialized sibling of the advisory bucketing notes
    SCALE.md carries for every fact⋈fact query: q_join_sort_merge et
    al. say "bucket-able at deploy time"; this one actually deploys
    it. Bucket count is the scale knob (here 8; production picks
    cluster-core multiples); both sides MUST agree on count or Spark
    re-shuffles the smaller side. The aggregate output is checked
    against the raw (unbucketed) tables in DuckDB — bucketing must be
    a pure layout change with zero effect on results, exact to the
    cent."""
    # a PREVIOUS session's managed-table dirs survive in the warehouse
    # while this session's catalog has never heard of the tables —
    # saveAsTable would then fail LOCATION_ALREADY_EXISTS; drop both
    # ways (catalog + location) before writing
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("bj_orders", "bj_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    (
        o.write.mode("overwrite")
        .format("parquet")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("bj_orders")
    )
    (
        li.write.mode("overwrite")
        .format("parquet")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("bj_lineitem")
    )
    bo = spark.table("bj_orders")
    bl = spark.table("bj_lineitem")
    return (
        bo.join(bl, bo["o_orderkey"] == bl["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("cents").alias("total_cents"),
        )
    )


@register(
    "q_layout_partition_pruning",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE year(o_orderdate) = 1995
GROUP BY o_orderstatus
""",
    tags=("layout", "partitioning", "pruning"),
)
def q_layout_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition PRUNING audit — the selective-read half of the
    partitioned-layout story (q_sink_parquet_partitioned proves the
    write+full-read round trip; this proves the LAYOUT PAYS): write
    orders hive-partitioned by year, then answer a one-year question
    against the partitioned copy. The year predicate must resolve at
    PLANNING time against directory names — PartitionFilters in the
    scan node, zero data files opened outside yr=1995 — which is the
    difference between reading 1/7th and 7/7ths of a 100-TB table.
    tests/test_plans.py::test_partition_pruning_reaches_scan pins the
    plan shape (the filter appears under PartitionFilters, NOT as a
    post-scan Filter over all partitions).

    The oracle answers the same question from the RAW unpartitioned
    table — layout must not change answers, exact to the cent. Pair
    with q_audit_small_files (file sizing within partitions) and
    q_layout_zorder (multi-dim skipping WITHIN a partition) for the
    full layout toolkit."""
    out = os.path.join(SCRATCH, "orders_by_year")
    shutil.rmtree(out, ignore_errors=True)
    o = load(spark, sf_dir, "orders").withColumn("yr", F.year("o_orderdate"))
    o.write.mode("overwrite").partitionBy("yr").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.filter(F.col("yr") == 1995)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "total_cents"
            ),
        )
    )
