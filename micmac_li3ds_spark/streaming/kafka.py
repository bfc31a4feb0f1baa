"""Kafka source/sink interface (SURVEY.md §2.1; scale design SCALE.md §1).

The Kafka connector jar (``spark-sql-kafka-0-10``) is not shipped in
this environment, so ``.load()`` / ``.start()`` cannot run here — the
builders below stop one call short of execution and are exercised to
that point. Everything AROUND the connector is real and tested on batch
DataFrames, because Spark's Kafka rows are just a fixed schema
(key binary, value binary, topic, partition, offset, timestamp, …):

* ``parse_event_records`` — the read-side chain: value bytes → JSON →
  typed event columns, carrying the Kafka coordinates through. This is
  the exact expression applied after ``readStream.format("kafka")``.
* ``serialize_event_records`` — the write-side chain: typed rows →
  (key, value) JSON pair ready for ``writeStream.format("kafka")``.
* round-trip identity is asserted in tests/test_streaming.py.

100 TB notes: one Spark input partition per Kafka topic-partition —
throughput scales with the topic's partition count, so a hot topic
needs partitions ≳ executor cores; ``maxOffsetsPerTrigger`` bounds
micro-batch size (backpressure); ``failOnDataLoss=false`` tolerates
retention-expired offsets on replay; exactly-once to transactional
sinks = checkpointed offsets + the idempotent foreachBatch MERGE in
``micmac_li3ds_spark.sources.sinks``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: JSON payload schema for event records on the wire.
EVENT_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),  # event time, µs since epoch
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def kafka_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: Sequence[str],
    *,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: Optional[int] = None,
    fail_on_data_loss: bool = False,
):
    """Configured Kafka ``DataStreamReader`` (caller invokes ``.load()``
    where the connector jar is on the classpath)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", ",".join(topics))
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader


def parse_event_records(raw: DataFrame) -> DataFrame:
    """Kafka-schema rows → typed event rows (+ source coordinates for
    dedup/audit). Works identically on a streaming or batch DataFrame —
    tests feed the batch twin."""
    v = F.from_json(F.col("value").cast("string"), EVENT_VALUE_SCHEMA)
    return raw.select(
        v.getField("event_id").alias("event_id"),
        F.timestamp_micros(v.getField("ts_us")).alias("ts"),
        v.getField("user_id").alias("user_id"),
        v.getField("event_type").alias("event_type"),
        v.getField("value").alias("value"),
        F.col("topic"),
        F.col("partition").alias("kafka_partition"),
        F.col("offset").alias("kafka_offset"),
    )


def serialize_event_records(events: DataFrame) -> DataFrame:
    """Typed event rows → Kafka (key, value) pair: key = user_id (keeps
    a user's events in one partition → per-key ordering downstream),
    value = canonical JSON payload."""
    payload = F.struct(
        F.col("event_id"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
    )
    return events.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        F.to_json(payload).cast("binary").alias("value"),
    )


def kafka_writer(
    serialized: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
):
    """Configured Kafka ``DataStreamWriter`` over a (key, value) frame
    (caller invokes ``.start()`` where the connector jar is present)."""
    return (
        serialized.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
