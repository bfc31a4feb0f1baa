"""True Structured Streaming tests: batch ≡ stream equivalence, late-data
drop, streaming dedup, stream-static and stream-stream joins, and the
foreachBatch exactly-once sink (SURVEY.md §5.2)."""

from __future__ import annotations

import datetime
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from micmac_li3ds_spark.streaming import jobs


def _drain(q):
    q.awaitTermination(120)
    q.stop()


def _rows(spark, name):
    return {tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}


def test_tumbling_batch_equals_stream(spark, sf_dir):
    from micmac_li3ds_spark.operators.streaming_batch import q_stream_tumbling

    stream = jobs.read_events_stream(spark, sf_dir)
    q = jobs.run_to_memory(
        jobs.tumbling_counts(stream), "t_tumbling", output_mode="complete"
    )
    _drain(q)
    got = _rows(spark, "t_tumbling")
    want = {tuple(r) for r in q_stream_tumbling(spark, sf_dir).collect()}
    assert got == want


def test_sliding_batch_equals_stream(spark, sf_dir):
    from micmac_li3ds_spark.operators.streaming_batch import q_stream_sliding

    stream = jobs.read_events_stream(spark, sf_dir)
    q = jobs.run_to_memory(
        jobs.sliding_counts(stream), "t_sliding", output_mode="complete"
    )
    _drain(q)
    got = _rows(spark, "t_sliding")
    want = {tuple(r) for r in q_stream_sliding(spark, sf_dir).collect()}
    assert got == want


def test_session_batch_equals_stream(spark, sf_dir):
    from micmac_li3ds_spark.operators.streaming_batch import q_stream_session

    stream = jobs.read_events_stream(spark, sf_dir)
    q = jobs.run_to_memory(
        jobs.session_totals(stream), "t_session", output_mode="complete"
    )
    _drain(q)
    got = _rows(spark, "t_session")
    want = {tuple(r) for r in q_stream_session(spark, sf_dir).collect()}
    assert got == want


def test_streaming_dedup(spark, sf_dir):
    stream = jobs.read_events_stream(spark, sf_dir)
    doubled = stream.unionByName(stream)  # duplicate every event
    q = jobs.run_to_memory(
        jobs.dedup_within_watermark(doubled).select("event_id"), "t_dedup"
    )
    _drain(q)
    got = [r[0] for r in spark.sql("SELECT event_id FROM t_dedup").collect()]
    assert len(got) == len(set(got))  # exact-once per event_id
    base = jobs.read_events_stream(spark, sf_dir)
    qc = jobs.run_to_memory(base.select("event_id"), "t_dedup_base")
    _drain(qc)
    assert len(got) == len(_rows(spark, "t_dedup_base"))


def test_watermark_drops_late_rows(spark):
    """Two sequential runs over a shared checkpoint: run 1 sees fresh
    rows and advances the watermark; run 2 (restarted from the
    checkpoint) sees only rows 10 h behind it — their windows must never
    be emitted. Also proves watermark persistence across restarts."""
    tmp = tempfile.mkdtemp(prefix="late_")
    try:
        t0 = datetime.datetime(2024, 6, 1, 12, 0, 0)
        fresh = [(i, t0 + datetime.timedelta(minutes=i), 1.0) for i in range(60)]
        late = [(1000 + i, t0 - datetime.timedelta(hours=10), 1.0) for i in range(5)]
        cols = "event_id long, ts timestamp, value double"

        emitted: list[tuple] = []

        def run_once():
            stream = (
                spark.readStream.schema("event_id long, ts timestamp, value double")
                .parquet(f"{tmp}/in")
            )
            agg = (
                stream.withWatermark("ts", "30 minutes")
                .groupBy(F.window("ts", "10 minutes").alias("w"))
                .agg(F.count(F.lit(1)).alias("n"))
                .select(F.col("w.start").alias("ws"), "n")
            )
            q = (
                agg.writeStream.foreachBatch(
                    lambda df, _id: emitted.extend(tuple(r) for r in df.collect())
                )
                .outputMode("append")
                .option("checkpointLocation", f"{tmp}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            q.stop()

        spark.createDataFrame(fresh, cols).coalesce(1).write.mode("append").parquet(
            f"{tmp}/in"
        )
        run_once()
        spark.createDataFrame(late, cols).coalesce(1).write.mode("append").parquet(
            f"{tmp}/in"
        )
        run_once()

        starts = {r[0] for r in emitted}
        assert starts, "no windows emitted at all"
        assert all(s >= t0 - datetime.timedelta(hours=1) for s in starts), starts
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_static_join(spark, sf_dir):
    from micmac_li3ds_spark.tables import load

    stream = jobs.read_events_stream(spark, sf_dir)
    dim = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    q = jobs.run_to_memory(jobs.stream_static_enrich(stream, dim), "t_enrich")
    _drain(q)
    got = spark.sql("SELECT count(*), count(c_mktsegment) FROM t_enrich").collect()[0]
    ev = load(spark, sf_dir, "events")
    want = ev.join(dim, ev.user_id == dim.c_custkey).count()
    assert got[0] == want and got[1] == want


def test_stream_stream_join(spark, sf_dir):
    stream1 = jobs.read_events_stream(spark, sf_dir)
    clicks = stream1.filter(F.col("event_type") == "click")
    stream2 = jobs.read_events_stream(spark, sf_dir)
    purchases = stream2.filter(F.col("event_type") == "purchase")
    q = jobs.run_to_memory(jobs.stream_stream_join(clicks, purchases), "t_ssj")
    _drain(q)
    got = len(_rows(spark, "t_ssj"))

    from micmac_li3ds_spark.tables import load

    ev = load(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").alias("c")
    p = ev.filter(F.col("event_type") == "purchase").alias("p")
    want = c.join(
        p,
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") >= F.col("c.ts"))
        & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 1 HOUR")),
    ).count()
    assert got == want
    assert got > 0


def test_stateful_user_totals_across_batches(spark):
    """applyInPandasWithState: per-user running totals must accumulate
    ACROSS micro-batches (state store), not reset per batch; the final
    emission per user must equal the batch groupBy totals."""
    tmp = tempfile.mkdtemp(prefix="state_")
    cols = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    t0 = datetime.datetime(2024, 6, 1, 12, 0, 0)

    def ev(i, uid, val):
        return (i, t0 + datetime.timedelta(minutes=i), uid, "click", val, "{}")

    batch1 = [ev(1, 1, 1.25), ev(2, 1, 2.50), ev(3, 2, 10.00)]
    batch2 = [ev(4, 1, 0.25), ev(5, 3, 7.75)]
    try:
        for rows in (batch1, batch2):
            spark.createDataFrame(rows, cols).coalesce(1).write.mode(
                "append"
            ).parquet(f"{tmp}/in")
        stream = (
            spark.readStream.schema(cols)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in")
        )
        emitted: list[tuple] = []
        q = (
            jobs.stateful_user_totals(stream)
            .writeStream.foreachBatch(
                lambda df, bid: emitted.extend(
                    (bid, *r) for r in df.collect()
                )
            )
            .outputMode("update")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        assert len({bid for bid, *_ in emitted}) == 2  # two micro-batches ran
        final = {}
        for _bid, uid, n, total in sorted(emitted):
            final[uid] = (n, total)
        # user 1 spans both batches: state must have accumulated
        assert final[1] == (3, 4.0)
        assert final[2] == (1, 10.0)
        assert final[3] == (1, 7.75)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_foreach_batch_sink_idempotent_upsert(spark, sf_dir):
    """foreachBatch + keyed overwrite = the JDBC-MERGE stand-in: batch
    writes keyed by batch id are idempotent on retry."""
    tmp = tempfile.mkdtemp(prefix="feb_")
    sunk: dict[int, int] = {}

    def sink(batch_df, batch_id: int):
        # idempotent: last write per batch_id wins (MERGE-on-key twin)
        sunk[batch_id] = batch_df.count()
        batch_df.write.mode("overwrite").parquet(f"{tmp}/out/batch={batch_id}")

    try:
        stream = jobs.read_events_stream(spark, sf_dir).select(
            "event_id", "user_id", "value"
        )
        q = jobs.run_foreach_batch(stream, sink, checkpoint=f"{tmp}/ckpt")
        q.awaitTermination(120)
        q.stop()
        total = sum(sunk.values())
        back = spark.read.parquet(f"{tmp}/out/batch=*")
        assert back.count() == total
        assert total > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_transform_with_state_matches_apply_in_pandas_with_state(spark):
    """transformWithStateInPandas (Spark 4 typed-state API) must
    accumulate the same per-user totals across micro-batches as the
    applyInPandasWithState implementation."""
    # the TWS python worker speaks protobuf to the JVM state server;
    # skip (not fail) in environments without google.protobuf.
    # Gate-closure attempted round 9 (2026-08-14): no python
    # google.protobuf anywhere on disk (pyspark/sql/protobuf is the
    # from_protobuf SQL wrapper, not the lib), no cached wheel, and
    # `pip download protobuf` fails with "versions: none" (no
    # network) — vendoring is not possible in this container, so the
    # gate stays env-blocked, not unattempted.
    pytest.importorskip("google.protobuf.descriptor")
    tmp = tempfile.mkdtemp(prefix="tws_")
    cols = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    t0 = datetime.datetime(2024, 6, 1, 12, 0, 0)

    def ev(i, uid, val):
        return (i, t0 + datetime.timedelta(minutes=i), uid, "click", val, "{}")

    batch1 = [ev(1, 1, 1.25), ev(2, 1, 2.50), ev(3, 2, 10.00)]
    batch2 = [ev(4, 1, 0.25), ev(5, 3, 7.75)]
    try:
        for rows in (batch1, batch2):
            spark.createDataFrame(rows, cols).coalesce(1).write.mode(
                "append"
            ).parquet(f"{tmp}/in")
        stream = (
            spark.readStream.schema(cols)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in")
        )
        emitted: list[tuple] = []
        q = (
            jobs.tws_user_totals(stream)
            .writeStream.foreachBatch(
                lambda df, bid: emitted.extend((bid, *r) for r in df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        final = {}
        for _bid, uid, n, total in sorted(emitted):
            final[uid] = (n, total)
        # same expectations as test_stateful_user_totals_across_batches:
        # user 1 spans both micro-batches, so state must accumulate
        assert final[1] == (3, 4.0)
        assert final[2] == (1, 10.0)
        assert final[3] == (1, 7.75)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_rate_source_generates_monotonic_rows(spark):
    """The dev/load-test source (SURVEY.md §2.1): format("rate") emits
    (timestamp, value) with value increasing from 0 — drain a couple of
    micro-batches and check the contract. numPartitions shows the
    source parallelizes generation (the point of using it to load-test
    sinks)."""
    import time as _time

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 500)
        .option("numPartitions", 2)
        .load()
        .withColumn("part", F.spark_partition_id())
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_probe")
        .outputMode("append")
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        deadline = _time.time() + 60
        while _time.time() < deadline:
            if spark.sql("SELECT COUNT(*) FROM rate_probe").first()[0] >= 100:
                break
            _time.sleep(0.25)
    finally:
        q.stop()
    rows = spark.sql("SELECT value FROM rate_probe").collect()
    vals = sorted(r["value"] for r in rows)
    assert len(vals) >= 100
    assert vals == list(range(vals[0], vals[0] + len(vals)))  # gap-free
    nparts = spark.sql("SELECT COUNT(DISTINCT part) FROM rate_probe").first()[0]
    assert nparts == 2


def test_kafka_parse_serialize_roundtrip(spark):
    """The Kafka wire chains (streaming/kafka.py) run identically on
    batch rows: serialize typed events to (key, value) JSON, wrap them
    in the connector's fixed schema, parse back, and require identity.
    The connector jar itself is absent here; these expressions are what
    runs on either side of it."""
    from micmac_li3ds_spark.streaming import kafka

    events = spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 6, 1, 12, 0, 0, 123456), 7, "click", 1.5),
            (2, datetime.datetime(2024, 6, 1, 12, 5, 0), 8, "purchase", 99.99),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    wire = kafka.serialize_event_records(events)
    assert [f.name for f in wire.schema.fields] == ["key", "value"]
    assert all(f.dataType.typeName() == "binary" for f in wire.schema.fields)

    # wrap in the connector's row shape (topic/partition/offset added)
    raw = wire.select(
        "key",
        "value",
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
    )
    back = kafka.parse_event_records(raw)
    got = {
        tuple(r)
        for r in back.select(
            "event_id", "ts", "user_id", "event_type", "value"
        ).collect()
    }
    want = {tuple(r) for r in events.collect()}
    assert got == want
    assert back.select("topic").first()[0] == "events"


def test_kafka_reader_writer_builders_configure(spark):
    """Builders must assemble without the connector (execution is the
    only step that needs the jar)."""
    from micmac_li3ds_spark.streaming import kafka

    r = kafka.kafka_reader(
        spark, "broker:9092", ["events", "clicks"],
        max_offsets_per_trigger=10_000,
    )
    assert r is not None  # configured DataStreamReader
    # writeStream exists only on streaming frames — use a rate stream
    # shaped to the (key, value) wire pair (not started: no jar needed)
    stream = (
        spark.readStream.format("rate").load().select(
            F.col("value").cast("string").cast("binary").alias("key"),
            F.to_json(F.struct("value")).cast("binary").alias("value"),
        )
    )
    w = kafka.kafka_writer(stream, "broker:9092", "out", "/tmp/ck")
    assert w is not None  # configured DataStreamWriter


def test_checkpoint_restart_processes_each_file_once(spark, sf_dir):
    """Exactly-once across restart: a file-stream query drains batch 1,
    stops, new data arrives, and a NEW query object resumes from the
    same checkpoint — the second run must process ONLY the new file
    (checkpointed offsets), and the union of outputs covers every row
    exactly once."""
    import os

    from pyspark.sql import functions as SF

    base = tempfile.mkdtemp(prefix="ckpt_restart_")
    src, out, ckpt = (os.path.join(base, d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)
    try:
        from micmac_li3ds_spark.tables import load

        # two disjoint halves of events written as separate files
        # (load() normalizes the on-disk ns timestamps to µs)
        full = load(spark, sf_dir, "events")
        full.filter(SF.col("event_id") % 2 == 0).write.parquet(
            os.path.join(src, "half_a")
        )

        def run_once():
            stream = (
                spark.readStream.schema(full.schema)
                .option("recursiveFileLookup", "true")
                .parquet(src)
            )
            q = (
                stream.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            q.stop()

        run_once()
        n_first = spark.read.parquet(out).count()
        assert n_first == full.filter(SF.col("event_id") % 2 == 0).count()

        full.filter(SF.col("event_id") % 2 == 1).write.parquet(
            os.path.join(src, "half_b")
        )
        run_once()  # new query object, same checkpoint
        got = spark.read.parquet(out)
        assert got.count() == full.count()  # every row exactly once
        assert got.select("event_id").distinct().count() == full.count()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stream_stream_left_outer_emits_unmatched(spark):
    """Clicks with no purchase within the hour must appear with NULL
    purchase_id once the watermark passes their join horizon; matched
    clicks must appear exactly as in the inner join."""
    tmp = tempfile.mkdtemp(prefix="ssoj_")
    cols = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    t0 = datetime.datetime(2024, 6, 1, 12, 0, 0)

    def ev(i, uid, kind, minutes):
        return (i, t0 + datetime.timedelta(minutes=minutes), uid, kind, 1.0, "{}")

    rows = [
        ev(1, 1, "click", 0),      # matched by purchase 10 at +30m
        ev(2, 2, "click", 0),      # never matched
        ev(10, 1, "purchase", 30),
    ]
    # far-future sentinels on BOTH streams (the join watermark is the
    # MIN across inputs, so the click side must advance too): wave 1
    # moves the watermark past every click's join horizon; wave 2 forces
    # one more batch that RUNS with that advanced watermark (watermarks
    # take effect in the batch AFTER the data that moved them)
    wave1 = [ev(99, 9, "purchase", 60 * 24), ev(98, 9, "click", 60 * 24)]
    wave2 = [ev(100, 9, "purchase", 60 * 48), ev(101, 9, "click", 60 * 48)]
    emitted: list[tuple] = []

    def run_once():
        stream = spark.readStream.schema(cols).parquet(f"{tmp}/in")
        clicks = stream.filter(F.col("event_type") == "click")
        purchases = stream.filter(F.col("event_type") == "purchase")
        q = (
            jobs.stream_stream_left_join(clicks, purchases)
            .writeStream.foreachBatch(
                lambda df, _id: emitted.extend(tuple(r) for r in df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    try:
        # run 1: clicks + the matching purchase; watermark still at the
        # data's horizon so the unmatched click stays in state
        spark.createDataFrame(rows, cols).coalesce(1).write.mode(
            "append"
        ).parquet(f"{tmp}/in")
        run_once()
        # runs 2+3 (same checkpoint): sentinels advance the watermark,
        # the following batch evicts finalized outer state
        for wave in (wave1, wave2):
            spark.createDataFrame(wave, cols).coalesce(1).write.mode(
                "append"
            ).parquet(f"{tmp}/in")
            run_once()
        got = {(r[1], r[2]) for r in emitted}
        assert (1, 10) in got          # matched pair
        assert (2, None) in got        # outer row emitted after watermark
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_ohlc_batch_equals_stream(spark, sf_dir):
    # open/close via min_by/max_by run IDENTICALLY under readStream —
    # the dual-mode formulation q_stream_ohlc exists to prove
    from micmac_li3ds_spark.operators.streaming_batch import q_stream_ohlc

    stream = jobs.read_events_stream(spark, sf_dir)
    q = jobs.run_to_memory(
        jobs.ohlc_bars(stream), "t_ohlc", output_mode="complete"
    )
    _drain(q)
    got = _rows(spark, "t_ohlc")
    want = {tuple(r) for r in q_stream_ohlc(spark, sf_dir).collect()}
    assert got == want


def test_attribution_batch_equals_stream(spark, sf_dir):
    # last-touch attribution: the batch conditional running-MAX window
    # and the streaming one-scalar-state twin must emit identical rows
    # for in-order arrival
    from micmac_li3ds_spark.operators.windows import q_event_attribution

    stream = jobs.read_events_stream(spark, sf_dir)
    q = jobs.run_to_memory(
        jobs.attribution_stream(stream), "t_attr", output_mode="append"
    )
    _drain(q)
    got = _rows(spark, "t_attr")
    want = {tuple(r) for r in q_event_attribution(spark, sf_dir).collect()}
    assert got == want


def test_transitions_batch_equals_stream(spark, sf_dir):
    # the batch per-user lag window and the streaming one-triple-state
    # twin must produce the identical transition-pair multiset for
    # in-order arrival; the downstream k×k aggregation then matches the
    # registered batch query row-for-row
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from micmac_li3ds_spark.operators.mining import q_event_transitions

    stream = jobs.read_events_stream(spark, sf_dir)
    q = jobs.run_to_memory(
        jobs.transitions_stream(stream), "t_trans", output_mode="append"
    )
    _drain(q)
    pairs = spark.table("t_trans")
    wt = Window.partitionBy("prev_type")
    got = {
        tuple(r)
        for r in pairs.groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .select(
            "prev_type",
            "next_type",
            "n_transitions",
            F.round(
                F.col("n_transitions").cast("double")
                / F.sum("n_transitions").over(wt),
                6,
            ).alias("p"),
        )
        .collect()
    }
    want = {tuple(r) for r in q_event_transitions(spark, sf_dir).collect()}
    assert got == want


def test_transitions_stream_state_carries_across_batches(
    spark, sf_dir, tmp_path
):
    # the single-corpus-file test drains in ONE micro-batch, which never
    # exercises the per-user state between batches. Split the corpus at
    # the median day into two time-ordered files (mtimes force oldest-
    # first pickup), force one file per trigger, and require (a) at
    # least two micro-batches actually ran and (b) the pair multiset
    # still equals the batch lag's — which can only hold if the last
    # event of batch 1 was carried in state and paired with the first
    # event of batch 2 for every user active in both.
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from micmac_li3ds_spark.tables import load

    ev = load(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    stream_dir = tmp_path / "evstream"
    stream_dir.mkdir()
    for i, part in enumerate(
        (ev.filter(F.col("ts") < cutoff), ev.filter(F.col("ts") >= cutoff))
    ):
        scratch = str(tmp_path / f"w{i}")
        part.coalesce(1).write.mode("overwrite").parquet(scratch)
        src = glob.glob(os.path.join(scratch, "part-*.parquet"))[0]
        dst = str(stream_dir / f"e{i}.parquet")
        shutil.move(src, dst)
        os.utime(dst, (1_700_000_000 + i * 1000, 1_700_000_000 + i * 1000))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    q = jobs.run_to_memory(
        jobs.transitions_stream(stream), "t_trans_mb", output_mode="append"
    )
    _drain(q)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, n_batches

    got = sorted(
        map(tuple, spark.table("t_trans_mb").collect())
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    want = sorted(
        map(
            tuple,
            ev.withColumn("prev_type", F.lag("event_type").over(w))
            .filter(F.col("prev_type").isNotNull())
            .select(
                "user_id",
                "prev_type",
                F.col("event_type").alias("next_type"),
            )
            .collect(),
        )
    )
    assert got == want


def test_attribution_stream_state_carries_across_batches(
    spark, sf_dir, tmp_path
):
    # same two-file harness as the transitions test: a purchase in
    # batch 2 must attribute to a click seen in batch 1 through the
    # carried one-scalar state, reproducing the batch window exactly
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from micmac_li3ds_spark.operators.windows import q_event_attribution
    from micmac_li3ds_spark.tables import load

    ev = load(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    stream_dir = tmp_path / "evstream_attr"
    stream_dir.mkdir()
    for i, part in enumerate(
        (ev.filter(F.col("ts") < cutoff), ev.filter(F.col("ts") >= cutoff))
    ):
        scratch = str(tmp_path / f"wa{i}")
        part.coalesce(1).write.mode("overwrite").parquet(scratch)
        src = glob.glob(os.path.join(scratch, "part-*.parquet"))[0]
        dst = str(stream_dir / f"e{i}.parquet")
        shutil.move(src, dst)
        os.utime(dst, (1_700_000_000 + i * 1000, 1_700_000_000 + i * 1000))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    q = jobs.run_to_memory(
        jobs.attribution_stream(stream), "t_attr_mb", output_mode="append"
    )
    _drain(q)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, n_batches
    got = {tuple(r) for r in spark.table("t_attr_mb").collect()}
    want = {tuple(r) for r in q_event_attribution(spark, sf_dir).collect()}
    assert got == want


def test_stream_stream_full_outer_finalizes_both_sides(spark):
    """FULL OUTER interval join: the matched pair emits as in the inner
    join; an unmatched CLICK emits (click_id, NULL) and an unmatched
    PURCHASE emits (NULL, purchase_id) — each only after the watermark
    closes its match window. This is the one §2.9 join mode the
    left-outer test doesn't cover: state finalization on BOTH sides."""
    tmp = tempfile.mkdtemp(prefix="ssfj_")
    cols = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    t0 = datetime.datetime(2024, 6, 1, 12, 0, 0)

    def ev(i, uid, kind, minutes):
        return (i, t0 + datetime.timedelta(minutes=minutes), uid, kind, 1.0, "{}")

    rows = [
        ev(1, 1, "click", 0),      # matched by purchase 10 at +30m
        ev(2, 2, "click", 0),      # never matched → (2, NULL)
        ev(10, 1, "purchase", 30),
        ev(11, 3, "purchase", 30),  # user with no click → (NULL, 11)
    ]
    # sentinel waves on both streams: wave 1 advances the min-watermark
    # past every row's join horizon; wave 2 runs one more batch WITH the
    # advanced watermark so finalized outer state actually evicts
    wave1 = [ev(99, 9, "purchase", 60 * 24), ev(98, 9, "click", 60 * 24)]
    wave2 = [ev(100, 9, "purchase", 60 * 48), ev(101, 9, "click", 60 * 48)]
    emitted: list[tuple] = []

    def run_once():
        stream = spark.readStream.schema(cols).parquet(f"{tmp}/in")
        clicks = stream.filter(F.col("event_type") == "click")
        purchases = stream.filter(F.col("event_type") == "purchase")
        q = (
            jobs.stream_stream_full_join(clicks, purchases)
            .writeStream.foreachBatch(
                lambda df, _id: emitted.extend(tuple(r) for r in df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    try:
        spark.createDataFrame(rows, cols).coalesce(1).write.mode(
            "append"
        ).parquet(f"{tmp}/in")
        run_once()
        # neither outer row may emit before the watermark finalizes it
        early = {(r[1], r[2]) for r in emitted}
        assert (2, None) not in early
        assert (None, 11) not in early
        for wave in (wave1, wave2):
            spark.createDataFrame(wave, cols).coalesce(1).write.mode(
                "append"
            ).parquet(f"{tmp}/in")
            run_once()
        got = {(r[1], r[2]) for r in emitted}
        assert (1, 10) in got        # matched pair
        assert (2, None) in got      # click side finalized
        assert (None, 11) in got     # purchase side finalized
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_transitions_stream_drops_out_of_order_stragglers(spark, tmp_path):
    """The in-order invariant of transitions_stream is enforced, not
    assumed: a micro-batch delivering an event OLDER than the carried
    (ts, event_id) state must be dropped — its successor pair was
    already emitted — and a redelivered duplicate (== state) likewise.
    In-order rows arriving in the same late batch still pair against
    the carried state."""
    import os

    cols = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    t0 = datetime.datetime(2024, 6, 1, 12, 0, 0)

    def ev(i, kind, minutes):
        return (i, t0 + datetime.timedelta(minutes=minutes), 1, kind, 1.0, "{}")

    batch1 = [ev(1, "view", 0), ev(2, "click", 10), ev(3, "purchase", 20)]
    batch2 = [
        ev(9, "search", 15),     # straggler: older than state (t=20) → drop
        ev(3, "purchase", 20),   # duplicate redelivery (== state) → drop
        ev(4, "refund", 30),     # in-order: pairs against carried purchase
    ]
    stream_dir = tmp_path / "ooo"
    stream_dir.mkdir()
    for i, batch in enumerate((batch1, batch2)):
        scratch = str(tmp_path / f"s{i}")
        spark.createDataFrame(batch, cols).coalesce(1).write.mode(
            "overwrite"
        ).parquet(scratch)
        import glob as _glob
        import shutil as _shutil

        src = _glob.glob(os.path.join(scratch, "part-*.parquet"))[0]
        dst = str(stream_dir / f"b{i}.parquet")
        _shutil.move(src, dst)
        os.utime(dst, (1_700_000_000 + i * 1000,) * 2)

    stream = (
        spark.readStream.schema(cols)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    q = jobs.run_to_memory(
        jobs.transitions_stream(stream), "t_trans_ooo", output_mode="append"
    )
    _drain(q)
    got = sorted(
        (r["prev_type"], r["next_type"])
        for r in spark.table("t_trans_ooo").collect()
    )
    assert got == [
        ("click", "purchase"),
        ("purchase", "refund"),
        ("view", "click"),
    ], got


def test_transform_with_state_ttl_expires_idle_keys(spark, tmp_path):
    """State TTL — the memory-boundedness contract for unbounded key
    domains: a key re-arriving WITHIN the TTL accumulates onto carried
    state; the same key re-arriving AFTER idling past the TTL restarts
    from zero because the store itself expired the value. Proven with
    three checkpoint-chained availableNow runs with a > TTL pause
    before the last one."""
    import os
    import time

    pytest.importorskip("google.protobuf.descriptor")
    tmp = str(tmp_path / "ttl")
    cols = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    t0 = datetime.datetime(2024, 6, 1, 12, 0, 0)

    def ev(i, uid, val):
        return (i, t0 + datetime.timedelta(minutes=i), uid, "click", val, "{}")

    emitted: list[tuple] = []
    ttl_ms = 2000

    def run_once(rows):
        spark.createDataFrame(rows, cols).coalesce(1).write.mode(
            "append"
        ).parquet(f"{tmp}/in")
        stream = spark.readStream.schema(cols).parquet(f"{tmp}/in")
        q = (
            jobs.tws_user_totals(stream, ttl_ms=ttl_ms)
            .writeStream.foreachBatch(
                lambda df, bid: emitted.extend(tuple(r) for r in df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    run_once([ev(1, 1, 1.00)])
    # within TTL: state carries, totals accumulate
    run_once([ev(2, 1, 2.00)])
    within = [r for r in emitted if r[0] == 1]
    assert within[-1] == (1, 2, 3.0), within
    # idle past the TTL: the store expires user 1's value state
    time.sleep((ttl_ms / 1000) + 2)
    run_once([ev(3, 1, 5.00)])
    after = [r for r in emitted if r[0] == 1]
    assert after[-1] == (1, 1, 5.0), after


def test_anomaly_grid_from_stream_matches_batch(spark, sf_dir):
    """The production alerting shape behind q_ts_anomaly: streaming
    ingest MATERIALIZES the (event_type, hour) count grid as a
    continuous aggregate; the rolling z-test is then a batch window
    scan over that tiny grid, not over raw events. Proven by building
    the grid via readStream (hourly tumbling counts, complete mode)
    and asserting the z-test over the streamed grid is row-identical
    to the batch operator's output on the same corpus."""
    from pyspark.sql.window import Window as W

    from micmac_li3ds_spark.operators.mining import q_ts_anomaly

    stream = jobs.read_events_stream(spark, sf_dir)
    grid = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("hour_start"), "event_type", "cnt"
        )
    )
    q = jobs.run_to_memory(grid, "t_anom_grid", output_mode="complete")
    _drain(q)

    g = spark.table("t_anom_grid")
    w = W.partitionBy("event_type").orderBy("hour_start").rowsBetween(-24, -1)
    n = F.count(F.lit(1)).over(w).cast("long")
    s = F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("long")
    qq = F.coalesce(F.sum(F.col("cnt") * F.col("cnt")).over(w), F.lit(0)).cast(
        "long"
    )
    d = g.select(
        "event_type", "hour_start", "cnt",
        n.alias("n_win"), s.alias("sum_win"), qq.alias("sumsq_win"),
    )
    dev = F.col("n_win") * F.col("cnt") - F.col("sum_win")
    var_n = (
        F.col("n_win") * F.col("sumsq_win")
        - F.col("sum_win") * F.col("sum_win")
    )
    streamed = d.withColumn(
        "is_anomaly",
        (F.col("n_win") >= 12)
        & (dev * dev * (F.col("n_win") - 1) > 9 * F.col("n_win") * var_n),
    )
    got = sorted(map(tuple, streamed.collect()))
    want = sorted(map(tuple, q_ts_anomaly(spark, sf_dir).collect()))
    assert got == want


def test_tws_event_time_timer_closes_sessions(spark, tmp_path):
    """Event-time timers (transformWithState): sessions close when the
    WATERMARK passes last_event + gap — the hand-rolled twin of
    session_window, proving the timer/eviction primitive. A session
    whose gap has not been passed by the watermark must NOT emit."""
    pytest.importorskip("google.protobuf.descriptor")
    tmp = str(tmp_path / "timer")
    cols = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    t0 = datetime.datetime(2024, 6, 1, 12, 0, 0)

    def ev(i, uid, minutes):
        return (i, t0 + datetime.timedelta(minutes=minutes), uid, "click", 1.0, "{}")

    emitted: list[tuple] = []

    def run_once(rows):
        spark.createDataFrame(rows, cols).coalesce(1).write.mode(
            "append"
        ).parquet(f"{tmp}/in")
        stream = spark.readStream.schema(cols).parquet(f"{tmp}/in")
        q = (
            jobs.tws_session_timer(stream, gap_s=1800)
            .writeStream.foreachBatch(
                lambda df, bid: emitted.extend(tuple(r) for r in df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    # user 1: two events 10 min apart (one session); user 2: one event;
    # user 3: two events 90 min apart IN THE SAME BATCH — a > gap jump
    # that must close inline as TWO sessions (the availableNow
    # catch-up case), not merge into one
    run_once([ev(1, 1, 0), ev(2, 1, 10), ev(3, 2, 5), ev(4, 3, 0), ev(5, 3, 90)])
    t_base = int(t0.timestamp())
    early = set(emitted)
    assert (3, t_base, t_base, 1) in early  # user 3's first session closed inline
    assert not any(r[0] in (1, 2) for r in early)  # open sessions wait for the timer
    # advance the watermark far past both gaps with a sentinel user
    run_once([ev(99, 9, 480)])
    run_once([ev(100, 9, 960)])
    got = {(r[0], r[1]): r for r in emitted}
    assert got[(1, t_base)] == (1, t_base, t_base + 600, 2)
    assert got[(2, t_base + 300)] == (2, t_base + 300, t_base + 300, 1)
    assert got[(3, t_base + 5400)] == (3, t_base + 5400, t_base + 5400, 1)


def test_fold_session_events_pure_logic():
    """Unconditional coverage of the session algebra the TWS processor
    ships (the processor wiring itself is probe-gated on protobuf):
    batch-internal gap splits, cross-batch state carry, backward
    extension by in-gap stragglers, and ordering invariance via the
    caller's sort contract."""
    from micmac_li3ds_spark.streaming.jobs import fold_session_events

    gap = 100
    # fresh key, one session
    closed, st = fold_session_events(None, [10, 20, 30], gap)
    assert closed == [] and st == (10, 30, 3)
    # carried state + in-gap continuation
    closed, st = fold_session_events((10, 30, 3), [90, 120], gap)
    assert closed == [] and st == (10, 120, 5)
    # > gap jump inside the batch closes inline
    closed, st = fold_session_events(None, [0, 50, 400, 420], gap)
    assert closed == [(0, 50, 2)] and st == (400, 420, 2)
    # two jumps → two closed sessions
    closed, st = fold_session_events(None, [0, 400, 900], gap)
    assert closed == [(0, 0, 1), (400, 400, 1)] and st == (900, 900, 1)
    # in-gap straggler extends the open session backward
    closed, st = fold_session_events((100, 150, 2), [60, 160], gap)
    assert closed == [] and st == (60, 160, 4)
    # carried state closed by a far-future event
    closed, st = fold_session_events((0, 10, 2), [500], gap)
    assert closed == [(0, 10, 2)] and st == (500, 500, 1)
    # straggler FAR BEFORE the carried session: its own (closed)
    # session, never a backward mega-merge
    closed, st = fold_session_events((5000, 5010, 2), [60], gap)
    assert closed == [(60, 60, 1)] and st == (5000, 5010, 2)
    # straggler bridges two far-apart points into the carried session
    closed, st = fold_session_events((200, 210, 2), [50, 130], gap)
    assert closed == [] and st == (50, 210, 4)
    # EXACT-GAP boundary (r8 advice): measured against the built-in —
    # session_window MERGES an event at exactly last + gap (adjacent
    # half-open intervals coalesce; see
    # test_session_window_exact_gap_boundary), so the fold does too
    closed, st = fold_session_events(None, [0, 100], gap)
    assert closed == [] and st == (0, 100, 2)
    # one past the gap splits
    closed, st = fold_session_events(None, [0, 101], gap)
    assert closed == [(0, 0, 1)] and st == (101, 101, 1)


def test_session_window_exact_gap_boundary(spark):
    """Pin the BUILT-IN's boundary semantics that
    fold_session_events mirrors: events at t and t+gap land in ONE
    session_window (adjacent [t, t+gap) / [t+gap, t+2gap) intervals
    merge), while t and t+gap+1 split. If a Spark upgrade ever flips
    this, this test goes red together with the fold's unit pin —
    the equivalence claim stays measured, not assumed."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 0), (1, 100), (2, 0), (2, 101)], "u int, s long"
    ).select("u", F.col("s").cast("timestamp").alias("ts"))
    out = (
        df.groupBy("u", F.session_window("ts", "100 seconds"))
        .count()
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy("u")
        .collect()
    )
    assert [(r.u, r.n_sessions) for r in out] == [(1, 1), (2, 2)]


# ---------------------------------------------------------------------------
# Round 14: dead-letter-queue ingest — the streaming twin of the batch
# corrupt-record channel (q_scan_json)
# ---------------------------------------------------------------------------


def test_dead_letter_split_routes_and_is_idempotent(spark, tmp_path):
    """Three micro-batches (one file each) of dirty JSON lines: valid
    rows land typed in the clean table, corrupt lines land RAW in the
    DLQ with their batch id; totals account for every input line; and
    re-running a batch function with the same batch id REPLACES its
    output instead of duplicating it (the write-by-batch-id pattern)."""
    src = tmp_path / "src"
    src.mkdir()
    good = '{"click_id": %d, "page": "p%d", "ms": %d, "ok": true}'
    bad = [
        '{"click_id": 901, "page": "p1", "ms": "fast", "ok": true}',
        '{"click_id": 902, "page": "p2"',
        "not json",
    ]
    (src / "a.jsonl").write_text(
        "\n".join([good % (1, 1, 10), bad[0], good % (2, 2, 20)]) + "\n"
    )
    (src / "b.jsonl").write_text(
        "\n".join([bad[1], bad[2], good % (3, 3, 30)]) + "\n"
    )
    (src / "c.jsonl").write_text(good % (4, 4, 40) + "\n")

    clean_dir = str(tmp_path / "clean")
    dlq_dir = str(tmp_path / "dlq")
    stream = jobs.read_clicks_json_stream(spark, str(src))
    q = jobs.run_dead_letter_split(
        stream, clean_dir, dlq_dir, str(tmp_path / "ckpt")
    )
    _drain(q)

    clean = spark.read.parquet(clean_dir)
    dlq = spark.read.parquet(dlq_dir)
    assert {r["click_id"] for r in clean.collect()} == {1, 2, 3, 4}
    assert "_corrupt_record" not in clean.columns
    # every corrupt line preserved verbatim for replay
    assert {r["raw_line"] for r in dlq.collect()} == set(bad)
    assert clean.count() + dlq.count() == 7
    # batch provenance: the DLQ rows carry the batch id of their file
    assert dlq.select("batch_id").distinct().count() == 2

    # idempotency: re-running one batch's writes with the same id must
    # not duplicate rows (simulates a post-crash retry of a committed
    # micro-batch)
    corrupt = F.col("_corrupt_record").isNotNull()
    replay = (
        spark.read.schema(jobs.CLICKS_DLQ_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(src / "a.jsonl"))
    )
    bid = (
        spark.read.parquet(clean_dir)
        .filter(F.col("click_id").isin(1, 2))
        .select(F.expr("regexp_extract(input_file_name(), 'batch=(\\\\d+)', 1)"))
        .distinct()
        .collect()
    )
    assert len(bid) == 1
    bno = int(bid[0][0])
    replay.filter(~corrupt).drop("_corrupt_record").write.mode(
        "overwrite"
    ).parquet(f"{clean_dir}/batch={bno}")
    assert spark.read.parquet(clean_dir).count() == 4  # unchanged


# ---------------------------------------------------------------------------
# Round 14: Python Data Source streaming side (SimpleDataSourceStreamReader)
# ---------------------------------------------------------------------------


def test_python_datasource_stream_matches_batch_and_replays(spark):
    """The demo custom source's STREAMING side must deliver, across
    multiple engine-managed micro-batches, exactly the rows its batch
    reader returns (stream ≡ batch for the same generator), and its
    readBetweenOffsets replay path — what the engine calls when
    recovering a committed batch after a crash — must reproduce the
    original rows for any offset pair."""
    import time

    from micmac_li3ds_spark.operators.udfs import (
        SeqSource,
        _SeqStreamReader,
    )

    spark.dataSource.register(SeqSource)
    q = (
        spark.readStream.format("seq_demo")
        .load()
        .writeStream.format("memory")
        .queryName("seq_stream14")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if (
                spark.sql("SELECT count(*) FROM seq_stream14").collect()[0][0]
                >= 100
            ):
                break
            time.sleep(0.5)
    finally:
        q.stop()

    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM seq_stream14").collect()
    )
    batch = sorted(
        tuple(r) for r in spark.read.format("seq_demo").load().collect()
    )
    assert got == batch and len(got) == 100

    # replay determinism: recovering any committed offset range yields
    # exactly the rows the original read returned
    r = _SeqStreamReader(per_batch=20, max_rows=100)
    start = r.initialOffset()
    seen = []
    offsets = [start]
    while True:
        rows, nxt = r.read(offsets[-1])
        rows = list(rows)
        if not rows:
            break
        seen.append(rows)
        offsets.append(nxt)
    assert sum(len(x) for x in seen) == 100 and len(seen) == 5
    for k in range(len(seen)):
        assert list(r.readBetweenOffsets(offsets[k], offsets[k + 1])) == seen[k]


def test_replay_dead_letters_recovers_after_schema_fix(spark, tmp_path):
    """The DLQ's second half: raw quarantined lines re-parsed after a
    fix. With the ORIGINAL schema the type-mismatched lines stay dead;
    with an AMENDED schema (ms widened to string — 'the producer sends
    free-text latencies now') those rows recover, while syntactically
    broken lines stay dead forever. Provenance survives the round trip."""
    from pyspark.sql import types as T

    dlq = tmp_path / "dlq"
    rows = [
        ('{"click_id": 901, "page": "p1", "ms": "fast", "ok": true}', 0),
        ('{"click_id": 902, "page": "p2"', 1),
        ("not json", 1),
        ('{"click_id": 903, "page": "p3", "ms": 5, "ok": "maybe"}', 2),
    ]
    spark.createDataFrame(
        [(r, b) for r, b in rows], "raw_line string, batch_id long"
    ).withColumn("ingest_ts", F.current_timestamp()).write.parquet(str(dlq))

    orig = T.StructType(
        [
            T.StructField("click_id", T.LongType()),
            T.StructField("page", T.StringType()),
            T.StructField("ms", T.LongType()),
            T.StructField("ok", T.BooleanType()),
        ]
    )
    rec, dead = jobs.replay_dead_letters(spark, str(dlq), orig)
    assert rec.count() == 0  # nothing recoverable without a fix
    assert dead.count() == 4
    assert set(dead.columns) == {"raw_line", "batch_id", "ingest_ts"}

    fixed = T.StructType(
        [
            T.StructField("click_id", T.LongType()),
            T.StructField("page", T.StringType()),
            T.StructField("ms", T.StringType()),  # widened
            T.StructField("ok", T.BooleanType()),
        ]
    )
    rec2, dead2 = jobs.replay_dead_letters(spark, str(dlq), fixed)
    got = {tuple(r) for r in rec2.collect()}
    assert got == {(901, "p1", "fast", True)}
    assert {r["raw_line"] for r in dead2.collect()} == {
        rows[1][0],
        rows[2][0],
        rows[3][0],  # ok still untypeable
    }


# ---------------------------------------------------------------------------
# Round 15: partitioned Python Data Source streaming (DataSourceStreamReader)
# ---------------------------------------------------------------------------


def test_python_datasource_partitioned_stream_matches_batch(spark):
    """The PARTITIONED streaming contract (executor-side reads, one
    task per split) must deliver, across engine-managed micro-batches,
    exactly the rows the inherited batch reader returns — the same
    stream ≡ batch pin the Simple form got in round 14. streamReader
    takes precedence over the inherited simpleStreamReader, so this
    exercises the executor-side path, not the driver-side one."""
    import time

    from micmac_li3ds_spark.operators.udfs import SeqPartSource

    spark.dataSource.register(SeqPartSource)
    q = (
        spark.readStream.format("seq_demo_part")
        .load()
        .writeStream.format("memory")
        .queryName("seq_part_stream15")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if (
                spark.sql(
                    "SELECT count(*) FROM seq_part_stream15"
                ).collect()[0][0]
                >= 100
            ):
                break
            time.sleep(0.5)
    finally:
        q.stop()

    got = sorted(
        tuple(r)
        for r in spark.sql("SELECT * FROM seq_part_stream15").collect()
    )
    batch = sorted(
        tuple(r)
        for r in spark.read.format("seq_demo_part").load().collect()
    )
    assert got == batch and len(got) == 100


def test_python_datasource_partitioned_replay_is_deterministic():
    """Replay exactness for the partitioned contract is structural:
    partitions(start, end) is a pure function of the offset pair and
    read(split) a pure function of its split, so recovering any
    write-ahead-logged batch replans the SAME splits and re-reads the
    SAME rows. Drive the reader like the engine does — initialOffset,
    a latestOffset per trigger, partitions + read per pair — then
    replan/re-read every committed pair on a FRESH reader instance
    (the post-crash state) and demand identity. Also pins the split
    algebra: ≤ n_parts contiguous disjoint ranges covering [lo, hi)."""
    from micmac_li3ds_spark.operators.udfs import (
        _SeqPartStreamReader,
        _seq_rows as _seq_rows_ref,
    )

    r = _SeqPartStreamReader(n_parts=4, per_batch=20, max_rows=100)
    offsets = [r.initialOffset()]
    per_batch_rows = []
    while True:
        end = r.latestOffset()
        if end == offsets[-1]:
            break
        splits = r.partitions(offsets[-1], end)
        assert 1 <= len(splits) <= 4
        bounds = [s.value for s in splits]
        # contiguous disjoint cover of [start, end)
        assert bounds[0][0] == offsets[-1]["pos"]
        assert bounds[-1][1] == end["pos"]
        assert all(
            bounds[k][1] == bounds[k + 1][0] for k in range(len(bounds) - 1)
        )
        rows = [row for s in splits for row in r.read(s)]
        per_batch_rows.append(rows)
        r.commit(end)
        offsets.append(end)
    assert sum(len(b) for b in per_batch_rows) == 100
    assert len(per_batch_rows) == 5
    assert r.partitions(offsets[-1], offsets[-1]) == []  # empty batch

    fresh = _SeqPartStreamReader(n_parts=4, per_batch=20, max_rows=100)
    for k in range(len(per_batch_rows)):
        replay = [
            row
            for s in fresh.partitions(offsets[k], offsets[k + 1])
            for row in fresh.read(s)
        ]
        assert replay == per_batch_rows[k]

    # uneven geometry: per_batch not divisible by n_parts, final batch
    # short — the ceil split must still cover exactly and never emit
    # an empty split
    r7 = _SeqPartStreamReader(n_parts=3, per_batch=7, max_rows=20)
    start = r7.initialOffset()
    seen = []
    while True:
        end = r7.latestOffset()
        if end == start:
            break
        splits = r7.partitions(start, end)
        sizes = [s.value[1] - s.value[0] for s in splits]
        assert all(sz > 0 for sz in sizes) and sum(sizes) == (
            end["pos"] - start["pos"]
        )
        seen += [row for s in splits for row in r7.read(s)]
        start = end
    assert seen == list(_seq_rows_ref(0, 20))


# ---------------------------------------------------------------------------
# Round 15: streaming near-dedup (incremental MinHash/LSH, r14 verdict item 7)
# ---------------------------------------------------------------------------


def _near_dedup_dirs(tmp_path):
    return {
        "shingle_dir": str(tmp_path / "shingles"),
        "bands_dir": str(tmp_path / "bands"),
        "pairs_dir": str(tmp_path / "pairs"),
    }


def test_streaming_near_dedup_matches_batch_pipeline(spark, tmp_path, sf_dir):
    """Batch-twin equality: feed the documents corpus as THREE
    micro-batches and demand the union of emitted pairs equals
    q_llm_near_dedup's pairs on the full corpus — same shingles, same
    band keys, same bucket expansion, same exact-Jaccard threshold, so
    equality pins the incremental BOOKKEEPING (state accumulation,
    touched-bucket restriction, ≥1-new-side filter), not a parallel
    reimplementation. Then two replay shapes: (a) re-running the SAME
    checkpoint with no new files is a no-op; (b) a fresh checkpoint
    over the same feed and surviving state dirs re-derives the
    identical pair set (write-by-batch-id overwrite + set-level
    emission idempotence)."""
    import os

    from micmac_li3ds_spark.operators.llm_text import q_llm_near_dedup
    from micmac_li3ds_spark.streaming import jobs
    from micmac_li3ds_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    feed = tmp_path / "feed"
    feed.mkdir()
    for k in range(3):
        docs.filter(F.pmod("doc_id", F.lit(3)) == k).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(feed / f"b{k}.parquet"))
    # flatten: the file-stream source wants files under one dir
    feed_dir = tmp_path / "feed_flat"
    feed_dir.mkdir()
    n = 0
    for k in range(3):
        for f in sorted(os.listdir(feed / f"b{k}.parquet")):
            if f.endswith(".parquet"):
                os.link(feed / f"b{k}.parquet" / f, feed_dir / f"{k}_{f}")
                n += 1
    assert n == 3

    dirs = _near_dedup_dirs(tmp_path)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed_dir))
    )
    q = jobs.run_streaming_near_dedup(
        stream, checkpoint=str(tmp_path / "ckpt"), **dirs
    )
    q.awaitTermination(300)

    # three micro-batches really happened, each with its own pair log
    batches = sorted(
        d for d in os.listdir(dirs["pairs_dir"]) if d.startswith("batch=")
    )
    assert len(batches) == 3

    got = {
        (r["doc_a"], r["doc_b"], r["jac"])
        for r in jobs.read_near_dedup_pairs(
            spark, dirs["pairs_dir"]
        ).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"], r["jac"])
        for r in q_llm_near_dedup(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0

    # (a) same checkpoint, no new files: a no-op, pair set unchanged
    q2 = jobs.run_streaming_near_dedup(
        stream, checkpoint=str(tmp_path / "ckpt"), **dirs
    )
    q2.awaitTermination(300)
    got2 = {
        (r["doc_a"], r["doc_b"], r["jac"])
        for r in jobs.read_near_dedup_pairs(
            spark, dirs["pairs_dir"]
        ).collect()
    }
    assert got2 == want

    # (b) fresh checkpoint over the same feed + surviving state dirs:
    # every batch replays, overwrites its own subdirectories, and the
    # distinct pair set is bit-identical
    q3 = jobs.run_streaming_near_dedup(
        stream, checkpoint=str(tmp_path / "ckpt2"), **dirs
    )
    q3.awaitTermination(300)
    got3 = {
        (r["doc_a"], r["doc_b"], r["jac"])
        for r in jobs.read_near_dedup_pairs(
            spark, dirs["pairs_dir"]
        ).collect()
    }
    assert got3 == want

    # (c) the monotone cluster snapshot over the accumulated pair log
    # equals the batch cluster assembly (round 15: read_near_dedup_
    # clusters shares the semantic twin's merge-only argument)
    from micmac_li3ds_spark.operators.llm_text import q_llm_dedup_clusters

    got_cl = sorted(
        (r["doc_id"], r["cluster_id"], r["cluster_size"])
        for r in jobs.read_near_dedup_clusters(
            spark, dirs["pairs_dir"]
        ).collect()
    )
    want_cl = sorted(
        (r["doc_id"], r["cluster_id"], r["cluster_size"])
        for r in q_llm_dedup_clusters(spark, sf_dir).collect()
    )
    assert got_cl == want_cl and len(want_cl) > 0


def test_streaming_near_dedup_cross_batch_pairs_found(spark, tmp_path):
    """The incremental property in isolation: two docs that are
    near-duplicates of each other arriving in DIFFERENT micro-batches
    must pair when the second arrives — plus a third batch containing
    an unrelated doc emits nothing new."""
    import os

    from micmac_li3ds_spark.streaming import jobs

    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "the quick brown fox jumps over the lazy dog again and again!"
    c = "completely unrelated text about spark shuffle partitions here"
    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    for k, (did, txt) in enumerate([(1, a), (2, b), (3, c)]):
        spark.createDataFrame(
            [(did, txt)], "doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"tmp{k}")
        )
        src = [
            f
            for f in os.listdir(tmp_path / f"tmp{k}")
            if f.endswith(".parquet")
        ][0]
        os.link(tmp_path / f"tmp{k}" / src, feed_dir / f"{k}.parquet")

    dirs = _near_dedup_dirs(tmp_path)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed_dir))
    )
    q = jobs.run_streaming_near_dedup(
        stream, checkpoint=str(tmp_path / "ckpt"), **dirs
    )
    q.awaitTermination(300)

    pairs = jobs.read_near_dedup_pairs(spark, dirs["pairs_dir"]).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["jac"] >= 0.5


def test_streaming_near_dedup_survives_ineligible_batch(spark, tmp_path):
    """A micro-batch whose docs are ALL too short to shingle (< 3
    tokens) must write empty-but-valid state and emit nothing — and a
    later batch pairing across it must still work. Also covers a
    re-fed doc_id: state stays idempotent (collect_set in the bucket
    expansion) and the pair log reads distinct."""
    import os

    from micmac_li3ds_spark.streaming import jobs

    a = "the quick brown fox jumps over the lazy dog again and again"
    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    batches = [
        [(1, a)],
        [(2, "too short"), (3, "tiny")],  # nothing shingles
        [(4, a + "!"), (1, a)],  # pairs with batch 0 + re-fed doc 1
    ]
    for k, rows in enumerate(batches):
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"tmp{k}")
        )
        src = [
            f
            for f in os.listdir(tmp_path / f"tmp{k}")
            if f.endswith(".parquet")
        ][0]
        os.link(tmp_path / f"tmp{k}" / src, feed_dir / f"{k}.parquet")

    dirs = _near_dedup_dirs(tmp_path)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed_dir))
    )
    q = jobs.run_streaming_near_dedup(
        stream, checkpoint=str(tmp_path / "ckpt"), **dirs
    )
    q.awaitTermination(300)

    assert len(os.listdir(dirs["pairs_dir"])) >= 3  # every batch logged
    pairs = jobs.read_near_dedup_pairs(spark, dirs["pairs_dir"]).collect()
    assert sorted((r["doc_a"], r["doc_b"]) for r in pairs) == [(1, 4)]


# ---------------------------------------------------------------------------
# round 15: incremental SemDeDup — the embedding member of the
# streaming dedup family (exact / lexical-LSH / semantic)
# ---------------------------------------------------------------------------


def _sem_dedup_dirs(tmp_path):
    return {
        "vectors_dir": str(tmp_path / "vectors"),
        "pairs_dir": str(tmp_path / "sem_pairs"),
    }


def _embeddings_feed(spark, tmp_path, sf_dir, n_batches=3):
    """The embeddings corpus split into pmod(vec_id) batches, one
    parquet file per micro-batch (maxFilesPerTrigger=1)."""
    import os

    from micmac_li3ds_spark.tables import load

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    feed_dir = tmp_path / "emb_feed"
    feed_dir.mkdir()
    for k in range(n_batches):
        e.filter(F.pmod("vec_id", F.lit(n_batches)) == k).coalesce(
            1
        ).write.mode("overwrite").parquet(str(tmp_path / f"embtmp{k}"))
        src = [
            f
            for f in os.listdir(tmp_path / f"embtmp{k}")
            if f.endswith(".parquet")
        ][0]
        os.link(tmp_path / f"embtmp{k}" / src, feed_dir / f"{k}.parquet")
    return str(feed_dir)


def _emb_stream(spark, feed_dir):
    from micmac_li3ds_spark.functions.vector import as_double

    return (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
        .select("vec_id", as_double("embedding").alias("v"))
    )


def test_streaming_semantic_dedup_matches_batch_pipeline(
    spark, tmp_path, sf_dir
):
    """A 3-batch embedding feed against fixed centroids must emit
    exactly the batch SemDeDup's verified edge set (4 of the 6 corpus
    edges cross batch boundaries, so the accumulated-state semi-join
    really runs), and the on-demand keeper snapshot must equal
    q_llm_semantic_dedup row for row — streaming ≡ batch for the
    embedding dedup geometry. Re-draining the same checkpoint is a
    no-op; a fresh checkpoint over the surviving state re-derives the
    identical sets (write-by-batch-id idempotence)."""
    import os

    from micmac_li3ds_spark.operators.llm_vector import (
        _emb,
        q_llm_semantic_dedup,
    )

    feed_dir = _embeddings_feed(spark, tmp_path, sf_dir)
    centroids = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    dirs = _sem_dedup_dirs(tmp_path)

    def drain(ckpt):
        q = jobs.run_streaming_semantic_dedup(
            _emb_stream(spark, feed_dir),
            centroids,
            checkpoint=str(tmp_path / ckpt),
            **dirs,
        )
        q.awaitTermination(300)

    drain("ckpt")
    batches = [
        d for d in os.listdir(dirs["pairs_dir"]) if d.startswith("batch=")
    ]
    assert len(batches) == 3

    got_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in jobs.read_semantic_dedup_pairs(
            spark, dirs["pairs_dir"]
        ).collect()
    }
    assert len(got_pairs) == 6
    # the cross-batch edges prove candidates come from ACCUMULATED state
    assert sum(1 for a, b in got_pairs if a % 3 != b % 3) == 4

    got = sorted(
        (r["vec_id"], r["keeper"], r["is_kept"])
        for r in jobs.read_semantic_dedup_keepers(spark, **dirs).collect()
    )
    want = sorted(
        (r["vec_id"], r["keeper"], r["is_kept"])
        for r in q_llm_semantic_dedup(spark, sf_dir).collect()
    )
    assert got == want and len(want) == 500

    # same checkpoint: no new files → a no-op
    drain("ckpt")
    assert {
        (r["doc_a"], r["doc_b"])
        for r in jobs.read_semantic_dedup_pairs(
            spark, dirs["pairs_dir"]
        ).collect()
    } == got_pairs

    # fresh checkpoint: every batch replays idempotently over the
    # surviving state dirs
    drain("ckpt2")
    got3 = sorted(
        (r["vec_id"], r["keeper"], r["is_kept"])
        for r in jobs.read_semantic_dedup_keepers(spark, **dirs).collect()
    )
    assert got3 == want


def test_streaming_semantic_dedup_unrelated_batch_emits_nothing(
    spark, tmp_path, sf_dir
):
    """A second batch whose vectors share no cluster-mates above tau
    with anything seen must append an EMPTY pair log for its batch id
    — per-batch cost is bucket-occupancy work, never an all-pairs
    rescan. Uses tau=1.01 (> any rounded cosine) so no pair can ever
    verify, while assignments still accumulate."""
    import os

    from micmac_li3ds_spark.operators.llm_vector import _emb

    feed_dir = _embeddings_feed(spark, tmp_path, sf_dir, n_batches=2)
    centroids = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    dirs = _sem_dedup_dirs(tmp_path)
    q = jobs.run_streaming_semantic_dedup(
        _emb_stream(spark, feed_dir),
        centroids,
        checkpoint=str(tmp_path / "ckpt"),
        tau=1.01,
        **dirs,
    )
    q.awaitTermination(300)
    assert (
        len(
            [
                d
                for d in os.listdir(dirs["vectors_dir"])
                if d.startswith("batch=")
            ]
        )
        == 2
    )
    assert jobs.read_semantic_dedup_pairs(
        spark, dirs["pairs_dir"]
    ).count() == 0
    # every vector is its own keeper when no edge ever verified
    keep = jobs.read_semantic_dedup_keepers(spark, **dirs).collect()
    assert len(keep) == 500 and all(r["is_kept"] for r in keep)


# ---------------------------------------------------------------------------
# round 15: incremental EXACT dedup against all history
# ---------------------------------------------------------------------------


def test_streaming_exact_dedup_double_import_matches_batch(
    spark, tmp_path, sf_dir
):
    """q_llm_exact_dedup's scenario — the corpus imported twice — fed
    as two micro-batches: the accumulated report (fp, first-seen
    keeper, total copies) must equal the batch query row for row,
    and replay must be idempotent."""
    import os

    from micmac_li3ds_spark.operators.llm_text import q_llm_exact_dedup
    from micmac_li3ds_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    feed_dir = tmp_path / "docs_feed"
    feed_dir.mkdir()
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "docs_once")
    )
    src = [
        f
        for f in os.listdir(tmp_path / "docs_once")
        if f.endswith(".parquet")
    ][0]
    for k in range(2):  # the double import: the same bytes, twice
        os.link(tmp_path / "docs_once" / src, feed_dir / f"{k}.parquet")

    seen_dir = str(tmp_path / "seen")
    dups_dir = str(tmp_path / "dups")

    def drain(ckpt):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(feed_dir))
        )
        q = jobs.run_streaming_exact_dedup(
            stream, seen_dir, dups_dir, checkpoint=str(tmp_path / ckpt)
        )
        q.awaitTermination(300)

    drain("ckpt")
    assert (
        len([d for d in os.listdir(seen_dir) if d.startswith("batch=")])
        == 2
    )

    got = sorted(
        (r["fp"], r["kept_doc_id"], r["n_copies"])
        for r in jobs.read_exact_dedup(spark, seen_dir, dups_dir).collect()
    )
    want = sorted(
        (r["fp"], r["kept_doc_id"], r["n_copies"])
        for r in q_llm_exact_dedup(spark, sf_dir).collect()
    )
    assert got == want and len(want) > 0
    assert all(n == 2 for _fp, _k, n in got)

    # second batch discovered NOTHING new — state size is distinct-docs
    import pyarrow.parquet as pq_  # noqa: N813

    b1 = f"{seen_dir}/batch=1"
    n_b1 = sum(
        pq_.read_table(f"{b1}/{f}").num_rows
        for f in os.listdir(b1)
        if f.endswith(".parquet")
    )
    assert n_b1 == 0

    drain("ckpt")  # no new files: a no-op
    drain("ckpt2")  # full replay over surviving state: idempotent
    got3 = sorted(
        (r["fp"], r["kept_doc_id"], r["n_copies"])
        for r in jobs.read_exact_dedup(spark, seen_dir, dups_dir).collect()
    )
    assert got3 == want


def test_streaming_exact_dedup_first_seen_keeper_semantics(
    spark, tmp_path
):
    """The documented stream-vs-batch divergence, pinned: a SMALLER
    doc_id arriving in a later batch for an already-seen fingerprint
    is a dup (streams cannot retract an emitted keeper) — while a
    same-batch tie still resolves to min(doc_id). Whitespace/case
    variants collapse to one fingerprint; distinct text does not."""
    import os

    feed_dir = tmp_path / "tiny_feed"
    feed_dir.mkdir()
    b0 = spark.createDataFrame(
        [(5, "Hello  World"), (9, "hello world"), (7, "other text")],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(3, "HELLO WORLD"), (2, "brand new")],
        "doc_id long, text string",
    )
    for k, df in enumerate([b0, b1]):
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"tb{k}")
        )
        src = [
            f
            for f in os.listdir(tmp_path / f"tb{k}")
            if f.endswith(".parquet")
        ][0]
        os.link(tmp_path / f"tb{k}" / src, feed_dir / f"{k}.parquet")

    seen_dir = str(tmp_path / "tiny_seen")
    dups_dir = str(tmp_path / "tiny_dups")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed_dir))
    )
    q = jobs.run_streaming_exact_dedup(
        stream, seen_dir, dups_dir, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)

    rep = {
        r["kept_doc_id"]: r["n_copies"]
        for r in jobs.read_exact_dedup(spark, seen_dir, dups_dir).collect()
    }
    # keeper 5 (same-batch min over {5, 9}), NOT 3 (arrived later);
    # "hello world" has 3 copies total; the other two are singletons
    assert rep == {5: 3, 7: 1, 2: 1}

    # WAL-replay erasure regression (code-review r15, reproduced):
    # replaying DISTINCT batches over the surviving state dirs must
    # not let a batch anti-join against its OWN previous output —
    # before the before_batch fix, batch 0's replay saw its old
    # fingerprints as "seen", wrote ZERO state rows, and every
    # first-seen keeper of that batch vanished from the report
    q2 = jobs.run_streaming_exact_dedup(
        stream, seen_dir, dups_dir, checkpoint=str(tmp_path / "ckpt2")
    )
    q2.awaitTermination(300)
    rep2 = {
        r["kept_doc_id"]: r["n_copies"]
        for r in jobs.read_exact_dedup(spark, seen_dir, dups_dir).collect()
    }
    assert rep2 == {5: 3, 7: 1, 2: 1}


def test_streaming_exact_dedup_report_before_first_batch(spark, tmp_path):
    """The report reader must return an EMPTY report, not raise, when
    called before the stream's first batch commits (both state dirs
    absent)."""
    rep = jobs.read_exact_dedup(
        spark, str(tmp_path / "nope_seen"), str(tmp_path / "nope_dups")
    ).collect()
    assert rep == []


def test_streaming_semantic_dedup_refed_vector_idempotent(
    spark, tmp_path, sf_dir
):
    """A later batch RE-FEEDING already-seen vectors must leave the
    distinct pair set and the keeper snapshot unchanged: assignment
    and cosine are deterministic, the bucket expansion collect_sets
    doc ids, and read_semantic_dedup_pairs reads distinct — the
    documented re-fed contract, pinned."""
    import os

    from micmac_li3ds_spark.operators.llm_vector import _emb
    from micmac_li3ds_spark.tables import load

    feed_dir = _embeddings_feed(spark, tmp_path, sf_dir)
    # append a 4th file re-feeding the pmod-0 slice verbatim
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    e.filter(F.pmod("vec_id", F.lit(3)) == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "refed"))
    src = [
        f for f in os.listdir(tmp_path / "refed") if f.endswith(".parquet")
    ][0]
    os.link(tmp_path / "refed" / src, f"{feed_dir}/3_refed.parquet")

    centroids = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    dirs = _sem_dedup_dirs(tmp_path)
    q = jobs.run_streaming_semantic_dedup(
        _emb_stream(spark, feed_dir),
        centroids,
        checkpoint=str(tmp_path / "ckpt"),
        **dirs,
    )
    q.awaitTermination(300)
    assert (
        len(
            [
                d
                for d in os.listdir(dirs["pairs_dir"])
                if d.startswith("batch=")
            ]
        )
        == 4
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in jobs.read_semantic_dedup_pairs(
            spark, dirs["pairs_dir"]
        ).collect()
    }
    assert len(pairs) == 6  # identical to the 3-batch feed's set
    keep = jobs.read_semantic_dedup_keepers(spark, **dirs).collect()
    assert len(keep) == 500  # re-fed vec_ids collapse in the snapshot


def test_streaming_exact_dedup_random_feeds_differential():
    """Hypothesis differential: random document multisets split into
    random micro-batches must always produce the reference first-seen
    report (computed by a 15-line python fold) — duplicates within a
    batch, across batches, and across re-feeds included."""
    import hashlib
    import re

    from hypothesis import HealthCheck, given, settings, strategies as st

    texts = st.sampled_from(
        ["alpha beta", "Alpha  Beta", "gamma", "delta delta", "  gamma "]
    )

    @st.composite
    def feeds(draw):
        n = draw(st.integers(1, 10))
        docs = [
            (draw(st.integers(0, 20)), draw(texts)) for _ in range(n)
        ]
        cuts = sorted(
            draw(
                st.lists(
                    st.integers(0, n), min_size=0, max_size=3
                )
            )
        )
        batches, prev = [], 0
        for c in cuts + [n]:
            if c > prev:
                batches.append(docs[prev:c])
                prev = c
        return batches or [docs]

    def norm_fp(text):
        return hashlib.sha256(
            re.sub(" +", " ", text).strip().lower().encode()
        ).hexdigest()

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(feeds())
    def inner(batches):
        import tempfile

        from micmac_li3ds_spark.session import get_spark

        spark = get_spark("tests", cpus=4, shuffle_partitions=8)
        with tempfile.TemporaryDirectory() as td:
            seen_dir, dups_dir = f"{td}/seen", f"{td}/dups"
            # reference fold: first-seen keeper (same-batch ties: min),
            # n_copies counts every arrival
            ref = {}
            for batch in batches:
                newly = {}
                for doc_id, text in batch:
                    fp = norm_fp(text)
                    if fp in ref:
                        ref[fp][1] += 1
                    elif fp in newly:
                        newly[fp][0] = min(newly[fp][0], doc_id)
                        newly[fp][1] += 1
                    else:
                        newly[fp] = [doc_id, 1]
                ref.update(newly)
            # drive the real job batch by batch via one-file triggers
            import os

            feed = f"{td}/feed"
            os.makedirs(feed)
            for k, batch in enumerate(batches):
                spark.createDataFrame(
                    batch, "doc_id long, text string"
                ).coalesce(1).write.mode("overwrite").parquet(
                    f"{td}/b{k}"
                )
                src = [
                    f
                    for f in os.listdir(f"{td}/b{k}")
                    if f.endswith(".parquet")
                ][0]
                os.link(f"{td}/b{k}/{src}", f"{feed}/{k}.parquet")
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(feed)
            )
            q = jobs.run_streaming_exact_dedup(
                stream, seen_dir, dups_dir, checkpoint=f"{td}/ckpt"
            )
            q.awaitTermination(300)
            got = {
                r["fp"]: (r["kept_doc_id"], r["n_copies"])
                for r in jobs.read_exact_dedup(
                    spark, seen_dir, dups_dir
                ).collect()
            }
            assert got == {fp: tuple(v) for fp, v in ref.items()}

    inner()


# ---------------------------------------------------------------------------
# round 15: continuous decode + feature-extract over a MIXED media lake
# ---------------------------------------------------------------------------


def test_streaming_feature_extract_mixed_lake(spark, tmp_path):
    """Seven formats in one lake directory, fed across micro-batches:
    the accumulated feature log must equal the batch feature_extract
    with the mime-dispatching decode_auto over the same items — the
    real decoders (BMP, PPM, WAV, PNG, GIF, AIFF, TIFF) behind one
    scan. Also pins filename→mime stamping and by-batch idempotence
    (fresh-checkpoint replay)."""
    import os

    import pyarrow.parquet as pq_

    from micmac_li3ds_spark.operators.multimodal import (
        decode_auto,
        feature_extract,
    )
    from micmac_li3ds_spark.streaming import jobs

    fams = {
        "bmp": "bmp",
        "ppm": "ppm",
        "wav": "wav",
        "png": "png",
        "gif": "gif",
        "aiff": "aiff",
        "tiff": "tif",  # exercise the short-extension alias
    }
    from micmac_li3ds_spark.operators import multimodal as mm

    lake = tmp_path / "mixed_lake"
    lake.mkdir()
    picked = []
    for fam, ext in fams.items():
        rows = pq_.read_table(
            os.path.join(mm._REPO, "fixtures", "parquet",
                         f"media_{fam}.parquet"),
            columns=["media_id", "mime", "payload"],
        ).to_pylist()[:3]
        for r in rows:
            (lake / f"{r['media_id']}.{ext}").write_bytes(
                bytes(r["payload"])
            )
        picked.extend(rows)

    features_dir = str(tmp_path / "features")

    def drain(ckpt):
        stream = (
            spark.readStream.format("binaryFile")
            .schema(jobs.read_media_file_stream(spark, str(lake)).schema)
            .option("maxFilesPerTrigger", 8)
            .load(str(lake))
        )
        q = jobs.run_streaming_feature_extract(
            stream, features_dir, checkpoint=str(tmp_path / ckpt)
        )
        q.awaitTermination(300)

    drain("ckpt")
    batches = [
        d for d in os.listdir(features_dir) if d.startswith("batch=")
    ]
    assert len(batches) >= 2  # 21 files at 8 per trigger

    media = spark.createDataFrame(
        [
            (r["media_id"], r["mime"], bytes(r["payload"]))
            for r in picked
        ],
        "media_id long, mime string, payload binary",
    )
    want = sorted(
        tuple(r)
        for r in feature_extract(
            media, decode=decode_auto, decoder_name="auto-dispatch-v1"
        ).collect()
    )
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(features_dir)
        .drop("batch")
        .collect()
    )
    assert got == want and len(want) == 21

    drain("ckpt2")  # full replay, idempotent by batch id
    got2 = sorted(
        tuple(r)
        for r in spark.read.parquet(features_dir).drop("batch").collect()
    )
    assert got2 == want


def test_streaming_feature_extract_unknown_extension_fails_loudly(
    spark, tmp_path
):
    """A file with an unmapped extension must FAIL the batch (named
    error), not silently stub its features."""
    from py4j.protocol import Py4JJavaError

    from micmac_li3ds_spark.streaming import jobs

    lake = tmp_path / "bad_lake"
    lake.mkdir()
    (lake / "1234.xyz").write_bytes(b"whatever")
    stream = (
        spark.readStream.format("binaryFile")
        .schema(jobs.read_media_file_stream(spark, str(lake)).schema)
        .load(str(lake))
    )
    q = jobs.run_streaming_feature_extract(
        stream,
        str(tmp_path / "feat"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    with pytest.raises(
        (Py4JJavaError, Exception), match="unknown media extension"
    ):
        q.awaitTermination(300)
        raise AssertionError("stream should have failed")


def test_streaming_state_readers_empty_before_first_batch(spark, tmp_path):
    """EVERY accumulated-state reader must return an empty result —
    never raise — when called before its stream's first batch commits
    (the monitoring-job race, code-review r15): absent dirs read as
    declared-schema empties."""
    d = str(tmp_path / "absent")
    assert jobs.read_near_dedup_pairs(spark, d).collect() == []
    assert jobs.read_near_dedup_clusters(spark, d).collect() == []
    assert jobs.read_semantic_dedup_pairs(spark, d).collect() == []
    assert (
        jobs.read_semantic_dedup_keepers(
            spark, vectors_dir=d, pairs_dir=d
        ).collect()
        == []
    )
    assert jobs.read_frame_sample_log(spark, d).collect() == []
    assert jobs.read_exact_dedup(spark, d, d).collect() == []
