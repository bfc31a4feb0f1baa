"""Per-round connector availability probes (round-6 verdict task 6).

The Kafka (``spark-sql-kafka-0-10``) and Avro (``spark-avro``) connector
jars are optional Spark distribution pieces that this container does not
ship. Policy: NO stubs — each probe EXECUTES a real round-trip the moment
the jar appears on the classpath, and skips with an explicit reason while
it is absent. Re-run every round; if an environment update lands the
jars, these tests silently upgrade from skip to executed coverage.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def _data_source_available(spark, fmt: str) -> bool:
    try:
        spark.read.format(fmt).load("/nonexistent-probe-path")
    except AnalysisException as e:
        msg = str(e)
        if "Failed to find data source" in msg or "FAILED_TO_LOAD" in msg:
            return False
        return True  # source resolved; the path error proves the jar loads
    except Exception:
        return True
    return True


def test_kafka_connector_roundtrip_or_skip(spark):
    if not _data_source_available(spark, "kafka"):
        pytest.skip(
            "spark-sql-kafka-0-10 jar absent from this environment; the "
            "builder + wire-format chains stay covered by "
            "tests/test_streaming.py batch twins"
        )
    # jar present: prove the reader builder resolves the source for real
    # (no broker needed — resolution is the env-blocked step)
    from micmac_li3ds_spark.streaming import kafka

    r = kafka.kafka_reader(spark, "localhost:9092", "probe_topic")
    assert r is not None


def test_avro_roundtrip_or_skip(spark, tmp_path):
    if not _data_source_available(spark, "avro"):
        pytest.skip(
            "spark-avro jar absent from this environment; parquet/ORC/"
            "CSV/JSON sinks remain the value-checked interchange paths"
        )
    # jar present: execute a full write/read value round-trip
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("s"),
    )
    path = str(tmp_path / "probe_avro")
    df.write.format("avro").mode("overwrite").save(path)
    back = spark.read.format("avro").load(path)
    assert back.count() == 100
    assert back.exceptAll(df).count() == 0


def _jvm_class_available(spark, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)
        return True
    except Exception:
        return False


def test_postgres_upsert_or_skip(spark):
    """Execute-or-skip probe for the reference's REAL database target:
    when a PostgreSQL driver jar is on the classpath AND a reachable
    database is configured (SPARK_GRAFT_PG_URL, default localhost:5432),
    run the IDENTICAL staging+MERGE upsert code path the Derby tests
    prove (sources/sinks.py JdbcUpsertSink) — no Postgres-specific
    branch exists to test, which is the point. Skips name the exact
    missing piece so an environment upgrade silently turns this into
    executed coverage (the Kafka/Avro probe policy)."""
    from py4j.protocol import Py4JJavaError

    from micmac_li3ds_spark.sources.jdbc import execute, postgres_config
    from micmac_li3ds_spark.sources.sinks import JdbcUpsertSink

    if not _jvm_class_available(spark, "org.postgresql.Driver"):
        pytest.skip(
            "postgresql JDBC driver jar absent from this environment; "
            "the staging+MERGE upsert stays proven against embedded "
            "Derby (tests/test_jdbc.py) and merge_sql generation is "
            "ANSI (Derby/Postgres-15+/Oracle/SQL-Server)"
        )
    cfg = postgres_config()
    try:
        execute(spark, cfg, "DROP TABLE IF EXISTS sg_probe_upsert")
    except Py4JJavaError as e:
        pytest.skip(f"no reachable PostgreSQL at {cfg.url}: {e}")
    try:
        execute(spark, cfg, "DROP TABLE IF EXISTS sg_probe_upsert_stage")
        sink = JdbcUpsertSink(cfg, "sg_probe_upsert", ["k"])
        df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
        sink.upsert(df1)
        # second call updates k=2, inserts k=3 — MERGE idempotence
        df2 = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
        sink.upsert(df2)
        sink.upsert(df2)  # replay converges (exactly-once contract)
        back = (
            spark.read.format("jdbc")
            .options(**cfg.spark_options(dbtable="sg_probe_upsert"))
            .load()
        )
        got = {(r["k"], r["v"]) for r in back.collect()}
        assert got == {(1, "a"), (2, "B"), (3, "c")}
    finally:
        for t in ("sg_probe_upsert", "sg_probe_upsert_stage"):
            try:
                execute(spark, cfg, f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass


def test_pil_decode_or_skip(spark):
    """Execute-or-skip probe for the multimodal codec seam: the moment
    this environment gains PIL, a REAL png decode runs through the
    IDENTICAL mapInPandas plumbing q_mm_feature_extract uses with the
    stub (operators/multimodal.py feature_extract) — proving the
    schema/batching contract holds for a real codec, not just the
    deterministic fake. Skips while the library is absent."""
    try:
        import io

        from PIL import Image
    except ImportError:
        pytest.skip(
            "PIL absent from this environment; q_mm_feature_extract's "
            "mapInPandas plumbing stays value-checked via the "
            "deterministic stub decoder (hash-algebra oracle)"
        )
    from micmac_li3ds_spark.operators.multimodal import (
        _decode_pil_image,
        feature_extract,
    )

    # synthesize a real 16x4 gradient PNG per row, decode distributedly
    rows = []
    for media_id in range(4):
        img = Image.new("L", (16, 4))
        img.putdata([(media_id * 37 + x) % 256 for x in range(64)])
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        rows.append((media_id, "image/png", bytearray(buf.getvalue())))
    media = spark.createDataFrame(
        rows, "media_id long, mime string, payload binary"
    )
    out = feature_extract(
        media, decode=_decode_pil_image, decoder_name="pil-v1"
    ).collect()
    assert len(out) == 4
    for r in out:
        assert r["decoder"] == "pil-v1"
        feats = [r[f"f{i}"] for i in range(8)]
        assert all(0.0 <= f <= 1.0 for f in feats)
    # decode must be content-sensitive: different images, different features
    assert len({tuple(round(r[f"f{i}"], 9) for i in range(8)) for r in out}) == 4
