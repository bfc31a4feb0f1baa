"""JDBC source/sink against embedded Derby (SURVEY.md §2.1).

Derby's jars ship inside Spark itself, so these tests run the REAL
``format("jdbc")`` read and write paths — connection handling, dialect
DDL, batch inserts, range-partitioned parallel reads, remote filter
pushdown, and the staging+MERGE exactly-once upsert — with no external
service and no mocks.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from micmac_li3ds_spark.sources import (
    JdbcUpsertSink,
    derby_config,
    execute,
    merge_sql,
    read_query,
    read_table,
    table_exists,
    write_jdbc,
)
from micmac_li3ds_spark.tables import load


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    return derby_config(str(tmp_path_factory.mktemp("derby") / "db"))


def test_write_read_roundtrip_exact(spark, sf_dir, db):
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    write_jdbc(
        c, db, "cust_rt", mode="overwrite",
        create_table_column_types="c_name VARCHAR(32)",
    )
    back = read_table(spark, db, "cust_rt")
    orig = sorted(map(tuple, c.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == orig  # doubles are IEEE-exact through Derby


def test_partitioned_read_splits_and_preserves_rows(spark, sf_dir, db):
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    write_jdbc(c, db, "cust_part", mode="overwrite")
    back = read_table(
        spark, db, "cust_part",
        partition_column="c_custkey", lower_bound=1, upper_bound=10_000,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == c.count()
    assert back.agg(F.sum("c_custkey")).first()[0] == c.agg(F.sum("c_custkey")).first()[0]


def test_filter_pushed_to_remote_engine(spark, sf_dir, db):
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    write_jdbc(c, db, "cust_push", mode="overwrite")
    back = read_table(spark, db, "cust_push").filter(F.col("c_custkey") <= 50)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "c_custkey" in plan
    assert back.count() == c.filter(F.col("c_custkey") <= 50).count()


def test_predicate_partitioned_read(spark, sf_dir, db):
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    write_jdbc(
        c, db, "cust_pred", mode="overwrite",
        create_table_column_types="c_mktsegment VARCHAR(16)",
    )
    back = read_table(
        spark, db, "cust_pred",
        predicates=['MOD("c_custkey", 2) = 0', 'MOD("c_custkey", 2) = 1'],
    )
    assert back.rdd.getNumPartitions() == 2
    assert back.count() == c.count()


def test_read_query_remote_aggregation(spark, sf_dir, db):
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    write_jdbc(c, db, "cust_q", mode="overwrite")
    got = read_query(
        spark, db,
        'SELECT COUNT(*) AS "n", SUM("c_custkey") AS "s" FROM cust_q',
    ).first()
    assert (got["n"], got["s"]) == (
        c.count(), c.agg(F.sum("c_custkey")).first()[0],
    )


def test_merge_sql_text():
    sql = merge_sql("tgt", "stg", ["k"], ["k", "a", "b"])
    assert sql == (
        'MERGE INTO tgt t USING stg s ON t."k" = s."k"'
        ' WHEN MATCHED THEN UPDATE SET t."a" = s."a", t."b" = s."b"'
        ' WHEN NOT MATCHED THEN INSERT ("k", "a", "b")'
        ' VALUES (s."k", s."a", s."b")'
    )
    # all-key rows: no MATCHED branch (nothing to update)
    assert "MATCHED THEN UPDATE" not in merge_sql("t", "s", ["k"], ["k"])


def test_upsert_sink_idempotent_and_converging(spark, db):
    sink = JdbcUpsertSink(db, "totals", ["uid"])
    b1 = spark.createDataFrame([Row(uid=1, total=10.0), Row(uid=2, total=20.0)])
    b2 = spark.createDataFrame([Row(uid=2, total=25.0), Row(uid=3, total=30.0)])

    sink(b1, 0)
    sink(b1, 0)  # replayed micro-batch: must converge, not duplicate
    got = {r["uid"]: r["total"] for r in read_table(spark, db, "totals").collect()}
    assert got == {1: 10.0, 2: 20.0}

    sink(b2, 1)  # updates uid=2, inserts uid=3
    got = {r["uid"]: r["total"] for r in read_table(spark, db, "totals").collect()}
    assert got == {1: 10.0, 2: 25.0, 3: 30.0}
    assert table_exists(spark, db, "totals")
    assert table_exists(spark, db, "totals_stage")


def test_streaming_foreach_batch_jdbc_upsert(spark, sf_dir, db):
    """The north-star path: file stream → foreachBatch → JDBC MERGE.
    Final table state must equal the batch aggregate of the whole
    corpus, across however many micro-batches ran."""
    from micmac_li3ds_spark.streaming import jobs

    ckpt = tempfile.mkdtemp(prefix="jdbc_ckpt_")
    try:
        stream = jobs.read_events_stream(spark, sf_dir)
        per_user = stream.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events")
        )
        sink = JdbcUpsertSink(db, "user_counts", ["user_id"])
        q = (
            per_user.writeStream.foreachBatch(sink)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        expected = {
            r["user_id"]: r["n_events"]
            for r in load(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .collect()
        }
        got = {
            r["user_id"]: r["n_events"]
            for r in read_table(spark, db, "user_counts").collect()
        }
        assert got == expected
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def test_execute_ddl_and_exists_probe(spark, db):
    assert not table_exists(spark, db, "ddl_probe")
    execute(spark, db, 'CREATE TABLE ddl_probe ("x" INT)')
    assert table_exists(spark, db, "ddl_probe")
    execute(spark, db, "DROP TABLE ddl_probe")
    assert not table_exists(spark, db, "ddl_probe")


def test_exists_probe_reraises_connectivity_errors(spark, db):
    """A connection-level failure (here: Derby database that does not
    exist and is not being created) must RAISE, not read as 'table
    absent' — otherwise an upsert sink would mask an outage behind a
    misleading CREATE TABLE error (ADVICE r2). Derby signals it with
    SQLState XJ004, outside the 42* unknown-relation class."""
    from py4j.protocol import Py4JJavaError

    from micmac_li3ds_spark.sources.jdbc import JdbcConfig

    bad = JdbcConfig(url="jdbc:derby:/nonexistent/path/nodb")
    with pytest.raises(Py4JJavaError):
        table_exists(spark, bad, "any_table")
