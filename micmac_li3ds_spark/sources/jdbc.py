"""JDBC source surface (SURVEY.md §2.1 — the reference's database side).

The reference's ETL parses photogrammetry files and loads the rows into
a relational schema through database bindings; in this engine that
surface is Spark's built-in JDBC data source, wrapped so every call
site states the scale-relevant knobs explicitly. Everything here is
exercised END-TO-END against embedded Apache Derby (the ``derby-*.jar``
set ships inside Spark itself, so no external service is required):
the tests and the registered ``q_jdbc_roundtrip`` query run the real
``format("jdbc")`` read/write path, not a mock.

100 TB notes:

* A JDBC read with no partitioning options is ONE task dragging the
  whole table through one connection — ``read_table`` therefore takes
  ``partition_column/lower_bound/upper_bound/num_partitions`` (range
  splits, one connection per partition) or ``predicates`` (one
  connection per predicate) as first-class arguments.
* ``fetchsize`` (read) and ``batchsize`` (write) are the two knobs that
  dominate JDBC throughput; both default low in most drivers.
* Filters on a JDBC relation are pushed into the remote WHERE clause by
  Catalyst (JDBCRelation PushedFilters) — verified in tests.
* DDL/MERGE orchestration (``execute``) is deliberately driver-side and
  single-connection: schema changes and merges are coordination, not
  data movement; rows always move through executor connections.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class JdbcConfig:
    """Connection descriptor shared by reads, writes, and driver-side SQL."""

    url: str
    driver: Optional[str] = None
    user: Optional[str] = None
    password: Optional[str] = None
    #: extra spark JDBC options applied to every read/write (fetchsize, …)
    options: dict = field(default_factory=dict)

    def spark_options(self, **extra: str) -> dict:
        out = {"url": self.url}
        if self.driver:
            out["driver"] = self.driver
        if self.user:
            out["user"] = self.user
        if self.password:
            out["password"] = self.password
        out.update(self.options)
        out.update({k: str(v) for k, v in extra.items() if v is not None})
        return out


def derby_config(db_dir: str) -> JdbcConfig:
    """Embedded-Derby config rooted at ``db_dir`` (created on first use).

    Derby embedded runs inside the Spark JVM — the test/dev stand-in for
    a networked warehouse; swap the URL/driver for postgres etc. in
    production, nothing else changes.
    """
    return JdbcConfig(
        url=f"jdbc:derby:{os.path.abspath(db_dir)};create=true",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )


def postgres_config(
    url: Optional[str] = None,
    user: Optional[str] = None,
    password: Optional[str] = None,
) -> JdbcConfig:
    """PostgreSQL config — the networked-warehouse twin of
    ``derby_config`` (the reference's real target engine). Defaults come
    from the ``SPARK_GRAFT_PG_URL`` / ``SPARK_GRAFT_PG_USER`` /
    ``SPARK_GRAFT_PG_PASSWORD`` environment variables so the
    execute-or-skip probe (tests/test_connector_probe.py) runs the
    identical staging+MERGE code path the moment a reachable database
    is configured; nothing else in the engine changes between Derby and
    Postgres — that swap being config-only is the design point."""
    return JdbcConfig(
        url=url or os.environ.get(
            "SPARK_GRAFT_PG_URL", "jdbc:postgresql://localhost:5432/postgres"
        ),
        driver="org.postgresql.Driver",
        user=user or os.environ.get("SPARK_GRAFT_PG_USER"),
        password=password or os.environ.get("SPARK_GRAFT_PG_PASSWORD"),
    )


def read_table(
    spark: SparkSession,
    cfg: JdbcConfig,
    table: str,
    *,
    partition_column: Optional[str] = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: Optional[int] = None,
    predicates: Optional[Sequence[str]] = None,
    fetchsize: int = 10_000,
) -> DataFrame:
    """Read a JDBC table, parallelized by range split or predicate list.

    ``partition_column`` must be numeric/date; bounds only steer the
    split points (rows outside land in the first/last partition — no
    filtering happens), so approximate bounds are safe.
    """
    if predicates is not None:
        props = {
            k: v for k, v in cfg.spark_options(fetchsize=fetchsize).items() if k != "url"
        }
        return spark.read.jdbc(cfg.url, table, predicates=list(predicates), properties=props)
    reader = spark.read.format("jdbc").options(
        **cfg.spark_options(dbtable=table, fetchsize=fetchsize)
    )
    if partition_column is not None:
        reader = reader.options(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions or 8),
        )
    return reader.load()


def read_query(spark: SparkSession, cfg: JdbcConfig, query: str) -> DataFrame:
    """Push an entire SQL text to the remote engine (``query`` option) —
    remote pre-aggregation beats shipping raw rows when the remote is a
    real warehouse."""
    return spark.read.format("jdbc").options(**cfg.spark_options(query=query)).load()


def execute(spark: SparkSession, cfg: JdbcConfig, *statements: str) -> None:
    """Run DDL/DML statements on one driver-side connection (py4j →
    ``java.sql.DriverManager``). Used for CREATE/DROP/MERGE around the
    executor-parallel data path."""
    jvm = spark._jvm
    props = jvm.java.util.Properties()
    if cfg.user:
        props.setProperty("user", cfg.user)
    if cfg.password:
        props.setProperty("password", cfg.password)
    conn = jvm.java.sql.DriverManager.getConnection(cfg.url, props)
    try:
        st = conn.createStatement()
        try:
            for sql in statements:
                st.execute(sql)
        finally:
            st.close()
    finally:
        conn.close()


def table_exists(spark: SparkSession, cfg: JdbcConfig, table: str) -> bool:
    """Dialect-generic existence probe (the same trick Spark's writer
    uses): run a zero-row SELECT against the name and catch the failure.
    Table names are passed verbatim — like Spark's ``dbtable`` — so each
    engine applies its own case normalization consistently on both the
    write and the probe.

    Only a missing-table failure maps to False: SQLState 42* is the
    standard syntax-error-or-access-rule-violation class every dialect
    uses for unknown relations (Derby 42X05, PostgreSQL 42P01, MySQL
    42S02). Anything else — connection refused, auth failure, missing
    driver — re-raises unchanged, so callers see the real connectivity
    problem instead of a misleading CREATE TABLE attempt downstream."""
    from py4j.protocol import Py4JJavaError

    try:
        execute(spark, cfg, f"SELECT 1 FROM {table} WHERE 1=0")
        return True
    except Py4JJavaError as e:
        j = e.java_exception
        # walk the cause chain: drivers differ in how deeply they wrap
        # the SQLException carrying the state
        while j is not None:
            try:
                state = j.getSQLState()
            except Exception:  # not an SQLException — keep walking
                state = None
            if state is not None and str(state).startswith("42"):
                return False
            j = j.getCause()
        raise
