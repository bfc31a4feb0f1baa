"""Corpus-encoding resilience (the round-4 incident, fenced).

The driver regenerates /root/testdata between rounds and has already
shipped ``events.ts`` in two physical parquet encodings: timestamp[ns]
(Spark 4 reads it only as long via the legacy nanos-as-long conf) and
timestamp[us] (read natively as TIMESTAMP_NTZ). ``tables.load`` and the
file-stream source must normalize EVERY vintage to session-tz
TimestampType with identical values, or every events-reading query goes
red at once — as happened in CORRECTNESS_r04.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql.types import TimestampType

from micmac_li3ds_spark.tables import load

_ROWS = [
    # (event_id, epoch_us, user_id, event_type, value, props)
    (1, 1_700_000_000_000_000, 10, "click", 1.5, "{}"),
    (2, 1_700_000_000_123_456, 11, "view", 2.5, "{}"),
    (3, 1_700_003_600_000_001, 10, "purchase", 3.5, "{}"),
]


def _write_events(dirpath, ts_unit: str) -> str:
    ids, us, users, types, values, props = zip(*_ROWS)
    if ts_unit == "ns":
        ts = pa.array([u * 1000 for u in us], type=pa.timestamp("ns"))
    else:
        ts = pa.array(list(us), type=pa.timestamp("us"))
    table = pa.table(
        {
            "event_id": pa.array(ids, type=pa.int64()),
            "ts": ts,
            "user_id": pa.array(users, type=pa.int64()),
            "event_type": pa.array(types, type=pa.string()),
            "value": pa.array(values, type=pa.float64()),
            "props": pa.array(props, type=pa.string()),
        }
    )
    pq.write_table(table, str(dirpath / "events.parquet"))
    return str(dirpath)


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_load_normalizes_both_ts_encodings(spark, tmp_path, unit):
    (tmp_path / unit).mkdir(exist_ok=True)
    sf = _write_events(tmp_path / unit, ts_unit=unit)
    df = load(spark, sf, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = {(r.event_id, r.ts) for r in df.select("event_id", "ts").collect()}
    want = {
        (i, datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=u))
        for i, u, *_ in _ROWS
    }
    assert got == want


def test_stream_source_matches_batch_load(spark, tmp_path):
    """The streaming reader must agree with the batch loader row-for-row
    for the current corpus encoding (batch ≡ stream on ts itself)."""
    from micmac_li3ds_spark.streaming import jobs

    for unit in ("ns", "us"):
        d = tmp_path / f"s_{unit}"
        d.mkdir()
        sf = _write_events(d, ts_unit=unit)
        batch = {
            tuple(r)
            for r in load(spark, sf, "events").select("event_id", "ts").collect()
        }
        q = (
            jobs.read_events_stream(spark, sf)
            .select("event_id", "ts")
            .writeStream.format("memory")
            .queryName(f"t_enc_{unit}")
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        streamed = {
            tuple(r)
            for r in spark.sql(f"SELECT * FROM t_enc_{unit}").collect()
        }
        assert streamed == batch
