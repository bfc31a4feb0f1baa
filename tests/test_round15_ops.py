"""Round-15 tests.

Round 15 is the sixth consolidation round (48 forced window keys + the
two ledgered slots: q_llm_dedup_keep_best and q_scan_python_datasource).
The code work tested here:

- ADVICE r14 #1 (low): the sidx seek's lower-bound skip tested the
  fragment's LAST TICK (rt + rdur - 1), which is exact only when
  sample pts sit ON sidx ticks. §8.16.3 lets the sidx carry its own
  (possibly coarser) timescale than the track, and a sample presented
  strictly between ticks rt+rdur-1 and rt+rdur can floor into the
  requested window while the last-tick test rejects its fragment —
  silently dropping an in-range keyframe. Fixed with the
  timescale-agnostic exclusive-end test (rt + rdur)·1000 ≤ lo·ts,
  which keeps at most one extra (downstream-filtered) fragment when
  timescales match and never drops one when they differ.
- ADVICE r14 #2 (low): replay_dead_letters hard-coded `_corrupt` as
  the from_json corrupt-record column — an amended schema that
  legitimately declares `_corrupt` would have its field data routed
  into the classification column; and a NULL raw_line made from_json
  return a NULL struct whose NULL corrupt field classified the row as
  "recovered", appending an all-NULL row to the clean table. Fixed:
  collision-free column name (grow underscores until free) and
  raw_line IS NOT NULL in the recovered predicate.
"""

from __future__ import annotations

import json

import pytest

from tests.test_round11_ops import _genfix


# ---------------------------------------------------------------------------
# ADVICE r14 #1: mixed sidx/track timescales — between-tick samples
# ---------------------------------------------------------------------------


def test_mp4_sidx_seek_mixed_timescale_keeps_between_tick_sample():
    """The ADVICE repro: track timescale 1000 (pts are ms), sidx
    timescale 10 (1 tick = 100 ms — coarser, as §8.16.3 permits).
    Fragment 0 holds keyframes at pts 0 and 250 ms (durations
    [250, 50] → 300 ms = 3 sidx ticks exactly); fragment 1 starts at
    300 ms. For the window [250, 260]:

      last-tick test (r14 code): (rt+rdur-1)·1000 = 2000 < lo·ts =
      2500 → fragment 0 SKIPPED, losing the in-range keyframe at
      250 ms (it sits between sidx ticks 2 and 3);
      exclusive-end test (this round): (rt+rdur)·1000 = 3000 ≤ 2500
      is false → fragment 0 kept, sample found.

    Fragment 1 (rt = 3 ticks: 3000 ≥ (260+1)·10) stays skipped by the
    untouched upper bound."""
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    payload, offs, ts_ms, kf, pts_ms, frs = gf._mp4_encode_fragmented(
        [[b"\x11" * 24, b"\x22" * 24], [b"\x33" * 24]],
        1000,
        300,
        [[True, True], [True]],
        dur_overrides=[[250, 50], [300]],
        sidx=True,
        sidx_timescale=10,
    )
    full = _mp4_sample_index(payload)
    assert [s[4] for s in full] == [0, 250, 300]

    got = _mp4_sample_index(payload, time_range_ms=(250, 260))
    assert full[1] in got, (
        "seek dropped a between-tick in-range keyframe under a coarser "
        "sidx timescale"
    )
    # fragment 1 (out of range) stays skipped; fragment 0's other
    # sample rides along and is discarded by the downstream pts filter
    assert got == full[:2]
    # subset + pts-filter equality across windows sweeping the corner
    full_set = set(full)
    for lo, hi in [(0, 99), (0, 249), (100, 250), (250, 299), (300, 400)]:
        got = _mp4_sample_index(payload, time_range_ms=(lo, hi))
        assert all(s in full_set for s in got)
        want = [s for s in full if lo <= s[4] <= hi]
        assert sorted(s for s in got if lo <= s[4] <= hi) == sorted(want)


def test_mp4_sidx_seek_matching_timescale_results_unchanged():
    """Result-invariance of the r15 predicate on MATCHING timescales
    (what every committed fixture row and the r14 driver hash for
    q_mm_frame_sample_range exercise): the exclusive-end test keeps a
    superset of the last-tick test's fragments, and the per-sample pts
    filter makes the outputs identical — re-assert the r14 repro's
    exact expectations still hold."""
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    payload, offs, ts_ms, kf, pts_ms, frs = gf._mp4_encode_fragmented(
        [[b"\x11" * 24], [b"\x22" * 24]],
        30000,
        30000,
        [[True], [True]],
        dur_overrides=[[30000], [1]],
        sidx=True,
    )
    full = _mp4_sample_index(payload)
    assert _mp4_sample_index(payload, time_range_ms=(1000, 1000)) == [full[1]]
    assert _mp4_sample_index(payload, time_range_ms=(0, 999)) == [full[0]]


# ---------------------------------------------------------------------------
# ADVICE r14 #2: replay_dead_letters corrupt-column collision + NULL lines
# ---------------------------------------------------------------------------


def _write_dlq(spark, tmp_path, lines):
    import pyspark.sql.functions as F

    dlq = str(tmp_path / "dlq")
    (
        spark.createDataFrame(
            [(ln, 0) for ln in lines], "raw_line string, batch_id int"
        )
        .withColumn("ingest_ts", F.current_timestamp())
        .write.mode("overwrite")
        .parquet(dlq)
    )
    return dlq


def test_replay_dead_letters_schema_with_corrupt_field(spark, tmp_path):
    """An amended schema that legitimately declares a `_corrupt` field
    (producers own their field names) must have that field parsed as
    DATA — not hijacked as the classification column. Before the fix,
    from_json routed malformed-record text into the declared
    `_corrupt` field and classified on it, so a well-formed line whose
    `_corrupt` field was non-null looked dead and a malformed line
    carrying no `_corrupt` key looked recovered."""
    import pyspark.sql.types as T

    from micmac_li3ds_spark.streaming.jobs import replay_dead_letters

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    good = json.dumps({"user_id": 1, "_corrupt": "producer-data"})
    bad = '{"user_id": not-json'
    dlq = _write_dlq(spark, tmp_path, [good, bad])

    recovered, still_dead = replay_dead_letters(spark, dlq, schema)
    rec = [tuple(r) for r in recovered.collect()]
    assert rec == [(1, "producer-data")], (
        "declared _corrupt field must round-trip as data"
    )
    assert [r["raw_line"] for r in still_dead.collect()] == [bad]


def test_replay_dead_letters_null_raw_line_stays_dead(spark, tmp_path):
    """A NULL raw line (a foreign DLQ writer, a corrupted file) parses
    to a NULL struct whose corrupt field is NULL — before the fix that
    classified it as recovered and appended an all-NULL row to the
    clean table. No schema amendment can recover a line that does not
    exist: it must stay in still_dead with its provenance."""
    import pyspark.sql.types as T

    from micmac_li3ds_spark.streaming.jobs import replay_dead_letters

    schema = T.StructType([T.StructField("user_id", T.LongType())])
    dlq = _write_dlq(spark, tmp_path, [json.dumps({"user_id": 7}), None])

    recovered, still_dead = replay_dead_letters(spark, dlq, schema)
    assert [tuple(r) for r in recovered.collect()] == [(7,)]
    dead = still_dead.collect()
    assert len(dead) == 1 and dead[0]["raw_line"] is None
