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


# ---------------------------------------------------------------------------
# Round 15: baseline TIFF decoder (q_mm_tiff_decode)
# ---------------------------------------------------------------------------


def _strip_means_ref(raw: bytes, w: int, h: int) -> list[float]:
    """Reference strip means computed straight from raw RGB bytes —
    pure-python, independent of both the decoder's numpy path and the
    oracle's SQL."""
    from micmac_li3ds_spark.operators.multimodal import _FEAT_DIM

    sums = [0] * _FEAT_DIM
    npix = [0] * _FEAT_DIM
    for x in range(w):
        s = (x * _FEAT_DIM) // w
        npix[s] += h
        for r in range(h):
            o = (r * w + x) * 3
            sums[s] += raw[o] + raw[o + 1] + raw[o + 2]
    return [sums[i] / (768.0 * npix[i]) for i in range(_FEAT_DIM)]


def test_tiff_decoder_matches_generation_ground_truth_all_fixtures():
    """Every committed media_tiff row — both compressions, both byte
    orders, multi-strip, padded layouts, RowsPerStrip-defaulted —
    decodes to exactly the strip means of its generation-time raw_px."""
    import pyarrow.parquet as pq

    from micmac_li3ds_spark.operators.multimodal import (
        MEDIA_TIFF_PARQUET,
        _decode_tiff,
    )

    t = pq.read_table(MEDIA_TIFF_PARQUET).to_pylist()
    assert len(t) == 12
    assert {r["compression"] for r in t} == {1, 32773}
    for row in t:
        got = _decode_tiff(bytes(row["payload"]), row["mime"])
        want = _strip_means_ref(
            bytes(row["raw_px"]), row["width"], row["height"]
        )
        assert got == want, f"media_id {row['media_id']}"


def test_packbits_roundtrip_properties():
    """Encoder/decoder are independent implementations; meet at the
    bytes. Includes max-length runs (128 literals, 128 repeats) and
    injected -128 no-ops."""
    import random

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from micmac_li3ds_spark.operators.multimodal import _packbits_decode
    from tests.test_round11_ops import _genfix

    gf = _genfix()

    @settings(max_examples=120, deadline=None)
    @given(
        data=st.binary(min_size=1, max_size=600),
        noop=st.booleans(),
        seed=st.integers(0, 2**31),
    )
    def inner(data, noop, seed):
        enc = gf._packbits_encode(
            data, random.Random(seed) if noop else None
        )
        assert _packbits_decode(enc, len(data)) == data

    inner()
    # deterministic maxima: 200 equal bytes → two repeat runs; 200
    # distinct-ish bytes → two literal runs
    for data in [b"\x55" * 200, bytes(range(200))]:
        assert _packbits_decode(gf._packbits_encode(data), 200) == data


def test_tiff_encode_decode_roundtrip_property():
    """Random geometry/layout plans through the generator must decode
    to the reference strip means — both byte orders, strip counts from
    1 to h, both compressions, pad bytes, no-op injection."""
    import random

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from micmac_li3ds_spark.operators.multimodal import _decode_tiff
    from tests.test_round11_ops import _genfix

    gf = _genfix()

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(8, 40),
        h=st.integers(1, 12),
        rps=st.one_of(st.none(), st.integers(1, 15)),
        comp=st.sampled_from([1, 32773]),
        big=st.booleans(),
        pad=st.integers(0, 7),
        sw=st.booleans(),
        runny=st.booleans(),
        seed=st.integers(0, 2**31),
    )
    def inner(w, h, rps, comp, big, pad, sw, runny, seed):
        rng = random.Random(seed)
        if runny:
            raw = bytearray()
            while len(raw) < 3 * w * h:
                raw += bytes([rng.randint(0, 255)]) * rng.choice(
                    [1, 3, 50, 128, 140]
                )
            raw = bytes(raw[: 3 * w * h])
        else:
            raw = bytes(rng.randint(0, 255) for _ in range(3 * w * h))
        payload, _, _ = gf._tiff_encode(
            raw, w, h, rows_per_strip=rps, compression=comp,
            big_endian=big, pad=pad, software_tag=sw,
            noop_rng=rng if comp == 32773 and runny else None,
        )
        assert _decode_tiff(payload, "image/tiff") == _strip_means_ref(
            raw, w, h
        )

    inner()


def _tiff_payload(**kw):
    import random

    from tests.test_round11_ops import _genfix

    gf = _genfix()
    rng = random.Random(4242)
    w, h = kw.pop("w", 10), kw.pop("h", 4)
    raw = bytes(rng.randint(0, 255) for _ in range(3 * w * h))
    args = dict(rows_per_strip=2, compression=1)
    args.update(kw)
    payload, soffs, scnts = gf._tiff_encode(raw, w, h, **args)
    return payload


def _patch_tag(payload: bytes, tag: int, *, value=None, typ=None):
    """Independent IFD re-walk for test mutation: find ``tag`` and
    overwrite its inline value (or type), honoring the file's byte
    order. Does NOT share code with the decoder under test."""
    import struct

    en = "<" if payload[:2] == b"II" else ">"
    (ifd,) = struct.unpack_from(en + "I", payload, 4)
    (n,) = struct.unpack_from(en + "H", payload, ifd)
    buf = bytearray(payload)
    for k in range(n):
        e = ifd + 2 + 12 * k
        t, ty, cnt = struct.unpack_from(en + "HHI", payload, e)
        if t != tag:
            continue
        if typ is not None:
            struct.pack_into(en + "H", buf, e + 2, typ)
        if value is not None:
            fmt = {3: "H", 4: "I"}[ty]
            struct.pack_into(en + fmt, buf, e + 8, value)
        return bytes(buf)
    raise AssertionError(f"tag {tag} not found")


def test_tiff_decoder_rejects_malformed_inputs():
    """The BMFF walk's malformed-input rigor, for TIFF: every
    structural lie raises a named ValueError instead of desyncing or
    silently mis-decoding."""
    from micmac_li3ds_spark.operators.multimodal import (
        _decode_tiff,
        _packbits_decode,
    )

    good = _tiff_payload()
    assert isinstance(_decode_tiff(good, "image/tiff"), list)

    with pytest.raises(ValueError, match="not a TIFF"):
        _decode_tiff(b"XX" + good[2:], "image/tiff")
    with pytest.raises(ValueError, match="magic"):
        _decode_tiff(good[:2] + b"\x2b\x00" + good[4:], "image/tiff")
    with pytest.raises(ValueError, match="truncated TIFF header"):
        _decode_tiff(good[:6], "image/tiff")
    with pytest.raises(ValueError, match="IFD offset past"):
        _decode_tiff(
            good[:4] + len(good).to_bytes(4, "little") + good[8:],
            "image/tiff",
        )
    with pytest.raises(ValueError, match="unsupported TIFF compression"):
        _decode_tiff(_patch_tag(good, 259, value=5), "image/tiff")
    with pytest.raises(ValueError, match="chunky 8-bit RGB"):
        _decode_tiff(_patch_tag(good, 262, value=1), "image/tiff")
    # multi-strip: StripOffsets live in the EXTERNAL value area, so a
    # lying pointer is caught at the IFD walk
    with pytest.raises(ValueError, match="value range past payload end"):
        _decode_tiff(
            _patch_tag(good, 273, value=len(good) - 3), "image/tiff"
        )
    # single-strip: StripOffsets is inline — a lying offset is caught
    # at the strip bounds check
    one = _tiff_payload(rows_per_strip=100)
    with pytest.raises(ValueError, match="strip .* past payload end"):
        _decode_tiff(
            _patch_tag(one, 273, value=len(one) - 3), "image/tiff"
        )
    # single-strip file lying about its byte count
    with pytest.raises(ValueError, match="size .* != "):
        _decode_tiff(_patch_tag(one, 279, value=7), "image/tiff")
    # strip bookkeeping mismatch: claim more strips than offsets exist
    with pytest.raises(ValueError, match="bookkeeping mismatch"):
        _decode_tiff(_patch_tag(one, 278, value=1), "image/tiff")
    # tiled layouts are a named rejection (can't ADD a tag by patching;
    # overwrite an existing entry's TAG NUMBER with TileWidth instead)
    import struct

    en_ifd = struct.unpack_from("<I", good, 4)[0]
    buf = bytearray(good)
    struct.pack_into("<H", buf, en_ifd + 2, 322)
    with pytest.raises(ValueError, match="tiled TIFF"):
        _decode_tiff(bytes(buf), "image/tiff")

    # PackBits stream malformations
    with pytest.raises(ValueError, match="truncated PackBits literal"):
        _packbits_decode(b"\x05\x01\x02", 6)
    with pytest.raises(ValueError, match="truncated PackBits repeat"):
        _packbits_decode(b"\xfe", 3)
    with pytest.raises(ValueError, match="output size mismatch"):
        _packbits_decode(b"\x00\x41", 2)  # underrun
    with pytest.raises(ValueError, match="continues past"):
        _packbits_decode(b"\x00\x41\x00\x42", 1)  # trailing garbage
    assert _packbits_decode(b"\x80\xff\x41", 2) == b"AA"  # no-op skipped
