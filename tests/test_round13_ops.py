"""Round-13 consolidation tests.

The round-12 verdict made round 13 a fourth consolidation round (zero
discretionary window slots — the rotation is commit 1, policed by
test_registry's staleness invariant). The code work:

- Verdict 3: ``sidx`` (segment index, ISO 14496-12 §8.16.3) in the
  fragmented BMFF walk — the DASH byte-range index that lets a
  time-range frame sample seek straight to the covering [moof+mdat]
  ranges instead of walking every fragment (the remaining media
  pushdown gap at 100 TB). The generator records sidx-derived
  fragment ranges from its OWN layout arithmetic; the walker consults
  the box when present and cross-checks it against the moof walk.
- ADVICE 1: v1 (64-bit-times) mvhd no longer fails the walk — and the
  same real-file concern covers tkhd/mdhd, so all three accept v0|v1.
- ADVICE 2: size/bounds checks precede every version-byte
  dereference, so degenerate empty boxes at payload end surface as
  the documented ValueError, never IndexError.
- ADVICE 3: a trun setting both first-sample-flags-present (0x4) and
  sample-flags-present (0x400) — mutually exclusive per §8.8.8 —
  raises instead of silently letting per-sample flags win.
- ADVICE 4: _mp4_boxes yields each box's start offset, so
  default-base-is-moof uses it directly instead of the
  normal-vs-largesize back-computation heuristic.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.test_round11_ops import _genfix


def _frag(sidx=True, v1=False, n_frags=3, **overrides):
    """A 3-fragment, 3-samples-each layout with distinct per-fragment
    byte patterns; every keyword of _mp4_encode_fragmented overridable."""
    base = dict(
        fragments=[
            [bytes([k + 10 * f]) * 20 for k in range(3)]
            for f in range(n_frags)
        ],
        timescale=600,
        default_duration=60,
        keyframes=[[True, False, False]] * n_frags,
        ctts_offsets=[[120, 0, 60]] * n_frags,
        sidx=sidx,
        v1_times=v1,
    )
    base.update(overrides)
    return base


# ---------------------------------------------------------------------------
# ADVICE 1: v1 (64-bit-times) mvhd/tkhd/mdhd
# ---------------------------------------------------------------------------


def test_mp4_walker_accepts_v1_times_unfragmented():
    """Real long-duration encoders write v1 mvhd/tkhd/mdhd (64-bit
    creation/modification/duration); the timescale/track-id fields
    shift from body offset 12 to 20 and the walk must still match the
    generator's bookkeeping exactly."""
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    args = (
        [bytes([k]) * (10 + k) for k in range(6)],
        [(1, 2), (2, 4)],
        0,
        1000,
        [(6, 100)],
        True,  # audio trak first — hdlr selection with v1 headers
        False,
    )
    kw = dict(stss_samples=[1, 4], ctts_runs=[(3, 100), (3, 0)])
    p0, offs0, ts0, k0, pts0 = gf._mp4_encode(*args, **kw)
    p1, offs1, ts1, k1, pts1 = gf._mp4_encode(*args, **kw, v1_times=True)
    assert p1 != p0  # genuinely different header forms
    sizes = [10 + k for k in range(6)]
    assert _mp4_sample_index(p1) == list(zip(offs1, sizes, ts1, k1, pts1))
    # and the v0 form still walks (regression pin)
    assert _mp4_sample_index(p0) == list(zip(offs0, sizes, ts0, k0, pts0))


def test_mp4_walker_accepts_v1_times_fragmented_with_elst():
    """The ADVICE scenario exactly: an empty-edit elst needs
    movie_timescale, which must now parse out of a v1 mvhd (offset
    20), across the fragmented walk."""
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    payload, offs, ts_ms, keys, pts_ms, _ = gf._mp4_encode_fragmented(
        **_frag(
            sidx=False,
            v1=True,
            ctts_offsets=None,
            elst_edits=[(3, -1), (600, 60)],
            movie_timescale=10,
        )
    )
    got = _mp4_sample_index(payload)
    assert got == list(zip(offs, [20] * 9, ts_ms, keys, pts_ms))
    # delay 3 movie units @10 = 180 media units @600 = 300 ms, minus
    # media_time 60 units = 100 ms → shift +200 ms
    assert pts_ms == [t + 200 for t in ts_ms]


def test_mp4_walker_rejects_unknown_mvhd_version():
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    payload, *_ = gf._mp4_encode_fragmented(**_frag(sidx=False))
    k = payload.index(b"mvhd")
    bad = payload[: k + 4] + b"\x02" + payload[k + 5 :]
    with pytest.raises(ValueError, match="unsupported mvhd version"):
        _mp4_sample_index(bad)


# ---------------------------------------------------------------------------
# ADVICE 2: bounds checks precede version-byte dereferences
# ---------------------------------------------------------------------------


def test_mp4_walker_empty_tkhd_at_payload_end_raises_valueerror():
    """A degenerate 8-byte (empty-body) tkhd ending exactly at the
    payload end used to dereference payload[tkhd_b] == payload[len]
    → IndexError; it must be the documented ValueError."""
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    _box, _full = gf._box, gf._full
    # a trak whose mdia parses fine and whose EMPTY tkhd is the last
    # box of the last top-level box (moov)
    stbl = _box(
        b"stbl",
        _full(b"stts", (0).to_bytes(4, "big"))
        + _full(b"stsc", (0).to_bytes(4, "big"))
        + _full(b"stsz", bytes(8))
        + _full(b"stco", (0).to_bytes(4, "big")),
    )
    mdia = _box(
        b"mdia",
        _full(b"mdhd", bytes(8) + (1000).to_bytes(4, "big") + bytes(8))
        + _full(b"hdlr", bytes(4) + b"vide" + bytes(13))
        + _box(b"minf", _box(b"vmhd", bytes(8)) + stbl),
    )
    trak = _box(b"trak", mdia + _box(b"tkhd", b""))
    moov = _box(
        b"moov",
        _full(b"mvhd", bytes(8) + (1000).to_bytes(4, "big") + bytes(84))
        + trak,
    )
    ftyp = _box(b"ftyp", b"isom" + (512).to_bytes(4, "big") + b"isomiso2")
    payload = ftyp + moov
    with pytest.raises(ValueError, match="truncated tkhd box"):
        _mp4_sample_index(payload)


def test_mp4_fragmented_empty_trun_at_payload_end_raises_valueerror():
    """Same contract in the fragmented walk: an 8-byte trun ending at
    the payload end read payload[bb] before the bb+8>be check."""
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    good, *_ = gf._mp4_encode_fragmented(**_frag(sidx=False, n_frags=1))
    # append a trailing moof whose video traf ends in an EMPTY trun
    tfhd = gf._box(
        b"tfhd",
        (0x020000).to_bytes(4, "big") + (7).to_bytes(4, "big"),
    )
    extra = gf._box(b"moof", gf._box(b"traf", tfhd + gf._box(b"trun", b"")))
    with pytest.raises(ValueError, match="truncated trun box"):
        _mp4_sample_index(good + extra)


# ---------------------------------------------------------------------------
# ADVICE 3: mutually exclusive trun flag combination refuses loudly
# ---------------------------------------------------------------------------


def test_mp4_fragmented_rejects_first_flags_plus_per_sample_flags():
    """§8.8.8: first-sample-flags-present (0x4) is only meaningful
    when sample-flags-present (0x400) is absent; a trun setting both
    must raise, not silently prefer one."""
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    good, *_ = gf._mp4_encode_fragmented(
        **_frag(
            sidx=False,
            n_frags=2,
            ctts_offsets=None,
            flags_mode="first",
            keyframes=[[True, False, False]] * 2,
        )
    )
    k = good.index(b"trun", good.index(b"moof"))
    flags = int.from_bytes(good[k + 5 : k + 8], "big")
    assert flags & 0x000004 and not flags & 0x000400
    bad = (
        good[: k + 5]
        + (flags | 0x000400).to_bytes(3, "big")
        + good[k + 8 :]
    )
    with pytest.raises(ValueError, match="mutually exclusive"):
        _mp4_sample_index(bad)


# ---------------------------------------------------------------------------
# Verdict 3: sidx segment index — parse, cross-check, time-ranged seek
# ---------------------------------------------------------------------------


def _ranges_ms(frs, ts):
    return [
        (e * 1000 // ts, (e + d) * 1000 // ts) for _, _, e, d in frs
    ]


def test_mp4_sidx_full_walk_cross_checks_and_matches_bookkeeping():
    """With a sidx present the full walk still returns exactly the
    generator's 5-channel bookkeeping AND silently verifies the index
    against the walked moof starts; the parsed references equal the
    generator's independently-recorded fragment ranges."""
    from micmac_li3ds_spark.operators.multimodal import (
        _mp4_sample_index,
        _mp4_sidx_refs,
    )

    gf = _genfix()
    payload, offs, ts_ms, keys, pts_ms, frs = gf._mp4_encode_fragmented(
        **_frag(v1=True)
    )
    assert _mp4_sample_index(payload) == list(
        zip(offs, [20] * 9, ts_ms, keys, pts_ms)
    )
    sidx_ts, refs = _mp4_sidx_refs(payload, 7)
    assert sidx_ts == 600
    assert refs == frs  # generator bookkeeping ≡ parsed box


def test_mp4_sidx_disagreeing_with_moof_walk_raises():
    """A stale/crafted sidx would silently mis-seek every time-ranged
    read — the full walk must catch it: shrink the first reference's
    size by 8 so every later start is off (shrinking keeps the total
    inside the payload, so the parse-time range guard stays quiet and
    the cross-check itself is what fires)."""
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    good, *_ = gf._mp4_encode_fragmented(**_frag())
    k = good.index(b"sidx") + 4  # start of FullBox body
    ref0 = k + 24  # verflags 4 + refID 4 + ts 4 + ept 4 + off 4 + cnt 4
    size0 = int.from_bytes(good[ref0 : ref0 + 4], "big")
    bad = (
        good[:ref0] + (size0 - 8).to_bytes(4, "big") + good[ref0 + 4 :]
    )
    with pytest.raises(ValueError, match="disagree with the moof walk"):
        _mp4_sample_index(bad)


def test_mp4_sidx_malformed_rejections():
    """Named rejections: hierarchical references, a reference_ID that
    is not the video track, counts overrunning the box, ranges past
    the payload end, unknown versions."""
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    good, *_ = gf._mp4_encode_fragmented(**_frag())
    k = good.index(b"sidx") + 4
    ref0 = k + 24

    # hierarchical reference (top bit of the first reference head)
    head = int.from_bytes(good[ref0 : ref0 + 4], "big")
    bad = (
        good[:ref0]
        + (head | 0x80000000).to_bytes(4, "big")
        + good[ref0 + 4 :]
    )
    with pytest.raises(ValueError, match="hierarchical sidx reference"):
        _mp4_sample_index(bad)

    # reference_ID ≠ video track id
    bad = good[: k + 4] + (9).to_bytes(4, "big") + good[k + 8 :]
    with pytest.raises(ValueError, match="reference_ID 9 is not"):
        _mp4_sample_index(bad)

    # reference_count overruns the box
    cnt_at = k + 22
    bad = good[:cnt_at] + (99).to_bytes(2, "big") + good[cnt_at + 2 :]
    with pytest.raises(ValueError, match="99 references beyond its box"):
        _mp4_sample_index(bad)

    # a reference range past the payload end (huge size, top bit clear)
    bad = (
        good[:ref0] + (0x7000_0000).to_bytes(4, "big") + good[ref0 + 4 :]
    )
    with pytest.raises(ValueError, match="past the payload end"):
        _mp4_sample_index(bad)

    # unknown version
    bad = good[:k] + b"\x02" + good[k + 1 :]
    with pytest.raises(ValueError, match="unsupported sidx version"):
        _mp4_sample_index(bad)


def test_mp4_sidx_time_ranged_seek_skips_other_fragments():
    """The 100-TB pushdown shape: a time range covering only the
    middle fragment returns exactly its samples — and provably never
    touches the others, because corrupting fragment 3's trun kills
    the full walk but not the seek."""
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    payload, offs, ts_ms, keys, pts_ms, frs = gf._mp4_encode_fragmented(
        **_frag()
    )
    exp = list(zip(offs, [20] * 9, ts_ms, keys, pts_ms))
    (lo1, hi1) = _ranges_ms(frs, 600)[1]
    mid = _mp4_sample_index(payload, time_range_ms=(lo1, hi1 - 1))
    assert mid == exp[3:6]

    # corrupt fragment 3's trun version byte: full walk now raises,
    # the ranged seek never reads those bytes
    k = payload.index(b"trun", frs[2][0])
    bad = payload[: k + 4] + b"\xff" + payload[k + 5 :]
    with pytest.raises(ValueError, match="unsupported trun version"):
        _mp4_sample_index(bad)
    assert _mp4_sample_index(bad, time_range_ms=(lo1, hi1 - 1)) == exp[3:6]

    # a range spanning the 1st/2nd boundary returns both fragments
    (lo0, _) = _ranges_ms(frs, 600)[0]
    both = _mp4_sample_index(payload, time_range_ms=(lo0, lo1))
    assert both == exp[0:6]


def test_mp4_sidx_seek_contract_rejections():
    """time_range without a sidx raises; a sought fragment without
    tfdt raises (its decode time is the running total of SKIPPED
    fragments); a reference that does not start at a moof raises; an
    unfragmented payload refuses time ranges outright."""
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    no_sidx, *_ = gf._mp4_encode_fragmented(**_frag(sidx=False))
    with pytest.raises(ValueError, match="requires a sidx segment index"):
        _mp4_sample_index(no_sidx, time_range_ms=(0, 100))

    no_tfdt, *_, frs = gf._mp4_encode_fragmented(
        **_frag(tfdt=False, ctts_offsets=None, trun_version=0)
    )
    lo, hi = _ranges_ms(frs, 600)[1]
    with pytest.raises(ValueError, match="seek requires tfdt"):
        _mp4_sample_index(no_tfdt, time_range_ms=(lo, hi - 1))
    # ...while the FULL walk of the same payload is fine (running time)
    assert len(_mp4_sample_index(no_tfdt)) == 9

    # first_offset pointing inside the moof: the first box at the
    # anchor is mfhd, not moof (also shrink the LAST reference by 8 so
    # the +8 shift keeps every range inside the payload and the
    # parse-time guard stays quiet)
    good, *_, frs = gf._mp4_encode_fragmented(**_frag())
    k = good.index(b"sidx") + 4
    off_at = k + 16  # verflags 4 + refID 4 + ts 4 + ept 4
    assert int.from_bytes(good[off_at : off_at + 4], "big") == 0
    bad = good[:off_at] + (8).to_bytes(4, "big") + good[off_at + 4 :]
    last_ref = k + 24 + 12 * 2
    last_sz = int.from_bytes(bad[last_ref : last_ref + 4], "big")
    bad = (
        bad[:last_ref]
        + (last_sz - 8).to_bytes(4, "big")
        + bad[last_ref + 4 :]
    )
    lo, hi = _ranges_ms(frs, 600)[0]
    with pytest.raises(ValueError, match="does not start at a moof"):
        _mp4_sample_index(bad, time_range_ms=(lo, hi - 1))

    # unfragmented: no byte range can be skipped, refuse the API
    flat, *_ = gf._mp4_encode(
        [b"xy" * 8] * 4, [(1, 2)], 16, 1000, [(4, 100)], False, False
    )
    with pytest.raises(ValueError, match="requires a fragmented MP4"):
        _mp4_sample_index(flat, time_range_ms=(0, 100))


# ---------------------------------------------------------------------------
# Property test: sidx-led seeks agree with the full walk on random
# fragmented plans and random time ranges
# ---------------------------------------------------------------------------


@st.composite
def _sidx_plans(draw):
    n_frags = draw(st.integers(1, 4))
    counts = [draw(st.integers(1, 4)) for _ in range(n_frags)]
    tscale = draw(st.sampled_from([600, 1000, 30000]))
    d_dur = draw(st.integers(40, 2000))
    mode = draw(st.sampled_from(["per_sample", "default"]))
    if mode == "default":
        keys = [[True] * c for c in counts]
    else:
        keys = [
            [draw(st.booleans()) for _ in range(c)] for c in counts
        ]
    # composition offsets: each fragment's FIRST sample keeps offset 0
    # (its pts == dts, the SAP pattern real GOPs have), which makes
    # fragment EPTs strictly increasing — the §8.16.3 validity
    # condition the generator asserts for sidx tiling
    if draw(st.booleans()):
        cofs = None
    else:
        cofs = [
            [
                0 if k == 0 else draw(st.integers(0, 3)) * d_dur
                for k in range(c)
            ]
            for c in counts
        ]
    return counts, tscale, d_dur, mode, keys, cofs


@settings(max_examples=30, deadline=None)
@given(plan=_sidx_plans(), v1=st.booleans(), data=st.data())
def test_mp4_sidx_seek_matches_full_walk_on_random_plans(plan, v1, data):
    """For random sidx'd layouts and a random ms range, the seek must
    return exactly the full walk's samples restricted to the covering
    fragments (the walker's own intersect arithmetic, mirrored here
    from the generator's independent frag bookkeeping)."""
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    counts, tscale, d_dur, mode, keys, cofs = plan
    frags = [
        [bytes([(fi * 11 + k) % 251]) * (10 + k) for k in range(c)]
        for fi, c in enumerate(counts)
    ]
    payload, offs, ts_ms, kf, pts_ms, frs = gf._mp4_encode_fragmented(
        frags, tscale, d_dur, keys, flags_mode=mode,
        ctts_offsets=cofs, sidx=True, v1_times=v1,
    )
    sizes = [len(s) for f in frags for s in f]
    full = _mp4_sample_index(payload)
    assert full == list(zip(offs, sizes, ts_ms, kf, pts_ms))

    total_ms = (frs[-1][2] + frs[-1][3]) * 1000 // tscale + 1
    lo = data.draw(st.integers(0, total_ms), label="lo")
    hi = data.draw(st.integers(lo, total_ms + 10), label="hi")
    got = _mp4_sample_index(payload, time_range_ms=(lo, hi))

    exp = []
    pos = 0
    for (roff, rsize, ept_u, dur_u), c in zip(frs, counts):
        # exact tick-unit mirror (ADVICE r13 #1): the earlier floored-ms
        # mirror `(ept+dur)*1000//tscale <= lo` replicated the walker's
        # own lower-bound bug, so the test could never catch it — a
        # fragment is covering unless its LAST tick floors below lo or
        # its FIRST tick floors above hi
        if not (
            ept_u * 1000 >= (hi + 1) * tscale
            or (ept_u + dur_u - 1) * 1000 < lo * tscale
        ):
            exp += full[pos : pos + c]
        pos += c
    assert got == exp


# ---------------------------------------------------------------------------
# frame_sample_range: the user-facing time-ranged sampler over the fixture
# corpus — sidx-led seek where the container has one, full-walk fallback
# elsewhere, identical either way
# ---------------------------------------------------------------------------


def test_frame_sample_range_matches_full_walk_filter(spark):
    """For several ms windows, frame_sample_range over media_mp4 must
    equal q_mm_frame_sample's real branch filtered to the window and
    renumbered — across ALL 17 fixture rows (sidx'd DASH row seeks,
    the rest full-walk), so the two paths are pinned equivalent at the
    DataFrame level, not just per-payload."""
    from micmac_li3ds_spark.operators.multimodal import (
        _mp4_has_sidx,
        _mp4_sample_index,
        frame_sample_range,
        load_media_mp4,
    )
    import hashlib

    rows = load_media_mp4(spark).collect()
    assert any(_mp4_has_sidx(bytes(r["payload"])) for r in rows)

    for lo, hi in ((0, 250), (200, 800), (500, 10_000)):
        got = sorted(
            (r["media_id"], r["frame_idx"], r["frame_ts_ms"], r["frame_sha"])
            for r in frame_sample_range(spark, lo, hi).collect()
        )
        exp = []
        for r in rows:
            payload = bytes(r["payload"])
            hx = payload.hex().upper()
            k = 0
            for off, sz, _dts, key, pts in _mp4_sample_index(payload):
                if not key or pts < 0 or not lo <= pts <= hi:
                    continue
                exp.append(
                    (
                        r["media_id"],
                        k,
                        pts,
                        hashlib.sha256(
                            hx[off * 2 : (off + sz) * 2].encode()
                        ).hexdigest(),
                    )
                )
                k += 1
        assert got == sorted(exp), (lo, hi)

    with pytest.raises(ValueError, match="empty time range"):
        frame_sample_range(spark, 10, 5)


# ---------------------------------------------------------------------------
# styp: concatenated-CMAF segments — sidx references anchor at the styp
# ---------------------------------------------------------------------------


def test_mp4_styp_segments_walk_and_seek():
    """A styp box before each moof (the concatenated-CMAF shape): the
    full walk skips it, the sidx cross-check expects references to
    anchor at the STYP (§8.16.3 start-of-referenced-material), and the
    ranged seek tolerates it as the reference's first box."""
    from micmac_li3ds_spark.operators.multimodal import (
        _mp4_sample_index,
        _mp4_sidx_refs,
    )

    gf = _genfix()
    payload, offs, ts_ms, keys, pts_ms, frs = gf._mp4_encode_fragmented(
        **_frag(styp=True, ctts_offsets=None)
    )
    assert payload.count(b"styp") == 3
    exp = list(zip(offs, [20] * 9, ts_ms, keys, pts_ms))
    assert _mp4_sample_index(payload) == exp  # cross-check green
    # references anchor at each styp, 24 bytes before its moof
    _, refs = _mp4_sidx_refs(payload, 7)
    assert refs == frs
    for roff, _sz, _e, _d in refs:
        assert payload[roff + 4 : roff + 8] == b"styp"
        assert payload[roff + 28 : roff + 32] == b"moof"
    # ranged seek lands on the styp and walks through to the moof
    lo, hi = _ranges_ms(frs, 600)[1]
    assert _mp4_sample_index(payload, time_range_ms=(lo, hi - 1)) == exp[3:6]

    # a sidx anchored at the MOOF of a styp'd file must fail the
    # cross-check (that is exactly the off-by-a-styp staleness bug):
    # shift every reference to the moof via first_offset=24 (the styp
    # size) and shrink the last ref to stay in-payload
    k = payload.index(b"sidx") + 4
    off_at = k + 16
    bad = payload[:off_at] + (24).to_bytes(4, "big") + payload[off_at + 4 :]
    last_ref = k + 24 + 12 * 2
    last_sz = int.from_bytes(bad[last_ref : last_ref + 4], "big")
    bad = (
        bad[:last_ref]
        + (last_sz - 24).to_bytes(4, "big")
        + bad[last_ref + 4 :]
    )
    with pytest.raises(ValueError, match="disagree with the moof walk"):
        _mp4_sample_index(bad)
