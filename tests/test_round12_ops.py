"""Round-12 consolidation tests.

The round-11 verdict made round 12 a third consolidation round (zero
discretionary window slots — the rotation itself is commit 1 and is
policed by test_registry's staleness invariant). The code work:

- ADVICE 1: _decode_wav / _decode_aiff must RAISE on an odd-length
  16-bit PCM data chunk instead of silently truncating the trailing
  byte (the family's raise-on-malformed contract).
- ADVICE 2: nearest_centroid_assign's dist column changes type and
  meaning when int_dist is supplied — the divergence is now explicit
  in the return contract and pinned here.
- Verdict 3: keyframe-aware frame sampling — stss (sync samples) and
  ctts (composition offsets) in the ISO BMFF walk, keyframe flags +
  presentation timestamps, tested against generation-time coordinates
  the walk never sees (no-stss, first-keyframe-not-1, and
  ctts-reordered tracks in the fixture family).
- Verdict 4: the kmeans_step grouping-key-width tradeoff, MEASURED
  (tools/measure_kmeans_width.py, SCALE.md §20) — the shipped
  assign-then-rejoin spelling is pinned bit-identical to the retired
  wide spelling here.

Late-round sections extend the container surface past the verdict
queue, each with the same oracle discipline and a hypothesis property
test over the generator↔walker pairing: co64 (64-bit chunk offsets —
the >4 GiB form), elst edit lists (presentation shifts,
cross-timescale empty-edit delays, mid-GOP trims → negative pts on
decoded-but-not-presented samples), and FRAGMENTED MP4
(moof/traf/trun with the §8.8 defaults cascade — the CMAF/DASH shape
streaming lakes actually store).
"""

from __future__ import annotations

import pytest

from tests.test_round11_ops import _aiff_bytes, _genfix, _wav_bytes


# ---------------------------------------------------------------------------
# ADVICE 1: odd-length PCM data chunks raise, never truncate
# ---------------------------------------------------------------------------


def test_decode_wav_rejects_odd_data_chunk():
    """A data chunk whose declared size is odd cannot hold whole
    16-bit samples: the decoder must raise, not drop the trailing
    byte and decode garbage to features."""
    from micmac_li3ds_spark.operators.multimodal import _decode_wav

    samples = [100, 200, 300, 400, 500, 600, 700, 800]
    good = _wav_bytes(samples)
    data_sz = (len(samples) * 2).to_bytes(4, "little")
    bad_sz = (len(samples) * 2 + 1).to_bytes(4, "little")
    # grow the declared size by one (payload gains a pad byte so the
    # chunk body still exists — only the ODDNESS is malformed)
    bad = good.replace(b"data" + data_sz, b"data" + bad_sz) + b"\x00"
    assert bad != good + b"\x00"
    with pytest.raises(ValueError, match="odd data chunk"):
        _decode_wav(bad, "audio/x-wav-pcm")


def test_decode_aiff_rejects_odd_sound_data():
    """AIFF twin of the WAV odd-size contract: SSND sound data (chunk
    size minus the 8-byte offset/blockSize header minus the offset
    pad) must be even for 16-bit PCM."""
    from micmac_li3ds_spark.operators.multimodal import _decode_aiff

    samples = [1000, -2000, 3000, -4000, 5000, -6000, 7000, -8000]
    good = _aiff_bytes(samples)
    ssnd_sz = (8 + len(samples) * 2).to_bytes(4, "big")
    bad_sz = (8 + len(samples) * 2 + 1).to_bytes(4, "big")
    bad = good.replace(b"SSND" + ssnd_sz, b"SSND" + bad_sz) + b"\x00"
    assert bad != good + b"\x00"
    with pytest.raises(ValueError, match="odd SSND sound-data"):
        _decode_aiff(bad, "audio/aiff")


# ---------------------------------------------------------------------------
# Fragmented MP4 (moof/traf/trun) — the CMAF/DASH layout
# ---------------------------------------------------------------------------


def _frag_args(**overrides):
    base = dict(
        fragments=[[bytes([k]) * 20 for k in range(4)]] * 2,
        timescale=1000,
        default_duration=100,
        keyframes=[[True, False, False, False]] * 2,
    )
    base.update(overrides)
    return base


def test_mp4_fragmented_walk_hand_computed():
    """Two 4-sample fragments, trex default duration 100, per-sample
    flags, v0 composition offsets: dts/pts/keyframes/offsets all
    hand-checked against the trun arithmetic."""
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    payload, offs, ts_ms, keys, pts_ms, _ = gf._mp4_encode_fragmented(
        **_frag_args(ctts_offsets=[[200, 0, 100, 0], [200, 100, 0, 0]])
    )
    got = _mp4_sample_index(payload)
    assert got == list(zip(offs, [20] * 8, ts_ms, keys, pts_ms))
    assert ts_ms == [0, 100, 200, 300, 400, 500, 600, 700]
    assert pts_ms == [200, 100, 300, 300, 600, 600, 600, 700]
    assert keys == [True, False, False, False] * 2
    # samples live in the two mdats, after each moof
    assert all(
        payload[o : o + 20] == bytes([k % 4]) * 20
        for k, o in enumerate(offs)
    )


def test_mp4_fragmented_walk_defaults_cascade_and_bdo():
    """first-sample-flags + tfhd default flags, explicit
    base_data_offset, no tfdt (running decode time), per-trun
    durations, v1 SIGNED composition offsets, and a leading audio
    traf whose bytes precede the video samples in every mdat — the
    walker must select the video traf by track id and honor the
    absolute base."""
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    payload, offs, ts_ms, keys, pts_ms, _ = gf._mp4_encode_fragmented(
        **_frag_args(
            fragments=[[bytes([k]) * 15 for k in range(3)]] * 2,
            keyframes=[[True, False, False]] * 2,
            flags_mode="first",
            dur_overrides=[[100, 50, 50], [100, 100, 100]],
            ctts_offsets=[[200, -50, 50], [200, 0, -100]],
            trun_version=1,
            base_data_offset=True,
            tfdt=False,
            audio_trak=True,
        )
    )
    got = _mp4_sample_index(payload)
    assert got == list(zip(offs, [15] * 6, ts_ms, keys, pts_ms))
    assert ts_ms == [0, 100, 150, 200, 300, 400]
    assert pts_ms == [200, 50, 200, 400, 300, 300]
    assert keys == [True, False, False] * 2
    # the audio dummy bytes sit at each mdat start, before video data
    assert payload[offs[0] - 6 : offs[0]] == b"\xaa" * 6


def test_mp4_fragmented_walk_multi_trun_and_elst():
    """A traf split across two trun boxes plus an empty-edit delay at
    a distinct movie timescale — per-trun data offsets must chain and
    the edit shift must apply across fragments."""
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    payload, offs, ts_ms, keys, pts_ms, _ = gf._mp4_encode_fragmented(
        **_frag_args(
            fragments=[[bytes([k]) * 10 for k in range(6)]],
            keyframes=[[True] * 6],
            flags_mode="default",
            trun_split=[2],
            elst_edits=[(3, -1), (600, 100)],
            movie_timescale=10,
        )
    )
    got = _mp4_sample_index(payload)
    assert got == list(zip(offs, [10] * 6, ts_ms, keys, pts_ms))
    # delay 3 movie units @10 = 300 media units @1000, minus media_time
    # 100 → shift +200 ms
    assert pts_ms == [t + 200 for t in ts_ms]
    assert keys == [True] * 6


def test_mp4_fragmented_rejects_malformed():
    """The fragmented walk keeps the refuse-loudly contract: missing
    trex, the legacy implicit base-offset mode, trun sample counts
    overrunning the box, unsupported trun versions, and a non-empty
    stbl alongside mvex all raise named errors."""
    import pytest

    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    good, *_ = gf._mp4_encode_fragmented(**_frag_args())

    # no trex for the video track: patch trex's track id (7 → 9)
    k = good.index(b"trex")
    assert good[k + 8 : k + 12] == (7).to_bytes(4, "big")
    bad = good[: k + 8] + (9).to_bytes(4, "big") + good[k + 12 :]
    with pytest.raises(ValueError, match="no trex for video track 7"):
        _mp4_sample_index(bad)

    # legacy implicit base mode: clear tfhd's default-base-is-moof flag
    k = good.index(b"tfhd", good.index(b"moof"))
    flags = int.from_bytes(good[k + 5 : k + 8], "big")
    assert flags & 0x020000
    bad = (
        good[: k + 5]
        + (flags & ~0x020000).to_bytes(3, "big")
        + good[k + 8 :]
    )
    with pytest.raises(ValueError, match="unsupported tfhd base-offset"):
        _mp4_sample_index(bad)

    # trun declaring more samples than its box holds
    k = good.index(b"trun", good.index(b"moof"))
    cnt = int.from_bytes(good[k + 8 : k + 12], "big")
    bad = good[: k + 8] + (cnt + 50).to_bytes(4, "big") + good[k + 12 :]
    with pytest.raises(ValueError, match="trun declares 54 samples beyond"):
        _mp4_sample_index(bad)

    # unsupported trun version
    bad = good[: k + 4] + b"\x02" + good[k + 5 :]
    with pytest.raises(ValueError, match="unsupported trun version"):
        _mp4_sample_index(bad)

    # mvex coexisting with a non-empty stbl sample table: declare one
    # sample in the (empty) stsz
    k = good.index(b"stsz")
    bad = good[: k + 12] + (1).to_bytes(4, "big") + good[k + 16 :]
    with pytest.raises(ValueError, match="mvex present alongside"):
        _mp4_sample_index(bad)


# ---------------------------------------------------------------------------
# Property test: random sample-table plans round-trip generator ↔ walker
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _mp4_plans(draw):
    n = draw(st.integers(4, 24))
    # ascending stsc run starts, first always 1
    n_runs = draw(st.integers(1, 3))
    starts = sorted(
        {1}
        | set(draw(st.lists(st.integers(2, 6), max_size=n_runs - 1)))
    )
    stsc = [(s, draw(st.integers(1, 5))) for s in starts]
    # stts runs covering exactly n samples
    cut = draw(st.integers(1, n))
    stts = [(cut, draw(st.integers(1, 4000)))]
    if cut < n:
        stts.append((n - cut, draw(st.integers(1, 4000))))
    tscale = draw(st.sampled_from([600, 1000, 24000, 30000, 90000]))
    stss = draw(
        st.one_of(
            st.none(),
            st.lists(
                st.integers(1, n), min_size=1, max_size=n, unique=True
            ).map(sorted),
        )
    )
    ctts = None
    if draw(st.booleans()):
        ccut = draw(st.integers(1, n))
        ctts = [(ccut, draw(st.integers(0, 5000)))]
        if ccut < n:
            ctts.append((n - ccut, draw(st.integers(0, 5000))))
    elst = draw(
        st.one_of(
            st.none(),
            st.tuples(st.integers(0, 3000)).map(
                lambda t: [(1000, t[0])]
            ),
            st.tuples(st.integers(1, 50), st.integers(0, 3000)).map(
                lambda t: [(t[0], -1), (1000, t[1])]
            ),
        )
    )
    mvts = draw(st.one_of(st.none(), st.sampled_from([10, 600, 90000])))
    return n, stsc, stts, tscale, stss, ctts, elst, mvts


@settings(max_examples=40, deadline=None)
@given(
    plan=_mp4_plans(),
    audio=st.booleans(),
    large=st.booleans(),
    co64=st.booleans(),
    uniform=st.sampled_from([0, 24]),
)
def test_mp4_walker_roundtrips_random_plans(plan, audio, large, co64, uniform):
    """ANY structurally valid combination of chunk layout, timing
    runs, sync table, composition offsets, supported edit plan, movie
    timescale, offset-box width, and mdat form must walk to exactly
    the generator's own bookkeeping — not just the committed fixture
    seeds."""
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    n, stsc, stts, tscale, stss, ctts, elst, mvts = plan
    sizes = [uniform] * n if uniform else [10 + (k % 7) for k in range(n)]
    samples = [bytes([k % 251]) * sz for k, sz in zip(range(n), sizes)]
    payload, offs, ts_ms, keys, pts_ms = gf._mp4_encode(
        samples, stsc, uniform, tscale, stts, audio, large,
        stss_samples=stss, ctts_runs=ctts, use_co64=co64,
        elst_edits=elst, movie_timescale=mvts,
    )
    assert _mp4_sample_index(payload) == list(
        zip(offs, sizes, ts_ms, keys, pts_ms)
    )


@st.composite
def _frag_plans(draw):
    n_frags = draw(st.integers(1, 3))
    counts = [draw(st.integers(2, 6)) for _ in range(n_frags)]
    tscale = draw(st.sampled_from([600, 1000, 30000, 90000]))
    d_dur = draw(st.integers(1, 3003))
    mode = draw(st.sampled_from(["per_sample", "first", "default"]))
    if mode == "per_sample":
        keys = [
            [draw(st.booleans()) for _ in range(c)] for c in counts
        ]
    elif mode == "first":
        keys = [[True] + [False] * (c - 1) for c in counts]
    else:
        keys = [[True] * c for c in counts]
    durs = None
    if draw(st.booleans()):
        durs = [
            [draw(st.integers(1, 4000)) for _ in range(c)] for c in counts
        ]
    ver = draw(st.integers(0, 1))
    cofs = None
    if draw(st.booleans()):
        lo = -2000 if ver == 1 else 0
        cofs = [
            [draw(st.integers(lo, 4000)) for _ in range(c)] for c in counts
        ]
    split = None
    if draw(st.booleans()):
        split = [draw(st.integers(0, max(0, c - 1))) for c in counts]
    elst = draw(
        st.one_of(
            st.none(),
            st.tuples(st.integers(0, 500)).map(lambda t: [(1000, t[0])]),
        )
    )
    return counts, tscale, d_dur, mode, keys, durs, ver, cofs, split, elst


@settings(max_examples=40, deadline=None)
@given(
    plan=_frag_plans(),
    bdo=st.booleans(),
    tfdt=st.booleans(),
    audio=st.booleans(),
)
def test_mp4_fragmented_roundtrips_random_plans(plan, bdo, tfdt, audio):
    """Random fragmented layouts across every supported knob — base
    modes, flags modes, trex/trun durations, v0/v1 composition
    offsets, splits, edits, audio trafs — must walk to exactly the
    generator's bookkeeping."""
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    counts, tscale, d_dur, mode, keys, durs, ver, cofs, split, elst = plan
    frags = [
        [bytes([(fi * 7 + k) % 251]) * (12 + k) for k in range(c)]
        for fi, c in enumerate(counts)
    ]
    payload, offs, ts_ms, kf, pts_ms, _ = gf._mp4_encode_fragmented(
        frags, tscale, d_dur, keys, flags_mode=mode,
        dur_overrides=durs, ctts_offsets=cofs, trun_version=ver,
        base_data_offset=bdo, tfdt=tfdt, audio_trak=audio,
        trun_split=split, elst_edits=elst,
    )
    sizes = [len(s) for f in frags for s in f]
    assert _mp4_sample_index(payload) == list(
        zip(offs, sizes, ts_ms, kf, pts_ms)
    )


# ---------------------------------------------------------------------------
# ADVICE 2: nearest_centroid_assign's dist column contract per path
# ---------------------------------------------------------------------------


def test_nearest_centroid_assign_dist_contract(spark):
    """The emitted ``dist`` switches type AND meaning with the path
    (now stated in the return contract): default → DOUBLE rounded-6dp
    euclidean; int_dist → the caller's exact integer channel. Pin both
    on a 2-vector / 2-centroid frame with hand-computed values."""
    from pyspark.sql import functions as F

    from micmac_li3ds_spark.operators.llm_vector import (
        nearest_centroid_assign,
    )

    e = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [3.0, 4.0])], "vec_id long, v array<double>"
    )
    c = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [3.0, 0.0])], "cid long, cv array<double>"
    )

    out = nearest_centroid_assign(e, c, n_centroids=2)
    assert dict(out.dtypes)["dist"] == "double"
    rows = {r.vec_id: r for r in out.collect()}
    assert (rows[1].centroid_id, rows[1].dist) == (0, 0.0)
    assert (rows[2].centroid_id, rows[2].dist) == (1, 4.0)

    # int_dist path: squared L2 over integer-valued coordinates —
    # exact LONG arithmetic, emitted dist is the raw integer minimum
    d2 = F.aggregate(
        F.zip_with(
            "v", "cv", lambda x, y: ((x - y) * (x - y)).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    out_i = nearest_centroid_assign(e, c, n_centroids=2, int_dist=d2)
    assert dict(out_i.dtypes)["dist"] == "bigint"
    rows_i = {r.vec_id: r for r in out_i.collect()}
    assert (rows_i[1].centroid_id, rows_i[1].dist) == (0, 0)
    assert (rows_i[2].centroid_id, rows_i[2].dist) == (1, 16)


def test_decode_wav_even_data_still_round_trips():
    """The oddness guard must not disturb the even path."""
    from micmac_li3ds_spark.operators.multimodal import _decode_wav

    samples = [0, 16384, -16384, 32767, -32768, 1, -1, 8192]
    assert _decode_wav(_wav_bytes(samples), "audio/x-wav-pcm") == [
        abs(s) / 32768.0 for s in samples
    ]


# ---------------------------------------------------------------------------
# Verdict 4: kmeans_step's measured assign-then-rejoin ≡ the wide spelling
# ---------------------------------------------------------------------------


def test_kmeans_step_rejoin_bit_identical_to_wide_spelling(spark):
    """q_llm_kmeans_step ships the MEASURED winner since r12
    (assign-then-rejoin, SCALE.md §20). Standing gate: the full query
    must stay bit-identical to the retired wide spelling (member
    vector as an extra grouping column) — same packed-key argmin, same
    quantized means, same member counts."""
    from pyspark.sql import functions as F

    from micmac_li3ds_spark.operators.llm_vector import (
        _N_CENTROIDS,
        _emb,
        nearest_centroid_assign,
        q_llm_kmeans_step,
    )
    from tests.conftest import SF_DIR

    new = q_llm_kmeans_step(spark, SF_DIR)

    e = _emb(spark, SF_DIR)
    c = e.filter(F.col("vec_id") < _N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    assigned = nearest_centroid_assign(
        e, c, ("v",), n_centroids=_N_CENTROIDS
    ).select("vec_id", "v", F.col("centroid_id").alias("cid"))
    dims = assigned.select("cid", F.posexplode("v").alias("i", "x"))
    comp = dims.groupBy("cid", "i").agg(
        F.round(F.avg("x") * 10000).cast("long").alias("q")
    )
    members = assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    cent = comp.groupBy("cid").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "q"))),
                lambda s: s.getField("q").cast("string"),
            ),
            ",",
        ).alias("centroid_q")
    )
    old = cent.join(members, "cid").select(
        F.col("cid").alias("centroid_id"), "n_members", "centroid_q"
    )

    assert sorted(map(tuple, new.collect())) == sorted(
        map(tuple, old.collect())
    )


# ---------------------------------------------------------------------------
# Verdict 3: keyframe-aware BMFF sampling — stss + ctts in the walk
# ---------------------------------------------------------------------------


def test_mp4_walker_stss_keyframe_flags():
    """stss present: exactly the listed 1-based sample numbers flag as
    keyframes — including a track whose FIRST keyframe is not sample 1
    (the assumption cheap walkers bake in)."""
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    samples = [bytes([k]) * 10 for k in range(6)]
    payload, *_ = gf._mp4_encode(
        samples, [(1, 3)], 0, 1000, [(6, 40)], False, False,
        stss_samples=[2, 5],
    )
    got = _mp4_sample_index(payload)
    assert [key for (_, _, _, key, _) in got] == [
        False, True, False, False, True, False,
    ]


def test_mp4_walker_ctts_presentation_times():
    """ctts present: pts = dts + offset per run, hand-computed — and a
    reordered (B-frame-style) offset plan must come back non-monotone
    in decode order while dts stays monotone."""
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    samples = [bytes([k]) * 10 for k in range(5)]
    # dts units: 0,100,200,300,400; offsets: 250,0,0,50,50
    payload, offs, ts_ms, keys, pts_ms = gf._mp4_encode(
        samples, [(1, 5)], 0, 1000, [(5, 100)], False, False,
        ctts_runs=[(1, 250), (2, 0), (2, 50)],
    )
    got = _mp4_sample_index(payload)
    want_pts_units = [250, 100, 200, 350, 450]
    assert [p for (_, _, _, _, p) in got] == [
        u * 1000 // 1000 for u in want_pts_units
    ]
    assert pts_ms == [u * 1000 // 1000 for u in want_pts_units]
    dts = [t for (_, _, t, _, _) in got]
    pts = [p for (_, _, _, _, p) in got]
    assert dts == sorted(dts) and pts != sorted(pts)
    assert keys == [True] * 5  # no stss → all sync


def test_mp4_walker_reads_co64_chunk_offsets():
    """co64 (64-bit chunk offsets — mandatory past 4 GiB, i.e. on the
    payloads a 100-TB lake actually holds) must walk identically to
    the stco spelling of the same layout, and a payload carrying
    NEITHER must raise the named structural error."""
    import pytest

    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    samples = [bytes([k]) * 12 for k in range(6)]
    args = (samples, [(1, 2), (2, 4)], 0, 1000, [(6, 40)], False, True)
    p32, offs32, ts32, k32, pts32 = gf._mp4_encode(*args)
    p64, offs64, ts64, k64, pts64 = gf._mp4_encode(*args, use_co64=True)
    assert b"co64" in p64 and b"stco" not in p64
    # same logical layout → same sizes/timestamps; offsets shift by
    # the box-width delta (4 extra bytes per chunk entry in moov)
    got64 = _mp4_sample_index(p64)
    assert got64 == list(zip(offs64, [12] * 6, ts64, k64, pts64))
    assert [t for (_, _, t, _, _) in got64] == ts32
    assert _mp4_sample_index(p32) == list(
        zip(offs32, [12] * 6, ts32, k32, pts32)
    )
    # entry-count overrun keeps the family contract on the new box
    k = p64.index(b"co64")
    n_chunks = int.from_bytes(p64[k + 8 : k + 12], "big")
    bad = p64[: k + 8] + (n_chunks + 9).to_bytes(4, "big") + p64[k + 12 :]
    with pytest.raises(ValueError, match="co64 declares .* beyond"):
        _mp4_sample_index(bad)
    # neither stco nor co64 present
    stripped = p32.replace(b"stco", b"xxco")
    with pytest.raises(ValueError, match="missing stco/co64"):
        _mp4_sample_index(stripped)


def test_mp4_walker_elst_presentation_shift():
    """Edit lists adjust presentation time three ways, each
    hand-computed: (1) the classic single edit whose media_time
    swallows a constant ctts baseline → pts == dts; (2) an empty-edit
    delay in MOVIE timescale + offset edit, with movie != media
    timescale so the unit conversion is exercised; (3) a trimming
    edit that lands mid-GOP → leading samples (keyframes included)
    come back with NEGATIVE pts."""
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    samples = [bytes([k]) * 10 for k in range(6)]

    # (1) media_time 200 cancels the constant ctts offset 200
    p, offs, ts_ms, keys, pts_ms = gf._mp4_encode(
        samples, [(1, 3)], 0, 1000, [(6, 100)], False, False,
        ctts_runs=[(6, 200)], elst_edits=[(600, 200)],
    )
    got = _mp4_sample_index(p)
    assert [pm for (_, _, _, _, pm) in got] == ts_ms == pts_ms

    # (2) empty edit of 3 movie units at movie timescale 10 = 300
    # media units at media timescale 1000, then media_time 100
    # subtracts → shift +200 → pts = dts + 200 ms
    p, offs, ts_ms, keys, pts_ms = gf._mp4_encode(
        samples, [(1, 3)], 0, 1000, [(6, 100)], False, False,
        elst_edits=[(3, -1), (600, 100)], movie_timescale=10,
    )
    got = _mp4_sample_index(p)
    assert [pm for (_, _, _, _, pm) in got] == [t + 200 for t in ts_ms]
    assert pts_ms == [t + 200 for t in ts_ms]

    # (3) media_time 150 trims mid-GOP: dts 0,100 → pts −150,−50
    p, offs, ts_ms, keys, pts_ms = gf._mp4_encode(
        samples, [(1, 3)], 0, 1000, [(6, 100)], False, False,
        elst_edits=[(450, 150)],
    )
    got = _mp4_sample_index(p)
    assert [pm for (_, _, _, _, pm) in got] == [-150, -50, 50, 150, 250, 350]
    assert pts_ms == [-150, -50, 50, 150, 250, 350]


def test_mp4_walker_rejects_unsupported_elst():
    """Splicing plans, rate changes, and non-v0 elst refuse loudly —
    the family's contract — rather than silently mistiming frames."""
    import pytest

    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    samples = [bytes([k]) * 10 for k in range(4)]
    good, *_ = gf._mp4_encode(
        samples, [(1, 2)], 0, 1000, [(4, 100)], False, False,
        elst_edits=[(400, 50)],
    )
    k = good.index(b"elst")
    # non-v0
    bad = good[: k + 4] + b"\x01" + good[k + 5 :]
    with pytest.raises(ValueError, match="only version-0 elst"):
        _mp4_sample_index(bad)
    # entry count overrun
    bad = good[: k + 8] + (5).to_bytes(4, "big") + good[k + 12 :]
    with pytest.raises(ValueError, match="elst declares 5 entries beyond"):
        _mp4_sample_index(bad)
    # media_rate != 1.0 (patch the 0x00010000 at entry offset +8)
    rate_off = k + 12 + 8
    assert good[rate_off : rate_off + 4] == (0x00010000).to_bytes(4, "big")
    bad = (
        good[:rate_off] + (0x00020000).to_bytes(4, "big")
        + good[rate_off + 4 :]
    )
    with pytest.raises(ValueError, match="unsupported elst media_rate"):
        _mp4_sample_index(bad)
    # a two-edit plan where BOTH are non-empty (splicing) is refused;
    # build it byte-wise from the one-edit payload: bump the count and
    # splice in a second non-empty entry, growing every enclosing box
    # (elst/edts/trak/moov) by 12 bytes
    entry2 = (100).to_bytes(4, "big") + (0).to_bytes(4, "big") + (
        0x00010000
    ).to_bytes(4, "big")
    bad = bytearray(good)
    insert_at = k + 12 + 12
    bad[insert_at:insert_at] = entry2
    bad[k + 8 : k + 12] = (2).to_bytes(4, "big")
    # grow the sizes of elst (size field at k-4, preceding the type
    # tag), edts (k-12), and the enclosing trak/moov
    for hdr in (k - 4, k - 12):
        sz = int.from_bytes(bad[hdr : hdr + 4], "big")
        bad[hdr : hdr + 4] = (sz + 12).to_bytes(4, "big")
    # moov and trak: find by walking from the top
    moov_at = bytes(bad).index(b"moov") - 4
    sz = int.from_bytes(bad[moov_at : moov_at + 4], "big")
    bad[moov_at : moov_at + 4] = (sz + 12).to_bytes(4, "big")
    trak_at = bytes(bad).index(b"trak") - 4
    sz = int.from_bytes(bad[trak_at : trak_at + 4], "big")
    bad[trak_at : trak_at + 4] = (sz + 12).to_bytes(4, "big")
    with pytest.raises(ValueError, match="unsupported elst edit plan"):
        _mp4_sample_index(bytes(bad))


def test_mp4_walker_rejects_malformed_stss_ctts():
    """The new tables keep the family's raise-on-malformed contract:
    out-of-range stss sample numbers, non-v0 versions, overrunning
    entry counts, and ctts/stsz coverage mismatches all raise the
    named structural error."""
    import pytest

    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    samples = [bytes([k]) * 10 for k in range(4)]

    def enc(**kw):
        payload, *_ = gf._mp4_encode(
            samples, [(1, 2)], 0, 1000, [(4, 40)], False, False, **kw
        )
        return payload

    # stss sample number out of [1, n]: patch a valid box's entry
    good = enc(stss_samples=[1, 3])
    k = good.index(b"stss")
    assert good[k + 12 : k + 16] == (1).to_bytes(4, "big")
    bad = good[: k + 12] + (9).to_bytes(4, "big") + good[k + 16 :]
    with pytest.raises(ValueError, match="stss sync sample 9 outside"):
        _mp4_sample_index(bad)
    bad = good[: k + 12] + (0).to_bytes(4, "big") + good[k + 16 :]
    with pytest.raises(ValueError, match="stss sync sample 0 outside"):
        _mp4_sample_index(bad)
    # stss entry count overrunning its own box
    bad = good[: k + 8] + (7).to_bytes(4, "big") + good[k + 12 :]
    with pytest.raises(ValueError, match="stss declares 7 entries beyond"):
        _mp4_sample_index(bad)
    # non-v0 stss
    bad = good[: k + 4] + b"\x01" + good[k + 5 :]
    with pytest.raises(ValueError, match="only version-0 stss"):
        _mp4_sample_index(bad)

    # ctts covering fewer samples than stsz declares
    good = enc(ctts_runs=[(4, 50)])
    k = good.index(b"ctts")
    assert good[k + 12 : k + 16] == (4).to_bytes(4, "big")
    bad = good[: k + 12] + (3).to_bytes(4, "big") + good[k + 16 :]
    with pytest.raises(ValueError, match="ctts covers 3 samples but"):
        _mp4_sample_index(bad)
    # non-v0 ctts (version 1 carries SIGNED offsets — refusing beats
    # silently reading them unsigned)
    bad = good[: k + 4] + b"\x01" + good[k + 5 :]
    with pytest.raises(ValueError, match="only version-0 ctts"):
        _mp4_sample_index(bad)
    # ctts entry count overrunning its own box
    bad = good[: k + 8] + (5).to_bytes(4, "big") + good[k + 12 :]
    with pytest.raises(ValueError, match="ctts declares 5 entries beyond"):
        _mp4_sample_index(bad)
