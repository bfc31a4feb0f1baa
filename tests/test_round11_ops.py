"""Round-11 consolidation tests.

The round-10 verdict made round 11 another consolidation round (zero
free window slots): migrate the LAST two consumers of the retired
Window.partitionBy(vec_id) row_number argmin — q_llm_kmeans_step and
kmeans_fixpoint/q_llm_kmeans_fix — onto the packed-BIGINT
nearest_centroid_assign (items 2/3), harden the packing precondition
from a centroid COUNT check to a distributed cid VALUE guard (ADVICE
r10 item 1), and land the third real zero-dependency media codec (WAV
PCM, item 4 — tested in its own section below alongside the BMP/P6
precedent in test_round10_ops.py). Each migration ships the bit-exact
equivalence test against the retired spelling that the verdict's
done-criteria demand, mirroring the r9 copurchase_edges / r10
cluster_assign precedents: prove old ≡ new BEFORE the re-attestation
window is cut.

Late-round sections extend the media surface past the verdict queue:
real PNG (stdlib-zlib inflate + all five filters), real GIF (a
from-the-spec LZW pair whose independent encoder/decoder caught a
genuine width-timing interop bug), real AIFF (big-endian IFF, 80-bit
extended-float rate), and a real ISO BMFF sample-table walk for frame
sampling — plus hypothesis property tests over the codec pairings,
truncation-path contract tests from the round's self-review, and an
executed-plan pin that both media queries stay shuffle-free.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# Verdict items 2/3: the kmeans pair's argmin ≡ the retired window spelling
# ---------------------------------------------------------------------------


def test_kmeans_step_assignment_bit_identical_to_window_spelling(spark):
    """q_llm_kmeans_step's assignment stage (now nearest_centroid_assign
    with the member vector riding as an extra grouping column) must pick
    bit-identical (vec_id, cid) winners to the retired
    Window.partitionBy(vec_id).orderBy(dist, cid) row_number spelling —
    same 6dp-rounded float distance, same centroid-id tiebreak."""
    from micmac_li3ds_spark.operators.llm_vector import (
        _N_CENTROIDS,
        _emb,
        nearest_centroid_assign,
    )

    e = _emb(spark, SF_DIR)
    c = e.filter(F.col("vec_id") < _N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )

    new = nearest_centroid_assign(e, c, ("v",), n_centroids=_N_CENTROIDS).select(
        "vec_id", "v", F.col("centroid_id").alias("cid")
    )

    # the retired spelling, reproduced verbatim from the r10 tree
    dist = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with("v", "cv", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        6,
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    old = (
        e.crossJoin(F.broadcast(c))
        .select("vec_id", "v", "cid", dist.alias("dist"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "v", "cid")
    )

    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0
    assert new.count() == e.count()  # one winner per vector, none dropped


def test_kmeans_fixpoint_assignment_bit_identical_to_window_spelling(spark):
    """kmeans_fixpoint's integer assignment stage (nearest_centroid_assign
    with int_dist = the exact quantized squared L2) must pick
    bit-identical winners to the retired row_number-over-(d2, cid)
    spelling. Exercised on the REAL first-iteration state (1e-4
    quantized corpus, first-k centroids) so the integer packing is
    tested at the magnitudes the production query feeds it."""
    from micmac_li3ds_spark.operators.llm_vector import (
        _N_CENTROIDS,
        _emb,
        nearest_centroid_assign,
    )

    e = _emb(spark, SF_DIR).select(
        "vec_id",
        F.transform("v", lambda x: F.round(x * 10000).cast("long")).alias("vq"),
    )
    cent = e.filter(F.col("vec_id") < _N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("vq").alias("cq")
    )
    d2 = F.aggregate(
        F.zip_with("vq", "cq", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )

    new = nearest_centroid_assign(
        e, cent, ("vq",), n_centroids=_N_CENTROIDS, int_dist=d2
    ).select("vec_id", "vq", F.col("centroid_id").alias("cid"))

    # the retired spelling, reproduced verbatim from the r10 tree
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    old = (
        e.crossJoin(F.broadcast(cent))
        .select("vec_id", "vq", "cid", d2.alias("d2"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "vq", "cid")
    )

    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0
    assert new.count() == e.count()


def test_kmeans_fix_full_query_matches_pre_migration_spelling(spark):
    """End-to-end: 2 chained Lloyd iterations through the migrated
    kmeans_fixpoint equal the SAME recurrence with the retired window
    argmin — the exact-integer state makes this bit-for-bit, so any
    divergence (packing overflow, tiebreak drift, a later iteration
    seeing a different assignment) fails loudly."""
    from micmac_li3ds_spark.operators.llm_vector import (
        _KM_B,
        _N_CENTROIDS,
        _emb,
        kmeans_fixpoint,
    )

    new = kmeans_fixpoint(spark, SF_DIR, 2)

    e = _emb(spark, SF_DIR).select(
        "vec_id",
        F.transform("v", lambda x: F.round(x * 10000).cast("long")).alias("vq"),
    )
    comp = (
        e.filter(F.col("vec_id") < _N_CENTROIDS)
        .select(F.col("vec_id").alias("cid"), F.posexplode("vq").alias("i0", "q"))
        .select("cid", (F.col("i0") + 1).alias("i"), "q")
    )
    assigned = None
    for _ in range(2):
        cent = comp.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "q"))),
                lambda s: s.getField("q"),
            ).alias("cq")
        )
        d2 = F.aggregate(
            F.zip_with("vq", "cq", lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        w = Window.partitionBy("vec_id").orderBy("d2", "cid")
        assigned = (
            e.crossJoin(F.broadcast(cent))
            .select("vec_id", "vq", "cid", d2.alias("d2"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("vec_id", "vq", "cid")
        )
        comp = (
            assigned.select("cid", F.posexplode("vq").alias("i0", "x"))
            .select("cid", (F.col("i0") + 1).alias("i"), "x")
            .groupBy("cid", "i")
            .agg(
                F.expr(
                    f"(2 * (sum(x) + {_KM_B} * count(*)) + count(*))"
                    f" div (2 * count(*)) - {_KM_B}"
                ).alias("q")
            )
        )
    members = assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("n_members"))
    cent_str = comp.groupBy("cid").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "q"))),
                lambda s: s.getField("q").cast("string"),
            ),
            ",",
        ).alias("centroid_q")
    )
    old = cent_str.join(members, "cid").select(
        F.col("cid").alias("centroid_id"), "n_members", "centroid_q"
    )

    assert sorted(new.collect()) == sorted(old.collect())


# ---------------------------------------------------------------------------
# ADVICE r10 item 1: the packed key's cid VALUE guard
# ---------------------------------------------------------------------------


def test_argmin_accepts_sparse_in_range_cids(spark):
    """The packing precondition is on cid VALUES, not density: sparse /
    offset ids inside [0, 2^17) are legal and must rank correctly (the
    guard may only reject, never distort)."""
    from micmac_li3ds_spark.operators.llm_vector import (
        _ARGMIN_CID_MULT,
        nearest_centroid_assign,
    )

    e = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [10.0, 0.0])], "vec_id long, v array<double>"
    )
    c = spark.createDataFrame(
        [(7, [1.0, 0.0]), (_ARGMIN_CID_MULT - 1, [9.0, 0.0])],
        "cid long, cv array<double>",
    )
    got = {
        r["vec_id"]: r["centroid_id"]
        for r in nearest_centroid_assign(e, c).collect()
    }
    assert got == {1: 7, 2: _ARGMIN_CID_MULT - 1}


@pytest.mark.parametrize("bad_cid", [131072, 200000, -1])
def test_argmin_rejects_out_of_range_cids_at_execution(spark, bad_cid):
    """ADVICE r10: a cid at/above _ARGMIN_CID_MULT (or negative) passes
    the n_centroids COUNT check yet would bleed into the distance bits
    and silently mis-rank. The conditional raise_error folded into the
    ordering-key projection turns that silent corruption into a loud
    execution-time failure — with no driver-side pass over the
    centroid frame."""
    from micmac_li3ds_spark.operators.llm_vector import nearest_centroid_assign

    e = spark.createDataFrame([(1, [0.0])], "vec_id long, v array<double>")
    c = spark.createDataFrame(
        [(0, [1.0]), (bad_cid, [2.0])], "cid long, cv array<double>"
    )
    with pytest.raises(Exception, match="outside \\[0, 131072\\)"):
        nearest_centroid_assign(e, c).collect()


# ---------------------------------------------------------------------------
# Verdict item 4: real zero-dependency WAV PCM decoder
# ---------------------------------------------------------------------------


def _wav_bytes(samples, n_ch=1, rate=8000, pre_chunks=b""):
    """Hand-assemble a RIFF/WAVE payload (mirrors the fixture
    generator's layout, reimplemented here so a shared bug can't be
    self-consistent)."""
    data = b"".join(
        int(s).to_bytes(2, "little", signed=True) for s in samples
    )
    fmt_body = (
        (1).to_bytes(2, "little")
        + n_ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * 2 * n_ch).to_bytes(4, "little")
        + (2 * n_ch).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = (
        b"fmt " + len(fmt_body).to_bytes(4, "little") + fmt_body
        + pre_chunks
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def test_decode_wav_known_samples():
    """8 samples → 8 windows of one sample each: features are exactly
    |s|/32768 per sample, checked against hand-computed values
    (including the −32768 edge, whose |·| is 32768 → feature 1.0)."""
    from micmac_li3ds_spark.operators.multimodal import _decode_wav

    samples = [0, 16384, -16384, 32767, -32768, 1, -1, 8192]
    got = _decode_wav(_wav_bytes(samples), "audio/x-wav-pcm")
    want = [abs(s) / 32768.0 for s in samples]
    assert got == want


def test_decode_wav_windowing_matches_strip_rule():
    """n=12 samples into 8 windows via (j·8)//12: windows {0,3,6} get
    two samples, the rest one — verify the exact partition and the
    integer-sum/one-division arithmetic."""
    from micmac_li3ds_spark.operators.multimodal import _decode_wav

    samples = list(range(100, 1300, 100))  # 100..1200, 12 samples
    got = _decode_wav(_wav_bytes(samples), "audio/x-wav-pcm")
    wins = [[] for _ in range(8)]
    for j, s in enumerate(samples):
        wins[(j * 8) // 12].append(abs(s))
    want = [sum(w) / (32768.0 * len(w)) for w in wins]
    assert got == want
    assert [len(w) for w in wins] == [2, 1, 2, 1, 2, 1, 2, 1]


def test_decode_wav_walks_interleaved_and_odd_chunks():
    """The chunk walk must skip a LIST chunk between fmt and data AND
    honor RIFF word alignment for an odd-sized chunk (pad byte) —
    decoding the same samples to the same features regardless of the
    junk between the chunks."""
    from micmac_li3ds_spark.operators.multimodal import _decode_wav

    samples = [1000, -2000, 3000, -4000, 5000, -6000, 7000, -8000]
    base = _decode_wav(_wav_bytes(samples), "audio/x-wav-pcm")
    lst = b"LIST" + (8).to_bytes(4, "little") + b"INFOfix!"
    odd = b"junk" + (7).to_bytes(4, "little") + b"\x01" * 7 + b"\x00"
    for pre in (lst, odd, lst + odd):
        assert _decode_wav(
            _wav_bytes(samples, pre_chunks=pre), "audio/x-wav-pcm"
        ) == base


@pytest.mark.parametrize(
    "mutate, match",
    [
        (lambda b: b"JUNK" + b[4:], "not a RIFF/WAVE"),
        (lambda b: b.replace(b"fmt ", b"fmtX"), "missing fmt"),
        (lambda b: b.replace(b"data", b"datt"), "missing fmt /data"),
        (
            lambda b: b.replace(
                (1).to_bytes(2, "little") + (1).to_bytes(2, "little"),
                (3).to_bytes(2, "little") + (1).to_bytes(2, "little"),
                1,
            ),
            "only 16-bit PCM",
        ),
    ],
)
def test_decode_wav_rejects_malformed(mutate, match):
    from micmac_li3ds_spark.operators.multimodal import _decode_wav

    payload = mutate(_wav_bytes([100, 200, 300, 400, 500, 600, 700, 800]))
    with pytest.raises(ValueError, match=match):
        _decode_wav(payload, "audio/x-wav-pcm")


def test_decode_wav_rejects_truncated_data():
    from micmac_li3ds_spark.operators.multimodal import _decode_wav

    good = _wav_bytes([100, 200, 300, 400, 500, 600, 700, 800])
    with pytest.raises(ValueError, match="truncated data"):
        _decode_wav(good[:-4], "audio/x-wav-pcm")


def test_wav_fixture_offsets_match_decoder_walk(spark):
    """The fixture's generation-time (data_off, n_samples) — the
    oracle's independent coordinates — must agree with what the
    decoder's own chunk walk finds, for every fixture row (all three
    chunk layouts)."""
    import struct

    from micmac_li3ds_spark.operators.multimodal import load_media_wav

    for r in load_media_wav(spark).collect():
        p = bytes(r["payload"])
        i = 12
        found = None
        while i + 8 <= len(p):
            (sz,) = struct.unpack_from("<I", p, i + 4)
            if p[i : i + 4] == b"data":
                found = (i + 8, sz // 2)
                break
            i += 8 + sz + (sz & 1)
        assert found == (r["data_off"], r["n_samples"]), r["media_id"]


# ---------------------------------------------------------------------------
# ADVICE r10 item 4: P6 post-maxval byte must be whitespace
# ---------------------------------------------------------------------------


def test_decode_ppm_rejects_comment_glued_to_maxval():
    """'P6\\n8 2\\n255# c\\n…' — a comment byte immediately after the
    maxval token previously mis-offset the pixel data or failed
    confusingly; it must now raise a clear malformed-header error."""
    from micmac_li3ds_spark.operators.multimodal import _decode_ppm

    payload = b"P6\n8 2\n255# c\n" + bytes(48)
    with pytest.raises(ValueError, match="malformed P6 header"):
        _decode_ppm(payload, "image/x-portable-pixmap")


def test_int_dist_packed_key_is_lexicographic():
    """Pure-python mirror of the int_dist packing contract: for integer
    distances up to the documented 2^63/_ARGMIN_CID_MULT headroom, min
    over d2·M + cid agrees with lexicographic (d2, cid) — including the
    exact-tie and off-by-one-distance adversarial cases."""
    from micmac_li3ds_spark.operators.llm_vector import _ARGMIN_CID_MULT

    M = _ARGMIN_CID_MULT
    cases = [
        [(5, 3), (5, 1), (5, 2)],  # exact distance tie → lowest cid
        [(7, 0), (6, M - 1)],  # smaller d2 beats any cid
        [(10**11, 5), (10**11 - 1, M - 1)],  # corpus-scale magnitudes
        [(2**63 // M - 1, M - 1), (2**63 // M - 1, 0)],  # headroom edge
    ]
    for pairs in cases:
        want = min(pairs)
        got = min(pairs, key=lambda p: p[0] * M + p[1])
        assert got == want, pairs

# ---------------------------------------------------------------------------
# Late r11: real zero-dependency PNG decoder (first compressed format)
# ---------------------------------------------------------------------------


def _png_bytes(raw, w, h, filters, zlevel=6, n_idat=1, breaker=None):
    """Hand-assemble an 8-bit RGB non-interlaced PNG (mirrors the
    fixture generator's ENCODER, reimplemented here so a shared
    filter-apply bug can't be self-consistent). ``breaker`` lets the
    malformed-payload tests corrupt one assembly step."""
    import zlib

    def chunk(typ, body):
        return (
            len(body).to_bytes(4, "big")
            + typ
            + body
            + zlib.crc32(typ + body).to_bytes(4, "big")
        )

    stride = 3 * w
    prior = bytes(stride)
    lines = []
    for r in range(h):
        cur = raw[r * stride : (r + 1) * stride]
        f = filters[r % len(filters)]
        out = bytearray()
        for i in range(stride):
            a = cur[i - 3] if i >= 3 else 0
            b = prior[i]
            c = prior[i - 3] if i >= 3 else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
            out.append((cur[i] - pred) & 0xFF)
        lines.append(bytes([f]) + bytes(out))
        prior = cur
    stream = b"".join(lines)
    if breaker == "filter_type":
        stream = b"\x05" + stream[1:]
    z = zlib.compress(stream, zlevel)
    step = max(1, (len(z) + n_idat - 1) // n_idat)
    parts = [z[i : i + step] for i in range(0, len(z), step)]
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    if breaker == "gray":
        ihdr = ihdr[:9] + bytes([0]) + ihdr[10:]
    if breaker == "interlace":
        ihdr = ihdr[:12] + bytes([1])
    out = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + b"".join(chunk(b"IDAT", p) for p in parts)
    )
    if breaker != "no_iend":
        out += chunk(b"IEND", b"")
    return out


def _strip_truth(raw, w, h):
    import numpy as np

    from micmac_li3ds_spark.operators.multimodal import _strip_means

    px = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    return _strip_means(px.sum(axis=2, dtype=np.int64).sum(axis=0), w, h)


def test_decode_png_solid_color_every_filter():
    """A solid-color image has every strip mean equal to (r+g+b)/768
    exactly, whatever filter encodes it — checked per filter type."""
    from micmac_li3ds_spark.operators.multimodal import _decode_png

    raw = bytes([10, 200, 33]) * (16 * 4)
    want = [(10 + 200 + 33) / 768.0] * 8
    for f in range(5):
        assert _decode_png(_png_bytes(raw, 16, 4, [f]), "image/png") == want


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_decode_png_each_filter_inverts_exactly(filt):
    """Random pixels, every scanline under one filter type: the
    decoder's inverse must reproduce the numpy ground truth of the raw
    bytes bit-exactly (isolates a per-filter bug to its type)."""
    import random

    from micmac_li3ds_spark.operators.multimodal import _decode_png

    rng = random.Random(1000 + filt)
    w, h = 13, 7
    raw = bytes(rng.randint(0, 255) for _ in range(3 * w * h))
    got = _decode_png(_png_bytes(raw, w, h, [filt]), "image/png")
    assert got == _strip_truth(raw, w, h)


def test_decode_png_multi_idat_and_level_invariance():
    """The same pixels through 1 vs 4 IDAT chunks and zlib levels
    0 (stored) vs 9 must decode identically — exercises IDAT
    concatenation-before-inflate and inflate of stored blocks."""
    import random

    from micmac_li3ds_spark.operators.multimodal import _decode_png

    rng = random.Random(77)
    w, h = 11, 6
    raw = bytes(rng.randint(0, 255) for _ in range(3 * w * h))
    base = _decode_png(_png_bytes(raw, w, h, [0, 1, 2, 3, 4]), "image/png")
    assert base == _strip_truth(raw, w, h)
    for zlevel, n_idat in ((0, 1), (9, 4), (0, 4)):
        assert (
            _decode_png(
                _png_bytes(raw, w, h, [0, 1, 2, 3, 4], zlevel, n_idat),
                "image/png",
            )
            == base
        )


def test_decode_png_paeth_tie_breaking():
    """Paeth prefers a, then b, then c on ties (PNG spec order). A
    first row under Paeth has b = c = 0 so the predictor must be a —
    an encoder/decoder pair that both get tie order wrong would still
    agree, so check the DECODED PIXELS against hand-applied spec."""
    from micmac_li3ds_spark.operators.multimodal import _decode_png

    # w=8, h=1: one Paeth row; a-chain reconstruction
    raw = bytes([5, 5, 5, 10, 10, 10, 10, 10, 10, 7, 7, 7] * 2)
    got = _decode_png(_png_bytes(raw, 8, 1, [4]), "image/png")
    assert got == _strip_truth(raw, 8, 1)


@pytest.mark.parametrize(
    "mutate, match",
    [
        (lambda b: b"JUNK" + b[4:], "not a PNG"),
        # flip one bit inside the first IDAT body -> CRC mismatch
        (
            lambda b: b[:45] + bytes([b[45] ^ 0x01]) + b[46:],
            "CRC mismatch",
        ),
        (lambda b: b[: len(b) - 12], "missing IHDR/IDAT/IEND"),
    ],
)
def test_decode_png_rejects_corruption(mutate, match):
    from micmac_li3ds_spark.operators.multimodal import _decode_png

    raw = bytes(range(48)) * 2  # 8x4 RGB
    payload = mutate(_png_bytes(raw, 8, 4, [0]))
    with pytest.raises(ValueError, match=match):
        _decode_png(payload, "image/png")


@pytest.mark.parametrize(
    "breaker, match",
    [
        ("gray", "only 8-bit RGB"),
        ("interlace", "only 8-bit RGB"),
        ("filter_type", "unknown PNG filter type"),
        ("no_iend", "missing IHDR/IDAT/IEND"),
    ],
)
def test_decode_png_rejects_unsupported(breaker, match):
    from micmac_li3ds_spark.operators.multimodal import _decode_png

    raw = bytes(range(48)) * 2
    payload = _png_bytes(raw, 8, 4, [0], breaker=breaker)
    with pytest.raises(ValueError, match=match):
        _decode_png(payload, "image/png")


def test_png_fixtures_decode_to_generation_ground_truth(spark):
    """Every committed fixture row: the full decode (chunk walk + CRC +
    multi-IDAT inflate + unfilter) must land exactly on the strip means
    of the generation-time raw_px bytes — the coordinates the oracle
    recomputes from, so this is the decoder≡oracle bridge."""
    from micmac_li3ds_spark.operators.multimodal import (
        _decode_png,
        load_media_png,
    )

    rows = load_media_png(spark).collect()
    assert len(rows) == 12
    for r in rows:
        got = _decode_png(bytes(r["payload"]), r["mime"])
        assert got == _strip_truth(
            bytes(r["raw_px"]), r["width"], r["height"]
        ), r["media_id"]


def test_feature_extract_png_branch_distributed(spark):
    """The registered union query carries the PNG branch through the
    real mapInPandas plumbing: 12 rows tagged png8-strips-v1, features
    matching the local decode."""
    from micmac_li3ds_spark.operators.multimodal import (
        _decode_png,
        load_media_png,
        q_mm_feature_extract,
    )

    out = (
        q_mm_feature_extract(spark, SF_DIR)
        .filter(F.col("decoder") == "png8-strips-v1")
        .collect()
    )
    assert len(out) == 12
    local = {
        r["media_id"]: _decode_png(bytes(r["payload"]), r["mime"])
        for r in load_media_png(spark).collect()
    }
    for row in out:
        assert [row[f"f{i}"] for i in range(8)] == local[row["media_id"]]

# ---------------------------------------------------------------------------
# Late r11: real GIF decoder with a from-the-spec LZW decompressor
# ---------------------------------------------------------------------------


def _gif_encoder():
    """Import the fixture generator's independent LZW COMPRESSOR (the
    decoder's adversarial twin — see _png_bytes for the discipline;
    here the compressor is substantial enough that the test reuses the
    generator's rather than writing a third implementation, and
    independence is between gen_fixtures.py and multimodal.py)."""
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "gen_fixtures.py",
    )
    spec = importlib.util.spec_from_file_location("_genfix", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._gif_encode


def _gif_truth(palette, idx, w, h):
    raw = b"".join(palette[3 * j : 3 * j + 3] for j in idx)
    return _strip_truth(raw, w, h)


def test_decode_gif_solid_color():
    """All pixels one palette index: every strip mean is exactly
    (r+g+b)/768 of that palette entry — and a constant-index stream is
    the maximal KwKwK workload (each code is the just-created entry)."""
    from micmac_li3ds_spark.operators.multimodal import _decode_gif

    enc = _gif_encoder()
    palette = bytes([10, 200, 33, 0, 0, 0, 255, 255, 255, 1, 2, 3])
    idx = bytes([0]) * (16 * 4)
    payload = enc(idx, 16, 4, palette, 2, False)
    assert _decode_gif(payload, "image/gif") == [(10 + 200 + 33) / 768.0] * 8


@pytest.mark.parametrize("pal_bits", [2, 5, 8])
def test_decode_gif_random_roundtrip(pal_bits):
    """Random indices over 4/32/256-color palettes: the decoder's LZW
    inverse must land exactly on the palette-expanded ground truth
    (covers min code sizes 2, 5, 8 and their initial widths)."""
    import random

    from micmac_li3ds_spark.operators.multimodal import _decode_gif

    enc = _gif_encoder()
    rng = random.Random(4000 + pal_bits)
    n_colors = 1 << pal_bits
    w, h = 17, 9
    palette = bytes(rng.randint(0, 255) for _ in range(3 * n_colors))
    idx = bytes(rng.randint(0, n_colors - 1) for _ in range(w * h))
    got = _decode_gif(enc(idx, w, h, palette, pal_bits, False), "image/gif")
    assert got == _gif_truth(palette, idx, w, h)


def test_decode_gif_deep_table_width12_and_midstream_clear():
    """A 200x150 4-color random image drives the code width all the way
    to 12 bits AND forces the encoder's pre-emptive mid-stream CLEAR at
    4095 entries (verified by replaying the insert count below) — the
    decoder must track both transitions bit-exactly. This is the test
    that catches the classic width-timing off-by-one on either side."""
    import random

    from micmac_li3ds_spark.operators.multimodal import _decode_gif

    enc = _gif_encoder()
    rng = random.Random(99)
    w, h = 200, 150
    palette = bytes(rng.randint(0, 255) for _ in range(12))
    idx = bytes(rng.randint(0, 3) for _ in range(w * h))
    got = _decode_gif(enc(idx, w, h, palette, 2, False), "image/gif")
    assert got == _gif_truth(palette, idx, w, h)
    # replay the encoder's dictionary growth to certify the deep path
    table, next_code, code_size, clears, wstr = (
        {bytes([c]): c for c in range(4)}, 6, 3, 0, b""
    )
    for ch in idx:
        cand = wstr + bytes([ch])
        if cand in table:
            wstr = cand
            continue
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        elif next_code == 4095:
            clears += 1
            table = {bytes([c]): c for c in range(4)}
            next_code, code_size = 6, 3
        wstr = bytes([ch])
    assert clears >= 1


def test_decode_gif_extension_skip_invariance():
    """A comment extension between the color table and the image
    descriptor must not change the decode (the sub-block chain skip)."""
    import random

    from micmac_li3ds_spark.operators.multimodal import _decode_gif

    enc = _gif_encoder()
    rng = random.Random(11)
    palette = bytes(rng.randint(0, 255) for _ in range(12))
    idx = bytes(rng.randint(0, 3) for _ in range(11 * 6))
    a = _decode_gif(enc(idx, 11, 6, palette, 2, False), "image/gif")
    b = _decode_gif(enc(idx, 11, 6, palette, 2, True), "image/gif")
    assert a == b == _gif_truth(palette, idx, 11, 6)


def test_decode_gif_rejects_malformed():
    from micmac_li3ds_spark.operators.multimodal import _decode_gif

    enc = _gif_encoder()
    palette = bytes(range(12))
    idx = bytes([0, 1, 2, 3] * 8)  # 8x4
    good = enc(idx, 8, 4, palette, 2, False)
    desc = 13 + 12  # image descriptor offset (no extension)
    assert good[desc] == 0x2C
    cases = [
        (b"JUNK" + good[4:], "not a GIF"),
        (good[:10] + bytes([good[10] & 0x7F]) + good[11:], "global color"),
        (
            good[: desc + 9] + bytes([0x80]) + good[desc + 10 :],
            "local color tables",
        ),
        (
            good[: desc + 9] + bytes([0x40]) + good[desc + 10 :],
            "interlaced",
        ),
        (
            good[: desc + 1] + bytes([1]) + good[desc + 2 :],
            "sub-rectangle",
        ),
        (good[: len(good) - 2], "truncated GIF image data"),
    ]
    for payload, match in cases:
        with pytest.raises(ValueError, match=match):
            _decode_gif(payload, "image/gif")
    # fewer pixels in the stream than the declared geometry
    with pytest.raises(ValueError, match="pixel count mismatch"):
        _decode_gif(enc(idx[:20], 8, 4, palette, 2, False), "image/gif")


def test_lzw_decode_rejects_corrupt_streams():
    from micmac_li3ds_spark.operators.multimodal import _lzw_decode_gif

    with pytest.raises(ValueError, match="bad GIF LZW minimum code size"):
        _lzw_decode_gif(b"\x00", 9)
    with pytest.raises(ValueError, match="unterminated GIF LZW"):
        _lzw_decode_gif(b"", 2)
    # m=8: first 9-bit code from 0xff 0xff is 511 > next_code 258
    with pytest.raises(ValueError, match="corrupt GIF LZW stream"):
        _lzw_decode_gif(b"\xff\xff", 8)


def test_gif_fixtures_decode_to_generation_ground_truth(spark):
    """Every committed fixture row: block walk + sub-block reassembly +
    LZW + palette expansion must land exactly on the strip means of the
    generation-time raw_px bytes — the oracle's coordinates."""
    from micmac_li3ds_spark.operators.multimodal import (
        _decode_gif,
        load_media_gif,
    )

    rows = load_media_gif(spark).collect()
    assert len(rows) == 12
    for r in rows:
        got = _decode_gif(bytes(r["payload"]), r["mime"])
        assert got == _strip_truth(
            bytes(r["raw_px"]), r["width"], r["height"]
        ), r["media_id"]


def test_feature_extract_gif_branch_distributed(spark):
    """The registered union query carries the GIF branch through the
    real mapInPandas plumbing: 12 rows tagged gif-lzw-strips-v1,
    features matching the local decode."""
    from micmac_li3ds_spark.operators.multimodal import (
        _decode_gif,
        load_media_gif,
        q_mm_feature_extract,
    )

    out = (
        q_mm_feature_extract(spark, SF_DIR)
        .filter(F.col("decoder") == "gif-lzw-strips-v1")
        .collect()
    )
    assert len(out) == 12
    local = {
        r["media_id"]: _decode_gif(bytes(r["payload"]), r["mime"])
        for r in load_media_gif(spark).collect()
    }
    for row in out:
        assert [row[f"f{i}"] for i in range(8)] == local[row["media_id"]]

# ---------------------------------------------------------------------------
# Late r11: real ISO BMFF (MP4) sample-table walk for frame sampling
# ---------------------------------------------------------------------------


def _genfix():
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "gen_fixtures.py",
    )
    spec = importlib.util.spec_from_file_location("_genfix2", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_mp4_walker_matches_generation_coordinates(spark):
    """Every committed fixture row — including the audio-track-first,
    64-bit-largesize-mdat, uniform-stsz, and multi-run stts/stsc
    shapes, plus (r12) the no-stss all-sync, first-keyframe-not-1,
    and ctts-reordered shapes — the walker's (offset, size, dts_ms,
    keyframe, pts_ms) must equal the generator's own bookkeeping (the
    oracle's coordinates)."""
    from micmac_li3ds_spark.operators.multimodal import (
        _mp4_sample_index,
        load_media_mp4,
    )

    rows = load_media_mp4(spark).collect()
    # r13 added the sidx'd v1-times DASH row and the styp'd
    # concatenated-CMAF row
    assert len(rows) == 18
    saw_large = saw_audio = saw_co64 = False
    saw_nostss = saw_reordered = saw_late_first_key = False
    saw_trimmed = saw_elst = saw_frag = saw_frag_audio = False
    for r in rows:
        p = bytes(r["payload"])
        saw_large |= b"\x00\x00\x00\x01mdat" in p
        saw_audio |= b"soun" in p and b"moof" not in p
        saw_co64 |= b"co64" in p and b"stco" not in p
        saw_nostss |= (
            b"stss" not in p and b"moof" not in p and all(r["keyframe"])
        )
        saw_late_first_key |= not r["keyframe"][0]
        saw_elst |= b"elst" in p
        saw_trimmed |= any(pm < 0 for pm in r["sample_pts_ms"])
        saw_frag |= b"moof" in p
        saw_frag_audio |= b"moof" in p and b"soun" in p
        pts = list(r["sample_pts_ms"])
        saw_reordered |= pts != sorted(pts)
        got = _mp4_sample_index(p)
        want = list(
            zip(
                r["sample_off"],
                r["sample_size"],
                r["sample_ts_ms"],
                r["keyframe"],
                r["sample_pts_ms"],
            )
        )
        assert got == want, r["media_id"]
    # the hard shapes are really present
    assert saw_large and saw_audio and saw_co64
    assert saw_nostss and saw_reordered and saw_late_first_key
    assert saw_elst and saw_trimmed
    assert saw_frag and saw_frag_audio


def test_mp4_walker_timestamps_from_stts_runs():
    """Multi-run stts at a real timescale: ts of sample k is the
    CUMULATIVE sum of prior deltas, floored to ms — hand-computed."""
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    samples = [bytes([k]) * 10 for k in range(5)]
    payload, offs, ts_ms, keys, pts_ms = gf._mp4_encode(
        samples, [(1, 5)], 0, 30000, [(2, 1001), (3, 1502)], False, False
    )
    got = _mp4_sample_index(payload)
    units = [0, 1001, 2002, 3504, 5006]
    assert [t for (_, _, t, _, _) in got] == [u * 1000 // 30000 for u in units]
    # no stss → every sample sync; no ctts → pts == dts
    assert got == list(zip(offs, [10] * 5, ts_ms, [True] * 5, ts_ms))
    assert keys == [True] * 5 and pts_ms == ts_ms


def test_mp4_walker_rejects_malformed():
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    with pytest.raises(ValueError, match="not an MP4"):
        _mp4_sample_index(b"\x00" * 32)
    ftyp = gf._box(b"ftyp", b"isom" + (512).to_bytes(4, "big") + b"isomiso2")
    with pytest.raises(ValueError, match="missing MP4 box b'moov'"):
        _mp4_sample_index(ftyp + gf._box(b"mdat", b"xy"))
    # a moov whose only track is non-video
    mdhd = gf._full(
        b"mdhd", bytes(8) + (1000).to_bytes(4, "big") + bytes(8)
    )
    hdlr_soun = gf._full(b"hdlr", bytes(4) + b"soun" + bytes(13))
    minf = gf._box(b"minf", gf._box(b"stbl", b""))
    moov_audio = gf._box(
        b"moov",
        gf._full(b"mvhd", bytes(96))
        + gf._box(b"trak", gf._box(b"mdia", mdhd + hdlr_soun + minf)),
    )
    with pytest.raises(ValueError, match="no video .* track"):
        _mp4_sample_index(ftyp + moov_audio)
    # stts/stsz disagreement inside an otherwise sound vide track
    hdlr_vide = gf._full(b"hdlr", bytes(4) + b"vide" + bytes(13))
    stbl = gf._box(
        b"stbl",
        gf._full(
            b"stts",
            (1).to_bytes(4, "big")
            + (2).to_bytes(4, "big")
            + (100).to_bytes(4, "big"),
        )
        + gf._full(
            b"stsc",
            (1).to_bytes(4, "big")
            + (1).to_bytes(4, "big")
            + (3).to_bytes(4, "big")
            + (1).to_bytes(4, "big"),
        )
        + gf._full(
            b"stsz", (4).to_bytes(4, "big") + (3).to_bytes(4, "big")
        )
        + gf._full(
            b"stco", (1).to_bytes(4, "big") + (0).to_bytes(4, "big")
        ),
    )
    moov_bad = gf._box(
        b"moov",
        gf._full(b"mvhd", bytes(96))
        + gf._box(
            b"trak",
            gf._box(
                b"mdia", mdhd + hdlr_vide + gf._box(b"minf", stbl)
            ),
        ),
    )
    with pytest.raises(ValueError, match="stts covers 2 .* declares 3"):
        _mp4_sample_index(ftyp + moov_bad)
    # truncated payload: moov still parses (the child search returns
    # before reaching the cut mdat), so the per-sample bounds check is
    # what fires — the more precise error
    good, *_ = gf._mp4_encode(
        [b"ab" * 10] * 4, [(1, 2)], 0, 1000, [(4, 40)], False, False
    )
    with pytest.raises(ValueError, match="extends past the payload end"):
        _mp4_sample_index(good[:-5])


def test_frame_sample_mp4_branch_distributed(spark):
    """The registered query's real branch (keyframe-aware since r12):
    one row per SYNC SAMPLE of every media_mp4 fixture, frame_idx the
    keyframe ordinal in decode order, frame_ts_ms the PRESENTATION
    time from the generation-time ctts bookkeeping, sha over the
    sample's actual byte range."""
    import hashlib

    from micmac_li3ds_spark.operators.multimodal import (
        load_media_mp4,
        q_mm_frame_sample,
    )

    out = [
        r
        for r in q_mm_frame_sample(spark, SF_DIR).collect()
        if r["media_id"] >= 6000
    ]
    fixtures = {r["media_id"]: r for r in load_media_mp4(spark).collect()}
    # presented keyframes only: edit-list trimming (r12) gives leading
    # samples negative pts — decoded but never presented
    n_presented = sum(
        sum(k and p >= 0 for k, p in zip(r["keyframe"], r["sample_pts_ms"]))
        for r in fixtures.values()
    )
    assert len(out) == n_presented
    assert n_presented < sum(sum(r["keyframe"]) for r in fixtures.values())
    assert len(out) < sum(r["n_samples"] for r in fixtures.values())
    for row in out:
        fx = fixtures[row["media_id"]]
        # frame_idx is the ordinal among presented keyframes → map back
        # to the sample index from the fixture's own flags
        key_samples = [
            i
            for i, (k, p) in enumerate(
                zip(fx["keyframe"], fx["sample_pts_ms"])
            )
            if k and p >= 0
        ]
        k = key_samples[row["frame_idx"]]
        assert row["frame_ts_ms"] == fx["sample_pts_ms"][k]
        off, sz = fx["sample_off"][k], fx["sample_size"][k]
        hx = bytes(fx["payload"]).hex().upper()
        assert (
            row["frame_sha"]
            == hashlib.sha256(hx[off * 2 : (off + sz) * 2].encode()).hexdigest()
        )


def test_mp4_walker_rejects_empty_chunk_tables():
    """stsz declaring samples while stsc/stco are empty must raise the
    named structural error, not an IndexError in the chunk loop."""
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    ftyp = gf._box(b"ftyp", b"isom" + (512).to_bytes(4, "big") + b"isomiso2")
    mdhd = gf._full(b"mdhd", bytes(8) + (1000).to_bytes(4, "big") + bytes(8))
    hdlr = gf._full(b"hdlr", bytes(4) + b"vide" + bytes(13))
    stbl = gf._box(
        b"stbl",
        gf._full(
            b"stts",
            (1).to_bytes(4, "big") + (2).to_bytes(4, "big") + (5).to_bytes(4, "big"),
        )
        + gf._full(b"stsc", (0).to_bytes(4, "big"))
        + gf._full(b"stsz", (4).to_bytes(4, "big") + (2).to_bytes(4, "big"))
        + gf._full(b"stco", (0).to_bytes(4, "big")),
    )
    moov = gf._box(
        b"moov",
        gf._full(b"mvhd", bytes(96))
        + gf._box(b"trak", gf._box(b"mdia", mdhd + hdlr + gf._box(b"minf", stbl))),
    )
    with pytest.raises(ValueError, match="empty stsc/stco"):
        _mp4_sample_index(ftyp + moov)


# ---------------------------------------------------------------------------
# Property tests for the codec pairings (encoder in gen_fixtures,
# decoder in multimodal.py): random content must round-trip to the
# numpy ground truth for ANY filter plan / palette size, not just the
# committed fixture seeds.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(8, 40),
    h=st.integers(1, 12),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=6),
    zlevel=st.sampled_from([0, 6, 9]),
    n_idat=st.integers(1, 4),
    data=st.randoms(use_true_random=False),
)
def test_png_roundtrip_property(w, h, filters, zlevel, n_idat, data):
    """Any pixel content under any scanline filter plan, zlib level,
    and IDAT split must decode to the exact numpy strip means."""
    from micmac_li3ds_spark.operators.multimodal import _decode_png

    raw = bytes(data.randint(0, 255) for _ in range(3 * w * h))
    payload = _png_bytes(raw, w, h, filters, zlevel, n_idat)
    assert _decode_png(payload, "image/png") == _strip_truth(raw, w, h)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(8, 40),
    h=st.integers(1, 12),
    pal_bits=st.integers(2, 8),
    with_ext=st.booleans(),
    data=st.randoms(use_true_random=False),
)
def test_gif_roundtrip_property(w, h, pal_bits, with_ext, data):
    """Any index content over any palette size (min LZW code sizes
    2..8), with or without an extension block, must decode to the
    exact palette-expanded numpy strip means — the widest net for
    width-timing and table-rebuild bugs in the LZW pair."""
    from micmac_li3ds_spark.operators.multimodal import _decode_gif

    enc = _gif_encoder()
    n_colors = 1 << pal_bits
    palette = bytes(data.randint(0, 255) for _ in range(3 * n_colors))
    idx = bytes(data.randint(0, n_colors - 1) for _ in range(w * h))
    payload = enc(idx, w, h, palette, pal_bits, with_ext)
    assert _decode_gif(payload, "image/gif") == _gif_truth(
        palette, idx, w, h
    )


# ---------------------------------------------------------------------------
# Self-review fixes: truncation paths must honor the ValueError contract
# ---------------------------------------------------------------------------


def test_decode_wav_rejects_truncated_fmt_chunk():
    """A payload ending inside (or a chunk declaring fewer than 16
    bytes of) the fmt body must raise the family's ValueError, not
    struct.error — and must never read the NEXT chunk's bytes as fmt
    fields."""
    from micmac_li3ds_spark.operators.multimodal import _decode_wav

    # ends right after the fmt header: declared 16, zero present
    cut = (
        b"RIFF" + (16).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
    )
    with pytest.raises(ValueError, match="truncated fmt chunk"):
        _decode_wav(cut, "audio/x-wav-pcm")
    # declares only 4 bytes: reading bps at +14 would hit the next chunk
    short = (
        b"RIFF" + (40).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (4).to_bytes(4, "little") + bytes(4)
        + b"data" + (16).to_bytes(4, "little") + bytes(16)
    )
    with pytest.raises(ValueError, match="truncated fmt chunk"):
        _decode_wav(short, "audio/x-wav-pcm")


def test_decode_gif_rejects_truncated_image_descriptor():
    from micmac_li3ds_spark.operators.multimodal import _decode_gif

    enc = _gif_encoder()
    good = enc(bytes([0, 1, 2, 3] * 8), 8, 4, bytes(range(12)), 2, False)
    desc = 13 + 12
    assert good[desc] == 0x2C
    with pytest.raises(ValueError, match="truncated GIF image descriptor"):
        _decode_gif(good[: desc + 6], "image/gif")


def test_mp4_walker_rejects_overrunning_table_counts():
    """A table whose declared entry count overruns its own box must
    raise, not read the next box's bytes as entries (which could yield
    silently wrong timestamps when the garbage happens to sum right)."""
    from micmac_li3ds_spark.operators.multimodal import _mp4_sample_index

    gf = _genfix()
    good, *_ = gf._mp4_encode(
        [b"xy" * 8] * 4, [(1, 2)], 0, 1000, [(4, 40)], False, False
    )
    # find the stts box and inflate its entry count from 1 to 3
    k = good.index(b"stts")
    assert good[k + 8 : k + 12] == (1).to_bytes(4, "big")
    bad = good[: k + 8] + (3).to_bytes(4, "big") + good[k + 12 :]
    with pytest.raises(ValueError, match="stts declares 3 entries beyond"):
        _mp4_sample_index(bad)
    # stco likewise
    k = good.index(b"stco")
    n_chunks = int.from_bytes(good[k + 8 : k + 12], "big")
    bad = good[: k + 8] + (n_chunks + 9).to_bytes(4, "big") + good[k + 12 :]
    with pytest.raises(ValueError, match="stco declares .* beyond"):
        _mp4_sample_index(bad)


# ---------------------------------------------------------------------------
# Late r11: AIFF — big-endian PCM under the IFF grammar
# ---------------------------------------------------------------------------


def _aiff_bytes(samples, n_ch=1, rate=44100, ssnd_off=0, pre_chunks=b""):
    """Hand-assemble a FORM/AIFF payload (mirrors the fixture
    generator, reimplemented so a shared bug can't be self-consistent
    — including an independent 80-bit float encode via the frexp
    route rather than bit_length)."""
    import math

    m, e = math.frexp(rate)  # rate = m * 2^e, 0.5 <= m < 1
    mantissa = int(m * (1 << 64))
    f80 = (16382 + e).to_bytes(2, "big") + mantissa.to_bytes(8, "big")
    data = b"".join(int(s).to_bytes(2, "big", signed=True) for s in samples)
    comm = (
        n_ch.to_bytes(2, "big")
        + (len(samples) // n_ch).to_bytes(4, "big")
        + (16).to_bytes(2, "big")
        + f80
    )
    ssnd = ssnd_off.to_bytes(4, "big") + bytes(4) + bytes(ssnd_off) + data
    chunks = (
        b"COMM" + len(comm).to_bytes(4, "big") + comm
        + pre_chunks
        + b"SSND" + len(ssnd).to_bytes(4, "big") + ssnd
    )
    return b"FORM" + (4 + len(chunks)).to_bytes(4, "big") + b"AIFF" + chunks


def test_decode_aiff_known_samples():
    from micmac_li3ds_spark.operators.multimodal import _decode_aiff

    samples = [0, 16384, -16384, 32767, -32768, 1, -1, 8192]
    got = _decode_aiff(_aiff_bytes(samples), "audio/aiff")
    assert got == [abs(s) / 32768.0 for s in samples]


def test_decode_aiff_ssnd_offset_and_chunk_walk():
    """The SSND (offset, blockSize) pair shifts where sound data
    begins, and an odd-sized chunk between COMM and SSND exercises the
    IFF pad byte — both must be feature-invariant."""
    from micmac_li3ds_spark.operators.multimodal import _decode_aiff

    samples = [1000, -2000, 3000, -4000, 5000, -6000, 7000, -8000]
    base = _decode_aiff(_aiff_bytes(samples), "audio/aiff")
    odd = b"ANNO" + (7).to_bytes(4, "big") + b"fixture" + b"\x00"
    assert _decode_aiff(_aiff_bytes(samples, ssnd_off=12), "audio/aiff") == base
    assert _decode_aiff(_aiff_bytes(samples, pre_chunks=odd), "audio/aiff") == base
    assert (
        _decode_aiff(
            _aiff_bytes(samples, ssnd_off=4, pre_chunks=odd), "audio/aiff"
        )
        == base
    )


@pytest.mark.parametrize("rate", [8000, 11025, 22050, 44100, 48000, 96000])
def test_parse_f80_common_rates(rate):
    """The 80-bit extended float parse must invert the independent
    frexp-based encode for every common sample rate."""
    import math

    from micmac_li3ds_spark.operators.multimodal import _parse_f80

    m, e = math.frexp(rate)
    f80 = (16382 + e).to_bytes(2, "big") + int(m * (1 << 64)).to_bytes(8, "big")
    assert _parse_f80(f80) == rate


def test_parse_f80_rejects_negative_and_fractional():
    from micmac_li3ds_spark.operators.multimodal import _parse_f80

    with pytest.raises(ValueError, match="negative AIFF sample rate"):
        _parse_f80(b"\xc0\x0e" + (1 << 63).to_bytes(8, "big"))
    # 44100.5: mantissa has a bit below the integer point
    frac = (16398).to_bytes(2, "big") + (
        (44100 * 2 + 1) << (63 - 16)
    ).to_bytes(8, "big")
    with pytest.raises(ValueError, match="non-integer AIFF sample rate"):
        _parse_f80(frac)


def test_decode_aiff_rejects_malformed():
    from micmac_li3ds_spark.operators.multimodal import _decode_aiff

    samples = [100, 200, 300, 400, 500, 600, 700, 800]
    good = _aiff_bytes(samples)
    cases = [
        (b"JUNK" + good[4:], "not a FORM/AIFF"),
        (good.replace(b"COMM", b"COMX"), "missing COMM/SSND"),
        (good.replace(b"SSND", b"SSNX"), "missing COMM/SSND"),
    ]
    for payload, match in cases:
        with pytest.raises(ValueError, match=match):
            _decode_aiff(payload, "audio/aiff")
    # COMM frame count disagreeing with the SSND byte count
    bad = _aiff_bytes(samples)
    k = bad.index(b"COMM") + 10
    bad = bad[:k] + (5).to_bytes(4, "big") + bad[k + 4 :]
    with pytest.raises(ValueError, match="COMM declares"):
        _decode_aiff(bad, "audio/aiff")
    # truncated COMM
    cut = good[: good.index(b"COMM") + 12]
    with pytest.raises(ValueError, match="truncated COMM"):
        _decode_aiff(cut, "audio/aiff")


def test_aiff_fixture_offsets_match_decoder_walk(spark):
    """The generation-time (data_off, n_samples) coordinates — the
    oracle's — must agree with an independent in-test walk of each
    fixture payload (COMM/ANNO/SSND layouts, nonzero SSND offsets)."""
    import struct

    from micmac_li3ds_spark.operators.multimodal import load_media_aiff

    rows = load_media_aiff(spark).collect()
    assert len(rows) == 8
    for r in rows:
        p = bytes(r["payload"])
        i, found = 12, None
        while i + 8 <= len(p):
            (sz,) = struct.unpack_from(">I", p, i + 4)
            if p[i : i + 4] == b"SSND":
                (off,) = struct.unpack_from(">I", p, i + 8)
                found = (i + 16 + off, (sz - 8 - off) // 2)
                break
            i += 8 + sz + (sz & 1)
        assert found == (r["data_off"], r["n_samples"]), r["media_id"]


def test_feature_extract_aiff_branch_distributed(spark):
    from micmac_li3ds_spark.operators.multimodal import (
        _decode_aiff,
        load_media_aiff,
        q_mm_feature_extract,
    )

    out = (
        q_mm_feature_extract(spark, SF_DIR)
        .filter(F.col("decoder") == "aiff16-winabs-v1")
        .collect()
    )
    assert len(out) == 8
    local = {
        r["media_id"]: _decode_aiff(bytes(r["payload"]), r["mime"])
        for r in load_media_aiff(spark).collect()
    }
    for row in out:
        assert [row[f"f{i}"] for i in range(8)] == local[row["media_id"]]


def test_media_query_plans_are_shuffle_free(spark):
    """Pin the SCALE.md claim for the decode hot path: both media
    queries execute as parallel scan→MapInPandas branches with ZERO
    Exchange — per-item decode cost scales out with partitions and no
    byte of payload ever crosses the network. One MapInPandas (and one
    parquet scan) per branch: 7 for feature_extract (stub + six real
    codecs), 2 for frame_sample (stub + BMFF walk)."""
    from micmac_li3ds_spark.operators.multimodal import (
        q_mm_feature_extract,
        q_mm_frame_sample,
    )

    for q, n_branches in ((q_mm_feature_extract, 7), (q_mm_frame_sample, 2)):
        p = (
            q(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in p, q.__name__
        assert p.count("MapInPandas") == n_branches, q.__name__
