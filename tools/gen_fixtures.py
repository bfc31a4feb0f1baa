"""Generate the MicMac-like ETL fixtures (FIXTURES.md §3) into fixtures/.

Deterministic (seeded); outputs are committed so oracle SQL can read the
parquet twins by absolute path. The XML shapes follow the *public* MicMac
serialization style (ExportAPERO / CalibrationInternConique /
StructBlockCam / OrientationConique with space-separated vectors and
row-vector matrix elements) — synthesized here, not copied from anywhere.

Run: python tools/gen_fixtures.py   (idempotent)
"""

from __future__ import annotations

import math
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
XML_DIR = os.path.join(ROOT, "fixtures", "xml")
PQ_DIR = os.path.join(ROOT, "fixtures", "parquet")

DIST_MODELS = {
    "radial5": 5,
    "phgr_std": 7,
    "poly_deg3": 10,
}


def rot_matrix(angle: float, axis: int) -> list[float]:
    """Row-major 3×3 rotation about one axis."""
    c, s = math.cos(angle), math.sin(angle)
    if axis == 0:
        m = [[1, 0, 0], [0, c, -s], [0, s, c]]
    elif axis == 1:
        m = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
    else:
        m = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    return [round(x, 12) for row in m for x in row]


def gen_calibrations(rng: random.Random):
    rows = []
    for i in range(4):
        model = list(DIST_MODELS)[i % len(DIST_MODELS)]
        n_coef = DIST_MODELS[model]
        rows.append(
            {
                "sensor_name": f"cam_{i:02d}",
                "image_width": 2048 + 512 * (i % 2),
                "image_height": 2048,
                "focal": round(3400.0 + 25.0 * i + rng.random(), 6),
                "ppx": round(1020.0 + rng.random() * 4, 6),
                "ppy": round(1012.0 + rng.random() * 4, 6),
                "dist_model": model,
                "dist_coeffs": [
                    round(rng.uniform(-1, 1) * 10 ** (-3 - 2 * k), 18)
                    for k in range(n_coef)
                ],
            }
        )
    return rows


def calib_xml(c) -> str:
    coeffs = "\n".join(
        f"          <CoeffDist>{v!r}</CoeffDist>" for v in c["dist_coeffs"]
    )
    return f"""<?xml version="1.0"?>
<ExportAPERO>
  <CalibrationInternConique>
    <KnownConv>eConvApero_DistM2C</KnownConv>
    <Name>{c['sensor_name']}</Name>
    <PP>{c['ppx']} {c['ppy']}</PP>
    <F>{c['focal']}</F>
    <SzIm>{c['image_width']} {c['image_height']}</SzIm>
    <CalibDistortion>
      <ModUnif>
        <TypeModele>{c['dist_model']}</TypeModele>
{coeffs}
      </ModUnif>
    </CalibDistortion>
  </CalibrationInternConique>
</ExportAPERO>
"""


def gen_blocks(rng: random.Random):
    blocks = []
    for b in range(2):
        cams = []
        for k in range(3 + b):
            cams.append(
                {
                    "cam_id": f"cam_{(b * 3 + k) % 4:02d}",
                    "t": [round(rng.uniform(-0.5, 0.5), 9) for _ in range(3)],
                    "r": rot_matrix(rng.uniform(-0.2, 0.2), k % 3),
                }
            )
        blocks.append({"block_name": f"block_{b}", "cameras": cams})
    return blocks


def block_xml(blk) -> str:
    cams = []
    for c in blk["cameras"]:
        r = c["r"]
        cams.append(
            f"""    <ParamOrientSHC>
      <IdGrp>{c['cam_id']}</IdGrp>
      <Vecteur>{' '.join(repr(v) for v in c['t'])}</Vecteur>
      <Rot>
        <L1>{' '.join(repr(v) for v in r[0:3])}</L1>
        <L2>{' '.join(repr(v) for v in r[3:6])}</L2>
        <L3>{' '.join(repr(v) for v in r[6:9])}</L3>
      </Rot>
    </ParamOrientSHC>"""
        )
    body = "\n".join(cams)
    return f"""<?xml version="1.0"?>
<StructBlockCam>
  <KeyIm2TimeCam>NKS-Assoc-Im2Time</KeyIm2TimeCam>
  <BlockName>{blk['block_name']}</BlockName>
  <LiaisonsSHC>
{body}
  </LiaisonsSHC>
</StructBlockCam>
"""


def gen_orientations(rng: random.Random):
    rows = []
    for i in range(6):
        rows.append(
            {
                "sensor_name": f"cam_{i % 4:02d}",
                "frame": f"world_{i % 2}",
                "center": [
                    round(657000 + rng.uniform(0, 100), 6),
                    round(6860000 + rng.uniform(0, 100), 6),
                    round(100 + rng.uniform(0, 50), 6),
                ],
                "rot": rot_matrix(rng.uniform(-math.pi, math.pi), i % 3),
                "calib_name": f"autocal_{i % 4:02d}.xml",
            }
        )
    return rows


def ori_xml(o) -> str:
    r = o["rot"]
    return f"""<?xml version="1.0"?>
<ExportAPERO>
  <OrientationConique>
    <FileInterne>{o['calib_name']}</FileInterne>
    <NameSensor>{o['sensor_name']}</NameSensor>
    <NameFrame>{o['frame']}</NameFrame>
    <Externe>
      <Time>0.0</Time>
      <Centre>{' '.join(repr(v) for v in o['center'])}</Centre>
      <ParamRotation>
        <CodageMatr>
          <L1>{' '.join(repr(v) for v in r[0:3])}</L1>
          <L2>{' '.join(repr(v) for v in r[3:6])}</L2>
          <L3>{' '.join(repr(v) for v in r[6:9])}</L3>
        </CodageMatr>
      </ParamRotation>
    </Externe>
    <ConvOri><KnownConv>eConvApero_DistM2C</KnownConv></ConvOri>
  </OrientationConique>
</ExportAPERO>
"""


def gen_graph():
    """Referential/transfo graph: two trees with a branch, depth 3-4."""
    refs = []
    transfos = []
    rid = 0
    names = {}
    for name in [
        "world_0", "world_1",
        "platform_0", "platform_1",
        "block_0", "block_1",
        "cam_00", "cam_01", "cam_02", "cam_03",
        "img_00", "img_01",
    ]:
        names[name] = rid
        refs.append({"ref_id": rid, "name": name, "sensor_id": rid % 4})
        rid += 1
    edges = [
        # (source, target): child frame → parent frame
        ("platform_0", "world_0"),
        ("platform_1", "world_1"),
        ("block_0", "platform_0"),
        ("block_1", "platform_1"),
        ("cam_00", "block_0"),
        ("cam_01", "block_0"),
        ("cam_02", "block_1"),
        ("cam_03", "block_1"),
        ("img_00", "cam_00"),
        ("img_01", "cam_02"),
    ]
    for t_id, (src, dst) in enumerate(edges):
        transfos.append(
            {
                "transfo_id": t_id,
                "source_ref": names[src],
                "target_ref": names[dst],
                "transfo_type": "affine",
                "params_json": '{"scale": 1.0}',
            }
        )
    return refs, transfos


def main() -> None:
    os.makedirs(XML_DIR, exist_ok=True)
    os.makedirs(PQ_DIR, exist_ok=True)
    rng = random.Random(42)

    calibs = gen_calibrations(rng)
    for i, c in enumerate(calibs):
        with open(os.path.join(XML_DIR, f"autocal_{i:02d}.xml"), "w") as f:
            f.write(calib_xml(c))
    pq.write_table(pa.Table.from_pylist(calibs), os.path.join(PQ_DIR, "calibration.parquet"))

    blocks = gen_blocks(rng)
    cam_rows = []
    for i, b in enumerate(blocks):
        with open(os.path.join(XML_DIR, f"blinis_{i:02d}.xml"), "w") as f:
            f.write(block_xml(b))
        for c in b["cameras"]:
            cam_rows.append({"block_name": b["block_name"], **c})
    pq.write_table(pa.Table.from_pylist(cam_rows), os.path.join(PQ_DIR, "block_cameras.parquet"))

    oris = gen_orientations(rng)
    for i, o in enumerate(oris):
        with open(os.path.join(XML_DIR, f"ori_{i:02d}.xml"), "w") as f:
            f.write(ori_xml(o))
    pq.write_table(pa.Table.from_pylist(oris), os.path.join(PQ_DIR, "orientation.parquet"))

    refs, transfos = gen_graph()
    pq.write_table(pa.Table.from_pylist(refs), os.path.join(PQ_DIR, "referential.parquet"))
    pq.write_table(pa.Table.from_pylist(transfos), os.path.join(PQ_DIR, "transfo.parquet"))

    # "existing" sensor table for the get-or-create scenario: the first
    # two cameras are already registered.
    existing = [
        {"name": "cam_00", "type": "camera"},
        {"name": "cam_01", "type": "camera"},
        {"name": "rig_block_0", "type": "group"},
    ]
    pq.write_table(pa.Table.from_pylist(existing), os.path.join(PQ_DIR, "sensors_existing.parquet"))

    # --- CSV / JSON-lines scan fixtures (derived from deterministic data,
    # NOT from /root/testdata, so they are committable and stable) ---
    text_dir = os.path.join(ROOT, "fixtures", "text")
    os.makedirs(text_dir, exist_ok=True)
    rng2 = random.Random(7)
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    with open(os.path.join(text_dir, "accounts.csv"), "w") as f:
        f.write("acct_id,segment,balance,opened\n")
        for i in range(200):
            f.write(
                f"{i},{segs[i % 5]},{round(rng2.uniform(-500, 5000), 2)},"
                f"2023-{1 + i % 12:02d}-{1 + i % 28:02d}\n"
            )
    with open(os.path.join(text_dir, "clicks.jsonl"), "w") as f:
        for i in range(300):
            f.write(
                '{"click_id": %d, "page": "p%d", "ms": %d, "ok": %s}\n'
                % (i, i % 7, rng2.randint(10, 5000), "true" if i % 3 else "false")
            )

    # --- DIRTY variants (round 14): the permissive-mode corrupt-record
    # channel needs inputs that actually carry malformed rows. A
    # SEPARATE rng keeps the clean files above byte-stable. Corruption
    # modes are CONTROLLED so both engines classify identically:
    # CSV — always exactly 4 fields (DuckDB's all-VARCHAR raw count
    # must parse every row), corrupt = an untypeable acct_id / balance
    # / opened; JSON — malformed syntax, a NON-NUMERIC string where
    # BIGINT is declared, or a non-boolean string for ok (numeric
    # strings are avoided: engines disagree on "123" → BIGINT
    # coercion).
    rng4 = random.Random(11)
    csv_bad = [
        "9001,AUTOMOBILE,notanumber,2023-05-05",
        "9002,BUILDING,12.5,not-a-date",
        "oops,FURNITURE,1.0,2023-01-01",
        "9004,HOUSEHOLD,--,2023-02-02",
        "9005,MACHINERY,4.25,2023-13-45",
        "none,AUTOMOBILE,nan?,never",
    ]
    with open(os.path.join(text_dir, "accounts_dirty.csv"), "w") as f:
        f.write("acct_id,segment,balance,opened\n")
        bad_at = {18 * (j + 1): row for j, row in enumerate(csv_bad)}
        for i in range(120):
            if i in bad_at:
                f.write(bad_at[i] + "\n")
            f.write(
                f"{i},{segs[i % 5]},{round(rng4.uniform(-500, 5000), 2)},"
                f"2023-{1 + i % 12:02d}-{1 + i % 28:02d}\n"
            )
    json_bad = [
        '{"click_id": 9101, "page": "p1", "ms": "fast", "ok": true}',
        '{"click_id": 9102, "page": "p2", "ms": 10',
        '{"click_id": 9103, "page": "p3", "ms": 5, "ok": "maybe"}',
        "not json at all",
        '{"click_id": 9105, "page": "p5", "ms": "slow-ish", "ok": false}',
        # corrupt ONLY in click_id: pins that the audit actually
        # type-checks every declared column (a plan that pruned
        # click_id would accept this row)
        '{"click_id": "x7", "page": "p6", "ms": 44, "ok": true}',
    ]
    with open(os.path.join(text_dir, "clicks_dirty.jsonl"), "w") as f:
        # keys must stay BELOW the loop bound or the tail entries are
        # silently never written (the round-14 off-by-one, caught by
        # the fixture-count assertion below)
        bad_at = {22 * (j + 1): row for j, row in enumerate(json_bad)}
        for i in range(150):
            if i in bad_at:
                f.write(bad_at[i] + "\n")
            f.write(
                '{"click_id": %d, "page": "p%d", "ms": %d, "ok": %s}\n'
                % (i, i % 7, rng4.randint(10, 5000), "true" if i % 3 else "false")
            )
    with open(os.path.join(text_dir, "accounts_dirty.csv")) as f:
        assert sum(1 for _ in f) == 1 + 120 + len(csv_bad)
    with open(os.path.join(text_dir, "clicks_dirty.jsonl")) as f:
        assert sum(1 for _ in f) == 150 + len(json_bad)

    # --- multimodal fixture: binary payloads + typed metadata ---
    # Each payload starts with a 12-byte container header (the EXIF-ish
    # structure q_mm_header_parse audits): magic b"SMM1", then two
    # big-endian uint32 fields — (width, height) for images,
    # (duration_ms, 0) for time media — followed by an opaque body.
    rng3 = random.Random(99)
    media = []
    for i in range(40):
        kind = ["image/png", "audio/wav", "video/mp4"][i % 3]
        if kind == "image/png":
            width, height = 640 + 32 * (i % 4), 480
            duration = None
            f1, f2 = width, height
        else:
            width = height = None
            duration = 1000 * (1 + i % 30)
            f1, f2 = duration, 0
        header = b"SMM1" + f1.to_bytes(4, "big") + f2.to_bytes(4, "big")
        body = bytes([rng3.randint(0, 255) for _ in range(64 + 16 * (i % 5))])
        media.append(
            {
                "media_id": i,
                "mime": kind,
                "payload": header + body,
                "width": width,
                "height": height,
                "duration_ms": duration,
            }
        )
    schema = pa.schema(
        [
            ("media_id", pa.int64()),
            ("mime", pa.string()),
            ("payload", pa.binary()),
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("duration_ms", pa.int64()),
        ]
    )
    pq.write_table(
        pa.Table.from_pylist(media, schema=schema),
        os.path.join(PQ_DIR, "media.parquet"),
    )

    # --- REAL-format media fixture: uncompressed 24bpp bottom-up BMPs
    # (media_bmp.parquet, r9 verdict item 5). Kept SEPARATE from
    # media.parquet so the q_mm_* keys that oracle over that file keep
    # their attested results; only q_mm_feature_extract unions this in.
    # Widths include both stride==3w (8, 16, 40) and padded-stride
    # (11, 23) shapes, and the padding bytes are RANDOM so a decoder
    # that fails to skip them is caught by the oracle.
    rng4 = random.Random(4242)
    bmp_rows = []
    for i, (w, h) in enumerate(
        [(8, 4), (11, 6), (16, 8), (23, 5), (32, 10), (40, 12),
         (8, 16), (11, 3), (16, 1), (23, 9), (32, 2), (40, 7)]
    ):
        stride = ((3 * w + 3) // 4) * 4
        img = b"".join(
            bytes(rng4.randint(0, 255) for _ in range(3 * w))
            + bytes(rng4.randint(1, 255) for _ in range(stride - 3 * w))
            for _ in range(h)
        )
        off = 14 + 40
        hdr = (
            b"BM"
            + (off + len(img)).to_bytes(4, "little")
            + b"\x00\x00\x00\x00"
            + off.to_bytes(4, "little")
            + (40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True)
            + h.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little")
            + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little")
            + len(img).to_bytes(4, "little")
            + (2835).to_bytes(4, "little") * 2
            + (0).to_bytes(4, "little") * 2
        )
        bmp_rows.append(
            {
                "media_id": 1000 + i,
                "mime": "image/bmp",
                "payload": hdr + img,
                "width": w,
                "height": h,
                "duration_ms": None,
            }
        )
    pq.write_table(
        pa.Table.from_pylist(bmp_rows, schema=schema),
        os.path.join(PQ_DIR, "media_bmp.parquet"),
    )

    # --- REAL-format media fixture #2: binary netpbm P6 (late r10).
    # Headers VARY (canonical / #-comment lines / tab+double-space
    # separators — all legal netpbm) and ``pix_off`` records where the
    # pixel data starts at GENERATION time, so the oracle re-decodes
    # from an independently recorded offset: a decoder that
    # mis-tokenizes any header shape produces a value mismatch, not a
    # silently self-consistent answer. P6 rows are packed (no stride
    # padding — that axis is the BMP fixture's job).
    rng5 = random.Random(52525)
    ppm_rows = []
    for i, (w, h) in enumerate(
        [(8, 5), (11, 4), (16, 7), (23, 3), (32, 9), (40, 6),
         (9, 12), (13, 2), (17, 11), (25, 8), (33, 1), (48, 10)]
    ):
        if i % 3 == 0:
            hdr = f"P6\n{w} {h}\n255\n"
        elif i % 3 == 1:
            hdr = f"P6\n# fixture {i}\n{w} {h}\n# maxval next\n255\n"
        else:
            hdr = f"P6  {w}\t{h}\n255\n"
        body = bytes(rng5.randint(0, 255) for _ in range(3 * w * h))
        ppm_rows.append(
            {
                "media_id": 2000 + i,
                "mime": "image/x-portable-pixmap",
                "payload": hdr.encode() + body,
                "width": w,
                "height": h,
                "pix_off": len(hdr),
                "duration_ms": None,
            }
        )
    ppm_schema = pa.schema(
        [
            ("media_id", pa.int64()),
            ("mime", pa.string()),
            ("payload", pa.binary()),
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("pix_off", pa.int32()),
            ("duration_ms", pa.int64()),
        ]
    )
    pq.write_table(
        pa.Table.from_pylist(ppm_rows, schema=ppm_schema),
        os.path.join(PQ_DIR, "media_ppm.parquet"),
    )

    # --- REAL-format media fixture #3: 16-bit PCM RIFF/WAVE (r11,
    # r10 verdict item 4). Chunk layouts VARY — canonical fmt→data,
    # an interleaved LIST chunk between fmt and data, and an
    # ODD-sized junk chunk (whose RIFF pad byte a naive walker
    # misses) — and ``data_off``/``n_samples`` record where the
    # sample data lives at GENERATION time, so the oracle re-decodes
    # from independently recorded coordinates: a chunk mis-walk is a
    # value mismatch, not a silently self-consistent answer. Samples
    # are random full-range int16 (including ±extremes); mono and
    # stereo both appear (the decoder windows the interleaved stream,
    # so channel count only changes metadata).
    rng6 = random.Random(636363)
    wav_rows = []
    for i, (n_frames, n_ch) in enumerate(
        [(8, 1), (100, 1), (100, 2), (250, 1), (250, 2), (512, 1),
         (33, 2), (64, 1), (9, 1), (300, 2), (400, 1), (128, 2)]
    ):
        rate = [8000, 16000, 44100][i % 3]
        n_samples = n_frames * n_ch
        data = b"".join(
            rng6.randint(-32768, 32767).to_bytes(2, "little", signed=True)
            for _ in range(n_samples)
        )
        block_align = 2 * n_ch
        fmt_body = (
            (1).to_bytes(2, "little")
            + n_ch.to_bytes(2, "little")
            + rate.to_bytes(4, "little")
            + (rate * block_align).to_bytes(4, "little")
            + block_align.to_bytes(2, "little")
            + (16).to_bytes(2, "little")
        )
        chunks = b"fmt " + len(fmt_body).to_bytes(4, "little") + fmt_body
        if i % 3 == 1:  # interleaved LIST chunk between fmt and data
            info = b"INFOICMT" + (8).to_bytes(4, "little") + b"fixture!"
            chunks += b"LIST" + len(info).to_bytes(4, "little") + info
        elif i % 3 == 2:  # odd-sized junk chunk → RIFF pad byte
            junk = bytes(rng6.randint(0, 255) for _ in range(7))
            chunks += b"junk" + len(junk).to_bytes(4, "little") + junk + b"\x00"
        chunks += b"data" + len(data).to_bytes(4, "little") + data
        payload = (
            b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks
        )
        data_off = len(payload) - len(data)
        wav_rows.append(
            {
                "media_id": 3000 + i,
                "mime": "audio/x-wav-pcm",
                "payload": payload,
                "n_samples": n_samples,
                "n_channels": n_ch,
                "sample_rate": rate,
                "data_off": data_off,
                "duration_ms": n_frames * 1000 // rate,
            }
        )
    wav_schema = pa.schema(
        [
            ("media_id", pa.int64()),
            ("mime", pa.string()),
            ("payload", pa.binary()),
            ("n_samples", pa.int32()),
            ("n_channels", pa.int32()),
            ("sample_rate", pa.int32()),
            ("data_off", pa.int32()),
            ("duration_ms", pa.int64()),
        ]
    )
    pq.write_table(
        pa.Table.from_pylist(wav_rows, schema=wav_schema),
        os.path.join(PQ_DIR, "media_wav.parquet"),
    )

    # --- REAL-format media fixture #4: PNG, 8-bit RGB non-interlaced
    # (late r11) — the first COMPRESSED format (stdlib zlib, still zero
    # new deps). This generator is the ENCODER side (filter APPLY:
    # raw[i] − predictor), the decoder in multimodal.py is the INVERSE
    # (recon[i] + predictor) — two independent implementations of the
    # PNG filter spec, so a filter bug on either side is a value
    # mismatch, not self-consistent. Per-row filter types cycle through
    # all five (None/Sub/Up/Average/Paeth); some fixtures pin a single
    # filter so a per-filter bug is attributable. zlib levels vary
    # (0 = stored deflate blocks), and some payloads split the
    # compressed stream across MULTIPLE IDAT chunks — decoders that
    # read only the first IDAT fail loudly. ``raw_px`` records the
    # packed RGB bytes at GENERATION time (the pix_off discipline,
    # adapted: SQL cannot inflate zlib, so the oracle recomputes the
    # strip means from these ground-truth bytes instead of re-decoding
    # the payload).
    rng7 = random.Random(747474)
    png_rows = []
    for i, (w, h) in enumerate(
        [(8, 5), (11, 4), (16, 7), (23, 3), (32, 9), (40, 6),
         (9, 12), (13, 2), (17, 11), (25, 8), (33, 1), (48, 10)]
    ):
        raw = bytes(rng7.randint(0, 255) for _ in range(3 * w * h))
        # filter plan: most fixtures cycle r % 5; every 5th pins one type
        filters = [i // 5 % 5] if i % 5 == 0 else [0, 1, 2, 3, 4]
        zlevel = [0, 6, 9][i % 3]
        n_idat = 3 if i % 4 == 0 else 1
        png_rows.append(
            {
                "media_id": 4000 + i,
                "mime": "image/png",
                "payload": _png_encode(raw, w, h, filters, zlevel, n_idat),
                "width": w,
                "height": h,
                "raw_px": raw,
                "duration_ms": None,
            }
        )
    png_schema = pa.schema(
        [
            ("media_id", pa.int64()),
            ("mime", pa.string()),
            ("payload", pa.binary()),
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("raw_px", pa.binary()),
            ("duration_ms", pa.int64()),
        ]
    )
    pq.write_table(
        pa.Table.from_pylist(png_rows, schema=png_schema),
        os.path.join(PQ_DIR, "media_png.parquet"),
    )

    # --- REAL-format media fixture #5: GIF (late r11) — the second
    # compressed format, and the one whose compression (LZW) is
    # implemented HERE from the public spec rather than delegated to a
    # library: this generator runs a true LZW COMPRESSOR (dictionary
    # build, variable code widths 3..12 bits LSB-first, explicit CLEAR
    # before the table fills) and the decoder in multimodal.py runs the
    # inverse DECOMPRESSOR (table rebuild incl. the KwKwK case) — two
    # independent spec implementations meeting at the generation-time
    # ``raw_px`` ground truth (palette-expanded RGB), exactly the PNG
    # oracle posture. Palette sizes vary (4..256 colors), one fixture
    # interleaves a comment extension block before the image
    # descriptor (the sub-block skip a naive walker misses), and
    # images are large enough that code width GROWS mid-stream.
    rng8 = random.Random(858585)
    gif_rows = []
    for i, (w, h) in enumerate(
        [(8, 5), (11, 4), (16, 7), (23, 3), (32, 9), (40, 6),
         (9, 12), (13, 2), (17, 11), (25, 8), (33, 1), (48, 10)]
    ):
        pal_bits = 2 + i % 7  # 4..256 palette entries
        n_colors = 1 << pal_bits
        palette = bytes(rng8.randint(0, 255) for _ in range(3 * n_colors))
        idx = bytes(rng8.randint(0, n_colors - 1) for _ in range(w * h))
        raw = b"".join(palette[3 * j : 3 * j + 3] for j in idx)
        with_ext = i % 4 == 1
        gif_rows.append(
            {
                "media_id": 5000 + i,
                "mime": "image/gif",
                "payload": _gif_encode(idx, w, h, palette, pal_bits, with_ext),
                "width": w,
                "height": h,
                "raw_px": raw,
                "duration_ms": None,
            }
        )
    pq.write_table(
        pa.Table.from_pylist(gif_rows, schema=png_schema),
        os.path.join(PQ_DIR, "media_gif.parquet"),
    )

    # --- REAL-format media fixture #6: ISO BMFF / MP4 containers
    # (late r11). No codec is decoded — what IS real is the part of
    # video plumbing that matters at scale: the sample-table walk
    # (moov/trak/mdia/minf/stbl: stts durations, stsc sample-to-chunk
    # runs, stsz sizes, stco chunk offsets) that locates every frame's
    # byte range and timestamp WITHOUT decoding. The generator builds
    # genuine box trees — including a leading non-video track the
    # walker must skip via hdlr, a largesize (64-bit) mdat, uniform
    # and per-sample stsz, multi-run stts/stsc — and records each
    # sample's (offset, size, ts_ms) at GENERATION time from its own
    # chunk bookkeeping (not from the walker), so the oracle re-slices
    # the payload bytes from independent coordinates: a mis-walk on
    # the Spark side is a value mismatch, not self-consistent.
    # Round 12 extends the family with the two OPTIONAL timing tables
    # keyframe-aware sampling lives on: stss (sync samples — absent
    # box means ALL sync per §8.6.2, present box can start the first
    # keyframe later than sample 1) and version-0 ctts (composition
    # offsets — including genuinely REORDERED tracks whose pts
    # sequence is non-monotone in decode order, the B-frame shape).
    # keyframe/sample_pts_ms are recorded from the generator's own
    # bookkeeping, so the oracle samples keyframes from coordinates
    # the walker never produced.
    rng9 = random.Random(969696)
    mp4_rows = []
    shapes = [
        # (n_samples, stsc_runs [(first_chunk, spc)], uniform_size,
        #  timescale, stts_runs [(count, delta)], audio_trak, largesize,
        #  stss_samples | None, ctts_runs | None, use_co64,
        #  elst_edits | None, movie_timescale | None)
        (6, [(1, 2)], 0, 1000, [(6, 40)], False, False,
         [1, 4], None, False, None, None),
        # ctts-REORDERED track: pts[0]=2500 > pts[1]=1001 (non-monotone)
        (12, [(1, 3), (3, 2)], 0, 30000, [(4, 1001), (8, 1502)], False,
         False, [1, 5, 9], [(1, 2500), (3, 0), (8, 100)], False,
         None, None),
        # the no-stss track: every sample sync per spec
        (9, [(1, 4), (2, 1)], 0, 600, [(9, 20)], True, False,
         None, None, False, None, None),
        (8, [(1, 8)], 32, 90000, [(8, 3003)], False, True,
         [1], None, False, None, None),
        # constant ctts offset: pts shifted but monotone
        (15, [(1, 5), (2, 3), (4, 1)], 0, 1000, [(15, 33)], True, False,
         [1, 6, 11], [(15, 1500)], False, None, None),
        # first keyframe NOT at sample 1 — walkers must not assume it
        (10, [(1, 1)], 0, 24, [(5, 1), (5, 2)], False, True,
         [2, 3, 5, 7], None, False, None, None),
        # multi-run ctts, reordered (offset swing 600 > delta 512)
        (20, [(1, 7), (3, 4)], 0, 12288, [(20, 512)], False, False,
         [1, 11], [(1, 600), (7, 0), (2, 0), (10, 0)], False, None, None),
        # explicit all-sync stss — distinct from the absent-box spelling
        (7, [(1, 3), (2, 2)], 48, 1000, [(3, 100), (4, 50)], True, False,
         [1, 2, 3, 4, 5, 6, 7], None, False, None, None),
        # co64 chunk offsets + largesize mdat: the >4 GiB layout in
        # miniature (every real file at 100-TB scale carries co64)
        (11, [(1, 4), (2, 3)], 0, 48000, [(11, 1600)], False, True,
         [1, 6], [(11, 800)], True, None, None),
        # the CLASSIC elst: one edit whose media_time exactly swallows
        # the constant ctts baseline → presented pts == dts
        (8, [(1, 4)], 0, 1000, [(8, 100)], False, False,
         [1, 5], [(8, 300)], False, [(800, 300)], None),
        # empty-edit delay + offset edit, with a DISTINCT movie
        # timescale (600 vs media 30000): delay = 60·30000//600 = 3000
        # media units, then media_time 1001 subtracts → shift +1999
        (10, [(1, 5)], 0, 30000, [(10, 1001)], True, False,
         [1, 4, 8], None, False, [(60, -1), (9009, 1001)], 600),
        # TRIMMING edit: media_time 150 lands mid-GOP — samples 0..1
        # (incl. keyframe 1) get NEGATIVE pts (decoded, not
        # presented); keyframe 5 stays presented
        (8, [(1, 2)], 0, 1000, [(8, 100)], False, False,
         [1, 5], None, False, [(650, 150)], None),
    ]
    for i, (
        n, stsc_runs, usize, tscale, stts_runs, audio, large, stss, ctts,
        co64, elst, mvts,
    ) in enumerate(shapes):
        sizes = (
            [usize] * n
            if usize
            else [rng9.randint(20, 80) for _ in range(n)]
        )
        samples = [
            bytes(rng9.randint(0, 255) for _ in range(sz)) for sz in sizes
        ]
        payload, offs, ts_ms, keyframes, pts_ms = _mp4_encode(
            samples, stsc_runs, usize, tscale, stts_runs, audio, large,
            stss_samples=stss, ctts_runs=ctts, use_co64=co64,
            elst_edits=elst, movie_timescale=mvts,
        )
        dur_units = sum(c * d for c, d in stts_runs)
        mp4_rows.append(
            {
                "media_id": 6000 + i,
                "mime": "video/mp4",
                "payload": payload,
                "n_samples": n,
                "duration_ms": dur_units * 1000 // tscale,
                "sample_off": offs,
                "sample_size": sizes,
                "sample_ts_ms": ts_ms,
                "keyframe": keyframes,
                "sample_pts_ms": pts_ms,
            }
        )

    # FRAGMENTED rows (ids 6100+): the CMAF/DASH layout — empty stbl,
    # geometry in moof/traf/trun — covering the knob combinations real
    # packagers emit (see _mp4_encode_fragmented). Same bookkeeping
    # discipline: every channel recorded from the generator's own
    # layout arithmetic, never from the walker.
    def _fsamples(rng, counts):
        return [
            [
                bytes(rng.randint(0, 255) for _ in range(rng.randint(18, 60)))
                for _ in range(c)
            ]
            for c in counts
        ]

    frag_shapes = [
        # classic CMAF: base-is-moof, tfdt, per-sample flags, v0 ctts
        dict(
            fragments=_fsamples(rng9, [4, 4]),
            timescale=30000,
            default_duration=1001,
            keyframes=[[True, False, False, False]] * 2,
            ctts_offsets=[[2002, 0, 1001, 0], [2002, 1001, 0, 0]],
        ),
        # first-sample-flags + defaults, explicit base_data_offset, NO
        # tfdt (running decode time), per-trun durations, v1 SIGNED
        # composition offsets, and a leading AUDIO traf in every moof
        dict(
            fragments=_fsamples(rng9, [3, 4, 2]),
            timescale=90000,
            default_duration=3003,
            keyframes=[[True, False, False], [True, False, False, False],
                       [True, False]],
            flags_mode="first",
            dur_overrides=[[3003, 3003, 3003], [3003, 1501, 1502, 3003],
                           [3003, 3003]],
            ctts_offsets=[[6006, -1501, 1501], [6006, 0, -3003, 1501],
                          [3003, 0]],
            trun_version=1,
            base_data_offset=True,
            tfdt=False,
            audio_trak=True,
        ),
        # all-default flags (every sample sync), multi-trun traf, and
        # an empty-edit delay at a DISTINCT movie timescale
        dict(
            fragments=_fsamples(rng9, [6]),
            timescale=1000,
            default_duration=100,
            keyframes=[[True] * 6],
            flags_mode="default",
            trun_split=[2],
            elst_edits=[(3, -1), (600, 100)],
            movie_timescale=10,
        ),
        # trimming edit over fragments: leading keyframe pts negative
        dict(
            fragments=_fsamples(rng9, [5, 5]),
            timescale=1000,
            default_duration=100,
            keyframes=[[True, False, True, False, False]] * 2,
            trun_split=[2, 0],
            elst_edits=[(850, 150)],
        ),
        # r13: DASH shape — sidx segment index (the byte-range index a
        # time-range sample seeks with) + v1 (64-bit-times)
        # mvhd/tkhd/mdhd, three fragments so a mid-range seek skips
        # fragments on both sides
        dict(
            fragments=_fsamples(rng9, [3, 4, 3]),
            timescale=600,
            default_duration=60,
            keyframes=[[True, False, False], [True, False, True, False],
                       [True, False, False]],
            ctts_offsets=[[120, 0, 60], [120, 60, 0, 0], [120, 0, 60]],
            sidx=True,
            v1_times=True,
        ),
        # r13: concatenated-CMAF segments — a styp box before each
        # moof, with the sidx references anchored at the styp
        dict(
            fragments=_fsamples(rng9, [4, 4]),
            timescale=1000,
            default_duration=50,
            keyframes=[[True, False, False, False]] * 2,
            sidx=True,
            styp=True,
        ),
    ]
    for j, spec in enumerate(frag_shapes):
        payload, offs, ts_ms, keys, pts_ms, frags = _mp4_encode_fragmented(
            **spec
        )
        sizes = [len(s) for f in spec["fragments"] for s in f]
        n = len(sizes)
        dur_units = (
            sum(sum(d) for d in spec["dur_overrides"])
            if "dur_overrides" in spec
            else n * spec["default_duration"]
        )
        ts = spec["timescale"]
        mp4_rows.append(
            {
                "media_id": 6100 + j,
                "mime": "video/mp4",
                "payload": payload,
                "n_samples": n,
                "duration_ms": dur_units * 1000 // ts,
                "sample_off": offs,
                "sample_size": sizes,
                "sample_ts_ms": ts_ms,
                "keyframe": keys,
                "sample_pts_ms": pts_ms,
                # r13: the fragment byte ranges + presentation windows
                # a sidx-led seek lands on, from the generator's own
                # layout arithmetic (pix_off discipline) — recorded
                # for every fragmented row, sidx box or not
                "frag_off": [f[0] for f in frags],
                "frag_size": [f[1] for f in frags],
                "frag_ept_ms": [f[2] * 1000 // ts for f in frags],
                "frag_dur_ms": [f[3] * 1000 // ts for f in frags],
            }
        )
    mp4_schema = pa.schema(
        [
            ("media_id", pa.int64()),
            ("mime", pa.string()),
            ("payload", pa.binary()),
            ("n_samples", pa.int32()),
            ("duration_ms", pa.int64()),
            ("sample_off", pa.list_(pa.int32())),
            ("sample_size", pa.list_(pa.int32())),
            ("sample_ts_ms", pa.list_(pa.int64())),
            ("keyframe", pa.list_(pa.bool_())),
            ("sample_pts_ms", pa.list_(pa.int64())),
            ("frag_off", pa.list_(pa.int64())),
            ("frag_size", pa.list_(pa.int64())),
            ("frag_ept_ms", pa.list_(pa.int64())),
            ("frag_dur_ms", pa.list_(pa.int64())),
        ]
    )
    pq.write_table(
        pa.Table.from_pylist(mp4_rows, schema=mp4_schema),
        os.path.join(PQ_DIR, "media_mp4.parquet"),
    )

    # --- REAL-format media fixture #7: AIFF (late r11) — WAV's
    # BIG-ENDIAN twin under the IFF chunk grammar: FORM/AIFF container,
    # COMM carrying the sample rate as an 80-bit IEEE 754 extended
    # float (the classic parse real decoders must get right), SSND
    # with its own leading (offset, blockSize) pair that shifts where
    # sound data begins, interleaved extra chunks and odd-size padding
    # like RIFF. ``data_off``/``n_samples`` are recorded at GENERATION
    # time (the WAV discipline) so the oracle re-decodes int16 BE
    # from independent coordinates — a chunk mis-walk, a missed pad
    # byte, or a mis-handled SSND offset is a value mismatch.
    rngA = random.Random(101010)
    aiff_rows = []
    for i, (n_frames, n_ch, rate, ssnd_off, extra) in enumerate(
        [(8, 1, 44100, 0, False), (100, 1, 22050, 0, True),
         (100, 2, 48000, 8, False), (250, 1, 8000, 0, True),
         (33, 2, 96000, 4, True), (64, 1, 11025, 0, False),
         (9, 1, 44100, 12, True), (300, 2, 16000, 0, False)]
    ):
        n_samples = n_frames * n_ch
        data = b"".join(
            rngA.randint(-32768, 32767).to_bytes(2, "big", signed=True)
            for _ in range(n_samples)
        )
        payload, data_off = _aiff_encode(
            data, n_frames, n_ch, rate, ssnd_off, extra, rngA
        )
        aiff_rows.append(
            {
                "media_id": 7000 + i,
                "mime": "audio/aiff",
                "payload": payload,
                "n_samples": n_samples,
                "n_channels": n_ch,
                "sample_rate": rate,
                "data_off": data_off,
                "duration_ms": n_frames * 1000 // rate,
            }
        )
    pq.write_table(
        pa.Table.from_pylist(aiff_rows, schema=wav_schema),
        os.path.join(PQ_DIR, "media_aiff.parquet"),
    )
    # --- REAL-format media fixture #8: baseline TIFF, 8-bit RGB,
    # strip-organized (round 15 — the verdict's lossless-decoder
    # extension). Uncompressed (compression 1) and PackBits (32773)
    # variants; the PackBits COMPRESSOR lives here, independently
    # implemented from TIFF 6.0 §9 (literal/repeat runs split at 128,
    # per-ROW restart as the spec requires, optional -128 no-op
    # controls injected), while the decoder in multimodal.py runs the
    # inverse — the GIF/LZW two-independent-implementations posture.
    # Layout knobs exercise what real writers emit: both byte orders
    # (II and MM — inline IFD values are left-justified in the FILE's
    # byte order, the classic decoder gotcha), multi-strip images with
    # varying RowsPerStrip (1, tiny, exact, > height), pad bytes
    # before the strip data (non-minimal layouts), an ASCII Software
    # tag to be skipped, and a missing RowsPerStrip on one row (spec
    # default: all rows in one strip). ``strip_offsets``/
    # ``strip_bytecounts``/``raw_px`` are recorded at GENERATION time:
    # the oracle re-decodes UNCOMPRESSED payloads byte-for-byte from
    # those independent coordinates (the WAV posture) and recomputes
    # PackBits rows from raw_px (the PNG/GIF posture — SQL cannot
    # run-length-decode).
    rngT = random.Random(151515)
    tiff_rows = []
    plans = [
        # (w, h, rows_per_strip|None, compression, big_endian,
        #  pad, software_tag, noop, runny)
        (8, 5, 2, 1, False, 0, False, False, False),
        (11, 4, 1, 1, True, 0, True, False, False),
        (16, 7, 7, 32773, False, 0, False, False, False),
        (23, 3, 2, 32773, True, 6, False, True, True),
        (32, 9, 4, 1, False, 3, True, False, False),
        (40, 6, 100, 32773, False, 0, False, False, True),
        (9, 12, 5, 1, True, 0, False, False, False),
        (13, 2, None, 1, False, 0, True, False, False),
        (17, 11, 3, 32773, True, 0, True, True, False),
        (25, 8, 8, 32773, False, 2, False, False, True),
        (33, 1, 1, 32773, True, 0, False, True, True),
        (48, 10, 6, 1, True, 5, False, False, False),
    ]
    for i, (w, h, rps, comp, big, pad, sw, noop, runny) in enumerate(plans):
        if runny:
            # flat segments so PackBits repeat runs (incl. length-128
            # maxima) actually occur; pure-random bytes almost never run
            raw = bytearray()
            while len(raw) < 3 * w * h:
                raw += bytes([rngT.randint(0, 255)]) * rngT.choice(
                    [1, 2, 3, 7, 40, 128, 140]
                )
            raw = bytes(raw[: 3 * w * h])
        else:
            raw = bytes(rngT.randint(0, 255) for _ in range(3 * w * h))
        payload, soffs, scnts = _tiff_encode(
            raw,
            w,
            h,
            rows_per_strip=rps,
            compression=comp,
            big_endian=big,
            pad=pad,
            software_tag=sw,
            noop_rng=rngT if noop else None,
        )
        tiff_rows.append(
            {
                "media_id": 8000 + i,
                "mime": "image/tiff",
                "payload": payload,
                "width": w,
                "height": h,
                "raw_px": raw,
                "compression": comp,
                "rows_per_strip": rps if rps is not None else h,
                "strip_offsets": soffs,
                "strip_bytecounts": scnts,
            }
        )
    tiff_schema = pa.schema(
        [
            ("media_id", pa.int64()),
            ("mime", pa.string()),
            ("payload", pa.binary()),
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("raw_px", pa.binary()),
            ("compression", pa.int32()),
            ("rows_per_strip", pa.int32()),
            ("strip_offsets", pa.list_(pa.int64())),
            ("strip_bytecounts", pa.list_(pa.int64())),
        ]
    )
    pq.write_table(
        pa.Table.from_pylist(tiff_rows, schema=tiff_schema),
        os.path.join(PQ_DIR, "media_tiff.parquet"),
    )

    # --- REAL-format media fixture #9: Matroska/EBML (round 15 — the
    # second major container family next to ISO BMFF). The muxer below
    # (_mkv_encode) is an independent from-the-spec implementation; the
    # bookkeeping arrays here are its OWN layout arithmetic, so a walker
    # mis-parse (vint width, lace arithmetic, BlockGroup keyframe rule,
    # unknown-size element end, cue seek bound) is a value mismatch.
    # Layout knobs exercise what real muxers emit: all four lacings
    # (none/Xiph/fixed/EBML incl. multi-255 Xiph bytes, a zero-byte
    # laced frame, signed EBML deltas), BlockGroup+ReferenceBlock
    # keyframe semantics, unknown-size Segment/Cluster (live muxing),
    # CRC-32/Void skippables, a 2-byte track-number vint with the video
    # track NOT first, non-default and coarse TimestampScales, and a
    # deliberate negative-relative-timestamp row that seek must detect
    # and fall back on (seek_conformant=False).
    rngM = random.Random(181818)

    def _fr(n: int) -> bytes:
        return bytes(rngM.randint(0, 255) for _ in range(n))

    def _blk(rel=0, key=True, size=20, lacing="none", sizes=None, **kw):
        frames = [_fr(s) for s in sizes] if sizes else [_fr(size)]
        return dict(rel=rel, key=key, lacing=lacing, frames=frames, **kw)

    mkv_specs = [
        # 9000: sized elements, 1 ms ticks, SimpleBlocks, no lacing
        dict(
            clusters=[
                dict(ts=0, blocks=[_blk(0, True), _blk(40, False, 16),
                                   _blk(180, True, 24)]),
                dict(ts=400, blocks=[_blk(0, True), _blk(120, False, 18),
                                     _blk(250, True, 22)]),
                dict(ts=900, blocks=[_blk(0, True), _blk(80, False, 30)]),
            ],
            duration_elem=True,
        ),
        # 9001: 0.5 ms ticks, Xiph lacing (255/510-byte frames force
        # multi-255 lace bytes; one zero-byte frame)
        dict(
            clusters=[
                dict(ts=0, blocks=[
                    _blk(0, True, lacing="xiph", sizes=[255, 510, 17]),
                    _blk(401, False, 12),
                ]),
                dict(ts=700, blocks=[
                    _blk(0, True, 14),
                    _blk(500, True, lacing="xiph", sizes=[0, 9, 33]),
                ]),
                dict(ts=1500, blocks=[_blk(0, True), _blk(300, False)]),
                dict(ts=2300, blocks=[_blk(0, True)]),
            ],
            timestamp_scale=500_000,
        ),
        # 9002: BlockGroups (keyframe ⟺ no ReferenceBlock) + EBML lacing
        dict(
            clusters=[
                dict(ts=100, blocks=[
                    _blk(0, True, lacing="ebml", sizes=[60, 200, 90, 5],
                         group=True),
                    _blk(150, False, 18, group=True),
                    _blk(300, True, 20),
                ]),
                dict(ts=500, blocks=[
                    _blk(0, True, lacing="ebml", sizes=[10, 10, 300],
                         group=True),
                    _blk(120, False, 25),
                ]),
            ],
        ),
        # 9003: unknown-size Segment + unknown-size Clusters, fixed
        # lacing, CRC-32/Void skippables, NO cues (full-walk row)
        dict(
            clusters=[
                dict(ts=0, crc=True, blocks=[
                    _blk(0, True, lacing="fixed", sizes=[24] * 4),
                    _blk(150, False, 11),
                ]),
                dict(ts=300, unknown=True, void=True, blocks=[
                    _blk(0, True, 19),
                    _blk(200, False, lacing="fixed", sizes=[10, 10]),
                ]),
                dict(ts=800, unknown=True, blocks=[_blk(0, True, 21)]),
            ],
            cues=False,
            unknown_segment=True,
            void_pad=9,
        ),
        # 9004: video track 200 (2-byte vint), audio track 1 FIRST in
        # Tracks, interleaved audio blocks the walker must skip
        dict(
            clusters=[
                dict(ts=0, blocks=[
                    _blk(10, True, 8, track=1),
                    _blk(0, True, 20),
                    _blk(90, True, 9, track=1),
                    _blk(200, False, 17),
                ]),
                dict(ts=450, blocks=[
                    _blk(0, True, 23),
                    _blk(5, True, 7, track=1),
                    _blk(230, True, 26),
                ]),
            ],
            video_track=200,
            audio_track=1,
            audio_first=True,
        ),
        # 9005: coarse 2 ms ticks, keyframe exactly AT the registered
        # window's hi bound (700 ms) plus one just past it
        dict(
            clusters=[
                dict(ts=61, blocks=[_blk(0, True), _blk(39, False, 13),
                                    _blk(89, True, 15)]),
                dict(ts=333, blocks=[_blk(0, True), _blk(17, True, 28),
                                     _blk(18, False, 12)]),
            ],
            timestamp_scale=2_000_000,
        ),
        # 9006: entirely past the registered window (seek parses at
        # most one cluster header and emits nothing)
        dict(
            clusters=[
                dict(ts=5000, blocks=[_blk(0, True), _blk(100, False)]),
                dict(ts=6000, blocks=[_blk(0, True)]),
            ],
        ),
        # 9007: negative relative timestamp in an in-window cluster —
        # the seek-path validator must fall back to the full walk
        dict(
            clusters=[
                dict(ts=0, blocks=[_blk(0, True)]),
                dict(ts=400, blocks=[_blk(-40, True, 16), _blk(50, False)]),
                dict(ts=900, blocks=[_blk(0, True)]),
            ],
        ),
    ]
    mkv_rows = []
    for j, spec in enumerate(mkv_specs):
        payload, offs, sizes, keys, pts_ms, cmeta = _mkv_encode(**spec)
        scale = spec.get("timestamp_scale", 1_000_000)
        conformant = j != 7
        if spec.get("cues", True) and conformant:
            # assert the muxer kept the seek-trust constraints the
            # walker documents: monotone cluster timestamps, rel ≥ 0,
            # every block tick strictly below the NEXT cluster's ts
            cts = [m[2] for m in cmeta]
            assert cts == sorted(set(cts)), "cluster ts not monotone"
            for c, nxt in zip(spec["clusters"], cts[1:] + [None]):
                for b in c["blocks"]:
                    assert b.get("rel", 0) >= 0
                    if nxt is not None:
                        assert c["ts"] + b.get("rel", 0) < nxt
        mkv_rows.append(
            {
                "media_id": 9000 + j,
                "mime": "video/x-matroska",
                "payload": payload,
                "n_samples": len(offs),
                "duration_ms": max(pts_ms) if pts_ms else 0,
                "sample_off": offs,
                "sample_size": sizes,
                "sample_pts_ms": pts_ms,
                "keyframe": keys,
                "cluster_off": [m[0] for m in cmeta],
                "cluster_size": [m[1] for m in cmeta],
                "cluster_ts_ticks": [m[2] for m in cmeta],
                "timestamp_scale": scale,
                "has_cues": spec.get("cues", True),
                "seek_conformant": conformant,
            }
        )
    mkv_schema = pa.schema(
        [
            ("media_id", pa.int64()),
            ("mime", pa.string()),
            ("payload", pa.binary()),
            ("n_samples", pa.int32()),
            ("duration_ms", pa.int64()),
            ("sample_off", pa.list_(pa.int32())),
            ("sample_size", pa.list_(pa.int32())),
            ("sample_pts_ms", pa.list_(pa.int64())),
            ("keyframe", pa.list_(pa.bool_())),
            ("cluster_off", pa.list_(pa.int64())),
            ("cluster_size", pa.list_(pa.int64())),
            ("cluster_ts_ticks", pa.list_(pa.int64())),
            ("timestamp_scale", pa.int64()),
            ("has_cues", pa.bool_()),
            ("seek_conformant", pa.bool_()),
        ]
    )
    pq.write_table(
        pa.Table.from_pylist(mkv_rows, schema=mkv_schema),
        os.path.join(PQ_DIR, "media_mkv.parquet"),
    )

    gen_warc_fixture()

    print(f"fixtures written under {os.path.join(ROOT, 'fixtures')}")


def _warc_record(headers: "list[tuple[str, str]]", block: bytes) -> bytes:
    """One WARC/1.0 record per ISO 28500 §4: version line, named
    fields, CRLF CRLF, Content-Length block bytes, CRLF CRLF. The
    walker (operators/warc.py) is an independent implementation — this
    builder is the generator's own arithmetic."""
    lines = ["WARC/1.0"] + [f"{k}: {v}" for k, v in headers]
    return "\r\n".join(lines).encode() + b"\r\n\r\n" + block + b"\r\n\r\n"


def gen_warc_fixture() -> None:
    """WARC ingest corpus (round 17): the Common Crawl wire format — a
    100-TB training-data pipeline's raw input. Each fixture row is one
    complete WARC file as an opaque binary payload: either PLAIN (record
    stream) or GZ (one gzip member per record, the .warc.gz convention,
    mtime pinned to 0 for byte determinism). Bookkeeping arrays are the
    generator's OWN layout arithmetic (per-record type, target URI,
    HTTP status, block length/byte-sum, block offset in the plain
    stream), so a walker mis-parse — header case, Content-Length-driven
    block bounds, gzip member boundaries, the strict CRLF CRLF record
    terminator — is a value mismatch. Hostile content is deliberate:
    blocks CONTAIN "\\r\\n\\r\\nWARC/1.0" (a delimiter-scanning parser
    desynchronizes; only Content-Length parsing survives), header names
    vary case with optional-whitespace values, bodies include NULs and
    high bytes, and one block is zero-length."""
    import gzip

    rngW = random.Random(171717)
    hosts = ["example.com", "data.test", "crawl.invalid"]
    statuses = [
        (200, "OK"),
        (301, "Moved Permanently"),
        (404, "Not Found"),
        (503, "Service Unavailable"),
    ]

    def _uri(fid: int, i: int) -> str:
        return (
            f"http://{hosts[(fid + i) % len(hosts)]}/p/{fid}/{i}"
            f"?q={rngW.randint(0, 99)}"
        )

    def _http_response(status: int, reason: str, body: bytes) -> bytes:
        ver = "HTTP/1.1" if rngW.random() < 0.7 else "HTTP/1.0"
        head = (
            f"{ver} {status} {reason}\r\n"
            f"Content-Type: text/html\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        )
        return head.encode() + body

    def _expected_text(body: bytes) -> str:
        """The generator's OWN html→text bookkeeping (round 18, for
        warc_to_documents' oracle): a character state machine — not
        the module's regex — so a wrong tag-strip is a value mismatch,
        mirroring rec_sum's independent-arithmetic posture. An
        unterminated '<...' tail stays literal (the regex semantics:
        '<[^>]*>' needs the closing '>'). Uses NO rng — extending the
        bookkeeping must not perturb the seeded byte stream."""
        s = body.decode("utf-8", "replace")
        out: list = []
        tag: "list | None" = None
        for ch in s:
            if tag is not None:
                if ch == ">":
                    out.append(" ")
                    tag = None
                else:
                    tag.append(ch)
            elif ch == "<":
                tag = []
            else:
                out.append(ch)
        if tag is not None:
            out.append("<" + "".join(tag))
        t = "".join(out)
        for ent, c in (
            ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
            ("&apos;", "'"), ("&amp;", "&"),
        ):
            t = t.replace(ent, c)
        return " ".join(t.split())

    def _headers(warc_type, uri, block, casing, pad):
        # Content-Length name casing and value padding vary per record:
        # field names are case-insensitive and values take optional
        # whitespace (ISO 28500 §4) — a parser that only matches
        # "Content-Length: " literally mis-reads real crawler output
        cl_name = ["Content-Length", "content-length", "CONTENT-LENGTH"][
            casing
        ]
        h = [
            ("WARC-Type", warc_type),
            (
                "WARC-Record-ID",
                f"<urn:uuid:0000-{rngW.randint(0, 10**9)}>",
            ),
            ("WARC-Date", "2026-08-16T00:00:00Z"),
        ]
        if uri is not None:
            h.append(("WARC-Target-URI", uri))
        if warc_type == "response":
            h.append(
                ("Content-Type", "application/http;msgtype=response")
            )
        h.append((cl_name, f"{len(block)}" + (" " if pad else "")))
        rngW.shuffle(h)
        return h

    def _rich_body(fid: int, i: int) -> "tuple[bytes, list]":
        """Round-18 document-bearing page: nested tags, attributes,
        the five XML entities (incl. the double-escape &amp;lt;), a
        literal non-table entity (&eacute; must survive), multi-byte
        UTF-8, messy whitespace — the surface warc_to_documents'
        html→text must normalize — and 2–4 anchors with MESSY hrefs
        (mixed-case scheme/host, default ports, fragments, utm_*
        params, unsorted query params, relative paths, a non-http
        scheme) — the surface warc_links/url_normalize must resolve.
        Returns (body, links) where links are the UNESCAPED attribute
        values (the generator's own bookkeeping: hrefs are &amp;-
        escaped in the html source and recorded unescaped).
        Deterministic in (fid, i, rngW)."""
        words = " ".join(
            rngW.choice(["alpha", "beta", "café", "delta", "echo"])
            for _ in range(rngW.randint(3, 9))
        )
        links = ["/x?a=1&b=2"]
        for _ in range(rngW.randint(1, 3)):
            host = hosts[rngW.randint(0, len(hosts) - 1)]
            kind = rngW.randint(0, 6)
            if kind == 0:
                links.append(
                    f"HTTP://{host.upper()}:80/A/b"
                    f"?utm_source=news&b={rngW.randint(0, 9)}&a=1#frag"
                )
            elif kind == 1:
                links.append(
                    f"https://{host}:443/path/{rngW.randint(0, 9)}"
                    f"?z=9&y=8"
                )
            elif kind == 2:
                links.append(f"http://{host}/p/{fid}/{rngW.randint(0, 9)}")
            elif kind == 3:
                links.append(f"/local/{rngW.randint(0, 9)}?a=1&b=2")
            elif kind == 4:
                links.append("mailto:crawler@example.invalid")
            elif kind == 5:
                # protocol-relative: authority is its own host
                links.append(f"//{host}/cdn/lib{rngW.randint(0, 9)}.js")
            else:
                # a '?' INSIDE the dropped fragment must not resurrect
                # as query params
                links.append(f"/doc{rngW.randint(0, 9)}#sec?x=1")
        anchors = "\n  ".join(
            f"<a href=\"{h.replace('&', '&amp;')}\">L{n}</a>"
            for n, h in enumerate(links)
        )
        body = (
            f"<html><head><title>T{fid}-{i}</title></head>\n"
            f"<body>\n  <p class=\"lead\">Fish &amp; chips {fid}/{i}"
            f" &lt;tag&gt; &amp;lt;not-a-tag&amp;gt;</p>\n"
            f"  {anchors}\n"
            f"  <a href=\"/x?a=1&amp;b=2\">{words} &eacute;</a>\n"
            f"  <div>\t{words.upper()}  </div>\n</body></html>"
        ).encode()
        return body, links + ["/x?a=1&b=2"]

    warc_rows = []
    for fid in range(12):
        gz = fid % 2 == 1
        recs = []  # (warc_type, uri, status, block, text)
        recs.append(
            (
                "warcinfo",
                None,
                None,
                b"software: warcgen/1.0\r\n"
                b"format: WARC File Format 1.0\r\n",
                None,
            )
        )
        for i in range(rngW.randint(2, 6)):
            uri = _uri(fid, i)
            kind = rngW.choice(
                ["pair", "pair", "resource", "metadata", "revisit"]
            )
            if kind == "pair":
                req = (
                    f"GET /p/{fid}/{i} HTTP/1.1\r\n"
                    f"Host: {hosts[(fid + i) % len(hosts)]}\r\n"
                    f"User-Agent: warcgen\r\n\r\n"
                ).encode()
                recs.append(("request", uri, None, req, None))
                status, reason = statuses[rngW.randint(0, 3)]
                body = (
                    f"<html>doc {fid}/{i} "
                    + "x" * rngW.randint(0, 120)
                    + "</html>"
                ).encode()
                if rngW.random() < 0.3:
                    # the hostile case: a record terminator + version
                    # line INSIDE the block
                    body += b"\r\n\r\nWARC/1.0\r\nnot-a-record: 1"
                recs.append(
                    ("response", uri, status,
                     _http_response(status, reason, body),
                     _expected_text(body) if 200 <= status < 300
                     else None)
                )
            elif kind == "resource":
                body = bytes(
                    rngW.randint(0, 255) for _ in range(rngW.randint(0, 180))
                )
                recs.append(("resource", uri, None, body, None))
            elif kind == "metadata":
                recs.append(
                    ("metadata", uri, None,
                     f"fetchTimeMs: {rngW.randint(1, 5000)}\r\n".encode(),
                     None)
                )
            else:
                recs.append(("revisit", uri, None, b"", None))

        payload = bytearray()
        types, uris, stats, lens, sums, offs, texts, linkss = (
            [], [], [], [], [], [], [], []
        )
        for ri, rec in enumerate(recs):
            warc_type, uri, status, block, text = rec[:5]
            links = rec[5] if len(rec) > 5 else []
            raw = _warc_record(
                _headers(
                    warc_type, uri, block,
                    casing=rngW.randint(0, 2), pad=rngW.random() < 0.25,
                ),
                block,
            )
            if gz:
                offs.append(len(payload))  # member start (bookkeeping)
                payload += gzip.compress(raw, compresslevel=6, mtime=0)
            else:
                # block offset in the plain stream: record start + the
                # header bytes (raw ends with block + 4 terminator bytes)
                offs.append(len(payload) + len(raw) - len(block) - 4)
                payload += raw
            types.append(warc_type)
            uris.append(uri)
            stats.append(status)
            lens.append(len(block))
            sums.append(sum(block))
            texts.append(text)
            linkss.append(links)
        warc_rows.append(
            {
                "file_id": fid,
                "gz": gz,
                "payload": bytes(payload),
                "rec_type": types,
                "rec_uri": uris,
                "rec_status": stats,
                "rec_len": lens,
                "rec_sum": sums,
                "rec_off": offs,
                "rec_text": texts,
                "rec_links": linkss,
            }
        )

    # --- round-18 extension: document-bearing crawl files 12–23 ---
    # Response-heavy pages with rich HTML (tags, entities, UTF-8,
    # messy whitespace) so warc_to_documents has a corpus worth
    # hashing: the r17 files are spec-corner-hostile but yield only 3
    # successful HTML docs. Appended AFTER the original loop so files
    # 0–11 consume the identical rngW prefix — their payload bytes are
    # unchanged (asserted at regeneration time).
    for fid in range(12, 24):
        gz = fid % 2 == 1
        recs = [
            (
                "warcinfo",
                None,
                None,
                b"software: warcgen/1.0\r\n"
                b"format: WARC File Format 1.0\r\n",
                None,
            )
        ]
        for i in range(rngW.randint(3, 7)):
            uri = _uri(fid, i)
            if rngW.random() < 0.7:
                status, reason = statuses[0]
            else:
                status, reason = statuses[rngW.randint(1, 3)]
            body, links = _rich_body(fid, i)
            recs.append(
                ("response", uri, status,
                 _http_response(status, reason, body),
                 _expected_text(body) if 200 <= status < 300 else None,
                 links if 200 <= status < 300 else [])
            )
        payload = bytearray()
        types, uris, stats, lens, sums, offs, texts, linkss = (
            [], [], [], [], [], [], [], []
        )
        for ri, rec in enumerate(recs):
            warc_type, uri, status, block, text = rec[:5]
            links = rec[5] if len(rec) > 5 else []
            raw = _warc_record(
                _headers(
                    warc_type, uri, block,
                    casing=rngW.randint(0, 2), pad=rngW.random() < 0.25,
                ),
                block,
            )
            if gz:
                offs.append(len(payload))
                payload += gzip.compress(raw, compresslevel=6, mtime=0)
            else:
                offs.append(len(payload) + len(raw) - len(block) - 4)
                payload += raw
            types.append(warc_type)
            uris.append(uri)
            stats.append(status)
            lens.append(len(block))
            sums.append(sum(block))
            texts.append(text)
            linkss.append(links)
        warc_rows.append(
            {
                "file_id": fid,
                "gz": gz,
                "payload": bytes(payload),
                "rec_type": types,
                "rec_uri": uris,
                "rec_status": stats,
                "rec_len": lens,
                "rec_sum": sums,
                "rec_off": offs,
                "rec_text": texts,
                "rec_links": linkss,
            }
        )
    warc_schema = pa.schema(
        [
            ("file_id", pa.int64()),
            ("gz", pa.bool_()),
            ("payload", pa.binary()),
            ("rec_type", pa.list_(pa.string())),
            ("rec_uri", pa.list_(pa.string())),
            ("rec_status", pa.list_(pa.int32())),
            ("rec_len", pa.list_(pa.int64())),
            ("rec_sum", pa.list_(pa.int64())),
            ("rec_off", pa.list_(pa.int64())),
            ("rec_text", pa.list_(pa.string())),
            ("rec_links", pa.list_(pa.list_(pa.string()))),
        ]
    )
    pq.write_table(
        pa.Table.from_pylist(warc_rows, schema=warc_schema),
        os.path.join(PQ_DIR, "warc.parquet"),
    )


def _f80(rate: int) -> bytes:
    """Encode a positive integer as an 80-bit IEEE 754 extended float
    (1 sign + 15 exponent bits, then a 64-bit mantissa with an
    EXPLICIT integer bit) — the representation AIFF's COMM chunk uses
    for the sample rate. Independent of the decoder's parse."""
    assert rate > 0
    e = rate.bit_length() - 1  # floor(log2)
    mantissa = rate << (63 - e)  # integer bit at position 63
    return (16383 + e).to_bytes(2, "big") + mantissa.to_bytes(8, "big")


def _aiff_encode(
    data: bytes,
    n_frames: int,
    n_ch: int,
    rate: int,
    ssnd_off: int,
    extra_chunk: bool,
    rng: "random.Random",
):
    """Minimal-but-genuine AIFF: FORM/AIFF with COMM (big-endian
    fields, 80-bit extended sample rate) and SSND (leading offset +
    blockSize u32 pair, then ``ssnd_off`` pad bytes before the sound
    data); optionally an odd-sized ANNO chunk (IFF even-padding)
    between them. Returns (payload, absolute sound-data offset)."""
    comm_body = (
        n_ch.to_bytes(2, "big")
        + n_frames.to_bytes(4, "big")
        + (16).to_bytes(2, "big")
        + _f80(rate)
    )
    chunks = b"COMM" + len(comm_body).to_bytes(4, "big") + comm_body
    if extra_chunk:
        anno = bytes(rng.randint(32, 126) for _ in range(7))  # odd size
        chunks += b"ANNO" + (7).to_bytes(4, "big") + anno + b"\x00"
    ssnd_body = (
        ssnd_off.to_bytes(4, "big")
        + (0).to_bytes(4, "big")
        + bytes(ssnd_off)
        + data
    )
    data_off_in_chunks = len(chunks) + 8 + 8 + ssnd_off
    chunks += b"SSND" + len(ssnd_body).to_bytes(4, "big") + ssnd_body
    payload = (
        b"FORM" + (4 + len(chunks)).to_bytes(4, "big") + b"AIFF" + chunks
    )
    return payload, 12 + data_off_in_chunks


def _box(typ: bytes, body: bytes, large: bool = False) -> bytes:
    """One ISO BMFF box. ``large=True`` uses the size==1 + 64-bit
    largesize form (spec §4.2) that naive 32-bit-only walkers break on."""
    if large:
        return (
            (1).to_bytes(4, "big")
            + typ
            + (16 + len(body)).to_bytes(8, "big")
            + body
        )
    return (8 + len(body)).to_bytes(4, "big") + typ + body


def _full(typ: bytes, body: bytes) -> bytes:
    """FullBox: version 0, flags 0."""
    return _box(typ, bytes(4) + body)


def _fullv1(typ: bytes, body: bytes) -> bytes:
    """FullBox: version 1, flags 0 — the 64-bit-times form real
    long-duration encoders emit for mvhd/tkhd/mdhd."""
    return _box(typ, b"\x01" + bytes(3) + body)


def _mp4_encode(
    samples: list[bytes],
    stsc_runs: list[tuple[int, int]],
    uniform_size: int,
    timescale: int,
    stts_runs: list[tuple[int, int]],
    audio_trak: bool,
    large_mdat: bool,
    stss_samples: list[int] | None = None,
    ctts_runs: list[tuple[int, int]] | None = None,
    use_co64: bool = False,
    elst_edits: list[tuple[int, int]] | None = None,
    movie_timescale: int | None = None,
    v1_times: bool = False,
):
    """Minimal-but-genuine MP4: ftyp + moov (mvhd + [soun trak] +
    vide trak with full stbl sample tables) + mdat. Chunk layout
    follows ``stsc_runs`` ((first_chunk, samples_per_chunk), 1-based,
    last run open-ended per spec); ``stco`` carries ABSOLUTE file
    offsets, so moov is built twice — once with zeroed stco to fix the
    layout, then with the real offsets (same byte length).

    Round 12 adds the two optional timing tables of ISO 14496-12 that
    keyframe-aware sampling needs: ``stss_samples`` (1-based sync
    sample numbers, ascending; None OMITS the box, which per §8.6.2
    means EVERY sample is sync) and ``ctts_runs`` (version-0
    (sample_count, composition_offset) runs; None omits the box, so
    pts == dts) — plus ``use_co64`` (carry chunk offsets as the
    64-bit co64 box instead of stco, mandatory in real files past
    4 GiB), ``elst_edits`` (version-0 edit list as (segment_duration
    in MOVIE timescale, media_time in MEDIA timescale | -1 for an
    empty edit) pairs, media_rate fixed at 1.0; supported plans
    mirror the walker: [non-empty] or [empty, non-empty]), and
    ``movie_timescale`` (mvhd timescale, defaults to the media
    timescale — set differently to exercise the empty-edit
    movie→media conversion). Returns (payload, per-sample absolute offsets,
    per-sample decode ts in ms, per-sample keyframe flags, per-sample
    PRESENTATION ts in ms) — the generator's own bookkeeping,
    independent of the decoder's walk."""
    n = len(samples)
    sizes = [len(s) for s in samples]

    # chunk the samples per stsc_runs
    chunks: list[list[int]] = []  # sample indices per chunk
    run_idx, next_sample = 0, 0
    chunk_no = 1
    while next_sample < n:
        while (
            run_idx + 1 < len(stsc_runs)
            and stsc_runs[run_idx + 1][0] <= chunk_no
        ):
            run_idx += 1
        spc = stsc_runs[run_idx][1]
        chunks.append(list(range(next_sample, min(n, next_sample + spc))))
        next_sample += spc
        chunk_no += 1

    deltas = []
    for count, delta in stts_runs:
        deltas += [delta] * count
    assert len(deltas) == n, "stts_runs must cover every sample"
    ts_units = [sum(deltas[:k]) for k in range(n)]
    ts_ms = [t * 1000 // timescale for t in ts_units]
    dur = sum(deltas)

    # generation-time keyframe flags + presentation timestamps — the
    # oracle's independent coordinates for keyframe-aware sampling
    if stss_samples is None:
        keyframes = [True] * n  # no stss box: every sample is sync
    else:
        assert stss_samples == sorted(set(stss_samples)), "stss ascending"
        assert all(1 <= s <= n for s in stss_samples), "stss in range"
        sync_set = set(stss_samples)
        keyframes = [(k + 1) in sync_set for k in range(n)]
    cofs = []
    for count, off in ctts_runs or []:
        cofs += [off] * count
    if ctts_runs is not None:
        assert len(cofs) == n, "ctts_runs must cover every sample"
    else:
        cofs = [0] * n
    mv_tscale = movie_timescale if movie_timescale is not None else timescale
    # edit-list shift bookkeeping (independent of the walker): a
    # leading empty edit delays by its MOVIE-timescale duration, the
    # non-empty edit's media_time subtracts; trimmed leading samples
    # legitimately record NEGATIVE pts
    edit_shift = 0
    if elst_edits is not None:
        if len(elst_edits) == 2:
            assert elst_edits[0][1] == -1 and elst_edits[1][1] >= 0
            edit_shift = (
                elst_edits[0][0] * timescale // mv_tscale
                - elst_edits[1][1]
            )
        else:
            assert len(elst_edits) == 1 and elst_edits[0][1] >= 0
            edit_shift = -elst_edits[0][1]
    pts_ms = [
        (t + o + edit_shift) * 1000 // timescale
        for t, o in zip(ts_units, cofs)
    ]

    stts = _full(
        b"stts",
        len(stts_runs).to_bytes(4, "big")
        + b"".join(
            c.to_bytes(4, "big") + d.to_bytes(4, "big") for c, d in stts_runs
        ),
    )
    stsc = _full(
        b"stsc",
        len(stsc_runs).to_bytes(4, "big")
        + b"".join(
            fc.to_bytes(4, "big") + spc.to_bytes(4, "big") + (1).to_bytes(4, "big")
            for fc, spc in stsc_runs
        ),
    )
    stsz = _full(
        b"stsz",
        uniform_size.to_bytes(4, "big")
        + n.to_bytes(4, "big")
        + (
            b""
            if uniform_size
            else b"".join(sz.to_bytes(4, "big") for sz in sizes)
        ),
    )
    stsd = _full(
        b"stsd", (1).to_bytes(4, "big") + _box(b"mp4v", bytes(78))
    )
    ctts = (
        b""
        if ctts_runs is None
        else _full(
            b"ctts",
            len(ctts_runs).to_bytes(4, "big")
            + b"".join(
                c.to_bytes(4, "big") + o.to_bytes(4, "big")
                for c, o in ctts_runs
            ),
        )
    )
    stss = (
        b""
        if stss_samples is None
        else _full(
            b"stss",
            len(stss_samples).to_bytes(4, "big")
            + b"".join(s.to_bytes(4, "big") for s in stss_samples),
        )
    )

    def stbl(stco_offsets: list[int]) -> bytes:
        if use_co64:
            stco = _full(
                b"co64",
                len(stco_offsets).to_bytes(4, "big")
                + b"".join(o.to_bytes(8, "big") for o in stco_offsets),
            )
        else:
            stco = _full(
                b"stco",
                len(stco_offsets).to_bytes(4, "big")
                + b"".join(o.to_bytes(4, "big") for o in stco_offsets),
            )
        return _box(b"stbl", stsd + stts + ctts + stsc + stsz + stss + stco)

    elst = b""
    if elst_edits is not None:
        elst = _box(
            b"edts",
            _full(
                b"elst",
                len(elst_edits).to_bytes(4, "big")
                + b"".join(
                    d.to_bytes(4, "big")
                    + mt.to_bytes(4, "big", signed=True)
                    + (0x00010000).to_bytes(4, "big")
                    for d, mt in elst_edits
                ),
            ),
        )

    def trak(handler: bytes, stbl_body: bytes, edts_box: bytes = b"") -> bytes:
        # v1_times: the 64-bit creation/modification/duration form —
        # tkhd/mdhd/mvhd field offsets all shift (timescale/track_id
        # move from body offset 12 to 20)
        if v1_times:
            tkhd = _fullv1(b"tkhd", bytes(92))
            mdhd = _fullv1(
                b"mdhd",
                bytes(16)
                + timescale.to_bytes(4, "big")
                + dur.to_bytes(8, "big")
                + bytes(4),
            )
        else:
            tkhd = _full(b"tkhd", bytes(80))
            mdhd = _full(
                b"mdhd",
                bytes(8)
                + timescale.to_bytes(4, "big")
                + dur.to_bytes(4, "big")
                + bytes(4),
            )
        hdlr = _full(b"hdlr", bytes(4) + handler + bytes(13))
        minf = _box(b"minf", _box(b"vmhd", bytes(8)) + stbl_body)
        return _box(
            b"trak", tkhd + edts_box + _box(b"mdia", mdhd + hdlr + minf)
        )

    def moov(stco_offsets: list[int]) -> bytes:
        if v1_times:
            mvhd = _fullv1(
                b"mvhd",
                bytes(16)
                + mv_tscale.to_bytes(4, "big")
                + dur.to_bytes(8, "big")
                + bytes(80),
            )
        else:
            mvhd = _full(
                b"mvhd",
                bytes(8)
                + mv_tscale.to_bytes(4, "big")
                + dur.to_bytes(4, "big")
                + bytes(80),
            )
        body = mvhd
        if audio_trak:
            # a non-video track FIRST: one dummy sample, its own tiny
            # tables — the walker must skip it by hdlr type
            audio_stbl = _box(
                b"stbl",
                _full(b"stsd", (1).to_bytes(4, "big") + _box(b"mp4a", bytes(28)))
                + _full(
                    b"stts",
                    (1).to_bytes(4, "big")
                    + (1).to_bytes(4, "big")
                    + dur.to_bytes(4, "big"),
                )
                + _full(
                    b"stsc",
                    (1).to_bytes(4, "big")
                    + (1).to_bytes(4, "big")
                    + (1).to_bytes(4, "big")
                    + (1).to_bytes(4, "big"),
                )
                + _full(
                    b"stsz",
                    (4).to_bytes(4, "big") + (1).to_bytes(4, "big"),
                )
                + _full(
                    b"stco", (1).to_bytes(4, "big") + (0).to_bytes(4, "big")
                ),
            )
            body += trak(b"soun", audio_stbl)
        body += trak(b"vide", stbl(stco_offsets), elst)
        return _box(b"moov", body)

    ftyp = _box(b"ftyp", b"isom" + (512).to_bytes(4, "big") + b"isomiso2")
    probe = moov([0] * len(chunks))
    mdat_hdr = 16 if large_mdat else 8
    base = len(ftyp) + len(probe) + mdat_hdr
    chunk_offsets, pos = [], base
    sample_offs = [0] * n
    for ch in chunks:
        chunk_offsets.append(pos)
        for si in ch:
            sample_offs[si] = pos
            pos += sizes[si]
    mdat = _box(b"mdat", b"".join(samples), large=large_mdat)
    final = moov(chunk_offsets)
    assert len(final) == len(probe)
    return ftyp + final + mdat, sample_offs, ts_ms, keyframes, pts_ms


# trun sample_flags values (ISO 14496-12 §8.8.3.1): a sync sample
# depends on nothing (sample_depends_on=2, bits 25-24); a non-sync
# sample depends on others (=1) and sets sample_is_non_sync_sample
# (bit 16) — the bit walkers key on
FRAG_SYNC = 0x02000000
FRAG_NONSYNC = 0x01010000


def _mp4_encode_fragmented(
    fragments: list[list[bytes]],
    timescale: int,
    default_duration: int,
    keyframes: list[list[bool]],
    flags_mode: str = "per_sample",  # per_sample | first | default
    dur_overrides: list[list[int]] | None = None,
    ctts_offsets: list[list[int]] | None = None,
    trun_version: int = 0,
    base_data_offset: bool = False,
    tfdt: bool = True,
    elst_edits: list[tuple[int, int]] | None = None,
    movie_timescale: int | None = None,
    audio_trak: bool = False,
    track_id: int = 7,
    trun_split: list[int] | None = None,
    sidx: bool = False,
    v1_times: bool = False,
    styp: bool = False,
    sidx_timescale: int | None = None,
):
    """Fragmented MP4 (CMAF/DASH shape — what a streaming lake
    actually stores): ftyp + moov(mvhd + mvex/trex + empty-stbl trak)
    + [moof + mdat] per fragment. Sample geometry lives in each
    moof's traf: tfhd (track id, defaults, base-data-offset mode),
    optional tfdt (absolute decode time), trun(s) (count,
    data_offset, per-sample duration/size/flags/composition-offset).
    Knobs exercise the layouts real packagers emit: base-is-moof vs
    explicit base_data_offset; flags per-sample vs
    first-sample-flags+default vs all-default; durations from trex vs
    trun; v0 (unsigned) vs v1 (SIGNED) composition offsets; an
    optional leading AUDIO traf in every moof (walker must select the
    video traf by track id, and its data precedes the video bytes in
    mdat); multi-trun trafs via ``trun_split``; ``sidx`` (r13) writes
    a §8.16.3 segment-index box between moov and the first moof —
    the DASH byte-range index that lets a time-range sample seek
    straight to the covering moof; ``v1_times`` emits the 64-bit-times
    v1 form of mvhd/tkhd/mdhd; ``styp`` writes a segment-type box
    before each moof (the concatenated-CMAF shape — sidx references
    then point at the styp, per §8.16.3's start-of-referenced-material
    anchor). Returns the 5-channel bookkeeping of
    _mp4_encode PLUS a per-fragment channel
    [(moof_off, moof+mdat size, earliest_pts_units, dur_units)] — all
    recorded from the generator's own layout arithmetic, never from
    the walker; the sidx box itself is serialized FROM that channel,
    so the walker's sidx cross-check is against independently-derived
    coordinates."""
    n_frags = len(fragments)
    assert len(keyframes) == n_frags
    mv_tscale = movie_timescale if movie_timescale is not None else timescale
    audio_id = track_id + 1
    audio_bytes = b"\xaa" * 6 if audio_trak else b""

    # per-sample channels in decode order (generator bookkeeping)
    all_keys: list[bool] = [k for f in keyframes for k in f]
    durs: list[int] = []
    for fi, frag in enumerate(fragments):
        if dur_overrides is not None:
            assert len(dur_overrides[fi]) == len(frag)
            durs += dur_overrides[fi]
        else:
            durs += [default_duration] * len(frag)
    n = sum(len(f) for f in fragments)
    ts_units = [sum(durs[:k]) for k in range(n)]
    cofs: list[int] = []
    for fi, frag in enumerate(fragments):
        if ctts_offsets is not None:
            assert len(ctts_offsets[fi]) == len(frag)
            if trun_version == 0:
                assert all(o >= 0 for o in ctts_offsets[fi])
            cofs += ctts_offsets[fi]
        else:
            cofs += [0] * len(frag)
    edit_shift = 0
    if elst_edits is not None:
        if len(elst_edits) == 2:
            assert elst_edits[0][1] == -1 and elst_edits[1][1] >= 0
            edit_shift = (
                elst_edits[0][0] * timescale // mv_tscale - elst_edits[1][1]
            )
        else:
            assert len(elst_edits) == 1 and elst_edits[0][1] >= 0
            edit_shift = -elst_edits[0][1]
    ts_ms = [t * 1000 // timescale for t in ts_units]
    pts_ms = [
        (t + o + edit_shift) * 1000 // timescale
        for t, o in zip(ts_units, cofs)
    ]

    elst = b""
    if elst_edits is not None:
        elst = _box(
            b"edts",
            _full(
                b"elst",
                len(elst_edits).to_bytes(4, "big")
                + b"".join(
                    d.to_bytes(4, "big")
                    + mt.to_bytes(4, "big", signed=True)
                    + (0x00010000).to_bytes(4, "big")
                    for d, mt in elst_edits
                ),
            ),
        )

    def tkhd(tid: int) -> bytes:
        if v1_times:
            return _fullv1(
                b"tkhd", bytes(16) + tid.to_bytes(4, "big") + bytes(72)
            )
        return _full(b"tkhd", bytes(8) + tid.to_bytes(4, "big") + bytes(68))

    def empty_stbl(coding: bytes) -> bytes:
        return _box(
            b"stbl",
            _full(b"stsd", (1).to_bytes(4, "big") + _box(coding, bytes(78)))
            + _full(b"stts", (0).to_bytes(4, "big"))
            + _full(b"stsc", (0).to_bytes(4, "big"))
            + _full(b"stsz", bytes(8))
            + _full(b"stco", (0).to_bytes(4, "big")),
        )

    def trak(tid: int, handler: bytes, edts_box: bytes = b"") -> bytes:
        if v1_times:
            mdhd = _fullv1(
                b"mdhd",
                bytes(16) + timescale.to_bytes(4, "big") + bytes(12),
            )
        else:
            mdhd = _full(
                b"mdhd", bytes(8) + timescale.to_bytes(4, "big") + bytes(8)
            )
        hdlr = _full(b"hdlr", bytes(4) + handler + bytes(13))
        coding = b"mp4v" if handler == b"vide" else b"mp4a"
        minf = _box(b"minf", _box(b"vmhd", bytes(8)) + empty_stbl(coding))
        return _box(
            b"trak",
            tkhd(tid) + edts_box + _box(b"mdia", mdhd + hdlr + minf),
        )

    def trex(tid: int, d_dur: int, d_flags: int) -> bytes:
        return _full(
            b"trex",
            tid.to_bytes(4, "big")
            + (1).to_bytes(4, "big")  # default_sample_description_index
            + d_dur.to_bytes(4, "big")
            + (0).to_bytes(4, "big")  # default_sample_size (sizes in trun)
            + d_flags.to_bytes(4, "big"),
        )

    trex_default_flags = (
        FRAG_SYNC
        if flags_mode == "default" and all(all_keys)
        else FRAG_NONSYNC
    )
    if flags_mode == "default":
        assert all(all_keys) or not any(all_keys), (
            "flags_mode=default needs uniform keyframes"
        )
    if v1_times:
        mvhd = _fullv1(
            b"mvhd", bytes(16) + mv_tscale.to_bytes(4, "big") + bytes(88)
        )
    else:
        mvhd = _full(
            b"mvhd", bytes(8) + mv_tscale.to_bytes(4, "big") + bytes(84)
        )
    mvex_body = trex(track_id, default_duration, trex_default_flags)
    if audio_trak:
        mvex_body += trex(audio_id, default_duration, FRAG_NONSYNC)
    moov_body = mvhd + _box(b"mvex", mvex_body)
    if audio_trak:
        moov_body += trak(audio_id, b"soun")
    moov_body += trak(track_id, b"vide", elst)
    moov = _box(b"moov", moov_body)
    ftyp = _box(b"ftyp", b"iso5" + (512).to_bytes(4, "big") + b"iso5cmfc")

    def build_traf(
        fi: int,
        frag: list[bytes],
        decode_time: int,
        bdo: int | None,
        data_offsets: list[int],
        splits: list[list[int]],
    ) -> bytes:
        tf_flags = 0
        tf_body = track_id.to_bytes(4, "big")
        if bdo is not None:
            tf_flags |= 0x000001
            tf_body += bdo.to_bytes(8, "big")
        else:
            tf_flags |= 0x020000  # default-base-is-moof
        if flags_mode == "first":
            tf_flags |= 0x000020
            tf_body += FRAG_NONSYNC.to_bytes(4, "big")
        tfhd = _box(
            b"tfhd", tf_flags.to_bytes(4, "big") + tf_body
        )
        boxes = tfhd
        if tfdt:
            boxes += _box(
                b"tfdt",
                (0).to_bytes(4, "big") + decode_time.to_bytes(4, "big"),
            )
        kf = keyframes[fi]
        if flags_mode == "first":
            # first-sample-flags + non-sync default can only express
            # the leading-keyframe pattern
            assert kf == [True] + [False] * (len(frag) - 1)
        fdurs = (
            dur_overrides[fi] if dur_overrides is not None else None
        )
        fcofs = ctts_offsets[fi] if ctts_offsets is not None else None
        for ti, idxs in enumerate(splits):
            tr_flags = 0x000001  # data-offset-present
            if fdurs is not None:
                tr_flags |= 0x000100
            tr_flags |= 0x000200  # sizes always present
            if flags_mode == "per_sample":
                tr_flags |= 0x000400
            if flags_mode == "first" and ti == 0:
                tr_flags |= 0x000004
            if fcofs is not None:
                tr_flags |= 0x000800
            body = len(idxs).to_bytes(4, "big")
            body += data_offsets[ti].to_bytes(4, "big", signed=True)
            if flags_mode == "first" and ti == 0:
                body += FRAG_SYNC.to_bytes(4, "big")
            for si in idxs:
                if fdurs is not None:
                    body += fdurs[si].to_bytes(4, "big")
                body += len(frag[si]).to_bytes(4, "big")
                if flags_mode == "per_sample":
                    body += (
                        FRAG_SYNC if kf[si] else FRAG_NONSYNC
                    ).to_bytes(4, "big")
                if fcofs is not None:
                    body += fcofs[si].to_bytes(
                        4, "big", signed=trun_version == 1
                    )
            boxes += _box(
                b"trun",
                bytes([trun_version]) + tr_flags.to_bytes(3, "big") + body,
            )
        return _box(b"traf", boxes)

    payload = ftyp + moov
    # sidx placeholder: the box's size is fixed by n_frags, but its
    # reference sizes/durations need the fragments built first — so
    # reserve the bytes now (every absolute offset below accounts for
    # them) and splice the real box in afterwards
    sidx_pos, sidx_len = len(payload), 32 + 12 * n_frags
    if sidx:
        payload += bytes(sidx_len)

    # per-fragment bookkeeping (independent of the walker): earliest
    # presentation time + tiling durations in media units, per §8.16.3
    frag_bounds = []
    g = 0
    for frag in fragments:
        frag_bounds.append((g, g + len(frag)))
        g += len(frag)
    frag_ept = [
        min(ts_units[k] + cofs[k] for k in range(g0, g1)) + edit_shift
        for g0, g1 in frag_bounds
    ]
    pres_end = (
        max(ts_units[k] + cofs[k] + durs[k] for k in range(n)) + edit_shift
    )
    frag_dur = [
        (frag_ept[i + 1] if i + 1 < n_frags else pres_end) - frag_ept[i]
        for i in range(n_frags)
    ]

    frag_ranges: list[tuple[int, int, int, int]] = []
    sample_offs: list[int] = []
    decode_time = 0
    for fi, frag in enumerate(fragments):
        if trun_split is not None and trun_split[fi]:
            s = trun_split[fi]
            splits = [list(range(s)), list(range(s, len(frag)))]
        else:
            splits = [list(range(len(frag)))]
        # audio traf first (when present): one dummy sample at the
        # start of mdat — video data begins after it
        video_data_start_in_mdat = len(audio_bytes)
        split_starts = []
        pos = video_data_start_in_mdat
        for idxs in splits:
            split_starts.append(pos)
            pos += sum(len(frag[si]) for si in idxs)

        def moof_at(
            moof_pos: int, moof_len_probe: int | None
        ) -> bytes:
            mfhd = _full(b"mfhd", (fi + 1).to_bytes(4, "big"))
            body = mfhd
            # mdat body starts right after this moof + 8-byte header
            if moof_len_probe is None:
                mdat_body = 0  # placeholder pass
            else:
                mdat_body = moof_pos + moof_len_probe + 8
            if audio_trak:
                a_flags = 0x020000 | 0x000020
                a_tfhd = _box(
                    b"tfhd",
                    a_flags.to_bytes(4, "big")
                    + audio_id.to_bytes(4, "big")
                    + FRAG_NONSYNC.to_bytes(4, "big"),
                )
                a_off = (
                    0 if moof_len_probe is None else moof_len_probe + 8
                )
                a_trun = _box(
                    b"trun",
                    bytes([0])
                    + (0x000001 | 0x000200).to_bytes(3, "big")
                    + (1).to_bytes(4, "big")
                    + a_off.to_bytes(4, "big", signed=True)
                    + len(audio_bytes).to_bytes(4, "big"),
                )
                body += _box(b"traf", a_tfhd + a_trun)
            if base_data_offset:
                # probe pass writes a 0 placeholder so both passes
                # have the identical 8-byte bdo field (sizes must match)
                bdo = 0 if moof_len_probe is None else mdat_body
                offs = list(split_starts)
            else:
                bdo = None
                offs = [
                    (0 if moof_len_probe is None else moof_len_probe + 8)
                    + s
                    for s in split_starts
                ]
            body += build_traf(fi, frag, decode_time, bdo, offs, splits)
            return _box(b"moof", body)

        # concatenated-CMAF shape: a segment-type box before each
        # moof; the subsegment (and its sidx reference) starts at it
        styp_box = (
            _box(b"styp", b"cmfs" + (0).to_bytes(4, "big") + b"cmfscmff")
            if styp
            else b""
        )
        sub_start = len(payload)
        moof_pos = sub_start + len(styp_box)
        probe = moof_at(moof_pos, None)
        moof = moof_at(moof_pos, len(probe))
        assert len(moof) == len(probe)
        mdat_body_abs = moof_pos + len(moof) + 8
        for idxs, s0 in zip(splits, split_starts):
            p = mdat_body_abs + s0
            for si in idxs:
                sample_offs.append(p)
                p += len(frag[si])
        mdat = _box(
            b"mdat", audio_bytes + b"".join(frag[si] for s in splits for si in s)
        )
        frag_ranges.append(
            (
                sub_start,
                len(styp_box) + len(moof) + len(mdat),
                frag_ept[fi],
                frag_dur[fi],
            )
        )
        payload += styp_box + moof + mdat
        decode_time += sum(
            (dur_overrides[fi] if dur_overrides is not None else
             [default_duration] * len(frag))
        )

    if sidx:
        # §8.16.3 v0 segment index, serialized FROM the generator's
        # own fragment bookkeeping: reference_ID = the video track,
        # first_offset 0 (anchor = byte after the sidx box = the first
        # moof), one media reference (type 0) per [moof+mdat] pair,
        # SAP word = starts_with_SAP, type 1, delta 0
        assert all(e >= 0 for e in frag_ept), "sidx needs non-negative EPT"
        # §8.16.3 tiling: subsegment_duration is the EPT delta to the
        # next subsegment — valid DASH media has non-decreasing EPTs
        # (every subsegment starts at a SAP), so a plan whose
        # composition offsets push a later fragment's earliest pts
        # BELOW an earlier one's is unrepresentable, not encodable
        assert all(d >= 0 for d in frag_dur), (
            "sidx needs non-decreasing fragment EPTs"
        )
        # §8.16.3 lets the sidx carry its OWN timescale, typically
        # coarser than the track's (r14 ADVICE #1's corner: a sample
        # presented BETWEEN sidx ticks). Times in the box are sidx
        # ticks; the conversion from track ticks must be exact here —
        # a generator that silently floors would bake the walker's
        # bug class into the oracle bookkeeping.
        s_ts = sidx_timescale if sidx_timescale is not None else timescale

        def _to_sidx_units(u: int) -> int:
            assert (u * s_ts) % timescale == 0, (
                "sidx fixture times must be exact in the sidx timescale"
            )
            return u * s_ts // timescale

        refs = b""
        for off, size, ept_u, dur_u in frag_ranges:
            refs += (
                size.to_bytes(4, "big")
                + _to_sidx_units(dur_u).to_bytes(4, "big")
                + (0x90000000).to_bytes(4, "big")
            )
        sidx_box = _full(
            b"sidx",
            track_id.to_bytes(4, "big")
            + s_ts.to_bytes(4, "big")
            + _to_sidx_units(frag_ept[0]).to_bytes(4, "big")
            + (0).to_bytes(4, "big")
            + (0).to_bytes(2, "big")
            + n_frags.to_bytes(2, "big")
            + refs,
        )
        assert len(sidx_box) == sidx_len
        assert frag_ranges[0][0] == sidx_pos + sidx_len
        payload = (
            payload[:sidx_pos] + sidx_box + payload[sidx_pos + sidx_len :]
        )

    assert len(sample_offs) == n
    return payload, sample_offs, ts_ms, all_keys, pts_ms, frag_ranges


def _gif_encode(
    idx: bytes, w: int, h: int, palette: bytes, pal_bits: int, with_ext: bool
) -> bytes:
    """Minimal GIF89a encoder: logical screen descriptor + global color
    table + (optionally a comment extension) + image descriptor + a
    true LZW-compressed index stream in 255-byte sub-blocks. The LZW
    compressor mirrors the public spec's bookkeeping — emit CLEAR
    first, widen the code size when the next free code would not fit,
    CLEAR again before the table reaches 4096 — and is the independent
    counterpart of the decoder in multimodal.py."""
    m = max(2, pal_bits)  # LZW minimum code size
    clear, eoi = 1 << m, (1 << m) + 1

    out_codes = []
    table = {bytes([c]): c for c in range(1 << m)}
    next_code, code_size = eoi + 1, m + 1

    def emit(code: int) -> None:
        # GIF width timing (the giflib convention every mainstream
        # codec interops with): emit at the CURRENT width, then widen
        # if the next free code no longer fits — checked after EVERY
        # emitted code, not only after dictionary inserts. The
        # difference bites exactly once: the final flush code inserts
        # nothing, but if the table is sitting on a width boundary the
        # EOI after it must still be one bit wider. An insert-based
        # encoder check misses that and desynchronizes the decoder on
        # the last code of the stream (found by the independent
        # decoder in multimodal.py, which was giflib-correct first).
        nonlocal code_size
        out_codes.append((code, code_size))
        if next_code >= (1 << code_size) and code_size < 12:
            code_size += 1

    emit(clear)
    wstr = b""
    for ch in idx:
        cand = wstr + bytes([ch])
        if cand in table:
            wstr = cand
            continue
        emit(table[wstr])
        table[cand] = next_code
        next_code += 1
        if next_code == 4095:  # pre-emptive CLEAR: never fill to 4096
            emit(clear)
            table = {bytes([c]): c for c in range(1 << m)}
            next_code, code_size = eoi + 1, m + 1
        wstr = bytes([ch])
    if wstr:
        emit(table[wstr])
    emit(eoi)

    acc = n_bits = 0
    packed = bytearray()
    for code, width in out_codes:
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8
    if n_bits:
        packed.append(acc & 0xFF)

    blocks = b"".join(
        bytes([len(packed[j : j + 255])]) + bytes(packed[j : j + 255])
        for j in range(0, len(packed), 255)
    )
    ext = b""
    if with_ext:
        ext = b"\x21\xfe" + bytes([8]) + b"fixture!" + b"\x00"
    lsd_packed = 0x80 | ((pal_bits - 1) & 7)  # GCT present, size bits
    return (
        b"GIF89a"
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([lsd_packed, 0, 0])
        + palette
        + ext
        + b"\x2c"
        + bytes(4)  # left, top
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([0])  # no local color table, no interlace
        + bytes([m])
        + blocks
        + b"\x00\x3b"
    )


def _png_encode(
    raw: bytes, w: int, h: int, filters: list[int], zlevel: int, n_idat: int
) -> bytes:
    """Minimal PNG encoder (8-bit RGB, non-interlaced): per-scanline
    filter APPLY per the PNG spec (the decoder's inverse lives in
    multimodal.py), zlib-compressed, chunked with big-endian lengths
    and CRC32 trailers. ``filters[r % len(filters)]`` picks scanline
    r's filter type; the compressed stream is split evenly-ish across
    ``n_idat`` IDAT chunks (the spec allows any split)."""
    import zlib

    def chunk(typ: bytes, body: bytes) -> bytes:
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
        out = bytearray(stride)
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
            else:  # Paeth
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa_ <= pb_ and pa_ <= pc_ else b if pb_ <= pc_ else c
            out[i] = (cur[i] - pred) & 0xFF
        lines.append(bytes([f]) + bytes(out))
        prior = cur
    stream = zlib.compress(b"".join(lines), zlevel)
    step = max(1, (len(stream) + n_idat - 1) // n_idat)
    parts = [stream[j : j + step] for j in range(0, len(stream), step)]
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + b"".join(chunk(b"IDAT", p) for p in parts)
        + chunk(b"IEND", b"")
    )


def _packbits_encode(
    row: bytes, noop_rng: "random.Random | None" = None
) -> bytes:
    """Real PackBits COMPRESSOR for ONE pixel row (TIFF 6.0 §9 says
    rows are compressed separately — runs never cross row boundaries;
    the per-strip caller concatenates row streams). Control byte n as
    signed: 0..127 → copy n+1 literal bytes; -1..-127 → repeat the
    next byte 1-n times; -128 → no-op. Repeat runs are taken at
    length ≥ 2 and capped at 128; literal runs break before a length-3
    repeat and cap at 128 (so both maximum-length controls occur in
    the fixtures). ``noop_rng`` sprinkles -128 no-op controls between
    runs — a decoder that treats -128 as a repeat desynchronizes.
    Independent of the decoder in multimodal.py; the two meet at the
    fixture's raw bytes."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        if noop_rng is not None and noop_rng.random() < 0.15:
            out.append(0x80)
        j = i + 1
        while j < n and row[j] == row[i] and j - i < 128:
            j += 1
        if j - i >= 2:
            out.append((257 - (j - i)) & 0xFF)
            out.append(row[i])
            i = j
        else:
            j = i + 1
            while j < n and j - i < 128:
                if j + 2 < n and row[j] == row[j + 1] == row[j + 2]:
                    break
                j += 1
            out.append(j - i - 1)
            out += row[i:j]
            i = j
    return bytes(out)


def _tiff_encode(
    raw: bytes,
    w: int,
    h: int,
    rows_per_strip: "int | None",
    compression: int,
    big_endian: bool = False,
    pad: int = 0,
    software_tag: bool = False,
    noop_rng: "random.Random | None" = None,
):
    """Baseline TIFF 6.0, 8-bit RGB chunky, strip-organized — built
    from the public spec, independent of the walker in multimodal.py.
    Layout: 8-byte header | ``pad`` junk bytes | strip data | IFD |
    external value area (BitsPerSample triple, multi-strip offset/
    count arrays, optional Software ASCII). IFD entries are emitted in
    ascending tag order as the spec requires; inline values (≤ 4
    bytes) are left-justified in the file's byte order.
    ``rows_per_strip=None`` omits tag 278 entirely (spec default: all
    rows in one strip). Returns (payload, strip_offsets,
    strip_byte_counts) recorded from the generator's own layout
    arithmetic — the oracle's independent coordinates."""
    import struct

    en = ">" if big_endian else "<"
    rps = rows_per_strip if rows_per_strip is not None else h
    n_strips = -(-h // rps)
    strips = []
    for s in range(n_strips):
        rows = range(s * rps, min(h, (s + 1) * rps))
        if compression == 32773:
            data = b"".join(
                _packbits_encode(raw[r * w * 3 : (r + 1) * w * 3], noop_rng)
                for r in rows
            )
        else:
            assert compression == 1
            data = raw[rows[0] * w * 3 : (rows[-1] + 1) * w * 3]
        strips.append(data)

    pos = 8 + pad
    soffs, scnts = [], []
    for sdata in strips:
        soffs.append(pos)
        scnts.append(len(sdata))
        pos += len(sdata)
    ifd_off = pos

    entries = []  # (tag, type, count, packed-or-deferred value)
    TYPE_FMT = {3: "H", 4: "I"}
    TYPE_SIZE = {2: 1, 3: 2, 4: 4}

    def num_entry(tag, typ, values):
        b = b"".join(
            struct.pack(en + TYPE_FMT[typ], v) for v in values
        )
        entries.append((tag, typ, len(values), b))

    num_entry(256, 4, [w])
    num_entry(257, 4, [h])
    num_entry(258, 3, [8, 8, 8])  # 6 bytes → external
    num_entry(259, 3, [compression])
    num_entry(262, 3, [2])  # RGB
    num_entry(273, 4, soffs)
    num_entry(277, 3, [3])
    if rows_per_strip is not None:
        num_entry(278, 4, [rps])
    num_entry(279, 4, scnts)
    if software_tag:
        entries.append((305, 2, 8, b"genfix\x00\x00"))  # ASCII, external
    entries.sort()

    ext_off = ifd_off + 2 + 12 * len(entries) + 4
    ifd = struct.pack(en + "H", len(entries))
    ext = b""
    for tag, typ, count, vb in entries:
        ifd += struct.pack(en + "HHI", tag, typ, count)
        if len(vb) <= 4:
            ifd += vb + b"\x00" * (4 - len(vb))  # inline, left-justified
        else:
            ifd += struct.pack(en + "I", ext_off + len(ext))
            ext += vb
    ifd += struct.pack(en + "I", 0)  # no next IFD

    payload = (
        struct.pack(en + "2sH", b"MM" if big_endian else b"II", 42)
        + struct.pack(en + "I", ifd_off)
        + bytes(pad)
        + b"".join(strips)
        + ifd
        + ext
    )
    assert payload[ifd_off : ifd_off + 2] == struct.pack(
        en + "H", len(entries)
    )
    return payload, soffs, scnts


# ------------------------------------------------------------ Matroska
# Minimal-but-real Matroska muxer (EBML per RFC 8794 + the public
# Matroska element registry), written from the spec and INDEPENDENT of
# the walker in operators/multimodal.py — the two-implementations
# posture every media fixture family follows. The walker's oracle
# coordinates (sample_off / sample_size / sample_pts_ms / keyframe and
# the per-cluster byte spans) fall out of this muxer's own layout
# arithmetic, never out of re-parsing the payload.


def _ebml_vint(n: int, width: "int | None" = None) -> bytes:
    """EBML variable-length integer (RFC 8794 §4): the first byte has
    (width−1) leading zero bits then a 1; the remaining 7·width bits
    carry the value big-endian. The all-ones value is RESERVED (unknown
    size), so the minimal width must satisfy n < 2^(7w) − 1."""
    w = width or next(k for k in range(1, 9) if n < (1 << (7 * k)) - 1)
    assert 0 <= n < (1 << (7 * w)) - 1
    return ((1 << (7 * w)) | n).to_bytes(w, "big")


def _ebml_svint(n: int) -> bytes:
    """Signed vint (EBML lacing deltas): stored as the unsigned vint of
    n + 2^(7w−1) − 1 at the minimal width that fits."""
    for w in range(1, 9):
        bias = (1 << (7 * w - 1)) - 1
        if -bias <= n <= bias:
            return _ebml_vint(n + bias, w)
    raise AssertionError("lace delta out of vint range")


def _ebml_uint(n: int) -> bytes:
    return n.to_bytes(max(1, (n.bit_length() + 7) // 8), "big")


def _ebml_elem(
    eid: int, body: bytes, size_width: "int | None" = None, unknown: bool = False
) -> bytes:
    """id + size vint + body. Element IDs carry their own length marker,
    so they are emitted verbatim big-endian. ``unknown=True`` writes the
    1-byte all-ones size (0xFF) — the live-muxing shape for Segment and
    Cluster."""
    idb = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    size = b"\xff" if unknown else _ebml_vint(len(body), size_width)
    return idb + size + body


def _mkv_block_body(
    track: int, rel: int, key: bool, lacing: str, frames: list, simple: bool
):
    """Block/SimpleBlock payload: track vint, int16 BE relative
    timestamp, flags (keyframe bit 0x80 on SimpleBlock only; lacing
    bits 0x06: 01=Xiph, 10=fixed, 11=EBML), lace sizes, frame data.
    Returns (body, [frame offset within body])."""
    head = _ebml_vint(track) + rel.to_bytes(2, "big", signed=True)
    flags = 0x80 if (simple and key) else 0x00
    lace = b""
    if lacing == "none":
        assert len(frames) == 1
    elif lacing == "xiph":
        flags |= 0x02
        lace = bytes([len(frames) - 1])
        for f in frames[:-1]:
            sz = len(f)
            lace += b"\xff" * (sz // 255) + bytes([sz % 255])
    elif lacing == "fixed":
        flags |= 0x04
        assert len({len(f) for f in frames}) == 1
        lace = bytes([len(frames) - 1])
    elif lacing == "ebml":
        flags |= 0x06
        lace = bytes([len(frames) - 1])
        if len(frames) >= 2:  # sizes cover all but the LAST frame
            lace += _ebml_vint(len(frames[0]))
            prev = len(frames[0])
            for f in frames[1:-1]:
                lace += _ebml_svint(len(f) - prev)
                prev = len(f)
    else:  # pragma: no cover - generator misuse
        raise AssertionError(f"unknown lacing {lacing}")
    body = head + bytes([flags]) + lace
    offs = []
    for f in frames:
        offs.append(len(body))
        body += f
    return body, offs


def _mkv_encode(
    clusters: list,
    timestamp_scale: int = 1_000_000,
    cues: bool = True,
    unknown_segment: bool = False,
    video_track: int = 1,
    audio_track: "int | None" = None,
    audio_first: bool = False,
    duration_elem: bool = False,
    void_pad: int = 0,
    doctype: bytes = b"matroska",
    cue_subset: "list[int] | None" = None,
):
    """Layout: EBML header | Segment [ SeekHead(→Cues, 8-byte-forced
    positions) | Void? | Info | Tracks | Cluster* | Cues? ]. Each
    cluster dict: ``ts`` (ticks), ``unknown`` (unknown-size element),
    ``crc`` (dummy CRC-32 first child), ``void`` (Void between blocks),
    ``blocks``: list of dicts with ``frames`` (list[bytes]) and
    optional track / rel / key / lacing ('none'|'xiph'|'fixed'|'ebml')
    / group (BlockGroup+Block, keyframe = NO ReferenceBlock child).

    Returns (payload, offs, sizes, keys, pts_ms, cluster_meta) — the
    sample arrays cover VIDEO-track frames in file order (laced frames
    share their block's timestamp); cluster_meta is
    [(abs_elem_off, elem_len, ts_ticks)]."""
    ebml_hdr = _ebml_elem(
        0x1A45DFA3,
        _ebml_elem(0x4286, _ebml_uint(1))  # EBMLVersion
        + _ebml_elem(0x42F7, _ebml_uint(1))  # EBMLReadVersion
        + _ebml_elem(0x42F2, _ebml_uint(4))  # EBMLMaxIDLength
        + _ebml_elem(0x42F3, _ebml_uint(8))  # EBMLMaxSizeLength
        + _ebml_elem(0x4282, doctype)  # DocType
        + _ebml_elem(0x4287, _ebml_uint(4))  # DocTypeVersion
        + _ebml_elem(0x4285, _ebml_uint(2)),  # DocTypeReadVersion
    )

    import struct

    info_body = _ebml_elem(0x2AD7B1, _ebml_uint(timestamp_scale))
    if duration_elem:
        last = clusters[-1]
        dur_ticks = last["ts"] + max(
            (b.get("rel", 0) for b in last["blocks"]), default=0
        )
        info_body += _ebml_elem(0x4489, struct.pack(">d", float(dur_ticks)))
    info_body += _ebml_elem(0x4D80, b"genfix") + _ebml_elem(0x5741, b"genfix")
    info = _ebml_elem(0x1549A966, info_body)

    ventry = _ebml_elem(
        0xAE,
        _ebml_elem(0xD7, _ebml_uint(video_track))
        + _ebml_elem(0x73C5, _ebml_uint(0x1234))
        + _ebml_elem(0x83, _ebml_uint(1))  # TrackType video
        + _ebml_elem(0x86, b"V_FAKE")
        + _ebml_elem(
            0xE0,
            _ebml_elem(0xB0, _ebml_uint(64)) + _ebml_elem(0xBA, _ebml_uint(48)),
        ),
    )
    entries = [ventry]
    if audio_track is not None:
        aentry = _ebml_elem(
            0xAE,
            _ebml_elem(0xD7, _ebml_uint(audio_track))
            + _ebml_elem(0x73C5, _ebml_uint(0x5678))
            + _ebml_elem(0x83, _ebml_uint(2))  # TrackType audio
            + _ebml_elem(0x86, b"A_FAKE")
            + _ebml_elem(0xE1, _ebml_elem(0xB5, struct.pack(">d", 48000.0))),
        )
        entries = [aentry, ventry] if audio_first else [ventry, aentry]
    tracks = _ebml_elem(0x1654AE6B, b"".join(entries))

    # clusters: build bodies, recording video-frame offsets per cluster
    cluster_elems = []  # (elem_bytes, ts, [(off_in_elem, size, key, pts_ticks)])
    for c in clusters:
        cbody = b""
        if c.get("crc"):
            cbody += _ebml_elem(0xBF, b"\x00\x00\x00\x00")
        cbody += _ebml_elem(0xE7, _ebml_uint(c["ts"]))
        recs = []
        for blk in c["blocks"]:
            track = blk.get("track", video_track)
            rel = blk.get("rel", 0)
            key = blk.get("key", True)
            lacing = blk.get("lacing", "none")
            frames = blk["frames"]
            group = blk.get("group", False)
            body, foffs = _mkv_block_body(
                track, rel, key, lacing, frames, simple=not group
            )
            if group:
                belem = _ebml_elem(0xA1, body)
                gbody = belem
                if not key:  # keyframe ⟺ NO ReferenceBlock child
                    gbody += _ebml_elem(
                        0xFB, (-1).to_bytes(1, "big", signed=True)
                    )
                gbody += _ebml_elem(0x9B, _ebml_uint(40))  # BlockDuration
                elem = _ebml_elem(0xA0, gbody)
                shift = (len(elem) - len(gbody)) + (len(belem) - len(body))
            else:
                elem = _ebml_elem(0xA3, body)
                shift = len(elem) - len(body)
            if c.get("void"):
                cbody += _ebml_elem(0xEC, bytes(3))
            if track == video_track:
                for f, fo in zip(frames, foffs):
                    recs.append(
                        (len(cbody) + shift + fo, len(f), key, c["ts"] + rel)
                    )
            cbody += elem
        celem = _ebml_elem(0x1F43B675, cbody, unknown=c.get("unknown", False))
        hdr = len(celem) - len(cbody)
        cluster_elems.append(
            (celem, c["ts"], [(hdr + o, s, k, t) for o, s, k, t in recs])
        )

    # assemble the segment body; SeekHead size is fixed (8-byte-forced
    # SeekPosition), so cluster positions are known in one pass
    def seekhead(cues_pos: int) -> bytes:
        return _ebml_elem(
            0x114D9B74,
            _ebml_elem(
                0x4DBB,
                _ebml_elem(0x53AB, (0x1C53BB6B).to_bytes(4, "big"))
                + _ebml_elem(0x53AC, cues_pos.to_bytes(8, "big")),
            ),
        )

    parts = []
    if cues:
        parts.append(seekhead(0))  # placeholder, fixed size
    if void_pad:
        parts.append(_ebml_elem(0xEC, bytes(void_pad)))
    parts.append(info)
    parts.append(tracks)
    cluster_seg_offs = []
    for celem, _ts, _recs in cluster_elems:
        cluster_seg_offs.append(sum(len(p) for p in parts))
        parts.append(celem)
    if cues:
        cues_pos = sum(len(p) for p in parts)
        cbody = b""
        for k, ((celem, ts, _recs), seg_off) in enumerate(
            zip(cluster_elems, cluster_seg_offs)
        ):
            if cue_subset is not None and k not in cue_subset:
                continue  # sparse cues: real muxers cue every few sec
            cbody += _ebml_elem(
                0xBB,
                _ebml_elem(0xB3, _ebml_uint(ts))
                + _ebml_elem(
                    0xB7,
                    _ebml_elem(0xF7, _ebml_uint(video_track))
                    + _ebml_elem(0xF1, _ebml_uint(seg_off)),
                ),
            )
        parts.append(_ebml_elem(0x1C53BB6B, cbody))
        sh = seekhead(cues_pos)
        assert len(sh) == len(parts[0])
        parts[0] = sh

    seg_body = b"".join(parts)
    segment = _ebml_elem(0x18538067, seg_body, unknown=unknown_segment)
    payload = ebml_hdr + segment
    seg_body_start = len(payload) - len(seg_body)

    offs, sizes, keys, pts_ms, cluster_meta = [], [], [], [], []
    for (celem, ts, recs), seg_off in zip(cluster_elems, cluster_seg_offs):
        abs_off = seg_body_start + seg_off
        cluster_meta.append((abs_off, len(celem), ts))
        for o, s, k, t in recs:
            offs.append(abs_off + o)
            sizes.append(s)
            keys.append(k)
            pts_ms.append(t * timestamp_scale // 1_000_000)
    for o, s in zip(offs, sizes):
        assert s == 0 or len(payload[o : o + s]) == s, "frame slice overrun"
    return payload, offs, sizes, keys, pts_ms, cluster_meta


if __name__ == "__main__":
    main()
