"""Round 17: the WARC (ISO 28500) crawl-archive ingest walker —
operators/warc.py vs the independent fixture generator
(tools/gen_fixtures.py:gen_warc_fixture). The two are independent
from-the-spec implementations meeting at the fixture bytes (the media
container-walk posture); the DuckDB oracle additionally re-sums plain
files' blocks from the payload hex at the generator-recorded offsets,
so a wrong offset/length parse mismatches actual bytes."""

from __future__ import annotations

import gzip

import pytest

from micmac_li3ds_spark.operators import warc as W


def _rows():
    import pyarrow.parquet as pq

    return pq.read_table(W.WARC_PARQUET).to_pylist()


# ---------------------------------------------------------------------------
# full walk ≡ generator bookkeeping, every fixture row
# ---------------------------------------------------------------------------


def test_walker_matches_generator_bookkeeping_every_file():
    for row in _rows():
        recs = W.parse_warc(bytes(row["payload"]), row["gz"])
        assert [r["warc_type"] for r in recs] == row["rec_type"]
        assert [r["target_uri"] for r in recs] == row["rec_uri"]
        assert [r["http_status"] for r in recs] == row["rec_status"]
        assert [r["block_len"] for r in recs] == row["rec_len"]
        assert [r["block_sum"] for r in recs] == row["rec_sum"]
        if not row["gz"]:
            # plain files: the walker's block offsets are actual
            # payload positions — compare against the generator's own
            # layout arithmetic AND the bytes themselves
            assert [r["block_off"] for r in recs] == row["rec_off"]
            payload = bytes(row["payload"])
            for r in recs:
                block = payload[
                    r["block_off"] : r["block_off"] + r["block_len"]
                ]
                assert sum(block) == r["block_sum"]


def test_fixture_exercises_the_spec_corners():
    """The corpus must keep carrying the corners the walker exists
    for; if a regeneration drops them, the suite should say so rather
    than silently passing on easy input."""
    rows = _rows()
    assert any(n == 0 for r in rows for n in r["rec_len"])  # empty block
    assert any(  # record terminator + version line INSIDE a block
        b"\r\n\r\nWARC/1.0" in bytes(r["payload"]) and not r["gz"]
        for r in rows
    )
    assert {t for r in rows for t in r["rec_type"]} >= {
        "warcinfo", "request", "response", "resource", "metadata",
        "revisit",
    }
    assert any(r["gz"] for r in rows) and any(not r["gz"] for r in rows)
    # header-name case variation actually present
    assert any(
        b"\r\ncontent-length:" in bytes(r["payload"]) for r in rows
        if not r["gz"]
    )


def test_gzip_member_per_record():
    for row in _rows():
        if not row["gz"]:
            continue
        members = W.split_gzip_members(bytes(row["payload"]))
        assert len(members) == len(row["rec_type"])
        for m in members:
            rec, consumed = W.parse_warc_record(m)
            assert consumed == len(m)


# ---------------------------------------------------------------------------
# malformed input: named rejections, never a silent resync
# ---------------------------------------------------------------------------


def _mk(headers, block):
    lines = ["WARC/1.0"] + [f"{k}: {v}" for k, v in headers]
    return "\r\n".join(lines).encode() + b"\r\n\r\n" + block + b"\r\n\r\n"


GOOD = _mk(
    [("WARC-Type", "resource"), ("Content-Length", "4"),
     ("WARC-Target-URI", "http://x/y")],
    b"abcd",
)


def test_good_record_parses():
    rec, consumed = W.parse_warc_record(GOOD)
    assert consumed == len(GOOD)
    assert rec["warc_type"] == "resource"
    assert rec["target_uri"] == "http://x/y"
    assert rec["http_status"] is None
    assert rec["block_len"] == 4 and rec["block_sum"] == sum(b"abcd")


@pytest.mark.parametrize(
    "raw,reason",
    [
        (GOOD[:20], "no header terminator"),  # cut inside the headers
        (GOOD[:-6], "truncated WARC block"),  # cut into the block+tail
        (GOOD[:-2], "missing CRLF CRLF record terminator"),
        (b"HTTP/1.1 200 OK\r\n\r\nabcd\r\n\r\n", "bad WARC version line"),
        (
            _mk([("WARC-Type", "resource")], b""),
            "without Content-Length",
        ),
        (
            _mk([("Content-Length", "0")], b""),
            "without WARC-Type",
        ),
        (
            b"WARC/1.0\r\nnocolonhere\r\nContent-Length: 0\r\n"
            b"WARC-Type: resource\r\n\r\n\r\n\r\n",
            "malformed WARC header line",
        ),
        (
            _mk(
                [("WARC-Type", "resource"), ("Content-Length", "99")],
                b"abcd",
            ),
            "truncated WARC block",
        ),
    ],
)
def test_malformed_records_raise_named(raw, reason):
    with pytest.raises(ValueError, match=reason):
        W.parse_warc_record(raw)


def test_malformed_gzip_raises_named():
    with pytest.raises(ValueError, match="corrupt gzip member"):
        W.split_gzip_members(b"\x1f\x8b\x08\x00garbage-not-deflate")
    ok = gzip.compress(GOOD, mtime=0)
    with pytest.raises(ValueError, match="truncated gzip member"):
        W.split_gzip_members(ok[:-5])
    with pytest.raises(ValueError, match="more than one WARC record"):
        W.parse_warc(gzip.compress(GOOD + GOOD, mtime=0), gz=True)


def test_content_length_parsing_survives_embedded_version_line():
    """The hostile case from the fixture, isolated: a block containing
    a record terminator followed by a WARC version line. Delimiter
    scanning would emit a phantom record; Content-Length parsing must
    return exactly two."""
    evil_block = b"x\r\n\r\nWARC/1.0\r\nnot-a-record: 1"
    payload = _mk(
        [("WARC-Type", "resource"), ("Content-Length", str(len(evil_block)))],
        evil_block,
    ) + GOOD
    recs = W.parse_warc(payload, gz=False)
    assert [r["block_len"] for r in recs] == [len(evil_block), 4]
    assert recs[0]["block_sum"] == sum(evil_block)


# ---------------------------------------------------------------------------
# the registered query: Spark side + plan shape
# ---------------------------------------------------------------------------


def test_q_llm_warc_extract_rows_and_types(spark):
    from micmac_li3ds_spark.operators.warc import q_llm_warc_extract

    df = q_llm_warc_extract(spark, "unused")
    rows = df.collect()
    want_n = sum(len(r["rec_type"]) for r in _rows())
    assert len(rows) == want_n
    # spot the typed-NULL contract: warcinfo has no URI and no status
    first = rows[0]
    assert first["warc_type"] == "warcinfo"
    assert first["target_uri"] is None and first["http_status"] is None
    assert {r["warc_type"] for r in rows} >= {"response", "request"}
    assert all(
        r["http_status"] is not None
        for r in rows
        if r["warc_type"] == "response"
    )
    # the parse stays Arrow-batched (MapInPandas), never row-at-a-time
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# streaming twin: continuous crawl ingest ≡ the batch extract
# ---------------------------------------------------------------------------


def test_streaming_warc_extract_matches_batch(spark, tmp_path):
    """Land the fixture archives as lake files (plain → .warc, gz →
    .warc.gz), drain with the in-stream compaction cadence, and demand
    the accumulated record log equal q_llm_warc_extract row for row;
    a fresh-checkpoint full replay over the compacted log stays
    idempotent."""
    from micmac_li3ds_spark.operators.warc import q_llm_warc_extract
    from micmac_li3ds_spark.streaming import jobs

    lake = tmp_path / "crawl_lake"
    lake.mkdir()
    for row in _rows():
        ext = "warc.gz" if row["gz"] else "warc"
        (lake / f"{row['file_id']}.{ext}").write_bytes(
            bytes(row["payload"])
        )

    records_dir = str(tmp_path / "records")

    def drain(ckpt):
        stream = (
            spark.readStream.format("binaryFile")
            .schema("path string, modificationTime timestamp, "
                    "length long, content binary")
            .option("maxFilesPerTrigger", 4)
            .load(str(lake))
        )
        q = jobs.run_streaming_warc_extract(
            stream,
            records_dir,
            checkpoint=str(tmp_path / ckpt),
            compact_every=2,
        )
        q.awaitTermination(300)

    drain("ckpt")
    import os as _os

    names = set(_os.listdir(records_dir))
    assert any(n.startswith("gen=") for n in names)  # cadence folded

    want = sorted(tuple(r) for r in q_llm_warc_extract(spark, "x").collect())
    got = sorted(
        tuple(r)
        for r in jobs.read_warc_record_log(spark, records_dir).collect()
    )
    assert got == want and len(want) > 0

    # checkpointed no-op redrain, then fresh-checkpoint full replay
    drain("ckpt")
    drain("ckpt2")
    got2 = sorted(
        tuple(r)
        for r in jobs.read_warc_record_log(spark, records_dir).collect()
    )
    assert got2 == want


def test_streaming_warc_extract_rejects_contract_violations(
    spark, tmp_path
):
    from micmac_li3ds_spark.streaming import jobs

    lake = tmp_path / "bad_lake"
    lake.mkdir()
    (lake / "notanid.warc").write_bytes(GOOD)
    stream = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, "
                "length long, content binary")
        .load(str(lake))
    )
    q = jobs.run_streaming_warc_extract(
        stream, str(tmp_path / "records"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    with pytest.raises(Exception, match="lake contract"):
        q.awaitTermination(300)
        if q.exception() is not None:
            raise Exception(str(q.exception()))


# ---------------------------------------------------------------------------
# crawl → documents: the composition into the dedup/quality family
# ---------------------------------------------------------------------------


def test_warc_to_documents_shape_and_selection(spark):
    from pyspark.sql import functions as F

    from micmac_li3ds_spark.operators.warc import (
        load_warc,
        warc_to_documents,
    )

    docs = warc_to_documents(load_warc(spark))
    rows = docs.collect()

    # expected selection from the generator bookkeeping: successful
    # (2xx) responses only
    want = []
    for r in _rows():
        for i, (t, st, uri) in enumerate(
            zip(r["rec_type"], r["rec_status"], r["rec_uri"])
        ):
            if t == "response" and st is not None and 200 <= st < 300:
                want.append((r["file_id"] * (1 << 20) + i, uri))
    assert len(rows) == len(want) > 0
    assert sorted(r["doc_id"] for r in rows) == sorted(w[0] for w in want)

    by_id = {w[0]: w[1] for w in want}
    for r in rows:
        # source = the target URI's host
        assert r["source"] == by_id[r["doc_id"]].split("/")[2]
        # tags stripped, body text survives (every generator body —
        # the r17 "doc {fid}/{i}" pages and the r18 rich-HTML pages —
        # embeds a "{fid}/" marker; the trailing number is the
        # generator's PAIR-loop index, not rec_idx), whitespace
        # collapsed
        fid = r["doc_id"] >> 20
        assert "<html>" not in r["text"] and f"{fid}/" in r["text"]
        assert "  " not in r["text"]

    # the composition the module exists for: the frame feeds the
    # exact-dedup fingerprint directly (unique crawl bodies → one
    # keeper per doc, no accidental collisions)
    from micmac_li3ds_spark.operators.llm_text import exact_fingerprint

    n_fp = (
        docs.select(exact_fingerprint("text").alias("fp"))
        .distinct()
        .count()
    )
    assert n_fp == len(want)
    # and the plan stays one Arrow-batched pass, no shuffle before it
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "Exchange" not in plan
