"""Round 18: WARC hardening (ADVICE r17 #3/#4).

* ``warc_to_documents``'s packed surrogate key refuses a file whose
  record count exceeds the rec_idx field's capacity instead of
  silently colliding doc_ids across neighboring file_ids; ``id_bits``
  widens the shift for larger archive shapes.
* The streaming lake contract rejects leading-zero file names:
  '007.warc' and '7.warc' both mapped to file_id=7, so their records
  collided and ``read_warc_record_log().distinct()`` could silently
  merge/drop rows from distinct files.
"""

from __future__ import annotations

import pytest

from micmac_li3ds_spark.operators import warc as W


def _mk(headers, block):
    lines = ["WARC/1.0"] + [f"{k}: {v}" for k, v in headers]
    return "\r\n".join(lines).encode() + b"\r\n\r\n" + block + b"\r\n\r\n"


def _response(body: bytes) -> bytes:
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    )
    return _mk(
        [
            ("WARC-Type", "response"),
            ("Content-Length", str(len(http))),
            ("WARC-Target-URI", "http://host.example/page"),
        ],
        http,
    )


def _files_df(spark, payload: bytes, file_id: int = 7):
    return spark.createDataFrame(
        [(file_id, False, bytearray(payload))],
        "file_id long, gz boolean, payload binary",
    )


def test_doc_id_overflow_raises_named(spark):
    """Five records under id_bits=2 (capacity 4): the fifth record's
    rec_idx would overflow into the file_id field — the collision
    ADVICE r17 #3 flagged as silent. Same code path as the default
    2^20 capacity, shrunk to fixture scale."""
    from micmac_li3ds_spark.operators.warc import warc_to_documents

    body = b"<html><body>doc text</body></html>"
    payload = _response(body) * 5
    with pytest.raises(Exception, match=r"2\^2 rec_idx capacity"):
        warc_to_documents(
            _files_df(spark, payload), id_bits=2
        ).collect()

    # exactly at capacity: fine, and ids pack under the narrow shift
    ok = warc_to_documents(
        _files_df(spark, _response(body) * 4), id_bits=2
    ).collect()
    assert sorted(r["doc_id"] for r in ok) == [
        7 * 4 + i for i in range(4)
    ]


def test_doc_id_default_capacity_and_packing_unchanged(spark):
    """The default shift is still 2^20 — the fixture corpus' doc_ids
    must not change under the parameterization (stable-surrogate-key
    contract)."""
    from micmac_li3ds_spark.operators.warc import (
        load_warc,
        warc_to_documents,
    )

    got = {
        r["doc_id"]
        for r in warc_to_documents(load_warc(spark)).collect()
    }
    import pyarrow.parquet as pq

    want = set()
    for row in pq.read_table(W.WARC_PARQUET).to_pylist():
        for i, (t, st) in enumerate(
            zip(row["rec_type"], row["rec_status"])
        ):
            if t == "response" and st is not None and 200 <= st < 300:
                want.add(row["file_id"] * (1 << 20) + i)
    assert got == want and got


def test_lake_contract_rejects_leading_zero_file_ids(spark, tmp_path):
    """'007.warc' would silently alias '7.warc' (ADVICE r17 #4): the
    tightened contract accepts exactly one canonical name per
    file_id."""
    from micmac_li3ds_spark.streaming import jobs

    lake = tmp_path / "lake"
    lake.mkdir()
    (lake / "007.warc").write_bytes(_response(b"<html>x</html>"))
    stream = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .load(str(lake))
    )
    q = jobs.run_streaming_warc_extract(
        stream,
        str(tmp_path / "records"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    with pytest.raises(Exception, match="lake contract"):
        q.awaitTermination(300)
        if q.exception() is not None:
            raise Exception(str(q.exception()))
    # '0.warc' stays canonical (zero itself has no shorter spelling)
    import re

    pat = re.compile(r"^(0|[1-9]\d*)\.warc(\.gz)?$")
    assert pat.match("0.warc") and pat.match("10.warc.gz")
    assert not pat.match("007.warc") and not pat.match("00.warc")


# ---------------------------------------------------------------------------
# crawl link graph + frontier URL canonicalization (round-18 keys)
# ---------------------------------------------------------------------------


def _hrefs_df(spark, hrefs, src_host="page.example"):
    payload = _mk_response_with_links(hrefs)
    return spark.createDataFrame(
        [(1, False, bytearray(payload))],
        "file_id long, gz boolean, payload binary",
    ), src_host


def _mk_response_with_links(hrefs, host="page.example"):
    body = (
        "<html><body>"
        + "".join(
            f"<a href=\"{h.replace('&', '&amp;')}\">x</a>" for h in hrefs
        )
        + "</body></html>"
    ).encode()
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    return _mk(
        [
            ("WARC-Type", "response"),
            ("Content-Length", str(len(http))),
            ("WARC-Target-URI", f"http://{host}/index"),
        ],
        http,
    )


def test_warc_hrefs_unescapes_attribute_values(spark):
    """Attribute values are &amp;-escaped in source; the feed carries
    the actual URL — including the double-escape case, where &amp;lt;
    must yield the literal '&lt;', not '<'."""
    from micmac_li3ds_spark.operators.warc import warc_hrefs

    df, _ = _hrefs_df(
        spark, ["/a?x=1&y=2", "/b?weird=&amp;lt;"]
    )
    got = [r["href"] for r in warc_hrefs(df).collect()]
    # the &amp;-escape round-trips; &amp;lt; in the RAW url was written
    # as &amp;amp;lt; in source, so one unescape pass returns it
    assert got == ["/a?x=1&y=2", "/b?weird=&amp;lt;"]


def test_warc_links_resolution_semantics(spark):
    """Relative → same host; protocol-relative → its OWN host (a CDN
    reference must not inflate self-edges); absolute http(s) →
    lowercased authority, ANY port stripped; mailto/javascript
    dropped."""
    from micmac_li3ds_spark.operators.warc import (
        resolve_links,
        warc_hrefs,
    )

    df, _ = _hrefs_df(
        spark,
        [
            "/rel/path",
            "HTTP://Other.EXAMPLE:8080/x",
            "https://second.example:443/y",
            "//CDN.Example:8080/lib.js",
            "mailto:a@b.example",
            "javascript:void(0)",
        ],
    )
    got = sorted(
        (r["dst_host"], r["n_links"])
        for r in resolve_links(warc_hrefs(df)).collect()
    )
    assert got == [
        ("cdn.example", 1),
        ("other.example", 1),
        ("page.example", 1),
        ("second.example", 1),
    ]


def test_url_normalize_canonicalization_rules(spark):
    """Each documented rule, pinned on a constructed page: lowercase
    scheme+host (path case PRESERVED), default-port strip (non-default
    ports survive), fragment drop, utm_* drop, param sort, relative
    resolution, non-http(s) drop — and two spellings of one page
    collapse to a single canonical count."""
    from micmac_li3ds_spark.operators import warc as W

    hrefs = [
        "HTTP://Host.EXAMPLE:80/Mixed/Case?b=2&a=1#frag",   # canon 1
        "http://host.example/Mixed/Case?utm_source=x&a=1&b=2",  # same
        "https://host.example:8443/keep-port",
        "/rel?z=1",
        "mailto:nobody@host.example",
        "//CDN.example/lib.js",      # protocol-relative: own host
        "/doc#sec?x=1",              # '?' inside the dropped fragment
        "http://host.example/doc",   # ...collapses with the above? no:
        # the fragment form resolves against page.example — they stay
        # distinct pages; the assertion pins the no-resurrected-query
        # rule instead
    ]
    payload = _mk_response_with_links(hrefs)
    df = spark.createDataFrame(
        [(1, False, bytearray(payload))],
        "file_id long, gz boolean, payload binary",
    )
    import micmac_li3ds_spark.operators.warc as warc_mod

    orig = warc_mod.load_warc
    try:
        warc_mod.load_warc = lambda s: df
        rows = {
            r["url"]: r["n"]
            for r in warc_mod.q_llm_url_normalize(spark, "").collect()
        }
    finally:
        warc_mod.load_warc = orig
    assert rows == {
        "http://host.example/Mixed/Case?a=1&b=2": 2,
        "https://host.example:8443/keep-port": 1,
        "http://page.example/rel?z=1": 1,
        "http://cdn.example/lib.js": 1,
        "http://page.example/doc": 1,  # fragment's '?x=1' NOT a query
        "http://host.example/doc": 1,
    }


def test_streaming_href_log_matches_batch_keys(spark, tmp_path):
    """The continuous link graph / crawl frontier: land the fixture
    archives as lake files, drain with hrefs_dir + the compaction
    cadence, and demand read_warc_link_graph ≡ q_llm_warc_links and
    read_warc_frontier ≡ q_llm_url_normalize row for row (shared
    resolve_links/canonical_urls expressions over the accumulated
    log). Checkpointed redrain is a no-op; a fresh-checkpoint full
    replay over the compacted logs stays idempotent."""
    import os

    import pyarrow.parquet as pq

    from micmac_li3ds_spark.operators.warc import (
        q_llm_url_normalize,
        q_llm_warc_links,
    )
    from micmac_li3ds_spark.streaming import jobs

    lake = tmp_path / "crawl_lake"
    lake.mkdir()
    for row in pq.read_table(W.WARC_PARQUET).to_pylist():
        ext = "warc.gz" if row["gz"] else "warc"
        (lake / f"{row['file_id']}.{ext}").write_bytes(
            bytes(row["payload"])
        )

    records_dir = str(tmp_path / "records")
    hrefs_dir = str(tmp_path / "hrefs")

    def drain(ckpt):
        stream = (
            spark.readStream.format("binaryFile")
            .schema(
                "path string, modificationTime timestamp, "
                "length long, content binary"
            )
            .option("maxFilesPerTrigger", 7)
            .load(str(lake))
        )
        q = jobs.run_streaming_warc_extract(
            stream,
            records_dir,
            checkpoint=str(tmp_path / ckpt),
            compact_every=2,
            hrefs_dir=hrefs_dir,
        )
        q.awaitTermination(300)

    drain("ckpt")
    assert any(
        n.startswith("gen=") for n in os.listdir(hrefs_dir)
    )  # the href log folds through the same cadence

    want_links = [
        tuple(r) for r in q_llm_warc_links(spark, "x").collect()
    ]
    got_links = [
        tuple(r)
        for r in jobs.read_warc_link_graph(spark, hrefs_dir).collect()
    ]
    assert got_links == want_links and len(want_links) > 0

    want_urls = [
        tuple(r) for r in q_llm_url_normalize(spark, "x").collect()
    ]
    got_urls = [
        tuple(r)
        for r in jobs.read_warc_frontier(spark, hrefs_dir).collect()
    ]
    assert got_urls == want_urls and len(want_urls) > 0

    # a page's genuinely repeated href is NOT collapsed by the log's
    # distinct: (doc_id, seq) keys each occurrence
    href_log = jobs.read_warc_href_log(spark, hrefs_dir)
    from pyspark.sql import functions as F

    dup = (
        href_log.groupBy("doc_id", "href")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") >= 2)
        .count()
    )
    assert dup > 0  # the fixture's /x?a=1&b=2 double anchor survives

    # no-op redrain + fresh-checkpoint replay idempotence
    drain("ckpt")
    drain("ckpt2")
    assert [
        tuple(r)
        for r in jobs.read_warc_link_graph(spark, hrefs_dir).collect()
    ] == want_links


def test_host_rank_matches_integer_reference(spark):
    """The crawl→authority composition: host_rank over the fixture
    link graph equals a driver-side replay of the exact integer
    recurrence (micro-unit ranks, div truncation and all), for two
    iteration depths — and the full chain (archives → hrefs →
    resolve_links → host_rank) runs off the raw fixture frame."""
    from micmac_li3ds_spark.operators.warc import (
        host_rank,
        load_warc,
        resolve_links,
        warc_hrefs,
    )

    links = resolve_links(warc_hrefs(load_warc(spark)))
    edges = [
        (r["src_host"], r["dst_host"], r["n_links"])
        for r in links.collect()
    ]
    assert len(edges) > 0

    def reference(k):
        out = {}
        for s, _, n in edges:
            out[s] = out.get(s, 0) + n
        nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
        rank = {h: 1000000 for h in nodes}
        for _ in range(k):
            c = {h: 0 for h in nodes}
            for s, d, n in edges:
                c[d] += rank[s] * n // out[s]
            rank = {h: 150000 + 850 * c[h] // 1000 for h in nodes}
        return rank

    for k in (1, 5):
        got = {
            r["host"]: r["rank_u"]
            for r in host_rank(links, k=k).collect()
        }
        assert got == reference(k)


def test_combined_walk_matches_separate_passes(spark):
    """The streaming job's single-parse union splits back into exactly
    the warc_records and warc_hrefs frames (code-review r18 #7)."""
    from pyspark.sql import functions as F

    from micmac_li3ds_spark.operators.warc import (
        load_warc,
        warc_hrefs,
        warc_records,
        warc_records_with_hrefs,
    )

    files = load_warc(spark)
    combined = warc_records_with_hrefs(files)
    rec_cols = [
        "file_id", "rec_idx", "warc_type", "target_uri",
        "http_status", "block_len", "block_sum", "gz",
    ]
    got_rec = sorted(
        tuple(r)
        for r in combined.filter(F.col("kind") == "rec")
        .select(*rec_cols)
        .collect()
    )
    want_rec = sorted(tuple(r) for r in warc_records(files).collect())
    assert got_rec == want_rec and len(want_rec) > 0

    href_cols = ["doc_id", "seq", "src_host", "href"]
    got_href = sorted(
        tuple(r)
        for r in combined.filter(F.col("kind") == "href")
        .select(*href_cols)
        .collect()
    )
    want_href = sorted(tuple(r) for r in warc_hrefs(files).collect())
    assert got_href == want_href and len(want_href) > 0
