"""Round 16: generation compaction for by-batch-id streaming state
(r15 verdict item 4 — the small-files scale gap the streaming family
opened). Unit tests pin the commit/prune crash states and the
``before_batch`` replay rule over a generation's ``src_batch`` column;
harness tests compact MID-FEED, re-drain, and demand pair/state sets
bit-identical to the uncompacted batch twin with the file count
bounded."""

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from micmac_li3ds_spark.streaming import compaction as C
from micmac_li3ds_spark.streaming import jobs

DDL = "k long, v string"


def _write_batches(spark, path, rows_by_batch):
    for b, rows in rows_by_batch.items():
        spark.createDataFrame(rows, DDL).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{path}/batch={b}")


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


# ---------------------------------------------------------------------------
# unit: resolve_state over generations + live batches, before_batch rule
# ---------------------------------------------------------------------------


def test_compact_then_resolve_preserves_rows_and_before_batch(
    spark, tmp_path
):
    path = str(tmp_path / "state")
    data = {
        0: [(1, "a"), (2, "b")],
        1: [(3, "c")],
        2: [(4, "d"), (5, "e")],
    }
    _write_batches(spark, path, data)
    before = C.state_file_count(spark, path)
    assert before >= 3

    res = C.compact_state_dir(spark, path, DDL, num_files=1, up_to=2)
    assert res["generation"] == 0
    assert res["folded_batches"] == 2 and res["up_to"] == 2

    # folded batch dirs pruned; live batch=2 untouched
    names = set(os.listdir(path))
    assert "batch=0" not in names and "batch=1" not in names
    assert "batch=2" in names and "gen=0" in names
    assert "_GEN_COMMIT_0_2" in names

    all_rows = [(k, v) for rows in data.values() for (k, v) in rows]
    assert _rows(C.resolve_state(spark, path, DDL)) == sorted(all_rows)
    # before_batch prunes the generation by src_batch, bit-exactly
    assert _rows(C.resolve_state(spark, path, DDL, before_batch=2)) == sorted(
        data[0] + data[1]
    )
    assert _rows(C.resolve_state(spark, path, DDL, before_batch=1)) == sorted(
        data[0]
    )
    assert _rows(C.resolve_state(spark, path, DDL, before_batch=0)) == []

    # compacting to one file bounds the data-file count: gen (1 file)
    # + the single live batch dir's file
    assert C.state_file_count(spark, path) == 2


def test_compact_incremental_noop_and_generation_rollover(spark, tmp_path):
    path = str(tmp_path / "state")
    _write_batches(spark, path, {0: [(1, "a")], 1: [(2, "b")]})
    r1 = C.compact_state_dir(spark, path, DDL, num_files=1, up_to=2)
    assert r1["generation"] == 0 and r1["folded_batches"] == 2

    # nothing new: no-op, generation unchanged
    r2 = C.compact_state_dir(spark, path, DDL, num_files=1)
    assert r2["folded_batches"] == 0 and r2["generation"] == 0

    # new live batches fold into generation 1; generation 0 is pruned
    _write_batches(spark, path, {2: [(3, "c")], 3: [(4, "d")]})
    r3 = C.compact_state_dir(spark, path, DDL, num_files=1, up_to=4)
    assert r3["generation"] == 1 and r3["folded_batches"] == 2
    names = set(os.listdir(path))
    assert "gen=0" not in names and "_GEN_COMMIT_0_2" not in names
    assert "gen=1" in names and "_GEN_COMMIT_1_4" in names
    assert _rows(C.resolve_state(spark, path, DDL)) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
        (4, "d"),
    ]
    assert C.state_file_count(spark, path) == 1


def test_crash_leftovers_are_invisible_and_cleaned(spark, tmp_path):
    path = str(tmp_path / "state")
    _write_batches(spark, path, {0: [(1, "a")]})

    # crash A: a generation written but never committed (no marker) —
    # invisible to readers, removed by the next successful compaction
    spark.createDataFrame([(99, "zz")], DDL).withColumn(
        "src_batch", F.lit(0)
    ).write.parquet(f"{path}/gen=0")
    assert _rows(C.resolve_state(spark, path, DDL)) == [(1, "a")]

    res = C.compact_state_dir(spark, path, DDL, num_files=1, up_to=1)
    # the retry overwrites the orphan generation id and commits it
    assert res["generation"] == 0 and res["folded_batches"] == 1
    assert _rows(C.resolve_state(spark, path, DDL)) == [(1, "a")]

    # crash B: commit landed but prune didn't — a folded batch dir
    # resurfaces. It is < up_to, so readers must ignore it even though
    # its content now DIFFERS (the poison row proves it's never read).
    _write_batches(spark, path, {0: [(666, "poison")]})
    assert _rows(C.resolve_state(spark, path, DDL)) == [(1, "a")]
    # ...and the next compaction garbage-collects it
    _write_batches(spark, path, {1: [(2, "b")]})
    C.compact_state_dir(spark, path, DDL, num_files=1, up_to=2)
    assert "batch=0" not in set(os.listdir(path))
    assert _rows(C.resolve_state(spark, path, DDL)) == [(1, "a"), (2, "b")]


def test_compact_up_to_cannot_roll_back(spark, tmp_path):
    path = str(tmp_path / "state")
    _write_batches(spark, path, {0: [(1, "a")], 1: [(2, "b")]})
    C.compact_state_dir(spark, path, DDL, num_files=1, up_to=2)
    with pytest.raises(ValueError, match="roll back"):
        C.compact_state_dir(spark, path, DDL, up_to=1)


def test_compact_missing_and_empty_dirs_are_noops(spark, tmp_path):
    path = str(tmp_path / "nonexistent")
    assert C.compact_state_dir(spark, path, DDL)["folded_batches"] == 0
    assert _rows(C.resolve_state(spark, path, DDL)) == []
    assert C.state_file_count(spark, path) == 0


def test_bucketed_generation_roundtrip_prune_and_meta(spark, tmp_path):
    """bucket_by writes pb=<hash bucket> partition dirs with one data
    file per occupied bucket and a _GEN_META sidecar; resolve_state
    returns the identical row set, and prune_keys PHYSICALLY restricts
    the scan to the keys' bucket files (asserted on inputFiles), while
    before_batch still filters by src_batch inside the pruned scan."""
    path = str(tmp_path / "state")
    data = {
        0: [(i, f"v{i}") for i in range(0, 20)],
        1: [(i, f"v{i}") for i in range(20, 40)],
    }
    _write_batches(spark, path, data)
    res = C.compact_state_dir(
        spark, path, DDL, bucket_by="k", n_buckets=8, up_to=2
    )
    assert res["bucket_by"] == "k" and res["n_buckets"] == 8
    names = set(os.listdir(path))
    assert "_GEN_META_0" in names and "_GEN_COMMIT_0_2" in names
    pb_dirs = {
        d for d in os.listdir(f"{path}/gen=0") if d.startswith("pb=")
    }
    assert 1 < len(pb_dirs) <= 8
    # one data file per occupied bucket
    for d in pb_dirs:
        files = [
            f
            for f in os.listdir(f"{path}/gen=0/{d}")
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, d

    all_rows = sorted(r for rows in data.values() for r in rows)
    assert _rows(C.resolve_state(spark, path, DDL)) == all_rows

    # pruned read: keys {0, 25} → only their buckets' files are scanned
    keys = spark.createDataFrame([(0,), (25,)], "k long")
    pruned = C.resolve_state(spark, path, DDL, prune_keys=keys)
    got = _rows(pruned)
    assert (0, "v0") in got and (25, "v25") in got
    assert set(got) <= set(all_rows)  # superset-of-keys, subset-of-all
    want_buckets = {
        r[0]
        for r in keys.select(C.bucket_expr("k", 8).alias("b")).collect()
    }
    # physical pruning proof: the scan carries a PartitionFilters
    # IN-list of exactly the keys' buckets (inputFiles() reports the
    # PRE-pruning listing, so the executed plan is the honest probe)
    import re

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[pb#\d+ IN \(([\d,]+)\)\]", plan)
    assert m, plan
    assert {int(x) for x in m.group(1).split(",")} == want_buckets
    # and the row set is exactly the touched buckets' contents
    bucket_of = {
        r["k"]: r["b"]
        for r in spark.createDataFrame(all_rows, DDL)
        .select("k", C.bucket_expr("k", 8).alias("b"))
        .collect()
    }
    want_rows = sorted(
        (k, v) for k, v in all_rows if bucket_of[k] in want_buckets
    )
    assert got == want_rows

    # before_batch composes with pruning (src_batch survives the
    # bucketed layout)
    early = C.resolve_state(spark, path, DDL, before_batch=1, prune_keys=keys)
    got_early = _rows(early)
    assert (0, "v0") in got_early
    assert all(k < 20 for k, _v in got_early)  # batch 1 rows filtered

    # prune_keys on a column the generation is NOT bucketed by → full read
    other = spark.createDataFrame([("v0",)], "v string")
    assert _rows(C.resolve_state(spark, path, DDL, prune_keys=other)) == (
        all_rows
    )


def test_bucketing_transitions_between_folds(spark, tmp_path):
    """Each fold re-clusters the whole state, so bucketed → unbucketed
    → bucketed transitions preserve rows, and only the newest
    generation's meta survives."""
    path = str(tmp_path / "state")
    _write_batches(spark, path, {0: [(1, "a")], 1: [(2, "b")]})
    C.compact_state_dir(spark, path, DDL, bucket_by="k", n_buckets=4, up_to=2)
    _write_batches(spark, path, {2: [(3, "c")]})
    # unbucketed fold
    C.compact_state_dir(spark, path, DDL, num_files=1, up_to=3)
    names = set(os.listdir(path))
    assert "_GEN_META_0" not in names and "_GEN_META_1" not in names
    assert _rows(C.resolve_state(spark, path, DDL)) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]
    _write_batches(spark, path, {3: [(4, "d")]})
    C.compact_state_dir(spark, path, DDL, bucket_by="v", n_buckets=4, up_to=4)
    assert "_GEN_META_2" in set(os.listdir(path))
    assert _rows(C.resolve_state(spark, path, DDL)) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
        (4, "d"),
    ]


# ---------------------------------------------------------------------------
# property: any interleaving of batch writes and folds (bucketed or
# not) preserves exactly the union of written rows, and before_batch
# always slices by batch id as if no fold ever happened
# ---------------------------------------------------------------------------


@st.composite
def _fold_script(draw):
    """A feed script: per batch, row count and whether a fold (and
    with which bucketing) runs AFTER it."""
    n_batches = draw(st.integers(min_value=1, max_value=5))
    script = []
    for _ in range(n_batches):
        n_rows = draw(st.integers(min_value=0, max_value=6))
        fold = draw(
            st.sampled_from(["none", "plain", "bucket_k", "bucket_v"])
        )
        script.append((n_rows, fold))
    return script


@given(script=_fold_script())
@settings(max_examples=10, deadline=None)
def test_compaction_preserves_rows_under_any_fold_interleaving(
    spark_session_for_hypothesis, tmp_path_factory, script
):
    spark = spark_session_for_hypothesis
    path = str(tmp_path_factory.mktemp("prop") / "state")
    written: dict[int, list] = {}
    next_id = 0
    for b, (n_rows, fold) in enumerate(script):
        rows = [(next_id + i, f"v{(next_id + i) % 3}") for i in range(n_rows)]
        next_id += n_rows
        written[b] = rows
        _write_batches(spark, path, {b: rows})
        if fold == "plain":
            C.compact_state_dir(spark, path, DDL, num_files=1)
        elif fold == "bucket_k":
            C.compact_state_dir(spark, path, DDL, bucket_by="k", n_buckets=4)
        elif fold == "bucket_v":
            C.compact_state_dir(spark, path, DDL, bucket_by="v", n_buckets=3)

    all_rows = sorted(r for rows in written.values() for r in rows)
    assert _rows(C.resolve_state(spark, path, DDL)) == all_rows
    # the strictly-earlier slice is fold-invariant at every boundary
    for b in range(len(script) + 1):
        want = sorted(
            r for k, rows in written.items() if k < b for r in rows
        )
        assert _rows(C.resolve_state(spark, path, DDL, before_batch=b)) == (
            want
        )
    # pruned read (when the newest gen is bucketed on k) stays a
    # superset of any key's row
    if all_rows:
        k0 = all_rows[0][0]
        keys = spark.createDataFrame([(k0,)], "k long")
        got = _rows(C.resolve_state(spark, path, DDL, prune_keys=keys))
        assert (k0, all_rows[0][1]) in got
        assert set(got) <= set(all_rows)


@pytest.fixture(scope="module")
def spark_session_for_hypothesis(spark):
    """hypothesis forbids function-scoped fixtures regenerating per
    example; alias the session-scoped spark fixture at module scope."""
    return spark


# ---------------------------------------------------------------------------
# harness: compact MID-FEED, re-drain, sets bit-identical
# ---------------------------------------------------------------------------


def _flat_feed(tmp_path, docs, n_batches):
    """One parquet file per micro-batch under a flat dir."""
    feed = tmp_path / "feed_parts"
    feed.mkdir()
    flat = tmp_path / "feed"
    flat.mkdir()
    for k in range(n_batches):
        sub = feed / f"b{k}"
        docs.filter(F.pmod("doc_id", F.lit(n_batches)) == k).coalesce(
            1
        ).write.mode("overwrite").parquet(str(sub))
        src = [f for f in os.listdir(sub) if f.endswith(".parquet")][0]
        os.link(sub / src, flat / f"{k}.parquet")
    return flat


def _doc_stream(spark, feed):
    return (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )


def test_streaming_near_dedup_compact_mid_feed_matches_batch(
    spark, tmp_path, sf_dir
):
    """Feed the corpus as three micro-batches, but COMPACT every state
    dir after the second: the final pair set must still equal
    q_llm_near_dedup on the full corpus (the batch twin), replays must
    stay idempotent, and the shingle/band state file count must drop
    to the generation's."""
    from micmac_li3ds_spark.operators.llm_text import q_llm_near_dedup
    from micmac_li3ds_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    flat = _flat_feed(tmp_path, docs, 3)
    # hold back the third batch: a mid-feed compaction point
    held = tmp_path / "held.parquet"
    os.rename(flat / "2.parquet", held)

    dirs = {
        "shingle_dir": str(tmp_path / "shingles"),
        "bands_dir": str(tmp_path / "bands"),
        "pairs_dir": str(tmp_path / "pairs"),
    }

    def drain(ckpt):
        q = jobs.run_streaming_near_dedup(
            _doc_stream(spark, flat), checkpoint=str(tmp_path / ckpt), **dirs
        )
        q.awaitTermination(300)

    drain("ckpt")
    c1 = C.compact_state_dir(spark, dirs["shingle_dir"], jobs._SHINGLE_DDL,
                             num_files=1, up_to=2)
    c2 = C.compact_state_dir(spark, dirs["bands_dir"], jobs._BANDS_DDL,
                             num_files=1, up_to=2)
    c3 = C.compact_state_dir(
        spark, dirs["pairs_dir"], "doc_a long, doc_b long, jac double",
        num_files=1, up_to=2,
    )
    assert (
        c1["folded_batches"] == c2["folded_batches"]
        == c3["folded_batches"] == 2
    )
    assert C.state_file_count(spark, dirs["bands_dir"]) == 1

    # release the third batch and continue on the SAME checkpoint —
    # batch 2's candidates must come from the COMPACTED state
    os.rename(held, flat / "2.parquet")
    drain("ckpt")

    got = {
        (r["doc_a"], r["doc_b"], r["jac"])
        for r in jobs.read_near_dedup_pairs(
            spark, dirs["pairs_dir"]
        ).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"], r["jac"])
        for r in q_llm_near_dedup(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0

    # state file count stays bounded: one generation file per dir +
    # one live batch dir each
    assert C.state_file_count(spark, dirs["bands_dir"]) == 2

    # fresh-checkpoint replay over the compacted state dirs: every
    # batch re-runs; folded batch ids are ignored by readers but their
    # rewritten content is identical by determinism — the pair set is
    # bit-identical
    drain("ckpt2")
    got2 = {
        (r["doc_a"], r["doc_b"], r["jac"])
        for r in jobs.read_near_dedup_pairs(
            spark, dirs["pairs_dir"]
        ).collect()
    }
    assert got2 == want


def test_streaming_near_dedup_auto_compaction_cadence(
    spark, tmp_path, sf_dir
):
    """compact_every=2 on a 3-batch feed: the job folds its own state
    after batch 1 with no external scheduler, batch 2 runs against the
    generation, and the pair set still equals the batch twin. The
    fresh-checkpoint replay then re-fires the cadence at a boundary
    the state has already passed — the auto_compact WAL-replay guard
    must skip, not roll back."""
    from micmac_li3ds_spark.operators.llm_text import q_llm_near_dedup
    from micmac_li3ds_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    flat = _flat_feed(tmp_path, docs, 3)
    dirs = {
        "shingle_dir": str(tmp_path / "shingles"),
        "bands_dir": str(tmp_path / "bands"),
        "pairs_dir": str(tmp_path / "pairs"),
    }

    def drain(ckpt):
        q = jobs.run_streaming_near_dedup(
            _doc_stream(spark, flat),
            checkpoint=str(tmp_path / ckpt),
            compact_every=2,
            **dirs,
        )
        q.awaitTermination(300)

    drain("ckpt")
    # the in-stream fold happened after batch 1: gen=0 + live batch=2
    for d in dirs.values():
        names = set(os.listdir(d))
        assert "gen=0" in names and "_GEN_COMMIT_0_2" in names
        assert "batch=0" not in names and "batch=2" in names

    want = {
        (r["doc_a"], r["doc_b"], r["jac"])
        for r in q_llm_near_dedup(spark, sf_dir).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"], r["jac"])
        for r in jobs.read_near_dedup_pairs(
            spark, dirs["pairs_dir"]
        ).collect()
    }
    assert got == want and len(want) > 0

    # fresh-checkpoint full replay: batch ids restart behind the
    # committed boundary; the guard skips the stale fold and the set
    # stays bit-identical
    drain("ckpt2")
    got2 = {
        (r["doc_a"], r["doc_b"], r["jac"])
        for r in jobs.read_near_dedup_pairs(
            spark, dirs["pairs_dir"]
        ).collect()
    }
    assert got2 == want


def test_streaming_semantic_dedup_compact_mid_feed_matches_batch(
    spark, tmp_path, sf_dir
):
    """SemDeDup's vector state and edge log compacted after two of
    three batches: the remaining batch's candidates come from the
    generation, and the keeper snapshot still equals
    q_llm_semantic_dedup on the full corpus."""
    from micmac_li3ds_spark.operators.llm_vector import (
        _emb,
        q_llm_semantic_dedup,
    )
    from tests.test_streaming import (
        _emb_stream,
        _embeddings_feed,
        _sem_dedup_dirs,
    )

    feed_dir = _embeddings_feed(spark, tmp_path, sf_dir)
    held = tmp_path / "held_emb.parquet"
    os.rename(os.path.join(feed_dir, "2.parquet"), held)
    centroids = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    dirs = _sem_dedup_dirs(tmp_path)

    def drain(ckpt):
        q = jobs.run_streaming_semantic_dedup(
            _emb_stream(spark, feed_dir),
            centroids,
            checkpoint=str(tmp_path / ckpt),
            **dirs,
        )
        q.awaitTermination(300)

    drain("ckpt")
    cv = C.compact_state_dir(
        spark, dirs["vectors_dir"], jobs._SEM_VEC_DDL, num_files=1, up_to=2
    )
    cp = C.compact_state_dir(
        spark, dirs["pairs_dir"], "doc_a long, doc_b long, cos double",
        num_files=1, up_to=2,
    )
    assert cv["folded_batches"] == 2 and cp["folded_batches"] == 2
    assert C.state_file_count(spark, dirs["vectors_dir"]) == 1

    os.rename(held, os.path.join(feed_dir, "2.parquet"))
    drain("ckpt")

    got = sorted(
        (r["vec_id"], r["keeper"], r["is_kept"])
        for r in jobs.read_semantic_dedup_keepers(spark, **dirs).collect()
    )
    want = sorted(
        (r["vec_id"], r["keeper"], r["is_kept"])
        for r in q_llm_semantic_dedup(spark, sf_dir).collect()
    )
    assert got == want and len(want) > 0


def test_media_feature_stream_auto_compaction(spark, tmp_path):
    """The mixed-media feature stream with compact_every=2: the
    feature log folds itself mid-feed and read_feature_log returns the
    identical distinct feature set the batch pipeline computes over
    the union of all fed files."""
    import pyarrow.parquet as pq_

    from micmac_li3ds_spark.operators import multimodal as mm
    from micmac_li3ds_spark.operators.multimodal import (
        decode_auto,
        feature_extract,
    )

    lake = tmp_path / "mixed_lake"
    lake.mkdir()
    picked = []
    for fam, ext in [("bmp", "bmp"), ("wav", "wav"), ("png", "png")]:
        rows = pq_.read_table(
            os.path.join(
                mm._REPO, "fixtures", "parquet", f"media_{fam}.parquet"
            ),
            columns=["media_id", "mime", "payload"],
        ).to_pylist()[:2]
        for r in rows:
            (lake / f"{r['media_id']}.{ext}").write_bytes(
                bytes(r["payload"])
            )
        picked.extend(rows)

    features_dir = str(tmp_path / "features")
    stream = (
        spark.readStream.format("binaryFile")
        .schema(jobs.read_media_file_stream(spark, str(lake)).schema)
        .option("maxFilesPerTrigger", 2)
        .load(str(lake))
    )
    q = jobs.run_streaming_feature_extract(
        stream,
        features_dir,
        checkpoint=str(tmp_path / "ckpt"),
        compact_every=2,
    )
    q.awaitTermination(300)

    names = set(os.listdir(features_dir))
    assert any(n.startswith("gen=") for n in names)

    media = spark.createDataFrame(
        [(r["media_id"], r["mime"], bytes(r["payload"])) for r in picked],
        "media_id long, mime string, payload binary",
    )
    want = sorted(
        tuple(r)
        for r in feature_extract(
            media, decode=decode_auto, decoder_name="auto-dispatch-v1"
        ).collect()
    )
    got = sorted(
        tuple(r)
        for r in jobs.read_feature_log(spark, features_dir).collect()
    )
    assert got == want and len(want) > 0


def test_dlq_replay_works_across_all_three_layouts(spark, tmp_path):
    """replay_dead_letters must read the DLQ in any layout it can be
    in: the batch=<k> dirs the split job writes, the compacted
    generation, and (regression) a flat hand-written dir — compaction
    of the quarantine must never strand the triage tool."""
    from pyspark.sql import types as T

    src = tmp_path / "src"
    src.mkdir()
    lines = [
        '{"click_id": 1, "page": "a", "ms": 5, "ok": true}',
        '{"click_id": 2, "page": "b", "ms": "slow", "ok": true}',  # bad ms
        "not json at all",
    ]
    for i, ln in enumerate(lines):
        (src / f"{i}.json").write_text(ln + "\n")

    clean_dir = str(tmp_path / "clean")
    dlq_dir = str(tmp_path / "dlq")
    q = jobs.run_dead_letter_split(
        jobs.read_clicks_json_stream(spark, str(src)),
        clean_dir,
        dlq_dir,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    fixed = T.StructType(
        [
            T.StructField("click_id", T.LongType()),
            T.StructField("page", T.StringType()),
            T.StructField("ms", T.StringType()),  # widened: recovers row 2
            T.StructField("ok", T.BooleanType()),
        ]
    )

    def snapshot():
        rec, dead = jobs.replay_dead_letters(spark, dlq_dir, fixed)
        return (
            {tuple(r) for r in rec.collect()},
            {r["raw_line"] for r in dead.collect()},
        )

    before = snapshot()
    assert before[0] == {(2, "b", "slow", True)}
    assert before[1] == {"not json at all"}

    res = C.compact_state_dir(
        spark,
        dlq_dir,
        "raw_line string, batch_id long, ingest_ts timestamp",
        num_files=1,
    )
    assert res["folded_batches"] >= 1
    assert snapshot() == before  # identical triage over the generation


def test_streaming_exact_dedup_compact_mid_feed_keeps_first_seen(
    spark, tmp_path, sf_dir
):
    """The exact-dedup stream reads state with the STRICTLY-EARLIER
    rule (before_batch) — the one compaction must honor through the
    generation's src_batch column. Double-import corpus with a
    compaction between the two imports: the report must equal
    q_llm_exact_dedup (first-seen keepers, n_copies=2), i.e. the
    second import discovers NOTHING new out of the generation."""
    from micmac_li3ds_spark.operators.llm_text import q_llm_exact_dedup
    from micmac_li3ds_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    once = tmp_path / "docs_once"
    docs.coalesce(1).write.mode("overwrite").parquet(str(once))
    src = [f for f in os.listdir(once) if f.endswith(".parquet")][0]
    flat = tmp_path / "feed"
    flat.mkdir()
    os.link(once / src, flat / "0.parquet")

    seen_dir = str(tmp_path / "seen")
    dups_dir = str(tmp_path / "dups")

    def drain(ckpt):
        q = jobs.run_streaming_exact_dedup(
            _doc_stream(spark, flat),
            seen_dir,
            dups_dir,
            checkpoint=str(tmp_path / ckpt),
        )
        q.awaitTermination(300)

    drain("ckpt")  # first import = batch 0
    # bucketed fold: the job's strictly-earlier read then goes through
    # BOTH the src_batch filter and the fp-bucket partition pruning
    res = C.compact_state_dir(
        spark, seen_dir, jobs._EXACT_SEEN_DDL, bucket_by="fp",
        n_buckets=16, up_to=1,
    )
    assert res["folded_batches"] == 1 and res["bucket_by"] == "fp"
    C.compact_state_dir(
        spark, dups_dir, "doc_id long, fp string, n long", num_files=1,
        up_to=1,
    )

    os.link(once / src, flat / "1.parquet")
    drain("ckpt")  # second import = batch 1, against compacted state

    got = sorted(
        (r["fp"], r["kept_doc_id"], r["n_copies"])
        for r in jobs.read_exact_dedup(spark, seen_dir, dups_dir).collect()
    )
    want = sorted(
        (r["fp"], r["kept_doc_id"], r["n_copies"])
        for r in q_llm_exact_dedup(spark, sf_dir).collect()
    )
    assert got == want and len(want) > 0
    assert all(n == 2 for _fp, _k, n in got)

    # batch 1 wrote an EMPTY first-seen delta (everything was already
    # in the generation)
    import pyarrow.parquet as pq_

    b1 = f"{seen_dir}/batch=1"
    assert (
        sum(
            pq_.read_table(f"{b1}/{f}").num_rows
            for f in os.listdir(b1)
            if f.endswith(".parquet")
        )
        == 0
    )

    # fresh-checkpoint full replay over compacted state: idempotent —
    # replayed batch 0 sees EMPTY strictly-earlier state (src_batch <
    # 0 filters the whole generation), exactly as the original run did
    drain("ckpt2")
    got2 = sorted(
        (r["fp"], r["kept_doc_id"], r["n_copies"])
        for r in jobs.read_exact_dedup(spark, seen_dir, dups_dir).collect()
    )
    assert got2 == want
