"""Round 18: lease hardening (ADVICE r17 #1/#2 + r17 verdict item 4).

* The lease is created ATOMICALLY with its content (sidecar temp file +
  rename; rename-onto-existing fails on HDFS/local — verified against
  this container's ProxyLocalFileSystem) — a visible lease is never
  empty, so the empty-lease self-heal branch can only ever match a
  pre-atomic-era crash stub, never a live compactor mid-create.
* Ownerless callers (the maintenance CLI) hold a UNIQUE anonymous
  token: a concurrent owner-bearing compactor sees a foreign owner and
  refuses — the ADVICE r17 #1 race (in-stream cadence breaking a LIVE
  CLI's lease and double-folding the same generation) is closed.
* A lease released between a failed acquire and the diagnostic read is
  retried, not raised on (ADVICE r17 #2's spurious hard failure).
* The owner-uniqueness contract is EXECUTABLE (r17 verdict item 4):
  blank owners are refused with the reasoning in the message, and the
  documented same-owner steal (safe ONLY under an external
  single-liveness lock, i.e. Spark's checkpoint lock) is pinned so a
  future caller passing a shared owner fails a test, not production.
"""

import os

import pytest

from micmac_li3ds_spark.streaming import compaction as C

DDL = "k long, v string"


def _write_batches(spark, path, rows_by_batch):
    for b, rows in rows_by_batch.items():
        spark.createDataFrame(rows, DDL).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{path}/batch={b}")


def _lease_bytes(path):
    with open(os.path.join(path, C.LEASE_NAME), "rb") as f:
        return f.read()


def _no_tmp_leftovers(path):
    return [
        n
        for n in os.listdir(path)
        if n.startswith(f".{C.LEASE_NAME}.tmp.")
        # ChecksumFileSystem writes .crc sidecars for the temp file;
        # they are dot-invisible to Hadoop listings and byte-free, but
        # keep the assertion honest about actual temp payloads
        and not n.endswith(".crc")
    ]


# ---------------------------------------------------------------------------
# atomic creation: a visible lease always carries its token
# ---------------------------------------------------------------------------


def test_lease_is_never_observably_empty(spark, tmp_path):
    path = str(tmp_path / "state")
    os.makedirs(path)
    fs, _ = C._fs(spark, path)

    held = C._acquire_lease(spark, fs, path, owner="ckpt-A")
    assert _lease_bytes(path) == b"ckpt-A"
    assert _no_tmp_leftovers(path) == []
    fs.delete(held, False)

    held = C._acquire_lease(spark, fs, path)  # ownerless CLI
    token = _lease_bytes(path)
    assert token.startswith(b"anon:") and len(token) > len(b"anon:")
    assert _no_tmp_leftovers(path) == []
    fs.delete(held, False)

    # successive anonymous tokens differ — no shared CLI identity
    held = C._acquire_lease(spark, fs, path)
    assert _lease_bytes(path) != token
    fs.delete(held, False)


def test_live_ownerless_lease_not_breakable_by_owner_bearing_fold(
    spark, tmp_path
):
    """ADVICE r17 #1: the CLI fold's lease used to be EMPTY for its
    whole duration, so a concurrent in-stream auto_compact matched the
    crash-stub branch, deleted the LIVE lease, and both compactors
    folded the same generation. Now the CLI holds a unique anonymous
    token and every concurrent path refuses loudly."""
    path = str(tmp_path / "state")
    _write_batches(spark, path, {0: [(1, "a")], 1: [(2, "b")]})
    fs, _ = C._fs(spark, path)

    held = C._acquire_lease(spark, fs, path)  # live CLI mid-fold
    cli_token = _lease_bytes(path)

    # the in-stream cadence (owner-bearing) must refuse, not break
    with pytest.raises(RuntimeError, match="lease already held"):
        C.compact_state_dir(
            spark, path, DDL, num_files=1, up_to=2, lease_owner="ckpt-A"
        )
    with pytest.raises(RuntimeError, match="lease already held"):
        C.auto_compact(
            spark, [(path, DDL)], batch_id=1, every=2, owner="ckpt-A"
        )
    # ...and the CLI's lease survived untouched
    assert _lease_bytes(path) == cli_token
    # ...as does a second ownerless CLI
    with pytest.raises(RuntimeError, match="lease already held"):
        C.compact_state_dir(spark, path, DDL, num_files=1, up_to=2)
    assert _lease_bytes(path) == cli_token
    assert _no_tmp_leftovers(path) == []
    fs.delete(held, False)


# ---------------------------------------------------------------------------
# release race: lease vanishing between failed acquire and diagnosis
# ---------------------------------------------------------------------------


class _VanishingRenameFS:
    """Delegates to the real Hadoop fs, but the first ``rename`` fails
    as if another compactor held the lease AND released it before the
    caller could look — the exact interleaving of ADVICE r17 #2."""

    def __init__(self, fs):
        self._fs = fs
        self.failed_renames = 0

    def rename(self, src, dst):
        if self.failed_renames == 0:
            self.failed_renames += 1
            return False
        return self._fs.rename(src, dst)

    def __getattr__(self, name):
        return getattr(self._fs, name)


def test_released_between_acquire_and_read_retries(spark, tmp_path):
    path = str(tmp_path / "state")
    os.makedirs(path)
    fs, _ = C._fs(spark, path)

    # ownerless caller — the path ADVICE r17 #2 flagged as a spurious
    # hard failure ("lease already held" for a now-free dir)
    shim = _VanishingRenameFS(fs)
    held = C._acquire_lease(spark, shim, path)
    assert shim.failed_renames == 1
    assert _lease_bytes(path).startswith(b"anon:")
    fs.delete(held, False)

    # owner-bearing caller takes the same retry
    shim = _VanishingRenameFS(fs)
    held = C._acquire_lease(spark, shim, path, owner="ckpt-A")
    assert shim.failed_renames == 1
    assert _lease_bytes(path) == b"ckpt-A"
    fs.delete(held, False)
    assert _no_tmp_leftovers(path) == []


# ---------------------------------------------------------------------------
# owner uniqueness: the prose contract, executable
# ---------------------------------------------------------------------------


def test_blank_owner_refused(spark, tmp_path):
    path = str(tmp_path / "state")
    os.makedirs(path)
    fs, _ = C._fs(spark, path)
    for bad in ("", "   "):
        with pytest.raises(ValueError, match="non-empty unique identity"):
            C._acquire_lease(spark, fs, path, owner=bad)
        with pytest.raises(ValueError, match="non-empty unique identity"):
            C.compact_state_dir(spark, path, DDL, lease_owner=bad)
    assert C.LEASE_NAME not in set(os.listdir(path))


def test_same_owner_steal_is_the_documented_contract(spark, tmp_path):
    """PINNED, not fixed: a second acquisition claiming the SAME owner
    breaks a held lease — that is the self-heal working as designed,
    and it is safe ONLY because callers must guarantee at most one
    live process per owner value (auto_compact passes the stream's
    checkpoint path; Spark's checkpoint lock enforces single
    liveness). A caller passing a SHARED owner (two different streams,
    a constant) re-opens the double-fold race — this test is the
    executable statement of that constraint (r17 verdict item 4)."""
    path = str(tmp_path / "state")
    os.makedirs(path)
    fs, _ = C._fs(spark, path)

    C._acquire_lease(spark, fs, path, owner="ckpt-A")
    # same owner: treated as our own dead predecessor and stolen
    held = C._acquire_lease(spark, fs, path, owner="ckpt-A")
    assert _lease_bytes(path) == b"ckpt-A"
    fs.delete(held, False)


def test_pre_atomic_empty_stub_still_healed_by_owner_bearing_only(
    spark, tmp_path
):
    """An EMPTY lease can no longer be produced by this code (creation
    is atomic-with-content), but a pre-atomic-era crash stub on disk
    must still be recoverable: owner-bearing callers break it,
    ownerless callers still refuse (they cannot know whose stub it
    is)."""
    path = str(tmp_path / "state")
    _write_batches(spark, path, {0: [(1, "a")], 1: [(2, "b")]})
    fs, _ = C._fs(spark, path)

    open(os.path.join(path, C.LEASE_NAME), "w").close()
    with pytest.raises(RuntimeError, match="lease already held"):
        C.compact_state_dir(spark, path, DDL, num_files=1, up_to=2)
    res = C.compact_state_dir(
        spark, path, DDL, num_files=1, up_to=2, lease_owner="ckpt-A"
    )
    assert res["folded_batches"] == 2
    assert C.LEASE_NAME not in set(os.listdir(path))


# ---------------------------------------------------------------------------
# in-stream retention horizon (r17 verdict item 5): every streaming
# matching-state dir bounded to a contamination window from job config
# ---------------------------------------------------------------------------


def _incremental_feed(spark, tmp_path, df, key, n_batches=3):
    """Batch files staged for INCREMENTAL linking (one link per drain →
    deterministic batch ids), split by pmod(key, n_batches)."""
    from pyspark.sql import functions as F

    staged = []
    for k in range(n_batches):
        sub = tmp_path / f"stage{k}"
        df.filter(F.pmod(key, F.lit(n_batches)) == k).coalesce(
            1
        ).write.mode("overwrite").parquet(str(sub))
        src = [f for f in os.listdir(sub) if f.endswith(".parquet")][0]
        staged.append(sub / src)
    feed = tmp_path / "feed"
    feed.mkdir()
    return feed, staged


def test_streaming_near_dedup_horizon_bounds_state(spark, tmp_path, sf_dir):
    """compact_every=1 + horizon_batches=1 on a 3-batch feed: each
    batch READS the previous 1 batch of shingle/band state (the
    read-side horizon), so batch 2 pairs with batch 1 but NOT with the
    aged-out batch 0 — exactly the twin's pair set restricted to batch
    distance ≤ 1 (the sf0.001 corpus has 9 distance-2 pairs, so the
    restriction is observable). Folds DROP one batch behind the read
    window (replay safety — code-review r18 #1), so state retains
    horizon+1 batches. Drops are reported durably per state dir; the
    emitted pair log is never bounded."""
    from pyspark.sql import functions as F

    from micmac_li3ds_spark.operators.llm_text import q_llm_near_dedup
    from micmac_li3ds_spark.streaming import jobs
    from micmac_li3ds_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    feed, staged = _incremental_feed(
        spark, tmp_path, docs, F.col("doc_id")
    )
    dirs = {
        "shingle_dir": str(tmp_path / "shingles"),
        "bands_dir": str(tmp_path / "bands"),
        "pairs_dir": str(tmp_path / "pairs"),
    }

    def drain():
        q = jobs.run_streaming_near_dedup(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(feed)),
            checkpoint=str(tmp_path / "ckpt"),
            compact_every=1,
            horizon_batches=1,
            **dirs,
        )
        q.awaitTermination(300)

    n_by_batch = {
        k: docs.filter(F.pmod("doc_id", F.lit(3)) == k).count()
        for k in range(3)
    }
    for k, src in enumerate(staged):
        os.link(src, feed / f"{k}.parquet")
        drain()

    twin = {
        (r["doc_a"], r["doc_b"], r["jac"])
        for r in q_llm_near_dedup(spark, sf_dir).collect()
    }
    want = {
        (a, b, j) for a, b, j in twin if abs(a % 3 - b % 3) <= 1
    }
    assert len(want) < len(twin)  # the horizon is observable
    got = {
        (r["doc_a"], r["doc_b"], r["jac"])
        for r in jobs.read_near_dedup_pairs(
            spark, dirs["pairs_dir"]
        ).collect()
    }
    assert got == want and len(want) > 0

    # matching state bounded to horizon+1 batches (the read window
    # plus the in-flight batch's replay needs): batches 1 and 2 remain
    surv = C.resolve_state(spark, dirs["shingle_dir"], jobs._SHINGLE_DDL)
    assert surv.count() == n_by_batch[1] + n_by_batch[2]
    band_docs = {
        r["doc_id"]
        for r in C.resolve_state(spark, dirs["bands_dir"], jobs._BANDS_DDL)
        .select("doc_id")
        .distinct()
        .collect()
    }
    twin_docs = {
        r["doc_id"]
        for r in docs.filter(F.pmod("doc_id", F.lit(3)).isin(1, 2))
        .select("doc_id")
        .collect()
    }
    assert band_docs == twin_docs

    # drops reported durably, never silently: batch 0 aged out at the
    # fold inside batch 2 (min_src = 2 - 1 = 1; one shingle row/doc)
    ret = C.read_retention(spark, dirs["shingle_dir"])
    assert ret["dropped_total"] == n_by_batch[0]
    assert ret["last"]["min_src_batch"] == 1
    assert C.read_retention(spark, dirs["bands_dir"])["dropped_total"] > 0
    # the emitted pair log is OUTPUT, not matching state: never bounded
    assert C.read_retention(spark, dirs["pairs_dir"]) is None

    # REPLAY SAFETY (code-review r18 #1): force a WAL replay of the
    # newest batch by deleting its checkpoint commit — the replay must
    # read the same window the original run read (read-side horizon)
    # and rewrite pairs/batch=2 IDENTICALLY, losing nothing
    commits = tmp_path / "ckpt" / "commits"
    newest = max(int(p.name) for p in commits.iterdir()
                 if p.name.isdigit())
    (commits / str(newest)).unlink()
    # the checksum sidecar too: a stale .crc makes the replayed
    # query's atomic commit rename fail as "concurrent query"
    crc = commits / f".{newest}.crc"
    if crc.exists():
        crc.unlink()
    drain()
    got_replayed = {
        (r["doc_a"], r["doc_b"], r["jac"])
        for r in jobs.read_near_dedup_pairs(
            spark, dirs["pairs_dir"]
        ).collect()
    }
    assert got_replayed == want


def test_streaming_semantic_dedup_horizon_bounds_state(
    spark, tmp_path, sf_dir
):
    """The SemDeDup twin of the test above: vector state folds to the
    contamination window with durable drop reporting. At sf0.001 every
    semantic pair is batch distance ≤ 1, so the emitted PAIR LOG still
    equals an unbounded run's — the horizon's cost is zero here BY
    MEASUREMENT, while the state bound is real (the keeper SNAPSHOT's
    universe legitimately shrinks to surviving state; pairs, being
    output, never do)."""
    from pyspark.sql import functions as F

    from micmac_li3ds_spark.functions.vector import as_double
    from micmac_li3ds_spark.operators.llm_vector import _emb
    from micmac_li3ds_spark.streaming import jobs
    from micmac_li3ds_spark.tables import load

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    feed, staged = _incremental_feed(
        spark, tmp_path, emb, F.col("vec_id")
    )
    centroids = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    dirs = {
        "vectors_dir": str(tmp_path / "vectors"),
        "pairs_dir": str(tmp_path / "pairs"),
    }

    def drain():
        q = jobs.run_streaming_semantic_dedup(
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(feed))
            .select("vec_id", as_double("embedding").alias("v")),
            centroids,
            checkpoint=str(tmp_path / "ckpt"),
            compact_every=1,
            horizon_batches=1,
            **dirs,
        )
        q.awaitTermination(300)

    n_by_batch = {
        k: emb.filter(F.pmod("vec_id", F.lit(3)) == k).count()
        for k in range(3)
    }
    for k, src in enumerate(staged):
        os.link(src, feed / f"{k}.parquet")
        drain()

    # unbounded control run over the same (now fully-linked) feed: its
    # pair log is pinned ≡ q_llm_semantic_dedup elsewhere; at this
    # corpus every pair is batch distance ≤ 1, so bounded == unbounded
    dirs2 = {
        "vectors_dir": str(tmp_path / "vectors2"),
        "pairs_dir": str(tmp_path / "pairs2"),
    }
    q = jobs.run_streaming_semantic_dedup(
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
        .select("vec_id", as_double("embedding").alias("v")),
        centroids,
        checkpoint=str(tmp_path / "ckpt_unbounded"),
        **dirs2,
    )
    q.awaitTermination(300)

    def pair_set(d):
        return {
            (r["doc_a"], r["doc_b"], r["cos"])
            for r in jobs.read_semantic_dedup_pairs(spark, d).collect()
        }

    got = pair_set(dirs["pairs_dir"])
    want = pair_set(dirs2["pairs_dir"])
    assert got == want and len(want) > 0

    surv = C.resolve_state(spark, dirs["vectors_dir"], jobs._SEM_VEC_DDL)
    assert surv.count() == n_by_batch[1] + n_by_batch[2]
    ret = C.read_retention(spark, dirs["vectors_dir"])
    assert ret["dropped_total"] == n_by_batch[0]
    assert C.read_retention(spark, dirs["pairs_dir"]) is None
