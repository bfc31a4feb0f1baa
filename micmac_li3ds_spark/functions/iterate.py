"""Restartable driver-loop iteration state.

The three iterative fixpoints (pagerank_fixpoint converged mode,
cc_fixpoint / q_graph_cc, q_er_resolve's pointer-jumping CC) carry
per-round state on eager ``localCheckpoint``: O(1) plan depth, blocks
stored on executors, NOT replayable — if an executor holding checkpoint
blocks dies, the lineage that could recompute them has been truncated
by design, and on a real cluster the JOB fails and the loop restarts
from round 0. That is the correct default: rounds are minutes, loops
are O(log d) rounds, and local checkpoints are RAM/disk-local writes
with zero replication cost.

When rounds are expensive enough that restart-from-zero is not
acceptable, the escape hatch is DURABLE per-round state: a parquet
round-trip per iteration to shared storage. ``DurableLoopState``
implements it with the write-then-commit protocol:

  * round k writes ``<dir>/round=k`` (parquet, executor-parallel), then
    the driver creates the empty marker ``<dir>/_COMMIT_k``;
  * resume = read the highest committed round. A crash between write
    and commit leaves a dangling uncommitted directory that is simply
    overwritten on retry — markers make the commit atomic at the
    filesystem's create granularity, so a restarted driver can NEVER
    observe a half-written round (parquet _SUCCESS only covers the
    write side; the marker covers the loop's notion of "round done").

Every filesystem operation (mkdirs, marker create/list/delete, round
pruning) goes through Spark's Hadoop FileSystem API resolved FROM THE
STATE DIR'S OWN SCHEME, not through driver-local ``os``/``open`` calls.
This is what makes the durability claim true on the only deployments
where it matters: with an ``s3a://`` / ``hdfs://`` state dir, the
markers land NEXT TO the parquet data, so a driver restarted on a
different host sees exactly the committed rounds the dead driver wrote.
(The earlier implementation used POSIX calls for the markers — on
shared storage they would have landed on the old driver's local disk,
silently breaking resume-after-failover; flagged by round-8 advice.)

RETENTION: loops on 100-TB graphs run tens of rounds; keeping every
round's parquet forever turns 16 GB of vertex state into an unbounded
O(rounds) heap of dead files. ``retain`` (default 2) keeps the last k
COMMITTED rounds and prunes older ones after each commit — marker
first, then data, so a crash mid-prune can only leave an unreferenced
data directory (garbage, never a committed round with missing data).
Resume after pruning is proven by
tests/test_round7_mining.py::test_cc_fixpoint_restarts_from_durable_state
and the round-9 retention tests.

Cost model at 100 TB: vertex-state DataFrames (node, label/rank) are
tiny relative to the edge data — 10⁹ nodes × 16 B ≈ 16 GB per round,
a seconds-long parallel write to object storage — so durability costs
one parquet round-trip per round while the dominant per-round cost
(the edge join) is unchanged, and retention caps the storage footprint
at retain × one round's state.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def unpersist_local_checkpoint(df: DataFrame) -> None:
    """Free the executor blocks of a SUPERSEDED localCheckpoint'd frame
    deterministically (ADVICE r13 #3). ``DataFrame.unpersist()`` is a
    no-op here — checkpoint blocks belong to the internal RDD Spark
    materialized, not to the plan cache — so without this, every
    superseded round's blocks stay on executors until driver GC
    happens to collect the py4j references: storage grows linearly
    with convergence rounds on large graphs. The analyzed plan of a
    localCheckpoint result IS the ``LogicalRDD`` wrapping the persisted
    internal RDD; unpersist that RDD directly (non-blocking — the
    caller has already materialized its successor, so the blocks are
    garbage the moment this returns).

    Only ever call this on a frame the loop has REPLACED: a local
    checkpoint's lineage is truncated by design, so its blocks cannot
    be recomputed after unpersisting.

    Best-effort by contract: if a Spark upgrade changes the plan shape
    the reflection expects, the loop must still converge — driver GC
    remains the (slower) backstop, exactly the pre-fix behavior.

    r18: walks the analyzed plan and unpersists EVERY ``LogicalRDD``
    it reaches, instead of assuming the root node is one. cc_fixpoint
    now returns a two-column projection OVER its final checkpoint (the
    checkpoint itself carries the loop-internal ``_chg`` column), so
    the checkpointed RDD sits one Project below the root; the walk
    frees it either way. Still only call this on frames whose
    checkpoints the caller exclusively owns."""
    try:
        stack = [df._jdf.queryExecution().analyzed()]
        while stack:
            node = stack.pop()
            if node.nodeName() == "LogicalRDD":
                node.rdd().unpersist(False)
            else:
                for i in range(node.children().size()):
                    stack.append(node.children().apply(i))
    except Exception:
        pass  # plan shape changed under us: fall back to driver GC


class DurableLoopState:
    """Parquet-backed per-iteration state with atomic round commit and
    bounded retention, on any Hadoop-visible filesystem."""

    def __init__(
        self, spark: SparkSession, state_dir: str, retain: int = 2
    ):
        if retain < 1:
            raise ValueError("retain must be >= 1 (the resume round)")
        self.spark = spark
        self.dir = state_dir
        self.retain = retain
        sc = spark.sparkContext
        self._jvm = sc._jvm
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        # resolve the FileSystem from the state dir's own scheme
        # (s3a://, hdfs://, file://, a bare local path, ...) so marker
        # ops hit the SAME store as the parquet writes
        self._fs = self._Path(state_dir).getFileSystem(
            sc._jsc.hadoopConfiguration()
        )
        self._fs.mkdirs(self._Path(state_dir))

    def _round_path(self, k: int) -> str:
        return f"{self.dir.rstrip('/')}/round={k}"

    def _marker_path(self, k: int):
        return self._Path(f"{self.dir.rstrip('/')}/_COMMIT_{k}")

    def committed_rounds(self) -> list[int]:
        """All committed round numbers, ascending (via Hadoop listStatus
        on the state dir — works on object storage, unlike listdir)."""
        rounds = []
        for st in self._fs.listStatus(self._Path(self.dir)):
            m = re.fullmatch(r"_COMMIT_(\d+)", st.getPath().getName())
            if m:
                rounds.append(int(m.group(1)))
        return sorted(rounds)

    def latest_round(self) -> int | None:
        """Highest committed round number, or None if no round finished."""
        rounds = self.committed_rounds()
        return rounds[-1] if rounds else None

    def load(self, k: int) -> DataFrame:
        return self.spark.read.parquet(self._round_path(k))

    def save(self, df: DataFrame, k: int) -> DataFrame:
        """Persist round ``k``'s state and return the re-read DataFrame
        (lineage now roots at the parquet scan — O(1) plan depth, same
        effect as localCheckpoint but replayable from shared storage).
        Overwrite semantics make a retry of an uncommitted round safe.
        After the commit, rounds older than the ``retain`` newest are
        pruned."""
        path = self._round_path(k)
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        # commit AFTER the write completes: a crash before this line
        # leaves the round uncommitted and a restart redoes it
        self._fs.create(self._marker_path(k), True).close()
        self._prune()
        return out

    def _prune(self) -> None:
        """Drop all but the ``retain`` newest committed rounds. Marker
        is deleted BEFORE its data dir: a crash between the two deletes
        leaves orphan data (swept below), never a marker pointing at
        missing data."""
        committed = self.committed_rounds()
        for k in committed[: -self.retain]:
            self._fs.delete(self._marker_path(k), False)
            self._fs.delete(self._Path(self._round_path(k)), True)
        # orphan sweep (ADVICE r9): a crash BETWEEN the marker delete
        # and the data delete above leaves a markerless round=k dir
        # that committed_rounds() never lists, so the loop above never
        # revisits it — it would sit below the retention horizon
        # forever and the "retain × one round" footprint bound would
        # be false after such a crash on object storage. Sweep every
        # markerless round=k dir BELOW the oldest retained committed
        # round; dirs at or above that horizon are left alone (they
        # may be the current round's in-flight uncommitted write).
        keep = committed[-self.retain :]
        if keep:
            horizon = keep[0]
            for st in self._fs.listStatus(self._Path(self.dir)):
                m = re.fullmatch(r"round=(\d+)", st.getPath().getName())
                if (
                    m
                    and int(m.group(1)) < horizon
                    and not self._fs.exists(self._marker_path(int(m.group(1))))
                ):
                    self._fs.delete(st.getPath(), True)
