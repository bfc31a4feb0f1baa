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

Cost model at 100 TB: vertex-state DataFrames (node, label/rank) are
tiny relative to the edge data — 10⁹ nodes × 16 B ≈ 16 GB per round,
a seconds-long parallel write to object storage — so durability costs
one parquet round-trip per round while the dominant per-round cost
(the edge join) is unchanged. The fixpoint math is identical either
way, which is what the restart test asserts
(tests/test_round7_mining.py::test_cc_fixpoint_restarts_from_durable_state).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession


class DurableLoopState:
    """Parquet-backed per-iteration state with atomic round commit."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    def _round_path(self, k: int) -> str:
        return os.path.join(self.dir, f"round={k}")

    def _marker(self, k: int) -> str:
        return os.path.join(self.dir, f"_COMMIT_{k}")

    def latest_round(self) -> int | None:
        """Highest committed round number, or None if no round finished."""
        rounds = []
        for name in os.listdir(self.dir):
            m = re.fullmatch(r"_COMMIT_(\d+)", name)
            if m:
                rounds.append(int(m.group(1)))
        return max(rounds) if rounds else None

    def load(self, k: int) -> DataFrame:
        return self.spark.read.parquet(self._round_path(k))

    def save(self, df: DataFrame, k: int) -> DataFrame:
        """Persist round ``k``'s state and return the re-read DataFrame
        (lineage now roots at the parquet scan — O(1) plan depth, same
        effect as localCheckpoint but replayable from shared storage).
        Overwrite semantics make a retry of an uncommitted round safe."""
        path = self._round_path(k)
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        # commit AFTER the write completes: a crash before this line
        # leaves the round uncommitted and a restart redoes it
        open(self._marker(k), "w").close()
        return out
