"""Per-query cache scope: materialize an intermediate once, release it
when the NEXT registered query starts.

Why this exists (r18 optimization round, guide §5 "Caching" + §7.2
"duplicated subtrees"): several operators reference one DataFrame from
two or more branches (a posting table consumed by a self-join's two
sides plus a per-doc stats aggregate, a span table consumed by a
document-frequency aggregate and the join back). Spark recomputes each
branch from the source — runtime exchange reuse was probed on this
build and does NOT collapse these subtrees (zero ReusedExchange nodes
in the executed plans) — so without materialization the base scan +
aggregation runs once per consumer.

Caching is NOT free and every site was A/B-measured (OPTIMIZATION_r18.md):
materializing a frame pays storage writes + an InMemoryTableScan per
consumer, and for cheap-to-recompute subtrees that LOSES (the r18
attempt to cache the prefix-scan windowed frame in
functions/selection.py regressed all six consumer queries by 1.2-2.1×
and was reverted). Use scoped_cache only where the recompute is
provably the expensive side.

A query function cannot unpersist its own caches: the returned DataFrame
is collected only after the function exits. llm_text historically solved
this with a module-local one-slot list (each scoped-cache call released
the previous), which breaks as soon as one query needs TWO caches or a
registered query composes another registered query. This module is the
shared, reentrant replacement:

- ``registry.register`` wraps every query fn in :func:`query_scope`;
  entering the OUTERMOST scope releases the previous query's caches, so
  a long-lived session (driver verify loop, bench, tools/check.py)
  carries at most one query's materializations.
- Nested registered calls (q_llm_dup_ratio_by_source →
  q_llm_near_dedup) share the outer scope via depth counting.
- ``scoped_cache(df)`` registers + caches; any number per query.
- ``scoped_release(fn)`` registers an arbitrary release callback (e.g.
  freeing a loop's localCheckpoint blocks) to run at the same point —
  but ONLY when a scope is active, because a localCheckpoint frame is
  unrecoverable once its blocks are dropped and a direct library caller
  may hold the frame indefinitely; outside a scope the caller owns the
  lifetime and ``scoped_release`` reports that by returning False.

Unpersisting a *cache* is always safe — it drops the materialization,
never the lineage. Release *callbacks* may be destructive (checkpoint
blocks cannot be replayed), which is why they only arm inside a scope.

Concurrency contract (r18 advice): scope state is module-global and
guarded by ``_LOCK`` so concurrent mutation cannot corrupt the lists,
but the SCOPING MODEL itself is single-threaded-driver — two driver
threads running registered queries concurrently would still release
each other's caches at top-level entry (harmless for correctness, the
lineage replays, but it defeats the materialization). Every entry point
in this repo (driver verify loop, bench.py, tools/check.py, pytest)
runs queries sequentially on one thread; keep it that way or move
_ACTIVE/_DEPTH into threading.local and give each thread its own scope.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Callable

from pyspark.sql import DataFrame

_LOCK = threading.RLock()
_ACTIVE: list[DataFrame] = []
_RELEASES: list[Callable[[], None]] = []
# One-slot pool for scoped_cache calls made OUTSIDE any query scope
# (library callers invoking operators directly — r18 advice: the
# previous module-local slot released the prior cache on every call, so
# direct long-lived usage must not accumulate): each depth-0 call
# releases the previous depth-0 caches *of the same call site pattern*,
# i.e. the whole pool, restoring the old bounded behavior.
_LIB: list[DataFrame] = []
_DEPTH = 0


def _drain() -> None:
    """Release the previous query's materializations + callbacks.
    Caller holds _LOCK."""
    while _ACTIVE:
        _ACTIVE.pop().unpersist()
    while _LIB:
        _LIB.pop().unpersist()
    while _RELEASES:
        _RELEASES.pop()()


@contextmanager
def query_scope():
    """Mark one top-level query invocation. Reentrant: only the
    outermost entry releases the previous query's caches."""
    global _DEPTH
    with _LOCK:
        if _DEPTH == 0:
            _drain()
        _DEPTH += 1
    try:
        yield
    finally:
        with _LOCK:
            _DEPTH -= 1


def scoped_cache(df: DataFrame) -> DataFrame:
    """Cache ``df`` until the next top-level registered query begins.

    Storage is Spark's DataFrame default (MEMORY_AND_DISK_DESER): a
    frame larger than executor storage spills to local disk instead of
    evicting or OOMing — the right posture for data-sized intermediates
    at scale; tiny ones stay in memory.

    Outside any query scope (direct library usage) the pool is
    one-generation: each call releases the caches of previous unscoped
    calls, so a long-lived session that never enters a registered query
    holds at most the current operator's materializations.
    """
    with _LOCK:
        if _DEPTH == 0:
            while _LIB:
                _LIB.pop().unpersist()
            _LIB.append(df)
        else:
            _ACTIVE.append(df)
    return df.cache()


def scoped_release(fn: Callable[[], None]) -> bool:
    """Run ``fn`` when the next top-level registered query begins.

    Returns True if the callback was registered (a scope is active),
    False otherwise — callers holding destructive releases (checkpoint
    block frees) must keep ownership when this returns False, because a
    direct library caller's frame has no collection deadline.
    """
    with _LOCK:
        if _DEPTH == 0:
            return False
        _RELEASES.append(fn)
        return True
