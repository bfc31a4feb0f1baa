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

Unpersisting is always safe — it drops the materialization, never the
lineage.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_ACTIVE: list[DataFrame] = []
_DEPTH = 0


@contextmanager
def query_scope():
    """Mark one top-level query invocation. Reentrant: only the
    outermost entry releases the previous query's caches."""
    global _DEPTH
    if _DEPTH == 0:
        while _ACTIVE:
            _ACTIVE.pop().unpersist()
    _DEPTH += 1
    try:
        yield
    finally:
        _DEPTH -= 1


def scoped_cache(df: DataFrame) -> DataFrame:
    """Cache ``df`` until the next top-level registered query begins.

    Storage is Spark's DataFrame default (MEMORY_AND_DISK_DESER): a
    frame larger than executor storage spills to local disk instead of
    evicting or OOMing — the right posture for data-sized intermediates
    at scale; tiny ones stay in memory.
    """
    _ACTIVE.append(df)
    return df.cache()
