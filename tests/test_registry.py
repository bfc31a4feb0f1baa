"""Registry-ordering and driver-contract invariants.

The driver's CORRECTNESS pass checks only the first ``DRIVER_WINDOW``
entries of ``queries()`` (observed in round 1: exactly the first 50
registry entries got a row). These tests pin the properties that make
that window worth its slots:

* every windowed query has a full value-hash oracle (a no-oracle entry
  would waste a slot on a weaker rows-only check);
* the priority list contains no typos (every name is registered);
* no oracle-backed query emits array/map-typed columns — the driver's
  pandas canonicalizer crashes on list cells (CORRECTNESS_r01:
  ``TypeError: unhashable type: 'list'`` for q_agg_collect, q_fn_string,
  q_fn_array, q_fn_map). Complex outputs must be serialized to strings
  on both engine and oracle sides.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, DecimalType, MapType

from micmac_li3ds_spark import registry as R


def test_readme_counts_match_registry():
    """README's coverage claim must be derived from the registry, not
    hand-maintained (it drifted in round 1)."""
    import os
    import re

    readme = open(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "README.md")
    ).read()
    m = re.search(r"(\d+) registered\s*\nqueries \((\d+) with full", readme)
    assert m, "README coverage sentence not found"
    regs = R.registry()
    assert int(m.group(1)) == len(regs)
    assert int(m.group(2)) == sum(1 for q in regs.values() if q.oracle)


def test_priority_names_all_registered():
    regs = R.registry()
    missing = [n for n in R._PRIORITY if n not in regs]
    assert not missing, f"priority list has unregistered names: {missing}"


def test_priority_fills_driver_window_exactly():
    assert len(R._PRIORITY) == R.DRIVER_WINDOW
    names = list(R.all_queries())
    assert names[: R.DRIVER_WINDOW] == R._PRIORITY


def test_windowed_queries_all_have_oracles():
    regs = R.registry()
    no_oracle = [n for n in R._PRIORITY if regs[n].oracle is None]
    assert not no_oracle, f"windowed queries without oracles: {no_oracle}"


def test_ordering_preserves_full_registry():
    # Reordering must not drop or duplicate anything.
    regs = R.registry()
    assert len(regs) == len(set(regs))
    assert set(regs) == set(R.all_queries())


@pytest.mark.parametrize(
    "name", sorted(n for n, q in R.registry().items() if q.oracle is not None)
)
def test_no_complex_or_decimal_output_columns(spark, sf_dir, name):
    """Oracle-backed queries must not emit array/map columns (driver
    canonicalizer crashes on list cells) NOR DecimalType columns (the
    driver hashes Python Decimal objects differently from the oracle's
    float64 — cost q_agg_grouping_sets two red rounds; a SQL literal
    like `/ 100.0` silently makes the whole expression DECIMAL).
    Schema check only — no execution."""
    df = R.get(name).fn(spark, sf_dir)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, DecimalType))
    ]
    assert not bad, (
        f"{name} emits complex/decimal columns {bad}; serialize arrays to "
        f"string, CAST decimal arithmetic AS DOUBLE"
    )


@pytest.mark.parametrize(
    "name", sorted(n for n, q in R.registry().items() if q.oracle is not None)
)
def test_oracle_output_has_no_hugeint(duck, name):
    """DuckDB SUM(integer) returns HUGEINT, which fetchdf() converts to
    float64 while Spark emits int64 — a guaranteed driver hash mismatch
    (cost q_llm_train_split and q_llm_seq_pack red rows in round 2, and
    q_agg_cube in round 1). Every oracle integer-SUM must be wrapped in
    CAST(... AS BIGINT). Checked directly on the oracle's output types
    without fetching any rows (duckdb relations bind lazily)."""
    rel = duck.sql(R.get(name).oracle)
    bad = [
        c for c, t in zip(rel.columns, rel.types) if str(t) in ("HUGEINT", "INT128")
    ]
    assert not bad, (
        f"{name} oracle emits HUGEINT columns {bad}; wrap the SUM in "
        f"CAST(... AS BIGINT)"
    )


@pytest.mark.parametrize(
    "name",
    [
        # queries with session/filesystem side effects: caches, temp
        # views, temp SQL functions, scratch sinks, Derby tables,
        # registered python data sources, iterative driver loops
        "q_jdbc_roundtrip",
        "q_sink_parquet_partitioned",
        "q_sink_orc_roundtrip",
        "q_llm_near_dedup",
        "q_llm_dedup_clusters",
        "q_llm_ngram_jaccard",
        "q_llm_decontaminate",
        "q_udf_sql",
        "q_join_lateral",
        "q_scan_python_datasource",
        "q_agg_grouping_sets",
        "q_sink_csv_roundtrip",
        "q_sink_json_roundtrip",
        "q_audit_small_files",
    ],
)
def test_side_effectful_queries_are_rerun_idempotent(spark, sf_dir, name):
    """Running a query twice in one session must return identical rows —
    leftover caches, temp objects, scratch files, or Derby state from
    the first run must not leak into the second (the driver runs many
    queries through one session)."""
    fn = R.get(name).fn
    first = sorted(map(tuple, fn(spark, sf_dir).collect()))
    second = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert first == second


def test_every_registered_query_has_oracle():
    """Global invariant since round 6: no rows-only keys anywhere —
    every registered query is value-hash checkable. A new query landing
    without an oracle fails here, not as a wasted driver slot."""
    regs = R.registry()
    no_oracle = [n for n, q in regs.items() if q.oracle is None]
    assert not no_oracle, f"queries without oracles: {no_oracle}"


def test_timing_artifact_clean():
    """The newest committed TIMING_r*.json (tools/timing_audit.py --json,
    the per-round cost gate) must record zero errors and zero
    >2x regressions vs its own baseline: a legitimate slowdown is
    committed WITH a ledger note and a fresh artifact, never silently."""
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = glob.glob(os.path.join(repo, "TIMING_r*.json"))
    assert arts, "no TIMING_r*.json committed — run tools/timing_audit.py"
    newest = max(
        arts, key=lambda p: int(re.search(r"_r(\d+)", p).group(1))
    )
    d = json.load(open(newest))
    assert d["errors"] == {}, d["errors"]
    assert d["regressions"] == {}, d["regressions"]
    # the artifact must cover the registry of its day (tolerate queries
    # registered after the audit ran in the same round)
    assert d["n_queries"] >= 200


def _latest_attestations():
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest = {}
    max_round = 0
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)", f).group(1))
        max_round = max(max_round, rnd)
        for k in json.load(open(f)):
            latest[k] = rnd
    return latest, max_round


def test_window_contains_every_never_attested_query():
    """Birth-round attestation, mechanized: a registered query with NO
    driver CORRECTNESS row yet must occupy a window slot — this is the
    invariant whose absence let six round-8 additions silently drop
    out of the window when a killed shell ate the list edits.

    One mechanized exception (round 15, codifying the round-6→7
    precedent): a key registered AFTER its round's window froze
    arithmetic-full may sit out exactly ONE round, by declaring itself
    in registry.POST_FREEZE_LEDGER with the round being built. The
    grace expires the moment that round's CORRECTNESS file lands —
    from then on this test fails until the key takes a window slot,
    the same forcing-function shape as the staleness test below
    (never-attested keys never enter ``latest``, so that test can
    never force them; this one must)."""
    latest, max_round = _latest_attestations()
    missing = [
        n
        for n in R.registry()
        if n not in latest
        and n not in R._PRIORITY
        and R.POST_FREEZE_LEDGER.get(n) != max_round + 1
    ]
    assert not missing, f"never-attested queries outside the window: {missing}"


def test_window_contains_every_stale_attestation():
    """Oldest-first rotation, mechanized: any query whose newest driver
    row is ≥ 4 rounds behind the newest committed CORRECTNESS round
    must be in the current window. Tightened from −5 in round 9 (r8
    verdict): at −5 the invariant only tripped AFTER the breaching
    CORRECTNESS file landed — one round too late to shape the window
    it polices. At −4 the keys that WOULD become 5 rounds stale next
    round are forced into the window while the previous round's file
    is still the newest — proactive, not post-hoc."""
    latest, max_round = _latest_attestations()
    stale = [
        n
        for n, rnd in latest.items()
        if rnd <= max_round - 4 and n in R.registry()
    ]
    out = [n for n in stale if n not in R._PRIORITY]
    assert not out, f"stale-attested queries left out of the window: {out}"
