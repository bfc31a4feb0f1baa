"""Oracle-parity regression: every registered query with an oracle must
hash-match DuckDB at sf0.001 (the driver runs the same comparison at
sf0.01 — tools/check.py covers that scale ad hoc)."""

from __future__ import annotations

import pytest

from micmac_li3ds_spark import registry


def _query_names():
    return sorted(registry.registry())


@pytest.mark.parametrize("name", _query_names())
def test_query_parity(spark, duck, sf_dir, name):
    from tools.check import check_query

    q = registry.registry()[name]
    res = check_query(spark, duck, name, q, sf_dir)
    assert res["status"] in ("OK", "rows-only"), res
    if res["status"] == "rows-only":
        # weaker check: must at least produce a well-formed result
        assert res["rows"] >= 0
    # Non-vacuity: 0 = 0 parity proves nothing, and a corpus
    # regeneration that empties a value-dependent filter (the round-4
    # failure class) would otherwise pass silently. Every registered
    # query returns rows on every shipped corpus generation — keep it
    # that way or re-base the query's constants. Two queries are
    # allowlisted: their selective filters legitimately drain below
    # sf0.01 (both verified non-empty at the driver's SF).
    if name not in ("q_nation_trade_volume", "q_subquery_corr_agg"):
        assert res["rows"] > 0, f"{name} became vacuous on this corpus"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_contract_shapes():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 7
