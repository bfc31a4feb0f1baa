"""Local oracle-parity checker — mirrors the driver's verify loop.

For every registered query: run the PySpark version and the DuckDB oracle
SQL over the same sf dir; compare row count, column-name set, and an
order-insensitive multiset of normalized row values. Exact equality is
the goal (the driver hashes values); floats are compared exactly first
and reported with max-abs-diff when they differ.

Usage:
    python tools/check.py [--sf /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from micmac_li3ds_spark import registry  # noqa: E402
from micmac_li3ds_spark.session import get_spark  # noqa: E402
from micmac_li3ds_spark.tables import TABLES  # noqa: E402


def _norm_value(v):
    # Numeric values are TYPE-TAGGED: the driver's canonicalizer
    # distinguishes 5 from 5.0 (cost q_win_range_frame/q_etl_sessionize a
    # red round via DuckDB epoch() returning DOUBLE), while Python's
    # Counter equality would silently treat them as equal. An int/float
    # disagreement between engines must FAIL here.
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        if v == 0.0:
            return ("f", 0.0)
        return ("f", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_value(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "asDict"):  # pyspark Row (struct)
        return tuple(sorted((k, _norm_value(x)) for k, x in v.asDict().items()))
    return v


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm_value(r[i]) for i in order) for r in rows)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def check_query(spark, con, name, q, sf_dir):
    from pyspark.sql.types import DecimalType

    t0 = time.time()
    sdf = q.fn(spark, sf_dir)
    s_rows = sdf.collect()
    s_cols = sdf.columns
    spark_sec = time.time() - t0
    # The driver's canonicalizer does NOT coerce Decimal→float (cost
    # q_agg_grouping_sets two red rounds), so a DecimalType output column
    # is a failure here even though _norm_value would mask it below.
    dec_cols = [
        f.name for f in sdf.schema.fields if isinstance(f.dataType, DecimalType)
    ]
    if dec_cols:
        return {
            "name": name,
            "status": "SPARK-DECIMAL",
            "rows": len(s_rows),
            "spark_sec": round(spark_sec, 2),
            "spark_cols": dec_cols,
        }
    if q.oracle is None:
        return {
            "name": name,
            "status": "rows-only",
            "rows": len(s_rows),
            "spark_sec": round(spark_sec, 2),
        }
    t0 = time.time()
    rel = con.sql(q.oracle)
    d_cols = rel.columns
    d_rows = rel.fetchall()
    duck_sec = time.time() - t0
    res = {
        "name": name,
        "rows": len(s_rows),
        "spark_sec": round(spark_sec, 2),
        "duck_sec": round(duck_sec, 2),
    }
    if sorted(s_cols) != sorted(d_cols):
        res["status"] = "SCHEMA-MISMATCH"
        res["spark_cols"] = sorted(s_cols)
        res["duck_cols"] = sorted(d_cols)
        return res
    if len(s_rows) != len(d_rows):
        res["status"] = "ROWCOUNT-MISMATCH"
        res["duck_rows"] = len(d_rows)
        return res
    ms = _rows_to_multiset(s_cols, s_rows)
    md = _rows_to_multiset(d_cols, d_rows)
    if ms == md:
        res["status"] = "OK"
        return res
    res["status"] = "VALUE-MISMATCH"
    only_s = ms - md
    only_d = md - ms
    res["n_diff"] = sum(only_s.values())
    res["sample_spark"] = next(iter(only_s), None)
    res["sample_duck"] = next(iter(only_d), None)
    # max abs diff over float positions for quick fp triage
    try:
        ss = sorted(only_s.elements())
        dd = sorted(only_d.elements())
        mx = 0.0
        def _f(x):
            return (
                x[1]
                if isinstance(x, tuple) and len(x) == 2 and x[0] == "f"
                and isinstance(x[1], float)
                else None
            )

        for rs, rd in zip(ss, dd):
            for a, b in zip(rs, rd):
                fa, fb = _f(a), _f(b)
                if fa is not None and fb is not None:
                    mx = max(mx, abs(fa - fb))
        res["max_float_diff"] = mx
    except Exception:
        pass
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    reg = registry.registry()
    names = args.queries or list(reg)
    unknown = [n for n in names if n not in reg]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)

    spark = get_spark("check")
    con = duck_connection(args.sf)
    failures = 0
    for name in names:
        r = check_query(spark, con, name, reg[name], args.sf)
        ok = r["status"] in ("OK", "rows-only")
        failures += 0 if ok else 1
        line = f"{r['status']:<18} {name:<28} rows={r.get('rows')}"
        if "spark_sec" in r:
            line += f" spark={r['spark_sec']}s"
        print(line)
        if not ok:
            for k in ("spark_cols", "duck_cols", "duck_rows", "n_diff",
                      "sample_spark", "sample_duck", "max_float_diff"):
                if k in r:
                    print(f"    {k}: {r[k]}")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
