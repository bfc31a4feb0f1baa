"""Spark-side timing audit — find hidden scale warts before they bite.

Runs every registered query's Spark side (no oracle) at the given sf dir
and prints a per-query wall-clock ranking. The round-7 motivation: a
query can be driver-green for five rounds while hiding a quadratic
candidate explosion that only shows at 10× scale (q_join_range matched
~500M pairs and took 69 s at sf0.1 while passing every correctness
check). This audit makes cost visible where correctness checks cannot.

Usage:
    python tools/timing_audit.py [--sf /root/testdata/sf0.1] [--top 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from micmac_li3ds_spark import registry  # noqa: E402
from micmac_li3ds_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    spark = get_spark("timing-audit", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    regs = registry.registry()
    names = args.queries or list(regs)

    timings: list[tuple[float, str, int | str]] = []
    for name in names:
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            n = len(regs[name].fn(spark, args.sf).collect())
        except Exception as exc:  # keep auditing the rest
            timings.append((time.time() - t0, name, f"ERR {exc}"[:60]))
            continue
        timings.append((time.time() - t0, name, n))
        print(f"{time.time() - t0:8.2f}s  {name:36s} rows={n}", flush=True)

    print("\n=== slowest ===")
    for sec, name, n in sorted(timings, reverse=True)[: args.top]:
        print(f"{sec:8.2f}s  {name:36s} rows={n}")
    total = sum(t for t, _, _ in timings)
    print(f"\ntotal {total:.1f}s over {len(timings)} queries")
    spark.stop()


if __name__ == "__main__":
    main()
