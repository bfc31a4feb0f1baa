"""Synthesize a deterministic 10x-scale corpus from sf0.1 for INTERNAL
timing A/Bs (r18 verdict item 5: "an sf1 extended capture would make
round-19 A/Bs far less steal-noise-bound").

The driver's testdata generator is not in this repo and /root/testdata
is read-only, so a true sf1 cannot be produced; this replicates sf0.1
10x with deterministic key offsets instead. Replication rules keep the
WORKLOAD SHAPE of every extended-group query intact:

* documents: every token gets a per-replica suffix (regexp_replace on
  non-space runs), so shingle sets never collide across replicas —
  near-dup/posting candidate structure is exactly 10 independent copies
  (no cross-replica pair explosion).
* part: p_name gets a 3-char per-replica suffix (> tau=2), so
  q_join_fuzzy gains no cross-replica pairs within edit distance 2.
* fact/dim keys (orders, lineitem, customer, supplier, part, events,
  embeddings) shift by replica x a power-of-ten offset wider than any
  base key, preserving joins within a replica and never colliding
  across replicas. region/nation are fixed reference dims (copied
  once): their keys appear unshifted in replicated FKs, which keeps
  every join's fan-out identical per replica.
* embeddings: vec_id shifts; vector values are kept identical across
  replicas (ANN shortlists tie-break on vec_id deterministically) —
  only replica 0 keeps the query vector id 0.

NOT an oracle corpus: results are not parity-checked here (DuckDB
brute-force oracles are quadratic in corpus size); this exists so
timing deltas on the expensive queries rise above this host's ambient
noise. Committed captures cite it as "sf1x-synth".

Usage: python tools/gen_scale_synth.py [--out /tmp/sf1x] [--replicas 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from micmac_li3ds_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
OFF = 100_000_000  # wider than any base key at sf0.1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1x")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()
    spark = get_spark("gen-sf1x", cpus=args.cpus, shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    def reps(df, build):
        return [build(df, k) for k in range(args.replicas)]

    def union_write(parts, name, n_files=8):
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(args.out, f"{name}.parquet")
        )
        print(f"{name}: written", flush=True)

    rd = lambda t: spark.read.parquet(f"{SRC}/{t}.parquet")  # noqa: E731

    # fixed reference dims — copied once
    for t in ("region", "nation"):
        rd(t).write.mode("overwrite").parquet(
            os.path.join(args.out, f"{t}.parquet")
        )
        print(f"{t}: copied", flush=True)

    k_off = lambda k: F.lit(k * OFF)  # noqa: E731

    union_write(
        reps(
            rd("customer"),
            lambda d, k: d.withColumn("c_custkey", F.col("c_custkey") + k_off(k)),
        ),
        "customer",
    )
    union_write(
        reps(
            rd("supplier"),
            lambda d, k: d.withColumn("s_suppkey", F.col("s_suppkey") + k_off(k)),
        ),
        "supplier",
    )
    union_write(
        reps(
            rd("part"),
            lambda d, k: d.withColumn("p_partkey", F.col("p_partkey") + k_off(k))
            .withColumn("p_name", F.concat("p_name", F.lit(f"~{k}{k}{k}"))),
        ),
        "part",
    )
    union_write(
        reps(
            rd("orders"),
            lambda d, k: d.withColumn("o_orderkey", F.col("o_orderkey") + k_off(k))
            .withColumn("o_custkey", F.col("o_custkey") + k_off(k)),
        ),
        "orders",
    )
    union_write(
        reps(
            rd("lineitem"),
            lambda d, k: d.withColumn("l_orderkey", F.col("l_orderkey") + k_off(k))
            .withColumn("l_partkey", F.col("l_partkey") + k_off(k))
            .withColumn("l_suppkey", F.col("l_suppkey") + k_off(k)),
        ),
        "lineitem",
        n_files=16,
    )
    ev = rd("events")
    id_cols = [c for c in ev.columns if c.endswith("_id") or c == "user_id"]

    def ev_rep(d, k):
        for c in id_cols:
            d = d.withColumn(c, F.col(c) + k_off(k))
        return d

    union_write(reps(ev, ev_rep), "events", n_files=16)
    union_write(
        reps(
            rd("documents"),
            lambda d, k: d.withColumn("doc_id", F.col("doc_id") + k_off(k))
            .withColumn(
                "text", F.regexp_replace("text", r"(\S+)", rf"$1~{k}")
            ),
        ),
        "documents",
    )
    union_write(
        reps(
            rd("embeddings"),
            lambda d, k: d.withColumn("vec_id", F.col("vec_id") + k_off(k)),
        ),
        "embeddings",
    )
    print("done:", args.out, flush=True)


if __name__ == "__main__":
    main()
