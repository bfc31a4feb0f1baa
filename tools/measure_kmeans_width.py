"""Measure q_llm_kmeans_step's grouping-key-width tradeoff (r11
verdict item 4). Outcome recorded in SCALE.md §20; the winner
(rejoin) ships as q_llm_kmeans_step since round 12.

Variant A ("wide", shipped r11, retired r12): the 64-double member
vector rides the packed-key argmin groupBy as an extra grouping
column — ONE exchange of n wide rows (~536 B/row: vec_id + okey/dist
partials + v), but an UnsafeRow ARRAY hash/equality on every scored
row map-side.

Variant B ("rejoin", shipped r12): the argmin groupBy carries only
vec_id (~16 B/row), then the assignment joins back to the embeddings
on vec_id — a narrow exchange PLUS a shuffle join whose build side
re-shuffles the same n wide rows the wide groupBy would have carried
(broadcast is disabled here to measure the at-scale shape: at 100 TB
the n-row assignment is nowhere near broadcastable).

Both variants feed the identical downstream (posexplode → per-(cid,
dim) mean → quantize → pack) and must return identical results; the
script asserts that, times min-of-N wall for each, and prints one
JSON line for SCALE.md.

Usage: python tools/measure_kmeans_width.py [--sf DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from micmac_li3ds_spark.operators.llm_vector import (  # noqa: E402
    _N_CENTROIDS,
    _emb,
    nearest_centroid_assign,
)
from micmac_li3ds_spark.session import get_spark  # noqa: E402


def _downstream(assigned):
    """The shared tail of q_llm_kmeans_step: per-(cid, dim) mean,
    1e-4 quantization, packed centroid string + member counts."""
    dims = assigned.select("cid", F.posexplode("v").alias("i", "x"))
    comp = dims.groupBy("cid", "i").agg(
        F.round(F.avg("x") * 10000).cast("long").alias("q")
    )
    members = assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    cent = comp.groupBy("cid").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "q"))),
                lambda s: s.getField("q").cast("string"),
            ),
            ",",
        ).alias("centroid_q")
    )
    return cent.join(members, "cid").select(
        F.col("cid").alias("centroid_id"), "n_members", "centroid_q"
    )


def variant_wide(spark, sf_dir):
    e = _emb(spark, sf_dir)
    c = e.filter(F.col("vec_id") < _N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    assigned = nearest_centroid_assign(
        e, c, ("v",), n_centroids=_N_CENTROIDS
    ).select("vec_id", "v", F.col("centroid_id").alias("cid"))
    return _downstream(assigned)


def variant_rejoin(spark, sf_dir):
    e = _emb(spark, sf_dir)
    c = e.filter(F.col("vec_id") < _N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    narrow = nearest_centroid_assign(e, c, n_centroids=_N_CENTROIDS).select(
        "vec_id", F.col("centroid_id").alias("cid")
    )
    # hint away the broadcast the tiny local corpus would pick so the
    # measured plan is the at-scale one: a shuffle join on vec_id
    assigned = narrow.hint("shuffle_hash").join(
        e.select("vec_id", "v"), "vec_id"
    )
    return _downstream(assigned)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark()
    # warm up the JVM + parquet footer caches on an unrelated action
    _emb(spark, args.sf).count()

    results = {}
    rows = {}
    for name, build in (("wide", variant_wide), ("rejoin", variant_rejoin)):
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.monotonic()
            rows[name] = sorted(
                (r["centroid_id"], r["n_members"], r["centroid_q"])
                for r in build(spark, args.sf).collect()
            )
            best = min(best, time.monotonic() - t0)
        results[name] = round(best, 3)
        plan = build(spark, args.sf)._jdf.queryExecution().executedPlan().toString()
        results[f"{name}_exchanges"] = plan.count("Exchange")

    assert rows["wide"] == rows["rejoin"], "variants must agree bit-exactly"
    n = _emb(spark, args.sf).count()
    print(
        json.dumps(
            {
                "sf_dir": args.sf,
                "n_vectors": n,
                "runs": args.runs,
                "timing": "min_of_n_sec",
                **results,
                "loadavg": os.getloadavg(),
            }
        )
    )


if __name__ == "__main__":
    main()
