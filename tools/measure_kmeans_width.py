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


def _fixpoint_variant(spark, sf_dir, k_iter, rejoin):
    """kmeans_fixpoint's exact-integer recurrence with either
    assignment spelling — the r14 ledger measurement (SCALE.md §20):
    the rejoin re-joins the IDENTICAL e.select(vec_id, vq) exchange
    every iteration, which ReusedExchange can share across all k_iter
    iterations, while the wide groupBy re-shuffles wide rows per
    iteration (its ordering key changes with the centroids)."""
    from micmac_li3ds_spark.operators.llm_vector import (
        _KM_B,
        _N_CENTROIDS,
        _emb,
    )

    e = _emb(spark, sf_dir).select(
        "vec_id",
        F.transform("v", lambda x: F.round(x * 10000).cast("long")).alias(
            "vq"
        ),
    )
    comp = (
        e.filter(F.col("vec_id") < _N_CENTROIDS)
        .select(
            F.col("vec_id").alias("cid"), F.posexplode("vq").alias("i0", "q")
        )
        .select("cid", (F.col("i0") + 1).alias("i"), "q")
    )
    assigned = None
    for _ in range(k_iter):
        cent = comp.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "q"))),
                lambda s: s.getField("q"),
            ).alias("cq")
        )
        d2 = F.aggregate(
            F.zip_with("vq", "cq", lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        if rejoin:
            narrow = nearest_centroid_assign(
                e, cent, n_centroids=_N_CENTROIDS, int_dist=d2
            ).select("vec_id", F.col("centroid_id").alias("cid"))
            assigned = narrow.hint("shuffle_hash").join(
                e.select("vec_id", "vq"), "vec_id"
            )
        else:
            assigned = nearest_centroid_assign(
                e, cent, ("vq",), n_centroids=_N_CENTROIDS, int_dist=d2
            ).select("vec_id", "vq", F.col("centroid_id").alias("cid"))
        comp = (
            assigned.select("cid", F.posexplode("vq").alias("i0", "x"))
            .select("cid", (F.col("i0") + 1).alias("i"), "x")
            .groupBy("cid", "i")
            .agg(
                F.expr(
                    f"(2 * (sum(x) + {_KM_B} * count(*)) + count(*))"
                    f" div (2 * count(*)) - {_KM_B}"
                ).alias("q")
            )
        )
    members = assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    cent_str = comp.groupBy("cid").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "q"))),
                lambda s: s.getField("q").cast("string"),
            ),
            ",",
        ).alias("centroid_q")
    )
    return cent_str.join(members, "cid").select(
        F.col("cid").alias("centroid_id"), "n_members", "centroid_q"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--fixpoint",
        type=int,
        default=0,
        metavar="K",
        help="measure the k-iteration fixpoint pair instead of the step",
    )
    args = ap.parse_args()

    spark = get_spark()
    # warm up the JVM + parquet footer caches on an unrelated action
    _emb(spark, args.sf).count()

    if args.fixpoint:
        k = args.fixpoint
        variants = (
            ("wide", lambda s, d: _fixpoint_variant(s, d, k, False)),
            ("rejoin", lambda s, d: _fixpoint_variant(s, d, k, True)),
        )
    else:
        variants = (("wide", variant_wide), ("rejoin", variant_rejoin))

    results = {}
    rows = {}
    for name, build in variants:
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
        results[f"{name}_reused"] = plan.count("ReusedExchange")

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
