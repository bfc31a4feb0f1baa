"""Round-10 consolidation tests.

The round-9 verdict made round 10 a consolidation round: rewrite the
nearest-centroid argmin from a per-vector window to a map-side min_by
(item 2), parameterize the lsh_recall production posture (item 3), give
k-core a loop-until-stable variant (item 4), and land one REAL
multimodal decoder (item 5). Each change ships with the equivalence /
property tests demanded by the verdict's done-criteria.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# Verdict item 2: map-side min_by argmin ≡ the old row_number spelling
# ---------------------------------------------------------------------------


def test_min_by_argmin_bit_identical_to_window_spelling(spark):
    """The round-10 rewrite of nearest_centroid_assign (min_by over
    struct(dist, cid)) must pick bit-identical winners to the retired
    Window.partitionBy(vec_id).orderBy(dist, cid) row_number spelling —
    same argmin, same 6dp rounding, same centroid-id tiebreak. Mirrors
    the round-9 copurchase_edges equivalence precedent: prove the old
    and new builds equal BEFORE the re-attestation window is cut."""
    from micmac_li3ds_spark.operators.llm_vector import (
        _N_CENTROIDS,
        _emb,
        nearest_centroid_assign,
    )

    e = _emb(spark, SF_DIR)
    c = e.filter(F.col("vec_id") < _N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )

    new = nearest_centroid_assign(e, c, ("label",)).select(
        "vec_id", "label", "centroid_id", "dist"
    )

    # the retired spelling, reproduced verbatim
    dist = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with("v", "cv", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        6,
    )
    scored = e.crossJoin(F.broadcast(c)).select(
        "vec_id", "label", "cid", dist.alias("dist")
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    old = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "label", F.col("cid").alias("centroid_id"), "dist")
    )

    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0
    assert new.count() == e.count()  # one winner per vector, none dropped


# ---------------------------------------------------------------------------
# ADVICE r9: heavy-hitters exactness invariant must be validated
# ---------------------------------------------------------------------------


def test_heavy_hitters_rejects_undersized_sketch(spark):
    """q_agg_heavy_hitters' exactness rests on mg_capacity + 1 > phi_inv
    (the pigeonhole superset argument); an undersized sketch silently
    misses true heavy hitters, so the function must refuse it."""
    from micmac_li3ds_spark.operators.aggregates import q_agg_heavy_hitters

    with pytest.raises(ValueError, match="mg_capacity"):
        q_agg_heavy_hitters(spark, SF_DIR, phi_inv=10000, mg_capacity=4096)
    # boundary: m + 1 == phi_inv is still unsound
    with pytest.raises(ValueError, match="mg_capacity"):
        q_agg_heavy_hitters(spark, SF_DIR, phi_inv=4097, mg_capacity=4096)
    # minimal sound sketch builds a plan without error
    q_agg_heavy_hitters(spark, SF_DIR, phi_inv=4096, mg_capacity=4096)


# ---------------------------------------------------------------------------
# Verdict item 3 + ADVICE r9: lsh_recall production posture
# ---------------------------------------------------------------------------


def test_lsh_recall_sample_frac_is_deterministic_and_bounds_cost(spark):
    """sample_frac scopes the audit to a doc_id-hash sample: the slice
    is engine-reproducible (same rows on a re-run — xxhash64, not RNG),
    strictly smaller than the full audit (n_true drops, bounding cost),
    and recall over the slice stays 1.0 (both sides see the same docs,
    and the 32-band LSH still finds every surviving true pair)."""
    from micmac_li3ds_spark.operators.llm_text import q_llm_lsh_recall

    full = q_llm_lsh_recall(spark, SF_DIR).collect()[0]
    half1 = q_llm_lsh_recall(spark, SF_DIR, sample_frac=0.5).collect()[0]
    half2 = q_llm_lsh_recall(spark, SF_DIR, sample_frac=0.5).collect()[0]

    assert half1 == half2  # deterministic hash sample, no RNG
    assert half1["n_true"] < full["n_true"]  # the slice is a real subset
    assert half1["n_true"] > 0  # ...but not degenerate on this corpus
    assert half1["recall"] == 1.0
    assert full["recall"] == 1.0  # frac=1.0 path unchanged


def test_lsh_recall_dfcapped_docs_reporter(spark):
    """The no-silent-caps reporter for df_cap: at the shipped cap no doc
    loses ALL its shingles (zero rows); at df_cap=0 every shingle is
    over-cap, so every shingled doc is reported — exactly the docs the
    recall gauge would silently drop from both n_true and n_found."""
    from micmac_li3ds_spark.functions.text import shingles, tokens
    from micmac_li3ds_spark.operators.llm_text import lsh_recall_dfcapped_docs
    from micmac_li3ds_spark.tables import load

    assert lsh_recall_dfcapped_docs(spark, SF_DIR).count() == 0

    n_shingled = (
        load(spark, SF_DIR, "documents")
        .filter(F.size(tokens("text")) >= 3)
        .count()
    )
    capped = lsh_recall_dfcapped_docs(spark, SF_DIR, df_cap=0)
    assert capped.count() == n_shingled
