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
