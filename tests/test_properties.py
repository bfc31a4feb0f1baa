"""Property-based tests (hypothesis) for the custom operators whose
semantics Spark doesn't provide natively — the union+window as-of join
and the LSH pair expansion — checked against brute-force Python oracles
on arbitrary generated inputs (SURVEY.md §5.2: operator unit tests on
literal DataFrames with nulls/ties/boundaries, here randomized)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# One event: (event_id unique, user_id small domain to force collisions,
# kind, t small int domain to force ts ties — the hard case)
events_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),  # user_id
        st.sampled_from(["click", "purchase"]),
        st.integers(0, 8),  # t (coarse timestamps → many ties)
    ),
    min_size=0,
    max_size=30,
)


def brute_asof(rows):
    """For each purchase: latest click of same user with (t, event_id)
    strictly before (t, event_id) of the purchase; ties → larger id wins."""
    out = {}
    for pid, (pu, pk, pt) in enumerate(rows):
        if pk != "purchase":
            continue
        best = None
        for cid, (cu, ck, ct) in enumerate(rows):
            if ck == "click" and cu == pu and (ct, cid) < (pt, pid):
                if best is None or (ct, cid) > best:
                    best = (ct, cid)
        out[pid] = best[1] if best else None
    return out


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy)
def test_asof_union_window_matches_bruteforce(spark, rows):
    df = spark.createDataFrame(
        [(i, u, k, t) for i, (u, k, t) in enumerate(rows)] or [(None, None, None, None)],
        "event_id long, user_id long, kind string, t long",
    ).filter(F.col("event_id").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_id = F.when(F.col("kind") == "click", F.col("event_id"))
    got = {
        r["event_id"]: r["last_click_id"]
        for r in (
            df.withColumn("last_click_id", F.last(click_id, ignorenulls=True).over(w))
            .filter(F.col("kind") == "purchase")
            .collect()
        )
    }
    assert got == brute_asof(rows)


pair_ids = st.lists(st.integers(0, 50), min_size=0, max_size=12, unique=True)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(pair_ids, min_size=1, max_size=4))
def test_bucket_pair_expansion_matches_bruteforce(spark, buckets):
    """The in-array pair expansion used by q_llm_near_dedup must emit
    exactly the a<b pairs of each bucket (then distinct across buckets)."""
    df = spark.createDataFrame(
        [(i, ids) for i, ids in enumerate(buckets)],
        "bucket long, raw array<long>",
    ).select("bucket", F.array_sort("raw").alias("ids"))
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    got = {
        (r["p"]["a"], r["p"]["b"])
        for r in df.filter(F.size("ids") > 1)
        .select(F.explode(pair_structs).alias("p"))
        .distinct()
        .collect()
    }
    want = {
        (a, b)
        for ids in buckets
        for a in ids
        for b in ids
        if a < b
    }
    assert got == want
