"""Semantic tests for the round-7 mining batch, beyond oracle parity:
prefix-scan correctness at scale shape (no global windows), Pareto
classification algebra, skyline dominance, transition-matrix row
normalization, cohort-LTV conservation, and interpolation bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from micmac_li3ds_spark import registry
from micmac_li3ds_spark.functions.selection import with_global_prefix
from micmac_li3ds_spark.tables import load
from tests.conftest import SF_DIR


def _q(spark, name):
    return registry.get(name).fn(spark, SF_DIR)


# ---------------------------------------------------------------- helper


def test_with_global_prefix_matches_global_window(spark):
    """The range-partitioned prefix scan must equal the (small-data)
    global-window truth for sum, rank, and strict min."""
    df = spark.range(0, 500).select(
        (F.col("id") * 37 % 101).alias("v"), F.col("id").alias("k")
    )
    got = (
        with_global_prefix(
            df,
            [F.col("v").asc(), F.col("k").asc()],
            "v",
            agg="sum",
            out="cum",
            rank_out="rk",
        )
        .orderBy("rk")
        .collect()
    )
    rows = sorted((r["v"], r["k"]) for r in df.collect())
    cum = 0
    for i, (v, k) in enumerate(rows, start=1):
        cum += v
        assert got[i - 1]["cum"] == cum
        assert got[i - 1]["rk"] == i
        assert (got[i - 1]["v"], got[i - 1]["k"]) == (v, k)


def test_with_global_prefix_strict_min(spark):
    df = spark.range(0, 300).select(
        F.col("id").alias("k"), ((F.col("id") * 17) % 59).alias("s")
    )
    got = {
        r["k"]: r["pm"]
        for r in with_global_prefix(
            df, [F.col("k").asc()], "s", agg="min", inclusive=False, out="pm"
        ).collect()
    }
    rows = sorted((r["k"], r["s"]) for r in df.collect())
    run = None
    for k, s in rows:
        assert got[k] == run
        run = s if run is None else min(run, s)


# ------------------------------------------------------------ ABC / Gini


def test_abc_partitions_all_parts(spark):
    out = {r["abc_class"]: r for r in _q(spark, "q_abc_pareto").collect()}
    n_parts = (
        load(spark, SF_DIR, "lineitem").select("l_partkey").distinct().count()
    )
    assert sum(r["n_parts"] for r in out.values()) == n_parts
    # class A's revenue share is ≤ 80% plus at most one part's revenue
    # (the boundary part), and per-part revenue density must be
    # monotone A ≥ B ≥ C — the defining Pareto property.
    tot = sum(r["class_revenue"] for r in out.values())
    if "A" in out and "B" in out:
        dens = {
            c: out[c]["class_revenue"] / out[c]["n_parts"]
            for c in out
        }
        assert dens["A"] >= dens["B"]
        if "C" in out:
            assert dens["B"] >= dens["C"]
        # the A boundary overshoots 80 % by at most one part's revenue
        li = load(spark, SF_DIR, "lineitem")
        top_part = (
            li.groupBy("l_partkey")
            .agg(
                (
                    F.sum(
                        F.round(F.col("l_extendedprice") * 100).cast("long")
                        * (
                            100
                            - F.round(F.col("l_discount") * 100).cast("long")
                        )
                    )
                    / 10000.0
                ).alias("r")
            )
            .agg(F.max("r"))
            .collect()[0][0]
        )
        assert out["A"]["class_revenue"] <= 0.8 * tot + top_part + 1e-6


def test_gini_in_unit_interval(spark):
    row = _q(spark, "q_agg_gini").collect()[0]
    assert 0.0 <= row["gini"] < 1.0
    assert row["n_customers"] > 0 and row["total_spend"] > 0


# ------------------------------------------------------------ transitions


def test_transition_rows_normalize(spark):
    out = _q(spark, "q_event_transitions").collect()
    by_prev = {}
    for r in out:
        by_prev.setdefault(r["prev_type"], []).append(r)
    for prev, rows in by_prev.items():
        assert abs(sum(r["p"] for r in rows) - 1.0) < 1e-4, prev
    # total transitions = total events − one per user (each user's
    # sequence head has no predecessor)
    ev = load(spark, SF_DIR, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n_transitions"] for r in out) == n_events - n_users


# ------------------------------------------------------------- cohort LTV


def test_cohort_ltv_conserves_revenue(spark):
    out = _q(spark, "q_event_cohort_ltv")
    ev = load(spark, SF_DIR, "events").filter(
        F.col("event_type") == "purchase"
    )
    total = ev.agg(
        (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("t")
    ).collect()[0]["t"]
    got = out.agg(F.sum("revenue").alias("t")).collect()[0]["t"]
    assert abs(got - total) < 1e-6
    assert out.filter(F.col("month_offset") < 0).count() == 0


# ---------------------------------------------------------------- skyline


def test_skyline_dominance(spark):
    sky = _q(spark, "q_skyline").collect()
    pts = [(round(r["p_retailprice"] * 100), r["p_size"]) for r in sky]
    # no skyline point strictly dominates another skyline point
    for a in pts:
        for b in pts:
            if a != b:
                assert not (
                    a[0] <= b[0]
                    and a[1] <= b[1]
                    and (a[0] < b[0] or a[1] < b[1])
                ), (a, b)
    # every part is dominated-or-equal by some skyline point
    parts = [
        (round(r["p_retailprice"] * 100), r["p_size"])
        for r in load(spark, SF_DIR, "part")
        .select("p_retailprice", "p_size")
        .collect()
    ]
    for p in parts:
        assert any(s[0] <= p[0] and s[1] <= p[1] for s in pts), p


# ----------------------------------------------------------- interpolate


def test_interpolate_grid_and_bounds(spark):
    out = _q(spark, "q_ts_interpolate")
    rows = out.collect()
    # dense grid: per type, row count == span hours + 1
    spans = {}
    for r in rows:
        t = r["event_type"]
        spans.setdefault(t, []).append(r)
    for t, rs in spans.items():
        hs = sorted(r["hour"] for r in rs)
        n_expected = int((hs[-1] - hs[0]).total_seconds() // 3600) + 1
        assert len(rs) == n_expected, t
        assert len(set(hs)) == len(hs), t
        # interpolated values lie between their observed neighbours
        obs = [(r["hour"], r["value_mc"]) for r in rs if r["src"] == "obs"]
        obs_h = sorted(h for h, _ in obs)
        vals = dict(obs)
        for r in rs:
            if r["src"] == "interp":
                prev_h = max(h for h in obs_h if h < r["hour"])
                next_h = min(h for h in obs_h if h > r["hour"])
                lo = min(vals[prev_h], vals[next_h])
                hi = max(vals[prev_h], vals[next_h])
                assert lo <= r["value_mc"] <= hi


# ------------------------------------------------------------- plan pins


@pytest.mark.parametrize(
    "name", ["q_abc_pareto", "q_agg_gini", "q_skyline"]
)
def test_prefix_scan_queries_have_no_global_window(spark, name):
    """The mining prefix-scan queries must never regress to a global
    ``Window.orderBy`` (single-partition WindowExec) — the same pin
    that guards the RFM rewrite. Every WindowExec in the plan must be
    partitioned (by the range-scan pid)."""
    df = registry.registry()[name].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan()

    def walk(n):
        yield n
        for i in range(n.children().size()):
            yield from walk(n.children().apply(i))

    nodes = []
    for n in walk(plan):
        if n.nodeName() == "AdaptiveSparkPlan":
            nodes.extend(walk(n.initialPlan()))
        else:
            nodes.append(n)
    windows = [n for n in nodes if n.nodeName() == "Window"]
    assert windows, f"{name}: expected a pid-partitioned window"
    for w in windows:
        assert not w.partitionSpec().isEmpty(), (
            f"global (unpartitioned) WindowExec found in {name}"
        )


# ------------------------------------------------------- corr / rollup


def test_corr_matches_builtin_and_bounds(spark):
    row = _q(spark, "q_agg_corr").collect()[0]
    assert -1.0 <= row["corr_qty_price"] <= 1.0
    # the moment formula must agree with Spark's float corr to well
    # within float-accumulation noise on the quantized columns
    li = load(spark, SF_DIR, "lineitem").select(
        F.round("l_quantity").cast("long").alias("x"),
        F.round("l_extendedprice").cast("long").alias("y"),
    )
    ref = li.agg(F.corr("x", "y")).collect()[0][0]
    assert abs(row["corr_qty_price"] - ref) < 1e-6


def test_rollup_multires_levels_conserve(spark):
    out = _q(spark, "q_ts_rollup_multires")
    by_level = {
        r["level"]: (r["n_events_sum"], round(r["value_sum"], 2))
        for r in out.groupBy("level")
        .agg(
            F.sum("n_events").alias("n_events_sum"),
            F.sum("total_value").alias("value_sum"),
        )
        .collect()
    }
    # every resolution is a partition of the same event set
    assert (
        by_level["hour"] == by_level["day"] == by_level["month"]
        == by_level["total"]
    )


def test_prefix_scan_partitioning_independent(spark):
    """The prefix scan's claim is that the result is a pure function of
    the data and the total order — independent of how the range sampler
    draws boundaries. Re-running under radically different shuffle
    parallelism (1, 3, 8 partitions) must give identical cum/rank/min
    columns. This is the local stand-in for 'same answer on a
    1000-executor cluster'."""
    df = spark.range(0, 400).select(
        ((F.col("id") * 73) % 97).alias("v"), F.col("id").alias("k")
    )
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for nparts in ("1", "3", "8"):
            spark.conf.set("spark.sql.shuffle.partitions", nparts)
            cum = with_global_prefix(
                df,
                [F.col("v").asc(), F.col("k").asc()],
                "v",
                agg="sum",
                out="cum",
                rank_out="rk",
            )
            pm = with_global_prefix(
                df,
                [F.col("k").asc()],
                "v",
                agg="min",
                inclusive=False,
                out="pm",
            )
            results.append(
                (
                    sorted(map(tuple, cum.collect())),
                    sorted(map(tuple, pm.collect())),
                )
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert results[0] == results[1] == results[2]


# ------------------------------------------------ fuzzy τ=1 blocking


def test_del1_blocking_selective_on_shared_affix_corpus(spark):
    """Round-7 perf fix pin: position-segment (PassJoin) blocking
    degenerates to a quadratic bucket on corpora sharing a constant
    affix (sequential 'Customer#000…' names made one half-segment a
    full-corpus bucket: ~225M candidates, 350 s at sf0.1). The τ=1
    deletion-neighbourhood path must (a) stay exactly complete and
    (b) keep every blocking bucket bounded by the real neighbourhood
    density — for sequential IDs, about the digit alphabet — never
    the corpus size."""
    from micmac_li3ds_spark.operators.joins import fuzzy_self_join

    corpus = [f"Customer#{i:09d}" for i in range(1, 601)]
    names = spark.createDataFrame([(s,) for s in corpus], ["n"])

    got = {
        (r["name_a"], r["name_b"])
        for r in fuzzy_self_join(names, 1).collect()
    }
    # τ=1 on equal-length sequential IDs = Hamming distance 1
    want = {
        (a, b)
        for i, a in enumerate(corpus)
        for b in corpus[i + 1 :]
        if sum(x != y for x, y in zip(a, b)) == 1
    }
    assert want and got == want

    # blocking-bucket bound: every deletion-variant key's bucket is a
    # CONSTANT of the ID format (digit choices at the deleted position,
    # plus run-collisions where deleting any of k equal consecutive
    # chars yields the same variant — measured 24 here), never a
    # function of corpus size (600 names; PassJoin's degenerate bucket
    # would hold all 600)
    keyed = names.select(
        "n",
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array(F.col("n")),
                    F.expr(
                        "transform(sequence(1, length(n)),"
                        " i -> concat(substring(n, 1, i-1),"
                        " substring(n, i+1, length(n)-i)))"
                    ),
                )
            )
        ).alias("key"),
    )
    max_bucket = (
        keyed.groupBy("key")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c"))
        .collect()[0][0]
    )
    assert max_bucket <= 30, max_bucket


# -------------------------------------------------- connected components


def test_cc_pointer_jumping_logarithmic_on_chain(spark):
    """The O(log d) claim, executed: on a path graph of 256 nodes
    (diameter 255 — plain min-label propagation needs ~255 rounds),
    the pointer-jumping fixpoint must converge in ≤ 12 rounds and
    label every node with the chain head."""
    from micmac_li3ds_spark.operators.analytics import cc_fixpoint

    n = 256
    e = spark.range(0, n - 1).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    lbl, rounds = cc_fixpoint(e)
    assert rounds <= 12, rounds
    rows = lbl.collect()
    assert len(rows) == n
    assert all(r["lbl"] == 0 for r in rows)


def test_graph_cc_histogram_conserves_nodes(spark):
    out = _q(spark, "q_graph_cc").collect()
    n_from_hist = sum(r["component_size"] * r["n_components"] for r in out)
    tri = _q(spark, "q_graph_triangles").collect()[0]
    assert n_from_hist == tri["n_nodes"]


def test_del1_blocking_complete_on_random_corpus(spark):
    """Deletion-neighbourhood completeness beyond the sequential-ID
    shape: random short strings over a 3-letter alphabet (dense in
    substitutions, insertions, AND deletions — length differences
    exercise the variant-containment case) must reproduce the brute
    τ=1 pair set exactly."""
    import itertools
    import random

    from micmac_li3ds_spark.operators.joins import fuzzy_self_join

    rng = random.Random(407)
    corpus = sorted(
        {
            "".join(rng.choice("abc") for _ in range(rng.randint(0, 5)))
            for _ in range(220)
        }
    )

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    want = {
        (a, b, lev(a, b))
        for a, b in itertools.combinations(corpus, 2)
        if lev(a, b) <= 1
    }
    names = spark.createDataFrame([(s,) for s in corpus], ["n"])
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in fuzzy_self_join(names, 1).collect()
    }
    assert want and got == want


def test_with_global_prefix_inclusive_min(spark):
    # the fourth helper mode (inclusive running min) — unused by the
    # registered queries but part of the primitive's contract
    df = spark.range(0, 200).select(
        F.col("id").alias("k"), ((F.col("id") * 29) % 43).alias("s")
    )
    got = {
        r["k"]: r["rm"]
        for r in with_global_prefix(
            df, [F.col("k").asc()], "s", agg="min", inclusive=True, out="rm"
        ).collect()
    }
    rows = sorted((r["k"], r["s"]) for r in df.collect())
    run = None
    for k, s in rows:
        run = s if run is None else min(run, s)
        assert got[k] == run


def test_cc_fixpoint_restarts_from_durable_state(spark, tmp_path):
    """Driver-loop restart semantics (SCALE.md "Iterative loops under
    failure"): with a DurableLoopState, a loop killed mid-iteration
    resumes from the highest COMMITTED round — not round 0 — and
    converges to the identical fixpoint as an uninterrupted run. The
    simulated crash fires after 2 committed rounds on a chain graph
    that needs more than 2, so the resume branch is genuinely
    exercised (asserted via the resumed round count)."""
    import pytest as _pytest

    from micmac_li3ds_spark.functions.iterate import DurableLoopState
    from micmac_li3ds_spark.operators.analytics import cc_fixpoint

    n = 256
    e = spark.range(0, n - 1).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    # uninterrupted reference run (localCheckpoint path)
    ref_lbl, ref_rounds = cc_fixpoint(e)
    ref = sorted(map(tuple, ref_lbl.collect()))
    assert ref_rounds > 2  # crash point must interrupt a real prefix

    state = DurableLoopState(spark, str(tmp_path / "cc_state"))
    with _pytest.raises(RuntimeError, match="simulated driver crash"):
        cc_fixpoint(e, state=state, fail_after=2)
    committed = state.latest_round()
    assert committed == 2, committed

    # "new driver": resume against the same state dir — must do only
    # the remaining rounds and land on the identical fixpoint
    state2 = DurableLoopState(spark, str(tmp_path / "cc_state"))
    lbl, resumed_rounds = cc_fixpoint(e, state=state2)
    assert resumed_rounds < ref_rounds, (resumed_rounds, ref_rounds)
    assert sorted(map(tuple, lbl.collect())) == ref


def test_durable_loop_state_ignores_uncommitted_round(spark, tmp_path):
    """Write-then-commit protocol: a round directory WITHOUT its
    _COMMIT_k marker (crash between write and commit) is invisible to
    resume — latest_round() reports the last committed one and save()
    safely overwrites the dangling directory."""
    from micmac_li3ds_spark.functions.iterate import DurableLoopState

    st = DurableLoopState(spark, str(tmp_path / "st"))
    df = spark.range(5).select(
        F.col("id").alias("node"), F.col("id").alias("lbl")
    )
    st.save(df, 0)
    # simulate a crash mid-round-1: parquet written, marker never created
    df.write.mode("overwrite").parquet(str(tmp_path / "st" / "round=1"))
    assert st.latest_round() == 0
    # retry of round 1 overwrites the dangling dir and commits
    out = st.save(df.withColumn("lbl", F.lit(0)), 1)
    assert st.latest_round() == 1
    assert out.count() == 5


def test_ts_anomaly_integer_test_matches_float_zscore(spark):
    """The BIGINT spelling (n·x−S)²(n−1) > 9n(nQ−S²) must agree with
    the textbook float z-test everywhere the float test is numerically
    unambiguous — verified over every output row at sf0.001, plus the
    flag actually fires somewhere (non-vacuous)."""
    import math

    rows = _q(spark, "q_ts_anomaly").collect()
    assert rows
    fired = 0
    for r in rows:
        n, s, q, x = r["n_win"], r["sum_win"], r["sumsq_win"], r["cnt"]
        if n < 12:
            assert not r["is_anomaly"]
            continue
        mu = s / n
        var = (n * q - s * s) / (n * (n - 1))
        lhs, rhs = (x - mu) ** 2, 9 * var
        if abs(lhs - rhs) > 1e-9 * max(lhs, rhs, 1.0):
            assert r["is_anomaly"] == (lhs > rhs), r
        fired += bool(r["is_anomaly"])
    assert fired > 0


def test_bfs_distances_exact_on_chain(spark):
    """BFS hop distances on a path graph must equal the node index from
    the source (= node 0, the min id), and the round count must equal
    the source's eccentricity — the metric pointer jumping cannot
    preserve, which is q_graph_sssp's reason to exist next to
    cc_fixpoint."""
    from micmac_li3ds_spark.operators.analytics import bfs_distances

    n = 40
    e = spark.range(0, n - 1).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    dist, src, rounds = bfs_distances(e)
    assert src == 0
    got = {r["node"]: r["dist"] for r in dist.collect()}
    assert got == {i: i for i in range(n)}
    assert rounds == n  # n-1 expansion rounds + the empty closing round


def test_zorder_buckets_bound_both_dimensions(spark):
    """The reason Z-order exists: per-bucket min/max envelopes must be
    narrow in BOTH interleaved dimensions simultaneously (mean width
    well under half the global range per dim) — a single-column sort
    gives a narrow envelope in one dim and full-range in the other."""
    rows = _q(spark, "q_layout_zorder").collect()
    assert len(rows) >= 8
    g_ck = max(r["max_custkey"] for r in rows) - min(
        r["min_custkey"] for r in rows
    )
    g_dd = max(r["max_day"] for r in rows) - min(r["min_day"] for r in rows)
    n = sum(r["n_rows"] for r in rows)
    mean_ck = sum(
        (r["max_custkey"] - r["min_custkey"]) * r["n_rows"] for r in rows
    ) / n
    mean_dd = sum((r["max_day"] - r["min_day"]) * r["n_rows"] for r in rows) / n
    assert mean_ck < 0.5 * g_ck, (mean_ck, g_ck)
    assert mean_dd < 0.5 * g_dd, (mean_dd, g_dd)
