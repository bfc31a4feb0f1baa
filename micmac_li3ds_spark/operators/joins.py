"""M2 join operators (SURVEY.md §2.3).

Strategy notes (the part that matters at 100 TB):
- Dimension joins broadcast (region/nation always; customer/part/supplier
  below the 32 MB threshold here, and at scale they'd be explicitly
  hinted or bucketed).
- Fact-fact joins (orders ⋈ lineitem) shuffle on the join key — both
  sides partition by l_orderkey/o_orderkey, which is also the natural
  bucketing key for co-located storage.
- The range join avoids the BroadcastNestedLoop trap by equi-joining on
  a coarse time bucket first, then applying the range predicate — the
  standard interval-join decomposition.
- The as-of join is the union+window rewrite: one shuffle on the
  partition key, no per-row subqueries, no skew beyond the key's own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from micmac_li3ds_spark.functions.exact import cents, duck_cents
from micmac_li3ds_spark.registry import register
from micmac_li3ds_spark.tables import load


@register(
    "q_join_broadcast",
    oracle=f"""
SELECT r_name, n_name,
       COUNT(*) AS n_cust,
       SUM({duck_cents('c_acctbal')}) / 100.0 AS sum_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
    tags=("join", "broadcast"),
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim enrichment via broadcast hash join: region and nation ship to
    every executor (bytes, not a shuffle of the fact side)."""
    c = load(spark, sf_dir, "customer")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            (F.sum(cents("c_acctbal")) / 100.0).alias("sum_bal"),
        )
    )


@register(
    "q_join_sortmerge",
    oracle=f"""
SELECT o_orderkey, o_orderstatus,
       COUNT(*) AS n_lines,
       SUM({duck_cents('l_extendedprice')} * (100 - {duck_cents('l_discount')})) / 10000.0
         AS revenue
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'F'
GROUP BY o_orderkey, o_orderstatus
""",
    tags=("join", "sortmerge"),
)
def q_join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large equi-join, sort-merge strategy (MERGE hint). Both
    sides shuffle on the order key; with bucketed storage on that key the
    exchange disappears entirely."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    price = cents("l_extendedprice")
    disc = cents("l_discount")  # discount in [0,1] at 2dp → integer percent
    return (
        o.hint("MERGE")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.sum(price * (100 - disc)) / 10000.0).alias("revenue"),
        )
    )


@register(
    "q_join_shuffle_hash",
    oracle="""
SELECT l_suppkey,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_suppkey
""",
    tags=("join", "shuffle_hash"),
)
def q_join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same equi-join under the SHUFFLE_HASH strategy: no sort, builds a
    hash table per partition — wins when one side is much smaller after
    filtering but still too big to broadcast."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o.hint("SHUFFLE_HASH"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
    )


@register(
    "q_join_left",
    oracle="""
SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice
FROM customer
LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 200000.0) big
  ON big.o_custkey = c_custkey
""",
    tags=("join", "outer"),
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: every customer survives; unmatched get NULLs."""
    c = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000.0)
    return c.join(big, big.o_custkey == c.c_custkey, "left").select(
        "c_custkey", "c_mktsegment", "o_orderkey", "o_totalprice"
    )


@register(
    "q_join_right",
    oracle="""
SELECT o_orderkey, o_custkey, c_name
FROM (SELECT * FROM customer WHERE c_mktsegment = 'AUTOMOBILE') auto
RIGHT JOIN orders ON auto.c_custkey = o_custkey
""",
    tags=("join", "outer"),
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (planner canonicalizes to left-outer with sides
    swapped — semantics preserved)."""
    auto = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "AUTOMOBILE")
    o = load(spark, sf_dir, "orders")
    return auto.join(o, auto.c_custkey == o.o_custkey, "right").select(
        "o_orderkey", "o_custkey", "c_name"
    )


@register(
    "q_join_full",
    oracle="""
SELECT f.o_custkey AS f_cust, f.n_f, o.o_custkey AS o_cust, o.n_o
FROM (SELECT o_custkey, COUNT(*) AS n_f FROM orders WHERE o_orderstatus='F' GROUP BY o_custkey) f
FULL JOIN (SELECT o_custkey, COUNT(*) AS n_o FROM orders WHERE o_orderstatus='O' GROUP BY o_custkey) o
  ON f.o_custkey = o.o_custkey
""",
    tags=("join", "outer"),
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join between two aggregated key sets."""
    orders = load(spark, sf_dir, "orders")
    f = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_f"))
        .select(F.col("o_custkey").alias("f_cust"), "n_f")
    )
    o = (
        orders.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_o"))
        .select(F.col("o_custkey").alias("o_cust"), "n_o")
    )
    return f.join(o, f.f_cust == o.o_cust, "full").select("f_cust", "n_f", "o_cust", "n_o")


@register(
    "q_join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
""",
    tags=("join", "semi"),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join: existence filter; right side never duplicated into
    the output (and only the key column shuffles)."""
    c = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
""",
    tags=("join", "anti"),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join: non-existence (customers with no URGENT order).
    Also the engine's get-or-create primitive — the reference's
    idempotent-import semantics (SURVEY.md §2.12 q_etl_get_or_create
    builds on this)."""
    c = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_cross_theta",
    oracle="""
SELECT p_brand, COUNT(*) AS n_pairs
FROM part
JOIN supplier
  ON p_retailprice BETWEEN s_acctbal * 0.4 AND s_acctbal * 0.5
GROUP BY p_brand
""",
    tags=("join", "theta"),
)
def q_join_cross_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure inequality (theta) join → BroadcastNestedLoop with the small
    side broadcast. Acceptable only because supplier is tiny; the scale
    path for interval predicates is q_join_range's bucket decomposition."""
    p = load(spark, sf_dir, "part")
    s = F.broadcast(load(spark, sf_dir, "supplier"))
    cond = (F.col("p_retailprice") >= F.col("s_acctbal") * 0.4) & (
        F.col("p_retailprice") <= F.col("s_acctbal") * 0.5
    )
    return p.join(s, cond).groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_pairs"))


@register(
    "q_join_range",
    oracle="""
WITH windows AS (
  SELECT o_orderkey,
         TIMESTAMP '2024-01-01'
           + (o_orderkey % 29) * INTERVAL 1 DAY
           + (o_orderkey % 23) * INTERVAL 1 HOUR
           + ((o_orderkey % 4) * 17) * INTERVAL 1 MINUTE AS w_start
  FROM orders
)
SELECT w.o_orderkey, CAST(COUNT(e.event_id) AS BIGINT) AS n_events
FROM windows w
LEFT JOIN events e
  ON CAST(e.ts AS TIMESTAMP) >= w.w_start
 AND CAST(e.ts AS TIMESTAMP) < w.w_start + INTERVAL 15 MINUTE
GROUP BY w.o_orderkey
""",
    tags=("join", "range"),
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join, scale-safe decomposition: each interval
    EXPLODES into the hour buckets it covers (misaligned 15-minute
    windows — 1 bucket usually, 2 when the window crosses an hour
    boundary), events bucket by their own hour, the join is a plain
    hash equi-join on the bucket key, and the residual range predicate
    prunes inside each bucket. Each matching pair matches in exactly
    one bucket (the event's own), so no post-join dedup is needed.
    Orders with no events in window survive via the final left join
    (count 0). Never a bare BroadcastNestedLoop over the fact table —
    and never a degenerate bucket: per-bucket work is |orders_b| ×
    |events_b| with bucket population controlled by the bucket WIDTH,
    the knob that tunes this at any scale (round 7 re-cut the demo
    from day-aligned windows whose single bucket matched every event
    of the day — ~500M matched pairs and 69 s at sf0.1 — to this
    shape, ~100× fewer)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        (
            F.to_timestamp(F.lit("2024-01-01"))
            + F.make_dt_interval(
                days=F.col("o_orderkey") % 29,
                hours=F.col("o_orderkey") % 23,
                mins=(F.col("o_orderkey") % 4) * 17,
            )
        ).alias("w_start"),
    )
    o = o.withColumn("w_end", F.col("w_start") + F.expr("INTERVAL 15 MINUTE"))
    ob = o.select(
        "o_orderkey",
        "w_start",
        "w_end",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("w_start")),
                F.date_trunc(
                    "hour", F.col("w_end") - F.expr("INTERVAL 1 SECOND")
                ),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bucket"),
    )
    e = load(spark, sf_dir, "events").select(
        "event_id", "ts", F.date_trunc("hour", F.col("ts")).alias("bucket")
    )
    matched = (
        ob.join(e, "bucket")
        .filter((F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")))
        .groupBy("o_orderkey")
        .agg(F.count("event_id").alias("n"))
    )
    return o.join(matched, "o_orderkey", "left").select(
        "o_orderkey", F.coalesce(F.col("n"), F.lit(0)).alias("n_events")
    )


@register(
    "q_join_asof",
    oracle="""
SELECT p.event_id,
       (SELECT c.event_id
        FROM events c
        WHERE c.user_id = p.user_id
          AND c.event_type = 'click'
          AND (date_trunc('second', CAST(c.ts AS TIMESTAMP)) < date_trunc('second', CAST(p.ts AS TIMESTAMP))
               OR (date_trunc('second', CAST(c.ts AS TIMESTAMP)) = date_trunc('second', CAST(p.ts AS TIMESTAMP))
                   AND c.event_id < p.event_id))
        ORDER BY date_trunc('second', CAST(c.ts AS TIMESTAMP)) DESC, c.event_id DESC
        LIMIT 1) AS last_click_id
FROM events p
WHERE p.event_type = 'purchase'
""",
    tags=("join", "asof"),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, union+window rewrite: for each purchase, the latest
    click by the same user strictly before it (order = (second-truncated
    ts, event_id); ties broken by event_id — SURVEY.md §7.3).

    Plan: one shuffle on user_id, one window sort — no per-row probe, no
    nested loop. This is the canonical scalable as-of shape; at 100 TB
    add a coarse time-bucket to the partition key to bound partition size.
    """
    ev = load(spark, sf_dir, "events").withColumn(
        "ts_sec", F.date_trunc("second", F.col("ts"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    return (
        ev.withColumn("last_click_id", F.last(click_id, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "last_click_id")
    )


@register(
    "q_join_self",
    oracle="""
SELECT s.user_id, s.event_id AS signup_id, COUNT(p.event_id) AS n_purchases_after
FROM events s
JOIN events p
  ON p.user_id = s.user_id
 AND p.event_type = 'purchase'
 AND date_trunc('second', CAST(p.ts AS TIMESTAMP)) > date_trunc('second', CAST(s.ts AS TIMESTAMP))
WHERE s.event_type = 'signup'
GROUP BY s.user_id, s.event_id
""",
    tags=("join", "self"),
)
def q_join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join with aliases: purchases strictly after each signup per
    user. Equi-join on user_id carries the shuffle; the time predicate is
    residual."""
    ev = load(spark, sf_dir, "events").withColumn(
        "ts_sec", F.date_trunc("second", F.col("ts"))
    )
    s = ev.filter(F.col("event_type") == "signup").alias("s")
    p = ev.filter(F.col("event_type") == "purchase").alias("p")
    return (
        s.join(
            p,
            (F.col("p.user_id") == F.col("s.user_id"))
            & (F.col("p.ts_sec") > F.col("s.ts_sec")),
        )
        .groupBy(F.col("s.user_id").alias("user_id"), F.col("s.event_id").alias("signup_id"))
        .agg(F.count(F.col("p.event_id")).alias("n_purchases_after"))
    )


_SALT = 8


@register(
    "q_join_skew_salted",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS total_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
    tags=("join", "skew"),
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join by key salting, value-checked against the
    PLAIN join as its own oracle — the parity proves the rewrite is
    semantics-preserving. The large/skewed side gets a salt derived
    from one of its own columns (deterministic — a seeded rand() would
    also work at scale but breaks cross-engine verification); the small
    side replicates across all salt values; the join key becomes
    (key, salt), splitting any hot key's rows across _SALT reducers
    instead of one straggler task. Cost: small side inflates ×_SALT —
    use only on joins where AQE's automatic skew splitting can't help
    (e.g. when the skewed side must also aggregate on the hot key).
    AQE skew-join handles the common case; this is the manual tool for
    the rest."""
    li = load(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.col("l_linenumber"), F.lit(_SALT))
    )
    o = load(spark, sf_dir, "orders").withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(_SALT)]))
    )
    j = li.join(
        o,
        (li.l_orderkey == o.o_orderkey) & (li.salt == o.salt),
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        (F.sum(cents) / 100.0).alias("total_price"),
    )


@register(
    "q_join_null_safe",
    oracle="""
WITH a AS (
  SELECT nullif(c_mktsegment, 'BUILDING') AS seg, COUNT(*) AS n_even
  FROM customer WHERE c_custkey % 2 = 0 GROUP BY 1
),
b AS (
  SELECT nullif(c_mktsegment, 'BUILDING') AS seg, COUNT(*) AS n_odd
  FROM customer WHERE c_custkey % 2 = 1 GROUP BY 1
)
SELECT coalesce(a.seg, 'NULL_GROUP') AS seg_label, n_even, n_odd
FROM a JOIN b ON a.seg IS NOT DISTINCT FROM b.seg
""",
    tags=("join", "null"),
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): the NULL
    key groups on both sides MATCH each other instead of silently
    dropping — the semantic a plain ``=`` join gets wrong when keys are
    nullable (a classic reconciliation bug). Catalyst treats ``<=>`` as
    an equi-key, so this still plans as a hash join, not a nested loop.
    Corpus has no NULL keys, so they are manufactured with nullif; the
    output coalesces the key for a NULL-free driver comparison."""
    c = load(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    a = (
        c.filter(F.col("c_custkey") % 2 == 0)
        .select(seg.alias("seg_a"))
        .groupBy("seg_a")
        .agg(F.count(F.lit(1)).alias("n_even"))
    )
    b = (
        c.filter(F.col("c_custkey") % 2 == 1)
        .select(seg.alias("seg_b"))
        .groupBy("seg_b")
        .agg(F.count(F.lit(1)).alias("n_odd"))
    )
    return a.join(b, a.seg_a.eqNullSafe(b.seg_b)).select(
        F.coalesce(F.col("seg_a"), F.lit("NULL_GROUP")).alias("seg_label"),
        "n_even",
        "n_odd",
    )


@register(
    "q_join_lateral",
    oracle="""
SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
FROM orders o,
LATERAL (SELECT l_linenumber, l_extendedprice
         FROM lineitem
         WHERE l_orderkey = o.o_orderkey
         ORDER BY l_extendedprice DESC, l_linenumber
         LIMIT 2) l
WHERE o.o_totalprice > 400000.0
""",
    tags=("join", "lateral"),
)
def q_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery — per-row top-k from another table
    (the two most expensive lineitems of each big order). Catalyst
    decorrelates the ORDER/LIMIT lateral into a ranked window over a
    single keyed join — NOT a per-row re-execution — which is the same
    plan the explicit row_number rewrite (q_win_topk_group) produces;
    this query proves the sugar carries no scale penalty. Deterministic:
    the lateral's ordering carries a linenumber tiebreak."""
    for t in ("orders", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
        FROM orders o,
        LATERAL (SELECT l_linenumber, l_extendedprice
                 FROM lineitem
                 WHERE l_orderkey = o.o_orderkey
                 ORDER BY l_extendedprice DESC, l_linenumber
                 LIMIT 2) l
        WHERE o.o_totalprice > 400000.0
        """
    )


_FUZZY_TAU = 2  # edit-distance threshold; τ+1 = 3 index segments


@register(
    "q_join_fuzzy",
    oracle=f"""
WITH names AS (SELECT DISTINCT p_name AS n FROM part)
SELECT a.n AS name_a, b.n AS name_b,
       CAST(levenshtein(a.n, b.n) AS INTEGER) AS dist
FROM names a JOIN names b
  ON a.n < b.n
 AND abs(length(a.n) - length(b.n)) <= {_FUZZY_TAU}
 AND levenshtein(a.n, b.n) <= {_FUZZY_TAU}
""",
    tags=("join", "fuzzy", "similarity"),
)
def q_join_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance similarity self-join (entity resolution / fuzzy
    match): all distinct part-name pairs within Levenshtein distance
    τ=2, found WITHOUT an all-pairs comparison via PassJoin-style
    segment blocking (Li, Deng, Feng — public literature).

    Completeness argument (why no true pair can be missed): partition
    each indexed string r (length L) into τ+1 = 3 contiguous segments.
    Any s with lev(s, r) ≤ τ must contain at least one of r's segments
    VERBATIM (pigeonhole: τ edit operations cannot touch all τ+1
    segments), starting within ±τ of that segment's position in r, and
    only strings with |len(s) − L| ≤ τ can qualify. So: the index side
    emits (L, k, segmentₖ(r)); the probe side emits, for every target
    length L within ±τ of its own and every k, the substrings at the
    ±τ-shifted positions; candidates are the (L, k, substring) hash-
    join matches; exact levenshtein verifies. Per string that is
    3 index rows and ≤ (τ+1)·(2τ+1)² = 75 probe rows — CONSTANT
    fan-out, one equi-join shuffle on the segment key, candidate count
    driven by real similarity instead of n². That is the shape that
    resolves a 10⁹-entity catalog where the brute-force join (the
    oracle, fine at 64 names) is n² and unshippable.

    Completeness is additionally property-tested on a DENSE workload
    (customer names, ~20k true pairs) in tests/test_round6_ops.py via
    the reusable fuzzy_self_join helper."""
    names = (
        load(spark, sf_dir, "part")
        .select(F.col("p_name").alias("n"))
        .distinct()
    )
    return fuzzy_self_join(names, _FUZZY_TAU)


def _fuzzy_self_join_del1(names: DataFrame) -> DataFrame:
    """τ=1 edit-distance self-join via DELETION-NEIGHBORHOOD blocking
    (the FastSS / SymSpell family — Bocek et al. 2007, public
    literature): each string s emits the key set K(s) = {s} ∪ {s with
    one character deleted}; candidates are pairs sharing any key.

    Completeness for lev(a,b) ≤ 1: equal → share the identity key;
    substitution at position i → deleting i from both yields the same
    key; insertion/deletion → the shorter string IS a deletion variant
    of the longer, and it is also its own identity key. Exact
    levenshtein verifies every candidate, so false positives (e.g.
    transpositions sharing a variant) cost only the verify.

    Why this replaces PassJoin at τ=1: position-segment blocking keys
    on FIXED halves of the string, which degenerates into a quadratic
    bucket when the corpus shares a constant affix — measured on the
    sequential customer-name corpus ('Customer#000…' is everyone's
    first half), 15k names produced ~225M segment-bucket candidates
    and 350 s of levenshtein at sf0.1. Deletion keys always contain
    the distinguishing characters wherever they sit, so bucket size
    tracks real neighbourhood density (~digits-per-position here),
    independent of shared affixes. Fan-out is len+1 keys per string —
    one explode, one equi-join shuffle on the key, same plan family."""
    variants = F.concat(
        F.array(F.col("n")),
        F.when(
            F.length("n") > 0,
            F.expr(
                "transform(sequence(1, length(n)),"
                " i -> concat(substring(n, 1, i-1),"
                " substring(n, i+1, length(n)-i)))"
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    keyed = names.select(
        "n", F.explode(F.array_distinct(variants)).alias("key")
    )
    cand = (
        keyed.alias("x")
        .join(keyed.alias("y"), "key")
        .filter(F.col("x.n") < F.col("y.n"))
        .select(F.col("x.n").alias("name_a"), F.col("y.n").alias("name_b"))
        .distinct()
    )
    return cand.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").alias("dist"),
    ).filter(F.col("dist") <= 1)


def fuzzy_self_join(names: DataFrame, tau: int) -> DataFrame:
    """PassJoin-style edit-distance self-join over a single-column
    DataFrame of distinct strings named ``n`` — see q_join_fuzzy for
    the completeness argument. Returns (name_a, name_b, dist) with
    name_a < name_b and dist ≤ tau. At τ=1 the blocking switches to
    the deletion-neighbourhood scheme (see ``_fuzzy_self_join_del1``),
    which is immune to the shared-affix degeneracy that makes fixed
    position segments quadratic on sequential-ID corpora.

    Short-string completeness (round-7 fix): the pigeonhole argument
    needs the INDEX string to have τ+1 non-empty segments, i.e.
    length ≥ τ+1 — a shorter index string can have every non-empty
    segment touched by an edit. Any pair that blocking could miss
    therefore has its lexicographically-smaller member of length ≤ τ,
    and the |Δlen| ≤ τ constraint caps the other member at 2τ. Those
    strings are routed through a brute-force broadcast self-join over
    the length ≤ 2τ subset — a set that is tiny for any natural corpus
    (and quadratic only in its own size, never in n)."""
    if tau == 1:
        return _fuzzy_self_join_del1(names)
    nseg = tau + 1
    names = names.select("n", F.length("n").alias("m"))

    # One (ΔL, k, shift) combination per explode element, fanned out by
    # a single explode — NOT a unionAll per combination, which would
    # re-scan the name set 75 times and blow the plan up. The exploded
    # array holds only the CONSTANT (ΔL, k, shift) triples; the
    # per-combination segment arithmetic (L, p2, ln, seg) is computed
    # AFTER the explode in one small projection. Inlining the
    # arithmetic into the array literal (the previous shape) emitted
    # 75 × 4 expression trees into one Generate node — >64 KB of
    # generated Java, so janino refused it ("Code grows beyond 64 KB")
    # and the probe fan-out stage silently ran INTERPRETED (guide §7.2:
    # watch for codegen fallback). Post-explode, codegen sees one
    # combination's worth of arithmetic and the stage compiles.
    def fan_out(combos, out_name: str):
        combo_arr = F.array(
            *[
                F.struct(
                    F.lit(d_l).alias("dl"),
                    F.lit(k).alias("k"),
                    F.lit(shift).alias("shift"),
                )
                for d_l, k, shift in combos
            ]
        )
        g = F.col("g")
        big_l = F.col("m") + g["dl"]
        p = F.floor(big_l * g["k"] / nseg).cast("int")
        q = F.floor(big_l * (g["k"] + 1) / nseg).cast("int")
        p2 = (p + g["shift"]).alias("p2")
        ln = (q - p).alias("ln")
        derived = names.select(
            F.col("n").alias(out_name),
            "m",
            F.explode(combo_arr).alias("g"),
        ).select(
            out_name,
            "m",
            big_l.cast("int").alias("L"),
            g["k"].alias("k"),
            p2,
            ln,
        )
        return (
            derived.filter(
                (F.col("ln") >= 1)
                & (F.col("p2") >= 0)
                & (F.col("p2") + F.col("ln") <= F.col("m"))
            )
            .select(
                out_name,
                "L",
                "k",
                F.col(out_name)
                .substr(F.col("p2") + 1, F.col("ln"))
                .alias("seg"),
            )
        )

    index = fan_out([(0, k, 0) for k in range(nseg)], "name_idx")
    probe = fan_out(
        [
            (d_l, k, shift)
            for d_l in range(-tau, tau + 1)
            for k in range(nseg)
            for shift in range(-tau, tau + 1)
        ],
        "name_probe",
    )

    blocked = (
        index.join(probe, ["L", "k", "seg"])
        .filter(F.col("name_idx") < F.col("name_probe"))
        .select(
            F.col("name_idx").alias("name_a"),
            F.col("name_probe").alias("name_b"),
        )
    )
    shortish = names.filter(F.col("m") <= 2 * tau)
    brute = (
        shortish.select(F.col("n").alias("name_a"), F.col("m").alias("ma"))
        .join(
            F.broadcast(
                shortish.select(
                    F.col("n").alias("name_b"), F.col("m").alias("mb")
                )
            ),
            (F.col("name_a") < F.col("name_b"))
            & (F.abs(F.col("ma") - F.col("mb")) <= tau),
        )
        .select("name_a", "name_b")
    )
    candidates = blocked.unionAll(brute).distinct()
    return candidates.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").alias("dist"),
    ).filter(F.col("dist") <= tau)


@register(
    "q_er_resolve",
    oracle="""
WITH RECURSIVE names AS (SELECT DISTINCT c_name AS n FROM customer),
pairs AS (
  SELECT a.n AS na, b.n AS nb
  FROM names a JOIN names b
    ON a.n < b.n
   AND abs(length(a.n) - length(b.n)) <= 1
   AND levenshtein(a.n, b.n) <= 1
),
edges AS (
  SELECT na AS a, nb AS b FROM pairs
  UNION ALL
  SELECT nb AS a, na AS b FROM pairs
),
reach AS (
  SELECT a AS nm, b AS peer FROM edges
  UNION
  SELECT r.nm, e.b FROM reach r JOIN edges e ON e.a = r.peer
),
lab AS (SELECT nm, LEAST(nm, MIN(peer)) AS canonical FROM reach GROUP BY nm),
allnames AS (
  SELECT n.n AS name, coalesce(l.canonical, n.n) AS canonical
  FROM names n LEFT JOIN lab l ON l.nm = n.n
)
SELECT name, canonical,
       CAST(COUNT(*) OVER (PARTITION BY canonical) AS BIGINT)
         AS cluster_size
FROM allnames
""",
    tags=("join", "fuzzy", "composite", "entity-resolution"),
)
def q_er_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end — the production composite the
    pieces exist for: fuzzy duplicate DETECTION (PassJoin segment
    blocking, tau=1) chained into duplicate-cluster RESOLUTION
    (iterative min-label propagation, q_llm_dedup_clusters' Pregel
    shape) to emit the canonical-name mapping every MDM/dedup pipeline
    ends with: one row per distinct customer name with its cluster
    representative (lexicographic min — deterministic in any engine
    for ASCII keys) and cluster size. Singleton names map to
    themselves, so the output is a TOTAL canonicalization map, ready
    to broadcast-join against the fact tables.

    Scale: candidate pairs come from the blocked fuzzy join (deletion-
    neighbourhood keys at τ=1 — constant per-string fan-out, one
    key shuffle, never n², immune to shared-affix corpora); cluster
    resolution reuses ``cc_fixpoint`` (analytics.py), the min-label +
    POINTER-JUMPING iteration, so convergence is O(log diameter)
    rounds — sequential-ID name graphs form long digit-chain
    components where plain propagation pays the full diameter
    (measured: 23.6 s → 18.2 s at sf0.1 from the switch). The driver
    loop reads only a changed-row count per round. The oracle reaches
    the identical fixpoint by UNION-distinct recursion."""
    from micmac_li3ds_spark.operators.analytics import cc_fixpoint

    names = (
        load(spark, sf_dir, "customer")
        .select(F.col("c_name").alias("n"))
        .distinct()
    )
    pairs = fuzzy_self_join(names, 1).select(
        F.col("name_a").alias("u"), F.col("name_b").alias("v")
    )
    lbl, _rounds = cc_fixpoint(pairs)
    w = Window.partitionBy("canonical")
    return (
        names.join(lbl, names.n == lbl.node, "left")
        .select(
            F.col("n").alias("name"),
            F.coalesce(F.col("lbl"), F.col("n")).alias("canonical"),
        )
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
    )


_CELL = 16  # grid cell edge ≥ box edge ⇒ a box overlaps ≤ 2 cells per axis


@register(
    "q_join_spatial_grid",
    oracle="""
WITH pts AS (
  SELECT l_orderkey * 10 + l_linenumber AS point_id,
         l_partkey % 1000 AS px, l_suppkey % 1000 AS py,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
),
boxes AS (
  SELECT s_suppkey AS box_id,
         (s_suppkey * 97) % 1000 AS cx, (s_suppkey * 53) % 1000 AS cy
  FROM supplier
)
SELECT b.box_id,
       COUNT(*) AS n_points,
       CAST(SUM(p.qty) AS BIGINT) AS sum_qty
FROM boxes b JOIN pts p
  ON p.px BETWEEN b.cx - 8 AND b.cx + 8
 AND p.py BETWEEN b.cy - 8 AND b.cy + 8
GROUP BY b.box_id
""",
    tags=("join", "spatial", "range"),
)
def q_join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D spatial containment join (points-in-boxes) via GRID-CELL
    decomposition — the LiDAR/photogrammetry workload shape behind the
    reference's sensor data (which points does each sensor footprint
    see?), and the standard rewrite that keeps a spatial join off the
    BroadcastNestedLoop/cartesian path: snap each point to its grid
    cell (one row), explode each query box to the ≤4 cells it can
    overlap (cell edge ≥ box edge), equi-join on the cell id, then
    verify exact containment with the BETWEEN predicate. The fan-out
    is constant (≤4 per box, 1 per point), the join is a plain hash
    join on an integer cell key, and the per-box aggregate partitions
    on the same key the verify filter preserved. At 100 TB the cell id
    doubles as the partition/bucket key (Morton/Z-order interleave for
    locality across both axes); skewed cells (a downtown of points)
    get the same salting levers as any hot hash key. Coordinates are
    integers derived deterministically from corpus keys, so both
    engines compute identical geometry; the oracle is the brute-force
    range join this decomposition replaces."""
    li = load(spark, sf_dir, "lineitem")
    pts = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("point_id"),
        (F.col("l_partkey") % 1000).alias("px"),
        (F.col("l_suppkey") % 1000).alias("py"),
        F.col("l_quantity").cast("long").alias("qty"),
    ).withColumn(
        "cell",
        (F.col("px") / _CELL).cast("long") * 1000
        + (F.col("py") / _CELL).cast("long"),
    )
    boxes = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("box_id"),
        ((F.col("s_suppkey") * 97) % 1000).alias("cx"),
        ((F.col("s_suppkey") * 53) % 1000).alias("cy"),
    )
    cell_x = lambda c: (c / _CELL).cast("long")  # noqa: E731
    box_cells = boxes.select(
        "box_id",
        "cx",
        "cy",
        F.explode(
            F.array_distinct(
                F.array(
                    *[
                        cell_x(F.greatest(F.col("cx") + dx, F.lit(0))) * 1000
                        + cell_x(F.greatest(F.col("cy") + dy, F.lit(0)))
                        for dx in (-8, 8)
                        for dy in (-8, 8)
                    ]
                )
            )
        ).alias("cell"),
    )
    return (
        pts.join(F.broadcast(box_cells), "cell")
        .filter(
            F.col("px").between(F.col("cx") - 8, F.col("cx") + 8)
            & F.col("py").between(F.col("cy") - 8, F.col("cy") + 8)
        )
        .groupBy("box_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("qty").alias("sum_qty"),
        )
    )
