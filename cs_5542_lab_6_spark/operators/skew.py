"""Skew-handling and approximate-aggregation operators.

SURVEY §4.2/§7.3 call out the reference's skew blindness (the 25M-edge
dict accumulation, data/ingestion.py:312,362) and §2.4 notes A1 should
become ``approx_count_distinct`` at 100 TB. Two scale levers, both as
checkable operators:

- salted two-phase aggregation: hot grouping keys (5 event types across
  100k+ rows) are split across N salt buckets for the first shuffle, then
  re-combined — the manual fallback when AQE skew handling can't help
  (aggregation skew, not join skew). Results are provably identical to
  the direct groupBy (same oracle).
- approximate distinct/quantiles: HLL + KLL sketches for the counts the
  reference computes exactly per node (A1) — constant memory per key at
  any scale; the test pins sketch error against the exact values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

SALT_BUCKETS = 16


@query(
    "events_salted_type_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_salted_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted aggregation: phase 1 groups on (event_type, salt) so a hot
    key's rows spread over {SALT_BUCKETS} reducers; phase 2 re-aggregates
    the partials per key. The oracle is the plain GROUP BY — salting must
    be invisible in the result. Decimal accumulation keeps the re-combined
    sum order-independent.

    (With only 5 distinct keys, *map-side partial aggregation* already
    defuses this case; the operator exists for the high-cardinality-with-
    hot-head distributions where partials alone spill.)"""
    ev = load_table(spark, sf_dir, "events")
    salt = F.pmod(F.col("event_id"), F.lit(SALT_BUCKETS))
    partial = (
        ev.withColumn("salt", salt)
        .groupBy("event_type", "salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("pv"),
        )
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n_events"),
            F.sum("pv").cast("double").alias("total_value"),
        )
        .orderBy("event_type")
    )


def _orders_approx_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw sketch values per order status: HyperLogLog++ distinct
    customers (the A1 count at 100 TB — constant memory vs the exact
    hash set) and approximate total-price quantiles. Deterministic for a
    fixed input (the sketches are deterministic algorithms), but not
    SQL-oracle-comparable since DuckDB's sketches differ — so the raw
    values stay a private helper (consumed by ``orders_exact_stats``'s
    envelope booleans and the unit tests) while the REGISTERED
    ``orders_approx_stats`` emits the hash-checkable decisions.

    Quantiles surface as one scalar column each (p50/p90/p99) — the
    driver's canonicalizer can't hash array-typed cells."""
    o = load_table(spark, sf_dir, "orders")
    q = F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10000)
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
            q.alias("pq"),
            F.count("*").alias("n_orders"),
        )
        .select(
            "o_orderstatus",
            "approx_customers",
            F.element_at("pq", 1).alias("price_p50"),
            F.element_at("pq", 2).alias("price_p90"),
            F.element_at("pq", 3).alias("price_p99"),
            "n_orders",
        )
        .orderBy("o_orderstatus")
    )


@query(
    "orders_approx_stats",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           TRUE AS approx_customers_ok,
           TRUE AS price_p50_ok, TRUE AS price_p90_ok, TRUE AS price_p99_ok
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def orders_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates per order status, emitted as DECISIONS (r13
    verdict item 1): the HLL++ distinct-customer estimate and each
    approximate price quantile are compared to exact values computed in
    the SAME single aggregation, and the output carries the envelope
    booleans the oracle states TRUE — a sketch drifting out of its band
    becomes a driver hash mismatch, upgrading the reference's
    count-check verification idiom (data/ingestion.py:511-551) to
    value-checks. The raw estimates themselves (``_orders_approx_raw``)
    are not oracle-comparable; the decision IS (the CMS/AMS/KMV idiom
    below).

    Envelopes: HLL |Δ| ≤ max(3, 5%·exact) (~2.5-sigma at rsd 0.02 —
    tighter than 3-sigma on purpose: a false mismatch here is a loud
    driver-row failure, not a silent one, and the band has held since
    r8); each
    percentile_approx value (accuracy 10000 ⇒ rank error ≤ 1e-4) must
    land between the exact interpolated quantiles at q ± 0.01 (100x
    slack; p99's upper bound is the group max).

    Scale shape: ONE map-side-combined groupBy computes sketch and
    exact sides together — one shuffle on the 3-value status key; the
    exact countDistinct/percentile audit is affordable only because the
    group cardinality is bounded, which is exactly when you can afford
    to certify the sketch you'd serve at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    apq = F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10000)
    # exact quantiles at q ± 0.01 = the rank envelope, computed from a
    # single per-group ordering (array form, same trick as
    # orders_exact_stats below); p99's upper bound is max()
    epq = F.percentile(
        "o_totalprice",
        F.array(*[F.lit(x) for x in (0.49, 0.51, 0.89, 0.91, 0.98)]),
    )
    g = o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("_ac"),
        apq.alias("_apq"),
        F.countDistinct("o_custkey").alias("_nd"),
        epq.alias("_epq"),
        F.count("*").alias("n_orders"),
        F.max("o_totalprice").alias("_hi"),
    )
    cd_ok = F.abs(F.col("_ac") - F.col("_nd")) <= F.greatest(
        F.lit(3), F.lit(0.05) * F.col("_nd")
    )
    return (
        g.select(
            "o_orderstatus",
            "n_orders",
            cd_ok.alias("approx_customers_ok"),
            F.element_at("_apq", 1)
            .between(F.element_at("_epq", 1), F.element_at("_epq", 2))
            .alias("price_p50_ok"),
            F.element_at("_apq", 2)
            .between(F.element_at("_epq", 3), F.element_at("_epq", 4))
            .alias("price_p90_ok"),
            F.element_at("_apq", 3)
            .between(F.element_at("_epq", 5), F.col("_hi"))
            .alias("price_p99_ok"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "orders_exact_stats",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           CAST(percentile_cont(0.5)  WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE) AS price_p50,
           CAST(percentile_cont(0.9)  WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE) AS price_p90,
           CAST(percentile_cont(0.99) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE) AS price_p99,
           COUNT(*) AS n_orders,
           TRUE AS cd_in_envelope,
           TRUE AS pq_in_envelope
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def orders_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXACT twin of ``orders_approx_stats`` (r8 verdict item 3):
    per-status exact distinct customers and exact interpolated
    percentiles — the exact VALUES, where the sketch query (since r14)
    emits the envelope decisions.

    The pair is self-verifying: the two envelope booleans join the
    sketch query's own output and assert, IN THE DRIVER-CHECKED RESULT,
    that the HLL distinct estimate lands within its ~2.5-sigma band
    (|Δ| ≤ max(3, 5%·exact) at rsd 0.02) and each approx percentile lands between
    the exact quantiles ±0.01 rank (percentile_approx accuracy 10000 ⇒
    rank error ≤ 1e-4; 100x slack). The oracle states TRUE — a sketch
    drifting out of its envelope is a driver hash mismatch, not just a
    pytest failure.

    Scale note: exact COUNT(DISTINCT) and exact per-group percentiles
    shuffle every row to its group; with 3 statuses this is the
    bounded-cardinality case where exact is affordable — the sketch twin
    is the 100 TB default (constant memory, map-side mergeable)."""
    o = load_table(spark, sf_dir, "orders")
    # ONE array-percentile aggregate, not eight scalar ones: each
    # F.percentile call is its own aggregate function (its own sort of
    # the group's values); the array form computes every quantile —
    # including the rank-envelope bounds at q ± 0.01, never emitted,
    # only compared — from a single per-group ordering (measured 3.7s →
    # ~1s at sf0.1, it was the #2 bench entry as eight aggregates)
    pq = F.percentile(
        "o_totalprice",
        F.array(*[F.lit(x) for x in (0.5, 0.9, 0.99, 0.49, 0.51, 0.89, 0.91, 0.98)]),
    )
    exact = (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("exact_customers"),
            pq.alias("_pq"),
            F.count("*").alias("n_orders"),
            F.max("o_totalprice").alias("_p99_hi"),
        )
        .select(
            "o_orderstatus",
            "exact_customers",
            F.element_at("_pq", 1).alias("price_p50"),
            F.element_at("_pq", 2).alias("price_p90"),
            F.element_at("_pq", 3).alias("price_p99"),
            "n_orders",
            F.element_at("_pq", 4).alias("_p50_lo"),
            F.element_at("_pq", 5).alias("_p50_hi"),
            F.element_at("_pq", 6).alias("_p90_lo"),
            F.element_at("_pq", 7).alias("_p90_hi"),
            F.element_at("_pq", 8).alias("_p99_lo"),
            "_p99_hi",
        )
    )
    approx = _orders_approx_raw(spark, sf_dir).select(
        "o_orderstatus",
        F.col("approx_customers").alias("_ac"),
        F.col("price_p50").alias("_a50"),
        F.col("price_p90").alias("_a90"),
        F.col("price_p99").alias("_a99"),
    )
    cd_ok = F.abs(F.col("_ac") - F.col("exact_customers")) <= F.greatest(
        F.lit(3), F.lit(0.05) * F.col("exact_customers")
    )
    pq_ok = (
        F.col("_a50").between(F.col("_p50_lo"), F.col("_p50_hi"))
        & F.col("_a90").between(F.col("_p90_lo"), F.col("_p90_hi"))
        & F.col("_a99").between(F.col("_p99_lo"), F.col("_p99_hi"))
    )
    return (
        exact.join(approx, "o_orderstatus")
        .select(
            "o_orderstatus",
            "exact_customers",
            "price_p50",
            "price_p90",
            "price_p99",
            "n_orders",
            cd_ok.alias("cd_in_envelope"),
            pq_ok.alias("pq_in_envelope"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "nation_price_medians",
    oracle="""
    SELECT n_name,
           COUNT(*) AS n_orders,
           CAST(median(o_totalprice) AS DOUBLE) AS median_price,
           CAST(percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE) AS p25,
           CAST(percentile_cont(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE) AS p75
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def nation_price_medians(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group percentiles (median/p25/p75 of order price per
    nation) — the precise counterpart of orders_approx_stats' sketches.
    percentile_cont interpolates between the two neighboring order
    statistics ((a+b)*fraction arithmetic — identical IEEE in both
    engines), so unlike the KLL sketch this IS oracle-checkable.

    Scale note: exact percentiles need the group's values together —
    one shuffle on the group key with per-group sort. Fine for bounded
    groups (25 nations); for high-cardinality keys or global percentiles
    at 100 TB, the approx sketch (orders_approx_stats) is the right tool
    — this pair of queries IS that trade-off, made explicit."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.median("o_totalprice").alias("median_price"),
            F.percentile("o_totalprice", F.lit(0.25)).alias("p25"),
            F.percentile("o_totalprice", F.lit(0.75)).alias("p75"),
        )
        .orderBy("n_name")
    )


HH_TOP_K = 10


def _events_hh_sketch_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw heavy-hitter sketch output via Spark 4.1's sketch surface:
    ``approx_top_k`` proposes the top-{HH_TOP_K} most frequent user_ids
    with approximate counts, and an Apache DataSketches HLL
    (``hll_sketch_agg``/``hll_sketch_estimate``) estimates the distinct
    user universe those hitters dominate — the streaming-friendly pair a
    100 TB event feed uses where an exact groupBy-count would shuffle
    every row (both sketches are map-side mergeable, constant memory).
    Deterministic for a fixed input, but not SQL-oracle-comparable
    (DuckDB's sketches differ), so the raw values stay a private helper
    (consumed by both decision queries' envelope booleans and the unit
    tests) while the REGISTERED ``events_heavy_hitters_sketch`` emits
    the hash-checkable decisions."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_hh_v")
    top = spark.sql(
        f"SELECT explode(approx_top_k(user_id, {HH_TOP_K})) AS e FROM events_hh_v"
    ).select(
        F.col("e.item").cast("long").alias("user_id"),
        F.col("e.count").cast("long").alias("approx_count"),
    )
    universe = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
        .cast("long")
        .alias("approx_distinct_users")
    )
    return (
        top.crossJoin(F.broadcast(universe))
        .orderBy(F.desc("approx_count"), F.asc("user_id"))
    )


@query(
    "events_heavy_hitters_sketch",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_users,
           CAST(LEAST({HH_TOP_K}, COUNT(DISTINCT user_id)) AS BIGINT)
             AS n_sketch_rows,
           TRUE AS counts_in_envelope,
           TRUE AS hll_in_envelope,
           TRUE AS certain_hitters_covered
    FROM events
    """,
)
def events_heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter sketch certification, emitted as DECISIONS (r13
    verdict item 1, the CMS/AMS/KMV idiom): one row with the
    exact-derivable anchors (stream size, distinct users, sketch row
    count = min(k, distinct)) plus three envelope booleans the oracle
    states TRUE — a sketch regression becomes a driver hash mismatch:

    - ``counts_in_envelope`` — every approx_top_k count is within 1% of
      stream size of its exact count;
    - ``hll_in_envelope`` — the HLL distinct-user estimate is within its
      ~3-sigma default-precision band (|Δ| ≤ max(2, 5%·exact));
    - ``certain_hitters_covered`` — every user whose exact count
      STRICTLY exceeds the k-th largest count appears in the sketch set
      (the tie-robust recall guarantee: rank inversions among ties are
      legitimate sketch behavior, missing a dominant key is not).

    Scale shape: the sketch side is two map-side-mergeable aggregations
    over a column projection; the exact audit is one combined groupBy
    count + TakeOrderedAndProject top-k, joined against the ≤k-row
    broadcast sketch output. The raw sketch subtree is eagerly cut
    (localCheckpoint) because it feeds three consumers."""
    ev = load_table(spark, sf_dir, "events")
    # eager cut: ≤ HH_TOP_K rows feeding the counts join, the anti-join
    # coverage probe, and the HLL aggregate — without it each consumer
    # re-instantiates the full events scan + sketch aggregation
    sketch = _events_hh_sketch_raw(spark, sf_dir).localCheckpoint(eager=True)
    counts = ev.groupBy("user_id").agg(F.count("*").alias("_exact"))
    totals = ev.agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_distinct_users"),
    )
    # k-th largest exact count: distributed top-k (TakeOrderedAndProject),
    # then a 1-row min — the "certain hitter" threshold
    kth = (
        counts.orderBy(F.desc("_exact"), F.asc("user_id"))
        .limit(HH_TOP_K)
        .agg(F.min("_exact").alias("_kth"))
    )
    per = counts.join(F.broadcast(sketch), "user_id")  # ≤ k rows survive
    sk_agg = per.agg(
        F.count("*").cast("bigint").alias("n_sketch_rows"),
        F.max(F.abs(F.col("approx_count") - F.col("_exact"))).alias("_max_dev"),
        F.max("approx_distinct_users").alias("_hll"),
    )
    missed = (
        counts.crossJoin(F.broadcast(kth))
        .filter(F.col("_exact") > F.col("_kth"))
        .join(F.broadcast(sketch.select("user_id")), "user_id", "left_anti")
        .agg(F.count("*").alias("_n_missed"))
    )
    counts_ok = F.coalesce(
        F.col("_max_dev")
        <= F.greatest(F.lit(1.0), F.lit(0.01) * F.col("n_events")),
        F.lit(True),  # empty sketch ⇒ vacuously true (n_sketch_rows pins it)
    )
    hll_ok = F.coalesce(
        F.abs(F.col("_hll") - F.col("n_distinct_users"))
        <= F.greatest(F.lit(2), F.lit(0.05) * F.col("n_distinct_users")),
        F.lit(True),  # empty sketch ⇒ _hll is NULL ⇒ vacuously true, same
        # rule as counts_ok (n_sketch_rows/n_distinct_users pin the case)
    )
    return (
        totals.crossJoin(F.broadcast(sk_agg))
        .crossJoin(F.broadcast(missed))
        .select(
            "n_events",
            "n_distinct_users",
            "n_sketch_rows",
            counts_ok.alias("counts_in_envelope"),
            hll_ok.alias("hll_in_envelope"),
            (F.col("_n_missed") == 0).alias("certain_hitters_covered"),
        )
    )


@query(
    "events_heavy_hitters_exact",
    oracle=f"""
    WITH c AS (
      SELECT user_id, COUNT(*) AS exact_count FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT user_id, exact_count,
             row_number() OVER (ORDER BY exact_count DESC, user_id) AS rank
      FROM c
    )
    SELECT CAST(rank AS INTEGER) AS rank, user_id, exact_count,
           TRUE AS approx_count_ok, TRUE AS hll_ok
    FROM ranked WHERE rank <= {HH_TOP_K}
    ORDER BY rank
    """,
)
def events_heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXACT twin of ``events_heavy_hitters_sketch`` (r8 verdict
    item 3): the true top-{HH_TOP_K} users by event count, fully
    hash-checkable, carrying two driver-verified envelope booleans that
    pin the sketch query's output to the truth:

    - ``approx_count_ok`` — the sketch's approximate count for this
      user (left join on the sketch's own output; NULL when the sketch
      omitted the user, which is legitimate near ties) is within 1% of
      stream size of the exact count;
    - ``hll_ok`` — the sketch's HLL distinct-user estimate is within
      its ~3-sigma default-precision band (|Δ| ≤ max(2, 5%·exact)).

    The oracle states TRUE for both — a sketch regression becomes a
    driver hash mismatch. (Since r14 the sketch query itself also emits
    hash-checked decisions; this twin pins the exact VALUES and the
    per-user count envelope the 1-row decision query can't carry.)

    Scale note: the exact top-k shuffles one (user_id, partial-count)
    row per key per map partition (map-side combine), then
    TakeOrderedAndProject — affordable for bounded key sets; the sketch
    twin is the unbounded-cardinality default."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    counts = ev.groupBy("user_id").agg(F.count("*").alias("exact_count"))
    # TakeOrderedAndProject FIRST (distributed top-k, no global sort),
    # then rank the K-row result — a corpus-wide row_number window would
    # funnel every key through one partition
    head = counts.orderBy(F.desc("exact_count"), F.asc("user_id")).limit(
        HH_TOP_K
    )
    rank = F.row_number().over(
        W.orderBy(F.desc("exact_count"), F.asc("user_id"))
    )
    topk = head.withColumn("rank", rank).select(
        "rank", "user_id", "exact_count"
    )
    totals = ev.agg(
        F.count("*").alias("_n_events"),
        F.countDistinct("user_id").alias("_nd_users"),
    )
    # eager cut: the sketch output is HH_TOP_K rows, and it feeds BOTH
    # the per-user left join and the 1-row HLL aggregate below — without
    # the cut, each consumer re-instantiates the full events scan +
    # sketch aggregation (two extra passes per action)
    sketch = (
        _events_hh_sketch_raw(spark, sf_dir)
        .select(
            "user_id",
            F.col("approx_count").alias("_ac"),
            F.col("approx_distinct_users").alias("_hll"),
        )
        .localCheckpoint(eager=True)
    )
    count_ok = F.col("_ac").isNull() | (
        F.abs(F.col("_ac") - F.col("exact_count"))
        <= F.greatest(F.lit(1), F.lit(0.01) * F.col("_n_events"))
    )
    # the HLL estimate is a property of the sketch output as a whole,
    # computed as an independent 1-row aggregate and broadcast — it must
    # not depend on whether any exact top-k user survived the join (a
    # near-tie miss would otherwise turn hll_ok NULL)
    hll_agg = sketch.agg(F.max("_hll").alias("_hll_est"))
    hll_ok = F.abs(F.col("_hll_est") - F.col("_nd_users")) <= F.greatest(
        F.lit(2), F.lit(0.05) * F.col("_nd_users")
    )
    return (
        topk.join(sketch.drop("_hll"), "user_id", "left")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(hll_agg))
        .select(
            "rank",
            "user_id",
            "exact_count",
            count_ok.alias("approx_count_ok"),
            hll_ok.alias("hll_ok"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Count-Min Sketch heavy hitters (deterministic sketch, exact-checkable)
# ---------------------------------------------------------------------------

from ..functions.text import DUCK_TOKEN_HASH, token_hash  # noqa: E402

CMS_D = 3      # hash rows
CMS_W = 1024   # counters per row
# envelope: overestimate <= (3/W) * N  (looser than the CMS guarantee's
# e/W at delta = e^-3, so the boolean is TRUE unless the sketch breaks)
CMS_EPS_NUM = 3


def _cms_pos_duck(key_sql: str, j: int) -> str:
    h = DUCK_TOKEN_HASH.format(t=f"concat('cms{j}|', CAST({key_sql} AS VARCHAR))")
    return f"(({h}) % {CMS_W})"


@query(
    "events_cms_heavy_hitters",
    oracle=f"""
    WITH counters AS (
      {" UNION ALL ".join(
          f"SELECT {j} AS j, {_cms_pos_duck('user_id', j)} AS pos, COUNT(*) AS c "
          "FROM events GROUP BY 2"
          for j in range(CMS_D)
      )}
    ),
    exact AS (
      SELECT user_id, COUNT(*) AS exact_count FROM events GROUP BY user_id
    ),
    topk AS (
      SELECT user_id, exact_count,
             row_number() OVER (ORDER BY exact_count DESC, user_id) AS rank
      FROM exact
      ORDER BY exact_count DESC, user_id LIMIT 10
    ),
    probes AS (
      SELECT t.rank, t.user_id, t.exact_count, co.j, co.c
      FROM topk t
      JOIN counters co
        ON (   {" OR ".join(
                 f"(co.j = {j} AND co.pos = {_cms_pos_duck('t.user_id', j)})"
                 for j in range(CMS_D)
               )} )
    ),
    est AS (
      SELECT rank, user_id, exact_count,
             CAST(MIN(c) AS BIGINT) AS cms_estimate
      FROM probes GROUP BY rank, user_id, exact_count
    ),
    n AS (SELECT COUNT(*) AS n_events FROM events)
    SELECT CAST(rank AS INTEGER) AS rank, user_id,
           CAST(exact_count AS BIGINT) AS exact_count, cms_estimate,
           (cms_estimate >= exact_count) AS never_underestimates,
           (cms_estimate - exact_count
              <= greatest(1, CAST(floor({CMS_EPS_NUM} * n.n_events * 1.0
                                        / {CMS_W}) AS BIGINT)))
             AS within_eps_bound
    FROM est, n
    ORDER BY rank
    """,
)
def events_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch frequency estimation (Cormode & Muthukrishnan
    2005) — the third sketch next to the built-in HLL and
    approx_count families, and unlike them fully DETERMINISTIC: the
    {CMS_D}x{CMS_W} counter matrix is a pure function of the sha-derived
    row hashes, so the driver hash-checks the ESTIMATES themselves, not
    just an envelope. Each of the exact top-10 users is estimated as
    min over rows of its counter, and the output pins both CMS
    guarantees as columns the oracle states TRUE: estimates never
    undercount (every counter includes the key's own occurrences), and
    the overestimate stays within the ~({CMS_EPS_NUM}/{CMS_W})*N bound.

    Scale shape: the sketch build is one map-side-combined aggregation
    per hash row over a column projection — at 100 TB the counter
    matrix is {CMS_D * CMS_W} longs per partition merged by the partial
    agg (sketch LINEARITY: per-partition counter sums merge by
    addition, which is exactly Spark's partial+final HashAggregate),
    and the probe side joins a broadcast of the 3k-row matrix. The
    exact top-k beside it is the accuracy audit, not the serving
    path."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    counters = None
    for j in range(CMS_D):
        part = ev.groupBy(
            (
                token_hash(
                    F.concat(F.lit(f"cms{j}|"), F.col("user_id").cast("string"))
                )
                % CMS_W
            ).alias("pos")
        ).agg(F.count("*").alias("c")).select(F.lit(j).alias("j"), "pos", "c")
        counters = part if counters is None else counters.unionByName(part)
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact_count"))
    head = exact.orderBy(F.desc("exact_count"), F.asc("user_id")).limit(10)
    topk = head.withColumn(
        "rank",
        F.row_number().over(W.orderBy(F.desc("exact_count"), F.asc("user_id"))),
    )
    probes = None
    for j in range(CMS_D):
        part = topk.select(
            "rank",
            "user_id",
            "exact_count",
            F.lit(j).alias("j"),
            (
                token_hash(
                    F.concat(F.lit(f"cms{j}|"), F.col("user_id").cast("string"))
                )
                % CMS_W
            ).alias("pos"),
        )
        probes = part if probes is None else probes.unionByName(part)
    est = (
        probes.join(F.broadcast(counters), ["j", "pos"])
        .groupBy("rank", "user_id", "exact_count")
        .agg(F.min("c").cast("bigint").alias("cms_estimate"))
    )
    n = ev.agg(F.count("*").alias("n_events"))
    bound = F.greatest(
        F.lit(1),
        F.floor(CMS_EPS_NUM * F.col("n_events") * 1.0 / CMS_W).cast("bigint"),
    )
    return (
        est.crossJoin(F.broadcast(n))
        .select(
            F.col("rank").cast("int").alias("rank"),
            "user_id",
            F.col("exact_count").cast("bigint").alias("exact_count"),
            "cms_estimate",
            (F.col("cms_estimate") >= F.col("exact_count")).alias(
                "never_underestimates"
            ),
            (F.col("cms_estimate") - F.col("exact_count") <= bound).alias(
                "within_eps_bound"
            ),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# AMS / count-sketch second moment (F2) — deterministic, exact-checkable
# ---------------------------------------------------------------------------

AMS_D = 3     # independent estimator rows (median taken across them)
AMS_W = 256   # counters per row (variance 2*F2^2 / W)


def _ams_sign_duck(key_sql: str, j: int) -> str:
    h = DUCK_TOKEN_HASH.format(t=f"concat('amss{j}|', CAST({key_sql} AS VARCHAR))")
    return f"(1 - 2 * (({h}) % 2))"


def _ams_pos_duck(key_sql: str, j: int) -> str:
    h = DUCK_TOKEN_HASH.format(t=f"concat('amsp{j}|', CAST({key_sql} AS VARCHAR))")
    return f"(({h}) % {AMS_W})"


@query(
    "events_ams_f2_sketch",
    oracle=f"""
    WITH buckets AS (
      {" UNION ALL ".join(
          f"SELECT {j} AS j, {_ams_pos_duck('user_id', j)} AS pos, "
          f"CAST(SUM({_ams_sign_duck('user_id', j)}) AS BIGINT) AS z "
          "FROM events GROUP BY 2"
          for j in range(AMS_D)
      )}
    ),
    rows_ AS (
      SELECT j, CAST(SUM(z * z) AS BIGINT) AS est FROM buckets GROUP BY j
    ),
    med AS (
      SELECT CAST(SUM(est) - MAX(est) - MIN(est) AS BIGINT) AS ams_f2
      FROM rows_
    ),
    exact AS (
      SELECT CAST(SUM(c * c) AS BIGINT) AS exact_f2 FROM (
        SELECT COUNT(*) AS c FROM events GROUP BY user_id
      )
    )
    SELECT exact_f2, ams_f2,
           round(CAST(ams_f2 AS DOUBLE) / exact_f2, 4) AS est_ratio,
           (ams_f2 * 2 >= exact_f2 AND ams_f2 <= 2 * exact_f2)
             AS within_2x_bound
    FROM exact, med
    """,
)
def events_ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-moment (F2) estimation via the count-sketch estimator
    (Alon, Matias & Szegedy 1996; Charikar et al. 2002) — completing
    the sketch triad: CMS for frequencies, HLL for cardinality, AMS for
    moments. F2 = sum of squared key frequencies is the self-join size
    / repeat-rate statistic a 100 TB planner wants without a
    per-key aggregation: each of {AMS_D} rows hashes keys into {AMS_W}
    signed counters (sign and bucket from the shared sha scheme), the
    row estimate is the sum of squared counters (unbiased, relative
    std ~ sqrt(2/{AMS_W}) ≈ 9%), and the reported estimate is the
    median across rows. Signs and buckets are deterministic, so the
    ESTIMATE ITSELF is hash-checked against the oracle — the 2x
    envelope boolean is belt-and-braces, not the only check.

    Scale shape: one map-side-combined aggregation over a projection —
    {AMS_D * AMS_W} signed longs per partition, merged by addition
    (sketch linearity = Spark's partial+final agg); the exact F2 beside
    it is the audit, affordable only at bounded key cardinality."""
    ev = load_table(spark, sf_dir, "events")
    buckets = None
    for j in range(AMS_D):
        u = F.col("user_id").cast("string")
        sign = 1 - 2 * (token_hash(F.concat(F.lit(f"amss{j}|"), u)) % 2)
        pos = token_hash(F.concat(F.lit(f"amsp{j}|"), u)) % AMS_W
        part = (
            ev.groupBy(pos.alias("pos"))
            .agg(F.sum(sign).cast("bigint").alias("z"))
            .select(F.lit(j).alias("j"), "pos", "z")
        )
        buckets = part if buckets is None else buckets.unionByName(part)
    rows = buckets.groupBy("j").agg(
        F.sum(F.col("z") * F.col("z")).cast("bigint").alias("est")
    )
    med = rows.agg(
        (F.sum("est") - F.max("est") - F.min("est")).cast("bigint").alias("ams_f2")
    )
    exact = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("bigint").alias("exact_f2"))
    )
    return exact.crossJoin(F.broadcast(med)).select(
        "exact_f2",
        "ams_f2",
        F.round(F.col("ams_f2").cast("double") / F.col("exact_f2"), 4).alias(
            "est_ratio"
        ),
        (
            (F.col("ams_f2") * 2 >= F.col("exact_f2"))
            & (F.col("ams_f2") <= 2 * F.col("exact_f2"))
        ).alias("within_2x_bound"),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — deterministic, mergeable
# ---------------------------------------------------------------------------

KMV_K = 64
_KMV_MAX = float(1 << 60)  # token_hash60 range


def _kmv_hash_duck(key_sql: str) -> str:
    from ..functions.text import DUCK_TOKEN_HASH60

    return DUCK_TOKEN_HASH60.format(
        t=f"concat('kmv|', CAST({key_sql} AS VARCHAR))"
    )


@query(
    "events_kmv_distinct",
    oracle=f"""
    WITH uh AS (
      SELECT DISTINCT event_type, user_id,
             {_kmv_hash_duck('user_id')} AS h
      FROM events
    ),
    per_type AS (
      SELECT event_type AS scope, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM uh
    ),
    global_ AS (
      SELECT 'all' AS scope, h,
             row_number() OVER (ORDER BY h) AS rn
      FROM (SELECT DISTINCT user_id, h FROM uh)
    ),
    merged AS (
      SELECT 'union_merge' AS scope, h,
             row_number() OVER (ORDER BY h) AS rn
      FROM (SELECT DISTINCT h FROM per_type WHERE rn <= {KMV_K})
    ),
    sketches AS (
      SELECT scope, MAX(h) AS kth, COUNT(*) AS k_used FROM (
        SELECT * FROM per_type WHERE rn <= {KMV_K}
        UNION ALL SELECT * FROM global_ WHERE rn <= {KMV_K}
        UNION ALL SELECT * FROM merged WHERE rn <= {KMV_K}
      ) GROUP BY scope
    ),
    exact AS (
      SELECT event_type AS scope, COUNT(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type
      UNION ALL
      SELECT 'all', COUNT(DISTINCT user_id) FROM events
      UNION ALL
      SELECT 'union_merge', COUNT(DISTINCT user_id) FROM events
    )
    SELECT s.scope, CAST(e.exact_distinct AS BIGINT) AS exact_distinct,
           CAST(s.k_used AS INTEGER) AS k_used,
           CAST(s.kth AS BIGINT) AS kth_hash,
           round(CASE WHEN s.k_used < {KMV_K} THEN s.k_used * 1.0
                      ELSE (s.k_used - 1) * ({_KMV_MAX} / s.kth) END, 4)
             AS kmv_estimate,
           (abs(CASE WHEN s.k_used < {KMV_K} THEN s.k_used * 1.0
                     ELSE (s.k_used - 1) * ({_KMV_MAX} / s.kth) END
                - e.exact_distinct) <= 0.5 * e.exact_distinct) AS err_ok
    FROM sketches s JOIN exact e ON e.scope = s.scope
    ORDER BY s.scope
    """,
)
def events_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct-count sketch
    (Bar-Yossef et al. 2002) — the deterministic, hash-checkable
    cardinality sketch next to the built-in (opaque) HLL: keep the
    {KMV_K} smallest 60-bit key hashes; estimate = (k-1) * range/kth.
    One scope row per event_type, one for the full stream, and one
    ``union_merge`` row built by MERGING the per-type sketches — KMV's
    lossless mergeability (the union's bottom-k is contained in the
    union of per-partition bottom-k's) makes the merged row's kth hash
    and estimate EXACTLY equal the direct 'all' row, and the driver
    hash-check pins that equality. Sets with fewer than k distinct keys
    fall back to the exact count (k_used), the standard KMV small-set
    rule.

    Scale shape: per-scope bottom-k is a rank-window over the DISTINCT
    (type, user-hash) relation — WindowGroupLimit keeps k rows per
    partition before the sort; the sketches themselves are {KMV_K}
    longs per scope, the mergeable artifact a 100 TB pipeline ships to
    the coordinator instead of re-scanning for every COUNT(DISTINCT)."""
    from pyspark.sql import Window as W

    from ..functions.text import token_hash60

    ev = load_table(spark, sf_dir, "events")
    uh = (
        ev.select("event_type", "user_id")
        .distinct()
        .withColumn(
            "h",
            token_hash60(
                F.concat(F.lit("kmv|"), F.col("user_id").cast("string"))
            ),
        )
    )
    per_type = uh.select(
        F.col("event_type").alias("scope"),
        "h",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("h"))
        .alias("rn"),
    )
    global_ = (
        uh.select("user_id", "h")
        .distinct()
        .select(
            F.lit("all").alias("scope"),
            "h",
            F.row_number().over(W.orderBy("h")).alias("rn"),
        )
    )
    merged = (
        per_type.filter(F.col("rn") <= KMV_K)
        .select("h")
        .distinct()
        .select(
            F.lit("union_merge").alias("scope"),
            "h",
            F.row_number().over(W.orderBy("h")).alias("rn"),
        )
    )
    sketches = (
        per_type.filter(F.col("rn") <= KMV_K)
        .unionByName(global_.filter(F.col("rn") <= KMV_K))
        .unionByName(merged.filter(F.col("rn") <= KMV_K))
        .groupBy("scope")
        .agg(F.max("h").alias("kth"), F.count("*").alias("k_used"))
    )
    exact = (
        ev.groupBy(F.col("event_type").alias("scope"))
        .agg(F.count_distinct("user_id").alias("exact_distinct"))
        .unionByName(
            ev.agg(
                F.lit("all").alias("scope"),
                F.count_distinct("user_id").alias("exact_distinct"),
            )
        )
        .unionByName(
            ev.agg(
                F.lit("union_merge").alias("scope"),
                F.count_distinct("user_id").alias("exact_distinct"),
            )
        )
    )
    est = F.when(
        F.col("k_used") < KMV_K, F.col("k_used") * 1.0
    ).otherwise((F.col("k_used") - 1) * (F.lit(_KMV_MAX) / F.col("kth")))
    return (
        sketches.join(exact, "scope")
        .select(
            "scope",
            F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
            F.col("k_used").cast("int").alias("k_used"),
            F.col("kth").cast("bigint").alias("kth_hash"),
            F.round(est, 4).alias("kmv_estimate"),
            (
                F.abs(est - F.col("exact_distinct"))
                <= 0.5 * F.col("exact_distinct")
            ).alias("err_ok"),
        )
        .orderBy("scope")
    )
