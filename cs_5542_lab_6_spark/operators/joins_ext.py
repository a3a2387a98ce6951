"""Extended join / set / grouping operators beyond the reference's surface.

SURVEY §2.3 notes the reference has no sort-merge/range/as-of joins, no
semi/anti beyond what the engine already added, and §2.7 notes INTERSECT /
EXCEPT are absent; §2.4 lacks cube/grouping-sets. These are table stakes
for an analytics engine, so they're first-class oracle-backed operators
here, each implemented in its scale-correct shape:

- as-of join: union + ignore-nulls window carry-forward — one shuffle on
  the partition key, no per-row probe (the classic distributed as-of).
- range join: time-bucketed self equi-join on (user, bucket) with the
  ±1-bucket overlap trick, so proximity search never degenerates into the
  O(n²) inequality-only nested loop.
- intersect/except: Spark's INTERSECT/EXCEPT (hash-based set ops).
- cube: map-side grouping-set expansion, one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

RANGE_WINDOW_MIN = 10  # range-join proximity window (minutes)


@query(
    "events_asof_last_click",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type = 'click' THEN ts END AS click_ts
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    carried AS (
      SELECT *,
             last_value(click_ts IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS asof_click_ts
      FROM tagged
    )
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
           asof_click_ts,
           (epoch_us(ts) - epoch_us(asof_click_ts)) // 1000000 AS seconds_since_click
    FROM carried
    WHERE event_type = 'purchase'
    ORDER BY purchase_id
    """,
)
def events_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every purchase matched to the user's most recent prior
    click. Implemented as the scalable union-and-carry-forward idiom —
    tag click timestamps, ignore-nulls last_value over (user, time) with
    a 1-preceding frame (strictly *before* the purchase), filter to
    purchases. One shuffle on user_id; contrast with the naive
    inequality join which is quadratic per user."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    tagged = ev.withColumn(
        "click_ts", F.when(F.col("event_type") == "click", F.col("ts"))
    )
    frame = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carried = tagged.withColumn(
        "asof_click_ts", F.last("click_ts", ignorenulls=True).over(frame)
    )
    return (
        carried.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "asof_click_ts",
            F.expr(
                "(unix_micros(ts) - unix_micros(asof_click_ts)) div 1000000"
            ).alias("seconds_since_click"),
        )
        .orderBy("purchase_id")
    )


@query(
    "events_range_pairs",
    oracle=f"""
    SELECT a.event_id AS event_a, b.event_id AS event_b, a.user_id,
           a.event_type AS type_a, b.event_type AS type_b,
           (epoch_us(b.ts) - epoch_us(a.ts)) // 1000000 AS gap_seconds
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL '{RANGE_WINDOW_MIN} minutes'
    ORDER BY event_a, event_b
    """,
)
def events_range_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) self-join: pairs of same-user events within
    {RANGE_WINDOW_MIN} minutes. Implemented with the bucketing trick: both
    sides get a {RANGE_WINDOW_MIN}-minute time bucket, the join runs as an
    *equi*-join on (user, bucket) with the right side expanded into its
    own and the preceding bucket, and the exact inequality is a residual
    filter.
    Catalyst executes a hash join on the compound key instead of a
    nested-loop over each user's history — at 100 TB that's the
    difference between a shuffle join and a cross product."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    bucket = (F.unix_timestamp("ts") / (RANGE_WINDOW_MIN * 60)).cast("long")
    a = ev.withColumn("bucket", bucket).alias("a")
    # the right side also lands in the PRECEDING bucket, so a later event
    # one bucket ahead of `a` still shares a's (user, bucket) key; each
    # qualifying pair matches exactly one expanded key
    b = (
        ev.withColumn("b0", bucket)
        .withColumn("bucket", F.explode(F.array(F.col("b0"), F.col("b0") - 1)))
        .alias("b")
    )
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (
            F.col("b.ts")
            <= F.col("a.ts") + F.expr(f"INTERVAL {RANGE_WINDOW_MIN} MINUTES")
        ),
    )
    return pairs.select(
        F.col("a.event_id").alias("event_a"),
        F.col("b.event_id").alias("event_b"),
        F.col("a.user_id").alias("user_id"),
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.expr("(unix_micros(b.ts) - unix_micros(a.ts)) div 1000000").alias(
            "gap_seconds"
        ),
    ).orderBy("event_a", "event_b")


@query(
    "segment_nation_setops",
    oracle="""
    WITH building AS (
      SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'),
    auto AS (
      SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
    SELECT 'intersect' AS op, c_nationkey
    FROM (SELECT c_nationkey FROM building INTERSECT SELECT c_nationkey FROM auto)
    UNION ALL
    SELECT 'except', c_nationkey
    FROM (SELECT c_nationkey FROM building EXCEPT SELECT c_nationkey FROM auto)
    ORDER BY op, c_nationkey
    """,
)
def segment_nation_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + EXCEPT (SURVEY §2.7 gaps) in one tagged result: nations
    with customers in BOTH segments ('intersect') and nations with
    BUILDING customers but no AUTOMOBILE customers ('except'). Both are
    hash-based distinct set operations, one shuffle each; consolidated
    into a single registry entry (was segment_nation_intersect/_except)
    to keep the driver's fixed correctness window on distinct operators."""
    c = load_table(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey")
    both = building.intersect(auto).select(
        F.lit("intersect").alias("op"), "c_nationkey"
    )
    only = building.subtract(auto).select(F.lit("except").alias("op"), "c_nationkey")
    return both.unionByName(only).orderBy("op", "c_nationkey")


@query(
    "order_status_priority_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def order_status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) — all 2^2 grouping sets in one pass
    (SURVEY §2.4 noted cube/rollup as free built-ins; the rollup chain is
    covered by status_priority_grouping_sets). Spark expands grouping
    sets map-side, so the cube still costs one shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "status_priority_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def status_priority_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form cube/rollup specialize
    (SURVEY §2.4). The set list ((s,p),(s),()) is exactly the ROLLUP
    hierarchy, spelled through the general grouping-sets API: one query
    covers both the explicit-sets operator and the rollup totals it
    replaced (formerly status_priority_rollup), in a single scan + single
    shuffle via map-side grouping-set expansion. CUBE keeps its own entry
    (order_status_priority_cube) since its set list differs."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [
                ["o_orderstatus", "o_orderpriority"],
                ["o_orderstatus"],
                [],
            ],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "events_retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS act_week
      FROM events
    )
    SELECT f.cohort_week,
           CAST(datediff('day', f.cohort_week, a.act_week) // 7 AS INTEGER)
             AS week_offset,
           COUNT(*) AS n_active_users
    FROM activity a JOIN first_seen f USING (user_id)
    GROUP BY f.cohort_week, week_offset
    ORDER BY f.cohort_week, week_offset
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-seen week,
    counted once per subsequent active week — the canonical product-
    analytics triangle. Integer-exact everywhere (ISO-Monday date_trunc
    in both engines, day-diff floor-divided by 7). Two hash-aggs and one
    equi-join on user_id; at 100 TB the distinct-week activity set is the
    compact relation (|users| x |weeks|), and first_seen broadcasts when
    the user dimension allows."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("act_week")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .select(
            "cohort_week",
            (F.datediff("act_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )


ANOMALY_Z = 2.0


@query(
    "events_daily_anomaly",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             COUNT(*) AS n_days, SUM(n) AS sx, SUM(n * n) AS sxx
      FROM daily GROUP BY event_type
    )
    SELECT d.event_type, d.day, CAST(d.n AS BIGINT) AS n_events,
           round(CAST(d.n * s.n_days - s.sx AS DOUBLE)
                 / sqrt(CAST(s.n_days * s.sxx - s.sx * s.sx AS DOUBLE)), 4) AS z,
           abs(CAST(d.n * s.n_days - s.sx AS DOUBLE)
               / sqrt(CAST(s.n_days * s.sxx - s.sx * s.sx AS DOUBLE)))
             >= {ANOMALY_Z} AS is_anomaly
    FROM daily d JOIN stats s USING (event_type)
    ORDER BY d.event_type, d.day
    """,
)
def events_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-rate anomaly detection: per-type daily counts z-scored
    against that type's own day-to-day distribution. Engine-exact by
    formulation: with integer count sums (n, Σx, Σx²), the z-score
    collapses to ONE double division of an exact integer numerator by the
    IEEE-correctly-rounded sqrt of an exact integer — no mean/std
    intermediate floats whose op order could diverge between engines.
    Two partial aggs + a tiny per-type stats broadcast; at 100 TB the
    daily rollup is the compact relation and the z-scan is narrow."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n"))
    )
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("n").alias("sx"),
        F.sum(F.col("n") * F.col("n")).alias("sxx"),
    )
    num = (F.col("n") * F.col("n_days") - F.col("sx")).cast("double")
    den = F.sqrt((F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    z = num / den
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "day",
            F.col("n").cast("long").alias("n_events"),
            F.round(z, 4).alias("z"),
            (F.abs(z) >= ANOMALY_Z).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# Event-type transition analysis (first-order Markov path statistics)
# ---------------------------------------------------------------------------

TRANSITION_TOP_K = 15


@query(
    "events_transition_matrix",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ),
    outdeg AS (
      SELECT prev_type, CAST(SUM(n) AS BIGINT) AS total FROM trans GROUP BY 1
    )
    SELECT t.prev_type, t.next_type,
           CAST(t.n AS BIGINT) AS n_transitions,
           round(CAST(t.n AS DOUBLE) / o.total, 4) AS p_transition
    FROM trans t JOIN outdeg o ON t.prev_type = o.prev_type
    ORDER BY n_transitions DESC, t.prev_type, t.next_type
    LIMIT {TRANSITION_TOP_K}
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition statistics over per-user event
    sequences: lag() pairs each event with its predecessor (total order
    ts, event_id — duplicate timestamps can't flip pairs), transitions
    aggregate globally, and each row carries the conditional probability
    P(next | prev). The product-analytics "path analysis" primitive —
    funnels (events_conversion_funnel) are the special case of one
    hand-picked path.

    Scale shape: the lag window shuffles once on user_id (sequences stay
    co-located); the transition agg is map-side combinable over a
    |event_types|² key space; the out-degree normalizer is a tiny
    broadcast join."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n")
    )
    outdeg = trans.groupBy(F.col("prev_type").alias("od_prev")).agg(
        F.sum("n").cast("long").alias("total")
    )
    return (
        trans.join(F.broadcast(outdeg), trans["prev_type"] == F.col("od_prev"))
        .select(
            "prev_type",
            "next_type",
            F.col("n").cast("long").alias("n_transitions"),
            F.round(F.col("n").cast("double") / F.col("total"), 4).alias(
                "p_transition"
            ),
        )
        .orderBy(F.desc("n_transitions"), "prev_type", "next_type")
        .limit(TRANSITION_TOP_K)
    )


@query(
    "events_hourly_seasonality",
    oracle="""
    SELECT CAST(isodow(ts) AS INTEGER) AS day_of_week,
           CAST(hour(ts) AS INTEGER) AS hour_of_day,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases
    FROM events
    GROUP BY 1, 2
    ORDER BY day_of_week, hour_of_day
    """,
)
def events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day x ISO-day-of-week activity profile — the seasonality
    heatmap capacity planning and anomaly baselines start from
    (events_daily_anomaly's z-scores assume you know this shape). One
    map-side-combinable agg over at most 168 groups; the timestamp
    bucketing happens in the scan projection."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.dayofweek(F.col("ts")).alias("dow_sun1"),
            F.hour("ts").alias("hour_of_day"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("n_purchases"),
        )
        # Spark's dayofweek is 1=Sunday; ISO is 1=Monday: shift exactly
        .select(
            (((F.col("dow_sun1") + 5) % 7) + 1).cast("int").alias("day_of_week"),
            F.col("hour_of_day").cast("int"),
            "n_events",
            "n_purchases",
        )
        .orderBy("day_of_week", "hour_of_day")
    )


# ---------------------------------------------------------------------------
# k-anonymity audit over quasi-identifiers
# ---------------------------------------------------------------------------

K_ANON_THRESHOLDS = (2, 5, 10, 20)


@query(
    "events_k_anonymity",
    oracle=f"""
    WITH classes AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(DISTINCT user_id) AS class_users
      FROM events
      GROUP BY 1, 2
    ),
    ks(k) AS (VALUES {", ".join(f"({k})" for k in K_ANON_THRESHOLDS)})
    SELECT CAST(k AS INTEGER) AS k,
           COUNT(*) AS n_classes,
           CAST(SUM(CASE WHEN class_users < k THEN 1 ELSE 0 END) AS BIGINT)
             AS n_small_classes,
           CAST(SUM(CASE WHEN class_users < k THEN class_users ELSE 0 END)
                AS BIGINT) AS n_users_at_risk
    FROM classes CROSS JOIN ks
    GROUP BY k
    ORDER BY k
    """,
)
def events_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit before releasing or training on event data
    (Sweeney 2002): every (event_type, day) quasi-identifier class is
    sized by DISTINCT users, and for each candidate k the report counts
    classes below k plus the users those small classes expose — the
    privacy twin of the PII scrub (re-identification risk comes from
    rare attribute combinations, not from explicit identifiers).

    Scale shape: one exact count-distinct per class (two-phase hash
    agg, map-side partials); the class relation collapses to |QI
    combinations| rows, and the k expansion is a broadcast of
    {len(K_ANON_THRESHOLDS)} literal rows against that already-tiny
    relation — never against the raw events."""
    ev = load_table(spark, sf_dir, "events")
    classes = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count_distinct("user_id").alias("class_users"))
    ks = spark.createDataFrame(
        [(k,) for k in K_ANON_THRESHOLDS], schema="k int"
    )
    small = F.col("class_users") < F.col("k")
    return (
        classes.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.count("*").alias("n_classes"),
            F.sum(small.cast("long")).alias("n_small_classes"),
            F.sum(F.when(small, F.col("class_users")).otherwise(0)).alias(
                "n_users_at_risk"
            ),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# l-diversity audit over quasi-identifiers (companion to k-anonymity)
# ---------------------------------------------------------------------------

L_DIV_THRESHOLDS = (2, 3, 4)


@query(
    "events_l_diversity",
    oracle=f"""
    WITH classes AS (
      SELECT CAST(ts AS DATE) AS day, CAST(extract(hour FROM ts) AS INTEGER) AS hr,
             COUNT(*) AS n_events,
             COUNT(DISTINCT event_type) AS n_sensitive
      FROM events
      GROUP BY 1, 2
    ),
    ls(l) AS (VALUES {", ".join(f"({v})" for v in L_DIV_THRESHOLDS)})
    SELECT CAST(l AS INTEGER) AS l,
           COUNT(*) AS n_classes,
           CAST(SUM(CASE WHEN n_sensitive < l THEN 1 ELSE 0 END) AS BIGINT)
             AS n_low_div_classes,
           CAST(SUM(CASE WHEN n_sensitive < l THEN n_events ELSE 0 END)
                AS BIGINT) AS n_events_at_risk
    FROM classes CROSS JOIN ls
    GROUP BY l
    ORDER BY l
    """,
)
def events_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007), the companion to
    ``events_k_anonymity``: k-anonymity bounds how FEW people share a
    quasi-identifier class, l-diversity bounds how UNIFORM the sensitive
    attribute is within it — a class where every event is the same type
    leaks that type to anyone who can place a user in the class. QI
    classes here are (day, hour); the sensitive attribute is event_type;
    for each candidate l the report counts classes with fewer than l
    distinct sensitive values and the events they expose.

    Scale shape: identical to the k-anonymity plan — one exact
    count-distinct per class (two-phase hash agg), then a broadcast of
    {len(L_DIV_THRESHOLDS)} literal threshold rows against the already-
    collapsed class relation."""
    ev = load_table(spark, sf_dir, "events")
    classes = ev.groupBy(
        F.col("ts").cast("date").alias("day"),
        F.hour("ts").cast("int").alias("hr"),
    ).agg(
        F.count("*").alias("n_events"),
        F.count_distinct("event_type").alias("n_sensitive"),
    )
    ls = spark.createDataFrame([(v,) for v in L_DIV_THRESHOLDS], schema="l int")
    low = F.col("n_sensitive") < F.col("l")
    return (
        classes.crossJoin(F.broadcast(ls))
        .groupBy("l")
        .agg(
            F.count("*").alias("n_classes"),
            F.sum(low.cast("long")).alias("n_low_div_classes"),
            F.sum(F.when(low, F.col("n_events")).otherwise(0)).alias(
                "n_events_at_risk"
            ),
        )
        .orderBy("l")
    )


# ---------------------------------------------------------------------------
# k-anonymity repair by QI generalization (pick the coarsest-needed grain)
# ---------------------------------------------------------------------------

K_ANON_REPAIR_K = 5
# generalization ladder for the (event_type, time) quasi-identifier:
# level 0 = day, 1 = ISO week, 2 = month, 3 = event_type only
_GEN_GRAINS = ("day", "week", "month", "type_only")


@query(
    "events_k_anonymity_repair",
    oracle=f"""
    WITH levels AS (
      SELECT 0 AS level, 'day' AS grain, event_type,
             CAST(date_trunc('day', ts) AS DATE) AS bucket, user_id FROM events
      UNION ALL
      SELECT 1, 'week', event_type,
             CAST(date_trunc('week', ts) AS DATE), user_id FROM events
      UNION ALL
      SELECT 2, 'month', event_type,
             CAST(date_trunc('month', ts) AS DATE), user_id FROM events
      UNION ALL
      SELECT 3, 'type_only', event_type, DATE '1970-01-01', user_id FROM events
    ),
    classes AS (
      SELECT level, grain, event_type, bucket,
             COUNT(DISTINCT user_id) AS class_users
      FROM levels GROUP BY 1, 2, 3, 4
    ),
    per_level AS (
      SELECT level, grain,
             CAST(COUNT(*) AS BIGINT) AS n_classes,
             CAST(MIN(class_users) AS BIGINT) AS min_class_users,
             (MIN(class_users) >= {K_ANON_REPAIR_K}) AS meets_k
      FROM classes GROUP BY level, grain
    )
    SELECT level, grain, n_classes, min_class_users, meets_k,
           (meets_k AND COALESCE(NOT bool_or(meets_k) OVER (
              ORDER BY level ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
            ), TRUE)) AS chosen
    FROM per_level
    ORDER BY level
    """,
)
def events_k_anonymity_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity REPAIR by quasi-identifier generalization (the fix
    the ``events_k_anonymity`` audit calls for): the time component of
    the (event_type, time) QI climbs a generalization ladder — day →
    ISO week → month → dropped entirely — and each level reports its
    worst-case class size; ``chosen`` marks the FIRST level whose
    minimum class reaches k={K_ANON_REPAIR_K}, i.e. the least
    information loss that makes the release k-anonymous. This is the
    single-dimension core of Datafly-style full-domain generalization
    (Sweeney 2002).

    Scale shape: one unioned scan per ladder level (4 passes — or one
    pass with grouping sets at the cost of oracle symmetry), each
    collapsing to an exact count-distinct per class; the level summary
    is 4 rows and the chosen-level sweep is a window over those 4."""
    ev = load_table(spark, sf_dir, "events")
    lv = None
    for level, grain in enumerate(_GEN_GRAINS):
        if grain == "type_only":
            bucket = F.lit("1970-01-01").cast("date")
        else:
            bucket = F.date_trunc(grain, F.col("ts")).cast("date")
        part = ev.select(
            F.lit(level).alias("level"),
            F.lit(grain).alias("grain"),
            "event_type",
            bucket.alias("bucket"),
            "user_id",
        )
        lv = part if lv is None else lv.unionByName(part)
    classes = lv.groupBy("level", "grain", "event_type", "bucket").agg(
        F.count_distinct("user_id").alias("class_users")
    )
    per_level = classes.groupBy("level", "grain").agg(
        F.count("*").cast("bigint").alias("n_classes"),
        F.min("class_users").cast("bigint").alias("min_class_users"),
        (F.min("class_users") >= K_ANON_REPAIR_K).alias("meets_k"),
    )
    prior_met = F.max(F.col("meets_k").cast("int")).over(
        W.orderBy("level").rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        per_level.withColumn(
            "chosen",
            F.col("meets_k") & F.coalesce(prior_met == 0, F.lit(True)),
        )
        .select("level", "grain", "n_classes", "min_class_users", "meets_k", "chosen")
        .orderBy("level")
    )
