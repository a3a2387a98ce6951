"""Window-function operators (SURVEY §2.5).

The reference has no window functions — its closest shapes are global
top-k by score (tools.py:88-89) and first-seen dedup
(data/ingestion.py:356). Per-group ranking is the strictly stronger form
SURVEY §2.5 prescribes. All windows are partitioned (never a global
unpartitioned window, which would funnel 100 TB through one task) and
every orderBy carries a unique tiebreaker for determinism.

Double-valued running aggregates are computed over DECIMAL so the result
is independent of the engine's accumulation algorithm (segment tree vs
sequential), then surfaced as DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

DEC = "decimal(12,2)"


@query(
    "top3_orders_per_customer",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rk, price_rank, price_dense_rank
    FROM (
      SELECT c_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER w AS rk,
             RANK()       OVER w AS price_rank,
             DENSE_RANK() OVER w AS price_dense_rank
      FROM customer JOIN orders ON c_custkey = o_custkey
      WINDOW w AS (PARTITION BY c_custkey ORDER BY o_totalprice DESC, o_orderkey)
    )
    WHERE rk <= 3
    ORDER BY c_custkey, rk
    """,
)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number — the distributed replacement for
    the reference's global sort+slice (tools.py:88-89) — plus rank /
    dense_rank over the same window (consolidated from the former
    order_value_rank_dense; ntile/percent_rank/cume_dist live in
    customer_balance_distribution). Catalyst collapses all three ranking
    functions into one Window node: one shuffle on the partition key, no
    global sort."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("c_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .withColumn("price_rank", F.rank().over(w))
        .withColumn("price_dense_rank", F.dense_rank().over(w))
        .filter(F.col("rk") <= 3)
        .orderBy("c_custkey", "rk")
    )


@query(
    "supplier_running_revenue",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                  OVER (PARTITION BY l_suppkey
                        ORDER BY l_shipdate, l_orderkey, l_linenumber
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_revenue
    FROM lineitem
    WHERE l_suppkey <= 5
    ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber
    """,
)
def supplier_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame (rowsBetween unboundedPreceding→current) per
    supplier, ordered by a unique composite key so the frame — and the
    exact decimal accumulation — is deterministic."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 5)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "l_shipdate",
            F.sum(F.col("l_extendedprice").cast(DEC)).over(w).cast("double").alias(
                "running_revenue"
            ),
        )
        .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
    )


@query(
    "user_event_gaps",
    oracle="""
    SELECT user_id, event_id, ts,
           lag(event_type)  OVER w AS prev_type,
           lead(event_type) OVER w AS next_type,
           COALESCE(epoch_ms(ts) - epoch_ms(lag(ts) OVER w), 0) AS ms_since_prev
    FROM events
    WHERE user_id <= 10
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, ts, event_id
    """,
)
def user_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics over an event stream — inter-arrival gaps per
    user, the batch form of sessionization's first step. Gap math uses
    integer epoch-millis (exact in both engines), not float seconds."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 10)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ep_ms = F.floor(F.unix_micros(F.col("ts")) / 1000)
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
            F.coalesce(ep_ms - F.lag(ep_ms).over(w), F.lit(0)).cast("bigint").alias(
                "ms_since_prev"
            ),
        )
        .orderBy("user_id", "ts", "event_id")
    )


@query(
    "customer_balance_distribution",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(ntile(4) OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal, c_custkey) AS INTEGER) AS balance_quartile,
           round(percent_rank() OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal, c_custkey), 4) AS pct_rank,
           round(cume_dist() OVER (PARTITION BY c_nationkey
                                   ORDER BY c_acctbal, c_custkey), 4) AS cume
    FROM customer
    ORDER BY c_custkey
    """,
)
def customer_balance_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution analytics per nation: ntile quartiles, percent_rank,
    cume_dist — the statistical window family (§2.5) the reference never
    had. One shuffle on the nation key; the unique c_custkey tiebreak
    makes every rank deterministic."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return (
        cust.select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.ntile(4).over(w).alias("balance_quartile"),
            F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 4).alias("cume"),
        )
        .orderBy("c_custkey")
    )


@query(
    "supplier_weekly_moving_avg",
    oracle="""
    WITH daily AS (
      SELECT l_suppkey, CAST(date_trunc('day', l_shipdate) AS TIMESTAMP) AS ship_day,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS day_rev
      FROM lineitem
      WHERE l_suppkey <= 5
      GROUP BY 1, 2
    )
    SELECT l_suppkey, ship_day,
           CAST(day_rev AS DOUBLE) AS day_revenue,
           CAST(SUM(day_rev) OVER (
             PARTITION BY l_suppkey ORDER BY ship_day
             RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_7d_revenue,
           CAST(COUNT(*) OVER (
             PARTITION BY l_suppkey ORDER BY ship_day
             RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS days_in_window
    FROM daily
    ORDER BY l_suppkey, ship_day
    """,
)
def supplier_weekly_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame (§2.5's missing frame kind: rangeBetween
    over event time, not row counts): per supplier, trailing-7-day
    revenue over the daily rollup — the moving-aggregate shape of every
    monitoring dashboard. The frame is defined by the ORDER BY *value*
    (days with no sales genuinely fall out of the window), which rows-
    frames cannot express.

    Exactness: the windowed sum accumulates DECIMAL (order-independent),
    surfaced as double. One shuffle on the partition key; the range frame
    evaluates with a sliding two-pointer over each sorted partition."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 5)
    daily = (
        li.groupBy(
            "l_suppkey", F.date_trunc("day", "l_shipdate").alias("ship_day")
        )
        .agg(F.sum(F.col("l_extendedprice").cast(DEC)).cast("decimal(18,2)").alias("day_rev"))
    )
    # rangeBetween needs a numeric ordering key: order by epoch days so
    # "6 days preceding" is the exact integer range [-6, 0]
    day_num = (F.unix_micros("ship_day") / F.lit(86_400_000_000)).cast("long")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy(day_num)
        .rangeBetween(-6, W.currentRow)
    )
    return (
        daily.select(
            "l_suppkey",
            "ship_day",
            F.col("day_rev").cast("double").alias("day_revenue"),
            F.sum("day_rev").over(w).cast("double").alias("trailing_7d_revenue"),
            F.count("*").over(w).cast("bigint").alias("days_in_window"),
        )
        .orderBy("l_suppkey", "ship_day")
    )


@query(
    "customer_order_value_extremes",
    oracle="""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           MAX(fv) AS first_order_value,
           MAX(lv) AS latest_order_value,
           MAX(sv) AS second_order_value
    FROM (
      SELECT o_custkey,
             first_value(o_totalprice) OVER w AS fv,
             last_value(o_totalprice) OVER w AS lv,
             nth_value(o_totalprice, 2) OVER w AS sv
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    )
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
)
def customer_order_value_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The value-picking window family (§2.5's remaining functions:
    first_value / last_value / nth_value) over each customer's
    date-ordered order history — first order value, latest value, and
    the second order's value (NULL for single-order customers, both
    engines agree).

    The frame is explicitly UNBOUNDED PRECEDING → UNBOUNDED FOLLOWING:
    last_value under the default frame (…→ CURRENT ROW) degenerates to
    the current row's value — the classic window pitfall — and pinning
    the full frame makes all three picks constant per partition, so the
    per-customer collapse is a trivial max over identical values. Window
    is partitioned by custkey (never global) with a unique orderkey
    tiebreak; values are picked, not accumulated, so doubles cross
    engines exactly."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        o.select(
            "o_custkey",
            F.first("o_totalprice").over(w).alias("fv"),
            F.last("o_totalprice").over(w).alias("lv"),
            F.nth_value("o_totalprice", 2).over(w).alias("sv"),
        )
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.max("fv").alias("first_order_value"),
            F.max("lv").alias("latest_order_value"),
            F.max("sv").alias("second_order_value"),
        )
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation (recency / frequency / monetary ntiles)
# ---------------------------------------------------------------------------

RFM_BUCKETS = 4
RFM_RANK_PARTS = 32


def _parallel_ntile(
    df: DataFrame, n: int, order_cols: list, key: str, alias: str
) -> DataFrame:
    """Exact ntile(n) with NO data-scale single-partition window — the
    zipWithIndex idiom in DataFrame form (VERDICT r6 item 3), fully
    lazy since r16:

    1. range-exchange on the sort key (sampled boundaries, fully
       parallel); both consumers below reference the SAME exchange
       subtree, which Catalyst's ReuseExchange executes once — so the
       partition boundaries are shared by construction (the r6-r15
       shape froze them with an eager localCheckpoint + a driver
       collect of the partition counts: 3 blocking driver round-trips
       per dimension, 8 jobs per query — all gone);
    2. per-partition row_number (parallel windows, one per partition)
       plus a prefix sum over the RFM_RANK_PARTS-row partition-count
       aggregate (a SinglePartition window over an aggregate-sized
       relation — the sanctioned tiny-relation shape, same as
       corpus_temperature_mixing's 5-row window) broadcast-joined back
       on __pid gives each row its exact global rank, driver-free;
    3. ntile arithmetic on the rank in exact integer math: the first
       (total % n) buckets take ceil(total/n) rows, the rest
       floor(total/n) — bit-identical to the SQL ntile the oracle runs
       (integer ceil-div replaces the old double-divide F.ceil, which
       would lose exactness past 2^53 ranks).

    Input must be totally ordered by order_cols (unique tiebreaker);
    cost is one narrow pass over |df| per dimension, never a funnel of
    the whole relation through one task."""
    part = df.repartitionByRange(RFM_RANK_PARTS, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    counts = part.groupBy("__pid").agg(F.count("*").alias("c"))
    offs = counts.select(
        "__pid",
        F.coalesce(
            F.sum("c").over(
                W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("__off"),
        F.sum("c").over(W.partitionBy()).alias("__total"),
    )
    local = F.row_number().over(W.partitionBy("__pid").orderBy(*order_cols))
    ranked = part.join(F.broadcast(offs), "__pid").select(
        F.col(key),
        (F.col("__off") + local).alias("__rank"),
        F.col("__total"),
    )
    # big = ceil(total/n); small = max(floor(total/n), 1); the first
    # (total % n) buckets hold `big` rows, the rest `small` — integer
    # ceil-div (a + b - 1) div b throughout
    bucket = (
        f"CASE WHEN __rank <= (__total % {n}) * ((__total + {n - 1}) div {n}) "
        f"THEN (__rank + ((__total + {n - 1}) div {n}) - 1) "
        f"       div ((__total + {n - 1}) div {n}) "
        f"ELSE (__total % {n}) "
        f"     + ((__rank - (__total % {n}) * ((__total + {n - 1}) div {n})) "
        f"        + greatest(__total div {n}, 1) - 1) "
        f"       div greatest(__total div {n}, 1) END"
    )
    return ranked.select(
        F.col(key), F.expr(bucket).cast("int").alias(alias)
    )


@query(
    "customer_rfm_segments",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT *,
             ntile({RFM_BUCKETS}) OVER (ORDER BY last_order DESC, o_custkey) AS r,
             ntile({RFM_BUCKETS}) OVER (ORDER BY n_orders DESC, o_custkey) AS f,
             ntile({RFM_BUCKETS}) OVER (ORDER BY spend DESC, o_custkey) AS m
      FROM per_cust
    )
    SELECT r, f, m,
           COUNT(*) AS n_customers,
           CAST(SUM(n_orders) AS BIGINT) AS total_orders,
           CAST(SUM(CAST(spend AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
    FROM scored
    GROUP BY r, f, m
    ORDER BY r, f, m
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer-analytics rollup: per
    customer recency (last order), frequency (order count), monetary
    (exact-decimal spend), each quartiled into ntile({RFM_BUCKETS})
    buckets under a total order (custkey tiebreak, so bucket boundaries
    are deterministic cross-engine), then segments aggregated.

    Scale shape: the oracle's three ntiles are global windows; the
    Spark side computes the SAME buckets with ``_parallel_ntile`` —
    range exchange + per-partition rank + driver prefix-sum — so no
    dimension funnels the rollup through a single task (the one plan
    the r6 verdict would not run at 100x, now retired). The three
    bucket relations re-join the rollup on o_custkey: co-partitioned
    |customers|-sized equi-joins."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("spend"),
    )
    r = _parallel_ntile(
        per_cust, RFM_BUCKETS, [F.desc("last_order"), F.asc("o_custkey")],
        "o_custkey", "r",
    )
    f = _parallel_ntile(
        per_cust, RFM_BUCKETS, [F.desc("n_orders"), F.asc("o_custkey")],
        "o_custkey", "f",
    )
    m = _parallel_ntile(
        per_cust, RFM_BUCKETS, [F.desc("spend"), F.asc("o_custkey")],
        "o_custkey", "m",
    )
    scored = (
        per_cust.select("o_custkey", "n_orders", "spend")
        .join(r, "o_custkey")
        .join(f, "o_custkey")
        .join(m, "o_custkey")
    )
    return (
        scored.groupBy("r", "f", "m")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("n_orders").cast("long").alias("total_orders"),
            F.sum(F.col("spend").cast("decimal(18,2)")).cast("double").alias("total_spend"),
        )
        .orderBy("r", "f", "m")
    )


# ---------------------------------------------------------------------------
# Revenue-concentration Gini per order priority (exact rank statistic)
# ---------------------------------------------------------------------------


@query(
    "priority_price_gini",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority AS priority,
             CAST(o_totalprice AS DOUBLE) AS x,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS i
      FROM orders
    )
    SELECT priority,
           COUNT(*) AS n_orders,
           round(2.0 * SUM(i * x ORDER BY i) / (COUNT(*) * SUM(x ORDER BY i))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
    FROM ranked
    GROUP BY priority
    ORDER BY priority
    """,
)
def priority_price_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order value per priority class — the
    inequality/concentration metric (G = 2·Σ i·x_i / (n·Σ x_i) − (n+1)/n
    over ascending-sorted values). Exact Gini is a RANK statistic: it
    needs each group's values in order, so the shape is a per-group
    ranking window plus position-ordered double folds (the perplexity/
    entropy idiom — collect, array_sort by rank, sequential fold), which
    matches DuckDB's SUM(expr ORDER BY i) bit for bit.

    Scale note: groups here are the 5 priority classes, so each group's
    sort is one task — fine for bounded-cardinality dimensions; for
    high-cardinality groups or a global Gini at 100 TB you'd bin values
    (a quantile-sketch Lorenz curve) instead of exact ranks, the same
    exact-vs-sketch trade-off nation_price_medians documents. A
    vectorized GROUPED_AGG pandas UDAF computing the same statistic
    (functions/udafs.py) is unit-tested against this query — the §2.11
    UDAF surface — but the registered plan stays JVM-side."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ranked = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").cast("double").alias("x"),
        F.row_number().over(w).alias("i"),
    )
    grouped = ranked.groupBy("priority").agg(
        F.count("*").alias("n_orders"),
        F.array_sort(F.collect_list(F.struct("i", "x"))).alias("terms"),
    )
    sxi = F.aggregate(
        "terms", F.lit(0.0), lambda acc, e: acc + e["i"] * e["x"]
    )
    sx = F.aggregate("terms", F.lit(0.0), lambda acc, e: acc + e["x"])
    n = F.col("n_orders")
    gini = F.round(2.0 * sxi / (n * sx) - (n + 1.0) / n, 6)
    return grouped.select(
        "priority", n.cast("long").alias("n_orders"), gini.alias("gini")
    ).orderBy("priority")
