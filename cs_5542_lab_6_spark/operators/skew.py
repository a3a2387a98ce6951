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


@query("orders_approx_stats")  # sketch-based: rows-only (no exact oracle)
def orders_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates per order status: HyperLogLog++ distinct
    customers (the A1 count at 100 TB — constant memory vs the exact
    hash set) and approximate total-price quantiles. Deterministic for a
    fixed input (the sketches are deterministic algorithms), but not
    SQL-oracle-comparable since DuckDB's sketches differ; the unit test
    pins the error envelope against the exact values instead.

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


@query("events_heavy_hitters_sketch")  # sketch-based: rows-only (no exact oracle)
def events_heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter users via Spark 4.1's sketch surface:
    ``approx_top_k`` proposes the top-{HH_TOP_K} most frequent user_ids
    with approximate counts, and an Apache DataSketches HLL
    (``hll_sketch_agg``/``hll_sketch_estimate``) estimates the distinct
    user universe those hitters dominate — the streaming-friendly pair a
    100 TB event feed uses where an exact groupBy-count would shuffle
    every row (both sketches are map-side mergeable, constant memory).
    Deterministic for a fixed input, but not SQL-oracle-comparable
    (DuckDB's sketches differ), so this joins orders_approx_stats in the
    rows-only set; the unit test pins the error envelope against exact
    counts instead."""
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
