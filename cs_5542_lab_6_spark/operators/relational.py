"""Core relational operators over the TPC-H-ish fixtures (SURVEY §2.1–2.8).

The reference's relational surface is small (scans, equi-joins, IN-lists,
group-by counts, top-k — SURVEY §2) and executed either as Snowflake SQL
strings or pandas loops. This module re-expresses that surface — and the
standard OLAP extensions SURVEY §2.4/2.5 notes as "built-in via Spark" —
as declarative DataFrame plans that Catalyst optimizes: filter/column
pushdown into parquet, broadcast joins for dims, partial aggregation
before shuffles, TakeOrderedAndProject for top-k.

Determinism contract for the DuckDB oracle (SURVEY §4.4):

- Money/quantity aggregates are summed as DECIMAL (exact, associative)
  and cast to DOUBLE at the end — double-summation order differs between
  engines, decimal summation cannot.
- Averages are written as exact-decimal-sum / count, never engine AVG.
- COUNT/SUM-of-int results are cast to BIGINT in the oracle (DuckDB sums
  ints to HUGEINT).
- Every LIMIT carries a full deterministic ORDER BY with unique-key
  tiebreakers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

DEC = "decimal(12,2)"


def _dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def _dsum(col: str | Column, alias: str) -> Column:
    """Exact decimal sum surfaced as double."""
    return F.sum(_dec(col)).cast("double").alias(alias)


# ---------------------------------------------------------------------------
# Aggregation pipeline (A1–A6 analogues on lineitem)
# ---------------------------------------------------------------------------


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)       AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)  AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1.00 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1.00 - CAST(l_discount AS DECIMAL(12,2)))
                    * (1.00 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)      AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)      AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical scan → filter → hash-agg pipeline.

    At scale: filter pushes to parquet, partial aggregation runs map-side
    (6 groups ⇒ the shuffle moves 6 rows per partition, not 600M rows).
    """
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit("1.00").cast(DEC)
    disc_price = _dec("l_extendedprice") * (one - _dec("l_discount"))
    charge = disc_price * (one + _dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity", "sum_qty"),
            _dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "revenue_forecast",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
)
def revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive predicates + global agg.
    All four predicates push down to the parquet reader (min/max row-group
    skipping at scale); the agg is a single partial+final sum."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Joins (J1–J6 analogues)
# ---------------------------------------------------------------------------


@query(
    "top_orders_by_revenue",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1.00 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1996-06-30'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact joins → agg → top-k.

    customer is small relative to lineitem: broadcast it so only the
    orders⋈lineitem join shuffles (and AQE converts that too when the
    filtered side is small enough). Top-k plans as TakeOrderedAndProject.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-06-30").cast("timestamp")
    )
    one = F.lit("1.00").cast(DEC)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "regional_customer_revenue",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1.00 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def regional_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join with three broadcast dims + one fact
    shuffle join, then agg. region→nation prune first (partition-pruning
    shape at scale), small dims broadcast explicitly."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit("1.00").cast(DEC)

    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(asia_nations), cust.c_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "customer_order_presence",
    oracle="""
    SELECT 'no_orders' AS presence, c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT 'open_orders', c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    ORDER BY presence, c_custkey
    """,
)
def customer_order_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti + left-semi joins in one tagged result (consolidated from
    customers_without_orders / customers_with_open_orders): 'no_orders' is
    the anti-join integrity-check shape SURVEY J4 prescribes for the
    reference's FK-ordered uploads (data/ingestion.py:430-441);
    'open_orders' is the EXISTS semi-join — no row multiplication, the
    probe side streams, preferred over join+distinct at scale."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    none = (
        cust.join(orders.select("o_custkey"), cust.c_custkey == F.col("o_custkey"), "left_anti")
        .select(F.lit("no_orders").alias("presence"), "c_custkey", "c_name")
    )
    open_orders = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    some = (
        cust.join(open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi")
        .select(F.lit("open_orders").alias("presence"), "c_custkey", "c_name")
    )
    return none.unionByName(some).orderBy("presence", "c_custkey")


@query(
    "order_fill_status",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus,
           COUNT(l.l_orderkey) AS n_lines,
           CAST(COALESCE(SUM(CAST(l.l_quantity AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_qty
    FROM orders o
    LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey <= 3000
    GROUP BY o.o_orderkey, o.o_orderstatus
    ORDER BY o.o_orderkey
    """,
)
def order_fill_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join + null-tolerant aggregation (the reference never
    uses outer joins — SURVEY §2.3 notes they come free from df.join)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left")
        .groupBy(orders.o_orderkey, orders.o_orderstatus)
        .agg(
            F.count(li.l_orderkey).alias("n_lines"),
            F.coalesce(F.sum(_dec("l_quantity")), F.lit(0).cast("decimal(12,2)"))
            .cast("double")
            .alias("total_qty"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Grouping extensions (SURVEY §2.4 "not present in reference, built-in here")
# ---------------------------------------------------------------------------


@query(
    "nation_order_stats",
    oracle="""
    SELECT n_name,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_order,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_order
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def nation_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A3/A6 analogues: count-distinct per group (the reference's
    paper_count, data/ingestion.py:337-344) plus min/max, over a
    broadcast-dim star join."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
            _dsum("o_totalprice", "total_value"),
            F.min("o_totalprice").alias("min_order"),
            F.max("o_totalprice").alias("max_order"),
        )
        .orderBy("n_name")
    )


@query(
    "returnflag_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_f,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_o
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def returnflag_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (explicit list ⇒ single pass, no
    extra distinct-values job — the at-scale idiom)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(_dec("l_quantity")).cast("double"))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (T1–T4)
# ---------------------------------------------------------------------------


@query(
    "topk_expensive_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def topk_expensive_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: global top-k. orderBy+limit plans as TakeOrderedAndProject —
    each partition keeps k rows, the driver merges k·p rows; no global
    sort even at 100 TB."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Set operations (SET1–SET2)
# ---------------------------------------------------------------------------


@query(
    "active_customer_keys",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
    ORDER BY custkey
    """,
)
def active_customer_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET1/SET2: UNION + distinct (the reference's bidirectional KG
    union, tools.py:196, and list(set(...)), backend/retrieval.py:45)."""
    orders = load_table(spark, sf_dir, "orders")
    open_ = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    pend = orders.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("custkey")
    )
    return open_.union(pend).distinct().orderBy("custkey")


@query(
    "single_status_customers",
    oracle="""
    (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
     EXCEPT
     SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O')
    ORDER BY custkey
    """,
)
def single_status_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (SURVEY §2.7: absent in reference, built-in here).
    ``subtract`` = SQL set-difference EXCEPT (distinct), not ``exceptAll``
    whose multiset semantics would leak duplicate left rows through."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.subtract(o).orderBy("custkey")


# ---------------------------------------------------------------------------
# Scalar function surface (F1–F15 analogues) + date arithmetic
# ---------------------------------------------------------------------------


@query(
    "orders_per_month",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    ORDER BY 1
    """,
)
def orders_per_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic the reference never does (SURVEY §2.8 note):
    date_trunc rollup by month."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(F.count("*").alias("n_orders"), _dsum("o_totalprice", "total_value"))
        .orderBy("order_month")
    )


@query(
    "part_catalog_slugs",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           regexp_replace(lower(p_name), '[^a-z0-9]', '_', 'g') AS slug,
           substr(p_type, 1, 6) AS type_prefix,
           concat('part_', lpad(CAST(p_partkey AS VARCHAR), 8, '0')) AS part_code,
           length(p_name) AS name_len
    FROM part
    WHERE p_size >= 30
    ORDER BY p_partkey
    """,
)
def part_catalog_slugs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface F2/F4/F5/F15: lower, slugify, substring,
    zero-padded id formatting (reference: data/ingestion.py:124,199,212)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 30)
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.regexp_replace(F.lower("p_name"), "[^a-z0-9]", "_").alias("slug"),
        F.substring("p_type", 1, 6).alias("type_prefix"),
        F.concat(F.lit("part_"), F.lpad(F.col("p_partkey").cast("string"), 8, "0")).alias(
            "part_code"
        ),
        F.length("p_name").alias("name_len"),
    ).orderBy("p_partkey")


# JSON props handling (F7/P7) lives in operators/semistructured.py:
# events_props_map parses the props column once into a real MapType and
# aggregates every key — subsuming the former single-key events_json_props.


# ---------------------------------------------------------------------------
# Warehouse lifecycle: MERGE-style upsert (beyond the reference's
# truncate-and-reload S8 — the incremental pattern that survives scale)
# ---------------------------------------------------------------------------


@query(
    "orders_merge_upsert",
    oracle="""
    WITH batch AS (
      -- CDC-style source batch, derived deterministically: every 100th
      -- order arrives re-priced (+10%), and a shifted copy of every
      -- 500th key arrives as a brand-new order
      SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 1.10 AS DOUBLE) AS o_totalprice
      FROM orders WHERE o_orderkey % 100 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_totalprice
      FROM orders WHERE o_orderkey % 500 = 0
    ),
    merged AS (
      SELECT COALESCE(b.o_orderkey, t.o_orderkey) AS o_orderkey,
             t.o_totalprice AS old_price,
             b.o_totalprice AS new_price,
             CASE WHEN t.o_orderkey IS NULL THEN 'insert'
                  WHEN b.o_orderkey IS NULL THEN 'keep'
                  ELSE 'update' END AS action
      FROM orders t FULL OUTER JOIN batch b USING (o_orderkey)
    )
    SELECT action, COUNT(*) AS n_rows,
           -- scale-4 decimal: the re-priced values are exact 4-decimal
           -- products (2dp price x 2dp factor); re-rounding to 2dp would
           -- hit engine-specific double->decimal tie-breaking
           CAST(SUM(CAST(COALESCE(new_price, old_price) AS DECIMAL(18,4))) AS DOUBLE)
             AS total_price_after
    FROM merged
    GROUP BY action
    ORDER BY action
    """,
)
def orders_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style upsert accounting: a deterministic CDC batch (re-priced
    updates + genuinely new keys) full-outer-joined against the target,
    classified into insert / update / keep, with post-merge totals per
    action — the incremental-load pattern that replaces the reference's
    truncate-and-reload (S8, data/ingestion.py:407-427) once reloads stop
    being affordable.

    Scale shape: MERGE is exactly this join — target ⋈ source on the key;
    with a bucketed/partitioned target the join co-locates, and only
    changed partitions rewrite (the copy-on-write layout Delta/Iceberg
    formalize). The classification and totals are one partial-aggregated
    pass over the join output."""
    t = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    updates = (
        t.filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            (_dec("o_totalprice") * F.lit("1.10").cast("decimal(12,2)"))
            .cast("double")
            .alias("o_totalprice"),
        )
    )
    inserts = t.filter(F.col("o_orderkey") % 500 == 0).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"), "o_totalprice"
    )
    batch = updates.unionByName(inserts)
    tt = t.select(
        F.col("o_orderkey"),
        F.col("o_orderkey").alias("t_key"),
        F.col("o_totalprice").alias("old_price"),
    )
    bb = batch.select(
        F.col("o_orderkey"),
        F.col("o_orderkey").alias("b_key"),
        F.col("o_totalprice").alias("new_price"),
    )
    # classify on key presence from each join side — the same predicate
    # the oracle tests — never on a (potentially nullable) payload column
    merged = tt.join(bb, "o_orderkey", "full_outer").select(
        "o_orderkey",
        "old_price",
        "new_price",
        F.when(F.col("t_key").isNull(), "insert")
        .when(F.col("b_key").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
    )
    return (
        merged.groupBy("action")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.coalesce("new_price", "old_price").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_price_after"),
        )
        .orderBy("action")
    )


# ---------------------------------------------------------------------------
# Cross-replica consistency: order-independent key-set checksums
# ---------------------------------------------------------------------------

# (table, key expression) — composite keys joined with '|'.
_CHECKSUM_KEYS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("region", ("r_regionkey",)),
    ("nation", ("n_nationkey",)),
    ("customer", ("c_custkey",)),
    ("supplier", ("s_suppkey",)),
    ("part", ("p_partkey",)),
    ("orders", ("o_orderkey",)),
    ("lineitem", ("l_orderkey", "l_linenumber")),
    ("events", ("event_id",)),
    ("documents", ("doc_id",)),
    ("embeddings", ("vec_id",)),
)


@query(
    "table_keyset_checksums",
    oracle="""
    SELECT * FROM (
    """
    + "\n    UNION ALL\n    ".join(
        f"""SELECT '{t}' AS table_name, COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(concat('0x', substr(sha256('{t}|' || {" || '|' || ".join(f"COALESCE(CAST({c} AS VARCHAR), '<null>')" for c in k)}), 1, 15)) AS BIGINT) % 2147483647) AS DECIMAL(38,0)) AS VARCHAR) AS key_checksum
        FROM {t}"""
        for t, k in _CHECKSUM_KEYS
    )
    + """
    )
    ORDER BY table_name
    """,
)
def table_keyset_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent key-set checksum per table: the sum of salted
    sha-derived key hashes plus the row count — equal checksums mean
    equal key sets regardless of row order, partitioning, or engine. The
    anti-entropy check a replicated warehouse runs to verify a copy (or
    a migration, or THIS engine against the reference's warehouse)
    without comparing rows.

    Scale shape: one narrow hash per row and one partial-aggregated SUM
    per table — each checksum costs a key-column scan. Sums accumulate
    as DECIMAL(38,0): commutative and exact, so 10^12-row tables can't
    overflow (a raw BIGINT sum of 31-bit hashes would, and ANSI Spark
    would raise), and the digit-string form hashes identically on both
    engines."""
    from ..functions.text import token_hash

    out = None
    for t, keys in _CHECKSUM_KEYS:
        df = load_table(spark, sf_dir, t)
        # NULL-preserving serialization: concat_ws would silently DROP a
        # null component (and DuckDB's || would null the whole key), so
        # both engines coalesce each part to an explicit sentinel first
        key = F.concat_ws(
            "|",
            F.lit(t),
            *[F.coalesce(F.col(k).cast("string"), F.lit("<null>")) for k in keys],
        )
        part = df.agg(
            F.count("*").alias("n_rows"),
            F.sum(token_hash(key).cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("key_checksum"),
        ).select(F.lit(t).alias("table_name"), "n_rows", "key_checksum")
        out = part if out is None else out.unionByName(part)
    return out.orderBy("table_name")


# ---------------------------------------------------------------------------
# Decision-support shapes: EXISTS semi-join agg (Q4), agg-of-agg histogram
# (Q13) — the two classic TPC-H forms not yet in the registry
# ---------------------------------------------------------------------------


@query(
    "order_priority_exists_counts",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1995-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def order_priority_exists_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted to the fixture's columns: the EXISTS
    predicate is 'has a returned line' instead of commit<receipt): date
    range scan over orders, EXISTS decorrelated to a LEFT SEMI join, then
    priority counts. At scale the semi join build side is pre-filtered
    (only 'R' lines ship their 8-byte orderkey into the shuffle) and the
    probe side's date filter pushes to the parquet scan — the planner
    never materializes the full orders x lineitem pairing a naive
    correlated evaluation would."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
        )
        .join(returned, o["o_orderkey"] == returned["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "customer_order_count_histogram",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def customer_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: per-customer order counts (LEFT join with a
    residual predicate so zero-order customers stay, counting the
    non-null side) re-aggregated into a distribution histogram. The
    double aggregation is the scale story: the first agg collapses the
    join output to |customers| rows map-side; the second shuffles only
    distinct counts — at 100 TB the histogram shuffle moves hundreds of
    rows, not hundreds of millions."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "promo_revenue_share",
    oracle="""
    SELECT CAST(date_trunc('month', l.l_shipdate) AS TIMESTAMP) AS ship_month,
           CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                      * (1.00 - CAST(l.l_discount AS DECIMAL(12,2)))
                 ELSE CAST(0.00 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo_revenue,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1.00 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS total_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: monthly promo vs total discounted revenue through
    a fact ⋈ dim join on partkey. The dim side broadcasts (part is
    thousands-to-millions of rows against a billions-row fact at scale);
    revenue stays decimal until the final surface cast so the conditional
    sum is order-independent. The share itself is left to the reader of
    the two exact columns — emitting the ratio would divide two large
    decimals into an accumulation-order-free but magnitude-sensitive
    double (the engines agree; downstream sheets do the division)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    one = F.lit("1.00").cast(DEC)
    disc = _dec("l_extendedprice") * (one - _dec("l_discount"))
    zero = F.lit("0.00").cast(DEC)
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(zero))
            .cast("double")
            .alias("promo_revenue"),
            F.sum(disc).cast("double").alias("total_revenue"),
        )
        .orderBy("ship_month")
    )


@query(
    "discounted_bulk_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1.00 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def discounted_bulk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: a disjunction of conjunctive brand/size/quantity
    bands across the join. The optimizer test that matters at 100 TB:
    Catalyst must split the OR into join-side predicates — the part-only
    constraints (brand IN, size bounds) push below the join to prune the
    build side, and the lineitem quantity envelope (1..40) prunes the
    probe scan — instead of evaluating the whole disjunction post-join.
    One row out: exact decimal revenue + line count."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    one = F.lit("1.00").cast(DEC)
    band = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(band)
        .agg(
            F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "nation_trade_flows",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1.00 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    WHERE (sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_8')
       OR (sn.n_name = 'NATION_8' AND cn.n_name = 'NATION_3')
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between a nation pair per
    ship year — the multi-way join-ordering exercise (fact ⋈ orders ⋈
    customer with two separately-aliased copies of the nation dim).

    Scale story: both nation copies pre-filter to the pair and broadcast,
    so the fact side is pruned by supplier nation BEFORE the expensive
    orders/customer shuffles — Catalyst pushes the disjunctive pair
    predicate down each dim branch, and the only shuffles left are the
    two fact-side equi-joins on orderkey/custkey. The year comes from
    l_shipdate (the fixture's lineitem date), keeping the group key
    integer-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = n.filter(F.col("n_name").isin("NATION_3", "NATION_8"))
    sn = pair.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = pair.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    one = F.lit("1.00").cast(DEC)
    return (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "returned_item_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1.00 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS revenue,
           c.c_acctbal
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1995-07-01'
      AND o.o_orderdate <  TIMESTAMP '1995-10-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: which customers returned the most revenue in a
    quarter — 4-way join (fact ⋈ orders ⋈ customer ⋈ nation dim), agg,
    top-20. Scale story: both filters (returnflag on the fact scan, the
    date range on orders) push into their parquet scans BEFORE the join,
    the nation dim broadcasts, and the final top-20 is
    TakeOrderedAndProject over the aggregated relation — the plan never
    sorts more than |groups| rows."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    one = F.lit("1.00").cast(DEC)
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "orders_date_spine_gaps",
    oracle="""
    WITH bounds AS (
      SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
             CAST(MAX(o_orderdate) AS DATE) AS hi
      FROM orders
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
      FROM bounds
    ),
    per_day AS (
      SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT CAST(year(spine.d) AS INTEGER) AS yr,
           CAST(month(spine.d) AS INTEGER) AS mth,
           COUNT(*) AS n_days,
           CAST(SUM(CASE WHEN per_day.d IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS gap_days,
           CAST(SUM(COALESCE(per_day.n_orders, 0)) AS BIGINT) AS n_orders
    FROM spine LEFT JOIN per_day ON spine.d = per_day.d
    GROUP BY 1, 2
    ORDER BY yr, mth
    """,
)
def orders_date_spine_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine completeness audit: generate every day between the
    first and last order date, left-join per-day order counts, report
    zero-order days per month — a missing ingest day is invisible to
    GROUP BY, which only sees days that exist.

    The spine is ``sequence(min, max, interval 1 day)`` + explode — ONE
    narrow expression, not iteration. (Spark 4.1's recursive CTE could
    express it too — see kg_reachability_sql for that surface — but
    recursion executes one Spark iteration PER LEVEL, measured 341 s
    for this ~2,400-day span vs well under a second for sequence();
    depth-bounded graph traversal is where recursion earns its cost.)
    The day-level spine is thousands of rows regardless of data volume;
    the per-day rollup is one map-side-combinable agg of the fact."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    per_day = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count("*").alias("n_orders")
    )
    return (
        spine.join(per_day, "d", "left")
        .groupBy(
            F.year("d").cast("int").alias("yr"),
            F.month("d").cast("int").alias("mth"),
        )
        .agg(
            F.count("*").alias("n_days"),
            F.sum(F.when(F.col("n_orders").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("gap_days"),
            F.sum(F.coalesce("n_orders", F.lit(0))).cast("long").alias("n_orders"),
        )
        .orderBy("yr", "mth")
    )


# ---------------------------------------------------------------------------
# Incremental materialized-view refresh (partial-aggregate maintenance)
# ---------------------------------------------------------------------------

MV_REFRESH_CUT = "1997-01-01"


@query(
    "orders_mv_incremental_refresh",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1
    ORDER BY month
    """,
)
def orders_mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: a per-month revenue rollup kept as a
    MATERIALIZED aggregate and refreshed by merging a new batch's partial
    aggregate — never re-scanning history. The base state (orders before
    {MV_REFRESH_CUT}) is aggregated once and written to parquet (the MV);
    the delta batch (orders on/after the cut) is aggregated separately;
    the refresh is a union + re-aggregate of the two PARTIAL states,
    which is exact because COUNT and SUM are commutative monoids (the
    same algebra Spark's own partial aggregation relies on). The oracle
    recomputes the rollup from scratch over all orders — incremental
    refresh must equal full recompute, the IVM correctness contract.

    Scale shape: at 100 TB this is the nightly-ingest pattern — the
    refresh cost is O(|delta| + |mv|), not O(|history|); both sides are
    map-side-combinable hash aggs and the merge shuffles only
    month-grained rows. Decimal accumulation keeps the double surface
    bit-stable in any merge order."""
    import os
    import shutil
    import tempfile

    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", "o_orderdate").cast("date").alias("month")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(month).agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec"),
        )

    root = tempfile.mkdtemp(prefix="mv_refresh_")
    mv_path = os.path.join(root, "orders_monthly_mv")
    try:
        # nightly state: the base aggregate lives ON DISK between refreshes
        partial(o.filter(F.col("o_orderdate") < MV_REFRESH_CUT)).write.mode(
            "overwrite"
        ).parquet(mv_path)
        base = spark.read.parquet(mv_path)
        delta = partial(o.filter(F.col("o_orderdate") >= MV_REFRESH_CUT))
        refreshed = (
            base.unionByName(delta)
            .groupBy("month")
            .agg(
                F.sum("n_orders").cast("long").alias("n_orders"),
                F.sum("rev_dec").cast("double").alias("revenue"),
            )
            .orderBy("month")
            .localCheckpoint(eager=True)  # pin before the MV dir vanishes
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return refreshed


# Deliberately MID-month (unlike MV_REFRESH_CUT): a month-aligned cut
# would make per-batch distinct counts accidentally additive (no month
# straddles the batches), hiding exactly the hazard this query exists
# for. With a mid-month cut the cut month has customers in BOTH batches
# (asserted in tests/test_mv_refresh.py), so a naive merge over-counts.
MV_DISTINCT_CUT = "1996-12-15"


@query(
    "orders_mv_distinct_refresh",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           COUNT(*) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           TRUE AS hll_in_envelope
    FROM orders
    GROUP BY 1
    ORDER BY month
    """,
)
def orders_mv_distinct_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MV refresh generalized to COUNT(DISTINCT) — the
    aggregate naive partial-state merging gets WRONG (per-batch distinct
    counts are not additive: a customer active in both the base and the
    delta would be counted twice; r8 verdict item 8). Two correct
    maintenance strategies, both exercised:

    - **exact key-set merge**: the MV's auxiliary state is the distinct
      (month, custkey) SUPPORT RELATION (the textbook IVM construction);
      refresh = union with the delta's key-set, re-distinct, count. The
      state is |distinct keys|-sized, not |history|-sized, and yields
      the exact distinct count the output carries.
    - **mergeable sketch state**: the MV also persists one HLL sketch
      per month (``hll_sketch_agg``); refresh merges sketches with
      ``hll_union_agg`` — constant bytes per group at any cardinality,
      the 100 TB default when exactness can be traded. The driver-checked
      ``hll_in_envelope`` boolean pins the merged estimate within its
      ~3-sigma band of the exact count (oracle states TRUE), so a sketch
      or merge regression is a hash mismatch.

    The COUNT/SUM columns refresh by monoid merge exactly as
    orders_mv_incremental_refresh; the oracle recomputes everything from
    scratch — incremental must equal full recompute.

    Scale shape: refresh is O(|delta| + |mv state|); the key-set
    re-distinct shuffles only (month, custkey) pairs (map-side
    combinable) and the sketch merge shuffles one sketch per
    (month, batch)."""
    import os
    import shutil
    import tempfile

    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", "o_orderdate").cast("date").alias("month")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(month).agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec"),
            F.hll_sketch_agg("o_custkey").alias("cust_sketch"),
        )

    def keyset(df: DataFrame) -> DataFrame:
        return df.select(month, "o_custkey").distinct()

    base_pred = F.col("o_orderdate") < MV_DISTINCT_CUT
    root = tempfile.mkdtemp(prefix="mv_distinct_")
    mv_path = os.path.join(root, "orders_monthly_mv")
    ks_path = os.path.join(root, "orders_monthly_keys")
    try:
        # nightly state on disk: monoid partials + HLL sketches, plus the
        # exact distinct-key support relation
        partial(o.filter(base_pred)).write.mode("overwrite").parquet(mv_path)
        keyset(o.filter(base_pred)).write.mode("overwrite").parquet(ks_path)
        base = spark.read.parquet(mv_path)
        base_keys = spark.read.parquet(ks_path)
        delta_rel = o.filter(~base_pred)
        merged = (
            base.unionByName(partial(delta_rel))
            .groupBy("month")
            .agg(
                F.sum("n_orders").cast("long").alias("n_orders"),
                F.sum("rev_dec").cast("double").alias("revenue"),
                F.hll_union_agg("cust_sketch").alias("cust_sketch"),
            )
        )
        exact = (
            base_keys.unionByName(keyset(delta_rel))
            .distinct()
            .groupBy("month")
            .agg(F.count("*").cast("long").alias("n_customers"))
        )
        est = F.hll_sketch_estimate("cust_sketch")
        hll_ok = F.abs(est - F.col("n_customers")) <= F.greatest(
            F.lit(2), F.lit(0.05) * F.col("n_customers")
        )
        refreshed = (
            merged.join(exact, "month")
            .select(
                "month",
                "n_orders",
                "n_customers",
                "revenue",
                hll_ok.alias("hll_in_envelope"),
            )
            .orderBy("month")
            .localCheckpoint(eager=True)  # pin before the MV dirs vanish
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return refreshed
