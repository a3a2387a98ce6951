"""Remaining classic TPC-H subquery/join shapes (Q2/Q8/Q9/Q16/Q20/Q21),
adapted to the fixture schema (no partsupp table — lineitem's
(l_partkey, l_suppkey) is the part↔supplier link; no
commit/receipt dates — lateness is measured as l_shipdate lagging
o_orderdate by more than a grace window).

These complete the decorrelation catalogue started in subqueries.py
(Q11/Q15/Q17/Q18/Q22): argmin-per-group join-back (Q2), the
two-conditional-sums market-share ratio over the widest join tree in
the engine (Q8), multi-dim profit rollup under a LIKE filter (Q9),
NOT-IN exclusion + count-distinct (Q16), nested semi-join chain with a
per-group quantity threshold (Q20), and the same-table EXISTS/NOT-EXISTS
anti pattern (Q21). Every money aggregate follows the engine's decimal
discipline (order-independent DECIMAL sums, one final surface cast) so
the DuckDB oracles are value-hash exact.

Reference basis: the reference runs warehouse SQL through a cursor
(utils/snowflake_conn.py) — these shapes are the standard analytics a
user of that warehouse would write; the engine expresses each as a
Catalyst plan with the join strategy a 100 TB cluster needs (broadcast
dims, semi/anti joins instead of IN/EXISTS subquery re-scans).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

DEC = "decimal(12,2)"


def _dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


_ONE = "1.00"

# Q2 parameters
MIN_COST_SIZE = 25
MIN_COST_REGION = "EUROPE"
# Q8 parameters
SHARE_REGION = "ASIA"
SHARE_NATION = "NATION_5"
# Q9 parameter
PROFIT_NAME_FRAGMENT = "widget"
# Q16 brand to exclude
VARIETY_EXCLUDED_BRAND = "Brand#1"
# Q20 parameters
EXCESS_NAME_FRAGMENT = "rod"
EXCESS_MIN_QTY = 50
# Q21 parameters
LATE_GRACE_DAYS = 60
LATE_TOP_K = 20


@query(
    "min_cost_part_supplier",
    oracle=f"""
    WITH cost AS (
      SELECT l.l_partkey AS p_key, l.l_suppkey AS s_key,
             MIN(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS supply_cost
      FROM lineitem l
      GROUP BY 1, 2
    ),
    eligible AS (
      SELECT c.p_key, c.s_key, c.supply_cost
      FROM cost c
      JOIN supplier s ON c.s_key = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = '{MIN_COST_REGION}'
    ),
    best AS (
      SELECT p_key, MIN(supply_cost) AS min_cost FROM eligible GROUP BY p_key
    ),
    winner AS (
      SELECT e.p_key, b.min_cost, MIN(e.s_key) AS s_key
      FROM eligible e JOIN best b
        ON e.p_key = b.p_key AND e.supply_cost = b.min_cost
      GROUP BY 1, 2
    )
    SELECT p.p_partkey, p.p_name,
           CAST(w.min_cost AS DOUBLE) AS min_cost,
           s.s_name, n.n_name
    FROM winner w
    JOIN part p ON w.p_key = p.p_partkey
    JOIN supplier s ON w.s_key = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_size = {MIN_COST_SIZE}
    ORDER BY p.p_partkey
    """,
)
def min_cost_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for every size-{MIN_COST_SIZE} part, the
    {MIN_COST_REGION} supplier offering it at the minimum observed cost
    (min line price as the supply-cost proxy; the reference schema has
    no partsupp). The correlated scalar subquery ("cost = (SELECT
    MIN(...) WHERE same part)") decorrelates into an aggregate + an
    equality join back on (part, min_cost) — one shuffle instead of a
    re-executed subquery per row. Ties break to the smallest suppkey so
    the winner is deterministic.

    Scale shape: the (part, supp) cost relation is a map-side-combinable
    hash agg over the fact table; region/nation/supplier are broadcast
    dims pruning BEFORE the per-part argmin, so the argmin works on the
    eligible slice only; part joins in last, after the winner set has
    collapsed to one row per part."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == MIN_COST_REGION
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == MIN_COST_SIZE)

    cost = li.groupBy(
        F.col("l_partkey").alias("p_key"), F.col("l_suppkey").alias("s_key")
    ).agg(F.min(_dec("l_extendedprice")).alias("supply_cost"))
    dims = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), F.col("n_regionkey") == r["r_regionkey"])
        .select("s_suppkey", "s_name", "n_name")
    )
    eligible = cost.join(F.broadcast(dims), cost["s_key"] == dims["s_suppkey"])
    # rename the rollup's key so the join-back against its own lineage
    # is unambiguous (a self-derived join on the raw name is trivially
    # true under Spark's attribute resolution)
    best = (
        eligible.select(F.col("p_key").alias("bp_key"), "supply_cost")
        .groupBy("bp_key")
        .agg(F.min("supply_cost").alias("min_cost"))
    )
    winner = (
        eligible.join(
            best,
            (F.col("p_key") == F.col("bp_key"))
            & (F.col("supply_cost") == F.col("min_cost")),
        )
        .groupBy(F.col("p_key").alias("pk"), F.col("min_cost"))
        .agg(F.min("s_key").alias("s_key"))
    )
    dims2 = dims.select(
        F.col("s_suppkey").alias("w_suppkey"), "s_name", "n_name"
    )
    return (
        winner.join(F.broadcast(p), winner["pk"] == p["p_partkey"])
        .join(F.broadcast(dims2), winner["s_key"] == dims2["w_suppkey"])
        .select(
            "p_partkey",
            "p_name",
            F.col("min_cost").cast("double").alias("min_cost"),
            "s_name",
            "n_name",
        )
        .orderBy("p_partkey")
    )


@query(
    "nation_market_share",
    oracle=f"""
    WITH rev AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             sn.n_name AS supp_nation,
             CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1.00 - CAST(l.l_discount AS DECIMAL(12,2))) AS volume
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region cr ON cn.n_regionkey = cr.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      WHERE cr.r_name = '{SHARE_REGION}'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = '{SHARE_NATION}'
                    THEN volume ELSE CAST(0.00 AS DECIMAL(12,2)) END)
                AS DOUBLE) AS nation_revenue,
           CAST(SUM(volume) AS DOUBLE) AS market_revenue,
           round(CAST(SUM(CASE WHEN supp_nation = '{SHARE_NATION}'
                         THEN volume ELSE CAST(0.00 AS DECIMAL(12,2)) END)
                      AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM rev
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: {SHARE_NATION}'s yearly share of supplier revenue
    in {SHARE_REGION}'s customer market — the widest join tree in the
    engine (fact ⋈ orders ⋈ customer ⋈ nation ⋈ region ⋈ supplier ⋈
    nation). Every dimension broadcasts; the customer-region filter
    prunes through the join chain before the fact rows fan into the
    aggregate. Both the numerator (conditional) and denominator are
    order-independent DECIMAL sums; the share divides the two exact
    doubles once, identically in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == SHARE_REGION)

    cust = (
        c.join(
            F.broadcast(n.select("n_nationkey", "n_regionkey")),
            c["c_nationkey"] == F.col("n_nationkey"),
        )
        .join(F.broadcast(r), F.col("n_regionkey") == r["r_regionkey"])
        .select("c_custkey")
    )
    supp = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
        s["s_nationkey"] == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")

    one = F.lit(_ONE).cast(DEC)
    zero = F.lit("0.00").cast(DEC)
    volume = _dec("l_extendedprice") * (one - _dec("l_discount"))
    rev = (
        li.join(o.select("o_orderkey", "o_custkey", "o_orderdate"), li["l_orderkey"] == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            "supp_nation",
            volume.alias("volume"),
        )
    )
    nat = F.sum(
        F.when(F.col("supp_nation") == SHARE_NATION, F.col("volume")).otherwise(zero)
    )
    tot = F.sum(F.col("volume"))
    return (
        rev.groupBy("o_year")
        .agg(
            nat.cast("double").alias("nation_revenue"),
            tot.cast("double").alias("market_revenue"),
            F.round(nat.cast("double") / tot.cast("double"), 6).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


@query(
    "product_type_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                      * (1.00 - CAST(l.l_discount AS DECIMAL(12,2)))
                    - CAST(p.p_retailprice AS DECIMAL(12,2))
                      * CAST(l.l_quantity AS DECIMAL(12,2)) * 0.80)
                AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%{PROFIT_NAME_FRAGMENT}%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on '{PROFIT_NAME_FRAGMENT}'-family parts by
    supplier nation and order year. Profit = discounted revenue minus a
    retail-price-derived cost proxy (80% of retail × quantity — the
    schema has no ps_supplycost), entirely in DECIMAL so the grouped sum
    is accumulation-order-free.

    Scale shape: the LIKE filter prunes ``part`` BEFORE it broadcasts
    (a name-family scan touches a few % of parts); supplier⋈nation
    broadcasts; orders joins on the fact's orderkey — the one genuinely
    big⋈big join, shuffled on the key both sides already carry."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like(f"%{PROFIT_NAME_FRAGMENT}%")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")

    one = F.lit(_ONE).cast(DEC)
    cost_factor = F.lit("0.80").cast(DEC)
    profit = _dec("l_extendedprice") * (one - _dec("l_discount")) - _dec(
        "p_retailprice"
    ) * _dec("l_quantity") * cost_factor
    supp = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_retailprice")), li["l_partkey"] == F.col("p_partkey"))
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(o.select("o_orderkey", "o_orderdate"), li["l_orderkey"] == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@query(
    "supplier_part_variety",
    oracle=f"""
    WITH at_risk AS (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    ),
    links AS (
      SELECT DISTINCT l.l_partkey, l.l_suppkey
      FROM lineitem l
      WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM at_risk)
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT k.l_suppkey) AS supplier_cnt
    FROM links k JOIN part p ON k.l_partkey = p.p_partkey
    WHERE p.p_brand <> '{VARIETY_EXCLUDED_BRAND}'
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct (non-at-risk) suppliers can
    source each (brand, type, size) combination, excluding one brand.
    The NOT IN subquery decorrelates into a broadcast ANTI join (keys
    are non-null, so anti-join and NOT IN agree — contrast
    source_blocklist_filter, where nullable values forced NOT EXISTS).

    Scale shape: the distinct (part, supp) link relation collapses the
    fact table once; the at-risk exclusion is a tiny broadcast anti
    BEFORE the distinct so excluded rows never reach the aggregation;
    count_distinct shuffles on the (brand, type, size) group key."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") != VARIETY_EXCLUDED_BRAND
    )
    at_risk = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    links = (
        li.select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(at_risk),
            li["l_suppkey"] == at_risk["s_suppkey"],
            "left_anti",
        )
        .distinct()
    )
    return (
        links.join(F.broadcast(p), links["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "excess_stock_suppliers",
    oracle=f"""
    WITH family AS (
      SELECT p_partkey FROM part WHERE p_name LIKE '%{EXCESS_NAME_FRAGMENT}%'
    ),
    shipped AS (
      SELECT l.l_suppkey, CAST(SUM(l.l_quantity) AS BIGINT) AS family_qty
      FROM lineitem l JOIN family f ON l.l_partkey = f.p_partkey
      GROUP BY 1
    )
    SELECT s.s_name, n.n_name, sh.family_qty
    FROM shipped sh
    JOIN supplier s ON sh.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE sh.family_qty > {EXCESS_MIN_QTY}
    ORDER BY s.s_name
    """,
)
def excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved more than {EXCESS_MIN_QTY}
    units of the '{EXCESS_NAME_FRAGMENT}' part family — the nested
    IN-chain (suppliers IN (... parts IN (...))) decorrelated into a
    semi-join pipeline: the name-family part keys broadcast into the
    fact scan, the per-supplier quantity aggregate applies the HAVING
    threshold, and only qualifying suppliers join the dim tables.
    Integer quantities keep the threshold exact."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like(f"%{EXCESS_NAME_FRAGMENT}%")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    shipped = (
        li.join(F.broadcast(p.select("p_partkey")), li["l_partkey"] == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").cast("long").alias("family_qty"))
        .filter(F.col("family_qty") > EXCESS_MIN_QTY)
    )
    return (
        shipped.join(F.broadcast(s), shipped["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("s_name", "n_name", "family_qty")
        .orderBy("s_name")
    )


@query(
    "sole_late_supplier_orders",
    oracle=f"""
    WITH lines AS (
      SELECT l.l_orderkey, l.l_suppkey,
             MAX(CASE WHEN l.l_shipdate > o.o_orderdate
                           + INTERVAL {LATE_GRACE_DAYS} DAY
                 THEN 1 ELSE 0 END) AS is_late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    sole_late AS (
      SELECT a.l_suppkey
      FROM lines a
      WHERE a.is_late = 1
        AND EXISTS (SELECT 1 FROM lines b
                    WHERE b.l_orderkey = a.l_orderkey
                      AND b.l_suppkey <> a.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lines c
                        WHERE c.l_orderkey = a.l_orderkey
                          AND c.l_suppkey <> a.l_suppkey
                          AND c.is_late = 1)
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM sole_late j JOIN supplier s ON j.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT {LATE_TOP_K}
    """,
)
def sole_late_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late supplier on a
    multi-supplier order (lateness = shipping more than
    {LATE_GRACE_DAYS} days after the order date; the schema has no
    receipt/commit dates). The classic EXISTS + NOT-EXISTS pair over the
    same table decorrelates into ONE aggregation: per (order, supplier)
    lateness flags roll up per order into (n_suppliers, n_late_suppliers,
    max late suppkey) — and when n_late_suppliers = 1 that max IS the
    sole late supplier, so the filter "n_suppliers > 1 AND
    n_late_suppliers = 1" replaces both correlated subqueries with ZERO
    self-joins: the flags relation is never revisited, unlike the
    textbook EXISTS/NOT-EXISTS plan that rescans the fact three times.

    Scale shape: one fact join + two hash aggs chained on the same
    l_orderkey shuffle partitioning (the second agg is exchange-free);
    supplier broadcasts at the end. No join is order×order sized."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier")

    late = F.when(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), LATE_GRACE_DAYS),
        1,
    ).otherwise(0)
    lines = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(li["l_orderkey"].alias("ok"), "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    per_order = lines.groupBy("ok").agg(
        F.count("*").alias("n_supps"),
        F.sum("is_late").alias("n_late"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
            "late_supp"
        ),
    )
    # n_late == 1 makes late_supp the unique late supplier on the order —
    # no join back to `lines` needed.
    sole = (
        per_order.filter((F.col("n_supps") > 1) & (F.col("n_late") == 1))
        .select(F.col("late_supp").alias("l_suppkey"))
    )
    return (
        sole.join(F.broadcast(s), sole["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(LATE_TOP_K)
    )
