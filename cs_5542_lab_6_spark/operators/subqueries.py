"""Decorrelated-subquery query shapes (TPC-H Q11/Q15/Q17/Q18/Q22).

The reference's SQL surface never goes beyond flat scans and IN-lists
(SURVEY §2.2–2.3; reference tools.py:69-118), but any user migrating an
analytics workload onto this engine writes correlated subqueries on day
one. This module covers the canonical decorrelation patterns the TPC-H
suite exercises, each expressed the way Catalyst wants them — the
correlated scalar/EXISTS form rewritten by hand into the aggregate-join
it would be decorrelated to, so the plan is explicit and auditable:

- per-group scalar threshold  → groupBy + equi-join    (Q17)
- IN over grouped HAVING      → left-semi join         (Q18)
- HAVING vs global scalar     → 1-row broadcast join   (Q11)
- equality with max-of-agg    → 1-row broadcast join   (Q15)
- NOT EXISTS + global scalar  → anti join + broadcast  (Q22)

Determinism contract (SURVEY §4.4): every threshold comparison is exact
decimal/integer arithmetic — averages are compared multiplied-through
(``qty * n < sum`` instead of ``qty < sum/n``) so no engine ever divides,
and money stays DECIMAL(12,2) until the final surface cast to double.

At 100 TB: every pattern here shuffles the fact side at most once (on
its natural join key) and broadcasts scalars/dims; nothing re-reads the
fact table to evaluate a subquery per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

DEC = "decimal(12,2)"


def _d(col):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


@query(
    "small_quantity_part_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
             COUNT(*) AS n_qty
      FROM lineitem GROUP BY l_partkey
    ) t ON l.l_partkey = t.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND CAST(l.l_quantity AS DECIMAL(12,2)) * t.n_qty * 5 < t.sum_qty
    """,
)
def small_quantity_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity lines — lines of a
    brand whose quantity is under 20% of that part's average quantity.

    The correlated form (``l_quantity < 0.2 * (SELECT AVG ... WHERE
    p_partkey = l_partkey)``) decorrelates into one per-part aggregate of
    lineitem joined back on partkey. The threshold is compared
    multiplied-through (``5·qty·n < Σqty``, all decimal/integer) so both
    engines evaluate the same exact inequality — no division, no float
    boundary. At scale the per-part aggregate and the probe shuffle on
    the same key (l_partkey), so AQE can plan them into one exchange
    reuse; the brand filter broadcasts from the part dim.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum(_d("l_quantity")).alias("sum_qty"),
        F.count("*").alias("n_qty"),
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(per_part, li["l_partkey"] == per_part["t_partkey"])
        .filter(_d("l_quantity") * F.col("n_qty") * F.lit(5) < F.col("sum_qty"))
        .agg(
            (F.sum(_d("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "large_order_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
           o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers who placed orders totalling > 250 units.

    The IN-subquery over a grouped HAVING decorrelates to a left-semi
    join against the qualifying-orderkey set. Scale story: the HAVING
    aggregate collapses lineitem to |orders| rows before any join; the
    semi join ships only 8-byte orderkeys; customer joins last, when the
    row set is already tiny. The final top-100 is TakeOrderedAndProject —
    no global sort materializes.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_d("l_quantity")).alias("q"))
        .filter(F.col("q") > F.lit("250").cast(DEC))
        .select("l_orderkey")
    )
    return (
        o.join(big, o["o_orderkey"] == big["l_orderkey"], "left_semi")
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(_d("l_quantity")).cast("double").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "national_supplier_share",
    oracle="""
    WITH nat AS (
      SELECT s_nationkey,
             SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS nation_balance
      FROM supplier GROUP BY s_nationkey
    ),
    tot AS (SELECT SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS total FROM supplier)
    SELECT n.n_name, CAST(nat.nation_balance AS DOUBLE) AS nation_balance
    FROM nat JOIN tot ON nat.nation_balance * 25 > tot.total
    JOIN nation n ON n.n_nationkey = nat.s_nationkey
    ORDER BY nation_balance DESC, n.n_name
    """,
)
def national_supplier_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: nations whose suppliers hold more than 4% of the
    global supplier balance — grouped HAVING against a global scalar.

    The global total is a 1-row aggregate broadcast into the HAVING
    filter; the 4% threshold is compared multiplied-through
    (``balance · 25 > total``, exact decimal) so neither engine divides.
    At scale both aggregations are partial/map-side; the scalar join is a
    broadcast of one row — never a window over an unpartitioned frame,
    which would funnel every group through a single task.
    """
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nat = s.groupBy("s_nationkey").agg(F.sum(_d("s_acctbal")).alias("nation_balance"))
    tot = s.agg(F.sum(_d("s_acctbal")).alias("total"))
    return (
        nat.crossJoin(F.broadcast(tot))
        .filter(F.col("nation_balance") * F.lit(25) > F.col("total"))
        .join(F.broadcast(n), nat["s_nationkey"] == n["n_nationkey"])
        .select("n_name", F.col("nation_balance").cast("double").alias("nation_balance"))
        .orderBy(F.desc("nation_balance"), F.asc("n_name"))
    )


@query(
    "top_supplier_revenue",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1.00 - CAST(l_discount AS DECIMAL(12,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(rev.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN rev ON s.s_suppkey = rev.supplier_no
    WHERE rev.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving the maximum quarterly
    revenue — equality against a max-of-aggregate scalar.

    The revenue view aggregates once; the max is a 1-row broadcast joined
    back on exact decimal equality (ties keep every maximal supplier, as
    the spec requires — a LIMIT 1 would silently drop co-leaders).
    Decimal equality is safe cross-engine where double equality is not.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    one = F.lit("1.00").cast(DEC)
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_d("l_extendedprice") * (one - _d("l_discount"))).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == s["s_suppkey"])
        .select("s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@query(
    "quiet_wealthy_customers",
    oracle="""
    WITH thresh AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS bal_sum,
             COUNT(*) AS bal_n
      FROM customer WHERE c_acctbal > 0.00
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer c, thresh
    WHERE CAST(c.c_acctbal AS DECIMAL(12,2)) * thresh.bal_n > thresh.bal_sum
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
      )
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def quiet_wealthy_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: the fixture has no phone column and every
    customer has ≥1 order, so the anti-join target is URGENT orders and
    the grouping key is market segment): customers with above-average
    positive balance who never placed an urgent order.

    Two decorrelations in one query: the global average is a 1-row
    broadcast compared multiplied-through (``bal · n > Σ``, exact
    decimal), and NOT EXISTS becomes a left-anti join against the
    pre-filtered urgent-order keys. At scale the anti join's build side
    carries only urgent orderers' 8-byte custkeys, and the scalar
    broadcast costs one row — the naive plan would rescan orders per
    customer row.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    thresh = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(_d("c_acctbal")).alias("bal_sum"), F.count("*").alias("bal_n")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(_d("c_acctbal") * F.col("bal_n") > F.col("bal_sum"))
        .join(urgent, c["c_custkey"] == urgent["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_d("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


LATERAL_CUSTKEY_CAP = 100
LATERAL_TOP_N = 2

# Engine-portable verbatim: Spark 4 and DuckDB both accept this text.
_LATERAL_SQL = f"""
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c
JOIN LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT {LATERAL_TOP_N}
) t ON true
WHERE c.c_custkey < {LATERAL_CUSTKEY_CAP}
ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
"""


@query("customer_top_orders_lateral", oracle=_LATERAL_SQL)
def customer_top_orders_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-group LIMIT — the "top-N per
    key as a join" idiom, run from the SAME SQL text on both engines
    (like orders_date_spine_gaps' portable spine). Naively this is one
    subquery execution per customer row; Spark decorrelates the lateral
    into a single windowed plan (rank over the correlation key, filter
    rank <= N) — the identical physical strategy
    top3_orders_per_customer spells out manually with the DataFrame
    window API, which is exactly the point: declarative lateral SQL and
    the explicit window program meet at the same plan, so the SQL form
    costs nothing at 100 TB."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)
