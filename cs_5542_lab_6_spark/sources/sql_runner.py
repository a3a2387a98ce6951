"""SQL script runner + SQL API surface (SURVEY §2.1 S11–S12).

The reference runs ``.sql`` files by splitting on ';' and executing each
statement against Snowflake (scripts/run_sql_file.py:19-54), with USE
WAREHOUSE/DATABASE session context before every query (S11). The Spark
analogue: register the fixture views once per session (the one-time
session-context setter) and feed statements to ``spark.sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401 (re-export convenience)

from ..registry import query
from .tables import register_views


def split_sql_statements(script: str) -> list[str]:
    """Split a SQL script on statement-terminating ';' only.

    The reference splits naively on every ';' (scripts/run_sql_file.py:24),
    which shatters statements containing semicolons inside string
    literals or comments. This splitter tracks the four SQL lexical
    contexts where ';' is NOT a terminator: '...' string literals (with
    both '' and backslash escaping — Spark's default parser honors \\'),
    "..." quoted identifiers, ``--`` line comments, and ``/* */`` block
    comments (nested, as Spark accepts — SPARK-28880)."""
    stmts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(script)
    mode = None  # None | "'" | '"' | "--" | "/*"
    comment_depth = 0
    while i < n:
        ch = script[i]
        nxt = script[i + 1] if i + 1 < n else ""
        if mode is None:
            if ch == ";":
                stmts.append("".join(buf))
                buf = []
                i += 1
                continue
            if ch == "'" or ch == '"':
                mode = ch
            elif ch == "-" and nxt == "-":
                mode = "--"
            elif ch == "/" and nxt == "*":
                mode = "/*"
                comment_depth = 1
                buf.append(ch)
                i += 1
                ch = "*"
        elif mode in ("'", '"'):
            if ch == "\\":  # backslash escape (Spark default semantics)
                buf.append(ch)
                i += 1
                ch = script[i] if i < n else ""
            elif ch == mode:
                if ch == "'" and nxt == "'":  # '' escape inside a literal
                    buf.append(ch)
                    i += 1
                else:
                    mode = None
        elif mode == "--":
            if ch == "\n":
                mode = None
        elif mode == "/*":
            if ch == "/" and nxt == "*":  # nested comment opens
                comment_depth += 1
                buf.append(ch)
                i += 1
                ch = "*"
            elif ch == "*" and nxt == "/":
                comment_depth -= 1
                buf.append(ch)
                i += 1
                ch = "/"
                if comment_depth == 0:
                    mode = None
        buf.append(ch)
        i += 1
    stmts.append("".join(buf))
    return [s for s in (x.strip() for x in stmts) if s]


def run_sql_script(spark: SparkSession, script: str) -> DataFrame | None:
    """Execute a multi-statement SQL script, returning the result of the
    last statement (scripts/run_sql_file.py:19-54 shape — but statements
    become lazy Catalyst plans, not network round trips)."""
    result: DataFrame | None = None
    for stmt in split_sql_statements(script):
        result = spark.sql(stmt)
    return result


_SCRIPT = """
CREATE OR REPLACE TEMP VIEW order_totals AS
SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
FROM orders GROUP BY o_custkey;

SELECT c.c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(t.total_spent AS DECIMAL(18,2))) AS DOUBLE) AS segment_revenue
FROM order_totals t JOIN customer c ON t.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


@query(
    "sql_script_segment_revenue",
    oracle="""
    WITH order_totals AS (
      SELECT o_custkey, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
      FROM orders GROUP BY o_custkey
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(t.total_spent AS DECIMAL(18,2))) AS DOUBLE) AS segment_revenue
    FROM order_totals t JOIN customer c ON t.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def sql_script_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 end to end: session-context view registration (S11, once) then
    a two-statement script — a CREATE TEMP VIEW stage checkpointed as a
    view instead of a table, and a join+agg over it. Shows the engine's
    pure-SQL entry point produces the same plans as the DataFrame API."""
    register_views(spark, sf_dir)
    result = run_sql_script(spark, _SCRIPT)
    assert result is not None
    return result


def run_sql_script_params(
    spark: SparkSession, script: str, params: dict[str, object] | None = None
) -> DataFrame | None:
    """Parameterized variant of ``run_sql_script`` using Spark's named
    parameter markers (``:name``), the SQL-injection-safe replacement for
    the reference's f-string query assembly (tools.py builds SQL by
    interpolating user text straight into the statement). Parameters bind
    as typed literals in the parser — user input can never change the
    statement's shape."""
    result: DataFrame | None = None
    for stmt in split_sql_statements(script):
        result = spark.sql(stmt, args=params) if params else spark.sql(stmt)
    return result


# Pipe-syntax + SQL-UDF script (Spark 4 SQL surfaces through the same
# runner): a scalar SQL UDF declares the discounted-line-revenue
# expression ONCE (typed DECIMAL so the arithmetic stays exact), and the
# query body is |> pipe syntax — each stage reads top-down, the way the
# optimizer sees it.
_PIPE_SCRIPT = """
CREATE OR REPLACE TEMPORARY FUNCTION line_revenue(
    p DECIMAL(12,2), d DECIMAL(12,2)
) RETURNS DECIMAL(16,4) RETURN p * (1.00 - d);

FROM lineitem
|> WHERE l_shipdate >= TIMESTAMP '1996-01-01'
|> AGGREGATE CAST(SUM(line_revenue(CAST(l_extendedprice AS DECIMAL(12,2)),
                                   CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS revenue,
             COUNT(*) AS n_lines
   GROUP BY l_returnflag
|> ORDER BY l_returnflag
"""


@query(
    "sql_script_pipe_revenue",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1.00 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def sql_script_pipe_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 pipe-syntax SQL (`|>`) plus a typed scalar SQL UDF, both
    executed through the engine's standard script runner — the modern
    spelling of the S12 surface. The UDF keeps the revenue expression in
    DECIMAL end to end, so the result is value-hash exact against the
    classic-syntax DuckDB oracle (pipe syntax is sugar: Catalyst lowers
    it to the identical logical plan, which is the point — adopting the
    2024 SQL style costs nothing at any scale)."""
    register_views(spark, sf_dir)
    result = run_sql_script(spark, _PIPE_SCRIPT)
    assert result is not None
    return result


# Procedural SQL scripting (Spark 4 BEGIN/END compound statements):
# DECLARE'd session variables, a labeled LOOP with LEAVE, and scalar
# subqueries driving control flow — the stored-procedure-shaped surface
# the reference's .sql runner never had. A compound statement contains
# ';' internally, so it executes as ONE spark.sql call (the statement
# splitter's per-';' contract is for plain scripts; compound blocks are
# the parser's job).
_PROC_SCRIPT = """
BEGIN
  DECLARE thr DOUBLE DEFAULT 1000.0;
  DECLARE n BIGINT DEFAULT 0;
  search: LOOP
    SET n = (SELECT COUNT(*)
             FROM (SELECT o_custkey,
                          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                            AS total
                   FROM orders GROUP BY o_custkey)
             WHERE total > thr);
    IF n <= 20 THEN LEAVE search; END IF;
    SET thr = thr * 2.0;
  END LOOP;
  SELECT thr AS threshold, n AS n_customers;
END
"""


@query(
    "sql_script_procedural_threshold",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders GROUP BY o_custkey
    ),
    cand AS (
      SELECT 1000.0 * power(2.0, k) AS thr FROM generate_series(0, 40) AS t(k)
    ),
    counted AS (
      SELECT thr, (SELECT COUNT(*) FROM spend WHERE total > thr) AS n
      FROM cand
    )
    SELECT thr AS threshold, CAST(n AS BIGINT) AS n_customers
    FROM counted WHERE n <= 20 ORDER BY thr LIMIT 1
    """,
)
def sql_script_procedural_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 procedural compound statements) through the
    S12 surface: a doubling search for the smallest power-of-2 spend
    threshold that keeps at most 20 top customers — DECLARE'd variables,
    a labeled LOOP/LEAVE, IF control flow, and a scalar subquery per
    round. Because the qualifying count is monotone nonincreasing in the
    threshold, the loop's stopping point equals the smallest qualifying
    candidate in the doubling sequence, which the oracle finds
    relationally (generate_series + ORDER BY + LIMIT 1) — iterative
    control flow, value-checked without iteration.

    Scale: each round is one aggregation job (the same shape as the
    k-means/BPE driver loops, but expressed IN SQL, no Python between
    rounds); the doubling bound caps rounds at ~40 regardless of data
    size. Arithmetic is exact (powers of two in doubles, integer
    counts), so the result hash-matches."""
    register_views(spark, sf_dir)
    # Scripting must be enabled only while the compound statement is
    # parsed/executed; restore the prior value so the flag doesn't leak
    # into every later query on the shared session (ADVICE r7).
    prev = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(_PROC_SCRIPT)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", prev)
