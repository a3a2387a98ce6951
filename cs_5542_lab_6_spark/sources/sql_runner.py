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


def run_sql_script(spark: SparkSession, script: str) -> DataFrame | None:
    """Execute a multi-statement SQL script (';'-separated), returning the
    result of the last statement (scripts/run_sql_file.py:19-54 shape —
    but statements become lazy Catalyst plans, not network round trips)."""
    result: DataFrame | None = None
    for stmt in script.split(";"):
        stmt = stmt.strip()
        if stmt:
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
