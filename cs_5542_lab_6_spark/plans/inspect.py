"""Physical-plan inspection utilities.

The engine's scale guarantees are plan-shape properties — filters reach
the parquet reader, dims broadcast (and big sides degrade to shuffle
joins), top-k plans as TakeOrderedAndProject, candidate joins never fall
back to nested loops. These helpers expose the formatted physical plan
so tests (tests/test_plans.py) and interactive sessions can assert those
properties instead of eyeballing ``df.explain()`` output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The EXPLAIN FORMATTED physical plan as a string (node tree plus
    the per-node detail section, including PushedFilters / ReadSchema)."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def optimized_plan(df: DataFrame) -> str:
    """The Catalyst optimized logical plan (pre-physical-planning) —
    useful for asserting operator ordering (e.g. limits below windows)."""
    return df._jdf.queryExecution().optimizedPlan().toString()


def scan_pushdown(df: DataFrame) -> dict[str, list[str]]:
    """{'pushed_filters': [...], 'read_schema': [...]} harvested from the
    formatted plan — the two lines that prove a scan prunes."""
    out: dict[str, list[str]] = {"pushed_filters": [], "read_schema": []}
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            out["pushed_filters"].append(line.removeprefix("PushedFilters:").strip())
        elif line.startswith("ReadSchema:"):
            out["read_schema"].append(line.removeprefix("ReadSchema:").strip())
    return out
