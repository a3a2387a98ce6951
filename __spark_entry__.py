"""Driver contract for the spark-graft builder (PySpark target).

Thin façade over ``cs_5542_lab_6_spark.registry`` — every operator module
registers its named query + DuckDB oracle there; this file just re-exports
the registry in the driver's shape (mirroring the reference's named-tool
registry, tool_schemas.py:106-118).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cs_5542_lab_6_spark import registry
from cs_5542_lab_6_spark.operators.retrieval import cosine_topk

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.1 step 1): brute-force cosine top-k
    retrieval — documents ⋈ embeddings scored against a query vector,
    TakeOrderedAndProject top-5 (the M5 operator, tools.py:45-92)."""
    return cosine_topk(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query. Every registered query carries
    one — the driver has no rows-only fallback (an omitted oracle comes
    back ``err: "no_oracle"``, observed in CORRECTNESS_r13); sketch
    operators therefore emit envelope-boolean decisions the oracle
    states literal-TRUE (operators/skew.py)."""
    return registry.all_oracles()
