"""Vectorized UDAF surface (§2.11): a GROUPED_AGG pandas UDF.

``gini_udaf`` is the Arrow-batched user-defined AGGREGATE twin of the
registered ``priority_price_gini`` query: usable directly in
``groupBy(...).agg(gini_udaf("x"))`` (and over unbounded windows), one
scalar out per group. The registered query keeps the JVM-side
ordered-fold plan — a GROUPED_AGG UDF materializes each group's values
in the Python worker, which is the right tool for bounded-cardinality
dimensions and the wrong one for 100 TB groups (docstring of the query
names the sketch alternative). The unit test pins UDAF == relational
plan == pure-Python replica on the same data.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def gini_py(values: list[float]) -> float | None:
    """Sequential-fold replica: G = 2·Σ i·x_i / (n·Σ x_i) − (n+1)/n over
    ascending-sorted values (1-based i), accumulated in sort order so
    the IEEE result matches the engine's position-ordered fold.

    Degenerate groups (empty, or summing to zero — e.g. an all-zero
    column) have no defined Gini; return None so the aggregate yields
    NULL instead of crashing (ADVICE r7)."""
    xs = sorted(float(v) for v in values)
    n = len(xs)
    sxi = 0.0
    sx = 0.0
    for i, x in enumerate(xs, start=1):
        sxi += i * x
        sx += x
    if n == 0 or sx == 0.0:
        return None
    return 2.0 * sxi / (n * sx) - (n + 1.0) / n


# DataType object, not a DDL string: the decorator re-evaluates on the
# Python worker at unpickle time, where no SparkSession exists to parse DDL
@pandas_udf(T.DoubleType())
def gini_udaf(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDF: receives one group's values as a Series,
    returns the group's Gini coefficient."""
    return gini_py(v.tolist())
