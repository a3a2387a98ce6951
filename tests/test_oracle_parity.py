"""Self-check mirroring the driver's t2 gate: run every registered query
on Spark AND its DuckDB oracle, compare row count, column names, and
order-insensitive values (exact — the driver value-hashes, so any
difference fails).
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from cs_5542_lab_6_spark.registry import all_oracles, all_queries


def _canon_cell(v):
    """Canonicalize a cell for exact order-insensitive comparison."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr of the exact double — engines must agree bit-for-bit
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return repr(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon_cell(r[i]) for i in order) for r in rows)


def _pairs():
    qs, os_ = all_queries(), all_oracles()
    return [(name, qs[name], os_[name]) for name in sorted(os_)]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, sf_dir, oracle, name, fn, sql):
    sdf = fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    rel = oracle.sql(sql)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in duck_cols
    ), f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _canon_rows([c.lower() for c in spark_cols], spark_rows)
    b = _canon_rows([c.lower() for c in duck_cols], duck_rows)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first value mismatch: {mismatches[0]}"


def test_all_queries_return_rows_or_schema(spark, sf_dir):
    """Every registered query (oracle-backed or not) must at least run and
    produce a stable schema — the driver's smoke criterion."""
    for name, fn in all_queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name}: empty schema"
        df.limit(1).collect()
