"""Incremental materialized-view maintenance invariants.

Value parity with the full recompute is the oracle's job
(test_oracle_parity / the driver); these tests pin the REASONS the
implementations are shaped the way they are."""

from __future__ import annotations

from pyspark.sql import functions as F

from cs_5542_lab_6_spark.operators.relational import (
    MV_DISTINCT_CUT,
    orders_mv_distinct_refresh,
)
from cs_5542_lab_6_spark.sources import load_table


def test_naive_distinct_merge_would_be_wrong(spark, sf_dir):
    """The hazard orders_mv_distinct_refresh exists for must be REAL on
    the fixture: summing per-batch distinct counts across the refresh
    cut over-counts customers active on both sides. If no month
    straddles the cut with an overlapping customer, the query would be
    demonstrating nothing."""
    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    base_pred = F.col("o_orderdate") < MV_DISTINCT_CUT

    def per_batch(df):
        return df.groupBy(month).agg(
            F.countDistinct("o_custkey").alias("nd")
        )

    naive = (
        per_batch(o.filter(base_pred))
        .unionByName(per_batch(o.filter(~base_pred)))
        .groupBy("month")
        .agg(F.sum("nd").alias("naive_nd"))
    )
    true = o.groupBy(month).agg(F.countDistinct("o_custkey").alias("true_nd"))
    joined = naive.join(true, "month").collect()
    assert any(r["naive_nd"] > r["true_nd"] for r in joined), (
        "fixture has no customer straddling the refresh cut — "
        "the naive-merge hazard is not exercised"
    )
    # and the query's exact key-set merge equals the truth everywhere
    got = {
        r["month"]: r["n_customers"]
        for r in orders_mv_distinct_refresh(spark, sf_dir).collect()
    }
    want = {r["month"]: r["true_nd"] for r in joined}
    assert got == want


def test_distinct_refresh_hll_envelope_holds(spark, sf_dir):
    rows = orders_mv_distinct_refresh(spark, sf_dir).collect()
    assert len(rows) > 1
    assert all(r["hll_in_envelope"] is True for r in rows)
    months = [r["month"] for r in rows]
    assert months == sorted(months)
