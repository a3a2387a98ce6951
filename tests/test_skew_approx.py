"""Salting invariance and sketch error-envelope checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from cs_5542_lab_6_spark.operators.skew import (
    events_salted_type_stats,
    orders_approx_stats,
)
from cs_5542_lab_6_spark.sources import load_table


def test_salted_agg_equals_direct(spark, sf_dir):
    salted = {
        r["event_type"]: (r["n_events"], r["total_value"])
        for r in events_salted_type_stats(spark, sf_dir).collect()
    }
    direct = {
        r["event_type"]: (r["n"], r["v"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("v"),
        )
        .collect()
    }
    assert salted == direct


def test_approx_stats_error_envelope(spark, sf_dir):
    approx = {r["o_orderstatus"]: r for r in orders_approx_stats(spark, sf_dir).collect()}
    exact = {
        r["o_orderstatus"]: r
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("nd"), F.count("*").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for status, row in approx.items():
        nd = exact[status]["nd"]
        assert abs(row["approx_customers"] - nd) <= max(3, 0.05 * nd)
        assert row["n_orders"] == exact[status]["n"]
        assert row["price_p50"] <= row["price_p90"] <= row["price_p99"]
