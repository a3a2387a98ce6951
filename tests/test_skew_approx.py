"""Salting invariance and sketch error-envelope checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from cs_5542_lab_6_spark.operators.skew import (
    _orders_approx_raw,
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
    approx = {r["o_orderstatus"]: r for r in _orders_approx_raw(spark, sf_dir).collect()}
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


def test_heavy_hitters_sketch_error_envelope(spark, sf_dir):
    """approx_top_k counts and the HLL distinct-user estimate must land
    within sketch error bounds of the exact answers, and the proposed
    hitter set must cover the true top half of the exact top-k (sketch
    rank inversions near ties are legitimate; missing a dominant key is
    not)."""
    from pyspark.sql import functions as F

    from cs_5542_lab_6_spark.operators.skew import (
        HH_TOP_K,
        _events_hh_sketch_raw,
    )
    from cs_5542_lab_6_spark.sources import load_table

    got = _events_hh_sketch_raw(spark, sf_dir).collect()
    assert 1 <= len(got) <= HH_TOP_K

    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    n_events = sum(exact.values())
    for r in got:
        true = exact[r["user_id"]]
        # approx_top_k counts: within 1% of stream size of the truth
        assert abs(r["approx_count"] - true) <= max(1, 0.01 * n_events), (
            r["user_id"], r["approx_count"], true
        )
    # HLL: 3-sigma default-precision envelope (~5%)
    est = got[0]["approx_distinct_users"]
    assert abs(est - len(exact)) <= max(2, 0.05 * len(exact))
    # coverage: the true top half of top-k all appear in the sketch set
    true_top = sorted(exact, key=lambda u: (-exact[u], u))[: HH_TOP_K // 2]
    sketch_set = {r["user_id"] for r in got}
    assert set(true_top) <= sketch_set


def test_exact_twins_carry_true_envelopes(spark, sf_dir):
    """The r8 exact twins must (a) agree with their own oracles on the
    exact values (driver-checked too) and (b) emit TRUE for every
    sketch-vs-exact envelope boolean — the in-query assertion that turns
    a sketch regression into a driver hash mismatch."""
    from cs_5542_lab_6_spark.operators.skew import (
        HH_TOP_K,
        events_heavy_hitters_exact,
        orders_exact_stats,
    )

    stats = orders_exact_stats(spark, sf_dir).collect()
    assert len(stats) >= 1
    for r in stats:
        assert r["cd_in_envelope"] is True
        assert r["pq_in_envelope"] is True
        assert r["price_p50"] <= r["price_p90"] <= r["price_p99"]
        assert r["exact_customers"] <= r["n_orders"]

    hh = events_heavy_hitters_exact(spark, sf_dir).collect()
    assert 1 <= len(hh) <= HH_TOP_K
    assert [r["rank"] for r in hh] == list(range(1, len(hh) + 1))
    counts = [r["exact_count"] for r in hh]
    assert counts == sorted(counts, reverse=True)
    for r in hh:
        assert r["approx_count_ok"] is True
        assert r["hll_ok"] is True


def test_heavy_hitters_sketch_empty_events_degenerate(spark, tmp_path):
    """Empty-input corner (r15 ADVICE item): with zero events the sketch
    join is empty, so _max_dev and _hll are NULL — BOTH envelope booleans
    must coalesce to the oracle's literal TRUE (vacuously: there is no
    estimate to be wrong), never to NULL, or the degenerate input becomes
    a driver hash mismatch. The count anchors pin the case exactly."""
    from cs_5542_lab_6_spark.operators.skew import events_heavy_hitters_sketch

    sf = str(tmp_path / "empty_ev")
    spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")

    rows = events_heavy_hitters_sketch(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_events"] == 0
    assert r["n_distinct_users"] == 0
    assert r["n_sketch_rows"] == 0
    assert r["counts_in_envelope"] is True
    assert r["hll_in_envelope"] is True
    assert r["certain_hitters_covered"] is True


def test_registered_sketch_queries_emit_true_decisions(spark, sf_dir):
    """r13 verdict item 1: the two REGISTERED sketch queries now emit
    exact-derivable anchors plus envelope booleans (the CMS/AMS/KMV
    decision idiom) so the driver hash-checks them against literal-TRUE
    oracles. Every boolean must be TRUE and every anchor must equal the
    exact value DuckDB would compute."""
    from cs_5542_lab_6_spark.operators.skew import (
        HH_TOP_K,
        events_heavy_hitters_sketch,
    )

    stats = orders_approx_stats(spark, sf_dir).collect()
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {r["o_orderstatus"] for r in stats} == set(exact)
    for r in stats:
        assert r["n_orders"] == exact[r["o_orderstatus"]]
        assert r["approx_customers_ok"] is True
        assert r["price_p50_ok"] is True
        assert r["price_p90_ok"] is True
        assert r["price_p99_ok"] is True

    hh = events_heavy_hitters_sketch(spark, sf_dir).collect()
    assert len(hh) == 1
    row = hh[0]
    ev = load_table(spark, sf_dir, "events")
    n_events, nd = ev.agg(
        F.count("*"), F.countDistinct("user_id")
    ).first()
    assert row["n_events"] == n_events
    assert row["n_distinct_users"] == nd
    assert row["n_sketch_rows"] == min(HH_TOP_K, nd)
    assert row["counts_in_envelope"] is True
    assert row["hll_in_envelope"] is True
    assert row["certain_hitters_covered"] is True
