"""Registry ordering contract: the driver correctness harness checks a
bounded prefix of ``queries()`` (50 entries observed in round 1), so the
priority prefix must (a) reference only registered names, (b) actually
lead the returned dict, and (c) put every query owed a driver
CORRECTNESS row inside the first 50 slots."""

from __future__ import annotations

from cs_5542_lab_6_spark import registry
from cs_5542_lab_6_spark.registry import all_oracles, all_queries

DRIVER_WINDOW = 50

# The window rotates across rounds (VERDICT r4 item 4; r5 item 1; r6
# item 1; r7 item 4) so every family gets a driver CORRECTNESS row at
# least once; rotated-out queries stay verified by test_oracle_parity.py
# and the sf0.1 scale canary. After round 7 cumulative driver coverage
# is 100%, so the contract from round 8 on is FRESHNESS: (a) every
# query registered or semantically changed in a round gets its first driver check the same round it
# lands, and (b) the window refreshes the stalest driver rows (r1/r4
# vintage) plus the permanent regression-guard core.
REFERENCE_PARITY = [
    # changed in round 16 — the lm_counts stage was rebuilt as a single
    # corpus explode; these three queries' cold derivation transits the
    # changed builder, so they re-verify the round it changed
    "doc_lm_perplexity",
    "corpus_doremi_weights",
    "corpus_doremi_sample",
    # the 27 remaining r11-vintage rows (r15 plan — the full written-down
    # set; absence of ANY re-violates the freshness contract, and after
    # this window no pre-r12 vintage remains)
    "doc_token_familiarity",
    "embedding_kmeans",
    "events_daily_anomaly",
    "events_lateness_audit",
    "events_retention_cohorts",
    "events_watermark_sizing",
    "kg_degree_assortativity",
    "kg_link_prediction",
    "kg_pagerank",
    "kg_sparse_neighborhood_jaccard",
    "kg_triangle_stats",
    "language_id_confusion",
    "large_order_customers",
    "nation_price_medians",
    "nation_trade_flows",
    "national_supplier_share",
    "order_priority_exists_counts",
    "promo_revenue_share",
    "quiet_wealthy_customers",
    "returned_item_customers",
    "small_quantity_part_revenue",
    "source_blocklist_filter",
    "source_overlap_matrix",
    "source_quality_profile",
    "stream_scd2_apply",
    "stream_user_enriched_counts",
    "top_supplier_revenue",
    # r12-fill sample pins (first-14-alphabetical-of-the-others rule in
    # registry.py — doc_lm_perplexity is the r12 row already covered by
    # the changed set above)
    "bm25_rerank_topk",
    "corpus_bpe_train",
    "customer_rfm_segments",
    "dedup_lsh_bucket_audit",
    # regression guards that must stay in every window
    "chunks_build",
    "kg_edges_build",
    "vector_topk",
    "eval_metrics_log",
    "stream_tumbling_daily",
]

# Since r14 NO query is registered without an oracle: the driver has no
# rows-only mode (an oracle-less entry returns err: "no_oracle" and is
# never verified — disproven assumption, CORRECTNESS_r13). The two
# sketch queries now emit exact-derivable anchors + envelope-boolean
# decisions with literal-TRUE oracles (operators/skew.py).
ROWS_ONLY_ALLOWED: set[str] = set()


def test_priority_names_all_registered():
    names = set(all_queries())
    missing = [n for n in registry._PRIORITY if n not in names]
    assert not missing, f"_PRIORITY references unregistered queries: {missing}"
    assert len(set(registry._PRIORITY)) == len(registry._PRIORITY)


def test_priority_prefix_leads_registry():
    ordered = list(all_queries())
    assert ordered[: len(registry._PRIORITY)] == list(registry._PRIORITY)


def test_priority_fills_the_window():
    """The driver checks exactly DRIVER_WINDOW slots; an underfull
    prefix would hand slots to arbitrary module-import order."""
    assert len(registry._PRIORITY) == DRIVER_WINDOW


def test_reference_parity_inside_driver_window():
    window = list(all_queries())[:DRIVER_WINDOW]
    outside = [n for n in REFERENCE_PARITY if n not in window]
    assert not outside, f"rotation-debt queries outside window: {outside}"


def test_window_queries_are_oracle_backed():
    """EVERY registered query carries a DuckDB oracle (not just the
    window): the driver has no rows-only fallback, so an oracle-less
    registration can never earn a green CORRECTNESS row."""
    oracles = all_oracles()
    missing = [n for n in all_queries() if n not in oracles and n not in ROWS_ONLY_ALLOWED]
    assert not missing, f"registered queries without oracles: {missing}"


def test_bench_headline_names_all_registered():
    """bench.py filters HEADLINE through `if n in queries`, so a typo'd
    or renamed entry would silently DROP a query from the benchmark (the
    total would shrink and read as a speedup). Every headline name must
    resolve, and stay unique so no median is double-counted."""
    import bench

    names = set(all_queries())
    missing = [n for n in bench.HEADLINE if n not in names]
    assert not missing, f"HEADLINE references unregistered queries: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)
