"""Query registry — the engine's public API surface.

The reference exposes its query capabilities as a registry of named,
parameterized tool functions dispatched by name
(reference: tool_schemas.py:106-118, agent.py:65-92). The Spark engine
keeps the same shape: every operator from SURVEY §2 registers a named
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible) a
DuckDB oracle string. ``__spark_entry__.py`` re-exports this registry as
the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Q:
    """One registered operator: the Spark implementation and its oracle.

    ``oracle`` is ANSI SQL runnable by DuckDB over the fixture views; None
    marks a genuinely non-SQL-expressible operator (driver falls back to a
    rows-only check).
    """

    fn: QueryFn
    oracle: str | None = None


_REGISTRY: dict[str, Q] = {}

# Driver-facing registration order. The correctness harness evaluates a
# bounded prefix of ``queries()`` (50 entries), so ordering IS the
# verification budget. The window ROTATES across rounds (VERDICT r4
# item 4; r5 item 1; r6 item 1; r7 item 4): after round 7 every
# registered query has a green driver row in some round's CORRECTNESS
# file, so the contract from round 8 on is FRESHNESS — lead with the
# queries REGISTERED or SEMANTICALLY CHANGED this round (first driver
# check the same round they land), then the previous round's cohort,
# then the least-recently driver-checked vintage rows, always ending
# with the permanent regression-guard core.
# Rotated-out queries stay verified every session by
# tests/test_oracle_parity.py (rows+schema+exact-value over all
# registered oracles) and at sf0.1 by tests/test_scale_canary.py.
_PRIORITY: tuple[str, ...] = (
    # --- New in round 12 (registered this round; first driver check):
    "stream_dedup_admission",         # micro-batch screen vs standing index
    "embedding_drift_psi",            # LSH-bucket PSI, incoming vs reference
    # --- CHANGED in round 12 (oracle gained star_edges_failing_verify):
    "dedup_lsh_bucket_audit",
    # --- Changed-oracle COMPOSITIONS owed a fresh row (r11 verdict item
    # --- 1: their oracle text changed with the r11 LSH cap, but their
    # --- last driver rows are r7/r7/r10 — the hard signal against the
    # --- CURRENT oracle text lands this round):
    "dedup_clusters",
    "dedup_clusters_star",
    "dedup_method_eval",
    # --- Staleness fill: 38 of the 41 remaining r7-vintage rows (the
    # --- whole cohort minus three deferred to r13: the two rows-only
    # --- sketches orders_approx_stats / events_heavy_hitters_sketch —
    # --- each pinned in-window by an exact hash-checked twin since
    # --- r8/r9 — and supplier_part_variety, whose simple grouped-agg
    # --- shape several in-window TPC-H rows cover). After this window
    # --- the r7 cohort is 3 rows — under the verdict's <=10.
    "bm25_rerank_topk",
    "corpus_bpe_merge_candidates",
    "corpus_bpe_tokenize_stats",
    "corpus_bpe_train",
    "corpus_curation_decisions",
    "corpus_duplicate_sentences",
    "corpus_snapshot_diff",
    "corpus_vocab_growth",
    "curation_by_source",
    "customer_rfm_segments",
    "customer_top_orders_lateral",
    "dedup_rate_by_source",
    "doc_lm_perplexity",
    "doc_quality_filter_funnel",
    "doc_token_entropy",
    "events_hourly_seasonality",
    "events_props_variant",
    "events_session_windows",
    "events_transition_matrix",
    "excess_stock_suppliers",
    "kg_degree_distribution",
    "kg_reachability_sql",
    "kg_two_hop",
    "min_cost_part_supplier",
    "multimodal_decode_features",
    "nation_market_share",
    "orders_date_spine_gaps",
    "orders_merge_upsert",
    "orders_mv_incremental_refresh",
    "priority_price_gini",
    "product_type_profit",
    "sole_late_supplier_orders",
    "sql_script_pipe_revenue",
    "sql_script_procedural_threshold",
    "stream_user_stats_stateful",
    "stream_user_top_purchases",
    "tokenizer_fertility_by_lang",
    "user_click_purchase_cogroup",
    # --- Regression guards that stay in every window
    "chunks_build",            # corpus chunker (pure-Catalyst UDTF twin)
    "kg_edges_build",          # co-occurrence one-shuffle expansion
    "vector_topk",             # flagship retrieval
    "eval_metrics_log",        # JSON sink (red in r4, fixed r5)
    "stream_tumbling_daily",   # real Structured Streaming
    "ann_ivf_topk",            # warm ivf_centroids seam, cold path
    # --- r13 rotation plan (write-down required by the r11 verdict,
    # --- item 8; apply verbatim next round): window = any r13 new/changed
    # --- queries, then the 3 deferred r7 rows (orders_approx_stats,
    # --- events_heavy_hitters_sketch, supplier_part_variety), then the
    # --- ENTIRE 23-row r8 cohort
    # --- rows (active_customer_keys, agent_chunk_context, ann_lsh_topk,
    # --- chunks_with_embeddings, corpus_chunk_ratio,
    # --- corpus_token_frequencies, corpus_verify, dedup_embedding_nn,
    # --- dedup_simhash, doc_fingerprints, doc_language_id,
    # --- doc_token_stats, order_fill_status, order_status_priority_cube,
    # --- orders_per_month, papers_build, part_catalog_slugs,
    # --- returnflag_pivot, revenue_forecast,
    # --- status_priority_grouping_sets, top_orders_by_revenue,
    # --- user_event_gaps, vector_topk_filtered), then stalest-r9 fill to
    # --- 44, then the 6 guards. That clears every pre-r9 vintage.
)


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query name {name!r}")
    _REGISTRY[name] = Q(fn, oracle)


def _ordered() -> dict[str, Q]:
    """Registry in driver-facing order: the _PRIORITY prefix, then the
    remaining registrations in module import order."""
    _load_all_modules()
    out: dict[str, Q] = {}
    for name in _PRIORITY:
        if name in _REGISTRY:
            out[name] = _REGISTRY[name]
    for name, q in _REGISTRY.items():
        if name not in out:
            out[name] = q
    return out


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator form: ``@query("vector_topk", oracle=...)``."""

    def deco(fn: QueryFn) -> QueryFn:
        register(name, fn, oracle)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in _ordered().items()}


def all_oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in _ordered().items() if q.oracle is not None}


_LOADED = False


def _load_all_modules() -> None:
    """Import every module that registers queries (import-for-effect)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        cogrouped,
        curation,
        dedup,
        joins_ext,
        lakehouse,
        mixing,
        multimodal,
        provenance,
        ranking,
        relational,
        retrieval,
        semistructured,
        similarity,
        skew,
        subqueries,
        textstats,
        tpch_ext,
        windows,
    )
    from . import agent_api  # noqa: F401
    from .pipeline import corpus, evaluation, maintenance  # noqa: F401
    from .sources import sql_runner  # noqa: F401
    from .streaming import batch_twins, stream  # noqa: F401

    _LOADED = True
