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

    ``oracle`` is ANSI SQL runnable by DuckDB over the fixture views.
    EVERY entry must carry one: the driver has no rows-only fallback — a
    None oracle comes back ``err: "no_oracle"`` and the query is never
    verified (disproven assumption, CORRECTNESS_r13). Probabilistic /
    sketch operators emit exact-derivable anchors plus envelope booleans
    the oracle states literal-TRUE (the decision idiom,
    operators/skew.py) instead of the raw sketch values.
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
    # --- NEW in round 14 (registered this round; first driver check):
    "corpus_doremi_weights",     # loss-derived domain mixture (DoReMi)
    "corpus_epoch_value_plan",   # repetition-value audit (data-constrained)
    # --- CHANGED in round 14 (r13 verdict item 1: restructured from
    # --- rows-only raw-sketch outputs to exact-derivable anchors +
    # --- envelope-boolean decisions with their FIRST DuckDB oracles —
    # --- first driver hash-check ever for these two names):
    "orders_approx_stats",
    "events_heavy_hitters_sketch",
    # --- The REMAINING 22 r9-vintage rows (the set written down in the
    # --- r13 plan below the r13 window; after this window no pre-r10
    # --- vintage remains anywhere in the registry):
    "events_k_anonymity_repair",
    "events_kmv_distinct",
    "events_l_diversity",
    "events_quality_expectations",
    "events_schema_evolution",
    "lineitem_zorder_layout",
    "orders_benford_audit",
    "orders_compaction_plan",
    "orders_exact_stats",
    "orders_mv_distinct_refresh",
    "orders_scd2_dimension",
    "orders_scd2_incremental",
    "part_fuzzy_matches",
    "pricing_summary",
    "quality_calibration_bins",
    "regional_customer_revenue",
    "single_status_customers",
    "skyline_parts",
    "supplier_bloom_semi_join",
    "supplier_running_revenue",
    "table_fk_integrity",
    "topk_expensive_orders",
    # --- Stalest-r10 fill to 44 (the r10 cohort is 44 rows, all equally
    # --- r10-vintage; take the first 18 alphabetically — two fill slots
    # --- went to the two new r14 registrations — so the r15 remainder
    # --- is a deterministic, written-down set of 26 rows — see the r15
    # --- plan at the end of this tuple):
    "agent_search_papers",
    "ann_brute_force_topk",
    "ann_ivf_pq_topk",
    "bm25_doc_topk",
    "chunk_vector_topk",
    "contamination_scan",
    "corpus_delete_cascade",
    "customer_balance_distribution",
    "dedup_exact",
    "doc_lookup",
    "doc_pii_scrub",
    "doc_quality_scores",
    "doc_train_test_split",
    "doc_winnowing_fingerprints",
    "doc_winnowing_overlap",
    "embedding_quantize_int8",
    "eval_rag_comparison",
    "events_asof_last_click",
    # --- Regression guards that stay in every window
    "chunks_build",            # corpus chunker (pure-Catalyst UDTF twin)
    "kg_edges_build",          # co-occurrence one-shuffle expansion
    "vector_topk",             # flagship retrieval
    "eval_metrics_log",        # JSON sink (red in r4, fixed r5)
    "stream_tumbling_daily",   # real Structured Streaming
    "ann_ivf_topk",            # warm ivf_centroids seam, cold path
    # --- r15 rotation plan (the write-down discipline from the r11
    # --- verdict, applied every round): window = any r15 new/changed
    # --- queries, then the REMAINING 26 r10-vintage rows
    # --- (events_conversion_funnel, events_props_map,
    # --- events_range_pairs, events_salted_type_stats,
    # --- events_sliding_2d, events_tumbling_daily, hybrid_rrf_topk,
    # --- kg_map_build, kg_neighborhood, kg_nodes_build,
    # --- late_interaction_maxsim, lineitem_unpivot_metrics,
    # --- mmr_diversified_topk, multimodal_frame_sample,
    # --- multimodal_metadata, nation_order_stats,
    # --- segment_nation_setops, semantic_dedup,
    # --- sql_script_segment_revenue, stream_click_purchase_join,
    # --- stream_dedup_events, stream_session_windows,
    # --- stream_tumbling_daily_append, supplier_weekly_moving_avg,
    # --- table_keyset_checksums, top3_orders_per_customer), then
    # --- stalest-r11 fill to 44, then the 6 guards. That clears every
    # --- pre-r11 vintage.
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
