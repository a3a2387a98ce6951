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
    # --- New in round 10 (registered this round; first driver check):
    "eval_rag_comparison",         # vector-RAG vs graph-RAG overlap/coverage
    "ann_ivf_pq_topk",             # IVF probe pruning composed with PQ-ADC
    # --- CHANGED in round 10 (must be re-driver-checked):
    "doc_winnowing_fingerprints",  # now served from the winnow_fps stage
    "doc_winnowing_overlap",       # same stage; inverted-index join on it
    "semantic_dedup",              # salted in-cluster pair join
    "mmr_diversified_topk",        # now a wrapper over mmr_topk_for
    "late_interaction_maxsim",     # now a wrapper over late_interaction_for
    # (corpus_bpe_train's DISTRIBUTED path changed in r10, but the driver
    # executes the default local-cutover path, which is untouched and
    # stays property-pinned to the same replica as the distributed one.)
    # --- Staleness fill (r9 verdict item 1): every remaining slot goes
    # --- to the least-recently driver-checked registered rows, oldest
    # --- first — r4 vintage, then the whole r5 cohort, then the oldest
    # --- r6 row. After this window no registered query is older than
    # --- r6 vintage (the two rows-only sketches sit at r7).
    "doc_lookup",                    # r4
    "sql_script_segment_revenue",    # r4
    "agent_search_papers",           # r5 from here down
    "ann_brute_force_topk",
    "bm25_doc_topk",
    "chunk_vector_topk",
    "contamination_scan",
    "corpus_delete_cascade",
    "customer_balance_distribution",
    "dedup_exact",
    "doc_pii_scrub",
    "doc_quality_scores",
    "doc_train_test_split",
    "embedding_quantize_int8",
    "events_asof_last_click",
    "events_conversion_funnel",
    "events_props_map",
    "events_range_pairs",
    "events_salted_type_stats",
    "events_sliding_2d",
    "events_tumbling_daily",
    "hybrid_rrf_topk",
    "kg_map_build",
    "kg_neighborhood",
    "kg_nodes_build",
    "lineitem_unpivot_metrics",
    "multimodal_frame_sample",
    "multimodal_metadata",
    "nation_order_stats",
    "segment_nation_setops",
    "stream_click_purchase_join",
    "stream_dedup_events",
    "stream_session_windows",
    "stream_tumbling_daily_append",
    "supplier_weekly_moving_avg",
    "table_keyset_checksums",
    "top3_orders_per_customer",      # last r5 row: the whole r5 cohort fits
    # --- Regression guards that stay in every window
    "chunks_build",            # corpus chunker (pure-Catalyst UDTF twin)
    "kg_edges_build",          # co-occurrence one-shuffle expansion
    "vector_topk",             # flagship retrieval
    "eval_metrics_log",        # JSON sink (red in r4, fixed r5)
    "stream_tumbling_daily",   # real Structured Streaming
    "ann_ivf_topk",            # warm ivf_centroids seam, cold path
    # Rotated out this window: the r8/r9 registrations (all driver-green
    # in r9) and the remaining r6+ vintages. Every rotated-out query
    # keeps session-level parity coverage at sf0.01 via
    # tests/test_oracle_parity.py plus the opt-in sf0.1 scale sweep.
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
