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
# item 4; VERDICT r5 item 1; VERDICT r6 item 1): rounds 1-4 checked the
# reference-parity corpus/agent/SQL surface; round 5 rotated in
# streaming/ranking/quality/maintenance; round 6 rotated in the 35
# then-never-checked queries. Round 7 leads with the 26 queries that
# STILL lack a driver CORRECTNESS row — the 25 mid-round-6 additions
# (registered after the r6 window froze) plus orders_approx_stats
# (rows-only; errored on the r1 canonicalizer and never re-windowed),
# then the eight queries ADDED in round 7 (snapshot diff, dedup-rate/
# fertility/vocab-growth reports, TWS streaming, procedural SQL script,
# MV refresh, Gini) so nothing new accrues fresh rotation debt.
# After r7, every registered query has appeared green in some round's
# driver file. Rotated-out queries stay verified every session by
# tests/test_oracle_parity.py (same rows+schema+value-hash check over
# all registered oracles) and the sf0.1 scale canary
# (tests/test_scale_canary.py). Everything not listed keeps module
# registration order after the listed prefix.
_PRIORITY: tuple[str, ...] = (
    # --- Never-driver-checked (26): the mid-round-6 additions + the
    # --- rows-only straggler. One green row each closes rotation debt.
    # BPE tokenizer family
    "corpus_bpe_merge_candidates",
    "corpus_bpe_train",
    "corpus_bpe_tokenize_stats",
    # Curation capstone
    "corpus_curation_decisions",
    "curation_by_source",
    # Ranking two-stage
    "bm25_rerank_topk",
    # Dedup large-star/small-star clustering
    "dedup_clusters_star",
    # TPC-H Q2/Q8/Q9/Q16/Q20/Q21 shapes
    "min_cost_part_supplier",
    "nation_market_share",
    "product_type_profit",
    "supplier_part_variety",
    "excess_stock_suppliers",
    "sole_late_supplier_orders",
    # Semi-structured / calendar / recursion
    "events_props_variant",
    "orders_date_spine_gaps",
    "kg_reachability_sql",
    # Text quality stragglers
    "corpus_duplicate_sentences",
    "doc_token_entropy",
    # Sketches (rows-only: probabilistic, error-envelope unit-tested)
    "events_heavy_hitters_sketch",
    "orders_approx_stats",
    # Correlated LATERAL + pipe-syntax SQL script
    "customer_top_orders_lateral",
    "sql_script_pipe_revenue",
    # Event analytics additions
    "events_transition_matrix",
    "events_hourly_seasonality",
    # Graph + window additions
    "kg_degree_distribution",
    "customer_rfm_segments",
    # --- New in round 7 (registered this round; first driver check) ---
    "corpus_snapshot_diff",
    "dedup_rate_by_source",
    "tokenizer_fertility_by_lang",
    "corpus_vocab_growth",
    "stream_user_top_purchases",
    "sql_script_procedural_threshold",
    "orders_mv_incremental_refresh",
    "priority_price_gini",
    # --- Regression guards: one per family that carried a fix, plus the
    # --- flagship. Fill the remainder of the 50-entry window.
    "chunks_build",            # corpus chunker (pure-Catalyst UDTF twin)
    "kg_edges_build",          # co-occurrence self-join
    "kg_two_hop",              # frontier-below-aggregation fix (r2)
    "vector_topk",             # flagship retrieval
    "doc_lm_perplexity",       # bigram-LM perplexity (Hypothesis-pinned)
    "dedup_minhash_lsh",       # LSH banding
    "dedup_clusters",          # iterative label propagation
    "ann_recall_eval",         # recall@k eval composing all three ANN tiers
    "doc_quality_filter_funnel",  # quality pipeline
    "multimodal_decode_features",  # multimodal family
    "orders_merge_upsert",     # warehouse lifecycle
    "eval_metrics_log",        # JSON sink (red in r4, fixed r5)
    "events_session_windows",  # sessionization
    "stream_tumbling_daily",   # real Structured Streaming
    "stream_user_stats_stateful",  # applyInPandasWithState
    "user_click_purchase_cogroup",  # bucketed cogroup
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
    from .pipeline import corpus, maintenance  # noqa: F401
    from .sources import sql_runner  # noqa: F401
    from .streaming import batch_twins, stream  # noqa: F401

    _LOADED = True
