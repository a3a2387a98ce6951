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
    # --- New in round 9 (registered this round; first driver check):
    # --- lakehouse table-management family
    "orders_scd2_dimension",       # SCD2 dimension build
    "lineitem_zorder_layout",      # Z-order vs linear zone-map quality
    "supplier_bloom_semi_join",    # explicit Bloom runtime filter + FPR envelope
    "skyline_parts",               # two-phase Pareto frontier
    # --- record-linkage / blocking family
    "dedup_sorted_neighborhood",   # SNM blocking + exact-Jaccard verify
    "part_fuzzy_matches",          # Ed-Join blocked Levenshtein self-join
    # --- privacy + model-audit
    "events_l_diversity",          # companion to events_k_anonymity
    "quality_calibration_bins",    # classifier-vs-heuristic reliability table
    "ann_pq_adc_topk",             # PQ codes + ADC table-lookup ANN tier
    "orders_compaction_plan",      # OPTIMIZE next-fit bin-packing planner
    "events_k_anonymity_repair",   # Datafly-style QI generalization ladder
    "orders_scd2_incremental",     # delta-apply == full-recompute, oracle-pinned
    "ann_pq_recall_eval",          # PQ recall vs exact-L2 truth
    "dedup_method_eval",           # blocking-family precision/recall vs exact
    "events_cms_heavy_hitters",    # deterministic Count-Min sketch, hash-exact
    "events_ams_f2_sketch",        # AMS/count-sketch F2, hash-exact estimate
    "events_quality_expectations", # DLT-style single-scan expectations report
    "table_fk_integrity",          # orphan scan over the full FK graph
    "orders_benford_audit",        # first-digit conformity (computed verdict)
    "events_kmv_distinct",         # bottom-k cardinality sketch, merge-pinned
    "doc_winnowing_fingerprints",  # MOSS winnowing, guarantee-pinned
    "doc_winnowing_overlap",       # the MOSS matching half (fingerprint join)
    # --- CHANGED in round 9 (must be re-driver-checked):
    "doc_quality_classifier",      # bigram hashes now compose from unigram
                                   # hashes (O(len^2) regex pathology fix)
    "doc_repetition_stats",        # token array materialized (same results)
    "mmr_diversified_topk",        # r8-advice fix: collected-literal rounds
    "events_heavy_hitters_exact",  # r8-advice fix: independent HLL scalar
    # --- r8-new rows, second window (stay until a staler cohort exists)
    "orders_exact_stats",
    "orders_mv_distinct_refresh",
    "doc_substring_search",
    "ann_lsh_multiprobe_topk",
    "ann_recall_eval",
    "contrastive_pair_mining",
    "corpus_drift_psi",
    "events_k_anonymity",
    "semantic_dedup",
    "late_interaction_maxsim",
    "events_schema_evolution",
    # --- family touched by the r9 shingle-materialization refactor:
    # --- driver-check the inverted-index consumer of _doc_shingles
    "dedup_ngram_jaccard",
    # --- r1/r4-vintage rows kept this window
    "pricing_summary",
    "regional_customer_revenue",
    "single_status_customers",
    "supplier_running_revenue",
    "topk_expensive_orders",
    "chunks_view",
    # --- Regression guards that stay in every window
    "chunks_build",            # corpus chunker (pure-Catalyst UDTF twin)
    "kg_edges_build",          # co-occurrence one-shuffle expansion
    "vector_topk",             # flagship retrieval
    "eval_metrics_log",        # JSON sink (red in r4, fixed r5)
    "stream_tumbling_daily",   # real Structured Streaming
    "ann_ivf_topk",            # warm ivf_centroids seam, cold path
    # Rotated out for the r9 registrations (all driver-green in r8; each
    # keeps session-level parity coverage at sf0.01 via
    # tests/test_oracle_parity.py plus the opt-in sf0.1 scale sweep):
    # active_customer_keys, order_fill_status, orders_per_month,
    # returnflag_pivot, revenue_forecast, agent_chunk_context,
    # ann_lsh_topk, doc_fingerprints, corpus_token_frequencies,
    # corpus_chunk_ratio, doc_language_id, user_event_gaps,
    # part_catalog_slugs, corpus_verify, doc_token_stats, papers_build,
    # vector_topk_filtered, chunks_with_embeddings, dedup_embedding_nn,
    # dedup_simhash (both driver-exercised via dedup_method_eval's
    # composition this window), order_status_priority_cube (Expand-plan
    # family stays represented in session parity; both cube and grouping
    # sets rotated out this window after r8-green rows),
    # top_orders_by_revenue (top-k family repped by topk_expensive_orders
    # and the vector_topk guard).
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
