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


# --- cache-hygiene ledger (VERDICT r5 item 3) -------------------------------
# Every parity case below fully materializes its query, so this suite
# doubles as the registry-wide cache-leak check. The ledger is Spark's
# SQL CacheManager (what DataFrame.cache()/persist() register in and
# unpersist() removes from) — the leak class the r5 verdict flagged.
# localCheckpoint blocks are deliberately NOT counted: they are
# ContextCleaner-managed (released on GC of the result), and the
# iterative queries use them precisely so their private caches CAN be
# dropped eagerly.
#
# Contract: a query may leave at most the documented shared per-sf_dir
# caches (chunk_entities in pipeline/corpus.py, doc_shingles and
# doc_simhash in operators/dedup.py — MEMORY_AND_DISK, reused across
# queries, dropped by session.clear_caches). Only their consumer
# families may instantiate one; every other query must leave the ledger
# exactly as it found it.

SHARED_CACHE_CAP = 3
_SHARED_CACHE_FAMILIES = (
    "kg_",        # chunk_entities consumers (cold KG derivations)
    "dedup_",     # doc_shingles / doc_simhash consumers
    "contamination_",
    "source_",    # provenance composes the shingle candidate join
    "corpus_",    # corpus_verify/datasheet walk the KG/shingle helpers
    "eval_",      # eval_rag_comparison's graph side reads chunk_entities
    # full-name entry, not a family: the streaming admission's standing
    # index materializes from _doc_shingles (cold -> the shared cache);
    # its stream_* siblings are NOT shingle consumers and stay excluded
    "stream_dedup_admission",
)


def _n_cached(spark) -> int:
    return spark._jsparkSession.sharedState().cacheManager().cachedData().size()


@pytest.fixture(scope="module", autouse=True)
def _clean_cache_ledger(spark):
    """Start the ledger sweep from a drained CacheManager so the
    contract below is order-independent: earlier modules (warehouse
    builds, warm/cold comparisons) may legitimately leave their own
    cached plan variants behind in the shared session."""
    from cs_5542_lab_6_spark.session import clear_caches

    clear_caches(spark)
    yield


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, sf_dir, oracle, name, fn, sql):
    cached_before = _n_cached(spark)
    sdf = fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    cached_after = _n_cached(spark)
    if cached_after != cached_before:
        assert name.startswith(_SHARED_CACHE_FAMILIES), (
            f"{name}: leaked {cached_after - cached_before} cache entries "
            "outside the documented shared-cache families"
        )
    assert cached_after <= SHARED_CACHE_CAP, (
        f"{name}: {cached_after} cached relations exceed the documented "
        f"shared set of {SHARED_CACHE_CAP}"
    )

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


@pytest.mark.slow
def test_all_queries_return_rows_or_schema(spark, sf_dir):
    """Every registered query (oracle-backed or not) must at least run and
    produce a stable schema — the driver's smoke criterion."""
    for name, fn in all_queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name}: empty schema"
        df.limit(1).collect()


def test_shared_caches_bounded_and_clearable(spark):
    """After the registry-wide sweep above, the only surviving cached
    relations are the documented shared per-sf_dir set, and
    session.clear_caches drains them completely — a long-lived session
    sweeping the whole registry ends with a clean cache ledger."""
    from cs_5542_lab_6_spark.session import clear_caches

    assert _n_cached(spark) <= SHARED_CACHE_CAP
    clear_caches(spark)
    assert _n_cached(spark) == 0
