"""Non-degenerate-corpus pins (r13 verdict "What's missing" item 2):
the driver fixtures carry a 31-token vocabulary and a complete 30-node
KG, so df-weighting, link-prediction score spread, and assortativity
were only ever exercised on degenerate-adjacent data (the sparse shadow
relation de-degenerates the GRAPH, but the underlying vocabulary stays
tiny). This module synthesizes a Zipfian long-tail corpus — 800-word
vocabulary, power-law document frequency, heavy-tailed KG degrees — and
re-pins those operators BOTH semantically and via full Spark-vs-DuckDB
value parity on the realistic data. Repo-side counterpart of the
fixture-realism request that is otherwise driver-owned.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from cs_5542_lab_6_spark.registry import all_oracles, all_queries

from test_oracle_parity import _canon_rows  # rootdir tests/ on sys.path

ZIPF_VOCAB = 800
ZIPF_EXP = 1.1
ZIPF_DOCS = 200
ZIPF_DOC_LEN = 60

# Operators whose behavior the tiny fixture vocabulary makes
# degenerate-adjacent — the graph pair, the df-weighting family, the
# corpus LMs, and the loss-derived mixture that composes them; each is
# re-verified here with full value parity on long-tail data.
ZIPF_PARITY = [
    "doc_tfidf_keywords",
    "kg_link_prediction",
    "kg_degree_assortativity",
    "doc_token_familiarity",
    "corpus_vocab_growth",
    "doc_lm_perplexity",
    "corpus_token_frequencies",
    "corpus_doremi_weights",
    # r15: the remaining graph analytics — verified above only on the
    # complete (degree-regular) fixture KG until now
    "kg_pagerank",
    "kg_triangle_stats",
]


@pytest.fixture(scope="module")
def zipf_dir(spark, tmp_path_factory) -> str:
    """Deterministic Zipfian corpus: token r drawn with weight
    ∝ 1/(r+1)^1.1 — the head tokens appear in virtually every document
    (df ≈ N), the tail in a handful, so derived document frequencies,
    KG degrees, and co-occurrence weights are all heavy-tailed."""
    rng = random.Random(42)
    vocab = [f"tok{r:03d}" for r in range(ZIPF_VOCAB)]
    weights = [1.0 / (r + 1) ** ZIPF_EXP for r in range(ZIPF_VOCAB)]
    rows = []
    for doc_id in range(ZIPF_DOCS):
        toks = rng.choices(vocab, weights=weights, k=ZIPF_DOC_LEN)
        text = " ".join(toks)
        rows.append((doc_id, text, ("en", "de")[doc_id % 2], "zipf", len(text)))
    out = str(tmp_path_factory.mktemp("zipf_corpus"))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


@pytest.fixture(scope="module")
def zipf_oracle(zipf_dir):
    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; glob its part files for DuckDB
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{zipf_dir}/documents.parquet/*.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", ZIPF_PARITY)
def test_zipf_corpus_matches_oracle(spark, zipf_dir, zipf_oracle, name):
    """Full rows+schema+value parity on the long-tail corpus — the same
    comparison the driver runs, on data where df/degree distributions
    actually vary."""
    sdf = all_queries()[name](spark, zipf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]
    rel = zipf_oracle.sql(all_oracles()[name])
    duck_cols = [c.lower() for c in rel.columns]
    duck_rows = rel.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), name
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _canon_rows(spark_cols, spark_rows)
    b = _canon_rows(duck_cols, duck_rows)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first value mismatch: {mismatches[0]}"


def test_zipf_kg_degrees_are_heavy_tailed(spark, zipf_dir):
    """The property the complete fixture graph can't show: head tokens
    co-occur with nearly everything, tail tokens with a handful, so the
    sparse-KG degree distribution has real spread."""
    from pyspark.sql import functions as F

    from cs_5542_lab_6_spark.pipeline.corpus import (
        _kg_sparse_edges,
        _kg_sparse_nbr_deg,
    )

    sparse = _kg_sparse_edges(spark, zipf_dir)
    _, deg = _kg_sparse_nbr_deg(sparse)
    stats = deg.agg(
        F.count("*").alias("n_nodes"),
        F.max("d").alias("max_d"),
        F.median("d").alias("med_d"),
        F.min("d").alias("min_d"),
    ).first()
    assert stats["n_nodes"] > 100  # long-tail vocabulary survives into the KG
    # a complete (degree-regular) graph has max == median == min
    assert stats["max_d"] > 2 * stats["med_d"]
    assert stats["min_d"] < stats["med_d"]


def test_zipf_tfidf_rarity_weighting_bites(spark, zipf_dir):
    """On a long-tail vocabulary the df weighting must actually exclude
    the ubiquitous head: the rank-1 Zipf token (df ≈ N ⇒ idf ≈ 0) never
    surfaces as a keyword, and every reported keyword is rarer than the
    corpus (df < N) with a strictly positive score."""
    rows = all_queries()["doc_tfidf_keywords"](spark, zipf_dir).collect()
    assert rows
    n_docs = ZIPF_DOCS
    for r in rows:
        assert r["token"] != "tok000"
        assert r["df"] < n_docs
        assert r["tfidf"] > 0.0


def test_zipf_link_prediction_scores_spread(spark, zipf_dir):
    """Link prediction on a heavy-tailed graph must rank, not tie: the
    top-100 report fills, Adamic-Adar is non-increasing with real value
    diversity, and common-neighbor counts vary."""
    from cs_5542_lab_6_spark.pipeline.corpus import LINKPRED_TOP

    rows = all_queries()["kg_link_prediction"](spark, zipf_dir).collect()
    assert len(rows) == LINKPRED_TOP
    scores = [r["adamic_adar"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert len(set(scores)) >= 5
    assert len({r["common_neighbors"] for r in rows}) >= 2


def test_zipf_pagerank_ranks_hubs(spark, zipf_dir):
    """PageRank on a heavy-tailed graph must RANK, not tie (the complete
    fixture graph gives every node identical rank): the top node is a
    genuine hub (its degree within the top 3 degrees of the report),
    ranks strictly decrease across the head of the report, and rank
    order correlates with degree without equalling it (PageRank weights
    neighbors by THEIR rank — pure degree ordering would make the
    iteration pointless)."""
    rows = all_queries()["kg_pagerank"](spark, zipf_dir).collect()
    assert rows
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert len(set(ranks)) >= max(3, len(ranks) // 2)  # real spread, not ties
    top_degrees = sorted((r["degree"] for r in rows), reverse=True)
    assert rows[0]["degree"] >= top_degrees[min(2, len(top_degrees) - 1)]


def test_zipf_triangles_and_clustering_are_nondegenerate(spark, zipf_dir):
    """Triangle census on the Zipf KG: chunk co-occurrence plants cliques
    per chunk, so triangles exist; the clustering coefficient is a real
    fraction in (0, 1] (the complete fixture graph reads exactly 1.0 —
    every wedge closes — so only the long-tail corpus exercises the
    open-wedge denominator)."""
    row = all_queries()["kg_triangle_stats"](spark, zipf_dir).first()
    assert row["n_triangles"] > 0
    assert row["n_wedges"] >= 3 * row["n_triangles"]
    assert 0.0 < row["global_clustering"] <= 1.0


def test_zipf_assortativity_is_finite(spark, zipf_dir):
    """On the degree-regular complete fixture graph the statistic is
    0/0; on the Zipf corpus it must come back as a real correlation in
    [-1, 1] (co-occurrence graphs typically read disassortative — hubs
    link to leaves — but only finiteness and bounds are pinned)."""
    row = all_queries()["kg_degree_assortativity"](spark, zipf_dir).first()
    assert row["assortativity"] is not None
    assert -1.0 <= row["assortativity"] <= 1.0
    assert row["n_edge_ends"] > 0
