"""Clustered-embedding pins (the vector-side twin of
test_realistic_corpus.py): the driver's embeddings table is
direction-uniform, so the ANN indexes never face their actual design
point — CLUSTERED vectors, where IVF partitions align with data
structure and LSH buckets go unbalanced. This module plants 10
well-separated Gaussian clusters (64-dim, L2-normalized, the driver
schema) and re-verifies the embedding operators two ways: full
Spark-vs-DuckDB value parity on the clustered data, plus the semantic
ordering a row-hash can't express (IVF ≈ exact on clustered data,
multiprobe LSH dominates single-probe, k-means recovers the planted
structure)."""

from __future__ import annotations

import random

import duckdb
import pytest

from cs_5542_lab_6_spark.registry import all_oracles, all_queries

from test_oracle_parity import _canon_rows  # rootdir tests/ on sys.path

N_VECS = 500
N_CLUSTERS = 10
DIM = 64
NOISE = 0.05

CLUSTER_PARITY = [
    "vector_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_pq_adc_topk",
    "ann_recall_eval",
    "dedup_embedding_nn",
    "embedding_kmeans",
    # r15: the rest of the embedding family on its design-point data
    "ann_lsh_multiprobe_topk",
    "ann_ivf_pq_topk",
    "semantic_dedup",
    "embedding_quantize_int8",
    "embedding_drift_psi",
    "contrastive_pair_mining",
    "contamination_semantic_scan",
]


@pytest.fixture(scope="module")
def clustered_dir(spark, tmp_path_factory) -> str:
    """10 planted unit-norm centers; vector i sits on center i%10 plus
    small isotropic noise, renormalized — strong, well-separated
    clusters with the driver's exact schema (vec_id, array<float>,
    int32 label = planted cluster)."""
    rng = random.Random(7)

    def gauss(n: int) -> list[float]:
        return [rng.gauss(0.0, 1.0) for _ in range(n)]

    def normed(v: list[float]) -> list[float]:
        s = sum(x * x for x in v) ** 0.5
        return [x / s for x in v]

    centers = [normed(gauss(DIM)) for _ in range(N_CLUSTERS)]
    rows = []
    for i in range(N_VECS):
        lab = i % N_CLUSTERS
        v = normed([c + NOISE * n for c, n in zip(centers[lab], gauss(DIM))])
        rows.append((i, v, lab))
    out = str(tmp_path_factory.mktemp("clustered_emb"))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    docs = [
        (i, f"clustered corpus document {i} alpha beta gamma", "en", "syn", 40)
        for i in range(N_VECS)
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


@pytest.fixture(scope="module")
def clustered_oracle(clustered_dir):
    con = duckdb.connect()
    for t in ("embeddings", "documents"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{clustered_dir}/{t}.parquet/*.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", CLUSTER_PARITY)
def test_clustered_matches_oracle(spark, clustered_dir, clustered_oracle, name):
    sdf = all_queries()[name](spark, clustered_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]
    rel = clustered_oracle.sql(all_oracles()[name])
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


def test_clustered_ivf_recall_near_exact(spark, clustered_dir):
    """The IVF design point: when data is clustered, probing the
    query's own centroid's partition recovers (nearly) the exact
    neighbors — observed recall 1.0 per query on this fixture; pinned
    at ≥ 0.9. Multiprobe LSH must dominate single-probe per query (its
    probe set includes the primary bucket)."""
    rows = all_queries()["ann_recall_eval"](spark, clustered_dir).collect()
    by_q: dict[int, dict[str, float]] = {}
    for r in rows:
        by_q.setdefault(r["qid"], {})[r["method"]] = r["recall_at_k"]
    assert by_q
    for qid, methods in by_q.items():
        assert methods["ivf"] >= 0.9, (qid, methods)
        assert methods["lsh_mp"] >= methods["lsh"], (qid, methods)


def test_clustered_kmeans_recovers_structure(spark, clustered_dir):
    """Lloyd iterations on 10 planted 50-point clusters: assignments
    partition all vectors, no degenerate giant cluster forms (observed:
    planted groups kept at 50, two center-collisions merge pairs to
    100; pinned ≤ 150), and several distinct clusters survive."""
    rows = all_queries()["embedding_kmeans"](spark, clustered_dir).collect()
    assert sum(r["n_points"] for r in rows) == N_VECS
    assert len(rows) >= 5
    assert max(r["n_points"] for r in rows) <= 150


def test_clustered_dedup_nn_reports_every_vector(spark, clustered_dir):
    rows = all_queries()["dedup_embedding_nn"](spark, clustered_dir).collect()
    assert len(rows) == N_VECS


def test_clustered_semantic_decontamination_respects_planted_labels(
    spark, clustered_dir
):
    """The embedding decontamination scan on clustered data: a flagged
    test vector's best same-bucket train match MUST share its planted
    label (cross-cluster cosine ~0.12 sits far below tau=0.4 — a
    cross-label flag would be an invented similarity), and the planted
    structure guarantees real leakage to find: a majority of test
    vectors flag, since ~49 same-cluster train vectors exist per test
    vector and clustered data is exactly where same-cluster vectors
    share LSH buckets."""
    rows = all_queries()["contamination_semantic_scan"](
        spark, clustered_dir
    ).collect()
    assert rows
    flagged = [r for r in rows if r["contaminated"]]
    for r in flagged:
        assert (
            r["test_vec_id"] % N_CLUSTERS == r["train_vec_id"] % N_CLUSTERS
        ), (r["test_vec_id"], r["train_vec_id"])
    assert len(flagged) >= 0.5 * len(rows), (len(flagged), len(rows))


def test_clustered_semantic_dedup_collapses_planted_clusters(spark, clustered_dir):
    """SemDeDup ON ITS DESIGN POINT: within a planted cluster the pairwise
    cosine (~0.86 at noise 0.05) is far above tau=0.4, across planted
    clusters far below, so (a) the corpus collapses hard — at least 80%
    of vectors drop, (b) every dropped vector's keeper carries the SAME
    planted label (a cross-label keep would mean the k-means pruning
    scope leaked similarity that isn't there), and (c) keepers are the
    lowest vec_id of their (cluster, label) group by the deterministic
    keep rule."""
    rows = all_queries()["semantic_dedup"](spark, clustered_dir).collect()
    assert len(rows) >= 0.8 * N_VECS, len(rows)
    for r in rows:
        assert r["vec_id"] % N_CLUSTERS == r["dup_of"] % N_CLUSTERS, (
            r["vec_id"], r["dup_of"])
        assert r["dup_of"] < r["vec_id"]
        assert r["cosine"] >= 0.4
