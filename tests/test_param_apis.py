"""Parameterized retrieval APIs (VERDICT r9 item 3): the registered
queries pin fixed literals for driver hashing, but the public surface
is mmr_topk_for / late_interaction_for, mirroring kg_neighborhood_for.
These tests drive the parameter axes the registry entries can't."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cs_5542_lab_6_spark.operators.similarity import (
    MMR_CAND,
    MMR_K,
    MMR_QID,
    mmr_diversified_topk,
    mmr_topk_for,
)
from cs_5542_lab_6_spark.pipeline.corpus import (
    _LI_TOKENS,
    late_interaction_for,
    late_interaction_maxsim,
)
from cs_5542_lab_6_spark.sources import load_table


def test_mmr_wrapper_matches_registered(spark, sf_dir):
    reg = mmr_diversified_topk(spark, sf_dir).collect()
    api = mmr_topk_for(
        spark, sf_dir, qid=MMR_QID, k=MMR_K, lam=0.5, n_cand=MMR_CAND
    ).collect()
    assert [tuple(r) for r in reg] == [tuple(r) for r in api]


def test_mmr_lambda_one_is_pure_relevance(spark, sf_dir):
    """λ=1 removes the diversity penalty: the MMR selection must be the
    relevance-ordered head of the candidate pool."""
    sel = mmr_topk_for(spark, sf_dir, qid=MMR_QID, k=4, lam=1.0).collect()
    assert [r["rank"] for r in sel] == [1, 2, 3, 4]
    rels = [r["rel"] for r in sel]
    assert rels == sorted(rels, reverse=True)
    # matches brute-force top-4 over the same pool (rel desc, id asc)
    from cs_5542_lab_6_spark.operators.similarity import _coded, _cos

    e = _coded(spark, sf_dir).drop("bucket")
    q = e.filter(F.col("vec_id") == MMR_QID).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    top = (
        e.filter(F.col("vec_id") != MMR_QID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            _cos(F.col("v"), F.col("qv"), F.col("nrm"), F.col("qn")).alias("rel"),
        )
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(4)
        .collect()
    )
    assert [r["vec_id"] for r in sel] == [r["vec_id"] for r in top]


def test_mmr_explicit_qvec_ranks_identical_vector_first(spark, sf_dir):
    """qvec mode scores the whole collection: probing with an existing
    vector must put that vector at rank 1 with cosine 1.0."""
    row = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == MMR_QID)
        .select("embedding")
        .first()
    )
    sel = mmr_topk_for(spark, sf_dir, [float(x) for x in row[0]], k=3).collect()
    assert sel[0]["vec_id"] == MMR_QID
    assert sel[0]["rel"] == pytest.approx(1.0, abs=1e-4)
    assert len(sel) == 3


def test_mmr_argument_validation(spark, sf_dir):
    with pytest.raises(ValueError, match="exactly one"):
        mmr_topk_for(spark, sf_dir)
    with pytest.raises(ValueError, match="exactly one"):
        mmr_topk_for(spark, sf_dir, [0.0, 1.0], qid=3)
    with pytest.raises(ValueError, match="lam"):
        mmr_topk_for(spark, sf_dir, qid=0, lam=1.5)
    with pytest.raises(ValueError, match="n_cand"):
        mmr_topk_for(spark, sf_dir, qid=0, k=6, n_cand=5)


def test_late_interaction_wrapper_matches_registered(spark, sf_dir):
    reg = late_interaction_maxsim(spark, sf_dir)
    api = late_interaction_for(spark, sf_dir, _LI_TOKENS, k=5)
    assert reg.columns == api.columns
    assert [tuple(r) for r in reg.collect()] == [tuple(r) for r in api.collect()]


def test_late_interaction_custom_terms(spark, sf_dir):
    df = late_interaction_for(spark, sf_dir, ["Spark SQL", "shuffle"], k=3)
    assert df.columns == [
        "paper_id",
        "maxsim_spark_sql",
        "maxsim_shuffle",
        "li_score",
    ]
    rows = df.collect()
    assert len(rows) == 3
    for r in rows:
        assert r["li_score"] == pytest.approx(
            round(r["maxsim_spark_sql"] + r["maxsim_shuffle"], 4), abs=1e-9
        )
    scores = [r["li_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_late_interaction_single_term_is_maxsim(spark, sf_dir):
    rows = late_interaction_for(spark, sf_dir, ("spark",), k=2).collect()
    for r in rows:
        assert r["li_score"] == pytest.approx(r["maxsim_spark"], abs=1e-9)


def test_late_interaction_validation(spark, sf_dir):
    with pytest.raises(ValueError, match="non-empty"):
        late_interaction_for(spark, sf_dir, [])
    with pytest.raises(ValueError, match="collide"):
        late_interaction_for(spark, sf_dir, ["a b", "a-b"])


def test_link_prediction_wrapper_matches_registered(spark, sf_dir):
    from cs_5542_lab_6_spark.pipeline.corpus import (
        KG_SPARSE_MOD,
        LINKPRED_TOP,
        kg_link_prediction,
        kg_link_prediction_for,
    )

    reg = kg_link_prediction(spark, sf_dir).collect()
    api = kg_link_prediction_for(
        spark, sf_dir, mod=KG_SPARSE_MOD, top=LINKPRED_TOP
    ).collect()
    assert [tuple(r) for r in reg] == [tuple(r) for r in api]
    # a denser sparsification (keep 1/2 of edges) leaves FEWER non-edges
    # reachable by wedges than 1/3 leaves... both must at least run and
    # respect the top cap
    assert kg_link_prediction_for(spark, sf_dir, mod=2, top=7).count() <= 7
    with pytest.raises(ValueError):
        kg_link_prediction_for(spark, sf_dir, mod=0)


def test_tfidf_keywords_k_axis(spark, sf_dir):
    from cs_5542_lab_6_spark.operators.ranking import (
        TFIDF_TOP,
        doc_tfidf_keywords,
        tfidf_keywords_for,
    )

    reg = doc_tfidf_keywords(spark, sf_dir).collect()
    api = tfidf_keywords_for(spark, sf_dir, k=TFIDF_TOP).collect()
    assert [tuple(r) for r in reg] == [tuple(r) for r in api]
    # k=1 is exactly the rank-1 head of the registered result
    one = tfidf_keywords_for(spark, sf_dir, k=1).collect()
    assert [tuple(r) for r in one] == [tuple(r) for r in reg if r["rank"] == 1]
    with pytest.raises(ValueError):
        tfidf_keywords_for(spark, sf_dir, k=0)


def test_lateness_audit_delay_axis(spark, sf_dir):
    """A larger watermark delay can only drop FEWER events (monotone in
    delay) — the property the sizing sweep's report rests on."""
    from cs_5542_lab_6_spark.sources import load_table
    from cs_5542_lab_6_spark.streaming.batch_twins import lateness_flagged

    ev = load_table(spark, sf_dir, "events")
    drops = {
        d: lateness_flagged(ev, delay_ms=d * 60000).filter("dropped").count()
        for d in (5, 60)
    }
    assert drops[60] <= drops[5]
    with pytest.raises(ValueError):
        lateness_flagged(ev, delay_ms=-1)
