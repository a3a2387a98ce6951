"""Retrieval operators — the reference's flagship query surface.

The reference implements brute-force cosine top-k retrieval *three times*
(tools.py:45-92, agent.py:94-125, backend/retrieval.py:48-69): full scan
of APP.CHUNKS_V, per-row ``np.dot`` in a Python loop, sort desc, slice k.
Here there is exactly ONE implementation (SURVEY §3.2 calls out the
duplication), expressed as a declarative plan:

    scan (column-pruned) → broadcast the query vector → codegen'd dot
    product → TakeOrderedAndProject (distributed top-k, no full sort)

At 100 TB the plan is scan-bound and embarrassingly parallel: no
driver-side collect, no Python in the hot path, and ``orderBy+limit``
plans as a per-partition top-k + single small merge rather than a global
sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine_score
from ..registry import query
from ..sources import load_table

TOP_K = 5
QUERY_VEC_ID = 0  # deterministic stand-in for an encoded query (SURVEY M3)


def cosine_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = QUERY_VEC_ID,
    k: int = TOP_K,
) -> DataFrame:
    """Score every document against a query vector; return top-k.

    Mirrors M5 (tools.py:45-92): the ``documents ⋈ embeddings`` join plays
    the role of APP.CHUNKS_V (chunks ⋈ papers, sql/01_create_schema.sql:92-93).
    The query vector is itself drawn from the embeddings table so the whole
    query is deterministic and oracle-checkable.

    Determinism contract (SURVEY §4.4): scores rounded to 4 decimals
    (reference rounds too, tools.py:85) and ordering carries a ``doc_id``
    tiebreaker so the selected top-k set is engine-independent.

    Join strategy: only the 1-row query vector carries an explicit
    broadcast hint. documents has the same cardinality as embeddings, so
    hinting it broadcast would OOM the build side at scale — the planner
    picks broadcast vs sort-merge from size stats (auto-broadcast under
    the threshold locally, shuffle join beyond it), and AQE re-plans at
    runtime. Asserted in tests/test_plans.py both ways.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    qvec = (
        emb.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").cast("array<double>").alias("qvec"))
    )
    scored = (
        emb.crossJoin(F.broadcast(qvec))  # 1-row dim side: broadcast, no shuffle
        .join(docs, emb.vec_id == docs.doc_id, "inner")
        .select(
            "doc_id",
            "lang",
            "source",
            cosine_score("embedding", "qvec").alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


@query(
    "vector_topk",
    oracle=f"""
    WITH q AS (
      SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    )
    SELECT d.doc_id, d.lang, d.source,
           round(list_dot_product(e.embedding::DOUBLE[], q.qvec), 4) AS score
    FROM embeddings e CROSS JOIN q
    JOIN documents d ON d.doc_id = e.vec_id
    ORDER BY score DESC, d.doc_id
    LIMIT {TOP_K}
    """,
)
def vector_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk(spark, sf_dir)


@query(
    "vector_topk_filtered",
    oracle=f"""
    WITH q AS (
      SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    )
    SELECT d.doc_id, e.label,
           round(list_dot_product(e.embedding::DOUBLE[], q.qvec), 4) AS score
    FROM embeddings e CROSS JOIN q
    JOIN documents d ON d.doc_id = e.vec_id
    WHERE e.label IN (1, 2, 3) AND d.lang = 'en'
    ORDER BY score DESC, d.doc_id
    LIMIT 10
    """,
)
def vector_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 + P5: retrieval restricted by an IN-list predicate, the shape of
    the reference's entity-filtered KG retrieval (tools.py:185-191). The
    label/lang filters push down to the parquet scans."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("label").isin(1, 2, 3))
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    qvec = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.col("embedding").cast("array<double>").alias("qvec"))
    )
    return (
        emb.crossJoin(F.broadcast(qvec))
        .join(docs, emb.vec_id == docs.doc_id, "inner")  # size-based strategy
        .select("doc_id", "label", cosine_score("embedding", "qvec").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


@query(
    "doc_lookup",
    oracle="""
    SELECT doc_id, text, lang, source, n_chars
    FROM documents WHERE doc_id = 42
    """,
)
def doc_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 point lookup (tools.py:116-125 ``WHERE PAPER_ID = %s``): an
    equality predicate pushed into the parquet scan; with a sorted /
    partitioned layout this prunes to a single row group."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") == 42)
        .select("doc_id", "text", "lang", "source", "n_chars")
    )
