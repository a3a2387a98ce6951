"""The curation capstone: one decision row per document, composing the
engine's independent quality signals into a keep/drop verdict with
machine-readable reasons — the last stage of every training-data
pipeline (Dolma's mixer, FineWeb's filter chain), where per-signal
scores become a single audited decision.

Composition happens at the ORACLE level too: the DuckDB side embeds the
already-registered oracles of the three signal queries as subqueries
(the ann_recall_eval pattern), so the decision layer can never drift
from the signals it claims to combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import all_oracles, query
from .ranking import bm25_doc_topk  # noqa: F401  (ensures module load order)
from .textstats import doc_lm_perplexity, doc_quality_scores, doc_token_entropy

# Thresholds sit inside the fixture's observed ranges (quality
# 0.34-0.89, ppl 26-37, entropy 2.7-4.8) so every rule fires on some
# documents and the verdict set is genuinely mixed.
MIN_QUALITY = 0.55
MAX_PPL = 31.0
MIN_ENTROPY_BITS = 4.0


def _sig(name: str) -> str:
    return all_oracles()[name]


@query(
    "corpus_curation_decisions",
    oracle=f"""
    WITH q AS (SELECT doc_id, quality_score FROM ({_sig("doc_quality_scores")})),
    p AS (SELECT doc_id, ppl FROM ({_sig("doc_lm_perplexity")})),
    e AS (SELECT doc_id, entropy_bits FROM ({_sig("doc_token_entropy")})),
    joined AS (
      SELECT q.doc_id, q.quality_score, p.ppl, e.entropy_bits
      FROM q LEFT JOIN p ON q.doc_id = p.doc_id
             LEFT JOIN e ON q.doc_id = e.doc_id
    ),
    flagged AS (
      SELECT *,
             list_sort(
               [x FOR x IN [
                 CASE WHEN quality_score < {MIN_QUALITY} THEN 'low_quality' END,
                 CASE WHEN ppl > {MAX_PPL} THEN 'high_perplexity' END,
                 CASE WHEN entropy_bits < {MIN_ENTROPY_BITS} THEN 'low_entropy' END,
                 CASE WHEN ppl IS NULL OR entropy_bits IS NULL THEN 'too_short' END
               ] IF x IS NOT NULL]
             ) AS reasons
      FROM joined
    )
    SELECT doc_id, quality_score, ppl, entropy_bits,
           CASE WHEN len(reasons) = 0 THEN 'keep' ELSE 'drop' END AS verdict,
           COALESCE(array_to_string(reasons, ','), '') AS reasons
    FROM flagged
    ORDER BY doc_id
    """,
)
def corpus_curation_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keep/drop decision from three independent signals —
    rule-based C4-style quality, corpus-LM perplexity (CCNet), and
    unigram entropy — each flagged reason recorded so a curator can
    audit WHY a document left the corpus (the requirement datasheets
    and data-governance reviews actually impose).

    Every document gets exactly one decision row: the quality signal
    covers the full corpus and anchors LEFT joins to the other two, so
    degenerate documents the LM/entropy signals can't score (<2 tokens —
    no bigrams, no term distribution) surface as an explicit 'too_short'
    drop instead of silently escaping curation (round-6 advice).

    Scale shape: the three signal queries share the documents scan
    lineage and join on doc_id — co-partitioned aggregations over the
    same key, no signal materializes more than its per-doc row. Rules
    are pure column expressions; the reasons array is built with
    Catalyst filter/transform, no Python."""
    q = doc_quality_scores(spark, sf_dir).select("doc_id", "quality_score")
    p = doc_lm_perplexity(spark, sf_dir).select("doc_id", "ppl")
    e = doc_token_entropy(spark, sf_dir).select("doc_id", "entropy_bits")
    joined = q.join(p, "doc_id", "left").join(e, "doc_id", "left")
    reasons = F.array_sort(
        F.filter(
            F.array(
                F.when(F.col("quality_score") < MIN_QUALITY, "low_quality"),
                F.when(F.col("ppl") > MAX_PPL, "high_perplexity"),
                F.when(F.col("entropy_bits") < MIN_ENTROPY_BITS, "low_entropy"),
                F.when(
                    F.col("ppl").isNull() | F.col("entropy_bits").isNull(),
                    "too_short",
                ),
            ),
            lambda x: x.isNotNull(),
        )
    )
    return (
        joined.withColumn("r", reasons)
        .select(
            "doc_id",
            "quality_score",
            "ppl",
            "entropy_bits",
            F.when(F.size("r") == 0, "keep").otherwise("drop").alias("verdict"),
            F.array_join("r", ",").alias("reasons"),
        )
        .orderBy("doc_id")
    )


@query(
    "curation_by_source",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, verdict, reasons
      FROM ({_sig("corpus_curation_decisions")})
    )
    SELECT doc.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN d.verdict = 'keep' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_keep,
           CAST(SUM(CASE WHEN d.verdict = 'drop' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_drop,
           round(CAST(SUM(CASE WHEN d.verdict = 'drop' THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 4) AS drop_rate,
           COALESCE(MIN(CASE WHEN d.verdict = 'drop' THEN d.reasons END), '')
             AS sample_reasons
    FROM d JOIN documents doc ON d.doc_id = doc.doc_id
    GROUP BY doc.source
    ORDER BY drop_rate DESC, doc.source
    """,
)
def curation_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operational curation report: keep/drop rates per upstream
    source, with a deterministic sample reason string — the table a
    data-acquisition team actually reviews ("source X loses 60% of its
    documents, mostly to low_quality; renegotiate or drop the feed").
    Composes corpus_curation_decisions with the documents dim on doc_id;
    the aggregation is one hash-agg over |sources| groups."""
    from ..sources import load_table

    decisions = corpus_curation_decisions(spark, sf_dir).select(
        "doc_id", "verdict", "reasons"
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        decisions.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("verdict") == "keep", 1).otherwise(0))
            .cast("long")
            .alias("n_keep"),
            F.sum(F.when(F.col("verdict") == "drop", 1).otherwise(0))
            .cast("long")
            .alias("n_drop"),
            F.round(
                F.sum(F.when(F.col("verdict") == "drop", 1).otherwise(0)).cast(
                    "double"
                )
                / F.count("*"),
                4,
            ).alias("drop_rate"),
            F.coalesce(
                F.min(F.when(F.col("verdict") == "drop", F.col("reasons"))),
                F.lit(""),
            ).alias("sample_reasons"),
        )
        .orderBy(F.desc("drop_rate"), F.asc("source"))
    )
