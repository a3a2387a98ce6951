"""Source/provenance analytics over the documents corpus.

A 100 TB training-data pipeline is assembled from many upstream sources
(crawls, dumps, curated sets), and the curation loop runs on per-source
evidence: profile each source's volume and quality, drop blocklisted
sources, and measure cross-source duplication before mixing (the
reference's corpus is single-source — data/ingestion.py:101-137 pulls one
HF dataset — so this family is engine-native, same north star as the
dedup/mixing operators).

All three queries are pure Catalyst: per-source profiles are one
partial-aggregated groupBy, the blocklist is a broadcast anti-join (the
blocklist dim is tiny by construction), and the overlap matrix composes
the dedup family's shingle-hash candidate join — no new pairwise
machinery, the same inverted-index equi-join that already scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table
from .dedup import JACCARD_THRESHOLD, _DUCK_SHINGLES_CTE, dedup_ngram_jaccard
from .ranking import DUCK_SPLIT_CASE

# Sources excluded from training (the curation-list idiom: licensing,
# toxicity, or known-benchmark contamination). Fixed literals so the
# oracle embeds the identical list.
BLOCKLIST: tuple[str, ...] = ("src3", "src7", "src11")
SHORT_DOC_CHARS = 200

# The shared split definition rendered for the datasheet oracle.
_SPLIT_CASE = DUCK_SPLIT_CASE.format(id="doc_id")


@query(
    "source_quality_profile",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT lang) AS n_langs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           CAST(SUM(CASE WHEN n_chars < {SHORT_DOC_CHARS} THEN 1 ELSE 0 END)
                AS BIGINT) AS short_docs
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def source_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus datasheet row: volume, language spread, size
    distribution tail. One hash aggregate with map-side partials — at
    100 TB the shuffle carries |sources| rows (dozens), not documents.
    ``avg_chars`` is exact-sum / count (single division, both engines
    agree bit-for-bit)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("lang").alias("n_langs"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
            F.sum(F.when(F.col("n_chars") < SHORT_DOC_CHARS, 1).otherwise(0))
            .cast("long")
            .alias("short_docs"),
        )
        .orderBy("source")
    )


@query(
    "source_blocklist_filter",
    # NOT EXISTS, not NOT IN: Spark's left-anti join KEEPS a row whose
    # source is NULL (no match found), while SQL NOT IN drops it
    # (NULL makes the predicate UNKNOWN). NOT EXISTS shares anti-join
    # NULL semantics, so both engines agree even if documents.source is
    # ever NULL (ADVICE r5).
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents d
    WHERE NOT EXISTS (
        SELECT 1 FROM (SELECT UNNEST({list(BLOCKLIST)!r}) AS source) b
        WHERE b.source = d.source
    )
    GROUP BY lang
    ORDER BY lang
    """,
)
def source_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surviving corpus after dropping blocklisted sources, profiled per
    language. The blocklist is modeled as a broadcast anti-join — not an
    inline NOT IN literal — because real curation lists are tables
    (thousands of domains, updated independently of the query); the
    anti-join build side ships a few KB to every executor and the probe
    stays a single scan."""
    docs = load_table(spark, sf_dir, "documents")
    block = spark.createDataFrame([(s,) for s in BLOCKLIST], "source string")
    return (
        docs.join(F.broadcast(block), "source", "left_anti")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


@query(
    "source_overlap_matrix",
    oracle=f"""
    WITH {_DUCK_SHINGLES_CTE},
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.xs = b.xs AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    neardup AS (
      SELECT doc_a, doc_b
      FROM pairs
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter)
            >= {JACCARD_THRESHOLD}
    )
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           COUNT(*) AS n_pairs
    FROM neardup
    JOIN documents da ON doc_a = da.doc_id
    JOIN documents db ON doc_b = db.doc_id
    WHERE da.source <> db.source
    GROUP BY 1, 2
    ORDER BY n_pairs DESC, source_a, source_b
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-duplicate matrix: for every pair of distinct
    sources, how many near-dup document pairs span them. This is the
    provenance view of dedup — it tells the curator *which* upstream
    sources are mirroring each other before any row is dropped.

    Composes ``dedup_ngram_jaccard`` (inverted-index shingle join — the
    already-scale-safe candidate generator, warm-path signature reads
    included) and joins the tiny pair set (|near-dups|, not |docs|²)
    against the doc→source mapping twice; both mapping joins broadcast
    the pair side at any realistic near-dup rate."""
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .filter(F.col("src_a") != F.col("src_b"))
        .groupBy(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .agg(F.count("*").alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "source_a", "source_b")
    )


@query(
    "corpus_datasheet",
    oracle=f"""
    WITH labeled AS (
      SELECT doc_id, lang, source, n_chars,
             CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0
                  THEN 0
                  ELSE len(regexp_split_to_array(
                         regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+'))
             END AS ws_tokens,
             {_SPLIT_CASE} AS split
      FROM documents
    )
    SELECT lang, split,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT source) AS n_sources,
           CAST(SUM(ws_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN n_chars < {SHORT_DOC_CHARS} THEN 1 ELSE 0 END)
                AS BIGINT) AS short_docs
    FROM labeled
    GROUP BY lang, split
    ORDER BY lang, split
    """,
)
def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card table: per (language × train/valid/test split) —
    document, source, token, and character totals plus the short-doc
    tail. This is the summary every corpus release ships (datasheets /
    data cards), composed from the engine's shared primitives: the split
    comes from ``ranking.split_assignment`` (THE split definition — the
    datasheet can never disagree with the split the training job reads)
    and token counts from the same whitespace contract as
    ``doc_token_stats``.

    One narrow projection + one partial-aggregated groupBy; the shuffle
    carries |langs × 3| rows at any corpus size."""
    from .ranking import split_assignment
    from ..functions.text import word_count

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang",
            "source",
            "n_chars",
            word_count(F.col("text")).alias("ws_tokens"),
            split_assignment("doc_id").alias("split"),
        )
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
            F.sum("ws_tokens").cast("long").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.when(F.col("n_chars") < SHORT_DOC_CHARS, 1).otherwise(0))
            .cast("long")
            .alias("short_docs"),
        )
        .orderBy("lang", "split")
    )
