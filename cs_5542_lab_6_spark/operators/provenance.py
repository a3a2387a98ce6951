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


# ---------------------------------------------------------------------------
# Referential-integrity audit (FK orphan scan over every fixture edge)
# ---------------------------------------------------------------------------

# (child, fk, parent, pk) — the fixture's FK graph, the same dependency
# order the warehouse loader enforces (pipeline/ingest.py FK-order load).
_FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


@query(
    "table_fk_integrity",
    oracle="""
    {}
    """.format(
        "\nUNION ALL\n".join(
            f"SELECT '{c}.{fk} -> {p}.{pk}' AS fk_edge, "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM {c}) AS n_child_rows, "
            f"CAST((SELECT COUNT(*) FROM {c} ch WHERE ch.{fk} IS NOT NULL "
            f"AND NOT EXISTS (SELECT 1 FROM {p} pa WHERE pa.{pk} = ch.{fk})) "
            f"AS BIGINT) AS n_orphans, "
            f"(SELECT COUNT(*) FROM {c} ch WHERE ch.{fk} IS NOT NULL "
            f"AND NOT EXISTS (SELECT 1 FROM {p} pa WHERE pa.{pk} = ch.{fk})) = 0 "
            f"AS integrity_ok"
            for c, fk, p, pk in _FK_EDGES
        )
        + "\nORDER BY fk_edge"
    ),
)
def table_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the full FK graph: every child
    table is anti-joined against its parent's key set and orphans are
    counted per edge — the check a warehouse runs after each load
    (the loader itself only ENFORCES order, pipeline/ingest.py:89; this
    VERIFIES the result; the reference trusts its feed,
    data/ingestion.py:101-110). All six edges green means every join in
    the engine is loss-free on the fixture.

    Scale shape: each edge is one LEFT ANTI join — parent key sets here
    broadcast; at 100 TB the orders edge degrades to a shuffle
    anti-join and the rest stay broadcast. No edge ever materializes
    matched rows, only the orphan count survives the join."""
    rows = None
    for child, fk, parent, pk in _FK_EDGES:
        ch = load_table(spark, sf_dir, child).select(F.col(fk).alias("k"))
        pa = load_table(spark, sf_dir, parent).select(F.col(pk).alias("k"))
        orphans = (
            ch.filter(F.col("k").isNotNull())
            .join(pa, "k", "left_anti")
            .agg(F.count("*").alias("n_orphans"))
        )
        edge = (
            ch.agg(F.count("*").cast("bigint").alias("n_child_rows"))
            .crossJoin(F.broadcast(orphans))
            .select(
                F.lit(f"{child}.{fk} -> {parent}.{pk}").alias("fk_edge"),
                "n_child_rows",
                F.col("n_orphans").cast("bigint").alias("n_orphans"),
                (F.col("n_orphans") == 0).alias("integrity_ok"),
            )
        )
        rows = edge if rows is None else rows.unionByName(edge)
    return rows.orderBy("fk_edge")


# ---------------------------------------------------------------------------
# Benford first-digit audit (fraud/synthetic-data detection)
# ---------------------------------------------------------------------------

# log10(1 + 1/d) to 6 decimals, computed OFFLINE (no engine libm) and
# embedded as identical literals in both engines.
_BENFORD = {
    1: "0.301030", 2: "0.176091", 3: "0.124939", 4: "0.096910",
    5: "0.079181", 6: "0.066947", 7: "0.057992", 8: "0.051153",
    9: "0.045757",
}
# Nigrini mean-absolute-deviation conformity bands for first digits
_MAD_BANDS = ((0.006, "close"), (0.012, "acceptable"), (0.015, "marginal"))


@query(
    "orders_benford_audit",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INTEGER) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    n AS (SELECT COUNT(*) AS total FROM digits),
    expected(digit, benford_freq) AS (VALUES
      {", ".join(f"({d}, CAST({p} AS DECIMAL(10,6)))" for d, p in _BENFORD.items())}
    ),
    observed AS (
      SELECT e.digit, e.benford_freq,
             CAST(COALESCE(o.c, 0) AS BIGINT) AS n_orders,
             CAST(round(COALESCE(o.c, 0) * 1.0 / n.total, 6)
                  AS DECIMAL(10,6)) AS observed_freq
      FROM expected e
      LEFT JOIN (SELECT digit, COUNT(*) AS c FROM digits GROUP BY digit) o
        ON o.digit = e.digit
      CROSS JOIN n
    ),
    mad AS (
      SELECT CAST(round(SUM(abs(observed_freq - benford_freq)) / 9.0, 6)
                  AS DECIMAL(10,6)) AS mad
      FROM observed
    )
    SELECT o.digit, o.n_orders,
           CAST(o.observed_freq AS DOUBLE) AS observed_freq,
           CAST(o.benford_freq AS DOUBLE) AS benford_freq,
           CAST(abs(o.observed_freq - o.benford_freq) AS DOUBLE) AS abs_dev,
           CAST(m.mad AS DOUBLE) AS mad,
           CASE
             WHEN m.mad < {_MAD_BANDS[0][0]} THEN '{_MAD_BANDS[0][1]}'
             WHEN m.mad < {_MAD_BANDS[1][0]} THEN '{_MAD_BANDS[1][1]}'
             WHEN m.mad < {_MAD_BANDS[2][0]} THEN '{_MAD_BANDS[2][1]}'
             ELSE 'nonconformity'
           END AS conformity
    FROM observed o CROSS JOIN mad m
    ORDER BY o.digit
    """,
)
def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals (Nigrini's fraud /
    fabricated-data screen): observed first-digit frequencies against
    the log10(1+1/d) law, per-digit deviations, and the mean absolute
    deviation graded on Nigrini's conformity bands. TPC-H-style
    synthetic prices are near-uniform in their leading digit, so the
    audit correctly reports NONCONFORMITY — the point of the operator
    is that the verdict is computed, not assumed. Frequencies round to
    6 decimals and deviate through DECIMAL(10,6) arithmetic (exact,
    order-independent); the Benford expectations are offline-computed
    literals, so no engine libm is involved anywhere.

    Scale shape: one digit projection + a 9-group aggregation; the
    9-row expectation table and the 1-row MAD broadcast everywhere."""
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    digits = orders.filter(F.col("o_totalprice") >= 1).select(digit.alias("digit"))
    n = digits.agg(F.count("*").alias("total"))
    counts = digits.groupBy("digit").agg(F.count("*").alias("c"))
    expected = spark.createDataFrame(
        [(d, p) for d, p in _BENFORD.items()],
        schema="digit int, benford_freq string",
    ).select("digit", F.col("benford_freq").cast("decimal(10,6)").alias("benford_freq"))
    observed = (
        expected.join(counts, "digit", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            "benford_freq",
            F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("n_orders"),
            F.round(
                F.coalesce(F.col("c"), F.lit(0)) * 1.0 / F.col("total"), 6
            )
            .cast("decimal(10,6)")
            .alias("observed_freq"),
        )
    )
    mad = observed.agg(
        F.round(
            F.sum(F.abs(F.col("observed_freq") - F.col("benford_freq"))) / 9.0, 6
        )
        .cast("decimal(10,6)")
        .alias("mad")
    )
    verdict = (
        F.when(F.col("mad") < _MAD_BANDS[0][0], F.lit(_MAD_BANDS[0][1]))
        .when(F.col("mad") < _MAD_BANDS[1][0], F.lit(_MAD_BANDS[1][1]))
        .when(F.col("mad") < _MAD_BANDS[2][0], F.lit(_MAD_BANDS[2][1]))
        .otherwise(F.lit("nonconformity"))
    )
    return (
        observed.crossJoin(F.broadcast(mad))
        .select(
            "digit",
            "n_orders",
            F.col("observed_freq").cast("double").alias("observed_freq"),
            F.col("benford_freq").cast("double").alias("benford_freq"),
            F.abs(F.col("observed_freq") - F.col("benford_freq"))
            .cast("double")
            .alias("abs_dev"),
            F.col("mad").cast("double").alias("mad"),
            verdict.alias("conformity"),
        )
        .orderBy("digit")
    )
