"""Text-analysis operators for the training-data pipeline surface.

The reference's text handling stops at cleaning + word counting
(data/ingestion.py:67-77,117-120); a corpus engine at 100 TB also needs
per-document language ID, quality scoring, token counting, and
fingerprinting (north-star extras, SURVEY §4.3-3). Everything here is a
pure Catalyst expression over the ``documents`` fixture — regexps,
higher-order array functions, and hash arithmetic inside whole-stage
codegen; no Python UDFs, so each operator scales exactly like the scan
(narrow, zero-shuffle except the final frequency aggregation).

Determinism: token hashes are sha256-derived (same scheme in the DuckDB
oracles), ratios are rounded to 4 decimals, and every ordering has a
total tiebreak.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import DUCK_TOKEN_HASH, HASH_P, token_hash, words
from ..registry import query
from ..sources import load_table

# "BPE-ish" pre-tokenizer: letter runs | digit runs | single non-space
# symbol — the classic byte-pair pre-segmentation shape, identical RE2/Java
# semantics in both engines.
TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

# Tiny per-language stopword lists for wordlist-voting language ID.
# Alphabetical language order is the deterministic argmax tiebreak.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "auf", "den"),
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "es": ("el", "los", "las", "que", "en", "un", "es", "por", "con", "una"),
    "fr": ("le", "les", "et", "des", "est", "une", "pour", "dans", "qui", "pas"),
}


def _count_in_set(toks: Column, wordlist: tuple[str, ...]) -> Column:
    lit_arr = F.array(*[F.lit(w) for w in wordlist])
    return F.size(F.filter(toks, lambda t: F.array_contains(lit_arr, t)))


def _duck_count_in_set(toks_expr: str, wordlist: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{w}'" for w in wordlist)
    return f"len(list_filter({toks_expr}, t -> list_contains([{in_list}], t)))"


@query(
    "doc_token_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             length(text) AS n_chars,
             CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') END AS w,
             regexp_extract_all(text, '{TOKEN_RE}') AS bpe
      FROM documents
    )
    SELECT doc_id, lang, n_chars,
           CAST(len(w) AS INTEGER) AS ws_tokens,
           CAST(len(bpe) AS INTEGER) AS bpe_tokens,
           round(CASE WHEN len(w) > 0
                 THEN CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE) / len(w)
                 ELSE 0.0 END, 4) AS avg_token_len
    FROM toks
    ORDER BY doc_id
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (F3 generalized): whitespace tokens (the
    reference's ``len(text.split())``, data/ingestion.py:117-120) plus a
    BPE-ish regex pre-tokenization count and mean token length."""
    docs = load_table(spark, sf_dir, "documents")
    toks = words("text")
    char_sum = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").cast("long").alias("n_chars"),
        F.size(toks).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(TOKEN_RE), 0)).alias("bpe_tokens"),
        F.round(
            F.when(F.size(toks) > 0, char_sum.cast("double") / F.size(toks)).otherwise(
                0.0
            ),
            4,
        ).alias("avg_token_len"),
    ).orderBy("doc_id")


_LANG_SCORE_COLS_DUCK = ",\n           ".join(
    f"{_duck_count_in_set('w', ws)} AS score_{lang}"
    for lang, ws in LANG_STOPWORDS.items()
)
_LANG_ARGMAX_DUCK = (
    "CASE WHEN best = 0 THEN 'unknown' "
    + " ".join(
        f"WHEN score_{lang} = best THEN '{lang}'" for lang in LANG_STOPWORDS
    )
    + " END"
)


@query(
    "doc_language_id",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+') END AS w
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang,
           {_LANG_SCORE_COLS_DUCK}
      FROM toks
    ),
    best AS (
      SELECT *, greatest(score_de, score_en, score_es, score_fr) AS best FROM scored
    )
    SELECT doc_id, lang AS labeled_lang,
           {_LANG_ARGMAX_DUCK} AS predicted_lang,
           score_de, score_en, score_es, score_fr
    FROM best
    ORDER BY doc_id
    """,
)
def doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wordlist-voting language ID (north-star text analysis): per-language
    stopword hit counts, deterministic argmax (alphabetical tiebreak,
    zero hits ⇒ 'unknown'). One narrow pass — no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = words(F.lower(F.col("text")))
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[
            _count_in_set(toks, ws).alias(f"score_{lang}")
            for lang, ws in LANG_STOPWORDS.items()
        ],
    )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_STOPWORDS])
    pred = F.when(best == 0, F.lit("unknown"))
    for lang in LANG_STOPWORDS:
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.select(
        "doc_id",
        "labeled_lang",
        pred.alias("predicted_lang"),
        *[f"score_{lang}" for lang in LANG_STOPWORDS],
    ).orderBy("doc_id")


_EN_STOP_DUCK = _duck_count_in_set("w", LANG_STOPWORDS["en"])


def _heur_sig_cols(text, toks) -> tuple:
    """(n_tokens, punct_ratio, stopword_ratio) — the heuristic quality
    signals, ratios rounded to 4 decimals (the score formula consumes the
    ROUNDED ratios, part of the pinned contract). Shared by
    ``doc_quality_scores`` and the fused single-pass
    ``quality_calibration_bins``."""
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    punct = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", ""))
    punct_ratio = F.round(
        F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(0.0), 4
    )
    stopword_ratio = F.round(
        F.when(
            n_tokens > 0,
            _count_in_set(toks, LANG_STOPWORDS["en"]).cast("double") / n_tokens,
        ).otherwise(0.0),
        4,
    )
    return n_tokens, punct_ratio, stopword_ratio


def _heur_score(n_tokens, punct_ratio, stopword_ratio):
    """The composite heuristic score over the (rounded) signal columns."""
    return F.round(
        0.4 * F.least(F.lit(1.0), n_tokens / 100.0)
        + 0.3 * (1.0 - F.least(F.lit(1.0), punct_ratio * 5.0))
        + 0.3 * F.least(F.lit(1.0), stopword_ratio * 10.0),
        4,
    )



@query(
    "doc_quality_scores",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, source, text,
             length(text) AS n_chars,
             CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+') END AS w
      FROM documents
    ),
    sig AS (
      SELECT doc_id, lang, source, n_chars,
             CAST(len(w) AS INTEGER) AS n_tokens,
             round(CASE WHEN n_chars > 0
               THEN CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / n_chars
               ELSE 0.0 END, 4) AS punct_ratio,
             round(CASE WHEN len(w) > 0
               THEN CAST({_EN_STOP_DUCK} AS DOUBLE) / len(w)
               ELSE 0.0 END, 4) AS stopword_ratio
      FROM toks
    )
    SELECT doc_id, lang, source, n_tokens, punct_ratio, stopword_ratio,
           round(0.4 * least(1.0, n_tokens / 100.0)
               + 0.3 * (1.0 - least(1.0, punct_ratio * 5.0))
               + 0.3 * least(1.0, stopword_ratio * 10.0), 4) AS quality_score,
           CASE WHEN round(0.4 * least(1.0, n_tokens / 100.0)
               + 0.3 * (1.0 - least(1.0, punct_ratio * 5.0))
               + 0.3 * least(1.0, stopword_ratio * 10.0), 4) >= 0.7 THEN 'high'
                WHEN round(0.4 * least(1.0, n_tokens / 100.0)
               + 0.3 * (1.0 - least(1.0, punct_ratio * 5.0))
               + 0.3 * least(1.0, stopword_ratio * 10.0), 4) >= 0.4 THEN 'medium'
                ELSE 'low' END AS quality_bucket
    FROM sig
    ORDER BY doc_id
    """,
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring (north-star text analysis): length,
    punctuation ratio, and stopword ratio folded into a composite score
    with high/medium/low buckets — the P2 quality filter
    (data/ingestion.py:117-122) generalized to a graded signal."""
    docs = load_table(spark, sf_dir, "documents")
    toks = words(F.lower(F.col("text")))
    n_tokens, punct_ratio, stopword_ratio = _heur_sig_cols(
        F.col("text"), toks
    )
    sig = docs.select(
        "doc_id",
        "lang",
        "source",
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stopword_ratio.alias("stopword_ratio"),
    )
    score = _heur_score(
        F.col("n_tokens"), F.col("punct_ratio"), F.col("stopword_ratio")
    )
    return sig.select(
        "doc_id",
        "lang",
        "source",
        "n_tokens",
        "punct_ratio",
        "stopword_ratio",
        score.alias("quality_score"),
        F.when(score >= 0.7, "high")
        .when(score >= 0.4, "medium")
        .otherwise("low")
        .alias("quality_bucket"),
    ).orderBy("doc_id")


_DUCK_HASHES = (
    "list_transform(w, t -> " + DUCK_TOKEN_HASH.format(t="t") + ")"
)


@query(
    "doc_fingerprints",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+') END AS w
      FROM documents
    )
    SELECT doc_id,
           CAST(len(w) AS INTEGER) AS n_tokens,
           list_reduce(list_prepend(CAST(0 AS BIGINT), {_DUCK_HASHES}),
                       (acc, h) -> (acc * 31 + h) % {HASH_P}) AS fingerprint
    FROM toks
    ORDER BY doc_id
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (north-star text analysis): an
    order-sensitive polynomial rolling hash over sha-derived token hashes,
    ``acc = (acc*31 + h) mod 2^31-1``. Identical fold in the oracle, so
    the fingerprint is cross-engine stable — the basis for exact dedup."""
    docs = load_table(spark, sf_dir, "documents")
    toks = words(F.lower(F.col("text")))
    fp = F.aggregate(
        F.transform(toks, token_hash),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % HASH_P,
    )
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        fp.alias("fingerprint"),
    ).orderBy("doc_id")


@query(
    "corpus_token_frequencies",
    oracle="""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+')) AS token
      FROM documents WHERE length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) > 0
    )
    SELECT token, COUNT(*) AS freq
    FROM toks
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT 50
    """,
)
def corpus_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level token frequency top-50 (explode → hash-agg → top-k).
    At scale: partial map-side aggregation collapses each partition to its
    distinct tokens before the single shuffle; TakeOrderedAndProject
    avoids a full sort."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.length(F.trim("text")) > 0)
        .select(F.explode(words(F.lower(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Quality-filter funnel (C4/Gopher-style rule chain with per-stage counts)
# ---------------------------------------------------------------------------

# (rule name, applied in order). Thresholds follow the published C4 /
# Gopher-style heuristics, scaled to the fixture corpus.
FILTER_MIN_TOKENS = 30
FILTER_MAX_TOKENS = 50_000
FILTER_MEAN_WORD_LEN_LO = 2.0
FILTER_MEAN_WORD_LEN_HI = 12.0
FILTER_MAX_SYMBOL_RATIO = 0.30
FILTER_MIN_STOPWORD_RATIO = 0.02

_FILTER_RULES = (
    "min_tokens",
    "max_tokens",
    "mean_word_len",
    "symbol_ratio",
    "stopword_ratio",
)

_DUCK_FUNNEL_SIG = f"""
sig AS (
  SELECT doc_id,
         CAST(len(w) AS INTEGER) AS n_tokens,
         CASE WHEN len(w) > 0
              THEN CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE) / len(w)
              ELSE 0.0 END AS mean_wl,
         CASE WHEN length(text) > 0
              THEN CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
                   / length(text)
              ELSE 0.0 END AS sym_ratio,
         CASE WHEN len(w) > 0
              THEN CAST({{stop_count}} AS DOUBLE) / len(w)
              ELSE 0.0 END AS stop_ratio
  FROM toks
),
flags AS (
  SELECT doc_id,
         CAST(n_tokens >= {FILTER_MIN_TOKENS} AS INTEGER) AS c1,
         CAST(n_tokens <= {FILTER_MAX_TOKENS} AS INTEGER) AS c2,
         CAST(mean_wl >= {FILTER_MEAN_WORD_LEN_LO}
              AND mean_wl <= {FILTER_MEAN_WORD_LEN_HI} AS INTEGER) AS c3,
         CAST(sym_ratio <= {FILTER_MAX_SYMBOL_RATIO} AS INTEGER) AS c4,
         CAST(stop_ratio >= {FILTER_MIN_STOPWORD_RATIO} AS INTEGER) AS c5
  FROM sig
),
funnel AS (
  SELECT COUNT(*) AS n0,
         SUM(c1) AS s1,
         SUM(c1 * c2) AS s2,
         SUM(c1 * c2 * c3) AS s3,
         SUM(c1 * c2 * c3 * c4) AS s4,
         SUM(c1 * c2 * c3 * c4 * c5) AS s5
  FROM flags
)
"""


@query(
    "doc_quality_filter_funnel",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, text,
             CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+') END AS w
      FROM documents
    ),
    {_DUCK_FUNNEL_SIG.format(stop_count=_duck_count_in_set("w", LANG_STOPWORDS["en"]))},
    stages(stage, rule, n_in, n_out) AS (
      SELECT 1, 'min_tokens',     n0, s1 FROM funnel UNION ALL
      SELECT 2, 'max_tokens',     s1, s2 FROM funnel UNION ALL
      SELECT 3, 'mean_word_len',  s2, s3 FROM funnel UNION ALL
      SELECT 4, 'symbol_ratio',   s3, s4 FROM funnel UNION ALL
      SELECT 5, 'stopword_ratio', s4, s5 FROM funnel
    )
    SELECT CAST(stage AS INTEGER) AS stage, rule,
           CAST(n_in AS BIGINT) AS n_in,
           CAST(n_out AS BIGINT) AS n_out,
           CAST(n_in - n_out AS BIGINT) AS n_dropped
    FROM stages
    ORDER BY stage
    """,
)
def doc_quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style quality-filter funnel: five heuristic rules (token
    count bounds, mean word length, symbol ratio, stopword ratio) applied
    in order, reporting survivors per stage — the accounting view every
    pretraining-data pipeline publishes with its filter chain (which rule
    dropped how much). The P2 length filter (data/ingestion.py:117-122)
    is rule 1; the rest generalize it.

    Shape at scale: one narrow pass computes all rule booleans per
    document, one partial-aggregated global SUM produces every stage
    survivor count simultaneously (no per-rule scans), and the funnel
    unpivots from a single row — the whole report costs one scan."""
    docs = load_table(spark, sf_dir, "documents")
    toks = words(F.lower(F.col("text")))
    n_tokens = F.size(toks)
    mean_wl = F.when(
        n_tokens > 0,
        F.aggregate(
            toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
        )
        / n_tokens,
    ).otherwise(0.0)
    n_chars = F.length("text")
    sym_ratio = F.when(
        n_chars > 0,
        F.length(F.regexp_replace("text", r"[a-zA-Z0-9\s]", "")).cast("double")
        / n_chars,
    ).otherwise(0.0)
    stop_ratio = F.when(
        n_tokens > 0,
        _count_in_set(toks, LANG_STOPWORDS["en"]).cast("double") / n_tokens,
    ).otherwise(0.0)
    flags = docs.select(
        (n_tokens >= FILTER_MIN_TOKENS).cast("int").alias("c1"),
        (n_tokens <= FILTER_MAX_TOKENS).cast("int").alias("c2"),
        (
            (mean_wl >= FILTER_MEAN_WORD_LEN_LO)
            & (mean_wl <= FILTER_MEAN_WORD_LEN_HI)
        )
        .cast("int")
        .alias("c3"),
        (sym_ratio <= FILTER_MAX_SYMBOL_RATIO).cast("int").alias("c4"),
        (stop_ratio >= FILTER_MIN_STOPWORD_RATIO).cast("int").alias("c5"),
    )
    funnel = flags.agg(
        F.count("*").alias("n0"),
        F.sum("c1").alias("s1"),
        F.sum(F.col("c1") * F.col("c2")).alias("s2"),
        F.sum(F.col("c1") * F.col("c2") * F.col("c3")).alias("s3"),
        F.sum(F.col("c1") * F.col("c2") * F.col("c3") * F.col("c4")).alias("s4"),
        F.sum(
            F.col("c1") * F.col("c2") * F.col("c3") * F.col("c4") * F.col("c5")
        ).alias("s5"),
    )
    stages = funnel.select(
        F.expr(
            "stack(5,"
            " 1, 'min_tokens',     n0, s1,"
            " 2, 'max_tokens',     s1, s2,"
            " 3, 'mean_word_len',  s2, s3,"
            " 4, 'symbol_ratio',   s3, s4,"
            " 5, 'stopword_ratio', s4, s5"
            ") AS (stage, rule, n_in, n_out)"
        )
    )
    return stages.select(
        F.col("stage").cast("int").alias("stage"),
        "rule",
        F.col("n_in").cast("bigint").alias("n_in"),
        F.col("n_out").cast("bigint").alias("n_out"),
        (F.col("n_in") - F.col("n_out")).cast("bigint").alias("n_dropped"),
    ).orderBy("stage")


# ---------------------------------------------------------------------------
# Model-based quality classifier (hashed n-gram linear scorer)
# ---------------------------------------------------------------------------

# Hashed-feature weight table size: weight(feature) = hash % CLS_BUCKETS
# - CLS_BUCKETS//2, an integer in [-1000, 1000]. A real pipeline loads
# trained weights; the engine derives them from the shared sha scheme so
# the plumbing is identical and the score is engine-exact. Bigram
# feature hashes COMPOSE from the unigram hashes ((h1*31 + h2), the
# Bernstein step) instead of sha-hashing the concatenated pair — one
# sha256 per token total, no bigram string materialization. h < 2^31 so
# h*31 + h stays far below 2^63: exact in both engines.
CLS_BUCKETS = 2001


def _cls_feature_cols(h) -> tuple:
    """(n_features, wsum) for the hashed unigram+bigram linear scorer
    over a MATERIALIZED token-hash array column ``h`` (the HOF-inlining
    rule applies: pass a named-column reference, never the hashing
    expression itself — see the classifier docstring). Shared by
    ``doc_quality_classifier`` and the fused single-pass
    ``quality_calibration_bins``."""
    n = F.size(h)
    w_uni = F.aggregate(
        F.transform(h, lambda x: x % CLS_BUCKETS - CLS_BUCKETS // 2),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w_bi = F.when(
        n >= 2,
        F.aggregate(
            F.sequence(F.lit(1), n - 1),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + (
                (F.element_at(h, i) * 31 + F.element_at(h, i + 1))
                % CLS_BUCKETS
                - CLS_BUCKETS // 2
            ),
        ),
    ).otherwise(F.lit(0).cast("long"))
    n_features = n + F.when(n >= 2, n - 1).otherwise(F.lit(0))
    return n_features, w_uni + w_bi


def _cls_score(n_features, wsum):
    """The rational-squash classifier score over (n_features, wsum)."""
    raw = F.when(
        n_features > 0,
        wsum.cast("double") / (n_features * float(CLS_BUCKETS // 2)),
    ).otherwise(F.lit(0.0))
    return F.lit(0.5) + raw / (F.lit(2.0) * (F.lit(1.0) + F.abs(raw)))


@query(
    "doc_quality_classifier",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, lang,
             CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+') END AS w
      FROM documents
    ),
    hs AS (
      SELECT doc_id, source, lang,
             list_transform(w, t -> {DUCK_TOKEN_HASH.format(t='t')}) AS h
      FROM toks
    ),
    scored AS (
      SELECT doc_id, source, lang,
             CAST(len(h) + CASE WHEN len(h) >= 2 THEN len(h) - 1 ELSE 0 END
                  AS INTEGER) AS n_features,
             CAST(
               coalesce(list_sum(list_transform(
                 h, x -> x % {CLS_BUCKETS} - {CLS_BUCKETS // 2})), 0)
             + coalesce(list_sum(list_transform(
                 range(1, len(h)),
                 i -> (h[i] * 31 + h[i+1]) % {CLS_BUCKETS} - {CLS_BUCKETS // 2})), 0)
             AS BIGINT) AS wsum
      FROM hs
    ),
    sq AS (
      SELECT doc_id, source, lang, n_features,
             CASE WHEN n_features > 0
                  THEN CAST(wsum AS DOUBLE) / (n_features * {CLS_BUCKETS // 2}.0)
                  ELSE 0.0 END AS raw
      FROM scored
    )
    SELECT doc_id, source, lang, n_features,
           round(0.5 + raw / (2.0 * (1.0 + abs(raw))), 4) AS quality_score,
           CASE WHEN 0.5 + raw / (2.0 * (1.0 + abs(raw))) >= 0.5
                THEN 'keep' ELSE 'drop' END AS decision
    FROM sq
    ORDER BY doc_id
    """,
)
def doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality classifier (the DCLM / FineWeb-edu filter
    shape): a linear scorer over hashed unigram+bigram features with a
    rational squash into (0, 1) and a keep/drop decision at 0.5 — the
    feature-hashing trick (Weinberger et al. 2009) that lets fastText
    -style quality models run with no vocabulary table at all. Weights
    here are sha-derived integers (a stand-in for trained weights, same
    seam discipline as the embedder); scoring arithmetic is exact-integer
    sum + one IEEE division + basic-op squash, so Spark and DuckDB agree
    bit-for-bit (no exp/log, whose libm rounding differs per engine).

    Scale shape: the entire classifier is a narrow projection — hashing,
    weight lookup, and the feature sum run as higher-order array
    expressions; zero shuffles, zero Python, cost identical to the scan.
    The token-hash array is MATERIALIZED as its own projection before
    any lambda indexes into it: Catalyst does not hoist common
    subexpressions out of higher-order-function lambdas, so an inlined
    ``element_at(<split expr>, i)`` would re-run the regex tokenizer
    once PER ELEMENT (measured ~60s vs sub-second at sf0.1 —
    O(doc_len^2) regex work). Bigram weights compose arithmetically from
    the unigram hash array ((h1*31 + h2) % buckets): one sha256 per
    token, no pair strings, half the hash work. At 100 TB this is the
    cheapest possible model-based filter: one pass, no weight broadcast
    (weights are a pure function), no UDF serialization."""
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id",
        "source",
        "lang",
        F.transform(words(F.lower(F.col("text"))), token_hash).alias("h"),
    )
    n_features, wsum = _cls_feature_cols(F.col("h"))
    scored = hashed.select(
        "doc_id",
        "source",
        "lang",
        n_features.alias("n_features"),
        wsum.alias("wsum"),
    )
    score = _cls_score(F.col("n_features"), F.col("wsum"))
    return scored.select(
        "doc_id",
        "source",
        "lang",
        "n_features",
        F.round(score, 4).alias("quality_score"),
        F.when(score >= 0.5, F.lit("keep")).otherwise(F.lit("drop")).alias(
            "decision"
        ),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Within-document repetition (Gopher-style duplicate n-gram signal)
# ---------------------------------------------------------------------------


@query(
    "doc_repetition_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+') END AS w
      FROM documents
    ),
    grams AS (
      SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
      FROM toks, unnest(range(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 3
    ),
    counts AS (
      SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_grams,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_in_dupes,
             CAST(MAX(c) AS BIGINT) AS max_gram_count
      FROM counts GROUP BY doc_id
    )
    SELECT doc_id, n_grams, n_distinct, n_in_dupes, max_gram_count,
           round(CAST(n_in_dupes AS DOUBLE) / n_grams, 4) AS dup_gram_frac
    FROM per_doc
    WHERE CAST(n_in_dupes AS DOUBLE) / n_grams >= 0.05
    ORDER BY doc_id
    """,
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signal (the Gopher "fraction of tokens
    in duplicated n-grams" family): per document, total vs distinct word
    3-grams and the fraction of gram occurrences belonging to a repeated
    gram, reporting documents above a 5% repetition floor — boilerplate /
    template / degenerate-generation text scores high and gets filtered
    before training.

    Scale shape: narrow gram explode (no shuffle), one (doc, gram)
    partial-aggregated count, one per-doc rollup; the final predicate is
    the pipeline's drop rule. The token array is materialized as its own
    projection before the gram lambda indexes into it — an inlined
    ``element_at(<split expr>, i)`` re-runs the regex tokenizer per
    element (O(doc_len²); measured 22s → sub-second at sf0.1)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", words(F.lower(F.col("text"))).alias("w")
    )
    w = F.col("w")
    grams3 = F.when(
        F.size(w) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(w, i), F.element_at(w, i + 1), F.element_at(w, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        toks.select("doc_id", F.explode(grams3).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.count("*").alias("n_distinct"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("n_in_dupes"),
        F.max("c").alias("max_gram_count"),
    )
    frac = F.col("n_in_dupes").cast("double") / F.col("n_grams")
    return (
        per_doc.filter(frac >= 0.05)
        .select(
            "doc_id",
            "n_grams",
            "n_distinct",
            "n_in_dupes",
            "max_gram_count",
            F.round(frac, 4).alias("dup_gram_frac"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# PII pattern scan + deterministic redaction
# ---------------------------------------------------------------------------

# Simple character-class patterns only — identical semantics in Java
# regex (Spark) and RE2 (DuckDB); no lookarounds, no \b.
PII_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}"
PII_URL_RE = "https?://[^ ]+"
PII_LONGNUM_RE = "[0-9]{9,}"  # SSN/phone/account-shaped digit runs


@query(
    "doc_pii_scrub",
    oracle=f"""
    WITH staged AS (
      -- counts run on the PROGRESSIVELY scrubbed text, mirroring the
      -- replace chain, so n_redactions equals the substitutions actually
      -- made (a digit run inside a URL is redacted once, as <URL>)
      SELECT doc_id, text AS t0,
             regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g') AS t1
      FROM documents
    ),
    staged2 AS (
      SELECT *, regexp_replace(t1, '{PII_URL_RE}', '<URL>', 'g') AS t2 FROM staged
    ),
    hits AS (
      SELECT doc_id,
             len(regexp_extract_all(t0, '{PII_EMAIL_RE}')) AS n_emails,
             len(regexp_extract_all(t1, '{PII_URL_RE}')) AS n_urls,
             len(regexp_extract_all(t2, '{PII_LONGNUM_RE}')) AS n_long_numbers,
             sha256(regexp_replace(t2, '{PII_LONGNUM_RE}', '<NUM>', 'g')) AS scrubbed_sha
      FROM staged2
    )
    SELECT doc_id, n_emails, n_urls, n_long_numbers,
           CAST(n_emails + n_urls + n_long_numbers AS BIGINT) AS n_redactions,
           scrubbed_sha
    FROM hits
    ORDER BY doc_id
    """,
)
def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-pattern scan + deterministic redaction: per document, counts of
    email / URL / long-digit-run matches and the sha256 of the text after
    replacing each class with a typed placeholder — the scrub step a
    pretraining pipeline runs before releasing data, with the hash
    proving both engines redact to the identical byte stream. Patterns
    are plain character classes so Java regex and RE2 agree.

    Narrow per-row regex work inside whole-stage codegen; scales exactly
    like the scan."""
    docs = load_table(spark, sf_dir, "documents")
    # each class counted on the output of the PREVIOUS replace, so
    # overlapping matches (a digit run inside a URL) are never counted
    # twice and n_redactions reconciles with scrubbed_sha
    staged = docs.select(
        "doc_id",
        F.col("text").alias("t0"),
        F.regexp_replace("text", PII_EMAIL_RE, "<EMAIL>").alias("t1"),
    ).withColumn("t2", F.regexp_replace("t1", PII_URL_RE, "<URL>"))
    n_emails = F.size(F.regexp_extract_all("t0", F.lit(PII_EMAIL_RE), 0))
    n_urls = F.size(F.regexp_extract_all("t1", F.lit(PII_URL_RE), 0))
    n_nums = F.size(F.regexp_extract_all("t2", F.lit(PII_LONGNUM_RE), 0))
    return staged.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_urls.alias("n_urls"),
        n_nums.alias("n_long_numbers"),
        (n_emails + n_urls + n_nums).cast("bigint").alias("n_redactions"),
        F.sha2(F.regexp_replace("t2", PII_LONGNUM_RE, "<NUM>"), 256).alias(
            "scrubbed_sha"
        ),
    ).orderBy("doc_id")


@query(
    "language_id_confusion",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+') END AS w
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang,
           {_LANG_SCORE_COLS_DUCK}
      FROM toks
    ),
    best AS (
      SELECT *, greatest(score_de, score_en, score_es, score_fr) AS best FROM scored
    ),
    pred AS (
      SELECT lang AS labeled_lang, {_LANG_ARGMAX_DUCK} AS predicted_lang FROM best
    )
    SELECT labeled_lang, predicted_lang, COUNT(*) AS n_docs
    FROM pred
    GROUP BY labeled_lang, predicted_lang
    ORDER BY labeled_lang, predicted_lang
    """,
)
def language_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-eval audit for the heuristic language classifier: the full
    confusion matrix of predicted vs labeled language (including the
    'unknown' and unscored-language cells — zh has no wordlist, so its
    row shows exactly where the heuristic fails). This is the evaluation
    query a pipeline runs before trusting a classifier to gate data; at
    scale it is the same narrow scoring pass as ``doc_language_id``
    collapsed map-side to a |langs|x|langs| matrix."""
    pred = doc_language_id(spark, sf_dir).select("labeled_lang", "predicted_lang")
    return (
        pred.groupBy("labeled_lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("labeled_lang", "predicted_lang")
    )


# ---------------------------------------------------------------------------
# Bigram-LM perplexity scoring (CCNet-style quality filtering)
# ---------------------------------------------------------------------------

LM_ADD_K = 0.5  # add-k smoothing constant

_DUCK_LM_CTES = """
lm_toks AS (
  SELECT doc_id,
         CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+') END AS w
  FROM documents
),
lm_bg AS (
  SELECT doc_id, i - 1 AS pos, w[i] AS w1, w[i + 1] AS w2
  FROM lm_toks, unnest(range(1, len(w))) AS t(i)
  WHERE len(w) >= 2
),
lm_c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM lm_bg GROUP BY w1, w2),
lm_c1 AS (SELECT w1, COUNT(*) AS c1 FROM lm_bg GROUP BY w1),
lm_v AS (SELECT COUNT(DISTINCT t.tok) AS v FROM lm_toks, unnest(w) AS t(tok)),
lm_scored AS (
  SELECT doc_id, pos,
         -ln((lm_c2.c2 + 0.5) / (lm_c1.c1 + 0.5 * lm_v.v)) AS nll
  FROM lm_bg JOIN lm_c2 USING (w1, w2) JOIN lm_c1 USING (w1) CROSS JOIN lm_v
),
lm_agg AS (
  SELECT doc_id, COUNT(*) AS n_bigrams, SUM(nll ORDER BY pos) AS total
  FROM lm_scored GROUP BY doc_id
)
"""


def lm_counts_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cold corpus bigram-LM table: (w1, w2, c2, c1, v), one row per
    distinct bigram, with the left-context total and vocabulary size
    denormalized onto every row. This is the warehouse-stage builder
    (``ingest.STAGES``) realizing the materialized-LM shape
    ``doc_lm_perplexity`` promises at 100 TB: the counts compress to the
    bigram vocabulary, are built once at ingest, and every LM consumer
    (perplexity scoring, DoReMi domain weights/sampling) joins the
    compact table instead of re-counting the corpus.

    c1 rolls up FROM the bigram counts (c1(w1) = Σ_w2 c2(w1,w2)) — one
    fewer corpus scan+explode than re-counting the bigram stream, and
    the rollup input is already vocabulary-sized. v is counted from the
    SAME exploded stream (r15 verdict item 3b): every token appears
    exactly once as a w1 — the last token of each document pairs with a
    NULL w2, so single-token documents still contribute vocabulary
    without contributing a bigram — and both the bigram counts and the
    vocabulary count read one shared (w1, w2) hash-aggregate. That
    shared relation is materialized ONCE via an eager localCheckpoint:
    exchange reuse does NOT kick in here (column pruning gives the two
    branches different partial-aggregate subtrees, re-measured r16), so
    without it the corpus would be scanned+exploded once per branch —
    and localCheckpoint rather than persist() keeps the block out of
    the CacheManager ledger (ContextCleaner releases it on GC, the
    iterative-query idiom documented in tests/test_oracle_parity.py).
    The checkpointed block is bigram-vocabulary-sized (~1k rows at
    sf0.1), and everything downstream of the explode is
    vocabulary-sized. Measured at sf0.1 (interleaved A/B, min-of-4) the
    rewrite is noise-neutral: 1.25s vs 1.34s two-pass — the corpus scan
    is trivial locally; the win is the 100 TB shape, where the second
    full-corpus explode was the dominant cost. (persist() instead of
    localCheckpoint measured 1.88s AND registers in the CacheManager
    ledger — rejected on both counts.)"""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(words(F.lower(F.col("text"))).alias("w"))
    pairs = (
        toks.filter(F.size("w") >= 1)
        .select(
            F.explode(
                F.expr(
                    # CASE guards the lookahead: w[i + 1] at the last
                    # position would be an out-of-bounds array index,
                    # an error under ANSI mode (Spark 4 default)
                    "transform(sequence(0, size(w) - 1),"
                    " i -> struct(w[i] AS w1,"
                    " CASE WHEN i < size(w) - 1 THEN w[i + 1] END AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    g = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
        .localCheckpoint(eager=True)
    )
    c2 = g.filter(F.col("w2").isNotNull())
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    v = g.agg(F.count_distinct("w1").alias("v"))
    return (
        c2.join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .select("w1", "w2", "c2", "c1", "v")
    )


def _lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w1, w2, c2, c1, v): the materialized ``lm_counts`` checkpoint
    when warm (a pure parquet scan), the cold derivation otherwise —
    row-identical either way."""
    from ..pipeline.corpus import _warm_path, read_stage

    p = _warm_path(sf_dir, "lm_counts", spark)
    return read_stage(spark, p) if p else lm_counts_build(spark, sf_dir)


@query(
    "doc_lm_perplexity",
    oracle=f"""
    WITH {_DUCK_LM_CTES}
    SELECT doc_id,
           CAST(n_bigrams AS BIGINT) AS n_bigrams,
           round(total / n_bigrams, 4) AS avg_nll,
           round(exp(total / n_bigrams), 2) AS ppl
    FROM lm_agg
    ORDER BY doc_id
    """,
)
def doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram-LM perplexity, the CCNet-style quality signal
    (Wenzek et al. 2020: docs whose perplexity under a corpus LM is an
    outlier are boilerplate or noise). The LM is trained on the corpus
    itself: bigram/left-context counts with add-k smoothing,
    P(w2|w1) = (c(w1,w2)+k) / (c(w1·)+k·V), served by the materialized
    ``lm_counts`` warehouse stage when warm (built once at ingest) and
    derived cold otherwise — row-identical either way.

    Scale shape: the count relations are map-side-combinable hash aggs
    over the exploded bigram stream, built ONCE as an index artifact;
    scoring joins the per-doc stream to the compact LM table on the
    bigram key — an N:1 equi-join (one count row per key), so
    frequent-bigram skew inflates no single build row. Per-doc totals
    fold in position order (the BM25 idiom), so the double sum is
    reproducible under any partitioning and the DuckDB oracle's
    SUM(nll ORDER BY pos) matches to the rounded digit."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", words(F.lower(F.col("text"))).alias("w"))
    bg = (
        toks.filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 2),"
                    " i -> struct(i AS pos, w[i] AS w1, w[i + 1] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.pos", "b.w1", "b.w2")
    )
    counts = _lm_counts(spark, sf_dir)
    scored = bg.join(counts, ["w1", "w2"]).select(
        "doc_id",
        "pos",
        (-F.log((F.col("c2") + LM_ADD_K) / (F.col("c1") + LM_ADD_K * F.col("v")))).alias(
            "nll"
        ),
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "nll"))),
            F.lit(0.0),
            lambda acc, x: acc + x["nll"],
        ).alias("total"),
    )
    return agg.select(
        "doc_id",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.round(F.col("total") / F.col("n_bigrams"), 4).alias("avg_nll"),
        F.round(F.exp(F.col("total") / F.col("n_bigrams")), 2).alias("ppl"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Cross-corpus duplicate-sentence statistics (paragraph-level dedup signal)
# ---------------------------------------------------------------------------

DUP_SENT_MIN_WORDS = 4
DUP_SENT_TOP_K = 20


@query(
    "corpus_duplicate_sentences",
    oracle=f"""
    WITH sents AS (
      SELECT doc_id,
             trim(s.x) AS sent
      FROM documents,
           unnest(string_split(lower(text), '.')) AS s(x)
    ),
    kept AS (
      SELECT doc_id, sent
      FROM sents
      WHERE len(regexp_split_to_array(trim(sent), '\\s+')) >= {DUP_SENT_MIN_WORDS}
        AND trim(sent) <> ''
    )
    SELECT sent,
           COUNT(*) AS n_occurrences,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM kept
    GROUP BY sent
    HAVING COUNT(*) > 1
    ORDER BY n_occurrences DESC, sent
    LIMIT {DUP_SENT_TOP_K}
    """,
)
def corpus_duplicate_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-granular duplication across the corpus — the signal
    behind paragraph-level dedup (Dolma/FineWeb scrub repeated
    boilerplate sentences even when whole documents are unique). Split
    on '.', normalize (lowercase + trim), drop fragments under
    {DUP_SENT_MIN_WORDS} words, and rank sentences appearing more than
    once by occurrence count.

    Scale shape: explode + hash-agg — one map-side-combinable pass; the
    HAVING > 1 filter collapses the long unique tail before the global
    top-k (TakeOrderedAndProject). At 100 TB the sentence strings would
    be sha-hashed before the agg (the dedup-family discipline) and the
    string surfaced only for the k survivors via a second tiny join."""
    docs = load_table(spark, sf_dir, "documents")
    sents = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\.")).alias("raw"),
    ).select("doc_id", F.trim(F.col("raw")).alias("sent"))
    kept = sents.filter(
        (F.col("sent") != "") & (F.size(words(F.col("sent"))) >= DUP_SENT_MIN_WORDS)
    )
    return (
        kept.groupBy("sent")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") > 1)
        .orderBy(F.desc("n_occurrences"), F.asc("sent"))
        .limit(DUP_SENT_TOP_K)
    )


# ---------------------------------------------------------------------------
# Tokenizer fitting: BPE merge-candidate induction (first merge round)
# ---------------------------------------------------------------------------

BPE_TOP_K = 20


@query(
    "corpus_bpe_merge_candidates",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+') END) AS w
      FROM documents
    ),
    pairs AS (
      SELECT w[i] AS a, w[i + 1] AS b
      FROM (SELECT string_split(w, '') AS w FROM toks),
           unnest(range(1, len(w))) AS t(i)
      WHERE len(w) >= 2
    )
    SELECT a || b AS pair, COUNT(*) AS n_occurrences
    FROM pairs
    GROUP BY a, b
    ORDER BY n_occurrences DESC, pair
    LIMIT {BPE_TOP_K}
    """,
)
def corpus_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first round of BPE tokenizer training: count every adjacent
    character pair inside whitespace tokens across the corpus and rank
    the top-{BPE_TOP_K} merge candidates — exactly the statistic
    ``merges.txt`` line 1 is chosen from (Sennrich et al. 2016). A full
    trainer iterates merge → re-pair → count; each round is THIS query
    over a progressively merged symbol stream, so the scaling argument
    is the same: one explode + map-side-combinable hash-agg per round,
    the long unique-pair tail collapsed before the global top-k.

    Pure Catalyst: split to char array, index pairs with
    transform(sequence), explode, count. No Python."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(words(F.lower(F.col("text")))).alias("w")
    ).select(F.split("w", "").alias("cs"))
    pairs = (
        toks.filter(F.size("cs") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(cs) - 2),"
                    " i -> struct(cs[i] AS a, cs[i + 1] AS b))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
    )
    return (
        pairs.groupBy("a", "b")
        .agg(F.count("*").alias("n_occurrences"))
        .select(F.concat("a", "b").alias("pair"), "n_occurrences")
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(BPE_TOP_K)
    )


# ---------------------------------------------------------------------------
# Per-document unigram entropy (vocabulary-diversity quality signal)
# ---------------------------------------------------------------------------


@query(
    "doc_token_entropy",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+') END) AS tok
      FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok
    ),
    dl AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM tf GROUP BY doc_id)
    SELECT tf.doc_id,
           dl.n AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           round(SUM(-(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)
                     ORDER BY tok) / ln(2.0), 4) AS entropy_bits
    FROM tf JOIN dl ON tf.doc_id = dl.doc_id
    GROUP BY tf.doc_id, dl.n
    ORDER BY tf.doc_id
    """,
)
def doc_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram (Shannon) entropy in bits — the
    vocabulary-diversity quality signal: boilerplate and keyword-stuffed
    documents score low, natural prose scores near log2(n_distinct).
    Entropy terms fold in sorted-token order (the BM25/LM idiom), so the
    double sum matches the oracle's ordered SUM to the rounded digit.

    Scale shape: per-doc term frequencies are one hash-agg; the entropy
    reduction is a second agg on the same doc_id partitioning — two
    map-side-combinable passes, no joins beyond the tiny length
    broadcast per group (carried in the grouping)."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(words(F.lower(F.col("text")))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    per_doc = tf.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_distinct"),
        F.array_sort(F.collect_list(F.struct("tok", "c"))).alias("terms"),
    )
    p = lambda x: x["c"].cast("double") / F.col("n_tokens")  # noqa: E731
    entropy = F.aggregate(
        F.col("terms"),
        F.lit(0.0),
        lambda acc, x: acc + (-p(x) * F.log(p(x))),
    ) / F.log(F.lit(2.0))
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.round(entropy, 4).alias("entropy_bits"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Multi-round BPE training (greedy merge iteration over the vocabulary)
# ---------------------------------------------------------------------------

BPE_TRAIN_ROUNDS = 5

_DUCK_BPE_BASE = """
bpe_w AS (
  SELECT w, COUNT(*) AS cnt FROM (
    SELECT unnest(CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+') END) AS w
    FROM documents
  ) GROUP BY w
),
bpe_s0 AS (SELECT string_split(w, '') AS syms, cnt FROM bpe_w)
"""


def _duck_bpe_round(i: int) -> str:
    """One BPE round in DuckDB SQL: weighted pair counts over the current
    symbol streams, deterministic argmax, greedy left-to-right re-merge."""
    prev = f"bpe_s{i - 1}"
    return f"""
bpe_p{i} AS (
  SELECT syms[j] AS a, syms[j + 1] AS b, CAST(SUM(cnt) AS BIGINT) AS n
  FROM {prev}, unnest(range(1, len(syms))) AS t(j)
  WHERE len(syms) >= 2
  GROUP BY 1, 2
),
bpe_m{i} AS (SELECT a, b, n FROM bpe_p{i} ORDER BY n DESC, a, b LIMIT 1),
bpe_s{i} AS (
  SELECT list_reduce(
           list_prepend(CAST([] AS VARCHAR[]), list_transform(syms, x -> [x])),
           (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = m.a AND x[1] = m.b
                       THEN list_append(acc[1:-2], m.a || m.b)
                       ELSE list_append(acc, x[1]) END) AS syms,
         cnt
  FROM {prev} CROSS JOIN bpe_m{i} m
)
"""


@query(
    "corpus_bpe_train",
    oracle="WITH "
    + _DUCK_BPE_BASE
    + ","
    + ",".join(_duck_bpe_round(i).strip().rstrip(",") for i in range(1, BPE_TRAIN_ROUNDS + 1))
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT {i} AS round, a AS left_sym, b AS right_sym, a || b AS merged, n AS n_occurrences FROM bpe_m{i}"
        for i in range(1, BPE_TRAIN_ROUNDS + 1)
    )
    + "\nORDER BY round",
)
def corpus_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, {BPE_TRAIN_ROUNDS} merge rounds — the full
    iterative loop corpus_bpe_merge_candidates is round one of
    (Sennrich et al. 2016): each round counts occurrence-weighted
    adjacent symbol pairs over the CURRENT symbol streams, picks the
    argmax merge (tiebreak lexicographic), and rewrites every stream
    with a greedy left-to-right merge fold. The output is the merge
    table (``merges.txt``).

    Engine-exact iteration: the greedy fold has identical semantics in
    Catalyst ``aggregate`` and DuckDB ``list_reduce`` (verified on
    overlap cases like a,b,a,a,b), counts are integers, and the argmax
    tiebreak is total — so the K-round trajectory is bit-identical.

    Scale shape: the corpus collapses to the (word, count) VOCABULARY
    after one hash-agg — every subsequent round is vocabulary-sized,
    not corpus-sized (the property real BPE trainers rely on). Each
    round = one explode + map-side-combinable agg + a 1-row argmax
    collect (the sanctioned scalar boundary) + one narrow re-merge
    projection; the vocabulary stays cached across rounds."""
    merges, final_vocab = _bpe_iterate(spark, sf_dir, BPE_TRAIN_ROUNDS)
    final_vocab.unpersist()
    return spark.createDataFrame(
        merges, "round int, left_sym string, right_sym string, merged string, n_occurrences long"
    ).orderBy("round")


def _bpe_rounds_local(
    vocab: list[tuple[list[str], int]], rounds: int
) -> tuple[list[tuple[int, str, str, str, int]], list[tuple[list[str], int]]]:
    """Driver-local BPE merge rounds over a collected (syms, cnt)
    vocabulary: same weighted pair counts, same (n DESC, a ASC, b ASC)
    argmax tiebreak (Python tuple order == Spark's UTF8 binary order for
    valid UTF-8), same greedy left-to-right merge fold — bit-identical
    to the distributed rounds (Hypothesis-pinned in
    tests/test_properties.py). Returns (merges, final vocabulary)."""
    merges: list[tuple[int, str, str, str, int]] = []
    for i in range(1, rounds + 1):
        pairs: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        n = max(pairs.values())
        a, b = min(k for k, v in pairs.items() if v == n)
        merged = a + b
        merges.append((i, a, b, merged, n))
        nxt = []
        for syms, cnt in vocab:
            acc: list[str] = []
            for x in syms:
                if acc and acc[-1] == a and x == b:
                    acc[-1] = merged
                else:
                    acc.append(x)
            nxt.append((acc, cnt))
        vocab = nxt
    return merges, vocab


# Hybrid cutover threshold (r8 verdict item 2): after the first hash-agg
# the corpus collapses to the (word, count) vocabulary; once |vocab| fits
# this bound, the remaining merge rounds run driver-local — O(1) Spark
# jobs total instead of one 1-row argmax collect() per round (a
# production 32k-merge vocabulary would otherwise mean 32k Spark jobs).
# A collected row costs ~2x its text bytes; 500k rows is tens of MB on a
# driver sized for a 1000-executor cluster. 0 forces the distributed
# path (used by the property suite to pin both paths to one oracle).
BPE_LOCAL_VOCAB_MAX = 500_000


def _bpe_local_max() -> int:
    import os

    return int(os.environ.get("SPARK_GRAFT_BPE_LOCAL_MAX", BPE_LOCAL_VOCAB_MAX))


def _bpe_iterate(spark: SparkSession, sf_dir: str, rounds: int):
    """Run ``rounds`` greedy merge rounds; returns (merge list, the
    FINAL cached (syms, cnt) vocabulary — caller must unpersist).

    Scale: the first hash-agg is corpus-sized and always distributed;
    every later round is vocabulary-sized. When the vocabulary fits
    ``_bpe_local_max()`` rows it is collected ONCE and the rounds finish
    driver-local (zero further Spark jobs); otherwise each round is one
    explode + map-side-combinable agg + a 1-row argmax collect."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(words(F.lower(F.col("text")))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(F.split("w", "").alias("syms"), "cnt")
        .cache()
    )
    merges: list[tuple[int, str, str, str, int]] = []
    n_vocab = vocab.count()  # also materializes the cache for both paths
    if n_vocab <= _bpe_local_max():
        rows = [(list(r["syms"]), int(r["cnt"])) for r in vocab.collect()]
        vocab.unpersist()
        merges, final_rows = _bpe_rounds_local(rows, rounds)
        final_vocab = spark.createDataFrame(
            [(s, c) for s, c in final_rows], "syms array<string>, cnt long"
        )
        return merges, final_vocab
    cur = vocab  # cached + already materialized by the count above
    pending: DataFrame | None = None  # round i-1's cache, load-bearing
    # until an action materializes round i's
    try:
        for i in range(1, rounds + 1):
            pairs = (
                cur.filter(F.size("syms") >= 2)
                .select(
                    F.explode(
                        F.expr(
                            "transform(sequence(0, size(syms) - 2),"
                            " j -> struct(syms[j] AS a, syms[j + 1] AS b))"
                        )
                    ).alias("p"),
                    "cnt",
                )
                .groupBy("p.a", "p.b")
                .agg(F.sum("cnt").cast("long").alias("n"))
            )
            # ONE job per round (r9 verdict item 8): this argmax collect
            # is also the action that materializes cur's lazy cache, so
            # the former per-round .count() materialization job is gone —
            # K+2 driver round-trips total instead of 2K+1.
            top = pairs.orderBy(F.desc("n"), F.asc("a"), F.asc("b")).limit(1).collect()
            if pending is not None:
                # cur's cache is now materialized; its parent stops being
                # load-bearing (dropping it earlier would force the whole
                # fold chain to recompute from the raw vocabulary)
                pending.unpersist()
                pending = None
            if not top:
                break
            a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
            merged = a + b
            merges.append((i, a, b, merged, n))
            fold = F.aggregate(
                F.col("syms"),
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(a))
                    & (x == F.lit(b)),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            )
            nxt = cur.select(fold.alias("syms"), "cnt").cache()  # lazy
            pending, cur = cur, nxt
        if pending is not None:
            cur.count()  # cut the final round's cache before dropping its parent
            pending.unpersist()
        return merges, cur
    except BaseException:
        if pending is not None:
            pending.unpersist()
        cur.unpersist()
        raise


_DUCK_BPE_ALL_ROUNDS = (
    _DUCK_BPE_BASE
    + ","
    + ",".join(
        _duck_bpe_round(i).strip().rstrip(",")
        for i in range(1, BPE_TRAIN_ROUNDS + 1)
    )
)


@query(
    "corpus_bpe_tokenize_stats",
    oracle=f"""
    WITH {_DUCK_BPE_ALL_ROUNDS}
    SELECT CAST((SELECT SUM(cnt) FROM bpe_w) AS BIGINT) AS n_word_occurrences,
           CAST((SELECT SUM(len(syms) * cnt) FROM bpe_s0) AS BIGINT)
             AS symbols_before,
           CAST((SELECT SUM(len(syms) * cnt) FROM bpe_s{BPE_TRAIN_ROUNDS})
                AS BIGINT) AS symbols_after,
           round(CAST((SELECT SUM(len(syms) * cnt) FROM bpe_s0) AS DOUBLE)
                 / (SELECT SUM(len(syms) * cnt) FROM bpe_s{BPE_TRAIN_ROUNDS}),
                 4) AS compression
    """,
)
def corpus_bpe_tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train → APPLY: tokenize the corpus with the {BPE_TRAIN_ROUNDS}
    learned merges and measure the sequence-length compression — the
    number a tokenizer team actually optimizes (fewer symbols per word =
    cheaper training tokens for the same text). Weighted by word
    occurrence, so the ratio reflects the corpus, not the vocabulary.

    Reuses the trainer's iteration verbatim (one code path for train and
    apply); the final aggregate is vocabulary-sized."""
    merges, final_vocab = _bpe_iterate(spark, sf_dir, BPE_TRAIN_ROUNDS)
    try:
        row = final_vocab.agg(
            F.sum("cnt").cast("long").alias("n_word_occurrences"),
            F.sum(F.size("syms") * F.col("cnt")).cast("long").alias("symbols_after"),
            F.sum(
                F.aggregate(
                    F.col("syms"),
                    F.lit(0),
                    lambda acc, x: acc + F.length(x),
                )
                * F.col("cnt")
            )
            .cast("long")
            .alias("chars"),
        ).collect()[0]
    finally:
        final_vocab.unpersist()
    before = int(row["chars"])  # symbols_before == total characters
    after = int(row["symbols_after"])
    return spark.createDataFrame(
        [
            (
                int(row["n_word_occurrences"]),
                before,
                after,
                round(before / after, 4),
            )
        ],
        "n_word_occurrences long, symbols_before long, symbols_after long, compression double",
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility by language (BPE apply × language dimension)
# ---------------------------------------------------------------------------


@query(
    "tokenizer_fertility_by_lang",
    oracle=f"""
    WITH {_DUCK_BPE_ALL_ROUNDS},
    lang_w AS (
      SELECT lang, w, COUNT(*) AS cnt FROM (
        SELECT lang,
               unnest(CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+') END) AS w
        FROM documents
      ) GROUP BY lang, w
    ),
    tokenized AS (
      SELECT array_to_string(syms, '') AS w, len(syms) AS n_syms
      FROM bpe_s{BPE_TRAIN_ROUNDS}
    )
    SELECT lang,
           CAST(SUM(cnt) AS BIGINT) AS n_words,
           CAST(SUM(cnt * n_syms) AS BIGINT) AS n_tokens,
           round(CAST(SUM(cnt * n_syms) AS DOUBLE) / SUM(cnt), 4) AS fertility
    FROM lang_w JOIN tokenized USING (w)
    GROUP BY lang
    ORDER BY lang
    """,
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (tokens emitted per word) per language under
    the {BPE_TRAIN_ROUNDS}-round learned BPE — the fairness metric a
    multilingual tokenizer team tracks: a vocabulary trained mostly on
    one language fragments the others into more symbols, inflating their
    effective training cost. Composes the BPE trainer's final vocabulary
    (merges concatenate adjacent symbols, so joining the symbol stream
    back to its word is exact: word = concat(syms)) with per-language
    word counts.

    Scale shape: per-language counts are one hash agg over the exploded
    token stream; the vocabulary join is |vocab|-sized on the word key —
    never corpus-sized. The BPE iteration itself is the sanctioned
    K-round loop (see corpus_bpe_train)."""
    _, final_vocab = _bpe_iterate(spark, sf_dir, BPE_TRAIN_ROUNDS)
    try:
        tokenized = final_vocab.select(
            F.array_join("syms", "").alias("w"),
            F.size("syms").alias("n_syms"),
        )
        docs = load_table(spark, sf_dir, "documents")
        lang_w = (
            docs.select("lang", F.explode(words(F.lower(F.col("text")))).alias("w"))
            .groupBy("lang", "w")
            .agg(F.count("*").alias("cnt"))
        )
        out = (
            lang_w.join(tokenized, "w")
            .groupBy("lang")
            .agg(
                F.sum("cnt").cast("long").alias("n_words"),
                F.sum(F.col("cnt") * F.col("n_syms")).cast("long").alias("n_tokens"),
                F.round(
                    F.sum(F.col("cnt") * F.col("n_syms")).cast("double")
                    / F.sum("cnt"),
                    4,
                ).alias("fertility"),
            )
            .orderBy("lang")
            .localCheckpoint(eager=True)
        )
    finally:
        final_vocab.unpersist()
    return out


# ---------------------------------------------------------------------------
# Vocabulary growth curve (Heaps'-law audit over the ingest order)
# ---------------------------------------------------------------------------

VOCAB_GROWTH_BUCKETS = 10


@query(
    "corpus_vocab_growth",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+') END) AS tok
      FROM documents
    ),
    firsts AS (SELECT tok, MIN(doc_id) AS first_doc FROM toks GROUP BY tok),
    bounds AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents),
    bucketed AS (
      SELECT least({VOCAB_GROWTH_BUCKETS - 1},
                   CAST(floor((first_doc - lo) * {VOCAB_GROWTH_BUCKETS}.0 / (hi - lo + 1)) AS INTEGER)
             ) AS bucket
      FROM firsts CROSS JOIN bounds
    ),
    per_bucket AS (
      SELECT bucket, COUNT(*) AS new_types FROM bucketed GROUP BY bucket
    )
    SELECT bucket,
           CAST(new_types AS BIGINT) AS new_types,
           CAST(SUM(new_types) OVER (ORDER BY bucket) AS BIGINT) AS cum_types
    FROM per_bucket
    ORDER BY bucket
    """,
)
def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve over the ingest order (Heaps'-law audit):
    how many NEW word types each tenth of the corpus contributes, plus
    the running vocabulary size. A flattening curve says additional data
    from the same sources stops buying lexical diversity — the signal a
    data-acquisition team reads before paying for more of a feed.

    Scale shape: first occurrence per type is one map-side-combinable
    MIN agg over the exploded token stream (the 100 TB-safe way to get
    'new at position k' — no sort, no window over the corpus); the
    bucket histogram is {VOCAB_GROWTH_BUCKETS} rows, and the running
    sum is a window over those {VOCAB_GROWTH_BUCKETS} rows only. The
    1-row bounds broadcast is a sanctioned scalar join."""
    docs = load_table(spark, sf_dir, "documents")
    firsts = (
        docs.select("doc_id", F.explode(words(F.lower(F.col("text")))).alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    bounds = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    n_b = VOCAB_GROWTH_BUCKETS
    bucket = F.least(
        F.lit(n_b - 1),
        F.floor(
            (F.col("first_doc") - F.col("lo")) * float(n_b)
            / (F.col("hi") - F.col("lo") + 1)
        ).cast("int"),
    )
    per_bucket = (
        firsts.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("new_types"))
    )
    from pyspark.sql import Window as W

    # running sum over a VOCAB_GROWTH_BUCKETS-row relation: bounded by a
    # constant, so one partition is correct by construction — the
    # explicit lit(0) partition key states that (and avoids the
    # unpartitioned-window warning meant for unbounded inputs)
    cum = F.sum("new_types").over(W.partitionBy(F.lit(0)).orderBy("bucket"))
    return per_bucket.select(
        "bucket",
        F.col("new_types").cast("long").alias("new_types"),
        cum.cast("long").alias("cum_types"),
    ).orderBy("bucket")


# ---------------------------------------------------------------------------
# Classifier calibration: model score vs heuristic quality, binned
# ---------------------------------------------------------------------------

CAL_BINS = 10


def _register_quality_calibration_bins() -> None:
    # late-bind: composes the registered oracles of the two quality
    # scorers (same pattern as operators/dedup._register_dedup_rate_by_source)
    from ..registry import all_oracles

    @query(
        "quality_calibration_bins",
        oracle=f"""
        WITH model AS ({all_oracles()["doc_quality_classifier"]}),
        heur AS ({all_oracles()["doc_quality_scores"]}),
        joined AS (
          SELECT least(CAST(floor(m.quality_score * {CAL_BINS}) AS INTEGER),
                       {CAL_BINS - 1}) AS bin,
                 m.quality_score AS m_score,
                 h.quality_score AS h_score,
                 (m.decision = 'keep') AS keep
          FROM model m JOIN heur h ON m.doc_id = h.doc_id
        )
        SELECT bin,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
               round(sum(CASE WHEN keep THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
                 AS keep_rate,
               round(CAST(sum(CAST(m_score AS DECIMAL(14,4))) AS DOUBLE)
                     / count(*), 4) AS mean_model_score,
               round(CAST(sum(CAST(h_score AS DECIMAL(14,4))) AS DOUBLE)
                     / count(*), 4) AS mean_heur_score
        FROM joined GROUP BY bin ORDER BY bin
        """,
    )
    def quality_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Calibration / reliability table for the model-based quality
        classifier: documents bucket into {CAL_BINS} equal-width bins of
        the model score, and each bin reports its keep rate plus the
        mean of the INDEPENDENT rule-based heuristic score — the
        standard sanity check before trusting a learned filter at scale
        (a well-behaved scorer shows heuristic quality rising monotonically
        with the model bins; a flat profile means the model learned
        nothing the heuristics can see). Mean scores aggregate through
        DECIMAL(14,4) casts of the already-4-dec-rounded per-doc scores,
        so the sums are order-independent and engine-exact.

        Scale shape (r16): both scorers are single-pass narrow
        projections over the SAME documents scan, one row per doc_id —
        so the doc_id join of the two registered queries is computable
        as a single fused pass with zero joins and zero extra scans
        (the expressions are the scorers' own, shared via
        ``_heur_sig_cols``/``_heur_score`` and
        ``_cls_feature_cols``/``_cls_score``, so the definitions cannot
        fork; the composed two-query oracle pins the equivalence). The
        report collapses to {CAL_BINS} rows in one hash aggregation."""
        docs = load_table(spark, sf_dir, "documents")
        base = docs.select(
            "doc_id", "text", words(F.lower(F.col("text"))).alias("w")
        )
        # token-hash array materialized as a named column BEFORE any
        # lambda indexes into it (the classifier's HOF-inlining rule)
        hashed = base.select(
            "doc_id", "text", "w", F.transform("w", token_hash).alias("h")
        )
        n_tokens, punct_ratio, stopword_ratio = _heur_sig_cols(
            F.col("text"), F.col("w")
        )
        n_features, wsum = _cls_feature_cols(F.col("h"))
        sig = hashed.select(
            n_tokens.alias("n_tokens"),
            punct_ratio.alias("punct_ratio"),
            stopword_ratio.alias("stopword_ratio"),
            n_features.alias("n_features"),
            wsum.alias("wsum"),
        )
        m_raw = _cls_score(F.col("n_features"), F.col("wsum"))
        joined = sig.select(
            F.round(m_raw, 4).alias("m_score"),
            _heur_score(
                F.col("n_tokens"),
                F.col("punct_ratio"),
                F.col("stopword_ratio"),
            ).alias("h_score"),
            (m_raw >= 0.5).alias("keep"),
        ).select(
            F.least(
                F.floor(F.col("m_score") * CAL_BINS).cast("int"),
                F.lit(CAL_BINS - 1),
            ).alias("bin"),
            "m_score",
            "h_score",
            "keep",
        )
        n = F.count("*")
        return (
            joined.groupBy("bin")
            .agg(
                n.cast("bigint").alias("n_docs"),
                F.sum(F.col("keep").cast("long")).alias("n_keep"),
                F.round(F.sum(F.col("keep").cast("long")) * 1.0 / n, 4).alias(
                    "keep_rate"
                ),
                F.round(
                    F.sum(F.col("m_score").cast("decimal(14,4)")).cast("double")
                    / n,
                    4,
                ).alias("mean_model_score"),
                F.round(
                    F.sum(F.col("h_score").cast("decimal(14,4)")).cast("double")
                    / n,
                    4,
                ).alias("mean_heur_score"),
            )
            .orderBy("bin")
        )


_register_quality_calibration_bins()


# ---------------------------------------------------------------------------
# Winnowing fingerprints (MOSS): windowed rightmost-min gram selection
# ---------------------------------------------------------------------------

WINNOW_K = 3   # word k-grams (same gram size as the shingle family)
WINNOW_W = 4   # winnowing window (guarantee: a match >= w+k-1 words shares
               # at least one selected fingerprint)
_WENC = 1024   # argmin encoding base (> WINNOW_W; h*_WENC + tiebreak)


def winnow_fps_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cold winnowing-fingerprint stage (warehouse stage ``winnow_fps``):
    one row per document carrying the gram count plus the PARALLEL
    arrays of selected positions (``sels``, sorted distinct) and their
    gram hashes (``fps``) — everything the MOSS report and matching
    queries need, at ~2/(w+1) of the gram relation's size, with the raw
    text and the full gram-hash array both dropped at the stage
    boundary. Built once at ingest (the bm25_postings pattern); both
    winnowing queries then run as index scans instead of re-hashing and
    re-winnowing the corpus per query (warm ≡ cold in
    tests/test_ingest.py).

    The selection itself follows the engine's HOF-inlining rule twice:
    the gram-hash array ``g`` is materialized as a named column before
    any window lambda indexes into it, and ``sels`` is materialized
    before ``fps`` indexes into ``g`` at its positions. Per-window
    rightmost-argmin is a single array_min over an ENCODED integer key
    (hash * {_WENC} + distance-to-window-end) — integer arithmetic, no
    struct fold. Zero shuffles, zero Python."""
    from ..sources import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select("doc_id", words(F.lower(F.col("text"))).alias("w"))
    w = F.col("w")
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", F.element_at(w, i), F.element_at(w, i + 1), F.element_at(w, i + 2)
    )
    grams = F.when(
        F.size(w) >= WINNOW_K,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (WINNOW_K - 1)),
            lambda i: token_hash(gram(i)),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    hs = toks.select("doc_id", grams.alias("g"))
    g = F.col("g")
    n_grams = F.size(g)
    wend = lambda j: F.least(j + WINNOW_W - 1, n_grams)  # noqa: E731
    sel_of = lambda j: (  # noqa: E731
        j
        + (wend(j) - j)
        - (
            F.array_min(
                F.transform(
                    F.sequence(j, wend(j)),
                    lambda p: F.element_at(g, p) * _WENC + (wend(j) - p),
                )
            )
            % _WENC
        )
    )
    sels = F.when(
        n_grams == 0, F.array().cast("array<bigint>")
    ).otherwise(
        F.array_sort(
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(n_grams - WINNOW_W + 1, F.lit(1))
                    ),
                    sel_of,
                )
            )
        )
    )
    sel = hs.select(
        "doc_id", "g", n_grams.cast("bigint").alias("n_grams"), sels.alias("sels")
    )
    return sel.select(
        "doc_id",
        "n_grams",
        "sels",
        F.transform(
            F.col("sels"), lambda p: F.element_at(F.col("g"), p.cast("int"))
        ).alias("fps"),
    )


def _winnow_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_grams, sels, fps): the materialized ``winnow_fps``
    checkpoint when warm (a pure parquet scan), the cold derivation
    otherwise — row-identical either way."""
    from ..pipeline.corpus import _warm_path, read_stage

    p = _warm_path(sf_dir, "winnow_fps", spark)
    return read_stage(spark, p) if p else winnow_fps_build(spark, sf_dir)


@query(
    "doc_winnowing_fingerprints",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+') END AS w
      FROM documents
    ),
    hs AS (
      SELECT doc_id,
             CASE WHEN len(w) >= {WINNOW_K}
                  THEN list_transform(range(1, len(w) - {WINNOW_K - 2}),
                       i -> {DUCK_TOKEN_HASH.format(t=f"(w[i] || ' ' || w[i+1] || ' ' || w[i+2])")})
                  ELSE CAST([] AS BIGINT[]) END AS g
      FROM toks
    ),
    sel AS (
      SELECT doc_id, g,
             CAST(len(g) AS BIGINT) AS n_grams,
             CASE WHEN len(g) = 0 THEN CAST([] AS BIGINT[])
             ELSE list_sort(list_distinct(list_transform(
               range(1, greatest(len(g) - {WINNOW_W} + 1, 1) + 1),
               j -> j + (least(j + {WINNOW_W} - 1, len(g)) - j) -
                    (list_min(list_transform(
                       range(j, least(j + {WINNOW_W} - 1, len(g)) + 1),
                       p -> g[p] * {_WENC}
                            + (least(j + {WINNOW_W} - 1, len(g)) - p)))
                     % {_WENC})
             ))) END AS sels
      FROM hs
    )
    SELECT doc_id, n_grams,
           CAST(CASE WHEN n_grams = 0 THEN 0
                ELSE greatest(n_grams - {WINNOW_W} + 1, 1) END AS BIGINT)
             AS n_windows,
           CAST(len(sels) AS BIGINT) AS n_selected,
           CAST(CASE WHEN n_grams = 0 THEN 0
                ELSE floor(len(sels) * 1000000.0
                           / greatest(n_grams - {WINNOW_W} + 1, 1)) END
                AS BIGINT) AS density_millionths,
           CAST(COALESCE(list_sum(list_transform(sels, p -> g[p])), 0)
                AS BIGINT) AS fp_checksum,
           COALESCE(list_max(list_transform(
               range(2, len(sels) + 1), i -> sels[i] - sels[i-1])), 0)
             <= {WINNOW_W} AS guarantee_ok
    FROM sel
    ORDER BY doc_id
    """,
)
def doc_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every word {WINNOW_K}-gram,
    slide a {WINNOW_W}-window over the hash sequence, and select each
    window's RIGHTMOST minimal hash — the selection any two documents
    compute identically on a shared passage, with the guarantee that
    any match of at least w+k-1 words shares a selected fingerprint
    (pinned per doc as ``guarantee_ok``: consecutive selected positions
    are never more than w apart). Per doc the report carries the
    fingerprint density (expected 2/(w+1) for random text) and an exact
    checksum of the selected hashes the driver value-hashes.

    Scale shape: everything runs as higher-order ARRAY expressions in
    one narrow projection — the gram-hash array is materialized as a
    column before any lambda indexes into it (the engine's HOF-inlining
    rule), and the per-window argmin is a single list_min over an
    ENCODED key (hash * {_WENC} + distance-to-window-end), so the
    rightmost-tie rule costs integer arithmetic, not a struct fold.
    Zero shuffles, zero Python; selection state never leaves the row.
    Served from the materialized ``winnow_fps`` warehouse stage when
    warm — the report is then a pure index scan over the ~2/(w+1)-sized
    fingerprint relation, never re-hashing or re-winnowing raw text."""
    sel = _winnow_relation(spark, sf_dir)
    s = F.col("sels")
    n_windows = F.when(F.col("n_grams") == 0, F.lit(0)).otherwise(
        F.greatest(F.col("n_grams") - WINNOW_W + 1, F.lit(1))
    )
    gaps = F.transform(
        F.sequence(F.lit(2), F.size(s)),
        lambda i: F.element_at(s, i) - F.element_at(s, i - 1),
    )
    return sel.select(
        "doc_id",
        "n_grams",
        n_windows.cast("bigint").alias("n_windows"),
        F.size(s).cast("bigint").alias("n_selected"),
        F.when(F.col("n_grams") == 0, F.lit(0))
        .otherwise(
            F.floor(
                F.size(s)
                * 1000000.0
                / F.greatest(F.col("n_grams") - WINNOW_W + 1, F.lit(1))
            )
        )
        .cast("bigint")
        .alias("density_millionths"),
        F.coalesce(
            F.aggregate(
                F.col("fps"), F.lit(0).cast("long"), lambda acc, x: acc + x
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("fp_checksum"),
        (
            F.coalesce(
                F.array_max(F.when(F.size(s) >= 2, gaps).otherwise(
                    F.array().cast("array<bigint>")
                )),
                F.lit(0),
            )
            <= WINNOW_W
        ).alias("guarantee_ok"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Winnowing overlap detection (the MOSS matching half)
# ---------------------------------------------------------------------------

WINNOW_MIN_SHARED = 3   # pairs sharing >= this many fingerprints are reported


def _register_doc_winnowing_overlap() -> None:
    # late-bind: embeds the registered winnowing oracle's CTE chain by
    # reusing the full query as a derived table for per-doc totals, and
    # re-derives the selected-fingerprint SETS for the join (the
    # fingerprint relation itself is not a column of the report query).
    @query(
        "doc_winnowing_overlap",
        oracle=f"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+') END AS w
          FROM documents
        ),
        hs AS (
          SELECT doc_id,
                 CASE WHEN len(w) >= {WINNOW_K}
                      THEN list_transform(range(1, len(w) - {WINNOW_K - 2}),
                           i -> {DUCK_TOKEN_HASH.format(t="(w[i] || ' ' || w[i+1] || ' ' || w[i+2])")})
                      ELSE CAST([] AS BIGINT[]) END AS g
          FROM toks
        ),
        sel AS (
          SELECT doc_id, g,
                 CASE WHEN len(g) = 0 THEN CAST([] AS BIGINT[])
                 ELSE list_sort(list_distinct(list_transform(
                   range(1, greatest(len(g) - {WINNOW_W} + 1, 1) + 1),
                   j -> j + (least(j + {WINNOW_W} - 1, len(g)) - j) -
                        (list_min(list_transform(
                           range(j, least(j + {WINNOW_W} - 1, len(g)) + 1),
                           p -> g[p] * {_WENC}
                                + (least(j + {WINNOW_W} - 1, len(g)) - p)))
                         % {_WENC})
                 ))) END AS sels
          FROM hs
        ),
        fps AS (
          SELECT DISTINCT doc_id, g[CAST(t.p AS INTEGER)] AS fp
          FROM sel, unnest(sels) AS t(p)
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS nfp FROM fps GROUP BY doc_id),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
          FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
          GROUP BY 1, 2
          HAVING COUNT(*) >= {WINNOW_MIN_SHARED}
        )
        SELECT p.doc_a, p.doc_b, CAST(p.n_shared AS BIGINT) AS n_shared,
               CAST(sa.nfp AS BIGINT) AS nfp_a, CAST(sb.nfp AS BIGINT) AS nfp_b,
               round(CAST(p.n_shared AS DOUBLE)
                     / least(sa.nfp, sb.nfp), 4) AS containment
        FROM pairs p
        JOIN sizes sa ON sa.doc_id = p.doc_a
        JOIN sizes sb ON sb.doc_id = p.doc_b
        ORDER BY doc_a, doc_b
        """,
    )
    def doc_winnowing_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The matching half of MOSS: documents pair on SHARED winnowing
        fingerprints (distinct selected gram hashes from
        ``doc_winnowing_fingerprints``'s selection rule), and every pair
        sharing at least {WINNOW_MIN_SHARED} fingerprints is reported
        with its containment score (shared / smaller fingerprint set).
        Because winnowing guarantees any >= w+k-1-word match yields a
        shared fingerprint, this detects cross-document duplication at
        ~2/(w+1) of the cost of full-shingle comparison — the
        contamination/plagiarism scan shape, run on fingerprints, never
        raw text.

        Scale shape: identical inverted-index discipline to
        dedup_ngram_jaccard but over the WINNOWED relation (a
        ~2/(w+1)-sized subset of the shingle relation) — the equi-join
        on the fingerprint hash is where winnowing's density guarantee
        pays, shrinking the candidate join's input by the selection
        ratio while keeping detection lossless above the w+k-1 match
        floor. Served from the materialized ``winnow_fps`` warehouse
        stage when warm — the whole scan-and-join then runs on the
        compact fingerprint parquet, never raw text."""
        # r16 (§2.4): nfp is a per-doc property of the fingerprint ARRAY
        # (size of the distinct set), so it rides each exploded row and
        # the pair groupBy keys — the old separate sizes aggregation
        # (a third instantiation of the exploded relation plus TWO
        # doc_id joins back onto the pair list) computed exactly this.
        # Functional dependence doc_id -> nfp keeps the groups identical.
        dfp = F.array_distinct(F.col("fps"))
        fps = _winnow_relation(spark, sf_dir).select(
            "doc_id",
            F.size(dfp).alias("nfp"),
            F.explode(dfp).alias("fp"),
        )
        a, b = fps.alias("a"), fps.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.fp") == F.col("b.fp"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("a.nfp").alias("nfp_a"),
                F.col("b.nfp").alias("nfp_b"),
            )
            .agg(F.count("*").alias("n_shared"))
            .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
        )
        return (
            pairs.select(
                "doc_a",
                "doc_b",
                F.col("n_shared").cast("bigint").alias("n_shared"),
                F.col("nfp_a").cast("bigint").alias("nfp_a"),
                F.col("nfp_b").cast("bigint").alias("nfp_b"),
                F.round(
                    F.col("n_shared").cast("double")
                    / F.least("nfp_a", "nfp_b"),
                    4,
                ).alias("containment"),
            )
            .orderBy("doc_a", "doc_b")
        )


_register_doc_winnowing_overlap()
