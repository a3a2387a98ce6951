"""Data-mixing / sampling / packing operators for LLM training pipelines.

The reference pipeline ingests one corpus wholesale (data/ingestion.py:
380-420 loads every fetched paper); a 100 TB pretraining pipeline instead
*composes* its corpus: per-domain mixture weights, hash-stable stratified
sampling, sequence packing into fixed context windows, and unigram
familiarity scoring for quality triage. These are first-class operators
here (north-star extras, SURVEY §4.3-3), each a pure Catalyst plan with a
DuckDB oracle.

Scale notes (100 TB):
- Sampling and split membership are sha256-hash-threshold decisions, never
  ``rand()`` — membership is stable across engines, retries, partitionings,
  and cluster sizes, and needs zero shuffle (narrow map + partial agg).
- Sequence packing uses a window cumsum PARTITIONED by a shard key (here
  ``lang``): each shard packs independently and in parallel, which is how
  packing is actually run at scale (per input shard), instead of a global
  single-partition cumsum that would serialize 100 TB through one task.
- Token familiarity joins the exploded token stream against the corpus
  unigram table. The unigram table after aggregation is vocabulary-sized
  (millions of rows, not corpus-sized) and hash-partitions evenly; the hot
  stopword keys that would skew a row-level join are exactly the keys with
  the highest familiarity, and AQE skew-join splitting handles them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import DUCK_TOKEN_HASH60, token_hash60, words
from ..registry import query
from ..sources import load_table

# ---------------------------------------------------------------------------
# Stratified sampling
# ---------------------------------------------------------------------------

# Per-language sampling rates in permille — the "downsample the over-
# represented language, keep all of the rare one" shape of real mixture
# tuning. One spec, shared by the Spark plan and the DuckDB oracle.
SAMPLE_RATES_PERMILLE: tuple[tuple[str, int], ...] = (
    ("de", 300),
    ("en", 100),
    ("es", 500),
    ("fr", 700),
    ("zh", 1000),
)
SAMPLE_SALT = "sample|"
SAMPLE_BUCKETS = 1000

_DUCK_SAMPLE_BUCKET = (
    DUCK_TOKEN_HASH60.format(t=f"'{SAMPLE_SALT}' || doc_id") + f" % {SAMPLE_BUCKETS}"
)
_DUCK_SAMPLE_SPEC = ", ".join(f"('{lang}', {rate})" for lang, rate in SAMPLE_RATES_PERMILLE)


@query(
    "corpus_stratified_sample",
    oracle=f"""
    WITH labeled AS (
      SELECT doc_id, lang, {_DUCK_SAMPLE_BUCKET} AS bucket
      FROM documents
    ),
    spec(lang, rate_permille) AS (VALUES {_DUCK_SAMPLE_SPEC})
    SELECT l.lang,
           CAST(s.rate_permille AS INTEGER) AS rate_permille,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN l.bucket < s.rate_permille THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sampled,
           CAST(MIN(CASE WHEN l.bucket < s.rate_permille THEN l.doc_id END) AS BIGINT)
             AS min_sampled_doc_id,
           CAST(MAX(CASE WHEN l.bucket < s.rate_permille THEN l.doc_id END) AS BIGINT)
             AS max_sampled_doc_id
    FROM labeled l JOIN spec s USING (lang)
    GROUP BY l.lang, s.rate_permille
    ORDER BY l.lang
    """,
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-threshold stratified sampling: each language stratum keeps
    ``rate_permille`` of its documents, membership decided by
    ``sha256('sample|' || doc_id) % 1000 < rate`` — deterministic across
    engines/retries/partitionings (same discipline as
    ``doc_train_test_split``'s split key; a rand()-based sample would move
    documents between runs). Narrow map + one partial agg; no shuffle of
    document text. Reported as the per-stratum audit a pipeline checks
    before materializing the sampled corpus."""
    spec = spark.createDataFrame(
        list(SAMPLE_RATES_PERMILLE), schema="lang string, rate_permille int"
    )
    bucket = (
        token_hash60(F.concat(F.lit(SAMPLE_SALT), F.col("doc_id"))) % SAMPLE_BUCKETS
    )
    docs = load_table(spark, sf_dir, "documents")
    labeled = docs.select("doc_id", "lang", bucket.alias("bucket"))
    keep = F.col("bucket") < F.col("rate_permille")
    return (
        labeled.join(F.broadcast(spec), "lang")
        .groupBy("lang", "rate_permille")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(keep.cast("long")).alias("n_sampled"),
            F.min(F.when(keep, F.col("doc_id"))).alias("min_sampled_doc_id"),
            F.max(F.when(keep, F.col("doc_id"))).alias("max_sampled_doc_id"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Mixture plan
# ---------------------------------------------------------------------------

# Target mixture in basis points (sums to 10_000). Integer weights keep
# every downstream quantity exact-integer (no float rounding to diverge
# between engines).
MIXTURE_WEIGHTS_BP: tuple[tuple[str, int], ...] = (
    ("de", 1500),
    ("en", 4000),
    ("es", 1500),
    ("fr", 1500),
    ("zh", 1500),
)
# Training budget as a multiple of the corpus size: 2 epochs' worth of
# tokens, the common "we need more data than we have" regime.
BUDGET_EPOCHS = 2

_DUCK_MIXTURE_SPEC = ", ".join(f"('{lang}', {bp})" for lang, bp in MIXTURE_WEIGHTS_BP)

# Per-language token availability — the input BOTH mixture queries
# (fixed-weight plan + temperature mixing) start from, factored once
# per engine so the token-count contract can never fork between them.
_DUCK_TOKS_AVAIL = """toks AS (
      SELECT lang,
             CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN 0
                  ELSE len(regexp_split_to_array(
                         regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END
               AS n_tokens
      FROM documents
    ),
    avail AS (
      SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS available_tokens
      FROM toks GROUP BY lang
    )"""


def _avail_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, available_tokens) — one partial agg over word counts."""
    from ..functions.text import word_count

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", word_count(F.col("text")).alias("n_tokens"))
        .groupBy("lang")
        .agg(F.sum("n_tokens").cast("long").alias("available_tokens"))
    )


@query(
    "corpus_mixture_plan",
    oracle=f"""
    WITH {_DUCK_TOKS_AVAIL},
    spec(lang, weight_bp) AS (VALUES {_DUCK_MIXTURE_SPEC}),
    total AS (SELECT SUM(available_tokens) AS corpus_tokens FROM avail),
    plan AS (
      SELECT a.lang, s.weight_bp, a.available_tokens,
             (t.corpus_tokens * {BUDGET_EPOCHS} * s.weight_bp) // 10000
               AS allocated_tokens
      FROM avail a JOIN spec s USING (lang) CROSS JOIN total t
    )
    SELECT lang,
           CAST(weight_bp AS INTEGER) AS weight_bp,
           available_tokens,
           CAST(allocated_tokens AS BIGINT) AS allocated_tokens,
           CAST((allocated_tokens * 10000) // available_tokens AS BIGINT)
             AS epochs_bp,
           CAST(allocated_tokens > available_tokens AS BOOLEAN) AS oversampled
    FROM plan
    ORDER BY lang
    """,
)
def corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-weight allocation plan: given per-language target weights
    (basis points) and a token budget of ``BUDGET_EPOCHS`` x the corpus,
    compute each language's allocated tokens and its oversampling factor
    (``epochs_bp``, basis points — >10000 means that stratum must repeat
    data). All arithmetic is exact-integer (bp weights, floor division) so
    the plan is bit-identical across engines. The plan itself is one
    partial agg over token counts + a 5-row broadcast spec join — the
    audit artifact a pipeline produces before sampling, at any scale."""
    avail = _avail_by_lang(spark, sf_dir)
    spec = spark.createDataFrame(
        list(MIXTURE_WEIGHTS_BP), schema="lang string, weight_bp int"
    )
    # corpus total via an unpartitioned window over the 5-row per-lang
    # aggregate — already tiny post-agg, so no BroadcastNestedLoopJoin
    # scalar-subquery shape in the plan
    plan = (
        avail.join(F.broadcast(spec), "lang")
        .withColumn(
            "corpus_tokens",
            F.sum("available_tokens").over(
                Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ),
        )
        .withColumn(
            "allocated_tokens",
            F.expr(f"(corpus_tokens * {BUDGET_EPOCHS} * weight_bp) div 10000").cast(
                "long"
            ),
        )
    )
    return plan.select(
        "lang",
        "weight_bp",
        "available_tokens",
        "allocated_tokens",
        F.expr("(allocated_tokens * 10000) div available_tokens")
        .cast("long")
        .alias("epochs_bp"),
        (F.col("allocated_tokens") > F.col("available_tokens")).alias("oversampled"),
    ).orderBy("lang")


# The temperature is τ=0.5, hardwired as sqrt on BOTH engines rather
# than exposed as a pow(x, TAU) constant: square-root sampling is the
# multilingual NMT/ASR staple (mT5/XLM-R use the same p_i^τ family at
# τ=0.3), and sqrt is IEEE-754 CORRECTLY ROUNDED on every conforming
# engine while pow is not — a tunable exponent would reintroduce the
# cross-engine ulp risk the oracle design exists to exclude.


# CTE chain shared by the temperature-mixing oracle and the epoch-value
# plan that composes its allocations (same discipline as _DUCK_TOKS_AVAIL:
# one text, two oracles, semantics cannot fork).
_DUCK_TEMP_CTES = f"""{_DUCK_TOKS_AVAIL},
    w AS (
      SELECT lang, available_tokens,
             CAST(round(sqrt(CAST(available_tokens AS DOUBLE)), 6)
                  AS DECIMAL(38,6)) AS wgt
      FROM avail
    ),
    tot AS (
      SELECT lang, available_tokens, wgt,
             SUM(available_tokens) OVER () AS corpus_tokens,
             SUM(wgt) OVER () AS wgt_total
      FROM w
    ),
    shares AS (
      SELECT lang, available_tokens,
             round(CAST(available_tokens AS DOUBLE)
                   / CAST(corpus_tokens AS DOUBLE), 6) AS natural_share,
             round(CAST(wgt AS DOUBLE) / CAST(wgt_total AS DOUBLE), 6)
               AS temp_share,
             corpus_tokens
      FROM tot
    ),
    alloc AS (
      SELECT *,
             CAST(floor(CAST(corpus_tokens AS DOUBLE) * {BUDGET_EPOCHS}
                        * temp_share) AS BIGINT) AS allocated_tokens
      FROM shares
    )"""


@query(
    "corpus_temperature_mixing",
    oracle=f"""
    WITH {_DUCK_TEMP_CTES}
    SELECT lang, available_tokens, natural_share, temp_share,
           round(temp_share / natural_share, 4) AS boost,
           allocated_tokens,
           CAST((allocated_tokens * 10000) // available_tokens AS BIGINT)
             AS epochs_bp,
           temp_share > natural_share AS upsampled
    FROM alloc
    ORDER BY lang
    """,
)
def corpus_temperature_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture weights DERIVED from availability —
    q_i ∝ (n_i/N)^τ over per-language token counts, the mT5/XLM-R
    family of low-resource upweighting (``corpus_mixture_plan`` is the
    complementary fixed-target-weights audit). τ = 0.5, i.e.
    square-root sampling, picked so every float step is
    deterministic cross-engine: sqrt is correctly rounded by IEEE 754
    (pow is not), the 5 per-stratum weights are rounded to 6 digits and
    summed EXACTLY as DECIMAL(38,6) (the calibration/PQ-ADC
    order-independence idiom), and every downstream share/boost/epochs
    figure derives from those rounded values — so ``upsampled``, the
    decision column, hash-checks as a decision.

    Plan shape: one partial agg over token counts (5 rows out), then
    unpartitioned window totals over the tiny aggregate (the
    corpus_mixture_plan idiom — no BroadcastNestedLoopJoin scalar
    subquery), pure projections after. One shuffle regardless of corpus
    size; at 100 TB this is the audit artifact computed before the
    hash-threshold sampler materializes the mixture."""
    avail = _avail_by_lang(spark, sf_dir)
    whole = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w = avail.withColumn(
        "wgt",
        F.round(F.sqrt(F.col("available_tokens").cast("double")), 6).cast(
            "decimal(38,6)"
        ),
    )
    tot = w.withColumn("corpus_tokens", F.sum("available_tokens").over(whole)).withColumn(
        "wgt_total", F.sum("wgt").over(whole)
    )
    shares = tot.select(
        "lang",
        "available_tokens",
        F.round(
            F.col("available_tokens").cast("double")
            / F.col("corpus_tokens").cast("double"),
            6,
        ).alias("natural_share"),
        F.round(
            F.col("wgt").cast("double") / F.col("wgt_total").cast("double"), 6
        ).alias("temp_share"),
        "corpus_tokens",
    ).withColumn(
        "allocated_tokens",
        F.floor(
            F.col("corpus_tokens").cast("double")
            * BUDGET_EPOCHS
            * F.col("temp_share")
        ).cast("long"),
    )
    return shares.select(
        "lang",
        "available_tokens",
        "natural_share",
        "temp_share",
        F.round(F.col("temp_share") / F.col("natural_share"), 4).alias("boost"),
        "allocated_tokens",
        F.expr("(allocated_tokens * 10000) div available_tokens")
        .cast("long")
        .alias("epochs_bp"),
        (F.col("temp_share") > F.col("natural_share")).alias("upsampled"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# Epoch-value plan (data-constrained scaling)
# ---------------------------------------------------------------------------

# Fitted repeated-data half-value constant from Muennighoff et al. 2023
# ("Scaling Data-Constrained Language Models", R_D* ≈ 15.39): the value
# of the R-th repeat epoch decays as exp(-R/R*), and repeating beyond
# ~4 total epochs is where returns visibly fall off the
# "almost as good as new data" plateau.
EPOCH_RSTAR = 15.39
EPOCH_VALUE_CLIFF = 4  # total epochs; beyond this the plateau ends


@query(
    "corpus_epoch_value_plan",
    oracle=f"""
    WITH {_DUCK_TEMP_CTES},
    ep AS (
      SELECT lang, available_tokens, allocated_tokens,
             CAST((allocated_tokens * 10000) // available_tokens AS BIGINT)
               AS epochs_bp
      FROM alloc
    ),
    val AS (
      SELECT *,
             LEAST(available_tokens, allocated_tokens) AS u_seen,
             greatest(0.0, CAST(epochs_bp AS DOUBLE) / 10000 - 1) AS repeats
      FROM ep
    ),
    eff AS (
      SELECT *,
             CAST(floor(u_seen * (1 + {EPOCH_RSTAR}
                   * (1 - round(exp(-repeats / {EPOCH_RSTAR}), 6))))
                  AS BIGINT) AS effective_tokens
      FROM val
    )
    SELECT lang, available_tokens, allocated_tokens, epochs_bp,
           effective_tokens,
           CASE WHEN allocated_tokens = 0 THEN 0.0
                ELSE round(CAST(effective_tokens AS DOUBLE)
                           / allocated_tokens, 4) END AS utilization,
           greatest(0, allocated_tokens - effective_tokens) AS wasted_tokens,
           epochs_bp > {EPOCH_VALUE_CLIFF * 10_000} AS beyond_value_cliff
    FROM eff
    ORDER BY lang
    """,
)
def corpus_epoch_value_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-value audit for the τ-mixing allocations: how much of
    each stratum's allocated token budget is EFFECTIVE data under the
    data-constrained scaling law (Muennighoff et al. 2023 — the R-th
    repeat epoch is worth exp(-R/R*) of fresh data, R* ≈ 15.39), with
    two decision columns: ``beyond_value_cliff`` flags strata the
    temperature mixture repeats past the ~4-epoch plateau (spend the
    budget elsewhere or fetch more data), ``wasted_tokens`` quantifies
    the gap. effective = U_seen · (1 + R*·(1 − e^(−R/R*))) where U_seen
    is the unique tokens actually covered (= allocation when a stratum
    is downsampled below one epoch).

    Determinism: epochs come from the hash-checked integer ``epochs_bp``
    (exact in both engines); the only transcendental is one exp() per
    stratum, rounded to 6 digits before any arithmetic (the established
    exp-rounding discipline, doc_lm_perplexity/events_ams envelope).

    Plan shape: composes ``corpus_temperature_mixing``'s single-shuffle
    aggregate — the audit adds pure projections over the 5-row mixture,
    so the cost is one partial agg over token counts at ANY corpus size;
    at 100 TB this is the pre-training-run report that decides whether
    the mixture is data- or compute-bound before a single shard is
    materialized."""
    mix = corpus_temperature_mixing(spark, sf_dir).select(
        "lang", "available_tokens", "allocated_tokens", "epochs_bp"
    )
    return _epoch_value_audit(mix)


def _epoch_value_audit(mix: DataFrame) -> DataFrame:
    """The pure value-audit projection over a (lang, available_tokens,
    allocated_tokens, epochs_bp) relation — factored out of
    ``corpus_epoch_value_plan`` so the strict-inequality cliff boundary
    (``beyond_value_cliff`` flips between epochs_bp = 40000 and 40001,
    unreachable exactly through τ-mixing's sqrt arithmetic) is unit-
    testable on literal rows (tests/test_mixing.py)."""
    repeats = F.greatest(
        F.lit(0.0), F.col("epochs_bp").cast("double") / 10_000 - 1
    )
    u_seen = F.least(F.col("available_tokens"), F.col("allocated_tokens"))
    decay = F.round(F.exp(-repeats / EPOCH_RSTAR), 6)
    eff = F.floor(u_seen * (1 + EPOCH_RSTAR * (1 - decay))).cast("long")
    out = mix.withColumn("effective_tokens", eff)
    return out.select(
        "lang",
        "available_tokens",
        "allocated_tokens",
        "epochs_bp",
        "effective_tokens",
        F.when(F.col("allocated_tokens") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.col("effective_tokens").cast("double")
                / F.col("allocated_tokens"),
                4,
            )
        )
        .alias("utilization"),
        F.greatest(
            F.lit(0).cast("long"),
            F.col("allocated_tokens") - F.col("effective_tokens"),
        ).alias("wasted_tokens"),
        (F.col("epochs_bp") > EPOCH_VALUE_CLIFF * 10_000).alias(
            "beyond_value_cliff"
        ),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# DoReMi-style loss-derived domain weights
# ---------------------------------------------------------------------------

DOREMI_ETA = 1.0  # multiplicative-weights step size on clipped excess loss

# The corpus bigram-LM CTE chain is owned by textstats (doc_lm_perplexity);
# importing the one text keeps the "reference loss" definition from forking.
from .textstats import _DUCK_LM_CTES  # noqa: E402


# The full DoReMi derivation as a reusable CTE chain ending in a
# ``doremi`` relation — one SQL text shared by the weights query and the
# sampling query that composes it, so the weight definition can't fork.
_DUCK_DOREMI_CTES = f"""{_DUCK_LM_CTES},
    per_doc AS (
      SELECT a.doc_id, d.source,
             CAST(a.n_bigrams AS BIGINT) AS n_bigrams,
             CAST(round(a.total / a.n_bigrams, 4) AS DECIMAL(18,4)) AS avg_nll
      FROM lm_agg a JOIN documents d USING (doc_id)
    ),
    dom AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_bigrams) AS BIGINT) AS lm_tokens,
             SUM(avg_nll) AS sum_nll
      FROM per_doc GROUP BY source
    ),
    tot AS (
      SELECT *,
             SUM(lm_tokens) OVER () AS corpus_tokens,
             SUM(sum_nll) OVER () AS corpus_sum,
             SUM(n_docs) OVER () AS corpus_docs
      FROM dom
    ),
    sc AS (
      SELECT source, n_docs, lm_tokens,
             round(CAST(lm_tokens AS DOUBLE) / corpus_tokens, 6)
               AS natural_share,
             round(CAST(sum_nll AS DOUBLE) / n_docs, 6) AS avg_nll,
             greatest(0.0, round(CAST(sum_nll AS DOUBLE) / n_docs
                       - CAST(corpus_sum AS DOUBLE) / corpus_docs, 6))
               AS excess_nll
      FROM tot
    ),
    b AS (
      SELECT *,
             round(exp({DOREMI_ETA} * excess_nll), 4) AS boost,
             CAST(round(natural_share
                        * round(exp({DOREMI_ETA} * excess_nll), 4), 6)
                  AS DECIMAL(38,6)) AS raw
      FROM sc
    ),
    n AS (SELECT *, SUM(raw) OVER () AS raw_total FROM b),
    doremi AS (
      SELECT source, n_docs, lm_tokens, natural_share, avg_nll, excess_nll,
             boost,
             round(CAST(raw AS DOUBLE) / CAST(raw_total AS DOUBLE), 6)
               AS doremi_weight
      FROM n
    )"""


@query(
    "corpus_doremi_weights",
    oracle=f"""
    WITH {_DUCK_DOREMI_CTES}
    SELECT source, n_docs, lm_tokens, natural_share, avg_nll, excess_nll,
           boost, doremi_weight,
           doremi_weight > natural_share AS upweighted
    FROM doremi
    ORDER BY source
    """,
)
def corpus_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loss-derived domain mixture weights — the DoReMi family (Xie et
    al. 2023: upweight domains where the model's excess loss over a
    reference is largest), completing the mixture-derivation trilogy
    beside the fixed-target ``corpus_mixture_plan`` and the
    availability-derived ``corpus_temperature_mixing``. The deterministic
    audit stand-in for the proxy-model loop: the "reference loss" is the
    corpus-wide mean per-doc bigram-LM NLL and each domain's signal is
    its clipped excess over it, so one multiplicative-weights step gives
    w_i ∝ natural_share_i · exp(η · excess_i), normalized. ``upweighted``
    (weight above natural share) is the decision column.

    Determinism discipline: per-doc avg_nll comes PRE-ROUNDED (4 digits)
    from ``doc_lm_perplexity`` and is summed as DECIMAL(18,4) — exact
    and order-independent in both engines; every downstream share/boost
    derives from rounded values, and the one exp() is rounded to 4
    digits before entering the weight product.

    Plan shape: the per-doc scoring is doc_lm_perplexity's N:1 equi-join
    pipeline (LM counts are vocabulary-sized and map-side combinable);
    the domain layer is one tiny groupBy(source) plus unpartitioned
    windows over the |domains|-row aggregate (the mixture idiom — no
    scalar-subquery nested loops). At 100 TB the LM table is built once
    and broadcast; the reweighting pass is aggregate-sized."""
    from .textstats import doc_lm_perplexity

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    per_doc = doc_lm_perplexity(spark, sf_dir).select(
        "doc_id",
        "n_bigrams",
        F.col("avg_nll").cast("decimal(18,4)").alias("avg_nll"),
    ).join(docs, "doc_id")
    dom = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bigrams").cast("long").alias("lm_tokens"),
        F.sum("avg_nll").alias("sum_nll"),
    )
    whole = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    tot = (
        dom.withColumn("corpus_tokens", F.sum("lm_tokens").over(whole))
        .withColumn("corpus_sum", F.sum("sum_nll").over(whole))
        .withColumn("corpus_docs", F.sum("n_docs").over(whole))
    )
    natural_share = F.round(
        F.col("lm_tokens").cast("double") / F.col("corpus_tokens"), 6
    )
    excess = F.greatest(
        F.lit(0.0),
        F.round(
            F.col("sum_nll").cast("double") / F.col("n_docs")
            - F.col("corpus_sum").cast("double") / F.col("corpus_docs"),
            6,
        ),
    )
    boost = F.round(F.exp(DOREMI_ETA * excess), 4)
    sc = tot.select(
        "source",
        "n_docs",
        "lm_tokens",
        natural_share.alias("natural_share"),
        F.round(F.col("sum_nll").cast("double") / F.col("n_docs"), 6).alias(
            "avg_nll"
        ),
        excess.alias("excess_nll"),
        boost.alias("boost"),
        F.round(natural_share * boost, 6)
        .cast("decimal(38,6)")
        .alias("raw"),
    )
    n = sc.withColumn("raw_total", F.sum("raw").over(whole))
    weight = F.round(
        F.col("raw").cast("double") / F.col("raw_total").cast("double"), 6
    )
    return n.select(
        "source",
        "n_docs",
        "lm_tokens",
        "natural_share",
        "avg_nll",
        "excess_nll",
        "boost",
        weight.alias("doremi_weight"),
        (weight > F.col("natural_share")).alias("upweighted"),
    ).orderBy("source")


DOREMI_SAMPLE_SALT = "doremi|"
_DUCK_DOREMI_BUCKET = (
    DUCK_TOKEN_HASH60.format(t=f"'{DOREMI_SAMPLE_SALT}' || doc_id")
    + f" % {SAMPLE_BUCKETS}"
)


@query(
    "corpus_doremi_sample",
    oracle=f"""
    WITH {_DUCK_DOREMI_CTES},
    rates AS (
      SELECT source,
             CAST(CASE WHEN natural_share <= 0 THEN {SAMPLE_BUCKETS}
                  ELSE LEAST({SAMPLE_BUCKETS},
                       CAST(floor({SAMPLE_BUCKETS} * doremi_weight
                                  / natural_share) AS BIGINT))
                  END AS INTEGER) AS rate_permille
      FROM doremi
    ),
    labeled AS (
      SELECT doc_id, source, {_DUCK_DOREMI_BUCKET} AS bucket
      FROM documents
    )
    SELECT l.source, r.rate_permille,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN l.bucket < r.rate_permille THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sampled,
           CAST(MIN(CASE WHEN l.bucket < r.rate_permille THEN l.doc_id END)
                AS BIGINT) AS min_sampled_doc_id,
           CAST(MAX(CASE WHEN l.bucket < r.rate_permille THEN l.doc_id END)
                AS BIGINT) AS max_sampled_doc_id
    FROM labeled l JOIN rates r USING (source)
    GROUP BY l.source, r.rate_permille
    ORDER BY l.source
    """,
)
def corpus_doremi_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DoReMi loop closed into an actual document selection (r14
    verdict item 5): ``corpus_doremi_weights``'s loss-derived mixture
    composed with the deterministic hash-admission idiom of
    ``corpus_stratified_sample``. Each domain keeps
    ``floor(1000 · w_i / natural_share_i)`` per-mille of its documents,
    clipped at 1000 — the single-pass DOWNsampling realization of one
    multiplicative-weights step: below-reference (easy) domains fund the
    mixture by admission-rate cuts, upweighted domains are kept in full
    (their >1 boost is an epoch-repetition decision, which
    ``corpus_epoch_value_plan`` audits, not an admission decision — a
    hash filter can't replicate rows). Membership is
    ``sha256('doremi|' || doc_id) % 1000 < rate``: deterministic across
    engines, reruns, and partitionings, and independent of the
    stratified sample's salt. Domains absent from the LM relation (no
    doc with ≥2 tokens) have no measurable loss and drop from the plan
    in both engines.

    Output is the per-domain admission audit (counts + min/max admitted
    doc_id pin membership for the driver hash), the same audited-
    selection shape as ``corpus_stratified_sample``.

    Determinism: rate = floor((1000·w)/ns) on 6-digit-rounded doubles —
    identical operand order in both engines, floor exact; a domain too
    small for its share to round above zero keeps everything rather
    than dividing by zero.

    Plan shape: the weight derivation is aggregate-sized (|domains|
    rows) and BROADCAST onto the documents scan — the admission pass
    adds one narrow map + one partial agg over the corpus, no extra
    shuffle of document text; at 100 TB this is the materialization
    filter a mixture run ships to every executor."""
    w = corpus_doremi_weights(spark, sf_dir)
    rate = (
        F.when(F.col("natural_share") <= 0, F.lit(SAMPLE_BUCKETS).cast("long"))
        .otherwise(
            F.least(
                F.lit(SAMPLE_BUCKETS).cast("long"),
                F.floor(
                    SAMPLE_BUCKETS
                    * F.col("doremi_weight")
                    / F.col("natural_share")
                ),
            )
        )
        .cast("int")
    )
    rates = w.select("source", rate.alias("rate_permille"))
    bucket = (
        token_hash60(F.concat(F.lit(DOREMI_SAMPLE_SALT), F.col("doc_id")))
        % SAMPLE_BUCKETS
    )
    docs = load_table(spark, sf_dir, "documents")
    labeled = docs.select("doc_id", "source", bucket.alias("bucket"))
    keep = F.col("bucket") < F.col("rate_permille")
    return (
        labeled.join(F.broadcast(rates), "source")
        .groupBy("source", "rate_permille")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(keep.cast("long")).alias("n_sampled"),
            F.min(F.when(keep, F.col("doc_id"))).alias("min_sampled_doc_id"),
            F.max(F.when(keep, F.col("doc_id"))).alias("max_sampled_doc_id"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------

CTX_TOKENS = 256


@query(
    "doc_sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN 0
                  ELSE len(regexp_split_to_array(
                         regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END
               AS n_tokens
      FROM documents
    ),
    nonempty AS (SELECT * FROM toks WHERE n_tokens > 0),
    cum AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tokens AS cum_before
      FROM nonempty
    ),
    binned AS (
      SELECT lang, doc_id, n_tokens,
             cum_before // {CTX_TOKENS} AS bin_id,
             (cum_before + n_tokens - 1) // {CTX_TOKENS} AS end_bin
      FROM cum
    )
    SELECT lang,
           CAST(bin_id AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_started,
           CAST(SUM(CASE WHEN end_bin > bin_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boundary_crossers
    FROM binned
    GROUP BY lang, bin_id
    ORDER BY lang, bin_id
    """,
)
def doc_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing audit: concatenate documents in doc_id
    order within each ``lang`` shard and split the token stream into
    fixed ``CTX_TOKENS`` context windows; report, per window, how many
    documents start there, their token mass, and how many cross a window
    boundary (the attention-masking cases). The cumsum window is
    PARTITIONED by the shard key — each shard packs independently in
    parallel, the way packing runs at 100 TB (per input shard), never a
    global single-task cumsum. Empty documents are excluded (they cannot
    occupy a window)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.size(words(F.col("text"))).alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.withColumn(
        "cum_before", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    binned = cum.select(
        "lang",
        "doc_id",
        "n_tokens",
        F.expr(f"cum_before div {CTX_TOKENS}").alias("bin_id"),
        F.expr(f"(cum_before + n_tokens - 1) div {CTX_TOKENS}").alias("end_bin"),
    )
    return (
        binned.groupBy("lang", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tokens_started"),
            F.sum((F.col("end_bin") > F.col("bin_id")).cast("long")).alias(
                "n_boundary_crossers"
            ),
        )
        .orderBy("lang", "bin_id")
    )


# ---------------------------------------------------------------------------
# Token familiarity (unigram-LM quality proxy)
# ---------------------------------------------------------------------------

RARE_FREQ_MAX = 2
FAMILIARITY_TOPK = 100


@query(
    "doc_token_familiarity",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(
               regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+')) AS token
      FROM documents
      WHERE length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) > 0
    ),
    freq AS (SELECT token, COUNT(*) AS freq FROM toks GROUP BY token),
    scored AS (
      SELECT t.doc_id,
             COUNT(*) AS n_tokens,
             SUM(f.freq) AS freq_sum,
             SUM(CASE WHEN f.freq <= {RARE_FREQ_MAX} THEN 1 ELSE 0 END) AS n_rare
      FROM toks t JOIN freq f USING (token)
      GROUP BY t.doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(CAST(freq_sum AS DOUBLE) / n_tokens, 4) AS familiarity,
           ROUND(CAST(n_rare AS DOUBLE) / n_tokens, 4) AS rare_token_ratio
    FROM scored
    ORDER BY familiarity ASC, doc_id
    LIMIT {FAMILIARITY_TOPK}
    """,
)
def doc_token_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality proxy: score each document by the mean corpus
    frequency of its tokens (low familiarity = out-of-distribution /
    noisy text, the KenLM-perplexity-filter shape without the external
    model) plus the fraction of rare tokens (corpus freq <= 2). Returns
    the ``FAMILIARITY_TOPK`` least-familiar documents — the triage list a
    data pipeline sends to review. Exactness: familiarity is a single
    IEEE division of two exact integers rounded to 4 decimals, identical
    across engines. Two hash-aggs + one vocab-sized equi-join; AQE splits
    the stopword-skewed keys at scale."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.length(F.regexp_replace("text", r"^\s+|\s+$", "")) > 0)
        .select("doc_id", F.explode(words(F.lower(F.col("text")))).alias("token"))
    )
    freq = toks.groupBy("token").agg(F.count("*").alias("freq"))
    scored = (
        toks.join(freq, "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("freq").alias("freq_sum"),
            F.sum((F.col("freq") <= RARE_FREQ_MAX).cast("long")).alias("n_rare"),
        )
    )
    return (
        scored.select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.col("freq_sum").cast("double") / F.col("n_tokens"), 4).alias(
                "familiarity"
            ),
            F.round(F.col("n_rare").cast("double") / F.col("n_tokens"), 4).alias(
                "rare_token_ratio"
            ),
        )
        .orderBy(F.asc("familiarity"), F.asc("doc_id"))
        .limit(FAMILIARITY_TOPK)
    )


# ---------------------------------------------------------------------------
# Weighted (PPS) sampling via deterministic hash priorities
# ---------------------------------------------------------------------------

PPS_TOPK = 50
_DUCK_PPS_HASH = DUCK_TOKEN_HASH60.format(t="'pps|' || doc_id")


@query(
    "corpus_weighted_sample",
    oracle=f"""
    SELECT doc_id, lang,
           CAST(n_chars AS BIGINT) AS weight,
           CAST({_DUCK_PPS_HASH} AS DOUBLE) / n_chars AS priority
    FROM documents
    WHERE n_chars > 0
    ORDER BY priority ASC, doc_id
    LIMIT {PPS_TOPK}
    """,
)
def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size sampling without randomness:
    each document gets priority = hash(salted id) / weight (weight =
    n_chars), and the PPS_TOPK lowest priorities are the sample — heavier
    documents draw proportionally smaller keys, so inclusion probability
    tracks weight, yet membership is fully deterministic across engines,
    reruns, and partitionings (the priority-sampling / weighted-reservoir
    scheme with a hash in place of the random draw). The priority is one
    IEEE division of exact integers emitted UNROUNDED — bit-identical
    across engines, where decimal rounding at this magnitude (~1e14)
    would hit double-representation disagreements; the top-k is a
    TakeOrderedAndProject, no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    h = token_hash60(F.concat(F.lit("pps|"), F.col("doc_id")))
    priority = h.cast("double") / F.col("n_chars")
    return (
        docs.filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "lang",
            F.col("n_chars").cast("long").alias("weight"),
            priority.alias("priority"),
        )
        .orderBy(F.asc("priority"), F.asc("doc_id"))
        .limit(PPS_TOPK)
    )


# ---------------------------------------------------------------------------
# Distribution drift between splits (PSI)
# ---------------------------------------------------------------------------

PSI_BIN_WIDTH = 200   # n_chars per bin
PSI_MAX_BIN = 15      # lengths >= WIDTH*MAX collapse into the tail bin

from .ranking import DUCK_SPLIT_CASE, split_assignment  # noqa: E402


@query(
    "corpus_drift_psi",
    oracle=f"""
    WITH labeled AS (
      SELECT {DUCK_SPLIT_CASE.format(id="doc_id")} AS split,
             LEAST(n_chars // {PSI_BIN_WIDTH}, {PSI_MAX_BIN}) AS bin
      FROM documents
    ),
    counts AS (SELECT split, bin, COUNT(*) AS c FROM labeled GROUP BY 1, 2),
    totals AS (SELECT split, SUM(c) AS t FROM counts GROUP BY 1),
    ref AS (SELECT bin, c AS rc FROM counts WHERE split = 'train'),
    rt AS (SELECT t AS rt FROM totals WHERE split = 'train'),
    cmp AS (SELECT split, bin, c FROM counts WHERE split <> 'train'),
    ct AS (SELECT split, t AS ct FROM totals WHERE split <> 'train'),
    joined AS (
      SELECT cmp.split, cmp.bin,
             CAST(cmp.c AS DOUBLE) / ct.ct AS q,
             CAST(ref.rc AS DOUBLE) / rt.rt AS p
      FROM cmp
      JOIN ct USING (split)
      JOIN ref USING (bin)
      CROSS JOIN rt
    ),
    psi AS (
      SELECT split,
             COUNT(*) AS n_bins_common,
             round(SUM((q - p) * ln(q / p) ORDER BY bin), 6) AS psi
      FROM joined GROUP BY split
    ),
    ref_only AS (
      SELECT s.split, COUNT(*) AS n
      FROM (SELECT DISTINCT split FROM cmp) s
      CROSS JOIN ref
      LEFT JOIN cmp ON cmp.split = s.split AND cmp.bin = ref.bin
      WHERE cmp.bin IS NULL
      GROUP BY s.split
    ),
    cmp_only AS (
      SELECT cmp.split, COUNT(*) AS n
      FROM cmp LEFT JOIN ref USING (bin)
      WHERE ref.bin IS NULL
      GROUP BY cmp.split
    )
    SELECT p.split,
           CAST(p.n_bins_common AS INTEGER) AS n_bins_common,
           CAST(COALESCE(r.n, 0) AS INTEGER) AS n_bins_ref_only,
           CAST(COALESCE(c.n, 0) AS INTEGER) AS n_bins_cmp_only,
           p.psi
    FROM psi p
    LEFT JOIN ref_only r USING (split)
    LEFT JOIN cmp_only c USING (split)
    ORDER BY p.split
    """,
)
def corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the document-length distribution,
    valid/test vs the train reference — the production drift monitor
    (PSI > 0.25 conventionally means "distribution moved, investigate")
    applied to the dataset's own hash split, where a healthy random
    split shows PSI ≈ 0 and a biased split or skewed ingest batch
    lights up. Composes the REGISTERED split definition
    (split_assignment in ranking.py), so a threshold change can never
    fork the audited split.

    Length histograms bin n_chars at {PSI_BIN_WIDTH}-char width with a
    tail bin at {PSI_MAX_BIN}; bins present in only one side cannot
    enter the (q-p)·ln(q/p) sum (ln of 0 or ∞) and are reported as
    ref-only / cmp-only counts instead — visible, not silently skipped.
    The per-split sum folds in bin order (the perplexity/BM25 idiom) so
    the double total is reproducible under any partitioning and matches
    DuckDB's SUM(... ORDER BY bin) to the rounded digit.

    Scale shape: one narrow scan + hash agg to |splits|×|bins| rows
    (≤ 48); everything after is broadcast-sized. At 100 TB the drift
    check costs one pass regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    labeled = docs.select(
        split_assignment("doc_id").alias("split"),
        F.least(
            F.expr(f"n_chars div {PSI_BIN_WIDTH}"), F.lit(PSI_MAX_BIN)
        ).alias("bin"),
    )
    counts = labeled.groupBy("split", "bin").agg(F.count("*").alias("c"))
    totals = counts.groupBy("split").agg(F.sum("c").alias("t"))

    ref = counts.filter(F.col("split") == "train").select(
        "bin", F.col("c").alias("rc")
    )
    rt = totals.filter(F.col("split") == "train").select(F.col("t").alias("rt"))
    cmp = counts.filter(F.col("split") != "train")
    ct = totals.filter(F.col("split") != "train").select(
        "split", F.col("t").alias("ct")
    )

    joined = (
        cmp.join(ct, "split")
        .join(ref, "bin")
        .crossJoin(F.broadcast(rt))
        .select(
            "split",
            "bin",
            (F.col("c").cast("double") / F.col("ct")).alias("q"),
            (F.col("rc").cast("double") / F.col("rt")).alias("p"),
        )
    )
    psi = joined.groupBy("split").agg(
        F.count("*").alias("n_bins_common"),
        F.round(
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "bin",
                            ((F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p"))).alias("contrib"),
                        )
                    )
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ),
            6,
        ).alias("psi"),
    )

    cmp_splits = cmp.select("split").distinct()
    ref_only = (
        cmp_splits.crossJoin(F.broadcast(ref))
        .join(cmp.select("split", "bin"), ["split", "bin"], "left_anti")
        .groupBy("split")
        .agg(F.count("*").alias("n_ref_only"))
    )
    cmp_only = (
        cmp.join(ref.select("bin"), "bin", "left_anti")
        .groupBy("split")
        .agg(F.count("*").alias("n_cmp_only"))
    )

    return (
        psi.join(ref_only, "split", "left")
        .join(cmp_only, "split", "left")
        .select(
            "split",
            F.col("n_bins_common").cast("int").alias("n_bins_common"),
            F.coalesce(F.col("n_ref_only"), F.lit(0)).cast("int").alias(
                "n_bins_ref_only"
            ),
            F.coalesce(F.col("n_cmp_only"), F.lit(0)).cast("int").alias(
                "n_bins_cmp_only"
            ),
            "psi",
        )
        .orderBy("split")
    )
