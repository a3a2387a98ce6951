"""Invariants for the data-mixing/packing operators and the small-file
compaction maintenance op (oracle parity for the mixing queries is covered
by test_oracle_parity.py; these tests assert the *semantic* contracts an
oracle row-hash can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cs_5542_lab_6_spark.operators.mixing import (
    BUDGET_EPOCHS,
    CTX_TOKENS,
    EPOCH_VALUE_CLIFF,
    MIXTURE_WEIGHTS_BP,
    SAMPLE_RATES_PERMILLE,
    corpus_doremi_weights,
    corpus_epoch_value_plan,
    corpus_mixture_plan,
    corpus_stratified_sample,
    corpus_temperature_mixing,
    doc_sequence_packing,
)
from cs_5542_lab_6_spark.pipeline.maintenance import compact_table


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    rows = {r["lang"]: r for r in corpus_stratified_sample(spark, sf_dir).collect()}
    assert set(rows) == {lang for lang, _ in SAMPLE_RATES_PERMILLE}
    for lang, rate in SAMPLE_RATES_PERMILLE:
        r = rows[lang]
        assert 0 <= r["n_sampled"] <= r["n_total"]
        if rate == 1000:
            assert r["n_sampled"] == r["n_total"]  # keep-everything stratum
    # hash-threshold sampling is rerun-stable (rand() would not be)
    again = {r["lang"]: r for r in corpus_stratified_sample(spark, sf_dir).collect()}
    assert {k: v["n_sampled"] for k, v in rows.items()} == {
        k: v["n_sampled"] for k, v in again.items()
    }


def test_mixture_plan_allocates_full_budget(spark, sf_dir):
    rows = corpus_mixture_plan(spark, sf_dir).collect()
    assert {r["lang"] for r in rows} == {lang for lang, _ in MIXTURE_WEIGHTS_BP}
    total_avail = sum(r["available_tokens"] for r in rows)
    total_alloc = sum(r["allocated_tokens"] for r in rows)
    # floor division loses < 1 token per stratum off the 2-epoch budget
    assert 0 <= 2 * total_avail - total_alloc < len(rows)
    for r in rows:
        assert r["oversampled"] == (r["epochs_bp"] > 10_000)


def test_temperature_mixing_compresses_shares_toward_uniform(spark, tmp_path):
    """The τ=0.5 semantics an oracle row-hash can't express: on a
    skewed corpus, square-root sampling must (1) upsample every
    below-average language and downsample every above-average one, with
    ``upsampled`` ≡ boost > 1, (2) COMPRESS the share spread — the
    temp-share max/min ratio is the sqrt of the natural ratio, strictly
    smaller, while preserving the size ORDER (τ=0.5 reweights, never
    reranks), and (3) conserve the budget: allocations sum to the
    BUDGET_EPOCHS x corpus total, short only the per-stratum floor()
    losses. Pinned on a 100:10:1 three-language corpus where every
    inequality is far from rounding noise."""
    sf = str(tmp_path / "skewed")
    rows = []
    did = 0
    for lang, n_docs, words_per_doc in [("big", 100, 100), ("mid", 10, 100), ("rare", 1, 100)]:
        for _ in range(n_docs):
            rows.append((did, " ".join(f"w{i}" for i in range(words_per_doc)), lang, "syn", 500))
            did += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    out = {r["lang"]: r for r in corpus_temperature_mixing(spark, sf).collect()}
    assert set(out) == {"big", "mid", "rare"}
    big, mid, rare = out["big"], out["mid"], out["rare"]

    # decision column: below-average share ⇒ upsampled, and ≡ boost > 1
    for r in out.values():
        assert r["upsampled"] == (r["boost"] > 1.0)
    assert not big["upsampled"] and mid["upsampled"] and rare["upsampled"]

    # spread compression without reranking: order preserved, ratio sqrt'd
    assert big["temp_share"] > mid["temp_share"] > rare["temp_share"]
    nat_ratio = big["natural_share"] / rare["natural_share"]
    temp_ratio = big["temp_share"] / rare["temp_share"]
    assert temp_ratio < nat_ratio
    assert abs(temp_ratio - nat_ratio**0.5) / nat_ratio**0.5 < 0.01

    # budget conservation: floor() loses < 1 token per stratum
    corpus_tokens = sum(r["available_tokens"] for r in out.values())
    total_alloc = sum(r["allocated_tokens"] for r in out.values())
    assert 0 <= BUDGET_EPOCHS * corpus_tokens - total_alloc < len(out)
    # shares are probability vectors up to the 6-digit rounding
    assert abs(sum(r["natural_share"] for r in out.values()) - 1.0) < 1e-5
    assert abs(sum(r["temp_share"] for r in out.values()) - 1.0) < 1e-5
    # epochs: the rare stratum is repeated beyond the budget's epoch
    # count, the dominant stratum below it (the whole point of τ-mixing)
    assert rare["epochs_bp"] > BUDGET_EPOCHS * 10_000 > big["epochs_bp"]


def test_temperature_mixing_single_language_degenerate(spark, tmp_path):
    """Degenerate-stratum corner (r13 verdict item 7): a filtered corpus
    can leave ONE language. Then natural_share = temp_share = 1.0 by
    definition, boost = 1.0 exactly (the share division must not emit
    NaN/NULL), ``upsampled`` is False (a single stratum can't be
    up- or downsampled), and the full BUDGET_EPOCHS budget lands on the
    single stratum minus at most the one floor() loss."""
    sf = str(tmp_path / "monolang")
    rows = [
        (i, " ".join(f"w{j}" for j in range(50)), "only", "syn", 250)
        for i in range(20)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    out = corpus_temperature_mixing(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["lang"] == "only"
    assert r["natural_share"] == 1.0
    assert r["temp_share"] == 1.0
    assert r["boost"] == 1.0
    assert r["upsampled"] is False
    assert 0 <= BUDGET_EPOCHS * r["available_tokens"] - r["allocated_tokens"] < 1
    assert r["epochs_bp"] in (BUDGET_EPOCHS * 10_000, BUDGET_EPOCHS * 10_000 - 1)


def test_epoch_value_plan_decays_repeated_data(spark, tmp_path):
    """Data-constrained scaling semantics (Muennighoff et al. 2023) the
    oracle row-hash can't express: effective tokens never exceed
    allocated (repeats are worth at most fresh data), a stratum at or
    below one epoch is fully effective (utilization 1.0, zero waste),
    and a heavily-repeated stratum (the τ-mixing-boosted rare language
    on a 100:10:1 corpus) both crosses the ~4-epoch value cliff and
    wastes a strictly positive share of its allocation."""
    sf = str(tmp_path / "skewed_ep")
    rows, did = [], 0
    for lang, n_docs in [("big", 100), ("mid", 10), ("rare", 1)]:
        for _ in range(n_docs):
            rows.append((did, " ".join(f"w{i}" for i in range(100)), lang, "syn", 500))
            did += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    out = {r["lang"]: r for r in corpus_epoch_value_plan(spark, sf).collect()}
    assert set(out) == {"big", "mid", "rare"}
    for r in out.values():
        assert 0 < r["effective_tokens"] <= r["allocated_tokens"]
        assert r["wasted_tokens"] == r["allocated_tokens"] - r["effective_tokens"]
        assert 0 < r["utilization"] <= 1.0
        assert r["beyond_value_cliff"] == (
            r["epochs_bp"] > EPOCH_VALUE_CLIFF * 10_000
        )
    big, rare = out["big"], out["rare"]
    # τ=0.5 on 100:1 availability boosts the rare stratum ~sqrt(100)/
    # normalization ≈ 15.7 epochs — deep past the 4-epoch plateau
    assert rare["beyond_value_cliff"] and rare["wasted_tokens"] > 0
    # the dominant stratum is downsampled toward ~1.6 epochs: below the
    # cliff and nearly fully effective
    assert not big["beyond_value_cliff"]
    assert big["utilization"] > rare["utilization"]


def test_epoch_value_cliff_boundary_exact(spark):
    """The strict-inequality boundary (r14 verdict item 7, carried from
    the τ-mixing corner discipline): ``beyond_value_cliff`` must be False
    at epochs_bp == EXACTLY the cliff (40000 bp = 4.0 epochs) and True
    one basis point past it. τ-mixing's sqrt arithmetic can't land on the
    boundary exactly, so this pins the factored audit projection
    (_epoch_value_audit) on literal rows — including the allocated=0
    stratum, whose utilization must be 0.0, not NULL/NaN."""
    from cs_5542_lab_6_spark.operators.mixing import _epoch_value_audit

    cliff_bp = EPOCH_VALUE_CLIFF * 10_000
    mix = spark.createDataFrame(
        [
            ("at_cliff", 1_000, 4_000, cliff_bp),
            ("past_cliff", 1_000, 4_000, cliff_bp + 1),
            ("one_epoch", 1_000, 1_000, 10_000),
            ("zero_alloc", 1_000, 0, 0),
        ],
        "lang string, available_tokens long, allocated_tokens long, epochs_bp long",
    )
    out = {r["lang"]: r for r in _epoch_value_audit(mix).collect()}
    assert out["at_cliff"]["beyond_value_cliff"] is False
    assert out["past_cliff"]["beyond_value_cliff"] is True
    # the value function itself is continuous at the boundary: one extra
    # basis point changes effective tokens by at most a rounding step
    assert (
        abs(out["past_cliff"]["effective_tokens"] - out["at_cliff"]["effective_tokens"])
        <= 1
    )
    # ≤ one epoch ⇒ fully effective, zero waste, below the cliff
    one = out["one_epoch"]
    assert one["effective_tokens"] == one["allocated_tokens"]
    assert one["wasted_tokens"] == 0
    assert one["utilization"] == 1.0
    assert one["beyond_value_cliff"] is False
    # degenerate zero allocation: defined, not NULL/NaN
    zero = out["zero_alloc"]
    assert zero["utilization"] == 0.0
    assert zero["effective_tokens"] == 0
    assert zero["wasted_tokens"] == 0
    assert zero["beyond_value_cliff"] is False


def test_doremi_weights_uniform_loss_degenerate(spark, tmp_path):
    """Uniform-loss corner (r14 verdict item 7): when every document has
    IDENTICAL text, every domain's mean NLL equals the corpus reference
    exactly, so all excess clips to 0, every boost is exactly 1, the
    DoReMi weights COLLAPSE to the natural shares, and ``upweighted``
    (strict >) is False everywhere — one multiplicative-weights step on a
    zero signal must be the identity, never a NaN/NULL or a spurious
    reweight. Doc counts 3:1 make the shares (0.75/0.25) exact in 6-digit
    rounding so weight == natural_share bit-for-bit."""
    sf = str(tmp_path / "doremi_uniform")
    text = "alpha beta gamma delta epsilon zeta eta theta " * 4
    rows = [(i, text, "en", "srcA" if i < 3 else "srcB", 200) for i in range(4)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    out = {r["source"]: r for r in corpus_doremi_weights(spark, sf).collect()}
    assert set(out) == {"srcA", "srcB"}
    for r in out.values():
        assert r["excess_nll"] == 0.0
        assert r["boost"] == 1.0
        assert r["doremi_weight"] == r["natural_share"]
        assert r["upweighted"] is False
    assert out["srcA"]["natural_share"] == 0.75
    assert out["srcB"]["natural_share"] == 0.25

    # the sampled realization of the identity step: every domain's
    # admission rate is exactly 1000 (floor(1000 * w/ns) with w == ns),
    # so the "sample" keeps the whole corpus — a zero loss signal must
    # not drop a single document
    from cs_5542_lab_6_spark.operators.mixing import corpus_doremi_sample

    samp = {r["source"]: r for r in corpus_doremi_sample(spark, sf).collect()}
    assert set(samp) == {"srcA", "srcB"}
    for r in samp.values():
        assert r["rate_permille"] == 1000
        assert r["n_sampled"] == r["n_total"]


def test_doremi_weights_upweight_high_loss_domain(spark, tmp_path):
    """DoReMi semantics: the domain with excess bigram-LM loss over the
    corpus reference gets boost > 1 and a weight above its natural
    share; the easy domain funds it. Built on a two-source corpus where
    'easy' docs repeat one predictable sentence (near-zero NLL under the
    corpus LM) and 'hard' docs are all-distinct bigrams."""
    sf = str(tmp_path / "doremi")
    rows = []
    for i in range(20):
        rows.append((i, "the cat sat on the mat " * 8, "en", "easy", 200))
    for i in range(20, 30):
        base = i * 100
        rows.append(
            (i, " ".join(f"tok{base + j}" for j in range(40)), "en", "hard", 200)
        )
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    out = {r["source"]: r for r in corpus_doremi_weights(spark, sf).collect()}
    assert set(out) == {"easy", "hard"}
    easy, hard = out["easy"], out["hard"]
    for r in out.values():
        assert r["excess_nll"] >= 0.0
        assert r["boost"] >= 1.0
        assert r["upweighted"] == (r["doremi_weight"] > r["natural_share"])
    # weights are a probability vector up to 6-digit rounding
    assert abs(easy["doremi_weight"] + hard["doremi_weight"] - 1.0) < 1e-5
    assert hard["excess_nll"] > 0.0 and hard["boost"] > 1.0
    assert hard["upweighted"] and not easy["upweighted"]
    # clipping: the easy domain sits below the reference, so its excess
    # clips to exactly zero and its boost to exactly one
    assert easy["excess_nll"] == 0.0 and easy["boost"] == 1.0


def test_doremi_sample_realizes_weights_as_admission_rates(spark, tmp_path):
    """The closed DoReMi loop (r14 verdict item 5): on the easy/hard
    corpus the upweighted (hard) domain keeps EVERYTHING (rate 1000 —
    its >1 boost is an epoch decision, not an admission decision) while
    the easy domain funds the mixture with an admission rate strictly
    below its per-mille share ratio floor(1000·w/ns) < 1000; counts obey
    the rate, membership is rerun-stable, and the rates agree with the
    registered weight query's own output (one definition, no fork)."""
    from cs_5542_lab_6_spark.operators.mixing import corpus_doremi_sample

    sf = str(tmp_path / "doremi_samp")
    rows = []
    for i in range(20):
        rows.append((i, "the cat sat on the mat " * 8, "en", "easy", 200))
    for i in range(20, 30):
        base = i * 100
        rows.append(
            (i, " ".join(f"tok{base + j}" for j in range(40)), "en", "hard", 200)
        )
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    out = {r["source"]: r for r in corpus_doremi_sample(spark, sf).collect()}
    weights = {r["source"]: r for r in corpus_doremi_weights(spark, sf).collect()}
    assert set(out) == {"easy", "hard"}
    for src, r in out.items():
        w = weights[src]
        expected_rate = min(
            1000, int(1000 * w["doremi_weight"] / w["natural_share"])
        )
        assert r["rate_permille"] == expected_rate
        assert 0 <= r["n_sampled"] <= r["n_total"]
        if r["n_sampled"] > 0:
            assert r["min_sampled_doc_id"] <= r["max_sampled_doc_id"]
    assert out["hard"]["rate_permille"] == 1000
    assert out["hard"]["n_sampled"] == out["hard"]["n_total"]
    assert out["easy"]["rate_permille"] < 1000
    # rerun-stable membership (a rand() sample would move between runs)
    again = {r["source"]: r for r in corpus_doremi_sample(spark, sf).collect()}
    assert {k: (v["n_sampled"], v["min_sampled_doc_id"], v["max_sampled_doc_id"])
            for k, v in out.items()} == {
        k: (v["n_sampled"], v["min_sampled_doc_id"], v["max_sampled_doc_id"])
        for k, v in again.items()
    }


def test_sequence_packing_bins_are_dense_and_conserve_tokens(spark, sf_dir):
    rows = doc_sequence_packing(spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_tokens = F.size(F.split(F.regexp_replace("text", r"^\s+|\s+$", ""), r"\s+"))
    expected = {
        r["lang"]: r["toks"]
        for r in docs.filter(F.length(F.regexp_replace("text", r"^\s+|\s+$", "")) > 0)
        .groupBy("lang")
        .agg(F.sum(n_tokens).alias("toks"))
        .collect()
    }
    for lang, bins in by_lang.items():
        ids = sorted(b["bin_id"] for b in bins)
        # every context window between first and last has at least one doc
        # *starting* in it only if docs are shorter than the window; what
        # must always hold: ids strictly increase and start at 0
        assert ids[0] == 0 and len(set(ids)) == len(ids)
        assert sum(b["tokens_started"] for b in bins) == expected[lang]
        for b in bins:
            assert 0 <= b["n_boundary_crossers"] <= b["n_docs"]


def test_compact_table_reduces_files_and_preserves_rows(spark, sf_dir, tmp_path):
    frag = str(tmp_path / "frag")
    compacted = str(tmp_path / "compacted")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(64).write.mode("overwrite").parquet(frag)

    audit = compact_table(spark, frag, compacted, target_file_bytes=1 << 30)
    assert audit["files_in"] == 64
    assert audit["files_out"] == 1  # everything fits one target-size file

    a = spark.read.parquet(frag)
    b = spark.read.parquet(compacted)
    assert b.count() == a.count()
    # order-independent content equality: checksum over every column
    def keyset(df):
        joined = F.concat_ws("|", *[F.coalesce(F.col(c).cast("string"), F.lit("∅")) for c in sorted(df.columns)])
        return df.select(
            F.sum(F.conv(F.substring(F.sha2(joined, 256), 1, 15), 16, 10).cast("decimal(38,0)")).alias("sum")
        ).collect()[0]["sum"]

    assert keyset(a) == keyset(b)


def test_compact_table_shuffle_mode_splits_evenly(spark, sf_dir, tmp_path):
    frag = str(tmp_path / "frag2")
    out = str(tmp_path / "out2")
    spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(16).write.mode(
        "overwrite"
    ).parquet(frag)
    audit = compact_table(spark, frag, out, target_file_bytes=16 * 1024, shuffle=True)
    assert audit["files_out"] >= 2  # tiny target forces multiple outputs
    assert audit["files_out"] < audit["files_in"] or audit["files_in"] <= 2


def test_packing_window_is_partitioned_not_global(spark, sf_dir):
    """The packing plan must not serialize through a single global window
    partition — the Exchange feeding the Window must be a hash
    partitioning on lang, not SinglePartition."""
    plan = doc_sequence_packing(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_pagerank_invariants(spark, sf_dir):
    from cs_5542_lab_6_spark.pipeline.corpus import (
        PR_SCALE,
        PR_TOPK,
        _PR_BASE,
        kg_pagerank,
    )

    rows = kg_pagerank(spark, sf_dir).collect()
    assert len(rows) == PR_TOPK
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)  # ordered output
    for r in rows:
        assert r["rank"] >= _PR_BASE  # damping floor
        if r["degree"] == 0:
            assert r["rank"] == _PR_BASE  # isolated nodes hold base rank
    # the top node must have collected real contributions above the
    # damping floor, which requires incoming edges
    assert ranks[0] > _PR_BASE
    assert rows[0]["degree"] > 0


def test_retention_cohort_triangle(spark, sf_dir):
    from cs_5542_lab_6_spark.operators.joins_ext import events_retention_cohorts

    rows = events_retention_cohorts(spark, sf_dir).collect()
    assert rows, "retention matrix must not be empty"
    by_cohort: dict = {}
    for r in rows:
        assert r["week_offset"] >= 0  # activity never precedes the cohort
        by_cohort.setdefault(r["cohort_week"], []).append(r)
    for cohort, entries in by_cohort.items():
        offsets = [e["week_offset"] for e in entries]
        assert 0 in offsets  # every cohort is active in its own week
        week0 = next(e for e in entries if e["week_offset"] == 0)
        # retention never exceeds the cohort's own size
        assert all(e["n_active_users"] <= week0["n_active_users"] for e in entries)


def test_cluster_table_produces_disjoint_rowgroup_ranges(spark, sf_dir, tmp_path):
    """Sort-on-write clustering must yield files whose min/max footer
    statistics on the cluster key are pairwise DISJOINT — the property
    that makes parquet stats a data-skipping index. Verified from the
    footers with an independent pyarrow read, plus a content checksum
    (clustering must never change the rows)."""
    import pyarrow.parquet as pq

    from cs_5542_lab_6_spark.pipeline.maintenance import (
        _parquet_files,
        cluster_table,
    )

    src = str(tmp_path / "orders_src")
    out = str(tmp_path / "orders_clustered")
    # deliberately scatter the key across many small files
    spark.read.parquet(f"{sf_dir}/orders.parquet").repartition(8).write.parquet(src)

    audit = cluster_table(spark, src, out, ["o_orderdate"], target_file_bytes=8 * 1024)
    assert audit["files_out"] >= 2, audit  # multiple files → skipping is real

    spans = []
    for f in _parquet_files(out):
        meta = pq.ParquetFile(f).metadata
        idx = next(
            i for i in range(meta.num_columns)
            if meta.row_group(0).column(i).path_in_schema == "o_orderdate"
        )
        mins, maxs = [], []
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo, spans  # file key ranges never interleave

    a = sorted(tuple(r) for r in spark.read.parquet(src).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert a == b


def test_zorder_table_narrows_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order clustering must shrink per-file min/max envelopes on BOTH
    interleaved columns (a single-column sort perfects one dimension and
    leaves the other at full width). Measured from parquet footers: the
    mean per-file range fraction on each dimension must be well under
    the ~1.0 a scattered layout shows, and content must be unchanged."""
    import pyarrow.parquet as pq

    from cs_5542_lab_6_spark.pipeline.maintenance import _parquet_files, zorder_table

    src = str(tmp_path / "events_src")
    out = str(tmp_path / "events_z")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.repartition(8).write.parquet(src)

    audit = zorder_table(
        spark, src, out, "user_id", "event_id", target_file_bytes=4 * 1024
    )
    assert audit["files_out"] >= 8, audit

    def mean_range_fraction(path: str, col: str) -> float:
        lo = hi = None
        spans = []
        for f in _parquet_files(path):
            meta = pq.ParquetFile(f).metadata
            idx = next(
                i for i in range(meta.num_columns)
                if meta.row_group(0).column(i).path_in_schema == col
            )
            mins, maxs = [], []
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            fmin, fmax = min(mins), max(maxs)
            spans.append(fmax - fmin)
            lo = fmin if lo is None else min(lo, fmin)
            hi = fmax if hi is None else max(hi, fmax)
        width = (hi - lo) or 1
        return sum(spans) / len(spans) / width

    # scattered baseline: every file spans ~the full domain on both dims
    assert mean_range_fraction(src, "user_id") > 0.9
    assert mean_range_fraction(src, "event_id") > 0.9
    # single-column clustering: perfect on its key, useless on the other
    from cs_5542_lab_6_spark.pipeline.maintenance import cluster_table

    single = str(tmp_path / "events_single")
    cluster_table(spark, src, single, ["user_id"], target_file_bytes=4 * 1024)
    assert mean_range_fraction(single, "event_id") > 0.9
    # z-ordered: BOTH dimensions narrow enough for footer skipping to bite
    # (~1/sqrt(n_files) per dimension on a Morton curve)
    fa = mean_range_fraction(out, "user_id")
    fb = mean_range_fraction(out, "event_id")
    assert fa < 0.6, fa
    assert fb < 0.6, fb

    a = sorted(str(sorted((k, str(v)) for k, v in r.asDict().items()))
               for r in spark.read.parquet(src).collect())
    b = sorted(str(sorted((k, str(v)) for k, v in r.asDict().items()))
               for r in spark.read.parquet(out).collect())
    assert a == b


def test_zorder_handles_nulls_and_degenerate_bounds(spark, tmp_path):
    """Round-6 advice: NULL cluster-key values must scale to bucket 0
    (nulls-first) instead of falling through least()'s null-skipping to
    bucket 65535, and an all-null column must not crash the bounds
    computation with float(None)."""
    from pyspark.sql import functions as F

    from cs_5542_lab_6_spark.pipeline.maintenance import zorder_table, zorder_value

    # NULLs sort with the minimum, not the maximum: the null row's Morton
    # key must equal the a-min row's key contribution, far from a-max's.
    df = spark.range(3).select(
        F.when(F.col("id") == 0, None).otherwise(F.col("id") * 1000).alias("a"),
        F.lit(7).alias("b"),
    )
    keys = df.select(
        "a", zorder_value(F.col("a"), F.col("b"), 1000, 2000, 7, 7).alias("z")
    ).collect()
    by_a = {r["a"]: r["z"] for r in keys}
    assert by_a[None] == by_a[1000] != by_a[2000]

    # all-null column: bounds are (None, None) -> constant bucket, no raise
    src = str(tmp_path / "nulls_src")
    out = str(tmp_path / "nulls_z")
    spark.range(100).select(
        F.lit(None).cast("long").alias("a"), F.col("id").alias("b")
    ).write.parquet(src)
    audit = zorder_table(spark, src, out, "a", "b", target_file_bytes=1024)
    assert audit["files_in"] >= 1
    assert spark.read.parquet(out).count() == 100
