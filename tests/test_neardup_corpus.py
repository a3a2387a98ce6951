"""Planted near-duplicate truth corpus (r14 verdict item 2) — the
text-dedup twin of test_clustered_embeddings.py / test_realistic_corpus.py.

The driver fixture's near-dups are fixture accidents; no test pinned the
text-dedup family's recall/precision against KNOWN ground truth the way
ann_recall_eval does for ANN. This module plants mutated document pairs
at controlled edit rates (token substitutions at known positions, token
reorders, prefix breaks) with namespaced vocabularies so the TRUE
shingle-Jaccard of every pair — planted or cross — is computable exactly
in Python, then verifies the four blocking families two ways:

1. recall/precision against the planted truth, per mutation tier, with
   the method-specific misses the algorithms GUARANTEE (SNM misses
   prefix-broken pairs, SimHash finds reorders that shingling can't);
2. full Spark-vs-DuckDB value parity on the same corpus.

Tiers (base doc b -> variant doc 1000+b, 60 tokens each):
  exact        b 0..3    identical copy                    j = 1.0
  vlow         b 4..11   1 token replaced (pos 30)         j ~ 0.90
  low          b 12..15  3 tokens replaced (10, 25, 40)    j ~ 0.73
  mid          b 16..19  9 tokens replaced (stride 6)      j ~ 0.37
  far          b 20..21  29 tokens replaced (every even)   j ~ 0.0
  prefix_break b 22..23  vlow + FIRST token replaced       j ~ 0.87
  reorder      b 24..25  same tokens, tail reversed        j ~ 0.0
plus 16 singleton docs on their own vocab namespaces (no near-dup).
"""

from __future__ import annotations

import duckdb
import pytest

from cs_5542_lab_6_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    MINHASH_VERIFY_THRESHOLD,
    SHINGLE_K,
    SNM_JACCARD,
)
from cs_5542_lab_6_spark.registry import all_oracles, all_queries

from test_oracle_parity import _canon_rows  # rootdir tests/ on sys.path

N_BASE = 26
N_SINGLETON = 16
TIERS = {
    "exact": range(0, 4),
    "vlow": range(4, 12),
    "low": range(12, 16),
    "mid": range(16, 20),
    "far": range(20, 22),
    "prefix_break": range(22, 24),
    "reorder": range(24, 26),
}

NEARDUP_PARITY = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_sorted_neighborhood",
    "dedup_clusters",
    "dedup_clusters_star",
    "dedup_lsh_bucket_audit",
    "dedup_method_eval",
    "dedup_rate_by_source",
    "dedup_incremental",
]


def _base_tokens(b: int) -> list[str]:
    # token 0 is a >=16-char head so base and variant share the SNM
    # block key (substr(lower(text),1,16)) unless the tier breaks it
    return [f"docbase{b:04d}head"] + [f"b{b}w{i:02d}" for i in range(1, 60)]


def _variant_tokens(b: int) -> list[str]:
    toks = list(_base_tokens(b))
    if b in TIERS["exact"]:
        pass
    elif b in TIERS["vlow"]:
        toks[30] = f"b{b}x30"
    elif b in TIERS["low"]:
        for p in (10, 25, 40):
            toks[p] = f"b{b}x{p}"
    elif b in TIERS["mid"]:
        for p in range(8, 60, 6):
            toks[p] = f"b{b}x{p}"
    elif b in TIERS["far"]:
        for p in range(2, 60, 2):
            toks[p] = f"b{b}x{p}"
    elif b in TIERS["prefix_break"]:
        toks[0] = f"b{b}xheadzzzzzzzzzz"
        toks[30] = f"b{b}x30"
    elif b in TIERS["reorder"]:
        toks = toks[:2] + list(reversed(toks[2:]))
    return toks


def _shingles(toks: list[str]) -> set[str]:
    return {
        " ".join(toks[i : i + SHINGLE_K])
        for i in range(len(toks) - SHINGLE_K + 1)
    }


def _jaccard(a: set[str], b: set[str]) -> float:
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def _corpus() -> dict[int, list[str]]:
    docs = {b: _base_tokens(b) for b in range(N_BASE)}
    docs.update({1000 + b: _variant_tokens(b) for b in range(N_BASE)})
    for k in range(N_SINGLETON):
        docs[500 + k] = [f"single{k:04d}head"] + [
            f"s{k}w{i:02d}" for i in range(1, 60)
        ]
    return docs


@pytest.fixture(scope="module")
def neardup_dir(spark, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("neardup"))
    rows = [
        (doc_id, " ".join(toks), "en", "neardup", len(" ".join(toks)))
        for doc_id, toks in sorted(_corpus().items())
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


@pytest.fixture(scope="module")
def truth() -> dict:
    """Exact all-pairs shingle Jaccard over the planted corpus, computed
    independently of any engine, plus the planted pair->tier map."""
    docs = {k: _shingles(t) for k, t in _corpus().items()}
    ids = sorted(docs)
    jac = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            j = _jaccard(docs[a], docs[b])
            if j > 0:
                jac[(a, b)] = j
    tier_of = {}
    for tier, rng in TIERS.items():
        for b in rng:
            tier_of[(b, 1000 + b)] = tier
    return {"jaccard": jac, "tier_of": tier_of}


@pytest.fixture(scope="module")
def neardup_oracle(neardup_dir):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{neardup_dir}/documents.parquet/*.parquet'"
    )
    yield con
    con.close()


def test_truth_tiers_are_where_the_thresholds_need_them(truth):
    """Self-check of the planted design: each tier's true Jaccard lands
    in the band that makes the method assertions meaningful, and NO
    cross-document (non-planted) pair reaches the lowest threshold —
    precision against planted truth is therefore exact, not vacuous."""
    jac, tier_of = truth["jaccard"], truth["tier_of"]
    for pair, tier in tier_of.items():
        j = jac.get(pair, 0.0)
        if tier == "exact":
            assert j == 1.0
        elif tier == "vlow":
            assert 0.85 <= j < 1.0
        elif tier == "low":
            assert 0.6 <= j < 0.85
        elif tier == "mid":
            assert JACCARD_THRESHOLD + 0.05 <= j < MINHASH_VERIFY_THRESHOLD
        elif tier in ("far", "reorder"):
            assert j < JACCARD_THRESHOLD
        elif tier == "prefix_break":
            assert 0.8 <= j < 1.0
    planted = set(tier_of)
    for pair, j in jac.items():
        if pair not in planted:
            assert j < JACCARD_THRESHOLD, (pair, j)


def test_ngram_jaccard_is_exact_on_planted_truth(spark, neardup_dir, truth):
    """The exact inverted-index pass must report EXACTLY the pairs whose
    true Jaccard clears the threshold — recall 1.0 and precision 1.0
    against planted truth, values equal to the Python computation."""
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in all_queries()["dedup_ngram_jaccard"](spark, neardup_dir).collect()
    }
    want = {
        pair: round(j, 4)
        for pair, j in truth["jaccard"].items()
        if j >= JACCARD_THRESHOLD
    }
    assert got == want


def test_minhash_lsh_recall_and_precision_on_planted_truth(
    spark, neardup_dir, truth
):
    """MinHash-LSH against planted truth: precision is EXACT (the verify
    join recomputes true Jaccard, so every reported pair must clear the
    verify threshold with the Python-computed value); recall follows the
    banding math, not wishful thinking: EXACT duplicates (j = 1 —
    every band identical by construction) must ALL surface, the j >=
    0.85 tiers (P(candidate) ~ 0.97-0.99 per pair; this fixed corpus
    deterministically lands 12/14) must clear a 0.8 floor, and the low
    tier (j ~ 0.73, P(candidate) ~ 0.74) documents the designed decay.
    Every surfaced pair is value-verified regardless of tier."""
    jac, tier_of = truth["jaccard"], truth["tier_of"]
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in all_queries()["dedup_minhash_lsh"](spark, neardup_dir).collect()
    }
    for pair, j in got.items():
        assert pair in jac and jac[pair] >= MINHASH_VERIFY_THRESHOLD
        assert j == round(jac[pair], 4)
    for b in TIERS["exact"]:
        assert (b, 1000 + b) in got
    high = [p for p, t in tier_of.items() if jac.get(p, 0) >= 0.85]
    found_high = sum(p in got for p in high)
    assert high and found_high >= 0.8 * len(high), (
        found_high,
        len(high),
        [p for p in high if p not in got],
    )
    low = [p for p, t in tier_of.items() if t == "low"]
    found_low = sum(p in got for p in low)
    # banding P ~ 0.74 at j ~ 0.73: on this fixed corpus the hashes are
    # deterministic — at least half must surface, and every surfaced one
    # was value-verified above
    assert found_low >= len(low) // 2, (found_low, len(low))


def test_simhash_finds_reorders_and_exacts(spark, neardup_dir, truth):
    """SimHash semantics the shingle methods can't express: the signature
    is ORDER-INVARIANT, so token-reordered variants (true shingle
    Jaccard ~ 0, invisible to every Jaccard pass) collide at Hamming 0,
    as do exact copies; and every reported pair is a PLANTED pair — on
    namespaced vocabularies a cross-document band collision must not
    survive the exact Hamming verification."""
    tier_of = truth["tier_of"]
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in all_queries()["dedup_simhash"](spark, neardup_dir).collect()
    }
    for b in TIERS["exact"]:
        assert got.get((b, 1000 + b)) == 0
    for b in TIERS["reorder"]:
        assert got.get((b, 1000 + b)) == 0
    assert set(got) <= set(tier_of), set(got) - set(tier_of)


def test_snm_finds_block_preserving_pairs_and_misses_broken_prefixes(
    spark, neardup_dir, truth
):
    """Sorted-neighborhood against planted truth: every planted pair that
    (a) shares the 16-char block key and (b) clears the verify threshold
    is found (base and variant are alone in their block, hence adjacent
    in sort order); prefix-BROKEN pairs are MISSED by construction — the
    documented blocking limitation, here pinned as a guarantee rather
    than left as an unstated gap (dedup_ngram_jaccard still finds them).
    Precision is exact: reported pairs ⊆ true-Jaccard-≥-threshold pairs
    with matching values."""
    jac, tier_of = truth["jaccard"], truth["tier_of"]
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in all_queries()["dedup_sorted_neighborhood"](
            spark, neardup_dir
        ).collect()
    }
    for pair, j in got.items():
        assert pair in jac and jac[pair] >= SNM_JACCARD
        assert j == round(jac[pair], 4)
    for pair, tier in tier_of.items():
        shares_block = tier != "prefix_break"
        verifiable = jac.get(pair, 0.0) >= SNM_JACCARD
        if shares_block and verifiable:
            assert pair in got, (pair, tier)
        if tier == "prefix_break":
            assert pair not in got, (pair, tier)


def test_incremental_screen_is_precise_on_coresident_pairs(spark, neardup_dir, truth):
    """Planted ids differ by exactly 1000 ≡ 0 (mod NEW_BATCH_MOD), so
    every planted pair is CO-RESIDENT: both sides land in the same half
    of the batch/index split and the screen can never see the pair.
    Therefore every verdict must be 'unique' — any 'duplicate' would be
    an invented cross-namespace match (precision failure). The test also
    documents the operational hazard itself: an incremental screen only
    catches duplicates that ARRIVE after their twin is indexed; batch
    self-dedup is dedup_ngram_jaccard's job (pinned exact above)."""
    from cs_5542_lab_6_spark.operators.dedup import NEW_BATCH_MOD

    for a, b in truth["tier_of"]:
        assert (b - a) % NEW_BATCH_MOD == 0  # the co-residency premise
    rows = all_queries()["dedup_incremental"](spark, neardup_dir).collect()
    new_ids = {k for k in _corpus() if k % NEW_BATCH_MOD == 0}
    assert {r["new_doc_id"] for r in rows} == new_ids
    for r in rows:
        assert r["verdict"] == "unique", (r["new_doc_id"], r["match_doc_id"])
        assert r["match_doc_id"] is None


def test_contamination_scan_is_exact_on_planted_truth(spark, neardup_dir):
    """Decontamination against planted truth: the sha-hash split is
    replicated in Python (sha256('split|'||id)[:15] % 100), so the exact
    expected output — every test-split doc's best train-split doc by
    shared distinct shingles, flagged at the threshold — is computable
    from scratch. On this corpus that covers all the interesting cases
    the fixture can't plant: straddling pairs in three mutation tiers
    get flagged with exact counts, a test doc whose only near-dup sits
    in the VALID split stays clean (decontamination screens train only),
    the reorder pair shares almost nothing, and no cross-namespace flag
    can appear."""
    import hashlib

    from cs_5542_lab_6_spark.operators.dedup import CONTAMINATION_MIN_SHARED

    def split_of(doc_id: int) -> str:
        b = int(
            hashlib.sha256(f"split|{doc_id}".encode()).hexdigest()[:15], 16
        ) % 100
        return "train" if b < 80 else ("valid" if b < 90 else "test")

    sh = {k: _shingles(t) for k, t in _corpus().items()}
    train = [k for k in sh if split_of(k) == "train"]
    tests = [k for k in sh if split_of(k) == "test"]
    want = {}
    for t in tests:
        best, bn = None, 0
        for tr in sorted(train):
            n = len(sh[t] & sh[tr])
            if n > bn:
                best, bn = tr, n
        if best is not None and bn >= CONTAMINATION_MIN_SHARED:
            want[t] = (
                best,
                bn,
                len(sh[t]),
                round(bn / len(sh[t]), 4),
            )
    got = {
        r["test_doc_id"]: (
            r["train_doc_id"],
            r["n_shared"],
            r["n_test_shingles"],
            r["shared_frac"],
        )
        for r in all_queries()["contamination_scan"](spark, neardup_dir).collect()
    }
    assert got == want
    assert want, "the planted corpus must produce at least one flag"
    # and at least one test doc with a planted near-dup must stay clean
    # because its counterpart landed in valid, not train
    clean_by_valid = [
        t for t in tests
        if t not in want
        and any(len(sh[t] & sh[o]) >= CONTAMINATION_MIN_SHARED for o in sh
                if o != t and split_of(o) == "valid")
    ]
    assert clean_by_valid


# ---------------------------------------------------------------------------
# Arrival-split corpus: planted pairs deliberately STRADDLE the
# batch/index cut, pinning the positive (recall) side of the incremental
# screen and the streaming admission path against the same truth.
# ---------------------------------------------------------------------------

INCR_TIER_OF_BASE = {1: 0, 2: 0, 3: 1, 4: 1, 5: 3, 6: 3, 7: 9, 8: 29}
# base id k (index side, k % 10 != 0) -> number of replaced tokens in
# its arriving variant id 10k (new side, 10k % 10 == 0)


def _incr_corpus() -> dict[int, list[str]]:
    docs = {}
    for k, n_mut in INCR_TIER_OF_BASE.items():
        base = [f"incrbase{k:04d}head"] + [f"i{k}w{j:02d}" for j in range(1, 60)]
        var = list(base)
        # deterministic evenly-spread replacement positions
        if n_mut:
            step = max(1, 57 // n_mut)
            pos = list(range(2, 60, step))[:n_mut]
            for p in pos:
                var[p] = f"i{k}x{p:02d}"
        docs[k] = base
        docs[10 * k] = var
    for s in (11, 12, 13):  # index-side singletons
        docs[s] = [f"incrsingle{s:04d}head"] + [
            f"s{s}w{j:02d}" for j in range(1, 60)
        ]
    for s in (100, 110):  # arriving docs with no counterpart anywhere
        docs[s] = [f"incrnovel{s:04d}head"] + [
            f"n{s}w{j:02d}" for j in range(1, 60)
        ]
    return docs


@pytest.fixture(scope="module")
def incr_dir(spark, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("neardup_incr"))
    rows = [
        (doc_id, " ".join(toks), "en", "neardup", len(" ".join(toks)))
        for doc_id, toks in sorted(_incr_corpus().items())
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def _incr_truth() -> dict[int, tuple[int | None, float]]:
    """Expected (match, jaccard) per ARRIVING doc, computed from scratch:
    best index-side doc by exact shingle Jaccard >= the threshold, ties
    by doc_id — exactly dedup_incremental's published contract."""
    from cs_5542_lab_6_spark.operators.dedup import (
        JACCARD_THRESHOLD as TH,
        NEW_BATCH_MOD as MOD,
    )

    sh = {k: _shingles(t) for k, t in _incr_corpus().items()}
    new = sorted(k for k in sh if k % MOD == 0)
    idx = sorted(k for k in sh if k % MOD != 0)
    out: dict[int, tuple[int | None, float]] = {}
    for n in new:
        best, bj = None, 0.0
        for i in idx:
            j = _jaccard(sh[n], sh[i])
            if j >= TH and (j > bj or (j == bj and best is not None and i < best)):
                best, bj = i, j
        out[n] = (best, round(bj, 4))
    return out


def test_incremental_screen_recall_on_arrival_split_pairs(spark, incr_dir):
    """The positive side the co-residency test can't show: arriving
    variants whose bases sit in the standing index get verdict
    'duplicate' with exactly the Python-computed best match and Jaccard
    (exact/vlow/low/mid tiers), the 29-substitution variant and the two
    novel arrivals come back 'unique', and nothing else arrives."""
    truth = _incr_truth()
    rows = {
        r["new_doc_id"]: r
        for r in all_queries()["dedup_incremental"](spark, incr_dir).collect()
    }
    assert set(rows) == set(truth)
    for n, (match, j) in truth.items():
        r = rows[n]
        if match is None:
            assert r["verdict"] == "unique" and r["match_doc_id"] is None, n
        else:
            assert r["verdict"] == "duplicate", (n, match)
            assert r["match_doc_id"] == match, (n, r["match_doc_id"], match)
            assert r["jaccard"] == j, (n, r["jaccard"], j)
    # the design planted both outcomes: some duplicates, some uniques
    verdicts = {r["verdict"] for r in rows.values()}
    assert verdicts == {"duplicate", "unique"}


def test_streaming_admission_matches_incremental_truth(spark, incr_dir, tmp_path):
    """The streaming admission path (micro-batch screen against the
    standing shingle index) must reach the SAME verdicts as the batch
    screen on the arrival-split planted truth — union of per-batch
    verdict files == dedup_incremental's rows, value for value."""
    import os

    from cs_5542_lab_6_spark.streaming.stream import dedup_admission_stream_run

    wd = str(tmp_path / "adm_truth")
    os.makedirs(wd)
    n_batches = dedup_admission_stream_run(spark, incr_dir, wd)
    assert n_batches >= 1
    streamed = sorted(
        map(tuple, spark.read.parquet(f"{wd}/verdicts/b*")
            .select("new_doc_id", "match_doc_id", "jaccard", "verdict")
            .collect())
    )
    batch = sorted(
        map(tuple, all_queries()["dedup_incremental"](spark, incr_dir)
            .select("new_doc_id", "match_doc_id", "jaccard", "verdict")
            .collect())
    )
    assert streamed == batch and streamed


def test_clusters_never_merge_across_planted_groups(spark, neardup_dir):
    """Connected components over the LSH pairs on planted truth: every
    component is exactly one {base, variant} pair (cluster_id = the
    base doc_id, 2 members) — the namespaced vocabularies make ANY
    larger or mixed component a correctness bug in the pair generation
    or the contraction, not data noise."""
    rows = all_queries()["dedup_clusters"](spark, neardup_dir).collect()
    assert rows
    for r in rows:
        b = r["cluster_id"]
        assert r["n_members"] == 2, (b, r["member_ids"])
        assert r["member_ids"] == f"{b},{1000 + b}", r["member_ids"]


def test_method_eval_scores_follow_the_planted_design(spark, neardup_dir, truth):
    """dedup_method_eval against planted truth: the Jaccard-truth frame
    credits and debits each family exactly as designed — MinHash and SNM
    verify with Jaccard so their precision is 1.0; SimHash's precision
    is < 1.0 HERE precisely because it finds the reorder pairs (true
    near-dups with shingle Jaccard ~ 0, outside the Jaccard truth list)
    — the eval frame UNDERCREDITS order-invariant detection, which this
    pin records rather than hides; MinHash recall is < 1.0 because the
    mid tier sits above the truth threshold but below its verify bar."""
    jac = truth["jaccard"]
    n_truth_expected = sum(j >= JACCARD_THRESHOLD for j in jac.values())
    rows = {r["method"]: r for r in all_queries()["dedup_method_eval"](
        spark, neardup_dir
    ).collect()}
    assert set(rows) == {"minhash_lsh", "simhash", "sorted_neighborhood"}
    for r in rows.values():
        assert r["n_truth"] == n_truth_expected
    assert rows["minhash_lsh"]["precision"] == 1.0
    assert rows["sorted_neighborhood"]["precision"] == 1.0
    assert rows["simhash"]["precision"] < 1.0  # the 2 reorder pairs
    assert (
        rows["simhash"]["n_pred"] - rows["simhash"]["tp"] >= len(TIERS["reorder"])
    )
    assert rows["minhash_lsh"]["recall"] < 1.0  # mid tier below verify bar
    assert rows["minhash_lsh"]["recall"] > 0.5


@pytest.mark.parametrize("name", NEARDUP_PARITY)
def test_neardup_matches_oracle(spark, neardup_dir, neardup_oracle, name):
    """Full Spark-vs-DuckDB value parity for the dedup family on the
    planted corpus — the two-sided pattern of
    test_clustered_embeddings.py applied to text dedup."""
    sdf = all_queries()[name](spark, neardup_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]
    rel = neardup_oracle.sql(all_oracles()[name])
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


# --- the arrival-cut tie case (r15 verdict item 7) --------------------------
# The hazard this module documented — an incremental screen's verdict
# depends on which side of the batch cut a duplicate lands — is INHERENT
# to the screen's published contract, not a fixable rule: the verdict
# union must be invariant to the micro-batch split (oracle-equivalent to
# the one-shot screen for ANY n_files), which forces every batch to
# screen against the same standing-index snapshot and nothing else. Two
# duplicates that both land in the arrival cut are therefore BOTH
# 'unique' and BOTH admitted — even when one was admitted in an earlier
# micro-batch — and de-duplicating the admitted set itself is the
# separate batch pass (dedup_ngram_jaccard over the same corpus). The
# fixture below plants both tie shapes and pins that behavior exactly.


def _tie_corpus() -> dict[int, list[str]]:
    def doc(ns: str) -> list[str]:
        return [f"{ns}head{0:04d}"] + [f"{ns}w{j:02d}" for j in range(1, 60)]

    docs = {i: doc(f"tidx{i}") for i in (1, 2, 3)}  # standing index side
    # cross-batch twins: with n_files=3, doc 30 -> arrival group 0,
    # doc 40 -> group 1 (g = doc_id/10 % 3), so the identical pair is
    # split across two sequential micro-batches
    docs[30] = doc("tw1")
    docs[40] = doc("tw1")
    # same-batch twins: docs 60 and 90 both land in group 0
    docs[60] = doc("tw2")
    docs[90] = doc("tw2")
    docs[50] = doc("tnov")  # group 2: a genuinely novel singleton
    return docs


@pytest.fixture(scope="module")
def tie_dir(spark, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("neardup_tie"))
    rows = [
        (doc_id, " ".join(toks), "en", "neardup", len(" ".join(toks)))
        for doc_id, toks in sorted(_tie_corpus().items())
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_arrival_cut_tie_case_is_snapshot_screened(spark, tie_dir, tmp_path):
    """Degenerate-corner pin of the inherent arrival-order hazard: exact
    duplicates that BOTH arrive (none of them in the standing index) are
    all 'unique' and all admitted — in the one-shot screen AND in the
    streaming run, including the pair split across micro-batches where
    the first twin's shingles already sit in index_delta when the second
    twin is screened. The remedy is stated alongside: the batch pass
    over the same corpus finds exactly the planted twin pairs at
    Jaccard 1.0."""
    import os

    from cs_5542_lab_6_spark.operators.dedup import NEW_BATCH_MOD
    from cs_5542_lab_6_spark.streaming.stream import dedup_admission_stream_run

    arrivals = {d for d in _tie_corpus() if d % NEW_BATCH_MOD == 0}
    assert arrivals == {30, 40, 50, 60, 90}
    # with n_files=3: group 0 = {30, 60, 90}, group 1 = {40}, group 2 = {50}
    group = {d: (d // NEW_BATCH_MOD) % 3 for d in arrivals}
    assert group == {30: 0, 60: 0, 90: 0, 40: 1, 50: 2}

    # one-shot screen: every arriving doc is 'unique'
    rows = {
        r["new_doc_id"]: r
        for r in all_queries()["dedup_incremental"](spark, tie_dir).collect()
    }
    assert set(rows) == arrivals
    for r in rows.values():
        assert r["verdict"] == "unique" and r["match_doc_id"] is None

    # streaming run, one file per micro-batch in group order
    wd = str(tmp_path / "tie_adm")
    os.makedirs(wd)
    n_batches = dedup_admission_stream_run(spark, tie_dir, wd, n_files=3)
    assert n_batches == 3
    by_batch = {
        k: {
            r["new_doc_id"]: r
            for r in spark.read.parquet(f"{wd}/verdicts/b{k}").collect()
        }
        for k in range(3)
    }
    assert set(by_batch[0]) == {30, 60, 90}
    assert set(by_batch[1]) == {40}
    assert set(by_batch[2]) == {50}
    # batch 0 admitted doc 30 into the index delta...
    delta0 = {
        r["doc_id"]
        for r in spark.read.parquet(f"{wd}/index_delta/b0").collect()
    }
    assert {30, 60, 90} <= delta0
    # ...and batch 1 still admits the identical doc 40: the screen reads
    # the standing snapshot, never earlier batches' deltas — the
    # batching-invariance contract, pinned as behavior
    assert by_batch[1][40]["verdict"] == "unique"
    for k, docs_k in by_batch.items():
        for r in docs_k.values():
            assert r["verdict"] == "unique", (k, r)
    admitted = set().union(
        *(
            {
                r["doc_id"]
                for r in spark.read.parquet(f"{wd}/index_delta/b{k}").collect()
            }
            for k in range(3)
        )
    )
    assert admitted == arrivals  # the double-admission, stated exactly

    # the documented remedy: the batch self-dedup pass over the same
    # corpus reports exactly the planted twin pairs, at Jaccard 1.0
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in all_queries()["dedup_ngram_jaccard"](spark, tie_dir).collect()
    }
    assert pairs == {(30, 40): 1.0, (60, 90): 1.0}
