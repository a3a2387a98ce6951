"""Planted-truth winnowing corpus (r15 verdict item 5) — the MOSS
t-guarantee pinned against KNOWN shared spans, mirroring the
test_neardup_corpus.py pattern for the last similarity-shaped family
that was verified only on fixture data.

Winnowing's whole point (Schleimer, Wilkerson & Aiken, SIGMOD 2003) is
the guarantee: any match of at least t = w + k - 1 words between two
documents yields at least one SHARED selected fingerprint, regardless of
where the match sits in either document — while sub-guarantee overlaps
(shorter than t) carry no promise and may legitimately drop. This module
plants shared spans at controlled lengths into otherwise
namespace-disjoint documents, recomputes the full winnowing selection
independently in Python (same token hash, same rightmost-argmin encoding),
and pins:

1. the per-document fingerprint report equals the Python truth EXACTLY
   (positions, counts, checksum, guarantee flag);
2. the t-guarantee: every planted span >= t words shares >= 1 selected
   fingerprint, at DIFFERENT offsets in the two documents (position
   independence — the property positional chunking lacks);
3. the overlap report is exactly the truth thresholded at
   WINNOW_MIN_SHARED shared fingerprints: long spans are found with
   exact n_shared/containment values, guarantee-floor spans (exactly t
   words, 1-2 shared fps) are DESIGNED misses of the >= 3 report
   threshold, sub-guarantee spans (< t words) may drop entirely;
4. full Spark-vs-DuckDB value parity for both winnowing queries on the
   same corpus.

Corpus (doc pairs (p, 100+p), 60 tokens each, namespaced vocabularies so
no non-planted pair shares a single gram):
  long_share  p 0..2   20-word shared span (18 grams) at offset 20 in A,
                       offset 5 in B    -> >= ceil(15/4) = 4 shared fps,
                       always in the overlap report
  floor       p 3..4   exactly t = 6-word span (4 grams = one full
                       window) at offset 25 / 10 -> >= 1 shared fp
                       guaranteed, below the report threshold
  sub         p 5..6   4-word span (2 grams, < t) -> no guarantee
plus 6 disjoint singleton docs and two degenerate docs (2 tokens: zero
grams; 3 tokens: exactly one gram, one clamped window).
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from cs_5542_lab_6_spark.functions.text import HASH_P
from cs_5542_lab_6_spark.operators.textstats import (
    WINNOW_K,
    WINNOW_MIN_SHARED,
    WINNOW_W,
    _WENC,
)
from cs_5542_lab_6_spark.registry import all_oracles, all_queries

from test_oracle_parity import _canon_rows  # rootdir tests/ on sys.path

T_GUARANTEE = WINNOW_W + WINNOW_K - 1  # any match >= this many words is found

LONG = range(0, 3)
FLOOR = range(3, 5)
SUB = range(5, 7)
SPAN_WORDS = {**{p: 20 for p in LONG}, **{p: T_GUARANTEE for p in FLOOR},
              **{p: WINNOW_K + 1 for p in SUB}}
# span offset (token index) differs between the two docs of every pair:
# the guarantee must hold position-independently
OFF_A = {**{p: 20 for p in LONG}, **{p: 25 for p in FLOOR}, **{p: 30 for p in SUB}}
OFF_B = {**{p: 5 for p in LONG}, **{p: 10 for p in FLOOR}, **{p: 12 for p in SUB}}

WINNOW_PARITY = ["doc_winnowing_fingerprints", "doc_winnowing_overlap"]


def _doc_tokens(pair: int, side: str) -> list[str]:
    span = [f"sh{pair}w{i:02d}" for i in range(SPAN_WORDS[pair])]
    off = (OFF_A if side == "a" else OFF_B)[pair]
    own = [f"{side}{pair}w{i:02d}" for i in range(60 - len(span))]
    return own[:off] + span + own[off:]


def _corpus() -> dict[int, list[str]]:
    docs: dict[int, list[str]] = {}
    for p in range(7):
        docs[p] = _doc_tokens(p, "a")
        docs[100 + p] = _doc_tokens(p, "b")
    for s in range(6):
        docs[500 + s] = [f"x{s}w{i:02d}" for i in range(60)]
    docs[900] = ["tinydoc", "twotokens"]          # 0 grams
    docs[901] = ["exactly", "three", "tokens"]    # 1 gram, 1 clamped window
    return docs


def _th(s: str) -> int:
    """Python twin of functions.text.token_hash (first 15 sha256 hex
    chars as int, mod 2^31-1) — 60 bits, exact in Python and Spark."""
    return int(hashlib.sha256(s.encode()).hexdigest()[:15], 16) % HASH_P


def _winnow(toks: list[str]) -> dict:
    """Independent Python replica of winnow_fps_build's selection:
    1-indexed gram positions, per-window rightmost minimal hash via the
    same encoded argmin (hash * _WENC + distance-to-window-end)."""
    if len(toks) >= WINNOW_K:
        g = [
            _th(" ".join(toks[i : i + WINNOW_K]))
            for i in range(len(toks) - WINNOW_K + 1)
        ]
    else:
        g = []
    n = len(g)
    if n == 0:
        return {"n_grams": 0, "sels": [], "fps": []}
    sels: set[int] = set()
    for j in range(1, max(n - WINNOW_W + 1, 1) + 1):
        wend = min(j + WINNOW_W - 1, n)
        m = min(g[p - 1] * _WENC + (wend - p) for p in range(j, wend + 1))
        sels.add(j + (wend - j) - (m % _WENC))
    sl = sorted(sels)
    return {"n_grams": n, "sels": sl, "fps": [g[p - 1] for p in sl]}


@pytest.fixture(scope="module")
def winnow_dir(spark, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("winnow"))
    rows = [
        (doc_id, " ".join(toks), "en", "winnow", len(" ".join(toks)))
        for doc_id, toks in sorted(_corpus().items())
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


@pytest.fixture(scope="module")
def truth() -> dict:
    """Per-doc winnowing selections plus all-pairs shared-fingerprint
    counts, computed without the engine."""
    sel = {d: _winnow(t) for d, t in _corpus().items()}
    ids = sorted(sel)
    shared = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            n = len(set(sel[a]["fps"]) & set(sel[b]["fps"]))
            if n:
                shared[(a, b)] = n
    return {"sel": sel, "shared": shared}


@pytest.fixture(scope="module")
def winnow_oracle(winnow_dir):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{winnow_dir}/documents.parquet/*.parquet'"
    )
    yield con
    con.close()


def test_truth_lands_where_the_design_needs_it(truth):
    """Self-check of the planted design: long spans clear the report
    threshold with the margin the window math promises, floor spans sit
    BETWEEN the guarantee (>= 1) and the threshold (< 3), and no
    non-planted pair shares anything (precision is exact, not vacuous)."""
    shared = truth["shared"]
    for p in LONG:
        # 18 shared grams, interior full windows only: a selected fp can
        # satisfy at most WINNOW_W consecutive windows, so the span
        # yields >= ceil((18 - w + 1) / w) = 4 distinct shared fps
        g_span = SPAN_WORDS[p] - WINNOW_K + 1
        floor_fps = math.ceil((g_span - WINNOW_W + 1) / WINNOW_W)
        assert floor_fps >= WINNOW_MIN_SHARED
        assert shared.get((p, 100 + p), 0) >= floor_fps, (p, shared.get((p, 100 + p)))
    for p in FLOOR:
        # exactly one full shared window -> t-guarantee gives >= 1; the
        # fixed-hash corpus lands it below the report threshold, which
        # is exactly the designed-miss band this tier exists to occupy
        assert 1 <= shared.get((p, 100 + p), 0) < WINNOW_MIN_SHARED
    planted = {(p, 100 + p) for p in range(7)}
    for pair, n in shared.items():
        assert pair in planted, f"non-planted pair shares fingerprints: {pair} {n}"


def test_fingerprint_report_equals_python_truth(spark, winnow_dir, truth):
    """doc_winnowing_fingerprints must equal the independent Python
    winnowing row-for-row: counts, density, checksum, guarantee flag —
    including the zero-gram and single-gram degenerate docs."""
    got = {
        r["doc_id"]: r
        for r in all_queries()["doc_winnowing_fingerprints"](
            spark, winnow_dir
        ).collect()
    }
    assert set(got) == set(truth["sel"])
    for doc_id, s in truth["sel"].items():
        r = got[doc_id]
        n = s["n_grams"]
        n_windows = 0 if n == 0 else max(n - WINNOW_W + 1, 1)
        assert r["n_grams"] == n, doc_id
        assert r["n_windows"] == n_windows, doc_id
        assert r["n_selected"] == len(s["sels"]), doc_id
        want_density = (
            0 if n == 0 else math.floor(len(s["sels"]) * 1_000_000 / n_windows)
        )
        assert r["density_millionths"] == want_density, doc_id
        assert r["fp_checksum"] == sum(s["fps"]), doc_id
        gaps = [b - a for a, b in zip(s["sels"], s["sels"][1:])]
        assert r["guarantee_ok"] == (max(gaps, default=0) <= WINNOW_W), doc_id
        assert r["guarantee_ok"] is True, doc_id  # winnowing's density law


def test_t_guarantee_holds_position_independently(truth):
    """The t-guarantee itself: every planted span of >= w+k-1 words
    yields >= 1 shared selected fingerprint even though the span sits at
    DIFFERENT token offsets in the two documents — and the shared
    fingerprints are span grams, not boundary accidents."""
    for p in list(LONG) + list(FLOOR):
        assert OFF_A[p] != OFF_B[p]  # the position-independence premise
        a, b = truth["sel"][p], truth["sel"][100 + p]
        got = set(a["fps"]) & set(b["fps"])
        assert got, f"t-guarantee violated for pair {p}"
        span_grams = {
            _th(
                " ".join(
                    [f"sh{p}w{i + d:02d}" for d in range(WINNOW_K)]
                )
            )
            for i in range(SPAN_WORDS[p] - WINNOW_K + 1)
        }
        assert got <= span_grams, f"shared fps outside the planted span: {p}"


def test_overlap_report_is_truth_thresholded_exactly(spark, winnow_dir, truth):
    """The overlap report must contain EXACTLY the pairs whose true
    shared-fingerprint count clears WINNOW_MIN_SHARED, with exact
    n_shared / nfp / containment values — so the long spans are found
    (recall 1.0 above the threshold), the guarantee-floor spans miss the
    REPORT (>= 1 shared fp but < 3: the threshold working as designed,
    not a detection failure), and nothing non-planted appears
    (precision 1.0)."""
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in all_queries()["doc_winnowing_overlap"](spark, winnow_dir).collect()
    }
    want = {
        pair: n for pair, n in truth["shared"].items() if n >= WINNOW_MIN_SHARED
    }
    assert set(got) == set(want)
    assert set(want) == {(p, 100 + p) for p in LONG}  # exactly the long tier
    for pair, n in want.items():
        r = got[pair]
        nfp_a = len(set(truth["sel"][pair[0]]["fps"]))
        nfp_b = len(set(truth["sel"][pair[1]]["fps"]))
        assert r["n_shared"] == n
        assert (r["nfp_a"], r["nfp_b"]) == (nfp_a, nfp_b)
        assert r["containment"] == round(n / min(nfp_a, nfp_b), 4)
    # the designed misses, stated as such: floor pairs DO share selected
    # fingerprints (the guarantee) yet are absent from the report
    for p in FLOOR:
        assert truth["shared"].get((p, 100 + p), 0) >= 1
        assert (p, 100 + p) not in got


@pytest.mark.parametrize("name", WINNOW_PARITY)
def test_winnowing_matches_oracle(spark, winnow_dir, winnow_oracle, name):
    """Full Spark-vs-DuckDB value parity for both winnowing queries on
    the planted corpus."""
    sdf = all_queries()[name](spark, winnow_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]
    rel = winnow_oracle.sql(all_oracles()[name])
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
