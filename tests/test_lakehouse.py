"""Semantic invariants for the round-9 lakehouse / record-linkage
family — properties the DuckDB oracles state only implicitly:

- SCD2: per customer the version chain is gapless, intervals abut
  (valid_to == next valid_from), exactly one open interval, and
  consecutive versions always CHANGE the tracked attribute.
- Skyline: the two-phase decomposition satisfies the dominance
  definition directly — no output row dominates another output row,
  and every excluded part is dominated by some output row.
- Bloom: membership never loses a true key (no false negatives — the
  property that makes Bloom pruning sound), and the bit set is bounded
  by k * n_keys and by m.
- SNM: verified pairs are a SUBSET of the exact all-pairs Jaccard
  output at the same threshold (blocking bounds recall, never
  precision).
- Fuzzy join: the length-band prefilter is pure pruning — removing it
  does not change the match set.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cs_5542_lab_6_spark.registry import all_queries


def test_scd2_interval_chain(spark, sf_dir):
    rows = (
        all_queries()["orders_scd2_dimension"](spark, sf_dir)
        .orderBy("o_custkey", "version")
        .collect()
    )
    assert rows
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    for cust, chain in by_cust.items():
        assert [r["version"] for r in chain] == list(range(1, len(chain) + 1)), cust
        assert sum(r["is_current"] for r in chain) == 1, cust
        assert chain[-1]["is_current"] and chain[-1]["valid_to"] is None, cust
        for prev, nxt in zip(chain, chain[1:]):
            assert prev["valid_to"] == nxt["valid_from"], cust
            assert prev["priority"] != nxt["priority"], cust


def _dominates(a, b) -> bool:
    """True if part-row a dominates b (<= price, >= size, one strict)."""
    return (
        a["p_retailprice"] <= b["p_retailprice"]
        and a["p_size"] >= b["p_size"]
        and (a["p_retailprice"] < b["p_retailprice"] or a["p_size"] > b["p_size"])
    )


def test_skyline_matches_dominance_definition(spark, sf_dir):
    from cs_5542_lab_6_spark.sources import load_table

    sky = all_queries()["skyline_parts"](spark, sf_dir).collect()
    assert sky
    parts = (
        load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_size", "p_retailprice")
        .collect()
    )
    sky_keys = {r["p_partkey"] for r in sky}
    for a in sky:
        for b in sky:
            assert not _dominates(a, b), (a, b)
    for p in parts:
        if p["p_partkey"] not in sky_keys:
            assert any(_dominates(s, p) for s in sky), p


def test_bloom_soundness_and_size(spark, sf_dir):
    from cs_5542_lab_6_spark.operators.lakehouse import BLOOM_K, BLOOM_M

    row = all_queries()["supplier_bloom_semi_join"](spark, sf_dir).collect()[0]
    assert row["no_false_negatives"] is True
    assert row["n_bloom_pass_keys"] >= row["n_exact_keys"]
    assert (
        row["n_bloom_pass_keys"] - row["n_exact_keys"] == row["n_false_positives"]
    )
    assert row["n_bits_set"] <= min(BLOOM_M, BLOOM_K * row["n_build_keys"])


def test_snm_pairs_subset_of_exact_jaccard(spark, sf_dir):
    qs = all_queries()
    snm = {
        (r["doc_a"], r["doc_b"])
        for r in qs["dedup_sorted_neighborhood"](spark, sf_dir).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in qs["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    assert snm, "SNM found no candidate pairs on the fixture"
    assert snm <= exact


def test_fuzzy_length_band_is_pure_pruning(spark, sf_dir):
    from cs_5542_lab_6_spark.operators.dedup import FUZZY_MAX_EDIT

    banded = all_queries()["part_fuzzy_matches"](spark, sf_dir)
    rows = banded.collect()
    assert all(r["edit_dist"] <= FUZZY_MAX_EDIT for r in rows)
    # re-run without the band: same pairs (lev <= 2 implies |dlen| <= 2)
    from cs_5542_lab_6_spark.sources import load_table as lt

    part = lt(spark, sf_dir, "part")
    a, b = part.alias("a"), part.alias("b")
    lev = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    unbanded = (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .filter(lev <= FUZZY_MAX_EDIT)
        .select(
            F.col("a.p_partkey").alias("a_partkey"),
            F.col("b.p_partkey").alias("b_partkey"),
        )
        .collect()
    )
    assert {(r["a_partkey"], r["b_partkey"]) for r in rows} == {
        (r["a_partkey"], r["b_partkey"]) for r in unbanded
    }
