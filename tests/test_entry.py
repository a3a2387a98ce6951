"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 5
    cols = set(df.columns)
    assert {"doc_id", "score"} <= cols
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # query vector is vec_id=0's own embedding → its self-score tops at 1.0
    assert rows[0]["doc_id"] == 0 and abs(rows[0]["score"] - 1.0) < 1e-9


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert qs, "no queries registered"
    assert set(os_) <= set(qs)
