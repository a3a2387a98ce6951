"""JSONL/CSV ingestion: declared schemas, corrupt-row quarantine, and the
clean/quarantine fork (P7's error-row tolerance generalized to raw file
drops)."""

from __future__ import annotations

from pyspark.sql import types as T

from cs_5542_lab_6_spark.sources.files import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    split_corrupt,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

JSONL = """\
{"doc_id": 1, "text": "alpha beta", "lang": "en"}
{"doc_id": 2, "text": "gamma", "lang": "de"}
this line is not json at all
{"doc_id": "not-a-number", "text": "broken type", "lang": "en"}
{"doc_id": 5, "text": "delta epsilon", "lang": "fr"}
"""

CSV = """\
doc_id,text,lang
1,alpha beta,en
2,gamma,de
not-a-number,broken type,en
5,delta epsilon,fr
"""


def test_jsonl_quarantines_corrupt_rows(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(JSONL)
    df = read_jsonl(spark, str(p), DOC_SCHEMA)
    assert CORRUPT_COL in df.columns
    clean, quarantine = split_corrupt(df)
    clean_rows = {r["doc_id"] for r in clean.collect()}
    assert clean_rows == {1, 2, 5}
    assert CORRUPT_COL not in clean.columns
    bad = [r["raw_record"] for r in quarantine.collect()]
    assert len(bad) == 2  # the non-JSON line and the type-mismatch line
    assert any("not json at all" in b for b in bad)
    assert any("not-a-number" in b for b in bad)


def test_jsonl_declared_schema_is_used_not_inferred(spark, tmp_path):
    p = tmp_path / "docs2.jsonl"
    p.write_text('{"doc_id": 7, "text": "x", "lang": "en", "extra": "ignored"}\n')
    df = read_jsonl(spark, str(p), DOC_SCHEMA)
    assert [f.name for f in df.schema.fields] == ["doc_id", "text", "lang", CORRUPT_COL]
    row = df.collect()[0]
    assert row["doc_id"] == 7 and row[CORRUPT_COL] is None


def test_csv_quarantines_type_mismatch(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text(CSV)
    clean, quarantine = split_corrupt(read_csv(spark, str(p), DOC_SCHEMA))
    assert {r["doc_id"] for r in clean.collect()} == {1, 2, 5}
    bad = [r["raw_record"] for r in quarantine.collect()]
    assert len(bad) == 1 and "not-a-number" in bad[0]


def test_clean_side_roundtrips_to_table(spark, tmp_path):
    """The clean fork is a normal relation: write parquet, reread, agg."""
    p = tmp_path / "docs3.jsonl"
    p.write_text(JSONL)
    clean, _ = split_corrupt(read_jsonl(spark, str(p), DOC_SCHEMA))
    out = str(tmp_path / "clean.parquet")
    clean.write.mode("overwrite").parquet(out)
    again = spark.read.parquet(out)
    assert again.count() == 3
    assert again.groupBy("lang").count().count() == 3
