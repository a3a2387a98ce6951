"""JSONL/CSV ingestion: declared schemas, corrupt-row quarantine, and the
clean/quarantine fork (P7's error-row tolerance generalized to raw file
drops)."""

from __future__ import annotations

from pyspark.sql import types as T

from cs_5542_lab_6_spark.sources.files import (
    CORRUPT_COL,
    corrupt_split,
    read_csv,
    read_jsonl,
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


def _n_cached(spark) -> int:
    return spark._jsparkSession.sharedState().cacheManager().cachedData().size()


def test_jsonl_quarantines_corrupt_rows(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(JSONL)
    df = read_jsonl(spark, str(p), DOC_SCHEMA)
    assert CORRUPT_COL in df.columns
    with corrupt_split(df) as (clean, quarantine):
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
    with corrupt_split(read_csv(spark, str(p), DOC_SCHEMA)) as (clean, quarantine):
        assert {r["doc_id"] for r in clean.collect()} == {1, 2, 5}
        bad = [r["raw_record"] for r in quarantine.collect()]
    assert len(bad) == 1 and "not-a-number" in bad[0]


def test_clean_side_roundtrips_to_table(spark, tmp_path):
    """The clean fork is a normal relation: write parquet, reread, agg."""
    p = tmp_path / "docs3.jsonl"
    p.write_text(JSONL)
    with corrupt_split(read_jsonl(spark, str(p), DOC_SCHEMA)) as (clean, _):
        out = str(tmp_path / "clean.parquet")
        clean.write.mode("overwrite").parquet(out)
    again = spark.read.parquet(out)
    assert again.count() == 3
    assert again.groupBy("lang").count().count() == 3


def test_corrupt_split_releases_its_cache(spark, tmp_path):
    """The scoped fork leaves the SQL cache ledger exactly as it found
    it — the r5 cache-hygiene contract applied to ingestion (the parsed
    relation MUST be cached while in scope: Spark rejects corrupt-only
    queries on an uncached raw scan, and the two forks would otherwise
    parse the raw bytes twice)."""
    p = tmp_path / "docs4.jsonl"
    p.write_text(JSONL)
    before = _n_cached(spark)
    with corrupt_split(read_jsonl(spark, str(p), DOC_SCHEMA)) as (clean, quarantine):
        assert clean.count() == 3
        assert quarantine.count() == 2
        assert _n_cached(spark) == before + 1
    assert _n_cached(spark) == before


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC interchange: a table written as ORC reads back row-identical,
    and a point predicate over the ORC scan is pushed into the reader
    (same zone-map skipping contract as parquet)."""
    from cs_5542_lab_6_spark.plans.inspect import formatted_plan
    from cs_5542_lab_6_spark.sources import load_table
    from cs_5542_lab_6_spark.sources.files import read_orc, write_orc

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path, partition_by=("o_orderpriority",))
    back = read_orc(spark, path, orders.schema).select(*orders.columns)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, orders.collect())
    )
    filtered = back.filter(back.o_orderkey == 42).select("o_orderkey", "o_custkey")
    plan = formatted_plan(filtered)
    assert "EqualTo(o_orderkey,42)" in plan  # pushdown reaches the ORC scan
    # partition pruning on the directory layout
    pri = back.filter(back.o_orderpriority == "1-URGENT")
    pplan = formatted_plan(pri)
    assert "o_orderpriority" in pplan
    # schema drift fails loudly instead of NULL-filling (Spark's reader
    # would silently return NULLs for the phantom column)
    import pytest
    from pyspark.sql import types as T

    drifted = T.StructType(
        orders.schema.fields + [T.StructField("phantom_col", T.LongType())]
    )
    with pytest.raises(ValueError, match="phantom_col"):
        read_orc(spark, path, drifted)


def test_orc_drift_allows_lossless_widening_rejects_lossy(spark, tmp_path):
    """The ORC drift check (r10 advice): nullability differences and safe
    numeric widening (file int read as declared bigint, float as double)
    are lossless and must read; genuinely lossy drift (long->int,
    int->string) still fails loudly."""
    import pytest
    from pyspark.sql import types as T

    from cs_5542_lab_6_spark.sources.files import read_orc

    path = str(tmp_path / "t_orc")
    df = spark.createDataFrame(
        [(1, 2.5, [3])], schema="a int, b float, xs array<int>"
    )
    df.write.orc(path)

    widened = T.StructType(
        [
            T.StructField("a", T.LongType(), False),  # int -> bigint, non-null
            T.StructField("b", T.DoubleType()),       # float -> double
            # array with containsNull=False: metadata-only difference
            T.StructField("xs", T.ArrayType(T.IntegerType(), False)),
        ]
    )
    back = read_orc(spark, path, widened)
    assert back.collect()[0][0] == 1

    lossy = T.StructType([T.StructField("a", T.StringType())])
    with pytest.raises(ValueError, match="type drift"):
        read_orc(spark, path, lossy)


def test_orc_drift_widening_recurses_into_nested_types(spark, tmp_path):
    """Nested lossless widening (r11 advice): file array<int> declared
    array<bigint>, an int inside a struct declared bigint, and map values
    widening float->double are the same lossless case as the top level
    and must read; a lossy element type (array<bigint> declared
    array<int>) still fails."""
    import pytest
    from pyspark.sql import types as T

    from cs_5542_lab_6_spark.sources.files import read_orc

    path = str(tmp_path / "t_orc_nested")
    df = spark.createDataFrame(
        [([1, 2], {"k": float(1.5)}, (7, "x"))],
        schema="xs array<int>, m map<string,float>, s struct<a:int,b:string>",
    )
    df.write.orc(path)

    widened = T.StructType(
        [
            T.StructField("xs", T.ArrayType(T.LongType())),
            T.StructField("m", T.MapType(T.StringType(), T.DoubleType())),
            T.StructField(
                "s",
                T.StructType(
                    [
                        T.StructField("a", T.LongType()),
                        T.StructField("b", T.StringType()),
                    ]
                ),
            ),
        ]
    )
    back = read_orc(spark, path, widened).collect()[0]
    assert back.xs == [1, 2] and back.m == {"k": 1.5} and back.s.a == 7

    lossy = T.StructType([T.StructField("xs", T.ArrayType(T.IntegerType()))])
    # file already array<int>: that exact declared type is fine...
    assert read_orc(spark, path, lossy).collect()[0].xs == [1, 2]
    # ...but declaring a NARROWER element than the files carry is drift
    wide_files = str(tmp_path / "t_orc_wide")
    spark.createDataFrame([([1],)], schema="xs array<bigint>").write.orc(wide_files)
    with pytest.raises(ValueError, match="type drift"):
        read_orc(spark, wide_files, lossy)
    # struct field RENAME is drift even when the layout matches
    renamed = T.StructType(
        [
            T.StructField("xs", T.ArrayType(T.LongType())),
            T.StructField("m", T.MapType(T.StringType(), T.DoubleType())),
            T.StructField(
                "s",
                T.StructType(
                    [
                        T.StructField("z", T.LongType()),
                        T.StructField("b", T.StringType()),
                    ]
                ),
            ),
        ]
    )
    with pytest.raises(ValueError, match="type drift"):
        read_orc(spark, path, renamed)
