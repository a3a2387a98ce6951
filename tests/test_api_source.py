"""Custom Python DataSource (S1's streaming-iterator ingestion made
partition-parallel): registration, paging, determinism, and the
clean-and-filter stage running above it."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cs_5542_lab_6_spark.sources.api_source import (
    _INVALID_EVERY,
    CorpusApiDataSource,
    SOURCE_NAME,
)


@pytest.fixture(scope="module")
def api(spark):
    spark.dataSource.register(CorpusApiDataSource)
    return spark


def _read(spark, n, page_size):
    return (
        spark.read.format(SOURCE_NAME)
        .option("n", n)
        .option("page_size", page_size)
        .load()
    )


def test_source_reads_n_records_across_pages(api):
    df = _read(api, 120, 25)
    assert df.columns == ["paper_id", "title", "abstract"]
    assert df.rdd.getNumPartitions() == 5  # ceil(120/25) pages → tasks
    rows = df.collect()
    assert len(rows) == 120
    assert sorted(r["paper_id"] for r in rows) == [
        f"arxiv_{i:06d}" for i in range(120)
    ]


def test_source_is_deterministic_and_offset_addressable(api):
    a = sorted(tuple(r) for r in _read(api, 60, 10).collect())
    b = sorted(tuple(r) for r in _read(api, 60, 30).collect())
    assert a == b  # page size changes parallelism, never content


def test_quality_filter_runs_above_the_source(api):
    """The reference iterator drops invalid hub records inline
    (ingestion.py:117-120); here the source delivers and Spark filters —
    the planted invalid cadence makes the drop count exact."""
    n = 140
    df = _read(api, n, 35)
    kept = df.filter(F.length(F.trim("abstract")) > 0)
    expected_invalid = sum(1 for i in range(n) if i % _INVALID_EVERY == 3)
    assert kept.count() == n - expected_invalid
    # and the survivors feed the normal corpus stages
    stats = kept.select(
        F.size(F.split("abstract", " ")).alias("w")
    ).agg(F.min("w"), F.max("w")).collect()[0]
    assert stats[0] == stats[1] == 40  # fixed-length deterministic fakes
