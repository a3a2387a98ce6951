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
    assert df.columns == ["idx", "paper_id", "title", "abstract"]
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


def test_stream_reader_drains_source_in_pages(api, tmp_path):
    """The same paginated source as a micro-batch stream: offsets
    advance one page per batch and stop at n, so the stream drains and
    terminates; every record arrives exactly once."""
    df = (
        api.readStream.format(SOURCE_NAME)
        .option("n", 60)
        .option("page_size", 25)
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("api_stream_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = api.sql("SELECT paper_id FROM api_stream_sink").collect()
    assert sorted(r["paper_id"] for r in rows) == [
        f"arxiv_{i:06d}" for i in range(60)
    ]


def test_stream_replay_range_is_deterministic(api):
    """readBetweenOffsets — the crash-replay path — regenerates exactly
    the committed range."""
    from cs_5542_lab_6_spark.sources.api_source import (
        CorpusApiStreamReader,
        _fetch_page,
    )

    r = CorpusApiStreamReader({"n": "50", "page_size": "20"})
    batch, nxt = r.read(r.initialOffset())
    assert nxt == {"offset": 20}
    replay = list(r.readBetweenOffsets({"offset": 0}, {"offset": 20}))
    assert replay == list(_fetch_page(0, 20))
    assert list(batch) == replay


def test_jsonl_commit_writer_publishes_atomically(api, tmp_path):
    """Two-phase commit sink: staged per-task files publish on driver
    commit with a manifest; no staging residue survives."""
    import json
    import os

    from cs_5542_lab_6_spark.sources.api_source import JsonlCommitDataSource

    api.dataSource.register(JsonlCommitDataSource)
    out = str(tmp_path / "sink")
    df = _read(api, 40, 10)
    df.write.format("jsonl_commit").mode("append").save(out)

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 40
    assert len(manifest["files"]) >= 1
    # staging is empty and every manifest file exists with its row count
    assert not os.listdir(os.path.join(out, "_staging"))
    for entry in manifest["files"]:
        path = os.path.join(out, entry["file"])
        with open(path) as fh:
            assert sum(1 for _ in fh) == entry["rows"]
    # content round-trips through a normal reader
    back = api.read.json(os.path.join(out, "part-*.jsonl"))
    assert back.count() == 40
    assert sorted(r["paper_id"] for r in back.collect()) == sorted(
        r["paper_id"] for r in df.collect()
    )


def test_jsonl_commit_abort_sweeps_staging(tmp_path):
    """abort() removes staged task output so a failed job leaves no
    visible files."""
    import os

    from cs_5542_lab_6_spark.sources.api_source import (
        JsonlCommitWriter,
        _FileCommit,
    )

    out = str(tmp_path / "aborted")
    staging = os.path.join(out, "_staging")
    os.makedirs(staging)
    staged = os.path.join(staging, "part-deadbeef.jsonl")
    open(staged, "w").write('{"x": 1}\n')
    w = JsonlCommitWriter({"path": out})
    w.abort([_FileCommit(staged, 1)])
    assert not os.path.exists(staging)
    assert not os.path.exists(os.path.join(out, "_MANIFEST.json"))


def test_stream_to_stream_sink_end_to_end(api, tmp_path):
    """Custom stream source → custom stream sink: per-batch directories
    with manifests; total rows across batches equals the source size;
    re-publishing a batch id replaces its directory (idempotent replay)."""
    import glob
    import json
    import os

    from cs_5542_lab_6_spark.sources.api_source import JsonlCommitDataSource

    api.dataSource.register(JsonlCommitDataSource)
    out = str(tmp_path / "stream_sink")
    df = (
        api.readStream.format(SOURCE_NAME)
        .option("n", 50)
        .option("page_size", 20)
        .load()
    )
    q = (
        df.writeStream.format("jsonl_commit")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    manifests = sorted(glob.glob(os.path.join(out, "batch_id=*", "_MANIFEST.json")))
    assert len(manifests) >= 2  # 50 records at 20/page → 3 non-empty batches
    total = sum(json.load(open(m))["total_rows"] for m in manifests)
    assert total == 50
    back = api.read.json(os.path.join(out, "batch_id=*", "part-*.jsonl"))
    assert sorted(r["paper_id"] for r in back.collect()) == [
        f"arxiv_{i:06d}" for i in range(50)
    ]


def test_pushdown_narrows_pages_fetched(api):
    """idx-range predicates reach the source: a 25-record window over a
    200-record source plans exactly ONE page task (vs 8 unfiltered), and
    equality plans one page with one surviving row. A non-pushable
    predicate leaves the page count unchanged and is applied by Spark."""
    full = _read(api, 200, 25)
    assert full.rdd.getNumPartitions() == 8

    window = _read(api, 200, 25).filter("idx >= 50 AND idx < 75")
    assert window.rdd.getNumPartitions() == 1
    assert sorted(r["idx"] for r in window.collect()) == list(range(50, 75))

    point = _read(api, 200, 25).filter("idx = 60")
    assert point.rdd.getNumPartitions() == 1
    assert [r["paper_id"] for r in point.collect()] == ["arxiv_000060"]

    residual = _read(api, 200, 25).filter("title LIKE '%graph%' AND idx < 25")
    assert residual.rdd.getNumPartitions() == 1  # idx pushed, LIKE stays above
    want = [
        r["idx"] for r in _read(api, 200, 25).collect()
        if r["idx"] < 25 and "graph" in r["title"]
    ]
    assert sorted(r["idx"] for r in residual.collect()) == sorted(want)
