"""Streaming-specific checks beyond the oracle parity sweep: the
foreachBatch metrics sink writes real files, and the streaming plans agree
with their batch twins row-for-row."""

from __future__ import annotations

from cs_5542_lab_6_spark.streaming.batch_twins import (
    events_session_windows,
    events_tumbling_daily,
)
from cs_5542_lab_6_spark.streaming.stream import (
    stream_session_windows,
    stream_tumbling_daily,
    write_metrics_stream,
)


def test_stream_equals_batch_twin(spark, sf_dir):
    got = {tuple(r) for r in stream_tumbling_daily(spark, sf_dir).collect()}
    want = {tuple(r) for r in events_tumbling_daily(spark, sf_dir).collect()}
    assert got == want


def test_session_stream_equals_batch_twin(spark, sf_dir):
    got = {tuple(r) for r in stream_session_windows(spark, sf_dir).collect()}
    want = {tuple(r) for r in events_session_windows(spark, sf_dir).collect()}
    assert got == want


def test_foreach_batch_metrics_sink(spark, sf_dir, tmp_path):
    out = str(tmp_path / "metrics_log")
    n_batches = write_metrics_stream(spark, sf_dir, out)
    assert n_batches >= 1
    log = spark.read.parquet(out)
    assert set(log.columns) == {"event_type", "n_events", "total_value", "batch_id"}
    # the appended log accounts for every event exactly once
    total = sum(r["n_events"] for r in log.collect())
    from cs_5542_lab_6_spark.sources import load_table

    assert total == load_table(spark, sf_dir, "events").count()
