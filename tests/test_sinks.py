"""Sink round trips (SURVEY §2.1 S2/S10): parquet checkpoint and JSON
append-log writes survive a read-back with identical content."""

from __future__ import annotations

from pyspark.sql import functions as F

from cs_5542_lab_6_spark.streaming.batch_twins import eval_metrics_log


def test_json_append_log_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "history_json")
    log = eval_metrics_log(spark, sf_dir)
    n = log.count()

    # the reference's read-modify-write history.json (backend/app.py:42-71)
    # becomes a true append-mode distributed sink
    log.write.mode("append").json(out)
    log.write.mode("append").json(out)

    back = spark.read.json(out)
    assert back.count() == 2 * n
    # one append's worth of distinct rows matches the source exactly
    assert back.distinct().count() == n
    src_ids = {r["log_id"] for r in log.select("log_id").collect()}
    got_ids = {r["log_id"] for r in back.select("log_id").distinct().collect()}
    assert got_ids == src_ids


def test_parquet_checkpoint_preserves_schema(spark, sf_dir, tmp_path):
    out = str(tmp_path / "metrics_parquet")
    log = eval_metrics_log(spark, sf_dir)
    log.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    # parquet reads are always nullable; compare names + types
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in log.schema
    ]
    assert back.orderBy("log_id").collect() == log.orderBy("log_id").collect()
