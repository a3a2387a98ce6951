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


def test_schema_evolution_merge_read(spark, sf_dir, tmp_path):
    """Schema evolution on a checkpointed table: a later batch adds a
    column; mergeSchema reads both generations as one relation with the
    old rows null-filled — how a 100 TB warehouse absorbs additive schema
    change without rewriting history."""
    out = str(tmp_path / "evolving")
    log = eval_metrics_log(spark, sf_dir)
    gen1 = log.select("log_id", "retrieval_mode", "n_queries")
    gen1.write.mode("append").parquet(out)
    gen2 = log.select(
        "log_id", "retrieval_mode", "n_queries", "avg_latency_ms"
    ).withColumn("log_id", F.concat(F.lit("g2_"), "log_id"))
    gen2.write.mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {
        "log_id", "retrieval_mode", "n_queries", "avg_latency_ms"
    }
    n = log.count()
    assert merged.count() == 2 * n
    # old-generation rows surface with the new column null-filled
    old_rows = merged.filter(~F.col("log_id").startswith("g2_"))
    assert old_rows.filter(F.col("avg_latency_ms").isNull()).count() == n
    new_rows = merged.filter(F.col("log_id").startswith("g2_"))
    assert new_rows.filter(F.col("avg_latency_ms").isNotNull()).count() == n
