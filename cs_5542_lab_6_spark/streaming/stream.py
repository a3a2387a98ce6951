"""Structured Streaming surface (SURVEY §2.10 — new-engine capability).

Real ``readStream`` pipelines over the ``events`` fixture: file source →
event-time windowed aggregation with watermark → memory/foreachBatch sink,
executed with the ``availableNow`` trigger so a bounded fixture behaves
like a drained stream. Each streaming query has a batch twin in
``batch_twins`` with identical semantics; the registry entries here run
the *streaming* plan to completion and return the materialized result, so
the driver's oracle check covers the streaming path end to end.

Watermark semantics exercised (and oracle-encoded):
- append-mode windowed aggregation emits a window only once the watermark
  (max event time − delay) passes its end — the final open window stays
  in state and is NOT emitted; the oracle reproduces that cutoff.
- ``dropDuplicatesWithinWatermark`` dedups an id-colliding union of two
  copies of the stream back to the original rows.

At scale: the same plans run incrementally on an unbounded source with
state bounded by the watermark; swap the file source for Kafka and the
memory sink for a parquet/foreachBatch sink — no plan changes.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import _SCHEMAS
from .batch_twins import _dsum

WATERMARK_DELAY = "1 hour"

_RUN_IDS = itertools.count()


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events fixture (S1's streaming-iterator
    analogue, data/ingestion.py:101-110 — but an actual unbounded-ready
    source). Schema is declared (streams cannot infer), and the
    TIMESTAMP(NANOS) physical column is read as INT64 then converted,
    like the batch loader."""
    raw = (
        spark.readStream.schema(_SCHEMAS["events"])
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _run_to_memory(sdf: DataFrame, base: str, mode: str) -> DataFrame:
    """Execute a bounded streaming query to completion (availableNow) and
    return the materialized memory-sink table."""
    name = f"{base}_{next(_RUN_IDS)}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = sdf.sparkSession
    return spark.table(name)


@query(
    "stream_tumbling_daily",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
           CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL '1 day' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY window_start, event_type
    """,
)
def stream_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tumbling-window aggregation executed through Structured
    Streaming (complete mode — every window emitted once the bounded
    source drains). Same oracle as the batch twin
    ``events_tumbling_daily``: streaming and batch must agree exactly."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), _dsum("value", "total_value"))
    )
    out = _run_to_memory(agg, "stream_tumbling_daily", "complete")
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "event_type",
        "n_events",
        "total_value",
    ).orderBy("window_start", "event_type")


@query(
    "stream_tumbling_daily_append",
    oracle=f"""
    WITH cutoff AS (
      SELECT max(ts) - INTERVAL '{WATERMARK_DELAY}' AS wm FROM events
    )
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
           CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL '1 day' AS window_end,
           event_type,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2, 3
    HAVING window_end <= (SELECT wm FROM cutoff)
    ORDER BY window_start, event_type
    """,
)
def stream_tumbling_daily_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-mode windowed aggregation with a {1 hour} watermark — the
    late-data policy made observable: a window is emitted only when the
    watermark (max event time − delay) passes its end, so the stream's
    final open window is withheld in state. The oracle encodes exactly
    that emission rule, so the driver hash-checks Spark's watermark
    semantics themselves."""
    ev = stream_events(spark, sf_dir).withWatermark("ts", WATERMARK_DELAY)
    agg = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    out = _run_to_memory(agg, "stream_tumbling_append", "append")
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "event_type",
        "n_events",
    ).orderBy("window_start", "event_type")


@query(
    "stream_dedup_events",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    ORDER BY event_id
    """,
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup: the stream unioned with itself (every
    event_id duplicated) is restored to the original rows by
    ``dropDuplicatesWithinWatermark`` keyed on event_id — the streaming
    form of exact dedup with watermark-bounded state (duplicates arriving
    within {1 hour} of each other collapse; state evicts beyond it)."""
    ev = stream_events(spark, sf_dir)
    doubled = ev.unionByName(ev).withWatermark("ts", WATERMARK_DELAY)
    deduped = doubled.dropDuplicatesWithinWatermark(["event_id"])
    out = _run_to_memory(deduped, "stream_dedup", "append")
    return out.select("event_id", "user_id", "event_type", "value").orderBy("event_id")


def write_metrics_stream(spark: SparkSession, sf_dir: str, out_dir: str) -> int:
    """foreachBatch append sink: per-micro-batch metrics rows appended to
    a parquet log — the streaming form of the APP.EVAL_METRICS append
    pattern (sql/01_create_schema.sql:97-108, backend/app.py:42-71).
    Returns the number of micro-batches processed."""
    ev = stream_events(spark, sf_dir)
    batches = []

    def _log_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy("event_type")
            .agg(F.count("*").alias("n_events"), _dsum("value", "total_value"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )
        batches.append(batch_id)

    q = (
        ev.writeStream.foreachBatch(_log_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", out_dir + "/_checkpoint")
        .start()
    )
    q.awaitTermination()
    return len(batches)
