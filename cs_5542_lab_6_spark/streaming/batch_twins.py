"""Batch twins of the streaming window operators (SURVEY §2.10).

The reference has no streaming at all — its closest analogues are the
append-only metric log (sql/01_create_schema.sql:97-108) and one-pass
dataset iteration (data/ingestion.py:101-110). The new engine's streaming
surface runs on the ``events`` fixture; every streaming aggregation here
has a *batch twin* with identical semantics so the results stay DuckDB
oracle-checkable (the driver can't hash a running stream). The real
``readStream`` versions live in ``cs_5542_lab_6_spark.streaming.stream``
and are asserted equal to these twins in ``tests/test_streaming.py``.

Windows are epoch-aligned in UTC (session timezone pinned in
``session.get_spark``), so ``F.window``'s alignment matches the oracle's
``date_trunc`` arithmetic exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

SESSION_GAP = "6 hours"  # ~median inter-event gap is 7.7h ⇒ real merges

_DEC = "decimal(18,6)"


def _dsum(col: str, alias: str) -> Column:
    """Order-independent double sum: exact decimal accumulation surfaced
    as double (same trick as the relational aggregates)."""
    return F.sum(F.col(col).cast(_DEC)).cast("double").alias(alias)


@query(
    "events_tumbling_daily",
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
def events_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day window aggregation per event type — the canonical
    streaming group-by (``F.window``), here in batch mode. At scale this
    is a single shuffle on (window, type); in streaming mode the same
    plan runs incrementally with watermark-bounded state."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 day")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), _dsum("value", "total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "events_sliding_2d",
    oracle="""
    WITH slid AS (
      SELECT date_trunc('day', ts) - k.k * INTERVAL '1 day' AS window_start,
             event_type, value
      FROM events, (SELECT unnest(range(0, 2)) AS k) k
    )
    SELECT window_start,
           window_start + INTERVAL '2 days' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM slid
    GROUP BY 1, 2, 3
    ORDER BY window_start, event_type
    """,
)
def events_sliding_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (size 2 days, slide 1 day): every event lands in
    exactly two overlapping windows. Spark expands the windows in the
    scan (no extra shuffle vs tumbling); the oracle mirrors the expansion
    with an explicit unnest."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", "2 days", "1 day")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), _dsum("value", "total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "events_session_windows",
    oracle=f"""
    WITH lagd AS (
      SELECT user_id, ts, event_id, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p
      FROM events
    ),
    flagged AS (
      SELECT *, CASE WHEN p IS NULL OR ts - p >= INTERVAL '{SESSION_GAP}'
                     THEN 1 ELSE 0 END AS f
      FROM lagd
    ),
    sess AS (
      -- running sum ordered by (ts, event_id): the SAME total order the
      -- lag() above used, so a boundary row and a duplicate-(ts) row can
      -- never be numbered across different sessions than Spark merges
      SELECT *, SUM(f) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '{SESSION_GAP}' AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM sess
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (gap {SESSION_GAP}) per user via
    ``F.session_window`` — Spark's native merging-window operator; the
    oracle reproduces the merge with the gaps-and-islands idiom
    (lag → new-session flag → running sum → group). Session end is
    last-event + gap, matching Spark's definition.

    At scale: sessionization shuffles once on user_id; state size in the
    streaming version is bounded by the watermark."""
    ev = load_table(spark, sf_dir, "events")
    sw = F.session_window("ts", SESSION_GAP)
    return (
        ev.groupBy("user_id", sw.alias("w"))
        .agg(F.count("*").alias("n_events"), _dsum("value", "total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "eval_metrics_log",
    oracle="""
    SELECT sha256(event_type || '|' || CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR)) AS log_id,
           event_type AS retrieval_mode,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS log_date,
           COUNT(*) AS n_queries,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             AS avg_latency_ms,
           CAST(MAX(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS max_latency_ms
    FROM events
    GROUP BY event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)
    ORDER BY log_date, retrieval_mode
    """,
)
def eval_metrics_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APP.EVAL_METRICS analogue (sql/01_create_schema.sql:97-108, S10
    append sink): a daily per-mode metrics rollup with sha-derived log
    ids — the deterministic batch form of the reference's append-only
    query log (backend/app.py:42-71). The streaming version appends the
    same rows per micro-batch via foreachBatch."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    return (
        ev.groupBy(F.col("event_type").alias("retrieval_mode"), day.alias("log_date"))
        .agg(
            F.count("*").alias("n_queries"),
            (F.sum(F.col("value").cast(_DEC)).cast("double") / F.count("*")).alias(
                "avg_latency_ms"
            ),
            F.max(F.col("value").cast(_DEC)).cast("double").alias("max_latency_ms"),
        )
        .select(
            F.sha2(
                F.concat_ws("|", "retrieval_mode", F.col("log_date").cast("string")),
                256,
            ).alias("log_id"),
            "retrieval_mode",
            "log_date",
            "n_queries",
            "avg_latency_ms",
            "max_latency_ms",
        )
        .orderBy("log_date", "retrieval_mode")
    )
