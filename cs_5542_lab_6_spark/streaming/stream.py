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
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import _EVENTS_NANOS_SCHEMA, _SCHEMAS, events_ts_unit
from .batch_twins import SESSION_GAP, _dsum

WATERMARK_DELAY = "1 hour"
JOIN_WINDOW = "6 hours"

_RUN_IDS = itertools.count()


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events fixture (S1's streaming-iterator
    analogue, data/ingestion.py:101-110 — but an actual unbounded-ready
    source). Schema is declared (streams cannot infer); the physical
    timestamp unit is sniffed from the parquet footer exactly like the
    batch loader — TIMESTAMP(NANOS) fixtures are read as INT64 and
    converted, TIMESTAMP(MICROS) fixtures read directly."""
    if events_ts_unit(sf_dir) == "ns":
        raw = (
            spark.readStream.schema(_EVENTS_NANOS_SCHEMA)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return (
        spark.readStream.schema(_SCHEMAS["events"])
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


STREAM_STATE_TARGET_BYTES = 32 * 1024 * 1024


def _stream_state_partitions(spark: SparkSession, sf_dir: str) -> int | None:
    """Scale-adaptive state-store width for the bounded event streams
    (guide §2.2: derive partitioning from input size, never a constant).

    A stateful streaming query plans its shuffles with
    ``spark.sql.shuffle.partitions`` AT QUERY START, bakes that count
    into the checkpoint, and is exempt from AQE coalescing — so the
    session default (sized to cluster cores for batch work) is wrong at
    both ends: a 2 MB fixture pays 32 state-store instances, delta files
    and fsyncs per trigger, while a 100 TB keyspace would want far more
    than the local core count. Derivation: one state partition per
    {STREAM_STATE_TARGET_BYTES} of bounded source, clamped to
    [1, session shuffle partitions] — locally that is 1-2 partitions; at
    scale the clamp lands on the cluster-sized session value.
    $SPARK_GRAFT_STREAM_STATE_PARTS overrides both (unbounded production
    sources have no file size; their width is a capacity decision).
    Results are invariant to the width — the aggregations/dedup/join
    semantics are partition-count independent (oracle-pinned), only the
    per-trigger fixed cost changes."""
    env = os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTS")
    if env:
        return max(1, int(env))
    try:
        nbytes = os.path.getsize(os.path.join(sf_dir, "events.parquet"))
    except OSError:
        return None
    session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return max(1, min(session_parts, -(-nbytes // STREAM_STATE_TARGET_BYTES)))


def _dir_bytes(*paths: str) -> int:
    total = 0
    for p in paths:
        for root, _dirs, files in os.walk(p):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    return total


class _shuffle_width:
    """Temporarily set ``spark.sql.shuffle.partitions`` to a width derived
    from the bytes under ``paths`` (one partition per
    {STREAM_STATE_TARGET_BYTES}, clamped to [1, session width]) — the
    same input-size derivation as ``_stream_state_partitions``, for the
    foreachBatch micro-batch plans and their result pins: their
    localCheckpoint/RDD materializations bypass AQE coalescing entirely
    (profiled: a 32-task 0.4-0.5s job per micro-batch materializing a
    ~250-row verdict relation), so the width must be right at plan time,
    not fixed up at runtime. No-op (session width) when the dirs do not
    exist yet.

    SINGLE-THREADED BY ASSUMPTION (r16 advice): this mutates the
    session-global ``spark.sql.shuffle.partitions`` for the duration of
    the run and restores it afterwards. The engine drives streams
    serially (bench, registry, tests); a server that ever planned OTHER
    queries on the same session while a stream is in flight would plan
    them at the stream-derived width (often 1) — scope the run through
    ``spark.newSession()`` (per-session conf, shared context) before
    adding such concurrency."""

    def __init__(self, spark: SparkSession, *paths: str) -> None:
        self.spark = spark
        session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        nbytes = _dir_bytes(*paths)
        self.width = (
            max(1, min(session_parts, -(-nbytes // STREAM_STATE_TARGET_BYTES)))
            if nbytes
            else session_parts
        )

    def __enter__(self) -> "_shuffle_width":
        self.saved = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.width))
        return self

    def __exit__(self, *exc) -> None:
        self.spark.conf.set("spark.sql.shuffle.partitions", self.saved)


def _run_to_memory(
    sdf: DataFrame, base: str, mode: str, sf_dir: str | None = None
) -> DataFrame:
    """Execute a bounded streaming query to completion (availableNow) and
    return the materialized memory-sink table. With ``sf_dir`` the
    stateful shuffle width is derived from the source size (see
    ``_stream_state_partitions``) for the duration of the run; the
    session conf is restored afterwards."""
    name = f"{base}_{next(_RUN_IDS)}"
    spark = sdf.sparkSession
    parts = _stream_state_partitions(spark, sf_dir) if sf_dir else None
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        if parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
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
    out = _run_to_memory(agg, "stream_tumbling_daily", "complete", sf_dir)
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
    out = _run_to_memory(agg, "stream_tumbling_append", "append", sf_dir)
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
    out = _run_to_memory(deduped, "stream_dedup", "append", sf_dir)
    return out.select("event_id", "user_id", "event_type", "value").orderBy("event_id")


@query(
    "stream_session_windows",
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
      -- same (ts, event_id) total order as the lag() window above, so
      -- duplicate-(user, ts) boundary rows can't split across sessions
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
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merging session windows (gap {SESSION_GAP}) executed through
    Structured Streaming — ``F.session_window`` in a streaming
    aggregation, complete mode, so every merged session is emitted once
    the bounded source drains. Same gaps-and-islands oracle as the batch
    twin ``events_session_windows``: the streaming merge must agree with
    batch exactly. At scale the append-mode variant bounds state by a
    watermark; the merge logic (state rows coalescing as gaps close) is
    identical."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.groupBy("user_id", F.session_window("ts", SESSION_GAP).alias("w"))
        .agg(F.count("*").alias("n_events"), _dsum("value", "total_value"))
    )
    out = _run_to_memory(agg, "stream_session", "complete", sf_dir)
    return out.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
        "total_value",
    ).orderBy("user_id", "session_start")


@query(
    "stream_user_stats_stateful",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def stream_user_stats_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``
    (SURVEY §2.10's 'applyInPandasWithState for custom stateful
    operators'): per-user running profile (event count, purchase count,
    first/last seen) kept in explicit GroupState and re-emitted each
    micro-batch. The cumulative columns are monotone, so the final value
    per user is a min/max over emissions regardless of how availableNow
    batched the source — deterministic and oracle-checkable. At scale:
    state is one small row per user, partitioned by the grouping key;
    eviction policy would use a ProcessingTime/EventTime timeout."""
    import pandas as pd  # noqa: PLC0415 — worker-side import kept local
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = stream_events(spark, sf_dir).select("user_id", "event_type", "ts")

    def update_user(key, pdfs, state: GroupState):
        n, np_, first_us, last_us = (
            state.get if state.exists else (0, 0, None, None)
        )
        for pdf in pdfs:
            n += len(pdf)
            np_ += int((pdf["event_type"] == "purchase").sum())
            ts_us = pdf["ts"].astype("int64") // 1000  # ns → µs
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((n, np_, first_us, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "n_purchases": [np_],
                "first_us": [first_us],
                "last_us": [last_us],
            }
        )

    emitted = ev.groupBy("user_id").applyInPandasWithState(
        update_user,
        outputStructType="user_id long, n_events long, n_purchases long, "
        "first_us long, last_us long",
        stateStructType="n long, np long, first_us long, last_us long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_to_memory(emitted, "stream_user_stats", "update", sf_dir)
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("n_purchases").alias("n_purchases"),
            F.timestamp_micros(F.min("first_us")).alias("first_ts"),
            F.timestamp_micros(F.max("last_us")).alias("last_ts"),
        )
        .orderBy("user_id")
    )


@query(
    "stream_click_purchase_join",
    oracle=f"""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS gap_seconds,
           p.value AS purchase_value
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL '{JOIN_WINDOW}'
    ORDER BY click_id, purchase_id
    """,
)
def stream_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: purchases attributed to a same-user
    click within {JOIN_WINDOW}. Both sides carry a watermark and the join
    condition bounds event time on both ends, so Spark can evict buffered
    rows once the watermark passes — the canonical state-bounded
    stream-stream join. Inner matches emit as they are found; with the
    bounded fixture drained, the result equals the batch range join the
    oracle expresses."""
    clicks = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", WATERMARK_DELAY)
    )
    purchases = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", WATERMARK_DELAY)
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {JOIN_WINDOW}")),
        "inner",
    )
    out = _run_to_memory(joined, "stream_join", "append", sf_dir)
    return out.select(
        "click_id",
        "purchase_id",
        "user_id",
        (
            (F.unix_micros("purchase_ts") - F.unix_micros("click_ts"))
            / F.lit(1_000_000)
        )
        .cast("long")
        .alias("gap_seconds"),
        "purchase_value",
    ).orderBy("click_id", "purchase_id")


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


HEAVY_USER_MIN_EVENTS = 66  # fixture median — both tiers well-populated


@query(
    "stream_user_enriched_counts",
    oracle=f"""
    WITH prof AS (
      SELECT user_id,
             CASE WHEN COUNT(*) >= {HEAVY_USER_MIN_EVENTS} THEN 'heavy'
                  ELSE 'light' END AS user_tier
      FROM events GROUP BY user_id
    )
    SELECT e.event_type, p.user_tier,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events e JOIN prof p USING (user_id)
    GROUP BY e.event_type, p.user_tier
    ORDER BY e.event_type, p.user_tier
    """,
)
def stream_user_enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC join — the enrichment pattern (stream ⋈ dimension
    table) that, alongside stream-stream joins and stateful ops,
    completes the §2.10 join surface. The static side is a batch-computed
    per-user profile (lifetime event count → heavy/light tier) broadcast
    to every micro-batch; the stream side re-plans the join per batch, so
    a dimension refresh between batches is picked up automatically (the
    standard slowly-changing-dimension idiom). Aggregation runs in
    complete mode (no watermark needed for a global rollup); the decimal
    sum keeps the oracle exact."""
    from ..sources.tables import load_table

    profile = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.when(F.count("*") >= HEAVY_USER_MIN_EVENTS, "heavy")
            .otherwise("light")
            .alias("user_tier")
        )
    )
    enriched = stream_events(spark, sf_dir).join(F.broadcast(profile), "user_id")
    agg = enriched.groupBy("event_type", "user_tier").agg(
        F.count("*").alias("n_events"),
        _dsum("value", "total_value"),
    )
    out = _run_to_memory(agg, "user_enriched", "complete", sf_dir)
    return out.orderBy("event_type", "user_tier")


def write_metrics_stream_idempotent(spark: SparkSession, sf_dir: str, out_dir: str) -> int:
    """Replay-safe (exactly-once) variant of ``write_metrics_stream``.

    foreachBatch gives at-least-once delivery: after a crash between the
    sink write and the checkpoint commit, the SAME batch_id is re-run,
    and a plain append sink duplicates its rows. The standard idempotent
    idiom: key the write by batch_id — each micro-batch overwrites its
    own ``batch_id=N`` partition directory, so a replay rewrites
    identical bytes instead of appending a second copy. Readers get
    batch_id back through partition discovery.

    At scale this is the same pattern as Delta/Iceberg's txn-id dedup,
    expressed on plain parquet: per-batch atomicity via directory
    overwrite + idempotence via deterministic batch keys.

    Precondition (ADVICE r5): per-batch_id overwrite is exactly-once
    only while batch boundaries are deterministic across replays. If a
    replay re-batches the source differently (changed
    ``maxFilesPerTrigger``, rewritten source layout), old high-numbered
    ``batch_id=N`` partitions would survive as duplicates — so on the
    FIRST batch of every (re)start we drop every on-disk partition with
    id >= that batch id before writing. Replays with identical batching
    rewrite identical bytes; replays with coarser batching clean their
    stale tail. (Local-FS rmtree here; on an object store the same
    sweep is one prefix listing + delete.)
    """
    import re
    import shutil

    ev = stream_events(spark, sf_dir)
    batches: list[int] = []

    def _drop_stale_partitions(first_replayed_id: int) -> None:
        if not os.path.isdir(out_dir):
            return
        for name in os.listdir(out_dir):
            m = re.fullmatch(r"batch_id=(\d+)", name)
            if m and int(m.group(1)) >= first_replayed_id:
                shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)

    def _log_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batches:  # first batch after (re)start
            _drop_stale_partitions(batch_id)
        (
            batch_df.groupBy("event_type")
            .agg(F.count("*").alias("n_events"), _dsum("value", "total_value"))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch_id={batch_id}")
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


TOP_PURCHASES_K = 3


@query(
    "stream_user_top_purchases",
    oracle=f"""
    WITH p AS (
      SELECT user_id, value FROM events WHERE event_type = 'purchase'
    ),
    ranked AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY value DESC) AS rk
      FROM p
    )
    SELECT user_id,
           COUNT(*) AS n_purchases,
           MAX(CASE WHEN rk = 1 THEN value END) AS top1,
           MAX(CASE WHEN rk = 2 THEN value END) AS top2,
           MAX(CASE WHEN rk = 3 THEN value END) AS top3
    FROM ranked
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def stream_user_top_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running top-{TOP_PURCHASES_K} purchase values as custom
    streaming state — bounded-top-k state semantics, a different shape
    from stream_user_stats_stateful's monotone counters.

    Two physical paths, one contract (functions/tws.py):

    - ``transformWithStateInPandas`` (Spark 4's successor stateful API):
      a ``StatefulProcessor`` holding TYPED state — a ValueState counter
      plus a ListState of the running top values. This is the production
      path; its per-batch emission logic is unit-tested against the
      contract directly (tests/test_streaming.py). The API's Python
      driver worker requires protobuf, which this container lacks, so
      the path is gated on importability and exercised when available.
    - ``applyInPandasWithState`` fallback with the IDENTICAL emission
      contract (same update function, tuple-encoded state) — what runs
      here, keeping the query driver-checkable end to end.

    Determinism under availableNow batching: the counter and every
    top-k slot are monotone nondecreasing across emissions (new rows
    only grow the count and push top values up), so the per-user MAX
    over emissions equals the drained-stream final state regardless of
    batching — the oracle is an exact batch ranking.

    At scale: state is one counter + {TOP_PURCHASES_K} doubles per user,
    partitioned by the grouping key; RocksDB-backed with changelog
    checkpointing in production, eviction via ttlDurationMs/timers."""
    from ..functions.tws import (
        TOP_PURCHASES_SCHEMA,
        top_purchases_processor,
        tws_available,
        update_top_purchases,
    )

    purchases = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "value")
    )
    if tws_available():
        emitted = purchases.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=top_purchases_processor(),
            outputStructType=TOP_PURCHASES_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    else:
        from pyspark.sql.streaming.state import GroupStateTimeout

        emitted = purchases.groupBy("user_id").applyInPandasWithState(
            update_top_purchases,
            outputStructType=TOP_PURCHASES_SCHEMA,
            stateStructType="n long, v1 double, v2 double, v3 double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    out = _run_to_memory(emitted, "stream_top_purchases", "update", sf_dir)
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_purchases").alias("n_purchases"),
            F.max("top1").alias("top1"),
            F.max("top2").alias("top2"),
            F.max("top3").alias("top3"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Streaming SCD2: foreachBatch delta-apply over a multi-file changelog
# ---------------------------------------------------------------------------


def _write_marker(path: str, value: int) -> None:
    """Atomically record a baked workdir parameter: write-then-rename so
    a crash can never leave a torn/empty marker that bricks the guard
    reads below (os.replace is atomic on POSIX)."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(value))
    os.replace(tmp, path)


def _read_marker(path: str) -> int | None:
    """Read a baked-parameter marker; None for absent OR unparseable
    (a torn marker is treated exactly like a missing one, so the
    caller's repair path covers both)."""
    try:
        with open(path) as f:
            return int(f.read())
    except (OSError, ValueError):
        return None


def scd2_stream_run(
    spark: SparkSession,
    sf_dir: str,
    workdir: str,
    fail_at_batch: int | None = None,
    files_per_trigger: int = 1,
) -> int:
    """Drive the streaming SCD2 apply inside ``workdir`` and return the
    final state version. ``fail_at_batch`` is a test seam: raise before
    applying that micro-batch, simulating a crash with partial progress
    (the kept checkpoint then resumes from the failed batch on the next
    call). ``files_per_trigger`` sets maxFilesPerTrigger — the default
    (1: one changelog file per micro-batch) is the replay contract the
    tests pin; larger values model a catch-up replay that merges
    several days per trigger (the apply is batch-size-agnostic:
    sequential composition ≡ rebuild is Hypothesis-checked across
    arbitrary splits — the registered query runs at 2 since r17,
    trading per-trigger commit floors for batch size while still
    demonstrating the multi-batch sequential MERGE). Layout (all under workdir):

    - ``delta/d<year>.parquet`` — the post-SCD2_CUT changelog, one file
      per order year, lexicographic names AND strictly increasing
      mtimes (the file source orders on modification time; both orders
      agree, so replay is deterministic). Written only if missing.
    - ``dim_v0`` — the initial dimension (full SCD2 build over pre-cut
      orders). Written only if missing.
    - ``dim_v<k>`` — state after micro-batch k: foreachBatch reads
      ``dim_v<k-1>``, applies the batch's delta through the SAME
      ``scd2_apply_delta`` the batch-incremental query uses, writes
      ``dim_v<k>``. Versioned state makes replay idempotent: a re-run
      with a fresh checkpoint recomputes every version from the same
      inputs and overwrites byte-identical parquet.
    - ``ckpt`` — the streaming checkpoint.

    This is the nightly-MERGE-as-a-stream shape: at 100 TB the versioned
    dirs become table snapshots/commits and foreachBatch's apply is the
    same broadcast-delta plan, sized by |batch| + |affected customers|,
    never the closed history."""
    import glob
    import shutil

    from ..operators.lakehouse import SCD2_CUT, scd2_apply_delta, scd2_build
    from ..sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    cut = F.lit(SCD2_CUT).cast("date")
    # Fresh-checkpoint entry on a reused workdir: drop stale dim_v1+
    # state first. The head version below is max-over-disk; a previous
    # run with MORE batches (smaller files_per_trigger) would otherwise
    # leave higher-numbered dirs that outlive the rerun and win the max,
    # so replay idempotence only held at a fixed batching (r12 advice).
    # dim_v0 is batching-invariant (full pre-cut build) and stays.
    # A KEPT checkpoint owns the batching: availableNow replays nothing
    # once all files are committed, so a different files_per_trigger on
    # a kept-checkpoint reuse would be silently ignored — fail loudly
    # instead (the dedup_admission rebatch-guard symmetry).
    fpt_marker = os.path.join(workdir, "ckpt_files_per_trigger")
    if not os.path.isdir(os.path.join(workdir, "ckpt")):
        for d in glob.glob(os.path.join(workdir, "dim_v*")):
            if os.path.basename(d) != "dim_v0":
                shutil.rmtree(d, ignore_errors=True)
        _write_marker(fpt_marker, files_per_trigger)
    else:
        baked = _read_marker(fpt_marker)
        if baked is None:
            # ckpt present but no (or torn) batching record — the knob
            # cannot be validated, so refuse rather than silently run
            # whatever batching the checkpoint committed
            raise ValueError(
                f"workdir {workdir!r} has a checkpoint but no batching "
                "marker; wipe the checkpoint to re-run"
            )
        if baked != files_per_trigger:
            raise ValueError(
                f"workdir {workdir!r} has a checkpoint committed at "
                f"files_per_trigger={baked} but got {files_per_trigger}; "
                "wipe the checkpoint to rebatch"
            )
    delta_dir = os.path.join(workdir, "delta")
    if not os.path.isdir(delta_dir):
        os.makedirs(delta_dir)
        delta = orders.filter(F.col("o_orderdate") >= cut)
        # ONE job writes every year bucket (hive-partitioned, one file
        # per year via repartition on the key), then the part files are
        # renamed into the flat lexicographic layout the stream reads —
        # the per-year filtered-write loop this replaces re-scanned
        # orders once per year
        stage = os.path.join(workdir, "stage_delta")
        (
            delta.withColumn("y", F.year("o_orderdate"))
            .repartition("y")
            .write.mode("overwrite")
            .partitionBy("y")
            .parquet(stage)
        )
        years = sorted(
            int(os.path.basename(d).split("=")[1])
            for d in glob.glob(os.path.join(stage, "y=*"))
        )
        for i, y in enumerate(years):
            part = glob.glob(os.path.join(stage, f"y={y}", "part-*.parquet"))[0]
            dst = os.path.join(delta_dir, f"d{y}.parquet")
            shutil.move(part, dst)
            os.utime(dst, times=(1_000_000 + i, 1_000_000 + i))
        shutil.rmtree(stage, ignore_errors=True)
    dim0 = os.path.join(workdir, "dim_v0")
    if not os.path.isdir(dim0):
        scd2_build(orders.filter(F.col("o_orderdate") < cut)).write.mode(
            "overwrite"
        ).parquet(dim0)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if fail_at_batch is not None and batch_id == fail_at_batch:
            raise RuntimeError(
                f"injected crash before applying batch {batch_id}"
            )
        # State is keyed off Spark's batch_id — the standard foreachBatch
        # exactly-once idiom: batch k always reads dim_v<k> and writes
        # dim_v<k+1>, so a restart that KEEPS the checkpoint (crash with
        # partial progress) replays only uncommitted batches against the
        # state version they originally saw, and a replayed batch
        # overwrites its own output idempotently. A driver-local counter
        # here would restart at 0 on such a resume and merge later deltas
        # onto dim_v0.
        cur = batch_df.sparkSession.read.parquet(
            os.path.join(workdir, f"dim_v{batch_id}")
        )
        nxt = scd2_apply_delta(cur, batch_df)
        nxt.write.mode("overwrite").parquet(
            os.path.join(workdir, f"dim_v{batch_id + 1}")
        )

    sdf = (
        spark.readStream.schema(
            "o_custkey bigint, o_orderpriority string, "
            "o_orderdate timestamp, o_orderkey bigint"
        )
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(delta_dir)
    )
    # micro-batch plans are |batch|-sized: plan them (and their versioned
    # dim writes) at an input-derived width, not the batch-engine default
    with _shuffle_width(spark, delta_dir, dim0):
        q = (
            sdf.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", os.path.join(workdir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # The final version is whatever the highest committed batch produced —
    # read it off disk rather than a driver counter so a kept-checkpoint
    # resume (which replays only a suffix of batches) still reports the
    # true head version.
    return max(
        int(os.path.basename(d)[len("dim_v"):])
        for d in glob.glob(os.path.join(workdir, "dim_v*"))
    )


# ---------------------------------------------------------------------------
# Streaming near-dup admission: document changelog screened per micro-batch
# against the standing shingle index
# ---------------------------------------------------------------------------

ADMISSION_FILES = 4  # arrival files = micro-batches (maxFilesPerTrigger=1)


def dedup_admission_stream_run(
    spark: SparkSession,
    sf_dir: str,
    workdir: str,
    fail_at_batch: int | None = None,
    n_files: int = ADMISSION_FILES,
    files_per_trigger: int = 1,
) -> int:
    """Drive the streaming near-dup admission inside ``workdir`` and
    return the number of processed micro-batches. Layout:

    - ``arrivals/a<g>.parquet`` — the "new ingest" cut of documents
      (doc_id % NEW_BATCH_MOD == 0, the same cut ``dedup_incremental``
      screens) split into ``n_files`` files by a deterministic arrival
      group, lexicographic names and increasing mtimes (the file source
      orders on mtime; both orders agree). Written only if missing.
      The verdict union is invariant to ``n_files`` — every batch
      screens against the same standing index snapshot — and a test
      pins that at other batchings.
    - ``index/`` + ``index_sizes/`` — the STANDING corpus shingle index
      (every non-new doc's (doc_id, xs) rows and per-doc shingle
      counts), materialized once at setup. This is the warm-warehouse
      shape: each micro-batch screens against compact hashed parquet,
      never against raw text.
    - ``verdicts/b<k>`` — batch k's admission verdicts (one row per
      arriving doc: best index match by exact Jaccard or 'unique').
      batch_id-keyed OVERWRITE, the same exactly-once idiom as the SCD2
      stream: a replayed batch rewrites its own output idempotently.
    - ``index_delta/b<k>`` — the shingles of batch k's ADMITTED docs,
      the index maintenance a standing admission pipeline performs
      (standing index ∪ deltas = the index a later replay would screen
      against). Also batch_id-keyed.
    - ``ckpt`` — the streaming checkpoint.

    Cost per batch is |batch| × avg-postings join work against the
    index — never |corpus|²; at 100 TB the index side is the
    materialized shingle warehouse and the batch side broadcasts.
    ``fail_at_batch`` is the same crash-injection test seam as
    ``scd2_stream_run``. ``files_per_trigger`` sets maxFilesPerTrigger
    (the catch-up-replay knob, same semantics as ``scd2_stream_run``'s):
    each trigger screens the union of that many arrival files against
    the same standing snapshot, so the verdict union is invariant to it
    by the same argument as ``n_files`` (pinned in
    tests/test_streaming.py). A kept checkpoint owns its batching —
    reuse with a different value fails loudly via a marker, mirroring
    the SCD2 guard.

    Contract: each batch screens against the standing snapshot ONLY —
    never against earlier batches' ``index_delta`` — so the verdict
    union is invariant to ``n_files`` and byte-identical to the
    one-shot ``dedup_incremental`` screen. The flip side is inherent:
    duplicates that both ARRIVE (in any batches) are all 'unique' and
    all admitted; folding deltas into later screens would trade that
    for order-dependent verdicts and break replay idempotence. The
    admitted set's own dedup is the downstream batch pass. Pinned in
    tests/test_neardup_corpus.py::test_arrival_cut_tie_case_is_snapshot_screened."""
    import glob
    import shutil

    from ..operators.dedup import (
        JACCARD_THRESHOLD,
        NEW_BATCH_MOD,
        shingles_of,
        _doc_shingles,
    )
    from ..sources.tables import load_table

    is_new = F.col("doc_id") % NEW_BATCH_MOD == 0
    arrivals_dir = os.path.join(workdir, "arrivals")
    # Reused-workdir guards (r12 advice): the arrivals layout is baked
    # on first run, so a different n_files on reuse would silently run
    # the OLD batching — fail loudly instead. The baked value is read
    # from a marker written AFTER the part-file moves (an underscore
    # name, ignored by Spark's file source like _SUCCESS), not from the
    # live file count: group partitioning can legitimately produce
    # fewer than n_files files, and a crash mid-bake leaves no marker,
    # so a partial layout is rebuilt rather than bricking the workdir.
    # And a fresh-checkpoint entry drops stale batch_id-keyed outputs:
    # a prior run with more batches would otherwise leave b<k> dirs
    # that mix into the verdicts/index_delta unions consumers read.
    bake_marker = os.path.join(arrivals_dir, "_BAKED_N_FILES")
    if os.path.isdir(arrivals_dir):
        baked = _read_marker(bake_marker)  # None = absent OR torn
        if baked is None:
            shutil.rmtree(arrivals_dir)
        elif baked != n_files:
            raise ValueError(
                f"workdir {workdir!r} was baked with n_files={baked} "
                f"but got n_files={n_files}; use a fresh workdir to "
                "rebatch"
            )
    fpt_marker = os.path.join(workdir, "ckpt_files_per_trigger")
    if not os.path.isdir(os.path.join(workdir, "ckpt")):
        for sub in ("verdicts", "index_delta"):
            shutil.rmtree(os.path.join(workdir, sub), ignore_errors=True)
        _write_marker(fpt_marker, files_per_trigger)
    else:
        baked_fpt = _read_marker(fpt_marker)
        if baked_fpt is None:
            raise ValueError(
                f"workdir {workdir!r} has a checkpoint but no batching "
                "marker; wipe the checkpoint to re-run"
            )
        if baked_fpt != files_per_trigger:
            raise ValueError(
                f"workdir {workdir!r} has a checkpoint committed at "
                f"files_per_trigger={baked_fpt} but got "
                f"{files_per_trigger}; wipe the checkpoint to rebatch"
            )
    if not os.path.isdir(arrivals_dir):
        os.makedirs(arrivals_dir)
        stage = os.path.join(workdir, "stage_arrivals")
        (
            load_table(spark, sf_dir, "documents")
            .filter(is_new)
            .select("doc_id", "text")
            .withColumn(
                "g",
                (F.col("doc_id") / NEW_BATCH_MOD).cast("bigint")
                % n_files,
            )
            .repartition("g")
            .write.mode("overwrite")
            .partitionBy("g")
            .parquet(stage)
        )
        groups = sorted(
            int(os.path.basename(d).split("=")[1])
            for d in glob.glob(os.path.join(stage, "g=*"))
        )
        for i, g in enumerate(groups):
            part = glob.glob(os.path.join(stage, f"g={g}", "part-*.parquet"))[0]
            dst = os.path.join(arrivals_dir, f"a{g}.parquet")
            shutil.move(part, dst)
            os.utime(dst, times=(1_000_000 + i, 1_000_000 + i))
        shutil.rmtree(stage, ignore_errors=True)
        _write_marker(bake_marker, n_files)  # last: marks the bake complete

    index_dir = os.path.join(workdir, "index")
    sizes_dir = os.path.join(workdir, "index_sizes")
    if not os.path.isdir(index_dir):
        idx = _doc_shingles(spark, sf_dir).filter(~is_new)
        # guide §6 output sizing: the standing index is written once and
        # scanned once per micro-batch forever after — size its files
        # from the source bytes (same 32MB rule as _shuffle_width), not
        # from the session task count, so each screen opens ~1 file per
        # 32MB instead of one tiny file per core. Only when the warm
        # signature stage makes the size knowable; the cold path (tests)
        # keeps the planner's layout.
        from ..pipeline.corpus import _warm_path

        wp = _warm_path(sf_dir, "doc_shingles", spark)
        if wp and "://" not in wp:
            nbytes = _dir_bytes(wp)
            session_parts = int(
                spark.conf.get("spark.sql.shuffle.partitions")
            )
            width = max(
                1,
                min(session_parts, -(-nbytes // STREAM_STATE_TARGET_BYTES)),
            )
            idx = idx.coalesce(width)
        idx.write.mode("overwrite").parquet(index_dir)
        spark.read.parquet(index_dir).groupBy("doc_id").agg(
            F.count("*").alias("n")
        ).write.mode("overwrite").parquet(sizes_dir)

    # r16: the standing-index relations are hoisted OUT of the per-batch
    # closure — building them inside _screen re-ran parquet schema
    # discovery and full plan analysis on every micro-batch (profiled: 2
    # extra jobs + planning gap per batch for byte-identical state). A
    # DataFrame is immutable and reusable across batches; the underlying
    # files are written once at setup above.
    idx = spark.read.parquet(index_dir)
    idx_sizes = spark.read.parquet(sizes_dir)

    def _screen(batch_df: DataFrame, batch_id: int) -> None:
        if fail_at_batch is not None and batch_id == fail_at_batch:
            raise RuntimeError(
                f"injected crash before screening batch {batch_id}"
            )
        from pyspark.sql import Window as W

        sh_b = shingles_of(batch_df)
        b_sizes = sh_b.groupBy("doc_id").agg(F.count("*").alias("n"))
        # the BATCH side broadcasts (the documented 100 TB shape: |batch|
        # × avg-postings work, the standing index never shuffles) — made
        # explicit so per-batch size estimates can't flip it to a
        # sort-merge that would shuffle the index every trigger.
        # SIZE GUARD (r16 advice): maxFilesPerTrigger caps files, not
        # bytes, so one oversized arrival file would turn the forced
        # broadcast into a broadcast-size failure instead of an SMJ
        # fallback. The arrivals bake above writes bounded files from the
        # fixture cut, and _shuffle_width derives the batch width from
        # the same bytes; a production deployment must gate this hint on
        # per-trigger arrival bytes (shingle expansion ~10x text bytes)
        # against spark.sql.autoBroadcastJoinThreshold-scale limits and
        # fall back to the planner's choice above it.
        inter = (
            F.broadcast(sh_b.alias("a"))
            .join(idx.alias("b"), F.col("a.xs") == F.col("b.xs"))
            .groupBy(
                F.col("a.doc_id").alias("new_doc_id"),
                F.col("b.doc_id").alias("match_doc_id"),
            )
            .agg(F.count("*").alias("n_inter"))
        )
        jac = F.col("n_inter") / (
            F.col("sa.n") + F.col("sb.n") - F.col("n_inter")
        )
        scored = (
            inter.join(
                F.broadcast(b_sizes.alias("sa")),
                F.col("new_doc_id") == F.col("sa.doc_id"),
            )
            .join(
                idx_sizes.alias("sb"),
                F.col("match_doc_id") == F.col("sb.doc_id"),
            )
            .withColumn("jac", jac)
            .filter(F.col("jac") >= JACCARD_THRESHOLD)
            .select("new_doc_id", "match_doc_id", "jac")
        )
        rn = F.row_number().over(
            W.partitionBy("new_doc_id").orderBy(
                F.desc("jac"), F.asc("match_doc_id")
            )
        )
        best = scored.withColumn("rn", rn).filter(F.col("rn") == 1).drop("rn")
        verdicts = (
            batch_df.select(F.col("doc_id").alias("new_doc_id"))
            .join(F.broadcast(best), "new_doc_id", "left")
            .select(
                "new_doc_id",
                F.col("match_doc_id").cast("long").alias("match_doc_id"),
                F.round("jac", 4).alias("jaccard"),
                F.when(F.col("match_doc_id").isNull(), "unique")
                .otherwise("duplicate")
                .alias("verdict"),
            )
            # one screen, two consumers below; A/B'd against
            # write-then-read-back (no checkpoint job) and the checkpoint
            # variant measured faster (5.2-5.8s vs 6.4-7.6s stream-only)
            .localCheckpoint(eager=True)
        )
        verdicts.write.mode("overwrite").parquet(
            os.path.join(workdir, "verdicts", f"b{batch_id}")
        )
        admitted = verdicts.filter(F.col("verdict") == "unique").select(
            F.col("new_doc_id").alias("doc_id")
        )
        sh_b.join(admitted, "doc_id").write.mode("overwrite").parquet(
            os.path.join(workdir, "index_delta", f"b{batch_id}")
        )

    sdf = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(arrivals_dir)
    )
    # micro-batch screens are |batch|-sized (the index side broadcasts
    # nothing and never shuffles): plan them at an input-derived width
    with _shuffle_width(spark, arrivals_dir):
        q = (
            sdf.writeStream.foreachBatch(_screen)
            .option("checkpointLocation", os.path.join(workdir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return len(glob.glob(os.path.join(workdir, "verdicts", "b*")))


from ..operators.dedup import DEDUP_INCREMENTAL_ORACLE  # noqa: E402


@query(
    "stream_dedup_admission",
    oracle=DEDUP_INCREMENTAL_ORACLE,
)
def stream_dedup_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup admission (r11 verdict item 5): the "today's
    ingest" document cut replayed as a multi-file changelog stream, each
    micro-batch screened in foreachBatch against the standing shingle
    index — |batch|-cost per trigger — with admitted docs' shingles
    appended as index deltas. The oracle is the one-shot batch screen
    (``dedup_incremental``, operators/dedup.py): the batches partition
    the cut and every batch screens against the same standing index
    snapshot, so N per-batch screens must union to exactly the batch
    result. Mirrors the reference's aspirational Snowpipe incremental
    ingest (proposal/ProjectProposal.md:174) the way stream_scd2_apply
    mirrors nightly MERGE. Replay idempotence (checkpoint wipe AND
    kept-checkpoint crash resume) and index-delta maintenance are pinned
    in tests/test_streaming.py."""
    import shutil
    import tempfile

    workdir = tempfile.mkdtemp(prefix="dedup_admission_")
    try:
        # files_per_trigger=2 (r17, guide §2.2/§6 fixed-cost amortization):
        # the 4 arrival files stream as TWO micro-batches — still a
        # multi-batch sequential screen (exactly-once composition
        # demonstrated), but half the per-trigger fixed floor (screen
        # plan + localCheckpoint + 2 output commits + offset/commit-log
        # fsyncs, ~1s each on this host). The verdict union is
        # batching-invariant by contract (snapshot-only screens; pinned
        # across n_files AND files_per_trigger in tests) — interleaved
        # A/B at sf0.1: 5.05 -> ~3.1s min for the 2-batch shape.
        dedup_admission_stream_run(spark, sf_dir, workdir, files_per_trigger=2)
        vdir = os.path.join(workdir, "verdicts")
        with _shuffle_width(spark, vdir):
            out = (
                spark.read.parquet(os.path.join(vdir, "b*"))
                .orderBy("new_doc_id")
                .localCheckpoint(eager=True)
            )
        return out
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


@query(
    "stream_scd2_apply",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             lag(o_orderpriority) OVER w AS prev_prio
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    changes AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
      FROM seq
      WHERE prev_prio IS NULL OR prev_prio <> o_orderpriority
    )
    SELECT o_custkey,
           CAST(row_number() OVER w AS INTEGER) AS version,
           o_orderpriority AS priority,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER w AS valid_to,
           (lead(o_orderdate) OVER w IS NULL) AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, version
    """,
)
def stream_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SCD2 maintenance (r10 verdict item 6): the post-cut
    order changelog replayed as a multi-file stream, one micro-batch per
    file, each batch MERGEd into the stored dimension via foreachBatch +
    ``scd2_apply_delta`` (operators/lakehouse.py). The oracle is the
    full batch rebuild over ALL orders — the driver hash-checks that
    N sequential streamed merges land byte-identical to the one-shot
    dimension, Spark's exactly-once foreachBatch contract composed with
    the append-only changelog contract. Replay determinism (fresh
    checkpoint, same state dirs) is pinned in tests/test_streaming.py."""
    import shutil
    import tempfile

    workdir = tempfile.mkdtemp(prefix="scd2_stream_")
    try:
        # files_per_trigger=2 (r17): the 3 year files stream as TWO
        # micro-batches (2 + 1) — sequential MERGE composition is still
        # demonstrated (dim_v1 -> dim_v2) at one less per-trigger commit
        # floor (~0.4-0.6s on this host). The apply is batch-size
        # agnostic (sequential composition ≡ rebuild, Hypothesis-checked
        # across arbitrary splits; the catch-up-replay knob itself is
        # pinned equal to the 1-file batching in tests/test_streaming.py).
        # Interleaved A/B at sf0.1: 3.92 -> 3.04s min.
        final_v = scd2_stream_run(spark, sf_dir, workdir, files_per_trigger=2)
        vdir = os.path.join(workdir, f"dim_v{final_v}")
        with _shuffle_width(spark, vdir):
            out = (
                spark.read.parquet(vdir)
                .orderBy("o_custkey", "version")
                .localCheckpoint(eager=True)
            )
        return out
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
