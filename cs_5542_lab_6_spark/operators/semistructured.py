"""Semi-structured operators: MapType JSON handling and unpivot.

SURVEY §1.2 prescribes MapType for the ``events.props`` JSON column (the
reference never parses its nested JSON beyond single-key extraction);
unpivot/stack is the missing inverse of the pivot the engine already has
(returnflag_pivot). Both stay fully relational: from_json → explode is a
narrow transform, and stack() multiplies rows map-side without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


@query(
    "events_props_map",
    oracle="""
    SELECT event_type, k.key AS prop_key,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(props->>k.key AS INTEGER)) AS BIGINT) AS sum_value,
           CAST(MIN(CAST(props->>k.key AS INTEGER)) AS INTEGER) AS min_value,
           CAST(MAX(CAST(props->>k.key AS INTEGER)) AS INTEGER) AS max_value,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_event_value
    FROM events, unnest(json_keys(props)) AS k(key)
    GROUP BY event_type, k.key
    ORDER BY event_type, prop_key
    """,
)
def events_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON props as a real MapType column (SURVEY §1.2): parse once with
    from_json, explode the entries, aggregate per (type, key). Malformed
    JSON yields null maps that drop out — PERMISSIVE-mode semantics (P7).
    Schema-on-read for arbitrary keys, unlike the reference's hardcoded
    single-key extraction (the former events_json_props query, subsumed
    here — sum_event_value carries its event-value aggregate)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        "value",
        F.explode(F.from_json("props", "map<string,int>")).alias(
            "prop_key", "prop_value"
        ),
    )
    return (
        parsed.groupBy("event_type", "prop_key")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("prop_value").alias("sum_value"),
            F.min("prop_value").alias("min_value"),
            F.max("prop_value").alias("max_value"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_event_value"),
        )
        .orderBy("event_type", "prop_key")
    )


@query(
    "lineitem_unpivot_metrics",
    oracle="""
    WITH long AS (
      SELECT 'discount' AS metric, l_discount AS v FROM lineitem
      UNION ALL
      SELECT 'price', l_extendedprice FROM lineitem
      UNION ALL
      SELECT 'quantity', l_quantity FROM lineitem
    )
    SELECT metric, COUNT(*) AS n,
           CAST(SUM(CAST(v AS DECIMAL(18,4))) AS DOUBLE) AS total,
           CAST(MIN(CAST(v AS DECIMAL(18,4))) AS DOUBLE) AS min_v,
           CAST(MAX(CAST(v AS DECIMAL(18,4))) AS DOUBLE) AS max_v
    FROM long
    GROUP BY metric
    ORDER BY metric
    """,
)
def lineitem_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long) via stack(): three measure columns become
    (metric, value) rows, then one aggregation over the long form — the
    inverse of returnflag_pivot. stack() expands rows in the scan stage;
    the only shuffle is the 3-group aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.select(
        F.expr(
            "stack(3, 'quantity', l_quantity, 'price', l_extendedprice,"
            " 'discount', l_discount) AS (metric, v)"
        )
    )
    dec = F.col("v").cast("decimal(18,4)")
    return (
        long.groupBy("metric")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec).cast("double").alias("total"),
            F.min(dec).cast("double").alias("min_v"),
            F.max(dec).cast("double").alias("max_v"),
        )
        .orderBy("metric")
    )


@query(
    "events_props_variant",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(props->>'k' AS INTEGER)) AS INTEGER) AS min_k,
           CAST(MAX(CAST(props->>'k' AS INTEGER)) AS INTEGER) AS max_k
    FROM events
    WHERE json_valid(props) AND (props->>'k') IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT-typed twin of ``events_props_map`` (Spark 4's
    semi-structured type, SURVEY §1.2 schema-on-read): ``parse_json``
    keeps the payload as an open VARIANT — no declared map/struct schema
    — and ``try_variant_get`` extracts a typed path on demand. This is
    the storage model for heterogeneous event payloads at 100 TB: one
    binary-encoded column, per-query typed extraction, no schema
    migration when producers add keys (the map<string,int> twin must
    re-declare; VARIANT just reads). try_* semantics drop malformed
    rows, matching the oracle's json_valid guard."""
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
        )
        .orderBy("event_type")
    )


# Producer-upgrade cut: batches written before this instant carry the v1
# schema; later batches add the client_ver column (schema evolution).
SCHEMA_EVOLUTION_CUT = "2024-01-15"


@query(
    "events_schema_evolution",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN ts >= TIMESTAMP '{SCHEMA_EVOLUTION_CUT}'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_with_client_ver,
           CAST(COUNT(DISTINCT CASE WHEN ts >= TIMESTAMP '{SCHEMA_EVOLUTION_CUT}'
                    THEN 'v' || CAST(event_id % 3 AS VARCHAR) END) AS BIGINT)
               AS n_client_versions
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet batches (SURVEY §1.2 schema-on-read,
    the third leg after map and VARIANT): an old producer wrote events
    WITHOUT ``client_ver``; an upgraded producer adds the column. The
    engine lands each batch as parquet with its own schema and reads the
    whole directory with ``mergeSchema`` — Spark unions the footers into
    the superset schema and backfills missing columns with NULL, so the
    consumer aggregates one relation with zero migration of the old
    files (the reference's fixed-schema loader, data/ingestion.py, would
    have to rewrite history). The oracle recomputes the same facts from
    the unevolved table: NULL-backfill must be exactly "column absent
    before the cut".

    Scale shape: mergeSchema unions footers (schema metadata), not data —
    the scan stays columnar and NULL backfill is free; the aggregate is
    one map-side-combinable hash agg. At 100 TB the same pattern handles
    years of producer upgrades in one read, with per-file pruning
    untouched."""
    import os
    import shutil
    import tempfile

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    cut = F.lit(SCHEMA_EVOLUTION_CUT).cast("timestamp")
    root = tempfile.mkdtemp(prefix="schema_evo_")
    try:
        # v1 producer: original five columns
        ev.filter(F.col("ts") < cut).write.mode("overwrite").parquet(
            os.path.join(root, "batch=v1")
        )
        # v2 producer: adds client_ver (deterministic stand-in payload)
        ev.filter(F.col("ts") >= cut).withColumn(
            "client_ver", F.concat(F.lit("v"), (F.col("event_id") % 3).cast("string"))
        ).write.mode("overwrite").parquet(os.path.join(root, "batch=v2"))
        merged = (
            spark.read.option("mergeSchema", "true")
            .option("recursiveFileLookup", "true")
            .parquet(root)
        )
        out = (
            merged.groupBy("event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.count("client_ver").cast("long").alias("n_with_client_ver"),
                F.countDistinct("client_ver").cast("long").alias(
                    "n_client_versions"
                ),
            )
            .orderBy("event_type")
            .localCheckpoint(eager=True)  # pin before the batch dirs vanish
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# Data-quality expectations report (DLT/Great-Expectations shape)
# ---------------------------------------------------------------------------

# (rule, action, gate) — structural violations would DROP rows at ingest,
# range drifts WARN; a rule passes its gate while fail_rate <= gate.
EXPECTATION_GATE = 0.25


@query(
    "events_quality_expectations",
    oracle=f"""
    WITH agg AS (
      SELECT COUNT(*) AS n_rows,
             SUM(CASE WHEN ts IS NOT NULL THEN 1 ELSE 0 END) AS p1,
             SUM(CASE WHEN event_type IN
                   ('click','view','purchase','signup','error')
                 THEN 1 ELSE 0 END) AS p2,
             SUM(CASE WHEN json_extract(props, '$.k') IS NOT NULL
                 THEN 1 ELSE 0 END) AS p3,
             SUM(CASE WHEN value >= 0 AND value <= 200 THEN 1 ELSE 0 END) AS p4,
             SUM(CASE WHEN CAST(json_extract(props, '$.k') AS INTEGER) < 80
                 THEN 1 ELSE 0 END) AS p5
      FROM events
    ),
    rules(rule_no, rule, action, n_pass) AS (
      SELECT 1, 'ts_not_null',        'drop', p1 FROM agg
      UNION ALL SELECT 2, 'known_event_type', 'drop', p2 FROM agg
      UNION ALL SELECT 3, 'props_has_k',      'drop', p3 FROM agg
      UNION ALL SELECT 4, 'value_in_range',   'warn', p4 FROM agg
      UNION ALL SELECT 5, 'props_k_lt_80',    'warn', p5 FROM agg
    )
    SELECT CAST(rule_no AS INTEGER) AS rule_no, rule, action,
           (SELECT CAST(n_rows AS BIGINT) FROM agg) AS n_rows,
           CAST(n_pass AS BIGINT) AS n_pass,
           CAST((SELECT n_rows FROM agg) - n_pass AS BIGINT) AS n_fail,
           -- 6 decimals: fixture row counts are powers of 10, so the
           -- division is exact at <= 5 decimals and the round can never
           -- hit a cross-engine half-tie (4 decimals did, at 0.19845)
           round(CAST((SELECT n_rows FROM agg) - n_pass AS DOUBLE)
                 / (SELECT n_rows FROM agg), 6) AS fail_rate,
           (((SELECT n_rows FROM agg) - n_pass) * 1.0
              <= {EXPECTATION_GATE} * (SELECT n_rows FROM agg)) AS gate_ok
    FROM rules
    ORDER BY rule_no
    """,
)
def events_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations report (the Delta Live Tables /
    Great Expectations contract shape): five declared rules — three
    structural DROP rules (non-null event time, closed event-type
    vocabulary, required props key) and two WARN-level range drifts
    (value ceiling, props.k ceiling) — each reporting pass/fail counts,
    the fail rate, and whether it clears its {EXPECTATION_GATE:.0%}
    gate. This is the admission control a training-data pipeline runs
    on every ingest batch before rows reach the corpus.

    Scale shape: ALL rules evaluate in ONE scan as conditional sums
    inside a single map-side-combined aggregate (never one pass per
    rule); the per-rule rows are a 5-row stack of that 1-row aggregate.
    At 100 TB the report costs exactly one projection-pruned pass."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    rules = [
        ("ts_not_null", "drop", F.col("ts").isNotNull()),
        (
            "known_event_type",
            "drop",
            F.col("event_type").isin("click", "view", "purchase", "signup", "error"),
        ),
        ("props_has_k", "drop", k.isNotNull()),
        ("value_in_range", "warn", (F.col("value") >= 0) & (F.col("value") <= 200)),
        ("props_k_lt_80", "warn", k.cast("int") < 80),
    ]
    agg = ev.agg(
        F.count("*").alias("n_rows"),
        *[
            F.sum(cond.cast("long")).alias(f"p{i}")
            for i, (_, _, cond) in enumerate(rules, start=1)
        ],
    )
    stack = ", ".join(
        f"{i}, '{name}', '{action}', p{i}"
        for i, (name, action, _) in enumerate(rules, start=1)
    )
    rows = agg.select(
        "n_rows",
        F.expr(
            f"stack({len(rules)}, {stack}) AS (rule_no, rule, action, n_pass)"
        ),
    )
    fail = F.col("n_rows") - F.col("n_pass")
    return rows.select(
        F.col("rule_no").cast("int").alias("rule_no"),
        "rule",
        "action",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_pass").cast("bigint").alias("n_pass"),
        fail.cast("bigint").alias("n_fail"),
        F.round(fail.cast("double") / F.col("n_rows"), 6).alias("fail_rate"),
        (fail * 1.0 <= EXPECTATION_GATE * F.col("n_rows")).alias("gate_ok"),
    ).orderBy("rule_no")
