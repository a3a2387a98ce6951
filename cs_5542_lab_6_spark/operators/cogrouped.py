"""Cogrouped pandas merge — the ``cogroup().applyInPandas`` surface.

Completes the engine's Arrow-UDF coverage (§2.11): pandas_udf scalar
(embedder), mapInPandas (multimodal decode), applyInPandasWithState
(streaming), and — here — the cogrouped two-relation merge, Spark's
mechanism for per-key logic over TWO tables that built-in joins don't
express naturally (sequence alignment, per-key reconciliation,
custom as-of semantics).

The operator: per-user click→purchase attribution. Each user's clicks
and purchases arrive as two ordered pandas frames; a purchase is
'attributed' when some click precedes it within the attribution window.
The same semantics are expressible (expensively) as a correlated
EXISTS — which is exactly what the DuckDB oracle runs, so the custom
pandas path is value-checked cross-engine like every Catalyst operator.

Scale shape: cogroup shuffles both relations once on user_id and streams
each group through the Python worker as Arrow batches — cost is one
co-partitioned shuffle, the same as a join on user_id; per-group work is
O(n log n) in that user's events, never corpus-wide. Skewed users are the
caveat (one group = one task) — the standard mitigation is pre-capping
per-key event counts upstream.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

ATTRIBUTION_WINDOW = "1 hour"  # oracle interval; pandas uses the timedelta twin
_OUT_SCHEMA = (
    "user_id long, n_clicks long, n_purchases long, "
    "first_click_ts timestamp, last_purchase_ts timestamp, "
    "attributed_purchases long"
)


def _merge_user(key, clicks: pd.DataFrame, purchases: pd.DataFrame) -> pd.DataFrame:
    """Per-user merge: counts, first/last timestamps, and the count of
    purchases with a click in (purchase_ts - window, purchase_ts]."""
    window = pd.Timedelta(ATTRIBUTION_WINDOW)
    n_clicks, n_purchases = len(clicks), len(purchases)
    first_click = clicks["ts"].min() if n_clicks else pd.NaT
    last_purchase = purchases["ts"].max() if n_purchases else pd.NaT
    attributed = 0
    if n_clicks and n_purchases:
        cts = clicks["ts"].sort_values().reset_index(drop=True)
        for pt in purchases["ts"]:
            # latest click at or before the purchase
            idx = cts.searchsorted(pt, side="right") - 1
            if idx >= 0 and (pt - cts[idx]) <= window:
                attributed += 1
    return pd.DataFrame(
        [
            {
                "user_id": key[0],
                "n_clicks": n_clicks,
                "n_purchases": n_purchases,
                "first_click_ts": first_click,
                "last_purchase_ts": last_purchase,
                "attributed_purchases": attributed,
            }
        ]
    )


@query(
    "user_click_purchase_cogroup",
    oracle=f"""
    WITH c AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
    ),
    users AS (
      SELECT user_id FROM c UNION SELECT user_id FROM p
    ),
    cagg AS (
      SELECT user_id, COUNT(*) AS n_clicks, MIN(ts) AS first_click_ts
      FROM c GROUP BY user_id
    ),
    pagg AS (
      SELECT user_id, COUNT(*) AS n_purchases, MAX(ts) AS last_purchase_ts
      FROM p GROUP BY user_id
    ),
    pattr AS (
      SELECT p.user_id, p.event_id,
             MAX(CASE WHEN c.ts IS NOT NULL THEN 1 ELSE 0 END) AS hit
      FROM p LEFT JOIN c
        ON c.user_id = p.user_id
       AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '{ATTRIBUTION_WINDOW}'
      GROUP BY p.user_id, p.event_id
    ),
    aattr AS (
      SELECT user_id, CAST(SUM(hit) AS BIGINT) AS attributed_purchases
      FROM pattr GROUP BY user_id
    )
    SELECT u.user_id,
           CAST(COALESCE(ca.n_clicks, 0) AS BIGINT) AS n_clicks,
           CAST(COALESCE(pa.n_purchases, 0) AS BIGINT) AS n_purchases,
           ca.first_click_ts,
           pa.last_purchase_ts,
           CAST(COALESCE(aa.attributed_purchases, 0) AS BIGINT)
             AS attributed_purchases
    FROM users u
    LEFT JOIN cagg ca USING (user_id)
    LEFT JOIN pagg pa USING (user_id)
    LEFT JOIN aattr aa USING (user_id)
    ORDER BY u.user_id
    """,
)
def user_click_purchase_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user click→purchase attribution through cogrouped pandas: both
    event streams shuffle once on user_id, each user's (clicks,
    purchases) pair streams through ``_merge_user`` as Arrow batches.
    Deterministic (counts, min/max timestamps, inclusive-window
    attribution with binary search), so the correlated-EXISTS DuckDB
    twin value-matches exactly."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    clicks = ev.filter(F.col("event_type") == "click").drop("event_type")
    purchases = ev.filter(F.col("event_type") == "purchase").drop("event_type")
    merged = (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(_merge_user, schema=_OUT_SCHEMA)
    )
    return merged.orderBy("user_id")
