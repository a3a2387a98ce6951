"""Cogrouped pandas merge — the ``cogroup().applyInPandas`` surface.

Completes the engine's Arrow-UDF coverage (§2.11): pandas_udf scalar
(embedder), mapInPandas (multimodal decode), applyInPandasWithState
(streaming), and — here — the cogrouped two-relation merge, Spark's
mechanism for per-key logic over TWO tables that built-in joins don't
express naturally (sequence alignment, per-key reconciliation,
custom as-of semantics).

The operator: per-user click→purchase attribution. A purchase is
'attributed' when some click precedes it within the attribution window.
The same semantics are expressible (expensively) as a correlated
EXISTS — which is exactly what the DuckDB oracle runs, so the custom
pandas path is value-checked cross-engine like every Catalyst operator.

Scale shape — the cogroup key is a HASH BUCKET of user_id, not user_id
itself. Cogrouping on the raw key means one Python call + one Arrow
round trip per user; measured at sf0.1 that overhead was ~10 ms × 1,500
users ≈ 15 s for 40k rows of actual work. Bucketing bounds the Python
call count at the shuffle-partition count regardless of user
cardinality, hands each call
a large Arrow batch (vectorization-friendly), and the per-bucket merge
is a fully vectorized ``pandas.merge_asof(by=user_id)`` — no Python
loop anywhere. Both relations still shuffle exactly once (on the
bucket), identical to a join's cost. Skewed users remain the caveat
(one user can't span buckets) — the standard mitigation is pre-capping
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


def _merge_bucket(key, clicks: pd.DataFrame, purchases: pd.DataFrame) -> pd.DataFrame:
    """Vectorized per-bucket merge over every user in the bucket.

    Counts, first/last timestamps via groupby aggregation; attribution
    (purchase has a click in ``[ts - window, ts]``) via ``merge_asof``
    with ``by=user_id`` + ``tolerance`` — the backward as-of match is
    exactly the 'latest click at or before the purchase' rule, and the
    tolerance bound is inclusive on both ends, matching the oracle's
    ``c.ts <= p.ts AND c.ts >= p.ts - INTERVAL`` predicate.
    """
    window = pd.Timedelta(ATTRIBUTION_WINDOW)

    for side_name, side in (("clicks", clicks), ("purchases", purchases)):
        missing = {"user_id", "ts"} - set(side.columns)
        if missing:
            # loud guard: Spark cogroup column pruning regressions deliver
            # a frame with only the grouping key (seen on shared-lineage
            # inputs) — fail with the evidence instead of a KeyError
            raise RuntimeError(
                f"cogroup delivered {side_name} without {sorted(missing)}; "
                f"columns={list(side.columns)} — check input lineages"
            )

    ts_dtype = clicks["ts"].dtype if len(clicks) else purchases["ts"].dtype

    def _empty(count_col: str, ts_col: str) -> pd.DataFrame:
        return pd.DataFrame(
            {count_col: pd.Series(dtype="int64"), ts_col: pd.Series(dtype=ts_dtype)},
            index=pd.Index([], dtype="int64", name="user_id"),
        )

    cagg = (
        clicks.groupby("user_id")["ts"].agg(["size", "min"]).rename(
            columns={"size": "n_clicks", "min": "first_click_ts"}
        )
        if len(clicks)
        else _empty("n_clicks", "first_click_ts")
    )
    pagg = (
        purchases.groupby("user_id")["ts"].agg(["size", "max"]).rename(
            columns={"size": "n_purchases", "max": "last_purchase_ts"}
        )
        if len(purchases)
        else _empty("n_purchases", "last_purchase_ts")
    )

    if len(clicks) and len(purchases):
        matched = pd.merge_asof(
            purchases[["user_id", "ts"]].sort_values("ts", kind="stable"),
            clicks[["user_id", "ts"]]
            .sort_values("ts", kind="stable")
            .rename(columns={"ts": "click_ts"}),
            left_on="ts",
            right_on="click_ts",
            by="user_id",
            direction="backward",
            tolerance=window,
        )
        aattr = matched.groupby("user_id")["click_ts"].count().rename("attributed_purchases")
    else:
        aattr = pd.Series(name="attributed_purchases", dtype="int64")

    out = cagg.join(pagg, how="outer").join(aattr, how="outer")
    out.index.name = "user_id"
    out = out.reset_index()
    for col in ("n_clicks", "n_purchases", "attributed_purchases"):
        out[col] = out[col].fillna(0).astype("int64")
    return out[
        [
            "user_id",
            "n_clicks",
            "n_purchases",
            "first_click_ts",
            "last_purchase_ts",
            "attributed_purchases",
        ]
    ]


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
    """Per-user click→purchase attribution through bucketed cogrouped
    pandas: both event streams shuffle once on ``pmod(hash(user_id))``,
    each bucket's (clicks, purchases) pair streams through
    ``_merge_bucket`` as one large Arrow batch, and the per-user as-of
    matching inside is vectorized ``merge_asof``. Deterministic (counts,
    min/max timestamps, inclusive-window attribution), so the
    correlated-EXISTS DuckDB twin value-matches exactly."""
    # One bucket per shuffle partition: each pandas call then owns a full
    # Arrow batch's worth of users (per-call overhead measured ~10 ms —
    # with per-USER groups that was 15 s of pure overhead for 40k rows),
    # and the bucket count scales with the cluster's configured
    # parallelism instead of a hardcoded constant.
    n_buckets = max(1, int(spark.conf.get("spark.sql.shuffle.partitions", "200")))

    # Each side gets its OWN scan lineage: deriving both cogroup sides
    # from one shared DataFrame + identical computed bucket aliases trips
    # attribute-resolution in Spark 4.1's cogroup column pruning (the
    # right side arrives in the Python worker pruned to just the
    # grouping key). Two scans cost nothing — the parquet read is
    # pushdown-pruned to 3 columns either way.
    def _side(event_type: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        return ev.filter(F.col("event_type") == event_type).select(
            "user_id", "ts", F.pmod(F.hash("user_id"), F.lit(n_buckets)).alias("bucket")
        )

    clicks = _side("click")
    purchases = _side("purchase")
    merged = (
        clicks.groupBy("bucket")
        .cogroup(purchases.groupBy("bucket"))
        .applyInPandas(_merge_bucket, schema=_OUT_SCHEMA)
    )
    # sortWithinPartitions, not orderBy: a global sort's RangePartitioner
    # sampling pass re-executes the whole cogroup child (measured 2x);
    # per-partition order is deterministic and the driver/oracle compare
    # is order-insensitive anyway.
    return merged.sortWithinPartitions("user_id")
