"""Watermarked stream-stream join.

Completes the streaming surface (ingest → windowed agg → stateful
sessionizer → stream-stream join): correlate two live event streams with
bounded state.  Both sides carry a watermark and the join predicate bounds
the event-time distance, so Spark can evict state for rows whose match
window has passed — without the time bound, stream-stream inner join state
grows forever.

Scale: state size ≈ rate × (watermark + join window) per side, hash
partitioned by the join key; skewed keys salt exactly like batch joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_views_to_clicks(
    views: DataFrame,
    clicks: DataFrame,
    max_delay: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Inner-join each click to the user's views at most ``max_delay``
    before it.  Inputs need (user_id, ts[, event_id]) columns; both may be
    streaming DataFrames (the time-bounded predicate keeps state finite) or
    batch DataFrames (same plan, no state).

    Output: (user_id, view_ts, click_ts, delay_seconds).
    """
    v = views.select(
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    if views.isStreaming:
        v = v.withWatermark("view_ts", watermark)
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    joined = v.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") > F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {max_delay}")),
    )
    return joined.select(
        "user_id",
        "view_ts",
        "click_ts",
        (F.unix_timestamp("click_ts") - F.unix_timestamp("view_ts")).alias(
            "delay_seconds"
        ),
    )
