"""Event-time windowed aggregation with watermarking.

The reference handles late data by reconciliation (daily pending-sweep +
backfill, update_pending_snapshots.py:85-106, dags.yaml:65-92) because a
row-at-a-time Postgres loader has no notion of event-time windows.  The
Spark-native expression of the same intent is `withWatermark` + `window()`:
late rows inside the watermark are merged into their window's state, rows
later than the watermark fall through to the reconciliation path (which we
keep — backfill.py — exactly like the reference).

One function serves both modes: on a batch DataFrame `window()` is a plain
grouping expression (no state); on a streaming DataFrame the same plan runs
incrementally with watermark-bounded state eviction.  That batch/stream
symmetry is the point of Structured Streaming, and it is what lets the
DuckDB oracle (date_trunc buckets) verify the streaming plan's semantics.

Scale notes: windowed aggregation shuffles on (window, key) — state size is
bounded by watermark × key cardinality, not stream length.  Partial
(map-side) aggregation applies as usual; skewed keys can reuse
operators/skew.py salting on the key column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = None,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` differs from ``window``) event-time
    aggregation: per (window, key) row count and value sum.

    ``watermark`` is only legal on streaming DataFrames; pass None for batch.
    Output: (window_start, window_end, <key_col>, n_events, total_value).
    """
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide or window)
    return (
        events.groupBy(win.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value"), 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )
