"""Streaming exact deduplication under a watermark.

The reference gets effectively-once fact loading from its per-snapshot
DELETE-then-INSERT (process_snapshot.py:278) — a reconciliation-style
dedup.  The Spark-native streaming expression of the same guarantee for an
at-least-once source (a re-delivering queue, an S3 notification that fires
twice) is ``dropDuplicatesWithinWatermark``: state holds one entry per key
only until the watermark passes the key's event time, so state size is
bounded by (watermark span x key arrival rate), not stream length — the
property that makes it safe on an unbounded 100 TB/day feed.

Batch/stream symmetry: on a batch DataFrame the same helper degrades to a
plain ``dropDuplicates`` (no watermark, no state), which is what lets the
exact_dedup DuckDB oracle vouch for the streaming plan's key semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """Keep the first-arriving row per ``key_cols``; duplicates arriving
    within ``watermark`` of the original are dropped, later ones fall
    through to the reconciliation path (backfill / idempotent reload),
    mirroring how windowed_event_stats splits late-data handling.

    ``watermark=None`` (or a non-streaming ``df``) gives the batch
    semantics: global first-wins dedup with no state bound.
    """
    if watermark is not None and df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return df.dropDuplicates(key_cols)
