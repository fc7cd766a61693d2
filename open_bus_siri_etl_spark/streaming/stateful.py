"""Custom stateful streaming operator: per-key session windows via
``applyInPandasWithState`` (the W3 gap-sessionization as a STREAMING op).

The batch engine computes sessions with lag/sum windows (plans/catalog.py
``gap_sessionization``); on an unbounded stream that requires keyed state:
per user we keep (session_start, last_ts, n_events) across micro-batches and
emit a session row once its gap closes.  This is the pattern the engine uses
for any custom stateful operator Spark lacks natively — Arrow-batched pandas
per key-group, explicit GroupState, watermark-driven timeout.

State size is O(active keys), not O(events) — the 100 TB concern is handled
by Spark's state store (RocksDB in production configs) + timeouts.
"""

from __future__ import annotations

import datetime
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start", T.DoubleType()),
        T.StructField("last_ts", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, timeout_minutes: int = 60
) -> DataFrame:
    """events (user_id, ts) stream → closed session rows.

    Emits a session when a later event arrives more than ``gap_minutes``
    after the previous one, or when the key times out (processing-time
    timeout stands in for a watermark close on this bounded test corpus).
    """
    gap_s = gap_minutes * 60

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                state.remove()
                yield _session_pdf(user_id, start, last, n)
            return
        start, last, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple] = []
        ts_values = sorted(
            t.timestamp()
            for pdf in pdfs
            for t in pd.to_datetime(pdf["ts"])
        )
        for ts in ts_values:
            if last is not None and ts - last > gap_s:
                closed.append((start, last, n))
                start, n = None, 0
            if start is None:
                start = ts
            n += 1
            last = ts
        state.update((start, last, n))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        for s in closed:
            yield _session_pdf(user_id, *s)

    def _session_pdf(user_id: int, start: float, last: float, n: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [datetime.datetime.utcfromtimestamp(start)],
                "session_end": [datetime.datetime.utcfromtimestamp(last)],
                "n_events": [n],
            }
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
