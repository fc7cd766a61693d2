"""Running per-key statistics on Spark 4's transformWithStateInPandas —
the successor API to applyInPandasWithState (typed state handles, timers,
composable state variables).  The engine carries one operator on each API:
the sessionizer (stateful.py) on the classic GroupState form, this running
aggregator on the new StatefulProcessor form, so either integration style
has a worked example.

Semantics: per key, maintain (count, sum, min, max) of ``value`` across
micro-batches and emit the UPDATED stats row for every key seen in the
batch — the streaming-metrics shape (per-device counters, per-user spend)
where downstream wants current totals, not deltas.  State is one fixed-size
row per key.

Runtime requirement: the transformWithState protocol speaks protobuf to
its state server, so ``google.protobuf`` must be importable by the Python
workers (any standard Spark 4 deployment ships it; this dev container
does not — ``transform_with_state_available()`` gates the tests).  The
operator additionally requires the RocksDB state store provider.
``running_stats_stream_gs`` is the value-identical twin on the classic
GroupState API (Arrow-only protocol, no protobuf) — it runs and is tested
everywhere, so the running-stats semantics never go unexercised.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

_STATE_SCHEMA = "n bigint, total double, vmin double, vmax double"


def out_schema(key_col: str) -> str:
    return f"{key_col} bigint, n bigint, total double, vmin double, vmax double"


def running_stats_stream(
    events: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """(key_col, value_col) stream → per-batch updated running stats per
    key; the output key column carries ``key_col``'s name.

    The processor class is defined inside this function on purpose:
    cloudpickle then serializes it BY VALUE, so Spark's state-schema
    driver worker (a separate Python process that does not import this
    package) can unpickle it — a module-level class is pickled by
    reference and crashes that worker.
    """

    class RunningStatsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", _STATE_SCHEMA)

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            n, total, vmin, vmax = (
                self._agg.get() if self._agg.exists() else (0, 0.0, None, None)
            )
            for pdf in rows:
                vals = pdf[value_col].astype("float64")
                if not len(vals):
                    continue
                n += int(len(vals))
                total += float(vals.sum())
                bmin, bmax = float(vals.min()), float(vals.max())
                vmin = bmin if vmin is None else min(vmin, bmin)
                vmax = bmax if vmax is None else max(vmax, bmax)
            self._agg.update((n, total, vmin, vmax))
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "n": [n],
                    "total": [total],
                    "vmin": [vmin],
                    "vmax": [vmax],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningStatsProcessor(),
        outputStructType=out_schema(key_col),
        outputMode="Update",
        timeMode="None",
    )


def running_stats_stream_gs(
    events: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """The same running-stats semantics on the classic GroupState API
    (``applyInPandasWithState``) — per key, (count, sum, min, max) of
    ``value`` accumulate across micro-batches and every batch emits the
    UPDATED totals for the keys it touched.

    Twin of ``running_stats_stream``: identical output schema and values,
    different state API.  The GroupState protocol is Arrow-only (no
    protobuf state server), so THIS variant runs — and is tested — in
    environments where transformWithState's runtime dependency is absent;
    the StatefulProcessor variant stays the Spark-4-native path and keeps
    its gated test.  State per key is one fixed-size tuple either way, so
    both scale to high-cardinality key spaces bounded by state-store size,
    not executor memory.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, total, vmin, vmax = (
            state.get if state.exists else (0, 0.0, None, None)
        )
        for pdf in pdfs:
            vals = pdf[value_col].astype("float64")
            if not len(vals):
                continue
            n += int(len(vals))
            total += float(vals.sum())
            bmin, bmax = float(vals.min()), float(vals.max())
            vmin = bmin if vmin is None else min(vmin, bmin)
            vmax = bmax if vmax is None else max(vmax, bmax)
        state.update((n, total, vmin, vmax))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n": [n],
                "total": [total],
                "vmin": [vmin],
                "vmax": [vmax],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema(key_col),
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def transform_with_state_available() -> bool:
    """True when the runtime can execute transformWithStateInPandas
    (protobuf present for the state-server protocol)."""
    try:
        import importlib

        importlib.import_module("google.protobuf.descriptor")
        return True
    except Exception:
        return False
