"""Streaming heavy hitters: Misra-Gries summaries maintained in keyed
streaming state — the streaming twin of the batch sketch family
(operators/sketches.py misra_gries_candidates; catalog heavy_hitters_mg).

Keys are hashed into a FIXED number of state partitions and each partition
keeps one Misra-Gries summary (``capacity`` counters) across micro-batches,
so total state is exactly n_partitions x capacity counters regardless of
key cardinality or stream length — the property that makes frequency
monitoring safe on an unbounded 100 TB/day feed where per-key state
(a streaming groupBy count) would grow without bound.

Guarantee (same as the batch form): a counter undercounts its key by at
most (partition rows)/(capacity+1), and any key whose count in a partition
exceeds that bound is present — no false negatives above the threshold.
Per micro-batch each partition emits its current candidate set with
lower-bound counts; the caller joins/exact-recounts downstream exactly as
the batch pipeline does.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("partition", T.IntegerType()),
        T.StructField("key", T.LongType()),
        T.StructField("lower_count", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("ks", T.ArrayType(T.LongType())),
        T.StructField("cs", T.ArrayType(T.LongType())),
    ]
)


def _mg_update(mg: dict[int, int], keys, capacity: int) -> None:
    """Classic Misra-Gries: increment known keys, admit while below
    capacity, otherwise decrement-all (dropping zeros)."""
    for k in keys:
        k = int(k)
        if k in mg:
            mg[k] += 1
        elif len(mg) < capacity:
            mg[k] = 1
        else:
            drop = [d for d in mg if mg[d] == 1]
            for d in mg:
                mg[d] -= 1
            for d in drop:
                del mg[d]


def heavy_hitters_stream(
    df: DataFrame,
    key_col: str = "user_id",
    n_partitions: int = 8,
    capacity: int = 64,
) -> DataFrame:
    """(.., key_col) stream → per-micro-batch candidate heavy hitters.

    Output rows: (partition, key, lower_count) — the partition's current
    summary after folding in the batch.  State never exceeds
    n_partitions x capacity (key, count) pairs.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (part,) = key
        if state.exists:
            ks, cs = state.get
            mg = dict(zip(ks, cs))
        else:
            mg = {}
        for pdf in pdfs:
            _mg_update(mg, pdf[key_col].to_numpy(), capacity)
        state.update((list(mg.keys()), list(mg.values())))
        if mg:
            yield pd.DataFrame(
                {
                    "partition": part,
                    "key": list(mg.keys()),
                    "lower_count": list(mg.values()),
                }
            )

    bucketed = df.select(
        F.pmod(F.hash(F.col(key_col)), F.lit(n_partitions))
        .cast("int")
        .alias("_p"),
        F.col(key_col),
    )
    return bucketed.groupBy("_p").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
