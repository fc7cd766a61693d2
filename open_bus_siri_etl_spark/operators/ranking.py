"""Distributed global ranking — row_number/ntile over a total order WITHOUT
the single-partition WindowExec bottleneck.

``Window.orderBy(...)`` with no partitionBy plans as ``Exchange
SinglePartition``: every row moves to ONE task, which is the canonical
100 TB cliff (the reference never needs a global order; our catalog's
``revenue_deciles`` tolerates it only because its input is post-aggregation
small).  The scale path implemented here:

1. ``repartitionByRange`` on the order key — Spark range-samples the key so
   partitions hold contiguous, balanced key ranges (one balanced shuffle).
2. ``sortWithinPartitions`` — partition-local sort, no data movement.
3. ``monotonically_increasing_id`` — per the Spark contract the id is
   ``partition_id * 2^33 + local_seq`` with ``local_seq`` consecutive from 0
   in row order, so ``id % 2^33`` IS the partition-local row number, free.
4. per-partition counts (tiny: one row per partition) → cumulative offsets
   via a window over that tiny frame → broadcast-joined back.

Total cost: one balanced shuffle of the data + one broadcast of P offset
rows, vs one all-to-one shuffle.  Equality with the WindowExec result is
asserted in tests/test_training_ops.py for both row_number and ntile
(including ntile's uneven-bucket remainder rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PARTITION_MASK = (1 << 33) - 1


def global_row_number(
    df: DataFrame,
    order_cols: list[str | Column],
    rn_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a 1-based global row number in ``order_cols`` order.

    ``order_cols`` must be a total order (append a unique tiebreaker
    column); ties would otherwise rank nondeterministically — same
    precondition row_number's OVER (ORDER BY ...) has in any engine.
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftrightunsigned(F.col("_mid"), 33))
        .withColumn("_local", F.col("_mid").bitwiseAND(F.lit(_PARTITION_MASK)))
    )
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(w), F.lit(0)).alias("_offset")
    )
    out = ranged.join(F.broadcast(offsets), "_pid").withColumn(
        rn_col, (F.col("_offset") + F.col("_local") + 1).cast("bigint")
    )
    return out.drop("_mid", "_pid", "_local", "_offset")


def distributed_ntile(
    df: DataFrame,
    order_cols: list[str | Column],
    k: int,
    tile_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """ntile(k) over a global order, scale-out.

    Reproduces SQL ntile's remainder rule exactly: with N rows, the first
    ``N % k`` tiles get ``N // k + 1`` rows, the rest ``N // k``.
    """
    ranked = global_row_number(df, order_cols, rn_col="_grn",
                               num_partitions=num_partitions)
    # a count(*) window over the unpartitioned frame would be
    # single-partition again; broadcast the scalar total instead
    total = ranked.agg(F.count(F.lit(1)).alias("_N"))
    out = (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("_q", F.expr(f"_N div {k}"))
        .withColumn("_r", F.col("_N") % k)
        .withColumn(
            tile_col,
            F.when(
                F.col("_grn") <= F.col("_r") * (F.col("_q") + 1),
                F.expr("(_grn - 1) div (_q + 1)"),
            ).otherwise(
                F.col("_r") + F.expr("(_grn - 1 - _r * (_q + 1)) div _q")
            )
            + 1,
        )
    )
    return out.drop("_grn", "_N", "_q", "_r")
