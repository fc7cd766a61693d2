"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Neither exists in the reference (SURVEY §2.5: equi-joins only) — these are
the training-data/time-series operators a 100 TB pipeline needs, expressed
as compositions of existing DataFrame ops (no UDFs, no nested-loop joins).

As-of join — "for each left row, the latest right row at or before it":
the naive formulation is an inequality join (BroadcastNestedLoopJoin — a
cartesian disaster at scale).  The scale-correct plan is UNION + single
sort: tag both sides, union them, and carry the last right-side value
forward within each key ordered by time (`last(..., ignorenulls=True)`
over rows UNBOUNDED PRECEDING).  One shuffle on the key, one sort, linear
state — the same plan shape pandas.merge_asof / kdb aj use, distributed.

Range join — "left rows whose point falls in a right row's interval":
bucketize time at interval-length granularity, explode each interval into
the buckets it overlaps, equi-join on (bucket) and refine with the exact
predicate.  Turns BroadcastNestedLoop into a shuffled equi-join whose
fan-out is bounded by interval_len/bucket_len + 1 copies per interval.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the most recent ``right``
    row (same ``on`` key, right.ts <= left.ts), or NULLs if none precedes.

    Ties on ts: the right row sorts before the left probe row (matching
    DuckDB/pandas ``>=`` as-of semantics).  Right-side payload columns are
    renamed with ``suffix``.  Strict ROW semantics: the matched right
    row's columns are taken together (a NULL payload in the latest prior
    row stays NULL — it is not back-filled from an older row; that
    per-column forward-fill is ``forward_fill``'s job, not as-of's).

    ``tolerance_sec`` (pandas ``merge_asof(tolerance=)`` / kdb ``wj``
    semantics): when set, a carried match older than the window —
    ``left.ts - right.ts > tolerance_sec`` in whole seconds — yields NULLs
    instead, exactly as if no right row preceded.  The staleness cutoff is
    a post-carry column expression, so the scale shape is unchanged: one
    shuffle on the key, one sort, linear carry-forward state — never a
    nested-loop join.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, ts_col)]
    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.select(
        on,
        ts_col,
        # the whole right ROW as one struct (its ts first — the tolerance
        # window must be evaluated against the ts of the SAME row that
        # supplied the payload; carrying columns independently would let a
        # NULL in the newest row's payload surface an older, staler value
        # while the freshness check used the newest ts)
        F.struct(
            F.col(ts_col).alias("_rts"),
            *[F.col(c).alias(c + suffix) for c in right_cols],
        ).alias("_rrow"),
    ).withColumn("_side", F.lit(0))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # rows UNBOUNDED PRECEDING..CURRENT with right rows (_side=0) sorting
    # first on ties ⇒ last() sees every right row at ts' <= ts; ONE carried
    # struct = the latest prior right ROW with all its columns (strict
    # row-asof semantics, matching DuckDB/pandas — a NULL payload in the
    # latest row is carried as that row's NULL, not skipped)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last("_rrow", ignorenulls=True).over(w).alias("_rrow_c")
    )
    if tolerance_sec is None:
        fresh = F.col("_rrow_c").isNotNull()
    else:
        # native-precision difference (pandas merge_asof(tolerance=)
        # semantics): comparing per-side floor-to-second truncations would
        # let a match up to ~1 s staler than the window pass when
        # timestamps carry sub-second parts
        fresh = (
            F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("_rrow_c._rts"))
        ) <= int(tolerance_sec) * 1_000_000
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            *left.columns,
            *[
                F.when(fresh, F.col(f"_rrow_c.{c + suffix}")).alias(c + suffix)
                for c in right_cols
            ],
        )
    )


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
    bucket_seconds: int = 1800,
) -> Column | DataFrame:
    """Inner range join: (point, interval) pairs with start <= ts < end.

    Both sides are bucketed at ``bucket_seconds``; intervals explode into
    every bucket they overlap (sequence over epoch buckets), then a plain
    equi-join on bucket + exact refine.  Choose bucket_seconds near the
    typical interval length: fan-out per interval is
    ceil(len/bucket)+1 rows, and each point lands in exactly one bucket.
    """
    p_bucket = (F.unix_timestamp(F.col(point_ts)) / bucket_seconds).cast("long")
    i_from = (F.unix_timestamp(F.col(start_ts)) / bucket_seconds).cast("long")
    i_to = (F.unix_timestamp(F.col(end_ts)) / bucket_seconds).cast("long")

    pts = points.withColumn("_bucket", p_bucket)
    ivs = intervals.withColumn("_bucket", F.explode(F.sequence(i_from, i_to)))
    return (
        pts.join(ivs, "_bucket")
        .filter((F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts)))
        .drop("_bucket")
    )
