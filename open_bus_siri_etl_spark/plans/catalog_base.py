"""The query catalog: every SURVEY §2 operator family expressed over the
driver's synthetic star schema, each with a DuckDB oracle (FIXTURES.md §5
gives the operator→fixture mapping).

Numeric-parity rules (Spark result must hash-equal the DuckDB result):
- double aggregation order is nondeterministic → sum in DECIMAL (exact,
  order-independent), cast the final value to DOUBLE.  Input doubles are cast
  to DECIMAL(18,2) first; a double is never an exact .xx5 tie so the
  double→decimal rounding is identical in both engines.
- averages: exact decimal sum cast to double, divided by the count — one
  IEEE division on identical operands.
- every computed column aliased identically on both sides (driver compares
  by sorted column name).

Scale notes are attached per query; the flagship patterns:
- big⋈big joins (lineitem⋈orders) stay shuffle joins for AQE to manage;
  genuinely small dims (nation/region) get explicit broadcast() hints.
- aggregations are partial-agg friendly (no distinct-heavy shapes in hot
  paths); windows partition by high-cardinality keys (user_id), never by a
  constant.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType


import weakref

# WeakSet, not id()-keyed: CPython reuses ids after GC, so an id cache could
# collide a new SparkSession with a dead one's id and silently skip the pin
_SESSIONS_PINNED: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()

# r14 (guide §1/§5 — driver-side overhead): one relation per (session,
# path): every spark.read.parquet() call re-lists the directory and re-reads
# a footer for schema inference through py4j (~50 ms per table per call —
# flagship_snowflake paid 5 of those on EVERY fn() build, ~0.4 s of its
# bench time was plan construction).  Catalog inputs are immutable snapshot
# dirs, so the DataFrame (a logical plan node — no data, no .cache()) is
# memoized per session.  Downstream transformations build on the shared
# relation exactly as they would on a catalog table.  WeakKeyDictionary:
# dead sessions drop their memo with them.
_RELATION_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    memo = _RELATION_MEMO.setdefault(spark, {})
    key = (sf_dir, name)
    got = memo.get(key)
    if got is None:
        got = memo[key] = _t_uncached(spark, sf_dir, name)
    return got


def _t_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # timestamp semantics must not depend on the caller's session timezone
    # (the driver's harness session may not be UTC): pin it here, so
    # date_format/date_trunc/to_timestamp agree with the tz-naive oracle.
    # Pinning is once per session (queries call t() several times; the conf
    # RPCs are pure overhead after the first call).
    if spark not in _SESSIONS_PINNED:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        _SESSIONS_PINNED.add(spark)
    if name == "events":
        # the physical type of events.ts has drifted across driver testdata
        # regenerations (TIMESTAMP(NANOS) in round 1, timestamp[us] since
        # round 2) — adapt to whatever is actually on disk.  nanosAsLong
        # (pinned above) makes a NANOS column read as int64 nanos (Spark's
        # vectorized reader rejects NANOS otherwise) and is a no-op for
        # micros columns.
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # int64 nanos → floor to micros (exactly what DuckDB does on read)
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if isinstance(ts_type, TimestampNTZType):
            # oracle reads the same file as tz-naive; under the pinned UTC
            # session a plain TIMESTAMP has identical field values, and the
            # rest of the catalog (unix_micros, windows, date_trunc) expects it
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dec(c: Column | str, scale: int = 2) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(f"decimal(18,{scale})")


@dataclass
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → non-SQL-expressible (rows-only)
    note: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, sql: str | None, note: str = ""):
    def deco(fn):
        # a duplicate name would silently REPLACE the earlier entry in
        # place — inside the driver's first-50 graded window that swaps a
        # reference-parity query for whatever was appended last; fail loud
        if name in REGISTRY:
            raise ValueError(f"catalog entry {name!r} registered twice")
        REGISTRY[name] = Query(fn=fn, sql=sql, note=note)
        return fn

    return deco
