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


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # the synthetic events table is written with TIMESTAMP(NANOS), which
        # Spark's vectorized Parquet reader rejects; read the raw int64 nanos
        # and floor-convert to microseconds (exactly what DuckDB does on read)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
        REGISTRY[name] = Query(fn=fn, sql=sql, note=note)
        return fn

    return deco


# ---------------------------------------------------------------------------
# J2/J3 — the flagship snowflake re-assembly (reference validate_snapshots.py:
# 16-27: vehicle_location ⋈ ride_stop ⋈ ride ⋈ stop ⋈ route per snapshot).
# Analog: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region, aggregated.
# ---------------------------------------------------------------------------


@register(
    "flagship_snowflake",
    """
    SELECT r_name, n_name,
           count(*) AS n_items,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY r_name, n_name
    """,
    note="J3 4-way snowflake; nation/region broadcast, lineitem⋈orders shuffle (AQE)",
)
def flagship_snowflake(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, od = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "orders")
    cu, na, re = (
        t(spark, sf_dir, "customer"),
        t(spark, sf_dir, "nation"),
        t(spark, sf_dir, "region"),
    )
    return (
        li.join(od.filter(F.col("o_orderdate") >= "1996-01-01"), li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    note="A1 aggregation battery (TPC-H Q1 shape); map-side partial agg, 6-group output",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2000-09-02")
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(disc_price * (F.lit(1) + dec("l_tax"))).cast("double").alias("sum_charge"),
        (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
        (F.sum(dec("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# J1/D1/D2 — get-or-create novelty & dedup (reference process_snapshot.py:113-211)
# ---------------------------------------------------------------------------


@register(
    "dim_upsert_novelty",
    """
    SELECT DISTINCT o_custkey AS custkey
    FROM orders
    WHERE NOT EXISTS (
        SELECT 1 FROM customer WHERE c_custkey = o_custkey AND c_custkey % 7 <> 0
    )
    """,
    note="J1 anti-join novelty: batch keys absent from the existing dim subset",
)
def dim_upsert_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    batch = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey")).distinct()
    existing = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 7 != 0)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return batch.join(existing, "custkey", "left_anti")


@register(
    "discovery_anti_join",
    """
    SELECT DISTINCT user_id
    FROM events
    WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = user_id)
    """,
    note="J4/W6 discovery: listed ids minus registered ids (update_pending_snapshots.py:47-68)",
)
def discovery_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    listed = t(spark, sf_dir, "events").select("user_id").distinct()
    registered = t(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("user_id"))
    return listed.join(registered, "user_id", "left_anti")


@register(
    "dedup_first_wins",
    """
    SELECT user_id, event_type, ts AS first_ts, value AS first_value,
           event_id AS first_event_id
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    note="D2 deterministic first-wins dedup (cache-guard semantics, process_snapshot.py:110-111)",
)
def dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("first_ts"),
            F.col("value").alias("first_value"),
            F.col("event_id").alias("first_event_id"),
        )
    )


@register(
    "duplicate_key_detection",
    """
    SELECT user_id, event_type, count(*) AS n
    FROM events GROUP BY user_id, event_type HAVING count(*) > 1
    """,
    note="D3 duplicate-key detection (validate_snapshots.py:38-52)",
)
def duplicate_key_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter("n > 1")
    )


# ---------------------------------------------------------------------------
# A1-A3 / W1-W2 — counters, min/max, order-by-limit
# ---------------------------------------------------------------------------


@register(
    "event_counters",
    """
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
    note="A1 per-type counters (the reference's defaultdict stats, set-oriented)",
)
def event_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
    )


@register(
    "latest_per_key",
    """
    SELECT user_id, ts AS latest_ts, event_id AS latest_event_id
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    note="A2/T2 argmax resume-point (max loaded snapshot, process_snapshot.py:495-498)",
)
def latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "user_id",
            F.col("ts").alias("latest_ts"),
            F.col("event_id").alias("latest_event_id"),
        )
    )


@register(
    "global_minmax",
    """
    SELECT min(o_orderdate) AS first_date, max(o_orderdate) AS last_date,
           count(*) AS n_orders
    FROM orders
    """,
    note="A3 global min/max (first GTFS date, update_pending_snapshots.py:88)",
)
def global_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "orders").agg(
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "top_orders",
    """
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    note="W1 ORDER BY DESC + LIMIT (latest-loaded-snapshot shape); TakeOrderedAndProject, no full sort",
)
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


# ---------------------------------------------------------------------------
# W3-W5 — gap sessionization, chunking, minute sequences
# (reference parallel_process_old_missing_snapshots.py:42-88, process_snapshot.py:352-395)
# ---------------------------------------------------------------------------

GAP_MINUTES = 30
CHUNK_SIZE = 100


@register(
    "gap_sessionization",
    f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL {GAP_MINUTES} MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
    note="W3 islands pattern: lag → gap flag → running sum → session agg "
    "(the reference's consecutive-minute run folding, generalized)",
)
def gap_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = t(spark, sf_dir, "events")
    flagged = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
                > GAP_MINUTES * 60
            ),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn("session_id", F.sum("is_new").over(run))
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "chunked_batches",
    f"""
    SELECT user_id, chunk, count(*) AS n_events, min(ts) AS chunk_start,
           max(ts) AS chunk_end
    FROM (
        SELECT user_id, ts,
               CAST(floor((row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) - 1)
                   / {CHUNK_SIZE}) AS INT) AS chunk
        FROM events
    ) GROUP BY user_id, chunk
    """,
    note="W4 fixed-size chunking of per-key runs (batch_minutes splitting, parallel_...py:72-88)",
)
def chunked_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t(spark, sf_dir, "events")
        .withColumn(
            "chunk",
            F.floor((F.row_number().over(w) - 1) / CHUNK_SIZE).cast("int"),
        )
        .groupBy("user_id", "chunk")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("chunk_start"),
            F.max("ts").alias("chunk_end"),
        )
    )


@register(
    "missing_minutes",
    """
    WITH minutes AS (
        SELECT gs AS minute FROM generate_series(
            TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-03 23:59:00',
            INTERVAL 1 MINUTE) t(gs)
    ), seen AS (
        SELECT DISTINCT date_trunc('minute', ts) AS minute FROM events
    )
    SELECT minute FROM minutes
    WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.minute = minutes.minute)
    """,
    note="W5 minute-sequence generation + anti join = missing-snapshot discovery "
    "(process_snapshot.py:352-395 walk + update_pending registration)",
)
def missing_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    minutes = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-01-03 23:59:00").cast("timestamp"),
                F.expr("interval 1 minute"),
            )
        ).alias("minute")
    )
    seen = (
        t(spark, sf_dir, "events")
        .select(F.date_trunc("minute", "ts").alias("minute"))
        .distinct()
    )
    return minutes.join(seen, "minute", "left_anti")


# ---------------------------------------------------------------------------
# P-family — scalar projections: snapshot-id formatting, JSON props, defaults
# ---------------------------------------------------------------------------


@register(
    "snapshot_id_format",
    """
    SELECT event_id, strftime(ts, '%Y/%m/%d/%H/%M') AS snapshot_id,
           strptime(strftime(ts, '%Y/%m/%d/%H/%M'), '%Y/%m/%d/%H/%M') AS minute_ts
    FROM events WHERE event_id % 50 = 0
    """,
    note="P8 id ⇄ timestamp round-trip (process_snapshot.py:354-355,365)",
)
def snapshot_id_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 50 == 0)
        .select(
            "event_id",
            F.date_format("ts", "yyyy/MM/dd/HH/mm").alias("snapshot_id"),
            F.to_timestamp(
                F.date_format("ts", "yyyy/MM/dd/HH/mm"), "yyyy/MM/dd/HH/mm"
            ).alias("minute_ts"),
        )
    )


@register(
    "json_props_extract",
    """
    SELECT event_type,
           count(*) AS n,
           sum(COALESCE(CAST(json_extract_string(props, '$.k') AS INTEGER), -1)) AS sum_k,
           min(COALESCE(CAST(json_extract_string(props, '$.k') AS INTEGER), -1)) AS min_k,
           max(COALESCE(CAST(json_extract_string(props, '$.k') AS INTEGER), -1)) AS max_k
    FROM events GROUP BY event_type
    """,
    note="P2/P5-P7 semi-structured projection with null-default (the pmsv cast battery)",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.coalesce(
        F.get_json_object("props", "$.k").cast("int"), F.lit(-1)
    )
    return (
        t(spark, sf_dir, "events")
        .select("event_type", k.alias("k_val"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k_val").alias("sum_k"),
            F.min("k_val").alias("min_k"),
            F.max("k_val").alias("max_k"),
        )
    )


@register(
    "try_cast_dead_letter",
    """
    SELECT is_valid, count(*) AS n
    FROM (
        SELECT CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
                         IS NOT NULL
                    AND value IS NOT NULL THEN true ELSE false END AS is_valid
        FROM events
    ) GROUP BY is_valid
    """,
    note="P7 try-cast validity split: the valid/dead-letter branch counts",
)
def try_cast_dead_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    valid = (
        F.get_json_object("props", "$.k").cast("int").isNotNull()
        & F.col("value").isNotNull()
    )
    return (
        t(spark, sf_dir, "events")
        .select(valid.alias("is_valid"))
        .groupBy("is_valid")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# J5/W7 — validation diff (validate_snapshots.py:83-147)
# ---------------------------------------------------------------------------


@register(
    "validation_field_diff",
    """
    WITH db AS (
        SELECT event_id,
               CASE WHEN event_id % 97 = 0 THEN value + 1 ELSE value END AS value
        FROM events
    )
    SELECT db.event_id AS event_id, db.value AS db_value, events.value AS raw_value
    FROM db JOIN events USING (event_id)
    WHERE db.value <> events.value
    """,
    note="J5 field-by-field diff of DB-derived vs raw-derived records",
)
def validation_field_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    db = ev.select(
        "event_id",
        F.when(F.col("event_id") % 97 == 0, F.col("value") + 1)
        .otherwise(F.col("value"))
        .alias("value"),
    )
    raw = ev.select("event_id", F.col("value").alias("raw_value"))
    return (
        db.join(raw, "event_id")
        .filter(F.col("value") != F.col("raw_value"))
        .select("event_id", F.col("value").alias("db_value"), "raw_value")
    )


@register(
    "key_set_diff",
    """
    WITH db AS (SELECT event_id FROM events WHERE event_id % 101 <> 0),
         raw AS (SELECT event_id FROM events WHERE event_id % 103 <> 0)
    SELECT
        (SELECT count(*) FROM db WHERE NOT EXISTS (
            SELECT 1 FROM raw WHERE raw.event_id = db.event_id)) AS n_only_db,
        (SELECT count(*) FROM raw WHERE NOT EXISTS (
            SELECT 1 FROM db WHERE db.event_id = raw.event_id)) AS n_only_raw
    """,
    note="W7 key-set symmetric difference via two anti joins (validate_snapshots.py:83)",
)
def key_set_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    db = ev.filter(F.col("event_id") % 101 != 0).select("event_id")
    raw = ev.filter(F.col("event_id") % 103 != 0).select("event_id")
    only_db = db.join(raw, "event_id", "left_anti").count()
    only_raw = raw.join(db, "event_id", "left_anti").count()
    return spark.createDataFrame(
        [(only_db, only_raw)], "n_only_db bigint, n_only_raw bigint"
    )


@register(
    "broadcast_enrichment",
    """
    SELECT p_brand, count(*) AS n_items,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    note="J2 broadcast hash enrichment join (the dim-cache lookups, process_snapshot.py:83-111)",
)
def broadcast_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, pa = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(dec("l_quantity")).cast("double").alias("total_qty"),
        )
    )
