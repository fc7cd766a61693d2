"""Entries 1-50 — the driver-graded window (SURVEY §2 reference-parity operators plus the first dedup/similarity entries).
ORDER IS LOAD-BEARING: the driver grades exactly the first 50
registered names (tests/test_plan_quality.py pins the list) — never
insert or reorder here; append new entries to catalog_ann_curation.

Split from the monolithic catalog (round 8); entry bodies are
byte-identical to their pre-split form.  See plans/catalog.py for the
registration-order manifest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .catalog_base import REGISTRY, dec, register, t  # noqa: F401
from .catalog_shared import (  # noqa: F401
    CHUNK_SIZE,
    GAP_MINUTES,
    PACK_BUDGET,
    PACK_STREAMS,
    _IVF_QUANTIZER_CTE,
    _LANGID_SCORES_SQL,
    _LSH_ANN_CTE,
    _LSH_BUCKETS_CTE,
    _POSTINGS_CTE,
    _TOKS,
    _TRIGRAMS,
)

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
    # r14: pre-join the dimension chain customer⋈nation⋈region into one
    # (c_custkey, n_name, r_name) frame BEFORE touching the fact stream
    # (inner-join reassociation — result identical), so every lineitem row
    # probes 2 hash tables instead of 4.  The two snowflake hops now run on
    # the customer-sized side; the fact side sees one orders probe and one
    # geo probe.  Same #broadcasts, half the per-row join work on the side
    # that is 100 TB in production.  geo carries an explicit broadcast hint:
    # it is customer-sized (a dimension) but the static planner cannot see
    # that through the two-join composition and would fall back to a
    # sort-merge join with two extra Exchanges on the fact stream.
    geo = F.broadcast(
        cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        li.join(od.filter(F.col("o_orderdate") >= "1996-01-01"), li.l_orderkey == od.o_orderkey)
        .join(geo, od.o_custkey == geo.c_custkey)
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
    # r14: first-wins as min(struct(...)) hash aggregate instead of the
    # sort+window row_number form.  event_id is unique (driver testdata:
    # zero (ts,event_id) dupes at every SF), so the lexicographic struct
    # minimum over (ts, event_id, value) IS the rn=1 row of ORDER BY ts,
    # event_id — identical rows, but the plan drops both Sort nodes and the
    # shuffle carries one partial-agg row per key per partition.  At 100 TB
    # a hash agg beats sort+WindowGroupLimit on every skewless key set.
    first = F.min(F.struct("ts", "event_id", "value")).alias("s")
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(first)
        .select(
            "user_id",
            "event_type",
            F.col("s.ts").alias("first_ts"),
            F.col("s.value").alias("first_value"),
            F.col("s.event_id").alias("first_event_id"),
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
    # r14: argmax as max(struct(ts, event_id)) — lexicographic struct max
    # = max ts, ties to max event_id, exactly ORDER BY ts DESC, event_id
    # DESC rn=1 (event_id unique, no NULLs in the driver testdata).  Same
    # rows as the window form with no Sort and partial-agg-sized shuffle.
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id")).alias("s"))
        .select(
            "user_id",
            F.col("s.ts").alias("latest_ts"),
            F.col("s.event_id").alias("latest_event_id"),
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



@register(
    "gap_sessionization",
    f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > {GAP_MINUTES} * 60
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts,
               CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
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
                # Exact integer microseconds on both sides; the oracle's
                # fractional epoch(ts) difference exceeds GAP*60 seconds iff
                # the micros difference exceeds GAP*60*1e6, so sub-second gaps
                # cannot classify differently across engines — and unix_micros
                # is legal for any timestamp flavor t() may return.
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > GAP_MINUTES * 60 * 1_000_000
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
           CAST(sum(COALESCE(CAST(json_extract_string(props, '$.k') AS INTEGER), -1)) AS BIGINT) AS sum_k,
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
    SELECT event_type, is_valid, count(*) AS n
    FROM (
        SELECT event_type,
               CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
                         IS NOT NULL
                    AND value IS NOT NULL THEN true ELSE false END AS is_valid
        FROM events
    ) GROUP BY event_type, is_valid
    """,
    note="P7 try-cast validity split, routed per event_type (the synthetic "
    "props all parse, so a bare valid/invalid grain is one row — grouping "
    "by type keeps the entry non-trivial at every SF while exercising the "
    "same try-cast branch counts)",
)
def try_cast_dead_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    valid = (
        F.get_json_object("props", "$.k").cast("int").isNotNull()
        & F.col("value").isNotNull()
    )
    return (
        t(spark, sf_dir, "events")
        .select("event_type", valid.alias("is_valid"))
        .groupBy("event_type", "is_valid")
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
    "rollup_revenue",
    """
    SELECT coalesce(r_name, 'ALL') AS region_name,
           coalesce(n_name, 'ALL') AS nation_name,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    note="hierarchical rollup (beyond-reference): one pass + Expand ×3 grain "
    "levels instead of three scans; DECIMAL-exact sums across all grains",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    od, cu = t(spark, sf_dir, "orders"), t(spark, sf_dir, "customer")
    na, re = t(spark, sf_dir, "nation"), t(spark, sf_dir, "region")
    return (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "revenue",
            "n_orders",
        )
    )


@register(
    "cube_orders",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS order_status,
           coalesce(o_orderpriority, 'ALL') AS order_priority,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    note="full cube (beyond-reference): all 4 grain combinations in one "
    "pass via Expand ×4 — partial aggregation still applies per grain, so "
    "the shuffle carries pre-combined rows, not ×4 raw data",
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = t(spark, sf_dir, "orders")
    return (
        od.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("order_status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("order_priority"),
            "revenue",
            "n_orders",
        )
    )


@register(
    "grouping_sets_activity",
    """
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(CAST(user_bucket AS VARCHAR), 'ALL') AS user_bucket,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           count(*) AS n_events
    FROM (SELECT event_type, user_id % 10 AS user_bucket, value FROM events)
    GROUP BY GROUPING SETS ((event_type), (user_bucket), ())
    """,
    note="explicit grouping sets (beyond-reference): two independent "
    "marginals + grand total in one scan instead of three, without cube's "
    "cross-product grain",
)
def grouping_sets_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 10).alias("user_bucket"), "value"
    )
    return (
        ev.groupingSets(
            [["event_type"], ["user_bucket"], []], "event_type", "user_bucket"
        )
        .agg(
            F.sum(dec("value")).cast("double").alias("total_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("user_bucket").cast("string"), F.lit("ALL")).alias(
                "user_bucket"
            ),
            "total_value",
            "n_events",
        )
    )


@register(
    "merge_upsert",
    """
    WITH target AS (
        SELECT doc_id, n_chars, source FROM documents WHERE doc_id % 3 <> 0
    ), src AS (
        SELECT doc_id, n_chars * 2 AS n_chars, 'merged' AS source
        FROM documents WHERE doc_id % 2 = 0
    )
    SELECT coalesce(tg.doc_id, s.doc_id) AS doc_id,
           CASE WHEN s.doc_id IS NOT NULL THEN s.n_chars ELSE tg.n_chars END
               AS n_chars,
           CASE WHEN s.doc_id IS NOT NULL THEN s.source ELSE tg.source END
               AS source
    FROM target tg FULL OUTER JOIN src s ON tg.doc_id = s.doc_id
    """,
    note="Delta-style MERGE emulation (operators/upsert.py:merge_frames): "
    "matched rows updated, unmatched source inserted, unmatched target kept "
    "— one full-outer shuffle on the key, same join a lakehouse MERGE pays",
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.upsert import merge_frames

    docs = t(spark, sf_dir, "documents")
    target = docs.filter(F.col("doc_id") % 3 != 0).select(
        "doc_id", "n_chars", "source"
    )
    src = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id",
        (F.col("n_chars") * 2).alias("n_chars"),
        F.lit("merged").alias("source"),
    )
    return merge_frames(target, src, ["doc_id"])


@register(
    "median_disc_value",
    """
    SELECT event_type, value AS median_value FROM (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ) WHERE rn = (n + 1) // 2
    """,
    note="discrete median (exact element at position, no interpolation — "
    "deterministic across engines); at 100 TB swap for approx_percentile "
    "(one pass, mergeable sketch, no per-key sort)",
)
def median_disc_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    return (
        ev.select(
            "event_type",
            "value",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("event_type", F.col("value").alias("median_value"))
    )


@register(
    "running_revenue",
    """
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total
    FROM orders WHERE o_custkey % 50 = 0
    """,
    note="running total per key (beyond-reference): each row's prefix set "
    "is deterministic under the unique (date, orderkey) order and the sum "
    "is DECIMAL-exact, so the window matches the oracle bit-for-bit; "
    "partitioned by high-cardinality custkey — state per task is one "
    "accumulator, no skew",
)
def running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


@register(
    "moving_avg_value",
    """
    SELECT user_id, event_id,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
               / count(*) OVER w AS moving_avg
    FROM events WHERE user_id % 100 = 0
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    note="7-row moving average (beyond-reference): DECIMAL-exact window sum "
    "divided by the window count — one IEEE division on identical operands "
    "in both engines; single shuffle on user_id",
)
def moving_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") % 100 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        (
            F.sum(dec("value")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg"),
    )


@register(
    "revenue_deciles",
    """
    SELECT o_custkey, total_revenue,
           ntile(10) OVER (ORDER BY total_revenue, o_custkey) AS decile
    FROM (
        SELECT o_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_revenue
        FROM orders GROUP BY o_custkey
    )
    """,
    note="ntile decile assignment over aggregated revenue; the global "
    "window is one partition by construction — fine here because its input "
    "is already one row per customer (post-agg).  The scale-out twin "
    "(revenue_deciles_distributed, operators/ranking.py) answers the same "
    "query with no all-to-one data exchange",
)
def revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = t(spark, sf_dir, "orders")
    totals = od.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice")).cast("double").alias("total_revenue")
    )
    w = Window.orderBy("total_revenue", "o_custkey")
    return totals.select(
        "o_custkey", "total_revenue", F.ntile(10).over(w).alias("decile")
    )


@register(
    "revenue_deciles_distributed",
    """
    SELECT o_custkey, total_revenue,
           ntile(10) OVER (ORDER BY total_revenue, o_custkey) AS decile
    FROM (
        SELECT o_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_revenue
        FROM orders GROUP BY o_custkey
    )
    """,
    note="the 100 TB version of revenue_deciles: operators/ranking.py "
    "replaces the single-partition ntile window with range-partitioned "
    "local sort + monotonically_increasing_id arithmetic + broadcast "
    "offsets — the data crosses one BALANCED exchange; only P count rows "
    "ever sit in one task.  Same oracle as revenue_deciles: the remainder "
    "rule reproduces ntile exactly",
)
def revenue_deciles_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import distributed_ntile

    od = t(spark, sf_dir, "orders")
    totals = od.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice")).cast("double").alias("total_revenue")
    )
    return distributed_ntile(
        totals, ["total_revenue", "o_custkey"], k=10, tile_col="decile"
    ).select("o_custkey", "total_revenue", "decile")


@register(
    "large_orders",
    """
    SELECT o_orderkey, o_orderdate, o_totalprice,
           CAST(sum_qty_dec AS DOUBLE) AS sum_qty
    FROM orders
    JOIN (
        SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty_dec
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
    ) big ON o_orderkey = l_orderkey
    """,
    note="TPC-H Q18 shape (beyond-reference): aggregate-then-filter "
    "(HAVING) then join back to the parent — the HAVING prunes before the "
    "join so only qualifying groups shuffle; DECIMAL comparison keeps the "
    "threshold exact in both engines",
)
def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, od = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 150)
    )
    return od.join(big, od.o_orderkey == big.l_orderkey).select(
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.col("sum_qty_dec").cast("double").alias("sum_qty"),
    )


@register(
    "small_lot_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
               AS avg_yearly
    FROM lineitem l
    JOIN (
        SELECT l_partkey AS pk,
               0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                      / count(*)) AS qty_thresh
        FROM lineitem GROUP BY l_partkey
    ) t ON l.l_partkey = t.pk
    WHERE l.l_quantity < t.qty_thresh
    """,
    note="TPC-H Q17 shape (beyond-reference): correlated scalar subquery "
    "(per-part average) decorrelated into an aggregate + equi-join — the "
    "form Catalyst's RewriteCorrelatedScalarSubquery produces; the "
    "threshold is DECIMAL-sum/count then one IEEE multiply, so the "
    "per-row comparison is bit-identical across engines",
)
def small_lot_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    thresh = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(dec("l_quantity")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_thresh")
    )
    return (
        li.join(thresh, li.l_partkey == thresh.pk)
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / 7.0).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "revenue_rank_distribution",
    """
    SELECT o_custkey, total_revenue,
           percent_rank() OVER (ORDER BY total_revenue, o_custkey) AS pct_rank,
           cume_dist() OVER (ORDER BY total_revenue, o_custkey) AS cume
    FROM (
        SELECT o_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_revenue
        FROM orders GROUP BY o_custkey
    )
    """,
    note="percent_rank/cume_dist over aggregated revenue: both are ratios "
    "of identical integer operands ((rank-1)/(N-1), n_at_or_before/N) so "
    "the doubles match bit-for-bit; post-agg input keeps the global window "
    "small (scale path: operators/ranking.py global_row_number + the same "
    "arithmetic)",
)
def revenue_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = t(spark, sf_dir, "orders")
    totals = od.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice")).cast("double").alias("total_revenue")
    )
    w = Window.orderBy("total_revenue", "o_custkey")
    return totals.select(
        "o_custkey",
        "total_revenue",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "data_quality_checks",
    """
    SELECT 'orders_null_custkey' AS chk,
           count(*) FILTER (o_custkey IS NULL) AS n_violations FROM orders
    UNION ALL
    SELECT 'orders_dup_pk',
           count(*) - count(DISTINCT o_orderkey) FROM orders
    UNION ALL
    SELECT 'lineitem_orphan_fk', count(*) FROM lineitem
    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    """,
    note="data-quality constraint checks (beyond-reference, the "
    "expectations layer of a production pipeline): null-rate, PK "
    "uniqueness, FK orphan count — nulls and dup-PK fuse into single "
    "aggregates over one scan each; the orphan check is a LEFT ANTI join "
    "(count of un-matched probes), never a per-row subquery",
)
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    od, li = t(spark, sf_dir, "orders"), t(spark, sf_dir, "lineitem")
    null_ck = od.agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("n_violations")
    ).select(F.lit("orders_null_custkey").alias("chk"), "n_violations")
    dup_pk = od.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("n_violations")
    ).select(F.lit("orders_dup_pk").alias("chk"), "n_violations")
    orphans = (
        li.join(od.select("o_orderkey"), li.l_orderkey == od.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("lineitem_orphan_fk").alias("chk"), "n_violations")
    )
    return null_ck.unionByName(dup_pk).unionByName(orphans)


@register(
    "unpivot_user_activity",
    """
    WITH wide AS (
        SELECT user_id,
               count(*) FILTER (event_type = 'view')  AS n_view,
               count(*) FILTER (event_type = 'click') AS n_click,
               count(*) FILTER (event_type = 'error') AS n_error
        FROM events WHERE user_id % 25 = 0 GROUP BY user_id
    )
    SELECT user_id, kind, n FROM (
        SELECT user_id, 'n_view' AS kind, n_view AS n FROM wide
        UNION ALL SELECT user_id, 'n_click', n_click FROM wide
        UNION ALL SELECT user_id, 'n_error', n_error FROM wide
    )
    """,
    note="unpivot/melt (inverse of pivot_user_activity) via Spark's native "
    "unpivot — wide conditional-agg columns back to long form in one "
    "Expand, no UNION-of-scans; the oracle spells it as UNION ALL over a "
    "CTE, same result",
)
def unpivot_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") % 25 == 0)
    wide = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("n_view"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_click"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_error"),
    )
    return wide.unpivot(
        ids=["user_id"],
        values=["n_view", "n_click", "n_error"],
        variableColumnName="kind",
        valueColumnName="n",
    )


@register(
    "cube_orders_grouping_id",
    """
    SELECT grouping(o_orderstatus, o_orderpriority) AS gid,
           coalesce(o_orderstatus, 'ALL') AS order_status,
           coalesce(o_orderpriority, 'ALL') AS order_priority,
           count(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    note="cube with the grouping-id bitmask exposed — disambiguates a real "
    "NULL group from a rolled-up grain without string sentinels (Spark "
    "grouping_id == DuckDB GROUPING: bit per column, MSB first)",
)
def cube_orders_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = t(spark, sf_dir, "orders")
    return (
        od.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.col("gid").cast("bigint").alias("gid"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("order_status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("order_priority"),
            "n_orders",
        )
    )


@register(
    "session_window_agg",
    """
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM (
        SELECT user_id, ts,
               sum(CASE WHEN prev_ts IS NULL
                        OR ts - prev_ts > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM (
            SELECT user_id, ts, event_id,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS prev_ts
            FROM events WHERE user_id % 20 = 0
        )
    )
    GROUP BY user_id, session_id
    """,
    note="per-user event-time sessions (30-min inactivity gap) via Spark's "
    "native session_window in BATCH — the same operator the streaming "
    "sessionizer uses with state; the oracle derives identical sessions "
    "with the lag/gap-flag/cumulative-sum islands idiom.  session_window's "
    "end = last event + gap, hence the oracle's max(ts) + interval.  One "
    "shuffle on user_id; per-key state is linear in the session, not the "
    "history",
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 0)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "set_ops_users",
    """
    SELECT 'both' AS op, count(*) AS n FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
    UNION ALL
    SELECT 'view_only' AS op, count(*) AS n FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
        EXCEPT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
    """,
    note="native set operators (W6/W7 generalized): INTERSECT/EXCEPT plan "
    "as distinct + semi/anti join — same shuffle budget as the hand-rolled "
    "anti-join but declared, so AQE still picks the join strategy",
)
def set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    clicks = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    both = (
        views.intersect(clicks)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("both").alias("op"), "n")
    )
    view_only = (
        views.exceptAll(clicks)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("view_only").alias("op"), "n")
    )
    return both.unionByName(view_only)


@register(
    "value_quantiles_disc",
    """
    SELECT event_type, p, value AS q_value FROM (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ) CROSS JOIN (SELECT unnest([0.25, 0.5, 0.75]) AS p)
    WHERE rn = CAST(floor((n - 1) * p) AS BIGINT) + 1
    """,
    note="exact discrete quantiles at three probabilities in one windowed "
    "pass (positions floor((n-1)p)+1 — 0.25/0.5/0.75 are exact binary "
    "fractions, so both engines floor identically); at 100 TB swap for "
    "approx_percentile: one pass, mergeable KLL-style sketch, no per-key "
    "sort (accuracy contract tested in test_stateful_and_maintenance.py)",
)
def value_quantiles_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    probs = F.explode(
        F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    ).alias("p")
    return (
        ranked.select("event_type", "value", "rn", "n", probs)
        .filter(
            F.col("rn")
            == F.floor((F.col("n") - 1) * F.col("p")).cast("bigint") + 1
        )
        .select("event_type", "p", F.col("value").alias("q_value"))
    )


@register(
    "stratified_sample",
    """
    SELECT doc_id, lang_bucket FROM (
        SELECT doc_id, lang_bucket,
               row_number() OVER (PARTITION BY lang_bucket
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                   AS rn
        FROM (SELECT doc_id, doc_id % 4 AS lang_bucket FROM documents)
    ) WHERE rn <= 25
    """,
    note="deterministic stratified sampling (beyond-reference): fixed-k per "
    "stratum ordered by content hash — reproducible train/eval carving with "
    "no RNG state, one shuffle on the stratum key; md5 exists in both "
    "engines so the oracle matches exactly",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 4).alias("lang_bucket")
    )
    w = Window.partitionBy("lang_bucket").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 25)
        .select("doc_id", "lang_bucket")
    )


@register(
    "pivot_user_activity",
    """
    SELECT user_id,
           count(*) FILTER (event_type = 'view')     AS n_view,
           count(*) FILTER (event_type = 'click')    AS n_click,
           count(*) FILTER (event_type = 'purchase') AS n_purchase,
           count(*) FILTER (event_type = 'error')    AS n_error
    FROM events
    GROUP BY user_id
    """,
    note="pivot with an explicit value list = conditional aggregation in one "
    "pass (explicit values keep it single-job; values-discovery pivot costs "
    "an extra distinct scan at scale)",
)
def pivot_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    types = ["view", "click", "purchase", "error"]
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            *[F.coalesce(F.col(ty), F.lit(0)).alias(f"n_{ty}") for ty in types],
        )
    )


@register(
    "funnel_view_click_error",
    """
    WITH v AS (
        SELECT user_id, min(ts) AS v_ts FROM events
        WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
        SELECT e.user_id, min(ts) AS c_ts
        FROM events e JOIN v USING (user_id)
        WHERE event_type = 'click' AND ts > v_ts GROUP BY 1
    ),
    er AS (
        SELECT e.user_id, min(ts) AS e_ts
        FROM events e JOIN c USING (user_id)
        WHERE event_type = 'error' AND ts > c_ts GROUP BY 1
    )
    SELECT (SELECT count(*) FROM v)  AS n_viewed,
           (SELECT count(*) FROM c)  AS n_clicked_after_view,
           (SELECT count(*) FROM er) AS n_errored_after_click
    """,
    note="funnel / ordered-sequence analytics: stage k = min-ts agg joined "
    "back to the stream (3 narrow shuffles on user_id, all partial-agg "
    "friendly) — no per-user collect_list, state is one timestamp per stage",
)
def funnel_view_click_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")

    def stage(prev: DataFrame, etype: str, prev_ts: str, out_ts: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_ts))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_ts))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = stage(v, "click", "v_ts", "c_ts")
    er = stage(c, "error", "c_ts", "e_ts")
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_after_view")))
        .crossJoin(er.agg(F.count(F.lit(1)).alias("n_errored_after_click")))
    )


@register(
    "distinct_users_per_type",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    note="distinct aggregation (beyond-reference): two-phase partial-distinct "
    "plan; at 100 TB swap count_distinct for approx_count_distinct (HLL++, "
    "no second shuffle) — see test_training_ops for the error-bound check",
)
def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count_distinct(F.col("user_id")).alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "asof_join_prior_view",
    """
    SELECT c.event_id, c.user_id, c.ts, v.event_id AS view_event_id
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN
         (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
    ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
    note="as-of join (beyond-reference): latest prior row per key via UNION + "
    "single-sort carry-forward — one shuffle, linear state; NOT an inequality "
    "join (BroadcastNestedLoop).  Oracle uses DuckDB's native ASOF JOIN",
)
def asof_join_prior_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import asof_join

    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    return asof_join(clicks, views, on="user_id", right_cols=["event_id"]).select(
        "event_id", "user_id", "ts", F.col("event_id_asof").alias("view_event_id")
    )


@register(
    "range_join_error_windows",
    """
    WITH iv AS (
        SELECT event_id AS interval_id, ts AS start_ts,
               ts + INTERVAL 30 MINUTE AS end_ts
        FROM events WHERE event_type = 'error' AND event_id < 2000
    ),
    p AS (SELECT ts FROM events WHERE event_type = 'click')
    SELECT interval_id, count(*) AS n_points
    FROM iv JOIN p ON p.ts >= iv.start_ts AND p.ts < iv.end_ts
    GROUP BY interval_id
    """,
    note="range join (beyond-reference): intervals explode into overlapped "
    "time buckets, equi-join on bucket + exact refine — replaces the "
    "BroadcastNestedLoopJoin a raw inequality join would plan",
)
def range_join_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import range_join_bucketed

    ev = t(spark, sf_dir, "events")
    intervals = (
        ev.filter((F.col("event_type") == "error") & (F.col("event_id") < 2000))
        .select(
            F.col("event_id").alias("interval_id"),
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
        )
    )
    points = ev.filter(F.col("event_type") == "click").select("ts")
    joined = range_join_bucketed(points, intervals, bucket_seconds=1800)
    return joined.groupBy("interval_id").agg(F.count(F.lit(1)).alias("n_points"))


@register(
    "tumbling_window_agg",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(round(value, 2) AS DECIMAL(18,2))) AS DOUBLE)
               AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    note="T3 watermark analog: event-time tumbling window (F.window) — same plan "
    "runs incrementally under withWatermark on a stream (streaming/windowed.py); "
    "state bounded by watermark × key cardinality, not stream length",
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windowed import windowed_event_stats

    return windowed_event_stats(t(spark, sf_dir, "events"), window="1 hour")


@register(
    "salted_skew_join",
    """
    WITH dim AS (
        SELECT DISTINCT event_type, length(event_type) AS type_len FROM events
    )
    SELECT e.event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           max(d.type_len) AS type_len
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY e.event_type
    """,
    note="salted join: hot-key shuffle join spread over salt buckets; "
    "result-identical to the plain join (the oracle)",
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    ev = t(spark, sf_dir, "events")
    dim = ev.select("event_type").distinct().withColumn(
        "type_len", F.length("event_type")
    )
    joined = salted_join(ev, dim, on=["event_type"], salt=8)
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value")).cast("double").alias("total_value"),
        F.max("type_len").alias("type_len"),
    )


@register(
    "salted_two_stage_agg",
    """
    SELECT event_type, count(*) AS n FROM events GROUP BY event_type
    """,
    note="two-stage salted aggregation for skewed group keys; "
    "result-identical to the plain groupBy (the oracle).  Measured caveat "
    "(tools/bench_skew.py): for count/sum the plain plan is already "
    "skew-immune via map-side partial agg — salt only large-state aggs "
    "(collect_list/exact distinct sets) where partials can't collapse",
)
def salted_two_stage_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_agg_count

    return salted_agg_count(t(spark, sf_dir, "events"), ["event_type"], salt=16)


# ---------------------------------------------------------------------------
# Training-data operators (beyond-reference; BASELINE.json north star):
# dedup family, similarity search, text analysis, multimodal plumbing.
# Implementations live in operators/{dedup,similarity,textstats,multimodal}.py;
# these entries bind them to the documents/embeddings fixtures + oracles.
# ---------------------------------------------------------------------------



@register(
    "exact_dedup",
    """
    SELECT md5(text) AS content_hash, min(doc_id) AS canonical_doc_id,
           count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    note="exact dedup: one hash-aggregate, map-side combinable; canonical=min(doc_id)",
)
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import exact_dedup_groups

    return exact_dedup_groups(t(spark, sf_dir, "documents"))


@register(
    "ngram_jaccard_dedup",
    f"""
    WITH {_POSTINGS_CTE},
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM post a JOIN post b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, i * 1.0 / (sa.n + sb.n - i) AS jaccard
    FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
    WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5
    """,
    note="n-gram Jaccard near-dup: trigram posting self-join (shuffle on shingle, AQE skew-split)",
)
def ngram_jaccard_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(t(spark, sf_dir, "documents"), threshold=0.5)


@register(
    "minhash_lsh_dedup",
    f"""
    WITH {_POSTINGS_CTE},
    sigs AS (
        SELECT doc_id, seed, min(md5(seed || '|' || shingle)) AS sig
        FROM post CROSS JOIN generate_series(0, 63) t(seed)
        GROUP BY doc_id, seed
    ),
    bands AS (
        SELECT doc_id, seed // 8 AS band,
               md5(string_agg(sig, ',' ORDER BY seed)) AS band_key
        FROM sigs GROUP BY doc_id, seed // 8
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    inter AS (
        SELECT doc_a, doc_b, count(*) AS i
        FROM cand
        JOIN post pa ON pa.doc_id = doc_a
        JOIN post pb ON pb.doc_id = doc_b AND pb.shingle = pa.shingle
        GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b, i * 1.0 / (sa.n + sb.n - i) AS jaccard
    FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
    WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5
    """,
    note="MinHash(64 md5 perms) + LSH(8 bands) candidates, verified by true Jaccard; "
    "md5 hash family chosen so the oracle reproduces signatures exactly",
)
def minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_lsh_dedup as mh

    return mh(t(spark, sf_dir, "documents"), threshold=0.5)


@register(
    "simhash_near_pairs",
    """
    WITH tok AS (
        SELECT DISTINCT doc_id, tok FROM (
            SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
            FROM documents)
    ),
    h AS (SELECT doc_id, md5(tok) AS h FROM tok),
    chunk AS (
        SELECT doc_id, c.chunk,
               ('0x' || substr(h, c.chunk * 4 + 1, 4))::INTEGER AS chunk_hash
        FROM h CROSS JOIN generate_series(0, 3) c(chunk)
    ),
    bits AS (
        SELECT doc_id, chunk, b.bit,
               CASE WHEN (chunk_hash >> b.bit) & 1 = 1 THEN 1 ELSE -1 END AS vote
        FROM chunk CROSS JOIN generate_series(0, 15) b(bit)
    ),
    bitvals AS (
        SELECT doc_id, chunk, bit,
               CASE WHEN sum(vote) > 0 THEN (1 << bit) ELSE 0 END AS bitval
        FROM bits GROUP BY doc_id, chunk, bit
    ),
    chunks AS (
        SELECT doc_id, chunk, CAST(sum(bitval) AS INTEGER) AS chunk_val
        FROM bitvals GROUP BY doc_id, chunk
    ),
    sh AS (
        SELECT doc_id,
               max(CASE WHEN chunk = 0 THEN chunk_val END) AS c0,
               max(CASE WHEN chunk = 1 THEN chunk_val END) AS c1,
               max(CASE WHEN chunk = 2 THEN chunk_val END) AS c2,
               max(CASE WHEN chunk = 3 THEN chunk_val END) AS c3
        FROM chunks GROUP BY doc_id
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         AND (a.c0 = b.c0 OR a.c1 = b.c1 OR a.c2 = b.c2 OR a.c3 = b.c3)
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1))
              + bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3)) AS INTEGER)
               AS hamming
    FROM cand JOIN sh a ON a.doc_id = doc_a JOIN sh b ON b.doc_id = doc_b
    WHERE CAST(bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1))
             + bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3)) AS INTEGER) <= 3
    """,
    note="SimHash-64 (4×16-bit chunks from md5 nibbles), chunk-match banding + exact Hamming verify",
)
def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import simhash_near_pairs as sp

    return sp(t(spark, sf_dir, "documents"), max_hamming=3)


@register(
    "embedding_cosine_topk",
    """
    WITH f AS (
        SELECT vec_id, unnest(embedding)::DOUBLE AS v,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ),
    n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM f GROUP BY vec_id),
    d AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, sum(q.v * c.v) AS dot
        FROM f q JOIN f c ON q.i = c.i AND q.vec_id <> c.vec_id
        WHERE q.vec_id < 8
        GROUP BY 1, 2
    ),
    s AS (
        SELECT query_id, neighbor_id, dot / (nq.nrm * nc.nrm) AS cosine
        FROM d JOIN n nq ON query_id = nq.vec_id JOIN n nc ON neighbor_id = nc.vec_id
    )
    SELECT query_id, neighbor_id, rank FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        FROM s
    ) WHERE rank <= 5
    """,
    note="brute-force cosine top-k (exact ANN baseline): broadcast query set, "
    "zip_with/aggregate dot product in-JVM, per-query top-k window",
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_topk

    emb = t(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 8), k=5)
