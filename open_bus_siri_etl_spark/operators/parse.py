"""P2–P7 — typed projection with dead-letter routing (SURVEY §1.2, §2.2).

The reference wraps a 13-field dict projection in try/except per row; any
failure drops the record to a per-snapshot jsonlines dead-letter file
(reference process_snapshot.py:214-237).  Spark-first version: one declarative
``select`` whose casts yield NULL on malformed input (= try_cast), then a
single validity predicate splits the stream into the main flow and the
dead-letter flow.  Both branches come from one scan; no Python executes
per row.

Semantics matched to the reference field by field:
- required fields (reference raises → dead letter): RecordedAtTime, LineRef,
  OperatorRef, both FramedVehicleJourneyRef parts, OriginAimedDepartureTime,
  MonitoredCall.{StopPointRef, Order}, VehicleLocation.{Longitude, Latitude}.
- optional with defaults (reference .get(..., default)): VehicleRef → '',
  Bearing → -1, Velocity → -1, DistanceFromStop → -1.  NOTE: present-but-
  malformed optional values raised in the reference (int('x') → ValueError),
  so here a present-but-uncastable optional also invalidates the record —
  the default applies only when the field is absent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import parse_siri_ts

_MVJ = "visit.MonitoredVehicleJourney"


def _optional_int(path: str) -> Column:
    """Default -1 iff absent; NULL (→ invalid) iff present but uncastable.

    try_cast throughout this module: Spark 4's ANSI mode makes plain cast
    THROW on malformed strings — one bad record would fail the job instead
    of dead-lettering (caught by the hypothesis property test).
    """
    c = F.col(path)
    return F.when(c.isNull(), F.lit(-1)).otherwise(c.try_cast("int"))


def parse_monitored_stop_visits(
    visits_df: DataFrame, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """(snapshot_id, visit) rows → typed pmsv columns + ``_valid`` + ``raw``.

    Callers split with :func:`valid_pmsv` / :func:`dead_letters`; Catalyst
    prunes the untaken branch's columns in each.  ``passthrough`` columns of
    the input ride along unchanged (dead-letter replay keeps the original
    quarantined bytes this way).
    """
    return visits_df.select(
        *passthrough,
        "snapshot_id",
        F.to_json("visit").alias("raw"),
        parse_siri_ts("visit.RecordedAtTime").alias("recorded_at_time"),
        F.col(f"{_MVJ}.LineRef").try_cast("int").alias("line_ref"),
        F.col(f"{_MVJ}.OperatorRef").try_cast("int").alias("operator_ref"),
        # journey_ref = DataFrameRef + '-' + DatedVehicleJourneyRef
        # (reference process_snapshot.py:220).  concat (not concat_ws): NULL in
        # either part must poison the result so the record dead-letters like
        # the reference's KeyError would.
        F.concat(
            F.col(f"{_MVJ}.FramedVehicleJourneyRef.DataFrameRef"),
            F.lit("-"),
            F.col(f"{_MVJ}.FramedVehicleJourneyRef.DatedVehicleJourneyRef"),
        ).alias("journey_ref"),
        parse_siri_ts(f"{_MVJ}.OriginAimedDepartureTime").alias("scheduled_start_time"),
        F.coalesce(F.col(f"{_MVJ}.VehicleRef"), F.lit("")).alias("vehicle_ref"),
        F.col(f"{_MVJ}.MonitoredCall.Order").try_cast("int").alias("order"),
        F.col(f"{_MVJ}.MonitoredCall.StopPointRef").try_cast("int").alias("stop_point_ref"),
        F.col(f"{_MVJ}.VehicleLocation.Longitude").try_cast("double").alias("lon"),
        F.col(f"{_MVJ}.VehicleLocation.Latitude").try_cast("double").alias("lat"),
        _optional_int(f"{_MVJ}.Bearing").alias("bearing"),
        _optional_int(f"{_MVJ}.Velocity").alias("velocity"),
        _optional_int(f"{_MVJ}.MonitoredCall.DistanceFromStop").alias(
            "distance_from_journey_start"
        ),
    ).withColumn(
        "_valid",
        F.col("recorded_at_time").isNotNull()
        & F.col("line_ref").isNotNull()
        & F.col("operator_ref").isNotNull()
        & F.col("journey_ref").isNotNull()
        & F.col("scheduled_start_time").isNotNull()
        & F.col("order").isNotNull()
        & F.col("stop_point_ref").isNotNull()
        & F.col("lon").isNotNull()
        & F.col("lat").isNotNull()
        & F.col("bearing").isNotNull()
        & F.col("velocity").isNotNull()
        & F.col("distance_from_journey_start").isNotNull(),
    )


PMSV_COLUMNS = [
    "snapshot_id",
    "recorded_at_time",
    "line_ref",
    "operator_ref",
    "journey_ref",
    "scheduled_start_time",
    "vehicle_ref",
    "order",
    "stop_point_ref",
    "lon",
    "lat",
    "bearing",
    "velocity",
    "distance_from_journey_start",
]


def valid_pmsv(parsed_df: DataFrame) -> DataFrame:
    """Main flow: records that survive every required cast."""
    return parsed_df.filter("_valid").select(*PMSV_COLUMNS)


def dead_letters(parsed_df: DataFrame) -> DataFrame:
    """Dead-letter flow: raw JSON of failed records, per snapshot
    (reference process_snapshot.py:41-48,231-237)."""
    return parsed_df.filter(~F.col("_valid")).select("snapshot_id", "raw")
