"""P1 — doubly-nested lateral flatten (SURVEY §2.2).

The reference iterates ``for delivery in Siri.ServiceDelivery.
StopMonitoringDelivery: for visit in delivery.MonitoredStopVisit: yield visit``
(reference process_snapshot.py:31-34).  Here: two ``explode`` calls, which
Catalyst plans as Generate nodes inside whole-stage codegen — rows never
leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def iterate_monitored_stop_visits(snapshots_df: DataFrame) -> DataFrame:
    """One row per MonitoredStopVisit, carrying ``snapshot_id`` through.

    Input: one row per snapshot document with columns
    ``snapshot_id: string`` and ``Siri`` (SIRI_SNAPSHOT_SCHEMA).
    Output: ``snapshot_id``, ``visit`` (MONITORED_STOP_VISIT struct).

    ``explode`` (not explode_outer): snapshots with no deliveries/visits
    contribute zero rows, exactly like the reference's nested loops.
    """
    return (
        snapshots_df.select(
            "snapshot_id",
            F.explode("Siri.ServiceDelivery.StopMonitoringDelivery").alias("_delivery"),
        )
        .select(
            "snapshot_id",
            F.explode("_delivery.MonitoredStopVisit").alias("visit"),
        )
    )
