"""Incrementally maintained daily rollup of the vehicle-location fact table.

The hypertable / continuous-aggregate pattern: a materialized per-day summary
that is refreshed for ONLY the days an ingest (or reload) touched, instead of
re-aggregating the whole fact history.  The reference has no analog — its
counters live per-snapshot in the control table — but any consumer of this
warehouse ("locations per day", dashboard top-lines) would otherwise scan the
full fact table.

Scale reasoning (the whole point of this module):
- the fact table is partitioned by ``snapshot_date``, so the delta
  re-aggregation prunes at the file-listing level — refreshing one day of a
  100 TB / 3-year warehouse reads one day's files, nothing else (the test
  asserts the PartitionFilters reach the scan);
- the rollup table itself is one row per day (thousands of rows ever), so the
  replace-by-key upsert is a driver-memory-scale read-modify-write;
- every refresh is idempotent: recomputing a day from facts always converges
  to the same row, so crash-and-retry needs no transaction log.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, functions as F

from .sources.tables import Warehouse

ROLLUP_TABLE = "siri_daily_rollup"
FACT_TABLE = "siri_vehicle_location"


def _daily_agg(facts: DataFrame) -> DataFrame:
    return facts.groupBy("snapshot_date").agg(
        F.count(F.lit(1)).alias("n_locations"),
        F.countDistinct("snapshot_id").alias("n_snapshots"),
        F.countDistinct("siri_ride_stop_id").alias("n_ride_stops"),
        F.min("recorded_at_time").alias("first_recorded"),
        F.max("recorded_at_time").alias("last_recorded"),
        F.avg("velocity").alias("avg_velocity"),
    )


def refresh_daily_rollup(
    wh: Warehouse, dates: list[datetime.date] | None = None
) -> DataFrame:
    """Refresh the rollup for ``dates`` (None → full rebuild).

    Incremental path: filter facts to the touched dates (partition-pruned
    scan), re-aggregate just those days, replace-by-key into the rollup.
    A reload that DELETED a day's last facts yields no agg row for it, so
    stale rollup rows for requested dates are dropped explicitly first.
    """
    facts = wh.read(FACT_TABLE)
    if dates is None:
        wh.overwrite(ROLLUP_TABLE, _daily_agg(facts))
        return wh.read(ROLLUP_TABLE)

    delta = facts.filter(F.col("snapshot_date").isin(dates))
    fresh = _daily_agg(delta)
    existing = wh.read(ROLLUP_TABLE)
    keep = existing.filter(~F.col("snapshot_date").isin(dates))
    out = keep.unionByName(fresh).localCheckpoint(eager=True)
    out.write.mode("overwrite").parquet(wh.table_path(ROLLUP_TABLE))
    return wh.read(ROLLUP_TABLE)
