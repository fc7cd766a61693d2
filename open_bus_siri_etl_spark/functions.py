"""Column-expression helpers shared across operators.

Everything here is built from native ``pyspark.sql.functions`` — no Python
UDFs anywhere in the engine's hot path (SURVEY §2.9: the reference needs zero
user-defined functions; keeping it that way preserves whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Snapshot ids are path-shaped minute timestamps: 'YYYY/MM/DD/HH/MM'
# (reference process_snapshot.py:354-355,365).
SNAPSHOT_ID_FORMAT = "yyyy/MM/dd/HH/mm"
SIRI_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ssXXX"


def snapshot_id_to_ts(c: Column | str) -> Column:
    """'2019/05/05/16/00' → timestamp (reference process_snapshot.py:354-355)."""
    return F.to_timestamp(F.col(c) if isinstance(c, str) else c, SNAPSHOT_ID_FORMAT)


def ts_to_snapshot_id(c: Column | str) -> Column:
    """timestamp → 'YYYY/MM/DD/HH/MM' (reference process_snapshot.py:365,501)."""
    return F.date_format(F.col(c) if isinstance(c, str) else c, SNAPSHOT_ID_FORMAT)


def snapshot_key(c: Column | str) -> Column:
    """Filesystem-safe snapshot id ('2019-05-05-16-00') for partition dirs."""
    return F.replace(
        F.col(c) if isinstance(c, str) else c, F.lit("/"), F.lit("-")
    )


def parse_siri_ts(c: Column | str) -> Column:
    """Parse '2019-05-05T16:00:15+03:00' → UTC timestamp.

    Mirrors strptime('%Y-%m-%dT%H:%M:%S%z') at reference
    process_snapshot.py:37-38; invalid input yields NULL (routed to the
    dead-letter branch by the caller) instead of raising per-row.
    try_to_timestamp, NOT to_timestamp: under Spark 4's default ANSI mode
    the plain version throws on the first malformed row and would fail the
    whole job instead of dead-lettering the record.
    """
    return F.try_to_timestamp(
        F.col(c) if isinstance(c, str) else c, F.lit(SIRI_TS_FORMAT)
    )


# ---------------------------------------------------------------------------
# Deterministic surrogate keys (SURVEY §7 hard-part 1).
#
# The reference relies on Postgres sequences with commit-per-level so children
# can reference parent ids (process_snapshot.py:205-211).  Spark has no
# sequences; xxhash64 over the natural key (salted with the table name so the
# same ints in different tables don't collide) gives ids that are stable
# across reruns and across executors — upserts stay idempotent and the
# three dependency levels no longer need barriers to learn parent ids.
# ---------------------------------------------------------------------------


def route_id(operator_ref: Column, line_ref: Column) -> Column:
    """Natural key (operator_ref, line_ref) — reference process_snapshot.py:122-125."""
    return F.xxhash64(F.lit("siri_route"), operator_ref, line_ref)


def stop_id(code: Column) -> Column:
    """Natural key (code=stop_point_ref) — reference process_snapshot.py:127-130."""
    return F.xxhash64(F.lit("siri_stop"), code)


def ride_id(siri_route_id: Column, journey_ref: Column, vehicle_ref: Column) -> Column:
    """Natural key (route_id, journey_ref, vehicle_ref) — reference :153-161."""
    return F.xxhash64(F.lit("siri_ride"), siri_route_id, journey_ref, vehicle_ref)


def ride_stop_id(siri_ride_id: Column, siri_stop_id: Column, order: Column) -> Column:
    """Natural key (ride_id, stop_id, order) — reference :184-191."""
    return F.xxhash64(F.lit("siri_ride_stop"), siri_ride_id, siri_stop_id, order)


def snapshot_control_id(snapshot_id: Column | str) -> Column:
    c = F.col(snapshot_id) if isinstance(snapshot_id, str) else snapshot_id
    return F.xxhash64(F.lit("siri_snapshot"), c)
