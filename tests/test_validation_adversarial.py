"""Adversarial validation: seed concrete warehouse defects and assert
``validate_snapshots`` pinpoints each one — the reference's tool exists to
*catch* drift (reference validate_snapshots.py:100-147), so the test must
prove findings fire, not just that clean data reports clean.

Defects seeded against the golden snapshot (3 valid visits):
  1. one fact row DROPPED            → key-set mismatch finding (W7)
  2. one fact row DUPLICATED         → duplicate-db-key finding (D3)
  3. one ride's vehicle_ref MUTATED  → per-field mismatch finding (J5)

Scoping contract: row-level defects (1, 2) stay confined to the corrupted
snapshot; the DIM mutation (3) must surface in EVERY snapshot referencing
that ride — both land the same rides, so the second snapshot reports exactly
the vehicle_ref drift and nothing else.  A pre-corruption run is the
positive control (both snapshots 'no errors').
"""

import pytest

from open_bus_siri_etl_spark import schemas
from open_bus_siri_etl_spark.pipeline import process_snapshot
from open_bus_siri_etl_spark.sources.snapshots import write_snapshot_fixture
from open_bus_siri_etl_spark.validate import validate_snapshots

from .fixtures import get_test_snapshot_data

SID_BAD = "2019/05/05/16/00"
SID_CLEAN = "2019/05/05/16/01"


@pytest.mark.slow
def test_validation_pinpoints_seeded_defects(spark, warehouse, tmp_path):
    landing = str(tmp_path / "landing")
    write_snapshot_fixture(landing, SID_BAD, get_test_snapshot_data(time_str="16:00"))
    write_snapshot_fixture(landing, SID_CLEAN, get_test_snapshot_data(time_str="16:01"))
    process_snapshot(spark, warehouse, SID_BAD, landing)
    process_snapshot(spark, warehouse, SID_CLEAN, landing)

    # positive control: pre-corruption, both snapshots report exactly clean
    control = validate_snapshots(
        spark, warehouse, landing, [SID_BAD, SID_CLEAN]
    ).collect()
    assert sorted(r["snapshot_id"] for r in control) == [SID_BAD, SID_CLEAN]
    assert all(r["expected"] == "no errors" for r in control)

    facts = [
        r
        for r in warehouse.read("siri_vehicle_location").collect()
        if r["snapshot_id"] == SID_BAD
    ]
    assert len(facts) == 3
    clean_facts = [
        r
        for r in warehouse.read("siri_vehicle_location").collect()
        if r["snapshot_id"] == SID_CLEAN
    ]

    # defect targets: three distinct rows of the bad snapshot
    dropped, duplicated, mutated = facts

    # 1+2: drop one row, duplicate another
    corrupted = [duplicated, duplicated, mutated] + clean_facts
    warehouse.overwrite(
        "siri_vehicle_location",
        spark.createDataFrame(corrupted, schemas.SIRI_VEHICLE_LOCATION_SCHEMA),
    )

    # 3: mutate the ride feeding the third row
    ride_stop_to_ride = {
        r["id"]: r["siri_ride_id"] for r in warehouse.read("siri_ride_stop").collect()
    }
    victim_ride = ride_stop_to_ride[mutated["siri_ride_stop_id"]]
    rides = [r.asDict() for r in warehouse.read("siri_ride").collect()]
    original_vr = next(r["vehicle_ref"] for r in rides if r["id"] == victim_ride)
    for r in rides:
        if r["id"] == victim_ride:
            r["vehicle_ref"] = "DRIFTED-999"
    warehouse.overwrite(
        "siri_ride", spark.createDataFrame(rides, schemas.SIRI_RIDE_SCHEMA)
    )

    report = validate_snapshots(
        spark, warehouse, landing, [SID_BAD, SID_CLEAN]
    ).collect()
    by_bad = [r for r in report if r["snapshot_id"] == SID_BAD]
    by_clean = [r for r in report if r["snapshot_id"] == SID_CLEAN]

    # D3: the duplicated fact key is flagged
    dup = [r for r in by_bad if r["expected"] == "matching num_db_items"]
    assert len(dup) == 1, f"duplicate-key finding missing: {by_bad}"

    # W7: the dropped fact row breaks key-set equality
    keyset = [
        r for r in by_bad if r["expected"] == "matching db_data and pmsv_data keys"
    ]
    assert len(keyset) == 1, f"key-set finding missing: {by_bad}"

    # J5: the mutated vehicle_ref is pinpointed with expected vs actual
    field = [r for r in by_bad if r["field"] == "vehicle_ref"]
    assert len(field) == 1, f"field finding missing: {by_bad}"
    assert field[0]["actual"] == "DRIFTED-999"
    assert field[0]["expected"] == str(original_vr)
    # ...anchored to the defective row's coordinates, not just the snapshot
    assert field[0]["lon"] == str(mutated["lon"])

    # no false 'no errors' for the corrupted snapshot
    assert not [r for r in by_bad if r["expected"] == "no errors"]

    # the sibling snapshot references the same (now drifted) ride, so it
    # must report the dim drift — and ONLY the dim drift: the row-level
    # defects (drop, duplicate) stay confined to the corrupted snapshot
    assert len(by_clean) == 1
    assert by_clean[0]["field"] == "vehicle_ref"
    assert by_clean[0]["actual"] == "DRIFTED-999"
    assert by_clean[0]["expected"] == str(original_vr)
