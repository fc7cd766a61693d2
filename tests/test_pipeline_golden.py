"""Golden end-to-end test, ported from the reference's assertions
(/root/reference/tests/test_process_snapshot.py:79-174): 3 facts, 2 dead
letters, dims 3/3/3/3, control row counters, idempotency, dim reuse, and the
loading-status concurrency guard."""

import datetime

import pytest
from pyspark.sql import functions as F

from open_bus_siri_etl_spark import control
from open_bus_siri_etl_spark.pipeline import process_snapshot
from open_bus_siri_etl_spark.sources.snapshots import write_snapshot_fixture

from .fixtures import TEST_SNAPSHOT_DATA, TEST_SNAPSHOT_ID

UTC = datetime.timezone.utc


@pytest.fixture
def landing(tmp_path):
    root = str(tmp_path / "landing")
    write_snapshot_fixture(root, TEST_SNAPSHOT_ID, TEST_SNAPSHOT_DATA)
    return root


def run(spark, warehouse, landing, **kw):
    return process_snapshot(spark, warehouse, TEST_SNAPSHOT_ID, landing, **kw)


def assert_golden(spark, wh):
    # facts: 3 rows; first (by recorded_at_time) matches reference :79-87
    facts = wh.read("siri_vehicle_location")
    rows = facts.orderBy("recorded_at_time").collect()
    assert len(rows) == 3
    first = [r for r in rows if r["distance_from_journey_start"] == 4903][0]
    # 2019-05-05T16:00:15+03:00 == 13:00:15 UTC (session tz = UTC)
    assert first["recorded_at_time"] == datetime.datetime(2019, 5, 5, 13, 0, 15)
    assert (first["lon"], first["lat"]) == (34.749191, 31.874036)
    assert (first["bearing"], first["velocity"]) == (186, 50)

    # dim chain for the first fact (reference :89-101)
    ride_stop = (
        wh.read("siri_ride_stop").filter(F.col("id") == first["siri_ride_stop_id"]).collect()[0]
    )
    assert ride_stop["order"] == 13
    stop = wh.read("siri_stop").filter(F.col("id") == ride_stop["siri_stop_id"]).collect()[0]
    assert stop["code"] == 32043
    ride = wh.read("siri_ride").filter(F.col("id") == ride_stop["siri_ride_id"]).collect()[0]
    assert ride["journey_ref"] == "2019-05-05-56644704"
    assert ride["vehicle_ref"] == "8245384"
    assert ride["scheduled_start_time"] == datetime.datetime(2019, 5, 5, 12, 45)
    route = wh.read("siri_route").filter(F.col("id") == ride["siri_route_id"]).collect()[0]
    assert (route["operator_ref"], route["line_ref"]) == (25, 1)

    # dim counts (reference num_added 3/3/3/3)
    for t in ("siri_route", "siri_stop", "siri_ride", "siri_ride_stop"):
        assert wh.read(t).count() == 3, t

    # dead letters: 2 rows, both LineRef 26149 (reference :121-125)
    dl = wh.read("dead_letter", spark.createDataFrame([], "snapshot_id string, raw string").schema)
    dl_rows = dl.collect()
    assert len(dl_rows) == 2
    for r in dl_rows:
        assert '"LineRef":"26149"' in r["raw"].replace(" ", "")

    # control row (reference :109-120)
    ctl = control.get_control_row(wh, TEST_SNAPSHOT_ID)
    assert ctl["etl_status"] == control.ETL_LOADED
    assert ctl["error"] == ""
    assert ctl["num_successful_parse_vehicle_locations"] == 3
    assert ctl["num_failed_parse_vehicle_locations"] == 2


def test_process_snapshot_all_new_objects(spark, warehouse, landing):
    stats = run(spark, warehouse, landing)
    assert stats["num_successful"] == 3 and stats["num_failed"] == 2
    assert stats["num_added_siri_routes"] == 3
    assert stats["num_added_siri_stops"] == 3
    assert stats["num_added_siri_rides"] == 3
    assert stats["num_added_siri_ride_stops"] == 3
    assert_golden(spark, warehouse)


def test_process_snapshot_via_download_seam(spark, warehouse, tmp_path):
    """S2 fetch path end-to-end (reference process_snapshot.py:324-348,
    download=True): the snapshot exists only on a remote (a file:// bucket
    mirror here), is fetched as ``{id}.br`` into the landing root, decoded
    executor-side, and produces the full golden result."""
    import json

    from open_bus_siri_etl_spark.sources.snapshots import brotli_compress

    # remote bucket layout: {url}/{id}.br — compressed document only
    remote = tmp_path / "bucket"
    br_path = remote / f"{TEST_SNAPSHOT_ID}.br"
    br_path.parent.mkdir(parents=True)
    br_path.write_bytes(brotli_compress(json.dumps(TEST_SNAPSHOT_DATA).encode()))

    landing = str(tmp_path / "landing")  # empty — forces the download branch
    stats = process_snapshot(
        spark,
        warehouse,
        TEST_SNAPSHOT_ID,
        landing,
        download_url=remote.as_uri(),
    )
    assert stats["num_successful"] == 3 and stats["num_failed"] == 2
    assert_golden(spark, warehouse)


def test_idempotent_reload(spark, warehouse, landing):
    run(spark, warehouse, landing)
    stats = run(spark, warehouse, landing, force_reload=True)
    # rerun adds nothing, duplicates nothing (reference :159-164 semantics)
    assert stats["num_added_siri_routes"] == 0
    assert stats["num_added_siri_ride_stops"] == 0
    assert_golden(spark, warehouse)


def test_process_snapshot_existing_objects(spark, warehouse, landing):
    """Pre-seeded dims are reused, not duplicated (reference :142-156)."""
    from open_bus_siri_etl_spark import functions as fn
    from open_bus_siri_etl_spark.schemas import DIM_TABLES

    pre = spark.createDataFrame(
        [(25, 1)], "operator_ref int, line_ref int"
    ).select(
        fn.route_id(F.col("operator_ref"), F.col("line_ref")).alias("id"),
        "operator_ref",
        "line_ref",
    )
    warehouse.append("siri_route", pre)
    pre_id = pre.collect()[0]["id"]

    stats = run(spark, warehouse, landing)
    assert stats["num_added_siri_routes"] == 2  # (25,1) already existed
    routes = warehouse.read("siri_route")
    assert routes.count() == 3
    assert routes.filter(F.col("id") == pre_id).count() == 1
    assert_golden(spark, warehouse)


@pytest.mark.slow
def test_loading_status_blocks_concurrent(spark, warehouse, landing):
    """reference :167-174: fresh-heartbeat loading row blocks; force overrides."""
    run(spark, warehouse, landing)
    row = control.get_control_row(warehouse, TEST_SNAPSHOT_ID)
    row["etl_status"] = control.ETL_LOADING
    control._write_rows(warehouse, [row])
    with pytest.raises(control.SnapshotLoadingError):
        run(spark, warehouse, landing)
    stats = run(spark, warehouse, landing, force_reload=True)
    assert stats["num_successful"] == 3
    assert_golden(spark, warehouse)


@pytest.mark.slow
def test_error_snapshot_reprocessed_in_place(spark, warehouse, landing):
    """reference :159-164: errored snapshot reprocessed, same control id."""
    run(spark, warehouse, landing)
    first = control.get_control_row(warehouse, TEST_SNAPSHOT_ID)
    control.mark_error(warehouse, TEST_SNAPSHOT_ID, "boom")
    run(spark, warehouse, landing)
    second = control.get_control_row(warehouse, TEST_SNAPSHOT_ID)
    assert first["id"] == second["id"]
    assert second["etl_status"] == control.ETL_LOADED
    assert warehouse.read("siri_snapshot").count() == 1


def test_heartbeat_refreshes_during_processing(spark, warehouse, landing):
    """T5: the heartbeat written at start_loading is refreshed between the
    pipeline's Spark actions (amortization means at least the final beat
    lands at-or-after the loading-start heartbeat)."""
    from open_bus_siri_etl_spark import control as ctl

    run(spark, warehouse, landing)
    row = ctl.get_control_row(warehouse, TEST_SNAPSHOT_ID)
    assert row["etl_status"] == ctl.ETL_LOADED
    assert row["last_heartbeat"] is not None
    assert row["last_heartbeat"] >= row["etl_start_time"]


def test_bulk_heartbeat_amortization(spark, warehouse, landing):
    from open_bus_siri_etl_spark import control as ctl

    ctl.start_loading_bulk(warehouse, ["2019/05/05/16/00", "2019/05/05/16/01"])
    t1 = ctl.heartbeat_bulk(warehouse, ["2019/05/05/16/00", "2019/05/05/16/01"], None)
    # immediately again: amortized away, same timestamp returned
    t2 = ctl.heartbeat_bulk(warehouse, ["2019/05/05/16/00", "2019/05/05/16/01"], t1)
    assert t2 == t1
    rows = {
        r["snapshot_id"]: r
        for r in warehouse.read("siri_snapshot").collect()
    }
    assert rows["2019/05/05/16/01"]["last_heartbeat"] is not None
