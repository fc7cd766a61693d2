"""Property-based tests for the typed-parse + dead-letter split: on ANY
snapshot document, every visit lands in exactly one of {valid, dead-letter},
and validity matches the reference's try/except semantics (required fields
castable; optional fields default only when absent)."""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from open_bus_siri_etl_spark.operators.flatten import iterate_monitored_stop_visits
from open_bus_siri_etl_spark.operators.parse import (
    dead_letters,
    parse_monitored_stop_visits,
    valid_pmsv,
)
from open_bus_siri_etl_spark.sources.snapshots import read_snapshots, write_snapshot_fixture

num_str = st.integers(min_value=0, max_value=99999).map(str)
ts_str = st.datetimes(
    min_value=__import__("datetime").datetime(2019, 1, 1),
    max_value=__import__("datetime").datetime(2025, 1, 1),
).map(lambda d: d.strftime("%Y-%m-%dT%H:%M:%S+03:00"))
garbage = st.sampled_from(["", "abc", "12x", "-", "NaN-ish"])


def visit_strategy():
    maybe = lambda s: st.one_of(st.none(), s, garbage)  # noqa: E731
    return st.fixed_dictionaries(
        {
            "RecordedAtTime": maybe(ts_str),
            "MonitoredVehicleJourney": st.fixed_dictionaries(
                {
                    "LineRef": maybe(num_str),
                    "OperatorRef": maybe(num_str),
                    "FramedVehicleJourneyRef": st.fixed_dictionaries(
                        {
                            "DataFrameRef": maybe(st.just("2019-05-05")),
                            "DatedVehicleJourneyRef": maybe(num_str),
                        }
                    ),
                    "OriginAimedDepartureTime": maybe(ts_str),
                    "VehicleRef": maybe(num_str),
                    "Bearing": maybe(num_str),
                    "Velocity": maybe(num_str),
                    "VehicleLocation": st.one_of(
                        st.none(),
                        st.fixed_dictionaries(
                            {
                                "Longitude": maybe(st.just("34.75")),
                                "Latitude": maybe(st.just("31.87")),
                            }
                        ),
                    ),
                    "MonitoredCall": st.one_of(
                        st.none(),
                        st.fixed_dictionaries(
                            {
                                "StopPointRef": maybe(num_str),
                                "Order": maybe(num_str),
                                "DistanceFromStop": maybe(num_str),
                            }
                        ),
                    ),
                }
            ),
        }
    )


def reference_is_valid(visit: dict) -> bool:
    """The reference's parse_monitored_stop_visit (process_snapshot.py:214-237)
    re-implemented as a plain-Python predicate: any exception → dead letter."""
    import datetime

    try:
        mvj = visit["MonitoredVehicleJourney"]
        datetime.datetime.strptime(visit["RecordedAtTime"], "%Y-%m-%dT%H:%M:%S%z")
        int(mvj["LineRef"])
        int(mvj["OperatorRef"])
        fr = mvj["FramedVehicleJourneyRef"]
        if fr["DataFrameRef"] is None or fr["DatedVehicleJourneyRef"] is None:
            return False
        datetime.datetime.strptime(
            mvj["OriginAimedDepartureTime"], "%Y-%m-%dT%H:%M:%S%z"
        )
        int(mvj["MonitoredCall"]["Order"])
        int(mvj["MonitoredCall"]["StopPointRef"])
        float(mvj["VehicleLocation"]["Longitude"])
        float(mvj["VehicleLocation"]["Latitude"])
        for opt in ("Bearing", "Velocity"):
            if mvj.get(opt) is not None:
                int(mvj[opt])
        if mvj["MonitoredCall"].get("DistanceFromStop") is not None:
            int(mvj["MonitoredCall"]["DistanceFromStop"])
        return True
    except (KeyError, TypeError, ValueError):
        return False


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(visits=st.lists(visit_strategy(), min_size=1, max_size=6))
def test_split_matches_reference_semantics(spark, tmp_path_factory, visits):
    doc = {
        "Siri": {
            "ServiceDelivery": {
                "StopMonitoringDelivery": [{"MonitoredStopVisit": visits}]
            }
        }
    }
    root = str(tmp_path_factory.mktemp("prop"))
    write_snapshot_fixture(root, "2024/01/01/00/00", doc)
    parsed = parse_monitored_stop_visits(
        iterate_monitored_stop_visits(read_snapshots(spark, f"{root}/2024/01/01/00/00.json"))
    )
    n_valid = valid_pmsv(parsed).count()
    n_dead = dead_letters(parsed).count()
    assert n_valid + n_dead == len(visits)  # total conservation
    expected_valid = sum(1 for v in visits if reference_is_valid(v))
    assert n_valid == expected_valid


# ---------------------------------------------------------------------------
# MERGE emulation properties: for ANY target/source (unique on the key),
# merge_frames must equal the reference semantics computed in plain Python —
# matched keys take source values (including explicit NULLs: UPDATE, not
# coalesce), unmatched flow through.
# ---------------------------------------------------------------------------

row_val = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    target=st.dictionaries(st.integers(0, 12), row_val, max_size=8),
    source=st.dictionaries(st.integers(0, 12), row_val, max_size=8),
)
def test_merge_frames_property(spark, target, source):
    from open_bus_siri_etl_spark.operators.upsert import merge_frames

    t_df = spark.createDataFrame(
        [(k, v) for k, v in target.items()], "id long, v int"
    )
    s_df = spark.createDataFrame(
        [(k, v) for k, v in source.items()], "id long, v int"
    )
    got = {r["id"]: r["v"] for r in merge_frames(t_df, s_df, ["id"]).collect()}
    want = {**target, **source}
    assert got == want
