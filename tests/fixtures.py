"""Golden SIRI snapshot fixture, ported from the reference test suite
(/root/reference/tests/test_process_snapshot.py:19-67): 3 valid + 2 invalid
MonitoredStopVisits; the invalid pair (LineRef 26149) lacks VehicleLocation
and duplicates each other.  Expected post-ETL values come from the reference's
own assertions (:79-126) — see FIXTURES.md §4.
"""

import copy
import json

TEST_SNAPSHOT_ID = "2019/05/05/16/00"

_VALID_VISITS = [
    {
        "RecordedAtTime": "2019-05-05T16:00:15+03:00",
        "MonitoredVehicleJourney": {
            "LineRef": "1",
            "FramedVehicleJourneyRef": {
                "DataFrameRef": "2019-05-05",
                "DatedVehicleJourneyRef": "56644704",
            },
            "OperatorRef": "25",
            "OriginAimedDepartureTime": "2019-05-05T15:45:00+03:00",
            "VehicleLocation": {"Longitude": "34.749191", "Latitude": "31.874036"},
            "Bearing": "186",
            "Velocity": "50",
            "VehicleRef": "8245384",
            "MonitoredCall": {
                "StopPointRef": "32043",
                "Order": "13",
                "DistanceFromStop": "4903",
            },
        },
    },
    {
        "RecordedAtTime": "2019-05-05T16:00:00+03:00",
        "MonitoredVehicleJourney": {
            "LineRef": "3",
            "FramedVehicleJourneyRef": {
                "DataFrameRef": "2019-05-05",
                "DatedVehicleJourneyRef": "27659116",
            },
            "OperatorRef": "25",
            "OriginAimedDepartureTime": "2019-05-05T16:05:00+03:00",
            "VehicleLocation": {"Longitude": "34.731296", "Latitude": "31.890804"},
            "Bearing": "246",
            "Velocity": "0",
            "VehicleRef": "8245484",
            "MonitoredCall": {
                "StopPointRef": "37471",
                "Order": "1",
                "DistanceFromStop": "0",
            },
        },
    },
    {
        "RecordedAtTime": "2019-05-05T16:00:51+03:00",
        "MonitoredVehicleJourney": {
            "LineRef": "5",
            "FramedVehicleJourneyRef": {
                "DataFrameRef": "2019-05-05",
                "DatedVehicleJourneyRef": "49957061",
            },
            "OperatorRef": "25",
            "OriginAimedDepartureTime": "2019-05-05T15:35:00+03:00",
            "VehicleLocation": {"Longitude": "34.734901", "Latitude": "31.897741"},
            "Bearing": "200",
            "Velocity": "50",
            "VehicleRef": "56269001",
            "MonitoredCall": {
                "StopPointRef": "32521",
                "Order": "30",
                "DistanceFromStop": "8779",
            },
        },
    },
]

# invalid: missing VehicleLocation → required-cast failure → dead letter
_INVALID_VISIT = {
    "RecordedAtTime": "2019-05-05T16:00:53+03:00",
    "MonitoredVehicleJourney": {
        "LineRef": "26149",
        "FramedVehicleJourneyRef": {
            "DataFrameRef": "2019-05-05",
            "DatedVehicleJourneyRef": "58736023",
        },
        "OperatorRef": "2",
        "OriginAimedDepartureTime": "2019-05-05T15:45:00+03:00",
        "Bearing": "0",
        "Velocity": "0",
        "VehicleRef": "404",
        "MonitoredCall": {
            "StopPointRef": "17016",
            "Order": "23",
            "DistanceFromStop": "0",
        },
    },
}

TEST_SNAPSHOT_DATA = {
    "Siri": {
        "ServiceDelivery": {
            "ResponseTimestamp": "2019-05-05T16:00:45+03:00",
            "ProducerRef": "Moran",
            "ResponseMessageIdentifier": "ed4c5b10-759c-458a-9f21-99458c5648ec",
            "RequestMessageRef": "1620199645019",
            "Status": "true",
            "StopMonitoringDelivery": [
                {
                    "ResponseTimestamp": "2019-05-05T16:00:45+03:00",
                    "Status": "true",
                    "MonitoredStopVisit": _VALID_VISITS
                    + [_INVALID_VISIT, copy.deepcopy(_INVALID_VISIT)],
                }
            ],
        }
    }
}


def get_test_snapshot_data(date_str: str | None = None, time_str: str | None = None) -> dict:
    """Date/time-shifted variants via string substitution, like the
    reference's get_test_snapshot_data (:70-76)."""
    data = copy.deepcopy(TEST_SNAPSHOT_DATA)
    text = json.dumps(data)
    if date_str:
        text = text.replace("2019-05-05", date_str)
    if time_str:
        text = text.replace("16:00", time_str)
    return json.loads(text)
