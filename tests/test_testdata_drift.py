"""Canary against driver testdata regeneration drift.

The driver regenerated the synthetic fixtures once mid-project (round 1 → 2:
events.ts flipped from parquet TIMESTAMP(NANOS) to timestamp[us]), which broke
28 gate entries at once.  This test pins the contract of the catalog's t()
loader: whatever physical type events.ts carries on disk — int64 nanos,
timestamp[us], or timestamp[ns] — t() must surface a plain TIMESTAMP column
with correct micros values, so every downstream query is insulated from the
next regeneration.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import TimestampType

from open_bus_siri_etl_spark.plans.catalog import t

SF_DIR = "/root/testdata/sf0.001"


def test_live_testdata_ts_is_timestamp(spark):
    if not os.path.exists(f"{SF_DIR}/events.parquet"):
        pytest.skip("driver testdata not present")
    df = t(spark, SF_DIR, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType), (
        f"t() must normalize events.ts to TIMESTAMP, got {df.schema['ts'].dataType}; "
        "the driver likely regenerated testdata with a new physical type — "
        "extend the branch in plans/catalog.py::t()"
    )
    # values must be sane (the synthetic data is all 2024+ epochs)
    row = df.selectExpr("min(ts) AS lo", "max(ts) AS hi").collect()[0]
    assert row["lo"].year >= 2000
    assert row["hi"].year <= 2100


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_t_adapts_to_physical_unit(spark, tmp_path, unit):
    # same logical instants written in two physical encodings must read back
    # field-identical through t()
    micros = [1_700_000_000_000_000, 1_700_000_123_456_789]
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([m * 1000 if unit == "ns" else m for m in micros],
                           pa.timestamp(unit)),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["view", "click"]),
            "value": pa.array([1.0, 2.0]),
            "props": pa.array(["{}", "{}"]),
        }
    )
    d = tmp_path / unit
    d.mkdir()
    pq.write_table(table, d / "events.parquet", store_schema=(unit != "ns"))
    df = t(spark, str(d), "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = sorted(
        r["us"] for r in df.selectExpr("unix_micros(ts) AS us").collect()
    )
    assert got == micros
