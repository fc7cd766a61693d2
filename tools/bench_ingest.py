"""SIRI ingest throughput benchmark — the reference-parity performance
claim, measured instead of asserted.

The reference's operational envelope is 1 snapshot/minute sustained on a
single process (daemon cadence, reference process_snapshot.py:543-547;
BASELINE.md).  This tool lands N time-shifted copies of the golden fixture
in the canonical YYYY/MM/DD/HH/MM.json layout, ingests them through the
bulk pipeline (one multi-file Spark job: flatten → parse → dead-letter
split → 4 dim upserts → fact append → control-table bulk update), and
prints one JSON line with snapshots/minute.

Run: python tools/bench_ingest.py [n_snapshots] (default 120 = two hours
of minute-cadence data per job).
"""

from __future__ import annotations

import datetime
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 120

    from fixtures import get_test_snapshot_data

    from open_bus_siri_etl_spark import pipeline
    from open_bus_siri_etl_spark.session import get_spark
    from open_bus_siri_etl_spark.sources.snapshots import write_snapshot_fixture
    from open_bus_siri_etl_spark.sources.tables import Warehouse

    spark = get_spark(app_name="bench-ingest")
    root = tempfile.mkdtemp(prefix="bench_ingest_")
    landing, wh_path = f"{root}/landing", f"{root}/warehouse"
    try:
        base = datetime.datetime(2019, 5, 5, 16, 0)
        ids = []
        for i in range(n):
            ts = base + datetime.timedelta(minutes=i)
            sid = ts.strftime("%Y/%m/%d/%H/%M")
            ids.append(sid)
            write_snapshot_fixture(
                landing,
                sid,
                get_test_snapshot_data(
                    ts.strftime("%Y-%m-%d"), ts.strftime("%H:%M")
                ),
            )

        # warm-up on a disjoint warehouse: JVM/codegen/Arrow init dominates
        # cold runs and is a per-process cost, not a per-snapshot one
        warm = Warehouse(spark, f"{root}/warehouse_warm")
        pipeline.process_snapshots_bulk(spark, warm, ids[:2], landing)

        wh = Warehouse(spark, wh_path)
        t0 = time.time()
        stats = pipeline.process_snapshots_bulk(spark, wh, ids, landing)
        elapsed = time.time() - t0

        n_loaded = sum(
            1 for s in stats.values() if s.get("num_successful", 0) > 0
        )
        n_facts = wh.read("siri_vehicle_location").count()
        print(
            json.dumps(
                {
                    "metric": "siri_ingest_throughput",
                    "snapshots": n,
                    "loaded": n_loaded,
                    "fact_rows": n_facts,
                    "elapsed_sec": round(elapsed, 2),
                    "snapshots_per_min": round(n / elapsed * 60, 1),
                    "reference_envelope_per_min": 1,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
