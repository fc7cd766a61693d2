"""Benchmark the full TPC-H suite (all 22 queries, Q1 = pricing_summary) at
sf0.1 — the standard regression net for the join/agg shapes the catalog
claims completely.  Same methodology as bench.py / bench_training.py:
warm-up pass at the smallest SF, then min-of-N wall clock per query.
Writes one JSON line (and BENCH_TPCH.json at the repo root with --write).

Run: python tools/bench_tpch.py [--write]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from open_bus_siri_etl_spark.plans.catalog import REGISTRY  # noqa: E402
from open_bus_siri_etl_spark.session import get_spark  # noqa: E402

# canonical TPC-H ordering; Q1 is the catalog's pricing_summary entry and
# Q4 its late_shipment_priority entry (registered before the tpch_ prefix
# convention)
_Q = {n: int(n.split("_q")[1].split("_")[0]) for n in REGISTRY if n.startswith("tpch_q")}
SUITE = (
    ["pricing_summary"]
    + [n for n in sorted(_Q, key=_Q.get) if _Q[n] < 4]
    + ["late_shipment_priority"]
    + [n for n in sorted(_Q, key=_Q.get) if _Q[n] > 4]
)

WARMUP_SF_DIR = "/root/testdata/sf0.001"


# single definition lives in bench.py (repo root, already on sys.path)
from bench import parse_sf  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = parse_sf(sf_dir)
    spark = get_spark(app_name="siri-etl-bench-tpch")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in SUITE if n in REGISTRY]
    warm_dir = WARMUP_SF_DIR if os.path.isdir(WARMUP_SF_DIR) else sf_dir
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for name in names:
        try:
            REGISTRY[name].fn(spark, warm_dir).count()
        except Exception:
            pass  # warm-up must never fail the bench

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            REGISTRY[name].fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    out = {
        "metric": "tpch_suite_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "repeats": repeats,
        "timing": "min_of_repeats",
    }
    print(json.dumps(out))
    if "--write" in sys.argv:
        (ROOT / "BENCH_TPCH.json").write_text(json.dumps(out, indent=2) + "\n")


if __name__ == "__main__":
    main()
