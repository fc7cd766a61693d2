"""Benchmark harness (driver contract): run the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.

Each query is executed as a full action (count of the materialized result) so
scan→shuffle→agg all run; timings are per-query wall clock after a warm-up of
the session (first query pays JVM/codegen warm-up, so a trivial warm-up scan
runs first).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from open_bus_siri_etl_spark.plans.catalog import REGISTRY  # noqa: E402
from open_bus_siri_etl_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "flagship_snowflake",
    "pricing_summary",
    "dedup_first_wins",
    "gap_sessionization",
    "broadcast_enrichment",
    "dim_upsert_novelty",
    "latest_per_key",
    "missing_minutes",
    "heavy_hitters_mg",
    "kmeans_clusters_k32",
]


WARMUP_SF_DIR = "/root/testdata/sf0.001"


def parse_sf(sf_dir: str) -> float:
    """Best-effort scale factor from a .../sfN.NN dir name; -1.0 when the
    path carries no parseable suffix (e.g. 'sfdata') — an unattended bench
    run must report sf=-1.0, never crash on its own argument parsing."""
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    except ValueError:
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = parse_sf(sf_dir)
    spark = get_spark(app_name="siri-etl-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in REGISTRY]

    # Warm-up pass (standard benchmark practice): run every headline plan once
    # at the smallest SF so one-time costs — JVM JIT, whole-stage-codegen
    # compilation, broadcast thread pools, parquet footer caches — are paid
    # before measurement.  The measured runs below still execute the full
    # scan/shuffle/agg at the target SF.
    warm_dir = WARMUP_SF_DIR if os.path.isdir(WARMUP_SF_DIR) else sf_dir
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for name in names:
        try:
            REGISTRY[name].fn(spark, warm_dir).count()
        except Exception:
            pass  # warm-up must never fail the bench

    # min-of-N per query: single runs at local scale are ±10% noise (GC,
    # page cache, scheduler jitter); the minimum is the steady-state latency
    # and is the standard way to report microbench-scale timings.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    # the two historically noisy entries get extra repeats so their min is
    # anchored even under background load (round-6/7 verdict directive)
    extra_repeat_names = {"kmeans_clusters_k32", "heavy_hitters_mg"}
    extra_repeats = max(repeats, 5)
    # Idle gate (round-12 load-hygiene ritual, SELF-GATING since round 13
    # per the r12 verdict: driver runs don't set env vars, so the bench
    # now waits on its own).  Two tiers:
    #   - default: if the 1-min loadavg exceeds 8 (a genuinely busy box —
    #     ~25% of this 32-core host before the bench's own threads), wait
    #     up to SPARK_GRAFT_BENCH_IDLE_WAIT_SEC (default 300) for it to
    #     drop, else proceed and record a timing_note in the artifact;
    #   - SPARK_GRAFT_BENCH_REQUIRE_IDLE=1 (builder close ritual): the
    #     stricter threshold 4 with a 600 s default budget.
    # SPARK_GRAFT_BENCH_NO_GATE=1 disables all waiting (CI smoke runs).
    require_idle = os.environ.get("SPARK_GRAFT_BENCH_REQUIRE_IDLE") == "1"
    gate_threshold = 4.0 if require_idle else 8.0
    idle_budget = int(
        os.environ.get(
            "SPARK_GRAFT_BENCH_IDLE_WAIT_SEC", "600" if require_idle else "300"
        )
    )
    if os.environ.get("SPARK_GRAFT_BENCH_NO_GATE") == "1":
        idle_budget = 0

    # Gate on BOTH the 1-min and 5-min loadavg (round-14 directive: the r13
    # artifact passed the 1-min gate at 6.79 while the 5-min average sat ~20,
    # so load_flag came out true with no timing_note).  The 5-min average is
    # what actually predicts contention over a multi-minute bench window.
    def _gate_load() -> float:
        la = os.getloadavg()
        return max(la[0], la[1])

    idle_waited = 0
    while _gate_load() > gate_threshold and idle_waited < idle_budget:
        time.sleep(15)
        idle_waited += 15
    timing_note = None
    if _gate_load() > gate_threshold and idle_budget > 0:
        la = os.getloadavg()
        timing_note = (
            f"idle gate expired after {idle_waited}s with 1/5-min loadavg "
            f"{la[0]:.1f}/{la[1]:.1f} > {gate_threshold:g}: timings below "
            "are inflated by background load; trust per-query mins only"
        )
    load_before = os.getloadavg()
    timings: dict[str, float] = {}
    per_repeat: dict[str, list[float]] = {}
    spread: dict[str, float] = {}
    for name in names:
        q = REGISTRY[name]
        runs = []
        for _ in range(extra_repeats if name in extra_repeat_names else repeats):
            t0 = time.time()
            q.fn(spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
        per_repeat[name] = runs
        timings[name] = min(runs)
        spread[name] = round((max(runs) - min(runs)) / max(min(runs), 1e-9), 3)
    load_after = os.getloadavg()

    total = round(sum(timings.values()), 3)
    # a busy box inflates every timing: flag the artifact itself when the
    # 1-min loadavg (beyond this bench's own ~32 worker threads' share,
    # which dominates load_after) was already high BEFORE the bench ran —
    # consumers must discount regressions carrying load_flag=true.  The flag
    # consults both the 1- and 5-min averages (r14: a spike that just decayed
    # below the 1-min bar still poisons a multi-minute window).
    load_flag = max(load_before[0], load_before[1]) > 4.0
    if load_flag and timing_note is None:
        # the artifact must never carry load_flag=true silently (r13 gap):
        # explain why the gate let the run proceed anyway
        timing_note = (
            f"load_flag=true: 1/5-min loadavg {load_before[0]:.1f}/"
            f"{load_before[1]:.1f} at start exceeded 4.0 but sat under the "
            f"gate threshold {gate_threshold:g} (waited {idle_waited}s); "
            "per-query mins are the trustworthy numbers"
        )
    out = {
        "metric": "catalog_headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # methodology must be visible in the artifact: per-query value is the
        # min over `repeats` runs (round-3+ change; round-1/2 were single-run);
        # the full per-repeat arrays distinguish noise (wide spread, stable
        # min) from a genuine regression (shifted min) — round-5 verdict ask
        "repeats": repeats,
        "extra_repeats": {n: extra_repeats for n in extra_repeat_names if n in timings},
        "timing": "min_of_repeats",
        "per_repeat_sec": per_repeat,
        # (max-min)/min per query: >~0.15 means the box was noisy during
        # that query's window and its min is the only trustworthy number
        "spread": spread,
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in load_after],
        "load_flag": load_flag,
        "idle_gate_waited_sec": idle_waited,
        "idle_gate_threshold": gate_threshold,
        # scaling legibility (r14 verdict item 2): the artifact itself must
        # prove the parallelism that was actually applied, so a reduced-core
        # driver run can distinguish "CPUS honored but overhead-bound at this
        # SF" from "CPUS ignored".  Both values come from the live context.
        "cpus_applied": spark.sparkContext.defaultParallelism,
        "master": spark.sparkContext.master,
    }
    if timing_note:
        out["timing_note"] = timing_note

    # Regression guard: compare against the committed standing baseline
    # (round-1 driver numbers) so a slower plan is mechanically visible.
    # Ratios only make sense at the baseline's SF.
    baseline_path = Path(__file__).resolve().parent / "BASELINE_BENCH.json"
    if baseline_path.is_file():
        try:
            base = json.loads(baseline_path.read_text())
            if base.get("sf") == sf and base.get("queries"):
                # compare over queries present in BOTH runs so adding new
                # headline entries can't masquerade as a regression
                shared = [n for n in timings if base["queries"].get(n)]
                out["vs_baseline"] = {
                    n: round(timings[n] / base["queries"][n], 2) for n in shared
                }
                out["vs_baseline_total"] = round(
                    sum(timings[n] for n in shared)
                    / sum(base["queries"][n] for n in shared),
                    2,
                )
        except Exception:
            pass  # the baseline must never fail the bench

    print(json.dumps(out))


if __name__ == "__main__":
    main()
