"""Scale-slope check (r15, verdict item 8): time the same catalog entries
at TWO scale factors in one session and report the exec-time slope — the
committed, re-runnable form of the r14 prose spot check.  A banded /
bucketed / broadcast shape should hold a near-flat slope between the
correctness SFs (both runs are per-stage-overhead-bound locally); a
superlinear slope flags an entry whose plan degrades with data size.

Exec is timed against the noop sink (guide §1.4), min over repeats,
same session for both SFs (steal-burst hygiene: cross-session single
captures are meaningless on this box).  Build time is reported too so a
training chain whose DRIVER actions grow with SF is visible.

Run: python tools/bench_scale_slope.py [--write] [--repeats N]
     [--sf-a DIR] [--sf-b DIR] [name ...]
Default entries: the r14 hot tail (trained-ANN / dedup / curation).
Writes one JSON line (and BENCH_SCALE_SLOPE.json with --write).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from open_bus_siri_etl_spark.plans.catalog import REGISTRY  # noqa: E402
from open_bus_siri_etl_spark.session import get_spark  # noqa: E402

#: the r14 cost-map hot tail: the entries whose slope claims the round
#: notes relied on (trained-ANN builds, delta dedup, curation evals)
DEFAULT_ENTRIES = [
    "ivf_pq_topk",
    "ivf_pq_residual_topk",
    "ivf_pq_refine_topk",
    "ivf_pq_kmeans_topk",
    "ivf_pq_balanced_topk",
    "ivf_pq_balanced_residual_topk",
    "sq8_ivf_topk",
    "sq8_residual_topk",
    "semantic_dedup_pairs",
    "embedding_ivf_ann",
    "embedding_cosine_pairs",
    "neardup_survivors_delta",
    "neardup_components_delta",
    "delta_pairs_recall_eval",
    "kmeans_clusters_k32",
    "heavy_hitters_mg",
    "gap_sessionization",
]


def _steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    args = sys.argv[1:]
    write = "--write" in args
    if write:
        args.remove("--write")
    repeats = 2
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i : i + 2]
    sf_a, sf_b = "/root/testdata/sf0.001", "/root/testdata/sf0.01"
    if "--sf-a" in args:
        i = args.index("--sf-a")
        sf_a = args[i + 1]
        del args[i : i + 2]
    if "--sf-b" in args:
        i = args.index("--sf-b")
        sf_b = args[i + 1]
        del args[i : i + 2]
    names = args or [n for n in DEFAULT_ENTRIES if n in REGISTRY]

    spark = get_spark(app_name="bench-scale-slope")
    spark.sparkContext.setLogLevel("ERROR")
    steal0 = _steal()
    entries: dict[str, dict] = {}
    for name in names:
        if name not in REGISTRY:
            print(f"?? unknown entry {name}", file=sys.stderr)
            continue
        per_sf = {}
        for tag, sf_dir in (("a", sf_a), ("b", sf_b)):
            builds, execs = [], []
            for _ in range(repeats):
                spark.sparkContext.setJobDescription(
                    f"scale-slope: {name} @{sf_dir}"
                )
                t0 = time.time()
                df = REGISTRY[name].fn(spark, sf_dir)
                t1 = time.time()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.time()
                builds.append(round(t1 - t0, 3))
                execs.append(round(t2 - t1, 3))
            per_sf[tag] = {
                "build": min(builds),
                "exec": min(execs),
                "builds": builds,
                "execs": execs,
            }
        spark.sparkContext.setJobDescription(None)
        slope = round(
            per_sf["b"]["exec"] / max(per_sf["a"]["exec"], 1e-9), 2
        )
        entries[name] = {
            "exec_a": per_sf["a"]["exec"],
            "exec_b": per_sf["b"]["exec"],
            "exec_slope": slope,
            "build_a": per_sf["a"]["build"],
            "build_b": per_sf["b"]["build"],
            "build_slope": round(
                per_sf["b"]["build"] / max(per_sf["a"]["build"], 1e-9), 2
            ),
            "per_repeat": {
                "a": per_sf["a"],
                "b": per_sf["b"],
            },
        }
        print(
            f"{name:36s} exec {per_sf['a']['exec']:7.3f} -> "
            f"{per_sf['b']['exec']:7.3f}  (x{slope:5.2f})   build "
            f"{per_sf['a']['build']:7.3f} -> {per_sf['b']['build']:7.3f}",
            flush=True,
        )
    out = {
        "metric": "catalog_scale_slope",
        "sf_a": sf_a,
        "sf_b": sf_b,
        "repeats": repeats,
        "timing": "min_of_repeats_noop_sink_same_session",
        "steal_jiffies_during_run": _steal() - steal0,
        "entries": entries,
    }
    print(json.dumps(out))
    if write:
        (ROOT / "BENCH_SCALE_SLOPE.json").write_text(
            json.dumps(out, indent=1) + "\n"
        )


if __name__ == "__main__":
    main()
