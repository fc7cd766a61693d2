"""Spark-side timing of individual catalog entries (r14 optimization round):
build (fn() plan construction, incl. any eager training actions) and exec
(noop sink — guide §1.4: computes every column, discards the result)
measured separately, min over repeats.

Run: python tools/bench_entries.py [--sf DIR] [--repeats N] name [name ...]
Prints one line per entry: name, build_s, exec_s (mins), per-repeat arrays.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from open_bus_siri_etl_spark.plans.catalog import REGISTRY  # noqa: E402
from open_bus_siri_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
args = sys.argv[1:]
repeats = 3
if "--sf" in args:
    i = args.index("--sf")
    SF_DIR = args[i + 1]
    del args[i : i + 2]
if "--repeats" in args:
    i = args.index("--repeats")
    repeats = int(args[i + 1])
    del args[i : i + 2]

names = args or list(REGISTRY)


def main() -> None:
    spark = get_spark(app_name="bench-entries")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        if name not in REGISTRY:
            print(f"?? unknown entry {name}", file=sys.stderr)
            continue
        builds, execs = [], []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"bench-entries: {name} build")
            t0 = time.time()
            df = REGISTRY[name].fn(spark, SF_DIR)
            t1 = time.time()
            spark.sparkContext.setJobDescription(f"bench-entries: {name} exec")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            builds.append(round(t1 - t0, 3))
            execs.append(round(t2 - t1, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "build": min(builds),
            "exec": min(execs),
            "builds": builds,
            "execs": execs,
        }
        print(
            f"{name:40s} build {min(builds):7.3f}  exec {min(execs):7.3f}  "
            f"(builds {builds} execs {execs})",
            flush=True,
        )
    print(json.dumps({"sf_dir": SF_DIR, "repeats": repeats, "entries": out}))


if __name__ == "__main__":
    main()
