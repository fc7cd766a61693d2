"""Incremental vs full serving-copy relayout (r14 directive #1).

``relayout_store_by_cluster`` historically rewrote the FULL serving copy
per refresh; the r14 incremental mode folds only the post-mark tail into
the touched cluster partitions (dynamic partition overwrite).  This bench
pins the claim that matters at 100 TB: **refresh cost scales with the
TAIL, not the store** — a fixed-size 1% tail is folded into append
stores of growing size, and the incremental refresh time stays ~flat
while the full relayout time grows with the store.

The store is synthesized directly in the append-store shape the
streaming indexers write (rows carry ``cluster`` + an opaque payload,
partitioned by ``ingest_batch``) — the relayout job is schema-agnostic,
so the synthetic payload exercises exactly the code path the SQ8/PQ
stores take, without paying a 10M-vector encode per store size.

Writes BENCH_RELAYOUT.json with --write.
Run: python tools/bench_relayout.py [--write] [--work DIR]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from open_bus_siri_etl_spark.session import get_spark  # noqa: E402
from open_bus_siri_etl_spark.streaming.delta_dedup import (  # noqa: E402
    relayout_store_by_cluster,
)

N_CLUSTERS = 256
TOUCHED = 8  # the tail lands in 8 of 256 clusters (a real ingest's locality)
STORE_SIZES = [1_000_000, 4_000_000, 16_000_000]
TAIL_ROWS = 40_000  # FIXED tail across store sizes — the whole point


def synth_store(spark, path: str, n: int, batch: int, start: int,
                clusters=None) -> None:
    """Append-store rows: (vec_id, cluster, code) in ingest_batch=batch.
    ``code`` is a 32-byte opaque payload (the md5 hex of the id) so row
    width is in the streaming stores' ballpark."""
    rows = spark.range(start, start + n).select(
        F.col("id").alias("vec_id"),
        (
            F.col("id") % N_CLUSTERS
            if clusters is None
            else (F.col("id") % len(clusters)).cast("int")
        ).cast("int").alias("cluster"),
        F.md5(F.col("id").cast("string")).alias("code"),
        F.lit(batch).cast("long").alias("ingest_batch"),
    )
    if clusters is not None:
        # remap 0..k-1 onto the chosen cluster ids
        mapping = F.array(*[F.lit(c) for c in clusters])
        rows = rows.withColumn(
            "cluster", F.element_at(mapping, F.col("cluster") + 1)
        )
    rows.write.mode("append").partitionBy("ingest_batch").parquet(path)


def main() -> None:
    spark = get_spark(app_name="siri-etl-bench-relayout")
    spark.sparkContext.setLogLevel("ERROR")
    keep = "--work" in sys.argv
    work = (
        Path(sys.argv[sys.argv.index("--work") + 1])
        if keep
        else Path(tempfile.mkdtemp(prefix="bench_relayout_"))
    )
    work.mkdir(parents=True, exist_ok=True)
    out = {
        "n_clusters": N_CLUSTERS,
        "tail_rows": TAIL_ROWS,
        "touched_clusters": TOUCHED,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "stores": [],
    }
    try:
        # warm-up pass on a throwaway store: the first relayout of a fresh
        # session pays JVM/codegen/committer warm-up that would otherwise
        # land entirely on tier 1 and invert the measured slope
        warm = str(work / "index_warm")
        synth_store(spark, warm, 50_000, batch=0, start=0)
        relayout_store_by_cluster(spark, warm, str(work / "serving_warm"))
        for n in STORE_SIZES:
            index = str(work / f"index_{n}")
            serving = str(work / f"serving_{n}")
            if not os.path.isdir(index):
                synth_store(spark, index, n, batch=0, start=0)

            t0 = time.time()
            full = relayout_store_by_cluster(spark, index, serving)
            full_sec = round(time.time() - t0, 3)

            # land a FIXED-size tail touching a FIXED cluster set, then
            # refresh incrementally from the full relayout's mark
            synth_store(
                spark, index, TAIL_ROWS, batch=1, start=n,
                clusters=list(range(TOUCHED)),
            )
            t0 = time.time()
            inc = relayout_store_by_cluster(
                spark, index, serving,
                since_batch=full["max_ingest_batch"],
            )
            inc_sec = round(time.time() - t0, 3)
            row = {
                "store_rows": n,
                "full_relayout_sec": full_sec,
                "incremental_refresh_sec": inc_sec,
                "incremental_rows_rewritten": inc["rows"],
                "touched_clusters": inc["n_clusters"],
                "rewrite_fraction": round(inc["rows"] / (n + TAIL_ROWS), 4),
                "speedup_vs_full": round(full_sec / inc_sec, 2),
            }
            out["stores"].append(row)
            print(json.dumps(row), flush=True)
        sizes = [s["store_rows"] for s in out["stores"]]
        full_secs = [s["full_relayout_sec"] for s in out["stores"]]
        inc_secs = [s["incremental_refresh_sec"] for s in out["stores"]]
        out["slope"] = {
            "store_growth": round(sizes[-1] / sizes[0], 1),
            "full_relayout_growth": round(full_secs[-1] / full_secs[0], 2),
            "incremental_growth": round(inc_secs[-1] / inc_secs[0], 2),
            "claim": "incremental refresh time tracks the fixed tail "
            "(~flat across store sizes) while the full relayout "
            "grows with the store",
        }
    finally:
        if not keep:
            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    if "--write" in sys.argv:
        (ROOT / "BENCH_RELAYOUT.json").write_text(
            json.dumps(out, indent=2) + "\n"
        )


if __name__ == "__main__":
    main()
