"""End-to-end throughput of the streaming curation loop
(start_text_curation_stream) plus the measured case for curation-log
compaction — the two artifacts round 9 left uncommitted: per-micro-batch
wall cost across K ingests, and the per-batch cost drop after
compact_curation_logs rewrites a long label/survivor log to its
latest-wins base.

Workload: K epochs each landing a full copy of the sf0.01 documents with
offset ids, in DESCENDING id order — every epoch's ids undercut all
previous ones, so every existing component RENAMES every epoch (min-id
component naming).  That is the adversarial regime for a log-structured
store: each batch appends updates for every previously-ingested doc, the
log grows quadratically while the current state grows linearly, and the
per-batch latest-wins/member reads scan ever more superseded records.
(The benign regime — disjoint batches — appends one live record per doc
and compaction would have nothing to remove; this bench measures the
regime compaction exists for.)

Two identical runs over the same landing sequence: one compacts after
epoch K, the control does not; both then ingest epoch K+1.  The
comparison prices compaction: log rows/files before vs after, and the
K+1 batch cost on a compacted vs uncompacted state.

Run: python tools/bench_curation_stream.py [--write]
(--write commits BENCH_CURATION_STREAM.json at the repo root)
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

from pyspark.sql import functions as F  # noqa: E402

from open_bus_siri_etl_spark.session import get_spark  # noqa: E402
from open_bus_siri_etl_spark.streaming.delta_dedup import (  # noqa: E402
    compact_curation_logs,
    read_current_labels,
    read_current_survivors,
    start_text_curation_stream,
)

ID_SPAN = 10_000_000
K_EPOCHS = 6


def land_epoch(docs, landing: Path, e: int, k_total: int) -> None:
    """Epoch e lands the corpus at offset (k_total - e) * ID_SPAN —
    descending across epochs, so every epoch renames every component."""
    docs.withColumn(
        "doc_id", F.col("doc_id") + (k_total - e) * ID_SPAN
    ).coalesce(1).write.parquet(str(landing / f"epoch_{e}"))


def drain(spark, landing, state, ckpt, schema) -> float:
    t0 = time.time()
    q = start_text_curation_stream(
        spark, str(landing), state, ckpt,
        max_files_per_trigger=1, trigger={"availableNow": True},
        schema=schema,
        # this bench prices MANUAL compaction; in-stream auto-compaction
        # must stay out of both sides' measured regimes
        auto_compact_min_batches=None,
    )
    q.awaitTermination(600)
    return round(time.time() - t0, 3)


def log_stats(state: str) -> dict:
    out = {}
    for name in ("labels", "survivors"):
        p = Path(state) / name
        files = list(p.glob("ingest_batch=*/*.parquet"))
        out[name] = {
            "files": len(files),
            "bytes": sum(f.stat().st_size for f in files),
        }
    return out


def run_side(spark, docs, work: Path, tag: str, compact: bool) -> dict:
    landing = work / f"landing_{tag}"
    state = str(work / f"state_{tag}")
    ckpt = str(work / f"ckpt_{tag}")
    schema = docs.schema
    epochs = []
    for e in range(K_EPOCHS):
        land_epoch(docs, landing, e, K_EPOCHS + 1)
        epochs.append(drain(spark, landing, state, ckpt, schema))
    side = {"epoch_sec": epochs, "log_before": log_stats(state)}
    if compact:
        t0 = time.time()
        stats = compact_curation_logs(spark, state)
        side["compact_sec"] = round(time.time() - t0, 3)
        side["compact_stats"] = stats
        side["log_after_compact"] = log_stats(state)
    land_epoch(docs, landing, K_EPOCHS, K_EPOCHS + 1)
    side["next_epoch_sec"] = drain(spark, landing, state, ckpt, schema)
    # the resolved views stay identical regardless of compaction
    side["n_labels"] = read_current_labels(spark, f"{state}/labels").count()
    side["n_survivors"] = read_current_survivors(
        spark, f"{state}/survivors"
    ).count()
    return side


def long_log_compaction(spark, work: Path) -> dict:
    """The cost component compaction actually targets, isolated: the
    label/survivor logs' latest-wins resolution grows with TOTAL log
    length (superseded records included), and in a long-running daemon
    that length is quadratic in epochs under the rename regime.  The
    K-epoch stream sections above run at toy scale where fixed per-batch
    overhead (stream machinery + the posting probe, which is all-live and
    NOT compactable) drowns the log term — so here a 64-batch
    superseded-heavy log is synthesized directly (every batch relabels
    everything before it, the descending-id pattern) and the read-side
    primitives (read_current_labels / read_current_survivors — the
    training-run read path AND the per-batch latest-wins component) are
    timed before and after compaction."""
    from open_bus_siri_etl_spark.streaming.delta_dedup import (
        _write_partition,
    )

    k_batches, n_base = 64, 2000
    labels_root = str(work / "ll" / "labels")
    surv_root = str(work / "ll" / "survivors")
    for e in range(k_batches):
        n = (e + 1) * n_base
        ids = spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") + (k_batches - e) * 10**9).alias("component"),
        )
        _write_partition(ids, e, labels_root)
        surv = ids.limit(n_base).select(
            "component",
            F.col("doc_id").alias("kept_doc_id"),
            F.lit(100).cast("long").alias("kept_n_chars"),
            F.lit(1).cast("long").alias("n_members"),
            (F.col("doc_id") % 3 == 0).alias("deleted"),
        )
        _write_partition(surv, e, surv_root)

    def timed_reads() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            read_current_labels(spark, labels_root).count()
            read_current_survivors(spark, surv_root).count()
            best = min(best, time.time() - t0)
        return round(best, 3)

    n_rows_before = spark.read.parquet(labels_root).count()
    before = timed_reads()
    t0 = time.time()
    stats = compact_curation_logs(spark, str(work / "ll"))
    compact_sec = round(time.time() - t0, 3)
    after = timed_reads()
    return {
        "k_batches": k_batches,
        "n_docs_final": k_batches * n_base,
        "label_log_rows_before": n_rows_before,
        "label_log_rows_after": stats["labels"]["rows_after"],
        "resolve_sec_before": before,
        "resolve_sec_after": after,
        "resolve_speedup": round(before / after, 2),
        "compact_sec": compact_sec,
        "compact_stats": stats,
    }


def main() -> None:
    spark = get_spark(app_name="bench-curation-stream")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "text", "n_chars"
    )
    n_docs = docs.count()
    work = Path(tempfile.mkdtemp(prefix="bench_curation_"))
    try:
        # compacted side FIRST: any first-run warm-up (codegen, OS page
        # cache on the inputs) then lands on the compacted side's
        # timings, biasing AGAINST the claimed speedup — conservative
        compacted = run_side(spark, docs, work, "compacted", compact=True)
        control = run_side(spark, docs, work, "control", compact=False)
        long_log = long_log_compaction(spark, work)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    assert control["n_labels"] == compacted["n_labels"]
    assert control["n_survivors"] == compacted["n_survivors"]
    out = {
        "metric": "curation_long_log_resolve_speedup_after_compaction",
        "value": long_log["resolve_speedup"],
        "unit": "x",
        "n_docs_per_epoch": n_docs,
        "k_epochs": K_EPOCHS,
        "workload": "descending-id full-corpus copies (every epoch renames "
        "every component — the adversarial update regime)",
        "note": "at this toy scale the full per-batch wall time is "
        "dominated by stream machinery and the posting probe (all-live, "
        "not compactable), so the stream sections demonstrate flat "
        "per-epoch THROUGHPUT and state shrink; long_log isolates the "
        "log-length-dependent read cost compaction targets on a 64-batch "
        "superseded-heavy log",
        "control": control,
        "compacted": compacted,
        "long_log": long_log,
    }
    print(json.dumps(out))
    if "--write" in sys.argv:
        (ROOT / "BENCH_CURATION_STREAM.json").write_text(
            json.dumps(out, indent=2) + "\n"
        )
        print("wrote BENCH_CURATION_STREAM.json")


if __name__ == "__main__":
    main()
