"""Per-ingest clustering cost: incremental connected components
(connected_components_delta over jaccard_delta_pairs) vs batch
recomputation (neardup_membership over the full corpus) as the corpus
grows with the delta held fixed — the round-8 companion to
BENCH_DELTA_SCALING (embedding side) for the clustering stage.

Corpus tiers are synthesized from sf0.1 documents: copy i tags every
WORD with the copy index (tokens are space-split, so every word 3-gram
shingle of copy i differs from every shingle of copy j != i — shingle
sets across copies are fully disjoint at ANY copy count, unlike the
letter-rotation trick whose 25 distinct rotations collide past 25x),
per-doc workload is identical, and no artificial cross-copy clusters
inflate the pair list.  The incremental path's inputs are what a real
ingest has on hand: the PRE-COMPUTED labeling of the history (built once,
maintained by these very fold-ins) and the delta batch; its per-ingest
cost is the delta pair generation (delta postings broadcast against one
streaming pass of history postings) plus CC on the contracted graph —
history-size-independent except the posting probe.

Run: python tools/bench_cc_delta.py [--write]
(--write commits BENCH_CC_DELTA.json at the repo root)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from open_bus_siri_etl_spark.operators.dedup import (  # noqa: E402
    build_shingle_index,
    connected_components_delta,
    jaccard_delta_pairs,
    neardup_membership,
)
from open_bus_siri_etl_spark.session import get_spark  # noqa: E402

ID_SPAN = 10_000_000
THRESHOLD = 0.5


def tagged_copies(base, n_copies: int):
    """Union n_copies with every WORD suffixed by the copy index and ids
    offset: token bijection per copy keeps within-copy Jaccard identical
    (same near-dup structure, same per-doc workload) while making shingle
    sets fully disjoint across copies for any n_copies."""
    parts = []
    for i in range(n_copies):
        part = base.withColumn("doc_id", F.col("doc_id") + i * ID_SPAN)
        if i:
            part = part.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", rf"$1~{i}")
            )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def main() -> None:
    spark = get_spark(app_name="bench-cc-delta")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    base = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0).cache()
    n_delta = delta.count()

    results = []
    for n_copies in (1, 2, 4, 8, 16, 32, 64):
        history = tagged_copies(base, n_copies).repartition(32).cache()
        n_history = history.count()
        tier = {"tier": f"{n_copies}x", "n_history": n_history, "n_delta": n_delta}

        # one-time state the incremental path maintains (built by the
        # previous ingests in production) — measured separately
        t0 = time.time()
        labels = neardup_membership(history, THRESHOLD).localCheckpoint(eager=True)
        tier["labels_build_sec"] = round(time.time() - t0, 3)
        t0 = time.time()
        postings = build_shingle_index(history).repartition(32).cache()
        postings.count()
        tier["posting_index_build_sec"] = round(time.time() - t0, 3)

        def batch():
            return neardup_membership(
                history.unionByName(delta), THRESHOLD
            )

        def incremental():
            # production shape: pair generation probes the PERSISTED
            # posting index — the history is never re-shingled per ingest
            pairs = jaccard_delta_pairs(
                None, delta, threshold=THRESHOLD, history_postings=postings
            )
            return connected_components_delta(
                labels, delta.select("doc_id"), pairs
            )

        for label, fn in (("batch", batch), ("incremental", incremental)):
            fn().count()  # warm-up
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                n_rows = fn().count()
                best = min(best, time.time() - t0)
            tier[f"{label}_sec"] = round(best, 3)
            tier[f"{label}_rows"] = n_rows
        tier["speedup"] = round(tier["batch_sec"] / tier["incremental_sec"], 2)
        history.unpersist()
        postings.unpersist()
        results.append(tier)
        print(json.dumps(tier))

    out = {
        "metric": "incremental_cc_scaling",
        "threshold": THRESHOLD,
        "tiers": results,
    }
    if "--write" in sys.argv:
        (ROOT / "BENCH_CC_DELTA.json").write_text(json.dumps(out, indent=2) + "\n")
        print("wrote BENCH_CC_DELTA.json")


if __name__ == "__main__":
    main()
