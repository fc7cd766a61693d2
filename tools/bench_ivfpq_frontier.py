"""Recall/cost frontier for the DEPLOYABLE IVF-PQ stack (round-10
directive #3): trained coarse + residual PQ + exact refine, swept over
the two serving knobs — n_probe (coarse pruning) and refine_k (ADC
shortlist size; 0 = straight ADC) — on the 300k topic-structured corpus,
the first tier where the approximate stack beats exact on cost.  Each
config row carries serve_sec AND recall@10 against the same exact list,
plus the candidate-recall ceiling per n_probe (what the coarse stage
leaves on the table regardless of the shortlist).

The artifact's ``serving_default`` is the measured knee: the cheapest
config clearing recall@10 >= 0.9.  operators/clustering.py pins it as
IVF_PQ_SERVING_DEFAULTS, and a test asserts the two stay in sync.

Writes one JSON line (and BENCH_IVFPQ_FRONTIER.json with --write).
Run: python tools/bench_ivfpq_frontier.py [--write]
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
sys.path.insert(0, str(ROOT / "tools"))

from pyspark.sql import functions as F  # noqa: E402

from bench_ivfpq import (  # noqa: E402
    DIM,
    K,
    N_QUERIES,
    N_SUB,
    PQ_CENTROIDS,
    SUB_DIM,
    _pin,
    build_residual_stack,
    serve_refined,
    synth_clustered,
)
from open_bus_siri_etl_spark.operators.similarity import (  # noqa: E402
    ann_recall,
    cosine_topk,
    ivf_residuals,
)
from open_bus_siri_etl_spark.session import get_spark  # noqa: E402

N, N_CENT = 300_000, 256
# the measured surface showed recall is INDEPENDENT of n_probe here (the
# candidate ceiling is 1.0 from n_probe=4 up — topic structure makes the
# coarse stage near-lossless), so the frontier's recall axis is refine_k
# alone and 400 is needed to clear the 0.9 bar (200 caps at ~0.85: the
# ADC must rank ~1200 same-topic members per cell at this corpus/cell
# ratio, coarser than the 100k/128 measurement)
N_PROBES = (4, 8, 16, 32)
REFINE_KS = (0, 50, 100, 200, 400)
RECALL_BAR = 0.9


def main() -> None:
    spark = get_spark(app_name="siri-etl-bench-ivfpq-frontier")
    spark.sparkContext.setLogLevel("ERROR")
    keep = "--work" in sys.argv
    work = (
        Path(sys.argv[sys.argv.index("--work") + 1])
        if keep
        else Path(tempfile.mkdtemp(prefix="bench_ivfpq_frontier_"))
    )
    work.mkdir(parents=True, exist_ok=True)
    try:
        corpus, queries = synth_clustered(spark, work, N, "frontier")
        corpus.count()
        index, tc, rf, train_sec, build_sec = build_residual_stack(
            spark, work, corpus, N_CENT, "frontier"
        )

        t0 = time.time()
        exact = cosine_topk(corpus, queries, k=K)
        expath = str(work / "fx")
        exact.write.mode("overwrite").parquet(expath)
        exact_sec = round(time.time() - t0, 3)
        exact = spark.read.parquet(expath)
        print(json.dumps({"exact_sec": exact_sec}), flush=True)

        # candidate-recall ceiling per n_probe: fraction of the exact
        # top-10 that lives inside the probed cells — bounds every
        # refine_k at that n_probe
        from open_bus_siri_etl_spark.operators.similarity import (
            _nearest_centroids,
            _slice_codebook,
        )

        asg = ivf_residuals(corpus, tc, N_CENT, dim=DIM).select(
            F.col("vec_id").alias("neighbor_id"), "cluster"
        )
        asg_path = str(work / "fasg")
        asg.write.mode("overwrite").parquet(asg_path)
        asg = spark.read.parquet(asg_path)
        ceilings = {}
        for n_probe in N_PROBES:
            qprobe = _nearest_centroids(
                queries.select(
                    F.col("vec_id").alias("_id"),
                    F.col("embedding").alias("_vec"),
                ),
                F.broadcast(_slice_codebook(tc, N_CENT, "coarse", "frontier")),
                "cluster", n_probe, DIM, metric="l2",
            ).select(F.col("_id").alias("query_id"), "cluster")
            hits = (
                exact.join(asg, "neighbor_id")
                .join(qprobe, ["query_id", "cluster"], "left_semi")
                .count()
            )
            ceilings[n_probe] = round(hits / (N_QUERIES * K), 4)

        rows = []
        for n_probe in N_PROBES:
            for refine_k in REFINE_KS:
                t0 = time.time()
                served = serve_refined(
                    spark, index, tc, rf, corpus, queries, N_CENT,
                    n_probe, refine_k,
                )
                served.count()
                serve_sec = round(time.time() - t0, 3)
                served = _pin(spark, served)
                recall = (
                    ann_recall(exact, served, k=K)
                    .agg(F.avg("recall").alias("r")).collect()[0]["r"]
                )
                rows.append(
                    {
                        "n_probe": n_probe,
                        "refine_k": refine_k,
                        "pruning_frac": round(n_probe / N_CENT, 4),
                        "serve_sec": serve_sec,
                        "serve_speedup_vs_exact": round(
                            exact_sec / serve_sec, 2
                        ),
                        "recall_at_10": round(recall, 4),
                        "candidate_recall_ceiling": ceilings[n_probe],
                    }
                )
                print(json.dumps(rows[-1]), flush=True)

        clearing = [r for r in rows if r["recall_at_10"] >= RECALL_BAR]
        default = (
            min(clearing, key=lambda r: r["serve_sec"]) if clearing else None
        )
        out = {
            "metric": "ivfpq_frontier_knee_speedup_vs_exact",
            "value": default["serve_speedup_vs_exact"] if default else None,
            "unit": "x",
            "n_vectors": N,
            "n_centroids": N_CENT,
            "dim": DIM,
            "n_queries": N_QUERIES,
            "k": K,
            "recall_bar": RECALL_BAR,
            "pq": {
                "n_sub": N_SUB, "sub_dim": SUB_DIM,
                "pq_centroids": PQ_CENTROIDS, "residual": True,
            },
            "train_sec": train_sec,
            "build_sec": build_sec,
            "exact_sec": exact_sec,
            "rows": rows,
            "serving_default": default,
        }
    finally:
        if not keep:
            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    if "--write" in sys.argv:
        (ROOT / "BENCH_IVFPQ_FRONTIER.json").write_text(
            json.dumps(out, indent=2) + "\n"
        )


if __name__ == "__main__":
    main()
