"""Measured recall/pruning frontier for the delta-LSH plane family — the
evidence behind BENCH_DELTA_SCALING's (n_planes, n_tables, threshold)
choice, committed as BENCH_LSH_FRONTIER.json.

Two regimes on the 16x rotated-copy corpus (tools/bench_delta_scaling
synthesis, planted near-dup twins included):

- threshold=0.4 — the synthetic corpus's ACCIDENTAL near-pairs, whose
  cosines sit just above the threshold (median ~0.42 → hyperplane
  bit-match prob ~0.64).  Sign-LSH cannot prune and recall here: recall
  1-(1-p^P)^T collapses as P rises while the candidate fraction only
  falls ~2^-P per table.  This regime is why the oracle catalog entry
  (embedding_delta_pairs_lsh, P=4/T=8) honestly documents sub-0.9 recall.
- threshold=0.85 — the HIGH-similarity regime a dedup application
  actually targets (planted twins at cosine ~0.89, bit-match prob ~0.85):
  P=12/T=32 holds recall while pruning the candidate fraction ~100x,
  which is the operating point BENCH_DELTA_SCALING measures.

For each (P, T): candidate-pair count (pruning), recall = fraction of
exact pairs sharing >= 1 bucket, per-regime.

Run: python tools/explore_lsh_constants.py [n_copies] [--write]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from open_bus_siri_etl_spark.operators.similarity import (  # noqa: E402
    _quantized_bucket_frame,
    cosine_delta_pairs,
)
from open_bus_siri_etl_spark.session import get_spark  # noqa: E402
from tools.bench_delta_scaling import planted_twins, rotated_copies  # noqa: E402

COMBOS = [(4, 8), (6, 8), (8, 8), (8, 16), (10, 16), (12, 16), (12, 32)]


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 16
    spark = get_spark(app_name="lsh-frontier")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < 1500)
    delta = emb.filter(F.col("vec_id") >= 1500).cache()
    n_delta = delta.count()
    corpus = (
        rotated_copies(base, n_copies).unionAll(planted_twins(delta))
        .repartition(32)
        .cache()
    )
    n_corpus = corpus.count()

    regimes = []
    for threshold in (0.4, 0.85):
        exact = cosine_delta_pairs(corpus, delta, threshold=threshold).cache()
        n_exact = exact.count()
        dist = exact.select(
            F.expr(
                "transform(percentile(cosine, array(0.05D,0.5D,0.95D)), "
                "x -> round(x, 4))"
            ).alias("p")
        ).collect()[0].p
        rows = []
        for P, T in COMBOS:
            t0 = time.time()
            cb = _quantized_bucket_frame(
                corpus, "_cid", P, T, 1000, "vec_id", "embedding", 64
            )
            db = F.broadcast(
                _quantized_bucket_frame(
                    delta, "_did", P, T, 1000, "vec_id", "embedding", 64
                )
            )
            cross = (
                cb.join(db, ["tbl", "bucket"])
                .filter(F.col("_cid") != F.col("_did"))
                .select(
                    F.least("_cid", "_did").alias("vec_a"),
                    F.greatest("_cid", "_did").alias("vec_b"),
                )
            )
            db2 = db.select(F.col("_did").alias("_did2"), "tbl", "bucket")
            within = (
                db.join(db2, ["tbl", "bucket"])
                .filter(F.col("_did") < F.col("_did2"))
                .select(
                    F.col("_did").alias("vec_a"), F.col("_did2").alias("vec_b")
                )
            )
            cand = cross.unionByName(within).distinct().cache()
            n_cand = cand.count()
            n_hit = cand.join(exact, ["vec_a", "vec_b"], "left_semi").count()
            cand.unpersist()
            row = {
                "n_planes": P,
                "n_tables": T,
                "candidates": n_cand,
                "recall": round(n_hit / max(n_exact, 1), 4),
                "cand_frac": round(n_cand / (n_corpus * n_delta), 6),
                "measure_sec": round(time.time() - t0, 1),
            }
            rows.append(row)
            print(json.dumps({"threshold": threshold, **row}))
        regimes.append(
            {
                "threshold": threshold,
                "exact_pairs": n_exact,
                "exact_cosine_p05_p50_p95": list(dist),
                "combos": rows,
            }
        )
        exact.unpersist()

    out = {
        "metric": "delta_lsh_recall_pruning_frontier",
        "corpus_tier": f"{n_copies}x",
        "n_corpus": n_corpus,
        "n_delta": n_delta,
        "regimes": regimes,
    }
    if "--write" in sys.argv:
        (ROOT / "BENCH_LSH_FRONTIER.json").write_text(
            json.dumps(out, indent=2) + "\n"
        )
        print("wrote BENCH_LSH_FRONTIER.json")


if __name__ == "__main__":
    main()
