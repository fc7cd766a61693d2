"""Benchmark the LLM-training-data operator family at sf0.1 — the dedup /
similarity / text-quality / packing pipeline that is this engine's
beyond-reference surface.  bench.py times the headline OLAP queries; this
tool gives the training-data ops the same committed-artifact treatment so
"fast, not just correct" is evidenced for the family the 100 TB use case
actually runs.  Writes one JSON line (and BENCH_TRAINING.json at the repo
root when run with --write).

Run: python tools/bench_training.py [--write]
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

# one representative per family: exact dedup, banded-LSH near-dup, SimHash,
# span-level dedup, contamination, brute/ANN similarity, clustering,
# quality-filtering, tokenize+pack, mixture sampling, sketch counting
FAMILY = [
    "exact_dedup",
    "minhash_lsh_dedup",
    "simhash_near_pairs",
    "repeated_ngram_spans",
    "contamination_check",
    "embedding_cosine_topk",
    "embedding_ivf_ann",
    "kmeans_clusters_k32",
    "gopher_quality_filter",
    "training_prep_packed",
    "mixture_sample",
    "hll_distinct_users",
    "bpe_pair_counts",
]

WARMUP_SF_DIR = "/root/testdata/sf0.001"


# single definition lives in bench.py (repo root, already on sys.path)
from bench import parse_sf  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = parse_sf(sf_dir)
    spark = get_spark(app_name="siri-etl-bench-training")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in FAMILY if n in REGISTRY]
    warm_dir = WARMUP_SF_DIR if os.path.isdir(WARMUP_SF_DIR) else sf_dir
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for name in names:
        try:
            REGISTRY[name].fn(spark, warm_dir).count()
        except Exception:
            pass

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2")))
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            REGISTRY[name].fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    out = {
        "metric": "training_ops_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_documents": n_docs,
        "repeats": repeats,
        "timing": "min_of_repeats",
    }
    print(json.dumps(out))
    if "--write" in sys.argv:
        (ROOT / "BENCH_TRAINING.json").write_text(json.dumps(out, indent=2) + "\n")


if __name__ == "__main__":
    main()
