"""ANN scaling evidence: brute-force cosine pair search is O(N^2); the
LSH candidate stage (operators/similarity.lsh_candidate_pairs — the
oracle-exact bucketing registered as embedding_lsh_candidates) does
O(N^2 * T / 2^P) expected pair work through an equi-join, with P tuned up
as the corpus grows.  This tool measures both on synthetic corpora of
2k / 20k / 100k vectors (seeded numpy, dim 64) and records vectors/sec —
the committed artifact behind the claim that the candidate join, not the
cross join, is the 100 TB path.

Writes one JSON line (and BENCH_ANN_SCALING.json with --write).
Run: python tools/bench_ann_scaling.py [--write]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from open_bus_siri_etl_spark.operators.similarity import (  # noqa: E402
    cosine_near_pairs,
    lsh_candidate_pairs,
)
from open_bus_siri_etl_spark.session import get_spark  # noqa: E402

DIM = 64
# (n_vectors, lsh planes, run brute force too?) — brute force is skipped
# past 20k where the O(N^2) expression join stops being worth the wall time.
# 400k (round-11 directive: one tier past 100k) keeps the planes-up-with-N
# discipline: P=20 holds the expected candidate fraction roughly flat.
TIERS = [
    (2_000, 10, True), (20_000, 14, True), (100_000, 18, False),
    (400_000, 20, False),
]


def synth(spark, work: Path, n: int):
    rng = np.random.RandomState(7)
    vecs = rng.randn(n, DIM).astype("float32")
    import pandas as pd

    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype="int64"), "embedding": list(vecs)})
    path = str(work / f"emb_{n}")
    spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def main() -> None:
    spark = get_spark(app_name="siri-etl-bench-ann")
    spark.sparkContext.setLogLevel("ERROR")
    work = Path(tempfile.mkdtemp(prefix="bench_ann_"))
    tiers = []
    try:
        for n, planes, brute in TIERS:
            emb = synth(spark, work, n)
            emb.count()  # materialize the write before timing
            t0 = time.time()
            n_cand = lsh_candidate_pairs(
                emb, n_planes=planes, n_tables=4
            ).count()
            lsh_sec = time.time() - t0
            tier = {
                "n_vectors": n,
                "n_planes": planes,
                "lsh_candidates": n_cand,
                "lsh_sec": round(lsh_sec, 3),
                "lsh_vectors_per_sec": round(n / lsh_sec),
                "candidate_frac_of_allpairs": round(
                    n_cand / (n * (n - 1) / 2), 6
                ),
            }
            if brute:
                t0 = time.time()
                tier["brute_pairs"] = cosine_near_pairs(emb, threshold=0.4).count()
                tier["brute_sec"] = round(time.time() - t0, 3)
                tier["brute_vectors_per_sec"] = round(n / tier["brute_sec"])
            tiers.append(tier)
            print(json.dumps(tier), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    out = {
        "metric": "lsh_candidate_vectors_per_sec_at_max_tier",
        "value": tiers[-1]["lsh_vectors_per_sec"],
        "unit": "vectors/sec",
        "dim": DIM,
        "tiers": tiers,
    }
    print(json.dumps(out))
    if "--write" in sys.argv:
        (ROOT / "BENCH_ANN_SCALING.json").write_text(json.dumps(out, indent=2) + "\n")


if __name__ == "__main__":
    main()
