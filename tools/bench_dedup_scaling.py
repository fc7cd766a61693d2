"""Scaling-linearity benchmark for the MinHash-LSH dedup chain — the
heaviest training-data operator (shingle explode -> 64-seed signatures ->
banded buckets -> candidate join -> exact verify).

Tiers: sf0.01 (500 docs), sf0.1 (5,000 docs), and a synthesized 10x tier
(50,000 docs) built by unioning alphabet-permuted copies of sf0.1: each
copy's letters are rotated (translate a->b->c...), so shingle sets across
copies are DISJOINT — same per-doc workload, 10x the corpus, no artificial
cross-copy duplicate clusters distorting the candidate-join size.  Flat
docs/sec across tiers = no super-linear stage in the chain (the shingle
explode amplifies ~4000x but repartitions on output size; band buckets keep
the candidate join near-linear in true duplicates).

Run: python tools/bench_dedup_scaling.py [--write]  (JSON line per tier;
--write commits BENCH_DEDUP_SCALING.json at the repo root)
"""

from __future__ import annotations

import json
import shutil
import string
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from open_bus_siri_etl_spark.plans.catalog import REGISTRY  # noqa: E402
from open_bus_siri_etl_spark.session import get_spark  # noqa: E402

ID_SPAN = 10_000_000


def synthesize_10x(spark, src: str, dst: str) -> None:
    docs = spark.read.parquet(f"{src}/documents.parquet")
    letters = string.ascii_lowercase
    parts = []
    for i in range(10):
        rotated = letters[i:] + letters[:i]  # rot-i over the alphabet
        parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + i * ID_SPAN).withColumn(
                "text", F.translate(F.col("text"), letters, rotated)
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    Path(dst).mkdir(parents=True, exist_ok=True)
    out.repartition(32).write.mode("overwrite").parquet(f"{dst}/documents.parquet")


def main() -> None:
    spark = get_spark(app_name="bench-dedup-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    q = REGISTRY["minhash_lsh_dedup"].fn
    results = []
    with tempfile.TemporaryDirectory() as tmp:
        synthesize_10x(spark, "/root/testdata/sf0.1", tmp)
        tiers = [
            ("sf0.01", "/root/testdata/sf0.01"),
            ("sf0.1", "/root/testdata/sf0.1"),
            ("sf1.0-synth", tmp),
        ]
        q(spark, "/root/testdata/sf0.001").count()  # warm-up
        for name, d in tiers:
            n_docs = spark.read.parquet(f"{d}/documents.parquet").count()
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                q(spark, d).count()
                best = min(best, time.time() - t0)
            rec = {
                "tier": name,
                "n_documents": n_docs,
                "sec": round(best, 3),
                "docs_per_sec": round(n_docs / best, 1),
            }
            results.append(rec)
            print(json.dumps(rec))
    if "--write" in sys.argv:
        (ROOT / "BENCH_DEDUP_SCALING.json").write_text(
            json.dumps({"metric": "minhash_lsh_dedup_scaling", "tiers": results},
                       indent=2) + "\n"
        )


if __name__ == "__main__":
    main()
