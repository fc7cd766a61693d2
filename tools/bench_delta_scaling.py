"""Scaling benchmark for the INCREMENTAL embedding near-dup paths — the
round-7 companion to BENCH_DEDUP_SCALING.json (text side).

Question measured: as the persisted corpus grows with the delta held
fixed, how does PER-INGEST cost move?  The exact path
(cosine_delta_pairs) pays |Δ| 64-dim dot products per corpus vector per
ingest — O(|Δ|·N) float work that re-reads every corpus VECTOR.  The
bucketed path amortizes: the corpus LSH index (lsh_bucket_index — 3
narrow int columns, the embedding twin of minhash_delta_dedup's band
index) is built ONCE (index_build_sec, linear, append-only under
ingests), and each ingest then pays only the delta's projections, a
narrow candidate equi-join against the index, and exact dots on the
~T/2^P candidate fraction.  So lsh_sec should grow with the CANDIDATE
count, not with |Δ|·N — the exact/lsh gap widens with corpus size.

Corpus tiers are synthesized from sf0.1 embeddings (1,500 base vectors)
by unioning element-ROTATED copies (shift the 64 dims by i per copy) with
offset ids: same per-vector workload, varied similarity structure, no
artificial duplicate explosion.  The 500-vector delta is held fixed.

Run: python tools/bench_delta_scaling.py [--write]
(--write commits BENCH_DELTA_SCALING.json at the repo root)
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
    cosine_delta_pairs,
    cosine_delta_pairs_lsh,
    lsh_bucket_index,
)
from open_bus_siri_etl_spark.session import get_spark  # noqa: E402

ID_SPAN = 10_000_000


def rotated_copies(base, n_copies: int):
    """Union n_copies of ``base`` with dims rotated by i and ids offset —
    disjoint id space, same per-vector cost, varied similarity structure."""
    parts = []
    for i in range(n_copies):
        part = base.withColumn("vec_id", F.col("vec_id") + i * ID_SPAN)
        if i:
            part = part.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", i + 1, 64 - i), F.slice("embedding", 1, i)
                ),
            )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def main() -> None:
    spark = get_spark(app_name="bench-delta-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    base = emb.filter(F.col("vec_id") < 1500)
    delta = emb.filter(F.col("vec_id") >= 1500).cache()
    n_delta = delta.count()

    results = []
    for n_copies in (1, 4, 16, 64):
        corpus = rotated_copies(base, n_copies).repartition(32).cache()
        n_corpus = corpus.count()
        tier = {"tier": f"{n_copies}x", "n_corpus": n_corpus, "n_delta": n_delta}

        # one-time (per corpus epoch) index build — linear in N, appendable
        t0 = time.time()
        index = lsh_bucket_index(corpus, n_planes=4, n_tables=8).cache()
        index.count()
        tier["index_build_sec"] = round(time.time() - t0, 3)

        def exact(c, d):
            return cosine_delta_pairs(c, d, threshold=0.4)

        def lsh(c, d):
            return cosine_delta_pairs_lsh(
                c, d, threshold=0.4, n_planes=4, n_tables=8, corpus_index=index
            )

        for label, fn in (("exact", exact), ("lsh", lsh)):
            fn(corpus, delta).count()  # warm-up
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                n_pairs = fn(corpus, delta).count()
                best = min(best, time.time() - t0)
            tier[f"{label}_sec"] = round(best, 3)
            tier[f"{label}_pairs"] = n_pairs
        tier["speedup"] = round(tier["exact_sec"] / tier["lsh_sec"], 2)
        corpus.unpersist()
        index.unpersist()
        results.append(tier)
        print(json.dumps(tier))

    out = {"metric": "embedding_delta_scaling", "tiers": results}
    if "--write" in sys.argv:
        (ROOT / "BENCH_DELTA_SCALING.json").write_text(json.dumps(out, indent=2) + "\n")
        print("wrote BENCH_DELTA_SCALING.json")


if __name__ == "__main__":
    main()
