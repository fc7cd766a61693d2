"""Scaling benchmark for the INCREMENTAL embedding near-dup paths — the
companion to BENCH_DEDUP_SCALING.json (text side).

Question measured: as the persisted corpus grows with the delta held
fixed, how does PER-INGEST cost move?  The exact path
(cosine_delta_pairs) pays |Δ| 64-dim dot products per corpus vector per
ingest — O(|Δ|·N) float work that re-reads every corpus VECTOR.  The
bucketed path amortizes: the corpus LSH index (lsh_bucket_index —
(id, tbl, bucket, nrm, params), narrow, append-only under ingests) is
built ONCE (index_build_sec, excluded from per-ingest cost and reported
separately), and each ingest then pays only the delta's projections, a
narrow candidate equi-join against the index, a broadcast semi-probe of
the corpus for candidate VECTORS only, and exact dots on the candidate
fraction.

OPERATING POINT (round-8): near-dup dedup is a HIGH-similarity problem,
and sign-LSH's recall/pruning trade is governed by the pair angle —
at cosine ~0.42 (where this synthetic corpus's accidental near-pairs
sit) no (planes, tables) choice prunes AND recalls (measured frontier in
tools/explore_lsh_constants.py / BENCH_LSH_FRONTIER.json).  So the bench
measures the real workload shape: deterministic near-duplicate twins of
half the delta vectors are PLANTED in the corpus (sign-jittered, cosine
~0.89), the threshold is 0.85, and the index uses P=10 planes x T=16
tables — per-table collision ~2^-10 for unrelated pairs (measured
candidate fraction ~2%), while a cosine-0.89 pair (bit-match prob ~0.85)
collides in at least one of 16 tables w.p. ~0.98.  Exact path cost stays O(|Δ|·N)
regardless of threshold; the LSH path's dot-product work is ~100x
smaller and its per-ingest seconds stay near-flat across a 64x corpus
growth.

Corpus tiers are synthesized from sf0.1 embeddings (1,500 base vectors)
by unioning element-ROTATED copies (shift the 64 dims by i per copy) with
offset ids: same per-vector workload, varied similarity structure, no
artificial duplicate explosion.  The 500-vector delta is held fixed; the
planted twins (a fixed 250) keep the recall denominator stable per tier.

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
PLANT_OFFSET = 5_000_000  # planted-twin id space, disjoint from every rotated copy
THRESHOLD = 0.85
N_PLANES = 10
N_TABLES = 16


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


def planted_twins(delta):
    """Deterministic near-duplicate twins of the even-id half of the delta:
    each element scaled by (1 ± 0.5) with the sign drawn from
    xxhash64(id, dim) — expected cosine 1/sqrt(1.25) ≈ 0.894, the
    high-similarity regime a dedup application actually targets.  Column
    expressions only, so the corpus synthesis is reproducible anywhere."""
    sign = lambda i: F.when(  # noqa: E731
        F.pmod(F.xxhash64(F.col("vec_id"), i), F.lit(2)) == 0, F.lit(1.0)
    ).otherwise(F.lit(-1.0))
    return delta.filter(F.col("vec_id") % 2 == 0).select(
        (F.col("vec_id") + PLANT_OFFSET).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (x.cast("double") * (1.0 + 0.5 * sign(i))).cast("float"),
        ).alias("embedding"),
    )


def main() -> None:
    spark = get_spark(app_name="bench-delta-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base = emb.filter(F.col("vec_id") < 1500)
    delta = emb.filter(F.col("vec_id") >= 1500).repartition(32).cache()
    n_delta = delta.count()
    twins = planted_twins(delta)

    results = []
    for n_copies in (1, 4, 16, 64):
        corpus = (
            rotated_copies(base, n_copies)
            .unionAll(twins)
            .repartition(32)
            .cache()
        )
        n_corpus = corpus.count()
        tier = {"tier": f"{n_copies}x", "n_corpus": n_corpus, "n_delta": n_delta}

        # one-time (per corpus epoch) index build — linear in N, appendable
        t0 = time.time()
        index = lsh_bucket_index(
            corpus, n_planes=N_PLANES, n_tables=N_TABLES
        ).cache()
        index.count()
        tier["index_build_sec"] = round(time.time() - t0, 3)

        def exact(c, d):
            return cosine_delta_pairs(c, d, threshold=THRESHOLD)

        def lsh(c, d):
            return cosine_delta_pairs_lsh(
                c, d, threshold=THRESHOLD,
                n_planes=N_PLANES, n_tables=N_TABLES, corpus_index=index,
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
        # the LSH result is a subset of the exact one (same threshold, same
        # 6dp verify), so recall is the pair-count ratio
        tier["recall"] = round(tier["lsh_pairs"] / max(tier["exact_pairs"], 1), 4)
        corpus.unpersist()
        index.unpersist()
        results.append(tier)
        print(json.dumps(tier))

    out = {
        "metric": "embedding_delta_scaling",
        "threshold": THRESHOLD,
        "n_planes": N_PLANES,
        "n_tables": N_TABLES,
        "planted_near_dups": 250,
        "tiers": results,
    }
    if "--write" in sys.argv:
        (ROOT / "BENCH_DELTA_SCALING.json").write_text(json.dumps(out, indent=2) + "\n")
        print("wrote BENCH_DELTA_SCALING.json")


if __name__ == "__main__":
    main()
