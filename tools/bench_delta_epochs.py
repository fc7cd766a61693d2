"""Multi-epoch index-append measurement — the cost half of the
"incremental append IS the full rebuild" claim carried by all three
persisted delta indexes (MinHash band index, embedding LSH bucket index,
exact-Jaccard shingle posting index).

BENCH_DELTA_SCALING.json measured ONE ingest against a fresh index at
growing corpus sizes; this tool measures what production actually does:
K=8 SUCCESSIVE ingests, each probing the PERSISTED parquet index and then
appending its own O(|batch|) index rows with mode('append').  Per family
it records per-epoch probe seconds, append seconds and pair counts, and
after epoch K verifies that the accumulated appended index equals the
from-scratch rebuild as a multiset (exceptAll in both directions), so the
flatness claim and the correctness claim come out of the same run.

Corpus shapes (sf0.1):
- text: history = 4 copies of the doc_id%10>=2 documents (ids offset per
  copy, one per-copy salt token prepended — same per-doc shingle cost,
  disjoint ids), 16,000 docs; the 1,000 doc_id%10<2 documents split into
  8 batches of ~125 by (doc_id div 10) % 8.
- embedding: 16 rotated copies of the first 1,500 sf0.1 vectors plus the
  planted cosine~0.89 twins from bench_delta_scaling (threshold 0.85,
  P=10 x T=16 — the measured high-similarity operating point); the 500
  vec_id>=1500 vectors split into 8 batches by (vec_id - 1500) % 8.

Run: python tools/bench_delta_epochs.py [--write]
(--write commits BENCH_DELTA_EPOCHS.json at the repo root)
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

from open_bus_siri_etl_spark.operators.dedup import (  # noqa: E402
    build_minhash_index,
    build_shingle_index,
    jaccard_delta_pairs,
    minhash_delta_dedup,
)
from open_bus_siri_etl_spark.operators.similarity import (  # noqa: E402
    cosine_delta_pairs_lsh,
    lsh_bucket_index,
)
from open_bus_siri_etl_spark.session import get_spark  # noqa: E402
from tools.bench_delta_scaling import (  # noqa: E402
    N_PLANES,
    N_TABLES,
    THRESHOLD,
    planted_twins,
    rotated_copies,
)

K_EPOCHS = 8
DOC_ID_SPAN = 10_000_000


def salted_copies(docs, n_copies: int):
    """n_copies of ``docs`` with ids offset per copy and a per-copy salt
    token prepended (copy 0 = the originals): same per-document shingle
    cost, disjoint id space."""
    parts = [docs]
    for i in range(1, n_copies):
        parts.append(
            docs.select(
                (F.col("doc_id") + i * DOC_ID_SPAN).alias("doc_id"),
                F.concat(F.lit(f"copysalt{i} "), F.col("text")).alias("text"),
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 3)


def equals_rebuild(spark, path: str, rebuilt) -> bool:
    appended = spark.read.parquet(path)
    a, r = appended.count(), rebuilt.count()
    if a != r:
        return False
    return appended.exceptAll(rebuilt).count() == 0


def main() -> None:
    spark = get_spark(app_name="bench-delta-epochs")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="delta_epochs_")
    paths = {n: f"{tmp}/{n}" for n in ("shingle", "bands", "lsh")}

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text", "n_chars"
    )
    d_hist = salted_copies(docs.filter(F.col("doc_id") % 10 >= 2), 4)
    d_hist = d_hist.repartition(32).localCheckpoint(eager=True)
    d_pool = docs.filter(F.col("doc_id") % 10 < 2)
    d_batches = [
        d_pool.filter((F.col("doc_id") / 10).cast("long") % K_EPOCHS == k)
        .localCheckpoint(eager=True)
        for k in range(K_EPOCHS)
    ]

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base = emb.filter(F.col("vec_id") < 1500)
    e_pool = emb.filter(F.col("vec_id") >= 1500)
    e_hist = (
        rotated_copies(base, 16)
        .unionAll(planted_twins(e_pool))
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    e_batches = [
        e_pool.filter((F.col("vec_id") - 1500) % K_EPOCHS == k)
        .localCheckpoint(eager=True)
        for k in range(K_EPOCHS)
    ]

    sizes = {
        "text_history_docs": d_hist.count(),
        "embedding_history_vecs": e_hist.count(),
        "text_batch_docs": d_batches[0].count(),
        "embedding_batch_vecs": e_batches[0].count(),
    }

    # epoch-0 index builds (one-time, linear in history)
    build_sec = {}
    _, build_sec["shingle"] = timed(
        lambda: build_shingle_index(d_hist).write.parquet(paths["shingle"])
    )
    _, build_sec["bands"] = timed(
        lambda: build_minhash_index(d_hist).write.parquet(paths["bands"])
    )
    _, build_sec["lsh"] = timed(
        lambda: lsh_bucket_index(
            e_hist, n_planes=N_PLANES, n_tables=N_TABLES
        ).write.parquet(paths["lsh"])
    )

    epochs = []
    dh, eh = d_hist, e_hist
    for k in range(K_EPOCHS):
        db, eb = d_batches[k], e_batches[k]
        sh_idx = spark.read.parquet(paths["shingle"])
        bd_idx = spark.read.parquet(paths["bands"])
        ls_idx = spark.read.parquet(paths["lsh"])
        row = {"epoch": k + 1}
        row["jaccard_pairs"], row["jaccard_probe_sec"] = timed(
            lambda: jaccard_delta_pairs(
                None, db, threshold=0.5, history_postings=sh_idx
            ).count()
        )
        row["minhash_pairs"], row["minhash_probe_sec"] = timed(
            lambda: minhash_delta_dedup(
                dh, db, threshold=0.5, history_keys=bd_idx
            ).count()
        )
        row["lsh_pairs"], row["lsh_probe_sec"] = timed(
            lambda: cosine_delta_pairs_lsh(
                eh, eb, threshold=THRESHOLD,
                n_planes=N_PLANES, n_tables=N_TABLES, corpus_index=ls_idx,
            ).count()
        )
        _, row["shingle_append_sec"] = timed(
            lambda: build_shingle_index(db)
            .write.mode("append").parquet(paths["shingle"])
        )
        _, row["bands_append_sec"] = timed(
            lambda: build_minhash_index(db)
            .write.mode("append").parquet(paths["bands"])
        )
        _, row["lsh_append_sec"] = timed(
            lambda: lsh_bucket_index(eb, n_planes=N_PLANES, n_tables=N_TABLES)
            .write.mode("append").parquet(paths["lsh"])
        )
        dh = dh.unionByName(db).localCheckpoint(eager=True)
        eh = eh.unionByName(eb).localCheckpoint(eager=True)
        epochs.append(row)
        print(json.dumps(row))

    verify = {
        "shingle_append_equals_rebuild": equals_rebuild(
            spark, paths["shingle"], build_shingle_index(dh)
        ),
        "bands_append_equals_rebuild": equals_rebuild(
            spark, paths["bands"], build_minhash_index(dh)
        ),
        "lsh_append_equals_rebuild": equals_rebuild(
            spark, paths["lsh"],
            lsh_bucket_index(eh, n_planes=N_PLANES, n_tables=N_TABLES),
        ),
    }

    def flatness(key: str) -> float:
        vals = [e[key] for e in epochs]
        return round(max(vals) / max(min(vals), 1e-9), 2)

    out = {
        "metric": "delta_index_epochs",
        "note": "lsh_pairs alternates with epoch parity by construction: "
        "planted cosine~0.89 twins exist for EVEN delta vec_ids and "
        "batch k holds only ids of parity k, so odd batches carry no "
        "planted pairs — timing is the flatness signal, pairs the "
        "recall signal on even epochs",
        "k_epochs": K_EPOCHS,
        "threshold_text": 0.5,
        "threshold_embedding": THRESHOLD,
        "n_planes": N_PLANES,
        "n_tables": N_TABLES,
        **sizes,
        "index_build_sec": build_sec,
        "epochs": epochs,
        "probe_flatness_max_over_min": {
            "jaccard": flatness("jaccard_probe_sec"),
            "minhash": flatness("minhash_probe_sec"),
            "lsh": flatness("lsh_probe_sec"),
        },
        **verify,
    }
    print(json.dumps({k: v for k, v in out.items() if k != "epochs"}))
    if "--write" in sys.argv:
        (ROOT / "BENCH_DELTA_EPOCHS.json").write_text(
            json.dumps(out, indent=2) + "\n"
        )
        print("wrote BENCH_DELTA_EPOCHS.json")
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
