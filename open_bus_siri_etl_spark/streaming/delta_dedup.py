"""Streaming incremental dedup — where the engine's reference half (the
foreachBatch ingest daemon, ``streaming/stream.py``) meets its LLM-data
half (the persisted delta indexes, ``operators/dedup.py`` /
``operators/similarity.py``).

Each micro-batch of newly landed documents (or embeddings) is treated as
one delta ingest: the batch probes the PERSISTED index for its near-dup
pairs (history never re-shingled / re-projected — the same per-ingest
plan the batch operators carry), emits those pairs to a per-batch output
partition, and appends its own O(|batch|) index rows.  Offsets live in
the streaming checkpoint, so a crashed daemon resumes at the right file;
within a batch, BOTH writes are partitioned by ``ingest_batch`` and use
dynamic partition overwrite, and the index/corpus reads EXCLUDE the
current batch's partition — so a replayed micro-batch (crash between the
two writes, restart mid-stream) recomputes identical pairs against the
same pre-batch index and overwrites its own partitions: effectively-once
output without a transactional sink, the same idempotency design as the
snapshot fact loader (``sources/tables.py``).

Because exact-Jaccard pairs decompose by ingest (a pair's score depends
only on its two shingle sets), the UNION of all per-batch pair
partitions equals the batch pipeline's full pair list, and the
accumulated index equals the from-scratch rebuild — both asserted in
tests/test_stateful_and_maintenance.py across a mid-stream restart.

At 100 TB: the landing listing is bounded by maxFilesPerTrigger, each
micro-batch's work is O(|batch| + matches) against the index scan, and
the index parquet grows append-only with partition pruning on
``ingest_batch`` — no state in the streaming engine itself beyond file
offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import build_shingle_index, jaccard_delta_pairs
from ..operators.similarity import cosine_delta_pairs_lsh, lsh_bucket_index


def _read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except Exception:  # first batch: nothing persisted yet
        return None


def _write_partition(df: DataFrame, batch_id: int, path: str) -> None:
    """Idempotent per-batch write: the frame lands in the
    ``ingest_batch=<batch_id>`` partition, dynamic overwrite — a replayed
    batch replaces exactly its own partition."""
    (
        df.withColumn("ingest_batch", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch")
        .parquet(path)
    )


def start_text_delta_dedup_stream(
    spark: SparkSession,
    landing_root: str,
    index_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_files_per_trigger: int | None = None,
    trigger: dict | None = None,
):
    """Stream parquet document files from ``landing_root``; per micro-batch
    emit ``jaccard_delta_pairs`` against the persisted shingle index and
    append the batch's posting rows.  Returns the StreamingQuery.

    The delta contract is inherited: a doc_id landing twice across batches
    raises in-plan at probe time (disjointness guard) — the source is
    expected to land each document once, and replays are handled by the
    partition-exclusion read, not by weakening the guard.
    """
    schema = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(landing_root).schema
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select("doc_id", text_col).localCheckpoint(eager=True)
        if batch.isEmpty():
            return
        idx = _read_or_none(spark, index_path)
        if idx is not None:
            history = idx.filter(F.col("ingest_batch") != batch_id).drop(
                "ingest_batch"
            )
        else:
            history = build_shingle_index(batch.limit(0), text_col, n)
        pairs = jaccard_delta_pairs(
            None, batch, text_col, n, threshold, history_postings=history
        )
        _write_partition(pairs, batch_id, pairs_path)
        _write_partition(
            build_shingle_index(batch, text_col, n), batch_id, index_path
        )

    reader = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(landing_root)
    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def start_embedding_delta_dedup_stream(
    spark: SparkSession,
    landing_root: str,
    index_path: str,
    corpus_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.85,
    n_planes: int = 10,
    n_tables: int = 16,
    max_files_per_trigger: int | None = None,
    trigger: dict | None = None,
):
    """The embedding twin: per micro-batch emit ``cosine_delta_pairs_lsh``
    against the persisted LSH bucket index, then append the batch's index
    rows AND its vectors (the verify step needs candidate vectors; the
    corpus store is the same partition-idempotent parquet as the index).
    Returns the StreamingQuery."""
    schema = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(landing_root).schema
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select(id_col, vec_col).localCheckpoint(eager=True)
        if batch.isEmpty():
            return
        idx = _read_or_none(spark, index_path)
        if idx is not None:
            not_this = F.col("ingest_batch") != batch_id
            history_idx = idx.filter(not_this).drop("ingest_batch")
            corpus = (
                spark.read.parquet(corpus_path).filter(not_this)
                .drop("ingest_batch")
            )
            pairs = cosine_delta_pairs_lsh(
                corpus, batch, threshold,
                n_planes=n_planes, n_tables=n_tables,
                id_col=id_col, vec_col=vec_col, corpus_index=history_idx,
            )
        else:
            # first batch: no history — within-batch pairs only
            pairs = cosine_delta_pairs_lsh(
                batch.limit(0), batch, threshold,
                n_planes=n_planes, n_tables=n_tables,
                id_col=id_col, vec_col=vec_col,
            )
        _write_partition(pairs, batch_id, pairs_path)
        _write_partition(
            lsh_bucket_index(
                batch, n_planes, n_tables, id_col=id_col, vec_col=vec_col
            ),
            batch_id,
            index_path,
        )
        _write_partition(batch, batch_id, corpus_path)

    reader = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(landing_root)
    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
