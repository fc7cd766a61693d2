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
from ..operators.similarity import (
    build_ivf_pq_index,
    cosine_delta_pairs_lsh,
    ivf_pq_centroids,
    lsh_bucket_index,
)


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` resolved through Spark's Hadoop
    configuration — the SAME filesystem abstraction the data reads/writes
    go through.  Every marker/listing probe in this module uses this
    instead of ``os.path``: a driver-local check against an HDFS/S3 state
    root would silently never fire (the exact failure the compaction
    marker exists to prevent), while the Hadoop API resolves local paths
    to ``file://`` and remote ones to their real store."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _fs_exists(spark: SparkSession, path: str) -> bool:
    fs, p = _hadoop_fs(spark, path)
    return bool(fs.exists(p))


def _fs_mkdirs(spark: SparkSession, path: str) -> None:
    fs, p = _hadoop_fs(spark, path)
    fs.mkdirs(p)


def _fs_delete(spark: SparkSession, path: str) -> None:
    fs, p = _hadoop_fs(spark, path)
    if fs.exists(p):
        fs.delete(p, True)


def _fs_child_names(spark: SparkSession, path: str) -> list[str]:
    """Child entry names of ``path`` (empty when missing) via the Hadoop
    FS — used for partition-count and checkpoint-progress probes."""
    fs, p = _hadoop_fs(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def _read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    """None iff nothing is persisted at ``path`` yet (missing or empty
    directory).  Any OTHER read failure propagates — silently treating a
    transient storage error or corrupt footer as "first batch" would make
    the stream commit output computed against an empty history."""
    from pyspark.errors import AnalysisException

    if _fs_exists(spark, path + "._compacting"):
        raise RuntimeError(
            f"{path}: a log compaction was interrupted mid-rewrite (marker "
            f"{path}._compacting present) — the store may be partially "
            "deleted.  Recover from the staged latest-wins copy at "
            f"{path}._compact_staging, then remove the marker.  Refusing "
            "to read: treating a half-rewritten log as first-batch state "
            "would silently rebuild from empty."
        )
    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        # match both the current error classes and the legacy message text
        # ("Path does not exist") — older Spark releases raise the same
        # missing-path condition without the error-class constants, and a
        # legitimate first batch must not kill the stream there
        msg = str(e)
        if (
            "PATH_NOT_FOUND" in msg
            or "UNABLE_TO_INFER_SCHEMA" in msg
            or "Path does not exist" in msg
            or "Unable to infer schema" in msg
        ):
            return None
        raise


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
    schema=None,
):
    """Stream parquet document files from ``landing_root``; per micro-batch
    emit ``jaccard_delta_pairs`` against the persisted shingle index and
    append the batch's posting rows.  Returns the StreamingQuery.

    The delta contract is inherited: a doc_id landing twice across batches
    raises in-plan at probe time (disjointness guard) — the source is
    expected to land each document once, and replays are handled by the
    partition-exclusion read, not by weakening the guard.
    """
    # pass ``schema`` explicitly for a daemon that must start before the
    # first file lands (and to skip the inference listing); otherwise it
    # is inferred from whatever is already in the landing tree
    if schema is None:
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


def start_contamination_screen_stream(
    spark: SparkSession,
    landing_root: str,
    evalset_path: str,
    quarantine_path: str,
    checkpoint_dir: str,
    eval_keys_path: str | None = None,
    text_col: str = "text",
    n: int = 3,
    min_common: int = 2,
    perms: int | None = None,
    bands: int | None = None,
    max_files_per_trigger: int | None = None,
    trigger: dict | None = None,
    schema=None,
):
    """Per-batch train/eval contamination screen (r14 directive #5) —
    ``contamination_lsh`` in the index-stream shape: every micro-batch of
    newly landed training documents is signed to its constant
    ``bands`` band keys and probed against the FROZEN eval-suite band
    index, and the verified contaminated pairs land in a per-batch
    partition of the ``quarantine_path`` store (same idempotent
    ``ingest_batch`` dynamic-overwrite discipline as every stream here —
    a replayed batch recomputes against the same frozen index and
    overwrites exactly itself).

    The eval index is the PERSISTED ``build_minhash_index`` store at
    ``eval_keys_path`` (built once; benchmarks change rarely) — its
    ``params`` tag is validated IN-PLAN against this stream's
    (n, perms, bands) by ``contamination_lsh``'s guard, mirroring
    ``minhash_delta_dedup``: a stream started with a mismatched band
    family fails its first non-empty batch loudly instead of silently
    collapsing recall.  When ``eval_keys_path`` is None the index is
    built from ``evalset_path`` at stream start (small suites).  The
    eval set itself is read for the exact-overlap verification of the
    banded candidates only — O(|batch| signatures + candidates) per
    batch, never corpus-sized.

    Because the screen decomposes by document (a pair's n_common depends
    only on the train doc and the eval doc), the union of all per-batch
    quarantine partitions equals the batch ``contamination_lsh`` over the
    union of batches — test-asserted over multiple micro-batches.
    Returns the StreamingQuery."""
    from ..operators.dedup import (
        MINHASH_BANDS,
        MINHASH_PERMS,
        build_minhash_index,
        contamination_lsh,
    )

    perms = MINHASH_PERMS if perms is None else perms
    bands = MINHASH_BANDS if bands is None else bands
    if schema is None:
        schema = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(landing_root).schema
        )
    evalset = spark.read.parquet(evalset_path)
    if eval_keys_path is not None:
        eval_keys = spark.read.parquet(eval_keys_path)
    else:
        eval_keys = build_minhash_index(evalset, text_col, n, perms, bands)
    # the frozen index is tiny (benchmark suites); pin it once so every
    # micro-batch broadcasts the same rows without a re-read
    eval_keys = eval_keys.localCheckpoint(eager=True)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select("doc_id", text_col).localCheckpoint(eager=True)
        if batch.isEmpty():
            return
        hits = contamination_lsh(
            batch,
            evalset,
            text_col,
            n,
            min_common,
            perms,
            bands,
            eval_keys=eval_keys,
        )
        _write_partition(hits, batch_id, quarantine_path)

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
    schema=None,
):
    """The embedding twin: per micro-batch emit ``cosine_delta_pairs_lsh``
    against the persisted LSH bucket index, then append the batch's index
    rows AND its vectors (the verify step needs candidate vectors; the
    corpus store is the same partition-idempotent parquet as the index).
    Returns the StreamingQuery."""
    # pass ``schema`` explicitly for a daemon that must start before the
    # first file lands (and to skip the inference listing); otherwise it
    # is inferred from whatever is already in the landing tree
    if schema is None:
        schema = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(landing_root).schema
        )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select(id_col, vec_col).localCheckpoint(eager=True)
        if batch.isEmpty():
            return
        idx = _read_or_none(spark, index_path)
        cor = _read_or_none(spark, corpus_path)
        not_this = F.col("ingest_batch") != batch_id
        # cor may be missing while idx exists: a first-batch crash between
        # the index write and the corpus write, replayed — the exclusion
        # filter empties the index of this batch's rows anyway, so an
        # empty corpus gives exactly the first-batch semantics
        corpus = (
            cor.filter(not_this).drop("ingest_batch")
            if cor is not None
            else batch.limit(0)
        )
        if idx is not None:
            pairs = cosine_delta_pairs_lsh(
                corpus, batch, threshold,
                n_planes=n_planes, n_tables=n_tables,
                id_col=id_col, vec_col=vec_col,
                corpus_index=idx.filter(not_this).drop("ingest_batch"),
            )
        else:
            # first batch: no history — within-batch pairs only
            pairs = cosine_delta_pairs_lsh(
                corpus, batch, threshold,
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


def latest_wins(records: DataFrame, key_cols: list[str], seq_col: str) -> DataFrame:
    """Resolve a log-structured store to its current view: one row per key,
    the record with the highest ``seq_col``.  Payload travels as one
    struct through max_by so the winning row's columns stay together."""
    payload = [c for c in records.columns if c not in key_cols and c != seq_col]
    # max over struct(seq, payload) instead of max_by(payload, seq): the
    # writers emit at most one record per (key, ingest_batch), but if a
    # future writer ever violated that, max_by's tie resolution would be
    # nondeterministic — struct ordering falls through to the payload
    # columns, so the resolved view is a pure function of the log contents
    resolved = records.groupBy(*key_cols).agg(
        F.max(
            F.struct(
                F.col(seq_col).alias("_seq"),
                *[F.col(c).alias(c) for c in payload],
            )
        ).alias("_p")
    )
    return resolved.select(*key_cols, *[F.col(f"_p.{c}").alias(c) for c in payload])


def read_current_labels(
    spark: SparkSession, labels_path: str, id_col: str = "doc_id"
) -> DataFrame:
    """Current labeling from the label log: latest record per id.  A full
    latest-wins pass — this is the READ-side cost (a training run resolves
    once), never paid per ingest (see start_text_curation_stream)."""
    return latest_wins(
        spark.read.parquet(labels_path), [id_col], "ingest_batch"
    )


def read_current_survivors(spark: SparkSession, survivors_path: str) -> DataFrame:
    """Current survivor set from the survivor log: latest record per
    component, tombstones (components merged away) dropped."""
    cur = latest_wins(
        spark.read.parquet(survivors_path), ["component"], "ingest_batch"
    )
    return cur.filter(~F.col("deleted")).drop("deleted")


#: the compacted base lands in this ingest_batch partition: below every
#: real micro-batch id, so (a) latest-wins orders any later append after
#: the base and (b) a replaying batch's `ingest_batch != batch_id` read
#: exclusion can never exclude it
_COMPACTED_BASE_BATCH = -1


def _compact_log(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    drop_deleted: bool = False,
    keep_batch: int | None = None,
) -> dict:
    """Rewrite one log-structured store to its latest-wins snapshot in the
    ``ingest_batch=-1`` base partition, removing superseded records (and,
    with ``drop_deleted``, tombstoned keys outright — ALL their records
    go, so no stale live record can resurface).  Staged like
    ``Warehouse._staged_rewrite``: write the resolved view to a sibling
    directory first, then overwrite the log from the staged copy — never
    overwrite the directory the resolving plan is reading.  The final
    overwrite is the one non-atomic step (plain-parquet limits, same
    class as the control-table compaction; a lake deployment swaps in
    Delta's transactional replaceWhere): it runs under a ``_compacting``
    marker that ``_read_or_none`` REFUSES to read through, so a crash
    mid-rewrite fails the next stream loudly — with the staged
    latest-wins copy intact as the recovery source — instead of being
    silently read as first-batch state.

    ``keep_batch`` is the IN-STREAM variant (auto-compaction): that one
    partition is carried through the rewrite VERBATIM instead of folded
    into the base.  The stream passes its current batch_id — every other
    partition belongs to a batch whose checkpoint commit exists (micro
    -batches are sequential; only the newest batch can be uncommitted),
    so folding them can never double-apply under a replay, while the
    possibly-uncommitted current partition keeps its own ``ingest_batch``
    so the replay's partition-exclusion read still excludes it."""
    log = _read_or_none(spark, path)
    if log is None:
        return {"rows_before": 0, "rows_after": 0, "partitions_before": 0}
    if keep_batch is not None:
        kept = log.filter(F.col("ingest_batch") == keep_batch)
        log = log.filter(F.col("ingest_batch") != keep_batch)
    else:
        kept = None
    # r15 (guide §1.2): both stats in ONE full-log pass — count() plus a
    # separate distinct().count() scanned the store twice for metadata
    pre = log.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("ingest_batch").alias("p"),
    ).collect()[0]
    n_before, n_parts = pre["n"], pre["p"]
    cur = latest_wins(log, key_cols, "ingest_batch")
    if drop_deleted:
        cur = cur.filter(~F.col("deleted"))
    stage = path + "._compact_staging"
    base = cur.withColumn("ingest_batch", F.lit(_COMPACTED_BASE_BATCH))
    if kept is not None:
        base = base.unionByName(kept.select(*base.columns))
    base.write.mode("overwrite").parquet(stage)
    staged = spark.read.parquet(stage)
    n_after = staged.count()
    marker = path + "._compacting"
    _fs_mkdirs(spark, marker)
    # STATIC overwrite: the whole point is removing the superseded
    # partitions, and the session default (dynamic, for the per-batch
    # idempotent writes) would replace only ingest_batch=-1
    staged.write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("ingest_batch").parquet(path)
    _fs_delete(spark, marker)
    _fs_delete(spark, stage)
    return {
        "rows_before": n_before,
        "rows_after": n_after,
        "partitions_before": n_parts,
    }


def _assert_drained_checkpoint(spark: SparkSession, checkpoint_dir: str) -> None:
    """Refuse maintenance rewrites against a NOT-cleanly-drained stream:
    Structured Streaming writes ``offsets/<batchId>`` before a micro-batch
    runs and ``commits/<batchId>`` after ``foreachBatch`` returns, so an
    offset file without a matching commit means a batch wrote state but
    never committed — it WILL replay on restart, and folding its rows into
    the ``ingest_batch=-1`` base would defeat the replay's own-partition
    read exclusion (the rows get double-applied).  The probe goes through
    the Hadoop FS like every other state read, so it holds on non-local
    checkpoint stores too."""
    offsets = {
        int(n) for n in _fs_child_names(spark, f"{checkpoint_dir}/offsets")
        if n.isdigit()
    }
    commits = {
        int(n) for n in _fs_child_names(spark, f"{checkpoint_dir}/commits")
        if n.isdigit()
    }
    uncommitted = sorted(offsets - commits)
    if uncommitted:
        raise RuntimeError(
            f"compact_curation_logs: checkpoint {checkpoint_dir} has "
            f"offsets without commits for batch(es) {uncommitted} — the "
            "stream did not drain cleanly and those batches will REPLAY on "
            "restart.  Compacting now would fold their uncommitted rows "
            "into the ingest_batch=-1 base, where the replay's "
            "own-partition read exclusion cannot exclude them (double "
            "apply).  Restart the stream to let the replay commit, drain, "
            "then compact."
        )


def compact_curation_logs(
    spark: SparkSession, state_root: str, checkpoint_dir: str | None = None
) -> dict:
    """Compact ``start_text_curation_stream``'s label and survivor logs —
    the round-9 finding #4 job, the curation twin of the control table's
    ``compact()`` (sources/tables.py): every micro-batch streams the full
    log through broadcast probes (the right per-batch SHAPE), but the
    scanned bytes grow with total-ever-ingested + tombstones, so a
    long-running daemon's per-batch cost creeps with log length rather
    than delta size.  Compaction rewrites each log to its latest-wins
    base — labels to one record per doc_id, survivors to live components
    only (tombstones AND every superseded record of a dead component are
    removed; component merges are monotone, so a dead name can never be
    re-created and its tombstone's work is done) — after which the
    resolved views are unchanged (test-asserted byte-identical) and the
    per-batch scan is current-state-sized again.

    Run it ONLY while the stream is stopped after a clean drain (the
    daily-maintenance slot, like the control-table compaction): replay
    idempotency depends on a replayed batch's reads EXCLUDING its own
    partition, and folding a not-yet-committed batch's output into the
    base would put its rows back in the replay's view.  Pass the stream's
    ``checkpoint_dir`` to make that precondition a PROGRAMMATIC guard
    instead of a docstring: the call refuses when any ``offsets/<n>``
    exists without its ``commits/<n>`` twin (an uncommitted batch that
    will replay).  The base lands at ``ingest_batch=-1`` so later appends
    always win latest-wins and no real batch id can collide with it.
    """
    if checkpoint_dir is not None:
        _assert_drained_checkpoint(spark, checkpoint_dir)
    missing = [
        name
        for name in ("labels", "survivors")
        if not _fs_exists(spark, f"{state_root}/{name}")
    ]
    if missing:
        # a typo'd state_root compacting "successfully" with all-zero
        # stats would let the real log grow quadratically while the daily
        # maintenance slot reports green — fail loudly instead (a drained
        # curation stream always leaves BOTH logs)
        raise FileNotFoundError(
            f"compact_curation_logs: {state_root} has no "
            f"{'/'.join(missing)} log{'s' if len(missing) > 1 else ''} — "
            "not a curation stream state root (run against the state_root "
            "a drained start_text_curation_stream wrote)"
        )
    return {
        "labels": _compact_log(spark, f"{state_root}/labels", ["doc_id"]),
        "survivors": _compact_log(
            spark, f"{state_root}/survivors", ["component"], drop_deleted=True
        ),
    }


def start_text_curation_stream(
    spark: SparkSession,
    landing_root: str,
    state_root: str,
    checkpoint_dir: str,
    text_col: str = "text",
    size_col: str = "n_chars",
    n: int = 3,
    threshold: float = 0.5,
    max_files_per_trigger: int | None = None,
    trigger: dict | None = None,
    schema=None,
    auto_compact_min_batches: int | None = 16,
):
    """The FULL streaming curation loop: every micro-batch of landed
    documents advances all four persisted curation artifacts —

    - ``<state_root>/index``      shingle posting index (append),
    - ``<state_root>/pairs``      the batch's exact-Jaccard near-dup pairs,
    - ``<state_root>/labels``     a LOG of labeling changes (id, component),
    - ``<state_root>/survivors``  a LOG of per-component survivor upserts
      and tombstones (component, kept_doc_id, kept_<size_col>, n_members,
      deleted),

    so ``read_current_labels`` / ``read_current_survivors`` equal the
    batch pipeline (``neardup_membership`` / ``neardup_survivor_rows``
    over everything landed) after any prefix of batches — asserted across
    a mid-stream restart in tests.

    Why a LOG and not a current-state table: rewriting an O(corpus) state
    per micro-batch is exactly the non-incremental cost this family
    exists to avoid.  Per batch only DELTA-SIZED rows are appended, and
    the per-batch reads exploit a structural property of the pair graph:
    components only ever MERGE (pairs add edges, nothing removes them),
    so once a label record is superseded its component name is dead
    forever and can never appear in a later batch's touched set.  Two
    consequences, both load-bearing:

    - endpoint labels: records semi-joined to the (broadcast, delta-sized)
      pair-endpoint id set, then latest-wins on that endpoint-sized slice;
    - touched-component members: the base∪log scan filtered by the
      broadcast touched-component set IS the current membership — no
      latest-wins needed, because a superseded record's component cannot
      be in the touched set.

    The label/survivor stores therefore stream through broadcast probes
    once per batch (partition-prunable if bucketed by component in
    production), and every shuffle in the per-batch plan is
    endpoint-/touched-/delta-sized.  All four writes are
    ``ingest_batch=``-partitioned dynamic overwrites and the reads
    exclude the current batch's partition, so replays are idempotent
    (same design as start_text_delta_dedup_stream).

    AUTO-COMPACTION (round-10 directive): the label/survivor logs grow
    with total-ever-ingested + superseded records, so an unattended
    daemon's per-batch scan would creep with log length even though every
    shuffle stays delta-sized.  When the labels log holds
    ``auto_compact_min_batches`` or more ``ingest_batch=`` partitions at
    the START of a micro-batch (a pure FS-listing probe — no data scan),
    both logs are folded to their latest-wins ``ingest_batch=-1`` base
    IN-STREAM before the batch's reads.  Replay safety: only the CURRENT
    batch can be uncommitted (micro-batches are sequential), and its
    partition is carried through the rewrite verbatim (``keep_batch``),
    so the compaction folds exclusively committed batches and a replay's
    own-partition exclusion still works.  A crash mid-rewrite leaves the
    ``._compacting`` marker, which fails the next read loudly with the
    staged copy as recovery — same contract as the manual
    ``compact_curation_logs``.  The bound this buys: the per-batch scan
    is base (current-state-sized) + at most ``auto_compact_min_batches``
    delta partitions, FLAT in stream lifetime.  ``None`` disables (the
    manual maintenance-slot job remains).
    """
    from ..operators.dedup import (
        connected_components,
        contract_delta_pairs,
        survivor_fold,
    )

    index_path = f"{state_root}/index"
    pairs_path = f"{state_root}/pairs"
    labels_path = f"{state_root}/labels"
    survivors_path = f"{state_root}/survivors"
    kept_size = f"kept_{size_col}"
    # pass ``schema`` explicitly for a daemon that must start before the
    # first file lands (and to skip the inference listing); otherwise it
    # is inferred from whatever is already in the landing tree
    if schema is None:
        schema = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(landing_root).schema
        )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select("doc_id", text_col, size_col).localCheckpoint(
            eager=True
        )
        if batch.isEmpty():
            return
        if auto_compact_min_batches is not None:
            n_parts = sum(
                1
                for name in _fs_child_names(spark, labels_path)
                if name.startswith("ingest_batch=")
            )
            if n_parts >= auto_compact_min_batches:
                _compact_log(
                    spark, labels_path, ["doc_id"], keep_batch=batch_id
                )
                _compact_log(
                    spark, survivors_path, ["component"],
                    drop_deleted=True, keep_batch=batch_id,
                )
        not_this = F.col("ingest_batch") != batch_id

        idx = _read_or_none(spark, index_path)
        history_post = (
            idx.filter(not_this).drop("ingest_batch")
            if idx is not None
            else build_shingle_index(batch.limit(0), text_col, n)
        )
        pairs = jaccard_delta_pairs(
            None, batch.select("doc_id", text_col), text_col, n, threshold,
            history_postings=history_post,
        ).localCheckpoint(eager=True)
        _write_partition(pairs, batch_id, pairs_path)
        _write_partition(
            build_shingle_index(batch.select("doc_id", text_col), text_col, n),
            batch_id,
            index_path,
        )

        log_raw = _read_or_none(spark, labels_path)
        log_rec = (
            log_raw.filter(not_this)  # (doc_id, component, ingest_batch)
            if log_raw is not None
            else batch.select(
                F.col("doc_id"),
                F.col("doc_id").alias("component"),
                F.lit(-1).cast("long").alias("ingest_batch"),
            ).limit(0)
        )
        # endpoint labels: semi to the delta-sized endpoint id set first,
        # then latest-wins on that endpoint-sized slice only (the
        # contraction needs exactly one label per endpoint)
        endpoints = (
            pairs.select(F.explode(F.array("doc_a", "doc_b")).alias("doc_id"))
            .distinct()
        )
        ep_labels = latest_wins(
            log_rec.join(F.broadcast(endpoints), "doc_id", "left_semi"),
            ["doc_id"],
            "ingest_batch",
        )
        delta_ids = batch.select("doc_id")
        contracted = contract_delta_pairs(ep_labels, pairs)
        sub = connected_components(contracted)
        relabel = F.broadcast(
            sub.select(F.col("node").alias("_old"), F.col("component").alias("_new"))
        )
        touched = F.broadcast(
            sub.select(F.col("node").alias("component")).distinct()
        )
        # touched-component members: comp-filtered scan IS current
        # membership, one record per id
        # (superseded records carry dead components; updates are emitted
        # only on change) — no latest-wins on the corpus-sized store
        members = log_rec.drop("ingest_batch").join(
            touched, "component", "left_semi"
        )
        hist_updates = (
            members.join(relabel, members["component"] == F.col("_old"))
            .filter(F.col("_new") != F.col("component"))
            .select("doc_id", F.col("_new").alias("component"))
        )
        delta_updates = delta_ids.join(
            relabel, delta_ids["doc_id"] == F.col("_old"), "left"
        ).select(
            "doc_id", F.coalesce("_new", "doc_id").alias("component")
        )
        _write_partition(
            hist_updates.unionByName(delta_updates), batch_id, labels_path
        )

        slog = _read_or_none(spark, survivors_path)
        if slog is not None:
            surv_touched = (
                slog.filter(not_this).drop("deleted")
                .join(touched, "component", "left_semi")
            )
            prev = latest_wins(surv_touched, ["component"], "ingest_batch")
        else:
            prev = batch.select(
                F.col("doc_id").alias("component"),
                F.col("doc_id").alias("kept_doc_id"),
                F.col(size_col).alias(kept_size),
                F.lit(1).cast("long").alias("n_members"),
            ).limit(0)
        # keep-the-longest policy and tie-break live in ONE place:
        # operators/dedup.survivor_fold (shared with the batch operator)
        upserts = survivor_fold(
            prev, batch.select("doc_id", size_col), relabel,
            id_col="doc_id", size_col=size_col,
        ).withColumn("deleted", F.lit(False))
        # tombstones: previously-live components merged away this batch
        dead = (
            prev.select("component")
            .join(relabel, F.col("component") == F.col("_old"))
            .filter(F.col("_new") != F.col("component"))
            .select(
                "component",
                F.lit(None).cast("long").alias("kept_doc_id"),
                F.lit(None).cast(dict(prev.dtypes)[kept_size]).alias(kept_size),
                F.lit(None).cast("long").alias("n_members"),
                F.lit(True).alias("deleted"),
            )
        )
        _write_partition(upserts.unionByName(dead), batch_id, survivors_path)

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


def compact_ivf_pq_store(
    spark: SparkSession,
    index_path: str,
    checkpoint_dir: str | None = None,
) -> dict:
    """Fold a streaming IVF-PQ store's per-batch partitions into the
    ``ingest_batch=-1`` base — the small-file maintenance job for
    ``start_ivf_pq_index_stream`` (a daemon at 1,440 batches/day grows
    1,440 partitions/day; code rows are immutable per-row functions of
    (vector, frozen codebook), so unlike the curation logs there is
    nothing to resolve: compaction is a pure relayout, row multiset
    unchanged — test-asserted).  Staged under the ``._compacting``
    marker like ``_compact_log``; pass ``checkpoint_dir`` for the
    programmatic clean-drain guard (an uncommitted batch's partition
    must not be folded where its replay's read exclusion cannot see it).
    The resumed stream appends new batch partitions after the base
    exactly as after a log compaction.  (Cluster-pruned SERVING layout
    remains the batch builder's ``partitionBy("cluster")`` store —
    ``retrain_ivf_pq_store`` rewrites into that shape when codebooks
    rotate; this job only bounds the partition/file count of the
    append store.)

    Schema-agnostic on purpose: it folds whatever columns the store
    carries, so the same job maintains the streaming IVF-SQ8 store
    (``sq8_index.start_sq8_index_stream`` — codes there are equally
    immutable per-row functions of (vector, frozen codebook, frozen
    bounds)); test-asserted in test_sq8_stream.py."""
    if checkpoint_dir is not None:
        _assert_drained_checkpoint(spark, checkpoint_dir)
    log = _read_or_none(spark, index_path)
    if log is None:
        return {"rows": 0, "partitions_before": 0}
    n_parts = log.select("ingest_batch").distinct().count()
    stage = index_path + "._compact_staging"
    log.withColumn(
        "ingest_batch", F.lit(_COMPACTED_BASE_BATCH).cast("long")
    ).write.mode("overwrite").parquet(stage)
    staged = spark.read.parquet(stage)
    n_rows = staged.count()
    marker = index_path + "._compacting"
    _fs_mkdirs(spark, marker)
    staged.write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("ingest_batch").parquet(index_path)
    _fs_delete(spark, marker)
    _fs_delete(spark, stage)
    return {"rows": n_rows, "partitions_before": n_parts}


def relayout_store_by_cluster(
    spark: SparkSession,
    index_path: str,
    serving_path: str,
    checkpoint_dir: str | None = None,
    since_batch: int | None = None,
) -> dict:
    """Materialize the SERVING layout of a streaming index store — the
    job the stream docstrings promise ("relayout by cluster for
    partition-pruned serving") made real, schema-agnostic like
    ``compact_ivf_pq_store`` so one job maintains both the IVF-PQ and
    IVF-SQ8 streaming stores.

    The append store is partitioned by ``ingest_batch`` because that is
    what replay idempotency needs (a replayed micro-batch overwrites
    exactly itself); the serve probe wants ``cluster`` partitioning so
    the n_probe/n_centroids read is PARTITION-PRUNED instead of a full
    scan + filter.  Those two layouts serve different masters, so this
    job writes a serving COPY at ``serving_path`` (one relayout shuffle,
    row multiset = the append store minus ``ingest_batch``) and leaves
    the append store untouched — the stream keeps appending, and the
    next relayout refreshes the copy.  Staged under a ``._compacting``
    marker on the serving path (readers of a half-written copy fail
    loudly); pass ``checkpoint_dir`` to require a drained stream so the
    copy is a consistent prefix of the log.

    Serve calls read ``serving_path`` directly (``ivf_pq_topk_serve`` /
    ``sq8_topk_serve`` ignore the extra partitioning column's absence —
    the relayout drops ``ingest_batch``); freshness is the caller's
    trade — batches landed after the relayout are only in the append
    store (``serve_frame`` below unions the two for a fresh serve).
    Returns {rows, n_clusters}.

    Guarded against the easy misuse (r12 ADVICE): ``serving_path`` must
    differ from ``index_path``, and must not already hold an
    ``ingest_batch``-partitioned store — either would silently REPLACE
    an append store with the batch-column-less serving layout, breaking
    the stream's replay idempotency on its next start ("leaves the
    append store untouched" is the contract).

    INCREMENTAL MODE (r14 — the scale-slope fix): pass ``since_batch``
    (the previous relayout's ``max_ingest_batch``) to fold only the
    append-store TAIL (``ingest_batch > since_batch``) into the existing
    copy.  The refresh reads the tail partitions (partition-pruned on
    ``ingest_batch``), computes the set of TOUCHED clusters, unions the
    copy's old rows for just those clusters with the tail, and
    dynamic-partition-overwrites ONLY those cluster partitions —
    untouched cluster partitions' files are never rewritten
    (test-asserted by file listing).  Cost is O(tail + touched-cluster
    rows), not O(store): at 100 TB the steady-state refresh touches a
    few cluster partitions per cycle instead of rewriting the full
    serving copy (measured: BENCH_RELAYOUT.json — refresh time tracks
    tail size across store sizes).  The staging + ``._compacting``
    discipline is identical to the full mode; the returned
    ``max_ingest_batch`` advances the high-water mark for the next
    refresh / ``serve_frame``.  A compaction or retrain AFTER the copy
    was cut rewrites history below the mark — detected exactly like
    ``serve_frame``'s stale-copy guard (``max(ingest_batch) <
    since_batch``) and refused: run a FULL relayout to a fresh path."""
    if checkpoint_dir is not None:
        _assert_drained_checkpoint(spark, checkpoint_dir)
    if serving_path.rstrip("/") == index_path.rstrip("/"):
        raise ValueError(
            "relayout_store_by_cluster: serving_path must differ from "
            "index_path — relaying out in place would replace the append "
            "store and drop its ingest_batch partitioning (replay "
            "idempotency breaks on the next stream start)"
        )
    target = _read_or_none(spark, serving_path)
    if target is not None and "ingest_batch" in target.columns:
        raise ValueError(
            f"relayout_store_by_cluster: {serving_path} already holds an "
            "ingest_batch-partitioned store (an append store, not a "
            "serving copy) — refusing to overwrite it with the serving "
            "layout"
        )
    log = _read_or_none(spark, index_path)
    if log is None:
        return {"rows": 0, "n_clusters": 0, "max_ingest_batch": None}
    if "cluster" not in log.columns:
        raise ValueError(
            f"relayout_store_by_cluster: the store at {index_path} has no "
            "cluster column — this job relays out IVF-family index stores"
        )
    max_batch = log.agg(F.max("ingest_batch")).collect()[0][0]
    if since_batch is not None:
        if target is None:
            raise ValueError(
                f"relayout_store_by_cluster: since_batch={since_batch} asks "
                f"for an incremental refresh but {serving_path} holds no "
                "serving copy — run a full relayout (since_batch=None) first"
            )
        if max_batch is None or max_batch < since_batch:
            raise ValueError(
                f"relayout_store_by_cluster: the append store's max "
                f"ingest_batch is {max_batch} but the serving copy was cut "
                f"at since_batch={since_batch} — the log was compacted or "
                "retrained AFTER the copy was cut (history below the mark "
                "was rewritten), so an incremental refresh would keep "
                "serving stale rows; run a FULL relayout to a fresh path"
            )
        tail = log.filter(F.col("ingest_batch") > F.lit(since_batch)).drop(
            "ingest_batch"
        )
        # touched clusters: bounded by n_centroids (an index-store column,
        # never data-sized) — the one driver-side collect of this job
        touched = sorted(
            r[0] for r in tail.select("cluster").distinct().collect()
        )
        if not touched:
            # nothing landed since the mark: the copy is already fresh
            return {
                "rows": 0,
                "n_clusters": 0,
                "touched_clusters": [],
                "max_ingest_batch": max_batch,
                "mode": "incremental",
            }
        # partition-column read-back can narrow the cluster dtype; align
        # the copy side to the log's type before the union
        cluster_type = dict(tail.dtypes)["cluster"]
        old_rows = (
            target.withColumn("cluster", F.col("cluster").cast(cluster_type))
            .filter(F.col("cluster").isin([int(c) for c in touched]))
            .select(tail.columns)
        )
        refreshed = old_rows.unionByName(tail)
        stage = serving_path + "._compact_staging"
        refreshed.write.mode("overwrite").parquet(stage)
        staged = spark.read.parquet(stage)
        n_rows = staged.count()
        marker = serving_path + "._compacting"
        _fs_mkdirs(spark, marker)
        # dynamic overwrite: only the cluster partitions PRESENT in the
        # staged data (the touched set) are replaced; every other
        # partition's files stay as the previous relayout wrote them
        staged.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("cluster").parquet(serving_path)
        _fs_delete(spark, marker)
        _fs_delete(spark, stage)
        return {
            "rows": n_rows,
            "n_clusters": len(touched),
            "touched_clusters": touched,
            "max_ingest_batch": max_batch,
            "mode": "incremental",
        }
    serving = log.drop("ingest_batch")
    stage = serving_path + "._compact_staging"
    serving.write.mode("overwrite").parquet(stage)
    staged = spark.read.parquet(stage)
    # r15 (guide §1.2): one pass over the staged copy for both stats
    st = staged.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("cluster").alias("c"),
    ).collect()[0]
    n_rows, n_clusters = st["n"], st["c"]
    marker = serving_path + "._compacting"
    _fs_mkdirs(spark, marker)
    staged.write.mode("overwrite").partitionBy("cluster").parquet(
        serving_path
    )
    _fs_delete(spark, marker)
    _fs_delete(spark, stage)
    return {
        "rows": n_rows,
        "n_clusters": n_clusters,
        # the copy's high-water mark: pass to serve_frame as since_batch,
        # or back to relayout_store_by_cluster for an incremental refresh
        "max_ingest_batch": max_batch,
        "mode": "full",
    }


def serve_frame(
    spark: SparkSession,
    serving_path: str,
    index_path: str,
    since_batch: int,
) -> DataFrame:
    """FRESH serve view over a relayed-out streaming index store — the
    union that closes ``relayout_store_by_cluster``'s documented staleness
    trade: the cluster-partitioned serving copy answers for everything up
    to the relayout's high-water mark (``since_batch`` — returned by the
    relayout as ``max_ingest_batch``), and only the APPEND-store
    partitions landed after it (``ingest_batch > since_batch``) are
    unioned on top.

    Both sides stay partition-pruned: a downstream cluster-probe filter
    pushes through the union into the copy's ``cluster`` PartitionFilters,
    while the tail side reads only the post-relayout ``ingest_batch``
    partitions (its own PartitionFilters) — so freshness costs one small
    tail scan, never a second full-store read.  The result is
    row-multiset-equal to the full append store minus ``ingest_batch``
    (test-pinned), so ``sq8_topk_serve`` / ``ivf_pq_topk_serve`` answer
    identically from it mid-stream.  Run the next relayout to fold the
    tail back into the copy.

    The serving copy must exist (relayout first); a mid-relayout read
    fails loudly via the ``._compacting`` marker, same as every store
    reader here.

    STALE-COPY GUARD: a log compaction or a retrain run AFTER the
    relayout rewrites every partition into the ``ingest_batch=-1`` base
    — the tail filter would then match nothing while the copy no longer
    reflects the (re-encoded or re-batched) log, silently serving stale
    rows.  Detectable: the relayout's high-water mark must still exist
    in the append store — if ``max(ingest_batch) < since_batch`` the
    log was rewritten since the copy was cut, and this raises instead
    of serving it (re-run ``relayout_store_by_cluster``).  A relayout
    taken AFTER a compaction is fine: its ``max_ingest_batch`` is the
    base itself, and later appends land above it."""
    if since_batch is None:
        # r13 ADVICE: a relayout of an EMPTY append store returns
        # max_ingest_batch=None (it wrote no copy) — letting that None
        # flow into the comparison below would TypeError, or silently
        # drop every tail row through a lit(None) filter
        raise ValueError(
            "serve_frame: since_batch is None — the relayout that would "
            "have cut this copy saw an empty append store, so there is no "
            "high-water mark to serve from; re-run "
            "relayout_store_by_cluster after the stream has appended"
        )
    serving = _read_or_none(spark, serving_path)
    if serving is None:
        raise ValueError(
            f"serve_frame: no serving copy at {serving_path} — run "
            "relayout_store_by_cluster first (serve_frame unions a copy "
            "with the append tail; it does not create the copy)"
        )
    if "ingest_batch" in serving.columns:
        raise ValueError(
            f"serve_frame: {serving_path} holds an ingest_batch-"
            "partitioned store (an append store, not a serving copy) — "
            "pass the relayout target as serving_path"
        )
    tail = _read_or_none(spark, index_path)
    if tail is None:
        return serving
    # the relayout's high-water mark must still be in the log: a
    # compaction/retrain since the relayout folds everything into the
    # base partition, and the copy no longer reflects the store
    cur_max = tail.agg(F.max("ingest_batch")).collect()[0][0]
    if cur_max is not None and cur_max < since_batch:
        raise ValueError(
            f"serve_frame: the append store's max ingest_batch is "
            f"{cur_max} but the serving copy was cut at since_batch="
            f"{since_batch} — the log was compacted or retrained AFTER "
            "the relayout, so the copy is stale (possibly re-encoded); "
            "re-run relayout_store_by_cluster before serving from it"
        )
    tail = (
        tail.filter(F.col("ingest_batch") > F.lit(since_batch))
        .drop("ingest_batch")
        .select(serving.columns)
    )
    return serving.unionByName(tail)


def retrain_ivf_pq_store(
    spark: SparkSession,
    corpus: DataFrame,
    index_path: str,
    cents_path: str,
    n_centroids: int = 8,
    n_sub: int = 4,
    sub_dim: int = 16,
    pq_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    residual: bool = True,
    checkpoint_dir: str | None = None,
) -> dict:
    """Retrain-and-reindex for a streaming IVF-PQ store — the other half
    of the FAISS train-then-add contract: the frozen codebook is exact
    for the distribution it was trained on, and under DISTRIBUTION DRIFT
    across appended batches its recall decays (measured:
    BENCH_CODEBOOK_DRIFT.json).  This maintenance job retrains BOTH
    codebooks on ``corpus`` (the store's current full vector set — the
    landing tree the stream ingests, re-read; the index itself holds only
    codes), re-encodes everything, and swaps the store:

    1. new coarse kmeans codebook + fine codebook (on residuals when
       ``residual``) are trained and STAGED next to their final paths;
    2. the full re-encode against the new codebooks is staged likewise;
    3. under a ``._compacting`` marker on ``index_path`` (so every reader
       refuses mid-swap instead of mixing families), codebooks and index
       are overwritten from the staged copies — the index lands in the
       ``ingest_batch=-1`` base partition, so the resumed stream's
       appends (which encode against the NEW codebook it now adopts)
       compose exactly as after a log compaction.

    The codebook fingerprint rotates BY CONTENT: every re-encoded row
    carries the new codebooks' ``cb_fp``, so serving the new store
    against a stale codebook frame (or vice versa) raises in-plan — no
    version counter to forget.  A crash between the codebook swap and the
    index swap leaves the marker, and the next read fails loudly with the
    staged copies intact as recovery.

    Run only while the stream is stopped; pass ``checkpoint_dir`` to
    enforce the clean drain programmatically (offsets-without-commits
    guard, same as ``compact_curation_logs``).  Post-retrain the store
    equals a from-scratch build against the new codebooks row-for-row
    (test-asserted), and a trained=True stream pointed back at it adopts
    the retagged codebooks and keeps appending.
    """
    from ..operators.clustering import (
        kmeans_codebook,
        kmeans_subspace_codebook,
    )
    from ..operators.similarity import ivf_residuals

    if checkpoint_dir is not None:
        _assert_drained_checkpoint(spark, checkpoint_dir)
    fine_path = cents_path + "_fine"

    def _stage(frame: DataFrame, final: str, single: bool = True) -> DataFrame:
        stage = final + "._compact_staging"
        w = frame.coalesce(1) if single else frame
        w.write.mode("overwrite").parquet(stage)
        return spark.read.parquet(stage)

    coarse = _stage(
        kmeans_codebook(corpus, n_centroids, iters, id_col, vec_col)
        .withColumn("cb_kind", F.lit("trained")),
        cents_path,
    )
    fine_base = (
        ivf_residuals(
            corpus, coarse.drop("cb_kind"), n_centroids, id_col, vec_col
        )
        if residual
        else corpus
    )
    fine = _stage(
        kmeans_subspace_codebook(
            fine_base, n_sub, sub_dim, pq_centroids, iters, id_col, vec_col
        ).withColumn("cb_kind", F.lit("trained")),
        fine_path,
    )
    reencoded = _stage(
        build_ivf_pq_index(
            corpus, n_centroids, n_sub, sub_dim, pq_centroids,
            id_col, vec_col, cents=coarse.drop("cb_kind"),
            fine_cents=fine.drop("cb_kind"), coarse_metric="l2",
            residual=residual,
        ).withColumn("ingest_batch", F.lit(_COMPACTED_BASE_BATCH)),
        index_path,
        single=False,
    )
    n_rows = reencoded.count()
    marker = index_path + "._compacting"
    _fs_mkdirs(spark, marker)
    coarse.write.mode("overwrite").parquet(cents_path)
    fine.write.mode("overwrite").parquet(fine_path)
    reencoded.write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("ingest_batch").parquet(index_path)
    _fs_delete(spark, marker)
    for p in (cents_path, fine_path, index_path):
        _fs_delete(spark, p + "._compact_staging")
    return {
        "rows_reencoded": n_rows,
        "n_centroids": n_centroids,
        "pq_centroids": pq_centroids,
        "residual": residual,
    }


def start_ivf_pq_index_stream(
    spark: SparkSession,
    landing_root: str,
    index_path: str,
    cents_path: str,
    checkpoint_dir: str,
    n_centroids: int = 8,
    n_sub: int = 4,
    sub_dim: int = 16,
    pq_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trained: bool = False,
    residual: bool = False,
    iters: int = 2,
    max_files_per_trigger: int | None = None,
    trigger: dict | None = None,
    schema=None,
    l2_normalize: bool = False,
):
    """Streaming IVF-PQ indexer — the third index family wired into
    Structured Streaming (after the shingle-posting and LSH-bucket
    streams): the codebook is FROZEN from the first micro-batch
    (``ivf_pq_centroids`` written once to ``cents_path`` — FAISS
    train-then-add semantics), and every batch's vectors are encoded
    against it (``build_ivf_pq_index(cents=frozen)``) and appended as
    that batch's ``ingest_batch`` partition.  Codes and cluster
    assignment are per-row functions of (vector, codebook), so the
    drained index equals the batch build over everything landed
    (append IS the rebuild, test-asserted) and ``ivf_pq_topk_serve``
    reads it directly — drop ``ingest_batch`` or leave it; the serve
    plan ignores extra columns.

    Effectively-once under replays like the sibling streams: the
    codebook is deterministic in the first batch's content (a replay
    recomputes the identical frame, and it is only written when absent),
    and index rows overwrite exactly their own batch partition.  A first
    batch smaller than max(n_centroids, pq_centroids) fails LOUDLY via
    the codebook undersize guard rather than freezing a truncated
    quantizer; a pre-existing ``cents_path`` from an older deployment is
    honored (and an undersized one raises the same way), so re-pointing
    the stream at a new landing tree keeps the codebook stable.
    Returns the StreamingQuery.

    ``trained=True`` freezes TRAINED codebooks instead of the lowest-id
    stand-in — FAISS's actual train()-then-add(): the coarse kmeans
    codebook and the per-subspace PQ codebook (over first-batch
    residuals when ``residual=True``) are trained on the FIRST
    micro-batch, written once (coarse at ``cents_path``, fine at
    ``cents_path + "_fine"``), and every batch encodes against them with
    the L2/residual family tags.  Both trainings are deterministic in
    the first batch's content, so replays recompute identical frames and
    the overwrite-when-unreadable rule keeps crashes between the two
    codebook writes recoverable (the checkpoint cannot have committed
    batch 0 before process_batch finished, so a replay still holds the
    training data).
    """
    from ..operators.clustering import (
        kmeans_codebook,
        kmeans_subspace_codebook,
    )
    from ..operators.similarity import ivf_residuals

    if schema is None:
        schema = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(landing_root).schema
        )
    n_keep = max(n_centroids, pq_centroids)
    fine_path = cents_path + "_fine"
    if residual and not trained:
        raise ValueError(
            "start_ivf_pq_index_stream: residual=True requires "
            "trained=True (residual codes need the trained L2 coarse "
            "family to re-center against)"
        )
    # fail at START, not at serve, if this stream's family flags disagree
    # with what the persisted index was built as: flipping trained= /
    # residual= on an existing deployment would append mixed-family
    # partitions (different params tag) into the same store, and only
    # every LATER serve would raise — with manual partition surgery as
    # the fix.  One distinct-scan of the params column at startup is
    # cheap (dictionary-encoded constant) and keeps per-batch cost
    # delta-sized.
    from ..operators.similarity import _ivf_pq_params_tag

    expected_tag = _ivf_pq_params_tag(
        n_centroids, n_sub, sub_dim, pq_centroids,
        "l2" if trained else "cosine", residual, l2_normalize,
    )
    existing = _read_or_none(spark, index_path)
    if existing is not None:
        tags = [r["params"] for r in existing.select("params").distinct().collect()]
        if tags and set(tags) != {expected_tag}:
            raise ValueError(
                f"start_ivf_pq_index_stream: the persisted index at "
                f"{index_path} carries params {sorted(set(tags))} but this "
                f"stream would append {expected_tag} — the trained=/"
                "residual=/geometry flags must match the deployment the "
                "index was built as (rebuild the index to change family)"
            )

    kind_tag = "trained" if trained else "standin"

    def _write_once(frame: DataFrame, path: str) -> DataFrame:
        # mode("overwrite"), not the default errorIfExists: a crash
        # MID-write leaves a partial directory that _read_or_none reads
        # as missing (no footers -> UNABLE_TO_INFER_SCHEMA), and the
        # replay's re-attempt must be able to clobber the partial
        # output instead of wedging the stream on "path already
        # exists".  Safe because the frame is deterministic in the
        # first batch's content and only written when unreadable.
        # cb_kind is PERSISTED PROVENANCE (advice round-10): adoption
        # checks read it instead of inferring trained-ness from the
        # cent_id layout, which is a false negative on any 0-based
        # contiguous-id corpus (a stale stand-in there also has
        # cent_id == cent_rank - 1 and would be silently served as
        # 'trained' — cb_fp self-verifies, so nothing downstream
        # detects the swap).  Downstream consumers hash/slice named
        # columns only, so the extra column is inert.
        frame.withColumn("cb_kind", F.lit(kind_tag)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)
        return spark.read.parquet(path)

    def _checked_adopt(frame: DataFrame, path: str, what: str) -> DataFrame:
        kinds = (
            [r[0] for r in frame.select("cb_kind").distinct().collect()]
            if "cb_kind" in frame.columns
            else []
        )
        if trained and kinds != ["trained"]:
            raise ValueError(
                f"start_ivf_pq_index_stream: the frame at {path} is not a "
                f"trained kmeans_codebook (cb_kind={kinds or 'absent'}) — "
                f"a trained=True stream must not adopt a stand-in {what} "
                "codebook (the cent_id layout cannot prove trained-ness: "
                "a stale stand-in over a 0-based contiguous-id corpus "
                "looks identical); point cents_path elsewhere, remove the "
                "stale frame, or re-tag a known-trained legacy frame with "
                "a cb_kind='trained' column"
            )
        if not trained and kinds == ["trained"]:
            raise ValueError(
                f"start_ivf_pq_index_stream: the frame at {path} is a "
                f"TRAINED {what} codebook (cb_kind=trained) but this "
                "stream runs trained=False — adopting it would assign "
                "with the wrong family (cosine over kmeans centroids); "
                "start the stream with trained=True or point cents_path "
                "elsewhere"
            )
        return frame.drop("cb_kind")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        raw = batch_df.select(id_col, vec_col).localCheckpoint(eager=True)
        if raw.isEmpty():
            return
        # l2_normalize (r12 scale_shock fix): codebooks train in
        # NORMALIZED space; the build below gets the RAW batch + the
        # flag so the projection runs exactly once inside
        # build_ivf_pq_index (append == rebuild stays bit-exact)
        if l2_normalize:
            from ..operators.similarity import l2_normalize_expr

            batch = raw.withColumn(vec_col, l2_normalize_expr(vec_col))
        else:
            batch = raw
        cents = _read_or_none(spark, cents_path)
        if cents is None:
            cents = _write_once(
                kmeans_codebook(batch, n_centroids, iters, id_col, vec_col)
                if trained
                else ivf_pq_centroids(batch, n_keep, id_col, vec_col),
                cents_path,
            ).drop("cb_kind")
        else:
            cents = _checked_adopt(cents, cents_path, "coarse")
        fine = None
        if trained:
            fine = _read_or_none(spark, fine_path)
            if fine is None:
                base = (
                    ivf_residuals(batch, cents, n_centroids, id_col, vec_col)
                    if residual
                    else batch
                )
                fine = _write_once(
                    kmeans_subspace_codebook(
                        base, n_sub, sub_dim, pq_centroids, iters,
                        id_col, vec_col,
                    ),
                    fine_path,
                ).drop("cb_kind")
            else:
                fine = _checked_adopt(fine, fine_path, "fine")
        _write_partition(
            build_ivf_pq_index(
                raw, n_centroids, n_sub, sub_dim, pq_centroids,
                id_col, vec_col, cents=cents, fine_cents=fine,
                coarse_metric="l2" if trained else "cosine",
                residual=residual, l2_normalize=l2_normalize,
            ),
            batch_id,
            index_path,
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
