"""Streaming IVF-SQ8 indexer: frozen-artifact train-then-add semantics —
append equals rebuild, family guards fail loudly, out-of-range appends
clamp instead of failing."""

import pytest
from pyspark.sql import functions as F

from open_bus_siri_etl_spark.operators.quantization import (
    build_sq8_index,
    sq8_topk_serve,
)
from open_bus_siri_etl_spark.streaming.sq8_index import (
    read_sq8_bounds,
    start_sq8_index_stream,
    write_sq8_bounds,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _land(emb, landing, n_batches=3):
    for k in range(n_batches):
        emb.filter(F.col("vec_id") % n_batches == k).coalesce(1).write.parquet(
            str(landing / f"batch_{k}")
        )


def _multiset(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


@pytest.mark.parametrize("residual", [False, True])
@pytest.mark.slow
def test_sq8_stream_append_is_rebuild(spark, tmp_path, residual):
    """Drained availableNow over 3 landed batches: codebook AND bounds
    freeze from the first batch, the accumulated store equals the batch
    build over everything landed against the same frozen pair, and
    sq8_topk_serve answers identically from both."""
    emb = _emb(spark)
    landing = tmp_path / "landing"
    _land(emb, landing)
    index_path = str(tmp_path / "index")
    cents_path = str(tmp_path / "cents")
    bounds_path = str(tmp_path / "bounds")
    q = start_sq8_index_stream(
        spark, str(landing), index_path, cents_path, bounds_path,
        str(tmp_path / "ckpt"), max_files_per_trigger=1, residual=residual,
    )
    q.awaitTermination(180)

    family = "residual" if residual else "raw"
    bounds = read_sq8_bounds(spark, bounds_path, family)
    cents = spark.read.parquet(cents_path).drop("cb_kind")
    # codebook froze on the first processed batch's lowest ids
    assert cents.count() == 8
    first = spark.read.parquet(index_path).select(
        F.min("ingest_batch").alias("b")
    ).collect()[0]["b"]
    assert first == 0
    streamed = spark.read.parquet(index_path).drop("ingest_batch")
    batch_built = build_sq8_index(emb, cents, bounds, residual=residual)
    assert _multiset(streamed) == _multiset(batch_built)
    qs = emb.filter("vec_id BETWEEN 8 AND 15")
    assert _multiset(
        sq8_topk_serve(streamed, cents, qs, bounds, k=5, residual=residual)
    ) == _multiset(
        sq8_topk_serve(batch_built, cents, qs, bounds, k=5, residual=residual)
    )


@pytest.mark.slow
def test_sq8_stream_family_flip_refused(spark, tmp_path):
    """Restarting over an existing store with residual flipped must fail
    at START (the params-tag guard), not at some later serve."""
    emb = _emb(spark)
    landing = tmp_path / "landing"
    _land(emb, landing, n_batches=1)
    args = [
        str(landing), str(tmp_path / "index"), str(tmp_path / "cents"),
        str(tmp_path / "bounds"),
    ]
    q = start_sq8_index_stream(
        spark, *args, str(tmp_path / "ckpt"), residual=False
    )
    q.awaitTermination(120)
    with pytest.raises(ValueError, match="params"):
        start_sq8_index_stream(
            spark, *args, str(tmp_path / "ckpt2"), residual=True
        )


@pytest.mark.slow
def test_sq8_stream_refuses_dim_mismatched_append(spark, tmp_path):
    """ADVICE r11: the append guard must compare the FULL tag including
    the :d{dim} suffix — a store encoded against 64-dim bounds must not
    accept appends after the bounds file is swapped for a 32-dim one of
    the same family."""
    emb = _emb(spark)
    landing = tmp_path / "landing"
    _land(emb, landing, n_batches=1)
    args = [
        str(landing), str(tmp_path / "index"), str(tmp_path / "cents"),
        str(tmp_path / "bounds"),
    ]
    q = start_sq8_index_stream(spark, *args, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    write_sq8_bounds(
        spark, [(0.0, 1.0)] * 32, str(tmp_path / "bounds"), "raw"
    )
    with pytest.raises(ValueError, match="d32"):
        start_sq8_index_stream(spark, *args, str(tmp_path / "ckpt2"))


def test_sq8_stream_refuses_unprovenanced_store(spark, tmp_path):
    """A store without a params column cannot prove its family — the
    guard must FAIL rather than skip the check (the pre-r12 behavior)."""
    emb = _emb(spark)
    landing = tmp_path / "landing"
    _land(emb, landing, n_batches=1)
    index_path = str(tmp_path / "index")
    # a provenance-free store: plausible rows, no params column
    emb.limit(10).select(
        "vec_id", F.lit(0).alias("cluster"),
        F.array(F.lit(1)).alias("sq8_code"),
        F.lit(0).cast("long").alias("ingest_batch"),
    ).write.partitionBy("ingest_batch").parquet(index_path)
    write_sq8_bounds(
        spark, [(0.0, 1.0)] * 64, str(tmp_path / "bounds"), "raw"
    )
    with pytest.raises(ValueError, match="no params column"):
        start_sq8_index_stream(
            spark, str(landing), index_path, str(tmp_path / "cents"),
            str(tmp_path / "bounds"), str(tmp_path / "ckpt"),
        )


def test_sq8_stream_refuses_wrong_family_bounds(spark, tmp_path):
    """A residual stream must not adopt raw-trained bounds: the raw grid
    spans the coarse spread the residual grid deliberately excludes."""
    emb = _emb(spark)
    landing = tmp_path / "landing"
    _land(emb, landing, n_batches=1)
    bounds_path = str(tmp_path / "bounds")
    write_sq8_bounds(spark, [(0.0, 1.0)] * 64, bounds_path, "raw")
    # the foreachBatch ValueError surfaces through awaitTermination as a
    # StreamingQueryException wrapping the family-mismatch message
    with pytest.raises(Exception, match="residual"):
        q = start_sq8_index_stream(
            spark, str(landing), str(tmp_path / "index"),
            str(tmp_path / "cents"), bounds_path, str(tmp_path / "ckpt"),
            residual=True,
        )
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()
        raise AssertionError("stream adopted wrong-family bounds")


@pytest.mark.slow
def test_sq8_stream_out_of_range_append_clamps(spark, tmp_path):
    """FAISS add()-beyond-train() semantics: a second batch far outside
    the first batch's trained range encodes to clamped edge codes (0 /
    255) and the drained store still serves — graceful degradation, not
    an error."""
    emb = _emb(spark)
    landing = tmp_path / "landing"
    base = emb.filter(F.col("vec_id") < 300)
    scaled = (
        emb.filter(F.col("vec_id") >= 300)
        .select(
            "vec_id",
            F.transform(
                "embedding", lambda x: (x * F.lit(10.0)).cast("float")
            ).alias("embedding"),
        )
    )
    base.coalesce(1).write.parquet(str(landing / "batch_0"))
    index_path = str(tmp_path / "index")
    cents_path = str(tmp_path / "cents")
    bounds_path = str(tmp_path / "bounds")
    ckpt = str(tmp_path / "ckpt")
    q = start_sq8_index_stream(
        spark, str(landing), index_path, cents_path, bounds_path, ckpt
    )
    q.awaitTermination(120)
    scaled.coalesce(1).write.parquet(str(landing / "batch_1"))
    q = start_sq8_index_stream(
        spark, str(landing), index_path, cents_path, bounds_path, ckpt
    )
    q.awaitTermination(120)
    assert q.exception() is None
    store = spark.read.parquet(index_path)
    late = store.filter(F.col("ingest_batch") == 1)
    assert late.count() == scaled.count()
    stats = late.select(
        F.min(F.array_min("sq8_code")).alias("lo"),
        F.max(F.array_max("sq8_code")).alias("hi"),
        F.avg(
            F.size(
                F.filter(
                    "sq8_code", lambda c: (c == 0) | (c == 255)
                )
            )
        ).alias("edge"),
    ).first()
    assert stats["lo"] >= 0 and stats["hi"] <= 255
    # 10x-scaled vectors overwhelmingly clamp to the edges
    assert stats["edge"] > 32
    bounds = read_sq8_bounds(spark, bounds_path, "raw")
    cents = spark.read.parquet(cents_path).drop("cb_kind")
    qs = emb.filter("vec_id BETWEEN 8 AND 15")
    served = sq8_topk_serve(store, cents, qs, bounds, k=5)
    assert served.count() == 8 * 5


@pytest.mark.slow
def test_sq8_store_compaction_multiset_and_serve_unchanged(spark, tmp_path):
    """compact_ivf_pq_store is schema-agnostic small-file maintenance:
    folding the SQ8 store's per-batch partitions into the base changes
    neither the row multiset nor what sq8_topk_serve answers."""
    from open_bus_siri_etl_spark.streaming.delta_dedup import (
        compact_ivf_pq_store,
    )

    emb = _emb(spark)
    landing = tmp_path / "landing"
    _land(emb, landing)
    index_path = str(tmp_path / "index")
    cents_path = str(tmp_path / "cents")
    bounds_path = str(tmp_path / "bounds")
    ckpt = str(tmp_path / "ckpt")
    q = start_sq8_index_stream(
        spark, str(landing), index_path, cents_path, bounds_path, ckpt,
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    bounds = read_sq8_bounds(spark, bounds_path, "raw")
    cents = spark.read.parquet(cents_path).drop("cb_kind")
    qs = emb.filter("vec_id BETWEEN 8 AND 15")
    before_rows = _multiset(
        spark.read.parquet(index_path).drop("ingest_batch")
    )
    before_serve = _multiset(
        sq8_topk_serve(spark.read.parquet(index_path), cents, qs, bounds, k=5)
    )
    out = compact_ivf_pq_store(spark, index_path, checkpoint_dir=ckpt)
    assert out["partitions_before"] == 3
    store = spark.read.parquet(index_path)
    assert store.select("ingest_batch").distinct().collect()[0][0] == -1
    assert _multiset(store.drop("ingest_batch")) == before_rows
    assert (
        _multiset(sq8_topk_serve(store, cents, qs, bounds, k=5))
        == before_serve
    )


@pytest.mark.slow
def test_sq8_retrain_recovers_bounds_and_rotates_provenance(spark, tmp_path):
    """The retrain job the clamp-degradation number was missing: after a
    drifted (10x-scaled) append clamps, retrain_sq8_store re-trains the
    bounds on the full landing corpus, re-encodes into the ingest_batch=-1
    base, and rotates provenance — the store equals a fresh build against
    the new pair, serving with the STALE bounds raises the fingerprint
    guard, and a resumed stream adopts the new grid (append == rebuild
    still holds)."""
    from open_bus_siri_etl_spark.streaming.sq8_index import (
        retrain_sq8_store,
    )

    emb = _emb(spark)
    landing = tmp_path / "landing"
    base = emb.filter(F.col("vec_id") < 300)
    scaled = emb.filter(F.col("vec_id").between(300, 450)).select(
        "vec_id",
        F.transform(
            "embedding", lambda x: (x * F.lit(10.0)).cast("float")
        ).alias("embedding"),
    )
    base.coalesce(1).write.parquet(str(landing / "batch_0"))
    index_path = str(tmp_path / "index")
    cents_path = str(tmp_path / "cents")
    bounds_path = str(tmp_path / "bounds")
    ckpt = str(tmp_path / "ckpt")
    args = [str(landing), index_path, cents_path, bounds_path, ckpt]
    q = start_sq8_index_stream(spark, *args)
    q.awaitTermination(120)
    scaled.coalesce(1).write.parquet(str(landing / "batch_1"))
    q = start_sq8_index_stream(spark, *args)
    q.awaitTermination(120)
    old_bounds = read_sq8_bounds(spark, bounds_path, "raw")

    corpus = spark.read.option("recursiveFileLookup", "true").parquet(
        str(landing)
    )
    out = retrain_sq8_store(
        spark, corpus, index_path, cents_path, bounds_path,
        trained=False, checkpoint_dir=ckpt,
    )
    assert out["rows_reencoded"] == corpus.count()
    new_bounds = read_sq8_bounds(spark, bounds_path, "raw")
    assert new_bounds != old_bounds  # the drifted range widened them
    cents = spark.read.parquet(cents_path).drop("cb_kind")
    store = spark.read.parquet(index_path)
    assert store.select("ingest_batch").distinct().collect()[0][0] == -1
    fresh = build_sq8_index(corpus, cents, new_bounds, n_cents=8)
    assert _multiset(store.drop("ingest_batch")) == _multiset(fresh)

    qs = emb.filter("vec_id BETWEEN 8 AND 15")
    # stale bounds now fail loudly (provenance rotated by content)
    with pytest.raises(Exception, match="fingerprint"):
        sq8_topk_serve(
            store, cents, qs, old_bounds, k=5, n_centroids=8
        ).collect()
    assert sq8_topk_serve(
        store, cents, qs, new_bounds, k=5, n_centroids=8
    ).count() == 8 * 5

    # the resumed stream adopts the new grid: a third batch appends and
    # the accumulated store still equals the batch rebuild
    emb.filter(F.col("vec_id") > 450).coalesce(1).write.parquet(
        str(landing / "batch_2")
    )
    q = start_sq8_index_stream(spark, *args)
    q.awaitTermination(120)
    assert q.exception() is None
    corpus2 = spark.read.option("recursiveFileLookup", "true").parquet(
        str(landing)
    )
    streamed = spark.read.parquet(index_path).drop("ingest_batch")
    rebuilt = build_sq8_index(corpus2, cents, new_bounds, n_cents=8)
    assert _multiset(streamed) == _multiset(rebuilt)


@pytest.mark.slow
def test_sq8_retrain_trained_codebook(spark, tmp_path):
    """trained=True retrain: the coarse kmeans codebook retrains too,
    the staged pair swaps atomically, and the re-encoded store equals a
    fresh build against the NEW codebook + bounds (l2 family)."""
    from open_bus_siri_etl_spark.streaming.sq8_index import (
        retrain_sq8_store,
    )

    emb = _emb(spark)
    landing = tmp_path / "landing"
    _land(emb, landing, n_batches=1)
    index_path = str(tmp_path / "index")
    cents_path = str(tmp_path / "cents")
    bounds_path = str(tmp_path / "bounds")
    ckpt = str(tmp_path / "ckpt")
    q = start_sq8_index_stream(
        spark, str(landing), index_path, cents_path, bounds_path, ckpt,
        trained=True, iters=2,
    )
    q.awaitTermination(180)
    corpus = spark.read.option("recursiveFileLookup", "true").parquet(
        str(landing)
    )
    retrain_sq8_store(
        spark, corpus, index_path, cents_path, bounds_path,
        trained=True, iters=2, checkpoint_dir=ckpt,
    )
    cents = spark.read.parquet(cents_path)
    assert cents.select("cb_kind").distinct().collect()[0][0] == "trained"
    bounds = read_sq8_bounds(spark, bounds_path, "raw")
    fresh = build_sq8_index(
        corpus, cents.drop("cb_kind"), bounds, coarse_metric="l2",
        n_cents=8,
    )
    store = spark.read.parquet(index_path).drop("ingest_batch")
    assert _multiset(store) == _multiset(fresh)
    qs = emb.filter("vec_id BETWEEN 8 AND 15")
    assert sq8_topk_serve(
        store, cents.drop("cb_kind"), qs, bounds, k=5,
        coarse_metric="l2", n_centroids=8,
    ).count() == 8 * 5

    # bounds-only retrain of the TRAINED deployment: the frozen kmeans
    # codebook must be KEPT and the re-encode must stay in the l2
    # family (the conflation the serve provenance guard caught: a
    # bounds-only retrain used to re-encode with the cosine stand-in)
    before_cents = _multiset(spark.read.parquet(cents_path))
    retrain_sq8_store(
        spark, corpus, index_path, cents_path, bounds_path,
        trained=True, retrain_codebook=False, iters=2, checkpoint_dir=ckpt,
    )
    assert _multiset(spark.read.parquet(cents_path)) == before_cents
    bounds2 = read_sq8_bounds(spark, bounds_path, "raw")
    store2 = spark.read.parquet(index_path).drop("ingest_batch")
    cents2 = spark.read.parquet(cents_path).drop("cb_kind")
    fresh2 = build_sq8_index(
        corpus, cents2, bounds2, coarse_metric="l2", n_cents=8
    )
    assert _multiset(store2) == _multiset(fresh2)
    assert sq8_topk_serve(
        store2, cents2, qs, bounds2, k=5, coarse_metric="l2", n_centroids=8,
    ).count() == 8 * 5
    # and the invalid combination is refused
    with pytest.raises(ValueError, match="retrain_codebook"):
        retrain_sq8_store(
            spark, corpus, index_path, cents_path, bounds_path,
            trained=False, retrain_codebook=True,
        )


@pytest.mark.slow
def test_sq8_store_relayout_by_cluster_prunes_partitions(spark, tmp_path):
    """relayout_store_by_cluster materializes the SERVING layout: row
    multiset = the append store minus ingest_batch, sq8_topk_serve
    answers identically from the copy, and the copy's cluster
    partitioning actually PRUNES — a single-cluster read shows a
    partition filter and touches one cluster's files."""
    from open_bus_siri_etl_spark.streaming.delta_dedup import (
        relayout_store_by_cluster,
    )

    emb = _emb(spark)
    landing = tmp_path / "landing"
    _land(emb, landing)
    index_path = str(tmp_path / "index")
    cents_path = str(tmp_path / "cents")
    bounds_path = str(tmp_path / "bounds")
    ckpt = str(tmp_path / "ckpt")
    q = start_sq8_index_stream(
        spark, str(landing), index_path, cents_path, bounds_path, ckpt,
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    serving_path = str(tmp_path / "serving")
    out = relayout_store_by_cluster(
        spark, index_path, serving_path, checkpoint_dir=ckpt
    )
    append_store = spark.read.parquet(index_path)
    serving = spark.read.parquet(serving_path)
    assert out["rows"] == append_store.count()
    # partitionBy read-back reorders columns (partition col last) —
    # compare under a canonical column order
    cols = sorted(serving.columns)
    assert set(cols) == set(append_store.drop("ingest_batch").columns)
    assert _multiset(serving.select(cols)) == _multiset(
        append_store.drop("ingest_batch").select(cols)
    )

    bounds = read_sq8_bounds(spark, bounds_path, "raw")
    cents = spark.read.parquet(cents_path).drop("cb_kind")
    qs = emb.filter("vec_id BETWEEN 8 AND 15")
    assert _multiset(
        sq8_topk_serve(serving, cents, qs, bounds, k=5, n_centroids=8)
    ) == _multiset(
        sq8_topk_serve(append_store, cents, qs, bounds, k=5, n_centroids=8)
    )

    # partition pruning: a one-cluster read carries a PartitionFilters
    # entry on cluster (the reason the serving layout exists)
    one = serving.filter(F.col("cluster") == 0)
    plan = one._sc._jvm.PythonSQLUtils.explainString(
        one._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    import re

    pf = re.search(r"PartitionFilters: \[(.*?)\]", plan).group(1)
    assert "cluster" in pf, plan


def test_relayout_refuses_to_replace_the_append_store(spark, tmp_path):
    """r12 ADVICE: relaying out in place (serving_path == index_path), or
    onto a path that already holds an ingest_batch-partitioned append
    store, would silently drop the batch partitioning and break replay
    idempotency — both misuses are refused before any write."""
    from open_bus_siri_etl_spark.streaming.delta_dedup import (
        relayout_store_by_cluster,
    )

    emb = _emb(spark)
    landing = tmp_path / "landing"
    _land(emb, landing, n_batches=1)
    index_path = str(tmp_path / "index")
    q = start_sq8_index_stream(
        spark, str(landing), index_path, str(tmp_path / "cents"),
        str(tmp_path / "bounds"), str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    with pytest.raises(ValueError, match="differ from"):
        relayout_store_by_cluster(spark, index_path, index_path)
    with pytest.raises(ValueError, match="differ from"):
        relayout_store_by_cluster(spark, index_path, index_path + "/")
    # a SECOND append store at the target: also refused
    other = str(tmp_path / "other_append")
    spark.read.parquet(index_path).write.partitionBy(
        "ingest_batch"
    ).parquet(other)
    with pytest.raises(ValueError, match="append store"):
        relayout_store_by_cluster(spark, index_path, other)
    # the append store is untouched by the refused calls
    assert "ingest_batch" in spark.read.parquet(index_path).columns


@pytest.mark.slow
def test_serve_frame_unions_fresh_tail_with_pruned_copy(spark, tmp_path):
    """The relayout staleness trade, closed: batches landed AFTER the
    relayout exist only in the append store; serve_frame unions the
    cluster-partitioned copy with just those tail partitions, so a
    mid-stream serve equals a serve over the full append store — while
    the copy side of the plan keeps its cluster PartitionFilters and the
    tail side prunes on ingest_batch."""
    import re

    from open_bus_siri_etl_spark.streaming.delta_dedup import (
        relayout_store_by_cluster,
        serve_frame,
    )

    emb = _emb(spark)
    landing = tmp_path / "landing"
    _land(emb.filter("vec_id % 2 = 0"), landing, n_batches=2)
    index_path = str(tmp_path / "index")
    cents_path = str(tmp_path / "cents")
    bounds_path = str(tmp_path / "bounds")
    ckpt = str(tmp_path / "ckpt")
    serving_path = str(tmp_path / "serving")
    q = start_sq8_index_stream(
        spark, str(landing), index_path, cents_path, bounds_path, ckpt,
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    out = relayout_store_by_cluster(
        spark, index_path, serving_path, checkpoint_dir=ckpt
    )
    assert out["max_ingest_batch"] is not None
    # serve_frame refuses an append store passed as the copy, and a
    # missing copy
    with pytest.raises(ValueError, match="append store"):
        serve_frame(spark, index_path, index_path, out["max_ingest_batch"])
    with pytest.raises(ValueError, match="no serving copy"):
        serve_frame(
            spark, str(tmp_path / "nowhere"), index_path,
            out["max_ingest_batch"],
        )

    # the stream keeps going: odd ids land post-relayout
    emb.filter("vec_id % 2 = 1").coalesce(1).write.parquet(
        str(landing / "batch_late")
    )
    q2 = start_sq8_index_stream(
        spark, str(landing), index_path, cents_path, bounds_path, ckpt,
        max_files_per_trigger=1,
    )
    q2.awaitTermination(180)

    fresh = serve_frame(spark, serving_path, index_path, out["max_ingest_batch"])
    append_store = spark.read.parquet(index_path)
    assert append_store.count() > out["rows"]  # the tail actually landed
    cols = sorted(fresh.columns)
    assert _multiset(fresh.select(cols)) == _multiset(
        append_store.drop("ingest_batch").select(cols)
    )
    # serve answers identically from the union and the full append store
    bounds = read_sq8_bounds(spark, bounds_path, "raw")
    cents = spark.read.parquet(cents_path).drop("cb_kind")
    qs = emb.filter("vec_id BETWEEN 8 AND 15")
    assert _multiset(
        sq8_topk_serve(fresh, cents, qs, bounds, k=5, n_centroids=8)
    ) == _multiset(
        sq8_topk_serve(append_store, cents, qs, bounds, k=5, n_centroids=8)
    )
    # plan shape: a cluster filter pushes into the COPY's partition
    # pruning, and the tail side prunes on ingest_batch > since_batch
    one = fresh.filter(F.col("cluster") == 0)
    plan = one._sc._jvm.PythonSQLUtils.explainString(
        one._jdf.queryExecution(), "formatted"
    )
    pfs = re.findall(r"PartitionFilters: \[(.*?)\]", plan)
    assert any("cluster" in pf for pf in pfs), plan
    assert any("ingest_batch" in pf for pf in pfs), plan


@pytest.mark.slow
def test_sq8_stream_l2_normalize_append_is_rebuild_and_provenance(
    spark, tmp_path
):
    """The l2_normalize deployment knob end-to-end (r12 directive #2):
    a normalized stream's drained store equals the batch build with the
    flag (bit-exact — the stream normalizes codebook/bounds training
    but hands the RAW batch + flag to the builder), the tag carries
    :norm1, and a RESTART with the flag off is refused at START — a
    normalized store never accepts un-normalized appends (and vice
    versa for a raw store probed by a normalized restart)."""
    from open_bus_siri_etl_spark.operators.similarity import (
        l2_normalize_expr,
    )

    emb = _emb(spark)
    landing = tmp_path / "landing"
    _land(emb, landing)
    index_path = str(tmp_path / "index")
    cents_path = str(tmp_path / "cents")
    bounds_path = str(tmp_path / "bounds")
    ckpt = str(tmp_path / "ckpt")
    q = start_sq8_index_stream(
        spark, str(landing), index_path, cents_path, bounds_path, ckpt,
        max_files_per_trigger=1, l2_normalize=True,
    )
    q.awaitTermination(180)
    bounds = read_sq8_bounds(spark, bounds_path, "raw")
    cents = spark.read.parquet(cents_path).drop("cb_kind")
    streamed = spark.read.parquet(index_path).drop("ingest_batch")
    tags = [r[0] for r in streamed.select("params").distinct().collect()]
    assert tags and all(t.endswith(":norm1") for t in tags)
    batch_built = build_sq8_index(emb, cents, bounds, l2_normalize=True)
    assert _multiset(streamed) == _multiset(batch_built)
    # bounds were trained on the normalized first batch: every |mn|,|mx|
    # inside [-1, 1]
    assert all(-1.0 <= mn <= 1.0 and -1.0 <= mx <= 1.0 for mn, mx in bounds)
    # serve from the streamed store with the flag == cosine-space serve
    qs = emb.filter("vec_id BETWEEN 8 AND 15")
    norm = emb.withColumn("embedding", l2_normalize_expr("embedding"))
    a = _multiset(
        sq8_topk_serve(
            streamed, cents, qs, bounds, k=5, l2_normalize=True
        )
    )
    b = _multiset(
        sq8_topk_serve(
            build_sq8_index(norm, cents, bounds), cents,
            norm.filter("vec_id BETWEEN 8 AND 15"), bounds, k=5,
        )
    )
    assert a == b
    # restart with the flag OFF: refused at START (params tag)
    with pytest.raises(ValueError, match="params"):
        start_sq8_index_stream(
            spark, str(landing), index_path, cents_path, bounds_path, ckpt,
        )
    # and a RAW store refuses a normalized restart
    landing2 = tmp_path / "landing2"
    _land(emb, landing2, n_batches=1)
    args2 = [
        str(landing2), str(tmp_path / "i2"), str(tmp_path / "c2"),
        str(tmp_path / "b2"),
    ]
    q2 = start_sq8_index_stream(spark, *args2, str(tmp_path / "k2"))
    q2.awaitTermination(120)
    with pytest.raises(ValueError, match="params"):
        start_sq8_index_stream(
            spark, *args2, str(tmp_path / "k2"), l2_normalize=True
        )


@pytest.mark.slow
def test_serve_frame_refuses_stale_copy_after_compaction(spark, tmp_path):
    """The serve_frame stale-copy guard: a compaction run AFTER the
    relayout folds every batch into the ingest_batch=-1 base — the tail
    filter would match nothing while the copy no longer reflects the
    log.  serve_frame must raise (high-water mark gone), and a FRESH
    relayout over the compacted store serves correctly again."""
    from open_bus_siri_etl_spark.streaming.delta_dedup import (
        compact_ivf_pq_store,
        relayout_store_by_cluster,
        serve_frame,
    )

    emb = _emb(spark)
    landing = tmp_path / "landing"
    _land(emb, landing)
    index_path = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    q = start_sq8_index_stream(
        spark, str(landing), index_path, str(tmp_path / "cents"),
        str(tmp_path / "bounds"), ckpt, max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    serving = str(tmp_path / "serving")
    out = relayout_store_by_cluster(spark, index_path, serving,
                                    checkpoint_dir=ckpt)
    assert out["max_ingest_batch"] >= 1  # 3 batches landed
    compact_ivf_pq_store(spark, index_path, checkpoint_dir=ckpt)
    with pytest.raises(ValueError, match="compacted or retrained"):
        serve_frame(spark, serving, index_path, out["max_ingest_batch"])
    # a fresh relayout over the compacted log restores the contract
    serving2 = str(tmp_path / "serving2")
    out2 = relayout_store_by_cluster(spark, index_path, serving2,
                                     checkpoint_dir=ckpt)
    assert out2["max_ingest_batch"] == -1  # everything in the base now
    fresh = serve_frame(spark, serving2, index_path, out2["max_ingest_batch"])
    cols = sorted(fresh.columns)
    assert _multiset(fresh.select(cols)) == _multiset(
        spark.read.parquet(index_path).drop("ingest_batch").select(cols)
    )


def _partition_files(serving_path):
    """{cluster_dir_name: {(file_name, mtime_ns, size)}} under a
    cluster-partitioned serving copy."""
    import os

    out = {}
    for entry in os.scandir(serving_path):
        if not entry.is_dir() or not entry.name.startswith("cluster="):
            continue
        files = set()
        for f in os.scandir(entry.path):
            if f.name.endswith(".parquet"):
                st = f.stat()
                files.add((f.name, st.st_mtime_ns, st.st_size))
        out[entry.name] = files
    return out


@pytest.mark.slow
def test_incremental_relayout_matches_full_and_skips_untouched(
    spark, tmp_path
):
    """r14 directive #1: relayout_store_by_cluster(since_batch=mark)
    folds only the post-mark tail into the serving copy — result row-
    multiset equals a from-scratch FULL relayout, but the untouched
    cluster partitions' files are byte-identical on disk (same names,
    mtimes, sizes: never rewritten), so refresh cost scales with the
    tail, not the store."""
    from open_bus_siri_etl_spark.streaming.delta_dedup import (
        relayout_store_by_cluster,
        serve_frame,
    )

    emb = _emb(spark)
    landing = tmp_path / "landing"
    _land(emb.filter("vec_id % 2 = 0"), landing, n_batches=2)
    index_path = str(tmp_path / "index")
    cents_path = str(tmp_path / "cents")
    bounds_path = str(tmp_path / "bounds")
    ckpt = str(tmp_path / "ckpt")
    serving = str(tmp_path / "serving")
    q = start_sq8_index_stream(
        spark, str(landing), index_path, cents_path, bounds_path, ckpt,
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    out = relayout_store_by_cluster(
        spark, index_path, serving, checkpoint_dir=ckpt
    )
    assert out["mode"] == "full"

    # guard: an incremental refresh needs an existing copy
    with pytest.raises(ValueError, match="full relayout"):
        relayout_store_by_cluster(
            spark, index_path, str(tmp_path / "nowhere"),
            since_batch=out["max_ingest_batch"],
        )

    # late tail: ONE vector → exactly one touched cluster, others untouched
    emb.filter("vec_id = 1").coalesce(1).write.parquet(
        str(landing / "batch_late")
    )
    q2 = start_sq8_index_stream(
        spark, str(landing), index_path, cents_path, bounds_path, ckpt,
        max_files_per_trigger=1,
    )
    q2.awaitTermination(180)

    before = _partition_files(serving)
    assert len(before) > 1  # multiple cluster partitions to distinguish
    out2 = relayout_store_by_cluster(
        spark, index_path, serving, checkpoint_dir=ckpt,
        since_batch=out["max_ingest_batch"],
    )
    assert out2["mode"] == "incremental"
    assert out2["n_clusters"] == len(out2["touched_clusters"]) == 1
    assert out2["max_ingest_batch"] > out["max_ingest_batch"]
    after = _partition_files(serving)

    # untouched cluster partitions: files byte-identical (not rewritten)
    touched_dirs = {f"cluster={c}" for c in out2["touched_clusters"]}
    untouched = set(before) - touched_dirs
    assert untouched, "late vector touched every cluster — fixture broke"
    for d in untouched:
        assert after[d] == before[d], f"untouched partition {d} was rewritten"

    # refreshed copy ≡ full relayout of the same log (row multiset)
    full2 = str(tmp_path / "serving_full")
    relayout_store_by_cluster(spark, index_path, full2, checkpoint_dir=ckpt)
    cols = sorted(spark.read.parquet(full2).columns)
    assert _multiset(spark.read.parquet(serving).select(cols)) == _multiset(
        spark.read.parquet(full2).select(cols)
    )

    # the advanced mark serves fresh with an empty tail union
    fresh = serve_frame(spark, serving, index_path, out2["max_ingest_batch"])
    assert _multiset(fresh.select(cols)) == _multiset(
        spark.read.parquet(index_path).drop("ingest_batch").select(cols)
    )

    # no-op refresh: nothing landed since the new mark
    out3 = relayout_store_by_cluster(
        spark, index_path, serving, checkpoint_dir=ckpt,
        since_batch=out2["max_ingest_batch"],
    )
    assert out3["mode"] == "incremental"
    assert out3["rows"] == 0 and out3["touched_clusters"] == []
    assert out3["max_ingest_batch"] == out2["max_ingest_batch"]
    assert _partition_files(serving) == after  # untouched entirely


def test_incremental_relayout_refuses_stale_mark_after_compaction(
    spark, tmp_path
):
    """A compaction AFTER the copy was cut rewrites history below the
    mark — the incremental refresh must refuse (same stale-copy guard as
    serve_frame), never silently keep serving pre-compaction rows."""
    from open_bus_siri_etl_spark.streaming.delta_dedup import (
        compact_ivf_pq_store,
        relayout_store_by_cluster,
    )

    emb = _emb(spark)
    landing = tmp_path / "landing"
    _land(emb, landing)
    index_path = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    q = start_sq8_index_stream(
        spark, str(landing), index_path, str(tmp_path / "cents"),
        str(tmp_path / "bounds"), ckpt, max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    serving = str(tmp_path / "serving")
    out = relayout_store_by_cluster(
        spark, index_path, serving, checkpoint_dir=ckpt
    )
    assert out["max_ingest_batch"] >= 1
    compact_ivf_pq_store(spark, index_path, checkpoint_dir=ckpt)
    with pytest.raises(ValueError, match="compacted or retrained"):
        relayout_store_by_cluster(
            spark, index_path, serving, checkpoint_dir=ckpt,
            since_batch=out["max_ingest_batch"],
        )


def test_serve_frame_refuses_none_since_batch(spark, tmp_path):
    """r13 ADVICE: a relayout over an EMPTY append store returns
    max_ingest_batch=None — passing that into serve_frame must raise a
    clear ValueError, not TypeError on the comparison (or a silent
    lit(None) tail filter)."""
    from open_bus_siri_etl_spark.streaming.delta_dedup import (
        relayout_store_by_cluster,
        serve_frame,
    )

    out = relayout_store_by_cluster(
        spark, str(tmp_path / "empty_index"), str(tmp_path / "serving")
    )
    assert out["max_ingest_batch"] is None
    with pytest.raises(ValueError, match="since_batch is None"):
        serve_frame(
            spark, str(tmp_path / "serving"), str(tmp_path / "empty_index"),
            out["max_ingest_batch"],
        )
