"""SQ8 scalar-quantization family: encode/decode contracts, the
codes-only index claim, and the frontier position (near-exact recall at
4x compression vs PQ's shortlist-grade at the same pruning)."""

import math

from pyspark.sql import functions as F

from open_bus_siri_etl_spark.operators.quantization import (
    sq8_decode_expr,
    sq8_encode,
    sq8_ivf_topk,
    sq8_train,
)
from open_bus_siri_etl_spark.plans.catalog import REGISTRY

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_sq8_train_bounds_are_exact_min_max(spark):
    emb = _emb(spark)
    bounds = sq8_train(emb)
    dim = len(emb.select(F.size("embedding")).first()[0:1]) and emb.select(
        F.size("embedding")
    ).first()[0]
    assert len(bounds) == dim
    # dimension 0's bounds equal the column's actual extrema
    mn0, mx0 = (
        emb.select(
            F.min(F.element_at("embedding", 1).cast("double")),
            F.max(F.element_at("embedding", 1).cast("double")),
        ).first()
    )
    assert bounds[0] == (mn0, mx0)
    assert all(mx >= mn for mn, mx in bounds)


def test_sq8_encode_contract(spark):
    """Codes clamp to [0, 255], the per-dim max encodes to 255 and the min
    to 0 (the FAISS upper-edge rule), and midpoint decode lands within
    half a cell of the original value."""
    emb = _emb(spark)
    bounds = sq8_train(emb)
    enc = sq8_encode(emb, bounds)
    stats = enc.select(
        F.min(F.array_min("sq8_code")).alias("lo"),
        F.max(F.array_max("sq8_code")).alias("hi"),
    ).first()
    assert stats["lo"] == 0 and stats["hi"] == 255

    # codes of the extreme values per dim: re-encode the bounds themselves
    row = enc.select("embedding", "sq8_code").first()
    for j, (code, v) in enumerate(zip(row["sq8_code"], row["embedding"])):
        mn, mx = bounds[j]
        assert 0 <= code <= 255
        span = mx - mn
        dq = mn + (code + 0.5) * span / 256.0
        # half-cell reconstruction bound (+ rounding slack from the 6dp
        # pre-floor round)
        assert abs(dq - float(v)) <= span / 512.0 + 1e-5 * max(1.0, span)


def test_sq8_degenerate_dimension(spark):
    """A constant dimension must encode to 0 and decode back to exactly
    its value (span 0: no division, midpoint collapses to mn)."""
    df = spark.createDataFrame(
        [(i, [float(i), 7.5]) for i in range(10)], "vec_id long, embedding array<double>"
    )
    bounds = sq8_train(df)
    assert bounds[1] == (7.5, 7.5)
    enc = sq8_encode(df, bounds)
    codes = [r["sq8_code"][1] for r in enc.collect()]
    assert codes == [0] * 10
    dec = enc.select(sq8_decode_expr(F.col("sq8_code"), bounds).alias("dq"))
    assert all(abs(r["dq"][1] - 7.5) < 1e-12 for r in dec.collect())


def test_sq8_matches_pure_python_reference(spark):
    """The Spark encode must equal an independent scalar implementation of
    the QT_8bit rule on every coordinate of a sample — the engine-neutral
    statement of the encode spec (the DuckDB oracle is the cross-engine
    one; this pins the rule itself)."""
    emb = _emb(spark).limit(20)
    bounds = sq8_train(_emb(spark))
    rows = sq8_encode(emb, bounds).select("embedding", "sq8_code").collect()
    for r in rows:
        for j, (v, code) in enumerate(zip(r["embedding"], r["sq8_code"])):
            mn, mx = bounds[j]
            x01 = 0.0 if mx == mn else (float(v) - mn) / (mx - mn)
            expected = min(255, max(0, math.floor(round(x01 * 256.0, 6))))
            assert code == expected, (j, v, code, expected)


def test_sq8_index_frame_is_codes_only(spark):
    """The stored index must NOT carry float vectors — that is the 4x
    memory claim.  Asserted structurally: the serving plan's index arm is
    built from (neighbor_id, cluster, sq8_code) alone (see
    quantization.sq8_ivf_topk), so the joined output schema exposes codes
    and never a candidate-side vector column."""
    emb = _emb(spark)
    out = sq8_ivf_topk(emb, emb.filter(F.col("vec_id") < 4), k=3)
    assert set(out.columns) == {"query_id", "neighbor_id", "rank", "sq8_d2"}
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan


def test_sq8_recall_at_or_above_pq_at_same_pruning(spark):
    """The frontier claim: at identical coarse quantizer + n_probe, SQ8's
    8-bit-per-dim decode must recall at least as much as PQ's
    8-bytes-per-vector codes — compression is the only difference."""
    sq8 = REGISTRY["sq8_recall_eval"].fn(spark, SF)
    pq = REGISTRY["ivf_pq_recall_eval"].fn(spark, SF)
    sq8_mean = sq8.agg(F.avg("recall")).first()[0]
    pq_mean = pq.agg(F.avg("recall")).first()[0]
    assert sq8_mean >= pq_mean


def test_sq8_persisted_store_equals_inline(spark, tmp_path):
    """Write the codes-only store partitioned by cluster, serve from the
    read-back — must equal the inline batch form row-for-row (the
    ivf_pq persisted==inline contract)."""
    from open_bus_siri_etl_spark.operators.quantization import (
        build_sq8_index,
        sq8_topk_serve,
    )

    emb = _emb(spark)
    qs = emb.filter(F.col("vec_id").between(8, 15))
    cents = (
        emb.orderBy("vec_id")
        .limit(8)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("cent_vec"),
        )
    )
    bounds = sq8_train(emb)
    path = str(tmp_path / "sq8_store")
    build_sq8_index(emb, cents, bounds).write.partitionBy("cluster").parquet(
        path
    )
    store = spark.read.parquet(path)
    # codes + provenance (params tag, content fingerprint) — still no
    # float vectors anywhere in the store
    assert set(store.columns) == {
        "vec_id", "cluster", "sq8_code", "params", "sq8_fp"
    }
    served = sq8_topk_serve(store, cents, qs, bounds, k=5, n_probe=2)
    inline = sq8_ivf_topk(emb, qs, k=5, n_centroids=8, n_probe=2)
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(served) == key(inline)


def test_sq8_serve_refuses_unprovenanced_store(spark):
    """ADVICE r11 (medium): sq8_topk_serve must refuse a store lacking
    the params/sq8_fp provenance columns outright."""
    import pytest

    from open_bus_siri_etl_spark.operators.quantization import (
        build_sq8_index,
        sq8_topk_serve,
    )

    emb = _emb(spark)
    cents = (
        emb.orderBy("vec_id").limit(8)
        .select(F.col("vec_id").alias("cent_id"),
                F.col("embedding").alias("cent_vec"))
    )
    bounds = sq8_train(emb)
    bare = build_sq8_index(emb, cents, bounds).drop("params", "sq8_fp")
    with pytest.raises(ValueError, match="params"):
        sq8_topk_serve(bare, cents, emb.limit(2), bounds, k=3)


def test_sq8_serve_refuses_family_and_fingerprint_mismatch(spark):
    """The two staleness directions: a residual-built store served with
    residual=False must raise (params tag), and a store served with
    bounds from a DIFFERENT training must raise (content fingerprint) —
    both used to silently return wrong neighbors."""
    import pytest

    from open_bus_siri_etl_spark.operators.quantization import (
        build_sq8_index,
        sq8_residual_frame,
        sq8_topk_serve,
    )

    emb = _emb(spark)
    qs = emb.filter(F.col("vec_id").between(8, 11))
    cents = (
        emb.orderBy("vec_id").limit(8)
        .select(F.col("vec_id").alias("cent_id"),
                F.col("embedding").alias("cent_vec"))
    )
    res_bounds = sq8_train(
        sq8_residual_frame(emb, cents), vec_col="_rvec"
    )
    res_store = build_sq8_index(emb, cents, res_bounds, residual=True)
    with pytest.raises(Exception, match="params|family"):
        sq8_topk_serve(
            res_store, cents, qs, res_bounds, k=3, residual=False
        ).collect()

    raw_bounds = sq8_train(emb)
    raw_store = build_sq8_index(emb, cents, raw_bounds)
    drifted = [(mn - 1.0, mx + 1.0) for mn, mx in raw_bounds]
    with pytest.raises(Exception, match="fingerprint"):
        sq8_topk_serve(raw_store, cents, qs, drifted, k=3).collect()


def _clustered(spark, n_extra=200, seed=11):
    """Ids 0..7 ARE the topic centers (so the stand-in coarse quantizer
    is the true one); everything else is a center plus small noise —
    the regime where residual re-centering provably tightens the grid."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(seed)
    centers = (rng.randn(8, 16) * 5.0).astype("float64")
    topic = rng.randint(0, 8, n_extra)
    rows = np.vstack([centers, centers[topic] + 0.1 * rng.randn(n_extra, 16)])
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": np.arange(len(rows)),
                "embedding": list(rows.astype("float32")),
            }
        )
    )
    return spark.createDataFrame(df.collect(), df.schema)


def test_sq8_residual_grid_is_finer_on_clustered_data(spark):
    """The reason residual encoding exists: per-dim bounds over residuals
    span the WITHIN-cell range, so the same 256 levels land on a much
    finer grid than raw encoding's corpus-wide bounds."""
    from open_bus_siri_etl_spark.operators.similarity import (
        _nearest_centroids,
    )

    df = _clustered(spark)
    raw_bounds = sq8_train(df)
    cents = (
        df.orderBy("vec_id")
        .limit(8)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("cent_vec"),
        )
    )
    res = (
        _nearest_centroids(
            df.select(
                F.col("vec_id").alias("_id"), F.col("embedding").alias("_vec")
            ),
            cents,
            "cluster",
            keep=1,
        )
        .join(
            cents.select(
                F.col("cent_id").alias("cluster"),
                F.col("cent_vec").alias("_cent"),
            ),
            "cluster",
        )
        .select(
            F.zip_with(
                "_vec", "_cent",
                lambda x, y: x.cast("double") - y.cast("double"),
            ).alias("_rvec")
        )
    )
    res_bounds = sq8_train(res, vec_col="_rvec")
    raw_span = sum(mx - mn for mn, mx in raw_bounds) / len(raw_bounds)
    res_span = sum(mx - mn for mn, mx in res_bounds) / len(res_bounds)
    assert res_span < 0.5 * raw_span, (res_span, raw_span)


def test_sq8_residual_recall_at_least_raw_on_clustered_data(spark):
    """End-to-end corollary on the same frame: the finer grid must not
    rank worse than raw SQ8 at identical pruning."""
    from open_bus_siri_etl_spark.operators.quantization import (
        sq8_residual_ivf_topk,
    )
    from open_bus_siri_etl_spark.operators.similarity import (
        ann_recall,
        cosine_topk,
    )

    df = _clustered(spark)
    qs = df.filter(F.col("vec_id").between(8, 15))
    exact = cosine_topk(df, qs, k=5)
    kw = dict(k=5, n_centroids=8, n_probe=2)
    r_raw = (
        ann_recall(exact, sq8_ivf_topk(df, qs, **kw), 5)
        .agg(F.avg("recall")).first()[0]
    )
    r_res = (
        ann_recall(exact, sq8_residual_ivf_topk(df, qs, **kw), 5)
        .agg(F.avg("recall")).first()[0]
    )
    assert r_res >= r_raw, (r_res, r_raw)


def test_sq8_residual_output_contract(spark):
    from open_bus_siri_etl_spark.operators.quantization import (
        sq8_residual_ivf_topk,
    )

    emb = _emb(spark)
    qs = emb.filter(F.col("vec_id").between(8, 15))
    out = sq8_residual_ivf_topk(emb, qs, k=5)
    rows = out.collect()
    assert set(out.columns) == {"query_id", "neighbor_id", "rank", "sq8_d2"}
    assert len(rows) == 8 * 5
    assert all(r["query_id"] != r["neighbor_id"] for r in rows)


def test_sq8_refine_contract_and_recall(spark):
    """The refine rung: output is the cosine-refine contract (query_id,
    neighbor_id, rank — no distance column), and on clustered data the
    refined recall must be >= the unrefined SQ8 recall at identical
    pruning (the refine can only fix ranking within the shortlist)."""
    from open_bus_siri_etl_spark.operators.quantization import (
        sq8_refine_topk,
    )
    from open_bus_siri_etl_spark.operators.similarity import (
        ann_recall,
        cosine_topk,
    )

    df = _clustered(spark)
    qs = df.filter(F.col("vec_id").between(8, 15))
    out = sq8_refine_topk(df, qs, k=5, shortlist=20, n_probe=2)
    assert out.columns == ["query_id", "neighbor_id", "rank"]
    exact = cosine_topk(df, qs, k=5)
    r_plain = (
        ann_recall(exact, sq8_ivf_topk(df, qs, k=5, n_probe=2), 5)
        .agg(F.avg("recall")).first()[0]
    )
    r_ref = (
        ann_recall(exact, out, 5).agg(F.avg("recall")).first()[0]
    )
    assert r_ref >= r_plain, (r_ref, r_plain)


def test_sq8_refine_serve_from_persisted_store(spark, tmp_path):
    """sq8_refine_serve over a written-and-read-back store equals the
    inline sq8_refine_topk row-for-row (persisted == inline, the family
    contract)."""
    from open_bus_siri_etl_spark.operators.quantization import (
        build_sq8_index,
        sq8_refine_serve,
        sq8_refine_topk,
    )

    emb = _emb(spark)
    qs = emb.filter(F.col("vec_id").between(8, 15))
    cents = (
        emb.orderBy("vec_id").limit(8)
        .select(F.col("vec_id").alias("cent_id"),
                F.col("embedding").alias("cent_vec"))
    )
    bounds = sq8_train(emb)
    path = str(tmp_path / "store")
    build_sq8_index(emb, cents, bounds, n_cents=8).write.partitionBy(
        "cluster"
    ).parquet(path)
    served = sq8_refine_serve(
        spark.read.parquet(path), cents, qs, bounds, emb,
        k=5, shortlist=20, n_probe=2, n_centroids=8,
    )
    inline = sq8_refine_topk(emb, qs, k=5, shortlist=20, n_probe=2)
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(served) == key(inline)


def test_sq8_d2_unrolled_equals_fold(spark):
    """_sq8_d2_expr's two bodies must be BIT-identical: same per-term
    math, same left-to-right addition order (IEEE 0.0 + x == x makes the
    fold's seed transparent) — so serving with dim= (codegen unroll) and
    without (compact fold) return the same rows and distances."""
    from open_bus_siri_etl_spark.operators.quantization import (
        build_sq8_index,
        sq8_topk_serve,
    )

    emb = _emb(spark)
    qs = emb.filter(F.col("vec_id").between(8, 15))
    cents = (
        emb.orderBy("vec_id")
        .limit(8)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("cent_vec"),
        )
    )
    bounds = sq8_train(emb)
    index = build_sq8_index(emb, cents, bounds)
    key = lambda df: sorted(map(tuple, df.collect()))
    fold = sq8_topk_serve(index, cents, qs, bounds, k=5, n_probe=2)
    unrolled = sq8_topk_serve(
        index, cents, qs, bounds, k=5, n_probe=2, dim=64
    )
    assert key(fold) == key(unrolled)


def test_sq8_serve_provenance_checked_eagerly(spark):
    """r12 ADVICE: the provenance guard fires at PLAN BUILD (driver-side
    bounded sample), not only in-plan for rows that survive partition
    pruning and the probe join — so a mismatched store raises even when
    its clusters don't overlap any probed cell, where the in-plan guard
    alone would return silently empty.  An EMPTY store still serves
    (legitimately) empty."""
    import pytest

    from open_bus_siri_etl_spark.operators.quantization import (
        build_sq8_index,
        sq8_topk_serve,
    )

    emb = _emb(spark)
    qs = emb.filter(F.col("vec_id").between(8, 11))
    cents = (
        emb.orderBy("vec_id").limit(8)
        .select(F.col("vec_id").alias("cent_id"),
                F.col("embedding").alias("cent_vec"))
    )
    bounds = sq8_train(emb)
    store = build_sq8_index(emb, cents, bounds)
    # keep ONLY clusters no query can probe with n_probe=1 against a
    # single-centroid codebook frame restricted to cent_id 0 — then
    # drift the bounds: pre-r13 this returned empty, now it raises at
    # the sq8_topk_serve CALL (note: no .collect() below)
    drifted = [(mn - 1.0, mx + 1.0) for mn, mx in bounds]
    with pytest.raises(ValueError, match="fingerprint"):
        sq8_topk_serve(
            store.filter(F.col("cluster") > 0), cents, qs, drifted, k=3,
            n_probe=1, n_centroids=8,
        )
    # family mismatch is equally eager
    with pytest.raises(ValueError, match="params"):
        sq8_topk_serve(
            store.filter(F.col("cluster") > 0), cents, qs, bounds, k=3,
            residual=True, n_centroids=8,
        )
    # empty store: nothing was encoded against anything — serve is
    # legitimately empty, not an error
    assert (
        sq8_topk_serve(
            store.filter("false"), cents, qs, drifted, k=3, n_centroids=8
        ).count() == 0
    )


def test_ivf_pq_serve_provenance_checked_eagerly(spark):
    """Same eager plan-build guard for the PQ family: a store served with
    a regenerated codebook raises at the ivf_pq_topk_serve call even if
    every store row would be pruned before the in-plan check."""
    import pytest

    from open_bus_siri_etl_spark.operators.similarity import (
        build_ivf_pq_index,
        ivf_pq_topk_serve,
    )

    from open_bus_siri_etl_spark.operators.similarity import (
        ivf_pq_centroids,
    )

    emb = _emb(spark)
    qs = emb.filter(F.col("vec_id").between(8, 11))
    cents = ivf_pq_centroids(emb, n_keep=8)
    store = build_ivf_pq_index(emb, cents=cents)
    other = ivf_pq_centroids(emb.filter("vec_id >= 100"), n_keep=8)
    with pytest.raises(ValueError, match="fingerprint"):
        ivf_pq_topk_serve(store.filter(F.col("cluster") > 0), other, qs, k=3)


def test_l2_normalize_build_equals_prenormalized_build(spark):
    """The l2_normalize knob's exact semantics: build_sq8_index(raw,
    l2_normalize=True) encodes the SAME codes as building over a
    pre-normalized corpus (only the params tag differs — :norm1), and
    the normalized deployment's serve refuses a flag mismatch EAGERLY
    in both directions."""
    import pytest

    from open_bus_siri_etl_spark.operators.quantization import (
        build_sq8_index,
        sq8_topk_serve,
    )
    from open_bus_siri_etl_spark.operators.similarity import (
        l2_normalize_expr,
    )

    emb = _emb(spark)
    norm = emb.withColumn("embedding", l2_normalize_expr("embedding"))
    cents = (
        norm.orderBy("vec_id").limit(8)
        .select(F.col("vec_id").alias("cent_id"),
                F.col("embedding").alias("cent_vec"))
    )
    bounds = sq8_train(norm)
    flagged = build_sq8_index(emb, cents, bounds, l2_normalize=True)
    pre = build_sq8_index(norm, cents, bounds)
    key = lambda df: sorted(
        map(tuple, df.select("vec_id", "cluster", "sq8_code").collect())
    )
    assert key(flagged) == key(pre)
    tags = flagged.select("params").distinct().collect()
    assert len(tags) == 1 and tags[0][0].endswith(":norm1")
    # serve agreement: the flagged store + flagged serve answers exactly
    # like the pre-normalized store served plain
    qs = emb.filter(F.col("vec_id").between(8, 15))
    a = sorted(map(tuple, sq8_topk_serve(
        flagged, cents, qs, bounds, k=5, n_centroids=8, l2_normalize=True
    ).collect()))
    qs_norm = norm.filter(F.col("vec_id").between(8, 15))
    b = sorted(map(tuple, sq8_topk_serve(
        pre, cents, qs_norm, bounds, k=5, n_centroids=8
    ).collect()))
    assert a == b
    # flag mismatch fails loudly, eagerly, both directions
    with pytest.raises(ValueError, match="params"):
        sq8_topk_serve(flagged, cents, qs, bounds, k=5, n_centroids=8)
    raw_store = build_sq8_index(emb, cents, bounds)
    with pytest.raises(ValueError, match="params"):
        sq8_topk_serve(
            raw_store, cents, qs, bounds, k=5, n_centroids=8,
            l2_normalize=True,
        )


def test_l2_normalize_pq_build_and_serve(spark):
    """Same knob on the PQ family: flagged build == pre-normalized
    build (codes + cluster), tag gains N, serve flag mismatch raises."""
    import pytest

    from open_bus_siri_etl_spark.operators.similarity import (
        build_ivf_pq_index,
        ivf_pq_centroids,
        ivf_pq_topk_serve,
        l2_normalize_expr,
    )

    emb = _emb(spark)
    norm = emb.withColumn("embedding", l2_normalize_expr("embedding"))
    cents = ivf_pq_centroids(norm, n_keep=8)
    flagged = build_ivf_pq_index(emb, cents=cents, l2_normalize=True)
    pre = build_ivf_pq_index(norm, cents=cents)
    key = lambda df: sorted(
        map(tuple, df.select("vec_id", "cluster", "m", "code").collect())
    )
    assert key(flagged) == key(pre)
    assert flagged.select("params").distinct().collect()[0][0].endswith("N")
    qs = emb.filter(F.col("vec_id").between(8, 11))
    with pytest.raises(ValueError, match="params"):
        ivf_pq_topk_serve(flagged, cents, qs, k=3)
    # and the flagged serve works
    assert ivf_pq_topk_serve(
        flagged, cents, qs, k=3, l2_normalize=True
    ).count() > 0


def test_l2_normalize_null_vector_or_element_raises(spark):
    """r13 ADVICE: a NULL vector (or a NULL element poisoning the norm
    fold) must fail loudly like the zero vector does — silently emitting
    all-NULL coordinates would flow into codebook training unnoticed."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from open_bus_siri_etl_spark.operators.similarity import l2_normalize_expr

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    ok = spark.createDataFrame([(1, [3.0, 4.0])], schema).select(
        l2_normalize_expr("embedding").alias("n")
    )
    assert ok.collect()[0]["n"] == [0.6, 0.8]
    null_vec = spark.createDataFrame([(1, None)], schema)
    with pytest.raises(Exception, match="NULL vector or NULL element"):
        null_vec.select(l2_normalize_expr("embedding").alias("n")).collect()
    null_elem = spark.createDataFrame([(1, [1.0, None])], schema)
    with pytest.raises(Exception, match="NULL vector or NULL element"):
        null_elem.select(l2_normalize_expr("embedding").alias("n")).collect()
    zero = spark.createDataFrame([(1, [0.0, 0.0])], schema)
    with pytest.raises(Exception, match="zero vector"):
        zero.select(l2_normalize_expr("embedding").alias("n")).collect()
