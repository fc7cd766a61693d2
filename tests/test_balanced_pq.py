"""Variance-balanced PQ layout (OPQ's permutation special case):
round-robin allocation contract, and the claim that balancing beats
contiguous slicing when the variance is position-structured."""

import pytest

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from open_bus_siri_etl_spark.operators.similarity import (
    apply_dim_permutation,
    ivf_pq_topk,
    ivf_pq_topk_balanced,
    pq_balanced_perm,
    pq_codes_df,
)

N_SUB, SUB_DIM, DIM = 4, 16, 64


def _aniso(spark, n=400, seed=7):
    """Variance concentrated in the FIRST contiguous subspace — the
    adversarial layout for plain PQ (subspace 0 holds all the signal,
    subspaces 1..3 spend their code budget on noise)."""
    rng = np.random.RandomState(seed)
    v = rng.randn(n, DIM)
    v[:, :SUB_DIM] *= 5.0
    v[:, SUB_DIM:] *= 0.2
    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(n), "embedding": list(v.astype("float32"))}
        )
    )
    return spark.createDataFrame(df.collect(), df.schema)


def test_balanced_perm_is_round_robin_bijection(spark):
    df = _aniso(spark)
    perm = pq_balanced_perm(df, N_SUB, SUB_DIM)
    assert sorted(perm) == list(range(1, DIM + 1))
    # the 16 high-variance dims (1-based 1..16) must spread exactly
    # SUB_DIM/N_SUB = 4 per subspace — the whole point of the dealing
    for m in range(N_SUB):
        sub_dims = perm[m * SUB_DIM : (m + 1) * SUB_DIM]
        assert sum(1 for d in sub_dims if d <= SUB_DIM) == SUB_DIM // N_SUB, (
            m,
            sub_dims,
        )


def test_apply_dim_permutation_gathers(spark):
    df = spark.createDataFrame(
        [(1, [10.0, 20.0, 30.0])], "vec_id long, embedding array<double>"
    )
    out = apply_dim_permutation(df, [3, 1, 2], "embedding", "p").first()["p"]
    assert out == [30.0, 10.0, 20.0]


def test_balanced_layout_cuts_reconstruction_error(spark):
    """The direct quantity the layout improves: total PQ reconstruction
    distortion.  With all the variance in one contiguous subspace, plain
    PQ gives that subspace the same 8 codes it gives the noise
    subspaces; dealing the high-variance dims 4-per-subspace must cut
    the mean reconstruction error materially (not epsilon)."""
    df = _aniso(spark)
    perm = pq_balanced_perm(df, N_SUB, SUB_DIM)
    permuted = apply_dim_permutation(df, perm, "embedding", "_bvec").select(
        "vec_id", "_bvec"
    )
    plain = (
        pq_codes_df(df, N_SUB, SUB_DIM, n_centroids=8)
        .agg(F.avg("recon_d2"))
        .first()[0]
    )
    balanced = (
        pq_codes_df(permuted, N_SUB, SUB_DIM, n_centroids=8, vec_col="_bvec")
        .agg(F.avg("recon_d2"))
        .first()[0]
    )
    assert balanced < plain * 0.95, (balanced, plain)


@pytest.mark.slow
def test_balanced_residual_refine_contract_and_recall(spark):
    """The stacked composition: refine-contract output, and recall on
    the adversarial variance layout must be >= the plain balanced ADC
    (residual grid + exact re-rank can only help at identical pruning)."""
    from open_bus_siri_etl_spark.operators.similarity import (
        ann_recall,
        cosine_topk,
        ivf_pq_balanced_residual_topk,
    )

    df = _aniso(spark)
    qs = df.filter(F.col("vec_id").between(8, 15))
    out = ivf_pq_balanced_residual_topk(
        df, qs, k=5, shortlist=20, n_centroids=8, n_probe=4,
        n_sub=N_SUB, sub_dim=SUB_DIM, pq_centroids=8,
    )
    assert out.columns == ["query_id", "neighbor_id", "rank"]
    exact = cosine_topk(df, qs, k=5)
    r_stack = ann_recall(exact, out, 5).agg(F.avg("recall")).first()[0]
    r_plain = (
        ann_recall(
            exact,
            ivf_pq_topk_balanced(
                df, qs, k=5, n_centroids=8, n_probe=4, n_sub=N_SUB,
                sub_dim=SUB_DIM, pq_centroids=8,
            ),
            5,
        ).agg(F.avg("recall")).first()[0]
    )
    assert r_stack >= r_plain, (r_stack, r_plain)


def test_balanced_perm_rejects_ragged_input(spark):
    """A ragged embedding column whose DISTINCT dim count equals
    n_sub*sub_dim must fail the contiguity/count guard instead of
    silently ranking variances over differing row counts (the sq8_train
    discipline applied here)."""
    import pytest

    # row 1 has dims 1..64, row 2 has dims 1..63 -> dim 64's cnt differs
    df = spark.createDataFrame(
        [(1, [float(i) for i in range(64)]), (2, [float(i) for i in range(63)])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="ragged"):
        pq_balanced_perm(df, N_SUB, SUB_DIM)


def test_balanced_coarse_assignment_permutation_invariant(spark):
    """The documented ulp boundary assumption of ivf_pq_topk_balanced:
    ranking by cosine summed in PERMUTED dimension order must assign the
    same coarse cells as engine order on the testdata corpora (both SFs)
    — the regression that would catch a corpus with ~1-ulp cosine ties,
    where the assumption (and the entry's oracle-exactness) breaks."""
    from open_bus_siri_etl_spark.operators.similarity import (
        _nearest_centroids,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        perm = pq_balanced_perm(emb, N_SUB, SUB_DIM)
        permuted = apply_dim_permutation(emb, perm, "embedding", "_bvec")
        cents_raw = (
            emb.orderBy("vec_id").limit(8)
            .select(F.col("vec_id").alias("cent_id"),
                    F.col("embedding").alias("cent_vec"))
        )
        cents_perm = (
            permuted.orderBy("vec_id").limit(8)
            .select(F.col("vec_id").alias("cent_id"),
                    F.col("_bvec").alias("cent_vec"))
        )
        a_raw = sorted(
            map(tuple, _nearest_centroids(
                emb.select(F.col("vec_id").alias("_id"),
                           F.col("embedding").alias("_vec")),
                cents_raw, "cluster", keep=2,
            ).select("_id", "cluster").collect())
        )
        a_perm = sorted(
            map(tuple, _nearest_centroids(
                permuted.select(F.col("vec_id").alias("_id"),
                                F.col("_bvec").alias("_vec")),
                cents_perm, "cluster", keep=2,
            ).select("_id", "cluster").collect())
        )
        assert a_raw == a_perm, sf


def test_balanced_recall_not_below_plain_on_aniso(spark):
    """Ranking-level corollary (noisier than distortion, so asserted
    weakly): on the adversarial variance layout the balanced ADC recall
    must not fall below contiguous slicing at identical parameters."""
    from open_bus_siri_etl_spark.operators.similarity import (
        ann_recall,
        cosine_topk,
    )

    df = _aniso(spark)
    qs = df.filter(F.col("vec_id").between(8, 15))
    exact = cosine_topk(df, qs, k=5)
    kw = dict(k=5, n_centroids=8, n_probe=4, n_sub=N_SUB, sub_dim=SUB_DIM,
              pq_centroids=8)
    r_plain = (
        ann_recall(exact, ivf_pq_topk(df, qs, **kw), 5)
        .agg(F.avg("recall")).first()[0]
    )
    r_bal = (
        ann_recall(exact, ivf_pq_topk_balanced(df, qs, **kw), 5)
        .agg(F.avg("recall")).first()[0]
    )
    assert r_bal >= r_plain, (r_bal, r_plain)
