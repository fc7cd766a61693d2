"""Similarity search over an embedding column (array<float>).

Two paths (beyond-reference, BASELINE.json north star):
- brute-force cosine top-k: the exact baseline.  Query set is broadcast
  (it's small by construction); the scan side streams — at 100 TB this is
  one pass over the corpus per query batch with no shuffle until the final
  per-query top-k (TakeOrdered-style window over rank).
- LSH-bucketed ANN: random-hyperplane signatures bucket the corpus; queries
  probe only their bucket.  Hyperplanes are seeded numpy (deterministic),
  shipped as literal arrays → the whole plan stays native (no UDF).

Dot products use F.zip_with + F.aggregate over DOUBLE — an in-JVM fold,
no explode, no Python.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Output: (query_id, neighbor_id, rank), rank 1..k by similarity desc
    (ties broken by neighbor_id for determinism); self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    sim = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(F.col("q_vec"), F.col("c_vec"))
            / (_norm(F.col("q_vec")) * _norm(F.col("c_vec"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def cosine_near_pairs(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup: all pairs with cosine ≥ threshold.

    Brute-force all-pairs (the exact baseline — the LSH bucket join below is
    the scale path): self cross-join upper triangle, in-JVM dot products.
    Output: (vec_a, vec_b, cosine) with cosine rounded to 6dp so the value
    is insensitive to summation-order float noise across engines.
    """
    a = corpus.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("a_vec"))
    b = corpus.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("b_vec"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("a_vec"), F.col("b_vec"))
                / (_norm(F.col("a_vec")) * _norm(F.col("b_vec"))),
                6,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize the corpus into clusters,
    probe only the query's ``n_probe`` nearest clusters.

    Deterministic spec (so an exact SQL oracle can replicate it):
    - centroids = the ``n_centroids`` corpus vectors with the smallest ids
      (at scale you'd train KMeans once and persist the codebook; the
      assignment/probe dataflow below is identical either way);
    - each corpus vector is assigned to its max-cosine centroid (ties →
      smaller centroid id);
    - a query probes its ``n_probe`` top-cosine centroids and ranks exact
      cosine within the probed clusters only.

    Scale shape: the centroid set is tiny → broadcast on both the assignment
    and probe joins, so the only shuffle is the candidate equi-join on
    ``cluster`` (vs cosine_topk's corpus×queries cross join).  Persisting the
    corpus bucketed by ``cluster`` turns the probe into a partition-pruned
    scan of n_probe/n_centroids of the data.
    Output schema matches cosine_topk: (query_id, neighbor_id, rank).
    """
    cents = F.broadcast(
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec"))
    )

    def _nearest(df: DataFrame, out: str, keep: int) -> DataFrame:
        scored = df.crossJoin(cents).withColumn(
            "cent_cos",
            _dot(F.col("_vec"), F.col("cent_vec"))
            / (_norm(F.col("_vec")) * _norm(F.col("cent_vec"))),
        )
        w = Window.partitionBy("_id").orderBy(F.desc("cent_cos"), "cent_id")
        return (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= keep)
            .select("_id", "_vec", F.col("cent_id").alias(out))
        )

    c = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
    assigned = _nearest(c, "cluster", 1).select(
        F.col("_id").alias("neighbor_id"), F.col("_vec").alias("c_vec"), "cluster"
    )
    q = queries.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
    probed = _nearest(q, "cluster", n_probe).select(
        F.col("_id").alias("query_id"), F.col("_vec").alias("q_vec"), "cluster"
    )

    sim = (
        assigned.join(probed, "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(F.col("q_vec"), F.col("c_vec"))
            / (_norm(F.col("q_vec")) * _norm(F.col("c_vec"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float).tolist()


def _lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id: bit p set iff dot(vec, plane_p) > 0."""
    bits = [
        F.when(
            _dot(vec, F.array(*[F.lit(float(x)) for x in plane])) > 0,
            F.lit(1 << p),
        ).otherwise(0)
        for p, plane in enumerate(planes)
    ]
    return sum(bits).cast("int")


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: compare only within the query's hyperplane bucket.

    2^n_planes buckets; the candidate join is an equi-join on bucket — at
    scale this replaces the O(N·Q) cross join with O(N·Q/2^p) expected work.
    Output schema matches cosine_topk (rank may differ from exact — it's ANN).
    """
    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
    ).withColumn("bucket", _lsh_bucket(F.col("c_vec"), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("bucket", _lsh_bucket(F.col("q_vec"), planes))
    sim = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(F.col("q_vec"), F.col("c_vec"))
            / (_norm(F.col("q_vec")) * _norm(F.col("c_vec"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
