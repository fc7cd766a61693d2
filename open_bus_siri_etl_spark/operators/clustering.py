"""Distributed k-means over an embedding column (beyond-reference,
training-data surface): the iterative-algorithm pattern done Spark-first.

Lloyd's algorithm maps onto Spark the same way MLlib implements it:
centroids are tiny driver state broadcast into each assignment pass; the
heavy work — one distance evaluation per (vector, centroid) and the
per-cluster mean — is a single scan plus one aggregation per iteration.
Nothing iterates per row in Python on the small-k path: assignment is an
in-JVM array expression, the mean is posexplode + avg (k x dim grouped
rows, i.e. aggregation state is centroid-sized, not data-sized).

Two assignment kernels, one contract:
- ``expr`` (k below ~32): a per-centroid zip_with/aggregate expression list,
  fully whole-stage-codegen.  Codegen cost grows with k (one expression
  tree per centroid), so past a few dozen centroids the JVM spends more
  time compiling than computing.
- ``matmul`` (large k): one Arrow batch per partition through mapInPandas,
  distances accumulated in numpy as a sequential fold over dimensions —
  the SAME left-to-right float64 addition order as the expr kernel's
  aggregate(), so pre-round distances are bit-identical and the two
  kernels (and the DuckDB oracle) agree exactly.  A production kernel
  would use the |x|^2 - 2x.c + |c|^2 BLAS expansion for another ~10x; that
  reorders float summation and is deliberately NOT used here so the
  determinism contract holds.

Determinism contract (shared with the fixed-iteration DuckDB oracle):
- init = the k vectors with the smallest ids (no RNG);
- distances and updated centroid coordinates round to 6 dp each
  iteration, so float summation order can never flip an argmin across
  engines/partitionings;
- argmin ties break toward the smaller centroid id (first index of the
  array minimum);
- a cluster that loses all members keeps its previous centroid.

Scale: k*dim doubles per iteration cross the driver (kilobytes); the scan
per iteration parallelizes on input splits.  The matmul kernel ships the
centroid matrix inside the serialized closure (k*dim*8 bytes — fine to
~10^6 cells; beyond that, a SparkContext.broadcast handle).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

#: kernel auto-switch point: above this k the codegen'd expression list is
#: slower to compile than the Arrow kernel is to run
EXPR_KERNEL_MAX_K = 16


def _assign_expr(vecd: DataFrame, cents: list[list[float]], id_col: str) -> DataFrame:
    """Small-k kernel: one codegen'd distance expression per centroid."""

    def dist_to(cent: list[float]):
        diff = F.zip_with(
            "v", F.array(*[F.lit(c) for c in cent]), lambda a, b: (a - b) * (a - b)
        )
        return F.round(
            F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x), 6
        )

    d = F.array(*[dist_to(c) for c in cents])
    return vecd.withColumn("d", d).select(
        id_col,
        "v",
        (F.array_position(F.col("d"), F.array_min("d")) - 1)
        .cast("int")
        .alias("cluster"),
    )


def _assign_matmul(vecd: DataFrame, cents: list[list[float]], id_col: str) -> DataFrame:
    """Large-k kernel: Arrow-batched numpy distance matrix per partition.

    Float parity with _assign_expr: the fold over dimensions is sequential
    (acc += (x_j - c_j)^2 for j = 0..dim-1), matching aggregate()'s
    left-to-right order bit-for-bit; rounding is half-up on the binary
    double (floor(x*1e6 + 0.5)/1e6 — distances are non-negative), matching
    what both engines' round() computes on these values.  np.argmin takes
    the first minimum, matching array_position(array_min) ties-to-smaller.
    """
    import numpy as np

    cmat = [list(map(float, c)) for c in cents]
    id_field = vecd.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField(id_field.name, id_field.dataType),
            T.StructField("v", T.ArrayType(T.DoubleType())),
            T.StructField("cluster", T.IntegerType()),
        ]
    )

    def assign(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        C = np.asarray(cmat, dtype=np.float64)  # k x dim
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(pdf["v"].tolist(), dtype=np.float64)  # n x dim
            acc = np.zeros((len(pdf), C.shape[0]), dtype=np.float64)
            for j in range(C.shape[1]):  # sequential fold = expr-kernel order
                dj = X[:, j][:, None] - C[:, j][None, :]
                acc += dj * dj
            d = np.floor(acc * 1e6 + 0.5) / 1e6
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "v": pdf["v"],
                    "cluster": np.argmin(d, axis=1).astype("int32"),
                }
            )

    return vecd.mapInPandas(assign, schema=out_schema)


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "auto",
) -> DataFrame:
    """Assign each vector to a k-means cluster after ``iters`` Lloyd steps.

    Returns (id_col, cluster int).  ``kernel`` is ``auto`` (expr below
    EXPR_KERNEL_MAX_K, matmul above), ``expr`` or ``matmul``; both satisfy
    the module's determinism contract and return identical assignments.
    """
    if kernel == "auto":
        kernel = "expr" if k <= EXPR_KERNEL_MAX_K else "matmul"
    assign_fn = {"expr": _assign_expr, "matmul": _assign_matmul}[kernel]

    vecd = df.select(
        id_col, F.transform(vec_col, lambda x: x.cast("double")).alias("v")
    )
    cents = [r["v"] for r in vecd.orderBy(id_col).limit(k).collect()]
    dim = len(cents[0])

    assign = None
    for it in range(iters):
        assign = assign_fn(vecd, cents, id_col)
        if it < iters - 1:
            rows = (
                assign.select("cluster", F.posexplode("v").alias("i", "val"))
                .groupBy("cluster", "i")
                .agg(F.round(F.avg("val"), 6).alias("m"))
                .collect()
            )
            got = {(r["cluster"], r["i"]): r["m"] for r in rows}
            cents = [
                [got.get((c, i), cents[c][i]) for i in range(dim)]
                for c in range(k)
            ]
    return assign.select(id_col, "cluster")


def kmeans_ivf_topk(
    corpus: DataFrame,
    query_ids: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """IVF top-k with a TRAINED coarse quantizer — the kmeans codebook
    replaces the lowest-id stand-in the rest of the ANN family uses for
    oracle brevity.  This is the shape real deployments run (FAISS
    trains IndexIVF's quantizer with kmeans): candidate generation is an
    equi-join on the TRAINED cluster id, so candidate quality follows the
    data's actual geometry instead of an arbitrary seed set, and because
    ``kmeans_assign`` is deterministic (min-id init, 6dp-rounded
    distances/means, min-index ties) the trained index still carries an
    exact cross-engine oracle — iterative training and oracle-exactness
    compose.

    n_probe = 1 by construction: queries are corpus rows (pass their ids
    in ``query_ids``) and probe their own trained cluster via the shared
    assignment — one kmeans pass covers both sides.  Out-of-sample
    queries would assign against the trained centroids (driver state,
    kilobytes) with the same kernel.

    Scale shape: training is ``iters`` scans with centroid-sized driver
    state; the candidate join is cluster-keyed (bucket/partition by
    cluster in production); the exact re-rank touches only candidate
    pairs; the top-k window is per-query.  Output: (query_id,
    neighbor_id, rank) — rank 1..k by exact cosine desc, ties to the
    smaller neighbor id, self-matches excluded (the cosine_topk/ivf_topk
    contract).
    """
    from .similarity import _dot, _norm

    asg = kmeans_assign(corpus, n_clusters, iters, id_col, vec_col)
    q = asg.join(
        F.broadcast(query_ids.select(id_col)), id_col, "left_semi"
    ).select(F.col(id_col).alias("query_id"), "cluster")
    cand = (
        F.broadcast(q)
        .join(asg.select(F.col(id_col).alias("neighbor_id"), "cluster"), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )
    qv = corpus.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    sim = (
        cand.join(F.broadcast(qv.join(
            F.broadcast(query_ids.select(F.col(id_col).alias("query_id"))),
            "query_id", "left_semi",
        )), "query_id")
        .join(cv, "neighbor_id")
        .withColumn(
            "cosine",
            _dot(F.col("q_vec"), F.col("c_vec"), dim)
            / (_norm(F.col("q_vec"), dim) * _norm(F.col("c_vec"), dim)),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
