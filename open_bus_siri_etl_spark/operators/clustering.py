"""Distributed k-means over an embedding column (beyond-reference,
training-data surface): the iterative-algorithm pattern done Spark-first.

Lloyd's algorithm maps onto Spark the same way MLlib implements it:
centroids are tiny driver state broadcast into each assignment pass; the
heavy work — one distance evaluation per (vector, centroid) and the
per-cluster mean — is a single scan plus one aggregation per iteration.
Nothing iterates per row in Python: assignment is an in-JVM array
expression, the mean is posexplode + avg (k x dim grouped rows, i.e.
aggregation state is centroid-sized, not data-sized).

Determinism contract (shared with the fixed-iteration DuckDB oracle):
- init = the k vectors with the smallest ids (no RNG);
- distances and updated centroid coordinates round to 6 dp each
  iteration, so float summation order can never flip an argmin across
  engines/partitionings;
- argmin ties break toward the smaller centroid id (first index of the
  array minimum);
- a cluster that loses all members keeps its previous centroid.

Scale: k*dim doubles per iteration cross the driver (kilobytes); the scan
per iteration parallelizes on input splits.  For large k the per-centroid
expression list should switch to the blocked numpy matmul kernel used by
similarity.cosine_near_pairs_blocked — same contract, one Arrow batch per
partition (not needed at k=8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to a k-means cluster after ``iters`` Lloyd steps.

    Returns (id_col, cluster int).  See module docstring for the
    determinism contract that makes this oracle-comparable.
    """
    vecd = df.select(
        id_col, F.transform(vec_col, lambda x: x.cast("double")).alias("v")
    )
    cents = [r["v"] for r in vecd.orderBy(id_col).limit(k).collect()]
    dim = len(cents[0])

    def dist_to(cent: list[float]):
        diff = F.zip_with(
            "v", F.array(*[F.lit(c) for c in cent]), lambda a, b: (a - b) * (a - b)
        )
        return F.round(
            F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x), 6
        )

    assign = None
    for it in range(iters):
        d = F.array(*[dist_to(c) for c in cents])
        assign = vecd.withColumn("d", d).select(
            id_col,
            "v",
            (F.array_position(F.col("d"), F.array_min("d")) - 1)
            .cast("int")
            .alias("cluster"),
        )
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
