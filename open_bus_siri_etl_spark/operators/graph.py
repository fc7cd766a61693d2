"""Distributed graph operators: co-occurrence edge building, degree-oriented
triangle counting, and fixed-point integer PageRank.

These are the iterative/combinatorial representatives of the catalog
(`triangle_count`, `pagerank_error_graph` delegate here); the library form
takes an arbitrary undirected edge DataFrame so the algorithms are testable
on hand-built graphs and reusable on any key pair.

Scale notes:
- Triangle counting uses the degree-orientation trick: each undirected edge
  is directed from its lower-(degree, id) endpoint, which bounds every
  out-degree by O(sqrt(|E|)) on ANY graph — a power-law hub with 10^6
  neighbors yields ~|E| oriented wedges instead of 10^12 naive ones.
- PageRank is bulk-synchronous: per iteration, edges join ranks on the
  vertex key and contributions partial-sum before the vertex shuffle;
  degree rides the edge list (joined once).  Ranks are scaled integers
  (10^12 per node) with floor-division damping so results are bit-identical
  regardless of aggregation order — what lets an iterative algorithm keep a
  hash-exact cross-engine oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RANK_SCALE = 10**12


def cooccurrence_edges(df: DataFrame, key: str, block: str) -> DataFrame:
    """Undirected edges (u1 < u2) between keys sharing a block value.

    Self-join on the block key: at scale a hot block produces |block|^2
    pairs — the caller chooses blocks accordingly (hours, buckets), the
    same contract as every LSH/banding candidate generator in this repo.
    """
    b = df.select(F.col(key).alias("u1"), F.col(block).alias("_b")).distinct()
    b2 = b.select(F.col("u1").alias("u2"), F.col("_b").alias("_b2"))
    return (
        b.join(b2, (F.col("_b") == F.col("_b2")) & (F.col("u1") < F.col("u2")))
        .select("u1", "u2")
        .distinct()
    )


def degrees(edges: DataFrame) -> DataFrame:
    """Per-vertex degree of an undirected (u1 < u2) edge list."""
    return (
        edges.select(F.col("u1").alias("u"))
        .unionAll(edges.select(F.col("u2").alias("u")))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("d"))
    )


def orient_by_degree(edges: DataFrame) -> DataFrame:
    """Direct each undirected edge from its lower-(degree, id) endpoint.

    The resulting DAG's max out-degree is O(sqrt(|E|)): a vertex with
    out-degree k has k neighbors of degree >= its own, so degree >= k for
    k+1 vertices -> k(k+1) <= 2|E|.
    """
    deg = degrees(edges)
    d1 = deg.select(F.col("u").alias("u1"), F.col("d").alias("deg1"))
    d2 = deg.select(F.col("u").alias("u2"), F.col("d").alias("deg2"))
    lower_first = (F.col("deg1") < F.col("deg2")) | (
        (F.col("deg1") == F.col("deg2")) & (F.col("u1") < F.col("u2"))
    )
    return (
        edges.join(d1, "u1")
        .join(d2, "u2")
        .select(
            F.when(lower_first, F.col("u1")).otherwise(F.col("u2")).alias("src"),
            F.when(lower_first, F.col("u2")).otherwise(F.col("u1")).alias("dst"),
        )
    )


def triangles(edges: DataFrame) -> DataFrame:
    """Exact triangle count of an undirected (u1 < u2) edge list.

    Wedges are enumerated only between OUT-edges of the oriented DAG and
    closed with a LEFT SEMI join against the canonical edge set; each
    triangle has exactly one apex with two out-edges, so each is counted
    once.  Returns one row: (n_nodes, n_edges, n_triangles).
    """
    oriented = orient_by_degree(edges)
    o2 = oriented.select(F.col("src").alias("src2"), F.col("dst").alias("dst2"))
    wedges = oriented.join(
        o2, (F.col("src") == F.col("src2")) & (F.col("dst") < F.col("dst2"))
    ).select(F.col("dst").alias("wu1"), F.col("dst2").alias("wu2"))
    tri = wedges.join(
        edges,
        (F.col("wu1") == F.col("u1")) & (F.col("wu2") == F.col("u2")),
        "left_semi",
    )
    n_nodes = degrees(edges).count()
    n_edges = edges.count()
    return tri.agg(
        F.lit(n_nodes).cast("bigint").alias("n_nodes"),
        F.lit(n_edges).cast("bigint").alias("n_edges"),
        F.count(F.lit(1)).alias("n_triangles"),
    )


def pagerank(edges: DataFrame, iterations: int = 3, damping_pct: int = 85) -> DataFrame:
    """Fixed-point integer PageRank over an undirected (u1 < u2) edge list.

    Ranks start at RANK_SCALE per vertex; each iteration distributes
    ``rank div degree`` along every incident edge and damps with integer
    arithmetic: ``new = (100-damping_pct)% * RANK_SCALE + (damping_pct *
    sum(contribs)) div 100``.  Every vertex of the edge list has degree
    >= 1, so no dangling-mass term is needed.  Returns (u, rank_scaled).

    Contributions are summed in DECIMAL(38,0) before damping: with int64
    the product ``damping_pct * sum(contrib)`` silently wraps once a hub's
    incoming contribution sum passes ~1.08e17 (roughly 10^5 full-rank
    neighbors), while the DuckDB oracle widens BIGINT sums to HUGEINT and
    stays exact.  Decimal keeps both engines exact to 38 digits, which
    covers any graph whose vertex count fits in an int64.
    """
    dirs = edges.select(F.col("u1").alias("src"), F.col("u2").alias("dst")).unionAll(
        edges.select(F.col("u2").alias("src"), F.col("u1").alias("dst"))
    )
    deg = dirs.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    e = dirs.join(deg, "src").select("src", "dst", "d")
    base = (100 - damping_pct) * RANK_SCALE // 100
    ranks = deg.select(
        F.col("src").alias("u"), F.lit(RANK_SCALE).cast("bigint").alias("r")
    )
    for _ in range(iterations):
        ranks = (
            e.join(ranks, e.src == ranks.u)
            .select(F.col("dst"), F.expr("r div d").alias("contrib"))
            .groupBy("dst")
            .agg(
                (
                    F.lit(base).cast("bigint")
                    + F.expr(
                        f"cast(({damping_pct} * sum(cast(contrib as decimal(38,0))))"
                        " div 100 as bigint)"
                    )
                ).alias("r")
            )
            .select(F.col("dst").alias("u"), "r")
        )
    return ranks
