"""Unit tests for operators/graph.py on hand-built graphs — the oracle
mirror proves engine agreement; these prove the algorithms against known
closed-form answers."""

import pytest
from pyspark.sql import functions as F

from open_bus_siri_etl_spark.operators.graph import (
    RANK_SCALE,
    cooccurrence_edges,
    degrees,
    orient_by_degree,
    pagerank,
    triangles,
)


def edge_df(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "u1 bigint, u2 bigint"
    ).distinct()


def test_triangles_k4(spark):
    """K4 has C(4,3) = 4 triangles."""
    k4 = edge_df(spark, [(a, b) for a in range(4) for b in range(a + 1, 4)])
    row = triangles(k4).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (4, 6, 4)


def test_triangles_path_and_star_are_zero(spark):
    path = edge_df(spark, [(0, 1), (1, 2), (2, 3)])
    assert triangles(path).collect()[0].n_triangles == 0
    star = edge_df(spark, [(0, i) for i in range(1, 6)])
    assert triangles(star).collect()[0].n_triangles == 0


def test_triangles_two_shared_edge(spark):
    """Two triangles sharing an edge: (0,1,2) and (0,1,3)."""
    g = edge_df(spark, [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)])
    assert triangles(g).collect()[0].n_triangles == 2


def test_orientation_is_acyclic_total(spark):
    """Every edge appears exactly once in the oriented DAG."""
    g = edge_df(spark, [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3), (2, 4)])
    assert orient_by_degree(g).count() == g.count()


def test_pagerank_symmetric_graph_equal_ranks(spark):
    """On a vertex-transitive graph (a cycle) every vertex has the same
    rank, and total mass stays ~n * RANK_SCALE (floor-division loss only)."""
    n = 6
    cycle = edge_df(spark, [(i, (i + 1) % n) for i in range(n)])
    rows = pagerank(cycle, iterations=3).collect()
    ranks = {r.u: r.r for r in rows}
    assert len(set(ranks.values())) == 1
    total = sum(ranks.values())
    assert n * RANK_SCALE - 1000 <= total <= n * RANK_SCALE


def test_pagerank_hub_outranks_leaves(spark):
    star = edge_df(spark, [(0, i) for i in range(1, 6)])
    ranks = {r.u: r.r for r in pagerank(star, iterations=3).collect()}
    assert ranks[0] > max(ranks[i] for i in range(1, 6))


def test_cooccurrence_edges_blocks(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "c")],
        "k bigint, blk string",
    )
    e = cooccurrence_edges(df, "k", "blk").collect()
    got = {(r.u1, r.u2) for r in e}
    assert got == {(1, 2), (1, 3), (2, 3), (4, 5)}


def test_degrees(spark):
    g = edge_df(spark, [(0, 1), (0, 2), (1, 2), (0, 3)])
    d = {r.u: r.d for r in degrees(g).collect()}
    assert d == {0: 3, 1: 2, 2: 2, 3: 1}


# -- histogram quantile sketch: the mergeability proof --------------------


def test_histogram_sketch_merges_exactly(spark):
    """The defining sketch property: hist(A ∪ B) == merge(hist(A), hist(B))
    — so per-shard histograms combine without re-reading raw rows."""
    from open_bus_siri_etl_spark.operators.sketches import (
        histogram_bins,
        merge_histograms,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = ev.filter("event_id % 2 = 0")
    b = ev.filter("event_id % 2 = 1")
    merged = {
        r.bin: r.c
        for r in merge_histograms(
            histogram_bins(a, "value"), histogram_bins(b, "value")
        ).collect()
    }
    whole = {r.bin: r.c for r in histogram_bins(ev, "value").collect()}
    assert merged == whole


def test_pagerank_no_int64_wrap_at_huge_rank_scale(spark, monkeypatch):
    """Contribution sums are aggregated in DECIMAL(38,0): with RANK_SCALE
    pushed to 10^18 the damping product 85 * sum(contrib) exceeds int64
    (8.5e19 > 9.2e18) on a 2-regular graph, which silently wrapped when the
    sum stayed bigint.  On a cycle the exact stationary point is preserved:
    every rank must remain exactly RANK_SCALE after any number of
    iterations (contrib = S/2 per side, 0.15*S + 0.85*S = S)."""
    import open_bus_siri_etl_spark.operators.graph as G

    monkeypatch.setattr(G, "RANK_SCALE", 10**18)
    n = 4
    cycle = edge_df(spark, [(i, (i + 1) % n) for i in range(n)])
    ranks = {r.u: r.r for r in G.pagerank(cycle, iterations=2).collect()}
    assert ranks == {i: 10**18 for i in range(n)}
