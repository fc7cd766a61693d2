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
    """Small-k kernel: the k distance expressions evaluated from ONE
    nested-array centroid literal + transform (r14: k unrolled
    per-centroid literal trees — k x dim Literal nodes plus k copies of
    the fold — dominated catalyst analysis on the trained builds, the
    same finding the PQ-encode inline made; the compact form is ONE
    literal + one lambda tree).  Arithmetic is element-wise identical:
    zip_with pairs the same doubles, the fold adds in the same order,
    the 6dp round is unchanged, so assignments are bit-equal to the
    historical per-centroid form (kernel parity tests)."""
    cmat = F.lit([[float(x) for x in c] for c in cents])
    d = F.transform(
        cmat,
        lambda cent: F.round(
            F.aggregate(
                F.zip_with("v", cent, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ),
    )
    return vecd.withColumn("d", d).select(
        id_col,
        "v",
        (F.array_position(F.col("d"), F.array_min("d")) - 1)
        .cast("int")
        .alias("cluster"),
    )


def _assign_matmul(
    vecd: DataFrame,
    cents: list[list[float]],
    id_col: str,
    emit_vec: bool = True,
) -> DataFrame:
    """Large-k kernel: Arrow-batched numpy distance matrix per partition.

    Float parity with _assign_expr: the fold over dimensions is sequential
    (acc += (x_j - c_j)^2 for j = 0..dim-1), matching aggregate()'s
    left-to-right order bit-for-bit; rounding is half-up on the binary
    double (floor(x*1e6 + 0.5)/1e6 — distances are non-negative), matching
    what both engines' round() computes on these values.  np.argmin takes
    the first minimum, matching array_position(array_min) ties-to-smaller.

    ``emit_vec=False`` (r14): callers that only need (id, cluster) — the
    final ``kmeans_assign`` pass — skip re-serializing the vector column
    back across the Arrow boundary; Spark cannot prune columns INSIDE a
    mapInPandas, so the pruning must happen in the declared output schema.
    """
    import numpy as np

    cmat = [list(map(float, c)) for c in cents]
    id_field = vecd.schema[id_col]
    fields = [T.StructField(id_field.name, id_field.dataType)]
    if emit_vec:
        fields.append(T.StructField("v", T.ArrayType(T.DoubleType())))
    fields.append(T.StructField("cluster", T.IntegerType()))
    out_schema = T.StructType(fields)

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
            out = {id_col: pdf[id_col].to_numpy()}
            if emit_vec:
                out["v"] = pdf["v"]
            out["cluster"] = np.argmin(d, axis=1).astype("int32")
            yield pd.DataFrame(out)

    return vecd.mapInPandas(assign, schema=out_schema)


def _partial_sums_matmul(vecd: DataFrame, cents: list[list[float]]) -> DataFrame:
    """Training-only fused kernel (r14, guide §2.3 'aggregate before you
    shuffle'): assign AND partially reduce in one Arrow pass, emitting per
    partition at most k rows of (cluster, n, s=Σx) instead of shipping
    every (id, v, cluster) row back to the JVM and posexploding n x dim
    rows into the mean aggregation.  The JVM-side mean over these partials
    is sum(s_i)/sum(n) per coordinate — the same total in a different
    float-addition order, absorbed by the contract's 6dp rounding exactly
    like the engine-vs-oracle order difference already is (parity of the
    final assignments is pinned by the catalog oracle at both SFs and by
    tests/test_training_ops.py kernel-parity cases).

    Distance/argmin float discipline is byte-identical to _assign_matmul
    (sequential fold, 6dp half-up, first-min ties).
    """
    import numpy as np

    cmat = [list(map(float, c)) for c in cents]
    out_schema = T.StructType(
        [
            T.StructField("cluster", T.IntegerType()),
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
        ]
    )

    def psums(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        C = np.asarray(cmat, dtype=np.float64)  # k x dim
        k, dim = C.shape
        S = np.zeros((k, dim), dtype=np.float64)
        N = np.zeros(k, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(pdf["v"].tolist(), dtype=np.float64)  # n x dim
            acc = np.zeros((len(pdf), k), dtype=np.float64)
            for j in range(dim):  # sequential fold = expr-kernel order
                dj = X[:, j][:, None] - C[:, j][None, :]
                acc += dj * dj
            d = np.floor(acc * 1e6 + 0.5) / 1e6
            cl = np.argmin(d, axis=1)
            for c in np.unique(cl):
                m = cl == c
                S[c] += X[m].sum(axis=0)
                N[c] += int(m.sum())
        nz = np.nonzero(N)[0]
        if len(nz):
            yield pd.DataFrame(
                {
                    "cluster": nz.astype("int32"),
                    "n": N[nz],
                    "s": [S[c].tolist() for c in nz],
                }
            )

    return vecd.select("v").mapInPandas(psums, schema=out_schema)


def _resolve_kernel(k: int, kernel: str):
    if kernel == "auto":
        kernel = "expr" if k <= EXPR_KERNEL_MAX_K else "matmul"
    return {"expr": _assign_expr, "matmul": _assign_matmul}[kernel]


def _train_centroids(
    vecd: DataFrame, k: int, iters: int, id_col: str, assign_fn
) -> list[list[float]]:
    """The Lloyd training loop as driver state: init = the ``k`` vectors
    with the smallest ids, then ``iters - 1`` assign→mean updates (the
    centroids RETURNED are the ones the final assignment pass uses, so
    ``assign_fn(vecd, result)`` == ``kmeans_assign``'s output).  6dp
    rounding on updated coordinates and per-coordinate carry-forward for
    emptied clusters keep the result oracle-exact (module contract)."""
    cents = [r["v"] for r in vecd.orderBy(id_col).limit(k).collect()]
    if len(cents) < k:
        raise ValueError(
            f"kmeans: k={k} but the input has only {len(cents)} rows — "
            "min-id init needs k distinct vectors (a streaming trainer's "
            "FIRST batch must carry at least max(n_centroids, "
            "pq_centroids) rows; this is the trained-path twin of the "
            "frozen-codebook undersize guard)"
        )
    dim = len(cents[0])
    for _ in range(iters - 1):
        # r14 (matmul kernel) / r15 (ALL kernel sizes): fused
        # assign+partial-sum Arrow pass — the update's aggregation input
        # is (#partitions x k) partial rows instead of an n x dim
        # posexplode (a dim-fold row explosion through the partial agg's
        # input pipeline), and the vector column never crosses the
        # Python->JVM boundary a second time (guide §2.3, §4.1).
        # Distances/argmin inside the kernel are bit-identical to
        # _assign_expr (kernel parity tests); sum(s)/sum(n) == avg(val)
        # up to float order, which the module contract's 6dp rounding
        # absorbs (measured identical on the testdata corpora; pinned by
        # the catalog oracle at both SFs).  The expr kernel remains the
        # ASSIGNMENT path — codegen'd, no Python boundary — for
        # kmeans_assign callers and the final pass.
        rows = (
            _partial_sums_matmul(vecd, cents)
            .select("cluster", "n", F.posexplode("s").alias("i", "val"))
            .groupBy("cluster", "i")
            .agg(F.round(F.sum("val") / F.sum("n"), 6).alias("m"))
            .collect()
        )
        got = {(r["cluster"], r["i"]): r["m"] for r in rows}
        cents = [
            [got.get((c, i), cents[c][i]) for i in range(dim)]
            for c in range(k)
        ]
    return cents


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
    assign_fn = _resolve_kernel(k, kernel)
    vecd = df.select(
        id_col, F.transform(vec_col, lambda x: x.cast("double")).alias("v")
    )
    cents = _train_centroids(vecd, k, iters, id_col, assign_fn)
    if assign_fn is _assign_matmul:
        # r14: the caller only needs (id, cluster) — don't re-serialize the
        # vector column out of the Arrow kernel (schema-level pruning; a
        # .select after mapInPandas cannot prune inside the Python worker)
        return _assign_matmul(vecd, cents, id_col, emit_vec=False)
    return assign_fn(vecd, cents, id_col).select(id_col, "cluster")


#: The measured serving default for the deployable IVF-PQ stack (trained
#: coarse + residual PQ + exact refine) — the KNEE of the recall/cost
#: frontier swept in tools/bench_ivfpq_frontier.py on the 300k
#: topic-structured corpus (BENCH_IVFPQ_FRONTIER.json, which a test pins
#: this dict against): the cheapest (n_probe, refine_k) clearing
#: recall@10 >= 0.9.  n_probe is meaningful relative to n_centroids
#: (pruning fraction n_probe/n_centroids); refine_k is the ADC shortlist
#: the exact re-rank touches corpus vectors for — its cost is one
#: broadcast-id-join corpus pass regardless of k.
IVF_PQ_SERVING_DEFAULTS = {
    "n_centroids": 256,
    "n_probe": 4,
    "refine_k": 400,
    "recall_bar": 0.9,
}

_CODEBOOK_SCHEMA = "cent_rank int, cent_id bigint, cent_vec array<double>"


def kmeans_codebook(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "auto",
) -> DataFrame:
    """The TRAINED kmeans centroids as a frozen-codebook frame
    (cent_rank, cent_id, cent_vec) — drop-in for ``ivf_pq_centroids``'
    lowest-id stand-in wherever the ANN family takes a ``cents`` frame
    (``build_ivf_pq_index`` / ``ivf_pq_topk_serve`` with
    ``coarse_metric="l2"``), so the persisted IVF-PQ index can carry a
    REAL quantizer.  ``cent_id`` is the cluster index (0..k-1): assigning
    a corpus row against this frame by 6dp-rounded L2 with min-cent_id
    ties reproduces ``kmeans_assign``'s output exactly, which is what
    keeps the trained index oracle-exact.  The centroids are the ones the
    FINAL assignment pass uses (after ``iters - 1`` mean updates) —
    kilobytes of driver state, persisted next to the index like the
    stand-in codebook."""
    assign_fn = _resolve_kernel(k, kernel)
    vecd = df.select(
        id_col, F.transform(vec_col, lambda x: x.cast("double")).alias("v")
    )
    cents = _train_centroids(vecd, k, iters, id_col, assign_fn)
    rows = [(c + 1, c, [float(x) for x in cents[c]]) for c in range(k)]
    return df.sparkSession.createDataFrame(rows, _CODEBOOK_SCHEMA)


def kmeans_subspace_codebook(
    df: DataFrame,
    n_sub: int = 4,
    sub_dim: int = 16,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "auto",
) -> DataFrame:
    """TRAINED product-quantizer codebook: one independent kmeans per
    subspace (FAISS trains IndexPQ exactly this way), returned as ONE
    (cent_rank, cent_id, cent_vec) frame where ``cent_vec`` for cluster
    ``c`` is the CONCATENATION over subspaces of that subspace's c-th
    trained centroid.  The concatenated layout is what makes the trained
    fine quantizer a drop-in for the stand-in one: ``_pq_code_long`` /
    ``_pq_query_table`` slice ``cent_vec`` per subspace, so slicing the
    concatenation yields exactly the per-subspace trained centroid.
    Each subspace's kmeans inherits the module determinism contract
    (min-id init on the subvector slices, 6dp rounding, min-index ties,
    per-coordinate carry-forward), so PQ codes stay oracle-exact.

    Training cost (r14, guide §2.3/§2.4): the n_sub Lloyd runs are FUSED
    on the expr-kernel path — ONE TakeOrdered seeds every subspace (the
    same k lowest-id rows, sliced on the driver) and each iteration is
    ONE job whose projection assigns all n_sub subspaces from a single
    scan (explode over per-subspace (m, cluster, slice) structs →
    grouped mean), instead of n_sub separate init jobs plus n_sub
    separate scan+collect jobs per iteration.  Per-subspace arithmetic
    (slice → zip_with squared diff → left-fold sum → 6dp round →
    first-min argmin → 6dp-rounded mean with carry-forward) is the
    _assign_expr/_train_centroids spec unchanged, so the trained
    centroids are identical to the unfused loop's.  Large-k subspaces
    (above EXPR_KERNEL_MAX_K) keep the per-subspace matmul-kernel loop.
    """
    if not (kernel == "expr" or (kernel == "auto" and k <= EXPR_KERNEL_MAX_K)):
        assign_fn = _resolve_kernel(k, kernel)
        per_sub: list[list[list[float]]] = []
        for m in range(n_sub):
            vecd = df.select(
                id_col,
                F.transform(
                    F.slice(vec_col, m * sub_dim + 1, sub_dim),
                    lambda x: x.cast("double"),
                ).alias("v"),
            )
            per_sub.append(_train_centroids(vecd, k, iters, id_col, assign_fn))
        rows = [
            (c + 1, c, [float(x) for m in range(n_sub) for x in per_sub[m][c]])
            for c in range(k)
        ]
        return df.sparkSession.createDataFrame(rows, _CODEBOOK_SCHEMA)

    vecd = df.select(
        id_col, F.transform(vec_col, lambda x: x.cast("double")).alias("v")
    )
    init_rows = vecd.orderBy(id_col).limit(k).collect()
    if len(init_rows) < k:
        raise ValueError(
            f"kmeans: k={k} but the input has only {len(init_rows)} rows — "
            "min-id init needs k distinct vectors (a streaming trainer's "
            "FIRST batch must carry at least max(n_centroids, "
            "pq_centroids) rows; this is the trained-path twin of the "
            "frozen-codebook undersize guard)"
        )
    per_sub = [
        [
            [float(x) for x in r["v"][m * sub_dim : (m + 1) * sub_dim]]
            for r in init_rows
        ]
        for m in range(n_sub)
    ]
    for _ in range(iters - 1):
        per_sub = _fused_subspace_update(vecd, per_sub, n_sub, sub_dim, k)
    rows = [
        (c + 1, c, [float(x) for m in range(n_sub) for x in per_sub[m][c]])
        for c in range(k)
    ]
    return df.sparkSession.createDataFrame(rows, _CODEBOOK_SCHEMA)


def _fused_subspace_update(
    vecd: DataFrame,
    per_sub: list[list[list[float]]],
    n_sub: int,
    sub_dim: int,
    k: int,
) -> list[list[list[float]]]:
    """One Lloyd mean-update for ALL subspaces in a single scan: per
    subspace the projection computes the expr-kernel assignment over the
    slice (identical float spec to ``_assign_expr``), packages (m,
    cluster, slice) structs, explodes, and the grouped 6dp mean updates
    every (subspace, cluster, coordinate) at once.  Row volume through
    the partial agg is n_sub x sub_dim x n = dim x n — the same bytes
    the unfused loop pushed through n_sub separate jobs."""

    def dist_arr(sl, cents: list[list[float]]):
        # r14: one nested-array literal + transform per subspace instead
        # of k unrolled per-centroid trees (the _assign_expr form) — same
        # zip_with operands, same fold order, same 6dp round
        return F.transform(
            F.lit([[float(x) for x in c] for c in cents]),
            lambda cent: F.round(
                F.aggregate(
                    F.zip_with(sl, cent, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ),
        )

    branches = []
    for m in range(n_sub):
        sl = F.slice("v", m * sub_dim + 1, sub_dim)
        d = dist_arr(sl, per_sub[m])
        branches.append(
            F.struct(
                F.lit(m).alias("m"),
                (F.array_position(d, F.array_min(d)) - 1)
                .cast("int")
                .alias("cluster"),
                sl.alias("sv"),
            )
        )
    rows = (
        vecd.select(F.explode(F.array(*branches)).alias("b"))
        .select("b.m", "b.cluster", F.posexplode("b.sv").alias("i", "val"))
        .groupBy("m", "cluster", "i")
        .agg(F.round(F.avg("val"), 6).alias("mn"))
        .collect()
    )
    got = {(r["m"], r["cluster"], r["i"]): r["mn"] for r in rows}
    return [
        [
            [got.get((m, c, i), per_sub[m][c][i]) for i in range(sub_dim)]
            for c in range(k)
        ]
        for m in range(n_sub)
    ]


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
    in ``query_ids``; an id absent from the corpus raises in-plan) and
    probe their own trained cluster via the shared assignment — one
    kmeans pass covers both sides.  For query VECTORS outside the corpus
    use ``kmeans_ivf_topk_oos``, which assigns against the trained
    centroids with the same deterministic spec and supports n_probe > 1.

    Scale shape: training is ``iters`` scans with centroid-sized driver
    state; the candidate join is cluster-keyed (bucket/partition by
    cluster in production); the exact re-rank touches only candidate
    pairs; the top-k window is per-query.  Output: (query_id,
    neighbor_id, rank) — rank 1..k by exact cosine desc, ties to the
    smaller neighbor id, self-matches excluded (the cosine_topk/ivf_topk
    contract).
    """
    from .similarity import _exact_cosine, _topk_per_query

    asg = kmeans_assign(corpus, n_clusters, iters, id_col, vec_col)
    # distinct: the left-join probe rebuild below is 1:1 only for unique
    # query ids — a duplicated id would duplicate every candidate row and
    # corrupt the top-k ranks (the old semi join deduped by construction)
    qids = query_ids.select(id_col).distinct()
    q0 = asg.join(F.broadcast(qids), id_col, "left_semi")
    # fail-loud on query ids absent from the corpus (the family's
    # _non_null_ids/_disjoint_ids_or_raise discipline): a typo'd or
    # out-of-sample id used to be silently omitted by the semi join.  The
    # probe frame is rebuilt as query_ids LEFT JOIN the broadcast matched
    # slice with a per-row raise on the unmatched branch — the probe is
    # the candidate join's broadcast build side, which must materialize
    # before any result (or empty result) is produced, so the guard
    # cannot be pruned the way a raise on a dead-end subtree can (AQE
    # empty-relation propagation skips broadcasts a join no longer needs).
    q = (
        qids.select(F.col(id_col).alias("query_id"))
        .join(
            F.broadcast(
                q0.select(F.col(id_col).alias("query_id"), "cluster")
            ),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            F.when(F.col("cluster").isNotNull(), F.col("cluster"))
            .otherwise(
                F.raise_error(
                    F.format_string(
                        "kmeans_ivf_topk: query id %s is not a corpus row "
                        "— in-sample queries pass corpus ids; use "
                        "kmeans_ivf_topk_oos for query vectors outside "
                        "the corpus",
                        F.coalesce(
                            F.col("query_id").cast("string"), F.lit("NULL")
                        ),
                    )
                )
            )
            .alias("cluster"),
        )
    )
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
            "cosine", _exact_cosine(F.col("q_vec"), F.col("c_vec"), dim)
        )
    )
    return _topk_per_query(sim, k, [F.desc("cosine")])


def kmeans_ivf_topk_oos(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    iters: int = 2,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """OUT-OF-SAMPLE trained-quantizer IVF top-k — the path
    ``kmeans_ivf_topk``'s docstring promises: ``queries`` are (id, vector)
    rows that need NOT be corpus members.  Each query assigns against the
    TRAINED centroids (kilobyte driver state via ``kmeans_codebook``) by
    6dp-rounded L2 with min-centroid-id ties — the same deterministic
    assignment spec training used, so for an in-sample vector at
    ``n_probe=1`` the probe reproduces its trained cluster — and probes
    its ``n_probe`` nearest clusters; exact cosine re-ranks candidates.

    No self-exclusion: queries are outside the corpus by contract (their
    ids live in a different namespace), so every corpus row is a valid
    neighbor.  At ``n_probe = n_clusters`` the result equals brute-force
    cosine top-k (every cluster probed, exact re-rank) — test-asserted,
    and recall rises monotonically in expectation as n_probe grows.

    Scale shape: training is ``iters`` scans with centroid-sized driver
    state; the probe is queries x k centroids (broadcast codebook);
    candidates come from ONE cluster equi-join (partition-pruned when the
    corpus is stored partitioned by cluster); the top-k window is
    per-query.  Output: (query_id, neighbor_id, rank) — rank 1..k by
    exact cosine desc, ties to the smaller neighbor id.
    """
    from .similarity import (
        _disjoint_ids_or_raise,
        _exact_cosine,
        _nearest_centroids,
        _topk_per_query,
    )

    # queries are OUTSIDE the corpus by contract — a colliding id would
    # silently return the corpus row itself as its own rank-1 neighbor
    # (no self-exclusion on this path), so enforce disjointness in-plan
    # like the delta-ingest family does
    corpus = _disjoint_ids_or_raise(
        corpus, queries, id_col, "kmeans_ivf_topk_oos"
    )
    # ONE Lloyd training drives both the corpus assignment and the
    # codebook frame (kmeans_assign + kmeans_codebook would train twice
    # for identical deterministic centroids)
    assign_fn = _resolve_kernel(n_clusters, "auto")
    vecd = corpus.select(
        id_col, F.transform(vec_col, lambda x: x.cast("double")).alias("v")
    )
    cents = _train_centroids(vecd, n_clusters, iters, id_col, assign_fn)
    asg = assign_fn(vecd, cents, id_col).select(id_col, "cluster")
    cb = corpus.sparkSession.createDataFrame(
        [(c + 1, c, [float(x) for x in cents[c]]) for c in range(n_clusters)],
        _CODEBOOK_SCHEMA,
    )
    q = queries.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
    probed = _nearest_centroids(
        q, F.broadcast(cb.select("cent_id", "cent_vec")), "cluster",
        n_probe, dim, metric="l2",
    ).select(
        F.col("_id").alias("query_id"), F.col("_vec").alias("q_vec"), "cluster"
    )
    cand = F.broadcast(probed).join(
        asg.select(
            F.col(id_col).alias("neighbor_id"),
            F.col("cluster").cast("bigint").alias("cluster"),
        ),
        "cluster",
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    sim = cand.join(cv, "neighbor_id").withColumn(
        "cosine", _exact_cosine(F.col("q_vec"), F.col("c_vec"), dim)
    )
    return _topk_per_query(sim, k, [F.desc("cosine")])


def kmeans_codebook_pair(
    df: DataFrame,
    n_centroids: int = 8,
    n_sub: int = 4,
    sub_dim: int = 16,
    pq_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Train the coarse codebook AND the subspace PQ codebook in one pass
    structure (r14, guide §1.2/§2.4): ``ivf_pq_kmeans_topk`` needs both,
    and the two independent trainers each ran their own init TakeOrdered
    plus their own per-iteration update job over the SAME corpus.  Here
    ONE TakeOrdered seeds both (the two inits are by contract the k
    lowest-id rows — full vectors for the coarse side, subspace slices of
    the same rows for the fine side) and each Lloyd iteration is ONE job:
    the coarse assignment branch (the ``_assign_expr`` spec over the full
    vector, tagged m=-1) is unioned with the per-subspace fine branches
    (the ``_fused_subspace_update`` spec verbatim) and a single grouped
    6dp mean updates every (side, cluster, coordinate) at once.  Per-side
    arithmetic is byte-identical to the independent trainers — same
    expression trees, same groups, same rounding — so the returned
    frames equal ``kmeans_codebook`` / ``kmeans_subspace_codebook``
    exactly (test-pinned; both trainings inherit the module determinism
    contract, which is also what makes merge-order float noise a
    non-event: the 6dp round absorbs it exactly as it does for the
    independent jobs).

    Falls back to the two independent trainers when either side exceeds
    the expr-kernel bound (the fused branches are codegen'd expression
    lists; large-k sides belong on the Arrow kernel instead).

    Returns ``(coarse_frame, fine_frame)`` in the
    ``(cent_rank, cent_id, cent_vec)`` codebook layout.
    """
    if n_centroids > EXPR_KERNEL_MAX_K or pq_centroids > EXPR_KERNEL_MAX_K:
        return (
            kmeans_codebook(df, n_centroids, iters, id_col, vec_col),
            kmeans_subspace_codebook(
                df, n_sub, sub_dim, pq_centroids, iters, id_col, vec_col
            ),
        )
    vecd = df.select(
        id_col, F.transform(vec_col, lambda x: x.cast("double")).alias("v")
    )
    need = max(n_centroids, pq_centroids)
    init_rows = vecd.orderBy(id_col).limit(need).collect()
    if len(init_rows) < need:
        raise ValueError(
            f"kmeans: k={need} but the input has only {len(init_rows)} "
            "rows — min-id init needs k distinct vectors (a streaming "
            "trainer's FIRST batch must carry at least max(n_centroids, "
            "pq_centroids) rows; this is the trained-path twin of the "
            "frozen-codebook undersize guard)"
        )
    dim = len(init_rows[0]["v"])
    coarse = [[float(x) for x in r["v"]] for r in init_rows[:n_centroids]]
    per_sub = [
        [
            [float(x) for x in r["v"][m * sub_dim : (m + 1) * sub_dim]]
            for r in init_rows[:pq_centroids]
        ]
        for m in range(n_sub)
    ]

    def dist_arr(sl, cents: list[list[float]]):
        # r14: one nested-array literal + transform instead of k unrolled
        # per-centroid trees — same zip_with operands, same fold order,
        # same 6dp round (the _assign_expr compact form)
        return F.transform(
            F.lit([[float(x) for x in c] for c in cents]),
            lambda cent: F.round(
                F.aggregate(
                    F.zip_with(sl, cent, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ),
        )

    for _ in range(iters - 1):
        branches = []
        # coarse branch, tagged m=-1: the _assign_expr spec over the full
        # vector (per-centroid zip_with squared diff -> left fold -> 6dp
        # round -> first-min argmin)
        dc = dist_arr(F.col("v"), coarse)
        branches.append(
            F.struct(
                F.lit(-1).alias("m"),
                (F.array_position(dc, F.array_min(dc)) - 1)
                .cast("int")
                .alias("cluster"),
                F.col("v").alias("sv"),
            )
        )
        for m in range(n_sub):
            sl = F.slice("v", m * sub_dim + 1, sub_dim)
            d = dist_arr(sl, per_sub[m])
            branches.append(
                F.struct(
                    F.lit(m).alias("m"),
                    (F.array_position(d, F.array_min(d)) - 1)
                    .cast("int")
                    .alias("cluster"),
                    sl.alias("sv"),
                )
            )
        rows = (
            vecd.select(F.explode(F.array(*branches)).alias("b"))
            .select("b.m", "b.cluster", F.posexplode("b.sv").alias("i", "val"))
            .groupBy("m", "cluster", "i")
            .agg(F.round(F.avg("val"), 6).alias("mn"))
            .collect()
        )
        got = {(r["m"], r["cluster"], r["i"]): r["mn"] for r in rows}
        coarse = [
            [got.get((-1, c, i), coarse[c][i]) for i in range(dim)]
            for c in range(n_centroids)
        ]
        per_sub = [
            [
                [got.get((m, c, i), per_sub[m][c][i]) for i in range(sub_dim)]
                for c in range(pq_centroids)
            ]
            for m in range(n_sub)
        ]
    coarse_rows = [
        (c + 1, c, [float(x) for x in coarse[c]]) for c in range(n_centroids)
    ]
    fine_rows = [
        (c + 1, c, [float(x) for m in range(n_sub) for x in per_sub[m][c]])
        for c in range(pq_centroids)
    ]
    return (
        df.sparkSession.createDataFrame(coarse_rows, _CODEBOOK_SCHEMA),
        df.sparkSession.createDataFrame(fine_rows, _CODEBOOK_SCHEMA),
    )


def ivf_pq_kmeans_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    n_sub: int = 4,
    sub_dim: int = 16,
    pq_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """IVF-PQ with BOTH quantizers TRAINED — the composition round 9 left
    on the table: ``kmeans_codebook`` (coarse, L2 assignment) and
    ``kmeans_subspace_codebook`` (per-subspace PQ) replace the lowest-id
    stand-in codebook in the SAME persisted-index pipeline
    (``build_ivf_pq_index`` → ``ivf_pq_topk_serve``), so the serving
    plan's scale shape is untouched (code-only index partitioned by
    cluster, DPP probe, broadcast ADC table) while the codebooks follow
    the data's actual geometry — what FAISS's train()-then-add()
    IndexIVFPQ actually ships.  Because both trainings inherit the kmeans
    determinism contract, the trained index STILL carries an exact SQL
    oracle: iterative training, compression, pruning and oracle-exactness
    all compose.

    This inline form IS the persisted pipeline run end to end (build +
    serve with the same frames), so the inline result and a
    persisted-index serve cannot drift — test-asserted like the stand-in
    family.  Output contract identical to ``ivf_pq_topk``: (query_id,
    neighbor_id, rank, adc_d2), self-matches excluded.
    """
    from .similarity import build_ivf_pq_index, ivf_pq_topk_serve

    # r14: one shared init TakeOrdered + one fused update job per Lloyd
    # iteration trains BOTH codebooks (kmeans_codebook_pair) — the two
    # independent trainers scanned the corpus twice per iteration for
    # byte-identical centroids (test-pinned equality)
    coarse, fine = kmeans_codebook_pair(
        corpus, n_centroids, n_sub, sub_dim, pq_centroids, iters,
        id_col, vec_col,
    )
    index = build_ivf_pq_index(
        corpus, n_centroids, n_sub, sub_dim, pq_centroids,
        id_col, vec_col, dim, cents=coarse, fine_cents=fine,
        coarse_metric="l2",
    )
    return ivf_pq_topk_serve(
        index, coarse, queries,
        k=k, n_centroids=n_centroids, n_probe=n_probe, n_sub=n_sub,
        sub_dim=sub_dim, pq_centroids=pq_centroids,
        id_col=id_col, vec_col=vec_col, dim=dim,
        fine_cents=fine, coarse_metric="l2",
        eager_check=False,  # same-plan frames: provenance cannot mismatch
    )


def ivf_pq_residual_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    n_sub: int = 4,
    sub_dim: int = 16,
    pq_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
):
    """RESIDUAL IVF-PQ with trained quantizers — the full FAISS
    IndexIVFPQ shape (by_residual=True, its default): the coarse kmeans
    codebook assigns cells, and PQ encodes x - centroid[cluster] with a
    fine codebook TRAINED ON THOSE RESIDUALS, so the code budget resolves
    within-cell ranking instead of re-describing the coarse structure a
    cluster id already names.  Measured on topic-structured corpora this
    is what moves ADC recall (BENCH_IVFPQ clustered_recall); on the plan
    side the only change is the ADC lookup join gaining the cluster key
    (the query re-centers per probed cluster; the distance table stays
    broadcast-sized at |Q| x n_probe x n_sub x pq_centroids).
    Deterministic end to end — residuals are exact IEEE subtractions
    against 6dp centroids — so the residual index carries an exact SQL
    oracle like every other index in the catalog.  Output contract
    identical to ivf_pq_topk."""
    from .similarity import (
        build_ivf_pq_index,
        ivf_pq_topk_serve,
        ivf_residuals,
    )

    coarse = kmeans_codebook(corpus, n_centroids, iters, id_col, vec_col)
    # r14: the residual frame feeds every fine-training action (init
    # TakeOrdered + one update job per iteration), and each re-trigger
    # recomputes the full coarse assignment — localCheckpoint materializes
    # it once (the cframe/CC lineage-control pattern; a production
    # pipeline stages residuals to parquet, as tools/bench_ivfpq.py does
    # for the 10M tier).  The serve plan's own residual encode inside
    # build_ivf_pq_index is unchanged.
    res = ivf_residuals(
        corpus, coarse, n_centroids, id_col, vec_col, dim, "l2"
    ).localCheckpoint()
    fine = kmeans_subspace_codebook(
        res, n_sub, sub_dim, pq_centroids, iters, id_col, vec_col
    )
    index = build_ivf_pq_index(
        corpus, n_centroids, n_sub, sub_dim, pq_centroids,
        id_col, vec_col, dim, cents=coarse, fine_cents=fine,
        coarse_metric="l2", residual=True,
    )
    return ivf_pq_topk_serve(
        index, coarse, queries,
        k=k, n_centroids=n_centroids, n_probe=n_probe, n_sub=n_sub,
        sub_dim=sub_dim, pq_centroids=pq_centroids,
        id_col=id_col, vec_col=vec_col, dim=dim,
        fine_cents=fine, coarse_metric="l2", residual=True,
        eager_check=False,  # same-plan frames: provenance cannot mismatch
    )


def ivf_pq_refine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 20,
    n_centroids: int = 8,
    n_probe: int = 2,
    n_sub: int = 4,
    sub_dim: int = 16,
    pq_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """IVF-PQ + EXACT REFINE — FAISS's IndexRefineFlat stage on top of
    the residual index: ADC produces a per-query SHORTLIST (top
    ``shortlist`` by approximate distance, compressed codes only), then
    exact cosine re-ranks just those candidates and returns the top
    ``k``.  This is the stage that turns ADC's lossy ordering into a
    deployment-quotable recall: the clustered-corpus measurement
    (BENCH_IVFPQ clustered_recall) recovers near the candidate-recall
    ceiling, because the refine only needs the true neighbors to be
    SOMEWHERE in the shortlist, not ADC-ranked into the top k.

    Scale shape: the refine is the ONE stage that touches corpus vectors
    — a shortlist-sized id set (|Q| x shortlist) broadcast against one
    corpus scan (broadcast hash join, never a shuffle of the corpus), so
    its cost is one pruned-column pass regardless of k or shortlist.
    Everything upstream stays code-only.  Output: (query_id, neighbor_id,
    rank) — the cosine_topk contract (rank by exact cosine desc, ties to
    the smaller neighbor id; self-matches excluded by the ADC stage).
    """
    from .similarity import _exact_cosine, _topk_per_query

    short = ivf_pq_residual_topk(
        corpus, queries, k=shortlist, n_centroids=n_centroids,
        n_probe=n_probe, n_sub=n_sub, sub_dim=sub_dim,
        pq_centroids=pq_centroids, iters=iters,
        id_col=id_col, vec_col=vec_col, dim=dim,
    ).select("query_id", "neighbor_id")
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    sim = (
        short.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn(
            "cosine", _exact_cosine(F.col("q_vec"), F.col("c_vec"), dim)
        )
    )
    return _topk_per_query(sim, k, [F.desc("cosine")])
