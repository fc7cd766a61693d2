"""Scalar quantization (SQ8) — FAISS ``IndexScalarQuantizer(QT_8bit)``
inside an IVF, re-expressed as DataFrame ops.

The third compression point on the ANN memory/recall frontier the repo
already prices (float32 exact > SQ8 > PQ): each dimension is quantized
independently to one byte against TRAINED per-dimension (min, max)
bounds, so a 64-d float32 vector stores as 64 bytes (4x smaller) while
keeping ~8 bits of per-coordinate resolution — in practice near-exact
recall, where PQ's 8-bytes-per-vector trades recall for another 8x.
This is exactly FAISS's QT_8bit contract: ``train()`` learns vmin/vdiff
per dimension, ``encode`` is an affine clamp to [0, 255], search decodes
on the fly per candidate (SIMD there, ``transform``/``zip_with`` inside
whole-stage codegen here — no Python UDF anywhere).

Determinism discipline (what keeps the approximate index oracle-exact,
the family rule from ``similarity.py``): bounds are exact min/max
aggregates (no summation), the encode rounds the scaled coordinate to
6dp BEFORE flooring so the engine boundary cannot flip a code, distances
round to 6dp before ranking, and ties go to the smaller id everywhere.

Scale shape: train is one melt + groupBy(dim) aggregate collecting
``dim`` rows to the driver (the kmeans codebook precedent — bounded by
dimensionality, never data-sized); encode is MAP-ONLY against broadcast
literal bounds; serving is the IVF probe equi-join on ``cluster`` (the
partition-prunable key) with per-candidate decode-and-score, so the
stored index carries no float vectors at all.

Reference parity: the reference ETL (open-bus-siri-etl) has no vector
search; this module belongs to the training-data operator families the
brief layers on top (SURVEY §2 scope note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import _nearest_centroids, _topk_per_query

# FAISS QT_8bit: codes are floor(x01 * 256) clamped to [0, 255], decoded
# at the cell midpoint (code + 0.5) / 256.
SQ8_LEVELS = 256


def sq8_train(
    corpus: DataFrame,
    vec_col: str = "embedding",
) -> list[tuple[float, float]]:
    """Per-dimension (min, max) bounds — FAISS QT_8bit ``train()``.

    One posexplode + groupBy(dim) min/max; the collect is bounded by the
    dimensionality (k x dim codebook-collect precedent), and min/max are
    exact aggregates so the trained bounds are engine-identical to the
    oracle's ``GROUP BY i`` CTE.
    """
    rows = (
        corpus.select(
            F.posexplode(
                F.transform(F.col(vec_col), lambda x: x.cast("double"))
            ).alias("i", "v")
        )
        .groupBy("i")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    )
    by_dim = sorted(rows, key=lambda r: r["i"])
    if [r["i"] for r in by_dim] != list(range(len(by_dim))):
        raise ValueError(
            "sq8_train: ragged embedding column — dimensions "
            f"{sorted(r['i'] for r in by_dim)} are not contiguous from 0"
        )
    return [(float(r["mn"]), float(r["mx"])) for r in by_dim]


def _bounds_arrays(bounds: list[tuple[float, float]]) -> tuple[Column, Column]:
    """Broadcast-literal (mn, span) arrays — dim doubles each, folded into
    the task binary like the kmeans centroid literals."""
    mn = F.array(*[F.lit(float(m)) for m, _ in bounds])
    span = F.array(*[F.lit(float(x) - float(m)) for m, x in bounds])
    return mn, span


def sq8_encode(
    df: DataFrame,
    bounds: list[tuple[float, float]],
    vec_col: str = "embedding",
    out: str = "sq8_code",
) -> DataFrame:
    """Map-only SQ8 encode: ``code_j = clamp(floor(round(x01_j * 256, 6)),
    0, 255)`` with ``x01_j = (v_j - mn_j) / span_j`` (0.0 on a degenerate
    constant dimension).

    The 6dp round BEFORE the floor is the engine-boundary guard: both
    engines compute the affine scale on identical IEEE operands, and the
    round collapses any last-ulp noise before the only discontinuous op.
    The max of a dimension lands exactly on 256 and clamps back to 255 —
    same as FAISS's upper-edge handling.
    """
    mn, span = _bounds_arrays(bounds)

    def _code(v: Column, j: Column) -> Column:
        m = F.element_at(mn, j + 1)
        s = F.element_at(span, j + 1)
        x01 = F.when(s == 0.0, F.lit(0.0)).otherwise(
            (v.cast("double") - m) / s
        )
        return (
            F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0), F.floor(F.round(x01 * F.lit(256.0), 6))
                ),
            )
        ).cast("int")

    return df.withColumn(out, F.transform(F.col(vec_col), _code))


def _sq8_d2_expr(
    q_col: Column,
    code_col: Column,
    bounds: list[tuple[float, float]],
    dim: int | None = None,
) -> Column:
    """The serve-side squared distance between a float query array and a
    code array, 6dp-rounded.  Two bodies, ONE value: the default is the
    compact ``transform`` + ``zip_with`` + ``aggregate`` fold; passing
    ``dim`` unrolls the same per-dimension term chain into a flat
    left-to-right sum — term math and addition order are identical
    (IEEE: both add j=1..d in sequence), so the two forms are
    bit-identical (parity-tested).  The unroll is the ``_dot(dim=...)``
    precedent applied to the decode chain — measured ~equal at the
    300k/1M tiers (the serve is scan/probe-join bound there, and Spark
    4's higher-order functions evaluate efficiently enough that the
    decode is not the bottleneck), so the knob exists for environments
    where HOF fallback binds, not as a default."""
    if dim is None:
        decoded = sq8_decode_expr(code_col, bounds)
        return F.round(
            F.aggregate(
                F.zip_with(
                    q_col,
                    decoded,
                    lambda a, b: (a.cast("double") - b)
                    * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )
    total = None
    for j in range(1, dim + 1):
        mn, mx = bounds[j - 1]
        span = float(mx) - float(mn)
        dq = F.lit(float(mn)) + (
            code_col[j - 1].cast("double") + F.lit(0.5)
        ) * F.lit(span) / F.lit(256.0)
        d = F.element_at(q_col, j).cast("double") - dq
        term = d * d
        total = term if total is None else total + term
    return F.round(total, 6)


def sq8_decode_expr(
    code_col: Column, bounds: list[tuple[float, float]]
) -> Column:
    """Midpoint decode ``mn_j + (code_j + 0.5) * span_j / 256`` as an
    array<double> expression — evaluated per candidate inside codegen, the
    decode-on-the-fly FAISS SQ search does in SIMD."""
    mn, span = _bounds_arrays(bounds)
    return F.transform(
        code_col,
        lambda c, j: F.element_at(mn, j + 1)
        + (c.cast("double") + F.lit(0.5))
        * F.element_at(span, j + 1)
        / F.lit(256.0),
    )


def _cent_vec_frame(cents: DataFrame):
    return F.broadcast(
        cents.select(
            F.col("cent_id").alias("cluster"), F.col("cent_vec").alias("_cent")
        )
    )


def sq8_residual_frame(
    corpus: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    coarse_metric: str = "cosine",
    n_cents: int | None = None,
) -> DataFrame:
    """(_id, cluster, _rvec) — each vector re-centered on its coarse
    cell, the frame residual SQ8 both TRAINS its bounds on and encodes
    (the ``ivf_residuals`` role for the scalar family).  Exact IEEE
    subtraction on identical operands in both engines."""
    return (
        _nearest_centroids(
            corpus.select(
                F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")
            ),
            cents, "cluster", keep=1, dim=dim, metric=coarse_metric,
            n_cents=n_cents,
        )
        .join(_cent_vec_frame(cents), "cluster")
        .select(
            "_id",
            "cluster",
            F.zip_with(
                "_vec", "_cent",
                lambda x, y: x.cast("double") - y.cast("double"),
            ).alias("_rvec"),
        )
    )


def build_sq8_index(
    corpus: DataFrame,
    cents: DataFrame,
    bounds: list[tuple[float, float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    coarse_metric: str = "cosine",
    n_cents: int | None = None,
    residual: bool = False,
) -> DataFrame:
    """The persisted IVF-SQ8 store: (id, cluster, sq8_code) — coarse
    assignment against ``cents`` (cosine for the lowest-id stand-in
    family, "l2" for trained ``kmeans_codebook`` frames, riding the
    matmul fast path when ``n_cents`` crosses MATMUL_ASSIGN_MIN_K) plus
    the map-only SQ8 encode.  ``residual=True`` re-centers each vector
    on its cell before encoding (FAISS IndexIVFScalarQuantizer's
    by_residual default) — ``bounds`` must then be trained on the
    residual frame (``sq8_residual_frame`` + ``sq8_train``).  Write it
    ``partitionBy("cluster")`` and the serve probe partition-prunes,
    exactly like ``build_ivf_pq_index``.  No float vectors in the
    store: 1 byte/dim + id."""
    if residual:
        res = sq8_residual_frame(
            corpus, cents, id_col, vec_col, dim, coarse_metric, n_cents
        )
        return sq8_encode(res, bounds, vec_col="_rvec", out="sq8_code").select(
            F.col("_id").alias(id_col), "cluster", "sq8_code"
        )
    assigned = _nearest_centroids(
        corpus.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")
        ),
        cents, "cluster", keep=1, dim=dim, metric=coarse_metric,
        n_cents=n_cents,
    )
    return sq8_encode(assigned, bounds, vec_col="_vec", out="sq8_code").select(
        F.col("_id").alias(id_col), "cluster", "sq8_code"
    )


def sq8_topk_serve(
    index: DataFrame,
    cents: DataFrame,
    queries: DataFrame,
    bounds: list[tuple[float, float]],
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    coarse_metric: str = "cosine",
    residual: bool = False,
) -> DataFrame:
    """Serve top-k from a persisted SQ8 store: the query batch probes its
    ``n_probe`` nearest coarse cells (tiny frame), equi-joins the store on
    ``cluster`` (partition-pruned when the store is written partitioned by
    it) and scores candidates by decode-on-the-fly squared L2 — the
    decode runs inside whole-stage codegen against broadcast literal
    bounds, no corpus float vectors anywhere in the serve plan.
    ``residual=True``: the query re-centers per probed cluster before
    scoring ((q-c)-(x-c) = q-x exactly; only the quantization grid
    moves), matching a store built with ``residual=True``.

    Output: (query_id, neighbor_id, rank, sq8_d2); self-matches excluded.
    """
    probes = _nearest_centroids(
        queries.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")
        ),
        cents,
        "cluster",
        keep=n_probe,
        dim=dim,
        metric=coarse_metric,
    )
    if residual:
        probes = probes.join(_cent_vec_frame(cents), "cluster").select(
            F.col("_id").alias("query_id"),
            "cluster",
            F.zip_with(
                "_vec", "_cent",
                lambda x, y: x.cast("double") - y.cast("double"),
            ).alias("_q_vec"),
        )
    else:
        probes = probes.select(
            F.col("_id").alias("query_id"),
            F.col("_vec").alias("_q_vec"),
            "cluster",
        )
    scored = (
        F.broadcast(probes)
        .join(
            index.select(
                F.col(id_col).alias("neighbor_id"), "cluster", "sq8_code"
            ),
            "cluster",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sq8_d2",
            _sq8_d2_expr(
                F.col("_q_vec"), F.col("sq8_code"), bounds, dim=dim
            ),
        )
    )
    return _topk_per_query(scored, k, ["sq8_d2"], extra_cols=("sq8_d2",))


def sq8_residual_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """IVF-SQ8 over RESIDUALS — the FAISS ``IndexIVFScalarQuantizer``
    default (``by_residual=True``): each vector is re-centered on its
    coarse cell before encoding, so the 8 bits per dimension describe
    within-cell variation instead of re-describing the coarse structure
    the cluster id already names.  Residual coordinates span a far
    narrower range than raw ones, so the same 256 levels land on a finer
    grid — the same argument ``ivf_residuals`` makes for PQ, applied to
    the scalar family.  The query is re-centered per probed cluster
    (``(q - c) - (x - c) = q - x`` exactly, so the scored quantity is
    unchanged; only the quantization grid moves).

    Same determinism spec as ``sq8_ivf_topk`` (exact bounds over the
    residual frame, round-before-floor encode, 6dp distances, smaller-id
    ties), so the entry keeps an exact oracle.

    Output: (query_id, neighbor_id, rank, sq8_d2); self-matches excluded.
    """
    cents = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec")
        )
    )
    # bounds train on the residual frame, then the persisted pipeline
    # (build + serve, residual=True) runs inline — same composition
    # discipline as sq8_ivf_topk
    bounds = sq8_train(
        sq8_residual_frame(corpus, cents, id_col, vec_col, dim),
        vec_col="_rvec",
    )
    index = build_sq8_index(
        corpus, cents, bounds, id_col, vec_col, dim, residual=True
    )
    return sq8_topk_serve(
        index, cents, queries, bounds, k=k, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col, dim=dim, residual=True,
    )


def sq8_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """IVF-SQ8 top-k — FAISS ``IndexIVFScalarQuantizer`` as joins: the
    coarse stage is the ANN family's shared quantizer spec (max-cosine to
    the ``n_centroids`` lowest-id stand-in centroids via
    ``_nearest_centroids``, ties to the smaller centroid id — identical
    to ``ivf_topk``/``ivf_pq_topk``), the fine stage stores candidates as
    SQ8 CODES ONLY (1 byte/dim, no float vectors in the index frame) and
    scores each probed candidate by decode-on-the-fly squared L2 against
    the float query.

    Sits between exact re-rank IVF (``ivf_topk``: full float vectors,
    exact cosine) and IVF-PQ (``ivf_pq_topk``: n_sub bytes/vector, table
    lookups) on the memory/recall frontier — 4x compression at
    near-exact recall vs 32x at shortlist-grade recall.

    Deterministic end to end (exact min/max bounds, round-before-floor
    encode, 6dp distances, ties to smaller neighbor id), so the entry
    carries an exact DuckDB oracle like the rest of the family.

    Output: (query_id, neighbor_id, rank, sq8_d2); self-matches excluded.
    """
    cents = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec")
        )
    )
    bounds = sq8_train(corpus, vec_col)
    # this batch form IS the persisted pipeline run inline (the
    # ivf_pq_topk discipline): build the codes-only store, serve from it
    # — the inline result and the persisted-index result cannot drift
    index = build_sq8_index(corpus, cents, bounds, id_col, vec_col, dim)
    return sq8_topk_serve(
        index, cents, queries, bounds, k=k, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col, dim=dim,
    )
