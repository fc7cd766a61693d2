"""Similarity search over an embedding column (array<float>).

Two paths (beyond-reference, BASELINE.json north star):
- brute-force cosine top-k: the exact baseline.  Query set is broadcast
  (it's small by construction); the scan side streams — at 100 TB this is
  one pass over the corpus per query batch with no shuffle until the final
  per-query top-k (TakeOrdered-style window over rank).
- LSH-bucketed ANN: random-hyperplane signatures bucket the corpus; queries
  probe only their bucket.  Two plane families: md5-derived INTEGER planes
  over floor-quantized vectors (lsh_quantized_planes /
  lsh_ann_topk_exact — bucket assignment is an exact integer computation,
  bit-identical in any engine, so the whole ANN pipeline carries a
  value-level oracle) and seeded-numpy Gaussian floats (lsh_ann_topk —
  for float-plane workloads, recall-floor tested).  Either way the plan
  stays native (no UDF) until the optional Arrow matmul path.

Dot products are in-JVM column expressions — no explode, no Python.  When
the vector width is known (``dim``), the sum is unrolled so whole-stage
codegen compiles it; the generic path is a zip_with + aggregate fold.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.sql import types as T


EMBEDDING_DIM = 64


def _dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product of two array columns.

    Default is a zip_with + aggregate fold (compact plan; CodegenFallback
    but fine at catalog scale).  Passing ``dim`` unrolls the sum into a flat
    ``a[1]*b[1] + ... + a[d]*b[d]`` expression — measured only ~1.3× faster
    on the O(N²) pair loop while bloating the task binary, so the catalog
    keeps the fold; the real scale path for bulk similarity is the blocked
    numpy matmul in ``cosine_near_pairs_blocked``.  Both forms add terms
    left-to-right, so results are bit-identical (IEEE: 0.0 + x == x).
    """
    if dim is not None:
        terms = [
            F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
            for i in range(1, dim + 1)
        ]
        out = terms[0]
        for term in terms[1:]:
            out = out + term
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(_dot(a, a, dim))


def _exact_cosine(q_vec: Column, c_vec: Column, dim: int | None = None) -> Column:
    """The ANN family's exact re-rank score — unrounded cosine, ONE
    definition shared by every serving path that re-ranks candidates
    (ivf_topk, the trained kmeans_ivf_topk twins, lsh_ann_topk), so the
    family's boundary assumption (no ulp-level cosine ties in the data)
    lives in one expression."""
    return _dot(q_vec, c_vec, dim) / (_norm(q_vec, dim) * _norm(c_vec, dim))


def _topk_per_query(
    scored: DataFrame, k: int, order: list, extra_cols: tuple = ()
) -> DataFrame:
    """The ANN family's per-query top-k tail — ONE definition of the rank
    contract (row_number per query_id over the given score order, ties
    always to the smaller neighbor_id), shared by the cosine servers and
    the ADC server so the tie-break can never drift between entries (the
    survivor_fold discipline applied to serving)."""
    w = Window.partitionBy("query_id").orderBy(*order, "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", *extra_cols)
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Output: (query_id, neighbor_id, rank), rank 1..k by similarity desc
    (ties broken by neighbor_id for determinism); self-matches excluded.
    Norms are computed once per vector BEFORE the join (N + Q sqrt-folds,
    not N·Q); pass ``dim`` for the unrolled codegen dot product.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col), dim).alias("q_nrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col), dim).alias("c_nrm"),
    )
    sim = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(F.col("q_vec"), F.col("c_vec"), dim)
            / (F.col("q_nrm") * F.col("c_nrm")),
        )
    )
    return _topk_per_query(sim, k, [F.desc("cosine")])


def cosine_near_pairs(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup: all pairs with cosine ≥ threshold.

    Brute-force all-pairs (the exact baseline — the LSH bucket join below is
    the scale path): self cross-join upper triangle, in-JVM dot products.
    Norms are computed once per vector before the join; pass ``dim`` for the
    unrolled codegen dot product (10×+ on the O(N²) pair loop).
    Output: (vec_a, vec_b, cosine) with cosine rounded to 6dp so the value
    is insensitive to summation-order float noise across engines.
    """
    a = corpus.select(
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("a_vec"),
        _norm(F.col(vec_col), dim).alias("a_nrm"),
    )
    b = corpus.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("b_vec"),
        _norm(F.col(vec_col), dim).alias("b_nrm"),
    )
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("a_vec"), F.col("b_vec"), dim)
                / (F.col("a_nrm") * F.col("b_nrm")),
                6,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def _non_null_ids(
    df: DataFrame, id_col: str, op_name: str, side: str
) -> DataFrame:
    """Raise IN-PLAN if ``id_col`` is NULL anywhere: a NULL id never
    matches an equality join, so it would silently escape both the
    disjointness guard and the downstream verify joins — quiet pair loss
    instead of an error.  Per-row branch fused into the projection, zero
    jobs at plan build (the repo's standard guard style)."""
    return df.withColumn(
        id_col,
        F.when(F.col(id_col).isNotNull(), F.col(id_col)).otherwise(
            F.raise_error(
                F.lit(
                    f"{op_name}: NULL {id_col} in {side} — NULL ids escape "
                    "equality joins, so their pairs would be silently "
                    "dropped rather than scored"
                )
            )
        ),
    )


def _disjoint_ids_or_raise(
    corpus: DataFrame, delta: DataFrame, id_col: str, op_name: str
) -> DataFrame:
    """Enforce the delta-ingest precondition corpus∩delta = ∅ IN-PLAN.

    Returns ``corpus`` with its id column wrapped in a per-row branch that
    raises iff the id also appears in ``delta`` (broadcast left join on the
    tiny delta id set, then ``when/otherwise(raise_error)`` — the same
    zero-jobs-at-build guard style as ``_quantized_bucket_frame``).  An
    overlapping id used to silently double-score its pairs (once per union
    arm); now any task that touches such a row fails with the message
    below, and a disjoint ingest pays only one broadcast-hash probe per
    corpus row.

    The probe joins null-safely (``eqNullSafe``) and flags the match with
    a marker column rather than the joined id itself, so a NULL id
    appearing on both sides is caught too (callers additionally reject
    NULL ids outright via ``_non_null_ids``).
    """
    dup = F.broadcast(
        delta.select(F.col(id_col).alias("_delta_dup_id"))
        .distinct()
        .withColumn("_delta_dup_hit", F.lit(True))
    )
    guarded_id = F.when(
        F.col("_delta_dup_hit").isNull(), F.col(id_col)
    ).otherwise(
        F.raise_error(
            F.format_string(
                f"{op_name}: id %s present in BOTH corpus and delta — a "
                "delta ingest requires disjoint id sets (an overlapping id "
                "would double-score its pairs)",
                F.coalesce(F.col(id_col).cast("string"), F.lit("NULL")),
            )
        )
    )
    return (
        corpus.join(dup, corpus[id_col].eqNullSafe(F.col("_delta_dup_id")), "left")
        .withColumn(id_col, guarded_id)
        .drop("_delta_dup_id", "_delta_dup_hit")
    )


def cosine_delta_pairs(
    corpus: DataFrame,
    delta: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Incremental embedding near-dup: near-pairs INVOLVING the delta only
    — the per-ingest shape (minhash_delta_dedup's embedding twin).

    On each ingest the new batch must be checked against the indexed corpus
    and against itself, never corpus x corpus again: work is
    O(|delta| x N + |delta|²), not O(N²).  The (small) delta broadcasts; the
    corpus streams through ONE scan.  Output matches cosine_near_pairs —
    (vec_a, vec_b, cosine), vec_a < vec_b, 6dp-rounded — so the same SQL
    contract verifies both.

    PRECONDITION (ENFORCED in-plan): ``corpus`` and ``delta`` id sets must
    be disjoint (the definition of a delta ingest) — an id in both would
    score its pair once per arm, so any task touching an overlapping id
    raises (see ``_disjoint_ids_or_raise``).  Ids need NOT be ordered
    across the sets: the corpus x delta arm emits (least, greatest), so an
    older backfilled id landing in the delta still pairs with every newer
    corpus id.
    """
    corpus = _non_null_ids(corpus, id_col, "cosine_delta_pairs", "corpus")
    delta = _non_null_ids(delta, id_col, "cosine_delta_pairs", "delta")
    corpus = _disjoint_ids_or_raise(corpus, delta, id_col, "cosine_delta_pairs")

    def side(df: DataFrame, role: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"vec_{role}"),
            F.col(vec_col).alias(f"{role}_vec"),
            _norm(F.col(vec_col), dim).alias(f"{role}_nrm"),
        )

    # corpus x delta: keep every cross pair (id inequality only), normalize
    # the id orientation with least/greatest — filtering vec_a < vec_b here
    # would silently DROP pairs whose corpus id exceeds the delta id
    cross = (
        side(corpus, "a")
        .crossJoin(F.broadcast(side(delta, "b")))
        .filter(F.col("vec_a") != F.col("vec_b"))
        .select(
            F.least("vec_a", "vec_b").alias("vec_a"),
            F.greatest("vec_a", "vec_b").alias("vec_b"),
            F.col("a_vec"),
            F.col("b_vec"),
            F.col("a_nrm"),
            F.col("b_nrm"),
        )
    )
    # delta x delta: the usual upper triangle
    within = (
        side(delta, "a")
        .crossJoin(F.broadcast(side(delta, "b")))
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "a_vec", "b_vec", "a_nrm", "b_nrm")
    )
    return (
        cross.unionByName(within)
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("a_vec"), F.col("b_vec"), dim)
                / (F.col("a_nrm") * F.col("b_nrm")),
                6,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


#: above this codebook size the keep-1 L2 assignment routes through the
#: Arrow matmul kernel instead of the crossJoin+window plan: the
#: crossJoin materializes N x K rows CARRYING THE VECTORS through a
#: window shuffle (at 1M x 1024 x 64d that is ~10^9 rows / half a
#: terabyte of exchange for what is one argmin per row), while the
#: kernel is one Arrow scan against a driver-held k x dim matrix.
#: Catalog-entry geometries (k <= 16) keep the declarative plan.
MATMUL_ASSIGN_MIN_K = 64


def _inline_score_array(vecs: list, dim: int | None, metric: str) -> Column:
    """The k scores of ``_vec`` against a collected, cent_id-sorted
    codebook as ONE array expression (nested-array literal + transform —
    r14: k unrolled per-centroid literal trees dominated catalyst
    analysis on trained builds, the _pq_codes_inline finding).  Score
    arithmetic mirrors ``_nearest_centroids``'s crossJoin branch
    operand-for-operand, so values are IEEE-identical to the window
    plan's."""
    if metric == "l2":
        # same zip_with operands, same fold order, same 6dp round as the
        # crossJoin branch
        return F.transform(
            F.lit(vecs),
            lambda c: F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("_vec"),
                        c,
                        lambda x, y: (x.cast("double") - y.cast("double"))
                        * (x.cast("double") - y.cast("double")),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ),
        )
    # cosine: zip the nested codebook literal with a per-centroid norm
    # literal computed on the driver.  The Python fold mirrors _norm's
    # expression tree operand-for-operand (same left-to-right IEEE double
    # adds, correctly-rounded sqrt), so each nc is bit-equal to the
    # constant the optimizer folded out of the historical per-centroid
    # _norm(lit) subtree; the query norm is shared across the k scores
    # (identical value, evaluated once instead of k times).
    import math

    nrms = []
    for c in vecs:
        # fold over the first ``dim`` elements only, mirroring the unrolled
        # _norm(cent_vec, dim) the crossJoin branch evaluates — a caller
        # passing dim < len(c) must see identical scores on both plans
        # (r14 ADVICE)
        sq = [x * x for x in (c if dim is None else c[:dim])]
        if dim is None:
            acc = 0.0
            for s in sq:
                acc = acc + s
        else:
            acc = sq[0]
            for s in sq[1:]:
                acc = acc + s
        nrms.append(math.sqrt(acc))
    qn = _norm(F.col("_vec"), dim)
    return F.zip_with(
        F.lit(vecs),
        F.lit(nrms),
        lambda c, nc: _dot(F.col("_vec"), c, dim) / (qn * nc),
    )


def _inline_nearest_one(
    df: DataFrame,
    rows: list,
    out: str,
    dim: int | None,
    metric: str,
) -> DataFrame:
    """keep-1 assignment against a collected, cent_id-sorted codebook as one
    codegen'd array expression per row (no crossJoin, no window shuffle).
    Score expressions mirror ``_nearest_centroids``'s crossJoin branch
    term-for-term (``_inline_score_array``), so results are
    IEEE-identical; first-index-of-extreme == ties-to-smaller-cent_id."""
    ids = [int(r["cent_id"]) for r in rows]
    vecs = [[float(x) for x in r["cent_vec"]] for r in rows]
    d = _inline_score_array(vecs, dim, metric)
    best = F.array_position(
        d, F.array_min(d) if metric == "l2" else F.array_max(d)
    )
    id_map = F.array(*[F.lit(i) for i in ids])
    return df.select(
        "_id",
        "_vec",
        F.element_at(id_map, best.cast("int")).cast("long").alias(out),
    )


def _inline_nearest_n(
    df: DataFrame,
    rows: list,
    out: str,
    keep: int,
    dim: int | None,
    metric: str,
) -> DataFrame:
    """keep-n probe against a collected, cent_id-sorted codebook as one
    map-only sorted-slice explode (r14, guide §2.4 — remove shuffles
    outright): the crossJoin + rank-window plan pushed |rows| x k scored
    rows CARRYING THE VECTORS through one Exchange + Sort per probe —
    on every ANN serve path, per query batch.  Here the k scores are one
    array expression (``_inline_score_array``, IEEE-identical to the
    crossJoin branch), zipped with the cent_ids, sorted by the window's
    exact ordering — (score asc, cent_id asc) for l2, (score desc,
    cent_id asc) for cosine — sliced to ``keep`` and exploded: map-only,
    2 (or keep) output rows per input row, no Exchange, no Sort node.
    Same boundary assumption as the keep-1 inline path: scores are
    never NULL/NaN (NULL ids are guarded upstream; zero vectors raise in
    the normalized family), where array_sort and a rank window order
    degenerate values differently.  A NULL *vector* is the one degenerate
    input nothing upstream enforces, and it would order
    NONDETERMINISTICALLY here (the cosine comparator returns 0 for NULL
    scores) where the window plan pins NULLs last — so it raises in-plan
    instead (r14 ADVICE; the standard guard style)."""
    df = df.withColumn(
        "_vec",
        F.when(F.col("_vec").isNotNull(), F.col("_vec")).otherwise(
            F.raise_error(
                F.format_string(
                    "nearest_centroids: NULL vector for id %s — the inline "
                    "keep-n probe has no deterministic NULL-score ordering "
                    "(the window plan orders NULLs last); filter or fix "
                    "NULL vectors upstream",
                    F.col("_id").cast("string"),
                )
            )
        ),
    )
    ids = [int(r["cent_id"]) for r in rows]
    vecs = [[float(x) for x in r["cent_vec"]] for r in rows]
    d = _inline_score_array(vecs, dim, metric)
    pairs = F.arrays_zip(
        d.alias("s"), F.lit([int(i) for i in ids]).alias("i")
    )
    if metric == "l2":
        # lexicographic struct sort == Window.orderBy(d2 asc, cent_id asc)
        ordered = F.array_sort(pairs)
    else:
        ordered = F.array_sort(
            pairs,
            lambda a, b: F.when(a["s"] > b["s"], F.lit(-1))
            .when(a["s"] < b["s"], F.lit(1))
            .when(a["i"] < b["i"], F.lit(-1))
            .when(a["i"] > b["i"], F.lit(1))
            .otherwise(F.lit(0)),
        )
    return (
        df.select("_id", "_vec", F.explode(F.slice(ordered, 1, keep)).alias("_t"))
        .select("_id", "_vec", F.col("_t.i").cast("long").alias(out))
    )


def _probe_matmul(
    df: DataFrame,
    rows: list,
    out: str,
    keep: int,
    dim: int | None,
    metric: str,
) -> DataFrame:
    """Large-k probe kernel (r15, guide §4/§2.4): one Arrow mapInPandas
    scan against the driver-held codebook for codebooks ABOVE
    ``MATMUL_ASSIGN_MIN_K``, replacing the crossJoin + rank-window
    fallback — the last n x k row explosion on a serve path (the
    crossJoin pushed |rows| x k scored rows CARRYING THE VECTORS through
    one Exchange + Sort per probe; the kernel is map-only).

    Float parity with ``_crossjoin_nearest``, per metric:

    - l2: distances accumulate as a SEQUENTIAL fold over dimensions
      (acc += (x_j - c_j)^2, j = 0..width-1) — bit-for-bit the
      zip_with/aggregate left-to-right order — then round half-up on the
      binary double (floor(x*1e6 + 0.5)/1e6, distances non-negative),
      exactly the ``_assign_matmul`` discipline.  The l2 crossJoin branch
      folds the FULL vector width regardless of ``dim`` (as does the
      inline path), so the kernel does too.
    - cosine: dot and query-norm accumulate as the same sequential fold
      over the first ``dim`` dimensions (all, when dim is None);
      centroid norms are the driver-side fold ``_inline_score_array``
      uses (bit-equal to the constants the optimizer folds out of
      _norm(lit) subtrees); the score is dot / (q_nrm * c_nrm) with the
      same operand grouping, UNROUNDED — IEEE-identical to the crossJoin
      expression on identical operands.

    Ordering: rows arrive cent_id-sorted, so np.argsort(kind='stable')
    over (-)score reproduces the window's (score, cent_id asc) exactly,
    and for keep=1 the first-extreme index IS ties-to-smaller-cent_id.
    A NULL vector fails the numpy conversion loudly (task error), never
    a silent mis-ordering.  ``_vec`` passes through with its input
    dtype, matching the crossJoin output schema."""
    import numpy as np

    ids = [int(r["cent_id"]) for r in rows]
    cmat = [[float(x) for x in r["cent_vec"]] for r in rows]
    id_field = df.schema["_id"]
    vec_field = df.schema["_vec"]
    out_schema = T.StructType(
        [
            T.StructField(id_field.name, id_field.dataType),
            T.StructField(vec_field.name, vec_field.dataType),
            T.StructField(out, T.LongType()),
        ]
    )

    def probe(batches):
        import pandas as pd

        C = np.asarray(cmat, dtype=np.float64)  # k x width
        idarr = np.asarray(ids, dtype=np.int64)
        k = C.shape[0]
        kk = min(keep, k)
        if metric == "cosine":
            Cd = C if dim is None else C[:, :dim]
            # driver-fold centroid norms: same sequential adds + sqrt as
            # _inline_score_array / the folded _norm(lit) constants
            cn = np.empty(k, dtype=np.float64)
            for i in range(k):
                acc = 0.0
                for x in Cd[i]:
                    acc = acc + x * x
                cn[i] = np.sqrt(acc)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(pdf["_vec"].tolist(), dtype=np.float64)
            n = len(pdf)
            if metric == "l2":
                acc = np.zeros((n, k), dtype=np.float64)
                for j in range(C.shape[1]):  # sequential fold order
                    dj = X[:, j][:, None] - C[:, j][None, :]
                    acc += dj * dj
                d = np.floor(acc * 1e6 + 0.5) / 1e6
                sel = (
                    np.argmin(d, axis=1)[:, None]
                    if kk == 1
                    else np.argsort(d, axis=1, kind="stable")[:, :kk]
                )
            else:
                Xd = X if dim is None else X[:, :dim]
                dot = np.zeros((n, k), dtype=np.float64)
                qsq = np.zeros(n, dtype=np.float64)
                for j in range(Xd.shape[1]):  # sequential fold order
                    dot += Xd[:, j][:, None] * Cd[:, j][None, :]
                    qsq += Xd[:, j] * Xd[:, j]
                s = dot / (np.sqrt(qsq)[:, None] * cn[None, :])
                sel = (
                    np.argmax(s, axis=1)[:, None]
                    if kk == 1
                    else np.argsort(-s, axis=1, kind="stable")[:, :kk]
                )
            rep = np.repeat(np.arange(n), kk)
            yield pd.DataFrame(
                {
                    "_id": pdf["_id"].to_numpy()[rep],
                    "_vec": pdf["_vec"].take(rep).to_numpy(),
                    out: idarr[sel.ravel()],
                }
            )

    return df.select("_id", "_vec").mapInPandas(probe, schema=out_schema)


def _crossjoin_nearest(
    df: DataFrame,
    cents,
    out: str,
    keep: int,
    dim: int | None,
    metric: str,
) -> DataFrame:
    """The historical crossJoin + rank-window probe plan: |df| x |cents|
    scored rows through one Exchange + Sort.  Production dispatch only
    reaches it for an EMPTY codebook (crossJoin with an empty frame =
    empty result, the contract); it is kept whole as the reference
    implementation the kernel parity tests diff against."""
    scored = df.crossJoin(cents)
    if metric == "l2":
        scored = scored.withColumn(
            "cent_d2",
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("_vec"),
                        F.col("cent_vec"),
                        lambda x, y: (x.cast("double") - y.cast("double"))
                        * (x.cast("double") - y.cast("double")),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ),
        )
        w = Window.partitionBy("_id").orderBy("cent_d2", "cent_id")
    else:
        scored = scored.withColumn(
            "cent_cos",
            _dot(F.col("_vec"), F.col("cent_vec"), dim)
            / (_norm(F.col("_vec"), dim) * _norm(F.col("cent_vec"), dim)),
        )
        w = Window.partitionBy("_id").orderBy(F.desc("cent_cos"), "cent_id")
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= keep)
        .select("_id", "_vec", F.col("cent_id").alias(out))
    )


def _nearest_centroids(
    df: DataFrame,
    cents,
    out: str,
    keep: int,
    dim: int | None = None,
    metric: str = "cosine",
    n_cents: int | None = None,
) -> DataFrame:
    """Nearest-centroid assignment shared by the IVF family (ivf_topk,
    ivf_pq_topk — one deterministic spec, ties to the smaller centroid
    id).  ``df``: (_id, _vec); ``cents``: broadcastable (cent_id,
    cent_vec).  Returns (_id, _vec, <out>) with the top ``keep``
    centroids per row.

    ``metric``: "cosine" (max unrounded cosine — the lowest-id stand-in
    family's spec) or "l2" (min 6dp-ROUNDED squared L2 — the kmeans
    contract, so assigning against a ``kmeans_codebook`` frame reproduces
    ``kmeans_assign``'s clusters exactly: trained centroids are
    themselves 6dp values, and the rounding keeps argmin ties
    engine-identical).

    ``n_cents`` (callers that know their codebook size pass it): for the
    keep-1 L2 family above ``MATMUL_ASSIGN_MIN_K`` the assignment runs
    through ``clustering._assign_matmul`` — the SAME sequential-fold /
    6dp-half-up / first-min kernel the kmeans trainer uses, so the
    result is bit-identical to the crossJoin plan (parity-tested) while
    the plan stays one Arrow scan instead of an N x K row explosion.
    The codebook collects to the driver (bounded k x dim — the kmeans
    precedent), which also fires the undersize guard eagerly."""
    if (
        metric == "l2"
        and keep == 1
        and n_cents is not None
        and n_cents >= MATMUL_ASSIGN_MIN_K
    ):
        from .clustering import _assign_matmul

        rows = sorted(
            cents.select("cent_id", "cent_vec").collect(),
            key=lambda r: r["cent_id"],
        )
        ids = [r["cent_id"] for r in rows]
        cmat = [list(map(float, r["cent_vec"])) for r in rows]
        assigned = _assign_matmul(
            df.select(
                "_id",
                F.transform("_vec", lambda x: x.cast("double")).alias("v"),
            ),
            cmat,
            "_id",
        )
        # argmin INDEX -> cent_id: sorted-by-cent_id list means the
        # first-min index tie IS the smaller-cent_id tie; map through the
        # id list (identity for dense kmeans codebooks, but not assumed)
        id_map = F.array(*[F.lit(int(i)) for i in ids])
        return assigned.select(
            "_id",
            F.col("v").alias("_vec"),
            # cast matches the crossJoin path's cent_id type (bigint) so
            # both plans write schema-identical parquet partitions
            F.element_at(id_map, F.col("cluster") + 1)
            .cast("long")
            .alias(out),
        )
    # r14 (guide §2.4 — remove shuffles outright): assignment/probe
    # against a codebook-sized frame needs no crossJoin + per-row rank
    # window (an n x k row explosion through one Exchange + Sort).
    # Collect the codebook (bounded by contract — every caller passes a
    # <= max(n_centroids, pq_centroids)-row frame; the collect also
    # fires any in-plan undersize guard eagerly, the matmul-path
    # precedent) and evaluate the k scores as ONE codegen'd array
    # expression per row, map-only: keep=1 takes first-index-of-extreme
    # (== the window's ties-to-smaller-cent_id), keep>1 sorts the
    # (score, cent_id) pairs by the window's exact ordering, slices and
    # explodes (keep rows per input row, still no Exchange/Sort node —
    # this is every ANN serve path's per-query-batch probe).
    # Float parity with the crossJoin path: each score is the SAME
    # arithmetic with the centroid from a nested-array literal (IEEE ops
    # on identical operands — _inline_score_array).
    # Bounded at MATMUL_ASSIGN_MIN_K scores (catalog geometries are
    # k <= 16): above that an inline k x dim literal tree is a plan
    # explosion, so larger codebooks — BOTH metrics, any keep — route
    # through the Arrow matmul probe kernel (r15; the l2 keep-1 family
    # had the kernel since r11, the cosine/keep-n fallback was the last
    # crossJoin n x k row explosion on a serve path).  The collect is
    # load-bearing on every non-empty path (literal source below the
    # threshold, kernel matrix above it).  An empty codebook falls
    # through to the crossJoin plan (empty frame = empty result, the
    # historical contract; the inline expression would emit NULL
    # clusters).
    rows = sorted(
        cents.select("cent_id", "cent_vec").collect(),
        key=lambda r: r["cent_id"],
    )
    if 0 < len(rows) <= MATMUL_ASSIGN_MIN_K:
        if keep == 1:
            return _inline_nearest_one(df, rows, out, dim, metric)
        return _inline_nearest_n(df, rows, out, keep, dim, metric)
    if len(rows) > MATMUL_ASSIGN_MIN_K:
        return _probe_matmul(df, rows, out, keep, dim, metric)
    return _crossjoin_nearest(df, cents, out, keep, dim, metric)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
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

    c = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
    assigned = _nearest_centroids(c, cents, "cluster", 1, dim).select(
        F.col("_id").alias("neighbor_id"), F.col("_vec").alias("c_vec"), "cluster"
    )
    q = queries.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
    probed = _nearest_centroids(q, cents, "cluster", n_probe, dim).select(
        F.col("_id").alias("query_id"), F.col("_vec").alias("q_vec"), "cluster"
    )

    sim = (
        assigned.join(probed, "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine", _exact_cosine(F.col("q_vec"), F.col("c_vec"), dim)
        )
    )
    return _topk_per_query(sim, k, [F.desc("cosine")])


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float).tolist()


def _lsh_bucket(vec: Column, planes: list[list[float]], dim: int | None = None) -> Column:
    """Sign-pattern bucket id: bit p set iff dot(vec, plane_p) > 0."""
    bits = [
        F.when(
            _dot(vec, F.array(*[F.lit(float(x)) for x in plane]), dim) > 0,
            F.lit(1 << p),
        ).otherwise(0)
        for p, plane in enumerate(planes)
    ]
    return sum(bits).cast("int")


def _lsh_buckets_arrow(
    df: DataFrame,
    role_id: str,
    role_vec: str,
    n_planes: int,
    n_tables: int,
    dim: int,
    seed: int,
) -> DataFrame:
    """(id, vec) → (id, vec, tbl, bucket) via one numpy matmul per Arrow
    batch: all T×P plane projections at once, instead of T×P×dim unrolled
    column expressions (whose codegen compile time dominates past ~1k
    terms).  Bit semantics identical to _lsh_bucket: bit p set iff
    dot(vec, plane_p) > 0, planes drawn from the same per-table seeds.
    """
    import pandas as pd

    mats = np.vstack(
        [
            np.random.RandomState(seed + 7919 * t).randn(n_planes, dim)
            for t in range(n_tables)
        ]
    )  # (T*P, dim)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.vstack([np.asarray(x, dtype=np.float64) for x in pdf[role_vec]])
            signs = (v @ mats.T) > 0  # (n, T*P)
            for t in range(n_tables):
                bits = signs[:, t * n_planes : (t + 1) * n_planes]
                yield pd.DataFrame(
                    {
                        role_id: pdf[role_id].to_numpy(),
                        role_vec: pdf[role_vec],
                        "tbl": np.int32(t),
                        "bucket": (bits @ weights).astype(np.int32),
                    }
                )

    return df.select(F.col(role_id), F.col(role_vec)).mapInPandas(
        gen, f"{role_id} long, {role_vec} array<float>, tbl int, bucket int"
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
    n_tables: int = 1,
    use_arrow: bool | None = None,
) -> DataFrame:
    """Approximate top-k: compare only within the query's hyperplane
    bucket(s), union-of-candidates across ``n_tables`` independent tables.

    Per table, 2^n_planes buckets; the candidate join is an equi-join on
    (table, bucket) — at scale this replaces the O(N·Q) cross join with
    O(N·Q·L/2^p) expected work.  Single-table recall on unstructured
    embeddings decays fast with n_planes (measured in
    tests/test_training_ops.py: ~0.15 at p=4 on random 64-dim vectors);
    the standard fix is L tables with independent planes — a candidate
    survives if ANY table buckets it with the query, then exact cosine
    re-ranks the deduplicated union.  One corpus scan regardless of L (the
    per-table buckets explode from one projection).
    Output schema matches cosine_topk (rank may differ from exact — ANN).
    """
    if use_arrow is None:
        # past ~1 table the unrolled bucket expressions cost more to
        # codegen-compile than to run; switch to the Arrow matmul path
        use_arrow = n_tables > 1

    def bucketed(df: DataFrame, role_id: str, role_vec: str) -> DataFrame:
        out = df.select(
            F.col(id_col).alias(role_id), F.col(vec_col).alias(role_vec)
        )
        if use_arrow:
            return _lsh_buckets_arrow(
                out, role_id, role_vec, n_planes, n_tables, dim, seed
            )
        tb = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        _lsh_bucket(
                            F.col(role_vec),
                            hyperplanes(dim, n_planes, seed + 7919 * t),
                            dim,
                        ).alias("bucket"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb")
        return out.select(role_id, role_vec, tb).select(
            role_id, role_vec, "tb.tbl", "tb.bucket"
        )

    c = bucketed(corpus, "neighbor_id", "c_vec")
    q = bucketed(queries, "query_id", "q_vec")
    candidates = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        # a pair found by several tables must score once
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = candidates.withColumn(
        "cosine", _exact_cosine(F.col("q_vec"), F.col("c_vec"), dim)
    )
    return _topk_per_query(sim, k, [F.desc("cosine")])


def cosine_near_pairs_blocked(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup via Arrow-batched blocked matrix multiply —
    the bulk-similarity scale path.

    Each input partition becomes a numpy block A (rows × dim); the
    row-normalized corpus matrix M rides along as a Spark broadcast; the
    partition emits the upper-triangle pairs of A·Mᵀ ≥ threshold.  SIMD
    matmul replaces 12.5M per-pair expression evaluations — ~20× faster
    than the expression form at 5k vectors, and the gap widens with N.

    Scale honesty: broadcasting the full corpus works to ~10⁷ vectors
    (dim 64 ≈ 5 GB); past that, tile BOTH sides — cross-join block ids,
    shuffle blocks, matmul per (block_i, block_j ≥ block_i) pair — same
    kernel, one extra shuffle.  Output/rounding contract matches
    cosine_near_pairs (round 6dp), so the same SQL oracle verifies both.

    Operand order matches the expression kernel exactly — raw dot divided
    by the product of norms, NOT pre-normalized rows — so the only residual
    cross-kernel float difference is summation order inside the dot (BLAS
    blocked sums vs a left-to-right fold), absorbed by the 6dp round except
    for values sitting exactly on a rounding/threshold boundary.
    """
    import pandas as pd

    spark = corpus.sparkSession
    pdf = corpus.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
    m_norm = np.linalg.norm(m, axis=1)
    bc = spark.sparkContext.broadcast((ids, m, m_norm))

    def gen(batches):
        b_ids, m_mat, b_norm = bc.value
        for block in batches:
            if not len(block):
                continue
            a_ids = block[id_col].to_numpy()
            a = np.stack(block[vec_col].to_numpy()).astype("float64")
            a_norm = np.linalg.norm(a, axis=1)
            # round BEFORE thresholding — the exact operator filters on the
            # rounded value, and the two must agree at the boundary; divide
            # dot by the norm product (same operand order as the expression
            # kernel) rather than normalizing rows first
            sims = np.round((a @ m_mat.T) / np.outer(a_norm, b_norm), 6)
            ai, bj = np.nonzero(sims >= threshold)
            keep = a_ids[ai] < b_ids[bj]
            ai, bj = ai[keep], bj[keep]
            yield pd.DataFrame(
                {
                    "vec_a": a_ids[ai],
                    "vec_b": b_ids[bj],
                    "cosine": sims[ai, bj],
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        gen, "vec_a long, vec_b long, cosine double"
    )


def cosine_near_pairs_auto(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_cap_bytes: int = 512 << 20,
    n_blocks: int | None = None,
) -> DataFrame:
    """Size-based dispatch between the two bulk-similarity kernels, so the
    100 TB-safe variant engages without caller knowledge.

    Estimates the materialized corpus-matrix footprint (rows × dim × 8 B
    float64 + id column) with one cheap metadata-only count plus a 1-row dim
    probe.  Under ``broadcast_cap_bytes`` (default 512 MB — comfortably
    inside a typical executor's broadcast budget) the corpus is broadcast
    and each partition matmuls against it (``cosine_near_pairs_blocked``);
    over it, both sides are tiled (``cosine_near_pairs_tiled``) with
    ``n_blocks`` sized so one block fits the cap.  Both kernels share the
    6dp round-before-threshold contract, so the dispatch is invisible to
    correctness.
    """
    probe = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    if probe is None:  # empty corpus: either path returns empty; use blocked
        return cosine_near_pairs_blocked(corpus, threshold, id_col, vec_col)
    dim = int(probe["d"])
    n = corpus.count()
    est_bytes = n * (dim * 8 + 8)
    if est_bytes <= broadcast_cap_bytes:
        return cosine_near_pairs_blocked(corpus, threshold, id_col, vec_col)
    if n_blocks is None:
        n_blocks = max(2, -(-est_bytes // broadcast_cap_bytes))  # ceil div
    return cosine_near_pairs_tiled(corpus, threshold, n_blocks, id_col, vec_col)


def cosine_near_pairs_tiled(
    corpus: DataFrame,
    threshold: float = 0.4,
    n_blocks: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine ≥ threshold with BOTH sides tiled — the path past
    ~10⁷ vectors where broadcasting the corpus (cosine_near_pairs_blocked)
    no longer fits.

    The corpus is hashed into ``n_blocks`` disjoint blocks; every unordered
    block pair (i ≤ j) becomes one tile processed by a numpy matmul inside
    ``applyInPandas``.  Each row ships to n_blocks tiles, so shuffle volume
    is n_blocks × |corpus| — the classic tiled-matmul tradeoff (pick
    n_blocks so a block fits executor memory).  Diagonal tiles dedupe via
    vec_a < vec_b; off-diagonal tiles emit (min, max) so every unordered
    pair appears exactly once.  Output contract matches cosine_near_pairs
    (6dp rounding before thresholding) ⇒ the same SQL oracle verifies it.
    """
    import pandas as pd

    spark = corpus.sparkSession
    tiles = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "bi int, bj int",
    )
    v = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        F.pmod(F.hash(F.col(id_col)), F.lit(n_blocks)).alias("_blk"),
    )
    a_side = v.join(F.broadcast(tiles), F.col("_blk") == F.col("bi")).withColumn(
        "_side", F.lit(0)
    )
    b_side = v.join(F.broadcast(tiles), F.col("_blk") == F.col("bj")).withColumn(
        "_side", F.lit(1)
    )
    both = a_side.unionByName(b_side).select("bi", "bj", "_side", "_id", "_vec")

    def tile_pairs(key, pdf):
        bi, bj = key
        a = pdf[pdf["_side"] == 0]
        b = pdf[pdf["_side"] == 1]
        if not len(a) or not len(b):
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
            )
        a_ids = a["_id"].to_numpy()
        b_ids = b["_id"].to_numpy()
        am = np.stack(a["_vec"].to_numpy()).astype("float64")
        bm = np.stack(b["_vec"].to_numpy()).astype("float64")
        # dot / (norm_a * norm_b) — same operand order as the expression
        # kernel and the SQL oracle (see cosine_near_pairs_blocked)
        sims = np.round(
            (am @ bm.T)
            / np.outer(np.linalg.norm(am, axis=1), np.linalg.norm(bm, axis=1)),
            6,
        )
        ai, bj_ix = np.nonzero(sims >= threshold)
        ia, ib = a_ids[ai], b_ids[bj_ix]
        if bi == bj:  # same set on both sides: keep each unordered pair once
            keep = ia < ib
            ia, ib, cs = ia[keep], ib[keep], sims[ai[keep], bj_ix[keep]]
        else:  # disjoint blocks: normalize order instead of dropping
            cs = sims[ai, bj_ix]
            ia, ib = np.minimum(ia, ib), np.maximum(ia, ib)
        return pd.DataFrame({"vec_a": ia, "vec_b": ib, "cosine": cs})

    return both.groupBy("bi", "bj").applyInPandas(
        tile_pairs, "vec_a long, vec_b long, cosine double"
    )


def quantize_embeddings_int8(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-vector symmetric int8 quantization (the storage/serving path for
    embedding tables: 4x smaller than float32, 8x smaller than float64):
    scale = 127 / max|x|, q_i = floor(x_i * scale + 0.5).

    floor(x+0.5) instead of round() because the two engines' round() may
    disagree on negative-half ties; floor is bit-identical everywhere.
    Higher-order array functions only — map-only, zero shuffle, no Python;
    at 100 TB this runs at parquet scan speed.  Returns per-vector audit
    stats (the quantized array itself would be the production output;
    summing keeps the oracle comparison dense).
    """
    absmax = F.array_max(
        F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
    )
    scale = F.lit(127.0) / absmax
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long"),
    )
    return df.filter(absmax > 0).select(
        "vec_id",
        scale.alias("scale"),
        F.size(vec_col).alias("n_dims"),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.aggregate(
            q, F.lit(0).cast("long"), lambda a, x: a + F.abs(x)
        ).alias("q_abs_sum"),
    )


def lsh_quantized_planes(
    n_planes: int, n_tables: int, dim: int, quant_mod: int = 1001
) -> dict[tuple[int, int], list[int]]:
    """Integer hyperplane weights derived from md5 — reproducible in ANY
    engine that has md5: w[t][p][i] = (int(md5(f"{t}_{p}_{i}")[:8], 16)
    % quant_mod) - quant_mod//2, uniform on [-500, 500] for the default
    modulus.  A symmetric weight distribution is all sign-LSH needs; using
    a hash-derived integer family (instead of seeded Gaussian floats) is
    what lets the bucketing stage carry an exact cross-engine oracle."""
    import hashlib

    half = quant_mod // 2
    return {
        (t, p): [
            (int(hashlib.md5(f"{t}_{p}_{i}".encode()).hexdigest()[:8], 16) % quant_mod)
            - half
            for i in range(dim)
        ]
        for t in range(n_tables)
        for p in range(n_planes)
    }


def _quantized_bucket_frame(
    df: DataFrame,
    id_out: str,
    n_planes: int,
    n_tables: int,
    quant: int,
    id_col: str,
    vec_col: str,
    dim: int,
    with_norm: bool = False,
) -> DataFrame:
    """(id, vec) → (id_out, tbl, bucket) with bit-exact cross-engine bucket
    assignment: vectors quantize to int64 via floor(v * quant) (floor of a
    double product is IEEE-identical everywhere; cast alone differs — Spark
    truncates, DuckDB rounds) and hyperplane weights are the md5-derived
    integers of lsh_quantized_planes, so each signed projection is an exact
    order-independent integer sum.  Shared by lsh_candidate_pairs and
    lsh_ann_topk_exact so the two can never drift.

    ``with_norm=True`` appends the vector's L2 norm (``nrm``), computed in
    the same projection as the quantization — one scan yields both the
    bucket assignment and the verify-side norm, which is what lets
    ``lsh_bucket_index`` serve as the COMPLETE per-ingest corpus metadata
    (the delta path never re-projects corpus vectors for norms).
    """
    # zip_with against a wrong-width plane array yields NULL folds, every
    # vector lands in bucket 0, and the "pruning" join silently degenerates
    # to all-pairs — fail loudly on a dim mismatch instead.  The guard is
    # IN-PLAN (a per-row branch fused into the quantization expression),
    # not an eager .first() probe: plan construction launches zero jobs,
    # and a mismatch anywhere in the data — not just the sampled row —
    # fails the task with the message below
    planes = lsh_quantized_planes(n_planes, n_tables, dim)
    quantize = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(quant))).cast("long"),
    )
    qv = F.when(F.size(F.col(vec_col)) == dim, quantize).otherwise(
        F.raise_error(
            F.format_string(
                f"quantized LSH bucketing: dim={dim} but {vec_col} has "
                "%d elements",
                F.size(F.col(vec_col)),
            )
        )
    )

    # ALL T*P planes as ONE nested array literal, and all T buckets as ONE
    # transform/aggregate expression over it: the plan size is CONSTANT in
    # (n_planes, n_tables).  The per-plane variant (one fold expression per
    # (t, p)) put T*P lambda trees in the plan and Catalyst ANALYSIS alone
    # grew to tens of seconds at the scale constants (P=12, T=32) — plan
    # build cost is per-ingest cost in the delta path, so it matters as
    # much as execution.  Bucket values are bit-identical to the unrolled
    # form: same left-to-right integer folds, bit weight 2^p via an exact
    # small-power double.
    # literal via SQL text, not F.lit: py4j converts a nested Python list
    # element-by-element (~7 s for the 10k ints at P=10/T=16), while
    # parsing the equivalent array(...) expression costs milliseconds —
    # and per-ingest PLAN BUILD time is per-ingest cost in the delta path
    planes_lit = F.expr(
        "array("
        + ",".join(
            "array("
            + ",".join(
                "array(" + ",".join(f"{v}L" for v in planes[(t, p)]) + ")"
                for p in range(n_planes)
            )
            + ")"
            for t in range(n_tables)
        )
        + ")"
    )
    buckets_arr = F.transform(
        planes_lit,
        lambda tp: F.aggregate(
            F.transform(
                tp,
                lambda w, p: F.when(
                    F.aggregate(
                        F.zip_with(F.col("_qv"), w, lambda a, b: a * b),
                        F.lit(0).cast("long"),
                        lambda acc, x: acc + x,
                    )
                    > 0,
                    F.pow(F.lit(2.0), p).cast("int"),
                ).otherwise(F.lit(0)),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        ).cast("int"),
    )
    base_cols = [F.col(id_col).alias(id_out), qv.alias("_qv")]
    carry = []
    if with_norm:
        base_cols.append(_norm(F.col(vec_col)).alias("nrm"))
        carry = ["nrm"]
    return (
        df.select(*base_cols)
        .select(
            id_out,
            *carry,
            F.posexplode(buckets_arr).alias("tbl", "bucket"),
        )
        .select(
            id_out,
            F.col("tbl").cast("int").alias("tbl"),
            F.col("bucket"),
            *carry,
        )
    )


def lsh_candidate_pairs(
    corpus: DataFrame,
    n_planes: int = 8,
    n_tables: int = 4,
    quant: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """Deterministic LSH candidate generation — the bucketing stage of
    ANN/near-dup split out as an exactly-verifiable operator.

    Two determinism moves make bucket assignment bit-identical across
    engines (no float sign flips at the decision boundary):
    - vectors quantize to int64 via floor(v * quant) — floor of a double
      product is IEEE-identical everywhere (cast alone differs: Spark
      truncates, DuckDB rounds);
    - hyperplane weights are md5-derived integers (lsh_quantized_planes),
      so the signed projection is an exact integer sum, order-independent.

    Output: (vec_a, vec_b, n_tables) — every unordered pair bucketed
    together by at least one of the ``n_tables`` tables, with the collision
    count.  The ANN tail (exact cosine re-rank of candidates) remains
    approximate relative to full top-k; THIS stage is exact by
    construction, which is the part worth a value-level contract.

    Scale shape: one scan computes all T×P projections per row (native
    fold expressions, no Python); candidates come from an equi-join on
    (tbl, bucket) — expected pair work O(N² · T / 2^P), tuned by raising
    n_planes; never a cross join.
    """
    buckets = _quantized_bucket_frame(
        corpus, "_id", n_planes, n_tables, quant, id_col, vec_col, dim
    )
    a = buckets.select(F.col("_id").alias("vec_a"), "tbl", "bucket")
    b = buckets.select(F.col("_id").alias("vec_b"), "tbl", "bucket")
    return (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .groupBy("vec_a", "vec_b")
        .agg(F.count(F.lit(1)).alias("n_tables"))
    )


def lsh_ann_topk_exact(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    quant: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """LSH ANN with a value-level cross-engine contract end to end: the
    deterministic integer-plane bucketing of lsh_candidate_pairs feeds an
    exact cosine re-rank of the candidate union.

    The result is still *approximate nearest neighbors* (a true neighbor
    sharing no bucket with its query is missed — that is the LSH trade),
    but it is a deterministic function of the data: bucket assignment is an
    exact integer computation (md5-derived plane weights, floor-quantized
    vectors — see _quantized_bucket_frame), and the re-rank orders by
    cosine DESC with neighbor_id tie-break, so any engine reproduces the
    same top-k.  This closes the oracle gap the seeded-Gaussian variant
    (lsh_ann_topk) cannot: numpy float planes have no cross-engine twin.

    Scale shape: one scan per side computes all T×P projections as native
    fold expressions; candidates come from an equi-join on (tbl, bucket)
    with the (small) query side broadcast; vectors re-attach by id equi-join
    (no vector payload rides through the bucket explode); the final top-k is
    a per-query window.  Expected candidate work O(N·Q·T / 2^P) — never a
    cross join.

    Output schema matches cosine_topk: (query_id, neighbor_id, rank).
    """
    cb = _quantized_bucket_frame(
        corpus, "neighbor_id", n_planes, n_tables, quant, id_col, vec_col, dim
    )
    qb = _quantized_bucket_frame(
        queries, "query_id", n_planes, n_tables, quant, id_col, vec_col, dim
    )
    cand = (
        cb.join(F.broadcast(qb), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        # a pair found by several tables must score once
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_nrm"),
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_nrm"),
    )
    sim = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn(
            "cosine",
            _dot(F.col("q_vec"), F.col("c_vec"))
            / (F.col("q_nrm") * F.col("c_nrm")),
        )
    )
    return _topk_per_query(sim, k, [F.desc("cosine")])


def _lsh_params_tag(n_planes: int, n_tables: int, quant: int, dim: int) -> str:
    """The build-parameter fingerprint persisted with every
    ``lsh_bucket_index`` row.  An index built under one (planes, tables,
    quant, dim) family produces a DIFFERENT bucket space than another —
    probing it with mismatched call parameters silently collapses recall
    — so the delta path checks this tag in-plan and fails loudly on any
    mismatch (round-7 advisory)."""
    return f"P{n_planes}T{n_tables}Q{quant}D{dim}"


def lsh_bucket_index(
    df: DataFrame,
    n_planes: int = 4,
    n_tables: int = 8,
    quant: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """The persistable LSH bucket index: (id, tbl, bucket, nrm, params),
    one row per (vector, table) — the embedding twin of
    ``minhash_delta_dedup``'s band index.  Build once over the corpus,
    append each ingested delta's frame (bucket assignment and norm are
    per-row, so incremental append IS the full rebuild), and feed it to
    ``cosine_delta_pairs_lsh(corpus_index=...)`` so per-ingest candidate
    generation never re-projects corpus vectors.

    The round-8 format carries two verify-side fields beyond the bucket
    assignment:

    - ``nrm`` — the vector's L2 norm, computed in the SAME projection as
      the quantization, so the delta path's cosine verify needs corpus
      VECTORS only for the candidate id set (dot products) and corpus
      norms never again;
    - ``params`` — the build-parameter tag (``_lsh_params_tag``); the
      delta path raises in-plan if it doesn't match the call's parameters
      (a mismatched family yields a different bucket space — silent recall
      collapse otherwise).

    Still narrow (two ints, a double, a constant string that
    dictionary-encodes to nothing in parquet); write it
    partitioned/bucketed by ``bucket`` and the candidate join co-locates.
    """
    return _quantized_bucket_frame(
        # a NULL id would be unfindable by every downstream equality join
        # (quiet pair loss) — reject it at BUILD time, not probe time
        _non_null_ids(df, id_col, "lsh_bucket_index", "input"),
        id_col, n_planes, n_tables, quant, id_col, vec_col, dim,
        with_norm=True,
    ).withColumn("params", F.lit(_lsh_params_tag(n_planes, n_tables, quant, dim)))


def cosine_delta_pairs_lsh(
    corpus: DataFrame,
    delta: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 4,
    n_tables: int = 8,
    quant: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMBEDDING_DIM,
    corpus_index: DataFrame | None = None,
) -> DataFrame:
    """BUCKETED incremental embedding near-dup — the scale path for
    per-ingest embedding dedup (``minhash_delta_dedup``'s index shape with
    ``cosine_delta_pairs``'s contract).

    ``cosine_delta_pairs`` is exact but O(|Δ|·N) per ingest: every delta
    vector scores a dot product against every corpus vector.  Here both
    sides are LSH-bucketed first (the md5-integer-plane /
    floor-quantization family of ``_quantized_bucket_frame``, so bucket
    assignment is bit-identical in any engine), candidates come from an
    equi-join on (tbl, bucket) restricted to pairs INVOLVING the delta,
    and only the candidate union gets an exact cosine verify — expected
    work O(|Δ|·N·T/2^P) dot products instead of O(|Δ|·N).

    Approximate BY DESIGN (a near-pair sharing no bucket is missed — the
    same trade ``lsh_ann_topk_exact`` documents) but DETERMINISTICALLY so:
    the result is an exact function of the data, so it carries a
    value-level cross-engine oracle, and its miss rate vs the exact path
    is itself measurable (``delta_pairs_recall_eval`` in the catalog).

    CHOOSING (n_planes, n_tables): sign-LSH recall is governed by the
    pair angle — recall ≈ 1-(1-p^P)^T with p = 1-θ/π — so the right
    constants depend on the similarity regime you prune for.  The
    defaults (P=4, T=8) match the catalog oracle's low-threshold regime;
    for real near-dup work (cosine ≥ ~0.85) use P=10/T=16, which measured
    recall 0.976 at a ~2% candidate fraction — the committed frontier in
    BENCH_LSH_FRONTIER.json maps the trade for 7 combos in both regimes.

    Scale shape: corpus buckets once per ingest epoch (persist them — the
    frame is (id, tbl, bucket, nrm, params), narrow and incrementally
    appendable exactly like ``minhash_delta_dedup``'s band index); the
    delta's bucket frame broadcasts; the verify re-attaches vectors by id
    equi-join so no vector payload rides through the bucket explode.
    Output matches cosine_delta_pairs: (vec_a, vec_b, cosine), vec_a <
    vec_b, 6dp round-before-threshold.

    PRECONDITION (ENFORCED in-plan): corpus and delta id sets disjoint —
    same guard as cosine_delta_pairs.

    Pass ``corpus_index`` (a persisted ``lsh_bucket_index`` frame for the
    corpus) and the per-ingest plan touches the corpus in exactly TWO
    narrow ways — plan-asserted in tests/test_plan_quality.py:

    - the index scan (ints + a stored norm), and
    - ONE pass over the corpus vector frame that is a broadcast left-semi
      probe against the candidate id set: vectors and norms are never
      projected for non-candidates, so the O(N) residual is a hash probe
      per row — the delta-disjointness guard rides this same scan (one
      more broadcast probe per row, no extra pass, no float math).  (With
      the corpus table partitioned or bucketed by id range in production,
      even that scan partition-prunes to the candidate buckets.)

    Staleness is fail-loud in BOTH directions (round-8 review hardening):
    the index's ``params`` tag is checked in-plan against this call's
    (n_planes, n_tables, quant, dim); an index id with no vector in
    ``corpus`` (superset index) fails the verify join; a corpus∩delta
    overlap raises whether the overlapping id is in the index or only in
    the (newer) corpus frame; NULL ids raise on every input including the
    index; and a candidate whose LIVE vector no longer matches its stored
    index norm (in-place update under an unrebuilt index — stale buckets)
    raises instead of scoring a mixed-epoch cosine.
    """
    op = "cosine_delta_pairs_lsh"
    corpus = _non_null_ids(corpus, id_col, op, "corpus")
    delta = _non_null_ids(delta, id_col, op, "delta")
    # delta-disjointness is enforced on the CORPUS frame in both paths —
    # with an index, the probe rides the one semi-scan the verify pays
    # anyway (a broadcast hash probe per row, no extra pass), and it
    # catches the staleness direction the index probe cannot: a corpus
    # row appended AFTER the index epoch whose id re-appears in the delta
    corpus = _disjoint_ids_or_raise(corpus, delta, id_col, op)
    if corpus_index is not None:
        if "params" not in corpus_index.columns or "nrm" not in corpus_index.columns:
            raise ValueError(
                f"{op}: corpus_index lacks the nrm/params columns — rebuild "
                "it with lsh_bucket_index (format: id, tbl, bucket, nrm, "
                "params)"
            )
        expected = _lsh_params_tag(n_planes, n_tables, quant, dim)
        # the guard ALSO probes the index ids (narrow frame, scanned
        # anyway): an id present in both the index and the delta raises
        # even if the passed corpus frame is itself stale
        idx = _disjoint_ids_or_raise(
            _non_null_ids(corpus_index, id_col, op, "corpus_index"),
            delta,
            id_col,
            op,
        )
        cb = idx.select(
            F.when(F.col("params") == expected, F.col(id_col))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(f"{op}: corpus_index was built with params "),
                        F.col("params"),
                        F.lit(f" but this call expects {expected} — a "
                              "mismatched plane family silently collapses "
                              "recall, rebuild the index"),
                    )
                )
            )
            .alias("_cid"),
            "tbl",
            "bucket",
            F.col("nrm").alias("_c_nrm"),
        )
    else:
        # (disjointness already guarded unconditionally above — a second
        # probe here would double the per-row broadcast hash probe cost)
        cb = _quantized_bucket_frame(
            corpus, "_cid", n_planes, n_tables, quant, id_col, vec_col, dim,
            with_norm=True,
        ).withColumnRenamed("nrm", "_c_nrm")
    db = F.broadcast(
        _quantized_bucket_frame(
            delta, "_did", n_planes, n_tables, quant, id_col, vec_col, dim
        )
    )
    # corpus x delta collisions; a pair colliding in several tables must
    # verify once, and _c_nrm is functionally dependent on _cid so the
    # distinct key is still the pair
    cross_cand = (
        cb.join(db, ["tbl", "bucket"])
        .filter(F.col("_cid") != F.col("_did"))
        .select("_cid", "_did", "_c_nrm")
        .distinct()
    )
    # delta x delta collisions (within-batch dups)
    db2 = db.select(F.col("_did").alias("_did2"), "tbl", "bucket")
    within_cand = (
        db.join(db2, ["tbl", "bucket"])
        .filter(F.col("_did") < F.col("_did2"))
        .select("_did", "_did2")
        .distinct()
    )

    d_vecs = F.broadcast(
        delta.select(
            F.col(id_col).alias("_did"),
            F.col(vec_col).alias("_d_vec"),
            _norm(F.col(vec_col)).alias("_d_nrm"),
        )
    )
    # the ONLY corpus-vector touch: broadcast-semi-probe to the candidate
    # id set, then project vectors for candidates alone
    cand_ids = cross_cand.select(F.col("_cid").alias(id_col)).distinct()
    c_vecs = corpus.join(F.broadcast(cand_ids), id_col, "left_semi").select(
        F.col(id_col).alias("_cid"), F.col(vec_col).alias("_c_vec")
    )
    # left join + in-plan guard: an index id with no corpus vector is a
    # stale/superset index — fail loudly, never silently drop its pairs
    orphan_guarded_vec = F.when(
        F.col("_c_vec").isNotNull(), F.col("_c_vec")
    ).otherwise(
        F.raise_error(
            F.format_string(
                f"{op}: corpus_index id %s has no vector in the corpus "
                "frame — the index is stale or covers a superset; rebuild "
                "or pass the matching corpus",
                F.col("_cid").cast("string"),
            )
        )
    )
    # staleness tripwire (candidate-set cost only): the stored index norm
    # must EXACTLY equal the live vector's norm — both are the same
    # left-to-right fold over the same doubles, so an in-place vector
    # update under an unrebuilt index (same id, new values — which also
    # invalidates the bucket assignment, not just the norm) trips this
    # for any candidate whose vector changed, instead of silently scoring
    # a mixed-epoch cosine.  An unchanged vector costs one 64-wide fold
    # per CANDIDATE row — never a full-corpus norm scan.
    live_nrm_checked = F.when(
        _norm(F.col("_c_vec")) == F.col("_c_nrm"), F.col("_c_nrm")
    ).otherwise(
        F.raise_error(
            F.format_string(
                f"{op}: corpus vector %s changed since corpus_index was "
                "built (stored norm differs from the live vector's) — the "
                "index's bucket assignment is stale, rebuild it",
                F.col("_cid").cast("string"),
            )
        )
    )
    cross_scored = (
        cross_cand.join(c_vecs, "_cid", "left")
        .withColumn("_c_vec", orphan_guarded_vec)
        .withColumn("_c_nrm", live_nrm_checked)
        .join(d_vecs, "_did")
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("_c_vec"), F.col("_d_vec"))
                / (F.col("_c_nrm") * F.col("_d_nrm")),
                6,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        # orientation normalized at output — a backfilled delta id may be
        # smaller than corpus ids
        .select(
            F.least("_cid", "_did").alias("vec_a"),
            F.greatest("_cid", "_did").alias("vec_b"),
            "cosine",
        )
    )
    d2_vecs = d_vecs.select(
        F.col("_did").alias("_did2"),
        F.col("_d_vec").alias("_d_vec2"),
        F.col("_d_nrm").alias("_d_nrm2"),
    )
    within_scored = (
        within_cand.join(d_vecs, "_did")
        .join(d2_vecs, "_did2")
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("_d_vec"), F.col("_d_vec2"))
                / (F.col("_d_nrm") * F.col("_d_nrm2")),
                6,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("_did").alias("vec_a"),
            F.col("_did2").alias("vec_b"),
            "cosine",
        )
    )
    return cross_scored.unionByName(within_scored)


def semantic_dedup_pairs(
    corpus: DataFrame,
    n_centroids: int = 8,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    coarse-cluster the corpus, then search for near-duplicate pairs only
    WITHIN each cluster — the candidate restriction that makes
    embedding-level dedup tractable at corpus scale.

    Deterministic spec (shared with ivf_topk so the oracle can replicate
    it): centroids = the ``n_centroids`` lowest-id vectors; assignment =
    max-cosine centroid (ties -> smaller centroid id).  Pairs are scored
    with the exact 6dp round-before-threshold cosine contract of
    cosine_near_pairs.

    Scale shape: centroid set broadcast (assignment is map-only); the pair
    search is an equi-join on ``cluster`` — expected work sum_c |c|^2
    instead of N^2, tuned by n_centroids; never a cross join over the
    corpus.  Output: (cluster, vec_a, vec_b, cosine).
    """
    cents = F.broadcast(
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec"))
    )
    # r14 (guide §2.1 — remove shuffles outright): the keep-1 assignment
    # previously duplicated the crossJoin + rank-window plan inline (an
    # n x k row explosion through one Exchange + Sort carrying the
    # vectors); route it through the shared _nearest_centroids helper,
    # whose inline path evaluates the k cosine scores as one codegen'd
    # array expression per row — map-only, IEEE-identical scores, same
    # ties-to-smaller-cent_id (the ivf_topk spec this function shares).
    assigned = _nearest_centroids(
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")),
        cents,
        "cluster",
        1,
        dim,
        metric="cosine",
    ).select(
        "_id",
        "_vec",
        _norm(F.col("_vec"), dim).alias("_nrm"),
        "cluster",
    )
    a = assigned.select(
        F.col("_id").alias("vec_a"),
        F.col("_vec").alias("a_vec"),
        F.col("_nrm").alias("a_nrm"),
        "cluster",
    )
    b = assigned.select(
        F.col("_id").alias("vec_b"),
        F.col("_vec").alias("b_vec"),
        F.col("_nrm").alias("b_nrm"),
        "cluster",
    )
    return (
        a.join(b, "cluster")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("a_vec"), F.col("b_vec"), dim)
                / (F.col("a_nrm") * F.col("b_nrm")),
                6,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("cluster", "vec_a", "vec_b", "cosine")
    )


def ann_recall(
    exact_topk: DataFrame, approx_topk: DataFrame, k: int
) -> DataFrame:
    """Per-query recall@k of an approximate neighbor list against the
    exact one — the evaluation operator every ANN deployment needs next to
    the index itself.  Both inputs use the (query_id, neighbor_id, rank)
    contract of cosine_topk/ivf_topk/lsh_ann_topk; both are deterministic
    here, so the metric itself carries an exact oracle.  One semi-join +
    per-query count: no shuffle wider than the k-row-per-query lists."""
    hits = (
        approx_topk.join(exact_topk, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    qs = exact_topk.select("query_id").distinct()
    return (
        qs.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0)).cast("double") / float(k), 6
            ).alias("recall"),
        )
    )


def _pq_codes_matmul(
    corpus: DataFrame,
    cents: DataFrame,
    n_sub: int,
    sub_dim: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Large-k PQ encode kernel (r14): ONE Arrow ``mapInPandas`` scan
    computing every subspace argmin per batch — replacing the
    crossJoin(|corpus| x k rows) + ``n_sub`` ranking windows + chained
    re-joins plan, which at the 10M x 64-centroid tier puts 640M scored
    rows through a single shuffle (the measured scale killer that
    motivated this kernel; BENCH_IVFPQ.json ``pq_scale_10m`` carries the
    kernel-path build time).

    Bit-parity with the expression plan, the ``_assign_matmul``
    discipline verbatim: sequential fold over each subspace's dims
    (acc += (x_j - c_j)^2, matching ``aggregate()``'s left-to-right
    order), half-up 6dp rounding on the non-negative binary double
    (floor(x*1e6 + 0.5)/1e6 == both engines' round() on these values),
    first-min ``np.argmin`` over the cent_id-SORTED codebook matrix
    (== the window's ties-to-smaller-cent_id), and ``recon_d2`` summed
    over subspaces in m-order before its own half-up rounding (== the
    left-assoc column sum).  Parity is test-pinned against the crossJoin
    plan.  The codebook collects to the driver (bounded k x dim — the
    kmeans precedent), which also fires any undersize guard eagerly."""
    import numpy as np

    rows = sorted(
        cents.select("cent_id", "cent_vec").collect(),
        key=lambda r: r["cent_id"],
    )
    cent_ids = np.asarray([int(r["cent_id"]) for r in rows], dtype="int64")
    C = np.asarray(
        [list(map(float, r["cent_vec"])) for r in rows], dtype=np.float64
    )
    id_field = corpus.schema[id_col]
    out_schema = T.StructType(
        [T.StructField(id_field.name, id_field.dataType)]
        + [T.StructField(f"code{m}", T.LongType()) for m in range(n_sub)]
        + [T.StructField("recon_d2", T.DoubleType())]
    )

    def encode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            data = {id_col: pdf[id_col].to_numpy()}
            total = np.zeros(len(pdf), dtype=np.float64)
            for m in range(n_sub):
                acc = np.zeros((len(pdf), C.shape[0]), dtype=np.float64)
                for j in range(m * sub_dim, (m + 1) * sub_dim):
                    dj = X[:, j][:, None] - C[:, j][None, :]
                    acc += dj * dj
                d = np.floor(acc * 1e6 + 0.5) / 1e6
                idx = np.argmin(d, axis=1)
                data[f"code{m}"] = cent_ids[idx]
                total = total + d[np.arange(len(pdf)), idx]
            data["recon_d2"] = np.floor(total * 1e6 + 0.5) / 1e6
            yield pd.DataFrame(data)

    return corpus.select(id_col, vec_col).mapInPandas(encode, out_schema)


def _pq_codes_inline(
    corpus: DataFrame,
    rows: list,
    n_sub: int,
    sub_dim: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Small-k PQ encode as one map-only projection (r14): per subspace,
    the k 6dp-rounded squared-L2 distances to the collected, cent_id-
    sorted codebook evaluated as a literal-array expression; the code is
    the first-min index mapped through the cent_id list (== the window
    plan's ties-to-smaller-cent_id) and ``recon_d2`` sums the selected
    per-subspace distances in m-order before its own 6dp round (== the
    crossJoin plan's left-assoc column sum).  IEEE-identical operands and
    fold order keep the output row-identical to the crossJoin + ranking-
    windows plan — parity-pinned in tests — while the plan drops one
    Exchange + Sort per subspace and the (n_sub - 1) re-joins."""
    ids = [int(r["cent_id"]) for r in rows]
    id_map = F.lit(ids)

    def d2_arr(m: int) -> Column:
        # ONE nested-array literal per subspace (k x sub_dim, a single
        # plan node) + a higher-order transform — NOT k unrolled
        # per-centroid trees: the compact form keeps the plan node count
        # comparable to the crossJoin branch's column expressions, so
        # downstream catalyst analysis doesn't pay for k copies of the
        # distance tree.  Evaluation is element-wise identical: zip_with
        # pairs the same doubles, the fold adds in the same order, the
        # 6dp round is unchanged.
        cmat_m = F.lit(
            [
                [float(v) for v in r["cent_vec"][m * sub_dim : (m + 1) * sub_dim]]
                for r in rows
            ]
        )
        return F.transform(
            cmat_m,
            lambda c: F.round(
                F.aggregate(
                    F.zip_with(
                        F.slice(F.col(vec_col), m * sub_dim + 1, sub_dim),
                        c,
                        lambda x, y: (x.cast("double") - y.cast("double"))
                        * (x.cast("double") - y.cast("double")),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ),
        )

    staged = corpus.select(
        F.col(id_col),
        *[d2_arr(m).alias(f"_darr{m}") for m in range(n_sub)],
    )
    best = [
        F.array_position(F.col(f"_darr{m}"), F.array_min(f"_darr{m}"))
        for m in range(n_sub)
    ]
    sel = [F.element_at(F.col(f"_darr{m}"), best[m].cast("int")) for m in range(n_sub)]
    recon = sel[0]
    for m in range(1, n_sub):
        recon = recon + sel[m]
    return staged.select(
        id_col,
        *[
            F.element_at(id_map, best[m].cast("int"))
            .cast("bigint")
            .alias(f"code{m}")
            for m in range(n_sub)
        ],
        F.round(recon, 6).alias("recon_d2"),
    )


def pq_codes_df(
    corpus: DataFrame,
    n_sub: int = 4,
    sub_dim: int = 16,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: DataFrame | None = None,
    kernel: str = "auto",
) -> DataFrame:
    """Product-quantization codes: dims split into ``n_sub`` subspaces of
    ``sub_dim``; per-subspace codebook = the ``n_centroids`` lowest-id
    vectors' subvectors (the same deterministic spec as the IVF
    quantizer); code = argmin subspace L2, ties to the smaller centroid
    id.  6dp rounding on each subspace distance keeps argmin ties
    engine-identical, which is what lets PQ carry an exact oracle.

    Output: (vec_id, code0..code{n_sub-1}, recon_d2).  Scale shape: the
    codebook (n_sub x n_centroids x sub_dim doubles) broadcasts;
    assignment is one scan of the corpus.  At small codebooks the
    per-subspace argmin rides ranking windows keyed by vec_id; at
    ``n_centroids >= MATMUL_ASSIGN_MIN_K`` (``kernel="auto"``) the
    encode reroutes through ``_pq_codes_matmul`` — one Arrow scan
    instead of an |corpus| x k row explosion through the shuffle, bit-
    identical output (parity-tested; the ``_nearest_centroids`` /
    kmeans large-k precedent).  ``kernel="expr"``/``"matmul"`` force a
    path.

    Pass ``cents`` (a (cent_id, cent_vec) frame) to encode against a
    FROZEN codebook instead of re-deriving it from ``corpus`` — the
    append path of ``build_ivf_pq_index`` needs this (FAISS ``add()``
    semantics: deltas encode against the codebook the index was built
    with, never against themselves).
    """
    if cents is None:
        cents = (
            corpus.orderBy(id_col)
            .limit(n_centroids)
            .select(
                F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec")
            )
        )
    if kernel == "matmul" or (
        kernel == "auto" and n_centroids >= MATMUL_ASSIGN_MIN_K
    ):
        return _pq_codes_matmul(
            corpus, cents, n_sub, sub_dim, id_col, vec_col
        )
    if kernel == "auto":
        # r14 (guide §2.1 — remove shuffles outright; the c7236f4 keep-1
        # precedent applied to the PQ encode): below the matmul threshold
        # the codebook is bounded by contract, so the per-subspace argmin
        # needs no crossJoin + n_sub ranking windows + (n_sub - 1)
        # re-joins (each window an Exchange + Sort over |corpus| x k
        # scored rows).  Collect the codebook (<= MATMUL_ASSIGN_MIN_K
        # rows; fires any in-plan undersize guard eagerly, the
        # _nearest_centroids/matmul precedent) and evaluate every
        # subspace's k distances as one codegen'd array expression per
        # row — map-only.  Scores mirror the crossJoin branch
        # term-for-term (the centroid slice as a literal double array,
        # same fold, same 6dp rounding), and first-index-of-min over the
        # cent_id-sorted array IS the window's (d2, cent_id) tie-break;
        # parity is test-pinned.  An empty codebook falls through to the
        # crossJoin plan (empty-in/empty-out contract); kernel="expr"
        # keeps the historical plan for the parity tests.
        rows = sorted(
            cents.select("cent_id", "cent_vec").collect(),
            key=lambda r: r["cent_id"],
        )
        if rows:
            return _pq_codes_inline(
                corpus, rows, n_sub, sub_dim, id_col, vec_col
            )
    pairs = corpus.crossJoin(F.broadcast(cents))
    sub_d2 = [
        F.round(
            F.aggregate(
                F.zip_with(
                    F.slice(F.col(vec_col), m * sub_dim + 1, sub_dim),
                    F.slice(F.col("cent_vec"), m * sub_dim + 1, sub_dim),
                    lambda x, y: (x.cast("double") - y.cast("double"))
                    * (x.cast("double") - y.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias(f"d2_{m}")
        for m in range(n_sub)
    ]
    scored = pairs.select(F.col(id_col), F.col("cent_id"), *sub_d2)
    outs = []
    for m in range(n_sub):
        w = Window.partitionBy(id_col).orderBy(F.col(f"d2_{m}"), F.col("cent_id"))
        outs.append(
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select(
                id_col,
                F.col("cent_id").alias(f"code{m}"),
                F.col(f"d2_{m}").alias(f"_d{m}"),
            )
        )
    joined = outs[0]
    for m in range(1, n_sub):
        joined = joined.join(outs[m], id_col)
    return joined.select(
        id_col,
        *[F.col(f"code{m}").cast("bigint").alias(f"code{m}") for m in range(n_sub)],
        F.round(sum(F.col(f"_d{m}") for m in range(n_sub)), 6).alias("recon_d2"),
    )


def _pq_code_long(
    corpus: DataFrame,
    n_sub: int,
    sub_dim: int,
    n_centroids: int,
    id_col: str,
    vec_col: str,
    cents: DataFrame | None = None,
) -> DataFrame:
    """PQ codes melted to (id, m, code) — the join shape the ADC lookup
    wants; shared by pq_adc_topk and ivf_pq_topk."""
    codes = pq_codes_df(
        corpus, n_sub, sub_dim, n_centroids, id_col, vec_col, cents=cents
    )
    return codes.selectExpr(
        id_col,
        "stack({}, {}) AS (m, code)".format(
            n_sub, ", ".join(f"{m}, code{m}" for m in range(n_sub))
        ),
    )


def _subspace_d2_cols(
    n_sub: int, sub_dim: int, a: str = "q_vec", b: str = "cent_vec"
) -> list:
    """Per-subspace 6dp-rounded squared-L2 expressions between columns
    ``a`` and ``b`` — ONE definition of the PQ distance entry shared by
    the whole-vector query table, the residual query table and
    pq_codes_df's spec (same fold, same rounding), so no serving path can
    drift on the quantity ADC sums."""
    return [
        F.round(
            F.aggregate(
                F.zip_with(
                    F.slice(F.col(a), m * sub_dim + 1, sub_dim),
                    F.slice(F.col(b), m * sub_dim + 1, sub_dim),
                    lambda x, y: (x.cast("double") - y.cast("double"))
                    * (x.cast("double") - y.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias(f"qd_{m}")
        for m in range(n_sub)
    ]


def _pq_query_table(
    cents: DataFrame,
    queries: DataFrame,
    n_sub: int,
    sub_dim: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The per-query ADC distance table, melted to (query_id, code, m, d):
    |queries| x n_sub x |cents| 6dp-rounded subspace distances — tiny,
    broadcast at the lookup join; shared by pq_adc_topk, ivf_pq_topk and
    ivf_pq_topk_serve so the table spec cannot drift between the serving
    paths.  ``cents`` is the (cent_id, cent_vec) PQ codebook frame —
    callers derive it from the corpus (batch) or from the persisted
    frozen codebook (serve)."""
    qd = _subspace_d2_cols(n_sub, sub_dim)
    dtab = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
        .crossJoin(F.broadcast(cents))
        .select("query_id", "cent_id", *qd)
    )
    return dtab.selectExpr(
        "query_id",
        "cent_id AS code",
        "stack({}, {}) AS (m, d)".format(
            n_sub, ", ".join(f"{m}, qd_{m}" for m in range(n_sub))
        ),
    )


def _pq_query_table_residual(
    probed_res: DataFrame, fine: DataFrame, n_sub: int, sub_dim: int
) -> DataFrame:
    """The residual-IVF-PQ ADC table: one distance table per (query,
    probed cluster) — residual codes live in a cluster's own coordinate
    frame (x - that cluster's centroid), so the query must be re-centered
    per probed cluster before the subspace distances are taken.
    ``probed_res``: (query_id, cluster, q_vec=query residual vs that
    cluster's centroid).  Output: (query_id, cluster, code, m, d) —
    |Q| x n_probe x pq_centroids x n_sub rounded entries, still
    broadcast-sized."""
    qd = _subspace_d2_cols(n_sub, sub_dim)
    dtab = probed_res.crossJoin(F.broadcast(fine)).select(
        "query_id", "cluster", "cent_id", *qd
    )
    return dtab.selectExpr(
        "query_id",
        "cluster",
        "cent_id AS code",
        "stack({}, {}) AS (m, d)".format(
            n_sub, ", ".join(f"{m}, qd_{m}" for m in range(n_sub))
        ),
    )


def _ivf_pq_params_tag(
    n_centroids: int,
    n_sub: int,
    sub_dim: int,
    pq_centroids: int,
    coarse_metric: str = "cosine",
    residual: bool = False,
    l2_normalize: bool = False,
) -> str:
    """Build-parameter fingerprint persisted with every
    ``build_ivf_pq_index`` row — the IVF-PQ twin of ``_lsh_params_tag``.
    Codes from one (coarse, sub, dim, fine) family are meaningless under
    another family's distance table — probing with mismatched parameters
    silently corrupts every ADC distance — so the serve path checks this
    tag in-plan and fails loudly on any mismatch.  The coarse metric is
    part of the family: an index whose clusters were assigned by trained
    L2 (``coarse_metric="l2"``) must not be probed by max-cosine, so the
    L2 family carries an ``L2`` suffix (the default cosine family's tag
    is unchanged — it is part of the ivf_pq_index oracle contract).
    Likewise RESIDUAL codes (x - coarse centroid) are meaningless under a
    whole-vector distance table and vice versa — the residual family
    appends ``R``.  A NORMALIZED deployment (``l2_normalize`` at ingest,
    the r12 scale_shock fix) appends ``N`` — unit-sphere codes probed by
    un-normalized queries (or vice versa) are the exact mixed-scale
    mismatch the knob exists to prevent; existing stores' tags are
    unchanged (the flag only appends when set)."""
    tag = f"C{n_centroids}M{n_sub}S{sub_dim}K{pq_centroids}"
    return tag + ("L2" if coarse_metric == "l2" else "") + (
        "R" if residual else ""
    ) + ("N" if l2_normalize else "")


def l2_normalize_expr(vec: Column | str) -> Column:
    """Map-only unit-L2 normalization of an embedding column — the
    ingest knob the r12 ``scale_shock`` experiment called for: under
    heterogeneous vector SCALE, an L2-cell probe disagrees with cosine
    truth no matter how fresh the codebook (the measured residue in
    BENCH_CODEBOOK_DRIFT.json), because the mismatch is metric, not
    drift.  On the unit sphere L2 ordering IS cosine ordering
    (||a-b||^2 = 2 - 2cos), so normalizing at ingest makes the trained
    L2 family serve cosine-true.

    Pure column expression (no shuffle, no Python): a left-fold sum of
    squares (deterministic order) and one divide per coordinate, in
    double.  A ZERO vector has no direction — it raises in-plan rather
    than silently landing at the origin of someone's cell.  A NULL norm
    (NULL vector, or any NULL element poisoning the fold) raises the
    same way (r13 ADVICE): all-NULL coordinates would otherwise flow
    silently into codebook training and encoding."""
    v = F.transform(
        F.col(vec) if isinstance(vec, str) else vec,
        lambda x: x.cast("double"),
    )
    nrm = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        F.when(
            nrm.isNull(),
            F.raise_error(
                F.lit(
                    "l2_normalize: NULL vector or NULL element cannot be "
                    "normalized — drop or impute null embeddings before "
                    "ingest"
                )
            ),
        )
        .when(
            nrm == 0.0,
            F.raise_error(
                F.lit(
                    "l2_normalize: zero vector cannot be normalized — drop "
                    "or impute zero embeddings before ingest"
                )
            ),
        )
        .otherwise(F.transform(v, lambda x: x / nrm))
    )


def ivf_pq_centroids(
    corpus: DataFrame,
    n_keep: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The FROZEN IVF-PQ codebook frame: (cent_rank, cent_id, cent_vec) —
    the ``n_keep`` lowest-id corpus vectors ranked 1..n_keep by id (the
    ANN family's deterministic quantizer spec).  Persist it NEXT TO the
    index: appends must encode against THIS frame (FAISS ``add()``
    semantics) and never re-derive centroids from the delta — a delta row
    with a lower id than an existing centroid would otherwise silently
    shift the whole bucket space.  Slice ``cent_rank <= n_centroids`` for
    the coarse codebook and ``<= pq_centroids`` for the fine one
    (``_slice_codebook`` does both with an in-plan undersize guard).
    The single-partition window is fine: the frame is already
    limit-bounded to n_keep rows."""
    return (
        corpus.orderBy(id_col)
        .limit(n_keep)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec"))
        .withColumn(
            "cent_rank", F.row_number().over(Window.orderBy("cent_id"))
        )
        .select("cent_rank", "cent_id", "cent_vec")
    )


def _codebook_fingerprint(cents: DataFrame, out: str) -> DataFrame:
    """One-row content fingerprint of a frozen codebook frame — an
    order-independent sum of per-row hashes over (rank, id, vector).
    Persisted with every index row at build time and recomputed from the
    serve call's frame, so serving an index against a codebook with the
    SAME parameter counts but DIFFERENT content (re-embedded corpus,
    regenerated centroids) fails loudly instead of silently corrupting
    every ADC distance — the staleness direction the params tag cannot
    see (unlike the LSH family, whose md5 planes are fully determined by
    the parameters, the IVF-PQ quantizer IS the codebook data).  pmod
    keeps the per-row term small so the sum cannot overflow; coalesce
    pins the empty-frame fingerprint so empty-vs-nonempty mismatches."""
    return cents.select(
        F.pmod(
            F.xxhash64("cent_rank", "cent_id", "cent_vec"), F.lit(2**31)
        ).alias("_h")
    ).agg(F.coalesce(F.sum("_h"), F.lit(-1)).alias(out))


def _eager_provenance_check(
    index: DataFrame,
    fp_col: str,
    expected_tag: str,
    live_fp: DataFrame,
    op: str,
    sample_rows: int = 16,
) -> None:
    """Driver-side provenance pre-check run BEFORE a serve plan is built
    (r12 ADVICE): the in-plan ``raise_error`` guards only fire for store
    rows that survive partition pruning and the cluster-probe join, so a
    mismatched store whose clusters don't overlap the probed cells would
    return silently empty instead of raising.  This eager check collects
    a BOUNDED sample of the store's (params, fingerprint) — ``limit``
    stops the scan after a handful of rows, never data-sized — plus the
    one-row live fingerprint, and raises on any mismatch at plan build.
    The in-plan check stays as defense in depth: it covers EVERY
    surviving row, catching a mixed-provenance store beyond the sample.
    An empty store passes (nothing was encoded against anything — the
    serve is legitimately empty)."""
    sample = index.select("params", fp_col).limit(sample_rows).collect()
    if not sample:
        return
    live = live_fp.collect()[0][0]
    for r in sample:
        if r["params"] != expected_tag:
            raise ValueError(
                f"{op}: store was built with params {r['params']} but this "
                f"call expects {expected_tag} — the parameter family must "
                "match the one the store was built as (rebuild the store "
                "to change family)"
            )
        if r[fp_col] != live:
            raise ValueError(
                f"{op}: quantizer fingerprint mismatch — the codebook/"
                "bounds presented at serve are not the pair the store was "
                "encoded against (retrained or regenerated quantizer); "
                "rebuild/retrain the store or serve with the persisted pair"
            )


def _codebook_fingerprint_pair(
    coarse: DataFrame, fine: DataFrame, out: str
) -> DataFrame:
    """One-row content fingerprint of a SPLIT codebook (separately trained
    coarse + fine frames — the ``fine_cents`` path): per-row hashes are
    salted with the frame's role before the order-independent sum, so
    swapping the two frames (or serving the coarse frame where the fine
    one was trained) mismatches even when their row multisets coincide.
    The single-frame formula above stays byte-stable for the stand-in
    family (its fingerprint is asserted in persisted-index tests)."""
    a = coarse.select(
        F.pmod(
            F.xxhash64(F.lit("coarse"), "cent_rank", "cent_id", "cent_vec"),
            F.lit(2**31),
        ).alias("_h")
    )
    b = fine.select(
        F.pmod(
            F.xxhash64(F.lit("fine"), "cent_rank", "cent_id", "cent_vec"),
            F.lit(2**31),
        ).alias("_h")
    )
    return a.unionByName(b).agg(
        F.coalesce(F.sum("_h"), F.lit(-1)).alias(out)
    )


def _slice_codebook(
    cents: DataFrame, n: int, what: str, op: str
) -> DataFrame:
    """``cent_rank <= n`` slice of a frozen ``ivf_pq_centroids`` frame,
    raising IN-PLAN if the frame holds fewer than ``n`` centroids — an
    undersized codebook would silently change the quantizer family
    (ranks are dense 1..n_keep by construction, so max(rank) >= n iff
    all n are present).  The guard is a one-row AGGREGATE over the full
    frame cross-joined back onto the slice — not a per-row window — so
    it fires even when the frame is EMPTY and the slice has no rows to
    evaluate a predicate on (the degenerate case a row-scoped guard
    silently passes)."""
    guard = cents.agg(F.max("cent_rank").alias("_mx")).select(
        F.when(F.coalesce(F.col("_mx"), F.lit(0)) >= n, F.lit(1))
        .otherwise(
            F.raise_error(
                F.lit(
                    f"{op}: frozen codebook has fewer than {n} {what} "
                    "centroids — rebuild ivf_pq_centroids with n_keep >= "
                    "max(n_centroids, pq_centroids)"
                )
            )
        )
        .alias("_ok")
    )
    return (
        cents.filter(F.col("cent_rank") <= n)
        .crossJoin(F.broadcast(guard))
        # route cent_id through _ok so column pruning cannot drop the
        # guard expression from the plan (the otherwise branch is
        # unreachable: _ok is 1 on every row the guard emits)
        .select(
            F.when(F.col("_ok") == 1, F.col("cent_id"))
            .otherwise(
                F.raise_error(F.lit(f"{op}: unreachable codebook guard"))
            )
            .alias("cent_id"),
            "cent_vec",
        )
    )


def ivf_residuals(
    corpus: DataFrame,
    cents: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    coarse_metric: str = "l2",
    op: str = "ivf_residuals",
) -> DataFrame:
    """(id, cluster, residual) — each vector re-centered on its coarse
    cell: residual = x - centroid[cluster].  This is what FAISS's
    IndexIVFPQ actually PQ-encodes (by_residual=True, the default): a
    whole-vector PQ spends its entire code budget re-describing the
    coarse structure the cluster id already names, so ADC cannot resolve
    WITHIN-cell ranking; coding the residual points the same bits at
    exactly the within-cell variation ADC needs.  Exposed standalone so
    the residual fine codebook can be TRAINED on the same frame the
    index encodes (kmeans_subspace_codebook over this output).
    Deterministic: the subtraction is an exact IEEE op against
    6dp-rounded centroid coordinates, so residual codes carry the same
    cross-engine oracle as whole-vector codes."""
    coarse = F.broadcast(_slice_codebook(cents, n_centroids, "coarse", op))
    asg = _nearest_centroids(
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")),
        coarse, "cluster", 1, dim, metric=coarse_metric,
        n_cents=n_centroids,
    )
    return (
        asg.join(
            F.broadcast(
                coarse.select(
                    F.col("cent_id").alias("cluster"),
                    F.col("cent_vec").alias("_cent"),
                )
            ),
            "cluster",
        )
        .select(
            F.col("_id").alias(id_col),
            "cluster",
            F.zip_with(
                "_vec", "_cent",
                lambda x, y: x.cast("double") - y.cast("double"),
            ).alias(vec_col),
        )
    )


def build_ivf_pq_index(
    corpus: DataFrame,
    n_centroids: int = 8,
    n_sub: int = 4,
    sub_dim: int = 16,
    pq_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    cents: DataFrame | None = None,
    fine_cents: DataFrame | None = None,
    coarse_metric: str = "cosine",
    residual: bool = False,
    l2_normalize: bool = False,
) -> DataFrame:
    """The persistable IVF-PQ index: (id, cluster, m, code, cb_fp,
    params) — ``n_sub`` rows per vector, each a 1-byte-equivalent code,
    plus the coarse cluster id, the codebook-content fingerprint
    (``_codebook_fingerprint`` — both constants dictionary-encode to
    nothing in parquet) and the build-parameter tag.  This is the third
    persisted delta index (after the MinHash band index and the LSH
    bucket index) and the one a billion-vector ANN deployment actually
    serves from: write it partitioned by ``cluster`` and
    ``ivf_pq_topk_serve`` partition-prunes to n_probe/n_centroids of it.

    Appends encode against the FROZEN codebook (pass ``cents`` — the
    persisted ``ivf_pq_centroids`` frame the initial build used; FAISS
    ``add()`` semantics).  Cluster assignment and codes are per-row
    functions of (vector, codebook), so with a frozen codebook the
    incremental append IS the full rebuild — same contract as the other
    two indexes, test-asserted.  When ``cents`` is None (initial build)
    the codebook is derived from ``corpus`` itself.

    TRAINED quantizers: pass ``cents=kmeans_codebook(...)`` with
    ``coarse_metric="l2"`` (the kmeans assignment spec) and
    ``fine_cents=kmeans_subspace_codebook(...)`` for a separately trained
    PQ codebook.  With ``fine_cents`` the persisted fingerprint covers
    BOTH frames role-salted (``_codebook_fingerprint_pair``), and the
    params tag carries the metric, so serve calls must present the same
    two frames and the same family — both staleness directions stay
    fail-loud.  The serving plan is identical either way.

    RESIDUAL encoding (``residual=True`` — FAISS IndexIVFPQ's
    by_residual default): PQ codes are taken on x - centroid[cluster]
    (``ivf_residuals``), pointing the code budget at within-cell
    variation instead of re-describing the coarse structure.  Train
    ``fine_cents`` on the ``ivf_residuals`` frame; the params tag gains
    ``R`` so a whole-vector serve of a residual index (or vice versa)
    fails loudly.
    """
    corpus = _non_null_ids(corpus, id_col, "build_ivf_pq_index", "input")
    if l2_normalize:
        # map-only unit-sphere projection at ingest (the scale_shock
        # fix); the codebooks must have been trained on normalized
        # vectors — the N in the params tag makes a mixed store/serve
        # fail loudly
        corpus = corpus.withColumn(vec_col, l2_normalize_expr(vec_col))
    if cents is None:
        cents = ivf_pq_centroids(
            corpus, max(n_centroids, pq_centroids), id_col, vec_col
        )
    op = "build_ivf_pq_index"
    coarse = F.broadcast(_slice_codebook(cents, n_centroids, "coarse", op))
    fine = _slice_codebook(
        fine_cents if fine_cents is not None else cents,
        pq_centroids, "PQ", op,
    )
    if residual:
        res = ivf_residuals(
            corpus, cents, n_centroids, id_col, vec_col, dim,
            coarse_metric, op,
        )
        assigned = res.select(id_col, "cluster")
        codes = _pq_code_long(
            res.select(id_col, vec_col), n_sub, sub_dim, pq_centroids,
            id_col, vec_col, cents=fine,
        )
    else:
        assigned = _nearest_centroids(
            corpus.select(
                F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")
            ),
            coarse, "cluster", 1, dim, metric=coarse_metric,
            n_cents=n_centroids,
        ).select(F.col("_id").alias(id_col), "cluster")
        codes = _pq_code_long(
            corpus, n_sub, sub_dim, pq_centroids, id_col, vec_col, cents=fine
        )
    fp = (
        _codebook_fingerprint(cents, "cb_fp")
        if fine_cents is None
        else _codebook_fingerprint_pair(cents, fine_cents, "cb_fp")
    )
    return (
        codes.join(assigned, id_col)
        .crossJoin(F.broadcast(fp))
        .withColumn(
            "params",
            F.lit(
                _ivf_pq_params_tag(
                    n_centroids, n_sub, sub_dim, pq_centroids,
                    coarse_metric, residual, l2_normalize,
                )
            ),
        )
    )


def ivf_pq_topk_serve(
    index: DataFrame,
    cents: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    n_sub: int = 4,
    sub_dim: int = 16,
    pq_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    fine_cents: DataFrame | None = None,
    coarse_metric: str = "cosine",
    residual: bool = False,
    l2_normalize: bool = False,
    eager_check: bool = True,
) -> DataFrame:
    """Serve IVF-PQ top-k from the PERSISTED index — corpus vectors are
    never an input, so the per-query-batch cost is structurally
    independent of corpus float payload: the probe scans
    n_probe/n_centroids of the (int, int, int) code rows (partition-pruned
    when the index is written partitioned by ``cluster``), the query
    distance table (|Q| x n_sub x pq_centroids, 6dp-rounded) broadcasts,
    and the only wide shuffle is the per-query top-k.  The ONLY vector
    math anywhere is queries x centroids (codebook-sized).

    Staleness is fail-loud in BOTH directions: the index's ``params`` tag
    is checked in-plan against this call's (n_centroids, n_sub, sub_dim,
    pq_centroids), AND the index's persisted codebook-content fingerprint
    (``cb_fp``) is checked against one recomputed from THIS call's
    ``cents`` frame — parameters alone cannot see a regenerated or
    re-embedded codebook with the same counts, and either mismatch
    silently corrupts every ADC distance.  Both checks also run EAGERLY
    on a bounded store sample at plan build (``_eager_provenance_check``)
    so a mismatched store raises even when pruning would drop every row.  Serve with the SAME persisted
    codebook frame the build used (a superset frame with identical rows
    fingerprints identically only if it is row-identical — conservative
    by design).  An undersized or empty frozen-codebook frame raises via
    ``_slice_codebook``.

    Output contract identical to ``ivf_pq_topk``: (query_id, neighbor_id,
    rank, adc_d2), rank 1..k by ADC distance asc, ties to the smaller
    neighbor id, self-matches excluded.
    """
    op = "ivf_pq_topk_serve"
    if "params" not in index.columns or "cb_fp" not in index.columns:
        raise ValueError(
            f"{op}: index lacks the params/cb_fp columns — rebuild it with "
            "build_ivf_pq_index (format: id, cluster, m, code, cb_fp, "
            "params)"
        )
    expected = _ivf_pq_params_tag(
        n_centroids, n_sub, sub_dim, pq_centroids, coarse_metric, residual,
        l2_normalize,
    )
    if l2_normalize:
        # the store holds unit-sphere codes: the query must enter the
        # same space before probing/ADC (map-only, like the ingest side)
        queries = queries.withColumn(vec_col, l2_normalize_expr(vec_col))
    live_fp = (
        _codebook_fingerprint(cents, "_live_fp")
        if fine_cents is None
        else _codebook_fingerprint_pair(cents, fine_cents, "_live_fp")
    )
    if eager_check:
        # r14: inline build→serve compositions (ivf_pq_topk and friends)
        # pass eager_check=False — there the index subplan is built from
        # the SAME frames in the SAME plan, so provenance cannot mismatch,
        # while the limit(16) sample would EXECUTE the whole unpersisted
        # index-encode job once at plan build and again at action time
        # (measured: ~half of ivf_pq_topk's build seconds).  Persisted
        # serves (the production path, where the sample is one cheap row-
        # group read) keep the eager guard; the in-plan check below runs
        # for every surviving row either way.
        _eager_provenance_check(index, "cb_fp", expected, live_fp, op)
    idx = index.crossJoin(F.broadcast(live_fp)).select(
        F.when(
            F.col("params") != expected,
            F.raise_error(
                F.concat(
                    F.lit(f"{op}: index was built with params "),
                    F.col("params"),
                    F.lit(
                        f" but this call expects {expected} — a mismatched "
                        "codebook family silently corrupts ADC distances, "
                        "rebuild the index"
                    ),
                )
            ),
        )
        .when(
            F.col("cb_fp") != F.col("_live_fp"),
            F.raise_error(
                F.lit(
                    f"{op}: codebook fingerprint mismatch — the cents "
                    "frame passed to serve is not the one the index was "
                    "built against (regenerated/re-embedded codebook); "
                    "rebuild the index or serve with the persisted frame"
                )
            ),
        )
        .otherwise(F.col(id_col))
        .alias(id_col),
        "cluster",
        "m",
        "code",
    )
    coarse = F.broadcast(_slice_codebook(cents, n_centroids, "coarse", op))
    fine = _slice_codebook(
        fine_cents if fine_cents is not None else cents,
        pq_centroids, "PQ", op,
    )
    probed_full = _nearest_centroids(
        queries.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")),
        coarse, "cluster", n_probe, dim, metric=coarse_metric,
    )
    probed = probed_full.select(F.col("_id").alias("query_id"), "cluster")
    if residual:
        # residual codes live per-cluster: re-center the query on each
        # probed cluster's centroid and take the distance table there —
        # the lookup join gains the cluster key, nothing else changes
        probed_res = probed_full.join(
            F.broadcast(
                coarse.select(
                    F.col("cent_id").alias("cluster"),
                    F.col("cent_vec").alias("_cent"),
                )
            ),
            "cluster",
        ).select(
            F.col("_id").alias("query_id"),
            "cluster",
            F.zip_with(
                "_vec", "_cent",
                lambda x, y: x.cast("double") - y.cast("double"),
            ).alias("q_vec"),
        )
        dtab_long = _pq_query_table_residual(probed_res, fine, n_sub, sub_dim)
        lookup_keys = ["query_id", "cluster", "m", "code"]
    else:
        dtab_long = _pq_query_table(
            fine, queries, n_sub, sub_dim, id_col, vec_col
        )
        lookup_keys = ["query_id", "m", "code"]
    adc = (
        idx.join(F.broadcast(probed), "cluster")
        .join(F.broadcast(dtab_long), lookup_keys)
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("d"), 6).alias("adc_d2"))
        .withColumnRenamed(id_col, "neighbor_id")
    )
    return _topk_per_query(adc, k, ["adc_d2"], extra_cols=("adc_d2",))


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    n_sub: int = 4,
    sub_dim: int = 16,
    pq_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """IVF-PQ — the combined billion-vector serving shape: IVF cluster
    PRUNING (probe only each query's ``n_probe`` nearest coarse clusters,
    n_probe/n_centroids of the data) times PQ COMPRESSION (candidates
    scored by asymmetric distance — n_sub table lookups against the
    query's broadcast distance table, never per-pair float vector math).
    This is what FAISS's IndexIVFPQ computes, expressed as joins.

    Composes the two verified parts with their specs unchanged: the coarse
    quantizer is ``ivf_topk``'s (max-cosine to the ``n_centroids``
    lowest-id vectors, ties to the smaller centroid id, via
    ``_nearest_centroids``) and the fine quantizer/lookup table are
    ``pq_adc_topk``'s (``_pq_code_long`` / ``_pq_query_table``).
    Deterministic end to end, so it carries an exact SQL oracle like the
    rest of the ANN family.

    This batch form IS the persisted pipeline run inline — it builds the
    frozen codebook (``ivf_pq_centroids``), encodes the index
    (``build_ivf_pq_index``) and serves from it (``ivf_pq_topk_serve``),
    so the inline result and the persisted-index result cannot drift; in
    production the first two persist once (index partitioned by
    ``cluster``) and only the serve plan runs per query batch.

    Output: (query_id, neighbor_id, rank, adc_d2); self-matches excluded.
    """
    # the codebook frame feeds four slice subtrees (coarse+fine in both
    # build and serve) — localCheckpoint the <=max(n_centroids,
    # pq_centroids)-row frame so the corpus TakeOrdered runs once, not 4x
    # (same pattern as connected_components' iterative labeling)
    cframe = ivf_pq_centroids(
        corpus, max(n_centroids, pq_centroids), id_col, vec_col
    ).localCheckpoint()
    index = build_ivf_pq_index(
        corpus, n_centroids, n_sub, sub_dim, pq_centroids,
        id_col, vec_col, dim, cents=cframe,
    )
    return ivf_pq_topk_serve(
        index, cframe, queries,
        k=k, n_centroids=n_centroids, n_probe=n_probe, n_sub=n_sub,
        sub_dim=sub_dim, pq_centroids=pq_centroids,
        id_col=id_col, vec_col=vec_col, dim=dim,
        eager_check=False,  # same-plan frames: provenance cannot mismatch
    )


def pq_balanced_perm(
    corpus: DataFrame,
    n_sub: int = 4,
    sub_dim: int = 16,
    vec_col: str = "embedding",
) -> list[int]:
    """Variance-balanced dimension allocation — the OPQ idea (Ge et al.,
    CVPR'13: rotate so subspaces carry equal variance) restricted to its
    PERMUTATION special case, which is the part that stays oracle-exact:
    rank dimensions by per-dim variance (desc, ties to the lower dim) and
    deal them round-robin across the ``n_sub`` subspaces, so no subspace
    hoards the high-variance coordinates while another quantizes noise
    with the same code budget.  Contiguous slicing (plain PQ) is the
    identity layout this replaces when the data's variance is
    position-structured.

    Determinism across engines: the moments are DECIMAL(28,14) sums
    (exact, order-independent — the catalog's TPC-H aggregation rule),
    the variance is rounded to 6dp before ranking, ties go to the lower
    dimension index.  One dim-bounded collect (d rows), the codebook
    precedent.

    Returns the permutation as a 1-based gather list: output position
    ``p`` (0-based) reads input dimension ``perm[p]``, where position
    ``(r-1) % n_sub`` subspace / ``(r-1) // n_sub`` slot holds the
    rank-``r`` dimension.
    """
    f = corpus.select(
        F.posexplode(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("i0", "v")
    ).select((F.col("i0") + 1).alias("i"), "v")
    stats = f.groupBy("i").agg(
        F.sum((F.col("v") * F.col("v")).cast("decimal(28,14)"))
        .cast("double")
        .alias("ss"),
        F.sum(F.col("v").cast("decimal(28,14)")).cast("double").alias("s1"),
        F.count(F.lit(1)).alias("cnt"),
    )
    rows = stats.select(
        "i",
        F.round(
            F.col("ss") / F.col("cnt")
            - (F.col("s1") / F.col("cnt")) * (F.col("s1") / F.col("cnt")),
            6,
        ).alias("v6"),
        "cnt",
    ).collect()
    dim = len(rows)
    if dim != n_sub * sub_dim:
        raise ValueError(
            f"pq_balanced_perm: dim {dim} != n_sub*sub_dim "
            f"{n_sub}*{sub_dim}"
        )
    # ragged-input guard (sq8_train's contiguity check): a ragged
    # embedding column whose DISTINCT dim count happens to equal
    # n_sub*sub_dim would otherwise pass and silently rank per-dim
    # variances computed over differing row counts
    if sorted(r["i"] for r in rows) != list(range(1, dim + 1)):
        raise ValueError(
            "pq_balanced_perm: ragged embedding column — dimensions "
            f"{sorted(r['i'] for r in rows)} are not contiguous from 1"
        )
    if len({r["cnt"] for r in rows}) != 1:
        raise ValueError(
            "pq_balanced_perm: ragged embedding column — per-dimension "
            "row counts differ "
            f"({sorted({r['cnt'] for r in rows})}); variances over "
            "unequal populations are not comparable"
        )
    ranked = sorted(rows, key=lambda r: (-r["v6"], r["i"]))
    perm = [0] * dim
    for r0, row in enumerate(ranked):  # r0 = rank-1
        new_pos = (r0 % n_sub) * sub_dim + (r0 // n_sub)
        perm[new_pos] = int(row["i"])
    return perm


def apply_dim_permutation(
    df: DataFrame, perm: list[int], vec_col: str, out: str
) -> DataFrame:
    """Gather ``vec_col``'s dimensions into ``out`` by the 1-based
    ``perm`` list — an unrolled array constructor, map-only inside
    whole-stage codegen (the permutation analogue of OPQ's rotation
    matmul, free at any scale)."""
    return df.withColumn(
        out,
        F.array(*[F.element_at(F.col(vec_col), p) for p in perm]),
    )


def ivf_pq_topk_balanced(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    n_sub: int = 4,
    sub_dim: int = 16,
    pq_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ over the variance-balanced layout: compute the round-robin
    permutation (``pq_balanced_perm``), gather every vector through it,
    and run the UNCHANGED ``ivf_pq_topk`` composition on the permuted
    column — coarse assignment, codes, ADC table and serve are all the
    verified plain-PQ machinery, because a permutation commutes with
    every distance PQ computes per subspace.  This is exactly how OPQ
    deploys in FAISS (OPQMatrix pre-transform chained in front of an
    untouched IndexPQ), with the transform restricted to the
    oracle-exact permutation case.

    Output: (query_id, neighbor_id, rank, adc_d2) — adc_d2 is the ADC
    distance in the permuted (= original, per-subspace re-bucketed)
    coordinate system.

    Coarse-stage boundary assumption (documented, regression-pinned): the
    probe ranks UNROUNDED cosine summed in PERMUTED dimension order,
    while the oracle's vc CTE sums the unpermuted relation in engine
    order — mathematically identical, IEEE-identical only up to addend
    reorder (~1 ulp).  Like ``_exact_cosine``'s no-ulp-ties rule, the
    entry therefore assumes no two (query, centroid) cosines within ~1
    ulp of each other; the testdata corpora satisfy it, and
    ``test_balanced_pq.py::test_balanced_coarse_assignment_permutation_
    invariant`` pins that the permuted-order assignment equals the
    engine-order one on both SFs (the check that would catch a corpus
    where the assumption breaks)."""
    perm = pq_balanced_perm(corpus, n_sub, sub_dim, vec_col)
    # r14 staged layout (guide §1.2/§5): the permuted corpus is the input
    # to EVERY arm of the downstream ivf_pq_topk composition (codebook
    # TakeOrdered, coarse assignment, the code stage's crossJoin + n_sub
    # ranking windows, the ADC probe) — left lazy, each arm re-evaluates
    # the unrolled 64-element gather subplan, and the repeated copies of
    # that expression tree dominate catalyst/codegen time at any SF.
    # localCheckpoint gathers once per build; deployed OPQ does the same
    # (the pre-transformed vectors are what the index stores — FAISS
    # applies OPQMatrix at add() time, not per probe arm).
    c2 = (
        apply_dim_permutation(corpus, perm, vec_col, "_bvec")
        .select(id_col, "_bvec")
        .localCheckpoint()
    )
    q2 = apply_dim_permutation(queries, perm, vec_col, "_bvec").select(
        id_col, "_bvec"
    )
    # dim deliberately NOT passed (r14): a known dim makes _dot/_norm
    # unroll each cosine into a flat 64-term element_at chain — ~1.3x on
    # the evaluated expression but replicated across every coarse/probe
    # arm of the composition, where the copies dominate catalyst analysis
    # and codegen time.  The compact fold is bit-identical by the _dot
    # contract (same left-to-right addition order), so results are
    # unchanged.
    return ivf_pq_topk(
        c2, q2, k=k, n_centroids=n_centroids, n_probe=n_probe,
        n_sub=n_sub, sub_dim=sub_dim, pq_centroids=pq_centroids,
        id_col=id_col, vec_col="_bvec",
    )


def ivf_pq_balanced_residual_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 20,
    n_centroids: int = 8,
    n_probe: int = 2,
    n_sub: int = 4,
    sub_dim: int = 16,
    pq_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Balanced permutation x RESIDUAL encoding x exact REFINE — the
    full composition the round-11 frontier implied: the variance-
    balanced layout (``pq_balanced_perm``) commutes with residual
    re-centering (a permutation of x - c IS perm(x) - perm(c)) and with
    the refine stage (which scores original vectors), so all three
    verified pieces stack without changing any one's spec.

    Stage layout (each choice is a determinism choice):

    - COARSE assignment and probing run on the ORIGINAL coordinates —
      cosine is permutation-invariant, and staying unpermuted keeps the
      IEEE summation order identical to the oracle's ``vc`` CTE, closing
      for this entry the ulp boundary assumption ``ivf_pq_topk_balanced``
      documents (ADVICE r11).
    - PQ codes are taken on PERMUTED residuals: gather x and the
      assigned stand-in centroid through the permutation, subtract
      (exact IEEE on identical operands), encode with the fine codebook
      = the ``pq_centroids`` lowest-id residual rows (the
      ``_PQ_CODES_TAIL`` spec applied to the residual relation).
    - ADC shortlists per (query, probed cluster) with the residual
      distance table (``_pq_query_table_residual``), then exact cosine
      over ORIGINAL vectors re-ranks the ``shortlist`` — the
      ``ivf_pq_refine_topk`` tail verbatim.

    Scale shape unchanged from the residual+refine stack: the
    permutation is a map-only gather, codes-only store upstream, and the
    refine is the one broadcast-joined float read.  Output: (query_id,
    neighbor_id, rank) — the refine contract.
    """
    perm = pq_balanced_perm(corpus, n_sub, sub_dim, vec_col)
    # dim deliberately NOT threaded into the cosine expressions (r14): a
    # known dim unrolls _dot/_norm into flat 64-term element_at chains
    # whose copies across the assignment/probe arms dominate catalyst
    # analysis and codegen time; the compact fold is bit-identical by the
    # _dot contract (same left-to-right addition order).
    cents = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec")
        )
    )
    assigned = _nearest_centroids(
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")),
        F.broadcast(cents), "cluster", 1,
    ).select(F.col("_id").alias(id_col), "cluster")
    probes = _nearest_centroids(
        queries.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")),
        F.broadcast(cents), "cluster", n_probe,
    ).select(F.col("_id").alias("query_id"), "cluster")

    cperm = apply_dim_permutation(corpus, perm, vec_col, "_bvec").select(
        id_col, "_bvec"
    )
    cent_perm = F.broadcast(
        apply_dim_permutation(cents, perm, "cent_vec", "_bcent").select(
            F.col("cent_id").alias("cluster"), "_bcent"
        )
    )
    res = (
        assigned.join(cperm, id_col)
        .join(cent_perm, "cluster")
        .select(
            id_col,
            "cluster",
            F.zip_with(
                "_bvec", "_bcent",
                lambda x, y: x.cast("double") - y.cast("double"),
            ).alias("_rvec"),
        )
        # r14 staged residuals, the ivf_pq_residual_topk pattern (guide
        # §1.2/§5): the residual relation feeds the fine codebook, the
        # code stage's crossJoin + n_sub ranking windows AND the ADC
        # probe — without staging, each of those arms re-derives the
        # assignment⋈permutation⋈subtract subplan (whose unrolled
        # 64-element gather and inline centroid trees also multiply
        # catalyst/codegen time with every copy).  localCheckpoint
        # materializes it once per build; a production pipeline stages
        # the residual layout to parquet at index-build time, exactly as
        # tools/bench_ivfpq.py does for the 10M tier.
        .localCheckpoint()
    )
    fine = (
        res.orderBy(id_col)
        .limit(pq_centroids)
        .select(
            F.col(id_col).alias("cent_id"), F.col("_rvec").alias("cent_vec")
        )
    )
    codes = _pq_code_long(
        res.select(id_col, "_rvec"), n_sub, sub_dim, pq_centroids,
        id_col, "_rvec", cents=fine,
    )
    qperm = apply_dim_permutation(queries, perm, vec_col, "_bvec").select(
        F.col(id_col).alias("query_id"), "_bvec"
    )
    probed_res = (
        probes.join(qperm, "query_id")
        .join(cent_perm, "cluster")
        .select(
            "query_id",
            "cluster",
            F.zip_with(
                "_bvec", "_bcent",
                lambda x, y: x.cast("double") - y.cast("double"),
            ).alias("q_vec"),
        )
    )
    dtab_long = _pq_query_table_residual(probed_res, fine, n_sub, sub_dim)
    adc = (
        codes.join(assigned, id_col)
        .join(F.broadcast(dtab_long), ["cluster", "m", "code"])
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("d"), 6).alias("adc_d2"))
        .withColumnRenamed(id_col, "neighbor_id")
    )
    short = _topk_per_query(adc, shortlist, ["adc_d2"]).select(
        "query_id", "neighbor_id"
    )
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
            "cosine", _exact_cosine(F.col("q_vec"), F.col("c_vec"))
        )
    )
    return _topk_per_query(sim, k, [F.desc("cosine")])


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_sub: int = 4,
    sub_dim: int = 16,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k — the billion-vector serving
    pattern: the corpus is stored as PQ CODES only (n_sub bytes/vector);
    a query precomputes its distance to every codebook centroid per
    subspace (a |queries| x n_sub x n_centroids table, tiny -> broadcast)
    and each candidate's approximate distance is n_sub table LOOKUPS, no
    float vector math per pair.  Deterministic end to end (6dp-rounded
    table entries, ties to smaller neighbor id), so the approximate index
    itself carries an exact oracle.

    Output: (query_id, neighbor_id, rank, adc_d2) — rank 1..k by
    approximate distance asc; self-matches excluded.
    """
    cents = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec"))
    )
    # one codebook derivation threaded to BOTH quantizer sides — the
    # shared-codebook invariant is structural, not by convention, and the
    # plan pays one corpus TakeOrdered instead of two
    code_long = _pq_code_long(
        corpus, n_sub, sub_dim, n_centroids, id_col, vec_col, cents=cents
    )
    dtab_long = _pq_query_table(cents, queries, n_sub, sub_dim, id_col, vec_col)
    adc = (
        code_long.join(F.broadcast(dtab_long), ["m", "code"])
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("d"), 6).alias("adc_d2"))
        .withColumnRenamed(id_col, "neighbor_id")
    )
    return _topk_per_query(adc, k, ["adc_d2"], extra_cols=("adc_d2",))
