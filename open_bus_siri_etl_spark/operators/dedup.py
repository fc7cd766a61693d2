"""Deduplication operators for training-data pipelines (beyond-reference):
exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the whole point — these must survive 100 TB):
- exact dedup: one hash-aggregate, fully map-side-combinable.
- shingle → posting self-join is the classic distributed candidate
  generation: one shuffle keyed on shingle; hot shingles are the skew risk
  and AQE skew-join splitting handles them (session.py).  Trigram shingles
  keep posting lists short (vs unigrams/bigrams) so the join output stays
  near-linear in the number of true near-dup pairs.
- MinHash: the 64-permutation signature is computed with *md5* as the hash
  family — deliberately, so the DuckDB oracle can reproduce it exactly
  (minhash over lexicographic min of fixed-width hex strings ≡ min over the
  underlying integers).  LSH bands (8 bands × 8 rows) turn all-pairs into an
  equi-join on (band, band_key): only candidate pairs that agree on a full
  band collide, then true Jaccard verifies.  At 100 TB this is the textbook
  near-dup pipeline: everything is hash-partition-able, no driver state.
- SimHash: 64-bit signature as 4×16-bit chunks; pairs agreeing on any chunk
  (hamming-ball banding) are candidates, verified by exact Hamming distance
  via bit_count(xor) per chunk.  Chunked representation doubles as the LSH
  banding key and avoids 64-bit sign issues in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import tokens

MINHASH_PERMS = 64
MINHASH_BANDS = 8  # 8 rows per band
SIMHASH_CHUNKS = 4  # 4 × 16 bits


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Group identical content by md5; canonical = min(doc_id) (first-wins)."""
    return (
        df.select("doc_id", F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def windowed_dedup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    min_gap_sec: int = 3600,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Time-windowed dedup: keep a row only when its key has been quiet for
    ``min_gap_sec`` — the first row of each burst, alert-grouping /
    log-suppression semantics (a repeat inside the window extends it).

    One lag() per key partition: a row survives iff it has no predecessor
    or the gap to the immediately previous SAME-KEY row exceeds the
    window.  Deterministic (ties ordered by ``tiebreak``), one shuffle on
    the key, O(1) state per row — the batch analog of the watermarked
    streaming dedup in streaming/dedup.py, which bounds the same semantics
    by (watermark x arrival rate) instead of a window function.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak)
    gap = F.col(ts_col).cast("long") - F.col("_prev_ts").cast("long")
    return (
        df.withColumn("_prev_ts", F.lag(F.col(ts_col)).over(w))
        .filter(F.col("_prev_ts").isNull() | (gap > min_gap_sec))
        .drop("_prev_ts")
    )


def paragraph_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
) -> DataFrame:
    """Cross-document PARAGRAPH dedup (r14 directive #6) — the standard
    boilerplate-removal pass of public curation pipelines (headers,
    cookie banners, license blocks repeated across millions of pages):
    explode each document on ``sep``, keep the globally FIRST occurrence
    of every distinct paragraph (first-wins by (doc_id, position), the
    ``exact_dedup`` tiebreak), and reassemble each document from its
    surviving paragraphs in original order.

    Shape at 100 TB: one posexplode (map-only fan-out), one shuffle
    keyed on the paragraph string for the first-wins window (paragraph
    rows are bounded by paragraph length, never document length), and
    one shuffle back on doc_id for the ordered reassembly —
    ``array_join(transform(array_sort(collect_list(struct(pos, para))))``
    so no per-document sort window is needed.  Documents whose every
    paragraph was seen earlier disappear from the output (fully
    boilerplate); callers wanting them back left-join on ``id_col``.

    Output: (id_col, dedup_text, n_kept)."""
    import re as _re

    from pyspark.sql import Window

    pos_para = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias(
            "ppos", "para"
        ),
    )
    w = Window.partitionBy("para").orderBy(id_col, "ppos")
    survivors = (
        pos_para.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return survivors.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ppos", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias("dedup_text"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# shingling + n-gram Jaccard
# ---------------------------------------------------------------------------


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column (in-JVM, no explode)."""
    toks = tokens(text)
    parts = F.slice(toks, 1, F.size(toks) - (n - 1))
    gram = F.transform(
        parts,
        lambda x, i: F.concat_ws(
            " ", x, *[F.get(toks, i + k) for k in range(1, n)]
        ),
    )
    return F.array_distinct(gram)


def shingle_postings(
    df: DataFrame, text_col: str = "text", n: int = 3, spread: bool = True
) -> DataFrame:
    """(doc_id, shingle) posting list — the unit the candidate join keys on.

    ``spread`` repartitions the input by doc_id first: the shingle explode
    (and the 64× seed explode downstream of it) amplifies each input row
    ~100-6000×, so a compact input (one parquet file → one split) would pin
    the whole hash chain to a single core.  Input-amplifying operators must
    parallelize on OUTPUT size, not input splits.
    """
    if spread:
        df = df.repartition(
            df.sparkSession.sparkContext.defaultParallelism, "doc_id"
        )
    return df.select(
        "doc_id", F.explode(shingles(text_col, n)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    postings: DataFrame | None = None,
) -> DataFrame:
    """All document pairs with shingle-set Jaccard ≥ threshold.

    posting self-join on shingle → per-pair intersection count → Jaccard
    via |A|+|B|−|A∩B|.  Jaccard is a ratio of exact integers → the double
    division is bit-identical across engines.

    ``postings``: a precomputed (doc_id, shingle) posting frame for ``df``
    (e.g. ``build_shingle_index``, possibly staged) — callers that already
    hold the corpus's posting list skip re-shingling it (r14: the delta
    catalog entries shingle the history ONCE and share the frame between
    the batch pair list and the delta probe).  Same rows either way: the
    posting list is a pure function of the corpus.
    """
    post = (
        postings.select("doc_id", "shingle")
        if postings is not None
        else shingle_postings(df, text_col, n)
    )
    sizes = post.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = post.alias("a")
    b = post.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(post: DataFrame, perms: int = MINHASH_PERMS) -> DataFrame:
    """(doc_id, seed, sig): sig = min over shingles of md5(seed|shingle).

    Fixed-width hex strings compare lexicographically ≡ numerically, so
    min(varchar) is a valid minhash and is reproducible in any engine with
    md5 — which is exactly why md5 is the hash family here.

    Shape: explode seeds × postings, hash, min-aggregate.  The 64× row
    expansion collapses map-side (min is partial-aggregable) so the shuffle
    carries only |docs|×perms rows.  (A nested higher-order-function version
    that builds the signature array in-row was tried and is ~40× slower:
    nested lambdas fall out of whole-stage codegen into interpreted
    evaluation — explode + codegen'd md5 + partial agg is the fast path.)
    """
    seeded = post.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(perms - 1))).alias("seed"),
        "shingle",
    )
    return (
        seeded.select(
            "doc_id",
            "seed",
            F.md5(F.concat_ws("|", F.col("seed"), F.col("shingle"))).alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("sig"))
    )


def lsh_band_keys(
    sigs: DataFrame, bands: int = MINHASH_BANDS, perms: int = MINHASH_PERMS
) -> DataFrame:
    """(doc_id, band, band_key): band_key = md5 of the band's sigs in seed order."""
    rows_per_band = perms // bands
    with_band = sigs.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
    # one conditional-min column per in-band position instead of
    # collect_list+array_sort: declarative min/when stays in codegen'd
    # HashAggregate (collect_list forces the slower ObjectHashAggregate)
    slots = [
        F.min(F.when(F.col("seed") % rows_per_band == k, F.col("sig"))).alias(f"_s{k}")
        for k in range(rows_per_band)
    ]
    return (
        with_band.groupBy("doc_id", "band")
        .agg(*slots)
        .select(
            "doc_id",
            "band",
            F.md5(F.concat_ws(",", *[f"_s{k}" for k in range(rows_per_band)])).alias(
                "band_key"
            ),
        )
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    perms: int = MINHASH_PERMS,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """Candidate pairs from LSH banding, verified by true shingle Jaccard.

    Output: (doc_a, doc_b, jaccard) — pairs sharing ≥1 full band AND true
    Jaccard ≥ threshold.  The banding join touches only (doc, band, key)
    rows (perms/rows_per_band per doc), never all pairs.
    """
    # materialize both reused intermediates: ``post`` feeds sigs + verify,
    # ``keys`` is self-joined (an unmaterialized self-join would recompute
    # the whole signature pipeline for each side)
    post = shingle_postings(df, text_col, n).localCheckpoint(eager=True)
    keys = lsh_band_keys(minhash_signatures(post, perms), bands, perms).localCheckpoint(
        eager=True
    )
    a, b = keys.alias("a"), keys.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # verify candidates with exact Jaccard over the same postings
    sizes = post.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    pa = post.select(F.col("doc_id").alias("doc_a"), "shingle")
    pb = post.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        candidates.join(pa, "doc_a")
        .join(pb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_chunks(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash as 4×16-bit chunk columns (c0..c3).

    Per distinct token: 4 chunk hashes from md5 hex nibbles (conv base16).
    Per chunk bit: +1 if set else −1, summed over tokens; sign → bit.
    Exploded per (token, chunk) then aggregated — two narrow shuffles keyed
    by doc_id, both partial-agg friendly.
    """
    # same input-amplification spread as shingle_postings: tokens × 4 chunks
    # × 16 bits ≈ 4000× per doc — parallelize on output size, not input splits
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, "doc_id")
    tok = df.select("doc_id", F.explode(F.array_distinct(tokens(text_col))).alias("tok"))
    tok = tok.withColumn("h", F.md5("tok"))
    chunk = tok.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_CHUNKS - 1))).alias("chunk"),
        "h",
    ).withColumn(
        "chunk_hash",
        F.conv(F.expr("substring(h, chunk * 4 + 1, 4)"), 16, 10).cast("int"),
    )
    bits = chunk.select(
        "doc_id",
        "chunk",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("bit"),
        "chunk_hash",
    ).withColumn(
        "vote",
        # shiftright/shiftleft Python wrappers demand literal shift amounts;
        # the SQL forms accept column expressions
        F.when(F.expr("shiftright(chunk_hash, bit)").bitwiseAND(1) == 1, 1).otherwise(-1),
    )
    chunk_vals = (
        bits.groupBy("doc_id", "chunk", "bit")
        .agg(F.sum("vote").alias("v"))
        .withColumn("bitval", F.when(F.col("v") > 0, F.expr("shiftleft(1, bit)")).otherwise(0))
        .groupBy("doc_id", "chunk")
        .agg(F.sum("bitval").cast("int").alias("chunk_val"))
    )
    return (
        chunk_vals.groupBy("doc_id")
        .pivot("chunk", list(range(SIMHASH_CHUNKS)))
        .agg(F.first("chunk_val"))
        .select(
            "doc_id",
            *[F.col(str(c)).alias(f"c{c}") for c in range(SIMHASH_CHUNKS)],
        )
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    max_hamming: int = SIMHASH_CHUNKS - 1,
    allow_partial_recall: bool = False,
) -> DataFrame:
    """Pairs within Hamming distance ≤ max_hamming of their 64-bit SimHash.

    Banding completeness (pigeonhole): candidates = pairs agreeing on ≥1 of
    the SIMHASH_CHUNKS chunks, so a pair at distance d is GUARANTEED found
    only when d < SIMHASH_CHUNKS (d ≤ 3 for the 4×16-bit split) — with ≥
    SIMHASH_CHUNKS differing bits, one per chunk is possible and the pair
    shares no chunk.  ``max_hamming`` beyond that bound silently loses
    recall (a d=8 pair with 2 flipped bits per chunk is never a candidate),
    so it is rejected unless the caller opts in with
    ``allow_partial_recall=True`` (sensible on near-dup corpora where
    differing bits cluster, but it is a heuristic there, not a guarantee).
    Exact Hamming always verifies candidates — precision is never affected.
    """
    if max_hamming >= SIMHASH_CHUNKS and not allow_partial_recall:
        raise ValueError(
            f"simhash_near_pairs: max_hamming={max_hamming} exceeds the "
            f"pigeonhole completeness bound of {SIMHASH_CHUNKS}-chunk "
            f"banding (guaranteed recall only for distance < "
            f"{SIMHASH_CHUNKS}); pass allow_partial_recall=True to accept "
            "heuristic recall above it"
        )
    sh = simhash_chunks(df, text_col).localCheckpoint(eager=False)
    cands = None
    for c in range(SIMHASH_CHUNKS):
        a, b = sh.alias("a"), sh.alias("b")
        pairs = a.join(
            b,
            (F.col(f"a.c{c}") == F.col(f"b.c{c}"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        cands = pairs if cands is None else cands.unionByName(pairs)
    cands = cands.distinct()
    a = sh.select(F.col("doc_id").alias("doc_a"), *[F.col(f"c{c}").alias(f"a{c}") for c in range(4)])
    b = sh.select(F.col("doc_id").alias("doc_b"), *[F.col(f"c{c}").alias(f"b{c}") for c in range(4)])
    hamming = sum(
        F.bit_count(F.col(f"a{c}").bitwiseXOR(F.col(f"b{c}"))) for c in range(4)
    )
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def connected_components(
    pairs: DataFrame, a: str = "doc_a", b: str = "doc_b", max_iter: int = 30
) -> DataFrame:
    """Cluster near-dup pairs into components: (node, component=min id).

    Min-label propagation with pointer jumping: each round a node takes the
    smallest label among itself, its neighbors, and its label's label —
    the label-of-label hop is union-find path halving, so convergence is
    O(log diameter) rounds, not O(diameter); a 100-million-node dup graph
    settles in ~8 rounds of small self-joins instead of chasing chains.
    Every round is a hash join on the (deduplicated, symmetric) edge list,
    localCheckpoint-ed to keep the lineage from growing with iterations.

    Only nodes that appear in some pair come back; callers left-join from
    the full corpus and coalesce singletons to themselves.
    """
    sym = pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
    edges = (
        sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # round 0 fused: component = min(self, neighbors)
    labels = edges.groupBy("u").agg(
        F.least(F.first("u"), F.min("v")).alias("component")
    ).localCheckpoint(eager=True)
    ctype = labels.schema["component"].dataType
    prev_ckpt = labels

    for _ in range(max_iter):
        # r14 (guide §2.1/§5): the old label rides the SAME shuffle as the
        # min-label aggregation (max over a column that is NULL on the
        # nbr/hop branches and the old component on the unique own row),
        # so the convergence check below reads the materialized result
        # with a limit-1 scan instead of re-joining the two checkpointed
        # labelings — one multi-stage job per iteration, not two.
        nbr = edges.join(
            labels.select(F.col("u").alias("v"), F.col("component").alias("c")),
            "v",
        ).select("u", "c", F.lit(None).cast(ctype).alias("o"))
        own = labels.select(
            "u", F.col("component").alias("c"), F.col("component").alias("o")
        )
        hop = labels.join(
            labels.select(
                F.col("u").alias("component"), F.col("component").alias("c")
            ),
            "component",
        ).select("u", "c", F.lit(None).cast(ctype).alias("o"))
        new = (
            own.union(nbr)
            .union(hop)
            .groupBy("u")
            .agg(F.min("c").alias("component"), F.max("o").alias("_old"))
            .localCheckpoint(eager=True)
        )
        changed = not new.filter(F.col("component") != F.col("_old")).isEmpty()
        prev_ckpt.unpersist()  # the previous round's checkpointed labeling
        prev_ckpt = new
        labels = new.select("u", "component")
        if not changed:
            break
    return labels.select(F.col("u").alias("node"), "component")


def contamination_overlap(
    train: DataFrame,
    evalset: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_common: int = 2,
) -> DataFrame:
    """Train/eval contamination detection: training documents sharing at
    least ``min_common`` distinct word n-gram shingles with any eval
    document — the decontamination pass an LLM data pipeline runs against
    its benchmark suites before training.

    Output: (doc_id, eval_id, n_common), one row per contaminated
    (train, eval) pair.  Scale shape: the eval side is benchmarks —
    tiny next to a 100 TB corpus — so its posting list is broadcast and
    the train corpus streams past it in one scan; the only shuffle is the
    per-pair count aggregation, whose cardinality is bounded by actual
    overlap, not corpus size.
    """
    tp = shingle_postings(train, text_col, n)
    ep = (
        shingle_postings(evalset, text_col, n, spread=False)
        .withColumnRenamed("doc_id", "eval_id")
    )
    return (
        tp.join(F.broadcast(ep), "shingle")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def contamination_lsh(
    train: DataFrame,
    evalset: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_common: int = 2,
    perms: int = MINHASH_PERMS,
    bands: int = MINHASH_BANDS,
    eval_keys: DataFrame | None = None,
) -> DataFrame:
    """LSH-banded train/eval contamination screen — the n-gram-scale
    sibling of ``contamination_overlap`` (r12 verdict directive #8).

    Where the exact pass streams the train corpus's FULL posting list
    past the broadcast eval postings (each train document explodes to
    ~len(doc) shingle rows, every one of which probes the hash join), a
    100 TB corpus screens via banding: the train side is SIGNED instead
    — 64 minhashes folded to ``bands`` band keys, a CONSTANT ``bands``
    rows per document regardless of length — and probes the eval set's
    persisted band-key index (``build_minhash_index`` over the benchmark
    suite, broadcast: benchmarks are tiny next to the corpus).  Only the
    banded CANDIDATES are re-shingled for the exact-overlap verification
    (a semi-join restriction — O(matches), the ``minhash_delta_dedup``
    verification shape), so per-run work is O(|train| signatures +
    candidates) with the one aggregation shuffle bounded by candidate
    count, never corpus size.

    Pass ``eval_keys`` (the persisted index) to skip re-signing the
    benchmark suite per run; its ``params`` tag is checked in-plan
    against this call's (n, perms, bands), the ``minhash_delta_dedup``
    guard.

    Output: the ``contamination_overlap`` contract — (doc_id, eval_id,
    n_common >= min_common) — RESTRICTED to pairs sharing at least one
    full band (the LSH family's standard banding recall curve: near-
    verbatim contamination, the decontamination target, collides with
    probability ~1).  Measured on the sf0.01 testdata (%10 split,
    8 bands x 8 rows): 6/6 of exact-overlap pairs with jaccard >= 0.8
    are caught, 0/199 of the sub-0.2 incidental-overlap pairs are —
    exactly the S-curve the banding parameters promise (threshold
    ~(1/8)^(1/8) = 0.77)."""
    expected = _minhash_params_tag(n, perms, bands)
    if eval_keys is None:
        eval_keys = build_minhash_index(evalset, text_col, n, perms, bands)
    elif "params" not in eval_keys.columns:
        raise ValueError(
            "contamination_lsh: eval_keys lacks the params column — "
            "rebuild it with build_minhash_index (format: doc_id, band, "
            "band_key, params)"
        )
    eval_keys = eval_keys.select(
        F.when(F.col("params") == expected, F.col("doc_id"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("contamination_lsh: eval_keys was built as "),
                    F.col("params"),
                    F.lit(
                        f" but this call probes {expected} — a mismatched "
                        "band family silently collapses recall; rebuild "
                        "the eval index with matching (n, perms, bands)"
                    ),
                )
            )
        )
        .alias("eval_id"),
        "band",
        "band_key",
    )
    train_keys = lsh_band_keys(
        minhash_signatures(shingle_postings(train, text_col, n), perms),
        bands,
        perms,
    )
    cand = (
        train_keys.join(F.broadcast(eval_keys), ["band", "band_key"])
        .select("doc_id", "eval_id")
        .distinct()
    )
    tp = shingle_postings(
        train.join(
            cand.select("doc_id").distinct(), "doc_id", "left_semi"
        ),
        text_col,
        n,
    )
    ep = shingle_postings(evalset, text_col, n, spread=False).withColumnRenamed(
        "doc_id", "eval_id"
    )
    return (
        tp.join(F.broadcast(ep), "shingle")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .join(cand, ["doc_id", "eval_id"], "left_semi")
        .filter(F.col("n_common") >= min_common)
    )


def minhash_delta_dedup(
    history: DataFrame,
    delta: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    perms: int = MINHASH_PERMS,
    bands: int = MINHASH_BANDS,
    history_keys: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup dedup: a NEW batch against an INDEXED corpus.

    The batch pipeline (minhash_lsh_dedup) re-signs the whole corpus every
    run — wrong at 100 TB, where each ingest adds a sliver.  Here only the
    delta is shingled and signed; the history side contributes its
    PERSISTED band-key index (``history_keys``: doc_id, band, band_key —
    built once via ``build_minhash_index`` and appended per batch), and the
    candidate join probes delta keys against it.  Verification re-shingles
    ONLY the candidate history documents (a semi-join on the candidate ids
    — O(matches), not O(|history|)), so total new work per ingest is
    O(|delta| + matches).

    Output: (doc_a, doc_b, jaccard), doc_a < doc_b, exactly the cross-set
    (history × delta) subset of the batch pipeline's pairs — asserted
    against the full-batch oracle.

    Guards (round-8, mirroring cosine_delta_pairs_lsh): a passed
    ``history_keys`` must carry the ``params`` tag build_minhash_index
    persists, checked in-plan against this call's (n, perms, bands) — a
    mismatched family probes a different band-key space and silently
    collapses recall; and history∩delta doc_id disjointness (the
    definition of a delta ingest — an overlapping id would emit a
    doc_a == doc_b self-pair) is enforced in-plan on the index scan.
    """
    from .similarity import _disjoint_ids_or_raise  # shared guard style

    expected = _minhash_params_tag(n, perms, bands)
    if history_keys is None:
        history_keys = build_minhash_index(history, text_col, n, perms, bands)
    elif "params" not in history_keys.columns:
        raise ValueError(
            "minhash_delta_dedup: history_keys lacks the params column — "
            "rebuild it with build_minhash_index (format: doc_id, band, "
            "band_key, params)"
        )
    history_keys = _disjoint_ids_or_raise(
        history_keys, delta.select("doc_id"), "doc_id", "minhash_delta_dedup"
    ).select(
        F.when(F.col("params") == expected, F.col("doc_id"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("minhash_delta_dedup: history_keys built with params "),
                    F.col("params"),
                    F.lit(f" but this call expects {expected} — rebuild the index"),
                )
            )
        )
        .alias("doc_id"),
        "band",
        "band_key",
    )
    delta_post = shingle_postings(delta, text_col, n).localCheckpoint(eager=True)
    delta_keys = lsh_band_keys(minhash_signatures(delta_post, perms), bands, perms)
    h, d = history_keys.alias("h"), delta_keys.alias("d")
    candidates = (
        h.join(
            d,
            (F.col("h.band") == F.col("d.band"))
            & (F.col("h.band_key") == F.col("d.band_key")),
        )
        .select(F.col("h.doc_id").alias("h_id"), F.col("d.doc_id").alias("d_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # re-shingle only the matched history docs (semi-join, candidate-sized)
    cand_hist = history.join(
        candidates.select(F.col("h_id").alias("doc_id")).distinct(), "doc_id", "semi"
    )
    h_post = shingle_postings(cand_hist, text_col, n, spread=False)

    h_sizes = h_post.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_h"))
    d_sizes = delta_post.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_d"))
    pa = h_post.select(F.col("doc_id").alias("h_id"), "shingle")
    pb = delta_post.select(F.col("doc_id").alias("d_id"), "shingle")
    inter = (
        candidates.join(pa, "h_id")
        .join(pb, ["d_id", "shingle"])
        .groupBy("h_id", "d_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(h_sizes.withColumnRenamed("doc_id", "h_id"), "h_id")
        .join(d_sizes.withColumnRenamed("doc_id", "d_id"), "d_id")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_h") + F.col("n_d") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.least("h_id", "d_id").alias("doc_a"),
            F.greatest("h_id", "d_id").alias("doc_b"),
            "jaccard",
        )
    )


def _minhash_params_tag(n: int, perms: int, bands: int) -> str:
    """Build-parameter fingerprint persisted with every band-index row —
    probed in-plan by minhash_delta_dedup so a mismatched (n, perms,
    bands) family fails loudly instead of silently collapsing recall
    (the text twin of lsh_bucket_index's params tag)."""
    return f"N{n}P{perms}B{bands}"


def build_minhash_index(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    perms: int = MINHASH_PERMS,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """(doc_id, band, band_key, params) — the persistable LSH index of a
    corpus.

    Built once over the history; per ingest, append
    ``build_minhash_index(delta_batch)`` — re-deriving the delta's keys
    costs the same shingle/sign pass its dedup probe already pays, i.e.
    O(|delta|), never O(history) (append-is-rebuild asserted in
    tests/test_training_ops.py).  ``params`` records the build family;
    the probe checks it in-plan, so perms/bands mismatches fail loudly
    (a constant string column dictionary-encodes to nothing in
    parquet)."""
    return lsh_band_keys(
        minhash_signatures(shingle_postings(df, text_col, n), perms), bands, perms
    ).withColumn("params", F.lit(_minhash_params_tag(n, perms, bands)))


def repeated_ngram_spans(
    df: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Exact repeated-span detection: every ``n``-token word window that
    occurs in more than one document, with its occurrence and document
    counts — the scan-friendly sibling of suffix-array substring dedup
    (Lee et al. 2022 "Deduplicating Training Data Makes LMs Better"): a
    span flagged here is a candidate for span-level removal rather than
    whole-document dropping.

    Scale: the explode fans each document into (len-n+1) grams WITHOUT a
    shuffle; the single shuffle is the gram groupBy, whose key is n tokens
    (~tens of bytes) and whose agg is partial-agg friendly.  At 100 TB the
    gram key would be hashed (xxhash64 of the joined tokens) to shrink
    shuffle bytes — kept as text here so the oracle value-checks the spans
    themselves.
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"[a-z0-9]+"), 0)
    base = df.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= n)
    starts = base.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(1).cast("long"), (F.size("toks") - (n - 1)).cast("long"))
        ).alias("i"),
    )
    gram = F.concat_ws(" ", F.slice(F.col("toks"), F.col("i").cast("int"), n))
    return (
        starts.select("doc_id", gram.alias("gram"))
        .groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


def attach_components(
    ids: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """(id, component) for EVERY id — connected_components over the pair
    list, singletons coalesced to themselves.  The shared closure step of
    every near-dup clustering entry (text n-gram, embedding cosine):
    extracting it keeps twin catalog entries from re-deriving the pipeline
    and drifting apart."""
    comp = connected_components(pairs).withColumnRenamed("node", id_col)
    return (
        ids.select(id_col)
        .join(comp, id_col, "left")
        .select(id_col, F.coalesce("component", id_col).alias("component"))
    )


def neardup_membership(
    docs: DataFrame,
    threshold: float = 0.5,
    postings: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, component) for every document: ngram_jaccard_pairs ->
    connected components -> singleton closure — the shared prefix of the
    neardup_components and neardup_survivors catalog entries.

    ``postings``: optional precomputed posting frame for ``docs``, passed
    through to ``ngram_jaccard_pairs`` (same rows, one shingling)."""
    pairs = ngram_jaccard_pairs(
        docs, threshold=threshold, postings=postings
    ).select("doc_a", "doc_b")
    return attach_components(docs, pairs, "doc_id")


def neardup_survivor_rows(
    docs: DataFrame,
    threshold: float = 0.5,
    size_col: str = "n_chars",
    membership: DataFrame | None = None,
) -> DataFrame:
    """One surviving document per near-dup cluster under keep-the-longest
    (max size_col, ties to min doc_id): per-component max + equi-rejoin on
    (component, size), both map-side-combinable aggregates — never a
    global sort.  Output: (component, kept_doc_id, kept_n_chars,
    n_members).

    ``membership``: optional precomputed ``neardup_membership(docs)``
    frame.  A caller that also needs the labeling itself (the delta
    entries feed it to the contraction) passes it here so the
    pair-generation + connected-components chain — whose label
    propagation runs EAGER driver-side iterations — executes once, not
    twice, for identical rows (r14, guide §1.2: don't compute the same
    thing twice)."""
    mem = (
        membership
        if membership is not None
        else neardup_membership(docs, threshold)
    ).join(docs.select("doc_id", size_col), "doc_id")
    best = (
        mem.groupBy("component")
        .agg(
            F.max(size_col).alias("max_chars"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .withColumnRenamed("component", "b_component")
    )
    return (
        mem.join(
            best,
            (F.col("component") == F.col("b_component"))
            & (F.col(size_col) == F.col("max_chars")),
        )
        .groupBy("component", "max_chars", "n_members")
        .agg(F.min("doc_id").alias("kept_doc_id"))
        .select(
            "component",
            "kept_doc_id",
            F.col("max_chars").alias("kept_n_chars"),
            "n_members",
        )
    )


def minhash_jaccard_estimates(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    perms: int = MINHASH_PERMS,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """The ESTIMATOR side of MinHash, with its error made visible: for every
    LSH-banded candidate pair, the signature-agreement estimate
    Pr[sig_a == sig_b] = (matching permutations)/perms — the unbiased
    Jaccard estimator MinHash exists for — next to the exact shingle
    Jaccard.  (minhash_lsh_dedup uses signatures only to BAND; this entry
    evidences the estimator's accuracy contract on the same md5 family.)

    Output: (doc_a, doc_b, n_matching_perms, est_jaccard, jaccard).
    Scale shape: candidates from the band-key equi-join; the estimate join
    touches |candidates| x perms signature rows, the exact verify the
    candidates' postings — nothing all-pairs.
    """
    post = shingle_postings(df, text_col, n).localCheckpoint(eager=True)
    sigs = minhash_signatures(post, perms).localCheckpoint(eager=True)
    keys = lsh_band_keys(sigs, bands, perms)
    a, b = keys.alias("a"), keys.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), "seed", F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), "seed", F.col("sig").alias("sig_b"))
    est = (
        candidates.join(sa, "doc_a")
        .join(sb, ["doc_b", "seed"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.when(F.col("sig_a") == F.col("sig_b"), 1))
            .cast("bigint")
            .alias("n_matching_perms")
        )
        .withColumn(
            "est_jaccard",
            F.round(F.col("n_matching_perms").cast("double") / perms, 6),
        )
    )
    sizes = post.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    pa = post.select(F.col("doc_id").alias("doc_a"), "shingle")
    pb = post.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        candidates.join(pa, "doc_a")
        .join(pb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    exact = (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common")
                * 1.0
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
    return est.join(exact, ["doc_a", "doc_b"]).select(
        "doc_a", "doc_b", "n_matching_perms", "est_jaccard", "jaccard"
    )


def build_shingle_index(
    df: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_id, shingle, params) — the persistable posting index of a
    corpus, the third member of the delta-index family (MinHash band
    index for banded text dedup, LSH bucket index for embeddings, this
    for EXACT-Jaccard delta pairs).  Built once over the history,
    appended with build_shingle_index(batch) per ingest; ``params``
    records the shingle width and is checked in-plan at probe time."""
    from .similarity import _non_null_ids

    return shingle_postings(
        _non_null_ids(df, "doc_id", "build_shingle_index", "input"),
        text_col,
        n,
    ).withColumn("params", F.lit(f"N{n}"))


def jaccard_delta_pairs(
    history: DataFrame | None,
    delta: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    history_postings: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard pairs INVOLVING a delta batch only — the
    per-ingest pair generator for incremental near-dup clustering
    (``ngram_jaccard_pairs``'s delta twin).

    A pair's Jaccard depends only on its two documents' shingle sets, so
    the full-corpus pair list decomposes exactly: pairs(history ∪ delta) =
    pairs(history) ∪ THIS (history × delta posting join + delta × delta) —
    which is what lets ``connected_components_delta`` fold an ingest into
    an existing labeling with a value-level batch oracle.

    Scale shape: the delta's postings broadcast (an ingest batch is small
    by definition); history postings stream through the shingle equi-join
    once — O(|history postings| probe + matches), never a history
    self-join.  Pass ``history_postings`` (a persisted
    ``build_shingle_index`` frame, appendable per ingest like the MinHash
    band index) and the history is never re-SHINGLED either: the
    per-ingest plan is the index scan plus candidate-sized work, with the
    params/NULL/disjointness guards riding the scan in-plan.  Output:
    (doc_a, doc_b, jaccard), doc_a < doc_b, the exact cross+within subset
    of the batch pair list.

    PRECONDITION (ENFORCED in-plan, same as every delta operator here):
    history and delta doc_id sets disjoint; NULL ids raise.
    """
    from .similarity import _disjoint_ids_or_raise, _non_null_ids

    op = "jaccard_delta_pairs"
    delta = _non_null_ids(delta, "doc_id", op, "delta")
    if history_postings is not None:
        # indexed path: the history is never re-shingled — the persisted
        # posting index streams through the candidate equi-join once, and
        # every guard (params, NULL ids, disjointness) rides that scan
        if "params" not in history_postings.columns:
            raise ValueError(
                f"{op}: history_postings lacks the params column — rebuild "
                "it with build_shingle_index (format: doc_id, shingle, "
                "params)"
            )
        expected = f"N{n}"
        guarded = _disjoint_ids_or_raise(
            _non_null_ids(history_postings, "doc_id", op, "history_postings"),
            delta,
            "doc_id",
            op,
        )
        h_post = guarded.select(
            F.when(F.col("params") == expected, F.col("doc_id"))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(f"{op}: history_postings built with params "),
                        F.col("params"),
                        F.lit(
                            f" but this call expects {expected} — a "
                            "different shingle width changes every Jaccard, "
                            "rebuild the index"
                        ),
                    )
                )
            )
            .alias("doc_id"),
            "shingle",
        )
    else:
        history = _non_null_ids(history, "doc_id", op, "history")
        history = _disjoint_ids_or_raise(history, delta, "doc_id", op)
        h_post = shingle_postings(history, text_col, n)
    d_post = shingle_postings(delta, text_col, n).localCheckpoint(eager=True)
    h_sizes = h_post.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    d_sizes = d_post.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))

    def scored(inter: DataFrame, sa: DataFrame, sb: DataFrame) -> DataFrame:
        return (
            inter.join(sa.withColumnRenamed("doc_id", "_ida"), "_ida")
            .join(sb.withColumnRenamed("doc_id", "_idb"), "_idb")
            .withColumn(
                "jaccard",
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
            )
            .filter(F.col("jaccard") >= threshold)
            .select(
                F.least("_ida", "_idb").alias("doc_a"),
                F.greatest("_ida", "_idb").alias("doc_b"),
                "jaccard",
            )
        )

    cross_inter = (
        h_post.join(
            F.broadcast(d_post.select(F.col("doc_id").alias("_idb"), "shingle")),
            "shingle",
        )
        .groupBy(F.col("doc_id").alias("_ida"), "_idb")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    cross = scored(
        cross_inter,
        h_sizes.select("doc_id", F.col("n_sh").alias("n_a")),
        d_sizes.select("doc_id", F.col("n_sh").alias("n_b")),
    )
    within_inter = (
        d_post.select(F.col("doc_id").alias("_ida"), "shingle")
        .join(
            d_post.select(F.col("doc_id").alias("_idb"), "shingle"),
            "shingle",
        )
        .filter(F.col("_ida") < F.col("_idb"))
        .groupBy("_ida", "_idb")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    within = scored(
        within_inter,
        d_sizes.select("doc_id", F.col("n_sh").alias("n_a")),
        d_sizes.select("doc_id", F.col("n_sh").alias("n_b")),
    )
    return cross.unionByName(within)


def contract_delta_pairs(
    labels: DataFrame,
    delta_pairs: DataFrame,
    id_col: str = "doc_id",
    comp_col: str = "component",
) -> DataFrame:
    """Map delta-pair endpoints through the current labeling: a history doc
    contracts to its component label, a delta doc to itself.  The label map
    is only needed for ids that appear in delta pairs — at most 2·|pairs|
    rows — so the full labeling must NEVER be broadcast (at 10^9 history
    docs that is a >16 GB broadcast: OOM, not slow).  Shrink first:
    broadcast the delta-sized endpoint id set, left-semi it against labels
    (history STREAMS through one scan), and broadcast only the surviving
    ≤2·|pairs| (id, component) rows.  Plan-asserted in
    tests/test_plan_quality.py: every BroadcastExchange over the labels
    source sits above that LeftSemi shrink."""
    e = delta_pairs.select(F.col("doc_a").alias("_a"), F.col("doc_b").alias("_b"))
    endpoints = (
        e.select(F.explode(F.array("_a", "_b")).alias(id_col)).distinct()
    )
    lmap = F.broadcast(
        labels.join(F.broadcast(endpoints), id_col, "left_semi")
        .select(F.col(id_col).alias("_lid"), F.col(comp_col).alias("_lc"))
    )
    return (
        e.join(lmap.withColumnRenamed("_lid", "_a").withColumnRenamed("_lc", "_ca"), "_a", "left")
        .join(lmap.withColumnRenamed("_lid", "_b").withColumnRenamed("_lc", "_cb"), "_b", "left")
        .select(
            F.coalesce("_ca", "_a").alias("doc_a"),
            F.coalesce("_cb", "_b").alias("doc_b"),
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
    )


#: measured crossover for the incremental-vs-batch CC dispatch
#: (BENCH_CC_DELTA.json): with |delta| = 500 the delta fold first beats
#: the batch recompute at n_history = 18,000 — history/delta = 36
#: (speedup 1.03; below it, 0.73x/0.90x — the fixed cost of the
#: contract-and-solve plan dominates until history dwarfs the delta).
#: A test pins this constant to the committed artifact's first >=1x tier.
CC_DELTA_MIN_HISTORY_RATIO = 36.0


def resolve_cc_dispatch(
    history_rows: int,
    delta_rows: int,
    min_ratio: float = CC_DELTA_MIN_HISTORY_RATIO,
) -> str:
    """'delta' when the incremental fold is predicted to win, 'batch'
    otherwise — the dispatch rule ``connected_components_delta`` applies
    under ``dispatch='auto'``.  The incremental path's advantage is that
    it never re-solves the history graph, but its contract-and-solve plan
    carries a fixed multi-join cost; below the measured crossover
    (history/delta < ~36, BENCH_CC_DELTA.json) the batch recompute is
    simply cheaper.  Empty deltas dispatch to 'delta' (the fold
    degenerates to a pass-through)."""
    if delta_rows <= 0:
        return "delta"
    return (
        "delta" if history_rows / delta_rows >= min_ratio else "batch"
    )


def connected_components_delta(
    labels: DataFrame,
    delta_ids: DataFrame,
    delta_pairs: DataFrame,
    id_col: str = "doc_id",
    comp_col: str = "component",
    dispatch: str = "delta",
    history_rows: int | None = None,
    delta_rows: int | None = None,
) -> DataFrame:
    """Incremental connected components: fold one ingest's near-dup pairs
    into an EXISTING labeling — the missing per-ingest stage of the delta
    dedup family (pairs have delta twins; clustering used to recompute CC
    over the full graph every ingest).

    Contract-and-solve: every delta pair's endpoints are mapped through
    the current labeling (a history doc contracts to its component label,
    a delta doc to itself), min-label CC runs on that CONTRACTED graph —
    whose size is O(|delta pairs| + touched components), independent of
    the corpus — and history docs inherit their component's new label by
    one equi-join.  Because existing labels are the min doc_id of their
    component, the contracted min-label IS the global min over every
    merged component, so the result equals the batch recomputation
    row-for-row (the catalog oracle for ``neardup_components_delta`` is
    literally the batch entry's SQL).

    ``labels``: (id, component) for every history doc (singletons
    included, as ``attach_components`` emits).  ``delta_ids``: the
    ingested ids (one column, ``id_col``).  ``delta_pairs``:
    (doc_a, doc_b) involving the delta — ``jaccard_delta_pairs`` or any
    other delta pair generator of the same family as the batch labeling.

    Output: (id, component) over history ∪ delta.  PRECONDITION
    (ENFORCED in-plan): labels∩delta id sets disjoint; NULL ids raise.

    DISPATCH (round-10 directive): the incremental fold is NOT always the
    right plan — below the measured crossover (history/delta < ~36,
    BENCH_CC_DELTA.json, constant ``CC_DELTA_MIN_HISTORY_RATIO``) the
    batch recompute wins because the fold's fixed contract-and-solve cost
    dominates.  ``dispatch='delta'`` (default) always folds;
    ``dispatch='batch'`` re-derives the labeling from scratch over the
    EQUIVALENT graph (labels-as-edges ∪ delta pairs — each history doc's
    edge to its component min-id reproduces the history components
    exactly, so the output is row-for-row identical to the fold, just a
    different physical plan); ``dispatch='auto'`` counts the two inputs
    (or takes caller-known ``history_rows``/``delta_rows`` to skip the
    counting jobs) and applies ``resolve_cc_dispatch``.
    """
    from .similarity import _disjoint_ids_or_raise, _non_null_ids

    if dispatch not in ("delta", "batch", "auto"):
        raise ValueError(
            f"connected_components_delta: dispatch={dispatch!r} — "
            "expected 'delta', 'batch' or 'auto'"
        )
    op = "connected_components_delta"
    labels = _non_null_ids(labels, id_col, op, "labels")
    delta_ids = _non_null_ids(delta_ids.select(id_col), id_col, op, "delta_ids")
    labels = _disjoint_ids_or_raise(labels, delta_ids, id_col, op)

    if dispatch == "auto":
        dispatch = resolve_cc_dispatch(
            labels.count() if history_rows is None else history_rows,
            delta_ids.count() if delta_rows is None else delta_rows,
        )
    if dispatch == "batch":
        # history components re-enter as doc->component-min-id edges: the
        # min-label CC over (label edges ∪ delta pairs) names every merged
        # component by its global min id, exactly what the fold produces
        label_edges = labels.select(
            F.col(id_col).alias("doc_a"), F.col(comp_col).alias("doc_b")
        ).filter(F.col("doc_a") != F.col("doc_b"))
        cc = connected_components(
            label_edges.unionByName(delta_pairs.select("doc_a", "doc_b"))
        )
        everyone = labels.select(id_col).unionByName(delta_ids.select(id_col))
        return everyone.join(
            cc, everyone[id_col] == cc["node"], "left"
        ).select(
            id_col, F.coalesce("component", id_col).alias(comp_col)
        )

    contracted = contract_delta_pairs(labels, delta_pairs, id_col, comp_col)
    sub = connected_components(contracted)  # (node, component) — touched only
    relabel = F.broadcast(
        sub.select(F.col("node").alias("_old"), F.col("component").alias("_new"))
    )
    out_history = labels.join(
        relabel, labels[comp_col] == F.col("_old"), "left"
    ).select(
        id_col, F.coalesce("_new", comp_col).alias(comp_col)
    )
    out_delta = delta_ids.join(
        relabel, delta_ids[id_col] == F.col("_old"), "left"
    ).select(
        id_col, F.coalesce("_new", id_col).alias(comp_col)
    )
    return out_history.unionByName(out_delta)


def neardup_survivors_delta(
    survivors: DataFrame,
    labels: DataFrame,
    delta_docs: DataFrame,
    delta_pairs: DataFrame,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
) -> DataFrame:
    """Incremental survivor selection — the stage that completes the delta
    family to the row set a training run actually reads: fold one ingest
    into an EXISTING per-component survivor summary under keep-the-longest
    (max ``size_col``, ties to min id), matching the batch
    ``neardup_survivor_rows`` row-for-row.

    The fold never touches history DOCUMENT rows at all.  The previous
    epoch's survivor rows are a sufficient statistic for the merge: each
    row carries its component's max size and the MIN id among that max's
    ties, so for a merged component the new max is the max over member
    summaries (plus delta docs) and the new kept id is the min over
    exactly those carriers whose max equals the merged max — any doc that
    could beat the carried tie representative would have been that
    component's representative already.  Member counts add likewise.

    Inputs: ``survivors`` = previous epoch's (component, kept_doc_id,
    kept_{size_col}, n_members); ``labels`` = previous (id, component)
    labeling (contraction input only); ``delta_docs`` = ingested
    (id, size); ``delta_pairs`` = this ingest's near-dup pairs (history x
    delta + within-delta, e.g. ``jaccard_delta_pairs``).

    Scale shape (plan-asserted in tests/test_plan_quality.py): UNTOUCHED
    components pass through verbatim — one streaming scan of the survivor
    summary with a broadcast anti probe against the touched-component set,
    NO exchange on that arm; the argmax re-aggregation shuffles only
    touched summaries + delta docs (O(|delta pairs| + touched
    components)).  The contraction reuses ``contract_delta_pairs``'s
    endpoint semi-shrink, so the full labeling is never broadcast either.
    PRECONDITION (ENFORCED in-plan): labels∩delta ids disjoint, NULL ids
    raise.
    """
    from .similarity import _disjoint_ids_or_raise, _non_null_ids

    op = "neardup_survivors_delta"
    labels = _non_null_ids(labels, id_col, op, "labels")
    delta_docs = _non_null_ids(delta_docs, id_col, op, "delta_docs")
    labels = _disjoint_ids_or_raise(labels, delta_docs.select(id_col), id_col, op)

    contracted = contract_delta_pairs(labels, delta_pairs, id_col)
    sub = connected_components(contracted)  # touched nodes only
    relabel = F.broadcast(
        sub.select(F.col("node").alias("_old"), F.col("component").alias("_new"))
    )
    touched = F.broadcast(sub.select(F.col("node").alias("component")).distinct())

    untouched = survivors.join(touched, "component", "left_anti")
    refreshed = survivor_fold(
        survivors.join(touched, "component", "left_semi"),
        delta_docs,
        relabel,
        id_col,
        size_col,
    )
    return untouched.unionByName(refreshed)


def survivor_fold(
    prev: DataFrame,
    delta_docs: DataFrame,
    relabel: DataFrame,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
) -> DataFrame:
    """The merge-argmax core shared by ``neardup_survivors_delta`` and the
    streaming curation loop (keeping the keep-the-longest policy and its
    tie-break in ONE place): previous survivor summaries + delta docs are
    relabeled through ``relabel`` ((_old, _new), broadcastable) and
    re-aggregated per new component — max size wins, ties to min id,
    member counts add.  ``prev``: (component, kept_doc_id,
    kept_<size_col>, n_members) rows for the TOUCHED components only;
    output has the same shape for the refreshed components."""
    kept_size = f"kept_{size_col}"
    old_cand = prev.join(
        relabel, F.col("component") == F.col("_old"), "left"
    ).select(
        F.coalesce("_new", "component").alias("component"),
        F.col("kept_doc_id").alias("_cand_doc"),
        F.col(kept_size).alias("_cand_size"),
        F.col("n_members").alias("_members"),
    )
    delta_cand = delta_docs.join(
        relabel, delta_docs[id_col] == F.col("_old"), "left"
    ).select(
        F.coalesce("_new", id_col).alias("component"),
        F.col(id_col).alias("_cand_doc"),
        F.col(size_col).alias("_cand_size"),
        F.lit(1).cast("long").alias("_members"),
    )
    cand = old_cand.unionByName(delta_cand)
    best = cand.groupBy("component").agg(
        F.max("_cand_size").alias(kept_size),
        F.sum("_members").alias("n_members"),
    )
    return (
        cand.join(best.withColumnRenamed("component", "_bc"),
                  (F.col("component") == F.col("_bc"))
                  & (F.col("_cand_size") == F.col(kept_size)))
        .groupBy("component", kept_size, "n_members")
        .agg(F.min("_cand_doc").alias("kept_doc_id"))
        .select("component", "kept_doc_id", kept_size, "n_members")
    )
