"""Embedding similarity (exact pair scans, IVF/LSH ANN), text quality /
language-ID / fingerprinting, training prep, and the multimodal
mapInPandas plumbing.

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

@register(
    "embedding_cosine_pairs",
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
    note="embedding-cosine near-dup: all-pairs upper triangle, 6dp-rounded cosine "
    "(exact baseline; embedding_lsh_ann is the bucketed scale path)",
)
def embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_near_pairs

    return cosine_near_pairs(t(spark, sf_dir, "embeddings"), threshold=0.4)


@register(
    "embedding_cosine_pairs_blocked",
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
    note="bulk-similarity scale path: Arrow-batched blocked numpy matmul "
    "(partition block × broadcast corpus) — ~14× the expression form at 5k "
    "vectors; same 6dp rounding contract ⇒ same oracle as the exact entry",
)
def embedding_cosine_pairs_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_near_pairs_blocked

    return cosine_near_pairs_blocked(t(spark, sf_dir, "embeddings"), threshold=0.4)


@register(
    "embedding_cosine_pairs_tiled",
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
    note="both-sides-tiled blocked matmul: hash blocks × applyInPandas per "
    "block pair — the path past ~10⁷ vectors where broadcasting the corpus "
    "no longer fits; shuffle volume = n_blocks × corpus",
)
def embedding_cosine_pairs_tiled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_near_pairs_tiled

    return cosine_near_pairs_tiled(
        t(spark, sf_dir, "embeddings"), threshold=0.4, n_blocks=4
    )


@register(
    "embedding_ivf_ann",
    """
    WITH f AS (
        SELECT vec_id, unnest(embedding)::DOUBLE AS v,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ),
    n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM f GROUP BY vec_id),
    cent AS (SELECT vec_id AS cent_id FROM embeddings ORDER BY vec_id LIMIT 8),
    vc AS (
        SELECT a.vec_id, c.cent_id,
               sum(a.v * b.v) / (na.nrm * nb.nrm) AS cos
        FROM f a
        JOIN cent c ON true
        JOIN f b ON b.vec_id = c.cent_id AND b.i = a.i
        JOIN n na ON na.vec_id = a.vec_id
        JOIN n nb ON nb.vec_id = c.cent_id
        GROUP BY a.vec_id, c.cent_id, na.nrm, nb.nrm
    ),
    assigned AS (
        SELECT vec_id, cent_id AS cluster FROM (
            SELECT vec_id, cent_id, row_number() OVER (
                PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS r
            FROM vc) WHERE r = 1
    ),
    probed AS (
        SELECT vec_id AS query_id, cent_id AS cluster FROM (
            SELECT vec_id, cent_id, row_number() OVER (
                PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS r
            FROM vc WHERE vec_id BETWEEN 8 AND 15) WHERE r <= 2
    ),
    d AS (
        SELECT p.query_id, a.vec_id AS neighbor_id, sum(q.v * c.v) AS dot
        FROM probed p
        JOIN assigned a ON a.cluster = p.cluster AND a.vec_id <> p.query_id
        JOIN f q ON q.vec_id = p.query_id
        JOIN f c ON c.vec_id = a.vec_id AND c.i = q.i
        GROUP BY 1, 2
    ),
    s AS (
        SELECT query_id, neighbor_id, dot / (nq.nrm * nc.nrm) AS cosine
        FROM d JOIN n nq ON query_id = nq.vec_id
               JOIN n nc ON neighbor_id = nc.vec_id
    )
    SELECT query_id, neighbor_id, rank FROM (
        SELECT query_id, neighbor_id, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        FROM s) WHERE rank <= 5
    """,
    note="IVF ANN: deterministic coarse quantizer (lowest-id centroids, argmax-cosine "
    "assignment), n_probe=2 cluster probe, exact re-rank inside probed clusters — "
    "the candidate join is an equi-join on cluster (partition-prunable at scale)",
)
def embedding_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_topk

    emb = t(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb, emb.filter(F.col("vec_id").between(8, 15)), k=5, n_centroids=8, n_probe=2
    )




@register(
    "embedding_lsh_ann",
    f"""
    WITH {_LSH_ANN_CTE}
    SELECT query_id, neighbor_id, rank FROM (
        SELECT query_id, neighbor_id, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        FROM s) WHERE rank <= 5
    """,
    note="LSH ANN with a value-level contract END TO END (closes the last "
    "rows-only entry): bucketing = the md5-integer-plane family proven in "
    "embedding_lsh_candidates (floor-quantized vectors, exact integer "
    "projections — bit-identical buckets in any engine), 8 tables x 4 "
    "plane signs, candidates from a (tbl,bucket) equi-join with the query "
    "side broadcast, then exact cosine re-rank of the deduplicated union "
    "(ties -> neighbor_id).  Still ANN — a neighbor sharing no bucket is "
    "missed — but deterministically so, hence oracle-exact; the "
    "seeded-Gaussian variant (lsh_ann_topk) keeps its recall-floor tests",
)
def embedding_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import lsh_ann_topk_exact

    emb = t(spark, sf_dir, "embeddings")
    return lsh_ann_topk_exact(
        emb,
        emb.filter(F.col("vec_id") < 8),
        k=5,
        n_planes=4,
        n_tables=8,
    )


@register(
    "text_quality",
    """
    SELECT doc_id,
           length(text) AS n_chars_calc,
           len(string_split(text, ' ')) AS n_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_bpe_tokens,
           len(list_filter(string_split(text, ' '),
               x -> x IN ('the','a','of','and','to'))) AS n_stopwords,
           len(list_filter(string_split(text, ' '),
               x -> x IN ('the','a','of','and','to'))) * 1.0
               / len(string_split(text, ' ')) AS stopword_ratio,
           (length(text) - len(string_split(text, ' ')) + 1) * 1.0
               / len(string_split(text, ' ')) AS avg_token_len
    FROM documents
    """,
    note="quality scoring: lengths / token counts (whitespace + BPE-ish regex) / "
    "stopword ratio — all codegen'd column expressions, no shuffle",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import with_quality_stats

    return with_quality_stats(t(spark, sf_dir, "documents"))




@register(
    "language_id",
    f"""
    SELECT doc_id, score_en, score_es, score_de, score_fr,
           CASE WHEN score_en >= 0.02 AND score_en = greatest(score_en, score_es, score_de, score_fr) THEN 'en'
                WHEN score_es >= 0.02 AND score_es = greatest(score_en, score_es, score_de, score_fr) THEN 'es'
                WHEN score_de >= 0.02 AND score_de = greatest(score_en, score_es, score_de, score_fr) THEN 'de'
                WHEN score_fr >= 0.02 AND score_fr = greatest(score_en, score_es, score_de, score_fr) THEN 'fr'
                ELSE 'und' END AS predicted_lang
    FROM (
        SELECT doc_id,
{_LANGID_SCORES_SQL}
        FROM documents
    )
    """,
    note="stopword-profile language ID heuristic (argmax over per-language scores)",
)
def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import with_language_id

    return with_language_id(t(spark, sf_dir, "documents"))


@register(
    "doc_fingerprint",
    """
    SELECT doc_id,
           CAST(list_sum(list_transform(string_split(text, ' '),
                (x, i) -> i * (31 * length(x) + ascii(x[1])))) AS BIGINT)
               AS fingerprint
    FROM documents
    """,
    note="positional rolling-hash fingerprint via in-JVM array fold (transform+aggregate)",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import with_fingerprint

    return with_fingerprint(t(spark, sf_dir, "documents"))


@register(
    "training_prep_pipeline",
    f"""
    WITH s AS (
        SELECT doc_id, text,
               len(string_split(text, ' ')) AS n_tokens,
               len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
                   AS n_bpe_tokens,
{_LANGID_SCORES_SQL}
        FROM documents
    ),
    surv AS (
        SELECT doc_id, text, n_tokens, n_bpe_tokens
        FROM s
        WHERE n_tokens BETWEEN 20 AND 80
          AND score_en >= 0.02
          AND score_en = greatest(score_en, score_es, score_de, score_fr)
    )
    SELECT doc_id, n_tokens, n_bpe_tokens FROM (
        SELECT doc_id, n_tokens, n_bpe_tokens,
               row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM surv) WHERE rn = 1
    """,
    note="composite training-data prep: quality gate + language gate + exact "
    "first-wins dedup in ONE scan — all gates are column expressions fused "
    "into the scan; the only shuffle is the dedup hash partition",
)
def training_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import prep_training_corpus

    return prep_training_corpus(t(spark, sf_dir, "documents"))


@register(
    "multimodal_features",
    """
    SELECT doc_id AS media_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(CASE WHEN strlen(text) = 0 THEN -1
                     ELSE ascii(substring(text, 1, 1)) END AS BIGINT)
               AS first_byte,
           CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS checksum,
           'fake/blob' AS format
    FROM documents
    """,
    note="multimodal plumbing: binary column + typed metadata through Arrow-batched "
    "mapInPandas with a deterministic STUB decode (real codecs absent here); the "
    "stub's features (byte length, first byte, md5-prefix checksum) are all "
    "SQL-recomputable, so unlike a real codec the plumbing gets a hash-exact "
    "oracle — documents are ASCII, so ascii(first char) == first byte",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import documents_as_media, extract_features

    feats = extract_features(documents_as_media(t(spark, sf_dir, "documents")))
    return feats.select(
        "media_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.col("first_byte").cast("long").alias("first_byte"),
        F.col("checksum").cast("long").alias("checksum"),
        "format",
    )


@register(
    "multimodal_resize",
    """
    WITH m AS (
        SELECT doc_id AS media_id, text, length(text) AS n FROM documents
    ), r AS (
        SELECT media_id,
               substring(repeat(text, CAST(floor(1024 / n) AS INT) + 1), 1, 1024)
                   AS rep
        FROM m
    )
    SELECT media_id,
           CAST(32 AS BIGINT) AS width, CAST(32 AS BIGINT) AS height,
           CAST(1024 AS BIGINT) AS n_bytes,
           CAST(ascii(substring(rep, 1, 1)) AS BIGINT) AS first_code,
           CAST(ascii(substring(rep, 500, 1)) AS BIGINT) AS mid_code,
           CAST(ascii(substring(rep, 1024, 1)) AS BIGINT) AS last_code
    FROM r
    """,
    note="multimodal resize through Arrow mapInPandas with the deterministic "
    "STUB kernel (truncate/cycle to W*H bytes): the byte arithmetic is "
    "SQL-expressible, so the plumbing gets a hash-checked contract — the "
    "oracle recomputes the resized blob with repeat+substring (documents are "
    "ASCII, so char ops == byte ops) and probes 3 positions",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import documents_as_media, resize_images

    resized = resize_images(
        documents_as_media(t(spark, sf_dir, "documents")), width=32, height=32
    )
    s = F.decode("content", "utf-8")
    return resized.select(
        "media_id",
        F.col("meta.width").cast("long").alias("width"),
        F.col("meta.height").cast("long").alias("height"),
        F.octet_length("content").cast("long").alias("n_bytes"),
        F.ascii(F.substring(s, 1, 1)).cast("long").alias("first_code"),
        F.ascii(F.substring(s, 500, 1)).cast("long").alias("mid_code"),
        F.ascii(F.substring(s, 1024, 1)).cast("long").alias("last_code"),
    )


@register(
    "multimodal_frame_sample",
    """
    WITH m AS (
        SELECT doc_id AS media_id, text,
               CAST(floor(length(text) / 64) AS INT) AS nf
        FROM documents
    ), f AS (
        SELECT media_id, text,
               unnest(generate_series(0, CAST(nf - 1 AS BIGINT), 2)) AS frame_idx
        FROM m
    )
    SELECT media_id, frame_idx,
           substring(text, CAST(frame_idx AS INT) * 64 + 1, 64) AS frame_text
    FROM f
    """,
    note="multimodal frame sampling (1→N flat map through mapInPandas, the "
    "video shape): STUB kernel slices the blob into 64-byte frames and emits "
    "every 2nd — the oracle regenerates every sampled frame's FULL content "
    "with generate_series+substring, so the Arrow fan-out is value-checked "
    "byte-for-byte, not rows-only",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import documents_as_media, sample_frames

    frames = sample_frames(
        documents_as_media(t(spark, sf_dir, "documents")),
        frame_bytes=64,
        every_n=2,
    )
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.decode("frame", "utf-8").alias("frame_text"),
    )
