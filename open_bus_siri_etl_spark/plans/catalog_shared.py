"""Cross-entry SQL fragments and tuning constants shared by several
catalog entries — one definition each so twins cannot drift (the
_LSH_ANN_CTE / _POSTINGS_CTE reuse discipline, now module-scoped after
the round-8 catalog split).  Pure strings and ints: no imports.
"""

GAP_MINUTES = 30
CHUNK_SIZE = 100

PACK_BUDGET = 2048
PACK_STREAMS = 8

_TOKS = "string_split(text, ' ')"
_TRIGRAMS = (
    "list_transform(list_slice(string_split(text,' '), 1, len(string_split(text,' '))-2), "
    "(x, i) -> x || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])"
)
_POSTINGS_CTE = f"""
    tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    post AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id,
                   unnest(list_transform(list_slice(toks, 1, len(toks)-2),
                          (x, i) -> x || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
            FROM tok)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM post GROUP BY doc_id)
"""

# The exact-LSH bucketing stage as a shared CTE chain (8 tables x 4
# md5-integer plane signs, floor-quantized vectors, per-vector norms).
# Composed into _LSH_ANN_CTE (queries vec_id < 8 + exact cosine of the
# candidate union) and into embedding_delta_pairs_lsh's delta-restricted
# candidate join, the same way the Python side shares
# _quantized_bucket_frame — retuning one consumer cannot silently
# de-couple it from the plane family the others use.
_LSH_BUCKETS_CTE = """f AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
               unnest(embedding)::DOUBLE AS v
        FROM embeddings
    ),
    q AS (SELECT vec_id, i, CAST(floor(v * 1000.0) AS BIGINT) AS qv FROM f),
    planes AS (
        SELECT t.t, p.p, i.i,
               (('0x' || substr(md5(t.t::VARCHAR || '_' || p.p::VARCHAR
                                || '_' || i.i::VARCHAR), 1, 8))::BIGINT
                % 1001) - 500 AS qw
        FROM generate_series(0, 7) t(t)
        CROSS JOIN generate_series(0, 3) p(p)
        CROSS JOIN generate_series(0, 63) i(i)
    ),
    dots AS (
        SELECT q.vec_id, pl.t, pl.p, sum(q.qv * pl.qw) AS dot_q
        FROM q JOIN planes pl ON q.i = pl.i
        GROUP BY 1, 2, 3
    ),
    buckets AS (
        SELECT vec_id, t,
               CAST(sum(CASE WHEN dot_q > 0 THEN 1 << p ELSE 0 END)
                    AS INTEGER) AS bucket
        FROM dots GROUP BY vec_id, t
    ),
    n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM f GROUP BY vec_id)"""

# The ANN tail over the shared bucket stage: queries vec_id < 8 probe their
# buckets, exact cosine on the deduplicated candidate union in `s`.  Shared
# between embedding_lsh_ann and lsh_ann_recall_eval so the recall eval can
# never drift from the index it claims to measure.
_LSH_ANN_CTE = f"""{_LSH_BUCKETS_CTE},
    cand AS (
        SELECT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
        FROM buckets qb
        JOIN buckets cb ON qb.t = cb.t AND qb.bucket = cb.bucket
                       AND cb.vec_id <> qb.vec_id
        WHERE qb.vec_id < 8
        GROUP BY 1, 2
    ),
    d AS (
        SELECT c.query_id, c.neighbor_id, sum(a.v * b.v) AS dot
        FROM cand c
        JOIN f a ON a.vec_id = c.query_id
        JOIN f b ON b.vec_id = c.neighbor_id AND b.i = a.i
        GROUP BY 1, 2
    ),
    s AS (
        SELECT query_id, neighbor_id, dot / (nq.nrm * nc.nrm) AS cosine
        FROM d JOIN n nq ON query_id = nq.vec_id
               JOIN n nc ON neighbor_id = nc.vec_id
    )"""

_LANGID_SCORES_SQL = ",\n".join(
    f"""           len(list_filter(string_split(text, ' '),
               x -> x IN ({", ".join("'" + w + "'" for w in words)}))) * 1.0
               / len(string_split(text, ' ')) AS score_{lang}"""
    for lang, words in [
        ("en", ("the", "a", "of", "and", "to")),
        ("es", ("el", "la", "de", "que", "y")),
        ("de", ("der", "die", "und", "das", "ist")),
        ("fr", ("le", "la", "et", "les", "des")),
    ]
)

_IVF_QUANTIZER_CTE = """
    f AS (
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
    )
"""
