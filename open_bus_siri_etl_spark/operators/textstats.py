"""Text-analysis operators for training-data pipelines (beyond-reference,
BASELINE.json north star): language-ID heuristic, quality scoring, token
counting, document fingerprinting.

All four are pure native-function column pipelines — no Python UDFs, so they
run inside whole-stage codegen and scale linearly with input splits: a 100 TB
documents table is just more parquet row groups; there is no shuffle in any
of them (per-row transforms + optional aggregation by the caller).

Tokenization contract (shared with the DuckDB oracles): tokens are the
result of splitting on a single space — the synthetic corpus is
space-normalized; a production corpus would add a normalization pass first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# tiny per-language stopword profiles for the n-gram/stopword heuristic;
# deliberately simple + deterministic (real lang-id would ship bigger tables)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
}

ENGLISH_STOPWORDS = LANG_PROFILES["en"]

# BPE-ish tokenization: letter runs, digit runs, or single non-alnum chars
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def tokens(text: Column | str) -> Column:
    return F.split(F.col(text) if isinstance(text, str) else text, " ")


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Regex-based sub-word-ish token count (letters/digits/punct runs)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN))


def stopword_count(text: Column | str, stopwords: tuple[str, ...] = ENGLISH_STOPWORDS) -> Column:
    return F.size(F.filter(tokens(text), lambda x: x.isin(*stopwords)))


def with_quality_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring columns: lengths, token stats, stopword ratio.

    avg_token_len uses the exact identity n_chars = sum(len) + (n_tokens-1)
    for single-space-joined text, keeping it one pass with no explode.
    """
    n_tok = token_count(text_col)
    return df.select(
        "doc_id",
        F.length(text_col).cast("bigint").alias("n_chars_calc"),
        n_tok.cast("bigint").alias("n_tokens"),
        bpe_ish_token_count(text_col).cast("bigint").alias("n_bpe_tokens"),
        stopword_count(text_col).cast("bigint").alias("n_stopwords"),
        (stopword_count(text_col).cast("double") / n_tok).alias("stopword_ratio"),
        (
            (F.length(text_col) - n_tok + 1).cast("double") / n_tok
        ).alias("avg_token_len"),
    )


def language_scores(text_col: Column | str) -> dict[str, Column]:
    n_tok = token_count(text_col).cast("double")
    return {
        lang: (stopword_count(text_col, words).cast("double") / n_tok)
        for lang, words in LANG_PROFILES.items()
    }


def predicted_language(text_col: Column | str, min_score: float = 0.02) -> Column:
    """Argmax language over the stopword-profile scores as a single Column —
    branch-free CASE chain, ties broken by profile order (en > es > de > fr);
    below ``min_score`` → 'und'."""
    scores = language_scores(text_col)
    best = F.greatest(*scores.values())
    predicted = F.lit("und")
    # build reverse-priority CASE chain so earlier profiles win ties
    for lang in reversed(list(LANG_PROFILES)):
        predicted = F.when(
            (scores[lang] >= min_score) & (scores[lang] == best), F.lit(lang)
        ).otherwise(predicted)
    return predicted


def with_language_id(df: DataFrame, text_col: str = "text", min_score: float = 0.02) -> DataFrame:
    """Stopword-profile language ID: score each profile, take the argmax."""
    scores = language_scores(text_col)
    return df.select(
        "doc_id",
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_PROFILES],
        predicted_language(text_col, min_score).alias("predicted_lang"),
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Positional rolling-hash document fingerprint.

    fp = Σ_i  i · (31·len(tok_i) + ascii(tok_i[0]))   (i 1-based)

    Computed as an in-JVM array fold (transform + aggregate) — no explode, no
    shuffle, exact integer arithmetic so the DuckDB oracle matches bit-for-bit.
    """
    toks = tokens(text_col)
    terms = F.transform(
        toks,
        lambda x, i: (
            (i + 1) * (F.length(x) * 31 + F.ascii(F.substring(x, 1, 1)))
        ).cast("bigint"),
    )
    fp = F.aggregate(terms, F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    return df.select("doc_id", fp.alias("fingerprint"))


def prep_training_corpus(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 80,
    lang: str = "en",
) -> DataFrame:
    """Composite training-data prep: quality gate → language gate → exact
    dedup, as ONE scan.

    Every gate is a column expression over the same row, so the filters fuse
    into the scan (no self-joins between derived tables); the only shuffle
    is the dedup's hash partition on the text.  Output: surviving
    (doc_id, n_tokens, n_bpe_tokens), keeping the lowest doc_id per distinct
    text (first-wins, reference dedup semantics D2).
    """
    from pyspark.sql import Window

    n_tok = token_count(text_col)
    surv = df.filter(
        n_tok.between(min_tokens, max_tokens)
        & (predicted_language(text_col) == lang)
    ).select(
        "doc_id",
        F.col(text_col).alias("_text"),
        n_tok.cast("bigint").alias("n_tokens"),
        bpe_ish_token_count(text_col).cast("bigint").alias("n_bpe_tokens"),
    )
    w = Window.partitionBy("_text").orderBy("doc_id")
    return (
        surv.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "n_tokens", "n_bpe_tokens")
    )


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition quality signals (the Gopher/RefinedWeb-style filters):
    duplicate-token and duplicate-bigram fractions per document.

    Boilerplate, keyword-stuffed, and degenerate generated text scores high
    on dup_bigram_frac while normal prose stays low, so training pipelines
    threshold on it after the basic length gates.  All column expressions —
    the bigram list materializes per row inside codegen and never crosses a
    shuffle; there is NO shuffle at all in this op.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", F.get(toks, i), F.get(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_bg = F.size(bigrams)
    n_bg_d = F.size(F.array_distinct(bigrams))
    return df.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
        n_bg.cast("bigint").alias("n_bigrams"),
        n_bg_d.cast("bigint").alias("n_distinct_bigrams"),
        F.when(n_bg > 0, (n_bg - n_bg_d) * 1.0 / n_bg)
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_frac"),
    )


def shuffle_shards(
    df: DataFrame, n_shards: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic pre-training shuffle + shard assignment.

    shard = first 32 bits of md5(id) mod n_shards (content-hash uniform, no
    RNG state); pos_in_shard = rank of the full md5 within the shard.  The
    hash IS the shuffle: adjacent source rows scatter uniformly, yet the
    layout is exactly reproducible run-to-run.  One hash shuffle per shard
    window, all shards in parallel — no global sort, no single-partition
    window; at scale, write with partitionBy(shard) and the per-shard order
    becomes the file order.
    """
    from pyspark.sql import Window

    base = df.select(F.col(id_col).alias("doc_id"))
    h = F.md5(F.col("doc_id").cast("string"))
    shard = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"), F.lit(n_shards)
    ).cast("bigint")
    w = Window.partitionBy("shard").orderBy(h, F.col("doc_id"))
    return (
        base.withColumn("shard", shard)
        .withColumn("pos_in_shard", (F.row_number().over(w) - 1).cast("bigint"))
    )


# -- PII scrubbing -----------------------------------------------------------

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+1-555-[0-9]{4}"


def scrub_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "scrubbed"
) -> DataFrame:
    """Redact emails/phones from a text column, counting each redaction.

    Training-data hygiene pass: pure regexp_replace/regexp_count column
    expressions (RE2-compatible patterns, so an external SQL engine agrees
    byte-for-byte), fused into the scan — zero shuffle at any corpus size.
    Extend by appending (pattern, token) pairs; each costs one more fused
    regexp pass, never a new stage.
    """
    c = F.col(text_col)
    return df.withColumn("n_emails", F.regexp_count(c, F.lit(EMAIL_PATTERN))).withColumn(
        "n_phones", F.regexp_count(c, F.lit(PHONE_PATTERN))
    ).withColumn(
        out_col,
        F.regexp_replace(
            F.regexp_replace(c, EMAIL_PATTERN, "<EMAIL>"),
            PHONE_PATTERN,
            "<PHONE>",
        ),
    )


# -- BM25 ranking ------------------------------------------------------------

WORD_PATTERN = r"[a-z0-9]+"


def bm25_rank(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """BM25 score of every document for a bag-of-terms query; top_k rows.

    Retrieval-quality scoring for corpus curation: two scans total —
    per-doc term frequencies + doc length fuse into the first scan; the
    corpus stats (N, avgdl, per-term df) are ONE global aggregate whose
    single row is broadcast back (no driver collect), then scoring is
    map-only and TopK is a partial-topK-per-partition sort.  At 100 TB the
    only full-data exchange is the 1-row stats aggregate's.

    Float parity contract: all arithmetic is written as literal double
    expressions in a fixed operand order so an external engine evaluating
    the same formula reproduces scores bit-for-bit (ties broken by doc_id).
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0)

    def term_freq(term: str):
        # single-arg lambda: a 2-arg one would be given (element, index)
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    d = docs.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[term_freq(term).alias(f"tf_{term}") for term in terms],
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.count(F.when(F.col(f"tf_{t}") > 0, 1)).alias(f"df_{t}")
            for t in terms
        ],
    )
    scored = d.crossJoin(F.broadcast(stats))
    score = None
    for t in terms:
        tf, df = F.col(f"tf_{t}"), F.col(f"df_{t}")
        part = (
            F.log(F.lit(1) + (F.col("n") - df + F.lit(0.5)) / (df + F.lit(0.5)))
            * (tf * F.lit(k1 + 1))
            / (tf + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")))
        )
        score = part if score is None else score + part
    return (
        scored.select("doc_id", score.alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(top_k)
    )


def inverted_index(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus inverted-index postings summary: one row per term with
    document frequency and total term frequency.

    The two-level aggregation — (term, doc) partials first, then term
    totals — replaces a count(DISTINCT doc_id) with two map-side-combinable
    aggs, the scale-correct shape for a 100 TB corpus (a distinct-agg would
    carry every (term, doc) pair through one exchange un-combined).
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0)
    per_doc = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def unigram_surprisal(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document unigram surprisal (C4/Gopher-style quality signal):
    sum over tokens of ln(corpus unigram probability), in integer
    micro-nats.

    Low (very negative) average surprisal == rare-token-heavy documents;
    the classic cheap proxy for boilerplate/garbage filtering.  Dataflow:
    one posting explode, a term-frequency agg joined back onto the
    postings (shuffle on term — Zipf-skewed, which AQE's skew-join split
    handles; salting is the manual fallback), the corpus total broadcast
    as a 1-row aggregate.  Each token's ln(p) is rounded to integer
    micro-nats BEFORE summing, so the per-doc sum is exact integer
    arithmetic — order-independent and engine-portable (a raw double sum
    would hash-mismatch on summation order).
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0)
    tok = docs.select("doc_id", F.explode(toks).alias("term"))
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    total = freq.agg(F.sum("tf").cast("double").alias("total"))
    per_term = (
        F.round(F.log(F.col("tf") / F.col("total")) * F.lit(1000000.0), 0)
    ).cast("long")
    return (
        tok.join(freq, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum(per_term).alias("lp_micro_sum"),
        )
    )


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_stop_frac: float = 0.01,
    min_uniq_frac: float = 0.2,
) -> DataFrame:
    """Gopher-style rule-based quality filter (Rae et al. 2021 §A1.1 shape):
    word-count bounds, mean-word-length band, minimum stopword fraction,
    minimum unique-word fraction — each emitted as a column plus an overall
    ``passes`` verdict, so downstream mixtures can slice by failure reason.

    Everything is higher-order array functions over ONE tokenization — no
    explode, no shuffle, no Python: at 100 TB this is a map-only pass that
    rides whole-stage codegen.  The fractions are single IEEE divisions of
    exact integer counts, keeping them bit-identical to the SQL oracle.
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0)
    out = df.withColumn("_toks", toks).filter(F.size("_toks") > 0)
    n_words = F.size("_toks").cast("long")
    char_sum = F.aggregate(
        F.transform(F.col("_toks"), lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    stop_arr = F.array(*[F.lit(s) for s in ENGLISH_STOPWORDS[:2]])
    n_stop = F.size(
        F.filter(F.col("_toks"), lambda x: F.array_contains(stop_arr, x))
    ).cast("long")
    n_uniq = F.size(F.array_distinct("_toks")).cast("long")
    mean_len = char_sum.cast("double") / n_words
    stop_frac = n_stop.cast("double") / n_words
    uniq_frac = n_uniq.cast("double") / n_words
    passes = (
        n_words.between(min_words, max_words)
        & mean_len.between(min_mean_len, max_mean_len)
        & (stop_frac >= min_stop_frac)
        & (uniq_frac >= min_uniq_frac)
    )
    return out.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        stop_frac.alias("stop_frac"),
        uniq_frac.alias("uniq_frac"),
        passes.alias("passes"),
    )


def prefix_dup_groups(
    df: DataFrame, text_col: str = "text", prefix_tokens: int = 4
) -> DataFrame:
    """Template/boilerplate detection: documents sharing their first
    ``prefix_tokens`` tokens are near-certain copies of a generation
    template (the cheap precursor to MinHash — one groupBy on a short
    string key instead of a signature join).

    Scale: the prefix is tiny (few tens of bytes) regardless of document
    size, so the shuffle moves O(docs * prefix) bytes, and the aggregation
    is partial-agg friendly; at 100 TB this is the cheapest dedup signal
    in the toolbox.
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0)
    prefix = F.concat_ws(" ", F.slice(toks, 1, prefix_tokens))
    return (
        df.select(prefix.alias("prefix"), "doc_id")
        .groupBy("prefix")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


def length_band_filter(
    df: DataFrame,
    group_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
    low_pct: int = 5,
    high_pct: int = 95,
) -> DataFrame:
    """Per-group length-band outlier trim: drop the shortest ``low_pct``%
    and the longest ``100-high_pct``% of each group, by exact rank (not
    approximate quantiles — the cut is reproducible run to run, which a
    training-mixture spec needs).

    The rank test is pure integer arithmetic (rn*100 > n*low) so the kept
    set is bit-identical to the SQL oracle.  Scale: one window shuffle
    partitioned by ``group_col``; with few giant groups the same trim
    should run on the approx-quantile path instead (value_quantiles_cont
    shows it) — this exact variant is for the many-moderate-groups regime.
    """
    w = Window.partitionBy(group_col).orderBy(F.col(order_col), F.col(id_col))
    wc = Window.partitionBy(group_col)
    ranked = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(wc)
    )
    return ranked.filter(
        (F.col("_rn") * 100 > F.col("_n") * low_pct)
        & (F.col("_rn") * 100 <= F.col("_n") * high_pct)
    ).drop("_rn", "_n")


def filter_stack_report(df: DataFrame, lang: str = "en") -> DataFrame:
    """The assembled pre-training FILTER STACK: language gate -> Gopher
    rule filter -> repetition gate, each verdict exposed per document plus
    the final keep and the FIRST failing stage (the reporting shape a
    curation run needs — per-reason drop counts fall out of one groupBy).

    Composes the already-verified single-pass operators
    (gopher_quality_flags, with_repetition_stats) through doc_id joins —
    each stage is map-only, so the stack costs two hash joins on doc_id
    over per-doc verdict rows, never a second pass over text.
    """
    gq = gopher_quality_flags(df).select(
        "doc_id", F.col("passes").alias("_gopher")
    )
    rep = with_repetition_stats(df).select(
        "doc_id", (F.col("dup_bigram_frac") < 0.3).alias("_rep")
    )
    out = (
        df.select("doc_id", "lang")
        .join(gq, "doc_id", "left")
        .join(rep, "doc_id", "left")
        .select(
            "doc_id",
            (F.col("lang") == lang).alias("lang_keep"),
            # docs with zero word tokens have no gopher row -> fail
            F.coalesce("_gopher", F.lit(False)).alias("gopher_keep"),
            F.coalesce("_rep", F.lit(False)).alias("repetition_keep"),
        )
    )
    return out.select(
        "doc_id",
        "lang_keep",
        "gopher_keep",
        "repetition_keep",
        (F.col("lang_keep") & F.col("gopher_keep") & F.col("repetition_keep")).alias(
            "keep"
        ),
        F.when(~F.col("lang_keep"), "lang")
        .when(~F.col("gopher_keep"), "gopher")
        .when(~F.col("repetition_keep"), "repetition")
        .otherwise("none")
        .alias("drop_reason"),
    )
