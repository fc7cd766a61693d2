"""Sequence packing — assembling documents into fixed token-budget training
sequences (beyond-reference, BASELINE.json north star; the data-prep step
between dedup/quality filtering and the trainer's dataloader).

Two packing disciplines, both deterministic and both exactly oracle-checkable:

- ``concat_chunk_pack``: GPT-style "concatenate the stream, cut every
  ``budget`` tokens" — documents may straddle chunk boundaries; a document
  is labeled with the chunk where it STARTS and its token offset in it.
  Pure window arithmetic (exclusive running sum), no Python.
- ``greedy_pack``: bin-respecting greedy fill — a document never straddles;
  a new pack starts whenever appending would exceed ``budget`` (an oversized
  document gets a pack of its own).  The reset-on-overflow running sum is
  inherently sequential per stream, so it runs as ``applyInPandas`` over
  hash streams — parallel ACROSS streams, linear within one.

Scale shape: ``stream = doc_id % n_streams`` is the parallelism unit.  At
100 TB you size ``n_streams`` to a few × cluster cores; each stream's rows
shuffle to one task (the only shuffle in either op), and packing within the
stream is one ordered pass.  Chunk/pack ids are deterministic functions of
(doc_id, n_tokens) alone — re-running on the same corpus yields the same
packs, which is what makes packed-data builds reproducible.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import token_count


def _with_stream_tokens(
    docs: DataFrame,
    n_streams: int,
    id_col: str,
    text_col: str,
    tokens_col: str | None = None,
) -> DataFrame:
    # tokens_col: reuse an already-computed token count (e.g. from a quality
    # pass) instead of re-tokenizing — saves a second pass over text
    n_tok = F.col(tokens_col) if tokens_col else token_count(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % n_streams).cast("bigint").alias("stream"),
        n_tok.cast("bigint").alias("n_tokens"),
    )


def concat_chunk_pack(
    docs: DataFrame,
    budget: int = 2048,
    n_streams: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concatenate-then-chunk packing: documents ordered by id within their
    stream, chunk boundary every ``budget`` tokens of the concatenation.

    Output: (doc_id, stream, pack_id, n_tokens, offset_in_pack) where
    pack_id is the chunk the document starts in and offset_in_pack its token
    offset there.  One window over (stream, doc_id) — a single shuffle.
    """
    w = (
        Window.partitionBy("stream")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _with_stream_tokens(docs, n_streams, id_col, text_col)
        .withColumn("cum_excl", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .select(
            "doc_id",
            "stream",
            F.floor(F.col("cum_excl") / budget).cast("bigint").alias("pack_id"),
            "n_tokens",
            (F.col("cum_excl") % budget).cast("bigint").alias("offset_in_pack"),
        )
    )


def greedy_pack(
    docs: DataFrame,
    budget: int = 2048,
    n_streams: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Greedy bin-respecting packing: within a stream (ordered by doc_id),
    append to the current pack unless that would exceed ``budget``, else
    start the next pack.  No pack exceeds ``budget`` unless a single
    document alone does (it then sits alone in its pack).

    Output: (doc_id, stream, pack_id, n_tokens).  The reset-on-overflow
    accumulator is not window-expressible, so each stream packs inside one
    ``applyInPandas`` group; the matching DuckDB oracle walks the same
    recurrence with a linear recursive CTE, so this stays exactly checked.
    """
    base = _with_stream_tokens(docs, n_streams, id_col, text_col, tokens_col)

    def pack_stream(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", ignore_index=True)
        packs = []
        acc = pack = 0
        for i, n in enumerate(pdf["n_tokens"]):
            if i == 0:
                acc = n
            elif acc + n > budget:
                pack += 1
                acc = n
            else:
                acc += n
            packs.append(pack)
        pdf["pack_id"] = pd.Series(packs, dtype="int64")
        return pdf[["doc_id", "stream", "pack_id", "n_tokens"]]

    return base.groupBy("stream").applyInPandas(
        lambda _key, pdf: pack_stream(pdf),
        "doc_id bigint, stream bigint, pack_id bigint, n_tokens bigint",
    )


def chunk_then_pack(
    docs: DataFrame,
    window: int = 32,
    stride: int = 16,
    budget: int = 2048,
    n_streams: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``sliding_window_chunks`` -> ``greedy_pack`` composed into ONE
    scan — the actual long-document pretraining prep path: cut each
    document into overlapping token windows, then greedily fill fixed
    token-budget training sequences with whole chunks (a chunk never
    straddles a pack; documents already never straddle a chunk).

    Composition economics (the reason this is one operator, not two
    catalog calls): the chunker computes each chunk's ``n_tokens`` as it
    slices, and the packer consumes that column directly (the
    ``tokens_col`` reuse seam) — text is tokenized ONCE, and
    ``chunk_text`` itself never travels through the pack shuffle (the
    packer works on (doc_id, chunk_id, n_tokens) alone; re-join chunk
    text by (doc_id, chunk_id) downstream if the trainer needs it).

    Ordering contract: streams are keyed by ``doc_id % n_streams`` (a
    document's chunks stay in ONE stream, in (doc_id, chunk_id) order),
    so consecutive windows of a document land adjacently in packs —
    what a curriculum that wants intra-document continuity expects.
    Deterministic in the text alone, like both parents.

    Scale shape: chunking is MAP-ONLY (no shuffle at any size); the
    pack is the one shuffle — (doc_id, chunk_id, n_tokens) triples to
    ``n_streams`` tasks, each an ordered linear pass (parallel across
    streams).  The matching DuckDB oracle walks the same reset-on-
    overflow recurrence as a linear recursive CTE over the chunk
    relation, so the composition stays EXACTLY checked end to end.

    Output: (doc_id, chunk_id, stream, pack_id, n_tokens).
    """
    chunks = sliding_window_chunks(docs, window, stride, id_col, text_col)
    return _pack_chunk_streams(chunks, budget, n_streams)


def _pack_chunk_streams(
    chunks: DataFrame, budget: int, n_streams: int
) -> DataFrame:
    """The greedy reset-on-overflow pack over a chunk relation —
    (doc_id, chunk_id, n_tokens) triples to ``n_streams`` ordered
    streams, one ``applyInPandas`` pass each.  Shared by
    ``chunk_then_pack`` (triples-only output) and ``pack_with_text``
    (re-joins the text)."""
    base = chunks.select(
        "doc_id",
        "chunk_id",
        (F.col("doc_id") % n_streams).cast("bigint").alias("stream"),
        "n_tokens",
    )

    def pack_stream(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["doc_id", "chunk_id"], ignore_index=True)
        packs = []
        acc = pack = 0
        for i, n in enumerate(pdf["n_tokens"]):
            if i == 0:
                acc = n
            elif acc + n > budget:
                pack += 1
                acc = n
            else:
                acc += n
            packs.append(pack)
        pdf["pack_id"] = pd.Series(packs, dtype="int64")
        return pdf[["doc_id", "chunk_id", "stream", "pack_id", "n_tokens"]]

    return base.groupBy("stream").applyInPandas(
        lambda _key, pdf: pack_stream(pdf),
        "doc_id bigint, chunk_id bigint, stream bigint, pack_id bigint, "
        "n_tokens bigint",
    )


def pack_with_text(
    docs: DataFrame,
    window: int = 32,
    stride: int = 16,
    budget: int = 2048,
    n_streams: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_packed: bool = True,
) -> DataFrame:
    """``chunk_then_pack`` WITH the chunk text re-materialized — the
    downstream join that operator's docstring tells callers to write
    ("re-join chunk text by (doc_id, chunk_id) if the trainer needs
    it"), shipped as one operator so the documented pattern can't be
    hand-rolled wrong (r12 verdict directive #7).

    Join shape is the point: ``chunk_text`` still never travels through
    the PACK shuffle — the packer works on (doc_id, chunk_id, n_tokens)
    triples exactly as in ``chunk_then_pack`` — and with
    ``broadcast_packed`` (the default) the packed TRIPLES side (five
    ints per chunk, no text) broadcasts into a map-side hash join
    against the re-derived chunk relation, so the heavy text side never
    shuffles AT ALL: tokenize (map) → pack ints (one n_streams shuffle
    of ints) → broadcast-join text back (map).  At a corpus where even
    the int triples outgrow executor memory (~10^9 chunks), pass
    ``broadcast_packed=False`` for a plain equi-join on
    (doc_id, chunk_id) and let AQE pick the strategy — the text then
    pays one shuffle, which is unavoidable at that size.

    The chunker runs twice (once feeding the packer, once as the join's
    text side) but both are MAP-ONLY over the same scan — at scale the
    second pass is cheaper than shuffling text through the pack, which
    is the whole design of the parent operator.

    Output: (doc_id, chunk_id, stream, pack_id, n_tokens, chunk_text) —
    chunk_then_pack's row set with the text column back (parity
    test-pinned).
    """
    chunks = sliding_window_chunks(docs, window, stride, id_col, text_col)
    packed = _pack_chunk_streams(chunks, budget, n_streams)
    if broadcast_packed:
        packed = F.broadcast(packed)
    return packed.join(
        chunks.select("doc_id", "chunk_id", "chunk_text"),
        ["doc_id", "chunk_id"],
    ).select("doc_id", "chunk_id", "stream", "pack_id", "n_tokens", "chunk_text")


def sliding_window_chunks(
    docs: DataFrame,
    window: int = 32,
    stride: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document sliding-window chunking: token windows of ``window``
    starting every ``stride`` tokens (overlap = window - stride) — the
    long-document preparation step for context-bounded training and for
    retrieval-chunk embedding, distinct from ``concat_chunk_pack`` (which
    chunks the concatenated STREAM; this chunks WITHIN each document and
    never mixes documents in a chunk).

    Contract: chunk starts are 0, stride, 2*stride, ... strictly below
    the document's token count; the final chunks may be shorter than
    ``window`` (they carry their true token count).  Deterministic in
    the text alone — no RNG, no state.

    Scale shape: MAP-ONLY — split, ``sequence`` of starts, ``slice`` per
    start, one ``posexplode``; no shuffle at any size, output rows ~
    n_tokens/stride per document.  The whitespace tokenizer is the
    repo-wide token convention (``textstats.token_count``).

    Output: (doc_id, chunk_id, chunk_text, n_tokens); chunk_id is the
    0-based window ordinal within the document.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("sliding_window_chunks: window and stride must be > 0")
    starts = F.sequence(
        F.lit(0), F.size(F.col("_toks")) - 1, F.lit(stride)
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.col(text_col), " ").alias("_toks"),
        )
        .select(
            "doc_id",
            "_toks",
            F.posexplode(starts).alias("chunk_id", "_start"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.array_join(
                F.slice(F.col("_toks"), F.col("_start") + 1, window), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(window), F.size("_toks") - F.col("_start")
            ).cast("bigint").alias("n_tokens"),
        )
    )
