"""sliding_window_chunks: the per-document overlapping-window contract."""

from pyspark.sql import functions as F

from open_bus_siri_etl_spark.operators.packing import sliding_window_chunks


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_chunk_contract_small_doc(spark):
    """A doc shorter than the window yields exactly one full-copy chunk."""
    out = sliding_window_chunks(_df(spark, ["a b c"]), window=8, stride=4)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["chunk_id"] == 0
    assert rows[0]["chunk_text"] == "a b c"
    assert rows[0]["n_tokens"] == 3


def test_chunk_starts_and_overlap(spark):
    """10 tokens, window 4, stride 2 -> starts 0,2,4,6,8; last is short;
    consecutive chunks share window-stride tokens."""
    text = " ".join(f"t{i}" for i in range(10))
    rows = sorted(
        sliding_window_chunks(_df(spark, [text]), window=4, stride=2).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [r["chunk_id"] for r in rows] == [0, 1, 2, 3, 4]
    assert rows[0]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[1]["chunk_text"] == "t2 t3 t4 t5"
    assert rows[4]["chunk_text"] == "t8 t9"
    assert [r["n_tokens"] for r in rows] == [4, 4, 4, 4, 2]
    # overlap: chunk i's last (window-stride) tokens = chunk i+1's first
    for a, b in zip(rows, rows[1:]):
        ta, tb = a["chunk_text"].split(" "), b["chunk_text"].split(" ")
        assert ta[2:] == tb[: len(ta) - 2]


def test_chunk_stride_reconstructs_document(spark):
    """Taking each chunk's FIRST stride tokens in chunk order rebuilds
    the document exactly — no token lost or duplicated by the windowing."""
    text = " ".join(f"w{i}" for i in range(23))
    rows = sorted(
        sliding_window_chunks(_df(spark, [text]), window=6, stride=3).collect(),
        key=lambda r: r["chunk_id"],
    )
    rebuilt = []
    for r in rows:
        rebuilt.extend(r["chunk_text"].split(" ")[:3])
    assert " ".join(rebuilt) == text


def test_chunking_is_map_only(spark):
    """The scale claim: no Exchange anywhere in the plan."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = sliding_window_chunks(docs, window=32, stride=16)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_chunk_then_pack_contract(spark):
    """The fused pipeline: chunk multiset identical to the standalone
    chunker's, no pack exceeds the budget (chunks are never oversized
    here: window <= budget), and a document's chunks pack contiguously
    in (doc_id, chunk_id) order within their stream."""
    from open_bus_siri_etl_spark.operators.packing import chunk_then_pack

    texts = [" ".join(f"w{d}_{i}" for i in range(n)) for d, n in
             enumerate([3, 40, 17, 64, 9, 100, 31, 8])]
    out = chunk_then_pack(
        _df(spark, texts), window=8, stride=4, budget=20, n_streams=2
    ).collect()
    std = sliding_window_chunks(
        _df(spark, texts), window=8, stride=4
    ).collect()
    assert sorted((r["doc_id"], r["chunk_id"], r["n_tokens"]) for r in out) \
        == sorted((r["doc_id"], r["chunk_id"], r["n_tokens"]) for r in std)
    # budget respected per (stream, pack)
    import collections
    fill = collections.Counter()
    for r in out:
        fill[(r["stream"], r["pack_id"])] += r["n_tokens"]
    assert all(v <= 20 for v in fill.values()), fill
    # stream keying + in-stream order: chunks sorted by (doc_id,
    # chunk_id) see non-decreasing pack ids
    for r in out:
        assert r["stream"] == r["doc_id"] % 2
    by_stream = collections.defaultdict(list)
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_id"])):
        by_stream[r["stream"]].append(r["pack_id"])
    for packs in by_stream.values():
        assert packs == sorted(packs)


def test_chunk_then_pack_single_shuffle(spark):
    """Plan shape: map-only chunking + exactly ONE exchange (the stream
    repartition feeding applyInPandas) — the composition must not pay a
    second shuffle for the chunk stage."""
    from open_bus_siri_etl_spark.operators.packing import chunk_then_pack

    import re

    out = chunk_then_pack(_df(spark, ["a b c d e f g h"]), n_streams=2)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # formatted plans list each node twice (tree + detail section) —
    # count the numbered detail entries, one per physical node
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_pack_with_text_row_parity_and_text(spark):
    """pack_with_text == chunk_then_pack + the chunk's exact text: same
    row set on the triple columns (parity pinned), and each row's
    chunk_text equals the sliding_window_chunks text for its
    (doc_id, chunk_id)."""
    from open_bus_siri_etl_spark.operators.packing import (
        chunk_then_pack,
        pack_with_text,
        sliding_window_chunks,
    )

    texts = [" ".join(f"w{d}_{i}" for i in range(5 + 3 * d)) for d in range(6)]
    docs = _df(spark, texts)
    kw = dict(window=4, stride=2, budget=10, n_streams=3)
    packed = chunk_then_pack(docs, **kw)
    with_text = pack_with_text(docs, **kw)
    cols = ["doc_id", "chunk_id", "stream", "pack_id", "n_tokens"]
    key = lambda df: sorted(map(tuple, df.select(cols).collect()))
    assert key(with_text) == key(packed)
    chunk_text = {
        (r["doc_id"], r["chunk_id"]): r["chunk_text"]
        for r in sliding_window_chunks(docs, window=4, stride=2).collect()
    }
    for r in with_text.collect():
        assert r["chunk_text"] == chunk_text[(r["doc_id"], r["chunk_id"])]
    # the fallback equi-join path answers identically
    plain = pack_with_text(docs, broadcast_packed=False, **kw)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, with_text.collect())
    )


def test_pack_with_text_text_side_never_shuffles(spark):
    """Plan shape (the operator's reason to exist): the ONLY exchange is
    the int-triple stream repartition feeding the packer — the text side
    re-materializes through a BroadcastHashJoin, so chunk text never
    crosses a shuffle."""
    import re

    from open_bus_siri_etl_spark.operators.packing import pack_with_text

    out = pack_with_text(_df(spark, ["a b c d e f g h"]), n_streams=2)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    # one shuffle exchange (the stream repartition) + possibly broadcast
    # exchanges, which carry 'BroadcastExchange' — count plain ones only
    assert len(exchanges) == 1, plan
    assert "BroadcastHashJoin" in plan, plan
