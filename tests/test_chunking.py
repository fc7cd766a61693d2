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
