"""Multimodal column plumbing (beyond-reference, BASELINE.json north star).

Images/audio/video are carried as opaque ``binary`` columns plus a typed
metadata struct; decode / feature-extract run as Arrow-batched
``mapInPandas`` — the ONLY sanctioned Python hot path in the engine, because
codec work genuinely cannot be expressed in Spark SQL.

The actual media codecs (PIL/ffmpeg/etc.) are NOT in this container, so the
decode body is a clearly-marked deterministic STUB (``_fake_decode``): it
produces stable per-blob features (byte length, first byte, md5 prefix) so the
Spark-side plumbing — schema, batch iteration, partition parallelism, column
pruning through mapInPandas — is real and tested end-to-end.  Swapping in a
real codec changes only the inside of ``_fake_decode``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("format", T.StringType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Test harness: treat document text bytes as opaque media blobs.

    In production this column comes straight from the lake (parquet BINARY /
    image container files); nothing downstream cares that it's text here.
    """
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("fake/blob").alias("format"),
            F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def read_media_dir(spark, path: str, glob: str = "*") -> DataFrame:
    """Production media source: Spark's ``binaryFile`` format over a
    directory of container files → the engine's MEDIA_SCHEMA.

    ``media_id`` is derived from the file name (xxhash64 of the path when
    the stem is not numeric), ``format`` from the extension.  binaryFile
    parallelizes per file and prunes on ``pathGlobFilter``; content bytes
    only cross into Python at the Arrow-batched decode step, never as
    row-at-a-time Python objects.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    stem = F.regexp_extract(F.col("path"), r"([^/]+?)(\.[^./]*)?$", 1)
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([^./]+)$", 1))
    return raw.select(
        F.when(stem.rlike("^[0-9]+$"), stem.cast("long"))
        .otherwise(F.xxhash64(F.col("path")))
        .alias("media_id"),
        F.col("content"),
        F.struct(
            F.when(ext == "", F.lit("application/octet-stream"))
            .otherwise(F.concat(F.lit("file/"), ext))
            .alias("format"),
            F.col("length").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(blob: bytes) -> tuple[int, int, int]:
    """STUB decode — deterministic stand-in for a real media codec.

    A real implementation would decode the container and return e.g.
    (width, height, n_frames); raising NotImplementedError on unknown
    formats.  Here: (n_bytes, first_byte, md5-prefix checksum).  The
    checksum is the first 15 hex digits of md5 as an int64 — the same
    construction the sketch operators use — so an external SQL engine can
    recompute it exactly (``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``)
    and the whole feature row gets a hash-checked oracle contract instead
    of a rows-only check.
    """
    if blob is None:
        raise NotImplementedError("real codecs are not available in this environment")
    checksum = int(hashlib.md5(blob).hexdigest()[:15], 16)
    return len(blob), blob[0] if blob else -1, checksum


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Each executor core pulls Arrow batches of (media_id, content, meta) and
    emits one feature row per blob — the shape a real image-resize /
    frame-sample / spectrogram operator takes.  No shuffle: purely
    partition-local, so throughput scales with cores × IO.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, first, crc = [], [], []
            for blob in pdf["content"]:
                b, f, c = _fake_decode(bytes(blob))
                n_bytes.append(b)
                first.append(f)
                crc.append(c)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n_bytes,
                    "first_byte": first,
                    "checksum": crc,
                    "format": [m["format"] for m in pdf["meta"]],
                }
            )

    return media.mapInPandas(decode_batches, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize via mapInPandas — 1 row in, 1 row out, binary in/binary out.

    STUB kernel: deterministic truncate/cycle of the source bytes to
    width×height (a real one calls PIL/libvips inside the loop body and
    nothing else changes).  Partition-local, no shuffle; output carries the
    new typed metadata so downstream operators never re-decode.
    """
    target = width * height

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for blob in pdf["content"]:
                b = bytes(blob)
                if not b:
                    raise NotImplementedError(
                        "real codecs are not available in this environment"
                    )
                reps = (target // len(b)) + 1
                out.append((b * reps)[:target])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": out,
                    "meta": [
                        {"format": "fake/raw", "width": width, "height": height}
                        for _ in out
                    ],
                }
            )

    return media.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, frame_bytes: int = 64, every_n: int = 2
) -> DataFrame:
    """Frame sampling via mapInPandas — the 1→N flat-map shape video takes.

    STUB kernel: the blob is treated as a packed array of ``frame_bytes``
    frames; every ``every_n``-th frame is emitted as its own row (a real
    implementation seeks keyframes with ffmpeg — the fan-out dataflow is
    identical).  Output rows inherit the input's partitioning; a huge video
    corpus fans out without any shuffle until a downstream groupBy.
    """

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                b = bytes(blob)
                n_frames = len(b) // frame_bytes
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.mapInPandas(frame_batches, schema=FRAMES_SCHEMA)
