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


# ---------------------------------------------------------------------------
# Real container codecs (round-8): BMP and WAV parse with stdlib struct —
# actual bytes decoded to actual media metadata, inside the same Arrow
# mapInPandas plumbing as the stubbed feature path.  Formats beyond these
# two keep the loud-fail NotImplementedError contract (PIL/ffmpeg are not
# in this container); swapping a real codec library in changes only the
# decoder table below.

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def decode_bmp(blob: bytes) -> dict:
    """Windows BMP header decode (BITMAPFILEHEADER + BITMAPINFOHEADER) —
    14-byte file header ('BM', file size, pixel offset) then a >=40-byte
    info header carrying int32 width / height at offsets 18 / 22.  A
    top-down BMP stores height negative; the magnitude is the pixel
    height either way."""
    import struct

    if len(blob) < 26 or blob[:2] != b"BM":
        raise ValueError("not a BMP container")
    # the info-header SIZE field discriminates the header family: the
    # int32 width/height layout below only holds for BITMAPINFOHEADER and
    # its extensions (40/52/56/108/124); a 12-byte OS/2 BITMAPCOREHEADER
    # stores int16 dimensions at different offsets and would silently
    # misparse — loud-fail instead (the module contract)
    (info_size,) = struct.unpack_from("<I", blob, 14)
    if info_size not in (40, 52, 56, 108, 124):
        raise NotImplementedError(
            f"BMP info header size {info_size} (OS/2 core or unknown "
            "variant) — only the BITMAPINFOHEADER family decodes here"
        )
    width, height = struct.unpack_from("<ii", blob, 18)
    return {"kind": "bmp", "width": width, "height": abs(height)}


def decode_wav(blob: bytes) -> dict:
    """RIFF/WAVE decode: walk the (chunk_id, chunk_size) list from byte 12,
    read channels / sample rate / bits-per-sample from 'fmt ' and the
    payload length from 'data'.  n_samples = data bytes / frame size;
    duration derives from the sample rate (floor-ms, exact integer math)."""
    import struct

    if len(blob) < 36 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a WAV container")
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(blob):
        cid, csize = blob[pos : pos + 4], struct.unpack_from("<I", blob, pos + 4)[0]
        # a declared chunk size that overruns the blob means truncation:
        # computing n_samples/duration from the DECLARED size would emit a
        # fabricated, plausible-looking value — exactly what the module's
        # loud-fail contract forbids
        if pos + 8 + csize > len(blob):
            raise ValueError(
                f"WAV truncated: chunk {cid!r} declares {csize} bytes but "
                f"only {len(blob) - pos - 8} remain"
            )
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError(
                    f"WAV fmt chunk is {csize} bytes — a PCM fmt chunk is "
                    "at least 16"
                )
            audio_fmt, n_channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", blob, pos + 8
            )
            fmt = (audio_fmt, n_channels, sample_rate, bits)
        elif cid == b"data":
            data_size = csize
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_channels, sample_rate, bits = fmt
    # n_samples = data_bytes / frame_size only holds for uncompressed
    # whole-byte sample formats: PCM (1) and IEEE float (3).  Compressed
    # formats (ADPCM etc.) or sub-byte bit depths would get a fabricated,
    # plausible-looking duration — loud-fail instead (the module contract)
    if audio_fmt not in (1, 3) or bits < 8 or bits % 8:
        raise NotImplementedError(
            f"WAV format tag {audio_fmt} / {bits}-bit samples — only "
            "uncompressed PCM and IEEE-float decode here"
        )
    frame = n_channels * (bits // 8)
    if frame == 0:
        raise ValueError("WAV fmt chunk declares zero channels")
    n_samples = data_size // frame
    return {
        "kind": "wav",
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "n_samples": n_samples,
        "duration_ms": (n_samples * 1000) // sample_rate if sample_rate else 0,
    }


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> SAMPLES per pixel in the coded stream (palette type 3 is
# one index sample; it expands through PLTE to 3-4 output channels)
_PNG_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# depths the spec allows per color type (decode supports the byte-aligned
# ones everywhere plus sub-byte palette; Adam7 stays loud-fail)
_PNG_DEPTHS = {0: (8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}

# decoded pixel buffers are bounded before any allocation: a crafted IHDR
# (or a zlib bomb in IDAT) must not be able to exhaust executor memory
_PNG_MAX_PIXEL_BYTES = 1 << 28  # 256 MiB per image


def _png_parse_ihdr(data: bytes) -> tuple[int, int, int, int]:
    """Validate an IHDR payload; returns (w, h, depth, color). Shared by
    the full decoder and the header-only metadata path so both enforce
    the same loud-fail coverage contract."""
    import struct

    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
    if comp != 0 or filt != 0:
        raise ValueError("PNG declares a non-zero compression/filter method")
    if (
        color not in _PNG_SAMPLES
        or depth not in _PNG_DEPTHS.get(color, ())
        or interlace != 0
    ):
        raise NotImplementedError(
            f"PNG bit depth {depth} / color type {color} / interlace "
            f"{interlace} — gray/RGB/gray+alpha/RGBA at 8/16-bit and "
            "palette at 1/2/4/8-bit decode here (Adam7 needs the "
            "7-pass reassembly)"
        )
    if w == 0 or h == 0:
        raise ValueError("PNG declares a zero dimension")
    return w, h, depth, color


def decode_png(blob: bytes) -> dict:
    """Full pure-Python PNG decode — IHDR parse, bounded IDAT inflate
    (zlib is stdlib — the reason PNG can decode natively here next to
    BMP/WAV), per-scanline UNFILTERING (all five filter types:
    None/Sub/Up/Average/Paeth, the spec's defilter recurrences), and
    palette expansion back to raw row-major pixel bytes.

    Coverage: color types 0/2/4/6 (gray, RGB, gray+alpha, RGBA) at 8- and
    16-bit depth, and palette (type 3) at 1/2/4/8-bit with PLTE expansion
    (+ optional tRNS alpha → RGBA), non-interlaced.  Adam7 interlace keeps
    the loud-fail NotImplementedError contract; chunk CRCs are verified so
    corruption fails loudly instead of decoding garbage.  The inflate is
    CAPPED at the exact payload size IHDR implies (decompressobj +
    max_length), so a crafted zlib bomb fails loudly before it can
    exhaust executor memory — as does any IHDR declaring more than
    ``_PNG_MAX_PIXEL_BYTES`` of output.

    Returns {kind, width, height, n_channels, bit_depth, pixels} —
    ``pixels`` is ``height * width * n_channels`` samples, 1 byte per
    sample at ``bit_depth`` 8 (palette expands to 8), big-endian 2 bytes
    per sample at 16."""
    import struct
    import zlib

    if len(blob) < 8 or blob[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG container")
    pos, ihdr, idat, plte, trns = 8, None, [], None, None
    while pos + 8 <= len(blob):
        (clen,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + clen]
        if len(data) < clen or pos + 12 + clen > len(blob):
            raise ValueError(
                f"PNG truncated: chunk {ctype!r} declares {clen} bytes"
            )
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + clen)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = _png_parse_ihdr(data)
        elif ctype == b"PLTE":
            if clen % 3 or clen == 0 or clen > 768:
                raise ValueError(f"PNG PLTE length {clen} is not a 1-256 RGB table")
            plte = data
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    w, h, depth, color = ihdr
    spp = _PNG_SAMPLES[color]
    # coded-stream geometry: filtering works on raw bytes, one filter byte
    # per scanline; left-neighbor offset is the byte-aligned pixel size
    stride = (w * spp * depth + 7) // 8
    bpp = max(1, (spp * depth) // 8)
    expected = h * (1 + stride)
    if expected > _PNG_MAX_PIXEL_BYTES:
        raise ValueError(
            f"PNG declares {expected} bytes of pixel payload for {w}x{h} — "
            f"over the {_PNG_MAX_PIXEL_BYTES}-byte decode cap"
        )
    # bounded inflate: never produce more than expected+1 bytes no matter
    # what the deflate stream claims, and fail loudly on both short and
    # long payloads instead of allocating a bomb's worth of output
    dobj = zlib.decompressobj()
    raw = dobj.decompress(b"".join(idat), expected + 1)
    if len(raw) > expected or dobj.unconsumed_tail:
        raise ValueError(
            f"PNG pixel payload exceeds the {expected} bytes implied by "
            f"IHDR for {w}x{h} at depth {depth} (zlib bomb?)"
        )
    if len(raw) != expected:
        raise ValueError(
            f"PNG pixel payload is {len(raw)} bytes, expected {expected} "
            f"for {w}x{h} at depth {depth}"
        )
    out = bytearray(h * stride)
    prev = bytearray(stride)  # the spec's zero row above the first
    for y in range(h):
        ftype = raw[y * (1 + stride)]
        line = bytearray(
            raw[y * (1 + stride) + 1 : (y + 1) * (1 + stride)]
        )
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG scanline declares filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    if color == 3:
        return _png_expand_palette(out, w, h, depth, stride, plte, trns)
    return {
        "kind": "png",
        "width": w,
        "height": h,
        "n_channels": spp,
        "bit_depth": depth,
        "pixels": bytes(out),
    }


def _png_expand_palette(
    defiltered: bytearray,
    w: int,
    h: int,
    depth: int,
    stride: int,
    plte: bytes | None,
    trns: bytes | None,
) -> dict:
    """PLTE expansion: defiltered index samples (1/2/4/8-bit, MSB-first
    packing per the spec) → RGB bytes via the palette table, or RGBA when
    a tRNS chunk supplies per-entry alpha (entries past its end are
    opaque, per spec)."""
    if plte is None:
        raise ValueError("PNG color type 3 without a PLTE chunk")
    n_entries = len(plte) // 3
    nch = 4 if trns is not None else 3
    out = bytearray(h * w * nch)
    per_byte = 8 // depth
    mask = (1 << depth) - 1
    o = 0
    for y in range(h):
        row = defiltered[y * stride : (y + 1) * stride]
        for x in range(w):
            if depth == 8:
                idx = row[x]
            else:
                b = row[x // per_byte]
                shift = 8 - depth * (x % per_byte + 1)
                idx = (b >> shift) & mask
            if idx >= n_entries:
                raise ValueError(
                    f"PNG palette index {idx} outside the {n_entries}-entry PLTE"
                )
            out[o : o + 3] = plte[idx * 3 : idx * 3 + 3]
            if nch == 4:
                out[o + 3] = trns[idx] if idx < len(trns) else 255
            o += nch
    return {
        "kind": "png",
        "width": w,
        "height": h,
        "n_channels": nch,
        "bit_depth": 8,
        "pixels": bytes(out),
    }


def png_header_meta(blob: bytes) -> dict:
    """Header-only PNG metadata: parse + CRC-verify IHDR (the spec pins it
    as the first chunk) and length-hop the remaining chunk list to learn
    whether a palette image carries tRNS alpha — NO inflate, NO per-byte
    defilter.  This is the metadata-plumbing path: O(chunk count) instead
    of O(h*stride) Python per row, returning exactly what
    ``extract_media_meta`` needs (``decode_png`` stays the pixel path)."""
    import struct
    import zlib

    if len(blob) < 33 or blob[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG container")
    (clen,) = struct.unpack_from(">I", blob, 8)
    if blob[12:16] != b"IHDR" or clen != 13:
        raise ValueError("PNG first chunk is not a 13-byte IHDR")
    data = blob[16:29]
    (crc,) = struct.unpack_from(">I", blob, 29)
    if zlib.crc32(b"IHDR" + data) & 0xFFFFFFFF != crc:
        raise ValueError("PNG chunk b'IHDR' CRC mismatch")
    w, h, depth, color = _png_parse_ihdr(data)
    nch = _PNG_SAMPLES[color]
    if color == 3:
        # palette expands to RGB, or RGBA when tRNS is present: hop the
        # chunk headers (length fields only — no payload reads) to check
        nch, pos = 3, 33
        while pos + 8 <= len(blob):
            (clen,) = struct.unpack_from(">I", blob, pos)
            ctype = blob[pos + 4 : pos + 8]
            if ctype == b"tRNS":
                nch = 4
                break
            if ctype in (b"IDAT", b"IEND"):  # tRNS must precede IDAT
                break
            pos += 12 + clen
    return {
        "kind": "png",
        "width": w,
        "height": h,
        "n_channels": nch,
        "bit_depth": depth if color != 3 else 8,
    }


def _decode_meta(blob: bytes) -> dict:
    if blob[:2] == b"BM":
        return decode_bmp(blob)
    if blob[:4] == b"RIFF":
        return decode_wav(blob)
    if blob[:8] == PNG_SIGNATURE:
        # header-only: dimensions come from IHDR alone; inflating +
        # defiltering the pixels just to discard them would cost
        # O(h*stride) Python per row in the metadata hot path
        return png_header_meta(blob)
    raise NotImplementedError(
        "no codec for this container in this environment (BMP, WAV and "
        "PNG decode natively; PIL/ffmpeg formats need a real codec "
        "library)"
    )


def extract_media_meta(media: DataFrame) -> DataFrame:
    """Typed media metadata via real header decode — the production twin
    of ``extract_features``'s stub: same MEDIA_SCHEMA in, Arrow batches
    through mapInPandas, one metadata row per blob out.  Partition-local
    (no shuffle); unknown containers fail the task loudly rather than
    emitting fake rows."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                meta = _decode_meta(bytes(blob))
                rows.append(
                    {
                        "media_id": mid,
                        "kind": meta["kind"],
                        "width": meta.get("width"),
                        "height": meta.get("height"),
                        "n_channels": meta.get("n_channels"),
                        "sample_rate": meta.get("sample_rate"),
                        "n_samples": meta.get("n_samples"),
                        "duration_ms": meta.get("duration_ms"),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in MEDIA_META_SCHEMA.fields],
            )

    return media.mapInPandas(decode_batches, schema=MEDIA_META_SCHEMA)
