"""Pure-python brotli subset codec (RFC 7932) — the S2 fallback.

The reference's input codec is brotli (it shells out to ``brotli -d``,
reference process_snapshot.py:340-342).  This container has neither the CLI
nor the ``brotli`` module, so the engine vendors the *stored-mode subset* of
RFC 7932: streams made of uncompressed (ISUNCOMPRESSED) meta-blocks.

- ``compress`` emits a fully conformant brotli stream (any decoder,
  including the reference's ``brotli -d``, decodes it) that stores the
  payload in uncompressed meta-blocks — the same shape ``brotli -q 0``
  produces for incompressible data.
- ``decompress`` decodes any stream consisting of the stream header,
  uncompressed/metadata/empty meta-blocks, and raises
  ``UnsupportedBrotliData`` on entropy-coded meta-blocks (callers fall back
  to the real ``brotli`` module when installed).

This keeps the reference's actual input format exercised end-to-end in this
environment instead of leaving the `.br` path as dead code.  Bit order is
LSB-first within bytes per RFC 7932 §2.
"""

from __future__ import annotations

_CHUNK = 1 << 16  # one uncompressed meta-block per 64 KiB of payload


class UnsupportedBrotliData(Exception):
    """Stream uses entropy-coded meta-blocks the fallback can't decode."""


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._bitpos = 0  # bits used in the last byte (0 == byte-aligned)

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits):
            bit = (value >> i) & 1
            if self._bitpos == 0:
                self.out.append(0)
            if bit:
                self.out[-1] |= 1 << self._bitpos
            self._bitpos = (self._bitpos + 1) & 7

    def align(self) -> None:
        self._bitpos = 0

    def write_bytes(self, data: bytes) -> None:
        assert self._bitpos == 0, "must be byte-aligned"
        self.out.extend(data)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # absolute bit position

    def read(self, nbits: int) -> int:
        v = 0
        for i in range(nbits):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("truncated brotli stream")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def read_bytes(self, n: int) -> bytes:
        assert self.pos & 7 == 0
        start = self.pos >> 3
        if start + n > len(self.data):
            raise ValueError("truncated brotli stream")
        self.pos += n * 8
        return self.data[start : start + n]


def compress(data: bytes) -> bytes:
    """Encode ``data`` as a brotli stream of uncompressed meta-blocks."""
    w = _BitWriter()
    w.write(0, 1)  # WBITS = 16 (window size irrelevant for stored blocks)
    view = memoryview(data)
    for off in range(0, len(data), _CHUNK):
        chunk = view[off : off + _CHUNK]
        mlen = len(chunk)
        w.write(0, 1)  # ISLAST = 0
        # minimal nibble count for MLEN-1 (4 is the floor, RFC 7932 §9.2)
        if mlen - 1 < 1 << 16:
            w.write(0, 2)  # MNIBBLES = 4
            w.write(mlen - 1, 16)
        elif mlen - 1 < 1 << 20:
            w.write(1, 2)  # MNIBBLES = 5
            w.write(mlen - 1, 20)
        else:
            w.write(2, 2)  # MNIBBLES = 6
            w.write(mlen - 1, 24)
        w.write(1, 1)  # ISUNCOMPRESSED = 1
        w.align()
        w.write_bytes(bytes(chunk))
    w.write(1, 1)  # ISLAST = 1
    w.write(1, 1)  # ISLASTEMPTY = 1
    return bytes(w.out)


def _read_wbits(r: _BitReader) -> int:
    if r.read(1) == 0:
        return 16
    n = r.read(3)
    if n != 0:
        return 17 + n
    m = r.read(3)
    if m == 0:
        return 17
    if m == 1:
        raise ValueError("invalid WBITS encoding")
    return 8 + m


def decompress(data: bytes) -> bytes:
    """Decode a stored-mode brotli stream (see module docstring)."""
    r = _BitReader(data)
    _read_wbits(r)
    out = bytearray()
    while True:
        islast = r.read(1)
        if islast and r.read(1):  # ISLASTEMPTY
            break
        nib_code = r.read(2)
        if nib_code == 3:  # metadata meta-block: skip
            if r.read(1) != 0:
                raise ValueError("reserved bit set in metadata meta-block")
            mskipbytes = r.read(2)
            mskiplen = 0
            if mskipbytes:
                raw = r.read(8 * mskipbytes)
                if mskipbytes > 1 and raw >> (8 * (mskipbytes - 1)) == 0:
                    raise ValueError("overlong MSKIPLEN encoding")
                mskiplen = raw + 1
            r.align()
            r.read_bytes(mskiplen)
            continue
        nbits = (4 + nib_code) * 4
        mlen = r.read(nbits) + 1
        if nib_code and mlen - 1 < 1 << (nbits - 4):
            raise ValueError("overlong MLEN encoding")
        if islast:
            raise UnsupportedBrotliData(
                "entropy-coded final meta-block; install the brotli module"
            )
        if r.read(1) != 1:  # ISUNCOMPRESSED
            raise UnsupportedBrotliData(
                "entropy-coded meta-block; install the brotli module"
            )
        r.align()
        out.extend(r.read_bytes(mlen))
    return bytes(out)
