"""S2 — the brotli input codec, exercised end-to-end.

The reference's real inputs are ``.br`` files (process_snapshot.py:324-342).
Full-format decode (huffman + dictionary meta-blocks) rides pyarrow's
bundled brotli codec; the vendored RFC 7932 stored-mode subset remains the
dependency-free floor.  Stored-mode vectors below are hand-derived from the
RFC, independent of the encoder, so encoder and decoder cannot be wrong
together.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_bus_siri_etl_spark.sources import brotli_fallback
from open_bus_siri_etl_spark.sources.snapshots import (
    read_snapshots_brotli,
    write_snapshot_fixture,
)

from .fixtures import TEST_SNAPSHOT_DATA, TEST_SNAPSHOT_ID


# -- codec unit vectors ------------------------------------------------------


def test_decode_known_empty_streams():
    # 0x3b: WBITS=22, ISLAST=1, ISLASTEMPTY=1 — the canonical empty stream
    # real brotli emits; 0x06: same with WBITS=16 (our encoder's header).
    assert brotli_fallback.decompress(b"\x3b") == b""
    assert brotli_fallback.decompress(b"\x06") == b""


def test_decode_hand_built_stored_stream():
    # bits (LSB-first): 0 WBITS=16 | 0 ISLAST | 00 MNIBBLES=4 |
    # 16x0 MLEN-1=0 | 1 ISUNCOMPRESSED | pad-to-byte | 'A' | 1 ISLAST,
    # 1 ISLASTEMPTY  →  00 00 10 41 03
    stream = b"\x00\x00\x10\x41\x03"
    assert brotli_fallback.decompress(stream) == b"A"
    # the encoder makes the identical choices
    assert brotli_fallback.compress(b"A") == stream


def test_entropy_coded_stream_raises():
    # ISLAST=1 meta-block with MNIBBLES=4: content would be entropy-coded
    with pytest.raises(brotli_fallback.UnsupportedBrotliData):
        brotli_fallback.decompress(b"\x02\x00\x00\x00")


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=300))
def test_roundtrip_property(data):
    assert brotli_fallback.decompress(brotli_fallback.compress(data)) == data


def test_roundtrip_multi_metablock():
    data = bytes(range(256)) * 600  # ~150 KiB → 3 uncompressed meta-blocks
    out = brotli_fallback.compress(data)
    assert brotli_fallback.decompress(out) == data


def test_metadata_metablock_skipped():
    # splice a metadata meta-block (MNIBBLES code 3, skip 2 bytes) between
    # the header and a stored block: 0 WBITS | 0 ISLAST | 11 MNIBBLES=0 |
    # 0 reserved | 01 MSKIPBYTES=1 | 8 bits MSKIPLEN-1=1 | pad | 2 junk bytes
    w = brotli_fallback._BitWriter()
    w.write(0, 1)
    w.write(0, 1)
    w.write(3, 2)
    w.write(0, 1)
    w.write(1, 2)
    w.write(1, 8)
    w.align()
    w.write_bytes(b"\xde\xad")
    # then a normal stored block for b"hi" + last-empty
    w.write(0, 1)
    w.write(0, 2)
    w.write(1, 16)
    w.write(1, 1)
    w.align()
    w.write_bytes(b"hi")
    w.write(1, 1)
    w.write(1, 1)
    assert brotli_fallback.decompress(bytes(w.out)) == b"hi"


# -- full-format decode via pyarrow's bundled codec --------------------------


def test_full_format_decode_entropy_coded():
    """Real huffman/dictionary-coded streams (what the reference's S3 bucket
    actually serves) decode through the pyarrow codec path — the stored-mode
    fallback alone would raise UnsupportedBrotliData on these."""
    import pyarrow as pa

    from open_bus_siri_etl_spark.sources.snapshots import brotli_decompress

    if not pa.Codec.is_available("brotli"):
        pytest.skip("pyarrow built without brotli")
    # compressible text → the encoder emits entropy-coded meta-blocks
    data = b'{"Siri": {"ServiceDelivery": {"StopMonitoringDelivery": []}}}' * 500
    comp = bytes(pa.Codec("brotli").compress(data))
    assert len(comp) < len(data) // 10  # genuinely entropy-coded, not stored
    with pytest.raises(brotli_fallback.UnsupportedBrotliData):
        brotli_fallback.decompress(comp)  # fallback can't — codec must
    assert brotli_decompress(comp) == data


@settings(max_examples=25, deadline=None)
@given(st.binary(max_size=2000))
def test_full_format_roundtrip_property(data):
    """brotli_compress→brotli_decompress roundtrip through whichever codec
    is active (pyarrow here), incl. the empty payload and incompressible
    random bytes (exercises the exact-size search on both branches)."""
    from open_bus_siri_etl_spark.sources.snapshots import (
        brotli_compress,
        brotli_decompress,
    )

    assert brotli_decompress(brotli_compress(data)) == data


# -- end-to-end through the Spark reader and the golden pipeline -------------


def test_read_snapshots_brotli_e2e(spark, tmp_path):
    landing = str(tmp_path / "landing")
    write_snapshot_fixture(landing, TEST_SNAPSHOT_ID, TEST_SNAPSHOT_DATA, compressed=True)
    df = read_snapshots_brotli(spark, landing)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["snapshot_id"] == TEST_SNAPSHOT_ID
    visits = rows[0]["Siri"]["ServiceDelivery"]["StopMonitoringDelivery"][0][
        "MonitoredStopVisit"
    ]
    assert len(visits) == 5  # 3 valid + 2 invalid


@pytest.mark.slow
def test_process_snapshot_from_brotli_golden(spark, warehouse, tmp_path):
    """The reference's native input codec through the full golden pipeline:
    3 facts, 2 dead letters, dims 3/3/3/3, control row loaded."""
    from open_bus_siri_etl_spark import control
    from open_bus_siri_etl_spark.pipeline import process_snapshot

    landing = str(tmp_path / "landing")
    write_snapshot_fixture(landing, TEST_SNAPSHOT_ID, TEST_SNAPSHOT_DATA, compressed=True)
    stats = process_snapshot(spark, warehouse, TEST_SNAPSHOT_ID, landing)
    assert stats["num_successful"] == 3 and stats["num_failed"] == 2
    assert warehouse.read("siri_vehicle_location").count() == 3
    for t in ("siri_route", "siri_stop", "siri_ride", "siri_ride_stop"):
        assert warehouse.read(t).count() == 3
    row = control.get_control_row(warehouse, TEST_SNAPSHOT_ID)
    assert row["etl_status"] == control.ETL_LOADED


def test_pyarrow_codec_oversized_buffer_contract():
    """_pa_brotli_decompress leans on an undocumented pyarrow codec
    behavior: decompress succeeds (zero-padded) for ANY declared size >=
    the actual decoded length and raises for any smaller size.  Pin that
    assumption directly so a pyarrow upgrade that starts enforcing exact
    decompressed_size fails HERE, obviously, instead of making every decode
    probe to the 16 GiB cap and die confusingly."""
    import pytest

    from open_bus_siri_etl_spark.sources import snapshots

    if snapshots._PA_BROTLI is None:
        pytest.skip("pyarrow brotli codec unavailable")

    plain = b"the quick brown fox jumps over the lazy dog" * 10
    payload = bytes(snapshots._PA_BROTLI.compress(plain))

    # exact size: succeeds and round-trips
    assert bytes(snapshots._PA_BROTLI.decompress(payload, len(plain))) == plain
    # oversized: succeeds, zero-padded to the declared size
    over = snapshots._PA_BROTLI.decompress(payload, len(plain) + 37)
    assert bytes(over)[: len(plain)] == plain
    assert len(bytes(over)) in (len(plain), len(plain) + 37)
    # undersized: must raise (the probe's bisection invariant)
    with pytest.raises(OSError):
        snapshots._PA_BROTLI.decompress(payload, len(plain) - 1)
