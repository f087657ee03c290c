"""Multimodal encoders/decoders: real byte-level round trips, format
conformance, and malformed-input rejection (pure Python, no Spark)."""

import struct
import zlib

import numpy as np
import pytest

from lucene_spark.multimodal import (
    PNG_SIG,
    build_jpeg,
    build_png,
    build_wav,
    decode_meta,
    wav_samples,
)


def test_png_round_trip_and_structure():
    b = build_png(123, 77)
    assert b[:8] == PNG_SIG
    # first chunk must be IHDR with big-endian dims at fixed offsets
    assert b[12:16] == b"IHDR"
    assert struct.unpack(">II", b[16:24]) == (123, 77)
    m = decode_meta(b)
    assert (m["fmt"], m["width"], m["height"], m["bit_depth"]) == \
        ("png", 123, 77, 8)
    # IDAT payload is genuine zlib
    assert b"IDAT" in b
    off = b.index(b"IDAT") - 4
    length = struct.unpack(">I", b[off:off + 4])[0]
    zlib.decompress(b[off + 8:off + 8 + length])


def test_png_crc_checked():
    b = bytearray(build_png(10, 10))
    b[20] ^= 0xFF  # corrupt IHDR height byte → CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        decode_meta(bytes(b))


def test_jpeg_round_trip():
    b = build_jpeg(640, 480)
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    m = decode_meta(b)
    assert (m["fmt"], m["width"], m["height"], m["n_channels"]) == \
        ("jpeg", 640, 480, 3)


def test_wav_round_trip():
    samples = np.array([0, 100, -32768, 32767, -1], dtype=np.int16)
    b = build_wav(44100, samples, channels=1)
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    m = decode_meta(b)
    assert (m["fmt"], m["sample_rate"], m["n_channels"], m["bit_depth"]) == \
        ("wav", 44100, 1, 16)
    got = wav_samples(b)
    assert got.dtype == np.dtype("<i2")
    assert np.array_equal(got, samples)


def test_wav_odd_chunk_padding():
    # odd-sized data chunk: RIFF word alignment must not desync the walk
    samples = np.array([7], dtype=np.int16)
    b = build_wav(8000, samples)
    assert np.array_equal(wav_samples(b), samples)


def test_unknown_payload_rejected():
    with pytest.raises(ValueError):
        decode_meta(b"plain text, not a container")
    with pytest.raises(ValueError):
        wav_samples(b"\x89PNGnope")


def test_jpeg_marker_walk_skips_segments():
    # insert a COM segment before SOF — the scan must skip it by length
    b = build_jpeg(32, 16)
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
    patched = b[:2] + com + b[2:]
    m = decode_meta(patched)
    assert (m["width"], m["height"]) == (32, 16)


CORRUPT = [
    b"", b"\x89PNG", b"\xff\xd8", b"RIFF", b"not media",
    b"\x89PNG\r\n\x1a\n" + b"\x00" * 30,          # sig, garbage chunks
    b"\xff\xd8\xff\xfe\x00\x03x",                  # JPEG, no SOF
    b"RIFF\xff\xff\xff\xffWAVE",                   # WAVE, no chunks
    b"RIFF\x24\x00\x00\x00WAVEdata\x03\x00\x00\x00\x01\x02\x03",  # odd pcm
]


def test_safe_decoders_never_raise():
    """Crawled corpora contain corrupt media; inside mapInPandas a raised
    decode error fails the task and (after retries) the whole stage — the
    _safe wrappers must turn every broken payload into typed data."""
    from lucene_spark.multimodal import decode_meta_safe, wav_samples_safe

    for b in CORRUPT:
        m = decode_meta_safe(b)
        assert m["fmt"] == "corrupt" and m["width"] is None
        s = wav_samples_safe(b)
        assert s.size == 0 and s.dtype == np.dtype("<i2")
    # valid payloads still decode exactly (no silent degradation)
    assert decode_meta_safe(build_png(12, 34))["width"] == 12
    pcm = np.array([1, -2, 3], dtype=np.int16)
    assert np.array_equal(wav_samples_safe(build_wav(8000, pcm)), pcm)


def test_pipeline_survives_corrupt_payloads(spark):
    """End-to-end: a decode batch with corrupt blobs mixed in yields one
    typed row per doc (fmt='corrupt' for the bad ones), never a failed
    stage — the 1-bad-blob-in-10^9 contract of the multimodal ops."""
    import pandas as pd

    from lucene_spark.multimodal import decode_meta_safe

    rows = [(0, build_png(8, 8)), (1, b"\x89PNG truncated"),
            (2, build_jpeg(16, 8)), (3, b""), (4, b"RIFFbad")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    def decode(batches):
        for pdf in batches:
            ms = [decode_meta_safe(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "fmt": [m["fmt"] for m in ms]})

    got = {r["doc_id"]: r["fmt"] for r in
           df.mapInPandas(decode, "doc_id long, fmt string").collect()}
    assert got == {0: "png", 1: "corrupt", 2: "jpeg", 3: "corrupt",
                   4: "corrupt"}
