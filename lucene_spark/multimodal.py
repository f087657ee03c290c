"""Multimodal binary columns: dependency-free encoders + REAL decoders.

The training-data-pipeline brief treats image/audio/video as opaque
``binary`` columns with typed metadata extracted by Arrow-batched UDFs.
This container ships no image/audio libraries, so this module implements
the three container formats whose metadata lives in well-defined headers —
PNG (IHDR), JPEG (SOF segment), WAV (RIFF fmt/data chunks) — from scratch:

- build_png / build_jpeg / build_wav construct REAL, spec-conformant files
  (PNG chunk CRCs via zlib.crc32, zlib-deflated IDAT; JPEG marker segments;
  RIFF chunk framing) so the decode path is exercised against honest bytes.
- decode_meta walks the actual byte structure — PNG signature + chunk walk
  to IHDR (big-endian dims), JPEG marker scan to SOFn, RIFF chunk walk to
  fmt — no length-derived fakes.
- wav_samples decodes the PCM data chunk to an int16 numpy array (the
  "frame decode" for sampling).

Everything is deterministic and pure, usable from pytest without Spark;
the Spark side calls these inside mapInPandas over Arrow batches
(__spark_entry__._q_mm_binary_meta / _q_mm_frame_sample).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------

def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def build_png(width: int, height: int) -> bytes:
    """Minimal truecolor PNG: signature, IHDR, one-scanline-worth IDAT
    (zlib-deflated zeros — metadata decoders don't inflate), IEND."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"\x00" * (1 + 3 * min(width, 4)))
    return (PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def build_jpeg(width: int, height: int) -> bytes:
    """Minimal JFIF JPEG: SOI, APP0, SOF0 carrying the dimensions, EOI."""
    app0 = b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    sof0 = (struct.pack(">BHHB", 8, height, width, 3)
            + b"\x01\x22\x00" + b"\x02\x11\x01" + b"\x03\x11\x01")
    out = b"\xff\xd8"                                   # SOI
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    out += b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
    return out + b"\xff\xd9"                            # EOI


def build_wav(sample_rate: int, samples: np.ndarray, channels: int = 1) -> bytes:
    """Canonical RIFF/WAVE with a 16-bit PCM fmt chunk and LE data chunk."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    block_align = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# decoders — the real header parsers
# ---------------------------------------------------------------------------

def decode_meta(b: bytes) -> dict:
    """Sniff + parse: → {'fmt', 'width', 'height', 'sample_rate',
    'n_channels', 'bit_depth'} (absent dims are None). Raises ValueError on
    bytes that are none of the three formats or are structurally broken."""
    try:
        if b[:8] == PNG_SIG:
            return _decode_png(b)
        if b[:2] == b"\xff\xd8":
            return _decode_jpeg(b)
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            return _decode_wav(b)
    except struct.error as e:
        # truncated payloads hit short struct unpacks; the documented
        # contract is ValueError for anything structurally broken, so a
        # caller skipping bad blobs with `except ValueError` never lets a
        # truncated file crash the whole Arrow batch
        raise ValueError(f"truncated payload: {e}") from e
    raise ValueError("unrecognized payload")


def _decode_png(b: bytes) -> dict:
    off = 8
    while off + 8 <= len(b):
        (length,), ctype = struct.unpack(">I", b[off:off + 4]), b[off + 4:off + 8]
        data = b[off + 8:off + 8 + length]
        crc = struct.unpack(">I", b[off + 8 + length:off + 12 + length])[0]
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError("PNG chunk CRC mismatch")
        if ctype == b"IHDR":
            w, h, depth, _ctype2, _comp, _filt, _inter = struct.unpack(
                ">IIBBBBB", data)
            return {"fmt": "png", "width": int(w), "height": int(h),
                    "sample_rate": None, "n_channels": None,
                    "bit_depth": int(depth)}
        off += 12 + length
    raise ValueError("PNG without IHDR")


_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _decode_jpeg(b: bytes) -> dict:
    off = 2
    while off + 4 <= len(b):
        if b[off] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = b[off + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", b[off + 2:off + 4])[0]
        if marker in _JPEG_SOF:
            depth, h, w, ncomp = struct.unpack(">BHHB", b[off + 4:off + 10])
            return {"fmt": "jpeg", "width": int(w), "height": int(h),
                    "sample_rate": None, "n_channels": int(ncomp),
                    "bit_depth": int(depth)}
        off += 2 + seglen
    raise ValueError("JPEG without SOF")


def _wav_chunks(b: bytes):
    off = 12
    while off + 8 <= len(b):
        cid = b[off:off + 4]
        size = struct.unpack("<I", b[off + 4:off + 8])[0]
        yield cid, b[off + 8:off + 8 + size]
        off += 8 + size + (size & 1)  # RIFF chunks are word-aligned


def _decode_wav(b: bytes) -> dict:
    for cid, data in _wav_chunks(b):
        if cid == b"fmt ":
            _afmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", data[:16])
            return {"fmt": "wav", "width": None, "height": None,
                    "sample_rate": int(rate), "n_channels": int(channels),
                    "bit_depth": int(bits)}
    raise ValueError("WAV without fmt chunk")


def wav_samples(b: bytes) -> np.ndarray:
    """Decode the PCM payload (the frame stream) → int16 array."""
    if not (b[:4] == b"RIFF" and b[8:12] == b"WAVE"):
        raise ValueError("not a WAV payload")
    for cid, data in _wav_chunks(b):
        if cid == b"data":
            return np.frombuffer(data, dtype="<i2")
    raise ValueError("WAV without data chunk")


_CORRUPT_META = {"fmt": "corrupt", "width": None, "height": None,
                 "sample_rate": None, "n_channels": None, "bit_depth": None}


def decode_meta_safe(b: bytes) -> dict:
    """``decode_meta`` for CRAWLED corpora: corrupt / truncated /
    unrecognized payloads yield a typed ``fmt='corrupt'`` row with null
    dims instead of raising. Inside a mapInPandas stage a raised decode
    error fails the task — and after Spark's task retries, the whole
    100-TB job — for one bad blob in 10^9; web-crawled media is routinely
    corrupt, so the pipeline operators decode through this wrapper and
    corrupt payloads stay FILTERABLE data (``WHERE fmt != 'corrupt'``),
    never a stage failure."""
    try:
        return decode_meta(b)
    except ValueError:
        return dict(_CORRUPT_META)


def wav_samples_safe(b: bytes) -> np.ndarray:
    """``wav_samples`` for crawled corpora: a corrupt payload decodes to
    ZERO frames (empty int16 array) instead of raising — the doc simply
    contributes no sampled rows. Same stage-survival rationale as
    ``decode_meta_safe``."""
    try:
        return wav_samples(b)
    except ValueError:
        return np.empty(0, dtype="<i2")
