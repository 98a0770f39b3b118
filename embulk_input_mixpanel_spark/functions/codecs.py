"""Dependency-free media codecs (stdlib ``zlib``/``struct`` only).

The multimodal pipeline treats payloads as opaque binary + typed metadata;
these codecs make the DECODE step real without PIL/libav (absent from this
environment): a complete PNG encoder/decoder (8-bit grayscale, filter 0 —
signature, IHDR with CRC verification, full IDAT inflate + unfilter, IEND)
and a PCM WAV encoder/decoder (RIFF/fmt/data chunk walk). MP4 gets a
container-level sniff (ftyp box brand) — real frame decode genuinely needs
a video library, and that gap stays loudly declared.

Everything here is driver/executor-side plain Python invoked from
``mapInPandas`` batches (operators/multimodal.py::decode_real) — one call
per Arrow batch, never per row from the JVM.
"""

from __future__ import annotations

import struct
import zlib

__all__ = [
    "encode_png",
    "decode_png",
    "encode_wav",
    "decode_wav",
    "sniff_mp4_brand",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal REAL PNG: 8-bit grayscale, no interlace, filter 0 scanlines.

    ``pixels`` is row-major, ``width * height`` bytes. Output opens in any
    PNG reader (checked structurally by :func:`decode_png`).
    """
    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} pixels, got {len(pixels)}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> dict:
    """Real PNG decode: signature check, IHDR parse + CRC verify, IDAT
    inflate, filter-0 unfilter; returns width/height/bit_depth/color_type
    and the mean pixel value of the recovered image.

    Supports what a header-level pipeline needs (and everything
    :func:`encode_png` emits); non-zero filter types or non-grayscale
    images raise ValueError — loudly, not silently wrong.
    """
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat = 8, None, b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if (bit_depth, color_type, interlace) != (8, 0, 0):
        raise ValueError(
            f"unsupported PNG variant (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace}); this decoder handles 8-bit grayscale"
        )
    raw = zlib.decompress(idat)
    stride = width + 1
    if len(raw) != stride * height:
        raise ValueError("PNG pixel data length mismatch")
    total = 0
    for y in range(height):
        row = raw[y * stride : (y + 1) * stride]
        if row[0] != 0:
            raise ValueError(f"unsupported PNG filter type {row[0]}")
        total += sum(row[1:])
    n = width * height
    return {
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
        "n_samples": n,
        "mean_value": total / n if n else 0.0,
    }


def encode_wav(samples: list[int], sample_rate: int = 16_000) -> bytes:
    """Minimal REAL WAV: RIFF container, PCM 16-bit mono."""
    body = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    riff = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    riff += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_wav(data: bytes) -> dict:
    """Real WAV decode: RIFF/fmt/data chunk walk -> rate, channels, bit
    depth, sample count, and mean |amplitude| of the PCM data."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF header")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            pcm = body
        pos += 8 + length + (length & 1)
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _byte_rate, _align, bits = fmt
    if (audio_fmt, bits) != (1, 16):
        raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
    n = len(pcm) // 2
    samples = struct.unpack(f"<{n}h", pcm[: n * 2])
    return {
        "sample_rate": rate,
        "channels": channels,
        "bit_depth": bits,
        "n_samples": n,
        "mean_value": sum(abs(s) for s in samples) / n if n else 0.0,
    }


def sniff_mp4_brand(data: bytes) -> str:
    """Container-level MP4 sniff: the ftyp box's major brand. Frame decode
    needs a real video library — declared, not faked."""
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return data[8:12].decode("ascii", errors="replace")
    raise ValueError("not an MP4: no ftyp box")
