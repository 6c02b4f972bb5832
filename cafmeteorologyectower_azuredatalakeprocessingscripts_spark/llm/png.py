"""Pure-stdlib PNG codec (zlib + struct) for the multimodal stages.

The container has no image libraries, but PNG's compression IS stdlib
zlib — so a real decode/encode of the most common pixel layouts needs
nothing beyond the standard library. Scope (everything else raises
``PngUnsupported`` and callers fall back to the digest stub):

- 8-bit samples, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  6 (RGBA); no palette, no interlacing, no 16-bit.
- all five scanline filters (None/Sub/Up/Average/Paeth) on decode;
  encode emits filter 0 rows (valid PNG, maximally replayable).

This runs INSIDE Arrow-batched ``mapInPandas`` workers — per-image
Python cost is the decompress + one unfilter pass, amortized over the
batch; nothing here touches the driver.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngUnsupported(ValueError):
    """Payload is not a PNG this codec handles (bad magic, palette,
    16-bit, interlaced, or corrupt structure)."""


def is_png(payload: bytes) -> bool:
    return payload is not None and bytes(payload[:8]) == _SIGNATURE


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG into (width, height, channels, pixels).

    ``pixels`` is row-major, channel-interleaved, 1 byte per sample —
    exactly the IDAT layout after unfiltering.
    """
    data = bytes(payload)
    if not is_png(data):
        raise PngUnsupported("bad signature")
    pos = 8
    width = height = channels = -1
    idat = bytearray()
    saw_end = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngUnsupported("truncated chunk")
        pos += 12 + length  # skip CRC; zlib adler catches pixel corruption
        if ctype == b"IHDR":
            if length != 13:
                raise PngUnsupported("bad IHDR")
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise PngUnsupported(f"bit depth {depth}")
            if color not in _CHANNELS:
                raise PngUnsupported(f"color type {color}")
            if comp != 0 or filt != 0 or interlace != 0:
                raise PngUnsupported("interlaced or nonzero method")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            saw_end = True
            break
    if width < 0 or not saw_end:
        raise PngUnsupported("missing IHDR/IEND")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # corrupt stream
        raise PngUnsupported(f"zlib: {e}") from e
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise PngUnsupported("pixel data size mismatch")
    out = bytearray(stride * height)
    prev_start = -1
    for y in range(height):
        fbyte = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        start = y * stride
        if fbyte == 0:  # None
            out[start : start + stride] = line
        elif fbyte == 1:  # Sub
            for x in range(stride):
                a = out[start + x - channels] if x >= channels else 0
                out[start + x] = (line[x] + a) & 0xFF
        elif fbyte == 2:  # Up
            for x in range(stride):
                b = out[prev_start + x] if y > 0 else 0
                out[start + x] = (line[x] + b) & 0xFF
        elif fbyte == 3:  # Average
            for x in range(stride):
                a = out[start + x - channels] if x >= channels else 0
                b = out[prev_start + x] if y > 0 else 0
                out[start + x] = (line[x] + ((a + b) >> 1)) & 0xFF
        elif fbyte == 4:  # Paeth
            for x in range(stride):
                a = out[start + x - channels] if x >= channels else 0
                b = out[prev_start + x] if y > 0 else 0
                c = out[prev_start + x - channels] if (y > 0 and x >= channels) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                out[start + x] = (line[x] + pred) & 0xFF
        else:
            raise PngUnsupported(f"filter {fbyte}")
        prev_start = start
    return width, height, channels, bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


_COLOR_FOR = {1: 0, 2: 4, 3: 2, 4: 6}


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Encode row-major interleaved 8-bit pixels as a minimal valid PNG
    (filter-0 scanlines, one IDAT, fixed zlib level so the bytes are
    deterministic across runs and platforms)."""
    if channels not in _COLOR_FOR:
        raise PngUnsupported(f"channels {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise PngUnsupported("pixel buffer size mismatch")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, _COLOR_FOR[channels], 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw += pixels[y * stride : (y + 1) * stride]
    idat = zlib.compress(bytes(raw), 6)
    return _SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def resize_nearest(
    width: int, height: int, channels: int, pixels: bytes, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample (floor mapping: src = dst * size // new
    — deterministic, engine-replayable integer arithmetic)."""
    out = bytearray(new_w * new_h * channels)
    stride = width * channels
    o = 0
    for y in range(new_h):
        sy = y * height // new_h
        row = sy * stride
        for x in range(new_w):
            sx = (x * width // new_w) * channels
            out[o : o + channels] = pixels[row + sx : row + sx + channels]
            o += channels
    return bytes(out)
