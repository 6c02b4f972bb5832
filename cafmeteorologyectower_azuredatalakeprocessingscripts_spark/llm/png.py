"""PNG codec (stdlib zlib/struct + numpy row math) for the multimodal
stages.

The container has no image libraries, but PNG's compression IS stdlib
zlib — so a real decode/encode of the most common pixel layouts needs
nothing beyond the standard library plus numpy (already a hard
dependency of the ANN stages) for the per-scanline unfilter math.
Scope (everything else raises ``PngUnsupported`` and callers fall back
to the digest stub):

- 8-bit samples, color types 0 (gray), 2 (RGB), 3 (palette — expanded
  to RGB on decode; tRNS refused), 4 (gray+alpha), 6 (RGBA); no
  interlacing, no 16-bit.
- all five scanline filters (None/Sub/Up/Average/Paeth) on decode;
  encode emits filter 0 rows (valid PNG, maximally replayable).

Unfilter cost model (measured in DECISIONS round-8): None/Up/Sub rows
are fully numpy-vectorized (Sub is a mod-256 prefix sum per channel
lane — ``np.cumsum(dtype=uint8)`` wraps exactly like the spec's
mod-256 byte math). Average/Paeth carry a true sequential dependency
along x (the ``a`` term is this row's own output), so they run a tight
Python loop per scanline over precomputed numpy-derived lists — faster
than the per-byte bytearray walk they replace, but still the slow path:
a Paeth-heavy PNG (libpng's default heuristic for photographic content)
decodes at roughly list-walk speed, while Up/Sub/None-heavy content
(synthetic/flat imagery, this repo's own encoder) is 10-40x faster.

This runs INSIDE Arrow-batched ``mapInPandas`` workers — per-image
Python cost is the decompress + one unfilter pass, amortized over the
batch; nothing here touches the driver.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

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
    color = -1
    palette = None
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
            if color == 3:
                channels = 1  # palette indices; expanded to RGB below
            elif color in _CHANNELS:
                channels = _CHANNELS[color]
            else:
                raise PngUnsupported(f"color type {color}")
            if comp != 0 or filt != 0 or interlace != 0:
                raise PngUnsupported("interlaced or nonzero method")
        elif ctype == b"PLTE":
            if length % 3 != 0 or length == 0 or length > 768:
                raise PngUnsupported("bad PLTE")
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            # palette alpha would silently change pixel semantics the
            # digest/pixel-sum features rely on — refuse, fall back
            raise PngUnsupported("tRNS not supported")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            saw_end = True
            break
    if width < 0 or not saw_end:
        raise PngUnsupported("missing IHDR/IEND")
    if width == 0 or height == 0:
        raise PngUnsupported("zero-dimension image")
    stride = width * channels
    expected = (stride + 1) * height
    # bounded inflate: a crafted IDAT can expand without limit, and this
    # runs inside Arrow workers — cap at the geometry the header
    # declares instead of trusting the stream (zip-bomb guard)
    try:
        dec = zlib.decompressobj()
        raw = dec.decompress(bytes(idat), expected + 1)
    except zlib.error as e:  # corrupt stream
        raise PngUnsupported(f"zlib: {e}") from e
    # eof=False means a truncated stream whose adler trailer was never
    # verified — the old whole-buffer decompress rejected those too
    if len(raw) != expected or not dec.eof or dec.unconsumed_tail:
        raise PngUnsupported("pixel data size mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    ftypes = arr[:, 0]
    if int(ftypes.max()) > 4:
        raise PngUnsupported(f"filter {int(ftypes.max())}")
    lines = arr[:, 1:]
    out = np.empty((height, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        fbyte = int(ftypes[y])
        line = lines[y]
        prev = out[y - 1] if y > 0 else zero_row
        if fbyte == 0:  # None
            out[y] = line
        elif fbyte == 1:  # Sub — recurrence o[x] = l[x] + o[x-ch] is a
            # mod-256 prefix sum per channel lane; cumsum in uint8
            # wraps exactly like the spec's byte arithmetic
            out[y] = np.cumsum(
                line.reshape(width, channels), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif fbyte == 2:  # Up — whole-row add, uint8 wraparound
            out[y] = line + prev
        elif fbyte == 3:  # Average — sequential in x (a = own output)
            out[y] = _unfilter_average(line, prev, channels)
        else:  # Paeth — sequential in x, b/c/pa terms prevectorized
            out[y] = _unfilter_paeth(line, prev, channels)
    if color == 3:  # palette expansion: one fancy-index gather to RGB
        if palette is None:
            raise PngUnsupported("palette image without PLTE")
        if int(out.max()) >= len(palette):
            raise PngUnsupported("palette index out of range")
        return width, height, 3, palette[out.reshape(-1)].tobytes()
    return width, height, channels, out.tobytes()


def _unfilter_average(line, prev, channels: int) -> list:
    """Average unfilter for one scanline: o[x] = l[x] + (a + b)//2 with
    a = o[x-ch] (this row — true sequential dependency, no closed form
    because of the floor-halving), b = previous row's output."""
    ln = line.tolist()
    pv = prev.tolist()
    n = len(ln)
    cur = [0] * n
    for x in range(channels):
        cur[x] = (ln[x] + (pv[x] >> 1)) & 0xFF
    for x in range(channels, n):
        cur[x] = (ln[x] + ((cur[x - channels] + pv[x]) >> 1)) & 0xFF
    return cur


def _unfilter_paeth(line, prev, channels: int) -> list:
    """Paeth unfilter for one scanline. With p = a + b - c the selector
    distances are pa = |b-c| (a-independent → prevectorized), pb =
    |a-c|, pc = |a + (b-2c)| (b-2c prevectorized); only the ``a`` walk
    stays in the Python loop."""
    ln = line.tolist()
    pv16 = prev.astype(np.int16)
    c16 = np.concatenate(
        [np.zeros(channels, dtype=np.int16), pv16[:-channels]]
    ) if len(pv16) > channels else np.zeros(len(pv16), dtype=np.int16)
    b_l = prev.tolist()
    c_l = c16.tolist()
    pa_l = np.abs(pv16 - c16).tolist()
    d_l = (pv16 - 2 * c16).tolist()
    n = len(ln)
    cur = [0] * n
    for x in range(n):
        a = cur[x - channels] if x >= channels else 0
        pb = a - c_l[x]
        if pb < 0:
            pb = -pb
        pc = a + d_l[x]
        if pc < 0:
            pc = -pc
        if pa_l[x] <= pb and pa_l[x] <= pc:
            pred = a
        elif pb <= pc:
            pred = b_l[x]
        else:
            pred = c_l[x]
        cur[x] = (ln[x] + pred) & 0xFF
    return cur


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
    # prepend the filter-0 byte to every scanline in one numpy hstack
    arr = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(height, stride)
    raw = np.hstack(
        [np.zeros((height, 1), dtype=np.uint8), arr]
    ).tobytes()
    idat = zlib.compress(raw, 6)
    return _SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def resize_nearest(
    width: int, height: int, channels: int, pixels: bytes, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample (floor mapping: src = dst * size // new
    — deterministic, engine-replayable integer arithmetic), as one
    numpy fancy-index gather."""
    arr = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(
        height, width, channels
    )
    ys = (np.arange(new_h, dtype=np.int64) * height) // new_h
    xs = (np.arange(new_w, dtype=np.int64) * width) // new_w
    return arr[ys][:, xs].tobytes()
