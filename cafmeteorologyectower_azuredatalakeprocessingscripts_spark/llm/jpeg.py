"""Baseline-JPEG codec (stdlib struct + numpy) for the multimodal
stages — the sixth real codec, and the last real-corpus image format
that was still routed to the digest stub (VERDICT r11 #1).

Unlike PNG/BMP/TIFF/WAV, JPEG is a transform codec: entropy-coded
(Huffman) quantized DCT coefficients. Both Huffman coding modes real
corpora contain are decoded FOR REAL: baseline/extended sequential
(SOF0/SOF1) and PROGRESSIVE (SOF2 — multi-scan spectral selection +
successive approximation, EOB-run codes, DC/AC refinement). JFIF
container markers, canonical Huffman tables from DHT, zigzag +
dequantize, 8x8 inverse DCT, optional chroma subsampling and BT.601
YCbCr->RGB. No codec library is needed — the bit-level entropy decode
runs in Python over a 16-bit lookup table (tables are cached across
payloads, so the per-image cost is the symbol loop), and everything
after the symbol loop is vectorized numpy over ALL blocks at once
(one einsum IDCT per component at EOI, however many scans
contributed coefficients).

Scope (everything else raises ``JpegUnsupported`` and callers fall
back to the digest stub, exactly like the other five codecs):

- Huffman sequential (SOF0/SOF1, single or multiple scans) and
  Huffman progressive (SOF2), 8-bit precision; lossless,
  hierarchical, arithmetic-coded and 12-bit files are refused;
- 1 (grayscale), 3 (YCbCr) or 4 (Adobe CMYK/YCCK via APP14,
  inverted storage — r13) components; luma sampling factors 1x1,
  2x1, 1x2 or 2x2 with 1x1 chroma (4:4:4, 4:2:2, 4:4:0, 4:2:0 — what
  real encoders emit); restart markers (DRI/RSTn) supported in both
  modes;
- 8-bit DQT tables; DHT tables are validated as canonical prefix
  codes before a LUT is built.

The encoders (:func:`encode_jpeg`, :func:`encode_jpeg_progressive`)
exist for fixtures and proof: both transmit the SAME quantized
coefficients, so progressive-vs-baseline decode equality is asserted
pixel-exact in tests — an entropy-layer bug in either mode breaks the
equivalence, independent of the DC-only oracle path.

Decode output matches :mod:`.png` / :mod:`.bmp` / :mod:`.tiff`:
``(width, height, channels, pixel_bytes)`` row-major top-down,
channels interleaved — one contract for every codec behind
``extract_features``.

Amplification note: JPEG is the one format here where a tiny payload
can legitimately declare huge dimensions, so allocation is bounded by
a CONSTANT, not the header: ``_MAX_OUTPUT_BYTES`` caps
width*height*components before any plane is allocated, and the
entropy decoder stops at the declared MCU count (output is bounded by
the same geometry either way). The Huffman LUT cache is likewise
capped so hostile payloads cannot grow it without bound.

This runs INSIDE Arrow-batched ``mapInPandas`` workers; nothing here
touches the driver.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegUnsupported(ValueError):
    """Payload is not a JPEG this codec handles (bad magic,
    lossless/arithmetic coding, unsupported sampling, or corrupt
    marker/entropy structure)."""


def is_jpeg(payload: bytes) -> bool:
    return payload is not None and bytes(payload[:3]) == b"\xff\xd8\xff"


# Output allocation is bounded by this CONSTANT (64 MB of samples) —
# never by header-declared dimensions alone (see module docstring).
_MAX_OUTPUT_BYTES = 1 << 26
# entropy segments up to this many (padded) bytes build the decode word
# list as Python ints (fastest scalar loop); larger segments keep the
# int64 ndarray — 8 bytes/word instead of ~28-byte boxed ints, bounding
# the ADVICE-r13 transient-memory amplification on huge single-segment
# scans (no DRI => the whole scan is ONE segment)
_W48_LIST_MAX = 1 << 22

# ---------------------------------------------------------------- DCT

# zigzag[k] = flat (row*8+col) index of the k-th coefficient in zigzag
# scan order, generated from the diagonal rule (T.81 Figure 5: odd
# diagonals run top-right -> bottom-left i.e. ascending row, even
# diagonals bottom-left -> top-right i.e. ascending column) rather
# than typed as a literal table; tests assert equality against the
# literal T.81 table.
_ZIGZAG = tuple(
    r * 8 + c
    for d in range(15)
    for (r, c) in sorted(
        ((r, d - r) for r in range(8) if 0 <= d - r < 8),
        key=lambda rc: rc[0] if d % 2 else rc[1],
    )
)

# Orthonormal DCT-II basis A[u, x] = c(u)/2 * cos((2x+1)u*pi/16):
# spatial = A.T @ F @ A, frequency = A @ f @ A.T.
_A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _idct_blocks(coeffs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) float spatial
    samples (level shift NOT applied) — two broadcast matmuls over all
    blocks. r17: this was ``einsum("ux,nuv,vy->nxy", optimize=True)``,
    which re-ran the greedy path search per call (~100-170 us of pure
    Python planning per image — the dominant decode cost for small
    images); the explicit pairwise form below IS the association that
    path always picked ((A, coeffs) then (·, A) — verified bitwise
    equal across batch sizes 1..4096), just without the per-call
    planner. ~57x faster per call, bit-identical output."""
    return (_A.T @ coeffs) @ _A


def _fdct_blocks(samples: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted samples -> (n, 8, 8) DCT coefficients
    (same r17 einsum->matmul note as :func:`_idct_blocks`)."""
    return (_A @ samples) @ _A.T


# ------------------------------------------------------- Huffman LUTs

# DHT bytes -> (sym_list, len_list, fast_list) 65536-entry lookups;
# bounded FIFO cache (tables repeat across payloads — every real
# encoder ships the Annex K tables — so the build cost amortizes to
# ~zero per image).
_LUT_CACHE: dict[bytes, tuple[list, list, list]] = {}
_LUT_CACHE_MAX = 64


def _fast_pack(sym: list, length: list, is_dc: bool) -> list:
    """Packed one-peek decode table for the sequential hot loop: for
    each 16-bit peek, a single int that resolves the WHOLE (code,
    value) pair when both fit the window.

    e > 0  — full decode: extended value+65536 in bits 0..16, zero
             run in bits 17..22, total consumed bits in 23..27;
    e < 0  — valid coefficient code whose value bits overrun the
             window (len+size > 16): -e packs total len+size
             (bits 0..4), size (5..9), run (10..13) so the loop
             finishes the extraction from the SAME 48-bit word
             (len+size <= 31 and the word holds 48-r >= 33 bits);
    e == 0 — everything else (AC EOB/ZRL, invalid codes): the slow
             path re-reads sym/length and raises or branches.

    Built vectorized in numpy over all 65536 peeks, then .tolist()
    once — Python list indexing is the fastest per-symbol access.
    """
    sym_np = np.asarray(sym, dtype=np.int64)
    len_np = np.asarray(length, dtype=np.int64)
    if is_dc:
        s = np.clip(sym_np, 0, 15)
        run = np.zeros_like(s)
        ok = (sym_np >= 0) & (sym_np <= 15)
    else:
        s = sym_np & 15
        run = sym_np >> 4
        ok = (sym_np > 0) & (s > 0)
    tot = len_np + s
    fits = ok & (tot <= 16)
    peek = np.arange(65536, dtype=np.int64)
    vbits = (peek >> np.clip(16 - tot, 0, 16)) & ((1 << s) - 1)
    half_v = 1 << np.clip(s - 1, 0, 14)
    ext = np.where((s > 0) & (vbits < half_v), vbits + 1 - (1 << s), vbits)
    e_fast = (ext + 65536) | (run << 17) | (tot << 23)
    e_slow = -((run << 10) | (s << 5) | tot)
    return np.where(fits, e_fast, np.where(ok, e_slow, 0)).tolist()


# extend tables: _EXT65[s][v] = EXTEND(v, s) + 65536 (the packed-value
# offset), so the hot loop's sign extension is two list indexes instead
# of a compare/branch over pow2/half lookups. 65536 ints total.
_EXT65 = tuple(
    tuple(
        ((v + 1 - (1 << s)) if v < (1 << (s - 1)) else v) + 65536
        for v in range(1 << s)
    )
    if s
    else (65536,)
    for s in range(16)
)


def _build_lut(bits: bytes, vals: bytes, is_dc: bool) -> tuple[list, list, list]:
    key = bytes([is_dc]) + bytes(bits) + bytes(vals)
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym = [-1] * 65536
    length = [0] * 65536
    code = 0
    k = 0
    for ln in range(1, 17):
        n = bits[ln - 1]
        if code + n > (1 << ln):
            raise JpegUnsupported("DHT is not a valid prefix code")
        for _ in range(n):
            base = code << (16 - ln)
            span = 1 << (16 - ln)
            sym[base : base + span] = [vals[k]] * span
            length[base : base + span] = [ln] * span
            code += 1
            k += 1
        code <<= 1
    entry = (sym, length, _fast_pack(sym, length, is_dc))
    if len(_LUT_CACHE) >= _LUT_CACHE_MAX:
        _LUT_CACHE.pop(next(iter(_LUT_CACHE)))
    _LUT_CACHE[key] = entry
    return entry


# ---------------------------------------------------------- decoder


def _scan_segments(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Split one scan's entropy-coded data into restart segments,
    unstuffing 0xFF00 -> 0xFF in each. Returns (segments, end) where
    ``end`` is the offset of the terminating non-RST marker's 0xFF (or
    ``len(data)`` when the tail is truncated — the MCU-count and
    consumed-bits checks decide whether the data sufficed)."""
    segs = []
    seg_start = start
    pos = start
    n = len(data)
    while True:
        idx = data.find(b"\xff", pos)
        if idx < 0 or idx + 1 >= n:
            segs.append(data[seg_start:n].replace(b"\xff\x00", b"\xff"))
            return segs, n
        nxt = data[idx + 1]
        if nxt == 0x00 or nxt == 0xFF:
            pos = idx + 2 if nxt == 0x00 else idx + 1
            continue
        segs.append(data[seg_start:idx].replace(b"\xff\x00", b"\xff"))
        if 0xD0 <= nxt <= 0xD7:  # RSTn
            seg_start = pos = idx + 2
            continue
        return segs, idx


class _BitReader:
    """Bit reader over one unstuffed entropy segment, used by the
    PROGRESSIVE scan modes (the sequential hot loop stays inline in
    `_decode_scan_sequential` — baseline decode speed is unchanged).
    Same buffer rule as the inline loop: the buffer may be FILLED with
    1-bit padding past the end (the peek window needs it), but
    consumed bits may never exceed the segment's real bits."""

    __slots__ = ("seg", "n", "acc", "nb", "bpos")

    def __init__(self, seg: bytes):
        self.seg = seg
        self.n = len(seg)
        self.acc = 0
        self.nb = 0
        self.bpos = 0

    def _fill(self) -> None:
        acc = self.acc & ((1 << self.nb) - 1)
        nb, bpos, seg, n = self.nb, self.bpos, self.seg, self.n
        while nb < 32:
            if bpos < n:
                acc = (acc << 8) | seg[bpos]
            elif bpos < n + 4:
                acc = (acc << 8) | 0xFF
            else:
                raise JpegUnsupported("entropy stream truncated")
            bpos += 1
            nb += 8
        self.acc, self.nb, self.bpos = acc, nb, bpos

    def huff(self, sym: list, length: list) -> int:
        if self.nb < 16:
            self._fill()
        peek = (self.acc >> (self.nb - 16)) & 0xFFFF
        s = sym[peek]
        if s < 0:
            raise JpegUnsupported("invalid Huffman code")
        self.nb -= length[peek]
        return s

    def bits(self, s: int) -> int:
        if self.nb < s:
            self._fill()
        self.nb -= s
        return (self.acc >> self.nb) & ((1 << s) - 1)

    def receive_extend(self, s: int) -> int:
        v = self.bits(s)
        return v - (1 << s) + 1 if v < (1 << (s - 1)) else v

    def consumed_ok(self) -> bool:
        return self.bpos * 8 - self.nb <= self.n * 8


def _decode_scan_sequential(segs, comps, coef, order, geom, dri):
    """Sequential (SOF0/SOF1) scan: the baseline hot loop. Interleaved
    (ns > 1) iterates MCUs; single-component scans iterate the
    component's TRUE block grid (T.81: non-interleaved MCU = 1 block).

    Hot-path choices (r13, ~2.5x over the r12 accumulator loop): NO
    bit accumulator at all — the loop keeps one small-int ``bitpos``
    and peeks 16 bits anywhere via a numpy-prebuilt list of 32-bit
    words at every even byte offset (so every arithmetic op stays a
    1-2 digit CPython int; the r12 acc held up to 63 bits, making
    every shift a 3-digit bigint op). The packed fast LUT from
    :func:`_fast_pack` resolves a whole (code, value) pair per peek
    whenever both fit the window, with a second packed form for long
    codes; and each coefficient APPENDS one packed
    (target<<17 | value+65536) int, scattered into the numpy grid
    ``coef[ci]`` with one vectorized assignment per scan — the loop
    never touches numpy scalars, and grid memory is 4
    bytes/coefficient instead of a Python list cell."""
    mcux, mcuy, grids = geom
    nc = len(comps)
    # zig extended past 63 with a sentinel block-flat index: a run
    # overrunning the block packs an out-of-grid target and the
    # scatter's bounds check at scan end raises — cheaper than a
    # per-coefficient k>63 compare in the hot loop
    zig = _ZIGZAG + (1 << 30,) * 16
    zig17 = tuple(z << 17 for z in zig)
    pow2 = tuple(1 << s for s in range(33))
    half = tuple(1 << (s - 1) if s else 0 for s in range(17))
    # per-component packed scatter buffers: (flat_index << 17) | val17
    out = [[] for _ in range(nc)]
    interleaved = len(order) > 1
    # slot = (ci, A, B, C, pk, dfast, afast, asym, alen) with the
    # block's raster index as the affine my*A + mx*B + C, divmod
    # hoisted out of the slot loop
    if interleaved:
        slots = []
        for ci, dtab, atab in order:
            hi, vi = comps[ci][1], comps[ci][2]
            bwp = grids[ci][0]
            for dy in range(vi):
                for dx in range(hi):
                    slots.append(
                        (ci, vi * bwp, hi, dy * bwp + dx, out[ci].append,
                         dtab[2], atab[2], atab[0], atab[1])
                    )
        n_units = mcux * mcuy
        mdiv = mcux
    else:
        ci, dtab, atab = order[0]
        bwp, _bhp, bw, bh = grids[ci]
        slots = [
            (ci, bwp, 1, 0, out[ci].append, dtab[2], atab[2], atab[0], atab[1])
        ]
        n_units = bw * bh
        mdiv = bw
    pred = [0] * nc
    ext65 = _EXT65
    seg_i = -1
    w48: list = []
    bitpos = 0
    real_bits = 0
    try:
        for m in range(n_units):
            if dri and m % dri == 0 or m == 0:
                # consumed bits may never exceed the segment's real bits
                # (JPEG's byte-boundary padding is flushed, not decoded)
                if m and bitpos > real_bits:
                    raise JpegUnsupported("entropy segment truncated")
                seg_i += 1
                if seg_i >= len(segs):
                    raise JpegUnsupported("missing restart segment")
                raw = segs[seg_i]
                real_bits = len(raw) * 8
                # 0xFF pad covers LEGITIMATE trailing reads only (<= 7
                # byte-boundary padding bits + one 48-bit word read);
                # hostile overruns walk off the word list and the
                # enclosing IndexError handler converts that to
                # JpegUnsupported — cheaper than padding out the 2048-bit
                # worst-case block, which cost ~130 words of build per
                # segment on the tiny oracle fixtures
                padded = raw + b"\xff" * (8 + (len(raw) & 1))
                if len(padded) < 2048:
                    # tiny segments (the oracle fixtures): ~15 numpy calls
                    # of fixed overhead cost more than a u16 comprehension
                    hw = struct.unpack(">%dH" % (len(padded) // 2), padded)
                    w48 = [
                        (hw[i] << 32) | (hw[i + 1] << 16) | hw[i + 2]
                        for i in range(len(hw) - 2)
                    ]
                else:
                    b = np.frombuffer(padded, dtype=np.uint8).astype(np.int64)
                    m_w = (len(padded) - 4) // 2
                    warr = (
                        (b[0 : 2 * m_w - 1 : 2] << 40)
                        | (b[1 : 2 * m_w : 2] << 32)
                        | (b[2 : 2 * m_w + 1 : 2] << 24)
                        | (b[3 : 2 * m_w + 2 : 2] << 16)
                        | (b[4 : 2 * m_w + 3 : 2] << 8)
                        | b[5 : 2 * m_w + 4 : 2]
                    )
                    # tolist() costs ~28 bytes per 2 entropy bytes (one
                    # boxed int per word — ~18x transient amplification,
                    # ADVICE r13), so only segments up to 4 MiB take the
                    # fast Python-list path; a multi-hundred-MB segment
                    # stays an int64 ndarray (8 bytes/word, scalar
                    # indexing works identically in the decode loop —
                    # np.int64 shifts/masks/table lookups are
                    # bit-compatible, just slower per access, and that
                    # path is already throughput-bound)
                    w48 = warr.tolist() if len(padded) <= _W48_LIST_MAX else warr
                bitpos = 0
                if m:
                    pred = [0] * nc
            my, mx = divmod(m, mdiv)
            for ci, ay, ax, c0, pk, dfast, afast, asym, alen in slots:
                base17 = (my * ay + mx * ax + c0) << 23  # (idx * 64) << 17
                wq = w48[bitpos >> 4]
                r = bitpos & 15
                e = dfast[(wq >> (32 - r)) & 0xFFFF]
                if e > 0:
                    bitpos += e >> 23
                    p = pred[ci] + (e & 0x1FFFF) - 65536
                elif e < 0:
                    w = -e
                    tot = w & 31
                    s = (w >> 5) & 31
                    v = (wq >> (48 - r - tot)) & (pow2[s] - 1)
                    bitpos += tot
                    p = pred[ci] + ext65[s][v] - 65536
                else:
                    raise JpegUnsupported("invalid DC Huffman code")
                # legal 8-bit DC magnitudes stay <= 2047; 16x headroom
                # keeps hostile streams from overflowing the int32 grid
                if not -32768 <= p <= 32767:
                    raise JpegUnsupported("DC predictor out of range")
                pred[ci] = p
                pk(base17 | (p + 65536))
                k = 1
                while k < 64:
                    wq = w48[bitpos >> 4]
                    r = bitpos & 15
                    e = afast[(wq >> (32 - r)) & 0xFFFF]
                    if e > 0:  # one-peek (code, value) decode
                        k += (e >> 17) & 63
                        bitpos += e >> 23
                        pk(base17 | zig17[k] | (e & 0x1FFFF))
                        k += 1
                    elif e < 0:  # value bits overrun the 16-bit peek; the
                        # 48-bit word still holds them (len+size <= 31)
                        w = -e
                        k += w >> 10
                        tot = w & 31
                        s = (w >> 5) & 31
                        v = (wq >> (48 - r - tot)) & (pow2[s] - 1)
                        bitpos += tot
                        pk(base17 | zig17[k] | ext65[s][v])
                        k += 1
                    else:  # EOB / ZRL / invalid
                        peek = (wq >> (32 - r)) & 0xFFFF
                        rs = asym[peek]
                        if rs == 0:  # EOB
                            bitpos += alen[peek]
                            break
                        if rs == 0xF0:  # ZRL
                            bitpos += alen[peek]
                            k += 16
                            continue
                        raise JpegUnsupported("invalid AC Huffman code")
                if bitpos > real_bits:
                    raise JpegUnsupported("entropy stream truncated")
        if bitpos > real_bits:
            raise JpegUnsupported("entropy stream truncated")
    except IndexError:
        # a hostile stream that outruns the (lightly padded)
        # word list between truncation checks lands here
        raise JpegUnsupported("entropy stream truncated") from None
    for ci in range(nc):
        if out[ci]:
            arr = np.asarray(out[ci], dtype=np.int64)
            try:
                # the zig sentinel (and any corrupt run) lands out of
                # grid range — this is the hoisted k>63 check
                coef[ci].reshape(-1)[arr >> 17] = (arr & 0x1FFFF) - 65536
            except IndexError:
                raise JpegUnsupported("AC coefficient overruns block") from None


def _decode_scan_progressive(segs, comps, coef, order, geom, dri, ss, se, ah, al):
    """One progressive (SOF2) scan — the four T.81 modes: DC first
    (diffs at reduced precision, << Al), DC refinement (one raw bit
    per block), AC first (band Ss..Se run-length with EOB-run codes),
    AC refinement (correction bits on known coefficients + newly
    significant +/-2^Al). Spec constraints enforced by the caller: AC
    scans are single-component; Ah == 0 or Ah == Al + 1."""
    mcux, mcuy, grids = geom
    nc = len(comps)
    zig = _ZIGZAG
    interleaved = len(order) > 1
    if ss == 0:
        units = []
        if interleaved:
            for m in range(mcux * mcuy):
                my, mx = divmod(m, mcux)
                for ci, _dt, _at in order:
                    bwp, hi, vi = grids[ci][0], comps[ci][1], comps[ci][2]
                    for dy in range(vi):
                        for dx in range(hi):
                            units.append((ci, (my * vi + dy) * bwp + mx * hi + dx))
        else:
            ci = order[0][0]
            bwp, bw, bh = grids[ci][0], grids[ci][2], grids[ci][3]
            units = [
                (ci, (m // bw) * bwp + m % bw) for m in range(bw * bh)
            ]
        n_units = mcux * mcuy if interleaved else len(units)
        per_mcu = len(units) // n_units if n_units else 1
    else:
        ci = order[0][0]
        bwp, bw, bh = grids[ci][0], grids[ci][2], grids[ci][3]
        units = [(ci, (m // bw) * bwp + m % bw) for m in range(bw * bh)]
        n_units = len(units)
        per_mcu = 1

    tabs = {ci: (dtab, atab) for ci, dtab, atab in order}
    pred = [0] * nc
    eobrun = 0
    br = None
    seg_i = -1
    p1 = 1 << al
    m1 = -p1
    for m in range(n_units):
        if dri and m % dri == 0 or m == 0:
            if m and not br.consumed_ok():
                raise JpegUnsupported("entropy segment truncated")
            seg_i += 1
            if seg_i >= len(segs):
                raise JpegUnsupported("missing restart segment")
            br = _BitReader(segs[seg_i])
            if m:
                pred = [0] * nc
                eobrun = 0
        for u in range(per_mcu):
            ci, idx = units[m * per_mcu + u]
            blk = coef[ci][idx]
            if ss == 0:
                if ah == 0:  # DC first
                    dsym, dlen = tabs[ci][0][0], tabs[ci][0][1]
                    s = br.huff(dsym, dlen)
                    if s:
                        if s > 15:
                            raise JpegUnsupported("DC magnitude overruns")
                        pred[ci] += br.receive_extend(s)
                        # legal 8-bit DC stays <= 2047 even before
                        # the << al shift; 16x headroom keeps hostile
                        # streams inside the int32 grid
                        if not -32768 <= pred[ci] <= 32767:
                            raise JpegUnsupported("DC predictor out of range")
                    blk[0] = pred[ci] << al
                else:  # DC refinement: one raw bit
                    if br.bits(1):
                        blk[0] |= p1
                continue
            # AC scans (single component)
            asym, alen = tabs[ci][1][0], tabs[ci][1][1]
            if ah == 0:  # AC first
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = br.huff(asym, alen)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16  # ZRL
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.bits(r)
                        break
                    k += r
                    if k > se:
                        raise JpegUnsupported("AC coefficient overruns band")
                    blk[zig[k]] = br.receive_extend(s) << al
                    k += 1
            else:  # AC refinement
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = br.huff(asym, alen)
                        r, s = rs >> 4, rs & 0x0F
                        v = 0
                        if s == 0:
                            if r < 15:
                                # NOTE no -1, unlike the first-scan
                                # form: here the CURRENT block flows
                                # into the shared eobrun>0 logic below,
                                # which also decrements
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.bits(r)
                                break
                            # r == 15: ZRL — skip 16 zero-history slots
                        else:
                            if s != 1:
                                raise JpegUnsupported("refinement size != 1")
                            v = p1 if br.bits(1) else m1
                        # advance over r zero-history slots, emitting
                        # correction bits for nonzero-history ones
                        while k <= se:
                            z = zig[k]
                            cur = blk[z]
                            if cur != 0:
                                if br.bits(1) and (cur & p1) == 0:
                                    blk[z] = cur + (p1 if cur >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if v:
                            if k > se:
                                raise JpegUnsupported("refinement overruns band")
                            blk[zig[k]] = v
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        z = zig[k]
                        cur = blk[z]
                        if cur != 0 and br.bits(1) and (cur & p1) == 0:
                            blk[z] = cur + (p1 if cur >= 0 else m1)
                        k += 1
                    eobrun -= 1
    if br is not None and not br.consumed_ok():
        raise JpegUnsupported("entropy stream truncated")


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline/extended-sequential (SOF0/SOF1) or
    PROGRESSIVE (SOF2) JPEG payload -> ``(width, height, channels,
    pixel_bytes)``, channels 1 (grayscale) or 3 (RGB, BT.601).
    Coefficients accumulate across scans in a raster-order padded
    block grid per component; dequantize + batched IDCT + plane
    assembly run ONCE at the end, shared by both coding modes."""
    data = bytes(payload)
    if not is_jpeg(data):
        raise JpegUnsupported("bad signature")
    qtabs: dict[int, np.ndarray] = {}
    hdc: dict[int, tuple[list, list]] = {}
    hac: dict[int, tuple[list, list]] = {}
    frame = None
    progressive = False
    adobe_transform = None  # APP14 color-transform flag (r13: CMYK/YCCK)
    dri = 0
    coef = None
    geom = None
    dc_done = set()
    saw_scan = False
    pos = 2
    n = len(data)
    while True:
        if pos >= n:
            if saw_scan:
                break  # tolerated missing EOI after a complete scan
            raise JpegUnsupported("marker stream truncated before SOS")
        if pos + 2 > n or data[pos] != 0xFF:
            raise JpegUnsupported(f"expected marker at {pos}")
        # T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes —
        # some encoders pad with them, so skip the run instead of
        # treating a doubled 0xFF as corruption
        while data[pos + 1] == 0xFF:
            pos += 1
            if pos + 2 > n:
                raise JpegUnsupported("marker stream truncated in fill bytes")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            if not saw_scan:
                raise JpegUnsupported("EOI before SOS")
            break
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            raise JpegUnsupported("stray SOI/RST marker in header")
        if pos + 4 > n:
            raise JpegUnsupported("marker stream truncated")
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if seglen < 2 or pos + 2 + seglen > n:
            raise JpegUnsupported(f"marker 0x{marker:02x} length overruns payload")
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq not in (0, 1):
                    raise JpegUnsupported(f"DQT precision {pq}")
                width = 1 + pq  # Pq=1: 16-bit big-endian entries (r13)
                if b + 1 + 64 * width > len(body):
                    raise JpegUnsupported("DQT truncated")
                tab = np.frombuffer(
                    body[b + 1 : b + 1 + 64 * width],
                    dtype=np.uint8 if pq == 0 else np.dtype(">u2"),
                ).astype(np.int32)
                q = np.empty(64, dtype=np.int32)
                q[np.array(_ZIGZAG)] = tab  # store in block order
                if (q == 0).any():
                    raise JpegUnsupported("zero in quantization table")
                qtabs[tq] = q
                b += 1 + 64 * width
        elif marker == 0xC4:  # DHT
            b = 0
            while b + 17 <= len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = body[b + 1 : b + 17]
                nv = sum(bits)
                if b + 17 + nv > len(body):
                    raise JpegUnsupported("DHT truncated")
                vals = body[b + 17 : b + 17 + nv]
                (hdc if tc == 0 else hac)[th] = _build_lut(bits, vals, tc == 0)
                b += 17 + nv
            if b != len(body):
                raise JpegUnsupported("DHT trailing bytes")
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 / SOF2
            if frame is not None:
                raise JpegUnsupported("multiple frames")
            progressive = marker == 0xC2
            if len(body) < 6:
                raise JpegUnsupported("SOF truncated")
            prec = body[0]
            h, w = (body[1] << 8) | body[2], (body[3] << 8) | body[4]
            ncomp = body[5]
            if prec != 8:
                raise JpegUnsupported(f"{prec}-bit precision")
            if ncomp not in (1, 3, 4):
                raise JpegUnsupported(f"{ncomp} components")
            if len(body) != 6 + 3 * ncomp:
                raise JpegUnsupported("SOF component list truncated")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append([cid, hv >> 4, hv & 0x0F, tq])
            if w == 0 or h == 0:
                raise JpegUnsupported("zero dimension")
            if w * h * ncomp > _MAX_OUTPUT_BYTES:
                raise JpegUnsupported(
                    f"{w}x{h}x{ncomp} exceeds the {_MAX_OUTPUT_BYTES}-byte output cap"
                )
            if ncomp == 1:
                comps[0][1] = comps[0][2] = 1
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            for cid, hi, vi, tq in comps:
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise JpegUnsupported(f"sampling factor {hi}x{vi}")
                if (hi, vi) != (hmax, vmax) and (hi, vi) != (1, 1):
                    raise JpegUnsupported(
                        "mixed sampling factors beyond luma-subsampled chroma"
                    )
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            grids = []
            coef = []
            for cid, hi, vi, tq in comps:
                bwp, bhp = mcux * hi, mcuy * vi
                cw = (w * hi + hmax - 1) // hmax
                ch = (h * vi + vmax - 1) // vmax
                bw, bh = (cw + 7) // 8, (ch + 7) // 8
                grids.append((bwp, bhp, bw, bh))
                # int32 (blocks, 64) grid: 4 bytes/coefficient, so the
                # worst-case allocation tracks _MAX_OUTPUT_BYTES instead
                # of the ~10x cost of Python list-of-list cells
                coef.append(np.zeros((bwp * bhp, 64), dtype=np.int32))
            frame = (w, h, comps, hmax, vmax)
            geom = (mcux, mcuy, grids)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegUnsupported("lossless/hierarchical/arithmetic JPEG")
        elif marker == 0xDD:  # DRI
            if len(body) != 2:
                raise JpegUnsupported("DRI length")
            dri = (body[0] << 8) | body[1]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegUnsupported("SOS before SOF")
            w, h, comps, hmax, vmax = frame
            ns = body[0] if body else -1
            if ns < 1 or ns > len(comps) or len(body) != 1 + 2 * ns + 3:
                raise JpegUnsupported("SOS truncated")
            order = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                match = [c for c in comps if c[0] == cs]
                if not match:
                    raise JpegUnsupported(f"scan references unknown component {cs}")
                ci = comps.index(match[0])
                if any(o[0] == ci for o in order):
                    raise JpegUnsupported("component repeated in scan")
                order.append((ci, tt >> 4, tt & 0x0F))
            if ns > 1 and sum(comps[o[0]][1] * comps[o[0]][2] for o in order) > 10:
                # T.81 B.2.3: an interleaved scan's MCU carries at
                # most 10 data units — also bounds the slots loop
                raise JpegUnsupported("interleaved MCU exceeds 10 blocks")
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if not progressive:
                if (ss, se, ah, al) != (0, 63, 0, 0):
                    raise JpegUnsupported("non-sequential scan parameters")
                resolved = []
                for ci, td, ta in order:
                    if td not in hdc or ta not in hac:
                        raise JpegUnsupported("scan references missing Huffman table")
                    if comps[ci][3] not in qtabs:
                        raise JpegUnsupported("missing quantization table")
                    resolved.append((ci, hdc[td], hac[ta]))
                segs, pos = _scan_segments(data, pos)
                _decode_scan_sequential(segs, comps, coef, resolved, geom, dri)
            else:
                if al > 13 or (ah and ah != al + 1):
                    raise JpegUnsupported("successive-approximation parameters")
                if ss == 0:
                    if se != 0:
                        raise JpegUnsupported("DC scan with Se != 0")
                elif ns != 1 or se < ss or se > 63:
                    raise JpegUnsupported("AC scan parameters")
                resolved = []
                for ci, td, ta in order:
                    dtab = atab = ([], [], [])
                    if ss == 0 and ah == 0:
                        if td not in hdc:
                            raise JpegUnsupported("missing DC Huffman table")
                        dtab = hdc[td]
                        if ci in dc_done:
                            raise JpegUnsupported("duplicate DC first scan")
                        dc_done.add(ci)
                    if ss > 0:
                        if ta not in hac:
                            raise JpegUnsupported("missing AC Huffman table")
                        atab = hac[ta]
                        if ci not in dc_done:
                            raise JpegUnsupported("AC scan before DC scan")
                    if comps[ci][3] not in qtabs:
                        raise JpegUnsupported("missing quantization table")
                    resolved.append((ci, dtab, atab))
                segs, pos = _scan_segments(data, pos)
                _decode_scan_progressive(
                    segs, comps, coef, resolved, geom, dri, ss, se, ah, al
                )
            saw_scan = True
        elif marker == 0xEE and body[:5] == b"Adobe" and len(body) >= 12:
            # APP14: transform 0 = CMYK stored inverted, 1 = YCbCr,
            # 2 = YCCK — the flag that makes 4-component files
            # decodable (Adobe's inverted-storage convention)
            adobe_transform = body[11]
        # else: APPn/COM/DNL etc — skipped via seglen

    if frame is None or not saw_scan:
        raise JpegUnsupported("no decoded scan")
    w, h, comps, hmax, vmax = frame
    mcux, mcuy, grids = geom
    nc = len(comps)
    planes = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        bwp, bhp = grids[ci][0], grids[ci][1]
        # float64 multiply: no int32 wrap even for hostile coefficients
        deq = coef[ci].astype(np.float64) * qtabs[tq][None, :]
        spatial = _idct_blocks(deq.reshape(-1, 8, 8))
        px = np.clip(np.round(spatial + 128.0), 0, 255).astype(np.uint8)
        plane = (
            px.reshape(bhp, bwp, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bhp * 8, bwp * 8)
        )
        cw = (w * hi + hmax - 1) // hmax
        ch = (h * vi + vmax - 1) // vmax
        plane = plane[:ch, :cw]
        if (hi, vi) != (hmax, vmax):  # replicate chroma up to full res
            plane = np.repeat(plane, hmax // hi, axis=1)[:, :w]
            plane = np.repeat(plane, vmax // vi, axis=0)[:h, :]
        else:
            plane = plane[:h, :w]
        planes.append(plane)
    if nc == 1:
        return w, h, 1, planes[0].tobytes()
    if nc == 4:
        # Adobe CMYK/YCCK (r13): 4-component files are only decodable
        # with the APP14 transform flag (storage is INVERTED per the
        # Adobe convention — stored value = 255 - ink). transform 0:
        # planes ARE the inverted C'M'Y'K'; transform 2 (YCCK): the
        # first three planes are BT.601 YCbCr over the inverted CMY.
        # RGB = C' * K' / 255 (integer, round-half-up) — the standard
        # libjpeg-pipeline composite for inverted storage.
        if adobe_transform not in (0, 2):
            raise JpegUnsupported(
                "4-component JPEG without an Adobe APP14 CMYK/YCCK transform"
            )
        if adobe_transform == 2:
            y = planes[0].astype(np.float64)
            cb = planes[1].astype(np.float64) - 128.0
            cr = planes[2].astype(np.float64) - 128.0
            cmy_inv = np.stack(
                [
                    np.clip(np.round(y + 1.402 * cr), 0, 255),
                    np.clip(np.round(y - 0.344136 * cb - 0.714136 * cr), 0, 255),
                    np.clip(np.round(y + 1.772 * cb), 0, 255),
                ],
                axis=-1,
            ).astype(np.uint16)
        else:
            cmy_inv = np.stack(planes[:3], axis=-1).astype(np.uint16)
        k_inv = planes[3].astype(np.uint16)[:, :, None]
        rgb = ((cmy_inv * k_inv + 127) // 255).astype(np.uint8)
        return w, h, 3, rgb.tobytes()
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.empty((h, w, 3), dtype=np.uint8)
    rgb[:, :, 0] = np.clip(np.round(y + 1.402 * cr), 0, 255)
    rgb[:, :, 1] = np.clip(np.round(y - 0.344136 * cb - 0.714136 * cr), 0, 255)
    rgb[:, :, 2] = np.clip(np.round(y + 1.772 * cb), 0, 255)
    return w, h, 3, rgb.tobytes()


# ---------------------------------------------------------- encoder

# ITU T.81 Annex K "typical" Huffman tables — what real encoders emit.
_DC_LUMA_BITS = bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0])
_DC_LUMA_VALS = bytes(range(12))
_DC_CHROMA_BITS = bytes([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0])
_DC_CHROMA_VALS = bytes(range(12))
_AC_LUMA_BITS = bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D])
_AC_LUMA_VALS = bytes(
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]
)
_AC_CHROMA_BITS = bytes([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77])
_AC_CHROMA_VALS = bytes(
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]
)


_ENC_CODES_CACHE: dict[tuple[bytes, bytes], dict[int, tuple[int, int]]] = {}


def _enc_codes(bits: bytes, vals: bytes) -> dict[int, tuple[int, int]]:
    # memoized (r17): every encode call rebuilt the same 4 canonical
    # Annex-K tables; the inputs are the module-level constants, so the
    # cache is bounded by the distinct (bits, vals) pairs ever passed
    cached = _ENC_CODES_CACHE.get((bits, vals))
    if cached is not None:
        return cached
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    _ENC_CODES_CACHE[(bits, vals)] = codes
    return codes


class _BitWriter:
    """Entropy bit sink with 0xFF byte stuffing."""

    __slots__ = ("out", "acc", "nb")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nb = 0

    def put(self, code: int, ln: int) -> None:
        self.acc = (self.acc << ln) | (code & ((1 << ln) - 1))
        self.nb += ln
        while self.nb >= 8:
            b = (self.acc >> (self.nb - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nb -= 8
            self.acc &= (1 << self.nb) - 1

    def flush(self) -> None:
        if self.nb:
            pad = 8 - self.nb
            self.put((1 << pad) - 1, pad)  # 1-bit padding per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_blocks(
    bw: _BitWriter,
    blocks_zz: np.ndarray,
    order: list,
    pred: list,
    dc_codes: list,
    ac_codes: list,
) -> None:
    """Emit one MCU's blocks (already zigzagged, quantized int) in
    `order` = [(comp_index, block_row_index)]."""
    for ci, bi in order:
        # one tolist() per block: the tail scan + AC loop below index
        # the 64 coefficients scalar-by-scalar, and list indexing is
        # ~2x numpy scalar indexing (r17; values exact — int64 -> int)
        blk = blocks_zz[ci][bi].tolist()
        dc = int(blk[0])
        diff = dc - pred[ci]
        pred[ci] = dc
        s = _category(diff)
        code, ln = dc_codes[ci][s]
        bw.put(code, ln)
        if s:
            bw.put(diff if diff >= 0 else diff - 1 + (1 << s), s)
        run = 0
        last = 63
        while last > 0 and blk[last] == 0:
            last -= 1
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[ci][0xF0]
                bw.put(code, ln)  # ZRL
                run -= 16
            s = _category(v)
            code, ln = ac_codes[ci][(run << 4) | s]
            bw.put(code, ln)
            bw.put(v if v >= 0 else v - 1 + (1 << s), s)
            run = 0
        if last < 63:
            code, ln = ac_codes[ci][0x00]
            bw.put(code, ln)  # EOB


def _plane_to_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """uint8 plane (rows multiple of 8) -> (nblocks, 64) quantized
    zigzag coefficients, MCU-order caller's responsibility."""
    ph, pw = plane.shape
    blocks = (
        plane.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    f = _fdct_blocks(blocks).reshape(-1, 64)
    qz = np.round(f / q[None, :]).astype(np.int32)
    return qz[:, np.array(_ZIGZAG)]


def _pad_plane(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate up to multiples of (mh, mw)."""
    h, w = plane.shape
    ph = (h + mh - 1) // mh * mh
    pw = (w + mw - 1) // mw * mw
    if (ph, pw) == (h, w):
        return plane
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _prepare_encode(
    width, height, channels, pixels, subsampling, qtable, qtable_chroma=None
):
    """Shared encoder front half: RGB->YCbCr, chroma box-mean
    downsample, MCU-grid edge padding, FDCT + quantize + zigzag.
    Returns (blocks_zz per comp in raster padded layout, samp, grids,
    mcux, mcuy, qs) with ``qs`` the per-component quantization tables
    — [luma] or [luma, chroma, chroma] (real encoders ship separate
    luma/chroma tables; ``qtable_chroma=None`` reuses the luma table
    and keeps the single-DQT stream byte-identical to pre-r12)."""
    if channels not in (1, 3, 4):
        raise JpegUnsupported(f"{channels} channels")
    luma_samp = {
        "444": (1, 1), "422": (2, 1), "440": (1, 2), "420": (2, 2),
        "411": (4, 1),  # r13: the remaining real-world chroma layout
    }
    if subsampling not in luma_samp:
        raise JpegUnsupported(f"subsampling {subsampling}")
    if channels == 4 and subsampling != "444":
        raise JpegUnsupported("4-channel (Adobe CMYK) encode is 4:4:4 only")
    arr = np.frombuffer(bytes(pixels), dtype=np.uint8)
    if arr.size != width * height * channels:
        raise JpegUnsupported("pixel buffer does not match dimensions")

    def _qt(t):
        t = np.ones(64, dtype=np.int32) if t is None else np.asarray(
            t, dtype=np.int32
        ).reshape(64)
        if (t < 1).any() or (t > 255).any():
            raise JpegUnsupported("quantization values must be 1..255")
        return t

    q = _qt(qtable)
    qc = q if qtable_chroma is None else _qt(qtable_chroma)
    if channels == 1:
        planes = [arr.reshape(height, width)]
        samp = [(1, 1)]
    elif channels == 4:
        # Adobe CMYK (transform 0): the caller supplies STORED-space
        # bytes (inverted ink, per the Adobe convention) — no
        # colorspace transform on this path
        cmyk = arr.reshape(height, width, 4)
        planes = [np.ascontiguousarray(cmyk[:, :, i]) for i in range(4)]
        samp = [(1, 1)] * 4
    else:
        rgb = arr.reshape(height, width, 3).astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = np.round(0.299 * r + 0.587 * g + 0.114 * b)
        cb = np.round(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b)
        cr = np.round(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b)
        planes = [np.clip(p, 0, 255).astype(np.uint8) for p in (y, cb, cr)]
        samp = [luma_samp[subsampling], (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    qs = [q] + [qc] * (channels - 1)
    blocks_zz = []
    grids = []
    for ci, ((hi, vi), plane) in enumerate(zip(samp, planes)):
        if (hi, vi) != (hmax, vmax):  # box-mean downsample chroma
            p = _pad_plane(plane, vmax // vi, hmax // hi).astype(np.float64)
            fy, fx = vmax // vi, hmax // hi
            p = p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx).mean(axis=(1, 3))
            plane = np.clip(np.round(p), 0, 255).astype(np.uint8)
        # pad to this component's full MCU grid (edge replication)
        plane = _pad_plane(plane, 8 * vi * mcuy, 8 * hi * mcux)
        blocks_zz.append(_plane_to_blocks(plane, qs[ci]))
        grids.append((mcux * hi, mcuy * vi, hi, vi))
    return blocks_zz, samp, grids, mcux, mcuy, qs


def _emit_headers(width, height, nc, samp, qs, sof_marker):
    """SOI + JFIF APP0 + DQT(s) + SOF + the four Annex K DHTs. A
    distinct chroma table gets its own DQT (id 1) and the chroma
    components reference Tq=1 — the two-table layout every real
    encoder emits."""
    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    if nc == 4:
        # APP14 "Adobe" with transform 0 — the flag the decoder needs
        # to route 4-component data through the inverted-CMYK path
        out += (
            b"\xff\xee"
            + struct.pack(">H", 14)
            + b"Adobe"
            + bytes([0, 100, 0, 0, 0, 0, 0])
        )
    zz = np.array(_ZIGZAG)
    two_tables = nc >= 3 and qs[1] is not qs[0]
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([0x00]) + bytes(
        int(v) for v in qs[0][zz]
    )
    if two_tables:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([0x01]) + bytes(
            int(v) for v in qs[1][zz]
        )
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([nc])
    for ci in range(nc):
        hi, vi = samp[ci]
        tq = 1 if two_tables and ci else 0
        sof += bytes([ci + 1, (hi << 4) | vi, tq])
    out += bytes([0xFF, sof_marker]) + struct.pack(">H", 2 + len(sof)) + sof
    tables = [(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS), (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS)]
    if nc >= 3:
        tables += [
            (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
        ]
    for tid, bits, vals in tables:
        body = bytes([tid]) + bits + vals
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    return out


def encode_jpeg(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    subsampling: str = "444",
    qtable: np.ndarray | None = None,
    qtable_chroma: np.ndarray | None = None,
    restart_interval: int = 0,
    non_interleaved: bool = False,
) -> bytes:
    """Encode interleaved uint8 pixels as a baseline JFIF JPEG.

    ``channels`` 1 (grayscale) or 3 (RGB -> BT.601 YCbCr);
    ``subsampling`` '444', '422', '440' or '420' (3-channel only;
    luma factors 1x1 / 2x1 / 1x2 / 2x2 with 1x1 chroma); ``qtable`` is a
    64-entry block-order quantization table used for every component
    (default all-ones — near-lossless, and EXACTLY lossless for
    blocks that are constant, which is what the oracle fixtures use);
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs. ``non_interleaved=True`` (3-channel only) writes ONE SCAN
    PER COMPONENT over its true block grid — the other legal
    sequential layout (T.81 non-interleaved scans, MCU = 1 block),
    emitted by some scanners; exists to exercise that decoder branch
    with an exact equivalence against the interleaved form."""
    blocks_zz, samp, grids, mcux, mcuy, qs = _prepare_encode(
        width, height, channels, pixels, subsampling, qtable, qtable_chroma
    )
    nc = channels
    out = _emit_headers(width, height, nc, samp, qs, sof_marker=0xC0)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    dc_l = _enc_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _enc_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _enc_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _enc_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    dc_codes = [dc_l] + [dc_c] * (nc - 1)
    ac_codes = [ac_l] + [ac_c] * (nc - 1)

    if non_interleaved:
        if nc == 1:
            raise JpegUnsupported("non_interleaved requires 3 channels")
        if restart_interval:
            raise JpegUnsupported("non_interleaved does not emit restarts")
        hmax = max(s[0] for s in samp)
        vmax = max(s[1] for s in samp)
        for ci in range(nc):
            sos = bytes([1, ci + 1, 0x00 if ci == 0 else 0x11, 0, 63, 0])
            out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
            hi, vi = samp[ci]
            bpl = grids[ci][0]
            cw = (width * hi + hmax - 1) // hmax
            ch = (height * vi + vmax - 1) // vmax
            bw_t, bh_t = (cw + 7) // 8, (ch + 7) // 8
            bwr = _BitWriter()
            pred = [0] * nc
            for m in range(bw_t * bh_t):
                idx = (m // bw_t) * bpl + m % bw_t
                _encode_blocks(bwr, blocks_zz, [(ci, idx)], pred, dc_codes, ac_codes)
            bwr.flush()
            out += bwr.out
        out += b"\xff\xd9"
        return bytes(out)

    sos = bytes([nc])
    for ci in range(nc):
        td_ta = 0x00 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    pred = [0] * nc
    n_mcu = mcux * mcuy
    rst = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            out += bw.out
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + rst % 8])
            rst += 1
            pred = [0] * nc
        my, mx = divmod(m, mcux)
        order = []
        for ci in range(nc):
            bpl, _rows, hi, vi = grids[ci]
            for dy in range(vi):
                for dx in range(hi):
                    order.append((ci, (my * vi + dy) * bpl + mx * hi + dx))
        _encode_blocks(bw, blocks_zz, order, pred, dc_codes, ac_codes)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# Generic AC table for PROGRESSIVE scans (see encode_jpeg_progressive):
# all 256 run/size symbols, 128 at length 8 + 128 at length 9.
_AC_PROG_BITS = bytes([0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0])
_AC_PROG_VALS = bytes(range(256))


def _flush_eobrun(bw: _BitWriter, ac: dict, eobrun: int, run_bits: list) -> int:
    """Emit a pending EOB-run (EOBn code + extra bits) followed by the
    buffered correction bits of the blocks in the run. Returns 0."""
    if eobrun:
        r = eobrun.bit_length() - 1
        code, ln = ac[r << 4]
        bw.put(code, ln)
        if r:
            bw.put(eobrun - (1 << r), r)
        for b in run_bits:
            bw.put(b, 1)
        run_bits.clear()
    return 0


def encode_jpeg_progressive(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    subsampling: str = "444",
    qtable: np.ndarray | None = None,
    qtable_chroma: np.ndarray | None = None,
    spectral_only: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode interleaved uint8 pixels as a PROGRESSIVE (SOF2) JFIF
    JPEG — the fixture/equivalence counterpart of the progressive
    decoder: it transmits exactly the same quantized coefficients as
    :func:`encode_jpeg`, just reordered into scans, so
    ``decode_jpeg(progressive) == decode_jpeg(baseline)`` pixel-exact
    for the same inputs (asserted in tests).

    Scan script (mirrors libjpeg's simple progression shape):
    spectral-selection-only (``spectral_only=True``): interleaved DC
    scan, then one full AC scan per component. Default adds successive
    approximation so every decoder mode is exercised: DC first at
    Al=1, AC first (bands 1-5 and 6-63) at Al=1, then DC/AC refinement
    scans at Al=0. ``restart_interval`` > 0 emits DRI + RSTn in every
    scan (units: MCUs for the DC scan, blocks for AC scans)."""
    blocks_zz, samp, grids, mcux, mcuy, qs = _prepare_encode(
        width, height, channels, pixels, subsampling, qtable, qtable_chroma
    )
    nc = channels
    out = _emit_headers(width, height, nc, samp, qs, sof_marker=0xC2)
    # The Annex K AC tables carry no EOBn (n > 0) symbols — progressive
    # AC scans need them, which is exactly why real progressive files
    # ship custom DHTs. Emit a generic AC table (id 2) covering ALL 256
    # run/size symbols: 128 at 8 bits + 128 at 9 bits (canonical, the
    # all-ones 9-bit code stays unused as T.81 requires).
    out += (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 17 + 256)
        + bytes([0x12])
        + _AC_PROG_BITS
        + _AC_PROG_VALS
    )
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    dc_l = _enc_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    dc_c = _enc_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    dc_codes = [dc_l] + [dc_c] * (nc - 1)
    ac_prog = _enc_codes(_AC_PROG_BITS, _AC_PROG_VALS)
    ac_codes = [ac_prog] * nc

    rst_state = [0]

    def sos_header(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for ci in comp_ids:
            # DC scans read Td (Annex K 0/1); AC scans read Ta = 2 (the
            # generic progressive table emitted above)
            body += bytes([ci + 1, ((0 if ci == 0 else 1) << 4) | 2])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    def emit_rst(buf, bw):
        bw.flush()
        buf += bw.out
        buf += bytes([0xFF, 0xD0 + rst_state[0] % 8])
        rst_state[0] += 1
        return _BitWriter()

    def dc_scan(al, refine):
        buf = bytearray(sos_header(list(range(nc)), 0, 0, al + 1 if refine else 0, al))
        bw = _BitWriter()
        pred = [0] * nc
        for m in range(mcux * mcuy):
            if restart_interval and m and m % restart_interval == 0:
                bw = emit_rst(buf, bw)
                pred = [0] * nc
            my, mx = divmod(m, mcux)
            for ci in range(nc):
                bpl, _r, hi, vi = grids[ci]
                for dy in range(vi):
                    for dx in range(hi):
                        dc = int(blocks_zz[ci][(my * vi + dy) * bpl + mx * hi + dx][0])
                        if refine:
                            bw.put((dc >> al) & 1, 1)
                            continue
                        v = dc >> al  # arithmetic shift: T.81 DC point transform
                        diff = v - pred[ci]
                        pred[ci] = v
                        s = _category(diff)
                        code, ln = dc_codes[ci][s]
                        bw.put(code, ln)
                        if s:
                            bw.put(diff if diff >= 0 else diff - 1 + (1 << s), s)
        bw.flush()
        buf += bw.out
        return buf

    def _pt(v, al):  # AC point transform: truncate toward zero
        return v >> al if v >= 0 else -((-v) >> al)

    def ac_first_scan(ci, ss, se, al):
        buf = bytearray(sos_header([ci], ss, se, 0, al))
        bw = _BitWriter()
        ac = ac_codes[ci]
        bpl = grids[ci][0]
        bw_true, bh_true = _true_grid(ci)
        eobrun = 0
        for m in range(bw_true * bh_true):
            if restart_interval and m and m % restart_interval == 0:
                eobrun = _flush_eobrun(bw, ac, eobrun, [])
                bw = emit_rst(buf, bw)
            blk = blocks_zz[ci][(m // bw_true) * bpl + m % bw_true]
            vals = [_pt(int(blk[k]), al) for k in range(ss, se + 1)]
            if not any(vals):
                eobrun += 1
                if eobrun == 0x7FFF:
                    eobrun = _flush_eobrun(bw, ac, eobrun, [])
                continue
            eobrun = _flush_eobrun(bw, ac, eobrun, [])
            r = 0
            for v in vals:
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    code, ln = ac[0xF0]
                    bw.put(code, ln)
                    r -= 16
                s = _category(v)
                code, ln = ac[(r << 4) | s]
                bw.put(code, ln)
                bw.put(v if v >= 0 else v - 1 + (1 << s), s)
                r = 0
            if r:
                eobrun = 1
        _flush_eobrun(bw, ac, eobrun, [])
        bw.flush()
        buf += bw.out
        return buf

    def ac_refine_scan(ci, ss, se, al):
        buf = bytearray(sos_header([ci], ss, se, al + 1, al))
        bw = _BitWriter()
        ac = ac_codes[ci]
        bpl = grids[ci][0]
        bw_true, bh_true = _true_grid(ci)
        eobrun = 0
        run_bits: list[int] = []
        for m in range(bw_true * bh_true):
            if restart_interval and m and m % restart_interval == 0:
                eobrun = _flush_eobrun(bw, ac, eobrun, run_bits)
                bw = emit_rst(buf, bw)
            blk = blocks_zz[ci][(m // bw_true) * bpl + m % bw_true]
            band = [int(blk[k]) for k in range(ss, se + 1)]
            hist = [_pt(v, al + 1) for v in band]
            cur = [_pt(v, al) for v in band]
            newly = [h == 0 and c != 0 for h, c in zip(hist, cur)]
            if not any(newly):
                # block joins the EOB run; its correction bits queue up
                eobrun += 1
                run_bits.extend((abs(v) >> al) & 1 for v, h in zip(band, hist) if h)
                if eobrun == 0x7FFF:
                    eobrun = _flush_eobrun(bw, ac, eobrun, run_bits)
                continue
            eobrun = _flush_eobrun(bw, ac, eobrun, run_bits)
            r = 0
            pending: list[int] = []
            for v, h, is_new in zip(band, hist, newly):
                if h != 0:
                    pending.append((abs(v) >> al) & 1)
                    continue
                if not is_new:
                    r += 1
                    continue
                while r > 15:
                    code, ln = ac[0xF0]
                    bw.put(code, ln)
                    for b in pending:
                        bw.put(b, 1)
                    pending.clear()
                    r -= 16
                code, ln = ac[(r << 4) | 1]
                bw.put(code, ln)
                bw.put(1 if v > 0 else 0, 1)
                for b in pending:
                    bw.put(b, 1)
                pending.clear()
                r = 0
            if r or pending:
                eobrun = 1
                run_bits = pending
        _flush_eobrun(bw, ac, eobrun, run_bits)
        bw.flush()
        buf += bw.out
        return buf

    def _true_grid(ci):
        hi, vi = samp[ci]
        hmax = max(s[0] for s in samp)
        vmax = max(s[1] for s in samp)
        cw = (width * hi + hmax - 1) // hmax
        ch = (height * vi + vmax - 1) // vmax
        return (cw + 7) // 8, (ch + 7) // 8

    if spectral_only:
        out += dc_scan(0, refine=False)
        for ci in range(nc):
            out += ac_first_scan(ci, 1, 63, 0)
    else:
        out += dc_scan(1, refine=False)
        for ci in range(nc):
            out += ac_first_scan(ci, 1, 5, 1)
            out += ac_first_scan(ci, 6, 63, 1)
        out += dc_scan(0, refine=True)
        for ci in range(nc):
            out += ac_refine_scan(ci, 1, 5, 0)
            out += ac_refine_scan(ci, 6, 63, 0)
    out += b"\xff\xd9"
    return bytes(out)
