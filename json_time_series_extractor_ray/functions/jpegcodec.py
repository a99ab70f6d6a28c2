"""Pure-Python/numpy baseline JPEG codec (ITU-T T.81, public spec).

No image libraries exist in this container, so baseline sequential JPEG
is implemented from the published standard: Annex K.1 quantization
tables scaled by the public IJG quality formula, Annex K.3 "typical"
Huffman tables, Annex C canonical code construction, Annex F entropy
decoding.  Supported: 8-bit baseline (SOF0), grayscale and YCbCr color
with 4:4:4 or 4:2:0 sampling, no restart intervals, no progressive.
Everything out of that envelope raises ``ValueError`` loudly.

Design notes for the engine:

* DCT / IDCT / quantization are vectorized over ALL blocks at once
  (einsum against the precomputed orthonormal DCT-II matrix); only the
  entropy bitstream walk is per-symbol Python, which is the irreducible
  serial part of the format.
* The encoder snaps DCT coefficients within 1e-6 of an integer to that
  integer before quantizing.  This makes the encoder deterministic
  across BLAS builds (summation order varies) and gives block-uniform
  images an EXACT closed-form round-trip: a uniform block of value v
  has DC = 8*(v-128), all AC = 0, and at quality 50 (Q[0,0] = 16)
  reconstructs to clamp(2*round_half_away((v-128)/2) + 128, 0, 255) in
  every pixel — the SQL rule ``pipelines/multimodal.py`` oracles
  against (behavioral anchor: the reference keeps media payloads
  opaque; decode is engine-mandated, not ported).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Public-spec tables
# ---------------------------------------------------------------------------

#: Annex K.1 luminance quantization table (row-major 8x8)
QTABLE_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

#: Annex K.1 chrominance quantization table
QTABLE_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

#: zigzag scan: ZIGZAG[k] = (row, col) of the k-th coefficient
_zz = sorted(((r, c) for r in range(8) for c in range(8)),
             key=lambda rc: (rc[0] + rc[1],
                             rc[1] if (rc[0] + rc[1]) % 2 else rc[0]))
ZIGZAG = np.array(_zz, dtype=np.int32)
#: flat index into a row-major 8x8 block for each zigzag position
ZZ_FLAT = ZIGZAG[:, 0] * 8 + ZIGZAG[:, 1]
#: inverse: zigzag position of each flat index
ZZ_INV = np.argsort(ZZ_FLAT)

# Annex K.3 "typical" Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

#: orthonormal DCT-II matrix: F = D @ block @ D.T, block = D.T @ F @ D
_n = np.arange(8)
DCT_M = np.cos((2 * _n[None, :] + 1) * _n[:, None] * np.pi / 16) / 2.0
DCT_M[0, :] = 1.0 / np.sqrt(8.0)


def quality_scaled(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public formula): 50 -> table unchanged."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = (table.astype(np.int64) * scale + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def _canonical_codes(bits, vals):
    """Annex C: (BITS, HUFFVAL) -> {symbol: (code_int, code_len)}."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits (spec F.1.2.3)
        return bytes(self.out)


def _encode_coef(writer, value, codes):
    """Emit huffman(category) + amplitude bits for a DC diff."""
    if value == 0:
        s = 0
    else:
        s = int(abs(value)).bit_length()
    code, length = codes[s]
    writer.put(code, length)
    if s:
        amp = value if value > 0 else value + (1 << s) - 1
        writer.put(amp, s)


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) multiple-of-8 plane -> (n_blocks_y, n_blocks_x, 8, 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).swapaxes(1, 2)


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _fdct_quant(blocks: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """Level-shifted uint8 blocks (n, 8, 8) -> quantized int32 coefs."""
    f = np.einsum("ij,njk,lk->nil", DCT_M,
                  blocks.astype(np.float64) - 128.0, DCT_M)
    # Snap float dust: makes the encoder BLAS-order-independent and the
    # uniform-block DC exactly 8*(v-128) (see module docstring).
    snapped = np.round(f)
    f = np.where(np.abs(f - snapped) < 1e-6, snapped, f)
    return _round_half_away(f / qtable[None, :, :]).astype(np.int32)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(_round_half_away(out), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    y = y.astype(np.float64)
    cb = cb.astype(np.float64) - 128.0
    cr = cr.astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(_round_half_away(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


#: The standard-table Huffman codes are fixed (Annex K): build once at
#: import instead of four dict constructions per encoded frame.
_ENC_TABLES = [
    (_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
     _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)),
    (_canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
     _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)),
]


def encode_jpeg(pixels: np.ndarray, *, quality: int = 50,
                subsample: bool = True) -> bytes:
    """uint8 (H, W) gray / (H, W, 3) RGB -> baseline JPEG bytes.

    ``subsample=True`` uses 4:2:0 chroma (2x2 mean); ``False`` keeps
    4:4:4.  Grayscale always encodes one component."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        gray = True
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        gray = False
    else:
        raise ValueError("encode_jpeg expects (H, W) or (H, W, 3) uint8")
    h, w = pixels.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ql = quality_scaled(QTABLE_LUMA, quality)
    qc = quality_scaled(QTABLE_CHROMA, quality)

    if gray:
        comps = [(_pad_edge(pixels, 8), ql, 0)]
        samplings = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(pixels)
        if subsample:
            yp = _pad_edge(ycc[..., 0], 16)
            cbp = _pad_edge(ycc[..., 1], 16)
            crp = _pad_edge(ycc[..., 2], 16)
            # 2x2 integer mean, round half up — deterministic subsample
            def _down(p):
                s = (p[0::2, 0::2].astype(np.int32)
                     + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2])
                return ((s + 2) >> 2).astype(np.uint8)
            comps = [(yp, ql, 0), (_down(cbp), qc, 1), (_down(crp), qc, 1)]
            samplings = [(2, 2), (1, 1), (1, 1)]
        else:
            comps = [(_pad_edge(ycc[..., 0], 8), ql, 0),
                     (_pad_edge(ycc[..., 1], 8), qc, 1),
                     (_pad_edge(ycc[..., 2], 8), qc, 1)]
            samplings = [(1, 1), (1, 1), (1, 1)]

    # per-component quantized coefficient grids (by, bx, 64 zigzag)
    grids = []
    for plane, qt, _tid in comps:
        blocks = _blockify(plane)
        by, bx = blocks.shape[:2]
        coefs = _fdct_quant(blocks.reshape(-1, 8, 8), qt)
        grids.append(coefs.reshape(by, bx, 64)[:, :, ZZ_FLAT])

    tables = _ENC_TABLES  # fixed Annex K codes, built once at import

    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    writer = _BitWriter()
    prev_dc = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, ((_, _, tid), (hi, vi)) in enumerate(
                    zip(comps, samplings)):
                dc_codes, ac_codes = tables[tid]
                grid = grids[ci]
                for byi in range(vi):
                    for bxi in range(hi):
                        zz = grid[my * vi + byi, mx * hi + bxi]
                        _encode_coef(writer, int(zz[0]) - prev_dc[ci],
                                     dc_codes)
                        prev_dc[ci] = int(zz[0])
                        run = 0
                        last_nz = int(np.max(np.nonzero(zz)[0])) \
                            if np.any(zz[1:]) else 0
                        for k in range(1, last_nz + 1):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = ac_codes[0xF0]
                                writer.put(code, ln)
                                run -= 16
                            s = abs(v).bit_length()
                            code, ln = ac_codes[(run << 4) | s]
                            writer.put(code, ln)
                            amp = v if v > 0 else v + (1 << s) - 1
                            writer.put(amp, s)
                            run = 0
                        if last_nz < 63:
                            code, ln = ac_codes[0x00]  # EOB
                            writer.put(code, ln)
    scan = writer.flush()

    # --- marker segments ---
    out = bytearray(b"\xFF\xD8")  # SOI
    out += (b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    def _dqt(tid, qt):
        body = bytes([tid]) + bytes(int(x) for x in qt.reshape(64)[ZZ_FLAT])
        return b"\xFF\xDB" + struct.pack(">H", 2 + len(body)) + body
    out += _dqt(0, ql)
    if not gray:
        out += _dqt(1, qc)
    ncomp = len(comps)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci, ((_, _, tid), (hi, vi)) in enumerate(zip(comps, samplings)):
        sof += bytes([ci + 1, (hi << 4) | vi, tid])
    out += b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof
    def _dht(cls, tid, bits, vals):
        body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xFF\xC4" + struct.pack(">H", 2 + len(body)) + body
    out += _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += _dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += _dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytes([ncomp])
    for ci, (_, _, tid) in enumerate(comps):
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos
    out += scan
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _HuffTable:
    """Annex F.2.2.3 canonical decoder state (mincode/maxcode/valptr)."""

    def __init__(self, bits, vals):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.valptr[length] = k
                self.mincode[length] = code
                code += n
                k += n
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, reader) -> int:
        code = reader.bit()
        length = 1
        while code > self.maxcode[length]:
            length += 1
            if length > 16:
                raise ValueError("corrupt JPEG entropy stream "
                                 "(huffman code overflow)")
            code = (code << 1) | reader.bit()
        return self.vals[self.valptr[length] + code - self.mincode[length]]


class _BitReader:
    """MSB-first bit reader over a de-stuffed entropy segment."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.pos = 0

    def bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("truncated JPEG entropy stream")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        if self.pos + s > len(self.bits):
            raise ValueError("truncated JPEG entropy stream")
        v = 0
        for b in self.bits[self.pos: self.pos + s]:
            v = (v << 1) | int(b)
        self.pos += s
        if v < (1 << (s - 1)):
            v -= (1 << s) - 1
        return v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 (H, W) gray or (H, W, 3) RGB.

    Supports SOF0 (baseline sequential), 8-bit, 1 or 3 components, any
    sampling factors in {1, 2}, standard or custom DQT/DHT, no restart
    intervals, no progressive/arithmetic coding (loud ``ValueError``)."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    sof = None
    scan_comps = None
    scan_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4: pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit DQT not supported (baseline)")
                zz = np.frombuffer(body[i + 1: i + 65], np.uint8)
                tbl = np.zeros(64, np.int32)
                tbl[ZZ_FLAT] = zz
                qtables[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1: i + 17])
                n = sum(bits)
                vals = list(body[i + 17: i + 17 + n])
                htables[(cls, tid)] = _HuffTable(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision = body[0]
            if precision != 8:
                raise ValueError(f"JPEG precision {precision} unsupported")
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c: 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG SOF{marker - 0xC0} not supported (baseline SOF0 only)")
        elif marker == 0xDD:  # DRI
            if struct.unpack_from(">H", body, 0)[0] != 0:
                raise ValueError("JPEG restart intervals not supported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tb = body[1 + 2 * c: 3 + 2 * c]
                scan_comps.append((cid, tb >> 4, tb & 0x0F))
            scan_start = pos + 2 + seglen
            break
        # APPn / COM / anything else: skip
        pos += 2 + seglen
    if sof is None or scan_comps is None:
        raise ValueError("JPEG missing SOF0/SOS")
    h, w, comps = sof
    if len(comps) not in (1, 3):
        raise ValueError(f"{len(comps)}-component JPEG not supported")
    for _, hi, vi, _ in comps:
        if hi not in (1, 2) or vi not in (1, 2):
            raise ValueError("sampling factors beyond 2 not supported")

    # de-stuff the entropy segment (0xFF00 -> 0xFF); stop at any marker
    raw = bytearray()
    i = scan_start
    while i < len(payload):
        b = payload[i]
        if b == 0xFF:
            nxt = payload[i + 1] if i + 1 < len(payload) else 0xD9
            if nxt == 0x00:
                raw.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                raise ValueError("JPEG restart markers not supported")
            break
        raw.append(b)
        i += 1
    reader = _BitReader(bytes(raw))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_cid = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}

    # coefficient grids per scan component, MCU-aligned
    grids = {}
    tabs = {}
    for cid, td, ta in scan_comps:
        hi, vi, tq = by_cid[cid]
        grids[cid] = np.zeros((mcuy * vi, mcux * hi, 64), np.int32)
        try:
            tabs[cid] = (htables[(0, td)], htables[(1, ta)], qtables[tq])
        except KeyError as exc:
            raise ValueError(f"JPEG references undefined table {exc}")

    prev_dc = {cid: 0 for cid, _, _ in scan_comps}
    for my in range(mcuy):
        for mx in range(mcux):
            for cid, _td, _ta in scan_comps:
                hi, vi, _tq = by_cid[cid]
                dc_tab, ac_tab, _q = tabs[cid]
                for byi in range(vi):
                    for bxi in range(hi):
                        zz = grids[cid][my * vi + byi, mx * hi + bxi]
                        s = dc_tab.decode(reader)
                        prev_dc[cid] += reader.receive_extend(s)
                        zz[0] = prev_dc[cid]
                        k = 1
                        while k <= 63:
                            rs = ac_tab.decode(reader)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "JPEG AC index overflow (corrupt scan)")
                            zz[k] = reader.receive_extend(s)
                            k += 1

    # dequantize + IDCT, vectorized over every block of each component
    planes = {}
    for cid, _td, _ta in scan_comps:
        _dc, _ac, qt = tabs[cid]
        grid = grids[cid]
        by, bx = grid.shape[:2]
        coefs = np.zeros((by * bx, 64), np.float64)
        coefs[:, ZZ_FLAT] = grid.reshape(-1, 64)
        blocks = coefs.reshape(-1, 8, 8) * qt[None, :, :]
        px = np.einsum("ji,njk,kl->nil", DCT_M, blocks, DCT_M) + 128.0
        px = np.clip(_round_half_away(px), 0, 255).astype(np.uint8)
        plane = (px.reshape(by, bx, 8, 8).swapaxes(1, 2)
                 .reshape(by * 8, bx * 8))
        hi, vi, _tq = by_cid[cid]
        # upsample to full resolution by pixel replication, then crop
        if hi < hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        if vi < vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        planes[cid] = plane[:h, :w]

    if len(scan_comps) == 1:
        return planes[scan_comps[0][0]]
    y, cb, cr = (planes[cid] for cid, _, _ in scan_comps)
    return _ycbcr_to_rgb(y, cb, cr)
