"""Pure-Python/numpy codecs for UNCOMPRESSED media containers.

No image/audio libraries exist in this container, but these formats
need none: BMP (BITMAPINFOHEADER, BI_RGB 24-bit) and PPM/PGM (binary
P6/P5) are header + raw pixel rows, WAV PCM decodes with the stdlib
``wave`` module, and PNG is CRC-framed chunks + stdlib ``zlib`` deflate
+ the five RFC 2083 scanline filters (implemented below).  Baseline
JPEG lives in the sibling module ``jpegcodec.py``.  These make the
engine's media stages REAL for those formats; the remaining compressed
formats (MP3/H.264) stay explicit ``NotImplementedError`` stubs in
``pipelines/multimodal.py``.

All decoders return numpy arrays; all encoders are deterministic byte
producers (used to synthesize test/driver payloads).
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

from .gifcodec import GIF_MAGICS

# ---------------------------------------------------------------------------
# BMP — BITMAPINFOHEADER, uncompressed (BI_RGB), 24-bit BGR, 4-byte row pad
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (H, W, 3) -> 24-bit BI_RGB BMP bytes (bottom-up)."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_bmp expects an (H, W, 3) RGB array")
    h, w, _ = pixels.shape
    row_raw = w * 3
    pad = (-row_raw) % 4
    stride = row_raw + pad
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_raw] = pixels[::-1, :, ::-1].reshape(h, row_raw)  # bottom-up BGR
    data = rows.tobytes()
    file_size = 14 + 40 + len(data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                      2835, 2835, 0, 0)
    return header + dib + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> RGB uint8 array (H, W, 3).

    Supports bottom-up (positive height) and top-down (negative height)
    BITMAPINFOHEADER images; anything else raises ``ValueError``."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        raise ValueError(f"unsupported BMP DIB header size {dib_size}")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp != 24 or planes != 1:
        raise ValueError(
            f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    stride = (w * 3 + 3) & ~3
    need = data_offset + stride * h
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(payload, np.uint8, count=stride * h,
                         offset=data_offset).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return np.ascontiguousarray(bgr[:, :, ::-1])


# ---------------------------------------------------------------------------
# PPM / PGM — binary P6 (RGB) / P5 (gray), maxval <= 255
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """uint8 array (H, W, 3) -> binary P6; (H, W) -> binary P5."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim == 3 and pixels.shape[2] == 3:
        magic = b"P6"
        h, w = pixels.shape[:2]
    elif pixels.ndim == 2:
        magic = b"P5"
        h, w = pixels.shape
    else:
        raise ValueError("encode_ppm expects (H, W, 3) or (H, W)")
    return magic + f"\n{w} {h}\n255\n".encode() + pixels.tobytes()


def _ppm_tokens(payload: bytes, start: int, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII ints, honoring '#' comments."""
    out: list[int] = []
    i = start
    while len(out) < n:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        out.append(int(payload[i:j]))
        i = j
    return out, i + 1  # single whitespace byte after maxval


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 -> (H, W, 3) uint8; binary P5 -> (H, W) uint8."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    (w, h, maxval), off = _ppm_tokens(payload, 2, 3)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    channels = 3 if magic == b"P6" else 1
    need = w * h * channels
    if len(payload) - off < need:
        raise ValueError("truncated PPM pixel data")
    arr = np.frombuffer(payload, np.uint8, count=need, offset=off)
    return arr.reshape((h, w, 3) if channels == 3 else (h, w)).copy()


# ---------------------------------------------------------------------------
# WAV — PCM via the stdlib ``wave`` module (pure Python)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 array (n,) or (n, channels) -> PCM WAV bytes."""
    samples = np.asarray(samples, dtype="<i2")
    channels = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """PCM WAV bytes -> dict(samples int16 (n, ch), sample_rate,
    n_channels, duration_ms)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError(
                f"only 16-bit PCM WAV supported, got {8 * f.getsampwidth()}-bit")
        rate = f.getframerate()
        ch = f.getnchannels()
        n = f.getnframes()
        raw = f.readframes(n)
    samples = np.frombuffer(raw, "<i2").reshape(-1, ch)
    return {
        "samples": samples,
        "sample_rate": rate,
        "n_channels": ch,
        "duration_ms": n * 1000 // rate if rate else 0,
    }


# ---------------------------------------------------------------------------
# PNG — stdlib zlib + the five scanline filters (RFC 2083), no interlace
# ---------------------------------------------------------------------------
#
# PNG needs no image library: the container is CRC-framed chunks, the
# compression is deflate (stdlib ``zlib``), and the only image-specific
# machinery is the per-scanline filter (None/Sub/Up/Average/Paeth).
# Supported here: bit depth 8, color types 0 (gray), 2 (RGB), 3
# (palette), 4 (gray+alpha), 6 (RGBA), interlace off.  Adam7 interlace,
# 1/2/4/16-bit depths raise ``ValueError`` (out of scope, loud).

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: channels per PNG color type (palette entries expand to RGB on decode)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body)))


def encode_png(pixels: np.ndarray, *, filters="cycle", level: int = 6) -> bytes:
    """uint8 array (H, W) gray / (H, W, 3) RGB / (H, W, 4) RGBA -> PNG.

    ``filters`` picks the per-scanline filter type: an int 0-4 applies
    that filter to every row; ``"cycle"`` (default) uses ``row % 5`` so a
    round-trip exercises all five filter codecs in one payload."""
    import zlib

    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        color_type, ch = 0, 1
        h, w = pixels.shape
        flat = pixels.reshape(h, w, 1)
    elif pixels.ndim == 3 and pixels.shape[2] in (2, 3, 4):
        ch = pixels.shape[2]
        color_type = {2: 4, 3: 2, 4: 6}[ch]
        h, w = pixels.shape[:2]
        flat = pixels
    else:
        raise ValueError("encode_png expects (H,W), (H,W,2|3|4) uint8")
    stride = w * ch
    rows = flat.reshape(h, stride).astype(np.int16)
    prev = np.zeros(stride, np.int16)
    out = bytearray()
    for r in range(h):
        cur = rows[r]
        ft = (r % 5) if filters == "cycle" else int(filters)
        left = np.zeros(stride, np.int16)
        left[ch:] = cur[:-ch]
        ul = np.zeros(stride, np.int16)
        ul[ch:] = prev[:-ch]
        if ft == 0:
            filt = cur
        elif ft == 1:
            filt = cur - left
        elif ft == 2:
            filt = cur - prev
        elif ft == 3:
            filt = cur - (left + prev) // 2
        elif ft == 4:
            filt = cur - _paeth(left, prev, ul)
        else:
            raise ValueError(f"unknown PNG filter type {filters!r}")
        out.append(ft)
        out.extend((filt % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out), level))
            + _png_chunk(b"IEND", b""))


#: Below this many raw bytes the pure-Python unfilter wins: numpy call
#: overhead (~µs per op) dwarfs the work on a handful of pixels, and a
#: thumbnail-sized image decodes ~20x faster on plain ints.
_SMALL_IMAGE_BYTES = 4096


def _unfilter_small(raw: np.ndarray, h: int, stride: int, ch: int):
    """Pure-Python scanline unfilter for tiny images (all five filters,
    byte-at-a-time on plain ints — no numpy dispatch overhead)."""
    recon = bytearray(h * stride)
    prev = bytes(stride)
    for r in range(h):
        base = r * (stride + 1)
        ft = raw[base]
        cur = raw[base + 1: base + 1 + stride].tobytes()
        row = bytearray(stride)
        if ft == 0:
            row[:] = cur
        elif ft == 1:
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                row[i] = (cur[i] + left) & 255
        elif ft == 2:
            for i in range(stride):
                row[i] = (cur[i] + prev[i]) & 255
        elif ft == 3:
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                row[i] = (cur[i] + ((left + prev[i]) >> 1)) & 255
        elif ft == 4:
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                up = prev[i]
                p = left + up - ul
                pa_ = p - left if p >= left else left - p
                pb = p - up if p >= up else up - p
                pc = p - ul if p >= ul else ul - p
                if pa_ <= pb and pa_ <= pc:
                    pred = left
                elif pb <= pc:
                    pred = up
                else:
                    pred = ul
                row[i] = (cur[i] + pred) & 255
        else:
            raise ValueError(f"unknown PNG filter type {ft} at row {r}")
        recon[r * stride:(r + 1) * stride] = row
        prev = bytes(row)
    return np.frombuffer(bytes(recon), np.uint8).reshape(h, stride)


def _paeth(left: np.ndarray, up: np.ndarray, ul: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (RFC 2083 §6.6) over int16 lanes."""
    p = left + up - ul
    pa_ = np.abs(p - left)
    pb = np.abs(p - up)
    pc = np.abs(p - ul)
    return np.where((pa_ <= pb) & (pa_ <= pc), left, np.where(pb <= pc, up, ul))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array: (H, W) for gray, (H, W, C) otherwise
    (palette images expand to RGB).  8-bit depth, no interlace; all five
    scanline filters.  Unfiltering is vectorized per row — Sub is a
    per-lane cumulative sum, Up is one vector add; Average/Paeth walk
    pixels (<= W steps) with the byte lanes vectorized."""
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        length = struct.unpack_from(">I", payload, pos)[0]
        tag = payload[pos + 4: pos + 8]
        body = payload[pos + 8: pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        crc = struct.unpack_from(">I", payload, pos + 8 + length)[0]
        if crc != zlib.crc32(tag + body):
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt_method, interlace = struct.unpack(
        ">IIBBBBB", ihdr)
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if comp != 0 or filt_method != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    ch = _PNG_CHANNELS[color_type]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data length mismatch")
    if len(raw) <= _SMALL_IMAGE_BYTES:
        return _finish_png(_unfilter_small(raw, h, stride, ch),
                           h, w, ch, color_type, plte)
    raw = raw.reshape(h, stride + 1)
    ftypes = raw[:, 0]
    data = raw[:, 1:].astype(np.int16)
    recon = np.zeros((h, stride), np.int16)
    if int(ftypes.max(initial=0)) > 4:
        r = int(np.argmax(ftypes > 4))
        raise ValueError(f"unknown PNG filter type {ftypes[r]} at row {r}")
    # Dependency-level scheduling instead of a per-row walk: None/Sub
    # rows read nothing above them, so ALL of them reconstruct in one
    # vectorized shot; the remaining rows resolve level by level — every
    # row whose predecessor is done computes in the same pass, with Up a
    # single block add and Average/Paeth walking PIXELS while vectorized
    # ACROSS the level's rows.  A filter-cycling payload (our synthesis
    # default) thus costs ~2W serial steps total instead of W per
    # Average/Paeth row; an all-Paeth image degrades to the old per-row
    # cost, which is inherent to its row-chained recurrence.
    resolved = np.zeros(h, bool)
    none_rows = np.nonzero(ftypes == 0)[0]
    recon[none_rows] = data[none_rows]
    sub_rows = np.nonzero(ftypes == 1)[0]
    if len(sub_rows):
        recon[sub_rows] = (
            data[sub_rows].reshape(len(sub_rows), -1, ch).astype(np.int64)
            .cumsum(axis=1) % 256
        ).reshape(len(sub_rows), stride).astype(np.int16)
    resolved[none_rows] = True
    resolved[sub_rows] = True
    while not resolved.all():
        unres = np.nonzero(~resolved)[0]
        ready = unres[(unres == 0) | resolved[unres - 1]]
        prev = np.zeros((len(ready), stride), np.int16)
        mask = ready > 0
        prev[mask] = recon[ready[mask] - 1]
        for ft in (2, 3, 4):
            sel = ftypes[ready] == ft
            if not sel.any():
                continue
            rows = ready[sel]
            if ft == 2:
                recon[rows] = (data[rows] + prev[sel]) % 256
                continue
            px = data[rows].reshape(len(rows), -1, ch)
            up = prev[sel].reshape(len(rows), -1, ch)
            out = np.empty_like(px)
            left = np.zeros((len(rows), ch), np.int16)
            ul = np.zeros((len(rows), ch), np.int16)
            for j in range(px.shape[1]):
                if ft == 3:
                    out[:, j] = (px[:, j] + (left + up[:, j]) // 2) % 256
                else:
                    out[:, j] = (px[:, j] + _paeth(left, up[:, j], ul)) % 256
                left = out[:, j]
                ul = up[:, j]
            recon[rows] = out.reshape(len(rows), stride)
        resolved[ready] = True
    return _finish_png(recon.astype(np.uint8), h, w, ch, color_type, plte)


def _finish_png(px: np.ndarray, h: int, w: int, ch: int,
                color_type: int, plte):
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[px.reshape(h, w)]
    if ch == 1:
        return px.reshape(h, w)
    return px.reshape(h, w, ch)


# ---------------------------------------------------------------------------
# Format sniffing
# ---------------------------------------------------------------------------


def sniff_format(payload: bytes) -> str:
    """'bmp' | 'ppm' | 'pgm' | 'wav' | 'flac' | 'png' | 'jpeg' | 'gif' |
    'mjbm' | 'mjpg' | 'unknown'."""
    if payload[:4] == b"MJBM":
        return "mjbm"
    if payload[:4] == b"MJPG":
        return "mjpg"
    if payload[:8] == _PNG_MAGIC:
        return "png"
    if payload[:6] in GIF_MAGICS:
        return "gif"
    if payload[:2] == b"\xFF\xD8":
        return "jpeg"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"fLaC":
        return "flac"
    return "unknown"


# ---------------------------------------------------------------------------
# MJBM / MJPG: length-prefixed framed video containers
# ---------------------------------------------------------------------------
#
# The simplest parseable video containers without codec libraries: a
# 4-byte magic, uint32-LE frame count, then per frame a uint32-LE byte
# length followed by a complete still-image payload.  MJBM stores
# uncompressed BMP frames; MJPG stores baseline JPEG frames (the actual
# motion-JPEG idea — each frame independently DCT-compressed by
# ``jpegcodec.encode_jpeg``), making the frame-sampling stage real for a
# COMPRESSED container too.  Honest about being bespoke framing.

_MJBM_MAGIC = b"MJBM"
_MJPG_MAGIC = b"MJPG"


def _encode_framed(magic: bytes, blobs) -> bytes:
    import struct

    out = [magic, struct.pack("<I", len(blobs))]
    for b in blobs:
        out.append(struct.pack("<I", len(b)))
        out.append(bytes(b))
    return b"".join(out)


def _decode_framed(magic: bytes, payload: bytes) -> "list[bytes]":
    import struct

    if payload[:4] != magic:
        raise ValueError(
            f"not an {magic.decode()} payload (magic mismatch)")
    if len(payload) < 8:
        raise ValueError(f"{magic.decode()}: truncated header")
    n = struct.unpack_from("<I", payload, 4)[0]
    frames = []
    pos = 8
    for _ in range(n):
        if pos + 4 > len(payload):
            raise ValueError(f"{magic.decode()}: truncated frame table")
        size = struct.unpack_from("<I", payload, pos)[0]
        pos += 4
        if pos + size > len(payload):
            raise ValueError(f"{magic.decode()}: truncated frame data")
        frames.append(payload[pos:pos + size])
        pos += size
    if pos != len(payload):
        raise ValueError(
            f"{magic.decode()} payload has {len(payload) - pos} "
            "trailing bytes")
    return frames


def encode_mjbm(frames) -> bytes:
    """Concatenate BMP-encoded frames into one MJBM payload."""
    blobs = [f if isinstance(f, (bytes, bytearray)) else encode_bmp(f)
             for f in frames]
    return _encode_framed(_MJBM_MAGIC, blobs)


def decode_mjbm(payload: bytes) -> "list[bytes]":
    """MJBM payload -> list of BMP frame payloads (zero-copy slices)."""
    return _decode_framed(_MJBM_MAGIC, payload)


def encode_mjpg(frames, *, quality: int = 75) -> bytes:
    """Concatenate JPEG-encoded frames into one MJPG payload (arrays are
    compressed with the library's baseline JPEG encoder; ``bytes``
    frames pass through as-is)."""
    from .jpegcodec import encode_jpeg

    blobs = [f if isinstance(f, (bytes, bytearray))
             else encode_jpeg(f, quality=quality)
             for f in frames]
    return _encode_framed(_MJPG_MAGIC, blobs)


def decode_mjpg(payload: bytes) -> "list[bytes]":
    """MJPG payload -> list of JPEG frame payloads (zero-copy slices)."""
    return _decode_framed(_MJPG_MAGIC, payload)
