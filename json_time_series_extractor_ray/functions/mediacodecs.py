"""Pure-Python/numpy codecs for UNCOMPRESSED media containers.

No image/audio libraries exist in this container, but the uncompressed
formats need none: BMP (BITMAPINFOHEADER, BI_RGB 24-bit) and PPM/PGM
(binary P6/P5) are header + raw pixel rows, and WAV PCM decodes with the
stdlib ``wave`` module.  These make the engine's media stages REAL for
those formats; compressed formats (JPEG/PNG/MP3/H.264) remain explicit
``NotImplementedError`` stubs in ``pipelines/multimodal.py``.

All decoders return numpy arrays; all encoders are deterministic byte
producers (used to synthesize test/driver payloads).
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

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
# Format sniffing
# ---------------------------------------------------------------------------


def sniff_format(payload: bytes) -> str:
    """'bmp' | 'ppm' | 'pgm' | 'wav' | 'mjbm' | 'unknown' from magic."""
    if payload[:4] == b"MJBM":
        return "mjbm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return "unknown"


# ---------------------------------------------------------------------------
# MJBM: length-prefixed BMP-frame video container (uncompressed)
# ---------------------------------------------------------------------------
#
# The simplest parseable stand-in for a video file in a container with no
# codec libraries: magic b'MJBM', uint32-LE frame count, then per frame a
# uint32-LE byte length followed by a complete BMP payload (the motion-
# JPEG idea with BMP frames).  Real enough that frame sampling DECODES
# real pixels; honest about being a bespoke container.

_MJBM_MAGIC = b"MJBM"


def encode_mjbm(frames) -> bytes:
    """Concatenate BMP-encoded frames into one MJBM payload."""
    import struct

    blobs = [f if isinstance(f, (bytes, bytearray)) else encode_bmp(f)
             for f in frames]
    out = [_MJBM_MAGIC, struct.pack("<I", len(blobs))]
    for b in blobs:
        out.append(struct.pack("<I", len(b)))
        out.append(bytes(b))
    return b"".join(out)


def decode_mjbm(payload: bytes) -> "list[bytes]":
    """MJBM payload -> list of BMP frame payloads (zero-copy slices)."""
    import struct

    if payload[:4] != _MJBM_MAGIC:
        raise ValueError("not an MJBM payload (magic mismatch)")
    n = struct.unpack_from("<I", payload, 4)[0]
    frames = []
    pos = 8
    for _ in range(n):
        size = struct.unpack_from("<I", payload, pos)[0]
        pos += 4
        frames.append(payload[pos:pos + size])
        pos += size
    if pos != len(payload):
        raise ValueError(
            f"MJBM payload has {len(payload) - pos} trailing bytes")
    return frames
