"""GIF codec: LZW round trips, interlace, extension skipping, bounds."""

import numpy as np
import pytest

from json_time_series_extractor_ray.functions.gifcodec import (
    decode_gif,
    encode_gif,
)
from json_time_series_extractor_ray.functions.mediacodecs import sniff_format


def _rgb(rng, h, w, ncolors):
    px = rng.integers(0, ncolors, size=(h, w), dtype=np.uint8) * (
        255 // max(ncolors - 1, 1))
    return np.stack([px, px // 2, 255 - px], axis=-1).astype(np.uint8)


def test_roundtrip_small_palette():
    rng = np.random.default_rng(0)
    img = _rgb(rng, 13, 17, 8)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_roundtrip_interlaced():
    rng = np.random.default_rng(1)
    img = _rgb(rng, 29, 11, 8)
    payload = encode_gif(img, interlace=True)
    # interlace flag actually set in the image descriptor
    idesc = 6 + 7 + 3 * 8  # header + LSD + 8-entry GCT
    assert payload[idesc] == 0x2C and payload[idesc + 9] & 0x40
    assert np.array_equal(decode_gif(payload), img)


def test_roundtrip_256_colors_dict_reset():
    # 128x128 uniform noise over all 256 gray levels: the LZW dictionary
    # fills past 4096 entries, forcing the clear-and-reset path in both
    # the encoder and the decoder.
    rng = np.random.default_rng(2)
    gray = rng.integers(0, 256, size=(128, 128), dtype=np.uint8)
    for interlace in (False, True):
        out = decode_gif(encode_gif(gray, interlace=interlace))
        for ch in range(3):
            assert np.array_equal(out[:, :, ch], gray)


def test_grayscale_and_1x1():
    img = np.array([[7]], dtype=np.uint8)
    out = decode_gif(encode_gif(img))
    assert out.shape == (1, 1, 3) and out[0, 0, 0] == 7


def test_extension_blocks_skipped():
    rng = np.random.default_rng(3)
    img = _rgb(rng, 9, 9, 4)
    payload = bytearray(encode_gif(img))
    idesc = 6 + 7 + 3 * 4  # header + LSD + 4-entry GCT
    assert payload[idesc] == 0x2C
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])  # graphic control
    comment = bytes([0x21, 0xFE, 3]) + b"abc" + bytes([0])
    patched = bytes(payload[:idesc]) + gce + comment + bytes(payload[idesc:])
    assert np.array_equal(decode_gif(patched), img)


def test_palette_overflow_raises():
    h, w = 32, 24  # 768 distinct colors
    i = np.arange(h * w, dtype=np.int64)
    img = np.stack([i % 256, i // 256, np.zeros_like(i)],
                   axis=-1).reshape(h, w, 3)
    with pytest.raises(ValueError, match="palette overflow"):
        encode_gif(img.astype(np.uint8))


def test_truncated_stream_raises():
    rng = np.random.default_rng(4)
    img = _rgb(rng, 16, 16, 8)
    payload = encode_gif(img)
    with pytest.raises(ValueError):
        decode_gif(payload[: len(payload) // 2])


def test_sniff_and_real_decode_dispatch():
    from json_time_series_extractor_ray.pipelines.multimodal import (
        real_decode,
    )

    rng = np.random.default_rng(5)
    img = _rgb(rng, 12, 12, 8)
    payload = encode_gif(img)
    assert sniff_format(payload) == "gif"
    d = real_decode(payload)
    assert (d["width"], d["height"]) == (12, 12)
    assert d["decoded_bytes"] == 12 * 12 * 3
    assert d["raw_sum"] == int(img.astype(np.int64).sum())


def test_truncated_header_raises_valueerror():
    """Payloads cut inside the header / image descriptor / color table
    all fail with the module's ValueError contract, never IndexError."""
    rng = np.random.default_rng(6)
    img = _rgb(rng, 8, 8, 4)
    payload = encode_gif(img)
    # every cut short of the full image data fails (dropping only the
    # trailing 0x3B trailer still decodes — the frame is complete)
    for cut in range(6, len(payload) - 1):
        with pytest.raises(ValueError):
            decode_gif(payload[:cut])
