"""Property-based invariants (hypothesis) for the pure-Python media
codecs: lossless round-trip exactness over arbitrary inputs is the
contract that makes them REAL rather than fixtures-only."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from json_time_series_extractor_ray.functions.flaccodec import (
    decode_flac,
    encode_flac,
)
from json_time_series_extractor_ray.functions.gifcodec import (
    decode_gif,
    encode_gif,
)
from json_time_series_extractor_ray.functions.mediacodecs import (
    decode_bmp,
    decode_mjbm,
    decode_mjpg,
    decode_png,
    encode_bmp,
    encode_mjbm,
    encode_mjpg,
    encode_png,
)


@settings(max_examples=40, deadline=None)
@given(
    x=arrays(np.int16, st.integers(1, 600),
             elements=st.integers(-32768, 32767)),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_flac_mono_roundtrip_any_signal(x, rate):
    d = decode_flac(encode_flac(x, rate))
    assert np.array_equal(d["samples"][:, 0], x)
    assert d["sample_rate"] == rate


@settings(max_examples=25, deadline=None)
@given(
    x=arrays(np.int16, st.tuples(st.integers(1, 300), st.just(2)),
             elements=st.integers(-32768, 32767)),
)
def test_flac_stereo_roundtrip_any_signal(x):
    assert np.array_equal(decode_flac(encode_flac(x, 16000))["samples"], x)


@settings(max_examples=25, deadline=None)
@given(
    px=arrays(np.uint8, st.tuples(st.integers(1, 24), st.integers(1, 24),
                                  st.just(3)),
              elements=st.integers(0, 255)),
    filt=st.sampled_from(["cycle", 0, 1, 2, 3, 4]),
)
def test_png_roundtrip_any_image(px, filt):
    assert np.array_equal(decode_png(encode_png(px, filters=filt)), px)


@settings(max_examples=25, deadline=None)
@given(
    idx=arrays(np.uint8, st.tuples(st.integers(1, 20), st.integers(1, 20)),
               elements=st.integers(0, 7)),
)
def test_gif_roundtrip_small_palette(idx):
    # <= 8 distinct colors: a deterministic palette image
    pal = (np.arange(8, dtype=np.uint8)[:, None]
           * np.array([31, 17, 11], np.uint8)[None, :])
    img = pal[idx]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


@settings(max_examples=20, deadline=None)
@given(
    shapes=st.lists(st.tuples(st.integers(1, 12), st.integers(1, 12)),
                    min_size=1, max_size=5),
    seed=st.integers(0, 2**31 - 1),
)
def test_mjbm_container_roundtrip(shapes, seed):
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
              for h, w in shapes]
    blobs = decode_mjbm(encode_mjbm(frames))
    assert len(blobs) == len(frames)
    for blob, f in zip(blobs, frames):
        assert np.array_equal(decode_bmp(blob), f)


@settings(max_examples=10, deadline=None)
@given(
    sides=st.lists(st.integers(8, 20), min_size=1, max_size=3),
    seed=st.integers(0, 2**31 - 1),
)
def test_mjpg_container_preserves_frame_dims(sides, seed):
    from json_time_series_extractor_ray.functions.jpegcodec import (
        decode_jpeg,
    )

    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, size=(s, s, 3), dtype=np.uint8)
              for s in sides]
    blobs = decode_mjpg(encode_mjpg(frames))
    assert len(blobs) == len(frames)
    for blob, f in zip(blobs, frames):
        assert decode_jpeg(blob).shape == f.shape  # dims exact (lossy px)


@settings(max_examples=30, deadline=None)
@given(
    px=arrays(np.uint8, st.tuples(st.integers(1, 30), st.integers(1, 30),
                                  st.just(3)),
              elements=st.integers(0, 255)),
)
def test_bmp_roundtrip_any_image(px):
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)
