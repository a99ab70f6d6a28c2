"""Baseline JPEG codec (round-3 verdict item 1 stretch goal: the last
image-format stub).  The decoder is validated INDEPENDENTLY of the
encoder with hand-built bitstreams derived from the ITU T.81 Annex K
tables; the encoder is validated against hand-computed huffman codes;
round trips pin the closed-form DC-only rule the driver oracle uses."""

import struct

import numpy as np
import pytest

from json_time_series_extractor_ray.functions.jpegcodec import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    QTABLE_LUMA,
    _canonical_codes,
    decode_jpeg,
    encode_jpeg,
    quality_scaled,
)
from json_time_series_extractor_ray.functions.mediacodecs import sniff_format


def _dc_round_trip(v: int) -> int:
    """Closed-form quality-50 DC-only reconstruction of a uniform block."""
    d = v - 128
    q = int(np.sign(d)) * ((abs(d) + 1) // 2)
    return min(max(2 * q + 128, 0), 255)


class TestHandDerivedBitstream:
    def test_uniform_block_entropy_bytes(self):
        # v=130: DC diff = 1 -> DC cat 1 code '010' + amp '1';
        # EOB = AC luma symbol 0x00 -> '1010' (both hand-derived from
        # Annex K BITS/HUFFVAL via Annex C canonical construction).
        # Bits: 010 1 1010 = 0x5A exactly, no padding needed.
        buf = encode_jpeg(np.full((8, 8), 130, np.uint8), quality=50)
        sos = buf.index(b"\xFF\xDA")
        seglen = struct.unpack_from(">H", buf, sos + 2)[0]
        scan = buf[sos + 2 + seglen: buf.rindex(b"\xFF\xD9")]
        assert scan == b"\x5A"

    def test_canonical_codes_match_hand_derivation(self):
        dc = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
        assert dc[0] == (0b00, 2)
        assert dc[1] == (0b010, 3)
        assert dc[5] == (0b110, 3)
        assert dc[11] == (0b111111110, 9)
        ac = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
        assert ac[0x01] == (0b00, 2)
        assert ac[0x00] == (0b1010, 4)   # EOB
        assert ac[0xF0] == (0b11111111001, 11)  # ZRL


class TestHandBuiltDecode:
    """Build a JPEG byte-by-byte (markers + hand-assembled entropy bits)
    and decode it — validates the decoder with no encoder in the loop."""

    def _headers(self, h, w):
        out = bytearray(b"\xFF\xD8")
        from json_time_series_extractor_ray.functions.jpegcodec import ZZ_FLAT
        body = bytes([0]) + bytes(
            int(x) for x in QTABLE_LUMA.reshape(64)[ZZ_FLAT])
        out += b"\xFF\xDB" + struct.pack(">H", 2 + len(body)) + body
        sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
        out += b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof
        for cls, bits, vals in ((0, DC_LUMA_BITS, DC_LUMA_VALS),
                                (1, AC_LUMA_BITS, AC_LUMA_VALS)):
            b2 = bytes([cls << 4]) + bytes(bits) + bytes(vals)
            out += b"\xFF\xC4" + struct.pack(">H", 2 + len(b2)) + b2
        sos = bytes([1, 1, 0x00, 0, 63, 0])
        out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos
        return out

    @staticmethod
    def _pack_bits(bits: str) -> bytes:
        bits = bits + "1" * ((-len(bits)) % 8)
        raw = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
        return raw.replace(b"\xFF", b"\xFF\x00")

    def test_dc_only_block(self):
        # DC diff = +2 -> cat 2 '011' + amp '10'; EOB '1010'
        buf = self._headers(8, 8) + self._pack_bits("0111010 10".replace(" ", "")) \
            + b"\xFF\xD9"
        # '011' + '10' + '1010' = 0111 0101 0 -> pad
        out = decode_jpeg(bytes(buf))
        # DC = 2 * Q00 = 32 -> pixel = 32/8 + 128 = 132 everywhere
        assert out.shape == (8, 8)
        assert np.all(out == 132)

    def test_zrl_path(self):
        # DC cat 0 ('00'), ZRL (16 zeros -> next k=17), then coefficient
        # +1 at k=17 (run 0 size 1: AC symbol 0x01 -> code '00', amp
        # '1'), then EOB.  Verifies run-length skip + receive/extend.
        bits = "00" + "11111111001" + "00" + "1" + "1010"
        buf = self._headers(8, 8) + self._pack_bits(bits) + b"\xFF\xD9"
        out = decode_jpeg(bytes(buf))
        from json_time_series_extractor_ray.functions.jpegcodec import (
            DCT_M, ZZ_FLAT)
        coefs = np.zeros(64)
        coefs[ZZ_FLAT[17]] = 1 * QTABLE_LUMA.reshape(64)[ZZ_FLAT[17]]
        expect = DCT_M.T @ coefs.reshape(8, 8) @ DCT_M + 128
        expect = np.clip(np.sign(expect) * np.floor(np.abs(expect) + 0.5),
                         0, 255)
        assert np.array_equal(out.astype(np.int64), expect.astype(np.int64))

    def test_negative_amplitude(self):
        # DC diff = -3 -> cat 2 '011' + amp bits one's complement '00'
        bits = "011" + "00" + "1010"
        buf = self._headers(8, 8) + self._pack_bits(bits) + b"\xFF\xD9"
        out = decode_jpeg(bytes(buf))
        # DC = -3 * 16 = -48 -> pixel = -6 + 128 = 122
        assert np.all(out == 122)


class TestClosedFormRoundTrip:
    def test_all_uniform_values(self):
        for v in (0, 1, 63, 127, 128, 129, 200, 254, 255):
            out = decode_jpeg(encode_jpeg(np.full((8, 8), v, np.uint8)))
            assert np.all(out == _dc_round_trip(v)), v

    def test_multi_block_dc_prediction(self):
        rng = np.random.default_rng(11)
        vals = rng.integers(0, 256, (3, 5))
        px = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(px))
        for bi in range(3):
            for bj in range(5):
                blk = out[bi * 8:(bi + 1) * 8, bj * 8:(bj + 1) * 8]
                assert np.all(blk == _dc_round_trip(int(vals[bi, bj])))

    def test_non_multiple_of_8_dims_crop(self):
        px = np.full((13, 21), 77, np.uint8)
        out = decode_jpeg(encode_jpeg(px))
        assert out.shape == (13, 21)
        assert np.all(out == _dc_round_trip(77))


class TestLossyRoundTrips:
    def test_random_gray_q90(self):
        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, (40, 56)).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(px, quality=90))
        assert out.shape == px.shape
        err = np.abs(out.astype(int) - px.astype(int))
        assert err.mean() < 8  # random noise is JPEG's worst case

    def test_smooth_gradient_color_near_exact(self):
        gx = np.linspace(0, 255, 64).astype(np.uint8)
        px = np.stack([np.tile(gx, (48, 1)), np.tile(gx[::-1], (48, 1)),
                       np.full((48, 64), 90, np.uint8)], axis=-1)
        out = decode_jpeg(encode_jpeg(px, quality=90, subsample=False))
        err = np.abs(out.astype(int) - px.astype(int))
        assert err.max() <= 4

    def test_color_420_shape_and_uniform(self):
        px = np.zeros((20, 28, 3), np.uint8)
        px[:] = (200, 40, 90)
        out = decode_jpeg(encode_jpeg(px, quality=90, subsample=True))
        assert out.shape == px.shape
        err = np.abs(out.astype(int) - px.astype(int))
        assert err.max() <= 6  # uniform color: only conversion rounding

    def test_encoder_zrl_high_frequency(self):
        # a pure (7,7)-basis pattern leaves one coefficient at zigzag 63
        # behind 62 zeros -> the encoder must emit ZRL runs
        from json_time_series_extractor_ray.functions.jpegcodec import DCT_M
        coefs = np.zeros((8, 8))
        coefs[7, 7] = 300.0
        px = np.clip(np.round(DCT_M.T @ coefs @ DCT_M + 128),
                     0, 255).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(px, quality=50))
        assert out.shape == px.shape
        assert out.std() > 0  # the coefficient survived quantization
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 40


class TestQualityScaling:
    def test_q50_identity(self):
        assert np.array_equal(quality_scaled(QTABLE_LUMA, 50), QTABLE_LUMA)

    def test_q100_all_ones(self):
        assert np.all(quality_scaled(QTABLE_LUMA, 100) == 1)

    def test_q10_monotone_coarser(self):
        assert np.all(quality_scaled(QTABLE_LUMA, 10) >= QTABLE_LUMA)


class TestLoudFailures:
    def test_progressive_sof2_raises(self):
        buf = bytearray(encode_jpeg(np.full((8, 8), 100, np.uint8)))
        i = bytes(buf).index(b"\xFF\xC0")
        buf[i + 1] = 0xC2
        with pytest.raises(ValueError, match="SOF2"):
            decode_jpeg(bytes(buf))

    def test_truncated_scan_raises(self):
        buf = encode_jpeg(np.full((64, 64), 100, np.uint8))
        with pytest.raises(ValueError):
            decode_jpeg(buf[: len(buf) // 2])

    def test_not_jpeg_raises(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"\x89PNG1234")

    def test_16bit_dqt_raises(self):
        buf = bytearray(encode_jpeg(np.full((8, 8), 100, np.uint8)))
        i = bytes(buf).index(b"\xFF\xDB")
        buf[i + 4] = 0x10  # Pq=1
        with pytest.raises(ValueError, match="16-bit"):
            decode_jpeg(bytes(buf))


class TestEngineWiring:
    def test_sniff(self):
        assert sniff_format(encode_jpeg(np.full((8, 8), 9, np.uint8))) == "jpeg"

    def test_decode_stage_real_path(self):
        from json_time_series_extractor_ray.pipelines.multimodal import (
            real_decode)
        px = np.full((16, 16), 130, np.uint8)
        d = real_decode(encode_jpeg(px))
        assert (d["width"], d["height"]) == (16, 16)
        assert d["decoded_bytes"] == 256
        assert d["raw_sum"] == 256 * _dc_round_trip(130)

    def test_resize_stage_real_path(self):
        from json_time_series_extractor_ray.pipelines.multimodal import (
            ResizeStage)
        stage = ResizeStage(8, 8)
        out = stage._resize_real(encode_jpeg(np.full((32, 32), 90, np.uint8)))
        assert sniff_format(out) == "jpeg"
        px = decode_jpeg(out)
        assert px.shape == (8, 8)

    def test_driver_query_synth_matches_oracle_rule(self):
        from json_time_series_extractor_ray.pipelines.multimodal import (
            synthesize_jpeg_table)
        t = synthesize_jpeg_table([7, 40], [300, 4096])
        from json_time_series_extractor_ray.pipelines.multimodal import (
            real_decode)
        for i, (doc_id, n) in enumerate([(7, 300), (40, 4096)]):
            b = max(int(np.sqrt(min(max(n, 1), 4096))) // 8, 1)
            d = real_decode(t.column("payload")[i].as_py())
            assert d["width"] == d["height"] == 8 * b
            expect = sum(64 * _dc_round_trip((doc_id + g) % 256)
                         for g in range(b * b))
            assert d["raw_sum"] == expect


class TestOddDims420:
    def test_odd_dims_with_subsampling(self):
        # h, w not multiples of 16: MCU padding + crop with 4:2:0 chroma
        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, (13, 21, 3)).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(px, quality=90, subsample=True))
        assert out.shape == (13, 21, 3)
        # uniform image, odd dims: near-exact through pad/crop
        flat = np.zeros((13, 21, 3), np.uint8)
        flat[:] = (64, 180, 30)
        out2 = decode_jpeg(encode_jpeg(flat, quality=90, subsample=True))
        err = np.abs(out2.astype(int) - flat.astype(int))
        assert err.max() <= 6
