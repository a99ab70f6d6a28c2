"""Shredded (Arrow-vectorized) extraction must be byte-identical to the
per-document traversal on everything it accepts, and must FALL BACK (not
mis-emit) on the semantic hazards it cannot prove."""

import json

import numpy as np
import pyarrow as pa
import pytest

from json_time_series_extractor_ray.corpus import (
    render_iot_block,
    texts_to_corpus_table,
)
from json_time_series_extractor_ray.stages.extract import ExtractSamplesStage


def _canon(tbl: pa.Table) -> pa.Table:
    """Physical row order is not semantic (the shred path emits
    leaf-major); compare on (doc_id, sample_ordinal) order."""
    import pyarrow.compute as pc

    idx = pc.sort_indices(
        tbl, sort_keys=[("doc_id", "ascending"),
                        ("sample_ordinal", "ascending")]
    )
    return tbl.take(idx).combine_chunks()


def _both(texts, opts=None, **kw):
    opts = opts or dict(recursive=True, allow_nested_timestamps=True)
    tbl = texts_to_corpus_table(
        [f"d{i:04d}" for i in range(len(texts))], texts, ["t"] * len(texts)
    )
    slow = ExtractSamplesStage(dict(opts), fallback_now_ns=7, shred=False, **kw)
    fast = ExtractSamplesStage(dict(opts), fallback_now_ns=7, shred=True, **kw)
    return _canon(slow(tbl)), _canon(fast(tbl)), fast


class TestShredEquivalence:
    def test_iot_corpus_mixed_shapes(self):
        _, texts, _ = render_iot_block(1)
        a, b, stage = _both(texts[:2048])
        assert stage.shred
        assert a.equals(b)

    def test_nested_timestamps_off(self):
        _, texts, _ = render_iot_block(2)
        a, b, _ = _both(
            texts[:512], dict(recursive=True, allow_nested_timestamps=False)
        )
        assert a.equals(b)

    def test_values_and_types(self):
        texts = [
            json.dumps(d, separators=(",", ":"))
            for d in [
                {"time": "2024-01-01T00:00:00.000001Z", "a": 1, "b": 2.5,
                 "c": "x", "d": True, "e": False},
                {"time": "2024-01-01T00:00:00.000002Z", "a": -7, "b": 1e-9,
                 "c": "", "d": False, "e": True},
            ]
        ]
        a, b, _ = _both(texts)
        assert a.equals(b)

    def test_missing_fields_and_no_timestamp(self):
        # mixed shapes; one doc has no /time -> fallback ts + CURRENT_TIME
        texts = [
            '{"time":"2024-01-01T00:00:01.000000Z","v":1.5}',
            '{"v":2.5,"w":"only here"}',
            '{"time":"2024-01-01T00:00:03.000000Z","w":"x"}',
        ]
        a, b, _ = _both(texts)
        assert a.equals(b)

    def test_list_of_scalars_and_struct(self):
        texts = [
            '{"time":"2024-01-01T00:00:01.000000Z","l":[1,2,3],'
            '"o":{"p":1.5,"q":"s"}}',
            '{"time":"2024-01-01T00:00:02.000000Z","l":[4],'
            '"o":{"p":2.5,"q":"t"}}',
        ]
        a, b, _ = _both(texts)
        assert a.equals(b)

    def test_variable_list_lengths_and_empty(self):
        texts = [
            '{"time":"2024-01-01T00:00:01.000000Z","data":'
            '[{"time":"2024-01-01T00:00:01.500000Z","v":1.0}],"z":9}',
            '{"time":"2024-01-01T00:00:02.000000Z","data":[],"z":8}',
            '{"time":"2024-01-01T00:00:03.000000Z","data":'
            '[{"time":"2024-01-01T00:00:03.100000Z","v":2.0},'
            '{"time":"2024-01-01T00:00:03.200000Z","v":3.0}],"z":7}',
        ]
        a, b, _ = _both(texts)
        assert a.equals(b)

    def test_seven_digit_fraction_and_offset(self):
        texts = [
            '{"time":"2024-01-01T12:34:56.1234567Z","v":1}',
            '{"time":"2024-01-01T01:00:00+02:00","v":2}',
        ]
        a, b, _ = _both(texts)
        assert a.equals(b)

    def test_custom_path_separator(self):
        texts = ['{"time":"2024-01-01T00:00:01.000000Z","o":{"p":1.5}}']
        a, b, _ = _both(
            texts,
            dict(recursive=True, allow_nested_timestamps=True,
                 path_separator="."),
        )
        assert a.equals(b)
        assert a.column("series_key").to_pylist() == ["o.p"]


class TestShredFallback:
    """Hazards must take the traversal path (outputs still equal because
    the traversal is authoritative on both sides of each assert)."""

    def _fallback_equal(self, texts, opts=None):
        a, b, _ = _both(texts, opts)
        assert a.equals(b)  # fallback produced traversal output
        return a

    def test_explicit_null_value(self):
        # null vs absent: shred must not guess -> traversal emits NULL kind
        out = self._fallback_equal(
            [
                '{"time":"2024-01-01T00:00:01.000000Z","v":null}',
                '{"time":"2024-01-01T00:00:02.000000Z","v":3.5}',
            ]
        )
        kinds = out.column("value_kind").to_pylist()
        assert 0 in kinds  # NULL-kind sample survived end-to-end

    def test_invalid_timestamp_string(self):
        # unparseable /time -> fallback ts AND the time leaf is emitted
        out = self._fallback_equal(
            ['{"time":"not-a-time","v":1.5}']
        )
        assert "time" in out.column("series_key").to_pylist()

    def test_type_conflict_across_docs(self):
        self._fallback_equal(
            [
                '{"time":"2024-01-01T00:00:01.000000Z","v":1}',
                '{"time":"2024-01-01T00:00:02.000000Z","v":"s"}',
            ]
        )

    def test_root_array_unrolls(self):
        self._fallback_equal(
            ['[{"time":"2024-01-01T00:00:01.000000Z","v":1},'
             '{"time":"2024-01-01T00:00:02.000000Z","v":2}]']
        )

    def test_list_of_lists(self):
        self._fallback_equal(
            ['{"time":"2024-01-01T00:00:01.000000Z","m":[[1,2],[3]]}']
        )

    def test_options_outside_envelope_disable_shred(self):
        stage = ExtractSamplesStage(
            dict(recursive=True, include=["/v"]), fallback_now_ns=0
        )
        assert not stage.shred
        stage2 = ExtractSamplesStage(
            dict(recursive=True, template="{type}/{$prop}"), fallback_now_ns=0
        )
        assert not stage2.shred
        stage3 = ExtractSamplesStage(
            dict(recursive=False), fallback_now_ns=0
        )
        assert not stage3.shred

    def test_unix_ms_integer_timestamps(self):
        a, b, _ = _both(
            ['{"time":1646312969367,"v":1.5}',
             '{"time":1646312969368,"v":2.5}']
        )
        assert a.equals(b)


class TestShredRandomized:
    def test_random_mixed_corpus(self):
        rng = np.random.default_rng(5)
        texts = []
        for i in range(400):
            shape = rng.integers(0, 4)
            base = {"time": f"2024-01-0{1 + i % 9}T00:{i % 60:02d}:"
                            f"{(i * 7) % 60:02d}.{i % 1000000:06d}Z"}
            if shape == 0:
                base.update({"v": float(np.round(rng.random() * 100, 3))})
            elif shape == 1:
                base.update({"s": f"str-{i}", "flag": bool(i % 2)})
            elif shape == 2:
                base.update({
                    "data": [
                        {"time": f"2024-01-01T01:{j % 60:02d}:00.000000Z",
                         "t": float(j), "h": float(j) / 3.0}
                        for j in range(int(rng.integers(0, 5)))
                    ]
                })
            else:
                base.update({"o": {"x": int(rng.integers(0, 9)),
                                   "y": "deep"}})
            texts.append(json.dumps(base, separators=(",", ":")))
        a, b, _ = _both(texts)
        assert a.equals(b)
        assert a.num_rows > 400


class TestWhitespaceBeforeColon:
    def test_null_with_space_before_colon_falls_back(self):
        # Legal JSON whitespace around the key: a plain-substring presence
        # proof missed '"v" :null' and silently dropped the NULL-kind
        # sample; the regex proof must force the traversal fallback (or
        # agree byte-for-byte).
        texts = [
            '{"time":"2024-01-01T00:00:01.000000Z","v" :null}',
            '{"time":"2024-01-01T00:00:02.000000Z","v": 5}',
            '{"time":"2024-01-01T00:00:03.000000Z"}',
        ]
        slow, fast, _ = _both(texts)
        assert slow.equals(fast)

    def test_newline_before_colon(self):
        texts = [
            '{"time":"2024-01-01T00:00:01.000000Z","v"\n:null}',
            '{"time":"2024-01-01T00:00:02.000000Z","v":1}',
        ]
        slow, fast, _ = _both(texts)
        assert slow.equals(fast)

    def test_unicode_escaped_key_falls_back(self):
        # '"v"' decodes to key 'v' but never matches the raw-text
        # regex — any \u doc must take the traversal
        texts = [
            '{"time":"2024-01-01T00:00:01.000000Z","\\u0076":null}',
            '{"time":"2024-01-01T00:00:02.000000Z","v":5}',
        ]
        slow, fast, _ = _both(texts)
        assert slow.equals(fast)
