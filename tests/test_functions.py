"""Unit tests for the kernel primitives: pointers, match-rule classification
(the engine twin of ``ConfigurationBinderTests.cs:11-134``), timestamp
parsing, raw-text rendering, and options binding."""

import pytest

from json_time_series_extractor_ray import (
    ExtractorOptions,
    MatchRule,
    OptionsValidationError,
    extract_samples,
    parse_pointer,
    pointer_to_string,
)
from json_time_series_extractor_ray.functions.pointer import (
    MISSING,
    PointerParseError,
    evaluate_pointer,
)
from json_time_series_extractor_ray.functions.rawtext import raw_json_text
from json_time_series_extractor_ray.functions.timestamps import (
    parse_iso_timestamp_ns,
    unix_ms_to_ns,
)


# --- pointers -------------------------------------------------------------

def test_pointer_parse_roundtrip():
    assert parse_pointer("") == ()
    assert parse_pointer("/foo/bar") == ("foo", "bar")
    assert parse_pointer("/a~1b/c~0d") == ("a/b", "c~d")
    assert pointer_to_string(("a/b", "c~d")) == "/a~1b/c~0d"
    assert pointer_to_string(()) == ""


def test_pointer_parse_invalid():
    with pytest.raises(PointerParseError):
        parse_pointer("invalid")  # must start with '/'
    with pytest.raises(PointerParseError):
        parse_pointer("/bad~2escape")
    with pytest.raises(PointerParseError):
        parse_pointer("/dangling~")


def test_pointer_evaluate():
    doc = {"a": {"b": [10, {"c": None}]}, "0": "zero"}
    assert evaluate_pointer(doc, ("a", "b", "0")) == 10
    assert evaluate_pointer(doc, ("a", "b", "1", "c")) is None  # JSON null resolves
    assert evaluate_pointer(doc, ("a", "missing")) is MISSING
    assert evaluate_pointer(doc, ("a", "b", "01")) is MISSING  # leading zero
    assert evaluate_pointer(doc, ("a", "b", "2")) is MISSING  # out of range
    assert evaluate_pointer(doc, ("0",)) == "zero"  # object key beats index


# --- match-rule classification (ConfigurationBinderTests.cs:72-126) -------

def test_literal_rule_classification():
    rule = MatchRule.parse("/foo/bar")
    assert not rule.is_wildcard_match_rule
    assert rule.pointer == ("foo", "bar")


def test_mqtt_rule_classification():
    rule = MatchRule.parse("/foo/bar/+/baz/#")
    assert rule.is_wildcard_match_rule
    assert rule.is_mqtt_wildcard_match_rule
    assert not rule.is_pattern_wildcard_match_rule


def test_pattern_rule_classification():
    rule = MatchRule.parse("*/bar")
    assert rule.is_wildcard_match_rule
    assert rule.is_pattern_wildcard_match_rule
    assert not rule.is_mqtt_wildcard_match_rule


def test_hash_only_valid_in_last_segment():
    # '#' in a non-final segment is a literal segment (JsonPointerMatch.cs:106-107)
    rule = MatchRule.parse("/a/#/b")
    assert not rule.is_wildcard_match_rule


def test_invalid_rule_raises():
    with pytest.raises(ValueError):
        MatchRule.parse("not-a-pointer-no-wildcards")


# --- timestamps -----------------------------------------------------------

def test_iso_seven_fraction_digits_exact():
    ns = parse_iso_timestamp_ns("2021-05-28T17:41:09.7031076+03:00")
    assert ns == 1622212869_000000000 + 703107600


def test_iso_variants():
    base = parse_iso_timestamp_ns("2024-02-05T16:13:50Z")
    assert parse_iso_timestamp_ns("2024-02-05T16:13:50") == base  # no offset -> UTC
    assert parse_iso_timestamp_ns("2024-02-05T16:13:50+00:00") == base
    assert parse_iso_timestamp_ns("2024-02-05T17:13:50+01:00") == base
    assert parse_iso_timestamp_ns("2024-02-05") == base - (16 * 3600 + 13 * 60 + 50) * 10**9
    assert parse_iso_timestamp_ns("2024-02-05T16:13") == base - 50 * 10**9
    # .NET keeps only the first 7 fractional digits
    assert parse_iso_timestamp_ns("2024-02-05T16:13:50.123456789Z") == base + 123456700


def test_iso_invalid():
    for bad in ["", "not a date", "2024-13-05T00:00:00Z", "2024-02-30T00:00:00Z",
                "2024-02-05T25:00:00Z", "2024-02-05T00:61:00Z", "1646312969367"]:
        assert parse_iso_timestamp_ns(bad) is None


def test_unix_ms():
    assert unix_ms_to_ns(1646312969367) == 1646312969367 * 10**6


# --- raw text -------------------------------------------------------------

def test_raw_json_text_compact():
    assert raw_json_text({"a": 1, "b": [1.5, True, None, "x"]}) == '{"a":1,"b":[1.5,true,null,"x"]}'
    assert raw_json_text(2047.5999999999995) == "2047.5999999999995"


# --- options binding (ConfigurationBinderTests semantics) -----------------

def test_from_dict_valid_pointer():
    opts = ExtractorOptions.from_dict({"start_at": "/foo/bar"})
    assert opts.start_at == "/foo/bar"


def test_from_dict_invalid_pointer_raises():
    with pytest.raises(OptionsValidationError):
        ExtractorOptions.from_dict({"start_at": "invalid"})


def test_from_dict_empty_string_binds_to_none():
    opts = ExtractorOptions.from_dict({"timestamp_property": ""})
    assert opts.timestamp_property is None


def test_from_dict_filter_rules():
    opts = ExtractorOptions.from_dict(
        {"include": ["/a/+/#"], "allow_wildcard_expressions": True, "recursive": True}
    )
    assert opts.can_process_element is not None
    samples = list(
        extract_samples({"a": {"x": {"v": 1}}, "b": 2}, opts, fallback_now_ns=0)
    )
    assert [s.key for s in samples] == ["a/x/v"]


def test_from_dict_invalid_rule_raises():
    with pytest.raises(ValueError):
        ExtractorOptions.from_dict({"include": ["bad rule"]})


def test_from_dict_unknown_key_raises():
    with pytest.raises(OptionsValidationError):
        ExtractorOptions.from_dict({"no_such_option": 1})


def test_blank_template_invalid():
    with pytest.raises(OptionsValidationError):
        list(extract_samples({"a": 1}, ExtractorOptions(template="   ")))


def test_options_copy():
    opts = ExtractorOptions(recursive=True, template="{x}")
    derived = opts.copy(template="{y}")
    assert derived.recursive and derived.template == "{y}" and opts.template == "{x}"


# --- additional semantic edge cases not directly in the 29-test corpus ----

def test_start_at_unresolvable_emits_nothing():
    # TimeSeriesExtractor.cs:390-397: silently emit nothing
    assert list(extract_samples({"a": 1}, ExtractorOptions(start_at="/nope"))) == []


def test_non_object_root_emits_nothing():
    assert list(extract_samples("42", ExtractorOptions())) == []
    assert list(extract_samples("[1,2,3]", ExtractorOptions(), fallback_now_ns=0)) == []


def test_exclude_wins_over_include():
    # TimeSeriesExtractor.cs:112-118
    from json_time_series_extractor_ray import make_pointer_filter

    opts = ExtractorOptions(
        can_process_element=make_pointer_filter(include=["/a", "/b"], exclude=["/b"])
    )
    samples = list(extract_samples({"a": 1, "b": 2}, opts, fallback_now_ns=0))
    assert [s.key for s in samples] == ["a"]


def test_more_than_eight_literal_rules_exact_only():
    # The >8-rule hash-set fast path skips partial matches
    # (TimeSeriesExtractor.cs:262-281); mirrored quirk.
    from json_time_series_extractor_ray import make_pointer_filter

    rules = [f"/k{i}" for i in range(9)]
    opts = ExtractorOptions(can_process_element=make_pointer_filter(include=rules))
    doc = {f"k{i}": i for i in range(9)}
    samples = list(extract_samples(doc, opts, fallback_now_ns=0))
    assert len(samples) == 9


def test_timestamp_property_suppressed_per_level():
    # Nested timestamp property is never emitted as a sample
    opts = ExtractorOptions(recursive=True, allow_nested_timestamps=True)
    doc = {
        "time": "2023-01-01T00:00:00Z",
        "a": {"time": "2023-01-01T01:00:00Z", "v": 1},
    }
    samples = list(extract_samples(doc, opts))
    assert [s.key for s in samples] == ["a/v"]
    assert samples[0].ts_ns == parse_iso_timestamp_ns("2023-01-01T01:00:00Z")


def test_escaped_segments_in_default_keys():
    # Default-separator {$prop} uses the escaped pointer string
    # (TimeSeriesExtractor.cs:806-808)
    opts = ExtractorOptions(recursive=True)
    samples = list(extract_samples({"a/b": {"c": 1}}, opts, fallback_now_ns=0))
    assert samples[0].key == "a~1b/c"
    # Non-default separator joins unescaped segments
    opts2 = ExtractorOptions(recursive=True, path_separator=".")
    samples2 = list(extract_samples({"a/b": {"c": 1}}, opts2, fallback_now_ns=0))
    assert samples2[0].key == "a/b.c"


def test_integer_named_object_properties_survive_index_suppression():
    # Keys built from the element stack, not the pointer
    # (TimeSeriesExtractor.cs:818-832)
    opts = ExtractorOptions(
        recursive=True, include_array_indexes_in_sample_keys=False
    )
    doc = {"0": {"v": [5.0]}}
    samples = list(extract_samples(doc, opts, fallback_now_ns=0))
    assert samples[0].key == "0/v"


def test_pattern_rule_hostile_stars_bounded_time():
    """A hostile many-star rule against a near-miss pointer must match in
    polynomial time (the reference bounds this with a 1 s regex timeout,
    TimeSeriesExtractor.cs:58-66; the engine's glob_match is O(n*m) by
    construction, so a 64-star rule over a 2000-char pointer is
    milliseconds, where naive .* regex backtracking would never finish)."""
    import time

    from json_time_series_extractor_ray.functions.match import glob_match

    hostile = "*a" * 64 + "b"          # forces maximal star re-expansion
    text = "a" * 2000                  # no 'b': worst-case miss
    t0 = time.perf_counter()
    assert glob_match(hostile, text) is False
    assert time.perf_counter() - t0 < 1.0


def test_glob_match_semantics():
    from json_time_series_extractor_ray.functions.match import glob_match

    assert glob_match("/val?e", "/value")
    assert glob_match("/u*r", "/user")
    assert glob_match("*", "")
    assert glob_match("a*", "a")
    assert not glob_match("a*b", "a")
    assert glob_match("a**b", "ab")
    assert not glob_match("?", "")
    assert glob_match("/data/*/v", "/data/0/v")
    # full-string anchoring: no partial matches
    assert not glob_match("/val", "/value")


def test_parse_hooks_on_string_entry():
    """parse_float / parse_int hooks on the string entry — the engine twin
    of the reference's JsonSerializerOptions argument
    (TimeSeriesExtractor.cs:356-359)."""
    from json_time_series_extractor_ray import ExtractorOptions, extract_samples

    opts = ExtractorOptions(recursive=True)
    payload = '{"time":"2024-01-01T00:00:01.000000Z","v":1.25,"n":7}'
    base = extract_samples(payload, opts, fallback_now_ns=0)
    assert [s.value for s in base] == [1.25, 7.0]

    hooked = extract_samples(
        payload, opts, fallback_now_ns=0,
        parse_float=lambda s: float(s) * 2,
        parse_int=lambda s: int(s) * 10,
    )
    assert [s.value for s in hooked] == [2.5, 70.0]


class TestFromDictBoolStrings:
    def test_string_false_binds_false(self):
        from json_time_series_extractor_ray.extractor import ExtractorOptions

        opts = ExtractorOptions.from_dict(
            {"recursive": "false", "allow_nested_timestamps": "true"}
        )
        assert opts.recursive is False
        assert opts.allow_nested_timestamps is True

    def test_zero_one_strings(self):
        from json_time_series_extractor_ray.extractor import ExtractorOptions

        opts = ExtractorOptions.from_dict({"recursive": "0"})
        assert opts.recursive is False
        opts = ExtractorOptions.from_dict({"recursive": "1"})
        assert opts.recursive is True

    def test_garbage_bool_raises(self):
        import pytest as _pytest

        from json_time_series_extractor_ray.extractor import (
            ExtractorOptions,
            OptionsValidationError,
        )

        with _pytest.raises(OptionsValidationError, match="boolean"):
            ExtractorOptions.from_dict({"recursive": "maybe"})
