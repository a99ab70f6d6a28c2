"""JsonParseOptions — the string entry's ``JsonSerializerOptions``
analogue (``GetSamples(string, options, serializerOptions)``,
``TimeSeriesExtractor.cs:356-359``): comment handling, trailing commas,
max depth, number hooks."""

import decimal

import pytest

from json_time_series_extractor_ray import (
    ExtractorOptions,
    JsonDepthError,
    JsonParseOptions,
    extract_samples,
)
from json_time_series_extractor_ray.functions.jsonio import (
    _strip_extensions,
    loads_with_options,
)

TS = '"time": "2026-08-19T06:00:00.0000000Z"'


def test_default_options_reject_comments():
    with pytest.raises(ValueError):
        extract_samples('{"a": 1 // note\n}', ExtractorOptions(),
                        parse_options=JsonParseOptions())


def test_line_and_block_comments_skipped():
    doc = ('{\n'
           '  // line comment\n'
           '  "temp": 21.5, /* block\n'
           '     comment */ ' + TS + '\n'
           '}')
    out = extract_samples(
        doc, ExtractorOptions(),
        parse_options=JsonParseOptions(allow_comments=True))
    assert [(s.key, s.value) for s in out] == [("temp", 21.5)]


def test_comment_markers_inside_strings_survive():
    doc = '{"url": "http://x//y", "note": "a /* not a comment */ b"}'
    v = loads_with_options(doc, JsonParseOptions(allow_comments=True))
    assert v == {"url": "http://x//y", "note": "a /* not a comment */ b"}


def test_trailing_commas_in_object_and_array():
    doc = '{"vals": [1, 2, 3, ], "temp": 4.5, }'
    v = loads_with_options(
        doc, JsonParseOptions(allow_trailing_commas=True))
    assert v == {"vals": [1, 2, 3], "temp": 4.5}
    with pytest.raises(ValueError):
        loads_with_options(doc, JsonParseOptions())


def test_trailing_comma_after_comment_gap():
    doc = '[1, 2, // tail\n ]'
    v = loads_with_options(
        doc, JsonParseOptions(allow_comments=True,
                              allow_trailing_commas=True))
    assert v == [1, 2]


def test_non_trailing_commas_untouched():
    doc = '{"a": [1, 2], "b": {"c": 3}}'
    assert (_strip_extensions(doc, True, True) == doc)


def test_escaped_quote_in_string():
    doc = '{"a": "x\\"y, // z", "b": 1, }'
    v = loads_with_options(
        doc, JsonParseOptions(allow_comments=True,
                              allow_trailing_commas=True))
    assert v == {"a": 'x"y, // z', "b": 1}


def test_max_depth_enforced():
    doc = '{"a": {"b": {"c": 1}}}'
    loads_with_options(doc, JsonParseOptions(max_depth=3))
    with pytest.raises(JsonDepthError):
        loads_with_options(doc, JsonParseOptions(max_depth=2))
    # arrays count too; scalars do not add a level
    loads_with_options('[1, 2, 3]', JsonParseOptions(max_depth=1))
    with pytest.raises(JsonDepthError):
        loads_with_options('[[1]]', JsonParseOptions(max_depth=1))


def test_number_hooks_via_parse_options():
    doc = '{"temp": 21.55, ' + TS + '}'
    out = extract_samples(
        doc, ExtractorOptions(),
        parse_options=JsonParseOptions(parse_float=decimal.Decimal))
    assert out[0].value == decimal.Decimal("21.55")


def test_hooks_alongside_parse_options_rejected():
    with pytest.raises(ValueError):
        extract_samples('{"a": 1}', ExtractorOptions(),
                        parse_float=float,
                        parse_options=JsonParseOptions())


def test_extraction_through_all_knobs():
    doc = ('{ /* device doc */\n'
           '  "sensors": {"t1": 1.5, "t2": 2.5, }, // values\n'
           '  ' + TS + ',\n'
           '}')
    out = extract_samples(
        doc, ExtractorOptions(recursive=True),
        parse_options=JsonParseOptions(allow_comments=True,
                                       allow_trailing_commas=True,
                                       max_depth=4))
    got = {(s.key, s.value) for s in out}
    assert got == {("sensors/t1", 1.5), ("sensors/t2", 2.5)}
