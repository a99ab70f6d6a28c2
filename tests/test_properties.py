"""Property-based invariants (hypothesis) for the kernel + tokenizers."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from json_time_series_extractor_ray.extractor import (
    ExtractionPlan,
    ExtractorOptions,
    ValueKind,
    extract_samples,
)
from json_time_series_extractor_ray.tokenizer import BpeTokenizer, Utf8Tokenizer

# JSON scalar/doc strategies (keys avoid '/' and '~' pointer-escape chars to
# keep the invariant assertions simple; escaping has dedicated unit tests).
_keys = st.text(
    alphabet=st.characters(blacklist_characters="/~{}", min_codepoint=32,
                           max_codepoint=0x2FA0),
    min_size=1, max_size=8,
)
_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=20),
)
_json_docs = st.recursive(
    _scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(_keys, children, max_size=5),
    ),
    max_leaves=20,
)


@settings(max_examples=200, deadline=None)
@given(doc=st.dictionaries(_keys, _json_docs, max_size=6))
def test_extraction_is_deterministic_and_ordered(doc):
    plan = ExtractionPlan(ExtractorOptions(recursive=True))
    a = list(extract_samples(doc, plan, fallback_now_ns=0))
    b = list(extract_samples(doc, plan, fallback_now_ns=0))
    assert a == b
    # every sample has a valid kind and the shared fallback timestamp
    # (no '/time' key can be generated: '/' is excluded from keys,
    # and a top-level 'time' string would only shift ts for that doc)
    for s in a:
        assert s.value_kind in (
            ValueKind.NULL, ValueKind.NUMBER, ValueKind.STRING,
            ValueKind.BOOL, ValueKind.JSON_TEXT,
        )


@settings(max_examples=200, deadline=None)
@given(doc=st.dictionaries(_keys, _json_docs, max_size=6))
def test_non_recursive_emits_at_most_top_level_fields(doc):
    plan = ExtractionPlan(ExtractorOptions(recursive=False))
    out = list(extract_samples(doc, plan, fallback_now_ns=0))
    assert len(out) <= len(doc)
    for s in out:
        assert "/" not in s.key or s.key in doc  # local names only


@settings(max_examples=150, deadline=None)
@given(text=st.text(max_size=300))
def test_utf8_tokenizer_roundtrip(text):
    tok = Utf8Tokenizer()
    assert tok.decode(tok.encode(text)) == text


@settings(max_examples=50, deadline=None)
@given(text=st.text(max_size=200))
def test_bpe_tokenizer_roundtrip(text):
    tok = BpeTokenizer(seed=42, n_merges=50)
    assert tok.decode(tok.encode(text)) == text


@settings(max_examples=100, deadline=None)
@given(doc=st.dictionaries(_keys, _json_docs, min_size=1, max_size=6))
def test_depth_limited_values_reparse(doc):
    """JSON_TEXT samples (depth-limited containers) must re-parse to the
    exact sub-value they were cut from."""
    plan = ExtractionPlan(ExtractorOptions(recursive=True, max_depth=1))
    for s in extract_samples(doc, plan, fallback_now_ns=0):
        if s.value_kind == ValueKind.JSON_TEXT:
            assert json.loads(s.value) == doc[s.key]


@settings(max_examples=300, deadline=None)
@given(doc=st.dictionaries(_keys, _json_docs, max_size=6))
def test_fast_json_parser_matches_stdlib(doc):
    """functions/jsonio.loads (orjson + stdlib fallback) must be value-
    identical to json.loads for every document the engine can see, and the
    extraction output must be parser-independent."""
    from json_time_series_extractor_ray.functions.jsonio import loads

    text = json.dumps(doc)
    assert loads(text) == json.loads(text)

    plan = ExtractionPlan(ExtractorOptions(recursive=True))
    via_text = list(extract_samples(text, plan, fallback_now_ns=0))
    via_parsed = list(extract_samples(json.loads(text), plan, fallback_now_ns=0))
    assert via_text == via_parsed


def test_fast_json_parser_stdlib_superset():
    """Inputs orjson rejects but stdlib accepts must still parse (the
    fallback keeps the accepted-input surface identical)."""
    from json_time_series_extractor_ray.functions.jsonio import loads

    big = 2**70
    assert loads(f'{{"v": {big}}}') == {"v": big}
    out = loads('{"v": NaN, "w": Infinity}')
    assert out["v"] != out["v"] and out["w"] == float("inf")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        loads("{not json")
