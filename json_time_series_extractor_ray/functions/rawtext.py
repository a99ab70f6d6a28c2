"""Raw-JSON-text rendering for sample values and template display values.

The reference emits the *source text* of a JSON element
(``JsonElement.GetRawText()``) in two situations:

* objects/arrays reached at the recursion depth limit or in non-recursive
  mode become string samples containing their raw JSON
  (``TimeSeriesExtractor.cs:934-935``; exact text asserted by
  ``JsonTimeSeriesExtractorTests.cs:617``);
* non-string property values referenced by ``{placeholder}`` templates are
  rendered with their raw text (``TimeSeriesExtractor.cs:773-775``).

This engine parses payloads with the C-accelerated ``json`` module (which
does not retain source spans) and re-renders the element with a canonical
compact serializer instead.  For payloads produced by standard serializers in
compact form — which is what the reference's own fixtures use
(.NET ``JsonSerializer.Serialize``) and what our corpus generator emits —
the canonical rendering is byte-identical to the source substring:

* no insignificant whitespace, ``,``/``:`` separators;
* floats rendered shortest-round-trip (Python ``repr``, equivalent to .NET's
  ``R`` behaviour for the values produced by compact serializers);
* integers rendered without a decimal point;
* non-ASCII characters passed through unescaped.

For exotically formatted input (extra whitespace, exponent notation,
``\\uXXXX`` escapes) the value is *canonicalized* rather than byte-identical;
this deviation is documented here and exercised nowhere in the reference's
conformance corpus.
"""

from __future__ import annotations

import json

_COMPACT = {"separators": (",", ":"), "ensure_ascii": False}


def raw_json_text(value) -> str:
    """Render a parsed JSON value back to compact canonical JSON text."""
    return json.dumps(value, **_COMPACT)


def element_display_value(value) -> str:
    """Template replacement display value.

    Mirrors ``GetElementDisplayValue`` (``TimeSeriesExtractor.cs:773-775``):
    strings are used verbatim; any other value uses its raw JSON text.
    """
    if isinstance(value, str):
        return value
    return raw_json_text(value)
