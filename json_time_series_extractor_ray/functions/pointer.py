"""RFC 6901 JSON Pointer utilities.

The reference addresses everything with ``Json.Pointer.JsonPointer``
(``/root/reference/src/JsonTimeSeriesExtractor/TimeSeriesExtractor.cs:11``):
timestamp location, start position, include/exclude filter rules and key
generation.  We represent a pointer as a ``tuple[str, ...]`` of *unescaped*
segments — hashable (so it can key sets/dicts in compiled filters), cheap to
extend by one segment during traversal, and trivially comparable.

Semantics mirrored:

* parse/validation: empty string is the root pointer; otherwise the string
  must start with ``/``; ``~`` must be followed by ``0`` or ``1``
  (RFC 6901 §3) — anything else raises ``PointerParseError`` (the reference
  surfaces ``PointerParseException`` via ``JsonPointerLiteral``,
  ``JsonPointerLiteral.cs:199-281``).
* evaluation against a parsed document mirrors ``JsonPointer.Evaluate``:
  object member lookup by exact name, array lookup by index without leading
  zeros; failure yields ``None`` (``TimeSeriesExtractor.cs:390-397,644-648``).
* ``to_string`` re-escapes segments, matching ``JsonPointer.ToString()`` which
  the reference uses for pattern-wildcard regex matching and default-separator
  key generation (``TimeSeriesExtractor.cs:186,806-808``).
"""

from __future__ import annotations

Pointer = tuple  # tuple[str, ...]

ROOT: Pointer = ()


class PointerParseError(ValueError):
    """Raised when a string is not a valid RFC 6901 JSON Pointer."""


def unescape_segment(segment: str) -> str:
    """Unescape one reference token: ``~1`` -> ``/``, ``~0`` -> ``~``."""
    if "~" not in segment:
        return segment
    out = []
    i = 0
    n = len(segment)
    while i < n:
        ch = segment[i]
        if ch == "~":
            if i + 1 >= n:
                raise PointerParseError(f"Dangling '~' in pointer segment {segment!r}")
            nxt = segment[i + 1]
            if nxt == "0":
                out.append("~")
            elif nxt == "1":
                out.append("/")
            else:
                raise PointerParseError(f"Invalid escape '~{nxt}' in pointer segment {segment!r}")
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def escape_segment(segment: str) -> str:
    """Escape one reference token for string form (``~`` -> ``~0``, ``/`` -> ``~1``)."""
    if "~" in segment or "/" in segment:
        return segment.replace("~", "~0").replace("/", "~1")
    return segment


def parse_pointer(text: str) -> Pointer:
    """Parse a JSON Pointer string into a tuple of unescaped segments.

    Raises :class:`PointerParseError` for invalid input (mirrors
    ``JsonPointer.TryParse`` returning ``false``).
    """
    if text is None:
        raise PointerParseError("Pointer string is None")
    if text == "":
        return ROOT
    if text[0] != "/":
        raise PointerParseError(f"{text!r} is not a valid JSON pointer (must start with '/')")
    return tuple(unescape_segment(part) for part in text[1:].split("/"))


def try_parse_pointer(text: str):
    """Return the parsed pointer or ``None`` if invalid."""
    try:
        return parse_pointer(text)
    except PointerParseError:
        return None


def pointer_to_string(ptr: Pointer) -> str:
    """Render a pointer tuple back to its escaped string form."""
    if not ptr:
        return ""
    return "/" + "/".join(escape_segment(seg) for seg in ptr)


def _array_index(segment: str):
    """RFC 6901 array index: digits only, no leading zeros (except '0')."""
    if not segment or not (segment.isascii() and segment.isdigit()):
        # isascii guard: str.isdigit alone accepts non-ASCII digits that
        # int() rejects (would raise instead of "not an index").
        return None
    if len(segment) > 1 and segment[0] == "0":
        return None
    return int(segment)


def evaluate_pointer(doc, ptr: Pointer):
    """Evaluate ``ptr`` against a parsed JSON value.

    Returns the addressed value, or the sentinel :data:`MISSING` when the
    pointer does not resolve (so that a resolved JSON ``null`` is
    distinguishable from "not found", matching ``JsonPointer.Evaluate``
    returning a nullable ``JsonElement``).
    """
    cur = doc
    for segment in ptr:
        if isinstance(cur, dict):
            if segment in cur:
                cur = cur[segment]
            else:
                return MISSING
        elif isinstance(cur, list):
            idx = _array_index(segment)
            if idx is None or idx >= len(cur):
                return MISSING
            cur = cur[idx]
        else:
            return MISSING
    return cur


class _Missing:
    __slots__ = ()

    def __repr__(self):  # pragma: no cover
        return "<MISSING>"

    def __bool__(self):
        return False


MISSING = _Missing()
