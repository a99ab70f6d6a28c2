"""JSON parsing for the hot path: orjson when present, stdlib fallback.

``orjson.loads`` is several times faster than ``json.loads`` and returns
the same Python types, but parses a strict subset of what the stdlib
accepts (it rejects ``NaN``/``Infinity`` literals and integers outside
64 bits).  To keep the engine's accepted-input surface identical whether
or not orjson is installed, any orjson parse failure retries with the
stdlib parser — so the only observable difference is speed.

:class:`JsonParseOptions` is the engine analogue of passing a
``JsonSerializerOptions`` to the reference's string entry
(``GetSamples(string, options, serializerOptions)``,
``TimeSeriesExtractor.cs:356-359``): comment handling
(``ReadCommentHandling.Skip``), ``AllowTrailingCommas``, ``MaxDepth``,
plus Python's native number-parse hooks.  The knobs run OFF the hot
path — the default options parse through the fast orjson route
untouched; only documents that opt into an extension pay for the
one-pass pre-scan.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Callable, Optional


class JsonDepthError(ValueError):
    """Document nesting exceeds ``JsonParseOptions.max_depth`` (the
    engine twin of ``JsonException`` from ``JsonSerializerOptions
    .MaxDepth``)."""


@dataclass(frozen=True)
class JsonParseOptions:
    """Parse-behavior knobs for the string entry.

    * ``allow_comments`` — skip ``//`` line and ``/* */`` block comments
      outside strings (``ReadCommentHandling.Skip``).
    * ``allow_trailing_commas`` — accept ``[1, 2, ]`` / ``{"a": 1,}``
      (``AllowTrailingCommas``).
    * ``max_depth`` — maximum container nesting (root container = depth
      1); exceeding raises :class:`JsonDepthError` (``MaxDepth``).
      ``None`` = unbounded (Python has no parser-level default cap).
    * ``parse_float`` / ``parse_int`` — stdlib number hooks (e.g.
      ``decimal.Decimal``); hooks force the stdlib parser.
    """

    allow_comments: bool = False
    allow_trailing_commas: bool = False
    max_depth: Optional[int] = None
    parse_float: Optional[Callable[[str], object]] = None
    parse_int: Optional[Callable[[str], object]] = None


def _strip_extensions(text: str, allow_comments: bool,
                      allow_trailing_commas: bool) -> str:
    """One-pass scanner removing comments and/or trailing commas outside
    string literals; everything else (including string contents like
    ``"http://x"``) passes through byte-identical."""
    out: list = []
    i, n = 0, len(text)
    in_str = False
    pending_comma = None  # index in out of a comma awaiting ] or }
    while i < n:
        c = text[i]
        if in_str:
            out.append(c)
            if c == "\\" and i + 1 < n:
                out.append(text[i + 1])
                i += 2
                continue
            if c == '"':
                in_str = False
            i += 1
            continue
        if c == '"':
            in_str = True
            pending_comma = None
            out.append(c)
            i += 1
            continue
        if allow_comments and c == "/" and i + 1 < n:
            nxt = text[i + 1]
            if nxt == "/":
                i += 2
                while i < n and text[i] not in "\r\n":
                    i += 1
                continue
            if nxt == "*":
                i += 2
                while i + 1 < n and not (text[i] == "*"
                                         and text[i + 1] == "/"):
                    i += 1
                i += 2
                continue
        if allow_trailing_commas and c == ",":
            pending_comma = len(out)
            out.append(c)
            i += 1
            continue
        if c in "}]":
            if pending_comma is not None and allow_trailing_commas:
                out[pending_comma] = ""
            pending_comma = None
        elif c not in " \t\r\n":
            pending_comma = None
        out.append(c)
        i += 1
    return "".join(out)


def _check_depth(value, max_depth: int) -> None:
    """Iterative nesting check (no recursion limit coupling); containers
    at depth > ``max_depth`` raise."""
    stack = [(value, 1)]
    while stack:
        v, d = stack.pop()
        if isinstance(v, dict):
            if d > max_depth:
                raise JsonDepthError(
                    f"JSON document nesting exceeds max_depth={max_depth}")
            stack.extend((x, d + 1) for x in v.values())
        elif isinstance(v, list):
            if d > max_depth:
                raise JsonDepthError(
                    f"JSON document nesting exceeds max_depth={max_depth}")
            stack.extend((x, d + 1) for x in v)


def loads_with_options(text, options: JsonParseOptions):
    """Parse JSON text under :class:`JsonParseOptions` semantics."""
    if options.allow_comments or options.allow_trailing_commas:
        if isinstance(text, bytes):
            text = text.decode("utf-8")
        text = _strip_extensions(text, options.allow_comments,
                                 options.allow_trailing_commas)
    value = loads(text, parse_float=options.parse_float,
                  parse_int=options.parse_int)
    if options.max_depth is not None:
        _check_depth(value, options.max_depth)
    return value

try:
    import orjson as _orjson
except ImportError:  # pragma: no cover - orjson is present in this env
    _orjson = None

if _orjson is None:  # pragma: no cover
    def loads(text, *, parse_float=None, parse_int=None):
        if isinstance(text, bytes):
            text = text.decode("utf-8")
        return json.loads(text, parse_float=parse_float, parse_int=parse_int)
else:
    _fast_loads = _orjson.loads
    _std_loads = json.loads

    def loads(text, *, parse_float=None, parse_int=None):
        """Parse JSON text (str or bytes) to Python values.

        ``parse_float`` / ``parse_int``: number-parse hooks, the engine
        twin of passing a ``JsonSerializerOptions`` to the reference's
        string entry (``TimeSeriesExtractor.cs:356-359``).  Hooks force
        the stdlib parser (orjson has none); the default path stays fast.
        """
        if parse_float is not None or parse_int is not None:
            if isinstance(text, bytes):
                text = text.decode("utf-8")
            return _std_loads(text, parse_float=parse_float,
                              parse_int=parse_int)
        try:
            return _fast_loads(text)
        except Exception:
            # stdlib accepts a superset (NaN/Infinity literals, arbitrary
            # precision ints); a doc both parsers reject raises the usual
            # json.JSONDecodeError (a ValueError) from here.
            return _std_loads(text)
