"""JSON parsing for the hot path: orjson when present, stdlib fallback.

``orjson.loads`` is several times faster than ``json.loads`` and returns
the same Python types, but parses a strict subset of what the stdlib
accepts (it rejects ``NaN``/``Infinity`` literals and integers outside
64 bits).  To keep the engine's accepted-input surface identical whether
or not orjson is installed, any orjson parse failure retries with the
stdlib parser — so the only observable difference is speed.
"""

from __future__ import annotations

import json

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
