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
    loads = json.loads
else:
    _fast_loads = _orjson.loads
    _std_loads = json.loads

    def loads(text):
        """Parse JSON text (str or bytes) to Python values."""
        try:
            return _fast_loads(text)
        except Exception:
            # stdlib accepts a superset (NaN/Infinity literals, arbitrary
            # precision ints); a doc both parsers reject raises the usual
            # json.JSONDecodeError (a ValueError) from here.
            return _std_loads(text)
