"""Example user-supplied extractor hooks, driven through the driver gate.

The reference exposes these as delegate properties
(``TimeSeriesExtractorOptions.TimestampParser`` /
``GetTemplateReplacement``, ``TimeSeriesExtractor.cs``), exercised by
``JsonTimeSeriesExtractorTests.cs:743`` (custom timestamp format) and
``:109`` (template replacement callback).  They live in the library (not
in ``__ray_entry__``) so Ray workers can unpickle them by module
reference regardless of the driver's import layout.
"""

from __future__ import annotations

from typing import Any, Optional


def unix_seconds_parser(value: Any) -> Optional[int]:
    """Timestamp hook: the payload's ``time`` property is unix SECONDS.

    The default numeric rule reads unix *milliseconds*
    (``unix_ms_to_ns``), so without this hook every timestamp would be
    off by 1000x — the same "non-default format needs a user parser"
    situation as the reference's custom ``dd/MM/yyyy`` test."""
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        return int(value) * 1_000_000_000
    return None


def site_default_replacement(name: str) -> Optional[str]:
    """Template hook: placeholders named ``site`` that resolve neither
    from the document nor the context fall back to ``s-default`` instead
    of failing/staying literal (reference ``GetTemplateReplacement``)."""
    return "s-default" if name == "site" else None
