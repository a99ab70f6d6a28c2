"""Registry of additional driver-visible queries.

``__ray_entry__`` pulls these in so each new operator family (dedup,
similarity search, text analysis, …) registers itself here with a callable
and — when SQL-expressible — a DuckDB oracle with IDENTICAL column names.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_QUERIES: dict[str, Callable[[str], Any]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: Callable[[str], Any], sql: str | None = None) -> None:
    _QUERIES[name] = fn
    if sql is not None:
        _ORACLES[name] = sql


def extra_queries() -> dict[str, Callable[[str], Any]]:
    _load_all()
    return dict(_QUERIES)


def extra_oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every operator-family module for its registration side effects."""
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    from . import (  # noqa: F401
        analytics,
        asof,
        bands,
        bpe,
        containment,
        curation,
        datacard,
        decompose,
        decontam,
        dedup,
        diffstats,
        editdist,
        downsample,
        dtw,
        enrich,
        graph,
        imagedups,
        integrity,
        joins,
        kanon,
        keyness,
        matrixprofile,
        mixture,
        multimodal,
        packing,
        psidrift,
        rangejoin,
        ranktests,
        readability,
        relational,
        seriesdiag,
        similarity,
        skewjoin,
        sketches,
        novelty,
        snapshot,
        split,
        substrdedup,
        symbolic,
        textstats,
        tokenchunks,
        tpch,
        tpch2,
        windows,
        zorder,
    )