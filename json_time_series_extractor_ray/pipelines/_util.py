"""Shared helpers for the operator families."""

from __future__ import annotations

import numpy as np


def round_half_away(x, digits: int = 6):
    """Round ties away from zero — bit-matching DuckDB's ``ROUND`` so both
    sides of a driver comparison round identically (numpy's default is
    half-to-even, which disagrees on exact midpoints like 1/128)."""
    scale = 10.0 ** digits
    arr = np.asarray(x, dtype=np.float64)
    return np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
