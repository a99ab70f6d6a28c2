"""Matrix profile (AAMP variant) + motif discovery: brute-force parity,
exclusion zone, guards."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from json_time_series_extractor_ray.pipelines.matrixprofile import (
    MP_WINDOW,
    _pair_d2,
    matrix_profile,
    top_motifs,
)


def _samples(ray, series: dict):
    rows = {"series_key": [], "ts": [], "value_num": []}
    day = 86_400_000_000_000
    for k, vals in series.items():
        for d, v in enumerate(vals):
            rows["series_key"].append(k)
            rows["ts"].append(d * day + 1)
            rows["value_num"].append(float(v))
    return ray.data.from_arrow(pa.table({
        "series_key": pa.array(rows["series_key"], pa.string()),
        "ts": pa.array(rows["ts"], pa.int64()).cast(pa.timestamp("ns")),
        "value_num": pa.array(rows["value_num"], pa.float64()),
    }))


def _brute_mp(v, m):
    nw = len(v) - m + 1
    out = {}
    for i in range(nw):
        best = np.inf
        for j in range(nw):
            if abs(i - j) < m:
                continue
            d = np.sqrt(((v[i:i + m] - v[j:j + m]) ** 2).sum())
            best = min(best, d)
        if np.isfinite(best):
            out[i] = round(best, 6)
    return out


class TestMatrixProfile:
    def test_matches_bruteforce(self, ray_session):
        rng = np.random.default_rng(11)
        base = np.sin(np.arange(40) / 3.0) * 10
        noisy = base + rng.normal(0, 0.1, 40)
        series = {"a": np.round(noisy, 6), "b": rng.normal(0, 5, 25).round(6)}
        got = matrix_profile(_samples(ray_session, series), m=MP_WINDOW) \
            .to_pandas()
        for k, v in series.items():
            want = _brute_mp(np.asarray(v, np.float64), MP_WINDOW)
            sub = got[got["series_key"] == k]
            assert dict(zip(sub["i"], sub["mp"])) == pytest.approx(want,
                                                                   abs=1e-9)

    def test_planted_motif_found(self, ray_session):
        rng = np.random.default_rng(12)
        v = rng.normal(0, 10, 60).round(6)
        motif = np.array([1.0, 5.0, 2.0, 8.0, 3.0, 9.0, 4.0])
        v[10:17] = motif
        v[40:47] = motif  # exact repeat -> distance 0
        got = top_motifs(_samples(ray_session, {"s": v}), m=7).to_pandas()
        assert len(got) == 1
        row = got.iloc[0]
        assert (int(row["i"]), int(row["j"])) == (10, 40)
        assert row["motif_dist"] == 0.0

    def test_exclusion_zone_blocks_trivial_matches(self):
        v = np.arange(30, dtype=np.float64)  # overlapping windows nearly equal
        d2 = _pair_d2(v, 5)
        ij = np.arange(len(d2))
        assert np.isinf(d2[np.abs(ij[:, None] - ij[None, :]) < 5]).all()

    def test_short_series_emits_nothing(self, ray_session):
        got = matrix_profile(
            _samples(ray_session, {"s": np.arange(7.0)}), m=7).to_pandas()
        assert len(got) == 0

    def test_window_guard_fires(self, ray_session):
        with pytest.raises(ValueError, match="max_windows"):
            matrix_profile(
                _samples(ray_session, {"s": np.arange(30.0)}),
                m=3, max_windows=10)
