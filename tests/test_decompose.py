"""Classical decomposition + Benford digit test."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from json_time_series_extractor_ray.pipelines.decompose import (
    BENFORD_SHARES,
    benford_digits,
    classical_decompose,
    decompose_series,
)


class TestDecomposeSeries:
    def test_recovers_planted_structure(self):
        """trend + weekly seasonal + tiny noise: the recovered seasonal
        repeats with period 7 and sums ~0; y == trend+seasonal+resid."""
        rng = np.random.default_rng(3)
        n, p = 70, 7
        t = np.arange(n, dtype=np.float64)
        season = np.array([5, -3, 2, 0, -1, 4, -7], np.float64)
        y = np.round(0.5 * t + season[t.astype(int) % p]
                     + rng.normal(0, 0.01, n), 6)
        trend, seasonal, resid = decompose_series(y, p)
        h = p // 2
        ok = slice(h, n - h)
        # identity holds exactly on the 1e-6 grid
        np.testing.assert_allclose(
            y[ok], trend[ok] + seasonal[ok] + resid[ok], atol=2e-6)
        # seasonal repeats with period p and is near the planted one
        np.testing.assert_array_equal(seasonal[:p], seasonal[p:2 * p])
        centered = season - season.mean()
        assert np.abs(seasonal[ok][:p]
                      - centered[np.arange(h, h + p) % p]).max() < 0.5
        # residuals are small (the planted noise scale)
        assert np.nanmax(np.abs(resid)) < 0.5
        # edges carry NaN trend
        assert np.isnan(trend[:h]).all() and np.isnan(trend[-h:]).all()

    def test_even_period_rejected(self, ray_session):
        import ray

        ds = ray.data.from_arrow(pa.table({
            "series_key": pa.array(["s"], pa.string()),
            "ts": pa.array([0], pa.int64()).cast(pa.timestamp("ns")),
            "value_num": pa.array([1.0], pa.float64()),
        }))
        with pytest.raises(ValueError, match="odd"):
            classical_decompose(ds, period=4)


class TestBenford:
    def test_counts_and_chi2(self, ray_session):
        import ray

        # values engineered so first digits are known; include one <= 0
        vals = [1.23, 19.99, 250.00, 2.50, 33.33, 0.0, -5.0, 910.12]
        ds = ray.data.from_arrow(pa.table({
            "x": pa.array(vals, pa.float64())}))
        out = benford_digits(ds, "x")
        assert len(out) == 9
        got = dict(zip(out["digit"], out["n_obs"]))
        assert got[1] == 2 and got[2] == 2 and got[3] == 1 and got[9] == 1
        assert got[4] == 0
        n = sum(got.values())
        d = 2
        e = n * BENFORD_SHARES[d]
        assert out[out["digit"] == d]["chi2"].iloc[0] == pytest.approx(
            round((got[d] - e) ** 2 / e, 6))

    def test_shares_sum_to_one(self):
        assert abs(sum(BENFORD_SHARES.values()) - 1.0) < 1e-8
