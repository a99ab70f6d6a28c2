"""Unit tests for value histograms, windowed EWMA, and pairwise window
correlation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from json_time_series_extractor_ray.pipelines.analytics import (
    ewma_smooth,
    pairwise_window_corr,
    value_histogram,
)


def _samples(values, series="value"):
    n = len(values)
    return pa.table({
        "series_key": pa.array([series] * n, pa.string()),
        "ts": pa.array(
            np.arange(n, dtype=np.int64) * 1_000_000_000, pa.int64()),
        "value_num": pa.array(values, pa.float64()),
        "value_kind": pa.array([1] * n, pa.int8()),
        "doc_id": pa.array([f"d{i:03d}" for i in range(n)], pa.string()),
        "sample_ordinal": pa.array([0] * n, pa.int64()),
    })


class TestValueHistogram:
    def test_clamped_bins(self, ray_session):
        import ray

        # width = (100-0)/10 = 10; -5 clamps to bin 0, 250 to bin 9
        out = value_histogram(
            ray.data.from_arrow(_samples([-5.0, 3.0, 15.0, 15.5, 250.0])),
            lo=0.0, hi=100.0, n_bins=10,
        ).to_pandas().set_index("bin").sort_index()
        assert out.loc[0, "n"] == 2
        assert out.loc[1, "n"] == 2
        assert out.loc[9, "n"] == 1
        assert out.loc[1, "bin_lo"] == 10.0
        assert len(out) == 3  # only observed bins emitted


class TestEwmaSmooth:
    def test_renormalized_prefix_windows(self, ray_session):
        import ray

        out = ewma_smooth(
            ray.data.from_arrow(_samples([4.0, 2.0, 8.0])),
            alpha=0.5, window_k=8,
        ).to_pandas().sort_values("ts_ns")
        # ewma[0] = 4; ewma[1] = (2 + .5*4)/1.5; ewma[2] = (8 + .5*2 + .25*4)/1.75
        assert list(out["ewma"]) == pytest.approx(
            [4.0, round(4 / 1.5, 6), round(10 / 1.75, 6)])

    def test_window_truncates_history(self, ray_session):
        import ray

        v = [100.0, 0.0, 0.0, 0.0]
        out = ewma_smooth(
            ray.data.from_arrow(_samples(v)), alpha=0.5, window_k=2,
        ).to_pandas().sort_values("ts_ns")
        # at i=3 only v[2], v[3] are in the window -> ewma = 0
        assert out["ewma"].iloc[3] == 0.0
        assert out["ewma"].iloc[1] == pytest.approx(round(50 / 1.5, 6))


class TestPairwiseWindowCorr:
    def test_perfect_and_anti_correlation(self, ray_session):
        import ray

        w = np.arange(10, dtype=np.int64) * 60_000_000_000
        x = np.arange(10, dtype=np.float64)
        wide = pa.table({
            "window_ns": pa.array(w, pa.int64()),
            "value_mean": pa.array(x, pa.float64()),
            "user_mean": pa.array(2 * x + 1, pa.float64()),
            "props_k_mean": pa.array(-x, pa.float64()),
        })
        out = pairwise_window_corr(
            ray.data.from_arrow(wide)
        ).to_pandas().set_index(["series_a", "series_b"])
        assert out.loc[("user", "value"), "corr"] == pytest.approx(1.0)
        assert out.loc[("props/k", "value"), "corr"] == pytest.approx(-1.0)
        assert out.loc[("props/k", "user"), "corr"] == pytest.approx(-1.0)
        assert (out["n_windows"] == 10).all()

    def test_null_windows_excluded_pairwise(self, ray_session):
        import ray

        wide = pa.table({
            "window_ns": pa.array([0, 1, 2, 3], pa.int64()),
            "value_mean": pa.array([1.0, 2.0, np.nan, 4.0], pa.float64()),
            "user_mean": pa.array([2.0, 4.0, 6.0, 8.0], pa.float64()),
            "props_k_mean": pa.array([np.nan] * 4, pa.float64()),
        })
        out = pairwise_window_corr(
            ray.data.from_arrow(wide)
        ).to_pandas().set_index(["series_a", "series_b"])
        assert out.loc[("user", "value"), "n_windows"] == 3
        assert out.loc[("props/k", "user"), "n_windows"] == 0
        assert np.isnan(out.loc[("props/k", "user"), "corr"])


class TestHistQuantile:
    def test_interpolation_exact_on_known_buckets(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.analytics import (
            hist_quantile,
        )

        # 100 values: 60 in bin 0 (value 10), 40 in bin 1 (value 50);
        # width = 40, lo = 0
        vals = [10.0] * 60 + [50.0] * 40
        out = hist_quantile(
            ray.data.from_arrow(_samples(vals)),
        ).to_pandas().set_index("p")
        assert out["total"].iloc[0] == 100
        # p=0.5: rank 50 inside bin0 (cum 60): q = 0 + 50/60*40
        assert out.loc[0.5, "q"] == pytest.approx(50 / 60 * 40, abs=1e-6)
        # p=0.9: rank 90 inside bin1 (cum_before 60, cnt 40):
        # q = 40 + (90-60)/40*40 = 70
        assert out.loc[0.9, "q"] == pytest.approx(70.0, abs=1e-6)
        # p=0.99: rank 99 -> q = 40 + 39 = 79
        assert out.loc[0.99, "q"] == pytest.approx(79.0, abs=1e-6)

    def test_overflow_values_clamp_to_last_bucket(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.analytics import (
            hist_quantile,
        )

        # everything overflows hi -> clamped into bin 24 [960, 1000)
        out = hist_quantile(
            ray.data.from_arrow(_samples([5000.0] * 10)),
        ).to_pandas().set_index("p")
        for p in (0.5, 0.9, 0.99):
            q = out.loc[p, "q"]
            assert 960.0 <= q <= 1000.0
