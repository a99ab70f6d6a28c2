"""Exact two-sample KS (weekend vs weekday) planted-shape test."""

import numpy as np
import pandas as pd
import pytest


def test_ks_weekend_detects_planted_shape_shift(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.ranktests import ks_weekend

    rng = np.random.default_rng(37)
    hour = 3_600_000_000_000
    n = 24 * 70  # 70 days of hourly points
    ts_ns = np.arange(n, dtype=np.int64) * hour
    dow = ((ts_ns // (24 * hour)) + 4) % 7
    wk = (dow == 0) | (dow == 6)
    # shifted: weekend values drawn from a different distribution
    shifted = rng.standard_normal(n)
    shifted[wk] = rng.standard_normal(wk.sum()) * 0.2 + 3.0
    same = rng.standard_normal(n)
    ts = pd.to_datetime(np.r_[ts_ns, ts_ns])
    df = pd.DataFrame({
        "series_key": ["shifted"] * n + ["same"] * n,
        "ts": ts,
        "value_num": np.r_[shifted, same]})
    out = ks_weekend(
        ray.data.from_pandas(df)).to_pandas().set_index("series_key")
    assert out.loc["shifted", "ks_d"] > 0.9
    assert out.loc["same", "ks_d"] < 0.25
    # exact-rational identity: ks_d == d_num / (nA * nB)
    row = out.loc["shifted"]
    assert row["ks_d"] == pytest.approx(
        row["d_num"] / (row["n_weekend"] * row["n_weekday"]), abs=1e-6)
    assert int(row["n_weekend"]) == int(wk.sum())
