"""Bollinger bands + lead-lag correlation semantics on planted series."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from json_time_series_extractor_ray.pipelines.bands import (
    bollinger_bands,
    leadlag_corr,
)

W = 60_000_000_000  # 1m in ns


def _rollup_table(rows):
    """rows: (series_key, window_idx, mean_value) with count=1."""
    return pa.table({
        "tier": pa.array(["1m"] * len(rows), pa.string()),
        "series_key": pa.array([r[0] for r in rows], pa.string()),
        "window_start": pa.array(
            np.array([r[1] * W for r in rows], np.int64), pa.timestamp("ns")
        ),
        "sum": pa.array([float(r[2]) for r in rows], pa.float64()),
        "count": pa.array([1] * len(rows), pa.int64()),
    })


def test_bollinger_exclusive_frame_breach(ray_session):
    import ray

    rows = [("s", i, 10.0) for i in range(5)] + [("s", 5, 1000.0)]
    ds = ray.data.from_arrow(_rollup_table(rows))
    df = (
        bollinger_bands(ds, tier="1m", width=4, k=2.0)
        .to_pandas()
        .sort_values("window_ns", ignore_index=True)
    )
    # first window: no previous frame at all
    assert df.loc[0, "n"] == 0
    assert np.isnan(df.loc[0, "ma"]) and np.isnan(df.loc[0, "sd"])
    assert not df.loc[0, "breach"]
    # second window: frame of one -> mean but no sample stddev
    assert df.loc[1, "n"] == 1
    assert df.loc[1, "ma"] == 10.0 and np.isnan(df.loc[1, "sd"])
    # steady flat series never breaches (sd=0 band collapses to the mean,
    # and m == ma exactly)
    assert not df.loc[2:4, "breach"].any()
    # the spike breaches its flat recent-past envelope
    assert df.loc[5, "m"] == 1000.0
    assert df.loc[5, "upper_band"] == 10.0
    assert bool(df.loc[5, "breach"])


def test_bollinger_frame_excludes_current(ray_session):
    import ray

    rows = [("s", 0, 10.0), ("s", 1, 20.0), ("s", 2, 999.0)]
    ds = ray.data.from_arrow(_rollup_table(rows))
    df = (
        bollinger_bands(ds, tier="1m", width=4, k=2.0)
        .to_pandas()
        .sort_values("window_ns", ignore_index=True)
    )
    # window 2's ma is mean(10, 20) — the 999 itself is not in the frame
    assert df.loc[2, "ma"] == pytest.approx(15.0)
    assert df.loc[2, "n"] == 2


def test_leadlag_recovers_planted_lag(ray_session):
    import ray

    rng = np.random.default_rng(7)
    x = rng.normal(100.0, 10.0, 64).round(3)
    rows = [("value", i, float(x[i])) for i in range(64)]
    # y at window w+2 equals x at window w  ->  corr peaks at lag=+2
    rows += [("props/k", i + 2, float(x[i])) for i in range(64)]
    ds = ray.data.from_arrow(_rollup_table(rows))
    df = (
        leadlag_corr(ds, x_series="value", y_series="props/k",
                     tier="1m", lags=(-2, -1, 0, 1, 2))
        .to_pandas()
        .set_index("lag")
    )
    assert df.loc[2, "corr"] == pytest.approx(1.0, abs=1e-6)
    assert df.loc[2, "n_windows"] == 64
    others = df.drop(index=2)["corr"].abs()
    assert (others < 0.5).all()


def test_engle_granger_cointegrated_pair(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.bands import (
        engle_granger_pair,
    )

    rng = np.random.default_rng(5)
    n = 200
    x = np.cumsum(rng.standard_normal(n)).round(3)  # shared random walk
    # y = 3 + 2x + small iid noise: cointegrated, residual not persistent
    y = (3.0 + 2.0 * x + rng.normal(0, 0.1, n)).round(3)
    rows = [("value", i, float(x[i])) for i in range(n)]
    rows += [("props/k", i, float(y[i])) for i in range(n)]
    ds = ray.data.from_arrow(_rollup_table(rows))
    out = engle_granger_pair(
        ds, x_series="value", y_series="props/k", tier="1m").to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["n_windows"] == n
    assert row["beta"] == pytest.approx(2.0, abs=0.05)
    assert row["alpha"] == pytest.approx(3.0, abs=0.5)
    # iid residual: rho ~ 0, DW ~ 2
    assert abs(row["resid_rho"]) < 0.3
    assert row["dw"] == pytest.approx(2.0, abs=0.6)


def test_engle_granger_spurious_pair_has_persistent_residual(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.bands import (
        engle_granger_pair,
    )

    rng = np.random.default_rng(9)
    n = 400
    # two INDEPENDENT random walks: the regression residual is itself a
    # random walk -> rho near 1, DW near 0
    x = np.cumsum(rng.standard_normal(n)).round(3)
    y = np.cumsum(rng.standard_normal(n)).round(3)
    rows = [("value", i, float(x[i])) for i in range(n)]
    rows += [("props/k", i, float(y[i])) for i in range(n)]
    ds = ray.data.from_arrow(_rollup_table(rows))
    out = engle_granger_pair(
        ds, x_series="value", y_series="props/k", tier="1m").to_pandas()
    row = out.iloc[0]
    assert row["resid_rho"] > 0.8
    assert row["dw"] < 0.5


def test_kendall_tau_pair_planted_monotone_and_independent(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.diffstats import (
        kendall_tau_pair,
    )

    rng = np.random.default_rng(31)
    n = 120
    day = 86_400_000_000_000
    ts = pd.to_datetime(np.arange(n, dtype=np.int64) * day)
    x = np.arange(n, dtype=np.float64) + 0.01 * rng.standard_normal(n)
    y_mono = np.exp(x / 40.0)          # monotone transform: tau ~ 1
    y_ind = rng.standard_normal(n)     # independent: tau ~ 0
    df = pd.DataFrame({
        "series_key": ["a"] * n + ["b"] * n + ["c"] * n,
        "ts": np.r_[ts, ts, ts],
        "value_num": np.r_[x, y_mono, y_ind]})

    mono = kendall_tau_pair(
        ray.data.from_pandas(df), x_series="a", y_series="b",
        window_ns=day).to_pandas()
    assert len(mono) == 1
    assert mono.iloc[0]["tau_b"] == pytest.approx(1.0, abs=0.02)
    assert int(mono.iloc[0]["cd"]) > 0

    ind = kendall_tau_pair(
        ray.data.from_pandas(df), x_series="a", y_series="c",
        window_ns=day).to_pandas()
    assert abs(ind.iloc[0]["tau_b"]) < 0.2
    # no-overlap pair degenerates to empty output, not an error
    none = kendall_tau_pair(
        ray.data.from_pandas(df), x_series="a", y_series="zzz",
        window_ns=day).to_pandas()
    assert len(none) == 0
