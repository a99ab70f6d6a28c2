"""Series diagnostics (max drawdown, mean-shift changepoint) and
readability scoring — planted-shape unit tests; the oracle parity runs
through the registered queries."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from json_time_series_extractor_ray.pipelines.readability import _scores
from json_time_series_extractor_ray.pipelines.seriesdiag import (
    max_drawdown_tier,
    mean_shift_changepoint,
)


def _rollup_table(series, means, tier="1m"):
    """Minimal rollup-tier frame: mean arrives as (sum=mean, count=1)."""
    n = len(means)
    return pd.DataFrame({
        "series_key": series,
        "tier": [tier] * n,
        "window_start": pd.to_datetime(
            np.arange(n, dtype=np.int64) * 60_000_000_000),
        "sum": np.asarray(means, dtype=np.float64),
        "count": np.ones(n, dtype=np.int64),
    })


def test_max_drawdown_planted(ray_session):
    import ray

    # peak 10 -> trough 3 (drawdown 7) then recovery; later peak 12 -> 9
    means = [5, 10, 7, 3, 8, 12, 9]
    ds = ray.data.from_pandas(_rollup_table(["a"] * 7, means))
    out = max_drawdown_tier(ds, tier="1m").to_pandas()
    assert len(out) == 1
    assert out["max_drawdown"].iloc[0] == 7.0
    assert out["n_windows"].iloc[0] == 7


def test_max_drawdown_monotonic_series_is_zero(ray_session):
    import ray

    ds = ray.data.from_pandas(_rollup_table(["up"] * 5, [1, 2, 3, 4, 5]))
    out = max_drawdown_tier(ds, tier="1m").to_pandas()
    assert out["max_drawdown"].iloc[0] == 0.0


def test_mean_shift_finds_planted_step(ray_session):
    import ray

    # level 1.0 for 10 windows, then level 5.0 for 10 windows:
    # the scan statistic peaks exactly at the 10th window (k=10)
    means = [1.0] * 10 + [5.0] * 10
    ds = ray.data.from_pandas(_rollup_table(["s"] * 20, means, tier="1h"))
    out = mean_shift_changepoint(ds, tier="1h").to_pandas()
    assert len(out) == 1
    # cp at the last window of the prefix (index 9)
    assert out["cp_window_ns"].iloc[0] == 9 * 60_000_000_000
    want = abs(1.0 - 5.0) * np.sqrt(10 * 10 / 20)
    assert out["shift_stat"].iloc[0] == pytest.approx(want, abs=1e-6)


def test_mean_shift_single_window_series_dropped(ray_session):
    import ray

    ds = ray.data.from_pandas(_rollup_table(["one"], [4.2], tier="1h"))
    out = mean_shift_changepoint(ds, tier="1h").to_pandas()
    assert len(out) == 0


def test_readability_counts():
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "The cat sat. The mat!",   # 5 words, 2 sentences
            "",                          # empty doc -> NULL flesch
            "abc def",                   # no punctuation -> 1 sentence floor
        ]),
    })
    out = _scores(t).to_pandas()
    assert out["n_words"].tolist() == [5, 0, 2]
    assert out["n_sentences"].tolist() == [2, 0, 0]
    # vowel groups: 'e','a','a','e','a' = 5 | 0 | 'a','e' = 2
    assert out["n_syllables"].tolist() == [5, 0, 2]
    assert np.isnan(out["flesch"].iloc[1])
    want = 206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5)
    assert out["flesch"].iloc[0] == pytest.approx(want, abs=1e-6)


def test_holt_winters_learns_planted_seasonality(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.diffstats import (
        holt_winters_smooth,
    )

    # strong period-24 pattern: value = 10 + 5*(hour == 0)
    n = 24 * 10
    ts = pd.to_datetime(np.arange(n, dtype=np.int64) * 3_600_000_000_000)
    vals = 10.0 + 5.0 * (np.arange(n) % 24 == 0)
    df = pd.DataFrame({
        "series_key": ["s"] * n, "ts": ts, "value_num": vals})
    out = holt_winters_smooth(
        ray.data.from_pandas(df),
        window_ns=3_600_000_000_000).to_pandas().sort_values("window_ns")
    assert len(out) == n
    # after several periods, the seasonal term at the spiking hour
    # dominates the seasonal terms elsewhere
    late = out.tail(24)
    spike = late.loc[late["y"] == 15.0, "seasonal"].iloc[0]
    flat = late.loc[late["y"] == 10.0, "seasonal"].abs().max()
    assert spike > 2.0 and spike > flat + 2.0
    # init conventions: first row is level=y1, trend=0, seasonal=0
    first = out.iloc[0]
    assert first["level"] == first["y"]
    assert first["trend"] == 0.0 and first["seasonal"] == 0.0


def test_daily_spectrum_planted_cycle(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.seriesdiag import (
        daily_spectrum,
    )

    n = 24 * 8
    # pure 24h cosine with amplitude 3 around level 10
    means = 10.0 + 3.0 * np.cos(2 * np.pi * np.arange(n) / 24)
    flat = np.full(n, 10.0)
    df = pd.DataFrame({
        "series_key": ["cyc"] * n + ["flat"] * n,
        "tier": ["1h"] * (2 * n),
        "window_start": pd.to_datetime(
            np.tile(np.arange(n, dtype=np.int64), 2) * 3_600_000_000_000),
        "sum": np.concatenate([means, flat]),
        "count": np.ones(2 * n, dtype=np.int64),
    })
    out = daily_spectrum(ray.data.from_pandas(df), tier="1h") \
        .to_pandas().set_index("series_key")
    assert out.loc["cyc", "daily_amplitude"] == pytest.approx(3.0, abs=1e-3)
    assert out.loc["flat", "daily_amplitude"] < 1e-6
    assert out.loc["cyc", "mean_level"] == pytest.approx(10.0, abs=1e-6)


def test_dominant_period_picks_planted_cycle(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.seriesdiag import (
        dominant_period,
    )

    n = 24 * 14  # two weeks of hours
    means = 10.0 + 4.0 * np.cos(2 * np.pi * np.arange(n) / 12)  # 12h cycle
    df = pd.DataFrame({
        "series_key": ["s"] * n, "tier": ["1h"] * n,
        "window_start": pd.to_datetime(
            np.arange(n, dtype=np.int64) * 3_600_000_000_000),
        "sum": means, "count": np.ones(n, dtype=np.int64)})
    out = dominant_period(ray.data.from_pandas(df), tier="1h").to_pandas()
    assert out["dominant_period_h"].iloc[0] == 12
    assert out["amplitude"].iloc[0] == pytest.approx(4.0, abs=1e-3)


def test_ar2_yule_walker_recovers_planted_coeffs(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.diffstats import (
        ar2_yule_walker,
    )

    # simulate an AR(2) process with known coefficients; Yule-Walker on
    # a long realization recovers them to within sampling error
    rng = np.random.default_rng(7)
    phi1, phi2, n = 0.6, -0.3, 6000
    y = np.zeros(n)
    eps = rng.standard_normal(n)
    for t in range(2, n):
        y[t] = phi1 * y[t - 1] + phi2 * y[t - 2] + eps[t]
    ts = pd.to_datetime(np.arange(n, dtype=np.int64) * 3_600_000_000_000)
    df = pd.DataFrame({
        "series_key": ["ar"] * n + ["flat"] * 3 + ["short"] * 2,
        "ts": list(ts) + list(ts[:3]) + list(ts[:2]),
        "value_num": list(y) + [5.0, 5.0, 5.0] + [1.0, 2.0],
    })
    out = ar2_yule_walker(
        ray.data.from_pandas(df),
        window_ns=3_600_000_000_000).to_pandas()
    # zero-variance series dropped (c0 == 0); < min_windows series dropped
    assert out["series_key"].tolist() == ["ar"]
    row = out.iloc[0]
    assert row["n_windows"] == n
    assert row["phi1"] == pytest.approx(phi1, abs=0.05)
    assert row["phi2"] == pytest.approx(phi2, abs=0.05)
    # stationarity of the planted process carries to the fit
    assert abs(row["r1"]) < 1.0 and abs(row["r2"]) < 1.0


def test_pacf_cuts_off_for_planted_ar1(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.diffstats import pacf_tier

    # AR(1): PACF is phi at lag 1, ~0 at lags 2 and 3
    rng = np.random.default_rng(11)
    phi, n = 0.7, 6000
    y = np.zeros(n)
    eps = rng.standard_normal(n)
    for t in range(1, n):
        y[t] = phi * y[t - 1] + eps[t]
    ts = pd.to_datetime(np.arange(n, dtype=np.int64) * 3_600_000_000_000)
    df = pd.DataFrame({
        "series_key": ["ar1"] * n, "ts": ts, "value_num": y})
    out = pacf_tier(
        ray.data.from_pandas(df),
        window_ns=3_600_000_000_000).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["pacf1"] == pytest.approx(phi, abs=0.05)
    assert abs(row["pacf2"]) < 0.05
    assert abs(row["pacf3"]) < 0.05


def test_variance_ratio_random_walk_vs_mean_reversion(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.diffstats import (
        variance_ratio,
    )

    rng = np.random.default_rng(3)
    n = 4000
    walk = np.cumsum(rng.standard_normal(n))          # VR ~ 1
    noise = rng.standard_normal(n)                     # iid level: VR ~ 1/q..
    ts = pd.to_datetime(np.arange(n, dtype=np.int64) * 3_600_000_000_000)
    df = pd.DataFrame({
        "series_key": ["walk"] * n + ["noise"] * n,
        "ts": list(ts) * 2,
        "value_num": np.r_[walk, noise],
    })
    out = variance_ratio(
        ray.data.from_pandas(df),
        window_ns=3_600_000_000_000).to_pandas().set_index("series_key")
    # random walk: q-step variance scales ~linearly with q
    assert out.loc["walk", "vr"] == pytest.approx(1.0, abs=0.15)
    # iid noise around a level mean-reverts: VR(q) -> (1/q)*[var(dq)/var(d1)]
    # = (1/4)*(2s^2/2s^2) = 0.25
    assert out.loc["noise", "vr"] == pytest.approx(0.25, abs=0.1)


def test_hurst_separates_persistent_from_antipersistent(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.diffstats import hurst_rs

    rng = np.random.default_rng(13)
    n = 2048
    # persistent: long linear trend + small noise -> H near 1
    trend = np.arange(n) * 0.5 + rng.normal(0, 0.2, n)
    # anti-persistent: alternating +-1 with noise -> H near 0
    alt = np.where(np.arange(n) % 2 == 0, 1.0, -1.0) + rng.normal(0, 0.05, n)
    # iid increments of a level series: H near 0.5 for the LEVELS of
    # white noise is ~0; use a random walk's levels for H ~ 0.5 ... R/S
    # on the SERIES values treats them as increments, so feed increments:
    walk_inc = rng.standard_normal(n)
    ts = pd.to_datetime(np.arange(n, dtype=np.int64) * 3_600_000_000_000)
    df = pd.DataFrame({
        "series_key": ["trend"] * n + ["alt"] * n + ["iid"] * n,
        "ts": list(ts) * 3,
        "value_num": np.r_[trend, alt, walk_inc],
    })
    out = hurst_rs(
        ray.data.from_pandas(df),
        window_ns=3_600_000_000_000).to_pandas().set_index("series_key")
    assert (out["n_sizes"] == 4).all()
    assert out.loc["trend", "hurst"] > 0.85
    assert out.loc["alt", "hurst"] < 0.25
    assert out.loc["iid", "hurst"] == pytest.approx(0.55, abs=0.12)


def test_ljung_box_separates_noise_from_ar1(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.diffstats import (
        ljung_box_tier,
    )

    rng = np.random.default_rng(13)
    n = 4000
    wn = rng.standard_normal(n)
    phi = 0.7
    ar = np.zeros(n)
    eps = rng.standard_normal(n)
    for t in range(1, n):
        ar[t] = phi * ar[t - 1] + eps[t]
    ts = pd.to_datetime(np.arange(n, dtype=np.int64) * 3_600_000_000_000)
    df = pd.DataFrame({
        "series_key": ["wn"] * n + ["ar1"] * n,
        "ts": np.r_[ts, ts],
        "value_num": np.r_[wn, ar]})
    out = ljung_box_tier(
        ray.data.from_pandas(df),
        window_ns=3_600_000_000_000).to_pandas().set_index("series_key")
    # white noise: Q ~ chi2(3); AR(1): Q explodes with n * r1^2 alone
    assert out.loc["wn", "q_lb"] < 20.0
    assert out.loc["ar1", "q_lb"] > 100.0
    assert out.loc["ar1", "r1"] == pytest.approx(phi, abs=0.05)


def test_jarque_bera_separates_normal_from_exponential(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.diffstats import (
        jarque_bera_tier,
    )

    rng = np.random.default_rng(17)
    n = 4000
    norm = rng.standard_normal(n)
    expo = rng.exponential(1.0, n)
    ts = pd.to_datetime(np.arange(n, dtype=np.int64) * 3_600_000_000_000)
    df = pd.DataFrame({
        "series_key": ["norm"] * n + ["expo"] * n,
        "ts": np.r_[ts, ts],
        "value_num": np.r_[norm, expo]})
    out = jarque_bera_tier(
        ray.data.from_pandas(df),
        window_ns=3_600_000_000_000).to_pandas().set_index("series_key")
    # normal: JB ~ chi2(2); exponential: skew 2, excess kurt 6 -> huge JB
    assert out.loc["norm", "jb"] < 25.0
    assert out.loc["expo", "jb"] > 1000.0
    assert out.loc["expo", "skew_g1"] == pytest.approx(2.0, abs=0.5)


def test_mann_kendall_detects_planted_trend(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.diffstats import (
        mann_kendall_tier,
    )

    rng = np.random.default_rng(19)
    n = 200
    trend = 0.05 * np.arange(n) + rng.standard_normal(n)
    noise = rng.standard_normal(n)
    day = 86_400_000_000_000
    ts = pd.to_datetime(np.arange(n, dtype=np.int64) * day)
    df = pd.DataFrame({
        "series_key": ["trend"] * n + ["noise"] * n,
        "ts": np.r_[ts, ts],
        "value_num": np.r_[trend, noise]})
    out = mann_kendall_tier(
        ray.data.from_pandas(df),
        window_ns=day).to_pandas().set_index("series_key")
    assert out.loc["trend", "z_mk"] > 4.0
    assert out.loc["trend", "s_stat"] > 0
    assert abs(out.loc["noise", "z_mk"]) < 3.0
    # continuity correction: |z| uses |S|-1 over the exact variance
    n_ = int(out.loc["trend", "n_windows"])
    var_s = n_ * (n_ - 1) * (2 * n_ + 5) / 18.0
    s = int(out.loc["trend", "s_stat"])
    assert out.loc["trend", "z_mk"] == pytest.approx(
        (s - 1.0) / np.sqrt(var_s), abs=1e-4)


def test_grubbs_finds_planted_spike(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.diffstats import grubbs_tier

    rng = np.random.default_rng(23)
    n = 500
    hour = 3_600_000_000_000
    y = rng.standard_normal(n)
    y[137] = 60.0  # planted extreme
    ts = pd.to_datetime(np.arange(n, dtype=np.int64) * hour)
    df = pd.DataFrame({
        "series_key": ["s"] * n, "ts": ts, "value_num": y})
    out = grubbs_tier(
        ray.data.from_pandas(df), window_ns=hour).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["window_ns"] == 137 * hour
    assert row["g_stat"] > 10.0


def test_seasonal_strength_separates_diurnal_from_noise(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.diffstats import (
        seasonal_strength_hod,
    )

    rng = np.random.default_rng(29)
    n = 24 * 60
    hour = 3_600_000_000_000
    hod = np.arange(n) % 24
    diurnal = 10.0 * np.sin(2 * np.pi * hod / 24) + 0.1 * rng.standard_normal(n)
    noise = rng.standard_normal(n)
    ts = pd.to_datetime(np.arange(n, dtype=np.int64) * hour)
    df = pd.DataFrame({
        "series_key": ["diurnal"] * n + ["noise"] * n,
        "ts": np.r_[ts, ts],
        "value_num": np.r_[diurnal, noise]})
    out = seasonal_strength_hod(
        ray.data.from_pandas(df)).to_pandas().set_index("series_key")
    assert out.loc["diurnal", "eta2_hod"] > 0.95
    assert out.loc["noise", "eta2_hod"] < 0.1
    assert int(out.loc["diurnal", "n_hours"]) == 24
    assert 0.0 <= out["eta2_hod"].min() and out["eta2_hod"].max() <= 1.0


def test_pettitt_locates_planted_level_shift(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.diffstats import (
        pettitt_tier,
    )

    rng = np.random.default_rng(41)
    n = 200
    day = 86_400_000_000_000
    y = rng.standard_normal(n)
    y[120:] += 5.0  # level shift after k=120 (0-based window 120)
    ts = pd.to_datetime(np.arange(n, dtype=np.int64) * day)
    df = pd.DataFrame({
        "series_key": ["shift"] * n, "ts": ts, "value_num": y})
    out = pettitt_tier(
        ray.data.from_pandas(df), window_ns=day).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    # argmax split is the last pre-shift window (0-based index 119)
    assert row["window_ns"] == 119 * day
    # clean separation: |U_k| = k * (n - k) at the true split
    assert int(row["k_stat"]) == 120 * (n - 120)


def test_arch_lm_separates_garch_from_noise(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.diffstats import (
        arch_lm_tier,
    )

    rng = np.random.default_rng(43)
    n = 6000
    hour = 3_600_000_000_000
    # ARCH(1): e_t = z_t * sqrt(0.2 + 0.7 * e_{t-1}^2) — level is white
    # noise (LB won't flag it) but squared series is autocorrelated
    e = np.zeros(n)
    z = rng.standard_normal(n)
    for t in range(1, n):
        e[t] = z[t] * np.sqrt(0.2 + 0.7 * e[t - 1] ** 2)
    wn = rng.standard_normal(n)
    ts = pd.to_datetime(np.arange(n, dtype=np.int64) * hour)
    df = pd.DataFrame({
        "series_key": ["arch"] * n + ["wn"] * n,
        "ts": np.r_[ts, ts],
        "value_num": np.r_[e, wn]})
    out = arch_lm_tier(
        ray.data.from_pandas(df),
        window_ns=hour).to_pandas().set_index("series_key")
    assert out.loc["arch", "arch_lm"] > 50.0
    assert out.loc["arch", "r1_sq"] > 0.2
    assert out.loc["wn", "arch_lm"] < 15.0


def test_bowley_skew_sign_and_robustness(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.diffstats import (
        bowley_skew_tier,
    )

    rng = np.random.default_rng(47)
    n = 4000
    hour = 3_600_000_000_000
    right = rng.exponential(1.0, n)          # right-skewed: B > 0
    sym = rng.standard_normal(n)             # symmetric: B ~ 0
    spiked = rng.standard_normal(n)
    spiked[7] = 1e6                          # one outlier: B stays ~ 0
    ts = pd.to_datetime(np.arange(n, dtype=np.int64) * hour)
    df = pd.DataFrame({
        "series_key": ["right"] * n + ["sym"] * n + ["spiked"] * n,
        "ts": np.r_[ts, ts, ts],
        "value_num": np.r_[right, sym, spiked]})
    out = bowley_skew_tier(
        ray.data.from_pandas(df),
        window_ns=hour).to_pandas().set_index("series_key")
    assert out.loc["right", "bowley_skew"] > 0.15
    assert abs(out.loc["sym", "bowley_skew"]) < 0.1
    assert abs(out.loc["spiked", "bowley_skew"]) < 0.1  # robust to spike
    assert (out["bowley_skew"].abs() <= 1.0).all()
    assert (out["q1"] <= out["q2"]).all() and (out["q2"] <= out["q3"]).all()
