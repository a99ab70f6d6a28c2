"""PSI drift: weighted-quantile bit-parity with DuckDB quantile_cont,
planted drift / no-drift shapes, and the half split."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from json_time_series_extractor_ray.pipelines.psidrift import (
    _weighted_quantiles,
    psi_drift,
)


def test_weighted_quantiles_match_duckdb():
    rng = np.random.default_rng(4)
    for _ in range(20):
        vals = np.round(rng.normal(0, 10, rng.integers(2, 400)), 2)
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"x": vals}))
        qs = [0.1, 0.25, 0.5, 0.9]
        want = con.execute(f"SELECT quantile_cont(x, {qs}) FROM t") \
            .fetchone()[0]
        uv, uc = np.unique(vals, return_counts=True)
        got = _weighted_quantiles(uv, uc.astype(np.int64), qs)
        assert [float(w) for w in want] == got.tolist()


def _samples(series, ts_ns, values):
    return pd.DataFrame({
        "series_key": series,
        "ts": pd.to_datetime(np.asarray(ts_ns, dtype=np.int64)),
        "value_num": np.asarray(values, dtype=np.float64),
    })


def test_identical_halves_score_near_zero(ray_session):
    import ray

    vals = list(range(100))
    df = _samples(["s"] * 200, list(range(200)), vals + vals)
    out = psi_drift(ray.data.from_pandas(df))
    assert len(out) == 1
    assert out["n_first"].iloc[0] == 100  # midpoint ts 99.5 -> ts<=99
    assert out["n_second"].iloc[0] == 100
    assert abs(out["psi"].iloc[0]) < 0.01


def test_shifted_second_half_drifts(ray_session):
    import ray

    rng = np.random.default_rng(9)
    first = rng.normal(0, 1, 500)
    second = rng.normal(3, 1, 500)  # large mean shift
    df = _samples(["s"] * 1000, list(range(1000)),
                  np.concatenate([first, second]))
    out = psi_drift(ray.data.from_pandas(df))
    assert out["psi"].iloc[0] > 1.0  # way past the 0.25 drift alarm


def test_single_first_half_value_dropped(ray_session):
    import ray

    df = _samples(["s"] * 2, [0, 100], [1.0, 2.0])
    out = psi_drift(ray.data.from_pandas(df))
    assert len(out) == 0  # n_first == 1 < 2


def test_psi_is_asymmetric_but_finite_on_empty_buckets(ray_session):
    import ray

    # second half entirely above the first half's range: all mass in the
    # top bucket; smoothing keeps every term finite
    df = _samples(["s"] * 40, list(range(40)),
                  list(np.linspace(0, 1, 20)) + [50.0] * 20)
    out = psi_drift(ray.data.from_pandas(df))
    assert np.isfinite(out["psi"].iloc[0])
    assert out["psi"].iloc[0] > 1.0


def test_wasserstein_planted_shift(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.psidrift import (
        wasserstein_drift,
    )

    # identical halves -> W1 = 0; constant +2 shift -> W1 = 2 exactly
    vals = np.linspace(0, 10, 50)
    same = _samples(["same"] * 100, list(range(100)),
                    np.concatenate([vals, vals]))
    shifted = _samples(["shift"] * 100, list(range(100)),
                       np.concatenate([vals, vals + 2.0]))
    df = pd.concat([same, shifted], ignore_index=True)
    out = wasserstein_drift(ray.data.from_pandas(df)) \
        .set_index("series_key")
    assert out.loc["same", "w1"] == 0.0
    assert out.loc["shift", "w1"] == pytest.approx(2.0, abs=1e-6)


def test_psi_distributed_matches_duckdb_continuous(ray_session):
    """Planted continuous high-cardinality series spread over many
    value-ordered shards: the shard-navigation quantile + distributed
    bucketing must match the full DuckDB single-machine computation."""
    import ray

    from json_time_series_extractor_ray.pipelines._util import (
        value_ordered_shards,
    )

    rng = np.random.default_rng(21)
    n = 6000
    vals = np.exp(rng.normal(0, 4, n))  # all distinct, many binades
    assert len(np.unique(value_ordered_shards(vals, 64))) > 20
    df = _samples(["s"] * n, list(range(n)), vals)
    out = psi_drift(ray.data.from_pandas(df), driver_fold_rows=0)

    con = duckdb.connect()
    mid = (0 + (n - 1)) // 2
    con.register("t", pd.DataFrame({
        "x": vals, "half": (np.arange(n) > mid).astype(int)}))
    edges = con.execute(
        "SELECT quantile_cont(x, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) "
        "FROM t WHERE half = 0").fetchone()[0]
    first = vals[np.arange(n) <= mid]
    second = vals[np.arange(n) > mid]
    e = np.asarray(edges, np.float64)
    c0 = np.bincount(np.searchsorted(e, first, side="left"), minlength=10)
    c1 = np.bincount(np.searchsorted(e, second, side="left"), minlength=10)
    q = (c0 + 0.5) / (len(first) + 5.0)
    p = (c1 + 0.5) / (len(second) + 5.0)
    want = float(np.sum((p - q) * np.log(p / q)))
    assert out["psi"].iloc[0] == pytest.approx(want, abs=1e-6)
    assert out["n_first"].iloc[0] == len(first)


def test_psi_and_w1_shard_count_invariance(ray_session):
    """Results are exactly invariant to value_shards — the offsets and
    boundary terms are exact, not approximately so."""
    import ray

    from json_time_series_extractor_ray.pipelines.psidrift import (
        wasserstein_drift,
    )

    rng = np.random.default_rng(22)
    n = 800
    vals = np.round(np.exp(rng.normal(0, 3, n)), 3)
    df = _samples(["a"] * n, list(range(n)), vals)
    psis = [psi_drift(ray.data.from_pandas(df), value_shards=k,
                      driver_fold_rows=0)
            for k in (1, 16, 256)]
    psis.append(psi_drift(ray.data.from_pandas(df)))  # driver-fold path
    w1s = [wasserstein_drift(ray.data.from_pandas(df), value_shards=k,
                             driver_fold_rows=0)
           for k in (1, 16, 256)]
    w1s.append(wasserstein_drift(ray.data.from_pandas(df)))
    for other in psis[1:]:
        pd.testing.assert_frame_equal(
            psis[0].reset_index(drop=True), other.reset_index(drop=True))
    for other in w1s[1:]:
        pd.testing.assert_frame_equal(
            w1s[0].reset_index(drop=True), other.reset_index(drop=True))
