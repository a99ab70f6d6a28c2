"""Property-based invariants for the downsample/rate kernels (no Ray —
these pin the serial semantics the distributed paths delegate to)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from json_time_series_extractor_ray.pipelines.downsample import lttb_series

_series = st.integers(min_value=3, max_value=400).flatmap(
    lambda n: st.tuples(
        st.just(n),
        st.lists(
            st.floats(allow_nan=False, allow_infinity=False,
                      min_value=-1e9, max_value=1e9),
            min_size=n, max_size=n,
        ),
        st.integers(min_value=3, max_value=60),
    )
)


@settings(max_examples=150, deadline=None)
@given(_series)
def test_lttb_invariants(args):
    n, values, k = args
    ts = np.arange(n, dtype=np.int64) * 1000
    vals = np.asarray(values)
    idx = lttb_series(ts, vals, k)
    # Exactly min(k, n) points, strictly increasing (no duplicates),
    # endpoints always kept.
    assert len(idx) == min(k, n)
    assert (np.diff(idx) > 0).all()
    assert idx[0] == 0 and idx[-1] == n - 1
    # Selected points are a subset of the input.
    assert (idx >= 0).all() and (idx < n).all()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False,
                  min_value=0, max_value=1e12),
        min_size=2, max_size=200,
    )
)
def test_rate_increase_semantics(values):
    """Counter semantics: increases are always >= 0, and for a monotone
    series the total increase telescopes to last - first."""
    v = np.asarray(values)
    delta = v[1:] - v[:-1]
    increase = np.where(delta < 0, v[1:], delta)
    assert (increase >= 0).all()
    mono = np.maximum.accumulate(v)
    d2 = mono[1:] - mono[:-1]
    inc2 = np.where(d2 < 0, mono[1:], d2)
    assert np.isclose(inc2.sum(), mono[-1] - mono[0], rtol=1e-9, atol=1e-6)


def test_hopping_equals_tumbling_when_hop_is_width(ray_session):
    """hop == width degenerates to the tumbling rollup: same windows, same
    count/sum/min/max per (series, window)."""
    import ray

    from json_time_series_extractor_ray.pipelines.downsample import (
        hopping_rollup,
    )
    from json_time_series_extractor_ray.stages.rollup import (
        WINDOW_NS,
        rollup_ladder,
    )
    from tests.test_downsample import _samples_table

    rng = np.random.default_rng(21)
    rows = [
        (f"s{i % 4}", int(t), float(np.round(v, 2)))
        for i, (t, v) in enumerate(
            zip(
                rng.integers(0, 3 * WINDOW_NS["1h"], 500),
                rng.normal(size=500) * 10,
            )
        )
    ]
    ds = ray.data.from_arrow(_samples_table(rows))
    hop = hopping_rollup(
        ds, width_ns=WINDOW_NS["1m"], hop_ns=WINDOW_NS["1m"]
    ).to_pandas()
    ladder = rollup_ladder(ray.data.from_arrow(_samples_table(rows)),
                           tiers=("1m",)).to_pandas()

    hop = hop.sort_values(["series_key", "window_ns"], ignore_index=True)
    ladder = ladder.sort_values(["series_key", "window_start"],
                                ignore_index=True)
    assert hop["window_ns"].tolist() == [
        int(w) for w in ladder["window_start"].astype("int64")
    ]
    assert hop["count"].tolist() == ladder["count"].tolist()
    np.testing.assert_array_equal(hop["min"], ladder["min"])
    np.testing.assert_array_equal(hop["max"], ladder["max"])
    np.testing.assert_allclose(
        hop["sum"], ladder["sum"].round(6), rtol=0, atol=1e-9
    )
