"""Unit tests for the analytics operators (OHLC, z-score, TWA) —
edge cases the oracle queries can't plant: cross-block open/close
tie-breaks, constant series (zero variance), single-point windows."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from json_time_series_extractor_ray.pipelines.analytics import (
    ohlc_rollup,
    series_stats,
    twa_rollup,
    zscore_anomalies,
)


def _samples_table(rows):
    """rows: list of (series_key, ts_ns, value, doc_id, ordinal)."""
    ks, ts, vs, ds_, os_ = zip(*rows)
    return pa.table({
        "series_key": pa.array(ks, pa.string()),
        "ts": pa.array(list(ts), pa.int64()).cast(pa.timestamp("ns")),
        "value_num": pa.array(list(vs), pa.float64()),
        "value_kind": pa.array([1] * len(rows), pa.int32()),
        "doc_id": pa.array(ds_, pa.string()),
        "sample_ordinal": pa.array(list(os_), pa.int64()),
    })


class TestOhlc:
    def test_open_close_cross_block_tiebreak(self, ray_session):
        import ray

        # Same window, same ts on both ends: doc_id then ordinal break the
        # tie.  Two single-row blocks force the merge (not the combiner) to
        # resolve the pick.
        a = _samples_table([("s", 5, 10.0, "evt-02", 0),
                            ("s", 5, 11.0, "evt-01", 1)])
        b = _samples_table([("s", 5, 99.0, "evt-01", 0),
                            ("s", 7, 3.0, "evt-09", 0)])
        ds = ray.data.from_arrow(a).union(ray.data.from_arrow(b))
        out = ohlc_rollup(ds, window_ns=60).to_pandas()
        assert len(out) == 1
        row = out.iloc[0]
        # open: min (ts, doc, ord) = (5, evt-01, 0) -> 99.0
        # close: max (ts, doc, ord) = (7, evt-09, 0) -> 3.0
        assert row["open"] == 99.0 and row["close"] == 3.0
        assert row["high"] == 99.0 and row["low"] == 3.0

    def test_multi_window_multi_series(self, ray_session):
        import ray

        rows = [("a", t, float(t), f"evt-{t:02d}", 0) for t in range(0, 200, 10)]
        rows += [("b", t, -float(t), f"evt-{t:02d}", 0) for t in range(0, 100, 7)]
        ds = ray.data.from_arrow(_samples_table(rows))
        out = ohlc_rollup(ds, window_ns=60).to_pandas()
        a0 = out[(out.series_key == "a") & (out.window_ns == 0)].iloc[0]
        assert (a0["open"], a0["close"], a0["high"], a0["low"]) == (0.0, 50.0, 50.0, 0.0)
        b1 = out[(out.series_key == "b") & (out.window_ns == 60)].iloc[0]
        assert b1["open"] == -63.0 and b1["close"] == -98.0


class TestZscore:
    def test_constant_series_emits_nothing(self, ray_session):
        import ray

        t = _samples_table([("c", i, 5.0, f"evt-{i:02d}", 0) for i in range(10)])
        out = zscore_anomalies(
            lambda: ray.data.from_arrow(t), threshold=0.0
        ).to_pandas()
        assert len(out) == 0  # zero variance -> no flags, no NaN rows

    def test_outlier_flagged(self, ray_session):
        import ray

        vals = [1.0] * 20 + [2.0] * 20 + [100.0]
        t = _samples_table([
            ("s", i, v, f"evt-{i:02d}", 0) for i, v in enumerate(vals)
        ])
        out = zscore_anomalies(
            lambda: ray.data.from_arrow(t), threshold=3.0
        ).to_pandas()
        assert list(out["value_num"]) == [100.0]
        assert out["z"].iloc[0] > 3

    def test_stats_deterministic_across_block_orders(self, ray_session):
        import ray

        rows = [("s", i, float(np.sin(i)), f"evt-{i:04d}", 0)
                for i in range(100)]
        t1 = _samples_table(rows)
        t2 = _samples_table(rows[::-1])
        s1 = series_stats(ray.data.from_arrow(t1))
        s2 = series_stats(ray.data.from_arrow(t2))
        # merge sorts by (first_ts, first_doc, first_ord): bit-identical
        assert s1["s"].iloc[0] == s2["s"].iloc[0]
        assert s1["ss"].iloc[0] == s2["ss"].iloc[0]


class TestTwa:
    def test_hold_time_weighting(self, ray_session):
        import ray

        # v=0 held for 9 s of a 10 s span, v=10 for 1 s, final point unweighted
        rows = [("s", 0, 0.0, "evt-00", 0),
                ("s", 9_000_000_000, 10.0, "evt-01", 0),
                ("s", 10_000_000_000, 99.0, "evt-02", 0)]
        ds = ray.data.from_arrow(_samples_table(rows))
        out = twa_rollup(ds, window_ns=60_000_000_000).to_pandas()
        assert len(out) == 1
        assert out["twa"].iloc[0] == pytest.approx((0 * 9 + 10 * 1) / 10)

    def test_single_point_and_zero_duration_windows_dropped(self, ray_session):
        import ray

        rows = [("s", 0, 1.0, "evt-00", 0),          # singleton window
                ("s", 120_000_000_000, 5.0, "evt-01", 0),   # same-ts pair
                ("s", 120_000_000_000, 7.0, "evt-02", 0)]
        ds = ray.data.from_arrow(_samples_table(rows))
        out = twa_rollup(ds, window_ns=60_000_000_000).to_pandas()
        assert len(out) == 0
