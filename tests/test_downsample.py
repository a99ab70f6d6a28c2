"""Downsample / rate / retention operators (pipelines/downsample.py).

The SQL-expressible ones (stride, rate, hopping, retention) are pinned
against DuckDB oracles by scripts/check_oracle.py; here we pin the
non-SQL LTTB kernel and the distributed plumbing.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from json_time_series_extractor_ray.pipelines.downsample import (
    DEFAULT_TTL_NS,
    lttb_downsample,
    lttb_series,
    rate_increase,
    retention_expire,
    stride_downsample,
)
from json_time_series_extractor_ray.stages.extract import SAMPLE_SCHEMA
from json_time_series_extractor_ray.stages.rollup import WINDOW_NS, rollup_ladder


def _samples_table(rows):
    """rows: (series_key, ts_ns, value)"""
    return pa.table(
        {
            "series_key": pa.array([r[0] for r in rows], pa.string()),
            "ts": pa.array([r[1] for r in rows], pa.int64()).cast(pa.timestamp("ns")),
            "ts_source": pa.array([1] * len(rows), pa.int8()),
            "value_num": pa.array([float(r[2]) for r in rows], pa.float64()),
            "value_str": pa.array([None] * len(rows), pa.string()),
            "value_bool": pa.array([None] * len(rows), pa.bool_()),
            "value_kind": pa.array([1] * len(rows), pa.int8()),
            "doc_id": pa.array([f"d{i:04d}" for i in range(len(rows))], pa.string()),
            "sample_ordinal": pa.array([0] * len(rows), pa.int32()),
        },
        schema=SAMPLE_SCHEMA,
    )


class TestLttbKernel:
    def test_endpoints_and_count(self):
        rng = np.random.default_rng(7)
        ts = np.sort(rng.integers(0, 10**9, 500))
        vals = rng.normal(size=500)
        idx = lttb_series(ts, vals, 50)
        assert len(idx) == 50
        assert idx[0] == 0 and idx[-1] == 499
        assert (np.diff(idx) > 0).all()  # strictly increasing, no dups

    def test_keeps_extreme_point(self):
        # A huge spike must survive any sane downsample.
        ts = np.arange(1000, dtype=np.int64)
        vals = np.zeros(1000)
        vals[437] = 1000.0
        idx = lttb_series(ts, vals, 20)
        assert 437 in idx

    def test_small_inputs(self):
        ts = np.array([1, 2, 3], dtype=np.int64)
        vals = np.array([1.0, 2.0, 3.0])
        assert list(lttb_series(ts, vals, 10)) == [0, 1, 2]  # k >= n
        assert list(lttb_series(ts, vals, 2)) == [0, 2]

    def test_triangle_selection_matches_bruteforce(self):
        # 5 points -> k=3: the middle selection maximizes the triangle
        # area between first point, candidate, and last-bucket average.
        ts = np.array([0, 1, 2, 3, 4], dtype=np.int64)
        vals = np.array([0.0, 1.0, -5.0, 1.0, 0.0])
        idx = lttb_series(ts, vals, 3)
        assert idx[0] == 0 and idx[-1] == 4
        assert vals[idx[1]] == -5.0  # the outlier wins the area contest


class TestDistributed:
    def test_stride_matches_pandas(self, ray_session):
        import ray

        rng = np.random.default_rng(11)
        rows = [
            (f"s{i % 3}", int(t), float(v))
            for i, (t, v) in enumerate(
                zip(rng.integers(0, 10**12, 300), rng.normal(size=300))
            )
        ]
        ds = ray.data.from_arrow(_samples_table(rows))
        got = stride_downsample(ds, 5).to_pandas()
        got = got.sort_values(["series_key", "ts_ns"], ignore_index=True)

        df = _samples_table(rows).to_pandas()
        df["ts_ns"] = df["ts"].astype("int64")
        df["ordinal"] = df["sample_ordinal"].astype("int64")
        exp = (
            df.sort_values(["ts_ns", "doc_id", "ordinal"], kind="stable")
            .groupby("series_key", sort=True)
            .apply(lambda g: g.iloc[::5], include_groups=True)
            .reset_index(drop=True)[["series_key", "ts_ns", "value_num"]]
            .sort_values(["series_key", "ts_ns"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, exp)

    def test_rate_counter_reset(self, ray_session):
        import ray

        rows = [
            ("c", 1_000, 10.0),
            ("c", 2_000, 15.0),
            ("c", 3_000, 2.0),   # reset: counter restarted
            ("c", 4_000, 7.0),
        ]
        ds = ray.data.from_arrow(_samples_table(rows))
        got = rate_increase(ds).to_pandas().sort_values("ts_ns", ignore_index=True)
        assert got["increase"].tolist() == [5.0, 2.0, 5.0]
        assert got["ts_ns"].tolist() == [2_000, 3_000, 4_000]

    def test_lttb_distributed_matches_serial(self, ray_session):
        import ray

        rng = np.random.default_rng(3)
        rows = [
            ("only", int(t), float(v))
            for t, v in zip(
                np.sort(rng.integers(0, 10**12, 400)), rng.normal(size=400)
            )
        ]
        ds = ray.data.from_arrow(_samples_table(rows))
        got = lttb_downsample(ds, 40).to_pandas()
        assert len(got) == 40

        df = _samples_table(rows).to_pandas()
        df["ts_ns"] = df["ts"].astype("int64")
        df = df.sort_values(["ts_ns", "doc_id"], kind="stable", ignore_index=True)
        idx = lttb_series(df["ts_ns"].to_numpy(), df["value_num"].to_numpy(), 40)
        exp = df.iloc[idx][["series_key", "ts_ns", "value_num"]].reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.sort_values("ts_ns", ignore_index=True),
            exp.sort_values("ts_ns", ignore_index=True),
        )

    def test_retention_expire_cutoffs(self, ray_session):
        import ray

        day = WINDOW_NS["1d"]
        # 40 days of hourly points ending at watermark.
        rows = [("s", int(t), 1.0) for t in range(0, 40 * day, WINDOW_NS["1h"])]
        ds = ray.data.from_arrow(_samples_table(rows))
        ladder = rollup_ladder(ds, tiers=("1m", "1h", "1d"))
        kept = retention_expire(ladder).to_pandas()
        wm = max(r[1] for r in rows)
        for tier, ttl in DEFAULT_TTL_NS.items():
            t = kept[kept["tier"] == tier]
            assert len(t) > 0
            starts = t["window_start"].astype("int64")
            assert (starts >= wm - ttl).all()
        # The 1m tier must have dropped the old windows; 1d keeps ~30 days.
        full = ladder.to_pandas()
        assert len(kept[kept["tier"] == "1m"]) < len(full[full["tier"] == "1m"])
        assert (
            len(kept[kept["tier"] == "1d"])
            == (full[full["tier"] == "1d"]["window_start"].astype("int64")
                >= wm - DEFAULT_TTL_NS["1d"]).sum()
        )


def test_lttb_structure_report_planted(ray_session):
    import ray

    from json_time_series_extractor_ray.pipelines.downsample import (
        lttb_structure_report,
    )

    rng = np.random.default_rng(3)
    n = 500
    rows = [("s", 1_000_000_000 * i, float(v))
            for i, v in enumerate(rng.normal(size=n))]
    ds = ray.data.from_arrow(_samples_table(rows))
    out = lttb_structure_report(ds, 40).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_input"] == n and r["k_points"] == 40
    assert r["first_ts_ns"] == 0 and r["last_ts_ns"] == 1_000_000_000 * (n - 1)
    assert r["first_value"] == rows[0][2] and r["last_value"] == rows[-1][2]
    assert bool(r["buckets_ok"]) and bool(r["monotone_ok"])
    # short series: every point kept
    out2 = lttb_structure_report(
        ray.data.from_arrow(_samples_table(rows[:10])), 40).to_pandas()
    assert out2.iloc[0]["k_points"] == 10
