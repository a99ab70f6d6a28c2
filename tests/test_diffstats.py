"""Windowed stddev rollup and rollup-ladder diffing."""

import numpy as np
import pandas as pd
import pyarrow as pa

from json_time_series_extractor_ray.pipelines.diffstats import (
    diff_rollups,
    window_stddev,
)

_H = 3_600_000_000_000


def _samples(ray, df):
    t = pa.table({
        "series_key": pa.array(df["series_key"], pa.string()),
        "ts": pa.array(df["ts_ns"], pa.int64()).cast(pa.timestamp("ns")),
        "value_num": pa.array(df["value_num"], pa.float64()),
    })
    return ray.data.from_arrow(t)


class TestWindowStddev:
    def test_matches_numpy(self, ray_session):
        rng = np.random.default_rng(5)
        n = 3000
        df = pd.DataFrame({
            "series_key": rng.choice(["a", "b"], n),
            "ts_ns": rng.integers(0, 5 * _H, n),
            "value_num": rng.normal(50, 10, n).round(2),
        })
        got = window_stddev(
            _samples(ray_session, df), window_ns=_H
        ).to_pandas().sort_values(["series_key", "window_ns"],
                                  ignore_index=True)
        df["w"] = df["ts_ns"] // _H * _H
        for _, row in got.iterrows():
            v = df[(df["series_key"] == row["series_key"])
                   & (df["w"] == row["window_ns"])]["value_num"].to_numpy()
            assert row["n"] == len(v)
            assert abs(row["stddev"] - np.std(v, ddof=1)) < 1e-4
            assert abs(row["mean"] - v.mean()) < 1e-4

    def test_single_sample_windows_dropped(self, ray_session):
        df = pd.DataFrame({
            "series_key": ["a", "a"],
            "ts_ns": [0, _H],  # two windows, one sample each
            "value_num": [1.0, 2.0],
        })
        got = window_stddev(_samples(ray_session, df),
                            window_ns=_H).to_pandas()
        assert len(got) == 0

    def test_null_values_ignored(self, ray_session):
        df = pd.DataFrame({
            "series_key": ["a"] * 4,
            "ts_ns": [0, 1, 2, 3],
            "value_num": [1.0, None, 3.0, None],
        })
        got = window_stddev(_samples(ray_session, df),
                            window_ns=_H).to_pandas()
        assert got["n"].tolist() == [2]


def _ladder(ray, rows):
    t = pa.table({
        "series_key": pa.array([r[0] for r in rows], pa.string()),
        "window_ns": pa.array([r[1] for r in rows], pa.int64()),
        "count": pa.array([r[2] for r in rows], pa.int64()),
    })
    return ray.data.from_arrow(t)


class TestDiffRollups:
    def test_identical_ladders_diff_empty(self, ray_session):
        rows = [("a", 0, 5), ("a", _H, 3), ("b", 0, 7)]
        got = diff_rollups(_ladder(ray_session, rows),
                           _ladder(ray_session, rows)).to_pandas()
        assert len(got) == 0

    def test_changed_and_missing_windows_surface(self, ray_session):
        a = [("a", 0, 5), ("a", _H, 3), ("b", 0, 7)]
        b = [("a", 0, 5), ("a", _H, 4)]  # changed count + missing b/0
        got = diff_rollups(
            _ladder(ray_session, a), _ladder(ray_session, b)
        ).to_pandas().sort_values(["series_key", "window_ns"],
                                  ignore_index=True)
        assert [tuple(r) for r in got.itertuples(index=False)] == [
            ("a", _H, 3, 4), ("b", 0, 7, 0),
        ]

    def test_incremental_merge_diffs_zero_vs_batch(self, ray_session):
        """The CDC promise: merge_tier_rollups over disjoint halves must
        diff EMPTY against the one-shot batch ladder."""
        import ray

        from json_time_series_extractor_ray.pipelines.timeseries import (
            events_corpus_dataset,
            extract_pipeline,
        )
        from json_time_series_extractor_ray.stages.rollup import (
            merge_tier_rollups,
            rollup_ladder,
        )
        import pyarrow.compute as pc

        sf = "/root/testdata/sf0.001"

        def _half(parity):
            corpus = events_corpus_dataset(sf)

            def _f(batch):
                last = pc.utf8_slice_codeunits(batch.column("doc_id"),
                                               start=13, stop=14)
                digits = "02468" if parity == 0 else "13579"
                return batch.filter(
                    pc.is_in(last, value_set=pa.array(list(digits)))
                )

            return corpus.map_batches(_f, batch_format="pyarrow",
                                      zero_copy_batch=True)

        def _proj(ladder):
            def _p(batch: pa.Table) -> pa.Table:
                t = batch.filter(
                    pc.equal(batch.column("tier"), pa.scalar("1m"))
                )
                return pa.table({
                    "series_key": t.column("series_key"),
                    "window_ns": t.column("window_start")
                    .cast(pa.timestamp("ns")).cast(pa.int64()),
                    "count": t.column("count"),
                })
            return ladder.map_batches(_p, batch_format="pyarrow")

        batch_ladder = rollup_ladder(
            extract_pipeline(events_corpus_dataset(sf)), tiers=("1m",)
        )
        merged = merge_tier_rollups([
            rollup_ladder(extract_pipeline(_half(p)), tiers=("1m",))
            for p in (0, 1)
        ])
        got = diff_rollups(_proj(batch_ladder), _proj(merged)).to_pandas()
        assert len(got) == 0


class TestWindowTrend:
    def test_slope_matches_polyfit(self, ray_session):
        from json_time_series_extractor_ray.pipelines.diffstats import (
            window_trend,
        )

        _D = 86_400_000_000_000
        rng = np.random.default_rng(6)
        n = 500
        ts = rng.integers(0, _D, n)
        x_h = (ts / 1e9 / 3600.0) - 12.0
        y = 3.5 * x_h + 20 + rng.normal(0, 0.1, n)
        df = pd.DataFrame({"series_key": "s", "ts_ns": ts,
                           "value_num": y})
        got = window_trend(_samples(ray_session, df),
                           window_ns=_D).to_pandas()
        assert len(got) == 1
        slope, _ = np.polyfit(x_h, y, 1)
        assert abs(got["slope"].iloc[0] - slope) < 1e-3

    def test_constant_x_window_dropped(self, ray_session):
        from json_time_series_extractor_ray.pipelines.diffstats import (
            window_trend,
        )

        _D = 86_400_000_000_000
        df = pd.DataFrame({
            "series_key": ["s"] * 3,
            "ts_ns": [100, 100, 100],  # zero x variance
            "value_num": [1.0, 2.0, 3.0],
        })
        got = window_trend(_samples(ray_session, df),
                           window_ns=_D).to_pandas()
        assert len(got) == 0


class TestWeightedSample:
    def test_prefers_heavy_rows(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.split import (
            weighted_sample,
        )

        n = 2000
        t = pa.table({
            "doc_id": pa.array([f"d{i:05d}" for i in range(n)], pa.string()),
            "w": pa.array([1000.0 if i < 200 else 1.0 for i in range(n)],
                          pa.float64()),
        })
        got = weighted_sample(ray.data.from_arrow(t), k=100,
                              weight_col="w").to_pandas()
        heavy = (got["doc_id"].str[1:].astype(int) < 200).sum()
        # 200 heavy rows carry ~99% of total weight -> dominate the sample
        assert heavy > 80

    def test_deterministic_and_matches_bruteforce(self, ray_session):
        import hashlib

        import ray

        from json_time_series_extractor_ray.pipelines.split import (
            weighted_sample,
        )

        n = 500
        rng = np.random.default_rng(8)
        w = rng.integers(1, 100, n).astype(np.float64)
        t = pa.table({
            "doc_id": pa.array([f"x{i:04d}" for i in range(n)], pa.string()),
            "w": pa.array(w, pa.float64()),
        })
        ds = ray.data.from_arrow(t).repartition(5)
        a = weighted_sample(ds, k=50, weight_col="w").to_pandas()
        b = weighted_sample(ds, k=50, weight_col="w").to_pandas()
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
        u = np.array([
            int(hashlib.md5(f"x{i:04d}".encode()).hexdigest()[:8], 16)
            for i in range(n)
        ], dtype=np.float64)
        rank = -np.log((u + 1) / 2**32) / w
        rank = np.floor(np.abs(rank) * 1e6 + 0.5) / 1e6
        order = np.lexsort(
            (np.array([f"x{i:04d}" for i in range(n)]), rank)
        )[:50]
        assert a["doc_id"].tolist() == [f"x{i:04d}" for i in order]


class TestSimpleWindowRollup:
    def test_matches_pandas(self, ray_session):
        from json_time_series_extractor_ray.pipelines.diffstats import (
            simple_window_rollup,
        )

        rng = np.random.default_rng(9)
        n = 2000
        df = pd.DataFrame({
            "series_key": rng.choice(["a", "b", "c"], n),
            "ts_ns": rng.integers(0, 3 * _H, n),
            "value_num": rng.normal(10, 2, n).round(3),
        })
        got = simple_window_rollup(
            _samples(ray_session, df), window_ns=_H
        ).to_pandas().sort_values(["series_key", "window_ns"],
                                  ignore_index=True)
        df["w"] = df["ts_ns"] // _H * _H
        want = df.groupby(["series_key", "w"]).agg(
            n=("value_num", "size"), mn=("value_num", "min"),
            mx=("value_num", "max"), s=("value_num", "sum"),
        ).reset_index()
        assert got["n"].tolist() == want["n"].tolist()
        assert got["min"].tolist() == want["mn"].tolist()
        assert got["max"].tolist() == want["mx"].tolist()
        np.testing.assert_allclose(got["sum"], want["s"], atol=1e-6)


class TestWeightedSampleZeroWeights:
    def test_nonpositive_weights_excluded(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.split import (
            weighted_sample,
        )

        t = pa.table({
            "doc_id": pa.array([f"z{i:03d}" for i in range(30)], pa.string()),
            "w": pa.array([2.0] * 10 + [0.0] * 10 + [-1.0] * 10,
                          pa.float64()),
        })
        got = weighted_sample(ray.data.from_arrow(t), k=25,
                              weight_col="w").to_pandas()
        # only the 10 positive-weight rows are eligible (SQL WHERE w > 0)
        assert len(got) == 10
        assert (got["w"] > 0).all()


class TestTheilSen:
    def test_matches_bruteforce(self, ray_session):
        from json_time_series_extractor_ray.pipelines._util import (
            round_half_away,
        )
        from json_time_series_extractor_ray.pipelines.diffstats import (
            theil_sen_trend,
        )

        rng = np.random.default_rng(11)
        n = 4000
        ts = rng.integers(0, 24 * _H, n)
        df = pd.DataFrame({
            "series_key": rng.choice(["a", "b", "c"], n),
            "ts_ns": ts,
            "value_num": (rng.normal(0.5, 0.1, n)
                          + ts / (24 * _H)).round(3),
        })
        got = theil_sen_trend(
            _samples(ray_session, df), window_ns=_H
        ).to_pandas().sort_values("series_key", ignore_index=True)
        assert got["series_key"].tolist() == ["a", "b", "c"]
        for _, row in got.iterrows():
            s = df[df["series_key"] == row["series_key"]].copy()
            s["w"] = s["ts_ns"] // _H * _H
            m = s.groupby("w")["value_num"].agg(["sum", "size"])
            y = round_half_away(
                round_half_away(m["sum"].to_numpy(), 6)
                / m["size"].to_numpy(), 6)
            x = (m.index.to_numpy() - m.index.min()) / 3.6e12
            i, j = np.triu_indices(len(y), k=1)
            slope = round_half_away(
                np.float64(np.median((y[j] - y[i]) / (x[j] - x[i]))), 6)
            assert row["n_windows"] == len(y)
            assert row["theil_sen_slope"] == slope
            assert row["intercept_at_start"] == round_half_away(
                np.float64(np.median(y - slope * x)), 6)
            # the planted upward drift must be recovered (~1 unit / 24 h)
            assert 0.02 < row["theil_sen_slope"] < 0.07

    def test_window_bound_fails_loudly(self, ray_session):
        import pytest

        from json_time_series_extractor_ray.pipelines.diffstats import (
            theil_sen_trend,
        )

        df = pd.DataFrame({
            "series_key": ["hot"] * 40,
            "ts_ns": np.arange(40) * _H,
            "value_num": np.linspace(0, 1, 40),
        })
        with pytest.raises(ValueError, match="max_windows"):
            theil_sen_trend(_samples(ray_session, df), window_ns=_H,
                            max_windows=10).to_pandas()


class TestMase:
    def test_matches_bruteforce(self, ray_session):
        from json_time_series_extractor_ray.pipelines._util import (
            round_half_away,
        )
        from json_time_series_extractor_ray.pipelines.diffstats import (
            mase_seasonal,
        )

        rng = np.random.default_rng(21)
        n = 6000
        ts = rng.integers(0, 72 * _H, n)
        # strong daily cycle + noise: seasonal-naive should beat naive
        df = pd.DataFrame({
            "series_key": rng.choice(["a", "b"], n),
            "ts_ns": ts,
            "value_num": (np.sin(2 * np.pi * (ts % (24 * _H)) / (24 * _H))
                          + rng.normal(0, 0.05, n)).round(4),
        })
        got = mase_seasonal(
            _samples(ray_session, df), window_ns=_H
        ).to_pandas().sort_values("series_key", ignore_index=True)
        assert got["series_key"].tolist() == ["a", "b"]
        for _, row in got.iterrows():
            s = df[df["series_key"] == row["series_key"]].copy()
            s["w"] = s["ts_ns"] // _H * _H
            m = s.groupby("w")["value_num"].agg(["sum", "size"])
            y = round_half_away(
                round_half_away(m["sum"].to_numpy(), 6)
                / m["size"].to_numpy(), 6)
            w = m.index.to_numpy(np.int64)
            lut = dict(zip(w, y))
            for lag, n_col, mae_col in [(_H, "n_naive", "mae_naive"),
                                        (24 * _H, "n_snaive",
                                         "mae_snaive")]:
                diffs = [abs(lut[t] - lut[t - lag]) for t in w
                         if t - lag in lut]
                assert row[n_col] == len(diffs)
                assert row[mae_col] == round_half_away(
                    np.float64(round_half_away(np.float64(sum(diffs)), 6)
                               / len(diffs)), 6)
            # daily seasonality planted -> MASE well under 1
            assert row["mase"] < 0.7
