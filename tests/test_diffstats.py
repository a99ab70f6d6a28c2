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
