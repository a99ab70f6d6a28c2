"""SAX symbolization, count-burst detection, per-source report."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from json_time_series_extractor_ray.pipelines.symbolic import (
    count_bursts,
    sax_symbols,
)
from json_time_series_extractor_ray.pipelines.textstats import source_report

HOUR = 3_600_000_000_000


def _rollup(rows):
    """(series, window_idx, sum, count) -> tier-row table."""
    return ray.data.from_arrow(pa.table({
        "tier": pa.array(["1h"] * len(rows), pa.string()),
        "series_key": pa.array([r[0] for r in rows], pa.string()),
        "window_start": pa.array([r[1] * HOUR for r in rows],
                                 pa.timestamp("ns")),
        "sum": pa.array([float(r[2]) for r in rows], pa.float64()),
        "count": pa.array([r[3] for r in rows], pa.int64()),
    }))


class TestSax:
    def test_symbols_follow_breakpoints(self):
        # means 0,10,20,30 -> z ~ -1.16, -0.39, +0.39, +1.16 -> a, b, c, d
        ds = _rollup([("s", i, 10.0 * i, 1) for i in range(4)])
        out = sax_symbols(ds).to_pandas().sort_values(
            "window_ns", ignore_index=True)
        assert out["symbol"].tolist() == ["a", "b", "c", "d"]
        assert np.allclose(out["paa_mean"], [0, 10, 20, 30])
        assert np.allclose(out["z"], -out["z"].iloc[::-1])  # symmetric

    def test_constant_series_skipped(self):
        ds = _rollup([("flat", i, 5.0, 1) for i in range(3)]
                     + [("single", 0, 1.0, 1)])
        out = sax_symbols(ds).to_pandas()
        assert len(out) == 0  # zero variance and <2 windows both skipped


class TestCountBursts:
    def test_burst_flagged(self):
        # counts 10,10,10,50: mean=20, 3*sqrt(20)=13.4 -> only 50 bursts
        rows = [("s", i, 0.0, c) for i, c in enumerate([10, 10, 10, 50])]
        out = count_bursts(_rollup(rows)).to_pandas().sort_values(
            "window_ns", ignore_index=True)
        assert out["is_burst"].tolist() == [False, False, False, True]
        assert (out["mean_n"] == 20.0).all()
        assert out["n"].tolist() == [10, 10, 10, 50]


class TestSourceReport:
    def test_hand_computed(self):
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a bb", "ccc dd e", "f"], pa.string()),
            "source": pa.array(["x", "x", "y"], pa.string()),
        }))
        out = source_report(ds).to_pandas().set_index("source")
        assert out.loc["x", "n_docs"] == 2
        assert out.loc["x", "total_words"] == 5
        assert out.loc["x", "total_chars"] == 4 + 8
        assert out.loc["x", "mean_words"] == 2.5
        assert out.loc["y", "n_docs"] == 1
        assert out.loc["y", "mean_chars"] == 1.0


class TestGapReportResiduals:
    def test_gap_report_hand_computed(self):
        from json_time_series_extractor_ray.pipelines.snapshot import (
            HOUR_NS,
            gap_report,
        )

        base = np.datetime64("2024-01-01T00:00:00", "ns")
        m = np.timedelta64(60_000_000_000, "ns")
        # series s: samples at 0m, 1m, then a 3h gap, then 181m
        ts = [base, base + 1 * m, base + 181 * m]
        ds = ray.data.from_arrow(pa.table({
            "series_key": pa.array(["s"] * 3, pa.string()),
            "ts": pa.array(ts, pa.timestamp("ns")),
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "sample_ordinal": pa.array([0, 0, 0], pa.int64()),
        }))
        out = gap_report(ds).to_pandas()
        assert len(out) == 1
        r = out.iloc[0]
        assert r["n_samples"] == 3
        assert r["span_ns"] == 181 * 60_000_000_000
        assert r["max_gap_ns"] == 180 * 60_000_000_000
        assert r["n_gaps_over"] == 1  # only the 3h gap exceeds 1h

    def test_residuals_remove_constant_profile(self):
        from json_time_series_extractor_ray.pipelines.analytics import (
            seasonal_residuals,
        )

        base = np.datetime64("2024-01-01T00:00:00", "ns")
        h = np.timedelta64(3_600_000_000_000, "ns")
        # same value at the same hour across two days -> resid 0
        tbl = pa.table({
            "series_key": pa.array(["s"] * 4, pa.string()),
            "ts": pa.array([base, base + 24 * h, base + h, base + 25 * h],
                           pa.timestamp("ns")),
            "value_num": pa.array([5.0, 5.0, 7.0, 9.0], pa.float64()),
            "value_kind": pa.array([1] * 4, pa.int32()),
            "doc_id": pa.array(range(4), pa.int64()),
            "sample_ordinal": pa.array([0] * 4, pa.int64()),
        })
        out = seasonal_residuals(lambda: ray.data.from_arrow(tbl)) \
            .to_pandas().sort_values("ts_ns", ignore_index=True)
        # hour 0 profile mean = 5 -> resid 0, 0; hour 1 mean = 8 -> -1, +1
        assert out["resid"].tolist() == [0.0, -1.0, 0.0, 1.0]
