"""Unit tests for the snapshot operators (last_value, change_suppress,
window_top_series) — edge cases the oracle queries can't plant:
cross-block last-value tie-breaks, epsilon deadbands, rank ties, and
string-valued series."""

from __future__ import annotations

import pyarrow as pa

from json_time_series_extractor_ray.pipelines.snapshot import (
    change_suppress,
    last_value,
    window_top_series,
)


def _samples_table(rows):
    """rows: list of (series_key, ts_ns, value_num, value_str, doc_id,
    ordinal)."""
    ks, ts, vn, vs, ds_, os_ = zip(*rows)
    return pa.table({
        "series_key": pa.array(ks, pa.string()),
        "ts": pa.array(list(ts), pa.int64()).cast(pa.timestamp("ns")),
        "value_num": pa.array(list(vn), pa.float64()),
        "value_str": pa.array(list(vs), pa.string()),
        "value_kind": pa.array(
            [1 if v is not None else 2 for v in vn], pa.int32()),
        "doc_id": pa.array(ds_, pa.string()),
        "sample_ordinal": pa.array(list(os_), pa.int64()),
    })


class TestLastValue:
    def test_cross_block_tiebreak_and_strings(self, ray_session):
        import ray

        # Same max ts in both blocks: doc_id breaks the tie; the winner
        # lives in the FIRST block, so the final merge (not block order)
        # must resolve it.  's2' is string-valued.
        a = _samples_table([
            ("s1", 100, 1.0, None, "evt-09", 0),
            ("s2", 50, None, "on", "evt-01", 1),
        ])
        b = _samples_table([
            ("s1", 100, 2.0, None, "evt-03", 0),
            ("s2", 40, None, "off", "evt-02", 1),
        ])
        ds = ray.data.from_arrow([a, b])
        out = last_value(ds).to_pandas().set_index("series_key")
        assert out.loc["s1", "value_num"] == 1.0  # evt-09 > evt-03
        assert out.loc["s2", "value_str"] == "on"
        assert out.loc["s2", "ts_ns"] == 50

    def test_ordinal_breaks_final_tie(self, ray_session):
        import ray

        t = _samples_table([
            ("s", 7, 1.0, None, "evt-01", 2),
            ("s", 7, 9.0, None, "evt-01", 5),
        ])
        out = last_value(ray.data.from_arrow(t)).to_pandas()
        assert out["value_num"].tolist() == [9.0]


class TestChangeSuppress:
    def test_epsilon_deadband(self, ray_session):
        import ray

        t = _samples_table([
            ("s", 1, 10.0, None, "d1", 0),
            ("s", 2, 10.3, None, "d2", 0),   # |Δ|=0.3 <= 0.5 -> dropped
            ("s", 3, 11.0, None, "d3", 0),   # vs 10.3 (adjacent), Δ=0.7
            ("s", 4, 11.0, None, "d4", 0),   # exact repeat -> dropped
        ])
        out = change_suppress(
            ray.data.from_arrow(t), epsilon=0.5
        ).to_pandas().sort_values("ts_ns")
        assert out["ts_ns"].tolist() == [1, 3]

    def test_first_of_each_series_kept(self, ray_session):
        import ray

        t = _samples_table([
            ("a", 1, 5.0, None, "d1", 0),
            ("b", 1, 5.0, None, "d1", 1),
        ])
        out = change_suppress(ray.data.from_arrow(t)).to_pandas()
        assert len(out) == 2


class TestWindowTopSeries:
    def test_rank_tie_breaks_on_series_key(self, ray_session):
        import ray

        # Window 0: a and b tie on mean 5.0 -> a ranks 1 by key order.
        t = _samples_table([
            ("b", 10, 5.0, None, "d1", 0),
            ("a", 20, 5.0, None, "d2", 0),
            ("c", 30, 1.0, None, "d3", 0),
        ])
        out = window_top_series(
            ray.data.from_arrow(t), window_ns=1000, k=2
        ).to_pandas().sort_values("rank")
        assert out["series_key"].tolist() == ["a", "b"]
        assert out["rank"].tolist() == [1, 2]
