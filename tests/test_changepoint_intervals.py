"""CUSUM changepoint alarms + interval-union coverage."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from json_time_series_extractor_ray.pipelines.symbolic import cusum_alarms
from json_time_series_extractor_ray.pipelines.windows import interval_coverage

HOUR = 3_600_000_000_000
MIN_NS = 60 * 10**9


def _rollup(rows):
    return ray.data.from_arrow(pa.table({
        "tier": pa.array(["1h"] * len(rows), pa.string()),
        "series_key": pa.array([r[0] for r in rows], pa.string()),
        "window_start": pa.array([r[1] * HOUR for r in rows],
                                 pa.timestamp("ns")),
        "sum": pa.array([float(r[2]) for r in rows], pa.float64()),
        "count": pa.array([r[3] for r in rows], pa.int64()),
    }))


def _cusum_brute(means, k):
    """Textbook recursion — the identity the operator evaluates must
    match it exactly in exact arithmetic, and to rounding in floats."""
    s, out = 0.0, []
    mu, sd = np.mean(means), np.std(means, ddof=1)
    for m in means:
        z = (m - mu) / sd
        s = max(0.0, s + (z - k))
        out.append(s)
    return out


class TestCusum:
    def test_level_shift_alarms(self):
        # 20 windows at ~0, then 10 windows at +3 sigma: the shifted tail
        # accumulates and must alarm; the stable head must not.
        means = [0.0, 1.0] * 10 + [8.0] * 10
        ds = _rollup([("s", i, m, 1) for i, m in enumerate(means)])
        out = cusum_alarms(ds).to_pandas().sort_values(
            "window_ns", ignore_index=True)
        assert len(out) == 30
        assert not out["is_alarm"].iloc[:20].any()
        assert out["is_alarm"].iloc[-5:].all()
        # identity vs textbook recursion
        brute = _cusum_brute(np.array(means), 0.5)
        assert np.allclose(out["cusum"].to_numpy(), brute, atol=1e-5)

    def test_monotone_nonnegative(self):
        means = list(np.sin(np.arange(40)) * 10)
        ds = _rollup([("s", i, m, 1) for i, m in enumerate(means)])
        out = cusum_alarms(ds).to_pandas()
        assert (out["cusum"].to_numpy() >= 0).all()

    def test_degenerate_series_skipped(self):
        ds = _rollup([("flat", i, 5.0, 1) for i in range(3)]
                     + [("single", 0, 1.0, 1)])
        assert len(cusum_alarms(ds).to_pandas()) == 0


def _events(rows):
    return ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * MIN_NS for r in rows], pa.timestamp("ns")),
    }))


class TestIntervalCoverage:
    def test_hand_computed(self):
        # user 1: events at 0, 3, 20 min with 5-min intervals ->
        # [0,8) and [20,25): 2 islands, 13 min covered, 3 events.
        # user 2: single event -> 1 island, 5 min.
        ds = _events([(1, 0), (1, 3), (1, 20), (2, 100)])
        out = interval_coverage(ds).to_pandas().set_index("user_id")
        assert out.loc[1, "n_events"] == 3
        assert out.loc[1, "n_islands"] == 2
        assert out.loc[1, "covered_ns"] == 13 * MIN_NS
        assert out.loc[2, "n_islands"] == 1
        assert out.loc[2, "covered_ns"] == 5 * MIN_NS

    def test_touching_intervals_merge(self):
        # end == next start (half-open): one island, 10 min.
        ds = _events([(1, 0), (1, 5)])
        out = interval_coverage(ds).to_pandas()
        assert out["n_islands"].iloc[0] == 1
        assert out["covered_ns"].iloc[0] == 10 * MIN_NS

    def test_duplicate_timestamps(self):
        ds = _events([(1, 0), (1, 0), (1, 0)])
        out = interval_coverage(ds).to_pandas()
        assert out["n_events"].iloc[0] == 3
        assert out["n_islands"].iloc[0] == 1
        assert out["covered_ns"].iloc[0] == 5 * MIN_NS

    def test_matches_brute_union(self):
        rng = np.random.RandomState(7)
        ts = sorted(rng.randint(0, 500, size=60).tolist())
        ds = _events([(1, t) for t in ts])
        out = interval_coverage(ds).to_pandas()
        # brute union over a minute grid
        covered = set()
        for t in ts:
            covered.update(range(t, t + 5))
        assert out["covered_ns"].iloc[0] == len(covered) * MIN_NS


from json_time_series_extractor_ray.pipelines.windows import (  # noqa: E402
    sequence_trigrams,
)


class TestSequenceTrigrams:
    def _events(self, rows):
        return ray.data.from_arrow(pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * MIN_NS for r in rows],
                           pa.timestamp("ns")),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "event_id": pa.array(list(range(len(rows))), pa.int64()),
        }))

    def test_no_trigram_crosses_members(self):
        # user 1: a,b | user 2: c,d -> zero trigrams even though the
        # interleaved stream has 4 consecutive rows
        ds = self._events([(1, 0, "a"), (1, 1, "b"),
                           (2, 2, "c"), (2, 3, "d")])
        assert len(sequence_trigrams(
            ds, member="user_id", ts="ts", state_col="event_type",
            order_col="event_id").to_pandas()) == 0

    def test_counts_and_ordering(self):
        # user 1: a,b,a,b,a -> trigrams (a,b,a) x2, (b,a,b) x1
        rows = [(1, i, t) for i, t in enumerate("ababa")]
        out = sequence_trigrams(
            self._events(rows), member="user_id", ts="ts",
            state_col="event_type", order_col="event_id").to_pandas()
        out = out.set_index(["t1", "t2", "t3"])
        assert out.loc[("a", "b", "a"), "n"] == 2
        assert out.loc[("b", "a", "b"), "n"] == 1


from json_time_series_extractor_ray.pipelines.enrich import (  # noqa: E402
    user_type_entropy,
)


class TestUserTypeEntropy:
    def _events(self, rows):
        return ray.data.from_arrow(pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
        }))

    def test_hand_computed(self):
        # user 1: uniform over 2 types -> 1 bit; user 2: single type -> 0
        ds = self._events([(1, "a"), (1, "b"), (2, "a"), (2, "a")])
        out = user_type_entropy(ds).to_pandas().set_index("user_id")
        assert out.loc[1, "type_entropy"] == 1.0
        assert out.loc[1, "n_types"] == 2
        assert out.loc[2, "type_entropy"] == 0.0
        assert out.loc[2, "n_events"] == 2

    def test_null_rows_dropped(self):
        ds = ray.data.from_arrow(pa.table({
            "user_id": pa.array([1, 1, None], pa.int64()),
            "event_type": pa.array(["a", None, "b"], pa.string()),
        }))
        out = user_type_entropy(ds).to_pandas()
        assert len(out) == 1
        assert out["n_events"].iloc[0] == 1
