"""As-of join operator semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa

from json_time_series_extractor_ray.pipelines.asof import asof_join


def _run(left, right, ray):
    l = ray.data.from_arrow(left)
    r = ray.data.from_arrow(right)
    out = asof_join(
        l, r, by="__key", left_ts="ts", right_ts="rts",
        left_cols={"lval": pa.int64()}, right_cols={"rval": pa.int64()},
    ).to_pandas()
    return out.sort_values(["__by", "__ts"], ignore_index=True)


def test_asof_basic_backward_match(ray_session):
    import ray

    left = pa.table({
        "__key": ["a", "a", "a"],
        "ts": pa.array([5, 15, 25], pa.int64()),
        "lval": pa.array([1, 2, 3], pa.int64()),
    })
    right = pa.table({
        "__key": ["a", "a"],
        "rts": pa.array([10, 20], pa.int64()),
        "rval": pa.array([100, 200], pa.int64()),
    })
    out = _run(left, right, ray)
    # ts=5 has no right row <= it -> dropped (inner); 15->100, 25->200
    assert out["lval"].tolist() == [2, 3]
    assert out["rval"].tolist() == [100, 200]


def test_asof_exact_timestamp_matches(ray_session):
    import ray

    left = pa.table({
        "__key": ["k"], "ts": pa.array([10], pa.int64()),
        "lval": pa.array([1], pa.int64()),
    })
    right = pa.table({
        "__key": ["k"], "rts": pa.array([10], pa.int64()),
        "rval": pa.array([7], pa.int64()),
    })
    out = _run(left, right, ray)
    assert out["rval"].tolist() == [7]  # <= is inclusive


def test_asof_key_isolation_and_tie_break(ray_session):
    import ray

    left = pa.table({
        "__key": ["a", "b"], "ts": pa.array([50, 50], pa.int64()),
        "lval": pa.array([1, 2], pa.int64()),
    })
    right = pa.table({
        # key a: two rows at the same ts -> deterministic pick = max rval
        "__key": ["a", "a", "c"],
        "rts": pa.array([40, 40, 10], pa.int64()),
        "rval": pa.array([5, 9, 3], pa.int64()),
    })
    out = _run(left, right, ray)
    assert len(out) == 1  # key b has no right rows -> dropped
    assert out["__by"].tolist() == ["a"]
    assert out["rval"].tolist() == [9]


class TestRangeJoin:
    def test_multi_match_and_unmatched(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.rangejoin import range_join

        left = ray.data.from_arrow(pa.table({
            "k": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array([100, 250, 900, 50], pa.int64()).cast(pa.timestamp("ns")),
            "event_id": pa.array([10, 11, 12, 13], pa.int64()),
        }))
        # Overlapping intervals for k=1: ts=250 falls in BOTH; ts=900 in
        # neither (drops); k=2 has no intervals at all.
        right = ray.data.from_arrow(pa.table({
            "k": pa.array([1, 1], pa.int64()),
            "start_ns": pa.array([0, 200], pa.int64()),
            "end_ns": pa.array([300, 400], pa.int64()),
            "iv": pa.array([7, 8], pa.int64()),
        }))
        out = range_join(
            left, right, by="k", left_ts="ts",
            right_start="start_ns", right_end="end_ns",
            left_cols={"event_id": pa.int64()}, right_cols={"iv": pa.int64()},
        ).to_pandas().sort_values(["event_id", "iv"], ignore_index=True)
        got = list(zip(out["event_id"], out["iv"]))
        assert got == [(10, 7), (11, 7), (11, 8)]
        assert out["event_id"].dtype == "int64" and out["iv"].dtype == "int64"

    def test_inclusive_bounds(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.rangejoin import range_join

        left = ray.data.from_arrow(pa.table({
            "k": pa.array([1, 1], pa.int64()),
            "ts": pa.array([100, 200], pa.int64()).cast(pa.timestamp("ns")),
            "event_id": pa.array([1, 2], pa.int64()),
        }))
        right = ray.data.from_arrow(pa.table({
            "k": pa.array([1], pa.int64()),
            "start_ns": pa.array([100], pa.int64()),
            "end_ns": pa.array([200], pa.int64()),
            "iv": pa.array([9], pa.int64()),
        }))
        out = range_join(
            left, right, by="k", left_ts="ts",
            right_start="start_ns", right_end="end_ns",
            left_cols={"event_id": pa.int64()}, right_cols={"iv": pa.int64()},
        ).to_pandas()
        # BETWEEN semantics: both boundary timestamps match.
        assert sorted(out["event_id"]) == [1, 2]

    def test_matches_bruteforce_on_random_data(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.rangejoin import range_join

        rng = np.random.default_rng(99)
        n_l, n_r = 300, 60
        l_keys = rng.integers(0, 8, n_l)
        l_ts = rng.integers(0, 10_000, n_l)
        r_keys = rng.integers(0, 8, n_r)
        r_start = rng.integers(0, 9_000, n_r)
        r_end = r_start + rng.integers(0, 2_000, n_r)

        left = ray.data.from_arrow(pa.table({
            "k": pa.array(l_keys, pa.int64()),
            "ts": pa.array(l_ts, pa.int64()).cast(pa.timestamp("ns")),
            "event_id": pa.array(np.arange(n_l), pa.int64()),
        }))
        right = ray.data.from_arrow(pa.table({
            "k": pa.array(r_keys, pa.int64()),
            "start_ns": pa.array(r_start, pa.int64()),
            "end_ns": pa.array(r_end, pa.int64()),
            "iv": pa.array(np.arange(n_r), pa.int64()),
        }))
        out = range_join(
            left, right, by="k", left_ts="ts",
            right_start="start_ns", right_end="end_ns",
            left_cols={"event_id": pa.int64()}, right_cols={"iv": pa.int64()},
        ).to_pandas()
        got = set(zip(out["event_id"], out["iv"]))
        expect = {
            (e, i)
            for e in range(n_l)
            for i in range(n_r)
            if l_keys[e] == r_keys[i] and r_start[i] <= l_ts[e] <= r_end[i]
        }
        assert got == expect


class TestBucketedAsof:
    """Time-bucketed co-partition (hot-key-safe mode) must be
    value-identical to the unbucketed join."""

    def _both(self, left, right, ray, bucket_ns):
        kw = dict(by="__key", left_ts="ts", right_ts="rts",
                  left_cols={"lval": pa.int64()},
                  right_cols={"rval": pa.int64()})
        l, r = ray.data.from_arrow(left), ray.data.from_arrow(right)
        base = asof_join(l, r, **kw).to_pandas()
        bucketed = asof_join(l, r, bucket_ns=bucket_ns, **kw).to_pandas()
        cols = ["__by", "__ts", "lval", "rval"]

        def _canon(df):
            if df.empty:  # empty Dataset -> to_pandas loses the schema
                return pd.DataFrame(columns=cols)
            return df[cols].sort_values(cols, ignore_index=True)

        return _canon(base), _canon(bucketed)

    def test_planted_hot_key_with_bucket_gaps(self, ray_session):
        import ray

        rng = np.random.default_rng(11)
        # hot key 'h': 2000 left rows over 100 buckets (bucket_ns=100);
        # right rows only in a few early buckets -> most buckets rely on
        # carry-over.  Cold keys mix in, some with no right rows at all.
        l_keys, l_ts, l_val = [], [], []
        r_keys, r_ts, r_val = [], [], []
        l_keys += ["h"] * 2000
        l_ts += rng.integers(0, 10_000, size=2000).tolist()
        l_val += list(range(2000))
        r_keys += ["h"] * 5
        r_ts += [3, 250, 251, 251, 990]       # duplicate ts -> dedup rule
        r_val += [30, 40, 41, 42, 50]
        for k in ("c1", "c2", "norights"):
            l_keys += [k] * 50
            l_ts += rng.integers(0, 10_000, size=50).tolist()
            l_val += list(range(50))
            if k != "norights":
                r_keys += [k] * 2
                r_ts += [100, 5000]
                r_val += [1, 2]
        left = pa.table({"__key": l_keys, "ts": pa.array(l_ts, pa.int64()),
                         "lval": pa.array(l_val, pa.int64())})
        right = pa.table({"__key": r_keys, "rts": pa.array(r_ts, pa.int64()),
                          "rval": pa.array(r_val, pa.int64())})
        base, bucketed = self._both(left, right, ray, bucket_ns=100)
        pd.testing.assert_frame_equal(base, bucketed)
        assert len(base) > 0

    def test_empty_right_side(self, ray_session):
        import ray

        left = pa.table({"__key": ["a"], "ts": pa.array([5], pa.int64()),
                         "lval": pa.array([1], pa.int64())})
        right = pa.table({"__key": pa.array([], pa.string()),
                          "rts": pa.array([], pa.int64()),
                          "rval": pa.array([], pa.int64())})
        base, bucketed = self._both(left, right, ray, bucket_ns=10)
        assert len(base) == 0 and len(bucketed) == 0


class TestBucketedRangeJoin:
    """Bucketed range join (intervals replicated to overlapped buckets)
    must be value-identical to the unbucketed join."""

    def test_planted_hot_key_spanning_intervals(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.rangejoin import (
            range_join,
        )

        rng = np.random.default_rng(13)
        n_l = 1200
        l_keys = rng.choice(["h", "h", "h", "c1", "c2"], size=n_l).tolist()
        l_ts = rng.integers(0, 10_000, size=n_l)
        # intervals: some within one bucket, some spanning many, one empty
        r_keys = ["h"] * 6 + ["c1"] * 2
        r_start = [0, 150, 950, 400, 8_000, 500, 100, 9_000]
        r_end = [120, 3_000, 1_050, 380, 9_999, 500, 5_000, 9_500]
        kw = dict(by="k", left_ts="ts", right_start="start_ns",
                  right_end="end_ns",
                  left_cols={"event_id": pa.int64()},
                  right_cols={"iv": pa.int64()})
        left = ray.data.from_arrow(pa.table({
            "k": l_keys, "ts": pa.array(l_ts, pa.int64()),
            "event_id": pa.array(np.arange(n_l), pa.int64()),
        }))
        right = ray.data.from_arrow(pa.table({
            "k": r_keys, "start_ns": pa.array(r_start, pa.int64()),
            "end_ns": pa.array(r_end, pa.int64()),
            "iv": pa.array(np.arange(len(r_keys)), pa.int64()),
        }))
        base = range_join(left, right, **kw).to_pandas()
        bucketed = range_join(left, right, bucket_ns=100, **kw).to_pandas()
        key = ["event_id", "iv"]
        b = set(map(tuple, base[key].to_numpy()))
        bb = set(map(tuple, bucketed[key].to_numpy()))
        assert b == bb and len(b) > 0
        # each (row, interval) pair appears exactly once in both
        assert len(base) == len(b) and len(bucketed) == len(bb)


class TestForwardAsof:
    def test_forward_matches_next_right_row(self, ray_session):
        import ray

        left = pa.table({
            "__key": ["a", "a", "a"],
            "ts": pa.array([5, 10, 50], pa.int64()),
            "lval": pa.array([1, 2, 3], pa.int64()),
        })
        right = pa.table({
            "__key": ["a", "a"],
            "rts": pa.array([7, 20], pa.int64()),
            "rval": pa.array([70, 200], pa.int64()),
        })
        out = asof_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            by="__key", left_ts="ts", right_ts="rts",
            left_cols={"lval": pa.int64()}, right_cols={"rval": pa.int64()},
            direction="forward",
        ).to_pandas().sort_values("__ts", ignore_index=True)
        # 5 -> 70 (earliest >= 5), 10 -> 200, 50 -> unmatched (dropped)
        assert out["lval"].tolist() == [1, 2]
        assert out["rval"].tolist() == [70, 200]

    def test_forward_exact_ts_matches_itself(self, ray_session):
        import ray

        left = pa.table({
            "__key": ["k"], "ts": pa.array([20], pa.int64()),
            "lval": pa.array([1], pa.int64()),
        })
        right = pa.table({
            "__key": ["k"], "rts": pa.array([20], pa.int64()),
            "rval": pa.array([9], pa.int64()),
        })
        out = asof_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            by="__key", left_ts="ts", right_ts="rts",
            left_cols={"lval": pa.int64()}, right_cols={"rval": pa.int64()},
            direction="forward",
        ).to_pandas()
        assert out["rval"].tolist() == [9]


class TestForwardBucketedAsof:
    def _join(self, ray, left, right, **kw):
        return asof_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            by="__key", left_ts="ts", right_ts="rts",
            left_cols={"lval": pa.int64()}, right_cols={"rval": pa.int64()},
            direction="forward", **kw,
        ).to_pandas().sort_values(["__by", "__ts", "lval"],
                                  ignore_index=True)

    def test_bucketed_equals_unbucketed_random(self, ray_session):
        import ray

        rng = np.random.default_rng(12)
        n_l, n_r = 400, 150
        left = pa.table({
            "__key": pa.array(rng.choice(["a", "b", "hot"], n_l,
                                         p=[.2, .2, .6])),
            "ts": pa.array(rng.integers(0, 1000, n_l), pa.int64()),
            "lval": pa.array(np.arange(n_l), pa.int64()),
        })
        right = pa.table({
            "__key": pa.array(rng.choice(["a", "b", "hot"], n_r)),
            "rts": pa.array(rng.integers(0, 1000, n_r), pa.int64()),
            "rval": pa.array(np.arange(n_r), pa.int64()),
        })
        plain = self._join(ray, left, right)
        bucketed = self._join(ray, left, right, bucket_ns=100)
        pd.testing.assert_frame_equal(plain, bucketed)

    def test_carry_spans_empty_buckets(self, ray_session):
        import ray

        left = pa.table({
            "__key": ["k"], "ts": pa.array([5], pa.int64()),
            "lval": pa.array([1], pa.int64()),
        })
        right = pa.table({
            "__key": ["k"], "rts": pa.array([950], pa.int64()),
            "rval": pa.array([9], pa.int64()),
        })
        out = self._join(ray, left, right, bucket_ns=10)  # 94 empty buckets
        assert out["rval"].tolist() == [9]


class TestTolerance:
    def _tables(self):
        left = pa.table({
            "__key": ["a", "a", "a", "b"],
            "ts": pa.array([5, 15, 100, 50], pa.int64()),
            "lval": pa.array([1, 2, 3, 4], pa.int64()),
        })
        right = pa.table({
            "__key": ["a", "a", "b"],
            "rts": pa.array([10, 20, 10], pa.int64()),
            "rval": pa.array([100, 200, 300], pa.int64()),
        })
        return left, right

    def test_backward_tolerance_drops_far_matches(self, ray_session):
        import ray

        left, right = self._tables()
        out = asof_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            by="__key", left_ts="ts", right_ts="rts",
            left_cols={"lval": pa.int64()}, right_cols={"rval": pa.int64()},
            tolerance_ns=10,
        ).to_pandas().sort_values(["__by", "__ts"], ignore_index=True)
        # ts=15 -> rts=10 (gap 5, keeps); ts=100 -> rts=20 (gap 80, drops);
        # b's ts=50 -> rts=10 (gap 40, drops); ts=5 unmatched as before
        assert out["lval"].tolist() == [2]
        assert out["rval"].tolist() == [100]

    def test_forward_tolerance(self, ray_session):
        import ray

        left, right = self._tables()
        out = asof_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            by="__key", left_ts="ts", right_ts="rts",
            left_cols={"lval": pa.int64()}, right_cols={"rval": pa.int64()},
            direction="forward", tolerance_ns=5,
        ).to_pandas().sort_values(["__by", "__ts"], ignore_index=True)
        # forward picks: ts=5 -> rts=10 (gap 5 keeps); ts=15 -> rts=20
        # (gap 5 keeps); ts=100 -> none; b ts=50 -> none
        assert out["lval"].tolist() == [1, 2]
        assert out["rval"].tolist() == [100, 200]

    def test_bucketed_equals_unbucketed_with_tolerance(self, ray_session):
        import ray

        rng = np.random.default_rng(3)
        n_l, n_r = 400, 120
        left = pa.table({
            "__key": pa.array(rng.integers(0, 5, n_l).astype(str)),
            "ts": pa.array(rng.integers(0, 10_000, n_l), pa.int64()),
            "lval": pa.array(np.arange(n_l), pa.int64()),
        })
        right = pa.table({
            "__key": pa.array(rng.integers(0, 5, n_r).astype(str)),
            "rts": pa.array(rng.integers(0, 10_000, n_r), pa.int64()),
            "rval": pa.array(np.arange(n_r), pa.int64()),
        })
        kw = dict(by="__key", left_ts="ts", right_ts="rts",
                  left_cols={"lval": pa.int64()},
                  right_cols={"rval": pa.int64()}, tolerance_ns=500)
        flat = asof_join(ray.data.from_arrow(left),
                         ray.data.from_arrow(right), **kw).to_pandas()
        buck = asof_join(ray.data.from_arrow(left),
                         ray.data.from_arrow(right), bucket_ns=1000,
                         **kw).to_pandas()
        key = ["__by", "__ts", "lval", "rval"]
        pd.testing.assert_frame_equal(
            flat.sort_values(key, ignore_index=True)[key],
            buck.sort_values(key, ignore_index=True)[key],
        )


class TestNearestAsof:
    def test_matches_bruteforce_with_ties(self, ray_session):
        """direction='nearest' must pick min |delta| with exact ties
        going to the backward (earlier) candidate — verified against a
        brute-force scan on random data with planted exact ties."""
        import ray

        rng = np.random.default_rng(11)
        n_l, n_r = 300, 120
        keys = np.array(["a", "b", "c"])
        lk = keys[rng.integers(0, 3, n_l)]
        lts = rng.integers(0, 10_000, n_l)
        rk = keys[rng.integers(0, 3, n_r)]
        rts = rng.integers(0, 10_000, n_r)
        # planted exact tie: left at 5000 with right rows at 4990/5010
        lk[0], lts[0] = "a", 5000
        rk[0], rts[0] = "a", 4990
        rk[1], rts[1] = "a", 5010
        left = pa.table({
            "__key": pa.array(lk), "ts": pa.array(lts, pa.int64()),
            "lid": pa.array(np.arange(n_l), pa.int64()),
        })
        right = pa.table({
            "__key": pa.array(rk), "rts": pa.array(rts, pa.int64()),
            "rval": pa.array(np.arange(n_r) + 1000, pa.int64()),
        })
        out = asof_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            by="__key", left_ts="ts", right_ts="rts",
            left_cols={"lid": pa.int64()},
            right_cols={"rval": pa.int64()},
            direction="nearest",
        ).to_pandas().sort_values("lid", ignore_index=True)

        # brute force with the engine's dedup rule (per (key, ts) keep
        # max rval) and tie -> backward
        rdf = pd.DataFrame({"k": rk, "ts": rts, "rval": right["rval"]})
        rdf = rdf.sort_values(["k", "ts", "rval"]).drop_duplicates(
            ["k", "ts"], keep="last")
        exp = {}
        for i in range(n_l):
            cand = rdf[rdf["k"] == lk[i]]
            if cand.empty:
                continue
            d = np.abs(cand["ts"].to_numpy() - int(lts[i]))
            best = d.min()
            tied = cand[d == best]
            # tie -> smaller ts (backward)
            exp[i] = int(tied.sort_values("ts").iloc[0]["rval"])
        got = dict(zip(out["lid"], out["rval"]))
        assert got == exp
        # the planted tie resolved backward
        tie_val = got[0]
        assert tie_val == int(rdf[(rdf["k"] == "a")
                                  & (rdf["ts"] == 4990)]["rval"].iloc[0])

    def test_nearest_rejects_bucketing(self, ray_session):
        import pytest
        import ray

        t = pa.table({"__key": ["a"], "ts": pa.array([1], pa.int64()),
                      "v": pa.array([1], pa.int64())})
        with pytest.raises(ValueError, match="nearest"):
            asof_join(ray.data.from_arrow(t), ray.data.from_arrow(t),
                      by="__key", left_ts="ts", right_ts="ts",
                      left_cols={"v": pa.int64()},
                      right_cols={"v": pa.int64()},
                      direction="nearest", bucket_ns=100)


class TestRangeJoinNsBoundary:
    def test_interval_end_equality_exact_at_ns_scale(self, ray_session):
        """An event exactly AT a session end must match even when the
        epoch-ns values exceed 2^53 (regression: a null left __end
        float64-decayed the column and rounded interval bounds off the
        vectorized merge's exact integer ranks)."""
        import numpy as np
        import pyarrow as pa
        import ray

        from json_time_series_extractor_ray.pipelines.rangejoin import (
            range_join,
        )

        base = 1_704_000_000_000_000_001  # > 2^53, odd (rounds in f64)
        left = pa.table({
            "k": pa.array([1, 1, 1], pa.int64()),
            "ts": pa.array([base, base + 2, base + 4], pa.int64()),
            "lid": pa.array([0, 1, 2], pa.int64()),
        })
        right = pa.table({
            "k": pa.array([1], pa.int64()),
            "s": pa.array([base], pa.int64()),
            "e": pa.array([base + 2], pa.int64()),  # end == second event ts
            "rid": pa.array([7], pa.int64()),
        })
        for bucket_ns in (None, 10):
            out = range_join(
                ray.data.from_arrow(left), ray.data.from_arrow(right),
                by="k", left_ts="ts", right_start="s", right_end="e",
                left_cols={"lid": pa.int64()},
                right_cols={"rid": pa.int64()},
                bucket_ns=bucket_ns,
            ).to_pandas()
            assert sorted(out["lid"].astype(int)) == [0, 1], bucket_ns


class TestAsofBigIntCarry:
    def test_carried_ints_above_2_53_stay_exact(self, ray_session):
        """Carried int columns with unmatched-row nulls in the shard
        frames must not float64-round values > 2^53 (nullable-int shard
        conversion, same class as the shuffle-join fix)."""
        import numpy as np
        import pyarrow as pa
        import ray

        from json_time_series_extractor_ray.pipelines.asof import asof_join

        big = 2**60 + 1
        left = pa.table({
            "k": pa.array([1, 1], pa.int64()),
            "ts": pa.array([100, 200], pa.int64()),
            "lv": pa.array([big, big + 2], pa.int64()),
        })
        right = pa.table({
            "k": pa.array([1], pa.int64()),
            "rts": pa.array([150], pa.int64()),
            "rv": pa.array([big + 4], pa.int64()),
        })
        out = asof_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            by="k", left_ts="ts", right_ts="rts",
            left_cols={"lv": pa.int64()}, right_cols={"rv": pa.int64()},
        )
        rows = pa.concat_tables(
            list(out.iter_batches(batch_format="pyarrow"))).to_pylist()
        assert len(rows) == 1  # only ts=200 has an earlier right row
        assert rows[0]["lv"] == big + 2 and rows[0]["rv"] == big + 4
