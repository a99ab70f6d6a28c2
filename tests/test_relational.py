"""Relational operators: semi/anti shuffle join, grouping sets, funnel,
member set ops, table profile, bloom join prefilter."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from json_time_series_extractor_ray.pipelines.joins import shuffle_join
from json_time_series_extractor_ray.pipelines.relational import (
    funnel_conversions,
    grouping_sets_stats,
    member_set_op,
    table_profile,
)


def _ds(ray, table: pa.Table, blocks: int = 4):
    return ray.data.from_arrow(table).repartition(blocks)


class TestSemiAntiJoin:
    @pytest.fixture()
    def sides(self, ray_session):
        rng = np.random.default_rng(11)
        left = pa.table({
            "k": pa.array(
                list(rng.integers(0, 50, 300)) + [None, None], pa.int64()),
            "x": pa.array(range(302), pa.int64()),
        })
        right = pa.table({
            "k": pa.array(
                list(rng.integers(25, 60, 100)) + [None], pa.int64()),
            "y": pa.array(range(101), pa.int64()),
        })
        return left, right

    def test_semi_matches_pandas_isin(self, ray_session, sides):
        left, right = sides
        out = shuffle_join(_ds(ray_session, left), _ds(ray_session, right),
                           on="k", how="semi", num_shards=8).to_pandas()
        ldf = left.to_pandas()
        rkeys = right.to_pandas()["k"].dropna().unique()
        want = ldf[ldf["k"].isin(rkeys)]
        assert sorted(out["x"]) == sorted(want["x"])
        assert list(out.columns) == ["k", "x"]

    def test_anti_matches_pandas_and_keeps_null_keys(self, ray_session,
                                                     sides):
        left, right = sides
        out = shuffle_join(_ds(ray_session, left), _ds(ray_session, right),
                           on="k", how="anti", num_shards=8).to_pandas()
        ldf = left.to_pandas()
        rkeys = right.to_pandas()["k"].dropna().unique()
        want = ldf[~ldf["k"].isin(rkeys)]
        assert sorted(out["x"]) == sorted(want["x"])
        # NOT EXISTS is vacuously true for a null left key
        assert ldf[ldf["k"].isna()]["x"].isin(out["x"]).all()

    def test_semi_output_schema_is_left_only(self, ray_session, sides):
        left, right = sides
        out = shuffle_join(_ds(ray_session, left), _ds(ray_session, right),
                           on="k", how="semi", num_shards=8)
        assert out.schema().names == ["k", "x"]

    def test_keys_above_2_53_with_nulls_still_match(self, ray_session):
        # a pandas fillna/astype round-trip would round 2^53+1 to 2^53
        # and scatter the two sides across shards (review finding)
        big = (1 << 53) + 1
        left = pa.table({"k": pa.array([big, big + 2], pa.int64()),
                         "x": pa.array([1, 2], pa.int64())})
        right = pa.table({"k": pa.array([big, None], pa.int64()),
                          "y": pa.array([10, 11], pa.int64())})
        inner = shuffle_join(_ds(ray_session, left, 2),
                             _ds(ray_session, right, 2),
                             on="k", num_shards=4).to_pandas()
        assert list(inner["k"]) == [big] and list(inner["y"]) == [10]
        semi = shuffle_join(_ds(ray_session, left, 2),
                            _ds(ray_session, right, 2),
                            on="k", how="semi", num_shards=4).to_pandas()
        assert list(semi["k"]) == [big]


class TestGroupingSets:
    def test_three_levels_match_pandas(self, ray_session):
        rng = np.random.default_rng(5)
        n = 2000
        base = 1_700_000_000_000_000_000
        day = 86_400_000_000_000
        t = base + rng.integers(0, 5 * day, n)
        table = pa.table({
            "k": pa.array(rng.choice(["a", "b", "c"], n)),
            "ts": pa.array(t, pa.int64()).cast(pa.timestamp("ns")),
            "v": pa.array(rng.normal(0, 10, n), pa.float64()),
        })
        out = grouping_sets_stats(
            _ds(ray_session, table), key="k", ts="ts", value="v",
            window_ns=day).to_pandas()
        df = pd.DataFrame({"k": table.column("k").to_pandas(),
                           "w": t - t % day,
                           "v": table.column("v").to_pandas()})
        finest = df.groupby(["k", "w"]).agg(n=("v", "size")).reset_index()
        assert len(out) == len(finest) + 3 + 1
        total = out[(out["key"] == "<all>") & (out["window_ns"] == -1)]
        assert total["n"].iloc[0] == n
        assert total["value_sum"].iloc[0] == pytest.approx(df["v"].sum(),
                                                           abs=1e-5)
        lvl1 = out[(out["key"] == "a") & (out["window_ns"] == -1)]
        assert lvl1["n"].iloc[0] == (df["k"] == "a").sum()

    def test_null_keys_form_their_own_group_and_count_in_total(
            self, ray_session):
        # review finding: pandas dropna silently dropped null-key rows
        # from every level including the grand total
        table = pa.table({
            "k": pa.array(["a", None, "a", None], pa.string()),
            "ts": pa.array([0, 0, 0, None], pa.int64())
                .cast(pa.timestamp("ns")),
            "v": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        })
        out = grouping_sets_stats(
            _ds(ray_session, table, blocks=2), key="k", ts="ts",
            value="v").to_pandas()
        total = out[(out["key"] == "<all>") & (out["window_ns"] == -1)]
        assert total["n"].iloc[0] == 4
        assert total["value_sum"].iloc[0] == pytest.approx(10.0)
        null_grp = out[(out["key"] == "<null>") & (out["window_ns"] == -1)]
        assert null_grp["n"].iloc[0] == 2
        # null ts lands in the null-window sentinel, not window 0
        null_win = out[(out["key"] == "<null>") & (out["window_ns"] == -2)]
        assert null_win["n"].iloc[0] == 1


class TestFunnel:
    def test_planted_funnel_exact_ns(self, ray_session):
        # ns values deliberately above 2^53: a float64 round-trip would
        # corrupt them (the bug this test pins).
        base = 1_704_000_000_000_000_001
        rows = [
            (1, base + 10, "a"), (1, base + 20, "b"),      # converts
            (2, base + 30, "b"), (2, base + 40, "a"),      # b before a: no
            (3, base + 50, "a"),                           # no b: no
            (4, base + 60, "b"),                           # no a: no
            (5, base + 70, "a"), (5, base + 71, "b"),      # converts
        ]
        table = pa.table({
            "u": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64())
                .cast(pa.timestamp("ns")),
            "et": pa.array([r[2] for r in rows]),
        })
        out = funnel_conversions(
            _ds(ray_session, table, blocks=3), member="u", ts="ts",
            step_col="et", step_a="a", step_b="b").to_pandas()
        out = out.sort_values("member", ignore_index=True)
        assert list(out["member"]) == [1, 5]
        assert list(out["first_a_ns"]) == [base + 10, base + 70]
        assert list(out["last_b_ns"]) == [base + 20, base + 71]

    def test_windowed_funnel_splits_by_window(self, ray_session):
        day = 86_400_000_000_000
        base = 1_704_000_000_000_000_000
        rows = [
            (1, base + 10, "a"), (1, base + 20, "b"),          # day 0: yes
            (1, base + day + 20, "b"), (1, base + day + 30, "a"),  # day 1: no
        ]
        table = pa.table({
            "u": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64())
                .cast(pa.timestamp("ns")),
            "et": pa.array([r[2] for r in rows]),
        })
        out = funnel_conversions(
            _ds(ray_session, table, blocks=2), member="u", ts="ts",
            step_col="et", step_a="a", step_b="b",
            window_ns=day).to_pandas()
        assert len(out) == 1
        assert out["window_ns"].iloc[0] == base - base % day

    def test_null_ts_row_does_not_corrupt_sibling_precision(
            self, ray_session):
        # review finding: one null ts decayed the whole batch to float64,
        # shaving ns off co-resident values (~256 ns at epoch scale)
        base = 1_704_000_000_000_000_001
        table = pa.table({
            "u": pa.array([1, 1, 1], pa.int64()),
            "ts": pa.array([base + 10, base + 20, None], pa.int64())
                .cast(pa.timestamp("ns")),
            "et": pa.array(["a", "b", "b"]),
        })
        out = funnel_conversions(
            _ds(ray_session, table, blocks=1), member="u", ts="ts",
            step_col="et", step_a="a", step_b="b").to_pandas()
        assert len(out) == 1
        assert out["first_a_ns"].iloc[0] == base + 10
        assert out["last_b_ns"].iloc[0] == base + 20


class TestMemberSetOp:
    def _run(self, ray, op):
        table = pa.table({
            "m": pa.array([1, 1, 2, 3, 3, 4, 5, 5], pa.int64()),
            "s": pa.array(["x", "y", "x", "y", "y", "x", "x", "y"]),
        })

        def in_x(col):
            return np.asarray(col.to_pandas() == "x")

        def in_y(col):
            return np.asarray(col.to_pandas() == "y")

        out = member_set_op(_ds(ray, table, blocks=3), member="m",
                            slice_col="s", pred_a=in_x, pred_b=in_y,
                            op=op).to_pandas()
        return sorted(out["member"])

    def test_intersect(self, ray_session):
        # x-members {1,2,4,5}, y-members {1,3,5}
        assert self._run(ray_session, "intersect") == [1, 5]

    def test_except(self, ray_session):
        assert self._run(ray_session, "except") == [2, 4]


class TestTableProfile:
    def test_profile_matches_pandas(self, ray_session):
        table = pa.table({
            "num": pa.array([1.5, 2.5, None, 1.5, -3.0], pa.float64()),
            "cat": pa.array(["a", None, "b", "a", "b"]),
            "i": pa.array([7, 7, 7, 8, 9], pa.int64()),
        })
        out = table_profile(_ds(ray_session, table, blocks=2),
                            ["num", "cat", "i"]).to_pandas()
        out = out.set_index("col")
        assert (out["n_rows"] == 5).all()
        assert out.loc["num", "n_null"] == 1
        assert out.loc["cat", "n_null"] == 1
        assert out.loc["i", "n_null"] == 0
        assert out.loc["num", "n_distinct"] == 3
        assert out.loc["cat", "n_distinct"] == 2
        assert out.loc["i", "n_distinct"] == 3
        assert out.loc["num", "min_num"] == -3.0
        assert out.loc["num", "max_num"] == 2.5
        assert out.loc["i", "max_num"] == 9.0
        assert np.isnan(out.loc["cat", "min_num"])

    def test_signed_zero_and_nan_follow_duckdb(self, ray_session):
        # review finding: -0.0/0.0 counted as two distinct across blocks;
        # DuckDB counts one, treats NaN as ONE distinct value > max
        table = pa.table({
            "num": pa.array([-0.0, 1.0, 0.0, float("nan"), float("nan")],
                            pa.float64()),
        })
        out = table_profile(_ds(ray_session, table, blocks=3),
                            ["num"]).to_pandas().set_index("col")
        assert out.loc["num", "n_distinct"] == 3  # {0.0, 1.0, nan}
        assert np.isnan(out.loc["num", "max_num"])  # NaN sorts above all
        assert out.loc["num", "min_num"] == 0.0

    def test_int_distinct_above_2_53_is_exact(self, ray_session):
        big = (1 << 53) + 1
        table = pa.table({"i": pa.array([big, big + 1, big + 2, None],
                                        pa.int64())})
        out = table_profile(_ds(ray_session, table, blocks=2),
                            ["i"]).to_pandas().set_index("col")
        # a float64 round-trip would collapse big/big+1 into one value
        assert out.loc["i", "n_distinct"] == 3
        assert out.loc["i", "n_null"] == 1


class TestTransitionCounts:
    def test_matches_pandas_lead(self, ray_session):
        from json_time_series_extractor_ray.pipelines.windows import (
            transition_counts,
        )

        rng = np.random.default_rng(3)
        n = 500
        table = pa.table({
            "u": pa.array(rng.integers(0, 20, n), pa.int64()),
            "ts": pa.array(rng.integers(0, 10**6, n) * 1000, pa.int64())
                .cast(pa.timestamp("ns")),
            "s": pa.array(rng.choice(["x", "y", "z"], n)),
            "o": pa.array(range(n), pa.int64()),
        })
        out = transition_counts(
            _ds(ray_session, table, blocks=5), member="u", ts="ts",
            state_col="s", order_col="o", num_shards=4).to_pandas()
        df = pd.DataFrame({
            "u": table.column("u").to_pandas(),
            "t": table.column("ts").to_pandas(),
            "s": table.column("s").to_pandas(),
            "o": table.column("o").to_pandas(),
        }).sort_values(["u", "t", "o"], ignore_index=True)
        nxt = df.groupby("u")["s"].shift(-1)
        want = pd.DataFrame({"prev_state": df["s"], "next_state": nxt}) \
            .dropna().groupby(["prev_state", "next_state"]) \
            .size().rename("n").reset_index()
        got = out.sort_values(["prev_state", "next_state"],
                              ignore_index=True)
        want = want.sort_values(["prev_state", "next_state"],
                                ignore_index=True)
        assert got.to_dict("list") == {
            "prev_state": list(want["prev_state"]),
            "next_state": list(want["next_state"]),
            "n": list(want["n"]),
        }


class TestQuantileBuckets:
    def test_bucket_counts_match_manual_rule(self, ray_session):
        from json_time_series_extractor_ray.pipelines.sketches import (
            quantile_buckets,
        )

        rng = np.random.default_rng(9)
        n = 400
        table = pa.table({
            "k": pa.array(rng.choice(["a", "b"], n)),
            "v": pa.array(rng.normal(0, 1, n), pa.float64()),
        })
        out = quantile_buckets(
            lambda: _ds(ray_session, table, blocks=3), key="k", value="v"
        ).to_pandas()
        df = pd.DataFrame({"k": table.column("k").to_pandas(),
                           "v": table.column("v").to_pandas()})
        for kk, grp in df.groupby("k"):
            v = np.sort(grp["v"].to_numpy())
            qs = [v[max(int(np.ceil(len(v) * p)) - 1, 0)]
                  for p in (0.25, 0.5, 0.75)]
            b = np.full(len(grp), 4, np.int64)
            vv = grp["v"].to_numpy()
            for i in (2, 1, 0):
                b[vv <= qs[i]] = i + 1
            want = pd.Series(b).value_counts()
            got = out[out["k"] == kk].set_index("bucket")["n"]
            for bucket, cnt in want.items():
                assert got.loc[bucket] == cnt
        assert out["n"].sum() == n


class TestBloomPrefilter:
    def test_member_mode_has_no_false_negatives(self, ray_session):
        from json_time_series_extractor_ray.pipelines.sketches import (
            bloom_build,
            bloom_filter_out,
        )

        members = pa.table({"k": pa.array(range(0, 1000, 2), pa.int64())})
        probe = pa.table({"k": pa.array(range(1000), pa.int64())})
        bloom = bloom_build(_ds(ray_session, members), column="k")
        kept = bloom_filter_out(_ds(ray_session, probe), bloom, column="k",
                                keep="member").to_pandas()
        # every true member survives; FPs are allowed (exact join later)
        assert set(range(0, 1000, 2)) <= set(kept["k"])


class TestLagDelta:
    def test_matches_pandas_shift(self, ray_session):
        from json_time_series_extractor_ray.pipelines.windows import (
            lag_delta,
        )

        rng = np.random.default_rng(7)
        n = 400
        table = pa.table({
            "u": pa.array(rng.integers(0, 15, n), pa.int64()),
            "ts": pa.array(rng.integers(0, 10**6, n) * 1000, pa.int64())
                .cast(pa.timestamp("ns")),
            "o": pa.array(range(n), pa.int64()),
            "v": pa.array(rng.normal(0, 10, n), pa.float64()),
        })
        out = lag_delta(
            _ds(ray_session, table, blocks=4), member="u", ts="ts",
            value="v", order_col="o", num_shards=4
        ).to_pandas().sort_values("event_id", ignore_index=True)
        df = pd.DataFrame({
            "u": table.column("u").to_pandas(),
            "t": table.column("ts").to_pandas(),
            "o": table.column("o").to_pandas(),
            "v": table.column("v").to_pandas(),
        }).sort_values(["u", "t", "o"], ignore_index=True)
        prev = df.groupby("u")["v"].shift(1)
        want = df[prev.notna()].assign(prev=prev[prev.notna()])
        want = want.sort_values("o", ignore_index=True)
        assert list(out["event_id"]) == list(want["o"])
        np.testing.assert_array_equal(out["prev_value"].to_numpy(),
                                      want["prev"].to_numpy())
        np.testing.assert_array_equal(
            out["delta"].to_numpy(),
            want["v"].to_numpy() - want["prev"].to_numpy())


class TestMadOutliers:
    def test_flags_match_manual_mad(self, ray_session):
        from json_time_series_extractor_ray.pipelines.sketches import (
            mad_outliers,
        )

        rng = np.random.default_rng(5)
        n = 300
        v = rng.normal(10, 2, n)
        v[::50] += 40  # planted outliers
        table = pa.table({
            "id": pa.array(range(n), pa.int64()),
            "k": pa.array(rng.choice(["a", "b"], n)),
            "v": pa.array(v, pa.float64()),
        })
        out = mad_outliers(
            lambda: _ds(ray_session, table, blocks=3),
            key="k", value="v", id_column="id", k=3.0,
        ).to_pandas().sort_values("id", ignore_index=True)
        df = pd.DataFrame({"k": table.column("k").to_pandas(), "v": v})
        for kk, grp in df.groupby("k"):
            x = np.sort(grp["v"].to_numpy())
            med = x[max(int(np.ceil(len(x) * 0.5)) - 1, 0)]
            ad = np.sort(np.abs(grp["v"].to_numpy() - med))
            mad = ad[max(int(np.ceil(len(ad) * 0.5)) - 1, 0)]
            sub = out[out["k"] == kk]
            assert (sub["med"] == med).all()
            assert (sub["mad"] == mad).all()
            want = (np.abs(sub["v"].to_numpy() - med) > 3.0 * mad)
            np.testing.assert_array_equal(
                sub["is_outlier"].to_numpy().astype(bool), want)
        assert out["is_outlier"].sum() >= 6  # planted spikes caught


class TestParetoFrontier:
    def test_matches_brute_force_with_ties(self, ray_session):
        """The distributed skyline must equal the O(n^2) dominance test,
        including exact ties on both metrics (all tied points stay)."""
        import ray

        from json_time_series_extractor_ray.pipelines.relational import (
            customer_pareto_frontier,
        )

        rng = np.random.default_rng(21)
        n = 400
        cust = rng.integers(0, 120, n)
        price = np.round(rng.uniform(10, 1000, n), 2)
        # plant an exact two-way tie at a frontier-ish corner
        price[cust == 5] = 0.0
        price[np.where(cust == 5)[0][:1]] = 999.5
        price[np.where(cust == 7)[0][:1]] = 999.5
        t = pa.table({
            "o_custkey": pa.array(cust, pa.int64()),
            "o_totalprice": pa.array(price, pa.float64()),
        })
        got = customer_pareto_frontier(
            ray.data.from_arrow(t)).to_pandas()

        df = pd.DataFrame({"c": cust, "p": price})
        agg = df.groupby("c").agg(mx=("p", "max"), n=("p", "size"))
        pts = list(agg.itertuples())
        exp = []
        for a in pts:
            dominated = any(
                b.mx >= a.mx and b.n >= a.n and (b.mx > a.mx or b.n > a.n)
                for b in pts if b.Index != a.Index)
            if not dominated:
                exp.append((a.Index, a.mx, a.n))
        exp.sort()
        got_t = [tuple(r) for r in got[
            ["c_custkey", "max_price", "n_orders"]].to_numpy()]
        assert [(int(a), float(b), int(c)) for a, b, c in got_t] == \
            [(int(a), float(b), int(c)) for a, b, c in exp]


class TestSpendGiniDistributedRank:
    def test_hot_nation_matches_single_task_formula(self, ray_session):
        """Every customer in ONE nation (the worst skew for the r2
        per-nation-task version): the value-sharded rank partials must
        reproduce the exact sorted-rank Gini."""
        import ray

        from json_time_series_extractor_ray.pipelines.relational import (
            customer_spend_gini,
        )

        rng = np.random.default_rng(33)
        n_orders, n_cust = 3000, 500
        cust = rng.integers(0, n_cust, n_orders)
        price = np.round(rng.uniform(10, 5000, n_orders), 2)
        orders = ray.data.from_arrow(pa.table({
            "o_custkey": pa.array(cust, pa.int64()),
            "o_totalprice": pa.array(price, pa.float64()),
        }))
        customers = ray.data.from_arrow(pa.table({
            "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
            "c_nationkey": pa.array(np.zeros(n_cust, np.int64), pa.int64()),
        }))
        got = customer_spend_gini(orders, customers, value_shards=8)

        spend = pd.DataFrame({"c": cust, "p": price}).groupby("c")["p"] \
            .sum().round(2)
        x = np.sort(spend.to_numpy(np.float64))
        n = len(x)
        i = np.arange(1, n + 1, dtype=np.float64)
        g = 2.0 * (i * x).sum() / (n * x.sum()) - (n + 1.0) / n
        assert len(got) == 1
        assert int(got["n_customers"].iloc[0]) == n
        assert abs(got["gini"].iloc[0] - round(g, 6)) < 1e-12
        assert abs(got["total_spend"].iloc[0] - round(x.sum(), 2)) < 0.011

    def test_ties_across_shard_cuts_stay_exact(self, ray_session):
        """Tied spends equal to a cut value must all land in one shard;
        the Gini is then identical to the single-sort formula."""
        import ray

        from json_time_series_extractor_ray.pipelines.relational import (
            customer_spend_gini,
        )

        # 40 customers, spends heavily tied (only 3 distinct values)
        vals = np.array([100.0] * 20 + [500.0] * 15 + [900.0] * 5)
        orders = ray.data.from_arrow(pa.table({
            "o_custkey": pa.array(np.arange(40), pa.int64()),
            "o_totalprice": pa.array(vals, pa.float64()),
        }))
        customers = ray.data.from_arrow(pa.table({
            "c_custkey": pa.array(np.arange(40), pa.int64()),
            "c_nationkey": pa.array(np.arange(40) % 2, pa.int64()),
        }))
        got = customer_spend_gini(orders, customers, value_shards=16) \
            .sort_values("nationkey", ignore_index=True)
        for nk in (0, 1):
            x = np.sort(vals[np.arange(40) % 2 == nk])
            n = len(x)
            i = np.arange(1, n + 1, dtype=np.float64)
            g = 2.0 * (i * x).sum() / (n * x.sum()) - (n + 1.0) / n
            assert abs(got["gini"].iloc[nk] - round(g, 6)) < 1e-12
