"""Referential-integrity report: planted orphans and null-FK rules."""

import pandas as pd
import pyarrow as pa

from json_time_series_extractor_ray.pipelines.integrity import (
    orphan_counts,
)


def _ds(ray, col, values, typ=pa.int64()):
    return ray.data.from_arrow(pa.table({col: pa.array(values, typ)}))


class TestOrphanCounts:
    def test_planted_orphans_counted_once(self, ray_session):
        # fk values: 1,2 valid; 7,9 orphans (9 repeated); nulls ignored
        fact = _ds(ray_session, "fk",
                   [1, 2, 2, 7, 9, 9, 9, None, None])
        dim = _ds(ray_session, "pk", [1, 2, 3, 4])
        n_keys, n_orphans = orphan_counts(fact, "fk", dim, "pk")
        assert n_keys == 4      # distinct non-null: 1, 2, 7, 9
        assert n_orphans == 2   # 7 and 9, each counted once

    def test_no_orphans(self, ray_session):
        fact = _ds(ray_session, "fk", [1, 1, 2, 3])
        dim = _ds(ray_session, "pk", [1, 2, 3])
        n_keys, n_orphans = orphan_counts(fact, "fk", dim, "pk")
        assert (n_keys, n_orphans) == (3, 0)

    def test_all_orphans_when_dim_empty_of_matches(self, ray_session):
        fact = _ds(ray_session, "fk", [5, 6])
        dim = _ds(ray_session, "pk", [1])
        n_keys, n_orphans = orphan_counts(fact, "fk", dim, "pk")
        assert (n_keys, n_orphans) == (2, 2)


class TestOrderDistributionOrphanGuard:
    def test_orphan_custkeys_raise_loud(self, ray_session):
        """Q13's scalar zero-bucket derivation is only valid when every
        o_custkey exists in customer; orphans must fail loud (naming the
        referential_integrity remedy), never silently skew the histogram."""
        import pytest

        from json_time_series_extractor_ray.pipelines.tpch import (
            customer_order_distribution,
        )

        orders = _ds(ray_session, "o_custkey", [1, 2, 3, 4, 5, 5])
        with pytest.raises(ValueError, match="referential_integrity"):
            customer_order_distribution(orders, n_customers=3)

    def test_zero_bucket_still_emitted(self, ray_session):
        from json_time_series_extractor_ray.pipelines.tpch import (
            customer_order_distribution,
        )

        orders = _ds(ray_session, "o_custkey", [1, 1, 2])
        out = customer_order_distribution(orders, n_customers=5)
        zero = out[out["c_count"] == 0]["custdist"]
        assert len(zero) == 1 and int(zero.iloc[0]) == 3


class TestDauMau:
    def test_matches_bruteforce(self, ray_session):
        import numpy as np

        from json_time_series_extractor_ray.pipelines.windows import (
            dau_mau_stickiness,
        )

        _DAY = 86_400_000_000_000
        rng = np.random.default_rng(31)
        n = 3000
        df = pd.DataFrame({
            "user_id": rng.integers(0, 40, n),
            "ts_ns": rng.integers(0, 45 * _DAY, n),
        })
        ds = ray_session.data.from_arrow(pa.table({
            "user_id": pa.array(df["user_id"], pa.int64()),
            "ts": pa.array(df["ts_ns"], pa.int64()).cast(
                pa.timestamp("ns")),
        }))
        got = dau_mau_stickiness(ds, mau_days=7)
        df["day"] = df["ts_ns"] // _DAY
        for _, row in got.iterrows():
            d = row["day"]
            dau = df[df["day"] == d]["user_id"].nunique()
            mau = df[(df["day"] >= d - 6)
                     & (df["day"] <= d)]["user_id"].nunique()
            assert (row["dau"], row["mau"]) == (dau, mau)
            assert row["stickiness"] <= 1.0
        assert set(got["day"]) == set(df["day"])


class TestFunnelLatency:
    def test_matches_bruteforce(self, ray_session):
        import numpy as np

        from json_time_series_extractor_ray.pipelines.windows import (
            funnel_latency,
        )

        rng = np.random.default_rng(41)
        n = 2000
        df = pd.DataFrame({
            "user_id": rng.integers(0, 30, n),
            "event_type": rng.choice(["click", "purchase", "view"], n),
            "ts_ns": rng.integers(0, 10**12, n),
        })
        ds = ray_session.data.from_arrow(pa.table({
            "user_id": pa.array(df["user_id"], pa.int64()),
            "event_type": pa.array(df["event_type"], pa.string()),
            "ts": pa.array(df["ts_ns"], pa.int64()).cast(
                pa.timestamp("ns")),
        }))
        got = funnel_latency(ds)
        lats = []
        for _, g in df.groupby("user_id"):
            clicks = g[g["event_type"] == "click"]["ts_ns"]
            if clicks.empty:
                continue
            t0 = clicks.min()
            buys = g[(g["event_type"] == "purchase")
                     & (g["ts_ns"] >= t0)]["ts_ns"]
            if buys.empty:
                continue
            lats.append(buys.min() - t0)
        lat = np.asarray(lats, dtype=np.float64)
        assert got["n_users"].iloc[0] == len(lat)
        assert got["median_s"].iloc[0] == round(
            float(np.percentile(lat, 50)) / 1e9, 6)
        assert got["p90_s"].iloc[0] == round(
            float(np.percentile(lat, 90)) / 1e9, 6)

    def test_no_converting_users_matches_sql_row(self, ray_session):
        """Zero conversions: the SQL twin returns n_users=0 with NULL
        percentiles — not an IndexError (ADVICE r2)."""
        from json_time_series_extractor_ray.pipelines.windows import (
            funnel_latency,
        )

        ds = ray_session.data.from_arrow(pa.table({
            "user_id": pa.array([1, 2], pa.int64()),
            "event_type": pa.array(["view", "view"], pa.string()),
            "ts": pa.array([0, 1], pa.int64()).cast(pa.timestamp("ns")),
        }))
        got = funnel_latency(ds)
        assert int(got["n_users"].iloc[0]) == 0
        assert got["median_s"].isna().all() and got["p90_s"].isna().all()


class TestDatasetQuantilesExact:
    def test_matches_numpy_linear(self, ray_session):
        import numpy as np

        from json_time_series_extractor_ray.pipelines.sketches import (
            dataset_quantiles_exact,
        )

        rng = np.random.default_rng(7)
        for vals in (
            rng.integers(-10**15, 10**15, 10_001),    # wide range
            rng.integers(0, 5, 4_000),                # heavy ties
            np.array([42], dtype=np.int64),           # n=1
            np.arange(100, dtype=np.int64),           # small exact
        ):
            ds = ray_session.data.from_arrow(
                pa.table({"v": pa.array(vals, pa.int64())}))
            n, got = dataset_quantiles_exact(
                ds, "v", (0.5, 0.9), collect_threshold=256, n_buckets=16)
            assert n == len(vals)
            for q in (0.5, 0.9):
                assert got[q] == float(np.percentile(vals, q * 100)), (
                    q, len(vals))

    def test_empty_dataset(self, ray_session):
        import numpy as np

        from json_time_series_extractor_ray.pipelines.sketches import (
            dataset_quantiles_exact,
        )

        ds = ray_session.data.from_arrow(
            pa.table({"v": pa.array([], pa.int64())}))
        n, got = dataset_quantiles_exact(ds, "v", (0.5,))
        assert n == 0 and np.isnan(got[0.5])
