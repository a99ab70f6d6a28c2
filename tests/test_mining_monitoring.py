"""Hard-negative mining, TPC-H Q1 pricing summary, series staleness,
and per-state dwell times."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from json_time_series_extractor_ray.pipelines.relational import (
    Q1_CUTOFF,
    pricing_summary,
)
from json_time_series_extractor_ray.pipelines.similarity import (
    hard_negative_topk,
)
from json_time_series_extractor_ray.pipelines.windows import dwell_times


def test_hard_negatives_exclude_same_label():
    # query 0 (label 0) is identical to vec 1 (label 0) and vec 2
    # (label 1): the same-label twin must NOT appear; the cross-label
    # twin must rank first.
    vecs = np.array([
        [1.0, 0.0], [1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.6, 0.8],
    ])
    labels = np.array([0, 0, 1, 1, 1], dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(5), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
        "label": pa.array(labels, pa.int64()),
    }))
    q = vecs[:1] / np.linalg.norm(vecs[:1], axis=1, keepdims=True)
    out = hard_negative_topk(
        ds, np.array([0], dtype=np.int64), labels[:1], q, k=3
    ).to_pandas().sort_values("cosine", ascending=False, ignore_index=True)
    assert 1 not in out["neighbor_id"].tolist()  # same label as query
    assert out["neighbor_id"].tolist() == [2, 4, 3]
    assert np.isclose(out["cosine"].iloc[0], 1.0)


def test_pricing_summary_matches_pandas():
    rng = np.random.default_rng(11)
    n = 400
    ship = (np.datetime64("1999-01-01") +
            rng.integers(0, 900, n).astype("timedelta64[D]"))
    df = pd.DataFrame({
        "l_returnflag": rng.choice(["A", "N", "R"], n),
        "l_linestatus": rng.choice(["F", "O"], n),
        "l_quantity": rng.integers(1, 50, n).astype(np.float64),
        "l_extendedprice": rng.uniform(100, 100_000, n).round(2),
        "l_discount": rng.uniform(0, 0.1, n).round(2),
        "l_tax": rng.uniform(0, 0.08, n).round(2),
        "l_shipdate": pd.to_datetime(ship),
    })
    out = (
        pricing_summary(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"], ignore_index=True)
    )
    kept = df[df["l_shipdate"] <= pd.Timestamp(Q1_CUTOFF)]
    exp = kept.groupby(["l_returnflag", "l_linestatus"]).agg(
        sum_qty=("l_quantity", "sum"), count_order=("l_quantity", "size")
    ).reset_index()
    merged = out.merge(exp, on=["l_returnflag", "l_linestatus"],
                       suffixes=("", "_exp"))
    assert len(merged) == len(out) == len(exp)
    assert (merged["count_order"] == merged["count_order_exp"]).all()
    assert np.allclose(merged["sum_qty"], merged["sum_qty_exp"])
    assert np.allclose(
        merged["avg_qty"],
        merged["sum_qty_exp"] / merged["count_order_exp"], atol=1e-6)


def test_dwell_times_hand_computed():
    # user 1: a@0s -> b@10s -> a@25s (dwells: a 10s, b 15s; final a none)
    # user 2: b@0s -> b@40s            (dwell: b 40s)
    base = np.datetime64("2024-01-01T00:00:00", "ns")
    sec = np.timedelta64(1_000_000_000, "ns")
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array(
            [base, base + 10 * sec, base + 25 * sec, base, base + 40 * sec],
            pa.timestamp("ns")),
        "event_type": pa.array(["a", "b", "a", "b", "b"], pa.string()),
        "event_id": pa.array(range(5), pa.int64()),
    }))
    out = dwell_times(ds, member="user_id", ts="ts",
                      state_col="event_type", order_col="event_id") \
        .to_pandas().set_index("state").sort_index()
    assert out.loc["a", "n_dwells"] == 1
    assert out.loc["a", "total_dwell_ns"] == 10 * 1_000_000_000
    assert out.loc["a", "avg_dwell_ms"] == 10_000.0
    assert out.loc["b", "n_dwells"] == 2
    assert out.loc["b", "total_dwell_ns"] == 55 * 1_000_000_000
    assert out.loc["b", "avg_dwell_ms"] == 27_500.0


def test_staleness_flags_silent_series():
    from json_time_series_extractor_ray.pipelines.snapshot import (
        HOUR_NS,
        series_staleness,
    )

    base = np.datetime64("2024-01-01T00:00:00", "ns")
    h = np.timedelta64(HOUR_NS, "ns")
    ds = ray.data.from_arrow(pa.table({
        "series_key": pa.array(["fresh", "fresh", "stale"], pa.string()),
        "ts": pa.array([base, base + 3 * h, base], pa.timestamp("ns")),
    }))
    out = series_staleness(ds).to_pandas().set_index("series_key")
    assert not out.loc["fresh", "is_stale"]
    assert out.loc["fresh", "gap_ns"] == 0
    assert out.loc["stale", "is_stale"]
    assert out.loc["stale", "gap_ns"] == 3 * HOUR_NS


def test_staleness_empty_input():
    # zero samples: must return an empty result, not crash on int(None)
    ds = ray.data.from_arrow(pa.table({
        "series_key": pa.array([], pa.string()),
        "ts": pa.array([], pa.timestamp("ns")),
    }))
    from json_time_series_extractor_ray.pipelines.snapshot import (
        series_staleness,
    )

    out = series_staleness(ds).to_pandas()
    assert len(out) == 0
