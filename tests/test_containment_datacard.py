"""Containment pairs + duplicate cluster-size histogram."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from json_time_series_extractor_ray.pipelines.containment import (
    containment_block_pairs,
)
from json_time_series_extractor_ray.pipelines.datacard import (
    dup_cluster_sizes,
)


def _docs(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] if len(r) > 2 else "en" for r in rows],
                         pa.string()),
    }))


class TestContainment:
    def test_subset_detected_asymmetrically(self):
        short = "alpha beta gamma delta epsilon"
        long = short + " zeta eta theta iota kappa " + short
        rows = [(0, short), (1, long), (2, "totally different words here")]
        out = containment_block_pairs(_docs(rows)).to_pandas()
        assert len(out) == 1
        r = out.iloc[0]
        assert (r["doc_a"], r["doc_b"]) == (0, 1)
        # every trigram of the short doc appears in the long one
        assert r["containment_ab"] == 1.0
        # but the long doc has many trigrams the short one lacks
        assert r["containment_ba"] < 0.5

    def test_blocks_do_not_cross_langs(self):
        same = "one two three four five"
        rows = [(0, same, "en"), (1, same, "de")]
        out = containment_block_pairs(_docs(rows)).to_pandas()
        assert len(out) == 0

    def test_below_threshold_pairs_dropped(self):
        # share exactly one trigram out of many
        a = "p q r s t u v w"
        b = "p q r x y z w v u t"
        out = containment_block_pairs(
            _docs([(0, a), (1, b)]), threshold=0.9
        ).to_pandas()
        assert len(out) == 0


class TestDupClusterSizes:
    def test_histogram(self):
        rows = [
            (0, "same text"), (1, "same text"), (2, "same  text "),
            (3, "unique one"), (4, "unique two"),
            (5, "pair a"), (6, "pair a"),
        ]
        out = (
            dup_cluster_sizes(_docs(rows))
            .to_pandas()
            .sort_values("n_copies", ignore_index=True)
        )
        # 2 unique docs, one 2x group, one 3x group (whitespace-normalized)
        assert out["n_copies"].tolist() == [1, 2, 3]
        assert out["n_groups"].tolist() == [2, 1, 1]
        assert out["n_docs"].tolist() == [2, 2, 3]
        assert out["n_docs"].sum() == len(rows)


def test_customer_ltv_hand_computed():
    from json_time_series_extractor_ray.pipelines.relational import (
        customer_ltv,
    )

    day = np.timedelta64(86_400_000_000_000, "ns")
    base = np.datetime64("2024-01-01T00:00:00", "ns")
    ds = ray.data.from_arrow(pa.table({
        "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
        "o_totalprice": pa.array([100.0, 250.5, 49.5, 10.0], pa.float64()),
        "o_orderdate": pa.array(
            [base, base + 30 * day, base + 100 * day, base],
            pa.timestamp("ns")),
    }))
    out = customer_ltv(ds).to_pandas().set_index("custkey").sort_index()
    assert out.loc[1, "n_orders"] == 3
    assert out.loc[1, "total_spend"] == 400.0
    assert out.loc[1, "tenure_days"] == 100
    assert out.loc[2, "n_orders"] == 1
    assert out.loc[2, "tenure_days"] == 0


def test_dup_rate_by_source():
    from json_time_series_extractor_ray.pipelines.datacard import (
        dup_rate_by_source,
    )

    rows = [
        (0, "dup text", "x"), (1, "dup text", "y"),  # cross-source dup
        (2, "only x", "x"), (3, "only y", "y"), (4, "more y", "y"),
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    }))
    out = dup_rate_by_source(ds).to_pandas().set_index("source")
    assert out.loc["x", "n_docs"] == 2 and out.loc["x", "n_duped"] == 1
    assert out.loc["x", "dup_rate"] == 0.5
    assert out.loc["y", "n_docs"] == 3 and out.loc["y", "n_duped"] == 1


def test_threshold_crossings_hand_computed():
    from json_time_series_extractor_ray.pipelines.symbolic import (
        threshold_crossings,
    )

    base = np.datetime64("2024-01-01T00:00:00", "ns")
    s = np.timedelta64(1_000_000_000, "ns")
    vals = [10.0, 60.0, 55.0, 40.0, 70.0]  # up@1, down@3, up@4
    tbl = pa.table({
        "series_key": pa.array(["s"] * 5, pa.string()),
        "ts": pa.array([base + i * s for i in range(5)],
                       pa.timestamp("ns")),
        "value_num": pa.array(vals, pa.float64()),
        "value_kind": pa.array([1] * 5, pa.int32()),
        "doc_id": pa.array(range(5), pa.int64()),
        "sample_ordinal": pa.array([0] * 5, pa.int64()),
    })
    out = threshold_crossings(
        lambda: ray.data.from_arrow(tbl), threshold=50.0
    ).to_pandas()
    assert out.iloc[0]["n_up"] == 2
    assert out.iloc[0]["n_down"] == 1
    assert out.iloc[0]["n_samples"] == 5


def test_retention_cohorts_hand_computed():
    from json_time_series_extractor_ray.pipelines.windows import (
        retention_cohorts,
    )

    day = np.timedelta64(86_400_000_000_000, "ns")
    base = np.datetime64("2024-01-01T00:00:00", "ns")
    # user 1: days 0, 1, 3; user 2: days 1, 1 (dup), 2; user 3: day 3
    rows = [
        (1, base), (1, base + 1 * day), (1, base + 3 * day),
        (2, base + 1 * day), (2, base + 1 * day), (2, base + 2 * day),
        (3, base + 3 * day),
    ]
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
    }))
    out = retention_cohorts(ds).to_pandas() \
        .set_index(["cohort_day", "day_offset"]).sort_index()
    d0 = int(base.astype("int64") // 86_400_000_000_000)
    # cohort day0 (user 1): offsets 0, 1, 3; cohort day1 (user 2):
    # offsets 0, 1; cohort day3 (user 3): offset 0
    assert out.loc[(d0, 0), "n_users"] == 1
    assert out.loc[(d0, 1), "n_users"] == 1
    assert out.loc[(d0, 3), "n_users"] == 1
    assert out.loc[(d0 + 1, 0), "n_users"] == 1
    assert out.loc[(d0 + 1, 1), "n_users"] == 1
    assert out.loc[(d0 + 3, 0), "n_users"] == 1
    assert out["n_users"].sum() == 6  # distinct (user, day) pairs
