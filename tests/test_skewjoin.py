"""Skew-aware join: exact parity with the unsalted shuffle_join under a
planted hot key, hot-key detection, and the mode guard."""

import numpy as np
import pandas as pd
import pytest

from json_time_series_extractor_ray.pipelines.joins import shuffle_join
from json_time_series_extractor_ray.pipelines.skewjoin import (
    _detect_hot_keys,
    skew_join,
)


def _planted(ray):
    rng = np.random.default_rng(5)
    # key 7 is hot (5000 rows); keys 0..99 are cold background
    left = pd.DataFrame({
        "k": np.concatenate([np.full(5000, 7), rng.integers(0, 100, 2000)]),
        "lv": np.arange(7000, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": np.arange(0, 80, dtype=np.int64),  # keys 80..99 unmatched
        "rv": np.arange(0, 80, dtype=np.int64) * 10,
    })
    return (ray.data.from_pandas(left), ray.data.from_pandas(right),
            left, right)


def _canon(df):
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_parity_with_unsalted_join(ray_session, how):
    import ray

    lds, rds, left, right = _planted(ray)
    got = skew_join(lds, rds, on="k", how=how, num_salts=4,
                    hot_threshold=1000).to_pandas()
    want = shuffle_join(ray.data.from_pandas(left),
                        ray.data.from_pandas(right),
                        on="k", how=how).to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(want))
    assert len(got) > 0


def test_hot_key_detection(ray_session):
    import ray

    lds, _, _, _ = _planted(ray)
    hot = _detect_hot_keys(lds, "k", 1000)
    assert hot == [7]
    assert _detect_hot_keys(lds, "k", 100_000) == []


def test_no_hot_keys_falls_back(ray_session):
    import ray

    left = pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]})
    right = pd.DataFrame({"k": [2, 3, 4], "rv": [200, 300, 400]})
    got = skew_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                    on="k", how="inner", hot_threshold=10).to_pandas()
    assert _canon(got).to_dict("list") == {
        "k": [2, 3], "lv": [20, 30], "rv": [200, 300]}


def test_outer_mode_refused(ray_session):
    import ray

    left = ray.data.from_pandas(pd.DataFrame({"k": [1], "lv": [1]}))
    right = ray.data.from_pandas(pd.DataFrame({"k": [1], "rv": [1]}))
    with pytest.raises(ValueError, match="FULL OUTER"):
        skew_join(left, right, on="k", how="outer")


def test_salting_actually_spreads_the_hot_key(ray_session):
    import ray

    lds, _, _, _ = _planted(ray)
    from json_time_series_extractor_ray.pipelines.skewjoin import (
        MAX_HOT_KEYS,  # noqa: F401  (import sanity)
    )
    # re-run the left salt stage in isolation: the hot key must emit
    # every salt value
    import pyarrow as pa

    hot_set = {7}
    num_salts = 4

    def _salt_left(batch):
        k = batch.column("k").to_pandas()
        is_hot = k.isin(hot_set).to_numpy()
        salt = np.zeros(len(k), dtype=np.int64)
        salt[is_hot] = np.arange(int(is_hot.sum())) % num_salts
        return pa.table({"k": batch.column("k"),
                         "salt": pa.array(salt, pa.int64())})

    out = lds.map_batches(_salt_left, batch_format="pyarrow").to_pandas()
    hot_salts = set(out.loc[out["k"] == 7, "salt"].unique())
    assert hot_salts == {0, 1, 2, 3}
    assert set(out.loc[out["k"] != 7, "salt"].unique()) == {0}
