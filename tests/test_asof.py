"""As-of join operator semantics."""

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
