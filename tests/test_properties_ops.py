"""Property-based invariants (hypothesis) for the round-2 operator
kernels — all pure numpy/pandas, no Ray session needed."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from json_time_series_extractor_ray.pipelines._util import segment_sum
from json_time_series_extractor_ray.pipelines.dedup import _uf_labels


# ---------------------------------------------------------------------------
# segment_sum == reduceat semantics with empty/trailing-empty segments
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=5), min_size=0,
                   max_size=12),
    data=st.data(),
)
def test_segment_sum_matches_naive_loop(sizes, data):
    total = sum(sizes)
    x = np.array(
        data.draw(st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False),
            min_size=total, max_size=total)),
        dtype=np.float64,
    )
    offsets = np.cumsum([0] + sizes)
    got = segment_sum(x, offsets)
    assert len(got) == len(sizes)
    pos = 0
    for i, n in enumerate(sizes):
        expected = float(np.add.reduce(x[pos:pos + n])) if n else 0.0
        assert got[i] == (expected if n else 0.0) or \
            abs(got[i] - expected) < 1e-9
        pos += n


# ---------------------------------------------------------------------------
# 2-D skyline mask == O(n^2) dominance test (all tie classes)
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(min_value=0, max_value=6),
                  st.integers(min_value=0, max_value=6)),
        min_size=0, max_size=25),
)
def test_skyline_matches_bruteforce(pts):
    from json_time_series_extractor_ray.pipelines.relational import (
        customer_pareto_frontier,  # noqa: F401 (import keeps module loaded)
    )
    import json_time_series_extractor_ray.pipelines.relational as rel

    # reach the inner kernel through a tiny local reimplementation of the
    # closure-free algorithm: replicate by calling the module-level logic
    # via a fabricated frame is overkill — test the algorithm inline
    spend = np.array([p[0] for p in pts], np.float64)
    n_ord = np.array([p[1] for p in pts], np.int64)

    # the exact keep-rule shipped in relational._skyline (kept in sync by
    # the seeded integration test); recomputed here structurally:
    def skyline(spend, n_orders):
        if len(spend) == 0:
            return np.zeros(0, bool)
        order = np.lexsort((-n_orders, -spend))
        sp, no = spend[order], n_orders[order]
        new_level = np.r_[True, sp[1:] != sp[:-1]]
        level_id = np.cumsum(new_level) - 1
        level_max = np.maximum.reduceat(no, np.where(new_level)[0])
        prev = np.r_[-np.inf, np.maximum.accumulate(level_max)[:-1]]
        keep_sorted = (no > prev[level_id]) & (no == level_max[level_id])
        keep = np.zeros(len(spend), bool)
        keep[order] = keep_sorted
        return keep

    got = skyline(spend, n_ord)
    for i in range(len(pts)):
        dominated = any(
            (spend[j] >= spend[i] and n_ord[j] >= n_ord[i])
            and (spend[j] > spend[i] or n_ord[j] > n_ord[i])
            for j in range(len(pts)) if j != i)
        assert got[i] == (not dominated), (i, pts)


# ---------------------------------------------------------------------------
# nearest as-of merge == brute-force min |delta| with backward ties
# ---------------------------------------------------------------------------

@settings(max_examples=150, deadline=None)
@given(
    lts=st.lists(st.integers(min_value=0, max_value=50), min_size=1,
                 max_size=15),
    rts=st.lists(st.integers(min_value=0, max_value=50), min_size=0,
                 max_size=15),
)
def test_nearest_merge_matches_bruteforce(lts, rts):
    from json_time_series_extractor_ray.pipelines.asof import _make_merge

    df = pd.DataFrame({
        "__side": ["l"] * len(lts) + ["r"] * len(rts),
        "__by": ["k"] * (len(lts) + len(rts)),
        "__ts": np.array(lts + rts, np.int64),
        "lid": list(range(len(lts))) + [None] * len(rts),
        "rval": [None] * len(lts) + [t * 10 + 7 for t in rts],
    })
    out = _make_merge(["lid"], ["rval"], direction="nearest")(df)
    got = dict(zip(out["lid"], out["rval"]))

    rdf = pd.DataFrame({"ts": rts, "rval": [t * 10 + 7 for t in rts]})
    rdf = rdf.sort_values(["ts", "rval"]).drop_duplicates("ts", keep="last")
    for i, lt in enumerate(lts):
        if rdf.empty:
            assert i not in got
            continue
        d = np.abs(rdf["ts"].to_numpy() - lt)
        best = d.min()
        tied = rdf[d == best].sort_values("ts")
        assert got[i] == tied.iloc[0]["rval"], (lts, rts, i)


# ---------------------------------------------------------------------------
# spanning-forest contraction preserves connected components
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(min_value=0, max_value=20),
                  st.integers(min_value=0, max_value=20)),
        min_size=0, max_size=40),
    shards=st.integers(min_value=1, max_value=5),
)
def test_forest_contraction_preserves_components(edges, shards):
    direct = _uf_labels(edges)

    forest_edges = []
    for s in range(shards):
        part = [e for i, e in enumerate(edges) if i % shards == s]
        labels = _uf_labels(part)
        forest_edges.extend((n, r) for n, r in labels.items() if n != r)
    contracted = _uf_labels(forest_edges)

    # same label table: every node maps to the same component minimum
    nodes = {n for e in edges for n in e}
    for n in nodes:
        assert contracted.get(n, n) == direct.get(n, n), (edges, shards)
