"""Distributed statistics: exact per-group percentiles and a mergeable
HyperLogLog distinct-count sketch.

* ``group_percentiles``: exact discrete quantiles per key — the per-group
  sort is local (bounded by the group's rows) after the one co-locating
  ``groupby``; index rule mirrors DuckDB's ``quantile_disc``
  (``sorted[ceil(n*p) - 1]``) so the oracle comparison is value-exact.
* ``hll_distinct``: the classic mergeable cardinality sketch (Flajolet et
  al. 2007, public algorithm).  Each batch collapses to ONE 2^p-register
  row inside ``map_batches`` (the combiner), registers merge by
  element-wise max — so the driver-side reduce moves kilobytes regardless
  of corpus size.  This is the sketch shape a 100 TB distinct-count
  actually uses; exactness is impossible by design, so the driver check
  is rows-only and the error bound (~1.04/sqrt(2^p)) is pinned in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .registry import register

PCTS = (0.5, 0.9, 0.99)


def group_percentiles(ds, *, key: str, value: str, pcts=PCTS):
    """Exact discrete percentiles of ``value`` per ``key``."""

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df[value].to_numpy())
        n = len(v)
        row = {key: [df[key].iloc[0]], "n": np.int64(n)}
        for p in pcts:
            idx = max(int(np.ceil(n * p)) - 1, 0)
            row[f"p{int(p * 100)}"] = v[idx]
        return pd.DataFrame(row)

    return ds.groupby(key).map_groups(_fn, batch_format="pandas")


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

HLL_P = 12  # 4096 registers -> ~1.6% standard error


def _hash64(values: pd.Series) -> np.ndarray:
    """Stable (process-independent) 64-bit hashes — pandas siphash with a
    fixed key, NEVER Python hash() (salted per process)."""
    return pd.util.hash_array(values.to_numpy(dtype=object))


def hll_partial_batch(batch: pa.Table, column: str, p: int = HLL_P) -> pa.Table:
    """One block -> one HLL register row (the combiner)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    vals = batch.column(column).to_pandas().astype(str)
    if len(vals):
        h = _hash64(vals)
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = h << np.uint64(p)  # top (64-p) significant bits
        # rank = leading zeros of `rest` + 1, capped at 64-p+1 (rest == 0)
        lz = np.full(len(h), 64 - p, dtype=np.int64)
        nz = rest != 0
        # log2 of the highest set bit -> leading zero count
        top = np.zeros(len(h), dtype=np.int64)
        top[nz] = 63 - np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64)
        lz[nz] = top[nz]
        rank = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
        np.maximum.at(regs, idx, rank)
    return pa.table({"registers": pa.array([regs.tobytes()], pa.binary())})


def hll_estimate(register_rows, p: int = HLL_P) -> float:
    """Merge register rows (element-wise max) and estimate cardinality with
    the standard bias-corrected harmonic mean + small-range correction."""
    m = 1 << p
    merged = np.zeros(m, dtype=np.uint8)
    for blob in register_rows:
        merged = np.maximum(merged, np.frombuffer(blob, dtype=np.uint8))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-merged.astype(np.float64)))
    zeros = int(np.sum(merged == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    return float(est)


def hll_distinct(ds, *, column: str, p: int = HLL_P):
    """Approximate COUNT(DISTINCT column): per-batch register partials ->
    one tiny driver-side max-merge (kilobytes, not a shuffle)."""
    import functools

    partials = ds.map_batches(
        functools.partial(hll_partial_batch, column=column, p=p),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    blobs = [r["registers"] for r in partials.take_all()]  # k rows of 4 KiB
    return hll_estimate(blobs, p)


# ---------------------------------------------------------------------------
# Driver queries
# ---------------------------------------------------------------------------

def _q_percentiles(sf_dir: str):
    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    return group_percentiles(ds, key="event_type", value="value")


def _q_hll_users(sf_dir: str):
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    est = hll_distinct(ds, column="user_id")
    return pa.table({"approx_distinct_users": pa.array([round(est)], pa.int64())})


register(
    "events_value_percentiles",
    _q_percentiles,
    f"""
    SELECT event_type, count(*) AS n,
           {', '.join(f"quantile_disc(value, {p}) AS p{int(p * 100)}"
                      for p in PCTS)}
    FROM events GROUP BY event_type
    """,
)

register("events_hll_distinct_users", _q_hll_users)  # approximate -> rows-only
