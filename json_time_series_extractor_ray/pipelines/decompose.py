"""Classical additive seasonal decomposition + Benford first-digit test.

``classical_decompose``: per-series daily means split into
trend (centered length-``p`` moving average) + seasonal (period-position
means of the detrended values, normalized to sum 0) + residual — the
classical additive decomposition (Hyndman & Athanasopoulos,
"Forecasting: Principles and Practice", ch. 3; the STL ancestor).
Every intermediate lives on the 1e-6 grid: the canonical round-6 means
make all sums EXACT in float64 (grid values x 1e6 are small integers),
so the decomposition hash-matches SQL bit-for-bit with no noise margin.

``benford_digits``: first-significant-digit distribution of a positive
cents-scale measure vs Benford's law (Newcomb 1881 / Benford 1938),
with per-digit chi-square contributions.  The digit comes from the
INTEGER cents value's decimal string — never ``log10`` (its ULP at
exact powers of ten flips digits between engines).

Scale shapes: decomposition reuses the DTW reducer (per-block combiner
-> one groupby -> bounded per-series vectors fanned out as tasks);
Benford is a pure per-block 9-bucket combiner + one tiny merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import round_half_away
from .dtw import window_mean_vectors
from .registry import register

DECOMP_PERIOD = 7          # weekly seasonality over daily means
DECOMP_MAX_WINDOWS = 100_000
DECOMP_MAX_SERIES = 10_000

_D = 86_400_000_000_000

#: Benford expected shares log10(1 + 1/d), rounded to 9 dp and embedded
#: as LITERALS in both engines — no runtime log10 on either side.
BENFORD_SHARES = {
    d: round(float(np.log10(1.0 + 1.0 / d)), 9) for d in range(1, 10)
}


def decompose_series(v: np.ndarray, p: int):
    """One series' (trend, seasonal, resid) — every step on the 1e-6
    grid (inputs are round-6 means; each derived value is re-rounded,
    and grid sums are exact), so SQL reproduces it bit-for-bit.
    ``p`` must be odd (centered MA without the even-period 2xMA pass)."""
    n = len(v)
    h = p // 2
    trend = np.full(n, np.nan)
    if n >= p:
        csum = np.concatenate(([0.0], np.cumsum(v)))
        # grid sums are exact, so sum/p rounds identically everywhere
        trend[h:n - h] = round_half_away(
            round_half_away(csum[p:] - csum[:-p], 6) / p, 6)
    det = np.full(n, np.nan)
    ok = ~np.isnan(trend)
    det[ok] = round_half_away(v[ok] - trend[ok], 6)
    # period-position means of detrended values (canon round-6 mean)
    pos = np.arange(n) % p
    s_raw = np.full(p, np.nan)
    for k in range(p):
        dk = det[(pos == k) & ok]
        if len(dk):
            s_raw[k] = round_half_away(
                round_half_away(np.float64(dk.sum()), 6) / len(dk), 6)
    # normalizer divides the PRESENT positions' sum by the full period —
    # mirrors the SQL window sum exactly (positions can be absent only
    # for series shorter than 2p-1); NaN positions propagate.
    adj = round_half_away(
        round_half_away(np.float64(np.nansum(s_raw)), 6) / p, 6)
    s_adj = round_half_away(s_raw - adj, 6)
    seasonal = s_adj[pos]
    resid = round_half_away(v - trend - seasonal, 6)  # NaN propagates
    return trend, seasonal, resid


def classical_decompose(samples_ds, *, window_ns: int = _D,
                        period: int = DECOMP_PERIOD,
                        max_windows: int = DECOMP_MAX_WINDOWS,
                        max_series: int = DECOMP_MAX_SERIES):
    """Rows (series_key, i, y, trend, seasonal, resid); trend-less edge
    positions carry NULLs, exactly as the SQL twin emits them."""
    import ray

    from .matrixprofile import _series_vectors

    if period % 2 == 0:
        raise ValueError("period must be odd (centered MA); even periods "
                         "need the classical 2xMA pre-pass, not built")
    vectors = _series_vectors(samples_ds, window_ns=window_ns,
                              max_windows=max_windows,
                              max_series=max_series)
    vec_ref = ray.put(vectors)
    keys = sorted(vectors)

    def _fn(batch: pd.DataFrame) -> pd.DataFrame:
        vecs = ray.get(vec_ref)
        frames = []
        for k in batch["series_key"]:
            v = vecs[k]
            trend, seasonal, resid = decompose_series(v, period)
            frames.append(pd.DataFrame({
                "series_key": np.full(len(v), k, object),
                "i": np.arange(len(v), dtype=np.int64),
                "y": v,
                "trend": trend,
                "seasonal": seasonal,
                "resid": resid,
            }))
        if not frames:
            return pd.DataFrame({
                "series_key": np.array([], object),
                "i": np.array([], np.int64),
                "y": np.array([], np.float64),
                "trend": np.array([], np.float64),
                "seasonal": np.array([], np.float64),
                "resid": np.array([], np.float64),
            })
        return pd.concat(frames, ignore_index=True)

    return ray.data.from_items(
        [{"series_key": k} for k in keys]
    ).map_batches(_fn, batch_format="pandas")


def benford_digits(values_ds, column: str):
    """First-digit histogram of a positive 2-decimal measure vs
    Benford's law: per digit, observed count, expected share, and the
    chi-square contribution ``(obs - n*share)^2 / (n*share)``.

    Scale shape: each block folds to ≤9 (digit, count) partial rows via
    an integer-cents decimal-string digit (exact, no log10); one tiny
    groupby merges; the 9-row finish runs driver-side."""

    def _partial(batch: pa.Table) -> pa.Table:
        v = batch.column(column).to_numpy(zero_copy_only=False)
        v = v[v > 0]
        cents = np.rint(v * 100.0).astype(np.int64)
        first = np.array(
            [int(s[0]) for s in cents.astype("U")], dtype=np.int64)
        digits, counts = np.unique(first, return_counts=True)
        return pa.table({
            "digit": pa.array(digits, pa.int64()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        })

    merged = (
        values_ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
        .groupby("digit").sum("n")
    ).to_pandas()  # ≤ 9 rows
    obs = {int(r["digit"]): int(r["sum(n)"]) for _, r in merged.iterrows()}
    n = sum(obs.values())
    rows = {"digit": [], "n_obs": [], "exp_share": [], "chi2": []}
    for d in range(1, 10):
        share = BENFORD_SHARES[d]
        e = n * share
        o = obs.get(d, 0)
        rows["digit"].append(d)
        rows["n_obs"].append(o)
        rows["exp_share"].append(share)
        rows["chi2"].append(
            float(round_half_away(np.float64((o - e) ** 2 / e), 6)))
    return pd.DataFrame({
        "digit": np.asarray(rows["digit"], np.int64),
        "n_obs": np.asarray(rows["n_obs"], np.int64),
        "exp_share": np.asarray(rows["exp_share"], np.float64),
        "chi2": np.asarray(rows["chi2"], np.float64),
    })


def _q_decompose(sf_dir: str):
    from .diffstats import _numeric_samples

    return classical_decompose(_numeric_samples(sf_dir))


def _q_benford(sf_dir: str):
    import ray

    return benford_digits(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_totalprice"]),
        "o_totalprice")


from ._events_sql import EVENTS_NUMERIC_SQL  # noqa: E402

register(
    "events_decompose_1d",
    _q_decompose,
    f"""
    WITH m AS (
        SELECT series_key,
               ts_ns - ts_ns % {_D} AS window_ns,
               round(round(sum(value_num), 6) / count(*), 6) AS y
        FROM ({EVENTS_NUMERIC_SQL})
        GROUP BY series_key, window_ns
    ),
    v AS (
        SELECT series_key, y,
               row_number() OVER (
                   PARTITION BY series_key ORDER BY window_ns) - 1 AS i,
               count(*) OVER (PARTITION BY series_key) AS n
        FROM m
    ),
    tr AS (
        SELECT series_key, i, n, y,
               CASE WHEN i >= {DECOMP_PERIOD // 2}
                     AND i < n - {DECOMP_PERIOD // 2}
                    THEN round(round(sum(y) OVER (
                             PARTITION BY series_key ORDER BY i
                             ROWS BETWEEN {DECOMP_PERIOD // 2} PRECEDING
                                  AND {DECOMP_PERIOD // 2} FOLLOWING
                         ), 6) / {DECOMP_PERIOD}, 6)
               END AS trend
        FROM v
    ),
    det AS (
        SELECT *, round(y - trend, 6) AS det,
               i % {DECOMP_PERIOD} AS pos
        FROM tr
    ),
    sraw AS (
        SELECT series_key, pos,
               round(round(sum(det), 6) / count(det), 6) AS s_raw
        FROM det WHERE det IS NOT NULL GROUP BY series_key, pos
    ),
    sadj AS (
        SELECT series_key, pos,
               round(s_raw - round(round(sum(s_raw) OVER (
                   PARTITION BY series_key), 6) / {DECOMP_PERIOD}, 6),
                   6) AS seasonal
        FROM sraw
    )
    SELECT d.series_key, CAST(d.i AS BIGINT) AS i, d.y AS y,
           d.trend AS trend, s.seasonal AS seasonal,
           round(d.y - d.trend - s.seasonal, 6) AS resid
    FROM det d
    LEFT JOIN sadj s
      ON s.series_key = d.series_key AND s.pos = d.pos
    """,
)

_BENFORD_BRANCHES = " UNION ALL ".join(
    f"SELECT {d} AS digit, {BENFORD_SHARES[d]!r} AS exp_share"
    for d in range(1, 10)
)

register(
    "orders_benford",
    _q_benford,
    f"""
    WITH obs AS (
        SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS digit,
               CAST(count(*) AS BIGINT) AS n_obs
        FROM orders WHERE o_totalprice > 0 GROUP BY 1
    ),
    tot AS (SELECT sum(n_obs) AS n FROM obs),
    exp AS ({_BENFORD_BRANCHES})
    SELECT e.digit AS digit,
           CAST(coalesce(o.n_obs, 0) AS BIGINT) AS n_obs,
           CAST(e.exp_share AS DOUBLE) AS exp_share,
           round(pow(coalesce(o.n_obs, 0) - tot.n * e.exp_share, 2)
                 / (tot.n * e.exp_share), 6) AS chi2
    FROM exp e LEFT JOIN obs o ON o.digit = e.digit, tot
    """,
)
