"""Population Stability Index (PSI): distribution drift per series.

The standard model-monitoring drift measure: split each series' samples
at its time midpoint, bucket BOTH halves by the FIRST half's decile
edges, and score ``PSI = sum_i (p_i - q_i) * ln(p_i / q_i)`` over the
10 buckets (q = first-half share, p = second-half share, both Laplace-
smoothed ``(count + 0.5) / (total + 5.0)`` so empty buckets stay
finite).  PSI < 0.1 reads as stable, > 0.25 as drifted.

EXACTNESS: decile edges interpolate over per-distinct-value counts with
DuckDB's own lerp ``v_lo*(1-frac) + v_hi*frac`` at position ``q*(n-1)``
— verified bit-identical to ``quantile_cont`` on shared inputs (numpy's
``v_lo + frac*(v_hi-v_lo)`` is one ULP off on some fracs); bucket
membership counts strict ``v > edge`` on those identical doubles.  Shares are exact ratios of half-integers;
the 10-term PSI sum rounds to 6 decimals on both engines (log ULP noise
far inside the window).

Scale shape: pass A is a (series -> min/max ts) combiner whose result
is one row per SERIES (guarded by ``MAX_SERIES``, broadcast into pass
B); pass B aggregates ``(series, value, half)`` counts inside
``map_batches`` so the ONE shuffle carries per-block distinct-value
partials, and each series' task is vectorized over its distinct values
(bounded by ``MAX_DISTINCT_VALUES``; the decile edges need one series'
full distinct-value table in one place, unlike the pure rank sums that
``ranktests.mannwhitney_weekend`` now computes with the distributed
value-ordered prefix-rank — a distributed quantile here would need a
shard-navigation pass, tracked as the remedy if the bound ever binds).

Reference anchor: extraction-only reference (SURVEY.md §2); extends the
engine-mandated analytics/monitoring family (§2.6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import round_half_away
from .registry import register

N_BUCKETS = 10
_QS = tuple((i + 1) / 10 for i in range(9))

#: Pass A's per-series midpoint table reaches the driver — bound it.
MAX_SERIES = 1_000_000

#: One task holds one series' distinct values (the decile edges need
#: them co-resident; see module docstring for the distributed remedy).
MAX_DISTINCT_VALUES = 5_000_000


def _weighted_quantiles(uv: np.ndarray, uc: np.ndarray, qs) -> np.ndarray:
    """quantile_cont over (sorted distinct values, counts) — bit-equal to
    DuckDB's interpolation on the expanded multiset.  DuckDB evaluates
    ``vlo*(1-frac) + vhi*frac`` (numpy's ``vlo + frac*(vhi-vlo)`` differs
    by one ULP on some fracs — verified, so this MUST stay the lerp
    form)."""
    cum = np.cumsum(uc)
    n = int(cum[-1])
    out = np.empty(len(qs))
    for i, q in enumerate(qs):
        pos = q * (n - 1)
        lo = int(np.floor(pos))
        frac = pos - lo
        vlo = uv[np.searchsorted(cum, lo, side="right")]
        vhi = (uv[np.searchsorted(cum, lo + 1, side="right")]
               if lo + 1 <= n - 1 else vlo)
        out[i] = vlo * (1 - frac) + vhi * frac
    return out


def _series_midpoints(samples_ds) -> dict:
    """Pass A: per-series ``(min_ts + max_ts) // 2`` (integer ns)."""

    def _minmax(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch.column("value_num").is_valid())
        df = pd.DataFrame({
            "series_key": t.column("series_key").to_pandas(),
            "ts_ns": t.column("ts").cast(pa.timestamp("ns"))
            .cast(pa.int64()).to_numpy(zero_copy_only=False),
        })
        g = df.groupby("series_key", sort=False)["ts_ns"] \
            .agg(ts_min="min", ts_max="max").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "series_key": df["series_key"].iloc[:1],
            "ts_min": pd.Series([df["ts_min"].min()], dtype="int64"),
            "ts_max": pd.Series([df["ts_max"].max()], dtype="int64"),
        })

    rows = (
        samples_ds.map_batches(_minmax, batch_format="pyarrow",
                               zero_copy_batch=True)
        .groupby("series_key").map_groups(_merge, batch_format="pandas")
        .take_all()
    )
    if len(rows) > MAX_SERIES:
        raise ValueError(
            f"psi_drift saw {len(rows)} series (> MAX_SERIES="
            f"{MAX_SERIES}); broadcastable per-series midpoints no "
            "longer fit — shuffle-join the midpoints instead"
        )
    return {r["series_key"]: (int(r["ts_min"]) + int(r["ts_max"])) // 2
            for r in rows}


def psi_drift(samples_ds, *, round_digits: int = 6):
    """Per series: first/second-half sizes and the decile-bucket PSI."""
    mids = _series_midpoints(samples_ds)

    def _partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch.column("value_num").is_valid())
        sk = t.column("series_key").to_pandas()
        ts = t.column("ts").cast(pa.timestamp("ns")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        mid = sk.map(mids).to_numpy(dtype=np.int64)
        df = pd.DataFrame({
            "series_key": sk,
            "v": t.column("value_num").to_numpy(zero_copy_only=False),
            "half": (ts > mid).astype(np.int8),
            "cnt": np.ones(t.num_rows, dtype=np.int64),
        })
        g = df.groupby(["series_key", "v", "half"], sort=False)["cnt"] \
            .sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def _psi(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "series_key": pd.Series([], dtype=object),
            "n_first": pd.Series([], dtype="int64"),
            "n_second": pd.Series([], dtype="int64"),
            "psi": pd.Series([], dtype="float64"),
        })
        g = df.groupby(["v", "half"], sort=True)["cnt"].sum().reset_index()
        if g["v"].nunique() > MAX_DISTINCT_VALUES:
            raise ValueError(
                f"series {df['series_key'].iloc[0]!r} has "
                f"{g['v'].nunique()} distinct values (> "
                f"MAX_DISTINCT_VALUES={MAX_DISTINCT_VALUES}); use "
                "pre-binned histograms for continuous ultra-high-"
                "cardinality series"
            )
        first = g[g["half"] == 0]
        second = g[g["half"] == 1]
        n0 = int(first["cnt"].sum())
        n1 = int(second["cnt"].sum())
        if n0 < 2 or n1 < 1:
            return empty
        edges = _weighted_quantiles(first["v"].to_numpy(np.float64),
                                    first["cnt"].to_numpy(np.int64), _QS)
        counts = np.zeros((2, N_BUCKETS), dtype=np.int64)
        for half, part in ((0, first), (1, second)):
            # bucket = number of edges strictly below v  (SQL: sum v > e)
            b = np.searchsorted(edges, part["v"].to_numpy(np.float64),
                                side="left")
            counts[half] = np.bincount(b, weights=part["cnt"].to_numpy(),
                                       minlength=N_BUCKETS)
        q = (counts[0] + 0.5) / (n0 + 5.0)
        p = (counts[1] + 0.5) / (n1 + 5.0)
        psi = float(np.sum((p - q) * np.log(p / q)))
        return pd.DataFrame({
            "series_key": df["series_key"].iloc[:1],
            "n_first": pd.Series([n0], dtype="int64"),
            "n_second": pd.Series([n1], dtype="int64"),
            "psi": round_half_away(np.array([psi]), round_digits),
        })

    return (
        samples_ds.map_batches(_partial, batch_format="pyarrow",
                               zero_copy_batch=True)
        .groupby("series_key").map_groups(_psi, batch_format="pandas")
    )


def _q_psi(sf_dir: str):
    from .diffstats import _numeric_samples

    return psi_drift(_numeric_samples(sf_dir))


def _psi_sql() -> str:
    from ._events_sql import EVENTS_NUMERIC_SQL

    qs_list = "[" + ", ".join(str(q) for q in _QS) + "]"
    bucket_expr = " + ".join(
        f"(CASE WHEN x > ed[{i + 1}] THEN 1 ELSE 0 END)" for i in range(9))
    return f"""
    WITH v AS (
        SELECT series_key, ts_ns, value_num AS x
        FROM ({EVENTS_NUMERIC_SQL})
    ),
    mid AS (
        SELECT series_key, (min(ts_ns) + max(ts_ns)) // 2 AS m
        FROM v GROUP BY 1
    ),
    h AS (
        SELECT v.series_key, x,
               CASE WHEN ts_ns > m THEN 1 ELSE 0 END AS half
        FROM v JOIN mid USING (series_key)
    ),
    e AS (
        SELECT series_key, quantile_cont(x, {qs_list}) AS ed
        FROM h WHERE half = 0 GROUP BY 1
    ),
    sizes AS (
        SELECT series_key,
               CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_first,
               CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_second
        FROM h GROUP BY 1
    ),
    b AS (
        SELECT h.series_key, half, {bucket_expr} AS bucket
        FROM h JOIN e USING (series_key)
    ),
    c AS (
        SELECT series_key, half, bucket, count(*) AS n
        FROM b GROUP BY 1, 2, 3
    ),
    grid AS (
        SELECT s.series_key, hh.half, bb.bucket
        FROM (SELECT DISTINCT series_key FROM c) s
        CROSS JOIN (VALUES (0), (1)) hh(half)
        CROSS JOIN (SELECT unnest(range({N_BUCKETS})) AS bucket) bb
    ),
    full_ AS (
        SELECT g.series_key, g.half, g.bucket, COALESCE(c.n, 0) AS n
        FROM grid g
        LEFT JOIN c ON c.series_key = g.series_key
                   AND c.half = g.half AND c.bucket = g.bucket
    ),
    shares AS (
        SELECT f.series_key, f.bucket,
               max(CASE WHEN f.half = 0
                        THEN (f.n + 0.5) / (s.n_first + 5.0) END) AS q,
               max(CASE WHEN f.half = 1
                        THEN (f.n + 0.5) / (s.n_second + 5.0) END) AS p
        FROM full_ f JOIN sizes s USING (series_key)
        GROUP BY 1, 2
    )
    SELECT sh.series_key, s.n_first, s.n_second,
           round(sum((p - q) * ln(p / q)), 6) AS psi
    FROM shares sh JOIN sizes s ON sh.series_key = s.series_key
    WHERE s.n_first >= 2 AND s.n_second >= 1
    GROUP BY 1, 2, 3
    """


register("events_psi_drift", _q_psi, _psi_sql())


def wasserstein_drift(samples_ds, *, round_digits: int = 6):
    """Wasserstein-1 (earth mover's) distance between each series' first
    and second time-half value distributions — PSI's exact companion
    (no buckets, no smoothing):

        W1 = integral |F_a(x) - F_b(x)| dx

    computed EXACTLY over the merged distinct-value support: both CDFs
    are step functions, so the integral is a finite sum of
    ``|F_a - F_b| * (x_{i+1} - x_i)`` terms.  CDF values are exact
    int/int ratios, both engines sum the same terms, and the result
    rounds to 6.

    Scale shape: identical to ``psi_drift`` — broadcast midpoints, ONE
    distinct-value-partial shuffle, vectorized per-series task under the
    same ``MAX_DISTINCT_VALUES`` guard.
    """
    mids = _series_midpoints(samples_ds)

    def _partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch.column("value_num").is_valid())
        sk = t.column("series_key").to_pandas()
        ts = t.column("ts").cast(pa.timestamp("ns")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        mid = sk.map(mids).to_numpy(dtype=np.int64)
        df = pd.DataFrame({
            "series_key": sk,
            "v": t.column("value_num").to_numpy(zero_copy_only=False),
            "half": (ts > mid).astype(np.int8),
            "cnt": np.ones(t.num_rows, dtype=np.int64),
        })
        g = df.groupby(["series_key", "v", "half"], sort=False)["cnt"] \
            .sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def _w1(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "series_key": pd.Series([], dtype=object),
            "n_first": pd.Series([], dtype="int64"),
            "n_second": pd.Series([], dtype="int64"),
            "w1": pd.Series([], dtype="float64"),
        })
        g = df.groupby(["v", "half"], sort=True)["cnt"].sum().reset_index()
        if g["v"].nunique() > MAX_DISTINCT_VALUES:
            raise ValueError(
                f"series {df['series_key'].iloc[0]!r} has "
                f"{g['v'].nunique()} distinct values (> "
                f"MAX_DISTINCT_VALUES={MAX_DISTINCT_VALUES}); use "
                "pre-binned histograms for continuous ultra-high-"
                "cardinality series"
            )
        wide = g.pivot_table(index="v", columns="half", values="cnt",
                             aggfunc="sum", fill_value=0) \
            .reindex(columns=[0, 1], fill_value=0).sort_index()
        ca = wide[0].to_numpy(np.int64).cumsum()
        cb = wide[1].to_numpy(np.int64).cumsum()
        n0, n1 = int(ca[-1]), int(cb[-1])
        if n0 < 1 or n1 < 1:
            return empty
        x = wide.index.to_numpy(np.float64)
        if len(x) < 2:
            w1 = 0.0
        else:
            fa = ca[:-1] / n0
            fb = cb[:-1] / n1
            w1 = float(np.sum(np.abs(fa - fb) * (x[1:] - x[:-1])))
        return pd.DataFrame({
            "series_key": df["series_key"].iloc[:1],
            "n_first": pd.Series([n0], dtype="int64"),
            "n_second": pd.Series([n1], dtype="int64"),
            "w1": round_half_away(np.array([w1]), round_digits),
        })

    return (
        samples_ds.map_batches(_partial, batch_format="pyarrow",
                               zero_copy_batch=True)
        .groupby("series_key").map_groups(_w1, batch_format="pandas")
    )


def _q_w1(sf_dir: str):
    from .diffstats import _numeric_samples

    return wasserstein_drift(_numeric_samples(sf_dir))


def _w1_sql() -> str:
    from ._events_sql import EVENTS_NUMERIC_SQL

    return f"""
    WITH v AS (
        SELECT series_key, ts_ns, value_num AS x
        FROM ({EVENTS_NUMERIC_SQL})
    ),
    mid AS (
        SELECT series_key, (min(ts_ns) + max(ts_ns)) // 2 AS m
        FROM v GROUP BY 1
    ),
    h AS (
        SELECT v.series_key, x,
               CASE WHEN ts_ns > m THEN 1 ELSE 0 END AS half
        FROM v JOIN mid USING (series_key)
    ),
    c AS (
        SELECT series_key, x,
               sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS a,
               sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS b
        FROM h GROUP BY 1, 2
    ),
    sizes AS (
        SELECT series_key, CAST(sum(a) AS BIGINT) AS n_first,
               CAST(sum(b) AS BIGINT) AS n_second
        FROM c GROUP BY 1
    ),
    cdf AS (
        SELECT series_key, x,
               sum(a) OVER w AS ca, sum(b) OVER w AS cb,
               lead(x) OVER (PARTITION BY series_key ORDER BY x) AS nx
        FROM c
        WINDOW w AS (PARTITION BY series_key ORDER BY x
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    terms AS (
        SELECT cdf.series_key,
               abs(ca / CAST(n_first AS DOUBLE)
                   - cb / CAST(n_second AS DOUBLE)) * (nx - x) AS t
        FROM cdf JOIN sizes USING (series_key)
        WHERE nx IS NOT NULL
    )
    SELECT s.series_key, s.n_first, s.n_second,
           round(COALESCE(sum(t.t), 0.0), 6) AS w1
    FROM sizes s LEFT JOIN terms t USING (series_key)
    WHERE s.n_first >= 1 AND s.n_second >= 1
    GROUP BY 1, 2, 3
    """


register("events_wasserstein_drift", _q_w1, _w1_sql())
