"""Bollinger bands and lead-lag cross-correlation over tier windows.

Two classic monitoring analytics the reference's flat-map model has no
room for (SURVEY.md §2.6 mandates the rollup family; these extend it):

* **Bollinger bands**: per series, a trailing ``width``-window moving
  mean of the 1m window means with ±k·stddev bands and a breach flag —
  the alerting primitive behind "metric left its normal envelope".
* **Lead-lag cross-correlation**: Pearson corr between two series'
  window means with one side shifted by ``lag`` windows — "does series
  X move ``lag`` minutes before series Y?" (lag 0 degenerates to the
  existing ``events_window_corr``).

Scale shapes:

* Bollinger runs over the already-reduced 1m tier (window count, not
  sample count, bounds every stage) and shuffles ONCE on series_key;
  the rolling pass is a local vectorized pandas kernel per series.
* Lead-lag pairs rows across windows, which a per-batch combiner cannot
  see, so it materializes pairs via ONE sharded co-group: the x side is
  emitted once keyed by its window, the y side once per lag keyed by
  ``window - lag·step`` — shuffle volume is tier rows × (1 + n_lags),
  never samples.  Pair groups collapse to 6-moment partials inside the
  group task, and a final ~n_lags-row groupby computes the corr.

Float parity: Bollinger quantizes window means to 3 decimals first, so
every squared term is an exact multiple of 1e-6 and the rounded moment
sums are exact fixed points of ``round(…, 6)`` on both engines — the
stronger variant of the repo's rounded-moments rule (diffstats.py).
Lead-lag keeps the proven 6-decimal moments rule of
``pairwise_window_corr`` (analytics.py): identical rounded sums, then
the identical IEEE expression tree.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.rollup import WINDOW_NS
from ._util import round_half_away
from .registry import register

_LAGS = (-2, -1, 0, 1, 2)
_SHARDS = 64


def _tier_means(rollup_ds, *, tier: str, digits: int):
    """Project one tier to (series_key, window_ns, m) with the window mean
    quantized to ``digits`` decimals (computed as round(round(sum,6)/count,
    digits) — the ladder's exact-sum mean, then the parity quantizer)."""

    def _proj(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("tier"), tier))
        s6 = round_half_away(
            t.column("sum").to_numpy(zero_copy_only=False), 6
        )
        cnt = t.column("count").to_numpy(zero_copy_only=False)
        return pa.table({
            "series_key": t.column("series_key"),
            "window_ns": t.column("window_start").cast(pa.int64()),
            "m": pa.array(round_half_away(s6 / cnt, digits), pa.float64()),
        })

    return rollup_ds.map_batches(_proj, batch_format="pyarrow",
                                 zero_copy_batch=True)


def bollinger_bands(rollup_ds, *, tier: str = "1m", width: int = 4,
                    k: float = 2.0):
    """Trailing moving mean ± k·stddev bands over one tier's window means,
    with a breach flag (window mean outside its own band).

    The band frame is the PREVIOUS ``width`` observed windows, EXCLUSIVE
    of the current one (ROWS BETWEEN width PRECEDING AND 1 PRECEDING):
    the breach test compares a window against its recent-past envelope.
    (A current-inclusive frame can mathematically never breach at small
    widths — a sample member's max z-score is (n-1)/sqrt(n), under 2 for
    n <= 5 — so the inclusive variant is an alert that cannot fire.)
    ROWS semantics over OBSERVED windows (gaps don't widen the frame —
    pair with gap-fill first for time frames), matching
    ``moving_average_tier``.  The first window of a series has no frame
    (n=0): ma/sd/bands are NULL; sd also needs n>=2; breach is False
    wherever bands are NULL, mirroring SQL frames + ``COALESCE``.
    """
    means = _tier_means(rollup_ds, tier=tier, digits=3)

    def _bands(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("window_ns", ignore_index=True)
        m = df["m"].to_numpy()
        prev = pd.Series(m).shift(1)
        s = round_half_away(
            prev.rolling(width, min_periods=1).sum().to_numpy(), 6
        )
        ss = round_half_away(
            (prev * prev).rolling(width, min_periods=1).sum().to_numpy(), 6
        )
        n = prev.rolling(width, min_periods=1).count().to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            ma = round_half_away(s / n, 6)
            var = (ss - s * s / n) / (n - 1)
        sd = round_half_away(np.sqrt(np.maximum(var, 0.0)), 6)
        upper = round_half_away(ma + k * sd, 6)
        lower = round_half_away(ma - k * sd, 6)
        ma[n < 1] = np.nan
        thin = n < 2
        sd[thin] = np.nan
        upper[thin] = np.nan
        lower[thin] = np.nan
        breach = np.where(thin, False, (m > upper) | (m < lower))
        return pd.DataFrame({
            "series_key": df["series_key"],
            "window_ns": df["window_ns"],
            "m": m,
            "n": n.astype(np.int64),
            "ma": ma,
            "sd": sd,
            "upper_band": upper,
            "lower_band": lower,
            "breach": breach.astype(bool),
        })

    return means.groupby("series_key").map_groups(_bands,
                                                  batch_format="pandas")


def leadlag_corr(rollup_ds, *, x_series: str, y_series: str,
                 tier: str = "1m", lags=_LAGS):
    """Pearson corr(x_w, y_{w+lag}) over one tier's window means, one row
    per lag.  See the module docstring for the sharded co-group shape."""
    from ._util import hash_shards

    step = WINDOW_NS[tier]
    means = _tier_means(rollup_ds, tier=tier, digits=6)
    lags = tuple(int(l) for l in lags)

    def _emit(batch: pa.Table) -> pa.Table:
        sk = batch.column("series_key").to_numpy(zero_copy_only=False)
        w = batch.column("window_ns").to_numpy(zero_copy_only=False)
        m = batch.column("m").to_numpy(zero_copy_only=False)
        xs = sk == x_series
        ys = sk == y_series
        # x side once (pair key = its own window, valid for every lag);
        # y side once per lag (pair key = window - lag*step).
        keys = [w[xs]]
        lag_col = [np.full(int(xs.sum()), np.iinfo(np.int64).min)]
        val = [m[xs]]
        for lag in lags:
            keys.append(w[ys] - lag * step)
            lag_col.append(np.full(int(ys.sum()), lag, dtype=np.int64))
            val.append(m[ys])
        key = np.concatenate(keys)
        out = pa.table({
            "pair_key": pa.array(key, pa.int64()),
            "lag": pa.array(np.concatenate(lag_col), pa.int64()),
            "m": pa.array(np.concatenate(val), pa.float64()),
        })
        shard = hash_shards(key.astype(np.int64), _SHARDS)
        return out.append_column("shard", pa.array(shard, pa.int32()))

    x_sentinel = np.iinfo(np.int64).min

    def _pair_partials(df: pd.DataFrame) -> pd.DataFrame:
        xf = df[df["lag"] == x_sentinel][["pair_key", "m"]].rename(
            columns={"m": "x"})
        yf = df[df["lag"] != x_sentinel][["pair_key", "lag", "m"]].rename(
            columns={"m": "y"})
        j = yf.merge(xf, on="pair_key", how="inner")
        if j.empty:
            return pd.DataFrame({
                "lag": pd.Series(dtype="int64"),
                "n": pd.Series(dtype="int64"),
                "sx": pd.Series(dtype="float64"),
                "sy": pd.Series(dtype="float64"),
                "sxx": pd.Series(dtype="float64"),
                "syy": pd.Series(dtype="float64"),
                "sxy": pd.Series(dtype="float64"),
            })
        g = j.groupby("lag", sort=True)
        x, y = j["x"], j["y"]
        return pd.DataFrame({
            "lag": list(g.groups),
            "n": g.size().to_numpy().astype(np.int64),
            "sx": g["x"].sum().to_numpy(),
            "sy": g["y"].sum().to_numpy(),
            "sxx": (x * x).groupby(j["lag"]).sum().to_numpy(),
            "syy": (y * y).groupby(j["lag"]).sum().to_numpy(),
            "sxy": (x * y).groupby(j["lag"]).sum().to_numpy(),
        })

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        n = float(df["n"].sum())
        sx = round_half_away(np.array([df["sx"].sum()]), 6)[0]
        sy = round_half_away(np.array([df["sy"].sum()]), 6)[0]
        sxx = round_half_away(np.array([df["sxx"].sum()]), 6)[0]
        syy = round_half_away(np.array([df["syy"].sum()]), 6)[0]
        sxy = round_half_away(np.array([df["sxy"].sum()]), 6)[0]
        var = (n * sxx - sx * sx) * (n * syy - sy * sy)
        corr = (
            (n * sxy - sx * sy) / np.sqrt(var) if var > 0 else np.nan
        )
        return pd.DataFrame({
            "lag": [int(df["lag"].iloc[0])],
            "n_windows": [int(n)],
            "corr": round_half_away(np.array([corr]), 6),
        })

    pairs = means.map_batches(_emit, batch_format="pyarrow",
                              zero_copy_batch=True)
    partials = pairs.groupby("shard").map_groups(_pair_partials,
                                                 batch_format="pandas")
    return partials.groupby("lag").map_groups(_final, batch_format="pandas")


# ---------------------------------------------------------------------------
# Driver queries + oracles
# ---------------------------------------------------------------------------

def _rollup_1m(sf_dir: str):
    from .timeseries import events_corpus_dataset, extract_and_rollup

    return extract_and_rollup(events_corpus_dataset(sf_dir), tiers=("1m",))


def _bollinger_sql(width: int = 4, k: float = 2.0) -> str:
    from ._events_sql import rollup_ctes

    ctes = rollup_ctes().format(window_ns=60_000_000_000)
    return f"""
    WITH {ctes},
    r AS (
        SELECT series_key, window_ns,
               round(round(sum, 6) / count, 3) AS m
        FROM rollup_
    ),
    w_ AS (
        SELECT series_key, window_ns, m,
               CAST(count(*) OVER w AS BIGINT) AS n,
               round(sum(m) OVER w, 6) AS s,
               round(sum(m * m) OVER w, 6) AS ss
        FROM r
        WINDOW w AS (PARTITION BY series_key ORDER BY window_ns
                     ROWS BETWEEN {width} PRECEDING AND 1 PRECEDING)
    ),
    bb AS (
        SELECT series_key, window_ns, m, n,
               CASE WHEN n >= 1 THEN round(s / n, 6) END AS ma,
               CASE WHEN n >= 2 THEN round(sqrt(greatest(
                   (ss - s * s / n) / (n - 1), 0.0)), 6) END AS sd
        FROM w_
    )
    SELECT series_key, window_ns, m, n, ma, sd,
           round(ma + {k} * sd, 6) AS upper_band,
           round(ma - {k} * sd, 6) AS lower_band,
           COALESCE(m > round(ma + {k} * sd, 6)
                    OR m < round(ma - {k} * sd, 6), FALSE) AS breach
    FROM bb
    """


def _leadlag_sql(x_series: str, y_series: str, lags=_LAGS) -> str:
    from ._events_sql import rollup_ctes

    ctes = rollup_ctes().format(window_ns=60_000_000_000)
    vals = ", ".join(f"({l})" for l in lags)
    return f"""
    WITH {ctes},
    m AS (
        SELECT series_key, window_ns,
               round(round(sum, 6) / count, 6) AS m
        FROM rollup_
    ),
    x AS (SELECT window_ns, m FROM m WHERE series_key = '{x_series}'),
    y AS (SELECT window_ns, m FROM m WHERE series_key = '{y_series}'),
    lags(lag) AS (VALUES {vals}),
    -- shift x by each lag FIRST so the lag join is a plain hash-joinable
    -- equality (the correlated form y.window_ns = x.window_ns + lag*c is
    -- planned as a nested-loop cross product: quadratic at sf0.1)
    xs AS (
        SELECT lag, x.window_ns + lag * 60000000000 AS y_win, m
        FROM lags, x
    ),
    p AS (
        SELECT lag,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(xs.m), 6) AS sx,
               round(sum(y.m), 6) AS sy,
               round(sum(xs.m * xs.m), 6) AS sxx,
               round(sum(y.m * y.m), 6) AS syy,
               round(sum(xs.m * y.m), 6) AS sxy
        FROM xs JOIN y ON y.window_ns = xs.y_win
        GROUP BY lag
    )
    SELECT lag, n AS n_windows,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
               AS corr
    FROM p
    """


register(
    "events_bollinger_1m",
    lambda sf: bollinger_bands(_rollup_1m(sf), tier="1m", width=4, k=2.0),
    _bollinger_sql(width=4, k=2.0),
)

register(
    "events_leadlag_corr",
    lambda sf: leadlag_corr(_rollup_1m(sf), x_series="value",
                            y_series="props/k", tier="1m", lags=_LAGS),
    _leadlag_sql("value", "props/k", _LAGS),
)


# ---------------------------------------------------------------------------
# Engle-Granger cointegration diagnostics (step 1) for a series pair
# ---------------------------------------------------------------------------

def engle_granger_pair(rollup_ds, *, x_series: str, y_series: str,
                       tier: str = "1m", min_windows: int = 8):
    """Engle-Granger step-1 diagnostics for one series pair over a tier's
    window means: OLS ``y = alpha + beta * x`` on the aligned windows,
    then the residual persistence statistics that decide whether the
    pair co-moves — residual lag-1 autocorrelation ``resid_rho``
    (near 1 = no cointegration, the residual is itself a random walk)
    and Durbin-Watson ``dw`` (~2(1 - rho)).

    Scale shape: the tier means are filtered to the TWO requested keys
    BEFORE any shuffle (the combiner collapses each block to bounded
    window partials), so the single co-grouping step moves
    <= 2 x n_windows rows — retention-bounded, never sample-bounded.
    The sequential residual scan is per-pair, the same per-series
    contract as ``kalman_1h`` / ``holt_smooth``.

    Hash parity: round-before-derive — rounded OLS sums, rounded
    beta/alpha, rounded per-window residuals, rounded residual sums,
    THEN rho/dw; degenerate filters (zero x-variance, zero residual
    energy) evaluate on identical values on both engines."""
    from ._util import hash_shards

    means = _tier_means(rollup_ds, tier=tier, digits=6)

    def _pairs(batch: pa.Table) -> pa.Table:
        sk = batch.column("series_key").to_numpy(zero_copy_only=False)
        keep = (sk == x_series) | (sk == y_series)
        t = pa.table({
            "series_key": pa.array(sk[keep], pa.string()),
            "window_ns": pa.array(
                batch.column("window_ns").to_numpy(
                    zero_copy_only=False)[keep], pa.int64()),
            "m": pa.array(
                batch.column("m").to_numpy(zero_copy_only=False)[keep],
                pa.float64()),
        })
        return t.append_column(
            "pair", pa.array(np.zeros(t.num_rows, np.int32), pa.int32()))

    def _fit(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "x_series": pd.Series(dtype="object"),
            "y_series": pd.Series(dtype="object"),
            "n_windows": pd.Series(dtype="int64"),
            "beta": pd.Series(dtype="float64"),
            "alpha": pd.Series(dtype="float64"),
            "resid_rho": pd.Series(dtype="float64"),
            "dw": pd.Series(dtype="float64"),
        })
        xf = df[df["series_key"] == x_series][["window_ns", "m"]].rename(
            columns={"m": "x"})
        yf = df[df["series_key"] == y_series][["window_ns", "m"]].rename(
            columns={"m": "y"})
        j = xf.merge(yf, on="window_ns", how="inner").sort_values(
            "window_ns", ignore_index=True)
        n = len(j)
        if n < min_windows:
            return empty

        def _r6(v: float) -> float:
            return round_half_away(np.array([v]), 6)[0]

        x = j["x"].to_numpy()
        y = j["y"].to_numpy()
        sx = _r6(x.sum())
        sy = _r6(y.sum())
        sxx = _r6((x * x).sum())
        sxy = _r6((x * y).sum())
        denom = n * sxx - sx * sx
        if denom == 0.0:
            return empty
        beta = _r6((n * sxy - sx * sy) / denom)
        alpha = _r6((sy - beta * sx) / n)
        e = round_half_away(y - alpha - beta * x, 6)
        see = _r6((e * e).sum())
        if see <= 0:
            return empty
        sel = _r6((e[:-1] * e[1:]).sum())
        d = e[1:] - e[:-1]
        sdd = _r6((d * d).sum())
        return pd.DataFrame({
            "x_series": [x_series], "y_series": [y_series],
            "n_windows": np.array([n], np.int64),
            "beta": [beta], "alpha": [alpha],
            "resid_rho": [_r6(sel / see)],
            "dw": [_r6(sdd / see)],
        })

    return (
        means.map_batches(_pairs, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("pair").map_groups(_fit, batch_format="pandas")
    )


def _engle_granger_sql(x_series: str, y_series: str,
                       min_windows: int = 8) -> str:
    from ._events_sql import rollup_ctes

    ctes = rollup_ctes().format(window_ns=60_000_000_000)
    return f"""
    WITH {ctes},
    m AS (
        SELECT series_key, window_ns,
               round(round(sum, 6) / count, 6) AS m
        FROM rollup_
    ),
    jw AS (
        SELECT x.window_ns, x.m AS x, y.m AS y
        FROM (SELECT window_ns, m FROM m
              WHERE series_key = '{x_series}') x
        JOIN (SELECT window_ns, m FROM m
              WHERE series_key = '{y_series}') y
          ON y.window_ns = x.window_ns
    ),
    ols AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               round(sum(x), 6) AS sx, round(sum(y), 6) AS sy,
               round(sum(x * x), 6) AS sxx, round(sum(x * y), 6) AS sxy
        FROM jw
    ),
    fit AS (
        SELECT n,
               round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta
        FROM ols
        WHERE n >= {min_windows} AND (n * sxx - sx * sx) <> 0.0
    ),
    fit2 AS (
        SELECT fit.n, fit.beta,
               round((ols.sy - fit.beta * ols.sx) / fit.n, 6) AS alpha
        FROM fit, ols
    ),
    resid AS (
        SELECT jw.window_ns,
               round(jw.y - fit2.alpha - fit2.beta * jw.x, 6) AS e
        FROM jw, fit2
    ),
    residl AS (
        SELECT e, lag(e) OVER (ORDER BY window_ns) AS ep FROM resid
    ),
    rs AS (
        SELECT round(sum(e * e), 6) AS see,
               round(sum(e * ep), 6) AS sel,
               round(sum((e - ep) * (e - ep)), 6) AS sdd
        FROM residl
    )
    SELECT '{x_series}' AS x_series, '{y_series}' AS y_series,
           fit2.n AS n_windows, fit2.beta, fit2.alpha,
           round(rs.sel / rs.see, 6) AS resid_rho,
           round(rs.sdd / rs.see, 6) AS dw
    FROM fit2, rs
    WHERE rs.see > 0
    """


register(
    "events_coint_engle_granger",
    lambda sf: engle_granger_pair(_rollup_1m(sf), x_series="value",
                                  y_series="props/k", tier="1m"),
    _engle_granger_sql("value", "props/k"),
)
