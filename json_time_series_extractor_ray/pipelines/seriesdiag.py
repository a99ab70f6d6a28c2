"""Per-series diagnostics over rollup tiers: max drawdown and a
mean-shift changepoint.

* ``max_drawdown_tier`` — the classic peak-to-trough measure: the
  largest ``running_max(mean) - mean`` over a series' windows in time
  order.  Monitoring reads it as "worst regression from the best level
  seen so far".
* ``mean_shift_changepoint`` — the single most likely level-shift point
  per series: the split ``k`` maximizing the scaled CUSUM statistic
  ``|mean(prefix) - mean(suffix)| * sqrt(k*(n-k)/n)`` (the two-sample
  z-numerator; the standard single-changepoint scan statistic).  Ties
  break to the EARLIEST window on the rounded statistic.

Scale shape (both): the rollup ladder has already collapsed raw samples
to per-window rows, so each series is a SMALL vector (windows, not
events).  ONE ``groupby(series_key)`` co-locates a series; the per-group
pass is a vectorized cummax / cumsum — no per-row Python, no second
shuffle, nothing driver-side.

Rounding parity: window means are the canonical rounded means
(``round(round(sum,6)/count,6)``); the drawdown is a difference of those
exact 1e-6 multiples, and the shift statistic rounds to 6 decimals on
BOTH engines before the argmax, so the tie-break compares identical
doubles (same discipline as ``windows.cumulative_tier``).

Reference anchor: extraction-only reference (SURVEY.md §2); extends the
engine-mandated windowed-aggregate family (§2.6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import round_half_away
from .registry import register


def _tier_means(rollup_ds, tier: str):
    """Tier rows -> (series_key, window_ns, canonical rounded mean)."""
    import pyarrow.compute as pc

    def _partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("tier"), tier))
        s = round_half_away(t.column("sum").to_numpy(zero_copy_only=False), 6)
        n = t.column("count").to_numpy(zero_copy_only=False)
        return pa.table({
            "series_key": t.column("series_key"),
            "window_ns": t.column("window_start").cast(pa.int64()),
            "mean": pa.array(round_half_away(s / n, 6), pa.float64()),
        })

    return rollup_ds.map_batches(_partial, batch_format="pyarrow",
                                 zero_copy_batch=True)


def max_drawdown_tier(rollup_ds, *, tier: str = "1m"):
    """Largest peak-to-trough drop of the per-window mean, per series."""

    def _dd(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("window_ns", ignore_index=True)
        m = df["mean"].to_numpy()
        dd = np.maximum.accumulate(m) - m
        return pd.DataFrame({
            "series_key": df["series_key"].iloc[:1],
            "n_windows": pd.Series([len(m)], dtype="int64"),
            "max_drawdown": round_half_away(np.array([dd.max()]), 6),
        })

    return _tier_means(rollup_ds, tier).groupby("series_key").map_groups(
        _dd, batch_format="pandas")


def mean_shift_changepoint(rollup_ds, *, tier: str = "1h"):
    """Best single level-shift split per series (scaled CUSUM scan)."""

    def _cp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("window_ns", ignore_index=True)
        m = df["mean"].to_numpy()
        n = len(m)
        if n < 2:
            return pd.DataFrame({
                "series_key": pd.Series([], dtype=object),
                "cp_window_ns": pd.Series([], dtype="int64"),
                "shift_stat": pd.Series([], dtype="float64"),
                "n_windows": pd.Series([], dtype="int64"),
            })
        cs = np.cumsum(m)
        tot = cs[-1]
        k = np.arange(1, n, dtype=np.int64)
        csk = cs[:-1]
        # identical IEEE tree to the oracle:
        # abs(cs/k - (tot-cs)/(n-k)) * sqrt((k*(n-k))/n)
        stat = round_half_away(
            np.abs(csk / k - (tot - csk) / (n - k))
            * np.sqrt((k * (n - k)) / n), 6)
        best = int(np.argmax(stat))  # first max -> earliest window on ties
        return pd.DataFrame({
            "series_key": df["series_key"].iloc[:1],
            "cp_window_ns": pd.Series([df["window_ns"].iloc[best]],
                                      dtype="int64"),
            "shift_stat": pd.Series([stat[best]], dtype="float64"),
            "n_windows": pd.Series([n], dtype="int64"),
        })

    return _tier_means(rollup_ds, tier).groupby("series_key").map_groups(
        _cp, batch_format="pandas")


def detect_peaks(rollup_ds, *, tier: str = "1h"):
    """Strict local maxima of the per-window mean, per series: windows
    whose mean exceeds BOTH observed neighbors (ROWS semantics — gaps
    don't disqualify; endpoints have no two neighbors and never peak).
    Exact: canonical rounded means compare as identical doubles."""

    def _peaks(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("window_ns", ignore_index=True)
        m = df["mean"].to_numpy()
        if len(m) < 3:
            keep = np.zeros(len(m), dtype=bool)
        else:
            keep = np.zeros(len(m), dtype=bool)
            keep[1:-1] = (m[1:-1] > m[:-2]) & (m[1:-1] > m[2:])
        out = df.loc[keep, ["series_key", "window_ns", "mean"]]
        return out.reset_index(drop=True)

    return _tier_means(rollup_ds, tier).groupby("series_key").map_groups(
        _peaks, batch_format="pandas")


def _q_peaks(sf_dir: str):
    from .timeseries import events_corpus_dataset, extract_and_rollup

    corpus = events_corpus_dataset(sf_dir)
    return detect_peaks(extract_and_rollup(corpus, tiers=("1h",)))


def _peaks_sql() -> str:
    from ._events_sql import rollup_ctes

    ctes = rollup_ctes().format(window_ns=3_600_000_000_000)
    return f"""
    WITH {ctes},
    m AS (
        SELECT series_key, window_ns,
               round(round(sum, 6) / count, 6) AS mean
        FROM rollup_
    )
    SELECT series_key, window_ns, mean
    FROM m
    QUALIFY mean > lag(mean) OVER (PARTITION BY series_key
                                   ORDER BY window_ns)
        AND mean > lead(mean) OVER (PARTITION BY series_key
                                    ORDER BY window_ns)
    """


register("events_peaks_1h", _q_peaks, _peaks_sql())


def _q_drawdown(sf_dir: str):
    from .timeseries import events_corpus_dataset, extract_and_rollup

    corpus = events_corpus_dataset(sf_dir)
    return max_drawdown_tier(extract_and_rollup(corpus, tiers=("1m",)))


def _q_changepoint(sf_dir: str):
    from .timeseries import events_corpus_dataset, extract_and_rollup

    corpus = events_corpus_dataset(sf_dir)
    return mean_shift_changepoint(extract_and_rollup(corpus, tiers=("1h",)))


def _drawdown_sql() -> str:
    from ._events_sql import rollup_ctes

    ctes = rollup_ctes().format(window_ns=60_000_000_000)
    return f"""
    WITH {ctes},
    m AS (
        SELECT series_key, window_ns,
               round(round(sum, 6) / count, 6) AS mean
        FROM rollup_
    ),
    d AS (
        SELECT series_key,
               max(mean) OVER w - mean AS dd
        FROM m
        WINDOW w AS (PARTITION BY series_key ORDER BY window_ns
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT series_key, CAST(count(*) AS BIGINT) AS n_windows,
           round(max(dd), 6) AS max_drawdown
    FROM d
    GROUP BY series_key
    """


def _changepoint_sql() -> str:
    from ._events_sql import rollup_ctes

    ctes = rollup_ctes().format(window_ns=3_600_000_000_000)
    return f"""
    WITH {ctes},
    m AS (
        SELECT series_key, window_ns,
               round(round(sum, 6) / count, 6) AS mean
        FROM rollup_
    ),
    c0 AS (
        SELECT series_key, window_ns,
               sum(mean) OVER w AS cs,
               row_number() OVER w AS k,
               count(*) OVER (PARTITION BY series_key) AS n
        FROM m
        WINDOW w AS (PARTITION BY series_key ORDER BY window_ns
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    c AS (
        -- tot = the LAST cumulative value, so both engines' totals come
        -- from the identical sequential summation (not a re-aggregation
        -- whose association order could differ)
        SELECT *, last_value(cs) OVER (
                   PARTITION BY series_key ORDER BY window_ns
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS tot
        FROM c0
    ),
    st AS (
        SELECT series_key, window_ns,
               round(abs(cs / k - (tot - cs) / (n - k))
                     * sqrt((k * (n - k)) / n), 6) AS shift_stat,
               n
        FROM c
        WHERE k < n
    )
    SELECT series_key, window_ns AS cp_window_ns, shift_stat,
           CAST(n AS BIGINT) AS n_windows
    FROM st
    QUALIFY row_number() OVER (
        PARTITION BY series_key
        ORDER BY shift_stat DESC, window_ns ASC) = 1
    """


register("events_max_drawdown_1m", _q_drawdown, _drawdown_sql())
register("events_mean_shift_1h", _q_changepoint, _changepoint_sql())


SPECTRUM_PERIOD = 24  # 1h windows -> the daily cycle


def daily_spectrum(rollup_ds, *, tier: str = "1h",
                   period: int = SPECTRUM_PERIOD):
    """Single-bin DFT power at the daily frequency, per series: with
    hourly means ``m_t`` (t = 0.. in window order),

        C = sum m_t * cos(2*pi*t/24),  S = sum m_t * sin(2*pi*t/24)
        amplitude = 2 * sqrt(C^2 + S^2) / n

    — "how strong is the 24h cycle" as one number, plus the mean level
    for scale.  DIRECT dot products, deliberately NOT the Goertzel
    recursion: a recursion would amplify the one-ULP cos/sin differences
    between numpy's SIMD kernels and DuckDB's libm across hundreds of
    steps, while here those differences stay ~1e-16 relative and vanish
    under the round-6 output (sums are identical expression trees over
    near-identical terms).

    Scale shape: same as the other diagnostics — windows per series are
    retention-bounded, ONE groupby co-locates a series, the per-group
    pass is one vectorized dot product.
    """

    def _spec(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("window_ns", ignore_index=True)
        m = df["mean"].to_numpy()
        n = len(m)
        t = np.arange(n, dtype=np.float64)
        w = 2 * np.pi * t / period
        c = float(np.sum(m * np.cos(w)))
        s = float(np.sum(m * np.sin(w)))
        amp = 2.0 * np.sqrt(c * c + s * s) / n
        return pd.DataFrame({
            "series_key": df["series_key"].iloc[:1],
            "n_windows": pd.Series([n], dtype="int64"),
            "daily_amplitude": round_half_away(np.array([amp]), 6),
            "mean_level": round_half_away(np.array([m.sum() / n]), 6),
        })

    return _tier_means(rollup_ds, tier).groupby("series_key").map_groups(
        _spec, batch_format="pandas")


def _q_spectrum(sf_dir: str):
    from .timeseries import events_corpus_dataset, extract_and_rollup

    corpus = events_corpus_dataset(sf_dir)
    return daily_spectrum(extract_and_rollup(corpus, tiers=("1h",)))


def _spectrum_sql() -> str:
    from ._events_sql import rollup_ctes

    ctes = rollup_ctes().format(window_ns=3_600_000_000_000)
    p = SPECTRUM_PERIOD
    return f"""
    WITH {ctes},
    m AS (
        SELECT series_key, window_ns,
               round(round(sum, 6) / count, 6) AS mean
        FROM rollup_
    ),
    r AS (
        SELECT series_key, mean,
               CAST(row_number() OVER (PARTITION BY series_key
                                       ORDER BY window_ns) - 1
                    AS DOUBLE) AS t
        FROM m
    ),
    agg AS (
        SELECT series_key,
               count(*) AS n,
               sum(mean * cos(2 * pi() * t / {p})) AS c,
               sum(mean * sin(2 * pi() * t / {p})) AS s,
               sum(mean) AS total
        FROM r GROUP BY 1
    )
    SELECT series_key, CAST(n AS BIGINT) AS n_windows,
           round(2.0 * sqrt(c * c + s * s) / n, 6) AS daily_amplitude,
           round(total / n, 6) AS mean_level
    FROM agg
    """


register("events_daily_spectrum_1h", _q_spectrum, _spectrum_sql())


CANDIDATE_PERIODS = (6, 12, 24, 168)  # hours: quarter/half/day/week


def dominant_period(rollup_ds, *, tier: str = "1h",
                    periods=CANDIDATE_PERIODS):
    """Which candidate cycle dominates each series: the single-bin DFT
    amplitude (``daily_spectrum``'s statistic) evaluated at several
    periods; the report keeps the argmax (ties -> SHORTEST period on the
    rounded amplitudes, so both engines pick identical rows)."""

    def _dom(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("window_ns", ignore_index=True)
        m = df["mean"].to_numpy()
        n = len(m)
        t = np.arange(n, dtype=np.float64)
        best_p, best_a = None, -1.0
        for p in sorted(periods):
            w = 2 * np.pi * t / p
            c = float(np.sum(m * np.cos(w)))
            s = float(np.sum(m * np.sin(w)))
            amp = float(round_half_away(
                np.float64(2.0 * np.sqrt(c * c + s * s) / n), 6))
            if amp > best_a:
                best_p, best_a = p, amp
        return pd.DataFrame({
            "series_key": df["series_key"].iloc[:1],
            "n_windows": pd.Series([n], dtype="int64"),
            "dominant_period_h": pd.Series([best_p], dtype="int64"),
            "amplitude": pd.Series([best_a], dtype="float64"),
        })

    return _tier_means(rollup_ds, tier).groupby("series_key").map_groups(
        _dom, batch_format="pandas")


def _q_dominant_period(sf_dir: str):
    from .timeseries import events_corpus_dataset, extract_and_rollup

    corpus = events_corpus_dataset(sf_dir)
    return dominant_period(extract_and_rollup(corpus, tiers=("1h",)))


def _dominant_period_sql() -> str:
    from ._events_sql import rollup_ctes

    ctes = rollup_ctes().format(window_ns=3_600_000_000_000)
    plist = ", ".join(f"({p})" for p in sorted(CANDIDATE_PERIODS))
    return f"""
    WITH {ctes},
    m AS (
        SELECT series_key, window_ns,
               round(round(sum, 6) / count, 6) AS mean
        FROM rollup_
    ),
    r AS (
        SELECT series_key, mean,
               CAST(row_number() OVER (PARTITION BY series_key
                                       ORDER BY window_ns) - 1
                    AS DOUBLE) AS t
        FROM m
    ),
    agg AS (
        SELECT series_key, p.per,
               count(*) AS n,
               sum(mean * cos(2 * pi() * t / p.per)) AS c,
               sum(mean * sin(2 * pi() * t / p.per)) AS s
        FROM r CROSS JOIN (VALUES {plist}) p(per)
        GROUP BY 1, 2
    ),
    amp AS (
        SELECT series_key, per, n,
               round(2.0 * sqrt(c * c + s * s) / n, 6) AS amplitude
        FROM agg
    )
    SELECT series_key, CAST(n AS BIGINT) AS n_windows,
           CAST(per AS BIGINT) AS dominant_period_h, amplitude
    FROM amp
    QUALIFY row_number() OVER (PARTITION BY series_key
                               ORDER BY amplitude DESC, per ASC) = 1
    """


register("events_dominant_period_1h", _q_dominant_period,
         _dominant_period_sql())


HILL_K = 100


def hill_tail_index(samples_ds, *, k: int = HILL_K):
    """Hill estimator of the upper-tail index per series:

        H = (1/(k-1)) * sum_{i<k} ln(x_(i) / x_(k))

    over the k largest POSITIVE values (x_(1) >= ... >= x_(k)); the
    heavier the tail, the larger H (tail exponent alpha ~= 1/H).

    Exactness: the top-k VALUE MULTISET is deterministic regardless of
    how either engine breaks ties among equal values, so both sides sum
    identical ``ln`` ratios; round-6 absorbs log ULP noise.

    Scale shape: NO global sort — every block emits its per-series
    top-k candidates (the global top-k lives in their union), ONE
    series groupby merges the bounded candidate sets.
    """

    def _block_topk(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch.column("value_num").is_valid())
        df = pd.DataFrame({
            "series_key": t.column("series_key").to_pandas(),
            "v": t.column("value_num").to_numpy(zero_copy_only=False),
        })
        df = df[df["v"] > 0]
        top = (df.sort_values(["series_key", "v"],
                              ascending=[True, False])
               .groupby("series_key", sort=False).head(k))
        return pa.Table.from_pandas(top, preserve_index=False)

    def _hill(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df["v"].to_numpy(np.float64))[::-1][:k]
        if len(v) < k:
            return pd.DataFrame({
                "series_key": pd.Series([], dtype=object),
                "k": pd.Series([], dtype="int64"),
                "hill": pd.Series([], dtype="float64"),
                "tail_alpha": pd.Series([], dtype="float64"),
            })
        xk = v[-1]
        h = float(np.sum(np.log(v[:-1] / xk)) / (k - 1))
        h_r = float(round_half_away(np.float64(h), 6))
        alpha = (float(round_half_away(np.float64(1.0 / h_r), 6))
                 if h_r > 0 else np.nan)
        return pd.DataFrame({
            "series_key": df["series_key"].iloc[:1],
            "k": pd.Series([k], dtype="int64"),
            "hill": pd.Series([h_r], dtype="float64"),
            "tail_alpha": pd.Series([alpha], dtype="float64"),
        })

    return (
        samples_ds.map_batches(_block_topk, batch_format="pyarrow",
                               zero_copy_batch=True)
        .groupby("series_key").map_groups(_hill, batch_format="pandas")
    )


def _q_hill(sf_dir: str):
    from .diffstats import _numeric_samples

    return hill_tail_index(_numeric_samples(sf_dir))


def _hill_sql() -> str:
    from ._events_sql import EVENTS_NUMERIC_SQL

    k = HILL_K
    return f"""
    WITH v AS (
        SELECT series_key, value_num AS x
        FROM ({EVENTS_NUMERIC_SQL})
        WHERE value_num > 0
    ),
    r AS (
        SELECT series_key, x,
               row_number() OVER (PARTITION BY series_key
                                  ORDER BY x DESC) AS rn
        FROM v
    ),
    kk AS (
        SELECT series_key, max(CASE WHEN rn = {k} THEN x END) AS xk,
               count(*) AS n
        FROM r WHERE rn <= {k} GROUP BY 1
    ),
    h AS (
        SELECT r.series_key,
               round(sum(ln(r.x / kk.xk)) / ({k} - 1), 6) AS hill
        FROM r JOIN kk USING (series_key)
        WHERE r.rn < {k} AND kk.n = {k}
        GROUP BY 1
    )
    SELECT series_key, CAST({k} AS BIGINT) AS k, hill,
           CASE WHEN hill > 0 THEN round(1.0 / hill, 6) END AS tail_alpha
    FROM h
    """


register("events_tail_index", _q_hill, _hill_sql())
