"""Symbolic / burst analytics over the rollup ladder: SAX symbolization
and Poisson-style event-count burst detection.

Both consume the 1h tier of the standard extract→rollup pipeline (the
per-block partial-combiner output, stages/rollup.py), so the input to
each per-series kernel is WINDOW rows — thousands per series per month,
never raw samples.  One ``series_key`` groupby is the only shuffle; the
per-group work is a small vectorized pandas frame.

* **SAX** (Symbolic Aggregate approXimation, Lin et al. 2003): each
  window's mean (the PAA value at the tier granularity) is z-normalized
  against the series' own window-mean distribution, then discretized
  into a 4-letter alphabet at the N(0,1) quartile breakpoints
  (-0.6745, 0, 0.6745).  The standard shape index for similarity search
  / motif mining over series.
* **Count burst**: windows whose event COUNT exceeds the series' mean
  window count by 3 Poisson standard deviations (sqrt(mean)) — the rate
  anomaly twin of ``events_zscore_anomalies`` (which flags value
  outliers).

Float parity: window means are round-6 of (round-6 sum / count); the
per-series moments over those means are round-6 sums (the repo-standard
rule), so z and the breakpoint comparisons evaluate identical doubles on
both engines.

Reference anchor: the reference library stops at extraction
(JsonTimeSeriesExtractor.cs); these extend the engine's analytics family
over the mandated rollup ladder.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import round_half_away
from .registry import register

HOUR_NS = 3_600_000_000_000

#: N(0,1) quartile breakpoints for a 4-symbol SAX alphabet.
SAX_BREAKPOINTS = (-0.6745, 0.0, 0.6745)
SAX_ALPHABET = ("a", "b", "c", "d")


def _tier_partial(tier: str):
    """Project rollup rows of one tier to (series_key, window_ns, sum_r,
    count) — the shared input shape for both kernels."""
    import pyarrow.compute as pc

    def _fn(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("tier"), tier))
        return pa.table({
            "series_key": t.column("series_key"),
            "window_ns": t.column("window_start").cast(pa.int64()),
            "sum_r": pa.array(
                round_half_away(
                    t.column("sum").to_numpy(zero_copy_only=False), 6
                ),
                pa.float64(),
            ),
            "count": t.column("count").cast(pa.int64()),
        })

    return _fn


def sax_symbols(rollup_ds, *, tier: str = "1h"):
    """Per (series, window): the window mean, its per-series z-score, and
    the SAX symbol.  Series with < 2 windows or zero variance are skipped
    (no defined z)."""

    def _sax(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("window_ns", ignore_index=True)
        m = round_half_away(
            df["sum_r"].to_numpy() / df["count"].to_numpy(), 6
        )
        n = len(m)
        s = round_half_away(m.sum(), 6)
        ss = round_half_away((m * m).sum(), 6)
        # < 2 windows or zero variance: no defined z — skip the series
        if n < 2 or (ss - s * s / n) / (n - 1) <= 0:
            return pd.DataFrame({
                "series_key": pd.Series([], dtype=object),
                "window_ns": pd.Series([], dtype=np.int64),
                "paa_mean": pd.Series([], dtype=np.float64),
                "z": pd.Series([], dtype=np.float64),
                "symbol": pd.Series([], dtype=object),
            })
        var = (ss - s * s / n) / (n - 1)
        z = round_half_away((m - s / n) / np.sqrt(var), 6)
        sym = np.full(n, SAX_ALPHABET[-1], dtype=object)
        # assign from the top breakpoint down so each z gets the FIRST
        # bucket it falls under — identical to the SQL CASE ladder
        for i in range(len(SAX_BREAKPOINTS) - 1, -1, -1):
            sym[z < SAX_BREAKPOINTS[i]] = SAX_ALPHABET[i]
        return pd.DataFrame({
            "series_key": df["series_key"],
            "window_ns": df["window_ns"].astype(np.int64),
            "paa_mean": m,
            "z": z,
            "symbol": sym,
        })

    return (
        rollup_ds.map_batches(_tier_partial(tier), batch_format="pyarrow",
                              zero_copy_batch=True)
        .groupby("series_key")
        .map_groups(_sax, batch_format="pandas")
    )


def count_bursts(rollup_ds, *, tier: str = "1h", sigmas: float = 3.0):
    """Per (series, window): the event count, the series' mean window
    count, and a burst flag — count > mean + ``sigmas`` * sqrt(mean)
    (Poisson rate anomaly over OBSERVED windows; pair with gap-fill for
    calendar-complete baselines)."""

    def _burst(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("window_ns", ignore_index=True)
        n = df["count"].to_numpy().astype(np.float64)
        mean_n = round_half_away(n.sum() / len(n), 6)
        return pd.DataFrame({
            "series_key": df["series_key"],
            "window_ns": df["window_ns"].astype(np.int64),
            "n": df["count"].astype(np.int64),
            "mean_n": np.full(len(df), mean_n),
            "is_burst": n > mean_n + sigmas * np.sqrt(mean_n),
        })

    return (
        rollup_ds.map_batches(_tier_partial(tier), batch_format="pyarrow",
                              zero_copy_batch=True)
        .groupby("series_key")
        .map_groups(_burst, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Driver queries + oracles
# ---------------------------------------------------------------------------

def _q_rollup_1h(sf_dir: str):
    from .timeseries import events_corpus_dataset, extract_and_rollup

    return extract_and_rollup(events_corpus_dataset(sf_dir), tiers=("1h",))


def _sax_sql() -> str:
    from ._events_sql import rollup_ctes

    ctes = rollup_ctes().format(window_ns=HOUR_NS)
    b0, b1, b2 = SAX_BREAKPOINTS
    a0, a1, a2, a3 = SAX_ALPHABET
    return f"""
    WITH {ctes},
    m AS (
        SELECT series_key, window_ns,
               round(round(sum, 6) / count, 6) AS paa_mean
        FROM rollup_
    ),
    st AS (
        SELECT series_key,
               round(sum(paa_mean), 6) AS s,
               round(sum(paa_mean * paa_mean), 6) AS ss,
               count(*) AS n
        FROM m GROUP BY series_key
    ),
    z AS (
        SELECT m.series_key, window_ns, paa_mean,
               round((paa_mean - s / n) / sqrt((ss - s * s / n) / (n - 1)),
                     6) AS z
        FROM m JOIN st USING (series_key)
        WHERE n >= 2 AND (ss - s * s / n) / (n - 1) > 0
    )
    SELECT series_key, window_ns, paa_mean, z,
           CASE WHEN z < {b0} THEN '{a0}'
                WHEN z < {b1} THEN '{a1}'
                WHEN z < {b2} THEN '{a2}'
                ELSE '{a3}' END AS symbol
    FROM z
    """


def _burst_sql(sigmas: float = 3.0) -> str:
    from ._events_sql import rollup_ctes

    ctes = rollup_ctes().format(window_ns=HOUR_NS)
    return f"""
    WITH {ctes},
    c AS (
        SELECT series_key, window_ns, CAST(count AS BIGINT) AS n
        FROM rollup_
    ),
    st AS (
        SELECT series_key,
               round(CAST(sum(n) AS DOUBLE) / count(*), 6) AS mean_n
        FROM c GROUP BY series_key
    )
    SELECT c.series_key, window_ns, n, mean_n,
           n > mean_n + {sigmas} * sqrt(mean_n) AS is_burst
    FROM c JOIN st USING (series_key)
    """


register(
    "events_sax_1h",
    lambda sf: sax_symbols(_q_rollup_1h(sf)),
    _sax_sql(),
)

register(
    "events_count_bursts_1h",
    lambda sf: count_bursts(_q_rollup_1h(sf)),
    _burst_sql(),
)


# ---------------------------------------------------------------------------
# Threshold crossings (alarm counting)
# ---------------------------------------------------------------------------

def threshold_crossings(samples_fn, *, threshold: float = 50.0):
    """Per series: how many times the value crosses the threshold upward
    (prev < T <= cur) and downward (prev >= T > cur) — alarm/flap
    counting over the extracted stream.

    Scale shape: ONE ``series_key`` shuffle of the projected numeric
    samples; adjacency is a vectorized shift inside the group task (the
    ``change_suppress`` contract — hot single series compose with the
    time-bucketed co-partition + 1-row carry).
    """
    from .analytics import _numeric

    def _cross(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts_ns", "doc_id", "ordinal"], kind="stable",
                            ignore_index=True)
        v = df["value_num"].to_numpy()
        prev, cur = v[:-1], v[1:]
        up = int(((prev < threshold) & (cur >= threshold)).sum())
        down = int(((prev >= threshold) & (cur < threshold)).sum())
        return pd.DataFrame({
            "series_key": [df["series_key"].iloc[0]],
            "n_samples": np.array([len(v)], np.int64),
            "n_up": np.array([up], np.int64),
            "n_down": np.array([down], np.int64),
        })

    return (
        samples_fn().map_batches(_numeric, batch_format="pyarrow",
                                 zero_copy_batch=True)
        .groupby("series_key")
        .map_groups(_cross, batch_format="pandas")
    )


def _crossings_sql(threshold: float) -> str:
    from ._events_sql import EVENTS_NUMERIC_SQL

    return f"""
    WITH num AS ({EVENTS_NUMERIC_SQL}),
    l AS (
        SELECT series_key, value_num,
               lag(value_num) OVER (
                   PARTITION BY series_key
                   ORDER BY ts_ns, doc_id, ordinal
               ) AS pv
        FROM num
    )
    SELECT series_key,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(count(*) FILTER (
               WHERE pv < {threshold} AND value_num >= {threshold}
           ) AS BIGINT) AS n_up,
           CAST(count(*) FILTER (
               WHERE pv >= {threshold} AND value_num < {threshold}
           ) AS BIGINT) AS n_down
    FROM l GROUP BY series_key
    """


def _q_crossings(sf_dir: str):
    from .analytics import _events_samples

    return threshold_crossings(lambda: _events_samples(sf_dir))


register("events_threshold_crossings", _q_crossings, _crossings_sql(50.0))


# ---------------------------------------------------------------------------
# CUSUM changepoint alarms (Page 1954) over the rollup ladder
# ---------------------------------------------------------------------------

#: Standard one-sided CUSUM tuning: drift allowance k = 0.5 sigma,
#: decision interval h = 4 sigma (both in z-units after normalization).
CUSUM_K = 0.5
CUSUM_H = 4.0


def cusum_alarms(rollup_ds, *, tier: str = "1h", k: float = CUSUM_K,
                 h: float = CUSUM_H):
    """Per (series, window): the upper one-sided CUSUM statistic over the
    series' z-normalized window means, and an alarm flag where it exceeds
    the decision interval ``h`` — the classic sequential changepoint
    detector (Page 1954), complementing the pointwise z-score and Poisson
    burst detectors.

    The textbook recursion ``S_t = max(0, S_{t-1} + (z_t - k))`` is not
    directly SQL-expressible, but the reflection identity
    ``S_t = C_t - min(0, min_{j<=t} C_j)`` with ``C = cumsum(z - k)`` is —
    two running windows — so the operator gets a full value-hash oracle.
    Both engines evaluate the identity (never the recursion) over
    identical round-6 z-scores with sequential left-to-right accumulation
    (``np.cumsum`` / DuckDB running ``sum() OVER``), so every
    intermediate double matches bit-for-bit (the ``events_cumsum_1m``
    parity contract).

    Scale shape: identical to SAX — consumes tier windows (thousands of
    rows per series, never raw samples), ONE ``series_key`` groupby, a
    vectorized numpy kernel per group.  Series with < 2 windows or zero
    variance are skipped (no defined z), mirroring ``sax_symbols``.
    """

    def _cusum(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("window_ns", ignore_index=True)
        m = round_half_away(
            df["sum_r"].to_numpy() / df["count"].to_numpy(), 6
        )
        n = len(m)
        s = round_half_away(m.sum(), 6)
        ss = round_half_away((m * m).sum(), 6)
        if n < 2 or (ss - s * s / n) / (n - 1) <= 0:
            return pd.DataFrame({
                "series_key": pd.Series([], dtype=object),
                "window_ns": pd.Series([], dtype=np.int64),
                "z": pd.Series([], dtype=np.float64),
                "cusum": pd.Series([], dtype=np.float64),
                "is_alarm": pd.Series([], dtype=bool),
            })
        var = (ss - s * s / n) / (n - 1)
        z = round_half_away((m - s / n) / np.sqrt(var), 6)
        c = np.cumsum(z - k)
        cmin = np.minimum.accumulate(c)
        stat = round_half_away(c - np.minimum(cmin, 0.0), 6)
        return pd.DataFrame({
            "series_key": df["series_key"],
            "window_ns": df["window_ns"].astype(np.int64),
            "z": z,
            "cusum": stat,
            "is_alarm": stat > h,
        })

    return (
        rollup_ds.map_batches(_tier_partial(tier), batch_format="pyarrow",
                              zero_copy_batch=True)
        .groupby("series_key")
        .map_groups(_cusum, batch_format="pandas")
    )


def _cusum_sql(k: float, h: float) -> str:
    from ._events_sql import rollup_ctes

    ctes = rollup_ctes().format(window_ns=HOUR_NS)
    return f"""
    WITH {ctes},
    m AS (
        SELECT series_key, window_ns,
               round(round(sum, 6) / count, 6) AS paa_mean
        FROM rollup_
    ),
    st AS (
        SELECT series_key,
               round(sum(paa_mean), 6) AS s,
               round(sum(paa_mean * paa_mean), 6) AS ss,
               count(*) AS n
        FROM m GROUP BY series_key
    ),
    z AS (
        SELECT m.series_key, window_ns,
               round((paa_mean - s / n) / sqrt((ss - s * s / n) / (n - 1)),
                     6) AS z
        FROM m JOIN st USING (series_key)
        WHERE n >= 2 AND (ss - s * s / n) / (n - 1) > 0
    ),
    c AS (
        SELECT series_key, window_ns, z,
               sum(z - {k}) OVER (
                   PARTITION BY series_key ORDER BY window_ns
                   ROWS UNBOUNDED PRECEDING
               ) AS c
        FROM z
    ),
    s2 AS (
        SELECT series_key, window_ns, z, c,
               min(c) OVER (
                   PARTITION BY series_key ORDER BY window_ns
                   ROWS UNBOUNDED PRECEDING
               ) AS cmin
        FROM c
    )
    SELECT series_key, window_ns, z,
           round(c - least(cmin, 0), 6) AS cusum,
           round(c - least(cmin, 0), 6) > {h} AS is_alarm
    FROM s2
    """


register(
    "events_cusum_1h",
    lambda sf: cusum_alarms(_q_rollup_1h(sf)),
    _cusum_sql(CUSUM_K, CUSUM_H),
)
