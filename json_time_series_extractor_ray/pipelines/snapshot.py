"""Snapshot / state-style time-series operators: latest value per
series, change-suppression (report-by-exception), and per-window series
ranking.

The reference library is a stateless per-document extractor (SURVEY.md
§2); these are the "current state of the fleet" queries an IoT/metrics
user runs over the extracted stream.  Scale shapes:

* **last_value** is a pure combiner: every block collapses to at most
  one candidate row per series inside ``map_batches`` (pandas
  ``drop_duplicates(keep='last')`` after the deterministic
  ``(ts, doc_id, ordinal)`` lexsort — SURVEY.md §7.3.3's total order),
  then ONE tiny ``series_key`` groupby re-picks among #blocks
  candidates.  Nothing the size of the input ever moves — the shuffle
  carries O(#blocks x #series) rows.
* **change_suppress** (deadband / report-by-exception) needs per-series
  adjacency, so it shuffles once on ``series_key`` and diffs inside the
  group task with one vectorized ``lag != value`` mask (the
  ``rate_increase`` contract, downsample.py: series cardinality must be
  >= desired parallelism; for hot single series, compose with the
  time-bucketed co-partition used by ``asof.py`` — adjacency only
  breaks at bucket boundaries, which a 1-row carry fixes).
* **window_top_series** follows the ladder's combiner contract: blocks
  collapse to per-(series, window) ``(sum, count)`` partials before the
  single shuffle, and the per-window rank runs over shard-keyed groups
  (``window % shards``) — never one Ray group per window, which is
  pathologically slow at hundreds of thousands of near-singleton groups
  (the pivot lesson, windows.py:180).

Float parity with the DuckDB oracles: the repo rule (BASELINE notes) —
round sums to 6 dp with ``round_half_away`` before deriving means, then
apply the identical IEEE expression tree in both engines.  last_value
and change_suppress need no rounding: outputs are exact picks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import round_half_away

_ORDER = ["ts_ns", "doc_id", "ordinal"]


def _project_all(batch: pa.Table) -> pa.Table:
    """All samples (numeric + string), ns timestamps, deterministic-order
    keys."""
    return pa.table({
        "series_key": batch.column("series_key"),
        "ts_ns": batch.column("ts").cast(pa.int64()),
        "value_num": batch.column("value_num"),
        "value_str": batch.column("value_str"),
        "doc_id": batch.column("doc_id"),
        "ordinal": batch.column("sample_ordinal").cast(pa.int64()),
    })


def _pick_last(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["series_key", *_ORDER], kind="stable",
                        ignore_index=True)
    return df.drop_duplicates("series_key", keep="last")


# ---------------------------------------------------------------------------
# Latest value per series (the "current state" snapshot)
# ---------------------------------------------------------------------------

def last_value(samples_ds):
    """One row per series: the sample with the greatest
    ``(ts, doc_id, ordinal)`` — numeric or string.

    Block combiner -> one candidate per (block, series) -> one tiny
    ``series_key`` groupby picks the global winner.
    """

    def _partial(batch: pa.Table) -> pa.Table:
        df = _project_all(batch).to_pandas()
        return pa.Table.from_pandas(_pick_last(df), preserve_index=False)

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        out = _pick_last(df)
        return out[["series_key", "ts_ns", "value_num", "value_str"]]

    return (
        samples_ds.map_batches(_partial, batch_format="pyarrow",
                               zero_copy_batch=True)
        .groupby("series_key")
        .map_groups(_final, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Change suppression (deadband / report-by-exception)
# ---------------------------------------------------------------------------

def change_suppress(samples_ds, *, epsilon: float = 0.0):
    """Drop numeric samples whose value repeats the immediately preceding
    sample of the same series (|v - prev| <= epsilon); the first sample
    of each series is always kept.

    This is adjacent-point suppression (the SQL-LAG semantics, so it has
    an exact oracle); classic last-KEPT-value deadband is the sequential
    variant of the same group kernel.
    """

    from .analytics import _numeric  # shared numeric-sample projection

    def _suppress(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(_ORDER, kind="stable", ignore_index=True)
        v = df["value_num"].to_numpy()
        keep = np.empty(len(v), dtype=bool)
        if len(v):
            keep[0] = True
            keep[1:] = np.abs(v[1:] - v[:-1]) > epsilon
        return df.loc[keep, ["series_key", "ts_ns", "value_num"]]

    return (
        samples_ds.map_batches(_numeric, batch_format="pyarrow",
                               zero_copy_batch=True)
        .groupby("series_key")
        .map_groups(_suppress, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Top-k series per window (cross-sectional ranking)
# ---------------------------------------------------------------------------

def window_top_series(samples_ds, *, window_ns: int = 3_600_000_000_000,
                      k: int = 2, shards: int = 256):
    """Per tumbling window: the ``k`` series with the highest (rounded)
    mean value, ranked ``mean DESC, series_key ASC``."""
    import pyarrow.compute as pc

    def _partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("value_kind"), 1))
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "series_key": t.column("series_key").to_numpy(
                zero_copy_only=False),
            "window_ns": ts - (ts % window_ns),
            "v": t.column("value_num").to_numpy(zero_copy_only=False),
        })
        g = df.groupby(["series_key", "window_ns"], sort=False)["v"].agg(
            ["sum", "size"])
        idx = g.index.to_frame(index=False)
        return pa.table({
            "series_key": pa.array(idx["series_key"], pa.string()),
            "window_ns": pa.array(idx["window_ns"].to_numpy(), pa.int64()),
            "s": pa.array(g["sum"].to_numpy(), pa.float64()),
            "n": pa.array(g["size"].to_numpy().astype(np.int64), pa.int64()),
        })

    def _mean_shard(batch: pa.Table) -> pa.Table:
        w = batch.column("window_ns").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        s = round_half_away(
            batch.column("sum(s)").to_numpy(zero_copy_only=False), 6)
        n = batch.column("sum(n)").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "window_ns": pa.array(w, pa.int64()),
            "series_key": batch.column("series_key"),
            "mean": pa.array(round_half_away(s / n, 6), pa.float64()),
            "shard": pa.array((w // window_ns) % shards, pa.int32()),
        })

    def _rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["window_ns", "mean", "series_key"],
                            ascending=[True, False, True], kind="stable",
                            ignore_index=True)
        rank = df.groupby("window_ns", sort=False).cumcount() + 1
        out = df.loc[rank <= k, ["window_ns", "series_key", "mean"]].copy()
        out["rank"] = rank[rank <= k].to_numpy()
        return out

    agg = (
        samples_ds.map_batches(_partial, batch_format="pyarrow",
                               zero_copy_batch=True)
        .groupby(["series_key", "window_ns"])
        .sum(["s", "n"])
        .map_batches(_mean_shard, batch_format="pyarrow",
                     zero_copy_batch=True)
    )
    return agg.groupby("shard").map_groups(_rank, batch_format="pandas")


# ---------------------------------------------------------------------------
# Series staleness (monitoring: which series stopped reporting?)
# ---------------------------------------------------------------------------

HOUR_NS = 3_600_000_000_000


def series_staleness(samples_ds, *, stale_after_ns: int = HOUR_NS):
    """One row per series: its last-seen timestamp, the gap to the
    newest timestamp anywhere in the corpus, and a staleness flag
    (gap > ``stale_after_ns``) — the standard "silent sensor" monitor.

    Scale shape: the ``last_value`` combiner discipline on just the
    timestamp — each block collapses to one max-ts candidate per series,
    ONE tiny groupby merges them, and the corpus-wide max is then the max
    of the per-series lasts, so the samples stream is consumed exactly
    once.  The grouped result (#series rows) is materialized before the
    two tiny derivations; nothing input-sized ever lands on the driver.
    """

    def _partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "series_key": batch.column("series_key").to_pandas(),
            "ts_ns": batch.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False),
        })
        g = df.groupby("series_key", sort=False)["ts_ns"].max().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    lasts = (
        samples_ds.map_batches(_partial, batch_format="pyarrow",
                               zero_copy_batch=True)
        .groupby("series_key")
        .max("ts_ns")
        .materialize()  # #series rows — tiny; consumed twice below
    )
    gmax_raw = lasts.max("max(ts_ns)")  # None on an empty samples stream
    gmax = int(gmax_raw) if gmax_raw is not None else 0

    def _finish(batch: pa.Table) -> pa.Table:
        last = batch.column("max(ts_ns)").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        gap = gmax - last
        return pa.table({
            "series_key": batch.column("series_key"),
            "last_ts_ns": pa.array(last, pa.int64()),
            "gap_ns": pa.array(gap, pa.int64()),
            "is_stale": pa.array(gap > stale_after_ns, pa.bool_()),
        })

    return lasts.map_batches(_finish, batch_format="pyarrow",
                             zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Per-series gap report (coverage monitoring)
# ---------------------------------------------------------------------------

def gap_report(samples_ds, *, gap_threshold_ns: int = HOUR_NS):
    """One row per series: sample count, covered span, largest
    inter-sample gap, and how many gaps exceed ``gap_threshold_ns`` —
    the coverage report behind "is this sensor's history contiguous?".

    Scale shape: the projected (series, ts, tie-break) stream shuffles
    ONCE on ``series_key``; each group task sorts its own series and
    reduces to a single row, so the output is #series rows.  For a
    hot single series compose with the time-bucketed co-partition used
    by ``asof.py`` (adjacency breaks only at bucket boundaries, fixed by
    a 1-row carry) — same contract as ``change_suppress``.
    """

    def _project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "series_key": batch.column("series_key"),
            "ts_ns": batch.column("ts").cast(pa.int64()),
            "doc_id": batch.column("doc_id"),
            "ordinal": batch.column("sample_ordinal").cast(pa.int64()),
        })

    def _report(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(_ORDER, kind="stable", ignore_index=True)
        ts = df["ts_ns"].to_numpy()
        gaps = np.diff(ts)
        return pd.DataFrame({
            "series_key": [df["series_key"].iloc[0]],
            "n_samples": np.array([len(ts)], np.int64),
            "span_ns": np.array([ts[-1] - ts[0]], np.int64),
            "max_gap_ns": np.array(
                [gaps.max() if len(gaps) else 0], np.int64),
            "n_gaps_over": np.array(
                [(gaps > gap_threshold_ns).sum()], np.int64),
        })

    return (
        samples_ds.map_batches(_project, batch_format="pyarrow",
                               zero_copy_batch=True)
        .groupby("series_key")
        .map_groups(_report, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Driver queries + oracles
# ---------------------------------------------------------------------------

from .analytics import _events_samples  # shared driver-sample helper


def _register() -> None:
    from ._events_sql import EVENTS_NUMERIC_SQL, EVENTS_SAMPLES_SQL
    from .registry import register

    register(
        "events_last_value",
        lambda sf: last_value(_events_samples(sf)),
        f"""
        WITH s AS ({EVENTS_SAMPLES_SQL}),
        r AS (
            SELECT series_key, ts_ns, value_num, value_str,
                   row_number() OVER (
                       PARTITION BY series_key
                       ORDER BY ts_ns DESC, doc_id DESC, ordinal DESC
                   ) AS rn
            FROM s
        )
        SELECT series_key, ts_ns, value_num, value_str FROM r WHERE rn = 1
        """,
    )

    register(
        "events_gap_report",
        lambda sf: gap_report(_events_samples(sf)),
        f"""
        WITH s AS ({EVENTS_SAMPLES_SQL}),
        l AS (
            SELECT series_key, ts_ns,
                   ts_ns - lag(ts_ns) OVER (
                       PARTITION BY series_key
                       ORDER BY ts_ns, doc_id, ordinal
                   ) AS gap
            FROM s
        )
        SELECT series_key,
               CAST(count(*) AS BIGINT) AS n_samples,
               CAST(max(ts_ns) - min(ts_ns) AS BIGINT) AS span_ns,
               CAST(COALESCE(max(gap), 0) AS BIGINT) AS max_gap_ns,
               CAST(count(*) FILTER (WHERE gap > {HOUR_NS}) AS BIGINT)
                   AS n_gaps_over
        FROM l GROUP BY series_key
        """,
    )

    register(
        "events_staleness",
        lambda sf: series_staleness(_events_samples(sf)),
        f"""
        WITH s AS ({EVENTS_SAMPLES_SQL}),
        lasts AS (
            SELECT series_key, max(ts_ns) AS last_ts_ns FROM s GROUP BY 1
        ),
        g AS (SELECT max(last_ts_ns) AS gmax FROM lasts)
        SELECT series_key, last_ts_ns,
               g.gmax - last_ts_ns AS gap_ns,
               (g.gmax - last_ts_ns) > {HOUR_NS} AS is_stale
        FROM lasts, g
        """,
    )

    register(
        "events_deadband",
        lambda sf: change_suppress(_events_samples(sf)),
        f"""
        WITH num AS ({EVENTS_NUMERIC_SQL}),
        l AS (
            SELECT series_key, ts_ns, value_num,
                   lag(value_num) OVER (
                       PARTITION BY series_key
                       ORDER BY ts_ns, doc_id, ordinal
                   ) AS pv
            FROM num
        )
        SELECT series_key, ts_ns, value_num
        FROM l WHERE pv IS NULL OR abs(value_num - pv) > 0.0
        """,
    )

    w1h = 3_600_000_000_000
    register(
        "events_top_series_1h",
        lambda sf: window_top_series(_events_samples(sf), window_ns=w1h, k=2),
        f"""
        WITH num AS ({EVENTS_NUMERIC_SQL}),
        a AS (
            SELECT series_key, ts_ns - (ts_ns % {w1h}) AS window_ns,
                   round(sum(value_num), 6) AS s, count(*) AS n
            FROM num GROUP BY series_key, window_ns
        ),
        m AS (
            SELECT window_ns, series_key, round(s / n, 6) AS mean FROM a
        ),
        r AS (
            SELECT window_ns, series_key, mean,
                   row_number() OVER (
                       PARTITION BY window_ns
                       ORDER BY mean DESC, series_key
                   ) AS rank
            FROM m
        )
        SELECT window_ns, series_key, mean, CAST(rank AS BIGINT) AS rank
        FROM r WHERE rank <= 2
        """,
    )


_register()
