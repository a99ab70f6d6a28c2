"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship tokenized pipeline (events -> mandated corpus
table -> detokenize -> extract -> rollup ladder) on sf0.001.  ``queries()``
exposes each implemented operator as a callable over an ``sf_dir``;
``oracle_sql()`` holds the DuckDB-equivalent SQL for every
SQL-expressible one (same column names both sides — the driver hashes
values after sorting columns by name).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from json_time_series_extractor_ray.pipelines.timeseries import (
    events_corpus_dataset,
    extract_and_rollup,
    extract_pipeline,
    rollup_tier_for_compare,
    samples_for_compare,
)

SF0001 = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# Shared SQL fragments (oracle side of the tokenized events pipeline).
#
# events_to_corpus renders each event row as the compact payload
#   {"time": <iso us>, "type": <event_type>, "user": <user_id>,
#    "value": <value>, "props": {"k": <int>}}
# tokenized to (doc_id, tokens, n_tok, source).  Extraction with recursive
# defaults emits, per document and in document order:
#   type (string), user (number), value (number), props/k (number)
# with /time consumed as the timestamp (timestamp-property suppression).
# ---------------------------------------------------------------------------

_EVENTS_SAMPLES_SQL = """
    SELECT 'type' AS series_key, epoch_ns(ts) AS ts_ns,
           CAST(NULL AS DOUBLE) AS value_num, event_type AS value_str,
           printf('evt-%010d', event_id) AS doc_id, 0 AS ordinal
    FROM events
    UNION ALL
    SELECT 'user', epoch_ns(ts), CAST(user_id AS DOUBLE), NULL,
           printf('evt-%010d', event_id), 1
    FROM events
    UNION ALL
    SELECT 'value', epoch_ns(ts), value, NULL,
           printf('evt-%010d', event_id), 2
    FROM events
    UNION ALL
    SELECT 'props/k', epoch_ns(ts),
           CAST(json_extract(props, '$.k') AS DOUBLE), NULL,
           printf('evt-%010d', event_id), 3
    FROM events
"""


def _rollup_tier_sql(window_ns: int) -> str:
    """Tumbling-window rollup over the numeric series of the events payloads.

    Mirrors stages/rollup.py: only numeric samples participate; ``last`` is
    the value at maximal (ts, doc_id, ordinal); mean is sum/count (exact
    cascade); float sum/mean rounded to 6 decimals on both sides because
    summation order differs between engines.
    """
    return f"""
    WITH s AS ({_EVENTS_SAMPLES_SQL}),
    num AS (SELECT * FROM s WHERE value_num IS NOT NULL),
    b AS (
        SELECT series_key, ts_ns, value_num AS v, doc_id, ordinal,
               ts_ns - (ts_ns % {window_ns}) AS window_ns
        FROM num
    ),
    r AS (
        SELECT *, row_number() OVER (
            PARTITION BY series_key, window_ns
            ORDER BY ts_ns DESC, doc_id DESC, ordinal DESC
        ) AS rn
        FROM b
    )
    SELECT series_key, window_ns,
           min(v) AS min, max(v) AS max,
           round(sum(v) / count(*), 6) AS mean,
           round(sum(v), 6) AS sum,
           count(*) AS count,
           max(CASE WHEN rn = 1 THEN v END) AS last,
           max(CASE WHEN rn = 1 THEN ts_ns END) AS last_ts_ns
    FROM r
    GROUP BY series_key, window_ns
    """


_WINDOW_NS = {"1m": 60_000_000_000, "1h": 3_600_000_000_000, "1d": 86_400_000_000_000}


def _events_samples(sf_dir: str):
    corpus = events_corpus_dataset(sf_dir)
    samples = extract_pipeline(corpus)
    return samples_for_compare(samples, with_ordinal=True)


def _events_rollup(sf_dir: str, tier: str):
    corpus = events_corpus_dataset(sf_dir)
    rollups = extract_and_rollup(corpus, tiers=("1m", "1h", "1d"))
    return rollup_tier_for_compare(rollups, tier)


def entry() -> Any:
    """Flagship pipeline on sf0.001: events -> tokenized corpus -> extract
    -> full raw->1m->1h->1d rollup ladder.  Returns the rollup Dataset."""
    corpus = events_corpus_dataset(SF0001)
    return extract_and_rollup(corpus, tiers=("1m", "1h", "1d"))


def queries() -> dict[str, Callable[[str], Any]]:
    q: dict[str, Callable[[str], Any]] = {
        # -- tokenized time-series pipeline (SURVEY.md §2.1-2.5, §2.6 ladder)
        "events_extract_samples": _events_samples,
        "events_rollup_1m": lambda sf: _events_rollup(sf, "1m"),
        "events_rollup_1h": lambda sf: _events_rollup(sf, "1h"),
        "events_rollup_1d": lambda sf: _events_rollup(sf, "1d"),
    }
    from json_time_series_extractor_ray.pipelines import registry

    q.update(registry.extra_queries())
    return q


def oracle_sql() -> dict[str, str]:
    o = {
        "events_extract_samples": f"SELECT * FROM ({_EVENTS_SAMPLES_SQL})",
        "events_rollup_1m": _rollup_tier_sql(_WINDOW_NS["1m"]),
        "events_rollup_1h": _rollup_tier_sql(_WINDOW_NS["1h"]),
        "events_rollup_1d": _rollup_tier_sql(_WINDOW_NS["1d"]),
    }
    from json_time_series_extractor_ray.pipelines import registry

    o.update(registry.extra_oracle_sql())
    return o
