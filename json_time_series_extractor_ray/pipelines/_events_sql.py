"""Shared DuckDB oracle fragments for the tokenized events pipeline.

``events_to_corpus`` renders each driver ``events`` row as the compact
payload ``{"time": <iso us>, "type": <event_type>, "user": <user_id>,
"value": <value>, "props": {"k": <int>}}`` tokenized to
``(doc_id, tokens, n_tok, source)``.  Extraction with recursive defaults
emits, per document and in document order: ``type`` (string), ``user``
(number), ``value`` (number), ``props/k`` (number), with ``/time`` consumed
as the timestamp (timestamp-property suppression).  Both ``__ray_entry__``
and the pipeline registries build their oracle SQL from these fragments so
the payload contract lives in exactly one place.
"""

from __future__ import annotations

def events_samples_sql(where: str = "") -> str:
    """The extracted-samples relation, optionally over a filtered events
    table (``where`` is a SQL predicate, e.g. ``ts >= '2024-01-15'`` —
    the oracle twin of predicate pushdown at the parquet read)."""
    w = f"WHERE {where}" if where else ""
    return f"""
    SELECT 'type' AS series_key, epoch_ns(ts) AS ts_ns,
           CAST(NULL AS DOUBLE) AS value_num, event_type AS value_str,
           printf('evt-%010d', event_id) AS doc_id, 0 AS ordinal
    FROM events {w}
    UNION ALL
    SELECT 'user', epoch_ns(ts), CAST(user_id AS DOUBLE), NULL,
           printf('evt-%010d', event_id), 1
    FROM events {w}
    UNION ALL
    SELECT 'value', epoch_ns(ts), value, NULL,
           printf('evt-%010d', event_id), 2
    FROM events {w}
    UNION ALL
    SELECT 'props/k', epoch_ns(ts),
           CAST(json_extract(props, '$.k') AS DOUBLE), NULL,
           printf('evt-%010d', event_id), 3
    FROM events {w}
    """


EVENTS_SAMPLES_SQL = events_samples_sql()

#: Numeric samples only (the rollup/downsample value domain).
EVENTS_NUMERIC_SQL = f"""
    SELECT series_key, ts_ns, value_num, doc_id, ordinal
    FROM ({EVENTS_SAMPLES_SQL})
    WHERE value_num IS NOT NULL
"""

def rollup_ctes(where: str = "", offset_ns: int = 0) -> str:
    """``offset_ns`` shifts window ALIGNMENT (calendar tiers, e.g. the
    Monday-aligned week): the floor becomes
    ``ts_ns - ((ts_ns - offset) % w)``.  Zero keeps the plain epoch floor
    so every existing ``.format(window_ns=...)`` caller is unchanged."""
    tpl = _ROLLUP_CTES_TEMPLATE
    if offset_ns:
        tpl = tpl.replace(
            "ts_ns - (ts_ns % {window_ns})",
            f"ts_ns - ((ts_ns - {offset_ns}) % {{window_ns}})",
        )
    return tpl.replace("__SAMPLES__", events_samples_sql(where))


_ROLLUP_CTES_TEMPLATE = """
    s AS (__SAMPLES__),
    num AS (SELECT * FROM s WHERE value_num IS NOT NULL),
    b AS (
        SELECT series_key, ts_ns, value_num AS v, doc_id, ordinal,
               ts_ns - (ts_ns % {window_ns}) AS window_ns
        FROM num
    ),
    rn_ AS (
        SELECT *, row_number() OVER (
            PARTITION BY series_key, window_ns
            ORDER BY ts_ns DESC, doc_id DESC, ordinal DESC
        ) AS rn
        FROM b
    ),
    rollup_ AS (
        SELECT series_key, window_ns,
               min(v) AS min, max(v) AS max,
               sum(v) / count(*) AS mean,
               sum(v) AS sum,
               count(*) AS count,
               max(CASE WHEN rn = 1 THEN v END) AS last,
               max(CASE WHEN rn = 1 THEN ts_ns END) AS last_ts_ns
        FROM rn_
        GROUP BY series_key, window_ns
    )
"""

ROLLUP_CTES = rollup_ctes()


def rollup_tier_sql(window_ns: int, where: str = "",
                    offset_ns: int = 0) -> str:
    """Tumbling-window rollup over the numeric series of the events payloads.

    Mirrors stages/rollup.py: only numeric samples participate; ``last`` is
    the value at maximal (ts, doc_id, ordinal); mean is sum/count (exact
    cascade); float sum/mean rounded to 6 decimals on both sides because
    summation order differs between engines, with mean computed from the
    ROUNDED sum (exact decimal midpoints would otherwise flip on
    cross-engine summation ULP noise).
    """
    ctes = rollup_ctes(where, offset_ns).format(window_ns=window_ns)
    return f"""
    WITH {ctes}
    SELECT series_key, window_ns, min, max,
           round(round(sum, 6) / count, 6) AS mean, round(sum, 6) AS sum,
           count, last, last_ts_ns
    FROM rollup_
    """


def rollup_locf_sql(window_ns: int) -> str:
    """Gap-filled (LOCF) 1-tier rollup: the per-series window grid spans
    first..last observed window; interior misses carry the previous
    window's ``last`` (stages/gapfill.py semantics: filled min/max/mean =
    carried value, sum = 0, count = 0)."""
    ctes = ROLLUP_CTES.format(window_ns=window_ns)
    return f"""
    WITH {ctes},
    grid AS (
        SELECT series_key,
               unnest(generate_series(min(window_ns), max(window_ns),
                                      {window_ns})) AS window_ns
        FROM rollup_
        GROUP BY series_key
    ),
    j AS (
        SELECT g.series_key, g.window_ns,
               r.min AS o_min, r.max AS o_max, r.mean AS o_mean,
               r.sum AS o_sum, r.count AS o_count, r.last AS o_last,
               r.last_ts_ns AS o_last_ts
        FROM grid g
        LEFT JOIN rollup_ r
          ON r.series_key = g.series_key AND r.window_ns = g.window_ns
    ),
    f AS (
        SELECT series_key, window_ns,
               CASE WHEN o_count IS NULL THEN 'locf' ELSE '' END AS fill,
               last_value(o_last IGNORE NULLS) OVER w AS carried,
               last_value(o_last_ts IGNORE NULLS) OVER w AS carried_ts,
               o_min, o_max, o_mean, o_sum, o_count
        FROM j
        WINDOW w AS (PARTITION BY series_key ORDER BY window_ns
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT series_key, window_ns, fill,
           COALESCE(o_min, carried) AS min,
           COALESCE(o_max, carried) AS max,
           CASE WHEN o_count IS NULL THEN round(carried, 6)
                ELSE round(round(o_sum, 6) / o_count, 6) END AS mean,
           round(COALESCE(o_sum, 0), 6) AS sum,
           COALESCE(o_count, 0) AS count,
           carried AS last,
           carried_ts AS last_ts_ns
    FROM f
    """


def rollup_linear_sql(window_ns: int) -> str:
    """Gap-filled (linear) 1-tier rollup, exactly value-hashable: both
    engines interpolate over the ROUNDED window means
    ``round(round(sum,6)/count,6)`` (bit-identical doubles on both sides,
    unlike raw means whose summation-order ULP noise differs), with the
    same IEEE expression ``prev + ((w-pw)/(nw-pw)) * (next-prev)`` —
    stages/gapfill.py linear semantics with ``interp_round_digits=6``.
    Filled rows: min=max=last=interp, mean=round(interp,6), sum=0,
    count=0, last_ts carried from the previous observed window."""
    ctes = ROLLUP_CTES.format(window_ns=window_ns)
    return f"""
    WITH {ctes},
    r2 AS (
        SELECT series_key, window_ns, min, max, sum, count, last,
               last_ts_ns,
               round(round(sum, 6) / count, 6) AS mean_r
        FROM rollup_
    ),
    grid AS (
        SELECT series_key,
               unnest(generate_series(min(window_ns), max(window_ns),
                                      {window_ns})) AS window_ns
        FROM r2
        GROUP BY series_key
    ),
    j AS (
        SELECT g.series_key, g.window_ns,
               r.min AS o_min, r.max AS o_max, r.mean_r AS o_mean,
               r.sum AS o_sum, r.count AS o_count, r.last AS o_last,
               r.last_ts_ns AS o_last_ts,
               CASE WHEN r.count IS NOT NULL THEN g.window_ns END AS o_w
        FROM grid g
        LEFT JOIN r2 r
          ON r.series_key = g.series_key AND r.window_ns = g.window_ns
    ),
    f AS (
        SELECT series_key, window_ns, o_min, o_max, o_mean, o_sum,
               o_count, o_last,
               CASE WHEN o_count IS NULL THEN 'linear' ELSE '' END AS fill,
               last_value(o_mean IGNORE NULLS) OVER wp AS prev_m,
               last_value(o_w IGNORE NULLS) OVER wp AS prev_w,
               last_value(o_last_ts IGNORE NULLS) OVER wp AS carried_ts,
               first_value(o_mean IGNORE NULLS) OVER wn AS next_m,
               first_value(o_w IGNORE NULLS) OVER wn AS next_w
        FROM j
        WINDOW wp AS (PARTITION BY series_key ORDER BY window_ns
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY series_key ORDER BY window_ns
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    v AS (
        SELECT *, CASE WHEN fill = '' THEN NULL ELSE
            prev_m + (CAST(window_ns - prev_w AS DOUBLE)
                      / CAST(next_w - prev_w AS DOUBLE))
                     * (next_m - prev_m)
        END AS interp
        FROM f
    )
    SELECT series_key, window_ns, fill,
           COALESCE(o_min, interp) AS min,
           COALESCE(o_max, interp) AS max,
           CASE WHEN o_count IS NULL THEN round(interp, 6)
                ELSE o_mean END AS mean,
           round(COALESCE(o_sum, 0), 6) AS sum,
           COALESCE(o_count, 0) AS count,
           COALESCE(o_last, interp) AS last,
           carried_ts AS last_ts_ns
    FROM v
    """
