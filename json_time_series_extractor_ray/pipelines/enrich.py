"""Enrichment patterns: broadcast small-side join + distinct.

* :func:`broadcast_join` — THE scale pattern for dimension lookups: the
  small side is read driver-side once, put in the object store
  (``ray.put``), and every ``map_batches`` task dereferences the same
  shared copy for a vectorized hash lookup.  No shuffle; the big side
  streams.  (A ``groupby``-based join would move every event row.)
* ``distinct`` — project + one groupby on the projected key(s); the
  per-block combiner (Arrow ``group_by``) collapses duplicates before the
  shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ._util import round_half_away
from .registry import register


def broadcast_join(big_ds, lookup: dict, *, key: str, value_name: str,
                   value_type=pa.string(), drop_misses: bool = True):
    """Map ``big_ds[key]`` through a broadcast dict (vectorized via a
    pandas-backed index map per worker task)."""
    import ray

    lookup_ref = ray.put(lookup)  # one object-store copy, shared by all tasks

    def _join(batch: pa.Table) -> pa.Table:
        table = ray.get(lookup_ref)  # zero-copy-ish local dereference
        keys = batch.column(key).to_pandas()
        mapped = keys.map(table)
        out = batch.append_column(value_name, pa.array(mapped, value_type))
        if drop_misses:
            out = out.filter(pc.is_valid(out.column(value_name)))
        return out

    return big_ds.map_batches(_join, batch_format="pyarrow", zero_copy_batch=True)


def distinct(ds, columns):
    """Distinct rows over ``columns`` — per-block Arrow combiner, then one
    groupby keyed on all columns."""
    cols = list(columns)

    def _local(batch: pa.Table) -> pa.Table:
        return batch.select(cols).group_by(cols).aggregate([])

    def _first(df: pd.DataFrame) -> pd.DataFrame:
        return df.iloc[:1][cols]

    local = ds.map_batches(_local, batch_format="pyarrow", zero_copy_batch=True)
    return local.groupby(cols).map_groups(_first, batch_format="pandas")


# ---------------------------------------------------------------------------
# Driver queries
# ---------------------------------------------------------------------------

def _q_events_user_nation(sf_dir: str):
    """Each event enriched with its user's nation name: customer+nation is
    the broadcast small side (read driver-side, shipped once via ray.put);
    the events stream is never shuffled."""
    import duckdb
    import ray

    con = duckdb.connect()
    pairs = con.execute(
        f"""
        SELECT c.c_custkey, n.n_name
        FROM '{sf_dir}/customer.parquet' c
        JOIN '{sf_dir}/nation.parquet' n ON c.c_nationkey = n.n_nationkey
        """
    ).fetchall()
    con.close()
    lookup = {k: v for k, v in pairs}

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    )
    return broadcast_join(
        events, lookup, key="user_id", value_name="nation_name"
    )


def _q_distinct_lang_source(sf_dir: str):
    import ray

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source"]
    )
    return distinct(docs, ["lang", "source"])


register(
    "events_user_nation",
    _q_events_user_nation,
    """
    SELECT e.event_id, e.user_id, n.n_name AS nation_name
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)

register(
    "distinct_lang_source",
    _q_distinct_lang_source,
    "SELECT DISTINCT lang, source FROM documents",
)


def broadcast_semi_join(big_ds, keys, *, key: str, anti: bool = False):
    """Semi/anti-join against a broadcast key set: the set ships once via
    ``ray.put``; each task filters its block with a vectorized ``is_in``.
    The big side streams — membership joins never shuffle."""
    import ray

    keys_ref = ray.put(pa.array(sorted(keys)))

    def _filter(batch: pa.Table) -> pa.Table:
        value_set = ray.get(keys_ref)
        return batch.filter(pc.is_in(batch.column(key), value_set=value_set))

    def _filter_anti(batch: pa.Table) -> pa.Table:
        value_set = ray.get(keys_ref)
        mask = pc.is_in(batch.column(key), value_set=value_set)
        return batch.filter(pc.invert(mask.fill_null(False)))

    return big_ds.map_batches(
        _filter_anti if anti else _filter,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _q_heavy_user_events(sf_dir: str):
    """Composition: Misra-Gries top-20 users (driver-side, exact at this
    capacity) -> broadcast SEMI-join filters the event stream to those
    users.  Two stages, zero shuffles."""
    import ray

    from .sketches import heavy_hitters

    users_ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id"]
    )
    top = heavy_hitters(users_ds, column="user_id", top=20)
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    )
    return broadcast_semi_join(
        events, top.column("user_id").to_pylist(), key="user_id"
    )


register(
    "events_heavy_user_events",
    _q_heavy_user_events,
    """
    SELECT event_id, user_id
    FROM events
    WHERE user_id IN (
        SELECT user_id FROM (
            SELECT user_id, count(*) AS n
            FROM events GROUP BY user_id
            ORDER BY n DESC, user_id LIMIT 20
        )
    )
    """,
)


def global_extremes(events_ds, *, n: int = 50):
    """Global top-n and bottom-n rows by ``(value, event_id)`` with ZERO
    shuffles: a per-block partial top/bottom-k combiner (each block emits
    at most ``2n`` candidate rows, full-key lexsort so boundary ties are
    exact) followed by one tiny driver-side merge over ``O(blocks x 2n)``
    candidates.  Replaces round 1's double global sort — at 100 TB two
    range-partitioned sorts move every block twice for a 100-row answer;
    the combiner moves only candidates (same pattern as the brute-force
    ANN top-k in ``similarity.py``)."""
    import numpy as np
    import pyarrow as pa
    import ray

    def _order(v, e, descending):
        # lexsort: primary value (desc via negation), tie-break event_id asc
        return np.lexsort((e, -v if descending else v))

    def _partial(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        e = batch.column("event_id").to_numpy(zero_copy_only=False)
        keep = np.unique(np.concatenate(
            [_order(v, e, True)[:n], _order(v, e, False)[:n]]
        ))
        return pa.table({
            "event_id": pa.array(e[keep], batch.column("event_id").type),
            "value": pa.array(v[keep], batch.column("value").type),
        })

    cand = events_ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    # Candidate set is tiny (<= 2n per block) — the one safe materialize.
    parts = [t for t in ray.get(cand.to_arrow_refs()) if t.num_rows]
    if not parts:  # empty input: empty result, not a concat_tables crash
        return ray.data.from_arrow(pa.table({
            "event_id": pa.array([], pa.int64()),
            "value": pa.array([], pa.float64()),
            "side": pa.array([], pa.string()),
        }))
    tbl = pa.concat_tables(parts)
    v = tbl.column("value").to_numpy(zero_copy_only=False)
    e = tbl.column("event_id").to_numpy(zero_copy_only=False)
    top = _order(v, e, True)[:n]
    bottom = _order(v, e, False)[:n]
    idx = np.concatenate([top, bottom])
    out = pa.table({
        "event_id": pa.array(e[idx], tbl.column("event_id").type),
        "value": pa.array(v[idx], tbl.column("value").type),
        "side": pa.array(["top"] * len(top) + ["bottom"] * len(bottom),
                         pa.string()),
    })
    return ray.data.from_arrow(out)


def _q_value_extremes(sf_dir: str):
    import ray

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    )
    return global_extremes(events, n=50)


register(
    "events_value_extremes",
    _q_value_extremes,
    """
    (SELECT event_id, value, 'top' AS side
     FROM events ORDER BY value DESC, event_id LIMIT 50)
    UNION ALL
    (SELECT event_id, value, 'bottom' AS side
     FROM events ORDER BY value ASC, event_id LIMIT 50)
    """,
)


# ---------------------------------------------------------------------------
# Per-user event-type entropy (behavioural diversity index)
# ---------------------------------------------------------------------------

def user_type_entropy(events_ds):
    """Per user: Shannon entropy (bits) of their event-type mix, plus
    event and distinct-type counts — the behavioural-diversity twin of
    ``doc_char_entropy`` (0 = single-type bots, log2(|types|) = uniform
    explorers).

    Scale shape: a per-block ``(user, type, n)`` combiner bounds the
    shuffle at block x users x types rows; ONE ``user_id`` groupby merges
    the partials and computes the entropy over the summed counts (group
    size = blocks x types, never raw events).  Probabilities are exact
    int-over-int divisions in float64 and entropies round-6 — the
    ``doc_char_entropy`` parity rule (cross-engine log2 noise is ~1 ulp,
    far inside the rounding margin).
    """
    import pyarrow.compute as pc

    def _partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.is_valid(batch.column("user_id")),
            pc.is_valid(batch.column("event_type"))))
        df = pd.DataFrame({
            "user_id": batch.column("user_id").to_numpy(
                zero_copy_only=False),
            "event_type": batch.column("event_type").to_pandas(),
        })
        g = df.groupby(["user_id", "event_type"], sort=False) \
            .size().rename("n").reset_index()
        return pa.table({
            "user_id": pa.array(g["user_id"].to_numpy(np.int64), pa.int64()),
            "event_type": pa.array(g["event_type"], pa.string()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
        })

    def _entropy(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype=np.int64),
                "n_events": pd.Series([], dtype=np.int64),
                "n_types": pd.Series([], dtype=np.int64),
                "type_entropy": pd.Series([], dtype=np.float64),
            })
        per_type = df.groupby("event_type", sort=False)["n"].sum()
        tot = float(per_type.sum())
        p = per_type.to_numpy(np.float64) / tot
        ent = float(-(p * np.log2(p)).sum())
        return pd.DataFrame({
            "user_id": np.array([df["user_id"].iloc[0]], np.int64),
            "n_events": np.array([int(per_type.sum())], np.int64),
            "n_types": np.array([len(per_type)], np.int64),
            "type_entropy": round_half_away(np.array([ent]), 6),
        })

    return (
        events_ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
        .groupby("user_id")
        .map_groups(_entropy, batch_format="pandas")
    )


def _q_user_type_entropy(sf_dir: str):
    import ray

    return user_type_entropy(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]))


register(
    "events_user_type_entropy",
    _q_user_type_entropy,
    """
    WITH c AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1, 2
    ),
    t AS (
        SELECT user_id, sum(n) AS tot, count(*) AS n_types
        FROM c GROUP BY 1
    )
    SELECT c.user_id,
           CAST(t.tot AS BIGINT) AS n_events,
           CAST(t.n_types AS BIGINT) AS n_types,
           round(-sum((CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
                      * log2(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))), 6)
               AS type_entropy
    FROM c JOIN t USING (user_id)
    GROUP BY c.user_id, t.tot, t.n_types
    """,
)
