"""As-of join: a time-series operator Ray Data has no primitive for.

``asof_join(left, right, by=..., left_ts=..., right_ts=...)`` attaches, to
every left row, the latest right row of the same ``by`` key whose
timestamp is <= the left timestamp (inner semantics: unmatched left rows
drop, mirroring DuckDB's ``ASOF JOIN``).

Composition (no raw Ray tasks needed):

1. both sides are projected to a shared schema with a ``__side`` tag and
   unioned — Ray Data has no cogroup, so the union + one
   ``groupby(by)`` is the co-partitioning step;
2. ``map_groups`` splits the group back into sides and runs a local
   vectorized backward ``searchsorted`` merge.

PARTITIONING ASSUMPTION (documented per the custom-operator rule): all
rows of one ``by`` key — both sides — must fit in one group task.  Keys
are device/user/entity ids with bounded history; when a single key's
right side is huge, pre-dedupe it (one row per (key, ts)) before the
join, which this module does for determinism anyway.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _project_side(ds, side: str, by: str, ts: str, cols, all_cols):
    """Project one input onto the union schema (missing cols -> null)."""

    def _fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ts_col = batch.column(ts)
        if pa.types.is_date(ts_col.type):
            # date32/date64 would cast to days/ms since epoch and silently
            # mis-compare against ns — normalize through timestamp first.
            ts_col = ts_col.cast(pa.timestamp("ns"))
        elif pa.types.is_timestamp(ts_col.type):
            ts_col = ts_col.cast(pa.timestamp("ns"))  # normalize units -> ns
        elif not pa.types.is_integer(ts_col.type):
            raise TypeError(
                f"asof/range join ts column {ts!r} must be timestamp, date "
                f"or integer ns, got {ts_col.type}"
            )
        out = {
            "__by": batch.column(by),
            "__ts": ts_col.cast(pa.int64()),
            "__side": pa.array([side] * n, pa.string()),
        }
        for name, typ in all_cols:
            if name in cols:
                out[name] = batch.column(name).cast(typ)
            else:
                out[name] = pa.nulls(n, typ)
        return pa.table(out)

    return ds.map_batches(_fn, batch_format="pyarrow", zero_copy_batch=True)


def asof_join(left_ds, right_ds, *, by: str, left_ts: str, right_ts: str,
              left_cols: dict, right_cols: dict):
    """Inner as-of join (right.ts <= left.ts, latest wins).

    ``left_cols`` / ``right_cols``: {column_name: pyarrow_type} carried
    from each side.  The right side is deduped to one row per (key, ts)
    — keeping the row that sorts last on all carried columns — so the
    match is deterministic in both engines.
    """
    all_cols = [(n, t) for n, t in {**left_cols, **right_cols}.items()]
    l = _project_side(left_ds, "l", by, left_ts, set(left_cols), all_cols)
    r = _project_side(right_ds, "r", by, right_ts, set(right_cols), all_cols)
    unioned = l.union(r)

    right_names = list(right_cols)
    left_names = list(left_cols)

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["__side"] == "l"]
        right = df[df["__side"] == "r"]
        empty = pd.DataFrame({
            **{c: pd.Series(dtype=left[c].dtype) for c in left_names},
            **{c: pd.Series(dtype=right[c].dtype) for c in right_names},
            "__by": pd.Series(dtype=df["__by"].dtype),
            "__ts": pd.Series(dtype="int64"),
        })
        if left.empty or right.empty:
            return empty
        # deterministic right side: one row per ts, last in column order
        right = right.sort_values(["__ts"] + right_names, kind="stable")
        right = right.drop_duplicates("__ts", keep="last")
        left = left.sort_values("__ts", kind="stable")
        r_ts = right["__ts"].to_numpy()
        idx = np.searchsorted(r_ts, left["__ts"].to_numpy(), side="right") - 1
        matched = idx >= 0
        if not matched.any():
            return empty
        left_m = left[matched]
        picks = right.iloc[idx[matched]]
        out = {c: left_m[c].to_numpy() for c in left_names}
        out.update({c: picks[c].to_numpy() for c in right_names})
        out["__by"] = left_m["__by"].to_numpy()
        out["__ts"] = left_m["__ts"].to_numpy()
        return pd.DataFrame(out)

    merged = unioned.groupby("__by").map_groups(_merge, batch_format="pandas")

    # The union projects each side's missing columns as null, so pandas
    # null-upcasts int64 carried columns to float64 inside ``_merge``
    # (round-1 driver hash failure: ``1234.0`` vs ``1234``).  Cast every
    # carried column back to its declared Arrow type on the way out.
    decl = dict(all_cols)

    def _recast(batch: pa.Table) -> pa.Table:
        cols = {}
        for name in batch.column_names:
            col = batch.column(name)
            want = decl.get(name)
            if want is not None and col.type != want:
                col = col.cast(want)
            cols[name] = col
        return pa.table(cols)

    return merged.map_batches(_recast, batch_format="pyarrow",
                              zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Driver query: each event joined as-of against its user's order history
# ---------------------------------------------------------------------------

def _q_events_asof_orders(sf_dir: str):
    import ray

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"],
    )
    joined = asof_join(
        events.map_batches(
            lambda b: b.rename_columns(
                ["event_id", "ts", "__key"]
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        orders.map_batches(
            lambda b: b.rename_columns(
                ["__key", "o_orderdate", "o_orderkey", "o_totalprice"]
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        by="__key",
        left_ts="ts",
        right_ts="o_orderdate",
        left_cols={"event_id": pa.int64()},
        right_cols={"o_orderkey": pa.int64(), "o_totalprice": pa.float64()},
    )

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "ts_ns": batch.column("__ts"),
                "user_id": batch.column("__by").cast(pa.int64()),
                "o_orderkey": batch.column("o_orderkey"),
                "o_totalprice": batch.column("o_totalprice"),
            }
        )

    return joined.map_batches(_shape, batch_format="pyarrow", zero_copy_batch=True)


from .registry import register  # noqa: E402

register(
    "events_asof_orders",
    _q_events_asof_orders,
    """
    WITH ranked AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey, o_orderdate
                   ORDER BY o_orderkey DESC, o_totalprice DESC
               ) AS rn
        FROM orders
    ),
    deduped AS (SELECT * FROM ranked WHERE rn = 1)
    SELECT e.event_id, epoch_ns(e.ts) AS ts_ns, e.user_id,
           d.o_orderkey, d.o_totalprice
    FROM events e
    ASOF JOIN deduped d
      ON e.user_id = d.o_custkey AND e.ts >= d.o_orderdate
    """,
)
