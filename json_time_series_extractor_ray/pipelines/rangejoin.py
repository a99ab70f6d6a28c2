"""Range (interval) join: the second time-series join Ray Data has no
primitive for (the first is ``asof.py``).

``range_join(left, right, by=..., ...)`` attaches, to every left row,
EVERY right interval of the same ``by`` key that contains the left
timestamp (``start <= ts <= end``, both inclusive — SQL ``BETWEEN``
semantics).  One left row can match many intervals; unmatched left rows
drop (inner semantics).

Composition mirrors the as-of join: project both sides onto a tagged
union schema, ONE ``groupby(hash(by) % 64)`` shard co-partition (Ray
Data has no cogroup; shard-merge, never one Ray group per key), then a
whole-shard vectorized double-``searchsorted`` sweep over composite
(key-code, ts-rank) values — for each interval, the contained left rows
are one contiguous slice of the (code, ts)-sorted left side,
materialized with a repeat/arange gather (no Python loop over rows or
keys).

PARTITIONING ASSUMPTION (documented per the custom-operator rule): by
default all rows of one ``by`` key — both sides — land in one shard
task, the same contract as the as-of join.  ``bucket_ns=...`` lifts it:
groups become ``(key, ts // bucket_ns)`` with intervals replicated to
every bucket they overlap, so no hot key can exceed one key x one bucket
(value-identical, driver-checked via the same-oracle twin
``events_session_assign_bucketed``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .asof import (
    _group_codes,
    _project_side,
    _tag_by_bucket_shard,
    _tag_by_shard,
)


def _project_intervals(ds, by: str, start: str, end: str, cols, all_cols):
    def _fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows

        def _ns(name):
            col = batch.column(name)
            if pa.types.is_timestamp(col.type):
                col = col.cast(pa.timestamp("ns"))
            return col.cast(pa.int64())

        # Column order MUST equal the left side's (union concatenates
        # blocks; schema order is part of the contract): __by, __ts,
        # __side, carried columns, then __end.
        out = {
            "__by": batch.column(by),
            "__ts": _ns(start),  # interval start rides the shared ts slot
            "__side": pa.array(["r"] * n, pa.string()),
        }
        for name, typ in all_cols:
            if name in cols:
                out[name] = batch.column(name).cast(typ)
            else:
                out[name] = pa.nulls(n, typ)
        out["__end"] = _ns(end)
        return pa.table(out)

    return ds.map_batches(_fn, batch_format="pyarrow", zero_copy_batch=True)


def range_join(left_ds, right_ds, *, by: str, left_ts: str,
               right_start: str, right_end: str,
               left_cols: dict, right_cols: dict,
               bucket_ns: int | None = None):
    """Inner interval join (``right.start <= left.ts <= right.end``).

    ``left_cols`` / ``right_cols``: {column_name: pyarrow_type} carried
    from each side.

    ``bucket_ns``: co-partition on ``(by, ts // bucket_ns)`` so one hot
    key's rows never exceed a single group task (the 100 TB-safe mode,
    mirroring ``asof_join``).  Each left row lands in exactly one bucket;
    each interval is replicated to every bucket it overlaps (bounded by
    interval length / bucket_ns — no carry-over state needed, unlike the
    as-of join), so every (left row, containing interval) pair meets in
    exactly one group and the output is value-identical to the unbucketed
    path (pinned by test)."""
    all_cols = [(n, t) for n, t in {**left_cols, **right_cols}.items()]
    l = _project_side(left_ds, "l", by, left_ts, set(left_cols), all_cols)

    def _add_end(batch: pa.Table) -> pa.Table:
        # 0 sentinel, NOT null: a null would float64-decay the whole
        # int64 __end column in the pandas shard frames and round
        # ns-scale interval ends (> 2^53) off the exact integer ranks
        # the vectorized merge compares against.  Left __end is never
        # read.
        import numpy as np

        return batch.append_column(
            "__end", pa.array(np.zeros(batch.num_rows, np.int64),
                              pa.int64()))

    l = l.map_batches(_add_end, batch_format="pyarrow", zero_copy_batch=True)
    r = _project_intervals(right_ds, by, right_start, right_end,
                           set(right_cols), all_cols)

    if bucket_ns is not None:
        def _bucket_left(batch: pa.Table) -> pa.Table:
            ts = batch.column("__ts").to_numpy(zero_copy_only=False)
            return batch.append_column(
                "__bucket", pa.array(ts // bucket_ns, pa.int64())
            )

        def _replicate_intervals(batch: pa.Table) -> pa.Table:
            start = batch.column("__ts").to_numpy(zero_copy_only=False)
            end = batch.column("__end").to_numpy(zero_copy_only=False)
            b0 = start // bucket_ns
            b1 = end // bucket_ns
            # empty (end < start) intervals replicate nowhere, matching the
            # unbucketed searchsorted (hi < lo -> zero matches)
            reps = np.maximum(b1 - b0 + 1, 0).astype(np.int64)
            idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), reps)
            starts = np.cumsum(reps) - reps
            bucket = (
                np.arange(int(reps.sum()), dtype=np.int64)
                - np.repeat(starts, reps)
                + np.repeat(b0, reps)
            )
            out = batch.take(pa.array(idx))
            return out.append_column("__bucket", pa.array(bucket, pa.int64()))

        # shard tags ride pre-union (fused MapBatches — no extra pass)
        l = l.map_batches(_bucket_left, batch_format="pyarrow",
                          zero_copy_batch=True) \
             .map_batches(_tag_by_bucket_shard, batch_format="pyarrow",
                          zero_copy_batch=True)
        r = r.map_batches(_replicate_intervals, batch_format="pyarrow",
                          zero_copy_batch=True) \
             .map_batches(_tag_by_bucket_shard, batch_format="pyarrow",
                          zero_copy_batch=True)
        group_keys = ("__by", "__bucket")
    else:
        l = l.map_batches(_tag_by_shard, batch_format="pyarrow",
                          zero_copy_batch=True)
        r = r.map_batches(_tag_by_shard, batch_format="pyarrow",
                          zero_copy_batch=True)
        group_keys = ("__by",)

    unioned = l.union(r)

    left_names = list(left_cols)
    right_names = list(right_cols)

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
        left = left.sort_values("__ts", kind="stable")
        l_ts = left["__ts"].to_numpy()
        starts = right["__ts"].to_numpy()
        ends = right["__end"].to_numpy()
        lo = np.searchsorted(l_ts, starts, side="left")
        hi = np.searchsorted(l_ts, ends, side="right")
        # empty intervals (end < start) give hi < lo: zero matches
        counts = np.maximum(hi - lo, 0)
        total = int(counts.sum())
        if total == 0:
            return empty
        # Gather: interval i contributes left rows lo[i]..hi[i] — one
        # repeat/arange construction, no per-interval Python loop.
        r_idx = np.repeat(np.arange(len(starts)), counts)
        cum = np.concatenate(([0], np.cumsum(counts)[:-1]))
        l_idx = np.arange(total) - np.repeat(cum, counts) + np.repeat(lo, counts)
        left_m = left.iloc[l_idx]
        right_m = right.iloc[r_idx]
        # .array: nullable-int carried columns stay IntegerArrays — a
        # numpy conversion would float64-round values > 2^53
        out = {c: left_m[c].array for c in left_names}
        out.update({c: right_m[c].array for c in right_names})
        out["__by"] = left_m["__by"].to_numpy()
        out["__ts"] = left_m["__ts"].to_numpy()
        return pd.DataFrame(out)

    def _shard_merge(tbl: pa.Table) -> pd.DataFrame:
        """Whole-shard vectorized sweep: every key's interval slices via
        ONE composite-rank double-searchsorted (same trick as
        ``asof._make_shard_merge``), per-key loop only on int64
        overflow."""
        from ._util import shard_to_pandas

        df = shard_to_pandas(tbl).drop(columns="__shard")
        if df.empty:
            return _merge(df)
        codes = _group_codes(df, list(group_keys))
        is_l = (df["__side"] == "l").to_numpy()
        left = df[is_l]
        right = df[~is_l]
        if left.empty or right.empty:
            return _merge(df.iloc[0:0])
        l_ts = left["__ts"].to_numpy(np.int64)
        code_l = codes[is_l]
        order = np.lexsort((l_ts, code_l))  # (code, ts) ascending, stable
        left = left.iloc[order]
        l_ts = l_ts[order]
        code_l = code_l[order]
        starts = right["__ts"].to_numpy(np.int64)
        ends = right["__end"].to_numpy(np.int64)
        code_r = codes[~is_l]
        all_ts = np.unique(np.concatenate([l_ts, starts, ends]))
        K = np.int64(len(all_ts) + 1)
        if (int(codes.max()) + 1) * int(K) > 2**62:
            gk = list(group_keys)
            outs = [_merge(g) for _, g in
                    df.groupby(gk[0] if len(gk) == 1 else gk, sort=False)]
            return pd.concat(outs, ignore_index=True)
        comp_l = code_l * K + np.searchsorted(all_ts, l_ts)
        lo = np.searchsorted(
            comp_l, code_r * K + np.searchsorted(all_ts, starts),
            side="left")
        hi = np.searchsorted(
            comp_l, code_r * K + np.searchsorted(all_ts, ends),
            side="right")
        counts = np.maximum(hi - lo, 0)
        total = int(counts.sum())
        if total == 0:
            return _merge(df.iloc[0:0])
        r_idx = np.repeat(np.arange(len(starts)), counts)
        cum = np.concatenate(([0], np.cumsum(counts)[:-1]))
        l_idx = (np.arange(total) - np.repeat(cum, counts)
                 + np.repeat(lo, counts))
        left_m = left.iloc[l_idx]
        right_m = right.iloc[r_idx]
        # .array: nullable-int carried columns stay IntegerArrays — a
        # numpy conversion would float64-round values > 2^53
        out = {c: left_m[c].array for c in left_names}
        out.update({c: right_m[c].array for c in right_names})
        out["__by"] = left_m["__by"].to_numpy()
        out["__ts"] = left_m["__ts"].to_numpy()
        return pd.DataFrame(out)

    joined = unioned.groupby("__shard").map_groups(_shard_merge,
                                                   batch_format="pyarrow")

    # The tagged union holds nulls in the other side's columns, so pandas
    # upcasts int columns to float inside the group frames; restore every
    # carried column to its declared Arrow type on the way out.
    def _restore_types(batch: pa.Table) -> pa.Table:
        cols = {}
        for name in batch.column_names:
            col = batch.column(name)
            declared = dict(all_cols).get(name)
            cols[name] = col.cast(declared) if declared is not None else col
        return pa.table(cols)

    return joined.map_batches(
        _restore_types, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Driver query: assign every event to its containing session window — the
# sessionize output (gap-based intervals) interval-joined back onto the
# event stream of the same user.
# ---------------------------------------------------------------------------

def _q_events_session_assign(sf_dir: str, bucket_ns: int | None = None):
    import ray

    from .windows import SESSION_GAP_NS, sessionize

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    sessions = sessionize(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_id", "ts", "value"],
        ),
        gap_ns=SESSION_GAP_NS,
    )

    joined = range_join(
        events,
        sessions,
        by="user_id",
        left_ts="ts",
        right_start="session_start_ns",
        right_end="session_end_ns",
        left_cols={"event_id": pa.int64()},
        right_cols={"session_id": pa.int64()},
        bucket_ns=bucket_ns,
    )

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "ts_ns": batch.column("__ts"),
                "user_id": batch.column("__by").cast(pa.int64()),
                "session_id": batch.column("session_id"),
            }
        )

    return joined.map_batches(_shape, batch_format="pyarrow", zero_copy_batch=True)


from .registry import register  # noqa: E402
from .windows import SESSION_GAP_NS as _GAP  # noqa: E402

register(
    "events_session_assign",
    _q_events_session_assign,
    f"""
    WITH x AS (
        SELECT user_id, event_id, epoch_ns(ts) AS ts_ns,
               CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
                         OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > {_GAP}
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    y AS (
        SELECT *, sum(new_s) OVER (
            PARTITION BY user_id ORDER BY ts_ns, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS sid
        FROM x
    ),
    sess AS (
        -- sum() OVER -> HUGEINT fetches as float64; cast so the driver
        -- value-hash sees int64 on both sides (round-1 lesson).
        SELECT user_id, CAST(sid AS BIGINT) AS session_id,
               min(ts_ns) AS s_start, max(ts_ns) AS s_end
        FROM y GROUP BY user_id, sid
    )
    SELECT e.event_id, epoch_ns(e.ts) AS ts_ns, e.user_id, s.session_id
    FROM events e
    JOIN sess s
      ON e.user_id = s.user_id
     AND epoch_ns(e.ts) BETWEEN s.s_start AND s.s_end
    """,
)

# Same oracle, week-bucketed co-partition: proves the hot-key-safe mode
# is value-identical through the driver gate (the salted-rollup trick).
_RANGE_BUCKET_NS = 7 * 24 * 3600 * 10**9

register(
    "events_session_assign_bucketed",
    lambda sf: _q_events_session_assign(sf, bucket_ns=_RANGE_BUCKET_NS),
    f"""
    WITH x AS (
        SELECT user_id, event_id, epoch_ns(ts) AS ts_ns,
               CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
                         OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > {_GAP}
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    y AS (
        SELECT *, sum(new_s) OVER (
            PARTITION BY user_id ORDER BY ts_ns, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS sid
        FROM x
    ),
    sess AS (
        SELECT user_id, CAST(sid AS BIGINT) AS session_id,
               min(ts_ns) AS s_start, max(ts_ns) AS s_end
        FROM y GROUP BY user_id, sid
    )
    SELECT e.event_id, epoch_ns(e.ts) AS ts_ns, e.user_id, s.session_id
    FROM events e
    JOIN sess s
      ON e.user_id = s.user_id
     AND epoch_ns(e.ts) BETWEEN s.s_start AND s.s_end
    """,
)
