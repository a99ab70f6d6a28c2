"""As-of join: a time-series operator Ray Data has no primitive for.

``asof_join(left, right, by=..., left_ts=..., right_ts=...)`` attaches, to
every left row, the latest right row of the same ``by`` key whose
timestamp is <= the left timestamp (inner semantics: unmatched left rows
drop, mirroring DuckDB's ``ASOF JOIN``).

Composition (no raw Ray tasks needed):

1. both sides are projected to a shared schema with a ``__side`` tag and
   unioned — Ray Data has no cogroup, so the union + ONE
   ``groupby(hash(by) % 64)`` shard co-partition is the exchange (the
   repo's shard-merge rule: never one Ray group per high-cardinality
   key);
2. ``map_groups`` runs a pandas per-key loop inside each shard task,
   each key merging via a local vectorized ``searchsorted``.

PARTITIONING ASSUMPTION (documented per the custom-operator rule): the
rows of one ``by`` key — both sides — land in one shard task.  Keys
are device/user/entity ids with bounded history; when a single key's
right side is huge, pre-dedupe it (one row per (key, ts)) before the
join, which this module does for determinism anyway.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _project_side(ds, side: str, by: str, ts: str, cols, all_cols,
                  *, shard: bool = False):
    """Project one input onto the union schema (missing cols -> null).
    ``shard=True`` also appends ``__shard = hash(by) % ASOF_SHARDS`` here,
    inside the same pass — a separate tagging operator costs a full extra
    scan of the union."""
    from ._util import hash_shards

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
        if shard:
            out["__shard"] = pa.array(
                hash_shards(batch.column(by).to_pandas().astype(str),
                            ASOF_SHARDS),
                pa.int32())
        return pa.table(out)

    return ds.map_batches(_fn, batch_format="pyarrow", zero_copy_batch=True)


def asof_join(left_ds, right_ds, *, by: str, left_ts: str, right_ts: str,
              left_cols: dict, right_cols: dict,
              bucket_ns: int | None = None, direction: str = "backward",
              tolerance_ns: int | None = None):
    """Inner as-of join.  ``direction='backward'`` (default) attaches the
    latest right row with right.ts <= left.ts (DuckDB ``ON l.ts >= r.ts``);
    ``'forward'`` attaches the EARLIEST right row with right.ts >= left.ts
    (DuckDB ``ON l.ts <= r.ts``) — the "next scheduled event" shape.
    ``'nearest'`` attaches whichever candidate minimizes |delta|, with an
    exact tie going to the backward (earlier) row.  Backward/forward
    compose with ``bucket_ns`` (backward carries bucket closings forward;
    forward carries bucket openings backward); nearest does not (it would
    need both carries) and rejects the combination loudly.

    ``left_cols`` / ``right_cols``: {column_name: pyarrow_type} carried
    from each side.  The right side is deduped to one row per (key, ts)
    — keeping the row that sorts last on all carried columns — so the
    match is deterministic in both engines.

    ``bucket_ns``: when set, co-partition on ``(by, ts // bucket_ns)``
    instead of ``by`` alone, so a single hot key's rows spread across
    time buckets and no group task ever exceeds one key x one bucket —
    the 100 TB-safe mode.  Buckets whose left rows precede every
    in-bucket right row still match: a compact carry-over pass (one
    groupby over per-block closing/presence summaries, never raw rows)
    injects each bucket's latest earlier right row.  Output is
    value-identical to the unbucketed path (pinned by test).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}")
    if tolerance_ns is not None and tolerance_ns < 0:
        raise ValueError(f"tolerance_ns must be >= 0, got {tolerance_ns}")
    if bucket_ns is not None and direction == "nearest":
        # nearest needs BOTH the forward carry (bucket openings) and the
        # backward carry (bucket closings) injected per bucket; only the
        # single-direction carries exist today.
        raise ValueError(
            "direction='nearest' does not compose with bucket_ns yet — "
            "run it unbucketed or use backward/forward")
    if bucket_ns is not None:
        return _asof_join_bucketed(
            left_ds, right_ds, by=by, left_ts=left_ts, right_ts=right_ts,
            left_cols=left_cols, right_cols=right_cols, bucket_ns=bucket_ns,
            direction=direction, tolerance_ns=tolerance_ns,
        )
    all_cols = [(n, t) for n, t in {**left_cols, **right_cols}.items()]
    l = _project_side(left_ds, "l", by, left_ts, set(left_cols), all_cols,
                      shard=True)
    r = _project_side(right_ds, "r", by, right_ts, set(right_cols),
                      all_cols, shard=True)
    unioned = l.union(r)

    # Shard-merge, not one Ray group per key (the repo's measured
    # high-cardinality-groupby rule): co-partition on hash(__by) % 64
    # (tagged inside the projection pass) and run the VECTORIZED
    # whole-shard merge — identical per-key results, ~64 groups instead
    # of |keys| in the Ray exchange.
    merged = unioned.groupby("__shard").map_groups(
        _make_shard_merge(list(left_cols), list(right_cols),
                          direction=direction, tolerance_ns=tolerance_ns),
        batch_format="pyarrow"
    )
    return merged.map_batches(_make_recast(dict(all_cols)),
                              batch_format="pyarrow", zero_copy_batch=True)


ASOF_SHARDS = 64


def _tag_by_shard(batch: pa.Table) -> pa.Table:
    """Append ``__shard = hash(__by) % ASOF_SHARDS`` for the shard-merge
    co-partition (dtype-stable string canon, same rule as joins)."""
    from ._util import hash_shards

    by = batch.column("__by").to_pandas().astype(str)
    return batch.append_column(
        "__shard", pa.array(hash_shards(by, ASOF_SHARDS), pa.int32()))


def _tag_by_bucket_shard(batch: pa.Table) -> pa.Table:
    """``__shard = hash(__by, __bucket) % ASOF_SHARDS`` for the bucketed
    shard-merge (a hot key's buckets spread across shards)."""
    from ._util import hash_shards

    key = (batch.column("__by").to_pandas().astype(str)
           + ":" + batch.column("__bucket").to_pandas().astype(str))
    return batch.append_column(
        "__shard", pa.array(hash_shards(key, ASOF_SHARDS), pa.int32()))


def _empty_to_arrow(df):
    """Zero-row object-dtype pandas blocks trip Ray's size estimator
    ("cannot call `vectorize` on size 0 inputs"); hand empties over as
    Arrow instead — object columns become null-typed and the downstream
    ``_make_recast`` restores the declared types."""
    if isinstance(df, pd.DataFrame) and df.empty:
        return pa.Table.from_pandas(df, preserve_index=False)
    return df


def _sharded(merge_fn, keys=("__by",)):
    """Wrap a per-key merge body to run over every key (or key x bucket)
    group in a shard frame — one pandas groupby per shard task."""
    keys = list(keys)
    gkeys = keys[0] if len(keys) == 1 else keys

    def _fn(tbl: pa.Table):
        from ._util import shard_to_pandas

        df = shard_to_pandas(tbl).drop(columns="__shard")
        outs = [merge_fn(g) for _, g in df.groupby(gkeys, sort=False)]
        if not outs:
            return _empty_to_arrow(merge_fn(df.iloc[0:0]))
        return _empty_to_arrow(pd.concat(outs, ignore_index=True))

    return _fn


def _group_codes(df: pd.DataFrame, keys) -> np.ndarray:
    """Dense int codes for the (possibly composite) group key."""
    codes = None
    for k in keys:
        c, uniques = pd.factorize(df[k], sort=False)
        c = c.astype(np.int64)
        codes = c if codes is None else codes * np.int64(len(uniques)) + c
    return codes


def _make_shard_merge(left_names, right_names, direction: str = "backward",
                      tolerance_ns: int | None = None, keys=("__by",)):
    """Whole-shard VECTORIZED as-of merge: every key in the shard matches
    in a handful of numpy ops instead of a per-key pandas loop (which
    profiled at ~21 CPU-seconds for 10k keys at sf0.1).

    Composite-rank trick: with the right side sorted by (key code, ts),
    ``comp = code * K + rank(ts)`` (ranks over the union of both sides'
    timestamps, K = #distinct ts + 1) is order-isomorphic to (code, ts),
    so ONE ``np.searchsorted`` finds every left row's backward/forward
    candidate; a code-equality check rejects cross-key hits.  Falls back
    to the per-key loop when the composite would overflow int64 (needs
    ~2^62 — |keys| x |distinct ts| per SHARD, unreachable in practice)."""
    per_key = _make_merge(left_names, right_names, direction=direction,
                          tolerance_ns=tolerance_ns)
    keys = list(keys)

    def _fn(tbl: pa.Table):
        from ._util import shard_to_pandas

        df = shard_to_pandas(tbl).drop(columns="__shard")
        if df.empty:
            return _empty_to_arrow(per_key(df))
        codes = _group_codes(df, keys)
        is_l = (df["__side"] == "l").to_numpy()
        left = df[is_l]
        right = df[~is_l]
        if left.empty or right.empty:
            return _empty_to_arrow(per_key(df.iloc[0:0]))
        l_ts = left["__ts"].to_numpy(np.int64)
        code_l = codes[is_l]
        # deterministic right dedup per (code, ts): last in column order —
        # identical to the per-key body's sort + drop_duplicates
        right = right.assign(__code=codes[~is_l]).sort_values(
            ["__code", "__ts"] + right_names, kind="stable"
        ).drop_duplicates(["__code", "__ts"], keep="last")
        code_r = right["__code"].to_numpy(np.int64)
        r_ts = right["__ts"].to_numpy(np.int64)
        all_ts = np.unique(np.concatenate([r_ts, l_ts]))
        K = np.int64(len(all_ts) + 1)
        if (int(codes.max()) + 1) * int(K) > 2**62:  # composite overflow
            gkeys = keys[0] if len(keys) == 1 else keys
            outs = [per_key(g) for _, g in df.groupby(gkeys, sort=False)]
            return pd.concat(outs, ignore_index=True)
        comp_r = code_r * K + np.searchsorted(all_ts, r_ts)
        comp_l = code_l * K + np.searchsorted(all_ts, l_ts)
        nr = len(comp_r)
        big = np.iinfo(np.int64).max
        if direction == "backward":
            pos = np.searchsorted(comp_r, comp_l, side="right") - 1
            pos0 = np.maximum(pos, 0)
            matched = (pos >= 0) & (code_r[pos0] == code_l)
            if tolerance_ns is not None:
                matched &= (l_ts - r_ts[pos0]) <= tolerance_ns
            idx = pos0
        elif direction == "forward":
            pos = np.searchsorted(comp_r, comp_l, side="left")
            pos0 = np.minimum(pos, nr - 1)
            matched = (pos < nr) & (code_r[pos0] == code_l)
            if tolerance_ns is not None:
                matched &= (r_ts[pos0] - l_ts) <= tolerance_ns
            idx = pos0
        else:  # nearest: min |delta|, exact tie -> the backward candidate
            bpos = np.searchsorted(comp_r, comp_l, side="right") - 1
            fpos = np.searchsorted(comp_r, comp_l, side="left")
            b0 = np.maximum(bpos, 0)
            f0 = np.minimum(fpos, nr - 1)
            has_b = (bpos >= 0) & (code_r[b0] == code_l)
            has_f = (fpos < nr) & (code_r[f0] == code_l)
            d_b = np.where(has_b, l_ts - r_ts[b0], big)
            d_f = np.where(has_f, r_ts[f0] - l_ts, big)
            use_b = has_b & (~has_f | (d_b <= d_f))
            idx = np.where(use_b, b0, f0)
            matched = has_b | has_f
            if tolerance_ns is not None:
                matched &= np.minimum(d_b, d_f) <= tolerance_ns
        if not matched.any():
            return _empty_to_arrow(per_key(df.iloc[0:0]))
        left_m = left[matched]
        picks = right.iloc[idx[matched]]
        # .array (not .to_numpy()): a nullable-int carried column must
        # stay an IntegerArray — numpy conversion would float64-round
        # values > 2^53 before the final recast
        out = {c: left_m[c].array for c in left_names}
        out.update({c: picks[c].array for c in right_names})
        out["__by"] = left_m["__by"].to_numpy()
        out["__ts"] = left_m["__ts"].to_numpy()
        return pd.DataFrame(out)

    return _fn


def _make_merge(left_names, right_names, direction: str = "backward",
                tolerance_ns: int | None = None):
    """Per-group searchsorted merge body (one key, or one key x bucket):
    deterministic right-side dedup, vectorized match in either time
    direction.  ``tolerance_ns`` drops matches farther than the bound
    (pandas ``merge_asof(tolerance=...)`` semantics on an inner join):
    the as-of pick is the NEAREST candidate, so a pick beyond tolerance
    means the left row has no match at all."""

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
        l_ts = left["__ts"].to_numpy()
        if direction == "backward":
            idx = np.searchsorted(r_ts, l_ts, side="right") - 1
            matched = idx >= 0
            if tolerance_ns is not None:
                matched &= (l_ts - r_ts[np.maximum(idx, 0)]) <= tolerance_ns
        elif direction == "forward":  # earliest right row with r_ts >= l_ts
            idx = np.searchsorted(r_ts, l_ts, side="left")
            matched = idx < len(r_ts)
            if tolerance_ns is not None:
                matched &= (
                    r_ts[np.minimum(idx, len(r_ts) - 1)] - l_ts
                ) <= tolerance_ns
        else:  # nearest: min |delta|, exact tie -> the backward candidate
            bidx = np.searchsorted(r_ts, l_ts, side="right") - 1
            fidx = np.searchsorted(r_ts, l_ts, side="left")
            has_b = bidx >= 0
            has_f = fidx < len(r_ts)
            big = np.iinfo(np.int64).max
            d_b = np.where(has_b, l_ts - r_ts[np.maximum(bidx, 0)], big)
            d_f = np.where(has_f,
                           r_ts[np.minimum(fidx, len(r_ts) - 1)] - l_ts, big)
            use_b = has_b & (~has_f | (d_b <= d_f))
            idx = np.where(use_b, np.maximum(bidx, 0),
                           np.minimum(fidx, len(r_ts) - 1))
            matched = has_b | has_f
            if tolerance_ns is not None:
                matched &= np.minimum(d_b, d_f) <= tolerance_ns
        if not matched.any():
            return empty
        left_m = left[matched]
        picks = right.iloc[idx[matched]]
        # .array (not .to_numpy()): a nullable-int carried column must
        # stay an IntegerArray — numpy conversion would float64-round
        # values > 2^53 before the final recast
        out = {c: left_m[c].array for c in left_names}
        out.update({c: picks[c].array for c in right_names})
        out["__by"] = left_m["__by"].to_numpy()
        out["__ts"] = left_m["__ts"].to_numpy()
        return pd.DataFrame(out)

    return _merge


def _make_recast(decl: dict):
    """The union projects each side's missing columns as null, so pandas
    null-upcasts int64 carried columns to float64 inside the merge
    (round-1 driver hash failure: ``1234.0`` vs ``1234``).  Cast every
    carried column back to its declared Arrow type on the way out."""

    def _recast(batch: pa.Table) -> pa.Table:
        cols = {}
        for name in batch.column_names:
            col = batch.column(name)
            want = decl.get(name)
            if want is not None and col.type != want:
                col = col.cast(want)
            cols[name] = col
        return pa.table(cols)

    return _recast


def _asof_join_bucketed(left_ds, right_ds, *, by: str, left_ts: str,
                        right_ts: str, left_cols: dict, right_cols: dict,
                        bucket_ns: int, direction: str = "backward",
                        tolerance_ns: int | None = None):
    """Time-bucketed as-of join: groups are ``(key, ts // bucket_ns)``.

    Carry-over (backward): a left row whose bucket holds no earlier
    right row must still match the latest right row from ANY earlier
    bucket.  That row is reconstructed from compact per-block summaries
    — per-(key, bucket) right "closing" candidates and left "presence"
    markers — reduced in one groupby(key) whose group size is O(active
    buckets x blocks), never O(rows).  The reconstructed rows are
    unioned into the main ``(key, bucket)`` co-partition as ordinary
    right rows, so the merge body is byte-identical to the unbucketed
    path.

    ``direction='forward'`` is the mirror image: each bucket's EARLIEST
    right row (the "opening") is carried BACKWARD into presence buckets
    — a left row whose bucket holds no later right row matches the
    opening of the first later non-empty bucket.
    """
    forward = direction == "forward"
    all_cols = [(n, t) for n, t in {**left_cols, **right_cols}.items()]
    left_names, right_names = list(left_cols), list(right_cols)
    l = _project_side(left_ds, "l", by, left_ts, set(left_cols), all_cols)
    r = _project_side(right_ds, "r", by, right_ts, set(right_cols), all_cols)

    def _add_bucket(batch: pa.Table) -> pa.Table:
        ts = batch.column("__ts").to_numpy(zero_copy_only=False)
        # shard tag rides along here (fused with the projection task);
        # a post-union tagging operator would cost a full extra pass
        return _tag_by_bucket_shard(batch.append_column(
            "__bucket", pa.array(ts // bucket_ns, pa.int64())
        ))

    l = l.map_batches(_add_bucket, batch_format="pyarrow", zero_copy_batch=True)
    r = r.map_batches(_add_bucket, batch_format="pyarrow", zero_copy_batch=True)

    # -- compact carry-over pass -------------------------------------
    summary_cols = ["__by", "__bucket", "__ts", *right_names, "__kind"]

    def _right_close_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["__by", "__bucket", "__ts"] + right_names,
                            kind="stable")
        if forward:
            # opening candidate: the min-ts row AFTER per-ts dedup (keep
            # last within names — the same row the merge body would pick)
            df = df.drop_duplicates(["__by", "__bucket", "__ts"],
                                    keep="last")
            out = df.drop_duplicates(["__by", "__bucket"], keep="first").copy()
        else:
            out = df.drop_duplicates(["__by", "__bucket"], keep="last").copy()
        out["__kind"] = "c"
        return out[summary_cols]

    def _left_presence_block(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["__by", "__bucket"]].drop_duplicates().copy()
        out["__ts"] = np.int64(0)
        for c in right_names:
            out[c] = None
        out["__kind"] = "p"
        return out[summary_cols]

    close = r.map_batches(_right_close_block, batch_format="pandas")
    pres = l.map_batches(_left_presence_block, batch_format="pandas")

    def _carry(df: pd.DataFrame) -> pd.DataFrame:
        out_cols = ["__by", "__bucket", "__ts", *right_names]
        close_rows = df[df["__kind"] == "c"]
        pres_b = np.unique(
            df.loc[df["__kind"] == "p", "__bucket"].to_numpy(dtype=np.int64)
        )
        empty = pd.DataFrame({c: pd.Series(dtype=df[c].dtype)
                              for c in out_cols})
        if close_rows.empty or pres_b.size == 0:
            return empty
        close_rows = close_rows.sort_values(
            ["__bucket", "__ts"] + right_names, kind="stable"
        )
        if forward:
            # per-block openings -> the global opening per bucket is the
            # min-ts candidate (post per-ts dedup pick on names)
            close_rows = close_rows.drop_duplicates(
                ["__bucket", "__ts"], keep="last"
            ).drop_duplicates("__bucket", keep="first")
        else:
            close_rows = close_rows.drop_duplicates("__bucket", keep="last")
        cb = close_rows["__bucket"].to_numpy(dtype=np.int64)
        if forward:
            idx = np.searchsorted(cb, pres_b, side="right")
            ok = idx < len(cb)
        else:
            idx = np.searchsorted(cb, pres_b, side="left") - 1
            ok = idx >= 0
        if not ok.any():
            return empty
        picks = close_rows.iloc[idx[ok]]
        out = pd.DataFrame({
            "__by": picks["__by"].to_numpy(),
            "__bucket": pres_b[ok],
            "__ts": picks["__ts"].to_numpy(),
        })
        for c in right_names:
            out[c] = picks[c].to_numpy()
        return out

    carried = close.union(pres).map_batches(
        _tag_by_shard, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("__shard").map_groups(
        _sharded(_carry), batch_format="pyarrow"
    )

    # Re-shape carried rows onto the projected union schema (same column
    # ORDER — Ray union is positional) with properly-typed null left cols.
    decl = dict(all_cols)

    def _as_right_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = {
            "__by": batch.column("__by"),
            "__ts": batch.column("__ts").cast(pa.int64()),
            "__side": pa.array(["r"] * n, pa.string()),
        }
        for name, typ in all_cols:
            if name in right_cols:
                out[name] = batch.column(name).cast(typ)
            else:
                out[name] = pa.nulls(n, typ)
        out["__bucket"] = batch.column("__bucket").cast(pa.int64())
        return _tag_by_bucket_shard(pa.table(out))  # same tag rule as l/r

    carried = carried.map_batches(_as_right_rows, batch_format="pyarrow")

    unioned = l.union(r).union(carried)
    # shard-merge on hash(key, bucket) — same rule as the unbucketed path
    merged = unioned.groupby("__shard").map_groups(
        _make_shard_merge(left_names, right_names, direction=direction,
                          tolerance_ns=tolerance_ns,
                          keys=("__by", "__bucket")),
        batch_format="pyarrow"
    )
    return merged.map_batches(_make_recast(decl), batch_format="pyarrow",
                              zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Driver query: each event joined as-of against its user's order history
# ---------------------------------------------------------------------------

def _q_events_asof_orders(sf_dir: str, bucket_ns: int | None = None,
                          direction: str = "backward",
                          tolerance_ns: int | None = None):
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
        bucket_ns=bucket_ns,
        direction=direction,
        tolerance_ns=tolerance_ns,
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

#: 8500 days: the fixture's as-of gaps (1990s TPC-H order dates vs 2024
#: events) span 8209-9311 days, so this keeps roughly half the matches
#: and drops the rest — both tolerance branches exercised.
_ASOF_TOL_NS = 8500 * 24 * 3600 * 1_000_000_000

register(
    "events_asof_orders_tol",
    lambda sf: _q_events_asof_orders(sf, tolerance_ns=_ASOF_TOL_NS),
    f"""
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
    WHERE epoch_ns(e.ts) - epoch_ns(d.o_orderdate) <= {_ASOF_TOL_NS}
    """,
)

def _q_orders_next_event(sf_dir: str, bucket_ns: int | None = None):
    """Forward as-of through the driver gate: each order matched to its
    customer's EARLIEST event at or after the order date (fixture dates
    guarantee matches: orders precede the event window)."""
    import ray

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey"],
    )
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )
    joined = asof_join(
        orders.map_batches(
            lambda b: b.rename_columns(["__key", "o_orderdate", "o_orderkey"]),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        events.map_batches(
            lambda b: b.rename_columns(["__key", "ts", "event_id"]),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        by="__key", left_ts="o_orderdate", right_ts="ts",
        left_cols={"o_orderkey": pa.int64()},
        right_cols={"event_id": pa.int64()},
        direction="forward",
        bucket_ns=bucket_ns,
    )

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "o_custkey": batch.column("__by").cast(pa.int64()),
            "event_id": batch.column("event_id"),
        })

    return joined.map_batches(_shape, batch_format="pyarrow",
                              zero_copy_batch=True)


register(
    "orders_next_event_forward",
    _q_orders_next_event,
    # forward as-of: DuckDB ASOF with the inequality flipped picks the
    # earliest right row; events are deduped per (user, ts) identically
    # on both sides (max event_id) so the pick is deterministic.
    """
    WITH ranked AS (
        SELECT user_id, ts, event_id,
               row_number() OVER (
                   PARTITION BY user_id, ts ORDER BY event_id DESC
               ) AS rn
        FROM events
    ),
    deduped AS (SELECT * FROM ranked WHERE rn = 1)
    SELECT o.o_orderkey, o.o_custkey, d.event_id
    FROM orders o
    ASOF JOIN deduped d
      ON o.o_custkey = d.user_id AND o.o_orderdate <= d.ts
    """,
)

_ASOF_BUCKET_NS = 7 * 24 * 3600 * 10**9  # one week

register(
    "orders_next_event_forward_bucketed",
    lambda sf: _q_orders_next_event(sf, bucket_ns=_ASOF_BUCKET_NS),
    # Same oracle as the unbucketed forward query: the (key, week-bucket)
    # co-partition with backward-carried openings must be value-identical.
    # The fixture is the hard case — orders (1995-2001) and events (2024)
    # never share a bucket, so EVERY match flows through the carry pass.
    """
    WITH ranked AS (
        SELECT user_id, ts, event_id,
               row_number() OVER (
                   PARTITION BY user_id, ts ORDER BY event_id DESC
               ) AS rn
        FROM events
    ),
    deduped AS (SELECT * FROM ranked WHERE rn = 1)
    SELECT o.o_orderkey, o.o_custkey, d.event_id
    FROM orders o
    ASOF JOIN deduped d
      ON o.o_custkey = d.user_id AND o.o_orderdate <= d.ts
    """,
)

register(
    "events_asof_orders_bucketed",
    lambda sf: _q_events_asof_orders(sf, bucket_ns=_ASOF_BUCKET_NS),
    # Same oracle as the unbucketed query: the (key, week-bucket)
    # co-partition with carry-over must be value-identical — proving the
    # hot-key-safe mode through the driver gate (the salted-rollup trick).
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


def _q_click_nearest_purchase(sf_dir: str):
    """Nearest as-of through the driver gate: each click matched to its
    user's nearest-in-time purchase (either direction; exact-tie ->
    the earlier purchase).  Clicks and purchases interleave through the
    whole fixture window, so BOTH branches carry real traffic — unlike
    the orders/events pairing, where one side always precedes the
    other and nearest would degenerate to a single direction."""
    import pyarrow.compute as pc
    import ray

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def _clicks(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("event_type"), "click"))
        return pa.table({
            "event_id": t.column("event_id"),
            "ts": t.column("ts"),
            "__key": t.column("user_id"),
        })

    def _purchases(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("event_type"), "purchase"))
        # carried in MICROSECONDS: the co-partition union nulls this col
        # on left rows, so pandas upcasts it to float64 — epoch-us
        # (~1.7e15) survives float64 exactly, epoch-ns (~1.7e18) loses
        # its low bits (~256 ns quantization).  The fixture stores us
        # timestamps, so the cast is lossless.
        return pa.table({
            "__key": t.column("user_id"),
            "ts": t.column("ts"),
            "purchase_id": t.column("event_id"),
            "p_ts_us": t.column("ts").cast(pa.timestamp("us"))
            .cast(pa.int64()),
        })

    joined = asof_join(
        events.map_batches(_clicks, batch_format="pyarrow",
                           zero_copy_batch=True),
        events.map_batches(_purchases, batch_format="pyarrow",
                           zero_copy_batch=True),
        by="__key", left_ts="ts", right_ts="ts",
        left_cols={"event_id": pa.int64()},
        right_cols={"purchase_id": pa.int64(), "p_ts_us": pa.int64()},
        direction="nearest",
    )

    def _shape(batch: pa.Table) -> pa.Table:
        ts = batch.column("__ts").to_numpy(zero_copy_only=False)
        pts = batch.column("p_ts_us").to_numpy(zero_copy_only=False) * 1000
        return pa.table({
            "event_id": batch.column("event_id"),
            "ts_ns": batch.column("__ts"),
            "user_id": batch.column("__by").cast(pa.int64()),
            "purchase_id": batch.column("purchase_id"),
            "dist_ns": pa.array(np.abs(ts - pts), pa.int64()),
        })

    return joined.map_batches(_shape, batch_format="pyarrow",
                              zero_copy_batch=True)


register(
    "events_click_nearest_purchase",
    _q_click_nearest_purchase,
    # nearest = the better of DuckDB's backward and forward ASOF LEFT
    # picks, exact tie -> backward; purchases deduped per (user, ts) by
    # max event_id exactly like the engine's keep-last rule.
    """
    WITH cl AS (
        SELECT event_id, epoch_ns(ts) AS ts_ns, user_id, ts
        FROM events WHERE event_type = 'click'
    ),
    pr AS (
        SELECT user_id, ts, event_id,
               row_number() OVER (
                   PARTITION BY user_id, ts ORDER BY event_id DESC
               ) AS rn
        FROM events WHERE event_type = 'purchase'
    ),
    d AS (SELECT user_id, ts, event_id FROM pr WHERE rn = 1),
    b AS (
        SELECT c.event_id, c.ts_ns, c.user_id,
               p.event_id AS b_id, epoch_ns(p.ts) AS b_ts
        FROM cl c ASOF LEFT JOIN d p
          ON c.user_id = p.user_id AND c.ts >= p.ts
    ),
    f AS (
        SELECT c.event_id, p.event_id AS f_id, epoch_ns(p.ts) AS f_ts
        FROM cl c ASOF LEFT JOIN d p
          ON c.user_id = p.user_id AND c.ts <= p.ts
    )
    SELECT b.event_id, b.ts_ns, b.user_id,
           CASE WHEN f.f_id IS NULL
                     OR (b.b_id IS NOT NULL
                         AND (b.ts_ns - b.b_ts) <= (f.f_ts - b.ts_ns))
                THEN b.b_id ELSE f.f_id END AS purchase_id,
           CASE WHEN f.f_id IS NULL
                     OR (b.b_id IS NOT NULL
                         AND (b.ts_ns - b.b_ts) <= (f.f_ts - b.ts_ns))
                THEN b.ts_ns - b.b_ts ELSE f.f_ts - b.ts_ns END AS dist_ns
    FROM b JOIN f USING (event_id)
    WHERE b.b_id IS NOT NULL OR f.f_id IS NOT NULL
    """,
)
