"""Z-order (Morton) layout: co-cluster rows by bit-interleaving two key
dimensions so range predicates on EITHER dimension touch few contiguous
partitions — the data-layout primitive behind Delta/Iceberg Z-ORDER
clustering, expressed Ray-Data-first.

Scale shape:

* the Morton code is pure per-row arithmetic — a vectorized numpy
  map_batches, no state, no shuffle;
* bucketing takes the code's TOP bits (fixed-width z-space cells), so
  partition assignment needs NO global sort or quantile pass — rows
  stream straight to their bucket;
* ``write_zorder_partitions`` writes one parquet directory per bucket
  with rows z-sorted INSIDE each bucket (per-bucket sort via the
  bucket groupby — each group task sorts only its own bucket), giving
  resumable, prunable output: a reader with a predicate on either
  dimension computes the touched z-cells arithmetically and skips the
  rest (the bucket stats report is exactly that pruning index).

Hash parity: the code is integer arithmetic (`((x >> i) & 1) << 2i`),
written identically as an unrolled SQL expression in the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .registry import register

Z_BITS = 12            # bits kept per dimension (24-bit codes)
Z_BUCKET_BITS = 4      # top bits of the code -> 16 buckets
_H = 3_600_000_000_000


def footer_min_max(path: str, col: str):
    """A column's exact (min, max) from parquet FOOTER statistics only —
    no data read; the same row-group stats that drive read pruning."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    idx = pf.schema_arrow.names.index(col)
    mins, maxs = [], []
    for g in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(g).column(idx).statistics
        if st is None or not st.has_min_max:
            raise ValueError(
                f"{path} row group {g} lacks {col} statistics; "
                "compute the bounds with a min()/max() scan instead")
        mins.append(st.min)
        maxs.append(st.max)
    return min(mins), max(maxs)


def _to_ns(m):
    return int(m.timestamp() * 1_000_000_000) if hasattr(m, "timestamp") \
        else int(m)


def scale_to_bits(v: np.ndarray, lo: int, hi: int,
                  bits: int = Z_BITS) -> np.ndarray:
    """Range-normalize integers into [0, 2^bits): pure integer
    arithmetic ``(v - lo) * (2^bits - 1) // max(hi - lo, 1)`` so the SQL
    twin is the identical expression.  A constant dimension maps to 0."""
    v = v.astype(np.int64)
    return (v - lo) * ((1 << bits) - 1) // max(hi - lo, 1)


def _scale_sql(expr: str, lo_sql: str, hi_sql: str,
               bits: int = Z_BITS) -> str:
    """The identical normalization with lo/hi as SQL scalar
    subexpressions (`greatest(..., 1)` mirrors the Python max guard)."""
    return (f"((({expr}) - ({lo_sql})) * {(1 << bits) - 1}"
            f" // greatest(({hi_sql}) - ({lo_sql}), 1))")


def morton_interleave(x: np.ndarray, y: np.ndarray,
                      bits: int = Z_BITS) -> np.ndarray:
    """Interleave the low ``bits`` of two uint arrays: x takes the even
    bit positions, y the odd.  Vectorized over the whole column."""
    x = x.astype(np.uint64) & np.uint64((1 << bits) - 1)
    y = y.astype(np.uint64) & np.uint64((1 << bits) - 1)
    z = np.zeros(len(x), dtype=np.uint64)
    for i in range(bits):
        z |= ((x >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i)
        z |= ((y >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i + 1)
    return z.astype(np.int64)


def _morton_sql(x_expr: str, y_expr: str, bits: int = Z_BITS) -> str:
    """The identical interleave as one SQL expression (unrolled)."""
    # each term fully parenthesized: SQL's `+` binds tighter than `<<`,
    # so an unparenthesized `a << 2 + b << 3` shifts by (2 + b)
    terms = []
    for i in range(bits):
        terms.append(f"(((({x_expr}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y_expr}) >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def _z_of(batch: pa.Table, bounds: tuple, bits: int) -> np.ndarray:
    """Range-normalized Morton code of (user_id, hour index) — both
    dimensions scaled into the full bit range by the corpus bounds
    (footer stats), exactly like production Z-ORDER clustering."""
    x_lo, x_hi, h_lo, h_hi = bounds
    uid = batch.column("user_id").to_numpy(zero_copy_only=False)
    ts = batch.column("ts").cast(pa.timestamp("ns")).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    x = scale_to_bits(uid, x_lo, x_hi, bits)
    y = scale_to_bits(ts // _H, h_lo, h_hi, bits)
    return morton_interleave(x.astype(np.uint64), y.astype(np.uint64),
                             bits)


def events_bounds_from_footer(path: str) -> tuple:
    """(user_id lo/hi, hour-index lo/hi) from footer stats only."""
    x_lo, x_hi = footer_min_max(path, "user_id")
    t_lo, t_hi = footer_min_max(path, "ts")
    return (int(x_lo), int(x_hi), _to_ns(t_lo) // _H, _to_ns(t_hi) // _H)


def zorder_codes(events_ds, bounds: tuple, *, bits: int = Z_BITS):
    """(event_id, z) for every event."""

    def _code(batch: pa.Table) -> pa.Table:
        z = _z_of(batch, bounds, bits)
        return pa.table({
            "event_id": batch.column("event_id"),
            "z": pa.array(z, pa.int64()),
        })

    return events_ds.map_batches(_code, batch_format="pyarrow",
                                 zero_copy_batch=True)


def zorder_bucket_stats(events_ds, bounds: tuple, *,
                        bits: int = Z_BITS,
                        bucket_bits: int = Z_BUCKET_BITS):
    """The pruning index: per z-cell (top ``bucket_bits`` of the code)
    row count and exact z range — per-block combiner, one tiny
    groupby."""
    shift = 2 * bits - bucket_bits

    def _partial(batch: pa.Table) -> pa.Table:
        z = _z_of(batch, bounds, bits)
        df = pd.DataFrame({"bucket": z >> shift, "z": z})
        g = df.groupby("bucket", sort=True).agg(
            n=("z", "size"), z_min=("z", "min"), z_max=("z", "max")
        ).reset_index()
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    merged = (
        events_ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(*_minmax_aggs())
    )

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": batch.column("bucket").cast(pa.int64()),
            "n_rows": batch.column("sum(n)").cast(pa.int64()),
            "z_min": batch.column("min(z_min)").cast(pa.int64()),
            "z_max": batch.column("max(z_max)").cast(pa.int64()),
        })

    return merged.map_batches(_shape, batch_format="pyarrow",
                              zero_copy_batch=True)


def _minmax_aggs():
    from ray.data.aggregate import Max, Min, Sum

    return [Sum("n"), Min("z_min"), Max("z_max")]


def write_zorder_partitions(events_ds, out_dir: str, bounds: tuple,
                            *, bits: int = Z_BITS,
                            bucket_bits: int = Z_BUCKET_BITS) -> list:
    """Write one parquet directory per z-cell, rows z-sorted inside each
    cell (each group task sorts only its own bucket — resumable: a
    restart skips buckets whose directory already exists).  Returns the
    bucket manifest [(bucket, n_rows, path)]."""
    import os

    shift = 2 * bits - bucket_bits

    def _tag(batch: pa.Table) -> pa.Table:
        z = _z_of(batch, bounds, bits)
        return (batch.append_column("z", pa.array(z, pa.int64()))
                .append_column("bucket",
                               pa.array(z >> shift, pa.int64())))

    def _write_bucket(df: pd.DataFrame) -> pd.DataFrame:
        import shutil

        b = int(df["bucket"].iloc[0])
        path = os.path.join(out_dir, f"bucket={b:05d}")
        tmp = path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)  # stale partial from a kill
        if os.path.isdir(path):
            # Resume: the bucket was committed by a previous run — emit
            # its manifest row from the existing parquet footer instead
            # of rewriting (os.rename onto a non-empty dir raises).
            n = pa.parquet.ParquetFile(
                os.path.join(path, "part-0.parquet")).metadata.num_rows
            return pd.DataFrame({"bucket": pd.array([b], dtype="int64"),
                                 "n_rows": pd.array([n], dtype="int64")})
        df = df.sort_values(["z", "event_id"], ignore_index=True) \
            .drop(columns=["bucket"])
        os.makedirs(tmp)
        pa.parquet.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            os.path.join(tmp, "part-0.parquet"))
        os.rename(tmp, path)
        return pd.DataFrame({"bucket": pd.array([b], dtype="int64"),
                             "n_rows": pd.array([len(df)], dtype="int64")})

    import pyarrow.parquet  # noqa: F401  (pa.parquet above)

    manifest = (
        events_ds.map_batches(_tag, batch_format="pyarrow",
                              zero_copy_batch=True)
        .groupby("bucket").map_groups(_write_bucket,
                                      batch_format="pandas")
    ).to_pandas().sort_values("bucket", ignore_index=True)
    return [(int(r.bucket), int(r.n_rows),
             f"{out_dir}/bucket={int(r.bucket):05d}")
            for r in manifest.itertuples()]


def _q_zorder_stats(sf_dir: str):
    import ray

    bounds = events_bounds_from_footer(f"{sf_dir}/events.parquet")
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    return zorder_bucket_stats(ds, bounds)


# the SQL twin derives the SAME bounds via scalar subqueries (parquet
# footer min/max are exact, so both engines normalize identically)
_X_SQL = _scale_sql(
    "CAST(user_id AS BIGINT)",
    "SELECT min(user_id) FROM events",
    "SELECT max(user_id) FROM events")
_Y_SQL = _scale_sql(
    f"CAST(epoch_ns(ts) // {_H} AS BIGINT)",
    f"SELECT CAST(min(epoch_ns(ts)) // {_H} AS BIGINT) FROM events",
    f"SELECT CAST(max(epoch_ns(ts)) // {_H} AS BIGINT) FROM events")
_Z_EXPR = _morton_sql(_X_SQL, _Y_SQL)

register(
    "events_zorder_stats",
    _q_zorder_stats,
    f"""
    WITH z AS (
        SELECT CAST({_Z_EXPR} AS BIGINT) AS z FROM events
    )
    SELECT CAST(z >> {2 * Z_BITS - Z_BUCKET_BITS} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(z) AS BIGINT) AS z_min,
           CAST(max(z) AS BIGINT) AS z_max
    FROM z
    GROUP BY bucket
    """,
)
