"""Gorilla time-series compression: delta-of-delta timestamps + XOR floats.

Public algorithm from Facebook's Gorilla paper (Pelkonen et al., VLDB
2015, "Gorilla: A Fast, Scalable, In-Memory Time Series Database").
From-scratch implementation — the reference library has no compression at
all (SURVEY.md §2.6); this is the engine's chunk format for the retention
ladder (BASELINE.json north_star).

Layout per chunk (one series, one time range):

* header: first timestamp (int64 ns), first value (float64), count
* timestamps: delta-of-delta, variable-width buckets as in the paper §4.1.1
  ('0' | '10'+7b | '110'+9b | '1110'+12b | '1111'+32b; deltas in SECONDS in
  the paper — here in raw ns, with the 32-bit bucket widened to 64 bits
  when needed via an escape: '1111' + 64b)
* values: XOR with previous; '0' identical, '10' reuse previous
  leading/meaningful-bit window, '11' + 5b leading + 6b length + bits
  (paper §4.1.2)

Pure-numpy bit packing: the encoder builds a uint8 bitstream; the decoder
is a sequential reader (decompression is tested as an exact round-trip).
"""

from __future__ import annotations

import struct

import numpy as np


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def finish(self) -> bytes:
        if self.nbits:
            self.bytes.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.bytes)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, bits: int) -> int:
        # One slice + int.from_bytes per call instead of a per-bit loop.
        pos = self.pos
        end = pos + bits
        chunk = int.from_bytes(self.data[pos >> 3 : (end + 7) >> 3], "big")
        self.pos = end
        return (chunk >> ((((end + 7) >> 3) << 3) - end)) & ((1 << bits) - 1)


# Delta-of-delta buckets: (prefix, prefix_bits, value_bits).  The final
# 64-bit escape extends the paper's 32-bit bucket for ns-resolution deltas.
_DOD_BUCKETS = (
    (0b10, 2, 7),
    (0b110, 3, 9),
    (0b1110, 4, 12),
    (0b11110, 5, 32),
    (0b11111, 5, 64),
)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else (v << 1)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def compress_chunk(ts_ns: np.ndarray, values: np.ndarray) -> bytes:
    """(n,) int64 timestamps (sorted) + (n,) float64 values -> chunk bytes."""
    ts_ns = np.asarray(ts_ns, dtype=np.int64)
    values = np.asarray(values, dtype=np.float64)
    n = len(ts_ns)
    header = struct.pack("<qdq", int(ts_ns[0]) if n else 0,
                         float(values[0]) if n else 0.0, n)
    if n <= 1:
        return header

    w = _BitWriter()
    # --- timestamps ---
    prev_delta = 0
    prev_ts = int(ts_ns[0])
    for i in range(1, n):
        t = int(ts_ns[i])
        delta = t - prev_ts
        dod = delta - prev_delta
        if dod == 0:
            w.write(0, 1)
        else:
            z = _zigzag(dod)
            for prefix, pbits, vbits in _DOD_BUCKETS:
                if z < (1 << vbits):
                    w.write(prefix, pbits)
                    w.write(z, vbits)
                    break
        prev_delta = delta
        prev_ts = t
    # --- values ---
    bits = values.view(np.uint64)
    prev = int(bits[0])
    prev_lead, prev_len = 65, 0  # invalid -> first XOR always writes window
    for i in range(1, n):
        cur = int(bits[i])
        x = prev ^ cur
        if x == 0:
            w.write(0, 1)
        else:
            lead = min(31, 64 - x.bit_length())
            trail = (x & -x).bit_length() - 1
            prev_trail = 64 - prev_lead - prev_len
            if prev_lead <= 64 and lead >= prev_lead and trail >= prev_trail:
                w.write(0b10, 2)
                w.write(x >> prev_trail, prev_len)
            else:
                meaningful = 64 - lead - trail
                w.write(0b11, 2)
                w.write(lead, 5)
                w.write(meaningful - 1, 6)  # 1..64 stored as 0..63
                w.write(x >> trail, meaningful)
                prev_lead, prev_len = lead, meaningful
        prev = cur
    return header + w.finish()


def decompress_chunk(data: bytes):
    """chunk bytes -> (ts_ns int64 array, values float64 array)."""
    first_ts, first_val, n = struct.unpack_from("<qdq", data, 0)
    ts = np.empty(n, dtype=np.int64)
    vals = np.empty(n, dtype=np.float64)
    if n == 0:
        return ts, vals
    ts[0] = first_ts
    vals[0] = first_val
    if n == 1:
        return ts, vals

    r = _BitReader(data[24:])
    # --- timestamps ---
    prev_delta = 0
    prev_ts = first_ts
    for i in range(1, n):
        if r.read(1) == 0:
            dod = 0
        else:
            if r.read(1) == 0:
                vbits = 7
            elif r.read(1) == 0:
                vbits = 9
            elif r.read(1) == 0:
                vbits = 12
            elif r.read(1) == 0:
                vbits = 32
            else:
                vbits = 64
            dod = _unzigzag(r.read(vbits))
        prev_delta += dod
        prev_ts += prev_delta
        ts[i] = prev_ts
    # --- values ---
    prev = int(np.float64(first_val).view(np.uint64))
    lead, length = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            pass  # identical
        elif r.read(1) == 0:
            x = r.read(length) << (64 - lead - length)
            prev ^= x
        else:
            lead = r.read(5)
            length = r.read(6) + 1
            x = r.read(length) << (64 - lead - length)
            prev ^= x
        vals[i] = np.uint64(prev).view(np.float64)
    return ts, vals


class GorillaChunkWriter:
    """``map_groups`` body: one series' samples -> one chunk row.

    Stateful per-group compression (sorted by ts before encoding), emitting
    ``(series_key, n_points, t_min, t_max, raw_bytes, chunk)`` rows for the
    chunk sink.  Used per-shard in the retention pipeline so chunk files
    align with checkpoint partitions.
    """

    def __call__(self, df):
        import pandas as pd

        df = df.sort_values(["ts", "doc_id", "sample_ordinal"], kind="stable")
        num = df[df["value_kind"] == 1] if "value_kind" in df else df
        ts = num["ts"].astype("int64").to_numpy()
        vals = num["value_num"].to_numpy(dtype=np.float64)
        chunk = compress_chunk(ts, vals)
        return pd.DataFrame(
            {
                "series_key": [df["series_key"].iloc[0]],
                "n_points": np.int64(len(ts)),
                "t_min": np.int64(ts[0]) if len(ts) else np.int64(0),
                "t_max": np.int64(ts[-1]) if len(ts) else np.int64(0),
                "raw_bytes": np.int64(16 * len(ts)),
                "chunk": [chunk],
            }
        )


def compress_series_dataset(samples_ds, *, bucket_ns: int | None = None):
    """Samples Dataset -> Gorilla chunk rows (one shuffle).

    Default: one chunk per series.  ``bucket_ns`` co-partitions on
    ``(series_key, ts // bucket_ns)`` instead — one chunk per series x
    time bucket — so a hot series' points never exceed one group task or
    one chunk row (the same hot-key bound as the bucketed as-of join).
    Chunk rows are self-contained, so readers need no change: a
    time-range read prunes per-chunk ``t_min``/``t_max`` exactly as
    before, just at finer granularity.
    """
    writer = GorillaChunkWriter()

    def _compress(df):
        return writer(df)

    if bucket_ns is None:
        return samples_ds.groupby("series_key").map_groups(
            _compress, batch_format="pandas"
        )

    import pyarrow as pa

    def _add_bucket(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.timestamp("ns")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__bucket", pa.array(ts // bucket_ns, pa.int64())
        )

    def _compress_drop(df):
        return writer(df.drop(columns="__bucket"))

    bucketed = samples_ds.map_batches(
        _add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    return bucketed.groupby(["series_key", "__bucket"]).map_groups(
        _compress_drop, batch_format="pandas"
    )


def compact_chunks(chunks_ds, *, target_points: int = 1_000_000):
    """LSM-style chunk compaction: merge each series' many small chunks
    into few large ones (bit-exact decode -> concat -> re-encode),
    re-splitting at ``target_points`` so no output chunk is unbounded.

    The retention ladder writes one chunk per (series, time bucket) per
    run; after many incremental runs a series accumulates hundreds of
    small chunks and read-side pruning/decoding overhead grows.  This is
    the maintenance pass that restores big-chunk economics.

    Scale shape: the input is CHUNK rows (one per series x bucket —
    orders of magnitude smaller than samples), shuffled ONCE on
    ``series_key``; each group task decodes only its own series' chunks.
    Assumes per-series chunk time ranges do not overlap (the writer's
    bucket invariant); chunks are concatenated in ``(t_min, t_max)``
    order, so sample order — and therefore the re-encoded stream — is
    deterministic.  For a series whose TOTAL history exceeds one task's
    memory, compact per coarse epoch (filter on ``t_min`` ranges) —
    the same bounding trick as ``bucket_ns`` on the write side.
    """
    import pandas as pd

    def _compact(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["t_min", "t_max"], kind="stable",
                            ignore_index=True)
        ts_parts, val_parts = [], []
        for blob in df["chunk"]:
            ts, vals = decompress_chunk(blob)
            if len(ts):
                ts_parts.append(np.asarray(ts, dtype=np.int64))
                val_parts.append(np.asarray(vals, dtype=np.float64))
        if not ts_parts:
            # keep one 0-point row for the series (the writer's own
            # behavior for string-only series) so compaction never makes
            # a series vanish from the store — and never emits an empty
            # object-dtype frame whose columns would infer as Arrow null
            # type and clash with the other chunk files' schema
            empty = np.array([], dtype=np.int64)
            return pd.DataFrame({
                "series_key": [df["series_key"].iloc[0]],
                "n_points": np.array([0], np.int64),
                "t_min": np.array([0], np.int64),
                "t_max": np.array([0], np.int64),
                "raw_bytes": np.array([0], np.int64),
                "chunk": [compress_chunk(empty,
                                         np.array([], dtype=np.float64))],
            })
        ts = np.concatenate(ts_parts)
        vals = np.concatenate(val_parts)
        key = df["series_key"].iloc[0]
        rows = []
        for start in range(0, len(ts), target_points):
            t = ts[start:start + target_points]
            v = vals[start:start + target_points]
            rows.append({
                "series_key": key,
                "n_points": np.int64(len(t)),
                "t_min": np.int64(t[0]),
                "t_max": np.int64(t[-1]),
                "raw_bytes": np.int64(16 * len(t)),
                "chunk": compress_chunk(t, v),
            })
        return pd.DataFrame(rows)

    return chunks_ds.groupby("series_key").map_groups(
        _compact, batch_format="pandas"
    )
