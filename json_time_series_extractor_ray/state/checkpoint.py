"""Checkpoint / lineage / resume for partitioned pipeline outputs.

Requirement (BASELINE.json north_rule): a killed job resumes without
recomputing or double-counting rollups, with per-partition lineage +
metrics.  Design:

* Output is partitioned: shard ``s`` of a stage writes to
  ``<out_dir>/shard=<s>/`` via **write-to-temp + atomic rename** — a
  partition directory either exists completely or not at all.
* Each completed shard appends a lineage record to
  ``<out_dir>/_manifest/<shard>.json`` (one file per shard, so concurrent
  writers never contend): input fragments, row count, min/max event
  timestamp (the shard watermark), value checksum, wall time.
* Resume = read the manifest directory, skip shards whose record exists
  AND whose partition directory exists; recompute the rest.  Because every
  shard's output is derived deterministically from its input fragments
  (deterministic extraction — no wall-clock fallback), a re-run of an
  incomplete shard is value-identical: no double counting.

The shard axis is ``hash(series_key) % num_shards`` — the SAME key the
rollup shuffle uses, so restart granularity aligns with the one wide
operation in the pipeline (SURVEY.md §4).
"""

from __future__ import annotations

import hashlib  # noqa: F401  (shard_of's stable md5)
import json
import os
import shutil
import time
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def shard_of(series_key: str, num_shards: int) -> int:
    """Stable shard id (md5-based — never Python's salted hash())."""
    h = hashlib.md5(series_key.encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big") % num_shards


def add_shard_column(batch: pa.Table, num_shards: int,
                     key_column: str = "series_key") -> pa.Table:
    """Vectorized shard assignment: dictionary-encode the key column and
    md5-hash only the UNIQUE keys (series-key cardinality is tiny next to
    row count), then gather by index — round 1 hashed every row in Python
    on the resumable-job hot path.  Same ``shard_of`` md5, so existing
    manifests stay valid."""
    import numpy as np

    col = batch.column(key_column)
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    out = []
    for chunk in chunks:
        enc = chunk.dictionary_encode()
        lut = np.array(
            [shard_of(k, num_shards) for k in enc.dictionary.to_pylist()],
            dtype=np.int32,
        )
        idx = enc.indices.to_numpy(zero_copy_only=False)
        out.append(lut[idx] if len(lut) else np.empty(0, np.int32))
    shards = pa.chunked_array(
        [pa.array(a, pa.int32()) for a in out]
    ) if out else pa.array([], pa.int32())
    return batch.append_column("shard", shards)


def _fsync_path(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _fsync_dir(path: str) -> None:
    """Durably record a directory entry (rename target / new file)."""
    fd = os.open(path, os.O_RDONLY | getattr(os, "O_DIRECTORY", 0))
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _checksum_table(table: pa.Table) -> str:
    """Order-insensitive value checksum: per-row hashes SUM-folded mod
    2^64 (with the row count appended).  Sum, not xor: an xor fold is
    blind to rows duplicated an even number of times — exactly the
    double-counting corruption the lineage record exists to detect.
    Vectorized (pandas' stable row hash), not a per-row Python loop —
    the commit path runs this on every shard."""
    if table.num_rows == 0:
        return "0" * 16 + "-0"
    import numpy as np
    import pandas as pd

    df = table.select(sorted(table.column_names)).to_pandas()
    h = pd.util.hash_pandas_object(df, index=False).to_numpy()
    with np.errstate(over="ignore"):
        acc = int(np.sum(h, dtype=np.uint64))
    return f"{acc:016x}-{len(h)}"


class CheckpointManifest:
    """Per-(stage-output) manifest directory with one record per shard."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.manifest_dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

    def record_path(self, shard: int) -> str:
        return os.path.join(self.manifest_dir, f"shard-{shard:05d}.json")

    def ensure_sharding(self, num_shards: int) -> None:
        """Pin the shard count on first run; REFUSE a resume under a
        different one.  Shard ids from a 64-way run are meaningless to a
        32-way rerun — silently mixing them drops some series from
        recompute while their data never lands (the exact missing/
        double-counted outcome resume exists to prevent)."""
        meta_path = os.path.join(self.manifest_dir, "_meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                stored = json.load(f).get("num_shards")
            if stored != num_shards:
                raise ValueError(
                    f"manifest at {self.manifest_dir} was written with "
                    f"num_shards={stored}; resuming with {num_shards} would "
                    "mix incompatible shardings — rerun with the original "
                    "value or start a fresh output_dir"
                )
            return
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"num_shards": num_shards}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, meta_path)
        _fsync_dir(self.manifest_dir)

    def shard_dir(self, shard: int) -> str:
        return os.path.join(self.out_dir, f"shard={shard:05d}")

    def completed_shards(self) -> set:
        done = set()
        for name in os.listdir(self.manifest_dir):
            if not name.startswith("shard-") or not name.endswith(".json"):
                continue
            shard = int(name[len("shard-"):-len(".json")])
            if os.path.isdir(self.shard_dir(shard)):
                done.add(shard)
        return done

    def load_record(self, shard: int) -> dict:
        with open(self.record_path(shard)) as f:
            return json.load(f)

    def commit_shard(self, shard: int, table: pa.Table, *,
                     input_fragments=(), extra: dict | None = None) -> dict:
        """Atomically publish one shard: tmp write -> fsync -> rename, then
        the lineage record (record last => record implies data)."""
        final_dir = self.shard_dir(shard)
        # per-attempt tmp name: a retried task racing a presumed-dead
        # worker must never rmtree the other attempt's in-progress dir
        # and publish a partial shard — whichever attempt renames last
        # wins atomically
        tmp_dir = f"{final_dir}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp_dir)
        t0 = time.perf_counter()
        part_path = os.path.join(tmp_dir, "part-0.parquet")
        pq.write_table(table, part_path)
        _fsync_path(part_path)
        _fsync_dir(tmp_dir)
        if os.path.exists(final_dir):
            shutil.rmtree(final_dir)
        os.rename(tmp_dir, final_dir)
        _fsync_dir(os.path.dirname(final_dir))
        # best-effort sweep of stale tmp dirs left by dead attempts
        import glob

        for stale in glob.glob(f"{final_dir}.tmp.*"):
            shutil.rmtree(stale, ignore_errors=True)

        ts_col = None
        for cand in ("ts", "window_start", "last_ts"):
            if cand in table.column_names:
                ts_col = cand
                break
        record = {
            "shard": shard,
            "rows": table.num_rows,
            "input_fragments": list(input_fragments),
            "checksum": _checksum_table(table),
            "watermark_min": None,
            "watermark_max": None,
            "wall_s": round(time.perf_counter() - t0, 4),
            "completed_at": time.time(),
        }
        if ts_col is not None and table.num_rows:
            col = table.column(ts_col)
            if pa.types.is_timestamp(col.type):
                col = col.cast(pa.int64())
            record["watermark_min"] = pc.min(col).as_py()
            record["watermark_max"] = pc.max(col).as_py()
        if extra:
            record.update(extra)
        tmp_rec = self.record_path(shard) + ".tmp"
        with open(tmp_rec, "w") as f:
            json.dump(record, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp_rec, self.record_path(shard))
        _fsync_dir(self.manifest_dir)
        return record

    def metrics(self) -> dict:
        """Aggregate per-partition metrics across completed shards."""
        shards = sorted(self.completed_shards())
        recs = [self.load_record(s) for s in shards]
        return {
            "shards_completed": len(recs),
            "rows": sum(r["rows"] for r in recs),
            "watermark_max": max(
                (r["watermark_max"] for r in recs if r["watermark_max"] is not None),
                default=None,
            ),
            "wall_s_total": round(sum(r["wall_s"] for r in recs), 4),
        }


def run_sharded_rollup(samples_ds, out_dir: str, num_shards: int, *,
                       tiers=("1m", "1h", "1d"), gap_fill=None):
    """Resumable rollup: shard samples by series key, roll up only the
    shards missing from the checkpoint manifest, commit each atomically.

    Returns (manifest, shards_run, shards_skipped).  The per-shard work
    runs through the normal Dataset ladder; a resumed run filters
    completed shards out BEFORE the shuffle, so finished work is neither
    recomputed nor double-counted.
    """
    from ..stages.rollup import rollup_ladder

    manifest = CheckpointManifest(out_dir)
    manifest.ensure_sharding(num_shards)  # refuse mismatched resumes
    done = manifest.completed_shards()

    if done:
        # only a RESUME needs the input-side shard column (to filter
        # completed shards before the shuffle); a fresh run skips the
        # whole hash+append+drop pass over every sample
        done_list = sorted(done)
        sharded = samples_ds.map_batches(
            lambda b: add_shard_column(b, num_shards),
            batch_format="pyarrow", zero_copy_batch=True,
        ).map_batches(
            lambda b: b.filter(
                pc.invert(pc.is_in(b.column("shard"),
                                   value_set=pa.array(done_list, pa.int32())))
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        ladder_input = sharded.drop_columns(["shard"])
    else:
        ladder_input = samples_ds

    rollups = rollup_ladder(ladder_input, tiers=tiers, gap_fill=gap_fill)
    resharded = rollups.map_batches(
        lambda b: add_shard_column(b, num_shards),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    # Commit each shard INSIDE its group task (atomic tmp+rename + manifest
    # record written by the worker) — the driver only collects the tiny
    # per-shard record summaries, never the data.  Requires the output dir
    # to be on storage all workers share (true single-node and for any
    # cluster writing to shared/object storage).
    out_dir = manifest.out_dir

    def _commit(df) -> "pd.DataFrame":
        import pandas as pd

        shard = int(df["shard"].iloc[0])
        table = pa.Table.from_pandas(
            df.drop(columns=["shard"]), preserve_index=False
        )
        rec = CheckpointManifest(out_dir).commit_shard(shard, table)
        return pd.DataFrame({"shard": [shard], "rows": [rec["rows"]]})

    committed = resharded.groupby("shard").map_groups(
        _commit, batch_format="pandas"
    ).to_pandas()
    shards_run = sorted(int(s) for s in committed["shard"]) if len(committed) else []
    return manifest, shards_run, sorted(done)


def manifest_report(out_dir: str) -> pa.Table:
    """All shard lineage records of one stage output as a queryable Arrow
    table — the per-partition metrics surface (rows, watermarks, wall
    time, checksum) the north rule's "lineage + metrics" contract exposes
    to operators.  One row per committed shard; driver-side by design
    (the manifest is #shards rows, not data)."""
    mgr = CheckpointManifest(out_dir)
    shards = sorted(mgr.completed_shards())
    recs = [mgr.load_record(s) for s in shards]
    return pa.table({
        "shard": pa.array([r["shard"] for r in recs], pa.int32()),
        "rows": pa.array([r["rows"] for r in recs], pa.int64()),
        "watermark_min": pa.array(
            [r.get("watermark_min") for r in recs], pa.int64()),
        "watermark_max": pa.array(
            [r.get("watermark_max") for r in recs], pa.int64()),
        "wall_s": pa.array(
            [float(r.get("wall_s", 0.0)) for r in recs], pa.float64()),
        "checksum": pa.array(
            [r.get("checksum") for r in recs], pa.string()),
        "n_input_fragments": pa.array(
            [len(r.get("input_fragments", ())) for r in recs], pa.int64()),
    })
