"""Cluster job entry point: config JSON -> resumable extract+rollup job.

The engine twin of the reference CLI sample (the closest thing the
reference has to a "config -> pipeline -> writer" flow,
``samples/JsonTimeSeriesExtractor.Cli/Program.cs:11-73``), shaped for
``ray job submit``::

    ray job submit -- python -m json_time_series_extractor_ray.job \\
        --config job.json

Config schema (all paths may be any fsspec-able URI Ray Data can read)::

    {
      "input": "/data/corpus/",            # Parquet (doc_id, tokens, n_tok, source)
      "output_dir": "/data/out/",          # tiers + manifest + chunks under here
      "options": {"recursive": true, ...}, # ExtractorOptions.from_dict payload
      "tokenizer": "utf8",
      "tiers": ["1m", "1h", "1d"],
      "gap_fill": null,                    # null | "locf" | "linear"
      "num_shards": 64,                    # checkpoint/partition granularity
      "fallback_now_ns": 0,                # deterministic fallback timestamp
      "gorilla_chunks": true,              # also write per-series chunk files
      "chunk_bucket_ns": 86400000000000,   # optional: one chunk per series x bucket
      "compact_chunks": false,             # maintenance: merge small chunks
      "compact_target_points": 1000000,    # max points per compacted chunk
      "token_chunks": false,               # also archive the input corpus as
                                           # compressed varint token chunks
      "update_input": "/data/new/",        # incremental mode: roll up ONLY
                                           # these fragments and merge into
                                           # the stored tiers (nightly
                                           # append; writes rollups_updated)
      "retention": {"1m": ..., "1h": ...}, # per-tier TTL ns (true = defaults);
                                           # writes <out>/rollups_current with
                                           # expired windows dropped, watermark
                                           # taken from the shard manifests
      "extract_concurrency": null,         # null=tasks, int/(min,max)=actor pool
      "batch_size": null
    }

The job is resumable: rerunning with the same config skips shards already
recorded in ``<output_dir>/rollups/_manifest`` (see state/checkpoint.py).
Exit output is one JSON line of manifest metrics.
"""

from __future__ import annotations

import argparse
import json
import sys


def _replace_store(store: str, tmp_new: str, trash: str, write_fn) -> None:
    """Crash-safe directory replacement for the chunk stores.

    Protocol (every step idempotent, so ANY crash point recovers on the
    next run): (1) if a previous run died mid-swap — store missing but
    its old contents parked at ``trash`` — restore it first; (2) clear a
    stale partial ``tmp_new`` (Ray's write_parquet appends into an
    existing dir, which would double the data); (3) write the new store
    into ``tmp_new``; (4) clear a stale completed-swap ``trash``; (5)
    park the old store at ``trash``, promote ``tmp_new``, drop ``trash``.
    """
    import os
    import shutil

    if not os.path.isdir(store) and os.path.isdir(trash):
        os.rename(trash, store)  # undo a half-completed swap
    if os.path.isdir(tmp_new):
        shutil.rmtree(tmp_new)  # stale partial write from a dead run
    write_fn(tmp_new)
    if os.path.isdir(trash):
        shutil.rmtree(trash)  # leftover of a swap that DID complete
    if os.path.isdir(store):
        os.rename(store, trash)
        os.rename(tmp_new, store)
        shutil.rmtree(trash)
    else:
        os.rename(tmp_new, store)


def run_job(config: dict) -> dict:
    import ray

    if not ray.is_initialized():  # standalone runs; the driver/tests own Ray otherwise
        ray.init(address="local", include_dashboard=False)
        # Standalone sessions only (never mutate a caller-owned session):
        # 8 MB blocks keep the extraction kernel's per-batch sort + gather
        # working set in cache — measured 2-3x less extract CPU than the
        # default target on the 6M-doc headline (see bench.py).
        ray.data.DataContext.get_current().target_max_block_size = (
            8 * 1024 * 1024
        )

    from .pipelines.timeseries import extract_pipeline
    from .state.checkpoint import run_sharded_rollup

    out_dir = config["output_dir"].rstrip("/")
    tiers = tuple(config.get("tiers", ("1m", "1h", "1d")))

    update_input = config.get("update_input")
    if update_input:
        # Incremental update (nightly-append shape): roll up ONLY the new
        # corpus fragments and merge them into the stored tiers with
        # merge_tier_rollups — the historical corpus is never re-read.
        # Stored tiers must come from this engine (they carry the
        # last_doc/last_ord tie-break triple that makes the merge exact).
        # Output goes to <out>/rollups_updated; promoting it over
        # rollups/ is the operator's explicit (atomic rename) action.
        from .stages.rollup import merge_tier_rollups, rollup_ladder

        stored = ray.data.read_parquet(f"{out_dir}/rollups")
        inc_samples = extract_pipeline(
            ray.data.read_parquet(update_input),
            config.get("options") or {"recursive": True},
            tokenizer=config.get("tokenizer", "utf8"),
            concurrency=config.get("extract_concurrency"),
            batch_size=config.get("batch_size"),
            fallback_now_ns=config.get("fallback_now_ns", 0),
        )
        increment = rollup_ladder(inc_samples, tiers=tiers)
        merged = merge_tier_rollups([stored, increment], tiers=tiers)
        merged = merged.materialize()  # small rollup rows; consumed twice
        merged.write_parquet(f"{out_dir}/rollups_updated")
        return {
            "updated_rows": merged.count(),
            "update_input": update_input,
            "output": f"{out_dir}/rollups_updated",
        }

    corpus = ray.data.read_parquet(config["input"])
    samples = extract_pipeline(
        corpus,
        config.get("options") or {"recursive": True},
        tokenizer=config.get("tokenizer", "utf8"),
        concurrency=config.get("extract_concurrency"),
        batch_size=config.get("batch_size"),
        fallback_now_ns=config.get("fallback_now_ns", 0),
    )

    manifest, shards_run, shards_skipped = run_sharded_rollup(
        samples,
        f"{out_dir}/rollups",
        config.get("num_shards", 64),
        tiers=tiers,
        gap_fill=config.get("gap_fill"),
    )

    result = {
        "rollups": manifest.metrics(),
        "shards_run": shards_run,
        "shards_skipped": shards_skipped,
    }

    retention = config.get("retention")
    if retention:
        # Retention pass over the STORED tiers (the shape a 100 TB ladder
        # needs: expire what is on disk, pruning whole shards via manifest
        # watermarks first in principle, then row-filtering the rest).
        # Watermark comes from the manifest (max committed window_start) —
        # no recompute of the pipeline.
        from .pipelines.downsample import DEFAULT_TTL_NS, retention_expire

        ttl_ns = (
            dict(DEFAULT_TTL_NS)
            if retention is True
            else {tier: int(v) for tier, v in retention.items()}
        )
        wm = result["rollups"]["watermark_max"]
        rollups_ds = ray.data.read_parquet(f"{out_dir}/rollups")
        current = retention_expire(rollups_ds, ttl_ns=ttl_ns, watermark_ns=int(wm))
        current.write_parquet(f"{out_dir}/rollups_current")
        result["retention"] = {
            "watermark_ns": int(wm),
            "ttl_ns": ttl_ns,
            "rows_before": result["rollups"]["rows"],
        }

    if config.get("token_chunks", False):
        # Archive the INPUT corpus as compressed varint token chunks
        # (state/tokenstore.py): ~4x smaller than raw int32 token
        # columns for ASCII-heavy corpora, checksum-verified, doc-range
        # prunable on read — the storage leg of the tokens invariant
        # (read_token_chunks(out) == the corpus, bit-for-bit).
        from .state.tokenstore import compress_corpus_dataset

        tchunks = compress_corpus_dataset(corpus)
        tchunks.write_parquet(f"{out_dir}/token_chunks")
        result["token_chunks_written"] = True

    if config.get("gorilla_chunks", True):
        # Chunk pass re-derives samples (deterministic) so the rollup path
        # above never has to materialize the full sample stream twice.
        samples2 = extract_pipeline(
            corpus,
            config.get("options") or {"recursive": True},
            tokenizer=config.get("tokenizer", "utf8"),
            concurrency=config.get("extract_concurrency"),
            batch_size=config.get("batch_size"),
            fallback_now_ns=config.get("fallback_now_ns", 0),
        )
        from .state.gorilla import compress_series_dataset

        chunks = compress_series_dataset(
            samples2, bucket_ns=config.get("chunk_bucket_ns"))
        # crash-safe replace: a re-run REPLACES the chunk store instead
        # of appending a duplicate chunk set next to the old files
        _replace_store(
            f"{out_dir}/chunks", f"{out_dir}/chunks_writing",
            f"{out_dir}/chunks_replaced", chunks.write_parquet)
        result["chunks_written"] = True

    if config.get("compact_chunks", False):
        # Maintenance pass: merge the chunk store's accumulated small
        # chunks (one per series x bucket x run) back into few large
        # ones — bit-exact (state/gorilla.compact_chunks), published via
        # the same crash-safe replace protocol as the write pass.
        import os

        import ray

        from .state.gorilla import compact_chunks

        store = f"{out_dir}/chunks"
        trash = f"{out_dir}/chunks_precompact"
        # recovery must run BEFORE the read so a half-swapped store is
        # restored and then compacted, not skipped
        if not os.path.isdir(store) and os.path.isdir(trash):
            os.rename(trash, store)
        if os.path.isdir(store):
            compacted = compact_chunks(
                ray.data.read_parquet(store),
                target_points=int(config.get("compact_target_points",
                                             1_000_000)),
            )
            _replace_store(store, f"{out_dir}/chunks_compacting", trash,
                           compacted.write_parquet)
            result["chunks_compacted"] = True

    return result


def main(argv=None):
    ap = argparse.ArgumentParser(prog="json_time_series_extractor_ray.job")
    ap.add_argument("--config", required=True, help="path to job config JSON")
    args = ap.parse_args(argv)
    with open(args.config) as f:
        config = json.load(f)
    result = run_job(config)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
