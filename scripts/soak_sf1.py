"""sf1 (10x sf0.1) soak: headline + the 5 slowest bench queries at 32
CPUs (round-3 verdict item 8).

Validates that the engine's memory-bounded claims (bounded combiners,
8 MB blocks, broadcast guards) hold when the input no longer fits the
page cache.  Scratch data lives under /tmp (the driver testdata dirs
are read-only); scaled tables are synthesized deterministically from
sf0.1 by key-offset replication so join cardinalities and key
distributions scale 10x while dimension tables (nation/region) stay
fixed — the realistic web-scale shape (fact tables grow, dims don't).

The document/embedding replicas keep their text/vectors VERBATIM (only
doc_id offsets), so every document is a 10-way exact duplicate — a
deliberate duplication-stress shape (web crawls are duplicate-saturated)
that makes the dedup family's bucket-then-verify stages absorb 10-member
duplicate groups instead of the near-empty buckets of sf0.1.

Usage:
    python scripts/soak_sf1.py build     # ~1 min, writes /tmp/jtse_sf1
    python scripts/soak_sf1.py run       # the 5 slowest r3 bench queries
    python scripts/soak_sf1.py run-docs  # the dedup/ANN family, 10x docs
    python scripts/soak_sf1.py all      # build (if needed) + run both

The 60M-doc headline soak runs through bench.py directly:
    JTSE_BENCH_DOCS=60000000 python bench.py --headline-only
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
DST = "/tmp/jtse_sf1"
REPLICAS = 10

# Clean per-replica key offsets (next power of 10 above the sf0.1 max)
OFFSETS = {
    "lineitem": {"l_orderkey": 1_000_000, "l_suppkey": 10_000},
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 100_000},
    "customer": {"c_custkey": 100_000},
    "supplier": {"s_suppkey": 10_000},
    "events": {"event_id": 1_000_000, "user_id": 100_000},
    # the document/embedding family: doc_id offsets keep the replicas
    # distinct (so dedup finds the PLANTED near-dups 10x over, not
    # cross-replica accidents of id collision)
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}
#: dimension tables the soak never grows — linked through unchanged
PASSTHROUGH = ("region", "nation", "part")

#: the 5 slowest queries of the round-3 full bench (BENCH_r03.json)
SOAK_QUERIES = (
    "returned_item_revenue",
    "revenue_by_nation",
    "events_psi_drift",
    "large_volume_orders",
    "local_supplier_volume",
)

#: document/embedding-family soak set (round-4 extension): the heavy
#: dedup / textstats / ANN representatives over the 10x corpus
DOC_SOAK_QUERIES = (
    "minhash_lsh_dups",
    "doc_duplicated_spans",
    "doc_bigram_logprob",
    "semdedup_flags",
    "ann_cosine_topk",
)

#: round-5 distributed-statistics soak set: the value-ordered shard
#: passes (prefix-rank Mann-Whitney, shard-navigation PSI quantile,
#: offset-broadcast Wasserstein) over 10x fact data — no task holds a
#: whole series' distinct-value table at any scale
DIST_SOAK_QUERIES = (
    "events_weekend_mannwhitney",
    "events_psi_drift",
    "events_wasserstein_drift",
)


def build() -> None:
    # Single parquet FILE per table (matching the testdata layout —
    # several queries read schemas via pyarrow directly, which rejects
    # directories), streamed row-group-by-row-group so peak memory is
    # one source row group x REPLICAS.
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(DST, exist_ok=True)
    for table in PASSTHROUGH:
        link = f"{DST}/{table}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{SRC}/{table}.parquet", link)
    for table, offsets in OFFSETS.items():
        out_path = f"{DST}/{table}.parquet"
        if os.path.exists(out_path) and not os.path.isdir(out_path):
            continue
        if os.path.isdir(out_path):  # leftover from an older layout
            import shutil
            shutil.rmtree(out_path)
        src = pq.ParquetFile(f"{SRC}/{table}.parquet")
        tmp = out_path + ".tmp"
        with pq.ParquetWriter(tmp, src.schema_arrow) as writer:
            for rg in range(src.metadata.num_row_groups):
                batch = src.read_row_group(rg)
                for i in range(REPLICAS):
                    t = batch
                    for col, off in offsets.items():
                        t = t.set_column(
                            t.schema.get_field_index(col), col,
                            pc.add(t.column(col),
                                   pa.scalar(i * off, pa.int64())))
                    writer.write_table(t)
        os.replace(tmp, out_path)
        print(f"built {table} x{REPLICAS}", file=sys.stderr)


def run(queries=SOAK_QUERIES, metric: str = "sf1_soak_5_slowest",
        num_cpus: int = 32) -> dict:
    import ray

    from bench import bench_query, probe_host_memory

    probe = probe_host_memory()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, log_to_driver=False)
        ray.data.DataContext.get_current().target_max_block_size = (
            8 * 1024 * 1024)
    results = {}
    for name in queries:
        t0 = time.perf_counter()
        r = bench_query(name, DST)
        results[name] = {**r, "total_sec": round(time.perf_counter() - t0, 3)}
        print(f"{name}: {r}", file=sys.stderr)
    out = {
        "metric": metric,
        "sf": 1.0,
        "num_cpus": num_cpus,
        "replicas": REPLICAS,
        "queries": {k: v["sec"] for k, v in results.items()},
        "rows": {k: v["rows"] for k, v in results.items()},
        "host_probe": probe,
    }
    return out


def run_dist(num_cpus: int = 32) -> dict:
    """10x soak of the round-5 distributed statistics with the DRIVER
    FOLD DISABLED (``driver_fold_rows=0``) so the value-ordered shard
    rounds — the 100 TB path — are what actually runs, alongside the
    adaptive default for comparison."""
    import ray

    from bench import probe_host_memory
    from json_time_series_extractor_ray.pipelines.diffstats import (
        _numeric_samples,
    )
    from json_time_series_extractor_ray.pipelines.psidrift import (
        psi_drift,
        wasserstein_drift,
    )
    from json_time_series_extractor_ray.pipelines.ranktests import (
        mannwhitney_weekend,
    )

    probe = probe_host_memory()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, log_to_driver=False)
        ray.data.DataContext.get_current().target_max_block_size = (
            8 * 1024 * 1024)
    fns = {
        "events_weekend_mannwhitney": mannwhitney_weekend,
        "events_psi_drift": psi_drift,
        "events_wasserstein_drift": wasserstein_drift,
    }
    # one source of truth for the soak set: DIST_SOAK_QUERIES
    ops = {name: fns[name] for name in DIST_SOAK_QUERIES}
    out = {"metric": "sf1_soak_dist_stats", "sf": 1.0,
           "num_cpus": num_cpus, "replicas": REPLICAS,
           "queries": {}, "rows": {}, "host_probe": probe}
    for name, fn in ops.items():
        for mode, kw in (("sharded", {"driver_fold_rows": 0}),
                         ("adaptive", {})):
            t0 = time.perf_counter()
            r = fn(_numeric_samples(DST), **kw)
            n = len(r) if hasattr(r, "__len__") else r.count()
            key = f"{name}[{mode}]"
            out["queries"][key] = round(time.perf_counter() - t0, 3)
            out["rows"][key] = int(n)
            print(f"{key}: {out['queries'][key]} s, {n} rows",
                  file=sys.stderr)
    return out


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("build", "all"):
        build()
    if mode in ("run", "all"):
        print(json.dumps(run()))
    if mode in ("run-docs", "all"):
        print(json.dumps(run(DOC_SOAK_QUERIES, "sf1_soak_doc_family")))
    if mode in ("run-dist", "all"):
        print(json.dumps(run_dist()))


if __name__ == "__main__":
    main()
