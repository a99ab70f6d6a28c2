"""End-to-end job entry point: config -> resumable run -> resume no-op."""

import json
import os

import pyarrow.parquet as pq
import pytest

from json_time_series_extractor_ray.corpus import iot_corpus_table
from json_time_series_extractor_ray.job import run_job


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    pq.write_table(iot_corpus_table(2000, seed=3), str(d / "part-0.parquet"))
    return str(d)


def _config(corpus_dir, out_dir):
    return {
        "input": corpus_dir,
        "output_dir": out_dir,
        "options": {"recursive": True, "allow_nested_timestamps": True},
        "tiers": ["1m", "1h"],
        "num_shards": 8,
        "gorilla_chunks": True,
    }


def test_job_full_then_resume(ray_session, corpus_dir, tmp_path):
    out_dir = str(tmp_path / "out")
    cfg = _config(corpus_dir, out_dir)

    r1 = run_job(cfg)
    assert r1["rollups"]["shards_completed"] > 0
    assert r1["rollups"]["rows"] > 0
    assert r1["shards_skipped"] == []
    assert os.path.isdir(f"{out_dir}/rollups/_manifest")
    assert os.path.isdir(f"{out_dir}/chunks")

    # real chunk bytes on disk, every one decodable back to its points
    import pyarrow.dataset as pads

    from json_time_series_extractor_ray.state.gorilla import decompress_chunk

    chunks = pads.dataset(f"{out_dir}/chunks").to_table()
    assert chunks.num_rows > 0
    for row in chunks.to_pylist():
        ts, vals = decompress_chunk(row["chunk"])
        assert len(ts) == row["n_points"] == len(vals)
        if len(ts):
            assert ts[0] == row["t_min"] and ts[-1] == row["t_max"]
            assert len(row["chunk"]) < row["raw_bytes"]  # it actually compresses

    # resume: everything skipped, nothing recomputed
    r2 = run_job(cfg)
    assert r2["shards_run"] == []
    assert sorted(r2["shards_skipped"]) == sorted(r1["shards_run"])
    assert r2["rollups"]["rows"] == r1["rollups"]["rows"]


def test_write_tiers_partitioned(ray_session, corpus_dir, tmp_path):
    import os

    import pyarrow.dataset as pads
    import ray

    from json_time_series_extractor_ray.pipelines.timeseries import (
        extract_and_rollup,
        write_tiers,
    )

    corpus = ray.data.read_parquet(corpus_dir)
    rollups = extract_and_rollup(
        corpus, {"recursive": True, "allow_nested_timestamps": True},
        tiers=("1m", "1h"),
    )
    out = str(tmp_path / "tiers")
    write_tiers(rollups, out)
    subdirs = sorted(d for d in os.listdir(out) if d.startswith("tier="))
    assert subdirs == ["tier=1h", "tier=1m"]
    t = pads.dataset(f"{out}/tier=1m").to_table()
    assert t.num_rows > 0
    assert "series_key" in t.column_names


def test_job_retention_pass(ray_session, corpus_dir, tmp_path):
    import pyarrow.dataset as pads

    from json_time_series_extractor_ray.stages.rollup import WINDOW_NS

    out_dir = str(tmp_path / "out_ret")
    five_min = 5 * WINDOW_NS["1m"]
    cfg = _config(corpus_dir, out_dir)
    cfg["gorilla_chunks"] = False
    # 1m tier keeps five minutes before the watermark (the test corpus
    # spans ~16 minutes); 1h keeps everything.
    cfg["retention"] = {"1m": five_min, "1h": 365 * WINDOW_NS["1d"]}

    r = run_job(cfg)
    assert r["retention"]["watermark_ns"] == r["rollups"]["watermark_max"]

    full = pads.dataset(f"{out_dir}/rollups").to_table().to_pandas()
    cur = pads.dataset(f"{out_dir}/rollups_current").to_table().to_pandas()
    wm = r["retention"]["watermark_ns"]

    # 1h tier untouched; 1m tier pruned to windows within five minutes
    # of the manifest watermark; nothing else changed.
    assert len(cur[cur["tier"] == "1h"]) == len(full[full["tier"] == "1h"])
    kept_1m = cur[cur["tier"] == "1m"]["window_start"].astype("int64")
    assert (kept_1m >= wm - five_min).all()
    expect_1m = full[full["tier"] == "1m"]["window_start"].astype("int64")
    assert len(kept_1m) == (expect_1m >= wm - five_min).sum()
    assert len(kept_1m) < len(expect_1m)  # something actually expired


def test_job_incremental_update(ray_session, tmp_path):
    """Nightly-append shape: job on the first half of the corpus, then an
    update_input run merging the second half — rollups_updated must match
    a one-shot job over the full corpus (exact on order-independent
    columns; sum/mean within float-reassociation tolerance)."""
    import numpy as np
    import pandas as pd
    import pyarrow.dataset as pads

    full = iot_corpus_table(2000, seed=9)
    d_full = tmp_path / "full"; d_full.mkdir()
    d_a = tmp_path / "a"; d_a.mkdir()
    d_b = tmp_path / "b"; d_b.mkdir()
    pq.write_table(full, str(d_full / "part-0.parquet"))
    pq.write_table(full.slice(0, 1000), str(d_a / "part-0.parquet"))
    pq.write_table(full.slice(1000), str(d_b / "part-0.parquet"))

    def cfg(inp, out):
        return {
            "input": inp, "output_dir": out,
            "options": {"recursive": True, "allow_nested_timestamps": True},
            "tiers": ["1m", "1h"], "num_shards": 4, "gorilla_chunks": False,
        }

    out_half = str(tmp_path / "out_half")
    run_job(cfg(str(d_a), out_half))
    upd = run_job({**cfg(str(d_a), out_half), "update_input": str(d_b)})
    assert upd["updated_rows"] > 0

    out_full = str(tmp_path / "out_full")
    run_job(cfg(str(d_full), out_full))

    key = ["tier", "series_key", "window_start"]
    got = (
        pads.dataset(f"{out_half}/rollups_updated").to_table().to_pandas()
        .sort_values(key, ignore_index=True)
    )
    want = (
        pads.dataset(f"{out_full}/rollups").to_table().to_pandas()
        .drop(columns=["shard"], errors="ignore")
        .sort_values(key, ignore_index=True)
    )
    assert len(got) == len(want)
    exact = [c for c in want.columns if c not in ("sum", "mean")]
    pd.testing.assert_frame_equal(
        got[exact].reset_index(drop=True), want[exact].reset_index(drop=True),
        check_exact=True, check_dtype=False, check_categorical=False,
    )
    for c in ("sum", "mean"):
        np.testing.assert_allclose(got[c], want[c], rtol=1e-12)


def test_job_token_chunk_archive(ray_session, corpus_dir, tmp_path):
    import numpy as np
    import ray

    from json_time_series_extractor_ray.sources.token_chunks import (
        read_token_chunks,
    )

    out_dir = str(tmp_path / "out_tok")
    cfg = _config(corpus_dir, out_dir)
    cfg["token_chunks"] = True
    cfg["gorilla_chunks"] = False
    r = run_job(cfg)
    assert r["token_chunks_written"] is True

    back = read_token_chunks(f"{out_dir}/token_chunks").to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    orig = ray.data.read_parquet(corpus_dir).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert back["doc_id"].tolist() == orig["doc_id"].tolist()
    for a, b in zip(orig["tokens"], back["tokens"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_job_compaction_pass(ray_session, corpus_dir, tmp_path):
    """gorilla_chunks with a small bucket -> many chunks; compact_chunks
    pass merges them; readback is identical either way."""
    import pandas as pd
    import pyarrow as pa
    import ray

    from json_time_series_extractor_ray.sources.gorilla_chunks import (
        read_gorilla_chunks,
    )

    out = str(tmp_path / "out")
    cfg = _config(corpus_dir, out)
    cfg["chunk_bucket_ns"] = 300_000_000_000  # 5-min buckets (corpus spans ~16 min)
    r1 = run_job(cfg)
    assert r1["chunks_written"]
    before = pq.read_table(f"{out}/chunks")
    samples_before = read_gorilla_chunks(f"{out}/chunks").to_pandas() \
        .sort_values(["series_key", "ts_ns"], ignore_index=True)

    # maintenance-only run: compact the EXISTING store (a second
    # chunk-writing run would append a duplicate chunk set)
    cfg["compact_chunks"] = True
    cfg["gorilla_chunks"] = False
    r2 = run_job(cfg)
    assert r2.get("chunks_compacted")
    after = pq.read_table(f"{out}/chunks")
    assert after.num_rows < before.num_rows  # fewer, larger chunks
    assert not os.path.isdir(f"{out}/chunks_precompact")  # swap completed
    samples_after = read_gorilla_chunks(f"{out}/chunks").to_pandas() \
        .sort_values(["series_key", "ts_ns"], ignore_index=True)
    pd.testing.assert_frame_equal(samples_before, samples_after)


def test_manifest_report(ray_session, corpus_dir, tmp_path):
    from json_time_series_extractor_ray.state.checkpoint import (
        manifest_report,
    )

    out = str(tmp_path / "out")
    run_job(_config(corpus_dir, out))
    rep = manifest_report(os.path.join(out, "rollups")).to_pandas()
    # every committed shard reports; empty shards may not commit a dir
    assert 1 <= len(rep) <= 8
    assert (rep["rows"] >= 0).all()
    assert rep["checksum"].notna().all()
    done = rep[rep["rows"] > 0]
    assert (done["watermark_max"] >= done["watermark_min"]).all()
