"""Checkpoint manifest, atomic shard commit, and kill/resume semantics."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from json_time_series_extractor_ray.state.checkpoint import (
    CheckpointManifest,
    add_shard_column,
    run_sharded_rollup,
    shard_of,
)


def _samples_table(n_series=8, n_per=50):
    base = 1_704_067_200 * 10**9
    rows = {"series_key": [], "ts": [], "value_num": [], "value_kind": [],
            "doc_id": [], "sample_ordinal": []}
    for s in range(n_series):
        for i in range(n_per):
            rows["series_key"].append(f"series-{s:03d}")
            rows["ts"].append(base + i * 30 * 10**9 + s)
            rows["value_num"].append(float(s * 100 + i))
            rows["value_kind"].append(1)
            rows["doc_id"].append(f"d{s}-{i}")
            rows["sample_ordinal"].append(0)
    return pa.table(
        {
            "series_key": pa.array(rows["series_key"]),
            "ts": pa.array(rows["ts"], pa.int64()).cast(pa.timestamp("ns")),
            "value_num": pa.array(rows["value_num"], pa.float64()),
            "value_kind": pa.array(rows["value_kind"], pa.int8()),
            "doc_id": pa.array(rows["doc_id"]),
            "sample_ordinal": pa.array(rows["sample_ordinal"], pa.int32()),
        }
    )


class TestManifest:
    def test_shard_of_stable(self):
        assert shard_of("abc", 16) == shard_of("abc", 16)
        assert 0 <= shard_of("abc", 16) < 16

    def test_commit_is_atomic_and_recorded(self, tmp_path):
        m = CheckpointManifest(str(tmp_path / "out"))
        t = pa.table({"series_key": ["a"], "window_start": [1], "v": [2.0]})
        rec = m.commit_shard(3, t, input_fragments=["f1.parquet"])
        assert rec["rows"] == 1
        assert m.completed_shards() == {3}
        assert os.path.isdir(m.shard_dir(3))
        assert not os.path.exists(m.shard_dir(3) + ".tmp")
        loaded = m.load_record(3)
        assert loaded["input_fragments"] == ["f1.parquet"]
        assert loaded["checksum"] == rec["checksum"]

    def test_record_without_data_dir_not_completed(self, tmp_path):
        m = CheckpointManifest(str(tmp_path / "out"))
        t = pa.table({"x": [1]})
        m.commit_shard(0, t)
        import shutil

        shutil.rmtree(m.shard_dir(0))
        assert m.completed_shards() == set()

    def test_recommit_overwrites(self, tmp_path):
        m = CheckpointManifest(str(tmp_path / "out"))
        m.commit_shard(1, pa.table({"x": [1, 2]}))
        m.commit_shard(1, pa.table({"x": [5]}))
        assert m.load_record(1)["rows"] == 1


class TestResume:
    def test_resume_skips_completed_and_matches_full_run(self, ray_session, tmp_path):
        import ray

        table = _samples_table()
        num_shards = 4

        # Full run in one go -> reference output.
        full_dir = str(tmp_path / "full")
        ds = ray.data.from_arrow(table)
        m_full, run_full, skipped_full = run_sharded_rollup(
            ds, full_dir, num_shards
        )
        assert skipped_full == []
        assert set(run_full) == m_full.completed_shards()

        # Simulated kill: first run only sees half the shards completed.
        part_dir = str(tmp_path / "resumable")
        m1, run1, _ = run_sharded_rollup(
            ray.data.from_arrow(table), part_dir, num_shards
        )
        # wipe two shards' data+records to simulate a crash mid-job
        import shutil

        for s in run1[:2]:
            shutil.rmtree(m1.shard_dir(s))
            os.remove(m1.record_path(s))
        assert len(m1.completed_shards()) == len(run1) - 2

        m2, run2, skipped2 = run_sharded_rollup(
            ray.data.from_arrow(table), part_dir, num_shards
        )
        assert sorted(run2) == sorted(run1[:2])          # only missing shards
        assert sorted(skipped2) == sorted(run1[2:])      # finished skipped

        # Byte-identical results: every shard's checksum matches the full run.
        for s in m_full.completed_shards():
            assert m_full.load_record(s)["checksum"] == m2.load_record(s)["checksum"]
            assert m_full.load_record(s)["rows"] == m2.load_record(s)["rows"]

    def test_metrics_aggregate(self, ray_session, tmp_path):
        import ray

        m, run, _ = run_sharded_rollup(
            ray.data.from_arrow(_samples_table()), str(tmp_path / "o"), 4
        )
        metrics = m.metrics()
        assert metrics["shards_completed"] == len(run)
        assert metrics["rows"] > 0
        assert metrics["watermark_max"] is not None


class TestShardingGuards:
    def test_resume_with_different_num_shards_refused(self, tmp_path):
        import json
        import os

        import pytest as _pytest

        from json_time_series_extractor_ray.state.checkpoint import (
            CheckpointManifest,
        )

        m = CheckpointManifest(str(tmp_path / "out"))
        m.ensure_sharding(64)
        m.ensure_sharding(64)  # same value: fine
        with _pytest.raises(ValueError, match="num_shards=64"):
            m.ensure_sharding(32)
        meta = json.load(open(os.path.join(m.manifest_dir, "_meta.json")))
        assert meta["num_shards"] == 64

    def test_checksum_detects_even_duplication(self):
        import pyarrow as pa

        from json_time_series_extractor_ray.state.checkpoint import (
            _checksum_table,
        )

        t = pa.table({"a": [1, 2], "b": ["x", "y"]})
        doubled = pa.table({"a": [1, 1, 2, 2], "b": ["x", "x", "y", "y"]})
        empty = t.slice(0, 0)
        assert _checksum_table(t) != _checksum_table(doubled)
        assert _checksum_table(t) != _checksum_table(empty)
        # order-insensitive: permuted rows hash identically
        perm = pa.table({"a": [2, 1], "b": ["y", "x"]})
        assert _checksum_table(t) == _checksum_table(perm)
