"""Z-order layout: Morton kernel properties, bucket stats, and the
partitioned z-sorted writer."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from json_time_series_extractor_ray.pipelines.zorder import (
    Z_BITS,
    events_bounds_from_footer,
    morton_interleave,
    scale_to_bits,
    write_zorder_partitions,
    zorder_bucket_stats,
)

_H = 3_600_000_000_000


class TestMortonKernel:
    def test_roundtrip_bits(self):
        rng = np.random.default_rng(9)
        x = rng.integers(0, 1 << Z_BITS, 500)
        y = rng.integers(0, 1 << Z_BITS, 500)
        z = morton_interleave(x, y, Z_BITS)
        # de-interleave and compare
        xr = np.zeros(len(z), dtype=np.int64)
        yr = np.zeros(len(z), dtype=np.int64)
        for i in range(Z_BITS):
            xr |= ((z >> (2 * i)) & 1) << i
            yr |= ((z >> (2 * i + 1)) & 1) << i
        np.testing.assert_array_equal(xr, x)
        np.testing.assert_array_equal(yr, y)

    def test_locality_monotone_on_axes(self):
        # fixing one dim, the code is monotone in the other
        y = np.zeros(100, dtype=np.int64)
        x = np.arange(100, dtype=np.int64)
        z = morton_interleave(x, y, Z_BITS)
        assert (np.diff(z) > 0).all()

    def test_scale_constant_dim_is_zero(self):
        v = np.full(10, 7, dtype=np.int64)
        assert (scale_to_bits(v, 7, 7) == 0).all()


def _events(ray, n=4000, seed=12):
    rng = np.random.default_rng(seed)
    t = pa.table({
        "event_id": pa.array([f"e{i:06d}" for i in range(n)], pa.string()),
        "user_id": pa.array(rng.integers(0, 50, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 720 * _H, n),
                       pa.int64()).cast(pa.timestamp("ns")),
    })
    return ray.data.from_arrow(t), t


class TestZorderPipeline:
    def test_bucket_stats_partition_zspace(self, ray_session):
        ds, t = _events(ray_session)
        bounds = (0, 49, 0, 719)
        got = zorder_bucket_stats(ds, bounds).to_pandas() \
            .sort_values("bucket", ignore_index=True)
        # buckets are disjoint contiguous z-cells: ranges must not overlap
        assert (got["z_min"] <= got["z_max"]).all()
        assert (got["z_max"].to_numpy()[:-1]
                < got["z_min"].to_numpy()[1:]).all()
        assert got["n_rows"].sum() == t.num_rows
        assert len(got) > 4  # both dims vary -> many cells

    def test_write_partitions_sorted_and_resumable(self, ray_session,
                                                   tmp_path):
        ds, t = _events(ray_session, n=2000, seed=13)
        bounds = (0, 49, 0, 719)
        out = str(tmp_path / "zorder")
        manifest = write_zorder_partitions(ds, out, bounds)
        assert sum(n for _, n, _ in manifest) == t.num_rows
        total = 0
        prev_bucket_max = -1
        for b, n, path in manifest:
            part = pq.read_table(path)
            z = part.column("z").to_numpy()
            assert (np.diff(z) >= 0).all()          # z-sorted inside
            assert z.min() > prev_bucket_max        # buckets ordered
            prev_bucket_max = int(z.max())
            total += part.num_rows
        assert total == t.num_rows
        # resumability contract: every bucket directory is final (no .tmp)
        assert not [p for p in os.listdir(out) if p.endswith(".tmp")]

    def test_rerun_skips_existing_buckets(self, ray_session, tmp_path):
        """A restarted run must SKIP committed buckets (not crash on
        os.rename into a non-empty dir) and still report the full
        manifest; a stale .tmp from a killed writer is cleaned up."""
        import shutil

        ds, t = _events(ray_session, n=2000, seed=13)
        bounds = (0, 49, 0, 719)
        out = str(tmp_path / "zorder_rerun")
        first = write_zorder_partitions(ds, out, bounds)
        # simulate a killed run: remove one committed bucket, leave a
        # stale .tmp for another
        victim_b, victim_n, victim_path = first[1]
        shutil.rmtree(victim_path)
        stale = first[2][2] + ".tmp"
        os.makedirs(stale, exist_ok=True)
        with open(os.path.join(stale, "garbage"), "w") as f:
            f.write("partial")
        second = write_zorder_partitions(ds, out, bounds)
        assert second == first                      # identical manifest
        assert os.path.isdir(victim_path)           # rewritten
        assert not os.path.isdir(stale)             # stale tmp cleaned
        assert sum(n for _, n, _ in second) == t.num_rows

    def test_footer_bounds_match_data(self, ray_session):
        sf = "/root/testdata/sf0.001"
        x_lo, x_hi, h_lo, h_hi = events_bounds_from_footer(
            f"{sf}/events.parquet")
        t = pq.read_table(f"{sf}/events.parquet", columns=["user_id", "ts"])
        uid = t.column("user_id").to_numpy()
        ts = t.column("ts").cast(pa.timestamp("ns")).cast(pa.int64()) \
            .to_numpy()
        assert (x_lo, x_hi) == (uid.min(), uid.max())
        assert h_lo == ts.min() // _H and h_hi == ts.max() // _H
