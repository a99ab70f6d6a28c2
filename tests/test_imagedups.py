"""dHash image near-dup: brightness-offset invariance (the integer
cross-product proof), discrimination, guards, and the cluster pipeline."""

import numpy as np
import pytest

from json_time_series_extractor_ray.functions.mediacodecs import encode_bmp
from json_time_series_extractor_ray.pipelines.imagedups import (
    dhash64,
    image_dhash_clusters,
    synthesize_dup_image_table,
)


def test_brightness_offset_invariance_property():
    rng = np.random.default_rng(1)
    for _ in range(50):
        h = rng.integers(8, 40)
        w = rng.integers(9, 40)
        px = rng.integers(0, 200, size=(h, w, 3), dtype=np.uint8)
        for k in (1, 8, 55):
            shifted = px + np.uint8(k)  # never clips: max 199 + 55
            assert dhash64(px) == dhash64(shifted), (h, w, k)


def test_distinct_content_distinct_hash():
    rng = np.random.default_rng(2)
    hashes = {
        dhash64(rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8))
        for _ in range(64)
    }
    assert len(hashes) == 64


def test_tiny_image_guard():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="resize tiny images"):
        dhash64(px)


def test_hash_is_hex64():
    px = np.random.default_rng(3).integers(0, 256, (16, 16, 3),
                                           dtype=np.uint8)
    h = dhash64(px)
    assert len(h) == 16
    int(h, 16)  # parses as hex


def test_cluster_pipeline_planted_groups(ray_session):
    import pyarrow as pa
    import ray

    tbl = synthesize_dup_image_table(list(range(200)), n_groups=5)
    media = ray.data.from_arrow(tbl)
    out = image_dhash_clusters(media, avg_payload_bytes=4096).to_pandas()
    # 100 even ids in 5 content groups of 20 each
    assert len(out) == 5
    assert sorted(out["cluster_size"]) == [20] * 5
    assert sorted(out["rep_doc"]) == [0, 2, 4, 6, 8]
    assert isinstance(tbl, pa.Table)


def test_mjbm_frame_sample_real(ray_session):
    import pyarrow as pa
    import ray

    from json_time_series_extractor_ray.functions.mediacodecs import (
        decode_bmp,
        encode_mjbm,
    )
    from json_time_series_extractor_ray.pipelines.multimodal import (
        FrameSampleStage,
    )

    frames = [np.full((8 + f, 8 + f, 3), f, np.uint8) for f in range(5)]
    media = pa.table({
        "media_id": pa.array(["v1"], pa.string()),
        "kind": pa.array(["video"], pa.string()),
        "payload": pa.array([encode_mjbm(frames)], pa.large_binary()),
    })
    out = (ray.data.from_arrow(media)
           .map_batches(FrameSampleStage,
                        fn_constructor_kwargs=dict(n_frames=4, every_k=2),
                        concurrency=1, batch_format="pyarrow")
           .to_pandas())
    # every 2nd of the first 4 stored frames: indexes 0 and 2
    assert out["frame_index"].tolist() == [0, 2]
    sizes = [decode_bmp(b).shape for b in out["frame"]]
    assert sizes == [(8, 8, 3), (10, 10, 3)]


def test_frame_sample_unknown_container_raises(ray_session):
    from json_time_series_extractor_ray.pipelines.multimodal import (
        FrameSampleStage,
    )
    import pyarrow as pa
    import pytest

    stage = FrameSampleStage(n_frames=2)
    batch = pa.table({
        "media_id": pa.array(["x"], pa.string()),
        "kind": pa.array(["video"], pa.string()),
        "payload": pa.array([b"\x00\x01\x02\x03garbage"],
                            pa.large_binary()),
    })
    with pytest.raises(NotImplementedError, match="MJBM"):
        stage(batch)
