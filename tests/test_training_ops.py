"""Training-data operators: dedup recall, similarity search, multimodal
plumbing, gap-filled ladder."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from json_time_series_extractor_ray.pipelines.dedup import (
    MinHashLshStage,
    exact_dedup,
    jaccard_block_pairs,
    minhash_lsh_dups,
    near_dup_clusters,
    shingle_sets,
    simhash_dups,
    _hash_shingles,
)
from json_time_series_extractor_ray.pipelines.multimodal import (
    DecodeStage,
    decode_media_dataset,
    media_batch_size,
    synthesize_media_table,
)
from json_time_series_extractor_ray.pipelines.similarity import (
    brute_force_topk,
    ivf_topk,
)

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango"
).split()


def _doc_table(n=60, seed=5, with_dups=True):
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(rng.choice(WORDS, size=40).tolist()) for _ in range(n)
    ]
    if with_dups:
        # 60/61: exact dups of 0; 62: near-dup of 1 (one word changed)
        texts.append(texts[0])
        texts.append(texts[0])
        w = texts[1].split()
        w[5] = "zulu"
        texts.append(" ".join(w))
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
        }
    )


class TestDedup:
    def test_exact_dedup_collapses_copies(self, ray_session):
        import ray

        t = _doc_table()
        out = exact_dedup(ray.data.from_arrow(t)).to_pandas()
        n = t.num_rows
        assert len(out) == n - 2  # two exact copies collapse
        grp = out[out["n_copies"] == 3]
        assert len(grp) == 1 and grp["doc_id"].iloc[0] == 0

    def test_minhash_estimates_match_true_jaccard(self):
        t = _doc_table()
        stage = MinHashLshStage()
        sets = shingle_sets(t.column("text"))
        sig_a = stage.signature(_hash_shingles(sets[1]))
        sig_b = stage.signature(_hash_shingles(sets[62]))
        est = (sig_a == sig_b).mean()
        true_j = len(sets[1] & sets[62]) / len(sets[1] | sets[62])
        assert abs(est - true_j) < 0.25
        assert true_j > 0.7  # construction sanity

    def test_minhash_lsh_finds_planted_near_dups(self, ray_session):
        import ray

        out = minhash_lsh_dups(
            ray.data.from_arrow(_doc_table()), threshold=0.5
        ).to_pandas()
        pairs = set(map(tuple, out[["doc_a", "doc_b"]].to_numpy()))
        assert (0, 60) in pairs and (0, 61) in pairs and (60, 61) in pairs
        assert (1, 62) in pairs  # near-dup caught
        # random docs don't collide at threshold 0.5
        assert len(pairs) == 4

    def test_simhash_finds_planted_dups(self, ray_session):
        import ray

        out = simhash_dups(ray.data.from_arrow(_doc_table())).to_pandas()
        pairs = set(map(tuple, out[["doc_a", "doc_b"]].to_numpy()))
        assert (0, 60) in pairs and (0, 61) in pairs
        assert all(h <= 3 for h in out["hamming"])

    def test_jaccard_block_pairs_exact(self, ray_session):
        import ray

        t = _doc_table()
        out = jaccard_block_pairs(
            ray.data.from_arrow(t), threshold=0.5
        ).to_pandas()
        sets = shingle_sets(t.column("text"))
        expected = set()
        for a in range(len(sets)):
            for b in range(a + 1, len(sets)):
                inter = len(sets[a] & sets[b])
                if inter and inter / len(sets[a] | sets[b]) >= 0.5:
                    expected.add((a, b))
        assert set(map(tuple, out[["doc_a", "doc_b"]].to_numpy())) == expected

    def test_jaccard_prefix_join_exact_and_global(self, ray_session):
        """Prefix filtering must return EXACTLY the all-pairs result at
        tau — including a pair the lang-blocked variant cannot see
        (planted exact dup with a DIFFERENT lang tag)."""
        import ray

        from json_time_series_extractor_ray.pipelines.dedup import (
            jaccard_prefix_join,
        )

        t = _doc_table()
        # retag the two exact dups of doc 0 into another language: the
        # blocked variant would never pair (0, 60) / (0, 61)
        langs = ["en"] * t.num_rows
        langs[60] = langs[61] = "de"
        t = t.set_column(2, "lang", pa.array(langs))
        out = jaccard_prefix_join(
            ray.data.from_arrow(t), tau=0.5
        ).to_pandas()
        sets = shingle_sets(t.column("text"))
        expected = {}
        for a in range(len(sets)):
            for b in range(a + 1, len(sets)):
                if not sets[a] or not sets[b]:
                    continue
                inter = len(sets[a] & sets[b])
                jac = round(inter / len(sets[a] | sets[b]), 6)
                if jac >= 0.5:
                    expected[(a, b)] = jac
        got = {(a, b): j for a, b, j in
               out[["doc_a", "doc_b", "jaccard"]].itertuples(index=False)}
        assert got == expected
        assert (0, 60) in got and (0, 61) in got


def _emb_table(n=200, d=16, seed=9):
    rng = np.random.default_rng(seed)
    E = rng.standard_normal((n, d)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([row.tolist() for row in E],
                                  pa.list_(pa.float32())),
            "label": pa.array((np.arange(n) % 5).astype(np.int32)),
        }
    ), E


class TestBloom:
    def test_no_false_negatives_and_fp_bound(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.sketches import (
            bloom_build,
            bloom_filter_out,
        )

        members = [f"seen-{i}" for i in range(2000)]
        fresh = [f"new-{i}" for i in range(2000)]
        seen_t = pa.table({"fp": pa.array(members)})
        mixed_t = pa.table({"fp": pa.array(members + fresh)})
        m_bits = 1 << 14  # deliberately tight so FPs are measurable
        bloom = bloom_build(
            ray.data.from_arrow(seen_t).repartition(4), column="fp",
            m_bits=m_bits,
        )
        out = bloom_filter_out(
            ray.data.from_arrow(mixed_t), bloom, column="fp", m_bits=m_bits
        ).to_pandas()
        survivors = set(out["fp"])
        # no false negatives: every member was filtered out
        assert not survivors.intersection(members)
        # false-positive rate within a loose multiple of the analytic bound
        fp_rate = 1 - len(survivors) / len(fresh)
        k, n = 7, len(members)
        analytic = (1 - np.exp(-k * n / m_bits)) ** k
        assert fp_rate < 4 * analytic + 0.01, (fp_rate, analytic)


class TestMisraGries:
    def test_undersized_capacity_guarantee(self, ray_session):
        """Zipf-ish planted counts with m far below the distinct-key count:
        every key with true frequency > N/(m+1) must survive, and every
        reported count must lie in [true - err, true]."""
        import ray

        from json_time_series_extractor_ray.pipelines.sketches import (
            heavy_hitters_with_error,
        )

        rng = np.random.default_rng(5)
        # 20 heavy keys (~300 each) + 2000 singletons-ish tail
        vals = np.concatenate(
            [np.repeat(np.arange(20), 300),
             rng.integers(1000, 3000, size=4000)]
        ).astype(np.int64)
        rng.shuffle(vals)
        t = pa.table({"k": pa.array(vals, pa.int64())})
        m = 64
        n = len(vals)
        summary, err = heavy_hitters_with_error(
            ray.data.from_arrow(t).repartition(4), column="k", m=m
        )
        got = dict(zip(summary["k"].to_pylist(), summary["n"].to_pylist()))
        true = pd.Series(vals).value_counts()
        threshold = n / (m + 1)
        for key, freq in true.items():
            if freq > threshold:
                assert key in got, f"heavy key {key} (freq {freq}) missing"
        for key, cnt in got.items():
            assert cnt <= true[key], f"overcount for {key}"
            assert cnt >= true[key] - err, f"undercount beyond bound for {key}"

    def test_exact_when_capacity_sufficient(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.sketches import (
            heavy_hitters_with_error,
        )

        vals = np.repeat(np.arange(50), np.arange(1, 51))
        t = pa.table({"k": pa.array(vals, pa.int64())})
        summary, err = heavy_hitters_with_error(
            ray.data.from_arrow(t).repartition(3), column="k", m=1024
        )
        assert err == 0
        got = dict(zip(summary["k"].to_pylist(), summary["n"].to_pylist()))
        assert got == {int(k): int(k) + 1 for k in range(50)}


class TestCorpusCuration:
    def test_dedup_filter_split_composed(self, ray_session):
        """Planted corpus: docs 0/3 share identical (normalized) text ->
        only min id 0 survives; doc 4's two-word text scores below the
        quality floor and is dropped; every survivor carries the md5
        train/val tag."""
        import hashlib

        import ray

        from json_time_series_extractor_ray.pipelines.curation import (
            curate_corpus,
        )

        rich = ("quick brown fox jumps over lazy dog near river bank "
                "while birds sing merry tunes beyond green hills ") * 3
        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    [rich, rich + "extra words here", rich + "other tail",
                     "  " + rich + " ",  # dup of 0 modulo whitespace
                     "tiny doc"],
                    pa.string(),
                ),
                "lang": pa.array(["en"] * 5, pa.string()),
            }
        )
        out = curate_corpus(ray.data.from_arrow(t)).to_pandas()
        assert sorted(out["doc_id"]) == [0, 1, 2]
        for _, row in out.iterrows():
            expect = ("val" if hashlib.md5(str(row["doc_id"]).encode())
                      .hexdigest()[0] in ("0", "1") else "train")
            assert row["split"] == expect
        assert (out["quality"] >= 0.75).all()


class TestNearDupClusters:
    def test_planted_components(self, ray_session):
        """Two planted chains + noise: 0~1~2 (transitively via pairwise
        near-identical vectors) and 10~11 cluster to their minima; every
        other vector is its own singleton cluster."""
        import ray

        rng = np.random.default_rng(3)
        E = rng.standard_normal((20, 8)).astype(np.float32)
        E /= np.linalg.norm(E, axis=1, keepdims=True) * 0.5  # keep norms sane
        # chain A: 1 and 2 are tiny perturbations of 0 (all pairwise close)
        E[1] = E[0] + 1e-4
        E[2] = E[0] - 1e-4
        # chain B
        E[11] = E[10] + 1e-4
        t = pa.table(
            {
                "vec_id": pa.array(range(20), pa.int64()),
                "embedding": pa.array([r.tolist() for r in E],
                                      pa.list_(pa.float32())),
                "label": pa.array(np.zeros(20, np.int32)),  # one block
            }
        )
        out = near_dup_clusters(
            ray.data.from_arrow(t), tau=0.999
        ).to_pandas().sort_values("vec_id", ignore_index=True)
        got = dict(zip(out["vec_id"], out["cluster_id"]))
        assert got[0] == got[1] == got[2] == 0
        assert got[10] == got[11] == 10
        singles = [i for i in range(20) if i not in (0, 1, 2, 10, 11)]
        for i in singles:
            assert got[i] == i, f"vec {i} unexpectedly clustered to {got[i]}"

    def test_distributed_matches_union_find(self, ray_session):
        """The spanning-forest-contraction variant must produce the exact
        label table of the driver-side union-find — including a planted
        CHAIN component (0~1, 1~2, 2~3 without 0~3 being a direct pair),
        where transitivity across edge shards is doing the work."""
        import ray

        from json_time_series_extractor_ray.pipelines.dedup import (
            near_dup_clusters_distributed,
        )

        rng = np.random.default_rng(9)
        E = rng.standard_normal((16, 8)).astype(np.float32)
        E /= np.linalg.norm(E, axis=1, keepdims=True) * 0.5
        # chain: each consecutive pair is close; ends are NOT (the chain
        # drifts), so transitivity is doing the work
        for i in (1, 2, 3):
            E[i] = E[i - 1] + rng.standard_normal(8).astype(np.float32) * 0.012
        t = pa.table({
            "vec_id": pa.array(range(16), pa.int64()),
            "embedding": pa.array([r.tolist() for r in E],
                                  pa.list_(pa.float32())),
            "label": pa.array(np.zeros(16, np.int32)),
        })
        a = near_dup_clusters(
            ray.data.from_arrow(t), tau=0.999
        ).to_pandas().sort_values("vec_id", ignore_index=True)
        b = near_dup_clusters_distributed(
            ray.data.from_arrow(t), tau=0.999
        ).to_pandas().sort_values("vec_id", ignore_index=True)
        pd.testing.assert_frame_equal(a, b)
        got = dict(zip(b["vec_id"], b["cluster_id"]))
        assert got[0] == got[1] == got[2] == got[3] == 0


class TestSimilarity:
    def test_brute_force_matches_numpy_oracle(self, ray_session):
        import ray

        t, E = _emb_table()
        En = E.astype(np.float64)
        En /= np.linalg.norm(En, axis=1, keepdims=True)
        qids = np.arange(4, dtype=np.int64)
        out = brute_force_topk(
            ray.data.from_arrow(t), qids, En[:4], k=5
        ).to_pandas()
        S = En[:4] @ En.T
        for qi in range(4):
            sims = S[qi].copy()
            sims[qi] = -2  # exclude self
            expect = set(np.argsort(-sims)[:5])
            got = set(out[out["query_id"] == qi]["neighbor_id"])
            assert got == expect

    def test_ivf_recall_reasonable(self, ray_session):
        import ray

        t, E = _emb_table()
        En = E.astype(np.float64)
        En /= np.linalg.norm(En, axis=1, keepdims=True)
        qids = np.arange(4, dtype=np.int64)
        brute = brute_force_topk(ray.data.from_arrow(t), qids, En[:4], k=5).to_pandas()
        approx = ivf_topk(
            ray.data.from_arrow(t), qids, En[:4], k=5, nprobe=3
        ).to_pandas()
        # nprobe=3 of 5 cells scans >= 60% of the corpus -> decent recall
        hits = 0
        for qi in range(4):
            b = set(brute[brute["query_id"] == qi]["neighbor_id"])
            a = set(approx[approx["query_id"] == qi]["neighbor_id"])
            hits += len(a & b)
        assert hits / (4 * 5) >= 0.5

    def test_ivf_kmeans_recall_and_determinism(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.similarity import (
            ivf_kmeans_topk,
            kmeans_fit,
        )

        t, E = _emb_table()
        En = E.astype(np.float64)
        En /= np.linalg.norm(En, axis=1, keepdims=True)
        qids = np.arange(4, dtype=np.int64)

        C = kmeans_fit(ray.data.from_arrow(t), n_clusters=8, n_iters=4)
        assert C.shape == (8, 16)
        np.testing.assert_allclose(np.linalg.norm(C, axis=1), 1.0, rtol=1e-9)
        # Same seed + same data -> identical centroids (retry safety).
        C2 = kmeans_fit(ray.data.from_arrow(t), n_clusters=8, n_iters=4)
        np.testing.assert_array_equal(C, C2)

        brute = brute_force_topk(ray.data.from_arrow(t), qids, En[:4], k=5).to_pandas()
        approx = ivf_kmeans_topk(
            ray.data.from_arrow(t), qids, En[:4], k=5, n_clusters=8, nprobe=4
        ).to_pandas()
        hits = 0
        for qi in range(4):
            b = set(brute[brute["query_id"] == qi]["neighbor_id"])
            a = set(approx[approx["query_id"] == qi]["neighbor_id"])
            hits += len(a & b)
        # nprobe=4 of 8 trained cells: expect decent (not perfect) recall.
        assert hits / (4 * 5) >= 0.5


class TestMultimodal:
    def test_batch_size_inverse_to_payload(self):
        assert media_batch_size(1 << 20) == 64
        assert media_batch_size(1 << 26) == 1
        assert media_batch_size(1) >= 1

    def test_compressed_formats_still_stubbed(self):
        """Real mode decodes BMP/PPM/WAV/PNG/JPEG; a compressed AUDIO
        payload (MP3/ID3 magic — still no codec) must raise the explicit
        environment stub at decode time."""
        import pyarrow as pa

        from json_time_series_extractor_ray.pipelines.multimodal import (
            MEDIA_SCHEMA,
        )

        stage = DecodeStage()  # real mode constructs fine now
        mp3_ish = b"ID3\x04\x00\x00" + b"\x00" * 64
        batch = pa.table({
            "media_id": pa.array(["x"], pa.string()),
            "kind": pa.array(["image"], pa.string()),
            "payload": pa.array([mp3_ish], pa.large_binary()),
            "width": pa.array([0], pa.int32()),
            "height": pa.array([0], pa.int32()),
            "sample_rate": pa.array([0], pa.int32()),
            "duration_ms": pa.array([0], pa.int32()),
        }, schema=MEDIA_SCHEMA)
        with pytest.raises(NotImplementedError, match="unknown"):
            stage(batch)

    def test_bmp_ppm_wav_roundtrip(self):
        from json_time_series_extractor_ray.functions.mediacodecs import (
            decode_bmp,
            decode_ppm,
            decode_wav,
            encode_bmp,
            encode_ppm,
            encode_wav,
            sniff_format,
        )

        rng = np.random.default_rng(5)
        # BMP: width NOT a multiple of 4 exercises row padding
        px = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
        b = encode_bmp(px)
        assert sniff_format(b) == "bmp"
        np.testing.assert_array_equal(decode_bmp(b), px)
        # PPM P6 + PGM P5 (with a comment line in the header)
        p6 = encode_ppm(px)
        assert sniff_format(p6) == "ppm"
        np.testing.assert_array_equal(decode_ppm(p6), px)
        gray = rng.integers(0, 256, size=(4, 9), dtype=np.uint8)
        p5 = encode_ppm(gray)
        commented = p5[:2] + b"\n# a comment\n" + p5[3:]
        np.testing.assert_array_equal(decode_ppm(commented), gray)
        # WAV 16-bit PCM mono
        samples = rng.integers(-32768, 32768, size=1000).astype(np.int16)
        w = encode_wav(samples, 8000)
        assert sniff_format(w) == "wav"
        d = decode_wav(w)
        assert d["sample_rate"] == 8000 and d["duration_ms"] == 125
        np.testing.assert_array_equal(d["samples"][:, 0], samples)

    def test_real_decode_pipeline(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.multimodal import (
            synthesize_real_media_table,
        )

        t = synthesize_real_media_table(list(range(12)),
                                        [100 + 400 * i for i in range(12)])
        out = decode_media_dataset(
            ray.data.from_arrow(t), avg_payload_bytes=4096, fake=False
        ).to_pandas().sort_values("media_id", key=lambda s: s.astype(int),
                                  ignore_index=True)
        for i in range(12):
            n = min(max(100 + 400 * i, 1), 4096)
            if i % 2 == 0:
                side = int(np.sqrt(n))
                assert out["width"][i] == side == out["height"][i]
                assert out["decoded_bytes"][i] == 3 * side * side
            else:
                assert out["sample_rate"][i] == 8000
                assert out["duration_ms"][i] == n * 1000 // 8000
                assert out["decoded_bytes"][i] == 2 * n

    def test_real_resize_bmp(self, ray_session):
        from json_time_series_extractor_ray.functions.mediacodecs import (
            decode_bmp,
            encode_bmp,
        )
        from json_time_series_extractor_ray.pipelines.multimodal import (
            ResizeStage,
            resize_nearest,
        )

        rng = np.random.default_rng(6)
        px = rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8)
        stage = ResizeStage(4, 6)  # real mode
        out = stage(synthesize_media_table(["a"], [1]).set_column(
            2, "payload", pa.array([encode_bmp(px)], pa.large_binary())))
        got = decode_bmp(out.column("payload")[0].as_py())
        np.testing.assert_array_equal(got, resize_nearest(px, 4, 6))
        assert got.shape == (6, 4, 3)

    def test_fake_decode_pipeline(self, ray_session):
        import ray

        t = synthesize_media_table([f"m{i}" for i in range(20)],
                                   [1000 + 37 * i for i in range(20)])
        out = decode_media_dataset(
            ray.data.from_arrow(t), avg_payload_bytes=2000
        ).to_pandas()
        assert len(out) == 20
        assert out["n_bytes"].tolist() == [1000 + 37 * i for i in range(20)]
        assert (out["features"].apply(len) == 8).all()
        # determinism across runs
        out2 = decode_media_dataset(
            ray.data.from_arrow(t), avg_payload_bytes=2000
        ).to_pandas()
        assert out.sort_values("media_id")["checksum"].tolist() == \
            out2.sort_values("media_id")["checksum"].tolist()


class TestGapFilledLadder:
    def test_ladder_with_locf_has_no_interior_gaps(self, ray_session):
        import ray

        from json_time_series_extractor_ray.stages.rollup import rollup_ladder

        base = 1_704_067_200 * 10**9
        minutes = [0, 1, 5, 6]  # gap at 2,3,4
        t = pa.table(
            {
                "series_key": pa.array(["s"] * 4),
                "ts": pa.array([base + m * 60 * 10**9 for m in minutes],
                               pa.int64()).cast(pa.timestamp("ns")),
                "value_num": pa.array([1.0, 2.0, 3.0, 4.0]),
                "value_kind": pa.array([1] * 4, pa.int8()),
                "doc_id": pa.array(["a", "b", "c", "d"]),
                "sample_ordinal": pa.array([0] * 4, pa.int32()),
            }
        )
        out = rollup_ladder(
            ray.data.from_arrow(t), tiers=("1m",), gap_fill="locf"
        ).to_pandas()
        m1 = out[out["tier"] == "1m"].sort_values("window_start")
        assert len(m1) == 7
        assert m1["fill"].tolist() == ["", "", "locf", "locf", "locf", "", ""]
        assert m1["last"].tolist() == [1.0, 2.0, 2.0, 2.0, 2.0, 3.0, 4.0]


class TestMultimodalStages:
    def test_resize_changes_payload_size(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.multimodal import ResizeStage

        t = synthesize_media_table(["a", "b"], [5000, 200])
        out = (
            ray.data.from_arrow(t)
            .map_batches(
                ResizeStage,
                fn_constructor_args=(32, 32),
                fn_constructor_kwargs={"fake": True},
                batch_format="pyarrow",
                concurrency=1,
            )
            .to_pandas()
        )
        assert (out["payload"].apply(len) == 32 * 32).all()
        assert (out["width"] == 32).all() and (out["height"] == 32).all()

    def test_frame_sample_fans_out(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.multimodal import (
            FrameSampleStage,
        )

        t = synthesize_media_table(["v1"], [1200], kind="video")
        out = (
            ray.data.from_arrow(t)
            .map_batches(
                FrameSampleStage,
                fn_constructor_args=(12,),
                fn_constructor_kwargs={"every_k": 3, "fake": True},
                batch_format="pyarrow",
                concurrency=1,
            )
            .to_pandas()
        )
        assert len(out) == 4  # frames 0,3,6,9
        assert out["frame_index"].tolist() == [0, 3, 6, 9]
        assert (out["frame"].apply(len) == 100).all()

    def test_video_frame_sampling_compressed_still_stubbed(self):
        """Real frame sampling decodes the MJBM container; COMPRESSED
        video (no codec libs here) still raises — at call time, per
        payload, exactly like DecodeStage's compressed-image path."""
        import pyarrow as pa
        import pytest

        from json_time_series_extractor_ray.pipelines.multimodal import (
            FrameSampleStage,
        )

        stage = FrameSampleStage(4)  # constructs fine: MJBM is real
        batch = pa.table({
            "media_id": pa.array(["x"], pa.string()),
            "kind": pa.array(["video"], pa.string()),
            "payload": pa.array([b"\x00\x00\x00\x18ftypmp42 fake"],
                                pa.large_binary()),
        })
        with pytest.raises(NotImplementedError, match="MJBM"):
            stage(batch)

    def test_resize_real_rejects_compressed(self):
        import pytest

        from json_time_series_extractor_ray.pipelines.multimodal import (
            ResizeStage,
        )

        # MP3/ID3 magic: PNG and JPEG are real codecs now, so the
        # compressed-stub rejection is pinned on a format that stays
        # stubbed (no audio codec in this container).
        with pytest.raises(NotImplementedError, match="unknown"):
            ResizeStage(8, 8)._resize_real(b"ID3\x04\x00\x00" + b"\0" * 32)


class TestDistributedDelegates:
    def test_custom_delegates_through_ray_stage(self, ray_session):
        """The four ExtractorOptions callables must survive cloudpickle into
        a Ray stage (reference §2.9 extension surface, distributed)."""
        import pyarrow as pa
        import ray

        from json_time_series_extractor_ray.corpus import texts_to_corpus_table
        from json_time_series_extractor_ray.pipelines.timeseries import (
            extract_pipeline,
        )

        texts = ['{"ts": 1686559277, "temp": 5, "skipme": 1}'] * 3
        t = texts_to_corpus_table(["a", "b", "c"], texts, ["s"] * 3)

        from json_time_series_extractor_ray.extractor import ExtractorOptions

        opts = ExtractorOptions(
            recursive=True,
            timestamp_property="/ts",
            timestamp_parser=lambda el: el * 10**9 if isinstance(el, int) else None,
            can_process_element=lambda ctx, ptr, el: ptr[-1] != "skipme",
            template="{device}-{$prop}",
            get_template_replacement=lambda name: "devX" if name == "device" else None,
        )
        out = extract_pipeline(
            ray.data.from_arrow(t), opts
        ).to_pandas()
        assert len(out) == 3  # skipme filtered by the delegate
        assert set(out["series_key"]) == {"devX-temp"}
        assert (out["ts"].astype("int64") == 1686559277 * 10**9).all()


class TestSketches:
    def test_hll_error_bound(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.sketches import (
            hll_distinct,
        )

        for true_n in (500, 20_000):
            t = pa.table({"v": pa.array(
                [f"item-{i}" for i in range(true_n)] * 2  # duplicates
            )})
            est = hll_distinct(ray.data.from_arrow(t), column="v")
            # 2^12 registers -> ~1.6% standard error; allow 5 sigma.
            assert abs(est - true_n) / true_n < 0.08, (true_n, est)

    def test_hll_merge_is_order_independent(self):
        from json_time_series_extractor_ray.pipelines.sketches import (
            hll_estimate,
            hll_partial_batch,
        )

        a = hll_partial_batch(pa.table({"v": pa.array([f"a{i}" for i in range(1000)])}), "v")
        b = hll_partial_batch(pa.table({"v": pa.array([f"b{i}" for i in range(1000)])}), "v")
        blob_a = a.column("registers")[0].as_py()
        blob_b = b.column("registers")[0].as_py()
        assert hll_estimate([blob_a, blob_b]) == hll_estimate([blob_b, blob_a])
        # merging a sketch with itself changes nothing (idempotent max)
        assert hll_estimate([blob_a, blob_a]) == hll_estimate([blob_a])

    def test_percentile_rule_matches_duckdb(self, ray_session):
        import duckdb
        import ray

        from json_time_series_extractor_ray.pipelines.sketches import (
            group_percentiles,
        )

        rng = np.random.default_rng(13)
        # Odd/even/tiny group sizes to stress the index rule.
        rows = []
        for key, n in (("a", 7), ("b", 100), ("c", 1), ("d", 2)):
            for v in rng.normal(size=n):
                rows.append((key, float(v)))
        t = pa.table({
            "k": pa.array([r[0] for r in rows]),
            "v": pa.array([r[1] for r in rows], pa.float64()),
        })
        got = (
            group_percentiles(ray.data.from_arrow(t), key="k", value="v")
            .to_pandas().sort_values("k", ignore_index=True)
        )
        con = duckdb.connect()
        con.register("t", t)
        exp = con.execute(
            "SELECT k, count(*) AS n, quantile_disc(v, 0.5) AS p50, "
            "quantile_disc(v, 0.9) AS p90, quantile_disc(v, 0.99) AS p99 "
            "FROM t GROUP BY k ORDER BY k"
        ).df()
        pd.testing.assert_frame_equal(
            got.astype({"n": "int64"}), exp.astype({"n": "int64"})
        )


class TestQuantileSketch:
    def test_rank_error_bound_across_blocks(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.sketches import (
            qsketch_quantiles,
        )

        rng = np.random.default_rng(7)
        n, cap = 60_000, 256
        vals = rng.lognormal(mean=1.0, sigma=1.5, size=n)
        t = pa.table({
            "k": pa.array(["s"] * n), "v": pa.array(vals, pa.float64()),
        })
        # Many blocks so the merge path (not a single exact block) is hit.
        ds = ray.data.from_arrow(t).repartition(16)
        out = qsketch_quantiles(
            ds, key="k", value="v", pcts=(0.5, 0.9, 0.99), cap=cap
        ).to_pandas()
        s = np.sort(vals)
        for p in (0.5, 0.9, 0.99):
            est = out[f"p{int(p * 100)}"].iloc[0]
            # rank of the estimate in the true data
            rank = np.searchsorted(s, est, side="right") / n
            # theory: <= 1/(2*cap) relative rank per compression level;
            # allow 2x slack for the discrete pick
            assert abs(rank - p) <= 1.0 / cap, (p, rank)

    def test_exact_when_under_capacity(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.sketches import (
            group_percentiles,
            qsketch_quantiles,
        )

        rng = np.random.default_rng(3)
        t = pa.table({
            "k": pa.array(["a"] * 300 + ["b"] * 150),
            "v": pa.array(rng.normal(size=450), pa.float64()),
        })
        ds = ray.data.from_arrow(t)
        approx = qsketch_quantiles(ds, key="k", value="v").to_pandas()
        exact = group_percentiles(
            ray.data.from_arrow(t), key="k", value="v"
        ).to_pandas()
        m = approx.merge(exact, on="k", suffixes=("_a", "_e"))
        for p in ("p50", "p90", "p99"):
            assert (m[f"{p}_a"] == m[f"{p}_e"]).all()


class TestPassageDedup:
    def test_repeated_passage_survives_only_first(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.dedup import (
            passage_dedup,
        )

        chunk = " ".join(f"w{i}" for i in range(10))       # one full chunk
        other = " ".join(f"x{i}" for i in range(10))
        t = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([
                chunk + " " + other,        # doc 1: both passages original
                chunk + " tail words",      # doc 2: repeats doc 1's chunk
                chunk + " " + chunk,        # doc 3: repeats it twice more
            ]),
        })
        out = passage_dedup(
            ray.data.from_arrow(t)
        ).to_pandas().set_index("doc_id").sort_index()
        assert out.loc[1, "n_kept"] == 2
        assert out.loc[1, "clean_text"] == chunk + " " + other
        # doc 2 keeps only its novel tail passage
        assert out.loc[2, "n_kept"] == 1
        assert out.loc[2, "clean_text"] == "tail words"
        # doc 3 keeps nothing
        assert out.loc[3, "n_kept"] == 0
        assert out.loc[3, "clean_text"] == ""
        assert out["n_chunks"].tolist() == [2, 2, 2]

    def test_chunking_is_block_invariant(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.dedup import (
            passage_dedup,
        )

        rng = np.random.default_rng(11)
        texts = [
            " ".join(rng.choice(["a", "b", "c", "d"], size=n))
            for n in rng.integers(1, 35, size=40)
        ]
        t = pa.table({
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array(texts),
        })
        one = passage_dedup(ray.data.from_arrow(t)).to_pandas() \
            .sort_values("doc_id", ignore_index=True)
        many = passage_dedup(
            ray.data.from_arrow(t).repartition(7)
        ).to_pandas().sort_values("doc_id", ignore_index=True)
        pd.testing.assert_frame_equal(one, many)


class TestQuadraticBlockGuards:
    def test_jaccard_guard_rejects_dominant_block(self):
        import pandas as pd
        import pytest as _pytest

        from json_time_series_extractor_ray.pipelines.dedup import (
            JaccardBlockStage,
        )

        stage = JaccardBlockStage(max_block_docs=10)
        df = pd.DataFrame({
            "doc_id": range(11),
            "text": ["a b c"] * 11,
            "lang": ["en"] * 11,
        })
        with _pytest.raises(ValueError, match="minhash_lsh_dups"):
            stage(df)

    def test_embedding_guard_rejects_dominant_block(self, ray_session):
        import numpy as np
        import pandas as pd
        import pytest as _pytest
        import ray

        from json_time_series_extractor_ray.pipelines.dedup import (
            embedding_near_dups,
        )

        df = pd.DataFrame({
            "vec_id": np.arange(12, dtype=np.int64),
            "label": ["x"] * 12,
            "embedding": [np.ones(4)] * 12,
        })
        ds = ray.data.from_pandas(df)
        with _pytest.raises(Exception, match="max_block_vecs"):
            embedding_near_dups(ds, max_block_vecs=5).to_pandas()


class TestCountMin:
    def test_never_underestimates_and_bound(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.sketches import (
            cms_build,
            cms_estimate,
        )

        rng = np.random.default_rng(11)
        n = 50_000
        keys = rng.zipf(1.5, n) % 5000
        t = pa.table({"k": pa.array(keys.astype(np.int64), pa.int64())})
        ds = ray.data.from_arrow(t).repartition(6)
        mat = cms_build(ds, column="k", width=512, depth=4)
        assert mat.sum() == 4 * n  # every row counted once per depth
        import pandas as pd_

        uniq, true = np.unique(keys, return_counts=True)
        est = cms_estimate(mat, pd_.Series(uniq.astype(np.int64)))
        assert (est >= true).all()  # CMS never underestimates
        # e/width * N bound holds with probability 1 - e^-depth per key
        bound = np.e / 512 * n
        assert ((est - true) <= bound).mean() > 0.97
        assert np.median(est - true) <= bound / 4

    def test_partition_merge_equals_single_build(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.sketches import (
            cms_build,
        )

        keys = np.arange(1000, dtype=np.int64) % 37
        t = pa.table({"k": pa.array(keys, pa.int64())})
        one = cms_build(ray.data.from_arrow(t), column="k",
                        width=256, depth=3)
        many = cms_build(ray.data.from_arrow(t).repartition(9), column="k",
                         width=256, depth=3)
        assert np.array_equal(one, many)


class TestShortDocDedup:
    def test_minhash_short_docs_never_pair(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.dedup import (
            minhash_lsh_dups,
        )

        t = pa.table({
            "doc_id": pa.array(range(6), pa.int64()),
            "text": pa.array([
                "hello there", "bye", "", "ok",
                "the quick brown fox jumps over the lazy dog again today",
                "the quick brown fox jumps over the lazy dog again today",
            ], pa.string()),
        })
        pairs = minhash_lsh_dups(ray.data.from_arrow(t)).to_pandas()
        # the two long identical docs pair; no gramless doc appears
        assert set(pairs["doc_a"]) | set(pairs["doc_b"]) <= {4, 5}
        assert len(pairs) == 1

    def test_simhash_short_docs_never_pair(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.dedup import (
            simhash_dups,
        )

        t = pa.table({
            "doc_id": pa.array(range(5), pa.int64()),
            "text": pa.array([
                "xy", "", "ab",
                "one two three four five six seven eight nine ten",
                "one two three four five six seven eight nine ten",
            ], pa.string()),
        })
        pairs = simhash_dups(ray.data.from_arrow(t)).to_pandas()
        assert set(pairs["doc_a"]) | set(pairs["doc_b"]) <= {3, 4}
        assert len(pairs) == 1


class TestClusterRepresentatives:
    def test_max_norm_member_wins(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.dedup import (
            cluster_representatives,
        )

        rng = np.random.default_rng(3)
        E = rng.standard_normal((20, 8)).astype(np.float32)
        E /= np.linalg.norm(E, axis=1, keepdims=True) * 0.5
        E[1] = E[0] * 1.01  # same direction, bigger norm -> representative
        E[2] = E[0] * 0.99
        E[11] = E[10] + 1e-4
        t = pa.table({
            "vec_id": pa.array(range(20), pa.int64()),
            "embedding": pa.array([r.tolist() for r in E],
                                  pa.list_(pa.float32())),
            "label": pa.array(np.zeros(20, np.int32)),
        })
        out = cluster_representatives(
            ray.data.from_arrow(t).repartition(3), tau=0.999, num_shards=4
        ).to_pandas().set_index("cluster_id").sort_index()
        assert out.loc[0, "n_members"] == 3
        assert out.loc[0, "rep_vec_id"] == 1  # 1.01x norm beats 0 and 2
        assert out.loc[10, "n_members"] == 2
        singles = [i for i in range(20) if i not in (0, 1, 2, 10, 11)]
        for i in singles:
            assert out.loc[i, "rep_vec_id"] == i
            assert out.loc[i, "n_members"] == 1
        norms = np.round(np.linalg.norm(E.astype(np.float64), axis=1), 6)
        assert out.loc[0, "rep_norm"] == pytest.approx(norms[1], abs=1e-9)


class TestLshAnn:
    def test_lsh_recall_and_centroids(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.similarity import (
            label_centroids,
            lsh_topk,
        )

        t, E = _emb_table()
        En = E.astype(np.float64)
        En /= np.linalg.norm(En, axis=1, keepdims=True)
        qids = np.arange(4, dtype=np.int64)
        brute = brute_force_topk(
            ray.data.from_arrow(t), qids, En[:4], k=5
        ).to_pandas()
        approx = lsh_topk(
            ray.data.from_arrow(t), qids, En[:4], k=5,
            n_tables=12, n_bits=6,
        ).to_pandas()
        hits = 0
        for qi in range(4):
            b = set(brute[brute["query_id"] == qi]["neighbor_id"])
            a = set(approx[approx["query_id"] == qi]["neighbor_id"])
            hits += len(a & b)
        # 12 tables x 6 bits on random 16-d data: near neighbors collide
        # with high probability; pin a conservative floor.
        assert hits / (4 * 5) >= 0.5
        # every LSH neighbor must be a genuine (bucket-colliding) corpus
        # row with a true cosine score — never self, never out of range
        assert (approx["neighbor_id"] != approx["query_id"]).all()

    def test_lsh_deterministic_across_runs(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.similarity import lsh_topk

        t, E = _emb_table()
        En = E.astype(np.float64)
        En /= np.linalg.norm(En, axis=1, keepdims=True)
        qids = np.arange(4, dtype=np.int64)
        a = lsh_topk(ray.data.from_arrow(t), qids, En[:4], k=5).to_pandas()
        b = lsh_topk(ray.data.from_arrow(t), qids, En[:4], k=5).to_pandas()
        key = ["query_id", "neighbor_id"]
        pd.testing.assert_frame_equal(
            a.sort_values(key, ignore_index=True),
            b.sort_values(key, ignore_index=True),
        )

    def test_label_centroids_match_numpy(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.similarity import (
            label_centroids,
        )

        t, E = _emb_table()
        out = label_centroids(ray.data.from_arrow(t)).to_pandas()
        labs = (np.arange(len(E)) % 5)
        for lab in range(5):
            want = E[labs == lab].astype(np.float64).mean(axis=0)
            got = out[out["label"] == lab].sort_values("dim")["centroid"]
            np.testing.assert_allclose(got.to_numpy(), want, atol=1e-5)
        assert out["n"].unique().tolist() == [40]


class TestHllCascade:
    def test_cascade_register_exact_and_error_bounded(self, ray_session):
        """1h->1d register max-merge must equal the direct-from-raw 1d
        registers exactly (associativity), and the estimate must sit
        within a loose multiple of the p=8 standard error vs exact."""
        import ray

        from json_time_series_extractor_ray.pipelines.sketches import (
            hll_window_cascade,
        )

        rng = np.random.default_rng(17)
        n = 20_000
        day = 86_400_000_000_000
        start = 1_700_000_000_000_000_000 // day * day
        ts = pa.array(
            (start + rng.integers(0, 5 * day, n)).astype("datetime64[ns]"),
            pa.timestamp("ns"))
        users = pa.array(rng.integers(0, 800, n), pa.int64())
        ds = ray.data.from_arrow(pa.table({"ts": ts, "user_id": users}))
        out = hll_window_cascade(ds).to_pandas()
        assert len(out) == 5
        assert out["registers_equal"].all()
        pd.testing.assert_series_equal(out["est_cascaded"],
                                       out["est_direct"],
                                       check_names=False)
        # exact distinct per day for the error bound
        tsn = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"d": tsn // day * day,
                           "u": users.to_numpy(zero_copy_only=False)})
        exact = df.groupby("d")["u"].nunique()
        got = out.set_index("day_ns")["est_direct"]
        rel = np.abs(got - exact) / exact
        assert rel.max() < 0.25  # ~4x the p=8 standard error


class TestPrefixJoinGuard:
    def test_hot_prefix_shingle_fails_loudly(self, ray_session):
        """A shingle appearing in more doc prefixes than
        max_prefix_group must abort with the actionable message, not
        silently run a quadratic candidate group."""
        import ray

        text = "alpha bravo charlie delta echo"
        t = pa.table({
            "doc_id": pa.array(range(30), pa.int64()),
            "text": pa.array([text] * 30),
        })
        from json_time_series_extractor_ray.pipelines.dedup import (
            jaccard_prefix_join,
        )

        with pytest.raises(Exception, match="max_prefix_group"):
            jaccard_prefix_join(
                ray.data.from_arrow(t), tau=0.5, max_prefix_group=10
            ).to_pandas()


class TestPQ:
    def test_rerank_recall_codes_size_and_determinism(self, ray_session):
        """PQ shortlist + exact re-rank: recall@5 vs brute force stays
        high, codes are exactly m bytes per vector (the 16x/32x
        compression claim), and the whole path is seeded-deterministic."""
        import ray

        from json_time_series_extractor_ray.pipelines.similarity import (
            brute_force_topk,
            pq_encode,
            pq_topk_rerank,
            pq_train,
        )

        t, E = _emb_table(n=300, d=16, seed=3)
        ds = ray.data.from_arrow(t)
        qids = np.arange(6, dtype=np.int64)
        Q = E[:6].astype(np.float64)
        Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)

        m = 4
        cb = pq_train(ds, m=m, k=16)
        codes = pq_encode(ds, cb).materialize()
        blob = codes.take(1)[0]["codes"]
        assert len(blob) == m  # m uint8 codes per vector

        got = pq_topk_rerank(codes, ds, cb, qids, Q).to_pandas()
        ref = brute_force_topk(ds, qids, Q).to_pandas()
        hit = tot = 0
        for q in set(ref["query_id"]):
            sb = set(ref[ref.query_id == q]["neighbor_id"])
            sa = set(got[got.query_id == q]["neighbor_id"])
            hit += len(sa & sb)
            tot += len(sb)
        assert hit / tot >= 0.7, (hit, tot)

        again = pq_topk_rerank(codes, ds, cb, qids, Q).to_pandas()
        key = ["query_id", "neighbor_id"]
        pd.testing.assert_frame_equal(
            got.sort_values(key, ignore_index=True),
            again.sort_values(key, ignore_index=True))
        # re-ranked scores are EXACT cosines: every kept row's cosine
        # matches the brute-force value for the same (query, neighbor)
        merged = got.merge(ref, on=key, suffixes=("_pq", "_bf"))
        assert np.allclose(merged["cosine_pq"], merged["cosine_bf"])


class TestAudioFeatures:
    def test_matches_numpy_reference(self, ray_session):
        import ray

        from json_time_series_extractor_ray.functions.mediacodecs import (
            encode_wav,
        )
        from json_time_series_extractor_ray.pipelines.multimodal import (
            MEDIA_SCHEMA,
            AudioFeatureStage,
        )

        rng = np.random.default_rng(9)
        samples = rng.integers(-32768, 32768, size=1000).astype(np.int16)
        payload = encode_wav(samples, 8000)
        batch = pa.table({
            "media_id": pa.array(["a"], pa.string()),
            "kind": pa.array(["audio"], pa.string()),
            "payload": pa.array([payload], pa.large_binary()),
            "width": pa.array([0], pa.int32()),
            "height": pa.array([0], pa.int32()),
            "sample_rate": pa.array([8000], pa.int32()),
            "duration_ms": pa.array([125], pa.int32()),
        }, schema=MEDIA_SCHEMA)
        out = AudioFeatureStage(frame=256)(batch)
        x = samples.astype(np.float64) / 32768.0
        frames = x[:768].reshape(3, 256)
        rms = np.sqrt((frames ** 2).mean(axis=1)).mean()
        zc = (np.signbit(frames[:, 1:])
              != np.signbit(frames[:, :-1])).mean(axis=1).mean()
        r = out.to_pylist()[0]
        assert r["n_frames"] == 3
        assert r["rms_mean"] == pytest.approx(round(rms, 6))
        assert r["zcr_mean"] == pytest.approx(round(zc, 6))
        assert r["peak"] == pytest.approx(round(np.abs(x).max(), 6))

    def test_non_wav_rejected(self):
        from json_time_series_extractor_ray.pipelines.multimodal import (
            MEDIA_SCHEMA,
            AudioFeatureStage,
        )

        batch = pa.table({
            "media_id": pa.array(["x"], pa.string()),
            "kind": pa.array(["audio"], pa.string()),
            "payload": pa.array([b"\xff\xd8\xff\xe0" + b"\0" * 16],
                                pa.large_binary()),
            "width": pa.array([0], pa.int32()),
            "height": pa.array([0], pa.int32()),
            "sample_rate": pa.array([0], pa.int32()),
            "duration_ms": pa.array([0], pa.int32()),
        }, schema=MEDIA_SCHEMA)
        with pytest.raises(NotImplementedError, match="WAV"):
            AudioFeatureStage()(batch)


class TestSimhashRecallReport:
    def test_report_on_planted_corpus(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.dedup import (
            SIMHASH_REPORT_FLOORS,
            simhash_recall_report,
        )

        out = simhash_recall_report(
            ray.data.from_arrow(_doc_table())).to_pandas()
        assert len(out) == len(SIMHASH_REPORT_FLOORS)
        assert list(out["metric"]) == [m for m, _, _ in
                                       SIMHASH_REPORT_FLOORS]
        # planted exact copies (0/60/61) have jaccard 1.0 and Hamming 0,
        # so every floor certifies on this corpus
        assert out["ok"].all()
        assert (out["n_true_pairs"] >= 3).all()


class TestDocumentsCorpus:
    def test_token_freq_matches_byte_counts(self, ray_session, tmp_path):
        import collections

        import ray

        from json_time_series_extractor_ray.pipelines.tokenchunks import (
            documents_corpus_dataset,
            token_frequencies,
        )

        df = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["abc abc", "bb", ""],
        })
        df.to_parquet(tmp_path / "documents.parquet")
        out = token_frequencies(
            documents_corpus_dataset(str(tmp_path))).to_pandas()
        want = collections.Counter(b"".join(
            t.encode() for t in df["text"]))
        got = dict(zip(out["token"], out["n_occurrences"]))
        assert got == {int(k): v for k, v in want.items()}


class TestMjpgContainer:
    def test_roundtrip_and_stage(self, ray_session):
        import ray

        from json_time_series_extractor_ray.functions.jpegcodec import (
            decode_jpeg,
        )
        from json_time_series_extractor_ray.functions.mediacodecs import (
            decode_mjpg,
            encode_mjpg,
            sniff_format,
        )
        from json_time_series_extractor_ray.pipelines.multimodal import (
            FrameSampleStage,
        )

        rng = np.random.default_rng(11)
        frames = [rng.integers(0, 256, size=(s, s, 3), dtype=np.uint8)
                  for s in (9, 16, 17)]
        payload = encode_mjpg(frames)
        assert sniff_format(payload) == "mjpg"
        blobs = decode_mjpg(payload)
        assert len(blobs) == 3
        for blob, f in zip(blobs, frames):
            px = decode_jpeg(blob)
            assert px.shape == f.shape  # dims exact; pixels lossy

        batch = pa.table({
            "media_id": pa.array(["v0"], pa.string()),
            "kind": pa.array(["video"], pa.string()),
            "payload": pa.array([payload], pa.large_binary()),
        })
        out = FrameSampleStage(n_frames=3, every_k=2)(batch)
        assert out.column("frame_index").to_pylist() == [0, 2]
        assert decode_jpeg(out.column("frame").to_pylist()[1]).shape \
            == (17, 17, 3)

    def test_truncated_payload_raises(self):
        from json_time_series_extractor_ray.functions.mediacodecs import (
            decode_mjpg,
            encode_mjpg,
        )

        rng = np.random.default_rng(12)
        payload = encode_mjpg(
            [rng.integers(0, 256, size=(9, 9, 3), dtype=np.uint8)])
        for cut in (3, 6, 10, len(payload) - 1):
            with pytest.raises(ValueError):
                decode_mjpg(payload[:cut])
        with pytest.raises(ValueError, match="trailing"):
            decode_mjpg(payload + b"x")

    def test_unknown_container_raises(self):
        from json_time_series_extractor_ray.pipelines.multimodal import (
            FrameSampleStage,
        )

        batch = pa.table({
            "media_id": pa.array(["v0"], pa.string()),
            "kind": pa.array(["video"], pa.string()),
            "payload": pa.array([b"\x00\x00\x00\x20ftypisom" + b"\0" * 32],
                                pa.large_binary()),
        })
        with pytest.raises(NotImplementedError, match="MJPG"):
            FrameSampleStage(n_frames=2)(batch)
