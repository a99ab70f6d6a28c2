"""Unit tests for stratified sampling, common-token-ratio scoring, and
the near-dup edge-count guard."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pytest

from json_time_series_extractor_ray.pipelines.split import stratified_sample
from json_time_series_extractor_ray.pipelines.textstats import (
    common_token_ratio,
)


def _docs(rows):
    ids, langs = zip(*rows)
    return pa.table({
        "doc_id": pa.array(list(ids), pa.int64()),
        "lang": pa.array(langs, pa.string()),
    })


class TestStratifiedSample:
    def test_k_per_stratum_by_md5_rank(self, ray_session):
        import ray

        rows = [(i, "en" if i % 3 else "de") for i in range(90)]
        out = stratified_sample(
            ray.data.from_arrow(_docs(rows)), k=5, strata_col="lang"
        ).to_pandas()
        assert len(out) == 10
        for lang in ("en", "de"):
            ids = [i for i, l in rows if l == lang]
            expect = sorted(
                ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest()
            )[:5]
            got = sorted(out[out.lang == lang]["doc_id"])
            assert got == sorted(expect)

    def test_small_stratum_keeps_all(self, ray_session):
        import ray

        rows = [(1, "xx"), (2, "xx"), (3, "yy")]
        out = stratified_sample(
            ray.data.from_arrow(_docs(rows)), k=10, strata_col="lang"
        ).to_pandas()
        assert len(out) == 3


class TestCommonTokenRatio:
    def test_ratio_against_known_vocab(self, ray_session):
        import ray

        t = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a a a b", "b zz qq"], pa.string()),
        })
        out = common_token_ratio(
            lambda: ray.data.from_arrow(t), k=2
        ).to_pandas().set_index("doc_id")
        # corpus counts: a=3, b=2, zz=1, qq=1 -> top-2 = {a, b}
        assert out.loc[1, "n_top"] == 4 and out.loc[1, "common_ratio"] == 1.0
        assert out.loc[2, "n_top"] == 1
        assert out.loc[2, "common_ratio"] == pytest.approx(1 / 3, abs=1e-6)


class TestEdgeGuard:
    def test_max_edges_aborts_with_clear_error(self, ray_session):
        import numpy as np
        import ray

        from json_time_series_extractor_ray.pipelines.dedup import (
            near_dup_clusters,
        )

        # 40 identical unit vectors in one block -> hundreds of pairs
        emb = pa.table({
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array([[1.0, 0.0]] * 40,
                                  pa.list_(pa.float32())),
        })
        with pytest.raises(RuntimeError, match="max_edges"):
            near_dup_clusters(ray.data.from_arrow(emb), tau=0.5,
                              max_edges=10)


class TestVocabCoverage:
    def test_counts_against_hand_vocab(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.textstats import (
            vocab_coverage,
        )

        t = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([
                "a a a b", "a b zz", "a qq b a",
            ], pa.string()),
        })
        # counts: a=6, b=3, zz=1, qq=1 -> vocab(min_freq=3) = {a, b}
        out = vocab_coverage(
            ray.data.from_arrow(t).repartition(2), min_freq=3
        ).to_pandas()
        assert len(out) == 1
        row = out.iloc[0]
        assert row["vocab_size"] == 2
        assert row["covered_words"] == 9
        assert row["oov_words"] == 2
        assert row["total_words"] == 11
        assert row["coverage"] == pytest.approx(9 / 11, abs=1e-6)


class TestMixtureSample:
    def test_rates_and_determinism(self, ray_session):
        import hashlib

        import ray

        from json_time_series_extractor_ray.pipelines.split import (
            mixture_sample,
        )

        n = 400
        t = pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": pa.array((["en"] * 300) + (["de"] * 100), pa.string()),
        })
        out = mixture_sample(
            ray.data.from_arrow(t).repartition(3),
            stratum_col="lang", rates={"en": 0.25},
        ).to_pandas()
        # all de docs kept (default rate 1.0); en gated at < '40'
        assert (out["lang"] == "de").sum() == 100
        want_en = {
            i for i in range(300)
            if hashlib.md5(str(i).encode()).hexdigest()[:2] < "40"
        }
        assert set(out[out["lang"] == "en"]["doc_id"]) == want_en
        # deterministic: second run identical
        out2 = mixture_sample(
            ray.data.from_arrow(t).repartition(3),
            stratum_col="lang", rates={"en": 0.25},
        ).to_pandas()
        assert sorted(out2["doc_id"]) == sorted(out["doc_id"])


class TestLangTokenFertility:
    def test_counts_against_hand_calc(self, ray_session):
        import ray

        from json_time_series_extractor_ray.pipelines.textstats import (
            lang_token_fertility,
        )

        t = pa.table({
            "lang": pa.array(["en", "en", "de"], pa.string()),
            "text": pa.array([
                "hello world",          # 2 words, 2 bpe tokens
                "it's a test42",        # 3 words, 6 bpe (it,',s,a,test,42)
                "ja wohl!",             # 2 words, 3 bpe (ja,wohl,!)
            ], pa.string()),
        })
        out = lang_token_fertility(
            ray.data.from_arrow(t).repartition(2)
        ).to_pandas().set_index("lang")
        assert out.loc["en", "n_words"] == 5
        assert out.loc["en", "n_tokens_bpe"] == 8
        assert out.loc["en", "fertility"] == pytest.approx(1.6, abs=1e-9)
        assert out.loc["de", "n_words"] == 2
        assert out.loc["de", "n_tokens_bpe"] == 3
        assert out.loc["de", "fertility"] == pytest.approx(1.5, abs=1e-9)
