"""Unit tests for benchmark decontamination, repetition ratios, and
TF-IDF keyword extraction."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

from json_time_series_extractor_ray.pipelines.decontam import (
    BENCH_MODULUS,
    contamination_flags,
)
from json_time_series_extractor_ray.pipelines.textstats import (
    repetition_stats_batch,
    tfidf_keywords,
)


class TestDecontamination:
    def test_flags_docs_sharing_benchmark_ngrams(self, ray_session):
        import ray

        bench_id = BENCH_MODULUS  # doc_id % 47 == 0 -> benchmark member
        t = pa.table({
            "doc_id": pa.array([bench_id, 1, 2], pa.int64()),
            "text": pa.array([
                "alpha beta gamma delta epsilon zeta",   # benchmark doc
                "x alpha beta gamma delta epsilon y",    # contains a bench 5-gram
                "totally unrelated words in this doc",   # clean
            ], pa.string()),
        })
        out = contamination_flags(
            lambda: ray.data.from_arrow(t), n=5
        ).to_pandas().set_index("doc_id")
        assert bool(out.loc[bench_id, "is_benchmark"])
        assert bool(out.loc[1, "is_contaminated"])
        # exactly one of doc 1's three 5-gram windows matches the benchmark
        assert out.loc[1, "n_contaminated"] == 1
        assert out.loc[1, "n_grams"] == 3
        assert not bool(out.loc[2, "is_contaminated"])
        assert out.loc[2, "n_grams"] == 2

    def test_short_docs_get_zero_grams(self, ray_session):
        import ray

        t = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["one two", "a b c d"], pa.string()),
        })
        out = contamination_flags(
            lambda: ray.data.from_arrow(t), n=5
        ).to_pandas().set_index("doc_id")
        assert (out["n_grams"] == 0).all()
        assert not out["is_contaminated"].any()


class TestRepetitionStats:
    def test_known_document(self):
        t = pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["a a a b c"], pa.string()),
        })
        out = repetition_stats_batch(t).to_pandas().iloc[0]
        assert out["n_words"] == 5 and out["n_distinct"] == 3
        assert out["distinct_ratio"] == pytest.approx(0.6)
        assert out["top_word_frac"] == pytest.approx(0.6)
        # 2-grams: "a a","a a","a b","b c" -> 4 total, 3 distinct
        assert out["dup_2gram_frac"] == pytest.approx(0.25)

    def test_no_repetition(self):
        t = pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["p q r s"], pa.string()),
        })
        out = repetition_stats_batch(t).to_pandas().iloc[0]
        assert out["distinct_ratio"] == 1.0
        assert out["dup_2gram_frac"] == 0.0


class TestTfidfKeywords:
    def test_rare_terms_outrank_common_ones(self, ray_session):
        import ray

        t = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([
                "shared shared rare1",
                "shared rare2 rare2",
                "shared other other",
            ], pa.string()),
        })
        out = tfidf_keywords(
            lambda: ray.data.from_arrow(t), k=1
        ).to_pandas().set_index("doc_id")
        # "shared" has df=3 -> idf = ln(1) = 0; rare words win
        assert out.loc[1, "word"] == "rare1"
        assert out.loc[2, "word"] == "rare2"
        assert out.loc[2, "tf"] == 2
        assert out.loc[2, "tfidf"] == pytest.approx(
            round(2 * math.log(3.0), 6))

    def test_k_rows_per_doc_with_word_tiebreak(self, ray_session):
        import ray

        t = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["b a c", "z y"], pa.string()),
        })
        out = tfidf_keywords(
            lambda: ray.data.from_arrow(t), k=2
        ).to_pandas()
        d1 = out[out.doc_id == 1]
        # all idf equal (each word df=1): alphabetical tiebreak
        assert list(d1["word"]) == ["a", "b"]
        assert len(out[out.doc_id == 2]) == 2


class TestTrailingEmptyDoc:
    def test_bm25_and_quality_survive_trailing_null_text(self, ray_session):
        """A batch whose LAST doc tokenizes to zero words used to crash
        np.add.reduceat with an out-of-bounds trailing offset; the
        segment_sum helper must keep both kernels alive and correct."""
        import ray

        from json_time_series_extractor_ray.pipelines.textstats import (
            bm25_topk,
            quality_batch,
        )

        t = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["hash join order hash", "stream merge", None],
                             pa.string()),
        })
        q = quality_batch(t)
        assert q.num_rows == 3
        assert q.column("n_words").to_pylist()[2] == 0

        out = bm25_topk(ray.data.from_arrow(t)).to_pandas()
        # doc 0 must rank first for query 0 ("hash join order")
        q0 = out[out["query_id"] == 0].sort_values("score", ascending=False)
        assert q0.iloc[0]["doc_id"] == 0
        assert (out["doc_id"] != 2).all()  # the null doc scores nowhere
