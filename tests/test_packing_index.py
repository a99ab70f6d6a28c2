"""Unit tests for sequence packing and the inverted index."""

from __future__ import annotations

import pyarrow as pa

from json_time_series_extractor_ray.pipelines.packing import (
    chunk_manifest,
    pack_offsets,
)
from json_time_series_extractor_ray.pipelines.textstats import inverted_index


def _docs(texts, start_id=0, id_step=1):
    ids = [start_id + i * id_step for i in range(len(texts))]
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


class TestPackOffsets:
    def test_offsets_and_boundary_spans(self, ray_session):
        import ray

        # single shard (ids all multiples of 8 -> shard 0), budget 5
        texts = ["a b c", "d e f g", "h i"]  # 3, 4, 2 tokens
        out = pack_offsets(
            ray.data.from_arrow(_docs(texts, start_id=0, id_step=8)),
            budget=5, n_shards=8,
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert list(out["tok_start"]) == [0, 3, 7]
        assert list(out["chunk_first"]) == [0, 0, 1]
        assert list(out["chunk_last"]) == [0, 1, 1]
        # doc 1 occupies tokens 3..6 -> crosses the chunk 0/1 boundary
        assert list(out["spans_boundary"]) == [False, True, False]

    def test_shards_pack_independently(self, ray_session):
        import ray

        # ids 0 and 1 land in different shards; both streams start at 0
        out = pack_offsets(
            ray.data.from_arrow(_docs(["a b", "c d"], start_id=0)),
            budget=5, n_shards=8,
        ).to_pandas()
        assert list(out["tok_start"]) == [0, 0]

    def test_chunk_manifest_totals(self, ray_session):
        import ray

        texts = ["a b c", "d e f g", "h i"]
        out = chunk_manifest(
            ray.data.from_arrow(_docs(texts, start_id=0, id_step=8)),
            budget=5, n_shards=8,
        ).to_pandas().sort_values("chunk_id").reset_index(drop=True)
        # docs starting in chunk 0: ids 0, 8 (5 tokens later... tok 0 and 3);
        # doc 16 starts at tok 7 -> chunk 1
        assert list(out["chunk_id"]) == [0, 1]
        assert list(out["n_docs"]) == [2, 1]
        assert int(out["n_tok"].sum()) == 9


class TestInvertedIndex:
    def test_postings_sorted_and_capped(self, ray_session):
        import ray

        docs = _docs(["x y", "y z", "y"], start_id=5)
        out = inverted_index(
            ray.data.from_arrow(docs), sample_k=2
        ).to_pandas().set_index("word")
        assert out.loc["y", "df"] == 3
        assert out.loc["y", "postings"] == "5,6"  # capped at 2, ascending
        assert out.loc["x", "postings"] == "5"
        assert out.loc["z", "df"] == 1

    def test_duplicate_words_counted_once_per_doc(self, ray_session):
        import ray

        out = inverted_index(
            ray.data.from_arrow(_docs(["w w w w"], start_id=1))
        ).to_pandas().set_index("word")
        assert out.loc["w", "df"] == 1
        assert out.loc["w", "postings"] == "1"
