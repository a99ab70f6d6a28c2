"""Duplicated-substring span detection (Lee et al. 2021 measure)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from json_time_series_extractor_ray.pipelines.substrdedup import (
    duplicated_spans,
)


def _docs_ds(ray, texts, tmp_path):
    import pyarrow.parquet as pq

    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "n_chars": pa.array([len(s) for s in texts], pa.int64()),
    })
    path = str(tmp_path / "docs.parquet")
    pq.write_table(t, path)
    return ray.data.from_arrow(t.select(["doc_id", "text"])), path


class TestDuplicatedSpans:
    def test_planted_cross_doc_duplicate(self, ray_session, tmp_path):
        L = 40
        shared = "the quick brown fox jumps over the lazy dog again!"  # 50 chars
        assert len(shared) == 50
        rng = np.random.default_rng(5)
        import string
        def rand(n):
            return "".join(rng.choice(list(string.ascii_lowercase), n))
        texts = [
            rand(30) + shared + rand(25),   # doc 0: one 50-char dup span
            rand(60) + shared,              # doc 1: dup span at the end
            rand(100),                      # doc 2: clean
        ]
        out = duplicated_spans(*_docs_ds(ray_session, texts, tmp_path)) \
            .to_pandas().sort_values("doc_id", ignore_index=True)
        assert len(out) == 3
        # a shared 50-char block yields 50-40+1 = 11 dup positions and
        # ONE maximal span of exactly 50 chars in each carrier doc
        for d in (0, 1):
            r = out.iloc[d]
            assert int(r["n_dup"]) == 11
            assert int(r["n_spans"]) == 1
            assert int(r["longest_span"]) == 50
        clean = out.iloc[2]
        assert int(clean["n_dup"]) == 0 and int(clean["n_spans"]) == 0
        assert float(clean["dup_ratio"]) == 0.0
        assert int(clean["n_positions"]) == 100 - 40 + 1

    def test_within_doc_repeat_counts(self, ray_session, tmp_path):
        # the same 40-gram twice INSIDE one doc is also a duplicate
        import string
        rng = np.random.default_rng(6)
        blk = "".join(rng.choice(list(string.ascii_lowercase), 40))
        mid = "".join(rng.choice(list(string.ascii_uppercase), 20))
        texts = [blk + mid + blk]
        out = duplicated_spans(*_docs_ds(ray_session, texts, tmp_path)) \
            .to_pandas()
        r = out.iloc[0]
        assert int(r["n_dup"]) == 2          # positions 0 and 60
        assert int(r["n_spans"]) == 2        # gap 60 > L: two spans
        assert int(r["longest_span"]) == 40
