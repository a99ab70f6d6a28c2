"""n-gram novelty scoring + keep-best exact dedup (pipelines/novelty.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from json_time_series_extractor_ray.pipelines.novelty import (
    keep_best_dedup,
    ngram_novelty,
)


def _docs(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    }))


class TestNgramNovelty:
    def test_hand_computed(self):
        # doc 0 and doc 1 share the trigram "a b c"; everything else is unique.
        rows = [
            (0, "a b c x y"),      # grams: "a b c"(shared), "b c x", "c x y"
            (1, "a b c q r"),      # grams: "a b c"(shared), "b c q", "c q r"
            (2, "zz"),             # < 3 words: no grams, absent from output
        ]
        out = (
            ngram_novelty(_docs(rows))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == [0, 1]
        assert out["n_grams"].tolist() == [3, 3]
        assert out["n_novel"].tolist() == [2, 2]
        assert np.allclose(out["novelty"], [2 / 3, 2 / 3])

    def test_repeated_gram_within_one_doc_is_novel(self):
        # "p q r" occurs twice in doc 0 but in no other doc: doc-frequency
        # is 1, so BOTH occurrences count as novel.
        rows = [(0, "p q r p q r"), (1, "s t u v")]
        out = ngram_novelty(_docs(rows)).to_pandas().set_index("doc_id")
        assert out.loc[0, "n_grams"] == 4  # pqr, qrp, rpq, pqr
        assert out.loc[0, "n_novel"] == 4
        assert out.loc[0, "novelty"] == 1.0

    def test_dtypes(self):
        rows = [(7, "m n o p")]
        tbl = pa.concat_tables(
            ray.get(ngram_novelty(_docs(rows)).to_arrow_refs())
        )
        assert tbl.schema.field("doc_id").type == pa.int64()
        assert tbl.schema.field("n_grams").type == pa.int64()
        assert tbl.schema.field("n_novel").type == pa.int64()
        assert tbl.schema.field("novelty").type == pa.float64()


class TestKeepBestDedup:
    def test_keeps_longest_copy(self):
        # docs 0/3/5 identical after whitespace normalization; n_chars is
        # taken from the column (here: raw text length), so doc 3 (extra
        # whitespace -> more chars) wins the group.
        rows = [
            (0, "same words here"),
            (3, "  same   words here "),
            (5, "same words  here"),
            (9, "something else"),
        ]
        out = (
            keep_best_dedup(_docs(rows))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == [3, 9]
        assert out.loc[0, "n_copies"] == 3
        assert out.loc[1, "n_copies"] == 1

    def test_tie_breaks_on_min_doc_id(self):
        rows = [(4, "x y z"), (2, "x y z"), (8, "x y z")]
        out = keep_best_dedup(_docs(rows)).to_pandas()
        assert len(out) == 1
        assert out.loc[0, "doc_id"] == 2
        assert out.loc[0, "n_copies"] == 3
