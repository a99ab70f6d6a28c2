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


class TestNoveltyKernelProperties:
    """Hypothesis check of the vectorized kernels (no Ray round-trip):
    blocks -> _gram_occ_rows -> shard partials -> final sum must equal a
    brute-force Counter-based novelty computation, for any block split."""

    def _brute(self, docs, n=3):
        from collections import Counter

        per_doc = {}
        doc_freq = Counter()
        for doc_id, words in docs:
            grams = [" ".join(words[i:i + n])
                     for i in range(len(words) - n + 1)]
            if not grams:
                continue
            per_doc[doc_id] = Counter(grams)
            for g in set(grams):
                doc_freq[g] += 1
        out = {}
        for doc_id, cnt in per_doc.items():
            total = sum(cnt.values())
            novel = sum(c for g, c in cnt.items() if doc_freq[g] == 1)
            out[doc_id] = (total, novel)
        return out

    def test_matches_brute_force(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from json_time_series_extractor_ray.pipelines.novelty import (
            NOVELTY_SHARDS,
            _gram_occ_rows,
            _shard_novelty_partials,
        )

        words = st.sampled_from(["aa", "bb", "cc", "dd"])
        docs_strategy = st.lists(
            st.lists(words, min_size=0, max_size=8), min_size=1, max_size=8
        )

        @settings(max_examples=60, deadline=None)
        @given(docs=docs_strategy, n_blocks=st.integers(1, 3))
        def run(docs, n_blocks):
            docs = list(enumerate(docs))
            blocks = [docs[i::n_blocks] for i in range(n_blocks)]
            rows = []
            for blk in blocks:
                if not blk:
                    continue
                tbl = pa.table({
                    "doc_id": pa.array([d for d, _ in blk], pa.int64()),
                    "text": pa.array([" ".join(w) for _, w in blk],
                                     pa.string()),
                })
                rows.append(_gram_occ_rows(tbl, 3, NOVELTY_SHARDS))
            allrows = pa.concat_tables(rows).to_pandas()
            parts = [
                _shard_novelty_partials(g)
                for _, g in allrows.groupby("shard", sort=False)
            ]
            parts = [p for p in parts if len(p)]
            got = {}
            if parts:
                final = (
                    pd.concat(parts).groupby("doc_id")[["n_grams", "n_novel"]]
                    .sum()
                )
                got = {d: (int(r["n_grams"]), int(r["n_novel"]))
                       for d, r in final.iterrows()}
            # brute force treats empty text as zero words; the kernel's
            # splitter sees one empty word for "" — align by dropping
            # docs too short for any gram on both sides
            exp = self._brute(
                [(d, (" ".join(w)).split()) for d, w in docs])
            assert got == exp

        run()


class TestHostileWhitespaceParity:
    """The canonical RE2 ASCII trim (`_util.regex_trim`) must make the
    word-splitting kernels agree with the oracles' regexp_replace form on
    texts with edge tabs/newlines and Unicode spaces (U+00A0)."""

    TEXTS = [
        "\nhello world\t",        # edge ASCII whitespace
        "\u00a0lead nbsp",  # U+00A0 is NOT \s in RE2: must survive
        "  double  spaced  ",
        "",                        # empty doc
        "one",
    ]

    def test_word_counts_match_duckdb(self):
        import duckdb

        from json_time_series_extractor_ray.pipelines.textstats import (
            _words_and_offsets,
        )

        tbl = pa.table({"text": pa.array(self.TEXTS, pa.string())})
        _, offsets, _ = _words_and_offsets(tbl.column("text"))
        kernel_counts = np.diff(offsets).tolist()

        con = duckdb.connect()
        con.register("t", tbl)
        sql_counts = [
            r[0] for r in con.execute(
                r"""SELECT len(regexp_split_to_array(
                        regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'))
                    FROM t"""
            ).fetchall()
        ]
        assert kernel_counts == sql_counts

    def test_fingerprints_match_duckdb(self):
        import duckdb

        from json_time_series_extractor_ray.pipelines.dedup import (
            content_fingerprints,
        )

        tbl = pa.table({"text": pa.array(self.TEXTS, pa.string())})
        kernel_fps = content_fingerprints(tbl.column("text"))
        con = duckdb.connect()
        con.register("t", tbl)
        sql_fps = [
            r[0] for r in con.execute(
                r"""SELECT md5(regexp_replace(
                        regexp_replace(text, '^\s+|\s+$', '', 'g'),
                        '\s+', ' ', 'g'))
                    FROM t"""
            ).fetchall()
        ]
        assert kernel_fps == sql_fps
