"""BPE tokenizer training + actor-pool encoding."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from json_time_series_extractor_ray.pipelines.bpe import (
    BpeEncodeStage,
    _encode_word,
    bpe_encode,
    bpe_train,
    word_vocab,
)


def _docs(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(rows))), pa.int64()),
        "text": pa.array(rows, pa.string()),
    }))


class TestBpeTrain:
    def test_textbook_merges(self):
        """The Sennrich running example: {low:5, lower:2, newest:6,
        widest:3}.  First merges must be (e,s), (es,t), (est,</w>) —
        'est</w>' is the dominant suffix — then (l,o), (lo,w)."""
        vocab = pd.DataFrame({
            "word": ["low", "lower", "newest", "widest"],
            "n": [5, 2, 6, 3],
        })
        merges = bpe_train(vocab, n_merges=5)
        assert merges[:3] == [("e", "s"), ("es", "t"), ("est", "</w>")]
        assert ("l", "o") in merges and ("lo", "w") in merges

    def test_deterministic_tiebreak(self):
        # two pairs with equal weight: the lexicographically smaller wins
        vocab = pd.DataFrame({"word": ["ab", "cd"], "n": [3, 3]})
        merges = bpe_train(vocab, n_merges=1)
        assert merges == [("a", "b")]

    def test_min_count_stops(self):
        vocab = pd.DataFrame({"word": ["xy"], "n": [1]})
        assert bpe_train(vocab, n_merges=10) == []


class TestBpeEncode:
    def test_encode_matches_training_segmentation(self):
        """Greedy-by-rank encoding must reproduce the training-time
        segmentation for every training word."""
        vocab = pd.DataFrame({
            "word": ["low", "lower", "newest", "widest"],
            "n": [5, 2, 6, 3],
        })
        merges = bpe_train(vocab, n_merges=10)
        ranks = {m: i for i, m in enumerate(merges)}
        assert _encode_word("newest", ranks) == ("newest</w>",) or \
            "est</w>" in _encode_word("newest", ranks)
        # unseen word falls back to finer pieces, never errors
        toks = _encode_word("lowest", ranks)
        assert "".join(toks).replace("</w>", "") == "lowest"

    def test_pipeline_end_to_end(self):
        docs = ["low low low lower", "newest widest newest", ""]
        ds = _docs(docs)
        vocab = word_vocab(ds)
        assert int(vocab.loc[vocab["word"] == "low", "n"].iloc[0]) == 3
        merges = bpe_train(vocab, n_merges=20)
        out = bpe_encode(ds, merges, concurrency=1).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert list(out["n_words"]) == [4, 3, 0]
        assert out.loc[2, "n_bpe_tokens"] == 0
        # trained tokens compress: fewer tokens than characters+1
        assert out.loc[0, "n_bpe_tokens"] < sum(len(w) + 1
                                                for w in docs[0].split())
        # memoized stage is deterministic across a fresh actor
        out2 = bpe_encode(ds, merges, concurrency=1).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert out.equals(out2)

    def test_stage_memo_consistency(self):
        """Cache hit and cold path must agree."""
        merges = [("a", "b"), ("ab", "</w>")]
        stage = BpeEncodeStage(merges)
        t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                      "text": pa.array(["ab ab", "ab"], pa.string())})
        first = stage(t)
        second = stage(t)
        assert first.equals(second)
        assert first.column("n_bpe_tokens").to_pylist() == [2, 1]

    def test_vocab_guard(self):
        import pytest

        ds = _docs(["a b c d e f"])
        with pytest.raises(ValueError, match="max_vocab_rows"):
            word_vocab(ds, max_vocab_rows=3)


def _bpe_train_bruteforce(vocab, n_merges, min_pair_count=2):
    """The r2 full-recount reference: recount every pair each round."""
    from collections import Counter

    words = [tuple(w) + ("</w>",) for w in vocab["word"]]
    counts = [int(n) for n in vocab["n"]]
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, n in zip(words, counts):
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        a, b = best[0]
        merges.append((a, b))
        words = [_merge_word(syms, a, b) for syms in words]
    return merges


def _merge_word(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


class TestIncrementalPairCounts:
    def test_matches_full_recount_on_random_vocab(self):
        """The incremental (subword-nmt style) trainer must produce the
        EXACT merge sequence of the full-recount reference — including
        repeated-symbol words like 'aaa' and tie-breaks."""
        import numpy as np
        import pandas as pd

        from json_time_series_extractor_ray.pipelines.bpe import bpe_train

        rng = np.random.default_rng(17)
        alphabet = list("abcde")
        words = set()
        while len(words) < 300:
            n = rng.integers(1, 9)
            words.add("".join(rng.choice(alphabet, n)))
        words = sorted(words) + ["aaa", "aaaa", "bbbb"]
        vocab = pd.DataFrame({
            "word": words,
            "n": rng.integers(1, 50, len(words)),
        })
        got = bpe_train(vocab, n_merges=60)
        want = _bpe_train_bruteforce(vocab, n_merges=60)
        assert got == want
        assert len(got) == 60
