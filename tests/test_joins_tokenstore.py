"""Shuffle equi-join, winsorize, windowed distinct, and the compressed
token-sequence chunk store."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from json_time_series_extractor_ray.state.tokenstore import (
    compress_corpus_dataset,
    decode_token_chunk,
    encode_token_chunk,
    varint_decode,
    varint_encode,
)

SF = "/root/testdata/sf0.001"


class TestVarint:
    def test_roundtrip_signed(self):
        rng = np.random.default_rng(7)
        for arr in (
            np.array([], np.int64),
            np.array([0, 1, -1, 127, 128, -128, 2**31 - 1, -(2**31)]),
            rng.integers(-(2**31), 2**31 - 1, 5000),
        ):
            assert np.array_equal(varint_decode(varint_encode(arr)),
                                  np.asarray(arr, np.int64))

    def test_roundtrip_unsigned_mode(self):
        arr = np.arange(0, 300, dtype=np.int64)
        enc = varint_encode(arr, zigzag=False)
        assert np.array_equal(varint_decode(enc, zigzag=False), arr)

    def test_unsigned_mode_is_one_byte_for_ascii(self):
        ascii_ids = np.random.default_rng(0).integers(0, 128, 10_000)
        assert len(varint_encode(ascii_ids, zigzag=False)) == 10_000

    def test_unsigned_mode_rejects_negative(self):
        with pytest.raises(ValueError):
            varint_encode(np.array([-1]), zigzag=False)


class TestTokenChunkCodec:
    def _chunk(self, tokens_rows, ids=None, srcs=None):
        arr = pa.array(tokens_rows, pa.list_(pa.int32()))
        ids = ids or [f"d{i}" for i in range(len(tokens_rows))]
        srcs = srcs or ["s"] * len(tokens_rows)
        return encode_token_chunk(ids, arr, srcs)

    def test_roundtrip_bit_exact(self):
        rows = [[1, 2, 3], [], [65, 66, 67, 200, -5], list(range(1000))]
        row = self._chunk(rows)
        out = decode_token_chunk(row)
        assert out.column("tokens").to_pylist() == rows
        assert out.column("doc_id").to_pylist() == ["d0", "d1", "d2", "d3"]
        assert out.column("n_tok").to_pylist() == [3, 0, 5, 1000]

    def test_ascii_corpus_compresses_4x(self):
        text = "the quick brown fox jumps over the lazy dog" * 20
        rows = [[b for b in text.encode()]] * 8
        row = self._chunk(rows)
        assert int(row["enc_bytes"]) < int(row["raw_bytes"]) / 3.5

    def test_checksum_detects_corruption(self):
        row = self._chunk([[1, 2, 3]])
        row["payload"] = row["payload"][:-1] + bytes(
            [row["payload"][-1] ^ 0xFF]
        )
        with pytest.raises(ValueError, match="checksum"):
            decode_token_chunk(row)


class TestTokenChunkStore:
    @pytest.fixture(scope="class")
    def corpus(self, ray_session):
        from json_time_series_extractor_ray.pipelines.timeseries import (
            events_corpus_dataset,
        )

        return events_corpus_dataset(SF).materialize()

    def test_readback_token_array_equality(self, ray_session, corpus,
                                           tmp_path_factory):
        from json_time_series_extractor_ray.sources.token_chunks import (
            read_token_chunks,
        )

        out = str(tmp_path_factory.mktemp("tokchunks"))
        compress_corpus_dataset(corpus).write_parquet(out)
        orig = corpus.to_pandas().sort_values("doc_id", ignore_index=True)
        back = read_token_chunks(out).to_pandas().sort_values(
            "doc_id", ignore_index=True
        )
        assert list(back.columns) == list(orig.columns)
        assert back["doc_id"].tolist() == orig["doc_id"].tolist()
        assert back["n_tok"].tolist() == orig["n_tok"].tolist()
        assert back["source"].tolist() == orig["source"].tolist()
        for a, b in zip(orig["tokens"], back["tokens"]):
            assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_doc_range_pushdown_prunes_chunks(self, ray_session, corpus,
                                              tmp_path_factory):
        from json_time_series_extractor_ray.sources.token_chunks import (
            read_token_chunks,
        )

        out = str(tmp_path_factory.mktemp("tokchunks_rng"))
        compress_corpus_dataset(corpus).write_parquet(out)
        all_ids = sorted(corpus.to_pandas()["doc_id"])
        lo, hi = all_ids[10], all_ids[50]
        got = read_token_chunks(out, min_doc_id=lo, max_doc_id=hi)
        ids = set(got.to_pandas()["doc_id"])
        # pruning is chunk-granular: every doc in [lo, hi] must survive
        assert set(i for i in all_ids if lo <= i <= hi) <= ids

    def test_totals_match_corpus(self, ray_session, corpus,
                                 tmp_path_factory):
        out = str(tmp_path_factory.mktemp("tokchunks_tot"))
        compress_corpus_dataset(corpus).write_parquet(out)
        import ray

        stats = ray.data.read_parquet(out).to_pandas()
        df = corpus.to_pandas()
        assert stats["n_docs"].sum() == len(df)
        assert stats["n_tokens"].sum() == df["n_tok"].sum()
        assert stats["raw_bytes"].sum() == 4 * df["n_tok"].sum()
        assert stats["enc_bytes"].sum() < stats["raw_bytes"].sum() / 3


def _mk_ds(ray, df):
    return ray.data.from_arrow(pa.Table.from_pandas(df,
                                                    preserve_index=False))


class TestShuffleJoin:
    def test_inner_matches_pandas(self, ray_session):
        from json_time_series_extractor_ray.pipelines.joins import (
            shuffle_join,
        )

        rng = np.random.default_rng(1)
        left = pd.DataFrame({
            "k": rng.integers(0, 50, 500),
            "lv": rng.normal(size=500),
        })
        right = pd.DataFrame({
            "rk": np.arange(40, dtype=np.int64),
            "rv": np.arange(40, dtype=np.int64) * 10,
        })
        got = shuffle_join(
            _mk_ds(ray_session, left), _mk_ds(ray_session, right),
            on="k", right_on="rk", num_shards=8,
        ).to_pandas().sort_values(["k", "lv", "rv"], ignore_index=True)
        want = left.merge(right, left_on="k", right_on="rk") \
            .drop(columns="rk")[["k", "lv", "rv"]] \
            .sort_values(["k", "lv", "rv"], ignore_index=True)
        pd.testing.assert_frame_equal(got, want)
        assert got["rv"].dtype == np.int64  # no null-upcast leak

    def test_left_join_keeps_unmatched(self, ray_session):
        from json_time_series_extractor_ray.pipelines.joins import (
            shuffle_join,
        )

        left = pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]})
        right = pd.DataFrame({"k": [2], "rv": ["x"]})
        got = shuffle_join(
            _mk_ds(ray_session, left), _mk_ds(ray_session, right),
            on="k", how="left", num_shards=4,
        ).to_pandas().sort_values("k", ignore_index=True)
        assert got["k"].tolist() == [1, 2, 3]
        assert got["rv"].tolist()[1] == "x"
        assert got["rv"].isna().tolist() == [True, False, True]

    def test_many_to_many_hot_key(self, ray_session):
        from json_time_series_extractor_ray.pipelines.joins import (
            shuffle_join,
        )

        left = pd.DataFrame({"k": [7] * 30, "lv": range(30)})
        right = pd.DataFrame({"k": [7] * 4, "rv": range(4)})
        got = shuffle_join(
            _mk_ds(ray_session, left), _mk_ds(ray_session, right),
            on="k", num_shards=4,
        ).to_pandas()
        assert len(got) == 120

    def test_unmatched_rows_never_round_big_ints(self, ray_session):
        """An unmatched row in a shard must not float64-transit the int
        columns: matched int values > 2^53 co-resident in the same shard
        stay exact (ADVICE r2 — nullable Int64 before merge/concat)."""
        from json_time_series_extractor_ray.pipelines.joins import (
            shuffle_join,
        )

        big = 2**60 + 1  # rounds to 2**60 through float64
        left = pd.DataFrame({"k": [1, 2, 3],
                             "lv": pd.array([big, big + 2, big + 4],
                                            dtype="int64")})
        right = pd.DataFrame({"k": [2, 9],
                              "rv": pd.array([big + 6, big + 8],
                                             dtype="int64")})
        for how in ("left", "outer"):
            out = shuffle_join(
                _mk_ds(ray_session, left), _mk_ds(ray_session, right),
                on="k", how=how, num_shards=1,
            )
            # read Arrow-side: a plain to_pandas() would itself float64
            # the nullable int column and mask the engine's exactness
            tbl = pa.concat_tables(list(
                out.iter_batches(batch_format="pyarrow")))
            assert tbl.column("lv").type == pa.int64()
            assert tbl.column("rv").type == pa.int64()
            rows = {r["k"]: r for r in tbl.to_pylist() if r["k"] is not None}
            assert rows[2]["lv"] == big + 2 and rows[2]["rv"] == big + 6
            assert rows[1]["lv"] == big and rows[1]["rv"] is None
        assert rows[9]["rv"] == big + 8  # outer keeps unmatched right

    def test_overlapping_columns_rejected(self, ray_session):
        from json_time_series_extractor_ray.pipelines.joins import (
            shuffle_join,
        )

        df = pd.DataFrame({"k": [1], "v": [2]})
        with pytest.raises(ValueError, match="overlapping"):
            shuffle_join(_mk_ds(ray_session, df), _mk_ds(ray_session, df),
                         on="k")


class TestWinsorizeAndWindowDistinct:
    def test_winsorize_bounds(self, ray_session):
        from json_time_series_extractor_ray.pipelines.joins import winsorize

        rng = np.random.default_rng(3)
        df = pd.DataFrame({
            "g": np.repeat(["a", "b"], 200),
            "v": np.concatenate([rng.normal(0, 1, 200),
                                 rng.normal(10, 5, 200)]),
        })
        got = winsorize(lambda: _mk_ds(ray_session, df), key="g", value="v",
                        p_lo=0.10, p_hi=0.90).to_pandas()
        for g, sub in got.groupby("g"):
            vals = np.sort(df[df["g"] == g]["v"].to_numpy())
            lo = vals[max(int(np.ceil(len(vals) * 0.10)) - 1, 0)]
            hi = vals[max(int(np.ceil(len(vals) * 0.90)) - 1, 0)]
            assert sub["v_w"].min() == lo
            assert sub["v_w"].max() == hi
            assert (sub["v_w"] == sub["v"].clip(lo, hi)).all()

    def test_window_distinct_exact(self, ray_session):
        from json_time_series_extractor_ray.pipelines.joins import (
            window_distinct,
        )

        rng = np.random.default_rng(4)
        n = 2000
        ts = pd.to_datetime(
            rng.integers(0, 4 * 3600, n), unit="s", utc=False
        )
        df = pd.DataFrame({"ts": ts.astype("datetime64[us]"),
                           "user_id": rng.integers(0, 37, n)})
        got = window_distinct(
            _mk_ds(ray_session, df), ts="ts", member="user_id",
            window_ns=3_600_000_000_000,
        ).to_pandas().sort_values("window_ns", ignore_index=True)
        wns = df["ts"].astype("int64") * 1000
        want = (
            df.assign(w=wns - wns % 3_600_000_000_000)
            .groupby("w")["user_id"].nunique()
        )
        assert got["n_distinct"].tolist() == want.tolist()


class TestTokenFrequencies:
    @pytest.fixture(scope="class")
    def small_corpus(self, ray_session):
        from json_time_series_extractor_ray.corpus import (
            texts_to_corpus_table,
        )
        import ray

        texts = ["abcab", "bc", "", "aaab"]
        t = texts_to_corpus_table(
            [f"d{i}" for i in range(len(texts))], texts,
            ["s"] * len(texts),
        )
        return ray.data.from_arrow(t).repartition(3), texts

    def test_frequencies_match_python_count(self, ray_session, small_corpus):
        from collections import Counter

        from json_time_series_extractor_ray.pipelines.tokenchunks import (
            token_frequencies,
        )

        ds, texts = small_corpus
        got = token_frequencies(ds).to_pandas()
        want = Counter(b for t in texts for b in t.encode())
        assert dict(zip(got["token"], got["n_occurrences"])) == dict(want)

    def test_bigrams_respect_doc_boundaries(self, ray_session, small_corpus):
        from collections import Counter

        from json_time_series_extractor_ray.pipelines.tokenchunks import (
            token_bigrams,
        )

        ds, texts = small_corpus
        got = token_bigrams(ds, top_k=100).to_pandas()
        want = Counter()
        for t in texts:
            b = t.encode()
            for i in range(len(b) - 1):
                want[(b[i], b[i + 1])] += 1
        got_map = {
            (int(a), int(bb)): int(n)
            for a, bb, n in zip(got["tok_a"], got["tok_b"],
                                got["n_occurrences"])
        }
        assert got_map == dict(want)
        # "ab" never crosses d0|d1 boundary: (98,97) count comes only
        # from within-doc pairs
        assert got_map.get((ord("b"), ord("c"))) == 2  # abcab + bc


class TestShuffleJoinNullKeys:
    def test_null_keys_never_match(self, ray_session):
        from json_time_series_extractor_ray.pipelines.joins import (
            shuffle_join,
        )

        left = pd.DataFrame({"k": pd.array([1, None, 3], dtype="Int64"),
                             "lv": [10, 20, 30]})
        right = pd.DataFrame({"k": pd.array([None, 3], dtype="Int64"),
                              "rv": ["x", "y"]})
        inner = shuffle_join(
            _mk_ds(ray_session, left), _mk_ds(ray_session, right),
            on="k", num_shards=4,
        ).to_pandas()
        # SQL: NULL = NULL is not true -> only the k=3 pair joins
        assert inner["lv"].tolist() == [30]
        assert inner["rv"].tolist() == ["y"]

        outer = shuffle_join(
            _mk_ds(ray_session, left), _mk_ds(ray_session, right),
            on="k", how="left", num_shards=4,
        ).to_pandas().sort_values("lv", ignore_index=True)
        assert outer["lv"].tolist() == [10, 20, 30]
        assert outer["rv"].tolist()[2] == "y"
        assert outer["rv"].isna().tolist() == [True, True, False]


class TestShuffleJoinOuter:
    def test_full_outer_both_directions_and_null_keys(self, ray_session):
        from json_time_series_extractor_ray.pipelines.joins import (
            shuffle_join,
        )

        left = pd.DataFrame({"k": pd.array([1, 2, None], dtype="Int64"),
                             "lv": pd.array([10, 20, 30], dtype="Int64")})
        right = pd.DataFrame({"k": pd.array([2, 4, None], dtype="Int64"),
                              "rv": pd.array([200, 400, 500],
                                             dtype="Int64")})
        got = shuffle_join(
            _mk_ds(ray_session, left), _mk_ds(ray_session, right),
            on="k", how="outer", num_shards=4,
        ).to_pandas()
        # SQL FULL JOIN: matched (2), left-only (1, NULL-left), right-only
        # (4, NULL-right); NULL keys never match each other
        key = got.apply(lambda r: (r["k"], r["lv"], r["rv"]), axis=1)
        rows = {tuple(None if pd.isna(v) else int(v) for v in t)
                for t in key}
        assert rows == {
            (2, 20, 200),        # matched
            (1, 10, None),       # left-only
            (None, 30, None),    # null-key left survives unmatched
            (4, None, 400),      # right-only
            (None, None, 500),   # null-key right survives unmatched
        }
        # int columns come back as true nullable ints, never floats
        import pyarrow as _pa
        sch = shuffle_join(
            _mk_ds(ray_session, left), _mk_ds(ray_session, right),
            on="k", how="outer", num_shards=4,
        ).schema()
        assert sch.base_schema.field("lv").type == _pa.int64()
        assert sch.base_schema.field("rv").type == _pa.int64()
