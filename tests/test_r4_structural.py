"""Round-4 structural-oracle entries: exact-verified LSH pairs, the
HLL/CMS guarantee twins, the ANN recall report, and the full-shape Q16
NOT IN variant (round-3 verdict items 4-6)."""

import numpy as np
import pyarrow as pa
import pytest

from json_time_series_extractor_ray.pipelines.dedup import (
    minhash_lsh_verified_pairs,
    shingle_sets,
)

SF = "/root/testdata/sf0.001"

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango"
).split()


def _doc_table(n=60, seed=5):
    rng = np.random.default_rng(seed)
    texts = [" ".join(rng.choice(WORDS, size=40).tolist()) for _ in range(n)]
    texts.append(texts[0])          # 60: exact dup of 0
    w = texts[1].split()
    w[5] = "zulu"
    texts.append(" ".join(w))       # 61: near-dup of 1
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })


class TestVerifiedLshPairs:
    def test_planted_pairs_exact_jaccard(self, ray_session):
        import ray

        t = _doc_table()
        out = minhash_lsh_verified_pairs(
            ray.data.from_arrow(t), tau=0.5).to_pandas()
        pairs = {(a, b): j for a, b, j in
                 out[["doc_a", "doc_b", "jaccard"]].itertuples(index=False)}
        # exact dup: jaccard exactly 1
        assert pairs[(0, 60)] == 1.0
        # near-dup: matches the brute-force shingle-set jaccard
        sets = shingle_sets(t.column("text"), 3)
        true_j = len(sets[1] & sets[61]) / len(sets[1] | sets[61])
        # pipeline emits round-half-away-6 values (repo parity rule)
        assert abs(pairs[(1, 61)] - true_j) < 5e-7
        assert true_j >= 0.5
        # nothing else survives exact verification at tau=0.5
        assert set(pairs) == {(0, 60), (1, 61)}

    def test_output_sorted_and_typed(self, ray_session):
        import ray

        out = minhash_lsh_verified_pairs(
            ray.data.from_arrow(_doc_table()), tau=0.5).to_pandas()
        assert list(out.columns) == ["doc_a", "doc_b", "jaccard"]
        key = list(zip(out["doc_a"], out["doc_b"]))
        assert key == sorted(key)


class TestSketchGuaranteeTwins:
    def test_hll_within_3sigma_on_fixture(self, ray_session):
        from json_time_series_extractor_ray.pipelines.sketches import (
            _q_hll_vs_exact)

        t = _q_hll_vs_exact(SF)
        assert t.column("hll_within_3sigma").to_pylist() == [True]
        assert t.column("exact_distinct_users").to_pylist()[0] > 0

    def test_cms_flags_on_fixture(self, ray_session):
        from json_time_series_extractor_ray.pipelines.sketches import (
            _q_cms_vs_exact)

        t = _q_cms_vs_exact(SF)
        assert all(t.column("cms_ge_exact").to_pylist())
        assert all(t.column("cms_within_eps").to_pylist())
        ex = t.column("exact_count").to_pylist()
        assert ex == sorted(ex, reverse=True) and ex[0] > 0


class TestAnnRecallReport:
    def test_all_variants_clear_floors(self, ray_session):
        from json_time_series_extractor_ray.pipelines.similarity import (
            ANN_RECALL_FLOORS, ann_recall_report)

        t = ann_recall_report(SF)
        assert t.column("variant").to_pylist() == [
            v for v, _ in ANN_RECALL_FLOORS]
        assert all(t.column("recall_ok").to_pylist())


class TestQ16FullShape:
    def test_matches_duckdb(self, ray_session):
        import duckdb

        import __ray_entry__ as e

        con = duckdb.connect()
        for tbl in ("lineitem", "part", "supplier"):
            con.execute(
                f"CREATE VIEW {tbl} AS SELECT * FROM '{SF}/{tbl}.parquet'")
        ours = e.queries()["part_supplier_counts_excl"](SF)
        if hasattr(ours, "to_pandas"):
            ours = ours.to_pandas()
        oracle = con.execute(
            e.oracle_sql()["part_supplier_counts_excl"]).fetchdf()
        assert len(ours) == len(oracle) > 0
        assert (ours.reset_index(drop=True)["supplier_cnt"]
                == oracle["supplier_cnt"]).all()
        assert (ours.reset_index(drop=True)["p_brand"]
                == oracle["p_brand"]).all()
