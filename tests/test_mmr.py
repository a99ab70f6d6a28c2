"""MMR diversified retrieval rerank."""

import numpy as np
import pyarrow as pa

import ray

from json_time_series_extractor_ray.pipelines.similarity import (
    brute_force_topk,
    mmr_rerank,
)


def _emb(rows):
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array(
            [[np.float32(x) for x in r[1]] for r in rows],
            pa.list_(pa.float32())),
        "label": pa.array([0] * len(rows), pa.int32()),
    }))


def _fixture():
    # query on +x; a tight near-duplicate cluster at +y-ish direction
    # (ids 10-12, mutually ~identical) and one equally relevant DIVERSE
    # vector at -y-ish (id 20, ~0.62 cosine to the cluster).  Pure top-k
    # ranks the cluster 10,11,12 first (10 has the marginally largest
    # x); MMR must penalize the within-cluster redundancy and pick 20.
    rows = [
        (0, [1.0, 0.0, 0.0]),        # query vector itself (excluded)
        (10, [0.902, 0.43, 0.0]),
        (11, [0.901, 0.43, 0.0]),
        (12, [0.900, 0.43, 0.0]),
        (20, [0.88, -0.43, 0.0]),
    ]
    qids = np.array([0], np.int64)
    Q = np.array([[1.0, 0.0, 0.0]])
    return _emb(rows), qids, Q


class TestMmr:
    def test_diversifies_vs_pure_topk(self):
        ds, qids, Q = _fixture()
        top = brute_force_topk(ds, qids, Q, k=3).to_pandas()
        assert set(top["neighbor_id"]) == {10, 11, 12}  # all near-dups
        mmr = mmr_rerank(ds, qids, Q, k_candidates=4, k=3,
                         lam=0.5).to_pandas()
        # MMR must pull in the diverse vector the pure top-k ignored
        assert 20 in set(mmr["neighbor_id"])
        # rank 0 is still the most relevant candidate
        first = mmr.sort_values("mmr_rank").iloc[0]
        assert first["neighbor_id"] == 10

    def test_deterministic(self):
        ds, qids, Q = _fixture()
        a = mmr_rerank(ds, qids, Q).to_pandas()
        b = mmr_rerank(ds, qids, Q).to_pandas()
        assert a.equals(b)

    def test_lambda_one_is_pure_relevance(self):
        ds, qids, Q = _fixture()
        mmr = mmr_rerank(ds, qids, Q, k_candidates=4, k=4,
                         lam=1.0).to_pandas().sort_values("mmr_rank")
        top = brute_force_topk(ds, qids, Q, k=4).to_pandas()
        assert mmr["neighbor_id"].tolist() == top["neighbor_id"].tolist()


class TestTruncRecall:
    def test_full_dim_recall_is_one_and_mean_monotone(self, ray_session):
        from json_time_series_extractor_ray.pipelines.similarity import (
            _load_query_matrix,
            _read_embeddings,
            dim_truncation_report,
        )

        sf = "/root/testdata/sf0.001"
        qids, Q = _load_query_matrix(sf, 4)
        got = dim_truncation_report(
            _read_embeddings(sf), qids, Q, dims=(8, 32, 64))
        # truncating to the FULL dimension is the identity retrieval
        full = got[got["trunc_dim"] == 64]
        assert (full["recall_at_k"] == 1.0).all()
        # more dimensions can only help on average (Matryoshka premise)
        means = got.groupby("trunc_dim")["recall_at_k"].mean()
        assert means[8] <= means[32] <= means[64]
