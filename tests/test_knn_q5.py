"""kNN label-vote classification + TPC-H Q5 join tree."""

import numpy as np
import pyarrow as pa

import ray

from json_time_series_extractor_ray.pipelines.similarity import (
    knn_label_vote,
)


def _emb(rows):
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows],
                              pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in rows], pa.int32()),
    }))


class TestKnnLabelVote:
    def test_separable_clusters(self):
        # train: 5 vectors near +x with label 0, 5 near +y with label 1;
        # queries 0 (on +x) and 1 (on +y) must classify 5-0.
        rng = np.random.RandomState(3)
        train = []
        for i in range(5):
            train.append((10 + i,
                          list(np.r_[1.0, rng.rand() * 0.1, 0.0]
                               .astype(np.float32)), 0))
            train.append((20 + i,
                          list(np.r_[rng.rand() * 0.1, 1.0, 0.0]
                               .astype(np.float32)), 1))
        queries = [(0, [1.0, 0.0, 0.0], 0), (1, [0.0, 1.0, 0.0], 1)]
        ds = _emb(queries + train)
        qids = np.array([0, 1], np.int64)
        qlabels = np.array([0, 1], np.int64)
        Q = np.array([[1.0, 0, 0], [0, 1.0, 0]])
        out = knn_label_vote(ds, qids, qlabels, Q,
                             min_train_id=10).to_pandas()
        out = out.set_index("query_id")
        assert out.loc[0, "pred_label"] == 0
        assert out.loc[1, "pred_label"] == 1
        assert (out["n_votes"] == 5).all()
        assert out["correct"].all()

    def test_tie_breaks_to_smallest_label(self):
        # k=5 over 2+2+1 votes with labels 2,1,1,2,9: counts {1:2, 2:2,
        # 9:1} -> majority tie between 1 and 2 -> smallest label wins.
        train = [
            (10, [1.0, 0.00], 2), (11, [1.0, 0.01], 1),
            (12, [1.0, 0.02], 1), (13, [1.0, 0.03], 2),
            (14, [1.0, 0.04], 9),
        ]
        queries = [(0, [1.0, 0.0], 1)]
        ds = _emb([(q[0], [np.float32(x) for x in q[1]], q[2])
                   for q in queries + train])
        out = knn_label_vote(
            ds, np.array([0], np.int64), np.array([1], np.int64),
            np.array([[1.0, 0.0]]), min_train_id=10).to_pandas()
        assert out["pred_label"].iloc[0] == 1
        assert out["n_votes"].iloc[0] == 2
        assert bool(out["correct"].iloc[0])

    def test_train_set_only(self):
        # vectors below min_train_id (other queries) never vote
        train = [(10, [1.0, 0.0], 3)]
        decoys = [(1, [1.0, 0.0], 7), (2, [1.0, 0.0], 7)]
        queries = [(0, [1.0, 0.0], 3)]
        ds = _emb([(r[0], [np.float32(x) for x in r[1]], r[2])
                   for r in queries + decoys + train])
        out = knn_label_vote(
            ds, np.array([0], np.int64), np.array([3], np.int64),
            np.array([[1.0, 0.0]]), min_train_id=10).to_pandas()
        assert out["pred_label"].iloc[0] == 3
        assert out["n_votes"].iloc[0] == 1
