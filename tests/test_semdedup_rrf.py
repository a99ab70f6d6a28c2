"""SemDeDup (kmeans-blocked semantic dedup) and RRF hybrid fusion."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from json_time_series_extractor_ray.pipelines.similarity import (
    _normalize,
    rrf_fuse,
    semdedup,
)

SF = "/root/testdata/sf0.001"


def _emb_table(rows):
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array(
            [[np.float32(x) for x in r[1]] for r in rows],
            pa.list_(pa.float32())),
        "label": pa.array([0] * len(rows), pa.int32()),
    }))


class TestSemDeDup:
    def test_within_cluster_exact_and_min_id_kept(self):
        # two well-separated directions; near-dup pairs planted in each
        rows = [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0]),    # near-dup of 0
            (2, [0.998, 0.02, 0.0]),    # near-dup of 0 and 1
            (10, [0.0, 1.0, 0.0]),
            (11, [0.0, 0.999, 0.02]),   # near-dup of 10
            (20, [0.0, 0.0, 1.0]),      # singleton
        ]
        out = semdedup(_emb_table(rows), n_clusters=3, tau=0.95,
                       n_iters=3).to_pandas().sort_values("vec_id")
        assert len(out) == len(rows)
        keep = dict(zip(out["vec_id"], out["keep"]))
        # min id per component kept, rest dropped
        assert keep[0] and not keep[1] and not keep[2]
        assert keep[10] and not keep[11]
        assert keep[20]

    def test_matches_local_recompute_on_fixture(self):
        """Within-cluster semantics are EXACT: recompute assignment +
        per-cluster components locally with the same centroids and
        compare keep flags bit-for-bit."""
        from json_time_series_extractor_ray.pipelines.dedup import _uf_labels
        from json_time_series_extractor_ray.pipelines.similarity import (
            _read_embeddings,
            kmeans_fit,
        )
        from json_time_series_extractor_ray.pipelines._util import (
            round_half_away,
        )

        ds = _read_embeddings(SF).materialize()
        out = semdedup(ds).to_pandas().sort_values("vec_id") \
            .reset_index(drop=True)
        C = kmeans_fit(ds, n_clusters=16, n_iters=5, seed=7)
        df = ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
        En = _normalize(df["embedding"].to_numpy())
        assign = np.argmax(En @ C.T, axis=1)
        ids = df["vec_id"].to_numpy(np.int64)
        expect = {}
        for c in np.unique(assign):
            m = assign == c
            cid, cE = ids[m], En[m]
            S = round_half_away(cE @ cE.T, 6)
            a, b = np.triu_indices(len(cid), k=1)
            hit = S[a, b] >= 0.3
            labels = _uf_labels(zip(cid[a[hit]], cid[b[hit]]))
            for i in cid:
                expect[int(i)] = labels.get(int(i), int(i)) == int(i)
        got = dict(zip(out["vec_id"], out["keep"]))
        assert got == expect
        # sanity: the fixture actually plants semantic dups
        assert (~out["keep"]).sum() > 0

    def test_cluster_guard_fails_loudly(self):
        rows = [(i, [1.0, 0.0, 0.0]) for i in range(8)]
        import pytest

        with pytest.raises(Exception, match="max_cluster_vecs"):
            semdedup(_emb_table(rows), n_clusters=1, n_iters=1,
                     max_cluster_vecs=4).to_pandas()

    def test_deterministic(self):
        ds = _emb_table([(i, [float(i % 3 == 0), float(i % 3 == 1),
                              float(i % 3 == 2)]) for i in range(12)])
        a = semdedup(ds, n_clusters=3, n_iters=2).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        b = semdedup(ds, n_clusters=3, n_iters=2).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        assert a.equals(b)


class TestRrfFuse:
    def _ranked(self, name, rows, cols):
        return ray.data.from_arrow(pa.table({
            c: pa.array([r[i] for r in rows],
                        pa.float64() if c in ("score", "cosine")
                        else pa.int64())
            for i, c in enumerate(cols)
        }))

    def test_fusion_math_and_order(self):
        # query 0: doc 5 is rank 1 lexically and rank 2 densely -> must
        # outrank doc 7 (rank 2 lexically only) and doc 9 (rank 1
        # densely only)
        bm = self._ranked("bm", [(0, 5, 9.0), (0, 7, 5.0)],
                          ["query_id", "doc_id", "score"])
        co = self._ranked("co", [(0, 9, 0.99), (0, 5, 0.98)],
                          ["query_id", "neighbor_id", "cosine"])
        out = rrf_fuse(bm, co).to_pandas().sort_values(
            "rrf", ascending=False).reset_index(drop=True)
        assert list(out["doc_id"]) == [5, 9, 7]
        r5 = out[out["doc_id"] == 5].iloc[0]
        assert r5["rank_bm25"] == 1 and r5["rank_cos"] == 2
        expect = round(1.0 / 61 + 1.0 / 62, 6)
        assert abs(r5["rrf"] - expect) < 1e-12
        # single-list docs carry a 0 sentinel for the missing rank
        r9 = out[out["doc_id"] == 9].iloc[0]
        assert r9["rank_bm25"] == 0 and r9["rank_cos"] == 1

    def test_top_k_truncation(self):
        bm = self._ranked("bm", [(0, i, 100.0 - i) for i in range(15)],
                          ["query_id", "doc_id", "score"])
        co = self._ranked("co", [(0, 100 + i, 0.9 - i * 0.01)
                                 for i in range(15)],
                          ["query_id", "neighbor_id", "cosine"])
        out = rrf_fuse(bm, co, top_k=10).to_pandas()
        assert len(out) == 10


class TestPagerank:
    def test_two_node_closed_form(self):
        """A <-> B symmetric graph: stationary rank is exactly 0.5/0.5
        and stays there through every rounded iteration."""
        from json_time_series_extractor_ray.pipelines.graph import (
            pagerank_from_edges,
        )

        edges = pd.DataFrame({
            "src_nation": [0, 1], "dst_nation": [1, 0], "weight": [3, 7],
        })
        out = pagerank_from_edges(edges)
        assert list(out["n_nationkey"]) == [0, 1]
        assert list(out["pagerank"]) == [0.5, 0.5]

    def test_sink_heavy_node_ranks_higher(self):
        """0 and 1 both point at 2; 2 splits back — 2 must rank top."""
        from json_time_series_extractor_ray.pipelines.graph import (
            pagerank_from_edges,
        )

        edges = pd.DataFrame({
            "src_nation": [0, 1, 2, 2],
            "dst_nation": [2, 2, 0, 1],
            "weight": [1, 1, 1, 1],
        })
        out = pagerank_from_edges(edges).set_index("n_nationkey")
        assert out.loc[2, "pagerank"] > out.loc[0, "pagerank"]
        assert abs(out["pagerank"].sum() - 1.0) < 1e-4

    def test_dangling_node_rejected(self):
        from json_time_series_extractor_ray.pipelines.graph import (
            pagerank_from_edges,
        )
        import pytest

        edges = pd.DataFrame({
            "src_nation": [0], "dst_nation": [1], "weight": [1],
        })
        with pytest.raises(AssertionError, match="dangling"):
            pagerank_from_edges(edges)


class TestTriangles:
    def test_k4_complete_graph(self):
        """K4: every node sits in C(3,2)=3 triangles, clustering 1.0;
        direction and multiplicity of the input edges must not matter."""
        from json_time_series_extractor_ray.pipelines.graph import (
            triangles_from_edges,
        )

        src, dst = [], []
        for u in range(4):
            for v in range(4):
                if u != v:
                    src.append(u)
                    dst.append(v)          # both directions present
        edges = pd.DataFrame({"src_nation": src, "dst_nation": dst,
                              "weight": 1})
        out = triangles_from_edges(edges)
        assert list(out["degree"]) == [3, 3, 3, 3]
        assert list(out["triangles"]) == [3, 3, 3, 3]
        assert list(out["clustering"]) == [1.0, 1.0, 1.0, 1.0]

    def test_path_graph_has_no_triangles(self):
        """0-1-2 path: middle node degree 2 but open wedge only."""
        from json_time_series_extractor_ray.pipelines.graph import (
            triangles_from_edges,
        )

        edges = pd.DataFrame({
            "src_nation": [0, 1, 1],       # includes a self-loop 1->1
            "dst_nation": [1, 2, 1],
            "weight": [1, 1, 5],
        })
        out = triangles_from_edges(edges).set_index("n_nationkey")
        assert list(out["triangles"]) == [0, 0, 0]
        assert out.loc[1, "degree"] == 2
        assert out.loc[1, "clustering"] == 0.0
        assert out.loc[0, "clustering"] == 0.0  # deg < 2 rule

    def test_triangle_plus_pendant_brute_force(self):
        """Triangle 0-1-2 with pendant 3 on node 0: counts match the
        brute-force enumeration over all vertex triples."""
        import itertools

        from json_time_series_extractor_ray.pipelines.graph import (
            triangles_from_edges,
        )

        und = {(0, 1), (1, 2), (0, 2), (0, 3)}
        edges = pd.DataFrame({
            "src_nation": [a for a, b in und],
            "dst_nation": [b for a, b in und],
            "weight": 1,
        })
        out = triangles_from_edges(edges).set_index("n_nationkey")
        for node in range(4):
            brute = sum(
                1 for a, b in itertools.combinations(range(4), 2)
                if a != node and b != node
                and tuple(sorted((node, a))) in und
                and tuple(sorted((node, b))) in und
                and (a, b) in und
            )
            assert out.loc[node, "triangles"] == brute
        assert out.loc[3, "degree"] == 1 and out.loc[3, "clustering"] == 0.0


class TestMarkovStationary:
    def test_two_state_closed_form(self):
        """p(0->1)=1, p(1->0)=0.5: stationary is (1/3, 2/3)."""
        from json_time_series_extractor_ray.pipelines.graph import (
            markov_stationary,
        )

        counts = pd.DataFrame({
            "prev_state": ["a", "b", "b"],
            "next_state": ["b", "a", "b"],
            "n": [10, 5, 5],
        })
        out = markov_stationary(counts).set_index("state")
        assert abs(out.loc["a", "stationary"] - 1 / 3) < 1e-4
        assert abs(out.loc["b", "stationary"] - 2 / 3) < 1e-4

    def test_matches_eigenvector_on_random_chain(self):
        """The 20-rounded-iteration result sits within 1e-3 of the true
        stationary eigenvector on a seeded 5-state chain."""
        from json_time_series_extractor_ray.pipelines.graph import (
            markov_stationary,
        )

        rng = np.random.default_rng(7)
        k = 5
        N = rng.integers(1, 50, size=(k, k)).astype(float)
        states = [f"s{i}" for i in range(k)]
        rows = [(states[i], states[j], N[i, j])
                for i in range(k) for j in range(k)]
        counts = pd.DataFrame(rows,
                              columns=["prev_state", "next_state", "n"])
        out = markov_stationary(counts).set_index("state")
        P = N / N.sum(axis=1, keepdims=True)
        vals, vecs = np.linalg.eig(P.T)
        v = np.real(vecs[:, np.argmax(np.real(vals))])
        v = v / v.sum()
        for i, s in enumerate(states):
            assert abs(out.loc[s, "stationary"] - v[i]) < 1e-3

    def test_absorbing_state_rejected(self):
        from json_time_series_extractor_ray.pipelines.graph import (
            markov_stationary,
        )
        import pytest

        counts = pd.DataFrame({
            "prev_state": ["a"], "next_state": ["b"], "n": [3],
        })
        with pytest.raises(AssertionError, match="out-transitions"):
            markov_stationary(counts)
