"""Similarity search over the ``embeddings`` table.

* **Brute-force cosine top-k** (the exact baseline, SQL-checkable): the
  small query matrix is broadcast once into every stage worker; each
  ``map_batches`` computes a partial top-k per query over its batch with a
  single float64 matmul; a tiny ``groupby(query_id)`` merge reduces the
  per-batch partials to the global top-k.  The shuffle carries
  O(n_batches x n_queries x k) rows — never the corpus.
* **IVF top-k** (the scale path): a coarse quantizer (per-``label`` cell
  centroids, computed with one small aggregation and broadcast) restricts
  each query to its ``nprobe`` nearest cells; the same partial-top-k merge
  runs over only the probed cells' rows.  Approximate by construction —
  recall vs the brute-force baseline is pinned in pytest; the driver runs a
  rows-only check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import round_half_away
from .registry import register

N_QUERIES = 8
TOP_K = 5


def _read_embeddings(sf_dir: str):
    import ray

    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )


def _load_query_matrix(sf_dir: str, n_queries: int, *, with_labels=False):
    """Small-side lookup: read just the query vectors driver-side (tiny) so
    they can be broadcast by value into every stage worker.  With
    ``with_labels`` also returns each query's label (hard-negative
    mining's same-label exclusion)."""
    import pyarrow.dataset as pads

    cols = ["vec_id", "embedding"] + (["label"] if with_labels else [])
    t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=cols,
        filter=pads.field("vec_id") < n_queries,
    )
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    order = np.argsort(ids)
    Q = np.stack(t.column("embedding").to_pylist()).astype(np.float64)[order]
    norms = np.linalg.norm(Q, axis=1, keepdims=True)
    # same zero-norm guard as _normalize: a zero query vector must score
    # cosine 0 everywhere, not poison its whole result set with NaN
    Qn = Q / np.where(norms == 0, 1.0, norms)
    if with_labels:
        labels = np.asarray(
            t.column("label").to_pylist(), dtype=np.int64)[order]
        return ids[order], labels, Qn
    return ids[order], Qn


def _normalize(block_embeddings) -> np.ndarray:
    E = np.stack(block_embeddings).astype(np.float64)
    norms = np.linalg.norm(E, axis=1, keepdims=True)
    return E / np.where(norms == 0, 1.0, norms)


class PartialTopKStage:
    """One corpus batch -> per-query partial top-k rows."""

    def __init__(self, query_ids: np.ndarray, query_matrix: np.ndarray, k: int):
        self.query_ids = query_ids
        self.Q = query_matrix  # (q, d), already normalized
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        En = _normalize(batch.column("embedding").to_pylist())
        S = self.Q @ En.T  # (q, n)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(self.query_ids):
            sims = S[qi]
            mask = ids != qid  # exclude self
            cand_ids = ids[mask]
            cand_sims = sims[mask]
            k = min(self.k, len(cand_ids))
            if k == 0:
                continue
            # top-k by (sim desc, vec_id asc) — deterministic under ties
            top = np.lexsort((cand_ids, -cand_sims))[:k]
            out_q.extend([qid] * k)
            out_n.extend(cand_ids[top])
            out_s.extend(cand_sims[top])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


def _merge_topk(df: pd.DataFrame, k: int) -> pd.DataFrame:
    df = df.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
    return pd.DataFrame(
        {
            "query_id": df["query_id"].to_numpy(),
            "neighbor_id": df["neighbor_id"].to_numpy(),
            "cosine": round_half_away(df["sim"].to_numpy(), 6),
        }
    )


def brute_force_topk(emb_ds, query_ids, query_matrix, *, k: int = TOP_K):
    partials = emb_ds.map_batches(
        PartialTopKStage(query_ids, query_matrix, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return partials.groupby("query_id").map_groups(
        lambda df: _merge_topk(df, k), batch_format="pandas"
    )


def ivf_topk(emb_ds, query_ids, query_matrix, *, k: int = TOP_K, nprobe: int = 4):
    """IVF: restrict each query to its ``nprobe`` nearest label-cell
    centroids, then run the same partial-top-k merge over probed cells."""

    # Coarse quantizer: one tiny aggregation (cell centroids), broadcast.
    def _centroid(df: pd.DataFrame) -> pd.DataFrame:
        E = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {"label": [df["label"].iloc[0]], "centroid": [E.mean(axis=0)]}
        )

    cent = emb_ds.groupby("label").map_groups(_centroid, batch_format="pandas")
    cent_df = cent.to_pandas()  # tiny: one row per cell
    labels = cent_df["label"].to_numpy()
    C = np.stack(cent_df["centroid"].to_numpy())
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    probe_order = np.argsort(-(query_matrix @ Cn.T), axis=1)[:, :nprobe]
    probed_labels = {int(labels[c]) for row in probe_order for c in row}

    # Per-query probe sets, broadcast into the stage alongside the queries.
    query_probes = {
        int(qid): {int(labels[c]) for c in probe_order[qi]}
        for qi, qid in enumerate(query_ids)
    }

    class _IvfPartial(PartialTopKStage):
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
            labs = np.asarray(batch.column("label").to_pylist(), dtype=np.int64)
            En = _normalize(batch.column("embedding").to_pylist())
            S = self.Q @ En.T
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(self.query_ids):
                cell_mask = np.isin(labs, list(query_probes[int(qid)]))
                mask = cell_mask & (ids != qid)
                cand_ids = ids[mask]
                cand_sims = S[qi][mask]
                k2 = min(self.k, len(cand_ids))
                if k2 == 0:
                    continue
                top = np.lexsort((cand_ids, -cand_sims))[:k2]
                out_q.extend([qid] * k2)
                out_n.extend(cand_ids[top])
                out_s.extend(cand_sims[top])
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "neighbor_id": pa.array(out_n, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    # Prune whole non-probed cells before scoring (vectorized is_in filter).
    import pyarrow.compute as pc

    probe_arr = pa.array(sorted(probed_labels))

    def _prune(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_in(batch.column("label").cast(pa.int64()), value_set=probe_arr)
        )

    pruned = emb_ds.map_batches(_prune, batch_format="pyarrow", zero_copy_batch=True)
    partials = pruned.map_batches(
        _IvfPartial(query_ids, query_matrix, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return partials.groupby("query_id").map_groups(
        lambda df: _merge_topk(df, k), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Driver-visible queries + oracles
# ---------------------------------------------------------------------------

def _q_brute(sf_dir: str):
    qids, Q = _load_query_matrix(sf_dir, N_QUERIES)
    return brute_force_topk(_read_embeddings(sf_dir), qids, Q)


def _q_ivf(sf_dir: str):
    qids, Q = _load_query_matrix(sf_dir, N_QUERIES)
    return ivf_topk(_read_embeddings(sf_dir), qids, Q)


register(
    "ann_cosine_topk",
    _q_brute,
    f"""
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])), 6) AS cosine
    FROM embeddings q
    JOIN embeddings e ON e.vec_id <> q.vec_id
    WHERE q.vec_id < {N_QUERIES}
    QUALIFY row_number() OVER (
        PARTITION BY q.vec_id
        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])) DESC,
                 e.vec_id
    ) <= {TOP_K}
    """,
)

register("ann_cosine_topk_ivf", _q_ivf)  # approximate -> rows-only check


# ---------------------------------------------------------------------------
# K-means-trained IVF (the 100 TB scale path: no label column needed)
# ---------------------------------------------------------------------------

def kmeans_fit(emb_ds, *, n_clusters: int, n_iters: int = 5, seed: int = 7,
               init_sample: int = 4096) -> np.ndarray:
    """Distributed spherical k-means (Lloyd) over the embedding column.

    Each iteration is ONE streaming pass: every batch assigns its vectors
    to the nearest current centroid (one matmul) and emits k partial
    ``(sum_vector, count)`` rows — the combiner pattern — which the driver
    merges into new centroids (k x d floats, tiny).  No shuffle at any
    point; centroids are broadcast by value each pass.  Deterministic:
    seeded init from an id-strided sample, fixed iteration count.
    """
    # Lloyd consumes the dataset n_iters+2 times; a lazy input would
    # re-execute the upstream read (and any transforms) on EVERY pass, so
    # pin the projected embeddings in the object store once.
    emb_ds = emb_ds.materialize()
    # Init: deterministic strided sample of the corpus (cheap filter), then
    # seeded choice of k starting centroids.
    n_total = emb_ds.count()
    stride = max(1, n_total // init_sample)

    def _sample(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").cast(pa.int64()).to_numpy()
        return batch.filter(pa.array(ids % stride == 0))

    # Sort by vec_id: block ARRIVAL order varies run to run, and the
    # seeded index pick below must land on the same vectors every time
    # (observed: unsorted samples made two same-seed fits diverge).
    sample = emb_ds.map_batches(_sample, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    S = _normalize(sample["embedding"].to_numpy())
    rng = np.random.default_rng(seed)
    pick = rng.choice(len(S), size=min(n_clusters, len(S)), replace=False)
    C = S[np.sort(pick)].copy()  # (k, d), normalized

    for _ in range(n_iters):
        Cn = C  # already normalized each round

        def _partial(batch: pa.Table, Cn=Cn) -> pa.Table:
            E = _normalize(batch.column("embedding").to_pylist())
            assign = np.argmax(E @ Cn.T, axis=1)
            k, d = Cn.shape
            sums = np.zeros((k, d))
            np.add.at(sums, assign, E)
            counts = np.bincount(assign, minlength=k).astype(np.int64)
            ids = batch.column("vec_id").cast(pa.int64()).to_numpy()
            block_key = int(ids.min()) if len(ids) else -1
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k), pa.int64()),
                    "vec_sum": pa.array(list(sums)),
                    "count": pa.array(counts, pa.int64()),
                    "block_key": pa.array([block_key] * k, pa.int64()),
                }
            )

        # Sort partials by (block, cluster) before folding: float += is
        # order-sensitive, and partial ARRIVAL order is nondeterministic.
        parts = emb_ds.map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas().sort_values(["block_key", "cluster"])  # k rows/batch
        k, d = C.shape
        sums = np.zeros((k, d))
        counts = np.zeros(k, dtype=np.int64)
        for _, row in parts.iterrows():
            sums[row["cluster"]] += np.asarray(row["vec_sum"])
            counts[row["cluster"]] += row["count"]
        nonempty = counts > 0
        C[nonempty] = sums[nonempty] / counts[nonempty, None]
        norms = np.linalg.norm(C, axis=1, keepdims=True)
        C = C / np.where(norms == 0, 1.0, norms)
    return C


def ivf_kmeans_topk(emb_ds, query_ids, query_matrix, *, k: int = TOP_K,
                    n_clusters: int = 16, nprobe: int = 4, n_iters: int = 5):
    """IVF with a k-means-trained coarse quantizer: assign + prune + score
    in a single ``map_batches`` pass against broadcast centroids.  Unlike
    ``ivf_topk`` this needs no pre-existing ``label`` cells, so it is the
    quantizer a 100 TB corpus would actually train."""
    # Materialize once here: kmeans consumes it n_iters+2 times and the
    # scoring pass below once more — all against the same pinned blocks.
    emb_ds = emb_ds.materialize()
    C = kmeans_fit(emb_ds, n_clusters=n_clusters, n_iters=n_iters)
    # Per-query probe sets over the trained centroids.
    probe_order = np.argsort(-(query_matrix @ C.T), axis=1)[:, :nprobe]
    probe_sets = {
        int(qid): set(map(int, probe_order[qi]))
        for qi, qid in enumerate(query_ids)
    }

    class _Stage(PartialTopKStage):
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
            En = _normalize(batch.column("embedding").to_pylist())
            assign = np.argmax(En @ C.T, axis=1)
            S = self.Q @ En.T
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(self.query_ids):
                cell_mask = np.isin(assign, list(probe_sets[int(qid)]))
                mask = cell_mask & (ids != qid)
                cand_ids = ids[mask]
                cand_sims = S[qi][mask]
                k2 = min(self.k, len(cand_ids))
                if k2 == 0:
                    continue
                top = np.lexsort((cand_ids, -cand_sims))[:k2]
                out_q.extend([qid] * k2)
                out_n.extend(cand_ids[top])
                out_s.extend(cand_sims[top])
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "neighbor_id": pa.array(out_n, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    partials = emb_ds.map_batches(
        _Stage(query_ids, query_matrix, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return partials.groupby("query_id").map_groups(
        lambda df: _merge_topk(df, k), batch_format="pandas"
    )


def _q_ivf_kmeans(sf_dir: str):
    qids, Q = _load_query_matrix(sf_dir, N_QUERIES)
    return ivf_kmeans_topk(_read_embeddings(sf_dir), qids, Q)


register("ann_cosine_topk_ivf_kmeans", _q_ivf_kmeans)  # approximate -> rows-only


# ---------------------------------------------------------------------------
# Random-hyperplane LSH ANN (the third scale path: data-independent,
# no training pass, index = one int per (vector, table))
# ---------------------------------------------------------------------------

def _lsh_planes(d: int, n_tables: int, n_bits: int, seed: int):
    """Seeded hyperplane tensor (n_tables, n_bits, d) — identical in every
    worker because it derives from the seed, never from worker state."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, d))


def _lsh_buckets(En: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, d) -> (n_tables, n) packed sign-bit bucket ids."""
    weights = (1 << np.arange(planes.shape[1], dtype=np.int64))
    # (t, bits, d) @ (d, n) -> (t, bits, n); sign bits packed along axis 1
    proj = planes @ En.T
    return np.tensordot(weights, proj > 0, axes=([0], [1])).astype(np.int64)


def lsh_topk(emb_ds, query_ids, query_matrix, *, k: int = TOP_K,
             n_tables: int = 12, n_bits: int = 10, seed: int = 97):
    """ANN via random-hyperplane LSH: a vector is a candidate for a query
    iff they share a bucket in >= 1 of ``n_tables`` sign-hash tables.

    Scale shape: the planes and the per-table query buckets are tiny,
    seeded/broadcast state; each batch computes its own bucket matrix with
    three matmuls and scores ONLY colliding rows — no training pass, no
    shuffle beyond the standard per-query top-k merge.  At 100 TB the
    bucket matrix can also be precomputed once as an index column and the
    candidate filter pushed to the read.  Approximate by construction —
    recall vs brute force is pinned in pytest; the driver runs rows-only.
    """
    d = query_matrix.shape[1]
    planes = _lsh_planes(d, n_tables, n_bits, seed)
    qb = _lsh_buckets(query_matrix, planes)  # (t, q)

    class _LshPartial(PartialTopKStage):
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
            En = _normalize(batch.column("embedding").to_pylist())
            vb = _lsh_buckets(En, planes)  # (t, n)
            # collide[qi, j] = any table where buckets match
            collide = (vb[:, None, :] == qb[:, :, None]).any(axis=0)
            S = self.Q @ En.T
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(self.query_ids):
                mask = collide[qi] & (ids != qid)
                cand_ids = ids[mask]
                cand_sims = S[qi][mask]
                k2 = min(self.k, len(cand_ids))
                if k2 == 0:
                    continue
                top = np.lexsort((cand_ids, -cand_sims))[:k2]
                out_q.extend([qid] * k2)
                out_n.extend(cand_ids[top])
                out_s.extend(cand_sims[top])
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "neighbor_id": pa.array(out_n, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    partials = emb_ds.map_batches(
        _LshPartial(query_ids, query_matrix, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return partials.groupby("query_id").map_groups(
        lambda df: _merge_topk(df, k), batch_format="pandas"
    )


def _q_lsh(sf_dir: str):
    qids, Q = _load_query_matrix(sf_dir, N_QUERIES)
    return lsh_topk(_read_embeddings(sf_dir), qids, Q)


register("ann_cosine_topk_lsh", _q_lsh)  # approximate -> rows-only


# ---------------------------------------------------------------------------
# Per-label embedding centroids (exact vector aggregation, SQL-checkable)
# ---------------------------------------------------------------------------

def label_centroids(emb_ds):
    """Mean embedding per label, emitted long-form (label, dim, n,
    centroid) so the result is relational and exactly oracle-checkable.

    Shape: each batch collapses to one (label, dim) partial-sum row set
    via a single per-label matrix reduction (labels x d rows per batch,
    never vectors), then ONE small groupby sums partials; the mean is
    computed from 6-dp-rounded sums on both engines (repo parity rule).
    """

    def _partial(batch: pa.Table) -> pa.Table:
        labs = np.asarray(batch.column("label").to_pylist(), dtype=np.int64)
        E = np.stack(batch.column("embedding").to_pylist()).astype(np.float64)
        uniq, inv = np.unique(labs, return_inverse=True)
        d = E.shape[1]
        sums = np.zeros((len(uniq), d))
        np.add.at(sums, inv, E)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(uniq)),
                            pa.int64()),
            "s": pa.array(sums.ravel(), pa.float64()),
            "n": pa.array(np.repeat(counts, d), pa.int64()),
        })

    agg = (
        emb_ds.map_batches(_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby(["label", "dim"])
        .sum(["s", "n"])
    )

    def _final(batch: pa.Table) -> pa.Table:
        s6 = round_half_away(
            batch.column("sum(s)").to_numpy(zero_copy_only=False), 6
        )
        n = batch.column("sum(n)").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "label": batch.column("label").cast(pa.int64()),
            "dim": batch.column("dim"),
            "n": pa.array(n, pa.int64()),
            "centroid": pa.array(round_half_away(s6 / n, 6), pa.float64()),
        })

    return agg.map_batches(_final, batch_format="pyarrow",
                           zero_copy_batch=True)


register(
    "embedding_label_centroids",
    lambda sf: label_centroids(_read_embeddings(sf)),
    """
    SELECT CAST(emb.label AS BIGINT) AS label, t.i AS dim,
           CAST(count(*) AS BIGINT) AS n,
           round(round(sum(CAST(emb.embedding[t.i + 1] AS DOUBLE)), 6)
                 / count(*), 6) AS centroid
    FROM embeddings AS emb,
         LATERAL (SELECT unnest(range(len(emb.embedding))) AS i) AS t
    GROUP BY 1, 2
    """,
)


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive-training data prep)
# ---------------------------------------------------------------------------

class PartialHardNegStage:
    """One corpus batch -> per-query partial top-k rows over vectors whose
    label DIFFERS from the query's (hard negatives: the most similar
    wrong-class examples, the standard contrastive-pair mining rule).

    Same shuffle bound as ``PartialTopKStage``: the exchange carries
    O(batches x queries x k) rows, never the corpus."""

    def __init__(self, query_ids: np.ndarray, query_labels: np.ndarray,
                 query_matrix: np.ndarray, k: int):
        self.query_ids = query_ids
        self.query_labels = query_labels
        self.Q = query_matrix  # (q, d), already normalized
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        labels = np.asarray(batch.column("label").to_pylist(), dtype=np.int64)
        En = _normalize(batch.column("embedding").to_pylist())
        S = self.Q @ En.T  # (q, n)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(self.query_ids):
            mask = labels != self.query_labels[qi]
            cand_ids = ids[mask]
            cand_sims = S[qi][mask]
            k = min(self.k, len(cand_ids))
            if k == 0:
                continue
            top = np.lexsort((cand_ids, -cand_sims))[:k]
            out_q.extend([qid] * k)
            out_n.extend(cand_ids[top])
            out_s.extend(cand_sims[top])
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })


def hard_negative_topk(emb_ds, query_ids, query_labels, query_matrix,
                       *, k: int = TOP_K):
    """Per query vector: the k most-cosine-similar vectors with a
    DIFFERENT label — (query_id, neighbor_id, cosine) rows."""
    partials = emb_ds.map_batches(
        PartialHardNegStage(query_ids, query_labels, query_matrix, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return partials.groupby("query_id").map_groups(
        lambda df: _merge_topk(df, k), batch_format="pandas"
    )


def _q_hard_negatives(sf_dir: str):
    qids, qlabels, Q = _load_query_matrix(sf_dir, N_QUERIES,
                                          with_labels=True)
    return hard_negative_topk(_read_embeddings(sf_dir), qids, qlabels, Q)


register(
    "embedding_hard_negatives",
    _q_hard_negatives,
    f"""
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])), 6) AS cosine
    FROM embeddings q
    JOIN embeddings e ON e.label <> q.label
    WHERE q.vec_id < {N_QUERIES}
    QUALIFY row_number() OVER (
        PARTITION BY q.vec_id
        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])) DESC,
                 e.vec_id
    ) <= {TOP_K}
    """,
)


# ---------------------------------------------------------------------------
# kNN label-vote classification (embedding-quality probe)
# ---------------------------------------------------------------------------

#: vec_id < KNN_TEST_N are held-out test queries; the rest are the train set.
KNN_TEST_N = 64
KNN_K = 5


class PartialKnnStage(PartialTopKStage):
    """One corpus batch -> per-query partial top-k rows over TRAIN vectors
    only (``vec_id >= min_train_id``), carrying each neighbor's label so
    the merge step can vote.  Same shuffle bound as ``PartialTopKStage``:
    O(batches x queries x k) rows, never the corpus."""

    def __init__(self, query_ids, query_matrix, k: int, min_train_id: int):
        super().__init__(query_ids, query_matrix, k)
        self.min_train_id = min_train_id

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        labels = np.asarray(batch.column("label").to_pylist(), dtype=np.int64)
        En = _normalize(batch.column("embedding").to_pylist())
        train = ids >= self.min_train_id
        ids, labels, En = ids[train], labels[train], En[train]
        if len(ids) == 0:
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "nlabel": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            })
        S = self.Q @ En.T
        out_q, out_n, out_l, out_s = [], [], [], []
        for qi, qid in enumerate(self.query_ids):
            k = min(self.k, len(ids))
            top = np.lexsort((ids, -S[qi]))[:k]
            out_q.extend([qid] * k)
            out_n.extend(ids[top])
            out_l.extend(labels[top])
            out_s.extend(S[qi][top])
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "nlabel": pa.array(out_l, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })


def knn_label_vote(emb_ds, query_ids, query_labels, query_matrix,
                   *, k: int = KNN_K, min_train_id: int = KNN_TEST_N):
    """Classify each held-out query by majority label among its k nearest
    train vectors (cosine) — the standard embedding-quality probe.  Ties:
    top-k boundary by (sim desc, vec_id asc); vote by (count desc, label
    asc).  Returns one row per query: predicted vs true label."""
    true_label = {int(q): int(l) for q, l in zip(query_ids, query_labels)}

    def _vote(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "neighbor_id"],
                            ascending=[False, True]).head(k)
        counts = df["nlabel"].value_counts()
        n_votes = int(counts.max())
        pred = int(counts[counts == n_votes].index.min())
        qid = int(df["query_id"].iloc[0])
        tl = true_label[qid]
        return pd.DataFrame({
            "query_id": np.array([qid], np.int64),
            "true_label": np.array([tl], np.int64),
            "pred_label": np.array([pred], np.int64),
            "n_votes": np.array([n_votes], np.int64),
            "correct": np.array([pred == tl], bool),
        })

    partials = emb_ds.map_batches(
        PartialKnnStage(query_ids, query_matrix, k, min_train_id),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return partials.groupby("query_id").map_groups(
        _vote, batch_format="pandas")


def _q_knn_vote(sf_dir: str):
    qids, qlabels, Q = _load_query_matrix(sf_dir, KNN_TEST_N,
                                          with_labels=True)
    return knn_label_vote(_read_embeddings(sf_dir), qids, qlabels, Q)


register(
    "knn_label_vote",
    _q_knn_vote,
    f"""
    WITH knn AS (
        SELECT q.vec_id AS query_id, q.label AS true_label,
               e.label AS nlabel
        FROM embeddings q
        JOIN embeddings e ON e.vec_id >= {KNN_TEST_N}
        WHERE q.vec_id < {KNN_TEST_N}
        QUALIFY row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(
                CAST(q.embedding AS DOUBLE[]),
                CAST(e.embedding AS DOUBLE[])) DESC,
                e.vec_id
        ) <= {KNN_K}
    ),
    votes AS (
        SELECT query_id, true_label, nlabel, count(*) AS n_votes
        FROM knn GROUP BY 1, 2, 3
    )
    SELECT query_id,
           CAST(true_label AS BIGINT) AS true_label,
           CAST(nlabel AS BIGINT) AS pred_label,
           CAST(n_votes AS BIGINT) AS n_votes,
           nlabel = true_label AS correct
    FROM votes
    QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY n_votes DESC, nlabel
    ) = 1
    """,
)


# ---------------------------------------------------------------------------
# MMR diversified retrieval (greedy rerank of the brute-force candidates)
# ---------------------------------------------------------------------------

MMR_CANDIDATES = 25
MMR_K = 5
MMR_LAMBDA = 0.7


def mmr_rerank(emb_ds, query_ids, query_matrix, *, k_candidates: int =
               MMR_CANDIDATES, k: int = MMR_K, lam: float = MMR_LAMBDA):
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998): per
    query, greedily pick ``k`` of the top-``k_candidates`` cosine
    neighbours maximizing ``lam * sim(q, d) - (1 - lam) * max sim(d,
    picked)`` — relevance minus redundancy, the standard diversification
    rerank for retrieval-augmented pipelines.

    Scale shape: stage 1 is the existing distributed partial-top-k merge
    (shuffle carries O(batches x queries x k_candidates) rows); stage 2
    fetches just the candidate VECTORS with one vectorized ``is_in``
    filtered scan (candidates ≪ corpus, collected driver-side under
    that bound) and runs the greedy loop over a (queries x candidates)
    matrix — the loop is k x k_candidates tiny numpy steps, never
    distributed work.  The greedy selection is iterative and therefore
    has no SQL twin (rows-only driver check); determinism — ties by
    smallest vec_id — and the diversification property are pytest-pinned.
    """
    import pyarrow.compute as pc

    cands = brute_force_topk(emb_ds, query_ids, query_matrix,
                             k=k_candidates).to_pandas()
    cand_ids = np.unique(cands["neighbor_id"].to_numpy(np.int64))
    id_set = pa.array(cand_ids.tolist(), pa.int64())

    def _fetch(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch.column("vec_id").cast(pa.int64()),
                     value_set=id_set)
        t = batch.filter(m)
        return pa.table({"vec_id": t.column("vec_id").cast(pa.int64()),
                         "embedding": t.column("embedding")})

    fetched = emb_ds.map_batches(_fetch, batch_format="pyarrow",
                                 zero_copy_batch=True).to_pandas()
    vec_of = {int(i): np.asarray(v, np.float64)
              for i, v in zip(fetched["vec_id"], fetched["embedding"])}

    out_q, out_n, out_rank, out_score = [], [], [], []
    for qi, qid in enumerate(query_ids):
        rows = cands[cands["query_id"] == int(qid)]
        ids = rows["neighbor_id"].to_numpy(np.int64)
        rel = rows["cosine"].to_numpy(np.float64)
        if len(ids) == 0:
            continue
        V = np.stack([vec_of[int(i)] for i in ids])
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        Vn = V / np.where(norms == 0, 1.0, norms)
        S = Vn @ Vn.T  # candidate-candidate cosine
        picked: list[int] = []
        avail = np.ones(len(ids), dtype=bool)
        for rank in range(min(k, len(ids))):
            if picked:
                red = S[:, picked].max(axis=1)
            else:
                red = np.zeros(len(ids))
            score = lam * rel - (1.0 - lam) * red
            score[~avail] = -np.inf
            # deterministic: best score, ties by smallest neighbor id
            best = np.lexsort((ids, -score))[0]
            picked.append(best)
            avail[best] = False
            out_q.append(int(qid))
            out_n.append(int(ids[best]))
            out_rank.append(rank)
            out_score.append(float(score[best]))
    import ray

    return ray.data.from_arrow(pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        "neighbor_id": pa.array(out_n, pa.int64()),
        "mmr_rank": pa.array(out_rank, pa.int64()),
        "mmr_score": pa.array(
            [round(s, 6) for s in out_score], pa.float64()),
    }))


def _q_mmr(sf_dir: str):
    qids, Q = _load_query_matrix(sf_dir, N_QUERIES)
    return mmr_rerank(_read_embeddings(sf_dir), qids, Q)


# rows-only: the greedy argmax loop is iterative (each pick depends on
# all earlier picks) — not expressible as SQL over the same tables.
# Determinism + the diversification property are pinned in pytest.
register("ann_mmr_rerank", _q_mmr)


# ---------------------------------------------------------------------------
# Distributed PCA: top principal component by power iteration
# ---------------------------------------------------------------------------

def pca_top_component(emb_ds, *, n_components: int = 1):
    """Top principal component(s) of the embedding cloud via
    single-pass distributed covariance accumulation: every batch
    collapses to one (d x d Gram partial, d-float sum, count) row, the
    driver merges #blocks partials and eigendecomposes the d x d
    covariance locally.  ONE streaming scan total; nothing but d^2 + d
    floats per block ever moves.

    This is the textbook distributed-PCA shape for moderate d (d^2
    partials fit comfortably per block up to d ~ a few thousand; 64
    here -> 4 KB); for huge d one would switch to iterative
    subspace methods, which this corpus's near-degenerate synthetic
    spectrum punishes (power iteration needed hundreds of scans to
    separate lambda_1 from lambda_2 — measured before this design).

    Deterministic: exact closed-form eigh, sign fixed so each
    component's largest-|loading| coordinate is positive.  Output is
    one row per (component, dim): ``(component, dim, loading,
    eigval)``; eigenvectors have no SQL twin, so the query is
    rows-only and numpy parity is pinned in pytest.
    """

    def _partials(batch: pa.Table) -> pa.Table:
        E = np.stack(batch.column("embedding").to_pylist()) \
            .astype(np.float64)
        return pa.table({
            "gram": pa.array([(E.T @ E).ravel().tolist()],
                             pa.list_(pa.float64())),
            "s": pa.array([E.sum(axis=0).tolist()],
                          pa.list_(pa.float64())),
            "n": pa.array([E.shape[0]], pa.int64()),
        })

    parts = emb_ds.map_batches(_partials, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    n = int(parts["n"].sum())
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    gram = np.sum(np.stack(parts["gram"].to_numpy()), axis=0)
    d = s.shape[0]
    mu = s / n
    cov = (gram.reshape(d, d) - n * np.outer(mu, mu)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    comps, lams = [], []
    for c in range(n_components):
        v = evecs[:, -1 - c]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        comps.append(v)
        lams.append(float(evals[-1 - c]))
    import ray

    return ray.data.from_arrow(pa.table({
        "component": pa.array(np.repeat(np.arange(n_components), d),
                              pa.int64()),
        "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                n_components), pa.int64()),
        "loading": pa.array(round_half_away(
            np.concatenate(comps), 6), pa.float64()),
        "eigval": pa.array(np.repeat(round_half_away(
            np.array(lams), 6), d), pa.float64()),
    }))


def _q_pca(sf_dir: str):
    return pca_top_component(_read_embeddings(sf_dir))


# rows-only: an eigenvector has no SQL twin; numpy-eigh alignment,
# determinism and the no-reread shape are pinned in pytest.
register("embedding_pca_top", _q_pca)


# ---------------------------------------------------------------------------
# Int8 embedding quantization + reconstruction-error report
# ---------------------------------------------------------------------------

def quantization_error_report(emb_ds_fn):
    """Per-vector reconstruction error of global-per-dim uint8 (256
    level) embedding quantization — the standard 4x vector-store
    compression; the report tells you whether the ANN recall budget
    survives it.

    Scale shape: pass 1 reduces every batch to ONE (d mins, d maxs)
    partial row merged driver-side (d floats, never vectors); pass 2
    re-scans with the 2d-float scale table in the task closure and
    emits one row per vector — two streaming scans, zero shuffles
    (``emb_ds_fn`` is a zero-arg factory, the winsorize two-pass
    convention).  Quantize/dequantize arithmetic is the identical
    IEEE expression tree as the oracle (float64 throughout,
    ``floor(x + 0.5)`` grid); round-6 on the two error aggregates.
    """
    from ._util import round_half_away

    def _minmax(batch: pa.Table) -> pa.Table:
        E = np.stack(batch.column("embedding").to_pylist()) \
            .astype(np.float64)
        return pa.table({
            "lo": pa.array([E.min(axis=0).tolist()],
                           pa.list_(pa.float64())),
            "hi": pa.array([E.max(axis=0).tolist()],
                           pa.list_(pa.float64())),
        })

    mm = emb_ds_fn().map_batches(_minmax, batch_format="pyarrow",
                                 zero_copy_batch=True).to_pandas()
    lo = np.min(np.stack(mm["lo"].to_numpy()), axis=0)
    hi = np.max(np.stack(mm["hi"].to_numpy()), axis=0)
    scale = np.where(hi > lo, (hi - lo) / 255.0, 1.0)

    def _errors(batch: pa.Table) -> pa.Table:
        E = np.stack(batch.column("embedding").to_pylist()) \
            .astype(np.float64)
        q = np.floor((E - lo) / scale + 0.5)
        err = (q * scale + lo) - E
        return pa.table({
            "vec_id": batch.column("vec_id").cast(pa.int64()),
            "mse": pa.array(round_half_away(
                (err * err).sum(axis=1) / E.shape[1], 6), pa.float64()),
            "max_abs_err": pa.array(round_half_away(
                np.abs(err).max(axis=1), 6), pa.float64()),
        })

    return emb_ds_fn().map_batches(_errors, batch_format="pyarrow",
                                   zero_copy_batch=True)


register(
    "embedding_quant_error",
    lambda sf: quantization_error_report(lambda: _read_embeddings(sf)),
    """
    WITH e AS (
        SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
               unnest(generate_series(1, len(embedding))) AS d
        FROM embeddings
    ),
    mm AS (
        SELECT d, min(x) AS lo, max(x) AS hi,
               CASE WHEN max(x) > min(x)
                    THEN (max(x) - min(x)) / 255.0 ELSE 1.0 END AS s
        FROM e GROUP BY d
    ),
    r AS (
        SELECT e.vec_id,
               (floor((e.x - mm.lo) / mm.s + 0.5) * mm.s + mm.lo) - e.x
                   AS err
        FROM e JOIN mm USING (d)
    )
    SELECT vec_id,
           round(sum(err * err) / count(*), 6) AS mse,
           round(max(abs(err)), 6) AS max_abs_err
    FROM r
    GROUP BY vec_id
    """,
)


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN: codebooks -> uint8 codes -> ADC top-k
# ---------------------------------------------------------------------------

PQ_M = 16         # subspaces (d=64 -> 4 dims each; 16 B/vec)
PQ_K = 16         # centroids per subspace -> one uint8 code per subspace


def pq_train(emb_ds, *, m: int = PQ_M, k: int = PQ_K, n_iters: int = 5,
             seed: int = 7, init_sample: int = 4096) -> np.ndarray:
    """Train ``m`` per-subspace codebooks (each ``k x d/m``) with Lloyd
    iterations over L2-normalized vectors — product quantization
    (Jegou et al., TPAMI'11), the memory-compression scale path that
    IVF alone lacks: 64 float32 dims (256 B) become ``m`` uint8 codes
    (8 B), a 32x shrink of the searchable index.

    One streaming pass per iteration handles ALL subspaces at once:
    each batch emits (subspace, cluster, sub_sum, count) partials —
    m x k tiny rows — and the driver folds them into new codebooks.
    Same discipline as :func:`kmeans_fit`: input materialized once,
    seeded strided-sample init, fixed iteration count, no shuffle.
    """
    emb_ds = emb_ds.materialize()
    n_total = emb_ds.count()
    stride = max(1, n_total // init_sample)

    def _sample(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").cast(pa.int64()).to_numpy()
        return batch.filter(pa.array(ids % stride == 0))

    # Sorted for the same run-to-run determinism reason as kmeans_fit.
    sample = emb_ds.map_batches(_sample, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    S = _normalize(sample["embedding"].to_numpy())
    d = S.shape[1]
    if d % m:
        raise ValueError(f"embedding dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.default_rng(seed)
    C = np.empty((m, k, sub))
    for j in range(m):
        pick = rng.choice(len(S), size=min(k, len(S)), replace=False)
        C[j] = S[np.sort(pick), j * sub:(j + 1) * sub]

    for _ in range(n_iters):
        Cj = C.copy()

        def _partial(batch: pa.Table, Cj=Cj) -> pa.Table:
            E = _normalize(batch.column("embedding").to_pylist())
            rows_s, rows_c, sums, counts = [], [], [], []
            for j in range(m):
                X = E[:, j * sub:(j + 1) * sub]
                # L2 assign: argmin |x - c|^2 = argmax (c.x - |c|^2/2)
                logits = X @ Cj[j].T - 0.5 * (Cj[j] ** 2).sum(1)
                assign = np.argmax(logits, axis=1)
                s = np.zeros((k, sub))
                np.add.at(s, assign, X)
                rows_s.extend([j] * k)
                rows_c.extend(range(k))
                sums.extend(list(s))
                counts.extend(np.bincount(assign, minlength=k)
                              .astype(np.int64))
            ids = batch.column("vec_id").cast(pa.int64()).to_numpy()
            block_key = int(ids.min()) if len(ids) else -1
            return pa.table({
                "subspace": pa.array(rows_s, pa.int64()),
                "cluster": pa.array(rows_c, pa.int64()),
                "sub_sum": pa.array(sums),
                "count": pa.array(counts, pa.int64()),
                "block_key": pa.array([block_key] * len(rows_s),
                                      pa.int64()),
            })

        # Order-stable fold (see kmeans_fit): sort partials first.
        parts = emb_ds.map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas().sort_values(["block_key", "subspace", "cluster"])
        sums = np.zeros((m, k, sub))
        counts = np.zeros((m, k), np.int64)
        for _, row in parts.iterrows():
            sums[row["subspace"], row["cluster"]] += \
                np.asarray(row["sub_sum"])
            counts[row["subspace"], row["cluster"]] += row["count"]
        nonempty = counts > 0
        C[nonempty] = sums[nonempty] / counts[nonempty][:, None]
    return C


def pq_encode(emb_ds, codebooks: np.ndarray):
    """Corpus -> (vec_id, codes) with ``codes`` = m uint8 bytes per
    vector (binary column).  The encoded index is what a 100 TB
    deployment would persist and search: 32x smaller than the float
    vectors, so far more of it fits in worker memory per node."""
    import ray

    m, k, sub = codebooks.shape
    cb_ref = ray.put(codebooks)

    def _encode(batch: pa.Table) -> pa.Table:
        C = ray.get(cb_ref)
        E = _normalize(batch.column("embedding").to_pylist())
        codes = np.empty((len(E), m), np.uint8)
        for j in range(m):
            X = E[:, j * sub:(j + 1) * sub]
            logits = X @ C[j].T - 0.5 * (C[j] ** 2).sum(1)
            codes[:, j] = np.argmax(logits, axis=1).astype(np.uint8)
        return pa.table({
            "vec_id": batch.column("vec_id").cast(pa.int64()),
            "codes": pa.array([c.tobytes() for c in codes], pa.binary()),
        })

    return emb_ds.map_batches(_encode, batch_format="pyarrow",
                              zero_copy_batch=True)


def pq_topk(codes_ds, codebooks: np.ndarray, query_ids, query_matrix,
            *, k: int = TOP_K):
    """ADC (asymmetric distance computation) top-k over the ENCODED
    corpus: per query, an m x K lookup table of subspace dot products
    against the real (un-quantized) query; a code row's score is the
    sum of its m table entries — one vectorized gather per subspace,
    the float vectors never read.  Partial top-k per block + the usual
    tiny per-query merge."""
    m, K, sub = codebooks.shape
    Q = np.asarray(query_matrix, np.float64)
    # LUT[q, j, code] = dot(query subvector j, centroid code of subspace j)
    lut = np.stack([Q[:, j * sub:(j + 1) * sub] @ codebooks[j].T
                    for j in range(m)], axis=1)  # (q, m, K)

    def _partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        blobs = batch.column("codes").to_pylist()
        codes = np.frombuffer(b"".join(blobs), np.uint8) \
            .reshape(len(blobs), m)
        # scores (q, n): sum of per-subspace LUT gathers
        S = np.zeros((len(Q), len(ids)))
        for j in range(m):
            S += lut[:, j, codes[:, j]]
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(query_ids):
            mask = ids != qid
            cand_ids, cand = ids[mask], S[qi][mask]
            kk = min(k, len(cand_ids))
            if kk == 0:
                continue
            top = np.lexsort((cand_ids, -cand))[:kk]
            out_q.extend([qid] * kk)
            out_n.extend(cand_ids[top])
            out_s.extend(cand[top])
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    partials = codes_ds.map_batches(_partial, batch_format="pyarrow",
                                    zero_copy_batch=True)
    return partials.groupby("query_id").map_groups(
        lambda df: _merge_topk(df, k), batch_format="pandas"
    )


PQ_SHORTLIST = 50


def pq_topk_rerank(codes_ds, emb_ds, codebooks: np.ndarray, query_ids,
                   query_matrix, *, k: int = TOP_K,
                   shortlist: int = PQ_SHORTLIST):
    """Production PQ search shape: the ADC pass over the 16 B/vec codes
    produces a per-query SHORTLIST (top ``shortlist`` by approximate
    score, collected driver-side — q x shortlist rows, tiny), then ONE
    filtered pass over the float corpus re-ranks only shortlisted
    vectors with exact cosine.  Quantization error then only costs
    recall when a true neighbor misses the whole shortlist (~2-5%% at
    m=16, R=50 on the fixture; pinned in pytest) — the exact/compact
    trade every deployed PQ system makes."""
    import ray

    sl = pq_topk(codes_ds, codebooks, query_ids, query_matrix,
                 k=shortlist).to_pandas()
    per_query = {int(q): set(map(int, g["neighbor_id"]))
                 for q, g in sl.groupby("query_id")}
    union_ids = sorted(set().union(*per_query.values()))         if per_query else []
    sets_ref = ray.put((per_query, np.array(union_ids, np.int64)))
    Q = np.asarray(query_matrix, np.float64)

    def _exact(batch: pa.Table) -> pa.Table:
        per_q, union = ray.get(sets_ref)
        ids = np.asarray(batch.column("vec_id").to_pylist(), np.int64)
        pos = np.searchsorted(union, ids)
        pos_c = np.minimum(pos, max(len(union) - 1, 0))
        hit = (len(union) > 0) & (union[pos_c] == ids)
        if not hit.any():
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            })
        sub = batch.filter(pa.array(hit))
        sids = np.asarray(sub.column("vec_id").to_pylist(), np.int64)
        En = _normalize(sub.column("embedding").to_pylist())
        S = Q @ En.T
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(query_ids):
            allowed = per_q.get(int(qid), set())
            mask = np.array([int(i) in allowed for i in sids])
            if not mask.any():
                continue
            out_q.extend([qid] * int(mask.sum()))
            out_n.extend(sids[mask])
            out_s.extend(S[qi][mask])
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    partials = emb_ds.map_batches(_exact, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return partials.groupby("query_id").map_groups(
        lambda df: _merge_topk(df, k), batch_format="pandas"
    )


def _q_ann_pq(sf_dir: str):
    emb = _read_embeddings(sf_dir)
    qids, Q = _load_query_matrix(sf_dir, N_QUERIES)
    codebooks = pq_train(emb)
    codes = pq_encode(emb, codebooks).materialize()
    return pq_topk_rerank(codes, emb, codebooks, qids, Q)


# approximate by construction -> rows-only; approximation quality and
# determinism pinned in tests/test_training_ops.py::TestPQ
register("ann_cosine_topk_pq", _q_ann_pq)


# ---------------------------------------------------------------------------
# ANN recall report (driver-auditable approximation contract)
# ---------------------------------------------------------------------------

#: Pinned recall@TOP_K floors per ANN variant vs the brute-force result.
#: Deterministic facts of the fixed fixtures + fixed seeds — measured
#: recalls (sf0.001 / sf0.01 / sf0.1): ivf .45/.575/.40,
#: ivf_kmeans .65/.65/.475, lsh@(4 bits, 12 tables) .80/.925/.925,
#: pq .95/.975/.825; each floor sits a margin under its scale minimum
#: (pytest twins in tests/test_knn_q5.py / TestPQ).  The driver's hash
#: gate now audits the approximation contract itself — a silent recall
#: regression in any variant flips recall_ok and fails the hash.
ANN_RECALL_FLOORS = (
    ("ivf", 0.35),
    ("ivf_kmeans", 0.4),
    ("lsh", 0.6),
    ("pq", 0.7),
)

#: LSH settings for the recall report: the library default (10 bits x 12
#: tables) is tuned for candidate-rate economy, not recall (~0.1 on the
#: fixtures); 4-bit buckets x 12 tables trades a denser candidate set for
#: 0.8+ recall and is the setting the report certifies.
ANN_REPORT_LSH = {"n_bits": 4, "n_tables": 12}


def ann_recall_report(sf_dir: str):
    """recall@k of every approximate ANN variant against the exact
    brute-force top-k, one row per variant (round-3 verdict item 5).

    One materialized embeddings pass feeds all five searches (the corpus
    is never re-read per variant); recall is computed driver-side over
    the tiny per-query result sets."""
    emb = _read_embeddings(sf_dir).materialize()
    qids, Q = _load_query_matrix(sf_dir, N_QUERIES)
    brute = brute_force_topk(emb, qids, Q).to_pandas()
    truth = {
        qid: set(g["neighbor_id"]) for qid, g in brute.groupby("query_id")
    }

    def _pq():
        codebooks = pq_train(emb)
        codes = pq_encode(emb, codebooks).materialize()
        return pq_topk_rerank(codes, emb, codebooks, qids, Q)

    searches = {
        "ivf": lambda: ivf_topk(emb, qids, Q),
        "ivf_kmeans": lambda: ivf_kmeans_topk(emb, qids, Q),
        "lsh": lambda: lsh_topk(emb, qids, Q, **ANN_REPORT_LSH),
        "pq": _pq,
    }
    rows = []
    denom = len(qids) * TOP_K
    for variant, floor in ANN_RECALL_FLOORS:
        approx = searches[variant]().to_pandas()
        hits = sum(
            len(set(g["neighbor_id"]) & truth.get(qid, set()))
            for qid, g in approx.groupby("query_id")
        )
        recall = hits / denom
        rows.append((variant, recall >= floor, floor))
    return pa.table({
        "variant": pa.array([r[0] for r in rows], pa.string()),
        "k": pa.array([TOP_K] * len(rows), pa.int64()),
        "n_queries": pa.array([len(qids)] * len(rows), pa.int64()),
        "recall_floor": pa.array([r[2] for r in rows], pa.float64()),
        "recall_ok": pa.array([bool(r[1]) for r in rows], pa.bool_()),
    })


register(
    "ann_recall_report",
    ann_recall_report,
    f"""
    WITH nq AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings
        WHERE vec_id < {N_QUERIES}
    )
    SELECT v.variant, CAST({TOP_K} AS BIGINT) AS k, nq.n AS n_queries,
           v.recall_floor, TRUE AS recall_ok
    FROM (VALUES {', '.join(f"('{v}', CAST({f} AS DOUBLE))"
                            for v, f in ANN_RECALL_FLOORS)})
         AS v(variant, recall_floor), nq
    """,
)


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 and cosine ANN
# ---------------------------------------------------------------------------

RRF_K = 60       # the standard Cormack/Clarke/Buettcher fusion constant
RRF_TOP_K = 10


def rrf_fuse(bm25_ds, cos_ds, *, k_rrf: int = RRF_K, top_k: int = RRF_TOP_K):
    """Reciprocal-rank fusion of two per-query ranked lists: each doc's
    fused score is ``1/(k+rank_bm25) + 1/(k+rank_cos)`` over the ranks it
    holds in each list (absent list contributes nothing; absent rank is
    reported as 0).  The classic lexical+dense hybrid-retrieval combiner
    (Cormack et al., SIGIR 2009) — robust to incomparable score scales
    because only RANKS enter the fusion.

    Inputs are the OUTPUTS of ``textstats.bm25_topk`` (query_id, doc_id,
    score) and ``brute_force_topk``/any ANN variant (query_id,
    neighbor_id, cosine) — tiny ranked lists (queries x top_k rows), so
    the fusion's one groupby moves O(|queries| x k) rows, never the
    corpus.  Ranks are recomputed inside the fusion group from the
    ROUND-6 scores (desc, id asc) so both engines agree on ties.
    """

    def _bm(batch: pa.Table) -> pa.Table:
        return pa.table({
            "query_id": batch.column("query_id").cast(pa.int64()),
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "score": batch.column("score").cast(pa.float64()),
            "src": pa.array(["bm25"] * batch.num_rows, pa.string()),
        })

    def _co(batch: pa.Table) -> pa.Table:
        return pa.table({
            "query_id": batch.column("query_id").cast(pa.int64()),
            "doc_id": batch.column("neighbor_id").cast(pa.int64()),
            "score": batch.column("cosine").cast(pa.float64()),
            "src": pa.array(["cos"] * batch.num_rows, pa.string()),
        })

    unioned = bm25_ds.map_batches(
        _bm, batch_format="pyarrow", zero_copy_batch=True
    ).union(cos_ds.map_batches(
        _co, batch_format="pyarrow", zero_copy_batch=True))

    def _fuse(df: pd.DataFrame) -> pd.DataFrame:
        ranks = {}
        for src in ("bm25", "cos"):
            d = df[df["src"] == src].sort_values(
                ["score", "doc_id"], ascending=[False, True])
            ranks[src] = {int(i): r + 1
                          for r, i in enumerate(d["doc_id"].to_numpy())}
        ids = np.array(sorted({int(i) for i in df["doc_id"].to_numpy()}),
                       dtype=np.int64)
        rb = np.array([ranks["bm25"].get(i, 0) for i in ids], np.int64)
        rc = np.array([ranks["cos"].get(i, 0) for i in ids], np.int64)
        # fixed addition order (bm25 term + cos term) on both engines
        rrf = (np.where(rb > 0, 1.0 / (k_rrf + rb), 0.0)
               + np.where(rc > 0, 1.0 / (k_rrf + rc), 0.0))
        out = pd.DataFrame({
            "query_id": np.full(len(ids), int(df["query_id"].iloc[0]),
                                np.int64),
            "doc_id": ids,
            "rank_bm25": rb,
            "rank_cos": rc,
            "rrf": round_half_away(rrf, 6),
        }).sort_values(["rrf", "doc_id"], ascending=[False, True]) \
            .head(top_k)
        return out.reset_index(drop=True)

    return unioned.groupby("query_id").map_groups(
        _fuse, batch_format="pandas")


def _q_hybrid_rrf(sf_dir: str):
    """Hybrid retrieval demo pairing: query ``q`` fuses the BM25 term
    query ``q`` with the cosine neighbors of document ``q``'s embedding
    ("docs that match these terms AND read like doc q") — the fixture's
    ``doc_id`` and ``vec_id`` ranges coincide, so the pairing is
    well-defined."""
    import ray

    from .textstats import bm25_topk

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    bm = bm25_topk(docs, top_k=RRF_TOP_K)
    n_q = 4  # the BM25 query set has ids 0..3
    qids, Q = _load_query_matrix(sf_dir, n_q)
    co = brute_force_topk(_read_embeddings(sf_dir), qids, Q, k=RRF_TOP_K)
    return rrf_fuse(bm, co)


def _hybrid_rrf_sql() -> str:
    from .textstats import _bm25_sql

    return f"""
    WITH bm_raw AS ({_bm25_sql()}),
    bm AS (
        SELECT query_id, doc_id, row_number() OVER (
            PARTITION BY query_id ORDER BY score DESC, doc_id) AS rb
        FROM bm_raw
    ),
    co_raw AS (
        SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
               round(list_cosine_similarity(
                   CAST(q.embedding AS DOUBLE[]),
                   CAST(e.embedding AS DOUBLE[])), 6) AS score
        FROM embeddings q
        JOIN embeddings e ON e.vec_id <> q.vec_id
        WHERE q.vec_id < 4
        QUALIFY row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(
                CAST(q.embedding AS DOUBLE[]),
                CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id
        ) <= {RRF_TOP_K}
    ),
    co AS (
        SELECT query_id, doc_id, row_number() OVER (
            PARTITION BY query_id ORDER BY score DESC, doc_id) AS rc
        FROM co_raw
    ),
    f AS (
        SELECT coalesce(bm.query_id, co.query_id) AS query_id,
               coalesce(bm.doc_id, co.doc_id) AS doc_id,
               CAST(coalesce(bm.rb, 0) AS BIGINT) AS rank_bm25,
               CAST(coalesce(co.rc, 0) AS BIGINT) AS rank_cos,
               round(CASE WHEN bm.rb IS NULL THEN 0.0
                          ELSE 1.0 / ({RRF_K} + bm.rb) END
                   + CASE WHEN co.rc IS NULL THEN 0.0
                          ELSE 1.0 / ({RRF_K} + co.rc) END, 6) AS rrf
        FROM bm FULL JOIN co
          ON bm.query_id = co.query_id AND bm.doc_id = co.doc_id
    )
    SELECT query_id, doc_id, rank_bm25, rank_cos, rrf FROM f
    QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY rrf DESC, doc_id) <= {RRF_TOP_K}
    """


register("hybrid_rrf_topk", _q_hybrid_rrf, _hybrid_rrf_sql())


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup scoped by k-means clusters (Abbas et al. 2023)
# ---------------------------------------------------------------------------

SEMDEDUP_TAU = 0.3        # fixture-calibrated: same near-dup bar as
#                           dedup.EMB_NEAR_DUP_TAU so both paths agree
SEMDEDUP_CLUSTERS = 16


def semdedup(emb_ds, *, n_clusters: int = SEMDEDUP_CLUSTERS,
             tau: float = SEMDEDUP_TAU, n_iters: int = 5, seed: int = 7,
             max_cluster_vecs: int = 200_000):
    """SemDeDup-style semantic dedup: train k-means centroids over the
    embedding column, assign every vector to its nearest centroid, then
    WITHIN each cluster connect pairs with round-6 cosine >= tau and keep
    only the min-``vec_id`` representative of each connected component
    (``keep=false`` for the rest).  The k-means blocking replaces
    ``dedup.embedding_near_dups``'s label blocking — it needs no label
    column, so it is the variant a real corpus runs.

    Scale shape: kmeans is the streaming combiner (``kmeans_fit``); the
    assignment pass is one broadcast matmul per batch; the ONE shuffle
    co-partitions by cluster id.  Pairwise cosine is quadratic in *time*
    per CLUSTER — ``max_cluster_vecs`` fails loudly on a runaway cluster
    (raise n_clusters, the standard SemDeDup remedy) instead of silently
    running an O(n²) task — while *memory* is bounded by construction:
    ``cosine_pairs_chunked`` computes the cosine matrix in row strips
    capped at ``dedup.PAIR_STRIP_BYTES`` (~1 GiB), so even a cluster at
    the time bound never materializes the n×n matrix (320 GB at 200k).
    Approximate by construction: only same-cluster pairs are examined
    (cross-cluster recall vs the exact path is pinned in pytest).
    """
    from .dedup import _uf_labels, cosine_pairs_chunked

    emb_ds = emb_ds.materialize()  # consumed by kmeans passes + assignment
    C = kmeans_fit(emb_ds, n_clusters=n_clusters, n_iters=n_iters,
                   seed=seed)

    def _assign(batch: pa.Table) -> pa.Table:
        En = _normalize(batch.column("embedding").to_pylist())
        assign = np.argmax(En @ C.T, axis=1)
        return pa.table({
            "vec_id": batch.column("vec_id").cast(pa.int64()),
            "embedding": batch.column("embedding"),
            "cluster": pa.array(assign.astype(np.int64), pa.int64()),
        })

    assigned = emb_ds.map_batches(_assign, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def _dedup(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) > max_cluster_vecs:
            raise ValueError(
                f"semdedup cluster {int(df['cluster'].iloc[0])} has "
                f"{len(df)} vectors (> max_cluster_vecs="
                f"{max_cluster_vecs}); within-cluster cosine is quadratic "
                "— raise n_clusters (finer blocking) or max_cluster_vecs "
                "knowingly")
        df = df.sort_values("vec_id")
        ids = df["vec_id"].to_numpy(np.int64)
        En = _normalize(df["embedding"].to_numpy())
        a_hit, b_hit, _ = cosine_pairs_chunked(En, tau)
        labels = _uf_labels(zip(ids[a_hit], ids[b_hit]))
        keep = np.array([labels.get(int(i), int(i)) == int(i)
                         for i in ids])
        return pd.DataFrame({
            "vec_id": ids,
            "cluster": df["cluster"].to_numpy(np.int64),
            "keep": keep,
        })

    return assigned.groupby("cluster").map_groups(
        _dedup, batch_format="pandas")


def _q_semdedup(sf_dir: str):
    return semdedup(_read_embeddings(sf_dir))


# approximate by construction (kmeans blocking) -> rows-only driver check;
# within-cluster exactness + cross-cluster recall pinned in pytest
register("semdedup_flags", _q_semdedup)


# ---------------------------------------------------------------------------
# Matryoshka dimension-truncation recall report
# ---------------------------------------------------------------------------

TRUNC_DIMS = (8, 16, 32)


class _TruncPartial:
    """Per-batch partial top-k under SEVERAL dimension truncations in one
    corpus pass: truncate-then-renormalize both sides, one matmul per
    truncation per batch.  One read serves every report row."""

    def __init__(self, query_ids, query_matrix, dims, k):
        self.query_ids = query_ids
        self.Q = query_matrix  # (q, d) full, normalized
        self.dims = tuple(dims)
        self.k = k
        self.Qt = {}
        for d in self.dims:
            Qd = query_matrix[:, :d]
            n = np.linalg.norm(Qd, axis=1, keepdims=True)
            self.Qt[d] = Qd / np.where(n == 0, 1.0, n)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        E = np.stack(batch.column("embedding").to_pylist()).astype(
            np.float64)
        out = {"trunc_dim": [], "query_id": [], "neighbor_id": [],
               "sim": []}
        for d in self.dims:
            Ed = E[:, :d]
            n = np.linalg.norm(Ed, axis=1, keepdims=True)
            En = Ed / np.where(n == 0, 1.0, n)
            S = self.Qt[d] @ En.T
            for qi, qid in enumerate(self.query_ids):
                mask = ids != qid
                cand_ids = ids[mask]
                cand_sims = S[qi][mask]
                k = min(self.k, len(cand_ids))
                if k == 0:
                    continue
                top = np.lexsort((cand_ids, -cand_sims))[:k]
                out["trunc_dim"].extend([d] * k)
                out["query_id"].extend([qid] * k)
                out["neighbor_id"].extend(cand_ids[top])
                out["sim"].extend(cand_sims[top])
        return pa.table({
            "trunc_dim": pa.array(out["trunc_dim"], pa.int64()),
            "query_id": pa.array(out["query_id"], pa.int64()),
            "neighbor_id": pa.array(out["neighbor_id"], pa.int64()),
            "sim": pa.array(out["sim"], pa.float64()),
        })


def dim_truncation_report(emb_ds, query_ids, query_matrix, *,
                          dims=TRUNC_DIMS, k: int = TOP_K) -> pd.DataFrame:
    """Recall@k of truncated-dimension retrieval vs the full-dimension
    top-k (the Matryoshka embedding question: how many dims can be
    dropped before retrieval degrades).

    Scale shape: ONE corpus pass computes partial top-k for the full
    dimension AND every truncation (broadcast query matrix, per-batch
    matmuls); the merge + overlap join runs on queries x k rows — tiny
    by construction, computed driver-side like the other top-k reports.
    """
    full = brute_force_topk(emb_ds, query_ids, query_matrix,
                            k=k).to_pandas()
    trunc_partials = emb_ds.map_batches(
        _TruncPartial(query_ids, query_matrix, dims, k),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "neighbor_id"],
                            ascending=[False, True]).head(k)
        return df[["trunc_dim", "query_id", "neighbor_id"]]

    trunc = trunc_partials.groupby(["trunc_dim", "query_id"]).map_groups(
        _merge, batch_format="pandas").to_pandas()
    full_sets = full.groupby("query_id")["neighbor_id"].agg(set).to_dict()
    g = trunc.groupby(["trunc_dim", "query_id"])["neighbor_id"] \
        .agg(list).reset_index()
    n_overlap = np.array([
        len(set(row_ids) & full_sets.get(qid, set()))
        for qid, row_ids in zip(g["query_id"], g["neighbor_id"])
    ], dtype=np.int64)
    out = pd.DataFrame({
        "trunc_dim": g["trunc_dim"].to_numpy(np.int64),
        "query_id": g["query_id"].to_numpy(np.int64),
        "n_overlap": n_overlap,
        "recall_at_k": round_half_away(n_overlap / float(k), 6),
    })
    return out.sort_values(["trunc_dim", "query_id"],
                           ignore_index=True)


def _q_dim_truncation(sf_dir: str) -> pd.DataFrame:
    qids, Q = _load_query_matrix(sf_dir, N_QUERIES)
    return dim_truncation_report(_read_embeddings(sf_dir), qids, Q)


register(
    "embedding_trunc_recall",
    _q_dim_truncation,
    f"""
    WITH full_k AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id
        FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
        QUALIFY row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(
                         CAST(q.embedding AS DOUBLE[]),
                         CAST(e.embedding AS DOUBLE[])) DESC,
                     e.vec_id
        ) <= {TOP_K}
    ),
    dims AS (SELECT unnest([{', '.join(str(d) for d in TRUNC_DIMS)}])
                 AS trunc_dim),
    trunc_k AS (
        SELECT d.trunc_dim, q.vec_id AS query_id, e.vec_id AS neighbor_id
        FROM dims d, embeddings q JOIN embeddings e
          ON e.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
        QUALIFY row_number() OVER (
            PARTITION BY d.trunc_dim, q.vec_id
            ORDER BY list_cosine_similarity(
                         CAST(q.embedding AS DOUBLE[])[1:d.trunc_dim],
                         CAST(e.embedding AS DOUBLE[])[1:d.trunc_dim])
                     DESC,
                     e.vec_id
        ) <= {TOP_K}
    )
    SELECT t.trunc_dim, t.query_id,
           CAST(count(f.neighbor_id) AS BIGINT) AS n_overlap,
           round(CAST(count(f.neighbor_id) AS DOUBLE) / {TOP_K}, 6)
               AS recall_at_k
    FROM trunc_k t LEFT JOIN full_k f
      ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
    GROUP BY t.trunc_dim, t.query_id
    ORDER BY t.trunc_dim, t.query_id
    """,
)


# ---------------------------------------------------------------------------
# Simplified silhouette per label (centroid-based cluster quality)
# ---------------------------------------------------------------------------

def embedding_silhouette(emb_ds):
    """Simplified silhouette score per label: for each vector,
    ``a`` = euclidean distance to its OWN label centroid, ``b`` = the
    minimum distance to any OTHER label's centroid, and
    ``s = (b - a) / max(a, b)``; the report is the per-label mean of the
    per-vector scores (rounded per vector, then re-rounded — so both
    engines aggregate identical 1e-6 multiples).

    Scale shape: centroids come from per-block (label, dim-sum, count)
    partials folded on the driver (labels x dims is tiny) and broadcast
    ONCE; the per-vector pass is one matmul against the centroid matrix;
    ONE label groupby folds the means.
    """
    import ray

    def _partial_sums(batch: pa.Table) -> pa.Table:
        emb = np.stack(batch.column("embedding").to_numpy(
            zero_copy_only=False)).astype(np.float64)
        lab = batch.column("label").to_numpy(zero_copy_only=False)
        rows = []
        for lb in np.unique(lab):
            m = emb[lab == lb]
            rows.append((int(lb), m.sum(axis=0).tolist(), len(m)))
        return pa.table({
            "label": pa.array([r[0] for r in rows], pa.int64()),
            "s": pa.array([r[1] for r in rows],
                          pa.list_(pa.float64())),
            "n": pa.array([r[2] for r in rows], pa.int64()),
        })

    parts = emb_ds.map_batches(_partial_sums, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
    sums: dict = {}
    counts: dict = {}
    for r in parts:
        lb = int(r["label"])
        v = np.asarray(r["s"], np.float64)
        sums[lb] = sums.get(lb, 0) + v
        counts[lb] = counts.get(lb, 0) + int(r["n"])
    labels = sorted(sums)
    cent = np.stack([sums[lb] / counts[lb] for lb in labels])
    cent_ref = ray.put((np.asarray(labels, np.int64), cent))

    def _scores(batch: pa.Table) -> pa.Table:
        labs, c = ray.get(cent_ref)
        emb = np.stack(batch.column("embedding").to_numpy(
            zero_copy_only=False)).astype(np.float64)
        lab = batch.column("label").to_numpy(zero_copy_only=False)
        # squared distances to every centroid, then exact sqrt
        d2 = ((emb[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        d = np.sqrt(d2)
        own_idx = np.searchsorted(labs, lab)
        a = d[np.arange(len(emb)), own_idx]
        d_other = d.copy()
        d_other[np.arange(len(emb)), own_idx] = np.inf
        b = d_other.min(axis=1)
        s = round_half_away((b - a) / np.maximum(a, b), 6)
        return pa.table({
            "label": pa.array(lab.astype(np.int64), pa.int64()),
            "s": pa.array(s, pa.float64()),
        })

    def _mean(df: pd.DataFrame) -> pd.DataFrame:
        v = df["s"].to_numpy(np.float64)
        return pd.DataFrame({
            "label": pd.Series([int(df["label"].iloc[0])], dtype="int64"),
            "n_vectors": pd.Series([len(v)], dtype="int64"),
            "silhouette": round_half_away(
                np.array([round_half_away(np.float64(v.sum()), 6)
                          / len(v)]), 6),
        })

    return (
        emb_ds.map_batches(_scores, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("label").map_groups(_mean, batch_format="pandas")
    )


def _silhouette_sql() -> str:
    return """
    WITH e AS (
        SELECT vec_id, label, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ),
    cent AS (
        SELECT label AS clab, i, sum(CAST(x AS DOUBLE)) / count(*) AS c
        FROM e GROUP BY 1, 2
    ),
    d2 AS (
        SELECT e.vec_id, e.label, cent.clab,
               sum((CAST(e.x AS DOUBLE) - cent.c)
                   * (CAST(e.x AS DOUBLE) - cent.c)) AS dd
        FROM e JOIN cent USING (i)
        GROUP BY 1, 2, 3
    ),
    ab AS (
        SELECT vec_id, label,
               max(CASE WHEN label = clab THEN sqrt(dd) END) AS a,
               min(CASE WHEN label <> clab THEN sqrt(dd) END) AS b
        FROM d2 GROUP BY 1, 2
    ),
    s AS (
        SELECT label,
               round((b - a) / greatest(a, b), 6) AS sv
        FROM ab
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_vectors,
           round(round(sum(sv), 6) / count(*), 6) AS silhouette
    FROM s GROUP BY 1
    """


register(
    "embedding_silhouette",
    lambda sf: embedding_silhouette(_read_embeddings(sf)),
    _silhouette_sql(),
)
