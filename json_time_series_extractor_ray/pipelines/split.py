"""Training-corpus organization: deterministic train/val split + seeded
global shuffle.

* ``train_val_split``: hash-based assignment (first md5 hex digit of the
  doc id) — stable across runs, workers, resumes, and engine versions, so
  a document NEVER migrates between splits when the corpus grows (the
  property random splits lack).  Exactly mirrored by DuckDB's ``md5``.
* ``shuffle_corpus``: Ray Data's distributed ``random_shuffle`` (a full
  all-to-all exchange — the one op where that cost is the point: training
  ingestion needs decorrelated example order).  The driver oracle checks
  the permutation property: the shuffled id multiset hashes equal to the
  table's (the compare is row-order-insensitive).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from .registry import register

VAL_HEX = ("0", "1")  # 2/16 of md5 space -> 12.5% validation


def split_batch(batch: pa.Table, *, id_column: str = "doc_id",
                val_hex=VAL_HEX) -> pa.Table:
    ids = batch.column(id_column).to_pylist()
    split = [
        "val"
        if hashlib.md5(str(i).encode()).hexdigest()[0] in val_hex
        else "train"
        for i in ids
    ]
    return pa.table(
        {id_column: batch.column(id_column), "split": pa.array(split, pa.string())}
    )


def train_val_split(docs_ds, *, id_column: str = "doc_id", val_hex=VAL_HEX):
    import functools

    return docs_ds.map_batches(
        functools.partial(split_batch, id_column=id_column, val_hex=val_hex),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def shuffle_corpus(ds, *, seed: int = 42):
    return ds.random_shuffle(seed=seed)


def sample_corpus(ds, *, k: int, id_column: str = "doc_id", salt: str = ""):
    """Deterministic uniform k-sample: keep the k smallest md5 ranks.

    Hash-rank sampling is the scale-safe sampling shape: the rank is a
    pure per-row function (no coordination, no RNG state), every block
    prunes itself to its local k candidates inside ``map_batches``, and
    only ``n_blocks * k`` tiny rows reach the final global ``sort.limit``
    — the full corpus is never shuffled or materialized.  Deterministic
    (``salt`` selects a different sample), stable under resume/retry, and
    exactly reproducible in SQL (``ORDER BY md5(id) LIMIT k``).
    """

    def _rank(batch: pa.Table) -> pa.Table:
        ranks = [
            hashlib.md5((salt + str(i)).encode()).hexdigest()
            for i in batch.column(id_column).to_pylist()
        ]
        t = pa.table(
            {
                id_column: batch.column(id_column),
                "rank_key": pa.array(ranks, pa.string()),
            }
        )
        # local prune: at most k candidates leave each block
        idx = pa.compute.array_sort_indices(t.column("rank_key"))[:k]
        return t.take(idx)

    return (
        ds.map_batches(_rank, batch_format="pyarrow", zero_copy_batch=True)
        .sort("rank_key")
        .limit(k)
    )


def stratified_sample(ds, *, k: int, strata_col: str = "lang",
                      id_column: str = "doc_id", salt: str = ""):
    """Deterministic k-per-stratum sample (e.g. k docs per language): the
    k smallest md5 ranks within each stratum.

    Scale shape = ``sample_corpus`` per stratum: every block prunes itself
    to at most k candidates PER STRATUM inside ``map_batches``, so the
    one ``groupby(strata_col)`` shuffle moves ``n_blocks * k`` rows per
    stratum, never the corpus; the per-stratum merge then keeps the k
    smallest.  Deterministic, stable under resume, SQL-mirrorable
    (``QUALIFY row_number() OVER (PARTITION BY stratum ORDER BY md5(id))
    <= k``)."""

    def _rank_prune(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_pylist()
        ranks = [hashlib.md5((salt + str(i)).encode()).hexdigest()
                 for i in ids]
        df = pa.table({
            id_column: batch.column(id_column),
            strata_col: batch.column(strata_col),
            "rank_key": pa.array(ranks, pa.string()),
        }).to_pandas()
        pruned = (df.sort_values([strata_col, "rank_key"], kind="stable")
                  .groupby(strata_col, sort=False).head(k))
        return pa.Table.from_pandas(pruned, preserve_index=False)

    def _final_topk(df):
        out = df.sort_values("rank_key", kind="stable").head(k)
        return out[[id_column, strata_col, "rank_key"]]

    return (
        ds.map_batches(_rank_prune, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(strata_col)
        .map_groups(_final_topk, batch_format="pandas")
    )


def _q_sample(sf_dir: str):
    import ray

    return sample_corpus(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]),
        k=100,
    )


def _q_split(sf_dir: str):
    import ray

    return train_val_split(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    )


def _q_shuffle(sf_dir: str):
    import ray

    return shuffle_corpus(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    )


register(
    "doc_train_val_split",
    _q_split,
    f"""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                     IN ({', '.join(f"'{h}'" for h in VAL_HEX)})
                THEN 'val' ELSE 'train' END AS split
    FROM documents
    """,
)

register(
    "doc_sample_k",
    _q_sample,
    """
    SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS rank_key
    FROM documents
    ORDER BY rank_key
    LIMIT 100
    """,
)

def _q_stratified(sf_dir: str):
    import ray

    return stratified_sample(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "lang"]),
        k=20,
    )


register(
    "doc_stratified_sample",
    _q_stratified,
    """
    SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS rank_key
    FROM documents
    QUALIFY row_number() OVER (
        PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR))
    ) <= 20
    """,
)

register(
    "doc_shuffle",
    _q_shuffle,
    # Order-insensitive compare makes this a real check: the shuffled id
    # multiset must equal the table's (permutation — nothing lost/duped).
    "SELECT doc_id FROM documents",
)


def weighted_sample(ds, *, k: int, weight_col: str,
                    id_column: str = "doc_id", salt: str = ""):
    """Deterministic weight-proportional k-sample (Efraimidis-Spirakis
    exponential-rank scheme, derandomized): each row's uniform draw is an
    md5-derived constant, rank = -ln(u) / w, keep the k smallest ranks —
    selection probability proportional to ``weight_col`` with no RNG
    state, stable under retry/resume.

    Same scale shape as ``sample_corpus``: per-block local top-k prune,
    then one tiny global sort+limit over ``n_blocks * k`` candidates.
    Ranks are rounded to 6 decimals with an id tie-break so the k
    boundary is deterministic and SQL-mirrorable (DuckDB computes the
    identical expression from the same md5 hex)."""
    import numpy as np

    def _rank(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_pylist()
        u = np.array(
            [int(hashlib.md5((salt + str(i)).encode()).hexdigest()[:8], 16)
             for i in ids],
            dtype=np.float64,
        )
        u = (u + 1.0) / 4294967296.0  # (0, 1]
        w = batch.column(weight_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        from ._util import round_half_away

        # zero/negative/NaN weights are excluded entirely (the SQL
        # mirror's WHERE w > 0): keeping them as rank=inf rows would pad
        # the result to k when positive-weight rows are scarce, where
        # the oracle returns fewer
        pos = w > 0
        rank = round_half_away(-np.log(u[pos]) / w[pos], 6)
        t = pa.table({
            id_column: batch.column(id_column).filter(pa.array(pos)),
            weight_col: batch.column(weight_col).filter(pa.array(pos)),
            "rank_key": pa.array(rank, pa.float64()),
        })
        # local prune MUST apply the same (rank, id) order as the global
        # sort: rounding creates ties, and a rank-only prune could drop
        # the smaller-id row the oracle keeps at the k boundary
        kept_ids = np.asarray(ids, dtype=object)[pos]
        idx = np.lexsort((kept_ids, rank))[:k]
        return t.take(pa.array(idx, pa.int64()))

    return (
        ds.map_batches(_rank, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["rank_key", id_column])
        .limit(k)
    )


def _q_weighted(sf_dir: str):
    import ray

    return weighted_sample(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "n_chars"]),
        k=100, weight_col="n_chars",
    )


register(
    "doc_weighted_sample",
    _q_weighted,
    # identical expression: u = (hex32(md5) + 1) / 2^32, rank =
    # round(-ln(u)/w, 6); k smallest with id tie-break.  ln() agrees to
    # well under the 6-decimal grid for rank magnitudes O(1e-4..1).
    """
    SELECT doc_id, n_chars,
           round(-ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                                               1, 8)) AS BIGINT) + 1.0)
                     / 4294967296.0) / n_chars, 6) AS rank_key
    FROM documents
    WHERE n_chars > 0
    ORDER BY rank_key, doc_id
    LIMIT 100
    """,
)


def mixture_sample(ds, *, stratum_col: str, rates: dict,
                   id_column: str = "doc_id", default_rate: float = 1.0):
    """Deterministic per-stratum Bernoulli downsampling — the data-mixing
    primitive: keep a document iff its md5 hash falls under its stratum's
    rate (e.g. downweight a dominant language to 25% while keeping the
    rest whole).  Hash-gated like ``train_val_split``: no RNG state,
    stable across runs/resumes/corpus growth, embarrassingly parallel
    (pure per-row filter, no shuffle at all).

    Rates are quantized to 1/256 (two md5 hex chars compared
    lexicographically — fixed-width lowercase hex sorts numerically);
    a rate >= 1.0 maps to the sentinel 'g0', which every hex string
    precedes, i.e. keep-all.
    """

    def _thr(rate: float) -> str:
        q = int(round(rate * 256))
        return "g0" if q >= 256 else format(max(q, 0), "02x")

    thresholds = {s: _thr(r) for s, r in rates.items()}
    default_thr = _thr(default_rate)

    def _keep(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch.column(id_column).to_pylist()
        strata = batch.column(stratum_col).to_pylist()
        mask = np.array([
            hashlib.md5(str(i).encode()).hexdigest()[:2]
            < thresholds.get(s, default_thr)
            for i, s in zip(ids, strata)
        ], dtype=bool)
        return batch.filter(pa.array(mask))

    return ds.map_batches(_keep, batch_format="pyarrow",
                          zero_copy_batch=True)


MIXTURE_RATES = {"en": 0.25, "zh": 0.5}


def _q_mixture(sf_dir: str):
    import ray

    return mixture_sample(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "lang"]),
        stratum_col="lang", rates=MIXTURE_RATES,
    )


register(
    "doc_mixture_sample",
    _q_mixture,
    # same hash gate: first two md5 hex chars vs the per-stratum
    # threshold ('40' = 64/256 = 0.25, '80' = 128/256 = 0.5; unlisted
    # strata keep everything via the 'g0' sentinel)
    """
    SELECT doc_id, lang FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
          < CASE lang WHEN 'en' THEN '40' WHEN 'zh' THEN '80'
                      ELSE 'g0' END
    """,
)


def _q_source_caps(sf_dir: str):
    """Per-source document cap (RefinedWeb-style domain capping): keep at
    most N docs per source, preferring the longest (tie: doc_id) — reuses
    the generic ``topk_per_group`` operator; source cardinality is the
    parallelism, and each group task holds one source's rows."""
    import ray

    from .windows import topk_per_group

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "n_chars"],
    )
    return topk_per_group(
        docs, key="source",
        order_by=[("n_chars", False), ("doc_id", True)], k=10,
        columns=["doc_id", "source", "n_chars"],
    )


register(
    "doc_source_caps",
    _q_source_caps,
    """
    SELECT doc_id, source, n_chars FROM documents
    QUALIFY row_number() OVER (
        PARTITION BY source ORDER BY n_chars DESC, doc_id
    ) <= 10
    """,
)
