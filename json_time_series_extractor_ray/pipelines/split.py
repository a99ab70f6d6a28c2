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
    "doc_shuffle",
    _q_shuffle,
    # Order-insensitive compare makes this a real check: the shuffled id
    # multiset must equal the table's (permutation — nothing lost/duped).
    "SELECT doc_id FROM documents",
)
