"""Training-shard sequence packing: assign every document a byte-exact
position in a concatenated token stream, split into fixed token-budget
chunks.

LLM pretraining consumes a corpus as shards of concatenated-then-split
token sequences ("pack then chunk at exactly ``budget`` tokens, documents
straddle chunk boundaries").  The operator computes, per document, its
token offset in the stream and the chunk ids it lands in — the manifest a
downstream tokenizer/writer needs to emit packed shards deterministically
and resumably.

Packing is inherently sequential, so the stream is sharded first
(``shard = doc_id % n_shards``) and each shard packs independently: one
``groupby(shard)`` co-locates a shard's manifest rows (doc_id + token
count only — never text), and the within-shard exclusive cumsum is one
numpy pass over doc_id-ordered rows.  At 100 TB you scale ``n_shards``
with the cluster; determinism (pure doc_id ordering) makes the manifest
stable under retries and resume.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .registry import register
from .textstats import _read_documents, _words_and_offsets

DEFAULT_BUDGET = 512
DEFAULT_SHARDS = 8


def pack_offsets(docs_ds, *, budget: int = DEFAULT_BUDGET,
                 n_shards: int = DEFAULT_SHARDS):
    """Per-document packed-stream offsets.

    Output columns: ``doc_id``, ``shard``, ``n_tok`` (whitespace token
    count), ``tok_start`` (exclusive cumsum within the shard's
    doc_id-ordered stream), ``chunk_first`` / ``chunk_last`` (budget-sized
    chunk ids covering the document), ``spans_boundary``.
    """

    def _tok_counts(batch: pa.Table) -> pa.Table:
        _, offsets, _ = _words_and_offsets(batch.column("text"))
        n_tok = np.diff(offsets).astype(np.int64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "shard": pa.array(ids % n_shards, pa.int64()),
            "n_tok": pa.array(n_tok, pa.int64()),
        })

    def _pack_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="stable", ignore_index=True)
        n_tok = df["n_tok"].to_numpy()
        tok_start = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
        chunk_first = tok_start // budget
        last_tok = tok_start + np.maximum(n_tok, 1) - 1
        chunk_last = last_tok // budget
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "shard": df["shard"],
            "n_tok": n_tok,
            "tok_start": tok_start,
            "chunk_first": chunk_first,
            "chunk_last": chunk_last,
            "spans_boundary": chunk_last > chunk_first,
        })

    return (
        docs_ds.map_batches(_tok_counts, batch_format="pyarrow",
                            zero_copy_batch=True)
        .groupby("shard")
        .map_groups(_pack_shard, batch_format="pandas")
    )


register(
    "doc_pack_offsets",
    lambda sf: pack_offsets(_read_documents(sf, ["doc_id", "text"])),
    rf"""
    WITH t AS (
        SELECT doc_id,
               doc_id % {DEFAULT_SHARDS} AS shard,
               CAST(len(string_split_regex(
                   regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'
               )) AS BIGINT) AS n_tok
        FROM documents
    ),
    o AS (
        SELECT *,
               COALESCE(sum(n_tok) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS tok_start
        FROM t
    )
    SELECT doc_id, shard, n_tok, CAST(tok_start AS BIGINT) AS tok_start,
           CAST(tok_start // {DEFAULT_BUDGET} AS BIGINT) AS chunk_first,
           CAST((tok_start + GREATEST(n_tok, 1) - 1) // {DEFAULT_BUDGET}
               AS BIGINT) AS chunk_last,
           (tok_start + GREATEST(n_tok, 1) - 1) // {DEFAULT_BUDGET}
               > tok_start // {DEFAULT_BUDGET} AS spans_boundary
    FROM o
    """,
)


def chunk_manifest(docs_ds, *, budget: int = DEFAULT_BUDGET,
                   n_shards: int = DEFAULT_SHARDS):
    """Per-chunk roll-up of the packing manifest: how many documents
    start in each (shard, chunk) and how full the chunk's token span is —
    the writer-side work list (one output file per chunk).  Chunks a
    document merely passes through are not listed; the starting chunk
    owns the doc.
    """
    offs = pack_offsets(docs_ds, budget=budget, n_shards=n_shards)

    def _per_chunk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["shard", "chunk_first"], sort=False).agg(
            n_docs=("doc_id", "size"),
            n_tok=("n_tok", "sum"),
        ).reset_index()
        return pa.Table.from_pandas(
            g.rename(columns={"chunk_first": "chunk_id"}),
            preserve_index=False)

    return (
        offs.map_batches(_per_chunk, batch_format="pyarrow")
        .groupby(["shard", "chunk_id"])
        .sum(["n_docs", "n_tok"])
        .map_batches(
            lambda b: pa.table({
                "shard": b.column("shard"),
                "chunk_id": b.column("chunk_id"),
                "n_docs": b.column("sum(n_docs)").cast(pa.int64()),
                "n_tok": b.column("sum(n_tok)").cast(pa.int64()),
            }),
            batch_format="pyarrow", zero_copy_batch=True)
    )


register(
    "doc_chunk_manifest",
    lambda sf: chunk_manifest(_read_documents(sf, ["doc_id", "text"])),
    rf"""
    WITH t AS (
        SELECT doc_id,
               doc_id % {DEFAULT_SHARDS} AS shard,
               CAST(len(string_split_regex(
                   regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'
               )) AS BIGINT) AS n_tok
        FROM documents
    ),
    o AS (
        SELECT *,
               COALESCE(sum(n_tok) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS tok_start
        FROM t
    )
    SELECT shard,
           CAST(tok_start // {DEFAULT_BUDGET} AS BIGINT) AS chunk_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tok
    FROM o GROUP BY shard, chunk_id
    """,
)
