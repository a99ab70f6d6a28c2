"""Driver queries for the compressed token-sequence chunk store.

``tokens_chunk_readback`` proves the full storage cycle through the
driver's value-hash gate: mandated corpus -> varint token chunks on disk
-> chunk SOURCE decodes them back -> detokenize -> extraction kernel ->
samples relation.  The codec is exactly lossless and checksum-verified,
so the read-back samples must hash-match the SAME oracle as
``events_extract_samples`` — any single corrupted token would change the
detokenized JSON and break the match, making this an end-to-end per-row
token-array-equality check (the north-rule invariant).

``tokens_chunk_ratio`` pins the store's accounting: total docs/tokens
and the raw byte size are SQL-expressible over the same corpus
derivation (4 bytes per int32 token; token count == payload byte count
for the UTF-8 tokenizer), while per-chunk rows stay engine-side (chunk
boundaries follow Ray's nondeterministic batch sizing).
"""

from __future__ import annotations

import pyarrow as pa

from ._events_sql import EVENTS_SAMPLES_SQL
from .registry import register


def _q_readback(sf_dir: str):
    from ..sources.token_chunks import read_token_chunks
    from ..state.tokenstore import compress_corpus_dataset
    from .timeseries import (
        events_corpus_dataset,
        extract_pipeline,
        samples_for_compare,
    )

    from ._util import scratch_dir

    corpus = events_corpus_dataset(sf_dir)
    chunks = compress_corpus_dataset(corpus)
    out = scratch_dir(f"tok_rb_{sf_dir}")
    chunks.write_parquet(out)
    samples = extract_pipeline(read_token_chunks(out))
    return samples_for_compare(samples, with_ordinal=True)


register(
    "tokens_chunk_readback",
    _q_readback,
    f"SELECT * FROM ({EVENTS_SAMPLES_SQL})",
)


def _q_ratio(sf_dir: str):
    """Chunk-store accounting over the DOCUMENTS corpus: with the UTF-8
    tokenizer, n_tokens == the summed byte length of the (pure-ASCII)
    driver text and raw_bytes == 4 bytes per int32 token — so every
    total is SQL-exact.  (The events-corpus store stays exercised
    value-exactly by ``tokens_chunk_readback``, whose decode feeds the
    extraction oracle; its own byte totals embed Python float reprs SQL
    cannot reproduce.)"""
    import ray

    from ..state.tokenstore import compress_corpus_dataset
    from ._util import scratch_dir

    chunks = compress_corpus_dataset(documents_corpus_dataset(sf_dir))
    out = scratch_dir(f"tok_stats_{sf_dir}")
    chunks.write_parquet(out)
    stats = ray.data.read_parquet(
        out, columns=["n_docs", "n_tokens", "raw_bytes"]
    ).to_pandas()
    return pa.table({
        "n_docs": pa.array([int(stats["n_docs"].sum())], pa.int64()),
        "n_tokens": pa.array([int(stats["n_tokens"].sum())], pa.int64()),
        "raw_bytes": pa.array([int(stats["raw_bytes"].sum())], pa.int64()),
    })


register(
    "tokens_chunk_ratio",
    _q_ratio,
    """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS n_tokens,
           CAST(4 * sum(length(text)) AS BIGINT) AS raw_bytes
    FROM documents
    """,
)


# ---------------------------------------------------------------------------
# Token-level frequency statistics over the mandated corpus
# ---------------------------------------------------------------------------

def token_frequencies(corpus_ds, *, top_k: int | None = None):
    """Corpus-wide token-id frequency table.

    Per-block ``np.unique`` over the FLAT Arrow list values (zero-copy,
    no per-document work) reduces each block to at most |vocab| partial
    rows, so the one groupby moves O(blocks x vocab), never O(tokens) —
    the same partial-combiner discipline as the rollup.  Output:
    (token, n_occurrences), optionally top-k by count."""
    import numpy as np

    def _partial(batch: pa.Table) -> pa.Table:
        col = batch.column("tokens")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.values.to_numpy(zero_copy_only=False)
        ids, counts = np.unique(flat, return_counts=True)
        return pa.table({
            "token": pa.array(ids.astype(np.int64), pa.int64()),
            "cnt": pa.array(counts.astype(np.int64), pa.int64()),
        })

    agg = corpus_ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("token").sum("cnt")

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table({
            "token": batch.column("token"),
            "n_occurrences": batch.column("sum(cnt)"),
        })

    out = agg.map_batches(_shape, batch_format="pyarrow",
                          zero_copy_batch=True)
    if top_k is not None:
        # token asc tie-break: a count tie at the k boundary must never
        # make the returned set run-dependent
        out = out.sort(["n_occurrences", "token"],
                       descending=[True, False]).limit(top_k)
    return out


def token_bigrams(corpus_ds, *, top_k: int = 50):
    """Top-k within-document token bigrams.

    Bigram keys are packed into one int64 (``a << 32 | b``) so the
    per-block combiner is a single ``np.unique`` over a vectorized
    expression; document boundaries are masked out via the list offsets
    (no bigram spans two docs).  Same O(blocks x distinct) shuffle bound
    as :func:`token_frequencies`."""
    import numpy as np

    def _partial(batch: pa.Table) -> pa.Table:
        col = batch.column("tokens")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        empty = pa.table({
            "bigram": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
        })
        if len(flat) < 2:
            return empty
        keys = (flat[:-1] << np.int64(32)) | flat[1:]
        mask = np.ones(len(flat) - 1, dtype=bool)
        inner = offsets[1:-1]  # doc boundaries: last token of each doc
        mask[inner[(inner > 0) & (inner <= len(mask))] - 1] = False
        keys = keys[mask]
        if not len(keys):
            return empty
        ids, counts = np.unique(keys, return_counts=True)
        return pa.table({
            "bigram": pa.array(ids, pa.int64()),
            "cnt": pa.array(counts.astype(np.int64), pa.int64()),
        })

    agg = corpus_ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("bigram").sum("cnt")

    def _shape(batch: pa.Table) -> pa.Table:
        import numpy as np

        bg = batch.column("bigram").to_numpy(zero_copy_only=False)
        return pa.table({
            "tok_a": pa.array(bg >> np.int64(32), pa.int64()),
            "tok_b": pa.array(bg & np.int64(0xFFFFFFFF), pa.int64()),
            "n_occurrences": batch.column("sum(cnt)"),
        })

    # bigram asc tie-break keeps the k boundary deterministic
    return agg.sort(["sum(cnt)", "bigram"],
                    descending=[True, False]).limit(top_k).map_batches(
        _shape, batch_format="pyarrow", zero_copy_batch=True
    )


def documents_corpus_dataset(sf_dir: str):
    """Driver ``documents`` table -> mandated corpus schema with the
    UTF-8 tokenizer.  Unlike the events corpus (whose payloads embed
    Python float reprs no SQL can reproduce), the documents text lives
    verbatim in the parquet — ASCII on every driver fixture — so each
    token id equals the DuckDB code point ``unicode(ch)`` and the token
    relation has an EXACT SQL twin."""
    import ray

    from ..corpus import texts_to_corpus_table

    def _tok(batch: pa.Table) -> pa.Table:
        ids = [str(i) for i in batch.column("doc_id").to_pylist()]
        return texts_to_corpus_table(
            ids, batch.column("text").to_pylist(),
            ["documents"] * batch.num_rows)

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_tok, batch_format="pyarrow", zero_copy_batch=True)


def _q_doc_token_freq(sf_dir: str):
    return token_frequencies(documents_corpus_dataset(sf_dir))


def _q_doc_token_bigrams(sf_dir: str):
    return token_bigrams(documents_corpus_dataset(sf_dir), top_k=50)


# Oracle-gated over the documents corpus: UTF-8 token == unicode code
# point because the driver text is pure ASCII (max code point 121 at
# every sf — verified), so DuckDB reconstructs the token relation
# exactly from the raw text.  The events-corpus twin of these operators
# stays pinned by TestTokenFrequencies (its payloads embed Python float
# reprs that SQL cannot reproduce).
register(
    "corpus_token_freq",
    _q_doc_token_freq,
    """
    SELECT CAST(unicode(ch) AS BIGINT) AS token,
           count(*) AS n_occurrences
    FROM (SELECT unnest(string_split(text, '')) AS ch FROM documents)
    GROUP BY 1
    """,
)

register(
    "corpus_token_bigrams",
    _q_doc_token_bigrams,
    """
    WITH pairs AS (
        SELECT unnest(list_transform(
                   generate_series(1, length(text) - 1),
                   i -> [unicode(text[i]), unicode(text[i + 1])])) AS pr
        FROM documents
    )
    SELECT CAST(pr[1] AS BIGINT) AS tok_a, CAST(pr[2] AS BIGINT) AS tok_b,
           count(*) AS n_occurrences
    FROM pairs GROUP BY 1, 2
    ORDER BY n_occurrences DESC, tok_a ASC, tok_b ASC
    LIMIT 50
    """,
)
