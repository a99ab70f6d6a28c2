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
    import tempfile

    from ..sources.token_chunks import read_token_chunks
    from ..state.tokenstore import compress_corpus_dataset
    from .timeseries import (
        events_corpus_dataset,
        extract_pipeline,
        samples_for_compare,
    )

    corpus = events_corpus_dataset(sf_dir)
    chunks = compress_corpus_dataset(corpus)
    out = tempfile.mkdtemp(prefix="jtse_tok_rb_")
    chunks.write_parquet(out)
    samples = extract_pipeline(read_token_chunks(out))
    return samples_for_compare(samples, with_ordinal=True)


register(
    "tokens_chunk_readback",
    _q_readback,
    f"SELECT * FROM ({EVENTS_SAMPLES_SQL})",
)


def _q_ratio(sf_dir: str):
    import tempfile

    import ray

    from ..state.tokenstore import compress_corpus_dataset
    from .timeseries import events_corpus_dataset

    chunks = compress_corpus_dataset(events_corpus_dataset(sf_dir))
    out = tempfile.mkdtemp(prefix="jtse_tok_stats_")
    chunks.write_parquet(out)
    stats = ray.data.read_parquet(
        out, columns=["n_docs", "n_tokens", "raw_bytes"]
    ).to_pandas()
    return pa.table({
        "n_docs": pa.array([int(stats["n_docs"].sum())], pa.int64()),
        "n_tokens": pa.array([int(stats["n_tokens"].sum())], pa.int64()),
        "raw_bytes": pa.array([int(stats["raw_bytes"].sum())], pa.int64()),
    })


# rows-only: n_tokens equals the UTF-8 byte length of each rendered JSON
# payload, and reconstructing that exact text in SQL would depend on
# DuckDB float formatting matching Python's repr — not a sound oracle.
# The totals are pinned instead by TestTokenChunkStore against the
# corpus table's own offsets.
register("tokens_chunk_ratio", _q_ratio)
