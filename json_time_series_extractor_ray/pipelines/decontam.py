"""Benchmark decontamination: flag corpus documents that share word
n-grams with a (small) benchmark/eval set.

The canonical training-data hygiene operator (n-gram-overlap
decontamination as popularized by the GPT-3 / Gopher data cards): an
eval-set document leaking into the training corpus inflates benchmark
scores, so every document whose text contains any benchmark n-gram is
flagged before training.

Scale shape — two streaming scans, no join shuffle:

1. The benchmark side (tiny by definition: eval sets are thousands of
   documents, the corpus is billions) streams through the existing
   ``ngram_counts_batch`` combiner → one ``groupby(ngram)`` over bounded
   per-block partials → the DISTINCT benchmark n-grams are collected
   driver-side under an explicit ``max_grams`` guard (same contract as
   ``near_dup_clusters``' edge guard: abort loudly, never exhaust the
   driver).
2. The full corpus streams through one vectorized ``map_batches`` with
   the benchmark-gram set broadcast in the task closure (shipped once
   per task by Ray's closure serialization; at 100 TB you would
   ``ray.put`` the set and pass the ObjectRef, which the actor-pool
   variant of this stage does — the membership test is identical).

Per-gram membership is counted over gram OCCURRENCES (not distinct
grams) so the oracle is a plain per-doc ``sum(CASE WHEN gram IN bench)``.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .registry import register
from .textstats import _read_documents, _words_and_offsets, ngram_counts_batch

#: Deterministic stand-in for "the eval set": every 47th doc_id. Mirrored
#: verbatim in the SQL oracle.
BENCH_MODULUS = 47

#: Overlap n-gram width. 13 is the GPT-3 figure; the synthetic docs are
#: short, so the registered query uses 5 (the operator takes any n).
DEFAULT_N = 5


def _doc_grams(batch: pa.Table, n: int):
    """Vectorized per-document n-gram expansion for one Arrow block.

    Returns ``(grams, doc_idx, n_docs)``: a flat object ndarray of
    space-joined word n-grams, the owning document index of each gram,
    and the number of documents in the block.  Same windowing rules as
    ``ngram_counts_batch`` (grams never straddle a document boundary).
    """
    flat_words, offsets, _ = _words_and_offsets(batch.column("text"))
    words = flat_words.to_numpy(zero_copy_only=False)
    n_docs = len(offsets) - 1
    if len(words) == 0:
        return np.array([], dtype=object), np.array([], dtype=np.int64), n_docs
    doc_id_per_word = np.repeat(np.arange(n_docs), np.diff(offsets))
    idx = np.arange(len(words))
    valid = np.flatnonzero(
        (idx + n <= len(words))
        & (doc_id_per_word == doc_id_per_word[np.minimum(idx + n - 1, len(words) - 1)])
    )
    if len(valid) == 0:
        return np.array([], dtype=object), np.array([], dtype=np.int64), n_docs
    grams = words[valid].astype(object)
    for i in range(1, n):
        grams = grams + " "
        grams = grams + words[valid + i].astype(object)
    return grams, doc_id_per_word[valid], n_docs


def _bench_mask(doc_ids) -> np.ndarray:
    # pyarrow.compute has no modulo kernel; numpy over the zero-copy
    # int64 view is equivalent.
    ids = doc_ids.to_numpy(zero_copy_only=False)
    return (ids % BENCH_MODULUS) == 0


def _is_benchmark(batch: pa.Table) -> pa.Table:
    return batch.filter(pa.array(_bench_mask(batch.column("doc_id"))))


def benchmark_gram_set(bench_ds, *, n: int = DEFAULT_N,
                       max_grams: int = 20_000_000) -> set:
    """DISTINCT n-grams of the benchmark set, collected under a guard.

    Combiner → one (ngram)-keyed shuffle of bounded partials → k distinct
    rows to the driver.  ``max_grams`` bounds the driver collect the same
    way ``near_dup_clusters``' ``max_edges`` does.
    """
    distinct = (
        bench_ds.map_batches(
            functools.partial(ngram_counts_batch, n=n),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .groupby("ngram")
        .count()
        .select_columns(["ngram"])
    )
    try:
        rows = distinct.take_all(limit=max_grams)
    except ValueError as exc:
        raise RuntimeError(
            f"benchmark n-gram set exceeds max_grams={max_grams}; the "
            "broadcast-set decontamination assumes a small eval side. "
            "Shrink the benchmark or raise max_grams deliberately."
        ) from exc
    return {r["ngram"] for r in rows}


def contamination_flags(docs_ds_fn, *, n: int = DEFAULT_N,
                        max_grams: int = 20_000_000):
    """Per-document contamination report against the modulus benchmark.

    ``docs_ds_fn`` is a zero-arg callable producing the documents Dataset
    (consumed once per phase).  Output: one row per corpus document with
    ``n_grams`` (total n-gram occurrences), ``n_contaminated``
    (occurrences found in the benchmark set), ``is_contaminated``, and
    ``is_benchmark``.
    """
    import pandas as pd

    bench = benchmark_gram_set(
        docs_ds_fn().map_batches(
            _is_benchmark, batch_format="pyarrow", zero_copy_batch=True
        ),
        n=n, max_grams=max_grams,
    )

    def _flags(batch: pa.Table) -> pa.Table:
        grams, doc_idx, n_docs = _doc_grams(batch, n)
        n_grams = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
        hit = (pd.Series(grams).isin(bench).to_numpy() if len(grams)
               else np.array([], dtype=np.float64))
        n_hit = np.bincount(
            doc_idx, weights=hit, minlength=n_docs
        ).astype(np.int64)
        doc_ids = batch.column("doc_id")
        return pa.table({
            "doc_id": doc_ids,
            "n_grams": pa.array(n_grams, pa.int64()),
            "n_contaminated": pa.array(n_hit, pa.int64()),
            "is_contaminated": pa.array(n_hit > 0, pa.bool_()),
            "is_benchmark": pa.array(_bench_mask(doc_ids), pa.bool_()),
        })

    return docs_ds_fn().map_batches(
        _flags, batch_format="pyarrow", zero_copy_batch=True
    )


register(
    "doc_decontaminate",
    lambda sf: contamination_flags(
        lambda: _read_documents(sf, ["doc_id", "text"]), n=DEFAULT_N
    ),
    rf"""
    WITH w AS (
        SELECT doc_id,
               string_split_regex(
                   regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'
               ) AS ws
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(len(ws) - {DEFAULT_N - 1}),
                   i -> array_to_string(ws[i+1:i+{DEFAULT_N}], ' ')
               )) AS gram
        FROM w
    ),
    bench AS (
        SELECT DISTINCT gram FROM g WHERE doc_id % {BENCH_MODULUS} = 0
    ),
    per AS (
        SELECT doc_id,
               count(*) AS n_grams,
               CAST(sum(CASE WHEN gram IN (SELECT gram FROM bench)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
        FROM g GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(per.n_grams, 0) AS n_grams,
           COALESCE(per.n_contaminated, 0) AS n_contaminated,
           COALESCE(per.n_contaminated, 0) > 0 AS is_contaminated,
           d.doc_id % {BENCH_MODULUS} = 0 AS is_benchmark
    FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    """,
)


# ---------------------------------------------------------------------------
# Exact-substring decontamination (signature containment)
# ---------------------------------------------------------------------------

#: Leading-prefix signature width for the substring variant.
SIG_LEN = 40


def substring_contamination(docs_ds_fn, *, sig_len: int = SIG_LEN,
                            modulus: int = BENCH_MODULUS,
                            max_sigs: int = 1_000_000):
    """Corpus documents that CONTAIN any benchmark document's leading
    ``sig_len``-character signature — the exact-substring twin of the
    n-gram overlap check (catches verbatim eval leakage that word
    tokenization can miss: punctuation-fused copies, partial-line
    quotes).

    Scale shape: the benchmark side is tiny by definition — signatures
    are collected once driver-side under a ``max_sigs`` guard and
    broadcast into one streaming corpus scan; no join shuffle.  The scan
    is vectorized per signature (pandas ``str.contains`` over the whole
    block); signature count is bounded, so the per-block cost is
    O(sigs x block bytes) — at real scale you'd compile the signature
    set into one Aho-Corasick automaton per worker (library not in this
    container), which changes the constant, not the shape.  Emits one
    row per document (n_sigs = 0 for clean or benchmark rows) so the
    result schema is stable even when nothing is contaminated.
    """

    def _sigs(batch: pa.Table) -> pa.Table:
        keep = _bench_mask(batch.column("doc_id"))
        t = batch.filter(pa.array(keep))
        txt = t.column("text").to_pandas()
        sig = txt.str[:sig_len]
        ok = txt.str.len() >= sig_len
        return pa.table({"sig": pa.array(sig[ok], pa.string())})

    sig_rows = docs_ds_fn().map_batches(
        _sigs, batch_format="pyarrow", zero_copy_batch=True
    ).take_all(limit=max_sigs)
    sigs = sorted({r["sig"] for r in sig_rows})

    def _scan(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        corpus = ~_bench_mask(batch.column("doc_id"))
        txt = batch.column("text").to_pandas()
        n_hits = np.zeros(len(txt), dtype=np.int64)
        for s in sigs:
            n_hits += txt.str.contains(s, regex=False).to_numpy()
        n_hits[~corpus] = 0
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_sigs": pa.array(n_hits, pa.int64()),
            "is_contaminated": pa.array(n_hits > 0, pa.bool_()),
            "is_benchmark": pa.array(~corpus, pa.bool_()),
        })

    return docs_ds_fn().map_batches(
        _scan, batch_format="pyarrow", zero_copy_batch=True
    )


register(
    "doc_substring_decontam",
    lambda sf: substring_contamination(
        lambda: _read_documents(sf, ["doc_id", "text"])
    ),
    f"""
    WITH bench AS (
        SELECT DISTINCT substr(text, 1, {SIG_LEN}) AS sig
        FROM documents
        WHERE doc_id % {BENCH_MODULUS} = 0 AND len(text) >= {SIG_LEN}
    ),
    hits AS (
        SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_sigs
        FROM documents d
        JOIN bench b ON contains(d.text, b.sig)
        WHERE d.doc_id % {BENCH_MODULUS} <> 0
        GROUP BY d.doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.n_sigs, 0) AS n_sigs,
           COALESCE(h.n_sigs, 0) > 0 AS is_contaminated,
           d.doc_id % {BENCH_MODULUS} = 0 AS is_benchmark
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
)
