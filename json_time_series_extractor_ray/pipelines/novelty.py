"""N-gram novelty scoring and keep-best exact dedup.

Two training-data curation operators that rank *which* content to keep,
complementing the drop-only dedup family in ``dedup.py``:

* **n-gram novelty** — per document, the fraction of its word n-gram
  occurrences that are corpus-unique (doc-frequency 1).  Boilerplate and
  template text score near 0; genuinely new prose scores near 1.  The
  standard "informativeness" signal next to ``doc_quality`` /
  ``doc_repetition_stats`` when building a training mixture.
* **keep-best exact dedup** — exact dedup that keeps the HIGHEST-QUALITY
  copy (here: max ``n_chars``, tie-break min ``doc_id``) instead of
  ``exact_dedup``'s min-id representative, the usual policy when dup
  groups mix truncated and full versions of the same page.

Scale shape (novelty): one combiner ``map_batches`` pre-aggregates each
block to (gram, doc_id, occ) rows — bounded by the block's own gram
count, never a driver collect — then TWO shard-keyed shuffles: the
gram-keyed one (``shard = stable_hash(gram) % NOVELTY_SHARDS``) computes
per-gram doc-frequency inside ordinary-sized pandas groups (all rows of
a gram land in one shard by construction), and the doc-keyed one merges
each document's partials (a native ``groupby(doc_id).sum`` here was ~10x
slower at sf0.1 — Ray's sort-based aggregate degrades over thousands of
tiny groups).  No stage materializes the corpus and no group is ever
larger than 1/shards of its stream.  At 100 TB the
gram strings themselves dominate shuffle bytes; the documented scale
path is hashing grams to u64 before the shuffle (collision odds ~n²/2⁶⁴)
— the registered query keeps the strings so the DuckDB oracle is exact.

Keep-best reuses the exact-dedup projection discipline (fingerprint +
the two tiny decision columns leave the scan; text never moves) with the
same shard-keyed groupby, so one viral duplicate group costs one pandas
group, not a near-singleton Ray group per fingerprint.

Reference anchor: the reference library has no corpus-curation surface
(JsonTimeSeriesExtractor.cs is extraction-only); these extend the
engine-mandated LLM-pipeline family in SURVEY.md §2.6.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import hash_shards, round_half_away
from .decontam import _doc_grams
from .dedup import _WS, content_fingerprints
from .registry import register
from .textstats import _read_documents

#: Novelty n-gram width. 3 keeps enough shared grams on the short
#: synthetic docs for doc-frequency > 1 to actually occur.
NOVELTY_N = 3

#: Gram-keyed shuffle fan-out (same rationale as dedup.LSH_SHARDS: Ray
#: per-group overhead makes millions of singleton gram groups pathological;
#: 64 pandas-sized shards keep the shuffle coarse).
NOVELTY_SHARDS = 64


def _gram_occ_rows(batch: pa.Table, n: int, shards: int) -> pa.Table:
    """Combiner: one doc block -> (gram, doc_id, occ, shard) rows.

    ``occ`` is exact (a document is one row, so all its grams are in this
    block).  Vectorized end-to-end: gram expansion via ``_doc_grams``'
    offset arithmetic, per-(doc, gram) counting via one pandas groupby.
    """
    grams, doc_idx, _ = _doc_grams(batch, n)
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    if len(grams) == 0:
        return pa.table({
            "gram": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "occ": pa.array([], pa.int64()),
            "shard": pa.array([], pa.int32()),
        })
    per = (
        pd.DataFrame({"gram": grams, "doc_id": doc_ids[doc_idx]})
        .groupby(["gram", "doc_id"], sort=False)
        .size()
        .reset_index(name="occ")
    )
    return pa.table({
        "gram": pa.array(per["gram"], pa.string()),
        "doc_id": pa.array(per["doc_id"].to_numpy(), pa.int64()),
        "occ": pa.array(per["occ"].to_numpy().astype(np.int64), pa.int64()),
        "shard": pa.array(hash_shards(per["gram"].to_numpy(), shards)),
    })


def _shard_novelty_partials(df: pd.DataFrame, shards: int = NOVELTY_SHARDS
                            ) -> pd.DataFrame:
    """One gram shard -> per-doc partial (n_grams, n_novel) sums, keyed by
    the DOC shard for the second (doc-merging) shuffle.

    Every row of a gram is in this shard, so ``transform('size')`` over
    the (gram, doc) rows IS the gram's global doc-frequency.
    """
    if len(df) == 0:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype=np.int64),
            "n_grams": pd.Series([], dtype=np.int64),
            "n_novel": pd.Series([], dtype=np.int64),
            "dshard": pd.Series([], dtype=np.int32),
        })
    doc_freq = df.groupby("gram", sort=False)["doc_id"].transform("size")
    novel_occ = df["occ"].to_numpy() * (doc_freq.to_numpy() == 1)
    out = (
        pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "n_grams": df["occ"].to_numpy(),
            "n_novel": novel_occ,
        })
        .groupby("doc_id", sort=False)
        .sum()
        .reset_index()
    )
    out["n_grams"] = out["n_grams"].astype(np.int64)
    out["n_novel"] = out["n_novel"].astype(np.int64)
    out["dshard"] = hash_shards(out["doc_id"].to_numpy(), shards)
    return out


def _doc_shard_totals(df: pd.DataFrame) -> pd.DataFrame:
    """One doc shard -> final per-doc totals + novelty score.  (The
    native ``groupby(doc_id).sum`` aggregate took ~10x this path's wall
    time at sf0.1: Ray's sort-based aggregate degrades with thousands of
    tiny groups, the same pathology as per-key map_groups.)"""
    if len(df) == 0:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype=np.int64),
            "n_grams": pd.Series([], dtype=np.int64),
            "n_novel": pd.Series([], dtype=np.int64),
            "novelty": pd.Series([], dtype=np.float64),
        })
    g = df.groupby("doc_id", sort=False)[["n_grams", "n_novel"]].sum()         .reset_index()
    return pd.DataFrame({
        "doc_id": g["doc_id"].astype(np.int64),
        "n_grams": g["n_grams"].astype(np.int64),
        "n_novel": g["n_novel"].astype(np.int64),
        "novelty": round_half_away(
            g["n_novel"].to_numpy() / g["n_grams"].to_numpy()),
    })


def ngram_novelty(docs_ds, *, n: int = NOVELTY_N,
                  shards: int = NOVELTY_SHARDS):
    """Per-document novelty: share of n-gram occurrences that are
    corpus-unique.  One row per document with >= 1 n-gram:
    (doc_id, n_grams, n_novel, novelty)."""

    return (
        docs_ds.map_batches(
            lambda b: _gram_occ_rows(b, n, shards),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .groupby("shard")
        .map_groups(lambda df: _shard_novelty_partials(df, shards),
                    batch_format="pandas")
        .groupby("dshard")
        .map_groups(_doc_shard_totals, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Keep-best exact dedup
# ---------------------------------------------------------------------------

KEEP_BEST_SHARDS = 64


def _keep_best_project(batch: pa.Table) -> pa.Table:
    """Combiner: (fingerprint, doc_id, n_chars, shard) — text never leaves
    the scan.  Shares ``dedup.content_fingerprints`` so the two dedup
    variants agree by construction on what 'identical' means."""
    fps = content_fingerprints(batch.column("text"))
    fp_arr = np.asarray(fps, dtype=object)
    return pa.table({
        "fingerprint": pa.array(fps, pa.string()),
        "doc_id": batch.column("doc_id").cast(pa.int64()),
        "n_chars": batch.column("n_chars").cast(pa.int64()),
        "shard": pa.array(hash_shards(fp_arr, KEEP_BEST_SHARDS)),
    })


def _shard_keep_best(df: pd.DataFrame) -> pd.DataFrame:
    """One fingerprint shard -> the best copy per duplicate group
    (max n_chars, tie-break min doc_id) plus the group size."""
    if len(df) == 0:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype=np.int64),
            "n_chars": pd.Series([], dtype=np.int64),
            "n_copies": pd.Series([], dtype=np.int64),
        })
    ordered = df.sort_values(
        ["n_chars", "doc_id"], ascending=[False, True], kind="mergesort"
    )
    g = ordered.groupby("fingerprint", sort=False)
    out = g.agg(
        doc_id=("doc_id", "first"),
        n_chars=("n_chars", "first"),
        n_copies=("doc_id", "size"),
    ).reset_index(drop=True)
    out["n_copies"] = out["n_copies"].astype(np.int64)
    return out


def keep_best_dedup(docs_ds):
    """Exact dedup keeping the highest-quality copy per content group.
    One row per distinct content: (doc_id, n_chars, n_copies)."""
    return (
        docs_ds.map_batches(
            _keep_best_project, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("shard")
        .map_groups(_shard_keep_best, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Driver-visible queries + oracles
# ---------------------------------------------------------------------------

register(
    "doc_ngram_novelty",
    lambda sf: ngram_novelty(_read_documents(sf, ["doc_id", "text"])),
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
                   range(len(ws) - {NOVELTY_N - 1}),
                   i -> array_to_string(ws[i+1:i+{NOVELTY_N}], ' ')
               )) AS gram
        FROM w
    ),
    per AS (SELECT doc_id, gram, count(*) AS occ FROM g GROUP BY 1, 2),
    df AS (SELECT gram, count(*) AS doc_freq FROM per GROUP BY gram)
    SELECT per.doc_id,
           CAST(sum(per.occ) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN df.doc_freq = 1 THEN per.occ ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(CAST(sum(CASE WHEN df.doc_freq = 1 THEN per.occ ELSE 0 END)
                      AS DOUBLE) / sum(per.occ), 6) AS novelty
    FROM per JOIN df USING (gram)
    GROUP BY per.doc_id
    """,
)

register(
    "doc_keep_best_dedup",
    lambda sf: keep_best_dedup(
        _read_documents(sf, ["doc_id", "text", "n_chars"])
    ),
    rf"""
    WITH f AS (
        SELECT doc_id, n_chars,
               md5(regexp_replace(
                   regexp_replace(text, '^\s+|\s+$', '', 'g'), '{_WS}', ' ', 'g'
               )) AS fp
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, n_chars,
               row_number() OVER (
                   PARTITION BY fp ORDER BY n_chars DESC, doc_id
               ) AS rn,
               count(*) OVER (PARTITION BY fp) AS n_copies
        FROM f
    )
    SELECT doc_id, n_chars, CAST(n_copies AS BIGINT) AS n_copies
    FROM ranked WHERE rn = 1
    """,
)
