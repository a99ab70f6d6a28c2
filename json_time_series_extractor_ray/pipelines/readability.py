"""Readability scoring (Flesch reading ease) per document.

Classic corpus-quality signal alongside ``textstats.doc_quality``: the
Flesch formula ``206.835 - 1.015*(words/sentences) - 84.6*(syllables/
words)`` over cheap regex counts.  Syllables use the standard
vowel-group heuristic (runs of ``[aeiouy]`` in lowercased text) — both
engines count the SAME regex, so the oracle is exact rather than
heuristic-vs-heuristic.

Scale shape: embarrassingly parallel — ONE ``map_batches`` over Arrow
batches, three RE2 count kernels per batch, no shuffle, output one row
per document.  Both Arrow and DuckDB use RE2, so the match semantics
(ASCII ``\\S``, non-overlapping counts) agree byte for byte.

Reference anchor: extraction-only reference (SURVEY.md §2); extends the
engine-mandated text-analysis family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._util import round_half_away
from .dedup import _read
from .registry import register

_WORD_RE = r"\S+"
_SENT_RE = r"[.!?]+"
_SYLL_RE = r"[aeiouy]+"


def _scores(batch: pa.Table) -> pa.Table:
    txt = batch.column("text")
    w = pc.count_substring_regex(txt, _WORD_RE).cast(pa.int64())
    s = pc.count_substring_regex(txt, _SENT_RE).cast(pa.int64())
    sy = pc.count_substring_regex(
        pc.utf8_lower(txt), _SYLL_RE).cast(pa.int64())
    wn = w.to_numpy(zero_copy_only=False)
    sn = s.to_numpy(zero_copy_only=False)
    syn = sy.to_numpy(zero_copy_only=False)
    s_eff = np.maximum(sn, 1)  # GREATEST(n_sentences, 1): unpunctuated docs
    with np.errstate(divide="ignore", invalid="ignore"):
        # identical IEEE expression tree to the oracle's
        # 206.835 - 1.015*(w/s) - 84.6*(sy/w), left to right
        val = 206.835 - 1.015 * (wn / s_eff) - 84.6 * (syn / wn)
    flesch = np.where(wn > 0, round_half_away(val, 6), np.nan)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_words": w,
        "n_sentences": s,
        "n_syllables": sy,
        "flesch": pa.array(flesch, pa.float64()),
    })


def readability_scores(docs_ds):
    """Per-document word/sentence/syllable counts + Flesch reading ease."""
    return docs_ds.map_batches(_scores, batch_format="pyarrow",
                               zero_copy_batch=True)


register(
    "doc_readability",
    lambda sf: readability_scores(_read(sf, "documents", ["doc_id", "text"])),
    rf"""
    WITH c AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{_WORD_RE}')) AS BIGINT)
                   AS n_words,
               CAST(len(regexp_extract_all(text, '{_SENT_RE}')) AS BIGINT)
                   AS n_sentences,
               CAST(len(regexp_extract_all(lower(text), '{_SYLL_RE}'))
                    AS BIGINT) AS n_syllables
        FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CASE WHEN n_words > 0 THEN round(
               206.835 - 1.015 * (n_words / GREATEST(n_sentences, 1))
                       - 84.6 * (n_syllables / n_words), 6)
           END AS flesch
    FROM c
    """,
)
