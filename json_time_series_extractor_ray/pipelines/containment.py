"""Asymmetric n-gram containment pairs: subset/quotation duplication.

Jaccard misses the classic "document B embeds all of document A inside a
longer page" case (the intersection is large relative to A but small
relative to the union).  Containment C(A→B) = |A ∩ B| / |A| is the
standard asymmetric companion (Broder's resemblance vs containment):
C(A→B) ≈ 1 means A is (nearly) contained in B, regardless of B's size.

Scale shape: identical to ``dedup.jaccard_block_pairs`` — this is the
exact/oracle variant, deliberately quadratic WITHIN a ``lang`` block
with the same loud ``max_block_docs`` guard; MinHash-containment (the
sketch estimate |A∩B|/|A| from the same signatures used by
``minhash_lsh_dups``) is the scale path for corpora with dominant
blocks.  Shingle machinery and the distinct-trigram SQL CTEs are shared
with the Jaccard oracle so the two operators agree on what a shingle is.

Reference anchor: extraction-only reference (SURVEY.md §2); extends the
engine-mandated dedup family (§2.6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ._util import round_half_away
from .dedup import _WS, _read
from .registry import register

#: Emit a pair when EITHER direction's containment reaches this.
CONTAINMENT_THRESHOLD = 0.5


class ContainmentBlockStage:
    """One block (all docs of one ``lang``) -> exact pairwise containment
    pairs (both directions reported; pair emitted when either direction
    reaches the threshold)."""

    def __init__(self, threshold: float = CONTAINMENT_THRESHOLD, k: int = 3,
                 max_block_docs: int = 100_000):
        self.threshold = threshold
        self.k = k
        self.max_block_docs = max_block_docs

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if len(df) > self.max_block_docs:
            lang = df["lang"].iloc[0] if "lang" in df else "?"
            raise ValueError(
                f"containment block {lang!r} has {len(df)} docs "
                f"(> max_block_docs={self.max_block_docs}); exact pairwise "
                "containment is quadratic per block — use a MinHash "
                "containment estimate for corpora with dominant blocks, "
                "or raise max_block_docs knowingly"
            )
        # RE2 split via Arrow (never Python str.split(), whose Unicode-
        # whitespace rule silently diverges from the oracle on U+00A0)
        import pyarrow as pa
        import pyarrow.compute as pc

        from ._util import regex_trim

        words_list = pc.split_pattern_regex(
            regex_trim(pa.array(df["text"], pa.string())), _WS
        ).to_pylist()
        sets = [
            {
                " ".join(words[i : i + self.k])
                for i in range(max(0, len(words) - self.k + 1))
            }
            for words in words_list
        ]
        ids = df["doc_id"].to_numpy()
        order = np.argsort(ids)
        out_a, out_b, out_ab, out_ba = [], [], [], []
        for ii in range(len(order)):
            i = order[ii]
            si = sets[i]
            if not si:
                continue
            for jj in range(ii + 1, len(order)):
                j = order[jj]
                sj = sets[j]
                if not sj:
                    continue
                inter = len(si & sj)
                if inter == 0:
                    continue
                c_ab = float(round_half_away(inter / len(si), 6))
                c_ba = float(round_half_away(inter / len(sj), 6))
                if max(c_ab, c_ba) >= self.threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_ab.append(c_ab)
                    out_ba.append(c_ba)
        return pd.DataFrame({
            "doc_a": pd.Series(out_a, dtype="int64"),
            "doc_b": pd.Series(out_b, dtype="int64"),
            "containment_ab": pd.Series(out_ab, dtype="float64"),
            "containment_ba": pd.Series(out_ba, dtype="float64"),
        })


def containment_block_pairs(docs_ds, *,
                            threshold: float = CONTAINMENT_THRESHOLD,
                            max_block_docs: int = 100_000):
    stage = ContainmentBlockStage(threshold, max_block_docs=max_block_docs)

    def _block_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return stage(df)

    return docs_ds.groupby("lang").map_groups(_block_pairs,
                                              batch_format="pandas")


register(
    "containment_block_pairs",
    lambda sf: containment_block_pairs(
        _read(sf, "documents", ["doc_id", "text", "lang"])),
    rf"""
    WITH w AS (
        SELECT doc_id, lang,
               regexp_split_to_array(
                   regexp_replace(text, '^\s+|\s+$', '', 'g'), '{_WS}'
               ) AS words
        FROM documents
    ),
    pos AS (
        SELECT doc_id, lang, unnest(words) AS w,
               generate_subscripts(words, 1) AS i
        FROM w
    ),
    sh AS (
        SELECT doc_id, lang,
               w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win
                   AS s
        FROM pos
        WINDOW win AS (PARTITION BY doc_id ORDER BY i)
        QUALIFY lead(w, 2) OVER win IS NOT NULL
    ),
    d AS (SELECT DISTINCT doc_id, lang, s FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM d a
        JOIN d b ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(i AS DOUBLE) / sa.n, 6) AS containment_ab,
           round(CAST(i AS DOUBLE) / sb.n, 6) AS containment_ba
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE greatest(round(CAST(i AS DOUBLE) / sa.n, 6),
                   round(CAST(i AS DOUBLE) / sb.n, 6))
          >= {CONTAINMENT_THRESHOLD}
    """,
)
