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
import pyarrow as pa

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


# ---------------------------------------------------------------------------
# Source-pair n-gram overlap matrix (cross-source contamination screen)
# ---------------------------------------------------------------------------

OVERLAP_K = 5  # 5-word shingles: long enough to mean copying, not idiom


def source_ngram_overlap(docs_ds, *, k: int = OVERLAP_K):
    """For every source pair: how many distinct word ``k``-grams they
    share, and the Jaccard over their distinct-shingle sets — the
    cross-source contamination screen (which corpora copy from each
    other).

    Scale shape: docs collapse to DISTINCT (shingle-hash, source) rows
    inside ``map_batches`` (128-bit hashes, never text); ONE 64-way
    hash-SHARDED shuffle (never one Ray group per shingle — millions of
    tiny groups each pay Python overhead; measured 53.8 s -> 7.8 s at
    sf0.1 switching to shard-merge, the residual being exchange
    fixed costs) co-locates shingles; each shard task
    dedupes globally and emits its pair counts via one vectorized
    self-join (per-shingle groups are <= #sources wide).  Per-source
    distinct totals ride the same output as sentinel rows.

    The oracle rebuilds the same shingles with the containment CTE
    pattern (positions + lead), exact at word level.
    """
    from .dedup import _batch_gram_hashes

    def _shingles(batch: pa.Table) -> pa.Table:
        # fully vectorized per-doc unique gram hashes (the minhash
        # kernel); stable 64-bit siphash — the same hash the exact
        # Jaccard oracles already ride (collision odds ~1e-6 at
        # 5M grams, deterministic per corpus)
        n_docs, present, seg_starts, hashes = _batch_gram_hashes(
            batch.column("text"), k)
        if not len(hashes):
            return pa.table({
                "h": pa.array([], pa.uint64()),
                "source": pa.array([], pa.string()),
            })
        seg_len = np.diff(np.r_[seg_starts, len(hashes)])
        srcs = batch.column("source").to_numpy(zero_copy_only=False)
        src_per_hash = np.repeat(srcs[present], seg_len)
        df = pd.DataFrame({"h": hashes, "source": src_per_hash}) \
            .drop_duplicates(ignore_index=True)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _add_shard(batch: pa.Table) -> pa.Table:
        # first 4 bytes of the 128-bit shingle hash -> shard id: one
        # groupby over 64 shards, NOT one Ray group per shingle (the
        # per-key-group trap: millions of tiny groups pay Python
        # overhead each — the repo's shard-merge rule)
        h = batch.column("h").to_numpy(zero_copy_only=False)
        shard = (h % np.uint64(64)).astype(np.int32)
        return batch.append_column("shard", pa.array(shard, pa.int32()))

    def _shard_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["h", "source"])
        # vectorized self-join per shard: every shared shingle yields
        # its source pairs in one C merge (groups are <= #sources wide)
        m = df.merge(df, on="h")
        m = m[m["source_x"] < m["source_y"]]
        pc_ = m.groupby(["source_x", "source_y"], sort=False).size() \
            .rename("n").reset_index()
        tot = df.groupby("source", sort=False).size().rename("n") \
            .reset_index()
        return pd.DataFrame({
            "source_a": pd.concat([pc_["source_x"], tot["source"]],
                                  ignore_index=True).astype(object),
            "source_b": pd.concat(
                [pc_["source_y"],
                 pd.Series([""] * len(tot))],
                ignore_index=True).astype(object),
            "n": pd.concat([pc_["n"], tot["n"]],
                           ignore_index=True).astype(np.int64),
        })

    agg = (
        docs_ds.map_batches(_shingles, batch_format="pyarrow",
                            zero_copy_batch=True)
        .map_batches(_add_shard, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("shard").map_groups(_shard_pairs, batch_format="pandas")
        .groupby(["source_a", "source_b"]).sum("n")
    )

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__one")
        totals = dict(zip(df.loc[df["source_b"] == "", "source_a"],
                          df.loc[df["source_b"] == "", "sum(n)"]))
        pairs = df[df["source_b"] != ""].copy()
        shared = pairs["sum(n)"].to_numpy(np.int64)
        na = pairs["source_a"].map(totals).to_numpy(np.int64)
        nb = pairs["source_b"].map(totals).to_numpy(np.int64)
        return pd.DataFrame({
            "source_a": pairs["source_a"].to_numpy(dtype=object),
            "source_b": pairs["source_b"].to_numpy(dtype=object),
            "shared_ngrams": pd.Series(shared, dtype="int64"),
            "jaccard": round_half_away(
                shared / (na + nb - shared), 6),
        })

    withk = agg.map_batches(
        lambda t: t.append_column("__one", pa.array([0] * t.num_rows,
                                                    pa.int32())),
        batch_format="pyarrow", zero_copy_batch=True)
    return withk.groupby("__one").map_groups(_finish,
                                             batch_format="pandas")


def _overlap_sql() -> str:
    k = OVERLAP_K
    lead_concat = " || ' ' || ".join(
        ["w"] + [f"lead(w, {i}) OVER win" for i in range(1, k)])
    return rf"""
    WITH wd AS (
        SELECT doc_id, source,
               regexp_split_to_array(
                   regexp_replace(text, '^\s+|\s+$', '', 'g'), '{_WS}'
               ) AS words
        FROM documents
    ),
    pos AS (
        SELECT doc_id, source, unnest(words) AS w,
               generate_subscripts(words, 1) AS i
        FROM wd
    ),
    sh AS (
        SELECT source, {lead_concat} AS s
        FROM pos
        WINDOW win AS (PARTITION BY doc_id ORDER BY i)
        QUALIFY lead(w, {k - 1}) OVER win IS NOT NULL
    ),
    d AS (SELECT DISTINCT source, s FROM sh),
    sizes AS (SELECT source, count(*) AS n FROM d GROUP BY 1),
    inter AS (
        SELECT a.source AS source_a, b.source AS source_b,
               count(*) AS shared
        FROM d a JOIN d b ON a.s = b.s AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT source_a, source_b,
           CAST(shared AS BIGINT) AS shared_ngrams,
           round(CAST(shared AS DOUBLE) / (sa.n + sb.n - shared), 6)
               AS jaccard
    FROM inter
    JOIN sizes sa ON source_a = sa.source
    JOIN sizes sb ON source_b = sb.source
    """


register(
    "source_ngram_overlap",
    lambda sf: source_ngram_overlap(
        _read(sf, "documents", ["doc_id", "text", "source"])
        .drop_columns(["doc_id"])),
    _overlap_sql(),
)
