"""Exact duplicated-substring (span) detection — the suffix-array dedup
measure of Lee et al. 2021 ("Deduplicating Training Data Makes Language
Models Better"), re-expressed distributively.

The published method builds ONE global suffix array and reports every
repeated substring of length >= L.  A global suffix array is inherently
single-address-space; the distributed equivalent used here is exact for
the same question: a character L-gram occurs at a position inside a
repeated >=L span IFF that L-gram occurs >= 2 times in the corpus, so

1. every document emits its L-character windows (fully vectorized:
   one sliding-window byte view over the Arrow string buffer, stamped
   to fixed-width bytes);
2. one gram-sharded groupby finds globally duplicated grams and keeps
   only their (doc, position) hits — the gram STRING is the group key,
   so the result is exact (no hash-collision false merges; the cost is
   shuffling ~L bytes per position, the price of exactness — MinHash /
   SimHash in ``dedup.py`` are the approximate alternatives);
3. a doc-sharded gaps-and-islands pass merges overlapping/adjacent hit
   positions into MAXIMAL spans (vectorized break/cumsum — no per-doc
   loop), summarizing each doc;
4. a LEFT shuffle join against the documents relation fills zero rows
   for clean docs.

Positions are 0-based internally; all outputs are position-free
summaries, so they match the SQL twin's 1-based substr positions.
ASCII corpus note: byte offsets == character offsets (asserted cheaply
per batch); a multibyte corpus would need codepoint windows instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import hash_shards, round_half_away
from .registry import register

SPAN_L = 40          # minimum duplicated-span length (characters)
SPAN_SHARDS = 64


def duplicated_spans(docs_ds, documents_path: str, *, L: int = SPAN_L,
                     num_shards: int = SPAN_SHARDS):
    """Per doc: duplicated-position count, maximal-span count, longest
    span, and dup ratio.  ``docs_ds`` must carry (doc_id, text);
    ``documents_path`` re-reads (doc_id, n_chars) for the zero-fill."""
    import ray

    from .joins import shuffle_join

    def _grams(batch: pa.Table) -> pa.Table:
        col = batch.column("text").combine_chunks().cast(pa.large_string())
        data = np.frombuffer(col.buffers()[2], np.uint8)
        offsets = np.frombuffer(col.buffers()[1], np.int64)
        doc_len = np.diff(offsets)
        # byte==char positions only for ASCII text (see module note)
        n_codepoints = pa.compute.utf8_length(col).to_numpy(
            zero_copy_only=False)
        if not (doc_len == n_codepoints).all():
            raise ValueError(
                "non-ASCII document text: byte windows would misalign "
                "with character positions — add a codepoint-window path")
        nw = np.maximum(doc_len - L + 1, 0).astype(np.int64)
        total = int(nw.sum())
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        if total == 0:
            return pa.table({
                "g": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "gshard": pa.array([], pa.int32()),
            })
        doc_idx = np.repeat(np.arange(len(nw)), nw)
        cum = np.concatenate(([0], np.cumsum(nw)[:-1]))
        inner = np.arange(total) - np.repeat(cum, nw)
        starts = np.repeat(offsets[:-1], nw) + inner
        windows = np.lib.stride_tricks.sliding_window_view(data, L)
        grams = np.ascontiguousarray(windows[starts]) \
            .view(f"S{L}")[:, 0].astype(f"U{L}")
        return pa.table({
            "g": pa.array(grams, pa.string()),
            "doc_id": pa.array(doc_ids[doc_idx], pa.int64()),
            "pos": pa.array(inner, pa.int64()),
            "gshard": pa.array(
                hash_shards(pd.Series(grams), num_shards), pa.int32()),
        })

    def _dup_hits(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby("g", sort=False)["g"].transform("size")
        hit = df[sizes >= 2]
        return pd.DataFrame({
            "doc_id": hit["doc_id"].to_numpy(np.int64),
            "pos": hit["pos"].to_numpy(np.int64),
        })

    hits = (
        docs_ds.map_batches(_grams, batch_format="pyarrow",
                            zero_copy_batch=True)
        .groupby("gshard").map_groups(_dup_hits, batch_format="pandas")
    )

    def _tag_doc(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "dshard", pa.array(hash_shards(d, num_shards), pa.int32()))

    def _spans(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["doc_id", "pos"], ignore_index=True)
        doc = d["doc_id"].to_numpy(np.int64)
        pos = d["pos"].to_numpy(np.int64)
        if len(d) == 0:
            return pd.DataFrame({
                "doc_id": np.array([], np.int64),
                "n_dup": np.array([], np.int64),
                "n_spans": np.array([], np.int64),
                "longest_span": np.array([], np.int64),
            })
        newdoc = np.concatenate(([True], doc[1:] != doc[:-1]))
        gap = np.concatenate(([0], np.diff(pos)))
        brk = newdoc | (gap > L)  # overlap OR adjacency merges
        gid = np.cumsum(brk)
        t = pd.DataFrame({"doc_id": doc, "pos": pos, "gid": gid})
        sp = t.groupby("gid", sort=False).agg(
            doc_id=("doc_id", "first"), s=("pos", "min"), e=("pos", "max"))
        sp["slen"] = sp["e"] - sp["s"] + L
        per = sp.groupby("doc_id", sort=False).agg(
            n_spans=("slen", "size"), longest_span=("slen", "max"))
        nd = t.groupby("doc_id", sort=False).size().rename("n_dup")
        out = per.join(nd).reset_index()
        return pd.DataFrame({
            "doc_id": out["doc_id"].to_numpy(np.int64),
            "n_dup": out["n_dup"].to_numpy(np.int64),
            "n_spans": out["n_spans"].to_numpy(np.int64),
            "longest_span": out["longest_span"].to_numpy(np.int64),
        })

    stats = (
        hits.map_batches(_tag_doc, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby("dshard").map_groups(_spans, batch_format="pandas")
    )

    docs_meta = ray.data.read_parquet(
        documents_path, columns=["doc_id", "n_chars"])

    def _npos(batch: pa.Table) -> pa.Table:
        nc = batch.column("n_chars").to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(nc >= L))
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "n_positions": pa.array(
                t.column("n_chars").to_numpy(zero_copy_only=False)
                - L + 1, pa.int64()),
        })

    docs_meta = docs_meta.map_batches(_npos, batch_format="pyarrow",
                                      zero_copy_batch=True)
    joined = shuffle_join(
        docs_meta, stats, on="doc_id", how="left",
        left_schema=pa.schema([("doc_id", pa.int64()),
                               ("n_positions", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.int64()),
                                ("n_dup", pa.int64()),
                                ("n_spans", pa.int64()),
                                ("longest_span", pa.int64())]),
        num_shards=num_shards)

    def _finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        np_ = batch.column("n_positions").to_numpy(zero_copy_only=False)
        nd = pc.fill_null(batch.column("n_dup"), 0).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_positions": batch.column("n_positions"),
            "n_dup": pa.array(nd, pa.int64()),
            "n_spans": pc.fill_null(batch.column("n_spans"), 0)
            .cast(pa.int64()),
            "longest_span": pc.fill_null(batch.column("longest_span"), 0)
            .cast(pa.int64()),
            "dup_ratio": pa.array(
                round_half_away(nd / np_.astype(np.float64), 6),
                pa.float64()),
        })

    return joined.map_batches(_finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def _q_duplicated_spans(sf_dir: str):
    from .textstats import _read_documents

    return duplicated_spans(_read_documents(sf_dir, ["doc_id", "text"]),
                            f"{sf_dir}/documents.parquet")


register(
    "doc_duplicated_spans",
    _q_duplicated_spans,
    f"""
    WITH posi AS (
        SELECT doc_id, text,
               unnest(generate_series(1, len(text) - {SPAN_L - 1}))
                   AS i
        FROM documents WHERE len(text) >= {SPAN_L}
    ),
    pos AS (SELECT doc_id, i, substr(text, i, {SPAN_L}) AS g FROM posi),
    gc AS (SELECT g FROM pos GROUP BY g HAVING count(*) >= 2),
    dpos AS (SELECT p.doc_id, p.i FROM pos p JOIN gc USING (g)),
    isl AS (
        SELECT doc_id, i,
               CASE WHEN i - lag(i) OVER (
                        PARTITION BY doc_id ORDER BY i) <= {SPAN_L}
                    THEN 0 ELSE 1 END AS brk
        FROM dpos
    ),
    grp AS (
        SELECT doc_id, i,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY i
                              ROWS UNBOUNDED PRECEDING) AS gid
        FROM isl
    ),
    sp AS (
        SELECT doc_id, gid, max(i) - min(i) + {SPAN_L} AS slen
        FROM grp GROUP BY doc_id, gid
    ),
    per AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
               CAST(max(slen) AS BIGINT) AS longest_span
        FROM sp GROUP BY doc_id
    ),
    nd AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup
        FROM dpos GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(d.text) - {SPAN_L - 1} AS BIGINT) AS n_positions,
           coalesce(nd.n_dup, 0) AS n_dup,
           coalesce(per.n_spans, 0) AS n_spans,
           coalesce(per.longest_span, 0) AS longest_span,
           round(coalesce(nd.n_dup, 0)
                 / CAST(len(d.text) - {SPAN_L - 1} AS DOUBLE), 6)
               AS dup_ratio
    FROM documents d
    LEFT JOIN per ON per.doc_id = d.doc_id
    LEFT JOIN nd ON nd.doc_id = d.doc_id
    WHERE len(d.text) >= {SPAN_L}
    """,
)
