"""Corpus-health aggregates for the training-data card: the duplicate
cluster-size histogram (how much of the corpus is 2x, 3x, ... Nx
duplicated — the headline number of every dedup report).

Scale shape: the exact-dedup projection (fingerprint + doc count only,
text never moves) → ONE fingerprint-sharded groupby collapses each shard
to (n_copies → group count) partials — at most |distinct sizes| rows per
shard — then a tiny native ``groupby(n_copies).sum`` merges shards.  No
stage is ever larger than the shard's own group-size census.

Reference anchor: extraction-only reference; extends the mandated dedup
family (SURVEY.md §2.6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import hash_shards
from .dedup import _WS, _read, content_fingerprints
from .registry import register

DUPSIZE_SHARDS = 64


def _fp_project(batch: pa.Table) -> pa.Table:
    fps = content_fingerprints(batch.column("text"))
    return pa.table({
        "fingerprint": pa.array(fps, pa.string()),
        "shard": pa.array(
            hash_shards(np.asarray(fps, dtype=object), DUPSIZE_SHARDS)),
    })


def _shard_census(df: pd.DataFrame) -> pd.DataFrame:
    """One fingerprint shard -> (n_copies, n_groups) partial census."""
    if len(df) == 0:
        return pd.DataFrame({
            "n_copies": pd.Series([], dtype=np.int64),
            "n_groups": pd.Series([], dtype=np.int64),
        })
    sizes = df.groupby("fingerprint", sort=False).size()
    census = sizes.value_counts()
    return pd.DataFrame({
        "n_copies": census.index.to_numpy().astype(np.int64),
        "n_groups": census.to_numpy().astype(np.int64),
    })


def dup_cluster_sizes(docs_ds):
    """Histogram of exact-duplicate cluster sizes:
    (n_copies, n_groups, n_docs) — n_copies=1 rows are the unique docs."""

    def _finish(batch: pa.Table) -> pa.Table:
        n_copies = batch.column("n_copies").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        n_groups = batch.column("sum(n_groups)").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "n_copies": pa.array(n_copies, pa.int64()),
            "n_groups": pa.array(n_groups, pa.int64()),
            "n_docs": pa.array(n_copies * n_groups, pa.int64()),
        })

    return (
        docs_ds.map_batches(_fp_project, batch_format="pyarrow",
                            zero_copy_batch=True)
        .groupby("shard")
        .map_groups(_shard_census, batch_format="pandas")
        .groupby("n_copies")
        .sum("n_groups")
        .map_batches(_finish, batch_format="pyarrow", zero_copy_batch=True)
    )


register(
    "doc_dup_cluster_sizes",
    lambda sf: dup_cluster_sizes(_read(sf, "documents", ["text"])),
    rf"""
    WITH g AS (
        SELECT md5(regexp_replace(
                   regexp_replace(text, '^\s+|\s+$', '', 'g'),
                   '{_WS}', ' ', 'g')) AS fp,
               count(*) AS n_copies
        FROM documents GROUP BY fp
    )
    SELECT n_copies,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(n_copies * count(*) AS BIGINT) AS n_docs
    FROM g GROUP BY n_copies
    """,
)


# ---------------------------------------------------------------------------
# Language confusion matrix (labeled lang vs heuristic prediction)
# ---------------------------------------------------------------------------

def lang_confusion(docs_ds):
    """Cross-tab of the labeled ``lang`` column against the marker-word
    language-ID prediction: (lang, pred_lang, n) — the data-card view of
    how the lang-ID heuristic behaves per labeled stratum.

    Combiner aggregate: each block collapses to at most
    |langs| x |predictions| partial rows before one tiny groupby.
    """
    from .textstats import LangIdStage

    stage = LangIdStage()  # marker tables are tiny; shipped by value

    def _partial(batch: pa.Table) -> pa.Table:
        preds = stage(batch).column("pred_lang").to_pandas()
        g = (
            pd.DataFrame({"lang": batch.column("lang").to_pandas(),
                          "pred_lang": preds})
            .groupby(["lang", "pred_lang"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "lang": batch.column("lang"),
            "pred_lang": batch.column("pred_lang"),
            "n": batch.column("sum(n)").cast(pa.int64()),
        })

    return (
        docs_ds.map_batches(_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
        .groupby(["lang", "pred_lang"])
        .sum("n")
        .map_batches(_finish, batch_format="pyarrow", zero_copy_batch=True)
    )


def _lang_confusion_sql() -> str:
    from .textstats import _lang_id_sql

    return f"""
    SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n
    FROM documents d
    JOIN ({_lang_id_sql()}) p USING (doc_id)
    GROUP BY 1, 2
    """


register(
    "doc_lang_confusion",
    lambda sf: lang_confusion(
        _read(sf, "documents", ["doc_id", "text", "lang"])),
    _lang_confusion_sql(),
)


# ---------------------------------------------------------------------------
# Duplication rate by source (which provenance contributes the dup mass?)
# ---------------------------------------------------------------------------

def dup_rate_by_source(docs_ds):
    """Per ``source``: document count, documents whose exact-content
    fingerprint group has >1 member anywhere in the corpus, and the dup
    rate — the provenance attribution of the duplicate mass.

    Scale shape: project (fingerprint, source), ONE fingerprint-sharded
    groupby flags dup membership and collapses each shard to per-source
    partials (at most |sources| rows per shard), then a tiny
    ``groupby(source)`` merge (|sources| is small by definition).
    """

    def _project(batch: pa.Table) -> pa.Table:
        fps = content_fingerprints(batch.column("text"))
        return pa.table({
            "fingerprint": pa.array(fps, pa.string()),
            "source": batch.column("source"),
            "shard": pa.array(
                hash_shards(np.asarray(fps, dtype=object), DUPSIZE_SHARDS)),
        })

    def _shard_flags(df: pd.DataFrame) -> pd.DataFrame:
        group_size = df.groupby("fingerprint", sort=False)["source"] \
            .transform("size")
        out = pd.DataFrame({
            "source": df["source"].to_numpy(),
            "n_docs": np.ones(len(df), np.int64),
            "n_duped": (group_size.to_numpy() > 1).astype(np.int64),
        })
        g = out.groupby("source", sort=False).sum().reset_index()
        g["n_docs"] = g["n_docs"].astype(np.int64)
        g["n_duped"] = g["n_duped"].astype(np.int64)
        return g

    def _finish(batch: pa.Table) -> pa.Table:
        n = batch.column("sum(n_docs)").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        d = batch.column("sum(n_duped)").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        from ._util import round_half_away

        return pa.table({
            "source": batch.column("source"),
            "n_docs": pa.array(n, pa.int64()),
            "n_duped": pa.array(d, pa.int64()),
            "dup_rate": pa.array(
                round_half_away(d.astype(np.float64) / n), pa.float64()),
        })

    return (
        docs_ds.map_batches(_project, batch_format="pyarrow",
                            zero_copy_batch=True)
        .groupby("shard")
        .map_groups(_shard_flags, batch_format="pandas")
        .groupby("source")
        .sum(["n_docs", "n_duped"])
        .map_batches(_finish, batch_format="pyarrow", zero_copy_batch=True)
    )


# ---------------------------------------------------------------------------
# Exact per-language document-length deciles (histogram closure)
# ---------------------------------------------------------------------------

DECILES = tuple(p / 10 for p in range(1, 10))


def lang_len_deciles(docs_ds):
    """Exact ``quantile_disc`` deciles of ``n_chars`` per language.

    Scale shape: unlike ``sketches.group_percentiles`` (which ships every
    row of a group to one task), this exploits the bounded integer domain
    of ``n_chars``: each block collapses to (lang, n_chars) -> count
    partials, so the ONLY exchange carries at most
    |langs| x |distinct lengths| histogram rows; the per-lang closure
    reads cumulative counts off the merged histogram.  Discrete-quantile
    rank ``ceil(n*p)-1`` matches DuckDB ``quantile_disc`` (same pick as
    ``sketches.group_percentiles``).
    """

    def _partial(batch: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame({
                "lang": batch.column("lang").to_pandas(),
                "n_chars": batch.column("n_chars").to_numpy(
                    zero_copy_only=False).astype(np.int64),
            })
            .groupby(["lang", "n_chars"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _close(df: pd.DataFrame) -> pd.DataFrame:
        hist = df.groupby("n_chars", sort=True)["n"].sum()
        values = hist.index.to_numpy()
        cum = hist.to_numpy().cumsum()
        n = int(cum[-1])
        row = {"lang": [df["lang"].iloc[0]], "n_docs": np.int64(n)}
        for p in DECILES:
            rank = max(int(np.ceil(n * p)) - 1, 0)
            row[f"p{int(p * 100)}"] = np.int64(
                values[np.searchsorted(cum, rank + 1, side="left")])
        return pd.DataFrame(row)

    return (
        docs_ds.map_batches(_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
        .groupby("lang")
        .map_groups(_close, batch_format="pandas")
    )


register(
    "doc_lang_len_deciles",
    lambda sf: lang_len_deciles(_read(sf, "documents", ["lang", "n_chars"])),
    f"""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           {', '.join(f"CAST(quantile_disc(n_chars, {p:.1f}) AS BIGINT)"
                      f" AS p{int(p * 100)}" for p in DECILES)}
    FROM documents GROUP BY lang
    """,
)


register(
    "doc_dup_rate_by_source",
    lambda sf: dup_rate_by_source(
        _read(sf, "documents", ["text", "source"])),
    rf"""
    WITH f AS (
        SELECT source,
               md5(regexp_replace(
                   regexp_replace(text, '^\s+|\s+$', '', 'g'),
                   '{_WS}', ' ', 'g')) AS fp
        FROM documents
    ),
    sized AS (
        SELECT source, count(*) OVER (PARTITION BY fp) AS gsize FROM f
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE gsize > 1) AS BIGINT) AS n_duped,
           round(CAST(count(*) FILTER (WHERE gsize > 1) AS DOUBLE)
                 / count(*), 6) AS dup_rate
    FROM sized GROUP BY source
    """,
)
