"""Corpus keyness: which words distinguish the two largest sources.

The classic corpus-linguistics comparison (log-odds ratio with Haldane
+0.5 smoothing, z-scored — the uninformative-prior variant of Monroe et
al.'s "Fightin' Words"): for word w with counts ``y1``/``y2`` in the
two sources (totals ``n1``/``n2``),

    delta = ln((y1+.5)/(n1-y1+.5)) - ln((y2+.5)/(n2-y2+.5))
    z     = delta / sqrt(1/(y1+.5) + 1/(n1-y1+.5)
                         + 1/(y2+.5) + 1/(n2-y2+.5))

The report returns the 15 most source-1-leaning and 15 most
source-2-leaning words.  Selection compares the ROUNDED z (ties break
on the word), so both engines pick identical rows.

Scale shape: per-block (source, word) count partials collapse the
corpus before ONE vocab-keyed shuffle; the per-word z pass is
vectorized; the exact top/bottom-k needs NO global sort — every block
emits its local top/bottom k (the global winners are necessarily in
that union), and one final tiny task merges the bounded candidate set.
The word-count table is materialized ONCE and reused for totals + z
(the dedup.py TF-table discipline — never re-derive a corpus scan).

Reference anchor: extraction-only reference (SURVEY.md §2); extends the
engine-mandated text-analysis family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ._util import round_half_away
from .registry import register
from .textstats import _read_documents, _words_and_offsets

KEYNESS_TOP_K = 15

#: Driver-side source-count table (top-2 pick) — bound it loudly.
MAX_SOURCES = 1_000_000


def _top2_sources(docs_ds) -> tuple:
    """The two sources with the most documents (ties: lexicographic)."""

    def _partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("source"))
        return pa.table({
            "source": vc.field("values"),
            "cnt": vc.field("counts").cast(pa.int64()),
        })

    rows = (
        docs_ds.map_batches(_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
        .groupby("source").sum("cnt").take_all()
    )
    if len(rows) > MAX_SOURCES:
        raise ValueError(
            f"keyness saw {len(rows)} sources (> MAX_SOURCES="
            f"{MAX_SOURCES}); pick the comparison pair explicitly")
    ranked = sorted(rows, key=lambda r: (-r["sum(cnt)"], r["source"]))
    if len(ranked) < 2:
        raise ValueError("keyness needs at least two sources")
    return ranked[0]["source"], ranked[1]["source"]


def source_keyness(docs_ds, *, k: int = KEYNESS_TOP_K):
    """Top-k distinguishing words per side between the 2 largest sources."""
    s1, s2 = _top2_sources(docs_ds)

    def _counts(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("source"),
                        value_set=pa.array([s1, s2]))
        t = batch.filter(keep)
        words, offsets, _ = _words_and_offsets(t.column("text"))
        n_words = np.diff(offsets)
        src = np.repeat(t.column("source").to_numpy(zero_copy_only=False),
                        n_words)
        df = pd.DataFrame({
            "word": words.to_pandas(),
            "one": (src == s1).astype(np.int64),
        })
        g = df.groupby("word", sort=False)["one"] \
            .agg(y1="sum", tc="size").reset_index()
        g["y2"] = (g["tc"] - g["y1"]).astype(np.int64)
        return pa.Table.from_pandas(g[["word", "y1", "y2"]],
                                    preserve_index=False)

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "word": df["word"].iloc[:1],
            "y1": pd.Series([int(df["y1"].sum())], dtype="int64"),
            "y2": pd.Series([int(df["y2"].sum())], dtype="int64"),
        })

    counts = (
        docs_ds.map_batches(_counts, batch_format="pyarrow",
                            zero_copy_batch=True)
        .groupby("word").map_groups(_merge, batch_format="pandas")
    ).materialize()  # vocab-sized; reused for totals AND the z pass
    totals = counts.sum(["y1", "y2"])
    n1, n2 = int(totals["sum(y1)"]), int(totals["sum(y2)"])

    def _z(batch: pa.Table) -> pa.Table:
        y1 = batch.column("y1").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        y2 = batch.column("y2").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        delta = (np.log((y1 + 0.5) / (n1 - y1 + 0.5))
                 - np.log((y2 + 0.5) / (n2 - y2 + 0.5)))
        var = (1.0 / (y1 + 0.5) + 1.0 / (n1 - y1 + 0.5)
               + 1.0 / (y2 + 0.5) + 1.0 / (n2 - y2 + 0.5))
        z = round_half_away(delta / np.sqrt(var), 6)
        return pa.table({
            "word": batch.column("word"),
            "y1": batch.column("y1"),
            "y2": batch.column("y2"),
            "z": pa.array(z, pa.float64()),
        })

    def _block_topk(df: pd.DataFrame) -> pd.DataFrame:
        top = df.sort_values(["z", "word"],
                             ascending=[False, True]).head(k)
        bot = df.sort_values(["z", "word"],
                             ascending=[True, True]).head(k)
        # a small block puts the same word in BOTH its top and bottom k
        return pd.concat([top, bot], ignore_index=True) \
            .drop_duplicates("word", ignore_index=True)

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__one")
        top = df.sort_values(["z", "word"],
                             ascending=[False, True]).head(k)
        bot = df.sort_values(["z", "word"],
                             ascending=[True, True]).head(k)
        top = top.assign(lean=s1)
        bot = bot.assign(lean=s2)
        out = pd.concat([top, bot], ignore_index=True)
        out["lean"] = out["lean"].astype(object)
        return out

    candidates = counts.map_batches(_z, batch_format="pyarrow",
                                    zero_copy_batch=True) \
        .map_batches(_block_topk, batch_format="pandas") \
        .map_batches(
            lambda t: t.append_column(
                "__one", pa.array([0] * t.num_rows, pa.int32())),
            batch_format="pyarrow", zero_copy_batch=True)
    return candidates.groupby("__one").map_groups(_final,
                                                  batch_format="pandas")


def _keyness_sql() -> str:
    from .dedup import _WS

    k = KEYNESS_TOP_K
    return rf"""
    WITH sc AS (
        SELECT source, count(*) AS n FROM documents GROUP BY 1
    ),
    top2 AS (
        SELECT source, row_number() OVER (ORDER BY n DESC, source) AS rn
        FROM sc QUALIFY rn <= 2
    ),
    w AS (
        SELECT t.rn,
               unnest(string_split_regex(
                   regexp_replace(text, '^\s+|\s+$', '', 'g'), '{_WS}'
               )) AS word
        FROM documents d JOIN top2 t USING (source)
    ),
    c AS (
        SELECT word,
               sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS y1,
               sum(CASE WHEN rn = 2 THEN 1 ELSE 0 END) AS y2
        FROM w GROUP BY 1
    ),
    tot AS (SELECT sum(y1) AS n1, sum(y2) AS n2 FROM c),
    z AS (
        SELECT word, CAST(y1 AS BIGINT) AS y1, CAST(y2 AS BIGINT) AS y2,
               round((ln((y1 + 0.5) / (n1 - y1 + 0.5))
                      - ln((y2 + 0.5) / (n2 - y2 + 0.5)))
                     / sqrt(1.0 / (y1 + 0.5) + 1.0 / (n1 - y1 + 0.5)
                            + 1.0 / (y2 + 0.5) + 1.0 / (n2 - y2 + 0.5)),
                     6) AS z
        FROM c, tot
    ),
    t1 AS (
        SELECT word, y1, y2, z,
               (SELECT source FROM top2 WHERE rn = 1) AS lean
        FROM z QUALIFY row_number() OVER (ORDER BY z DESC, word) <= {k}
    ),
    t2 AS (
        SELECT word, y1, y2, z,
               (SELECT source FROM top2 WHERE rn = 2) AS lean
        FROM z QUALIFY row_number() OVER (ORDER BY z ASC, word) <= {k}
    )
    SELECT * FROM t1 UNION ALL SELECT * FROM t2
    """


register(
    "source_keyness",
    lambda sf: source_keyness(_read_documents(sf, ["doc_id", "text",
                                                   "source"])
                              .drop_columns(["doc_id"])),
    _keyness_sql(),
)
