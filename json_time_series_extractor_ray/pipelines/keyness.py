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


# ---------------------------------------------------------------------------
# Zipf slope per source (log-log OLS over the top-N token ranks)
# ---------------------------------------------------------------------------

ZIPF_TOP_N = 50


def zipf_slope(docs_ds, *, top_n: int = ZIPF_TOP_N):
    """Per source: the OLS slope of ``ln(freq)`` on ``ln(rank)`` over the
    source's ``top_n`` most frequent words (natural language sits near
    -1; synthetic/templated text drifts off) plus the fit's r².

    Rank ties break by word (ascending) on EXACT integer counts, so both
    engines rank identically; the regression inputs are ``ln`` of exact
    ints and the closed-form slope/r² is one identical IEEE expression,
    rounded to 6.

    Scale shape: per-block (source, word) count partials -> ONE
    vocab-keyed shuffle -> per-block top-n candidates (exact global
    top-n lives in their union) -> one tiny per-source regression task.
    """

    def _counts(batch: pa.Table) -> pa.Table:
        words, offsets, _ = _words_and_offsets(batch.column("text"))
        n_words = np.diff(offsets)
        src = np.repeat(batch.column("source")
                        .to_numpy(zero_copy_only=False), n_words)
        df = pd.DataFrame({"source": src, "word": words.to_pandas()})
        g = df.groupby(["source", "word"], sort=False).size() \
            .rename("cnt").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.iloc[:1][["source", "word"]].copy()
        out["cnt"] = np.int64(df["cnt"].sum())
        return out

    def _block_topn(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["source", "cnt", "word"],
                               ascending=[True, False, True])
                .groupby("source", sort=False).head(top_n))

    def _fit(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cnt", "word"],
                            ascending=[False, True]).head(top_n)
        n = len(df)
        if n < 3:
            return pd.DataFrame({
                "source": pd.Series([], dtype=object),
                "n_ranks": pd.Series([], dtype="int64"),
                "zipf_slope": pd.Series([], dtype="float64"),
                "r2": pd.Series([], dtype="float64"),
            })
        x = np.log(np.arange(1, n + 1, dtype=np.float64))
        y = np.log(df["cnt"].to_numpy(np.int64).astype(np.float64))
        sx, sy = x.sum(), y.sum()
        sxx, sxy, syy = (x * x).sum(), (x * y).sum(), (y * y).sum()
        # slope = (n*sxy - sx*sy) / (n*sxx - sx*sx); r2 = slope^2 * varx/vary
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        denom = (n * sxx - sx * sx) * (n * syy - sy * sy)
        r2 = ((n * sxy - sx * sy) * (n * sxy - sx * sy) / denom
              if denom > 0 else np.nan)
        return pd.DataFrame({
            "source": [df["source"].iloc[0]],
            "n_ranks": pd.Series([n], dtype="int64"),
            "zipf_slope": round_half_away(np.array([slope]), 6),
            "r2": round_half_away(np.array([r2]), 6),
        })

    counts = (
        docs_ds.map_batches(_counts, batch_format="pyarrow",
                            zero_copy_batch=True)
        .groupby(["source", "word"]).map_groups(_merge,
                                                batch_format="pandas")
    )
    return (
        counts.map_batches(_block_topn, batch_format="pandas")
        .groupby("source").map_groups(_fit, batch_format="pandas")
    )


def _zipf_sql() -> str:
    from .dedup import _WS

    return rf"""
    WITH w AS (
        SELECT source,
               unnest(string_split_regex(
                   regexp_replace(text, '^\s+|\s+$', '', 'g'), '{_WS}'
               )) AS word
        FROM documents
    ),
    c AS (SELECT source, word, count(*) AS cnt FROM w GROUP BY 1, 2),
    r AS (
        SELECT source, cnt,
               row_number() OVER (PARTITION BY source
                                  ORDER BY cnt DESC, word) AS rnk
        FROM c QUALIFY rnk <= {ZIPF_TOP_N}
    ),
    m AS (
        SELECT source,
               count(*) AS n,
               sum(ln(rnk)) AS sx, sum(ln(cnt)) AS sy,
               sum(ln(rnk) * ln(rnk)) AS sxx,
               sum(ln(rnk) * ln(cnt)) AS sxy,
               sum(ln(cnt) * ln(cnt)) AS syy
        FROM r GROUP BY 1
        HAVING count(*) >= 3
    )
    SELECT source, CAST(n AS BIGINT) AS n_ranks,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
               AS zipf_slope,
           CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
                THEN round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                           / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
                           6)
           END AS r2
    FROM m
    """


register(
    "source_zipf_slope",
    lambda sf: zipf_slope(_read_documents(sf, ["text", "source"])),
    _zipf_sql(),
)


# ---------------------------------------------------------------------------
# Burrows' Delta: stylometric distance between every source pair
# ---------------------------------------------------------------------------

DELTA_TOP_N = 30

#: The pairwise stage holds #sources x top_n z-scores in one task.
MAX_DELTA_SOURCES = 10_000


def burrows_delta(docs_ds, *, top_n: int = DELTA_TOP_N):
    """Burrows' Delta between all source pairs: for the corpus' ``top_n``
    words overall, z-score each source's RELATIVE frequency across
    sources, then ``delta(a, b) = mean |z_a - z_b|`` — the standard
    authorship-attribution distance (Burrows 2002).

    Exactness: relative frequencies are rounded ratios of exact ints
    (round-8 for headroom: they are ~1e-2-scale), the per-word
    mean/std across sources aggregate a FIXED small vector (one value
    per source), and the final mean-of-absolute-differences rounds to 6
    on both engines.

    Scale shape: two count shuffles ((source, word) partials; corpus
    word totals for the top-n pick are per-block top-n candidates like
    ``zipf_slope``) — then the z/pair stage runs in ONE task over a
    (sources x top_n) matrix, loudly bounded by ``MAX_DELTA_SOURCES``
    (pairwise output is quadratic in sources BY DEFINITION; a wide
    source space wants blocking on metadata first).
    """

    def _counts(batch: pa.Table) -> pa.Table:
        words, offsets, _ = _words_and_offsets(batch.column("text"))
        n_words = np.diff(offsets)
        src = np.repeat(batch.column("source")
                        .to_numpy(zero_copy_only=False), n_words)
        df = pd.DataFrame({"source": src, "word": words.to_pandas()})
        g = df.groupby(["source", "word"], sort=False).size() \
            .rename("cnt").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.iloc[:1][["source", "word"]].copy()
        out["cnt"] = np.int64(df["cnt"].sum())
        return out

    counts = (
        docs_ds.map_batches(_counts, batch_format="pyarrow",
                            zero_copy_batch=True)
        .groupby(["source", "word"]).map_groups(_merge,
                                                batch_format="pandas")
    ).materialize()  # (source, word) table: reused for top-n AND the z stage

    def _word_totals(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("word", sort=False)["cnt"].sum().rename("tot") \
            .reset_index()
        return g.sort_values(["tot", "word"],
                             ascending=[False, True]).head(top_n)

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__one")
        # exact global top-n words (ties: word asc)
        totals = df.groupby("word", sort=False)["cnt"].sum() \
            .rename("tot").reset_index()
        top = totals.sort_values(["tot", "word"],
                                 ascending=[False, True]).head(top_n)
        words = top["word"].tolist()
        sources = sorted(df["source"].unique())
        if len(sources) > MAX_DELTA_SOURCES:
            raise ValueError(
                f"burrows_delta saw {len(sources)} sources "
                f"(> MAX_DELTA_SOURCES={MAX_DELTA_SOURCES}); pairwise "
                "output is quadratic in sources — block on metadata "
                "first")
        src_tot = df.groupby("source", sort=False)["cnt"].sum()
        mat = df.pivot_table(index="source", columns="word",
                             values="cnt", aggfunc="sum", fill_value=0) \
            .reindex(index=sources, columns=words, fill_value=0)
        rel = round_half_away(
            mat.to_numpy(np.float64)
            / src_tot.reindex(sources).to_numpy(np.int64)[:, None], 8)
        ns = len(sources)
        mu = rel.sum(axis=0) / ns
        sd = np.sqrt(((rel - mu) ** 2).sum(axis=0) / (ns - 1))
        ok = sd > 0
        z = np.zeros_like(rel)
        z[:, ok] = (rel[:, ok] - mu[ok]) / sd[ok]
        out_a, out_b, out_d = [], [], []
        for i in range(ns):
            for j in range(i + 1, ns):
                out_a.append(sources[i])
                out_b.append(sources[j])
                out_d.append(np.abs(z[i] - z[j]).sum() / len(words))
        return pd.DataFrame({
            "source_a": pd.Series(out_a, dtype=object),
            "source_b": pd.Series(out_b, dtype=object),
            "delta": round_half_away(np.asarray(out_d), 6),
        })

    withk = counts.map_batches(
        lambda t: t.append_column("__one", pa.array([0] * t.num_rows,
                                                    pa.int32())),
        batch_format="pyarrow", zero_copy_batch=True)
    return withk.groupby("__one").map_groups(_pairs,
                                             batch_format="pandas")


def _delta_sql() -> str:
    from .dedup import _WS

    return rf"""
    WITH w AS (
        SELECT source,
               unnest(string_split_regex(
                   regexp_replace(text, '^\s+|\s+$', '', 'g'), '{_WS}'
               )) AS word
        FROM documents
    ),
    c AS (SELECT source, word, count(*) AS cnt FROM w GROUP BY 1, 2),
    st AS (SELECT source, sum(cnt) AS tot FROM c GROUP BY 1),
    topw AS (
        SELECT word FROM (
            SELECT word, sum(cnt) AS wt FROM c GROUP BY 1
        ) ORDER BY wt DESC, word LIMIT {DELTA_TOP_N}
    ),
    grid AS (SELECT s.source, t.word FROM st s CROSS JOIN topw t),
    rel AS (
        SELECT g.source, g.word,
               round(COALESCE(c.cnt, 0) / CAST(st.tot AS DOUBLE), 8) AS r
        FROM grid g
        LEFT JOIN c ON c.source = g.source AND c.word = g.word
        JOIN st ON st.source = g.source
    ),
    stats AS (
        SELECT word, sum(r) / count(*) AS mu, count(*) AS ns
        FROM rel GROUP BY 1
    ),
    var_ AS (
        SELECT rel.word,
               sum((r - mu) * (r - mu)) / (ns - 1) AS v
        FROM rel JOIN stats USING (word)
        GROUP BY rel.word, ns
    ),
    z AS (
        SELECT rel.source, rel.word,
               CASE WHEN v > 0 THEN (r - mu) / sqrt(v)
                    ELSE 0.0 END AS z
        FROM rel JOIN stats USING (word) JOIN var_ USING (word)
    )
    SELECT a.source AS source_a, b.source AS source_b,
           round(sum(abs(a.z - b.z)) / count(*), 6) AS delta
    FROM z a JOIN z b ON a.word = b.word AND a.source < b.source
    GROUP BY 1, 2
    """


register(
    "source_burrows_delta",
    lambda sf: burrows_delta(_read_documents(sf, ["text", "source"])),
    _delta_sql(),
)


# ---------------------------------------------------------------------------
# Corpus conditional entropy H(next word | word) + perplexity
# ---------------------------------------------------------------------------

def word_conditional_entropy(docs_ds):
    """Corpus-level conditional entropy of the next word given the
    current word (within-document adjacency):

        H(Y|X) = -sum_{x,y} (c_xy / N) * ln(c_xy / c_x)

    plus ``perplexity = exp(H)`` — the classic "how predictable is the
    corpus under a bigram model" number (nats).

    Scale shape: per-block bigram count partials -> ONE (w1, w2)
    shuffle; ``c_x`` needs no join — a second groupby on ``w1`` hands
    each task all of one predecessor's bigrams, which is exactly where
    the per-group entropy terms are computable; N broadcasts as one
    scalar.  Entropy terms are ratios of exact ints; the sum rounds
    to 6 (ULP summation noise ~1e-13 against O(1) entropy).
    """

    def _bigrams(batch: pa.Table) -> pa.Table:
        words, offsets, _ = _words_and_offsets(batch.column("text"))
        w = words.to_pandas().to_numpy(dtype=object)
        n_words = np.diff(offsets)
        # adjacency WITHIN a document: drop the last word of each doc
        keep = np.ones(len(w), dtype=bool)
        ends = offsets[1:][n_words > 0] - 1
        keep[ends] = False
        w1 = w[keep]
        nxt = np.ones(len(w), dtype=bool)
        starts = offsets[:-1][n_words > 0]
        nxt[starts] = False
        w2 = w[nxt]
        df = pd.DataFrame({"w1": w1, "w2": w2})
        g = df.groupby(["w1", "w2"], sort=False).size().rename("cnt") \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.iloc[:1][["w1", "w2"]].copy()
        out["cnt"] = np.int64(df["cnt"].sum())
        return out

    bigrams = (
        docs_ds.map_batches(_bigrams, batch_format="pyarrow",
                            zero_copy_batch=True)
        .groupby(["w1", "w2"]).map_groups(_merge, batch_format="pandas")
    ).materialize()  # bigram-vocab-sized; reused for N and the terms
    n_total = int(bigrams.sum("cnt"))

    def _terms(df: pd.DataFrame) -> pd.DataFrame:
        c = df["cnt"].to_numpy(np.int64)
        cx = int(c.sum())
        contrib = float(np.sum(-(c / n_total) * np.log(c / cx)))
        return pd.DataFrame({
            "contrib": pd.Series([contrib], dtype="float64"),
            "n_x": pd.Series([1], dtype="int64"),
        })

    partials = bigrams.groupby("w1").map_groups(_terms,
                                                batch_format="pandas")
    sums = partials.sum(["contrib", "n_x"])
    h = float(sums["sum(contrib)"] or 0.0)
    h_r = float(round_half_away(np.float64(h), 6))
    return pd.DataFrame({
        "n_bigrams": pd.Series([n_total], dtype="int64"),
        "vocab_x": pd.Series([int(sums["sum(n_x)"] or 0)], dtype="int64"),
        "cond_entropy": [h_r],
        "perplexity": [float(round_half_away(np.float64(np.exp(h_r)), 6))],
    })


def _cond_entropy_sql() -> str:
    from .dedup import _WS

    return rf"""
    WITH w AS (
        SELECT doc_id,
               regexp_split_to_array(
                   regexp_replace(text, '^\s+|\s+$', '', 'g'), '{_WS}'
               ) AS words
        FROM documents
    ),
    pos AS (
        SELECT doc_id, unnest(words) AS word,
               generate_subscripts(words, 1) AS i
        FROM w
    ),
    bg AS (
        SELECT word AS w1, lead(word) OVER win AS w2
        FROM pos
        WINDOW win AS (PARTITION BY doc_id ORDER BY i)
        QUALIFY lead(word) OVER win IS NOT NULL
    ),
    c AS (SELECT w1, w2, count(*) AS cnt FROM bg GROUP BY 1, 2),
    cx AS (SELECT w1, sum(cnt) AS cxt FROM c GROUP BY 1),
    tot AS (SELECT sum(cnt) AS n FROM c),
    h AS (
        SELECT round(-sum((cnt / CAST(n AS DOUBLE))
                          * ln(cnt / CAST(cxt AS DOUBLE))), 6) AS hh,
               CAST(max(n) AS BIGINT) AS n_bigrams,
               CAST(count(DISTINCT c.w1) AS BIGINT) AS vocab_x
        FROM c JOIN cx USING (w1), tot
    )
    SELECT n_bigrams, vocab_x, hh AS cond_entropy,
           round(exp(hh), 6) AS perplexity
    FROM h
    """


register(
    "corpus_word_cond_entropy",
    lambda sf: word_conditional_entropy(
        _read_documents(sf, ["doc_id", "text"])),
    _cond_entropy_sql(),
)


# ---------------------------------------------------------------------------
# Vocabulary concentration: corpus share covered by the top-k words
# ---------------------------------------------------------------------------

VOCAB_KS = (10, 100, 1000)


def vocab_topk_share(docs_ds, *, ks=VOCAB_KS):
    """How head-heavy is the vocabulary: for each k, the fraction of all
    word occurrences covered by the k most frequent words (ranked by
    count desc, word asc — fully deterministic).  Exact integer
    arithmetic until the final rounded share.

    Scale shape: (word) count partials -> ONE vocab shuffle -> per-block
    top-max(k) candidates -> one tiny task computes every k's share;
    the total occurrence count folds from the same materialized table.
    """
    kmax = max(ks)

    def _counts(batch: pa.Table) -> pa.Table:
        words, _, _ = _words_and_offsets(batch.column("text"))
        df = pd.DataFrame({"word": words.to_pandas()})
        g = df.groupby("word", sort=False).size().rename("cnt") \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.iloc[:1][["word"]].copy()
        out["cnt"] = np.int64(df["cnt"].sum())
        return out

    counts = (
        docs_ds.map_batches(_counts, batch_format="pyarrow",
                            zero_copy_batch=True)
        .groupby("word").map_groups(_merge, batch_format="pandas")
    ).materialize()
    total = int(counts.sum("cnt"))

    def _block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["cnt", "word"],
                              ascending=[False, True]).head(kmax)

    def _shares(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__one").sort_values(
            ["cnt", "word"], ascending=[False, True], ignore_index=True)
        c = df["cnt"].to_numpy(np.int64)
        rows = []
        for k in sorted(ks):
            covered = int(c[:k].sum())
            rows.append((k, covered,
                         float(round_half_away(
                             np.float64(covered / total), 6))))
        return pd.DataFrame({
            "k": pd.Series([r[0] for r in rows], dtype="int64"),
            "covered": pd.Series([r[1] for r in rows], dtype="int64"),
            "share": pd.Series([r[2] for r in rows], dtype="float64"),
        })

    withk = counts.map_batches(_block_topk, batch_format="pandas") \
        .map_batches(
            lambda t: t.append_column("__one", pa.array([0] * t.num_rows,
                                                        pa.int32())),
            batch_format="pyarrow", zero_copy_batch=True)
    return withk.groupby("__one").map_groups(_shares,
                                             batch_format="pandas")


def _topk_share_sql() -> str:
    from .dedup import _WS

    ks = ", ".join(f"({k})" for k in sorted(VOCAB_KS))
    return rf"""
    WITH w AS (
        SELECT unnest(string_split_regex(
                   regexp_replace(text, '^\s+|\s+$', '', 'g'), '{_WS}'
               )) AS word
        FROM documents
    ),
    c AS (SELECT word, count(*) AS cnt FROM w GROUP BY 1),
    r AS (
        SELECT cnt, row_number() OVER (ORDER BY cnt DESC, word) AS rnk
        FROM c
    ),
    tot AS (SELECT sum(cnt) AS n FROM c)
    SELECT CAST(k.k AS BIGINT) AS k,
           CAST(COALESCE(sum(r.cnt) FILTER (r.rnk <= k.k), 0) AS BIGINT)
               AS covered,
           round(COALESCE(sum(r.cnt) FILTER (r.rnk <= k.k), 0)
                 / CAST(tot.n AS DOUBLE), 6) AS share
    FROM (VALUES {ks}) k(k), r, tot
    GROUP BY k.k, tot.n
    """


register(
    "corpus_vocab_topk_share",
    lambda sf: vocab_topk_share(_read_documents(sf, ["doc_id", "text"])
                                .drop_columns(["doc_id"])),
    _topk_share_sql(),
)


# ---------------------------------------------------------------------------
# Hapax legomena rate per source (lexical richness)
# ---------------------------------------------------------------------------

def hapax_rate(docs_ds):
    """Per source: vocabulary size, hapax count (words occurring exactly
    once IN THAT SOURCE), the hapax share of the vocabulary, and the
    type-token ratio — the classic lexical-richness panel.  Exact
    integer counts; the two ratios round to 6.

    Scale shape: per-block (source, word) partials -> ONE shuffle ->
    per-(source, word) totals collapse to per-source counters in the
    same pass (a second tiny groupby folds the partials)."""

    def _counts(batch: pa.Table) -> pa.Table:
        words, offsets, _ = _words_and_offsets(batch.column("text"))
        n_words = np.diff(offsets)
        src = np.repeat(batch.column("source")
                        .to_numpy(zero_copy_only=False), n_words)
        df = pd.DataFrame({"source": src, "word": words.to_pandas()})
        g = df.groupby(["source", "word"], sort=False).size() \
            .rename("cnt").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def _word_total(df: pd.DataFrame) -> pd.DataFrame:
        out = df.iloc[:1][["source"]].copy()
        cnt = int(df["cnt"].sum())
        out["vocab"] = np.int64(1)
        out["hapax"] = np.int64(1 if cnt == 1 else 0)
        out["tokens"] = np.int64(cnt)
        return out

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        vocab = int(df["vocab"].sum())
        hapax = int(df["hapax"].sum())
        tokens = int(df["tokens"].sum())
        return pd.DataFrame({
            "source": df["source"].iloc[:1],
            "vocab": pd.Series([vocab], dtype="int64"),
            "hapax": pd.Series([hapax], dtype="int64"),
            "tokens": pd.Series([tokens], dtype="int64"),
            "hapax_share": round_half_away(
                np.array([hapax / vocab]), 6),
            "ttr": round_half_away(np.array([vocab / tokens]), 6),
        })

    return (
        docs_ds.map_batches(_counts, batch_format="pyarrow",
                            zero_copy_batch=True)
        .groupby(["source", "word"]).map_groups(_word_total,
                                                batch_format="pandas")
        .groupby("source").map_groups(_fold, batch_format="pandas")
    )


def _hapax_sql() -> str:
    from .dedup import _WS

    return rf"""
    WITH w AS (
        SELECT source,
               unnest(string_split_regex(
                   regexp_replace(text, '^\s+|\s+$', '', 'g'), '{_WS}'
               )) AS word
        FROM documents
    ),
    c AS (SELECT source, word, count(*) AS cnt FROM w GROUP BY 1, 2)
    SELECT source,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS hapax,
           CAST(sum(cnt) AS BIGINT) AS tokens,
           round(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS hapax_share,
           round(count(*) / CAST(sum(cnt) AS DOUBLE), 6) AS ttr
    FROM c GROUP BY 1
    """


register(
    "source_hapax_rate",
    lambda sf: hapax_rate(_read_documents(sf, ["text", "source"])),
    _hapax_sql(),
)


# ---------------------------------------------------------------------------
# Vocabulary Gini per source: inequality of word usage
# ---------------------------------------------------------------------------

def vocab_gini(docs_ds):
    """Per source: the Gini coefficient of its word-frequency
    distribution — 0 = every word equally common, near 1 = a few words
    dominate.  Computed with the exact rank-weighted integer sum

        G = sum_i (2i - n - 1) * c_(i) / (n * sum_i c_i)

    over counts sorted ascending (ties commute, so tie order is
    irrelevant); everything is int64 until the final rounded division.

    Scale shape: the usual (source, word) partial shuffle; each source's
    Gini runs in one vocab-bounded task (vectorized sort + dot)."""

    def _counts(batch: pa.Table) -> pa.Table:
        words, offsets, _ = _words_and_offsets(batch.column("text"))
        n_words = np.diff(offsets)
        src = np.repeat(batch.column("source")
                        .to_numpy(zero_copy_only=False), n_words)
        df = pd.DataFrame({"source": src, "word": words.to_pandas()})
        g = df.groupby(["source", "word"], sort=False).size() \
            .rename("cnt").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.iloc[:1][["source", "word"]].copy()
        out["cnt"] = np.int64(df["cnt"].sum())
        return out

    def _gini(df: pd.DataFrame) -> pd.DataFrame:
        c = np.sort(df["cnt"].to_numpy(np.int64))
        n = len(c)
        tot = int(c.sum())
        i = np.arange(1, n + 1, dtype=np.int64)
        num = int(np.sum((2 * i - n - 1) * c))
        return pd.DataFrame({
            "source": df["source"].iloc[:1],
            "vocab": pd.Series([n], dtype="int64"),
            "tokens": pd.Series([tot], dtype="int64"),
            "gini": round_half_away(np.array([num / (n * tot)]), 6),
        })

    return (
        docs_ds.map_batches(_counts, batch_format="pyarrow",
                            zero_copy_batch=True)
        .groupby(["source", "word"]).map_groups(_merge,
                                                batch_format="pandas")
        .groupby("source").map_groups(_gini, batch_format="pandas")
    )


def _vocab_gini_sql() -> str:
    from .dedup import _WS

    return rf"""
    WITH w AS (
        SELECT source,
               unnest(string_split_regex(
                   regexp_replace(text, '^\s+|\s+$', '', 'g'), '{_WS}'
               )) AS word
        FROM documents
    ),
    c AS (SELECT source, word, count(*) AS cnt FROM w GROUP BY 1, 2),
    r AS (
        SELECT source, cnt,
               row_number() OVER (PARTITION BY source
                                  ORDER BY cnt, word) AS i,
               count(*) OVER (PARTITION BY source) AS n,
               sum(cnt) OVER (PARTITION BY source) AS tot
        FROM c
    )
    SELECT source,
           CAST(max(n) AS BIGINT) AS vocab,
           CAST(max(tot) AS BIGINT) AS tokens,
           round(sum((2 * i - n - 1) * cnt)
                 / CAST(max(n) * max(tot) AS DOUBLE), 6) AS gini
    FROM r GROUP BY 1
    """


register(
    "source_vocab_gini",
    lambda sf: vocab_gini(_read_documents(sf, ["text", "source"])),
    _vocab_gini_sql(),
)
