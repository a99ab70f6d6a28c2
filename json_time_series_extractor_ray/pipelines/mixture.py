"""Temperature-based data-mixture weights per source.

The standard multilingual/multi-source LLM sampling scheme (the
"temperature" / alpha-smoothed mixture of mT5 and XLM-R): source ``i``
with ``c_i`` documents samples with probability
``w_i = c_i^alpha / sum_j c_j^alpha``; ``alpha < 1`` up-weights small
sources.  The report carries the raw share, the smoothed weight, and
the resulting boost factor — the inputs a mixture-sampling stage
(``split.mixture_sample``) consumes.

Scale shape: per-block ``value_counts`` partials collapse the corpus to
(source, count) rows before ONE tiny shuffle; the weight normalization
needs every source's count in one place, which is a DELIBERATE
single-task step over #sources rows (sources are a curated handful;
guarded loudly).

Rounding parity: the repo's ratio discipline — ``c^alpha`` rounds to 6
decimals FIRST, and the final ratios divide already-rounded inputs, so
cross-engine ULP noise (pow, summation order) stays far inside the
round-6 window.

Reference anchor: extraction-only reference (SURVEY.md §2); extends the
engine-mandated curation/sampling family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import round_half_away
from .dedup import _read
from .registry import register

MIXTURE_ALPHA = 0.7

#: The normalization task holds one row per source.
MAX_SOURCES = 1_000_000


def mixture_weights(docs_ds, *, alpha: float = MIXTURE_ALPHA):
    """Per source: document count, raw share, temperature weight, boost."""

    def _partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vc = pc.value_counts(batch.column("source"))
        return pa.table({
            "source": vc.field("values"),
            "cnt": vc.field("counts").cast(pa.int64()),
        })

    def _weights(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) > MAX_SOURCES:
            raise ValueError(
                f"mixture_weights saw {len(df)} sources "
                f"(> MAX_SOURCES={MAX_SOURCES}); a key space this wide "
                "wants bucketed shares, not per-source weights"
            )
        g = df.groupby("source", sort=True)["cnt"].sum()
        c = g.to_numpy(np.int64)
        pw = round_half_away(np.power(c.astype(np.float64), alpha), 6)
        tot_pw = pw.sum()  # summation-order ULP noise absorbed by round-6
        tot_c = c.sum()
        return pd.DataFrame({
            "source": g.index.to_numpy(dtype=object),
            "n_docs": pd.Series(c, dtype="int64"),
            "raw_share": round_half_away(c / tot_c, 6),
            "weight": round_half_away(pw / tot_pw, 6),
            "boost": round_half_away(
                round_half_away(pw / tot_pw, 6) / round_half_away(
                    c / tot_c, 6), 6),
        })

    partials = docs_ds.map_batches(_partial, batch_format="pyarrow",
                                   zero_copy_batch=True)
    # constant grouping key -> ONE normalization task over #sources rows
    withk = partials.map_batches(
        lambda t: t.append_column("__one", pa.array([0] * t.num_rows,
                                                    pa.int32())),
        batch_format="pyarrow", zero_copy_batch=True)
    return withk.groupby("__one").map_groups(
        lambda df: _weights(df.drop(columns="__one")),
        batch_format="pandas")


register(
    "source_mixture_weights",
    lambda sf: mixture_weights(_read(sf, "documents", ["doc_id", "source"])
                               .drop_columns(["doc_id"])),
    f"""
    WITH c AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1
    ),
    p AS (
        SELECT source, n_docs,
               round(pow(n_docs, {MIXTURE_ALPHA}), 6) AS pw
        FROM c
    ),
    t AS (
        SELECT source, n_docs,
               round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (), 6)
                   AS raw_share,
               round(pw / sum(pw) OVER (), 6) AS weight
        FROM p
    )
    SELECT source, n_docs, raw_share, weight,
           round(weight / raw_share, 6) AS boost
    FROM t
    """,
)


TOKEN_BUDGET = 1_000_000  # planning target (chars as the token proxy)


def token_budget_plan(docs_ds, *, budget: int = TOKEN_BUDGET,
                      alpha: float = MIXTURE_ALPHA):
    """Mixture planning one level deeper than ``mixture_weights``: given
    a total token budget, how many tokens each source contributes under
    the temperature weights, and how many EPOCHS of that source this
    implies (> 1 = the source up-samples / repeats).  ``n_chars`` is the
    deterministic token proxy the fixtures carry.

    Same scale shape as ``mixture_weights`` (per-block partials, one
    tiny normalization task); all ratios divide already-rounded inputs.
    """

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", sort=False).agg(
            n_docs=("n_chars", "size"),
            n_tokens=("n_chars", "sum")).reset_index()
        return g

    def _plan(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", sort=True).agg(
            n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum"))
        c = g["n_docs"].to_numpy(np.int64)
        tok = g["n_tokens"].to_numpy(np.int64)
        pw = round_half_away(np.power(c.astype(np.float64), alpha), 6)
        w = round_half_away(pw / pw.sum(), 6)
        planned = round_half_away(w * budget, 2)
        return pd.DataFrame({
            "source": g.index.to_numpy(dtype=object),
            "n_docs": pd.Series(c, dtype="int64"),
            "available_tokens": pd.Series(tok, dtype="int64"),
            "weight": w,
            "planned_tokens": planned,
            "epochs": round_half_away(planned / tok, 6),
        })

    partials = docs_ds.map_batches(_partial, batch_format="pandas")
    withk = partials.map_batches(
        lambda t: t.append_column("__one", pa.array([0] * t.num_rows,
                                                    pa.int32())),
        batch_format="pyarrow", zero_copy_batch=True)
    return withk.groupby("__one").map_groups(
        lambda df: _plan(df.drop(columns="__one")),
        batch_format="pandas")


register(
    "source_token_budget",
    lambda sf: token_budget_plan(
        _read(sf, "documents", ["source", "n_chars"])),
    f"""
    WITH c AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS available_tokens
        FROM documents GROUP BY 1
    ),
    p AS (
        SELECT *, round(pow(n_docs, {MIXTURE_ALPHA}), 6) AS pw FROM c
    ),
    t AS (
        SELECT source, n_docs, available_tokens,
               round(pw / sum(pw) OVER (), 6) AS weight
        FROM p
    )
    SELECT source, n_docs, available_tokens, weight,
           round(weight * {TOKEN_BUDGET}, 2) AS planned_tokens,
           round(round(weight * {TOKEN_BUDGET}, 2)
                 / CAST(available_tokens AS DOUBLE), 6) AS epochs
    FROM t
    """,
)
