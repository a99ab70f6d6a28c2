"""k-anonymity audit: how re-identifiable is a table under a
quasi-identifier combination.

Privacy-curation staple: group rows by the quasi-identifier (QI) tuple
— here ``(nation, market segment, account-balance bucket)`` — and
report how many equivalence classes fall below ``k`` members (each such
row is re-identifiable within its class).  The summary row carries the
class count, unsafe class/row counts, the smallest class, and the
unsafe-row share.

Scale shape: per-block QI ``value_counts`` partials collapse the table
before ONE small shuffle over distinct QI tuples; a single constant-key
merge task folds the per-class counts into the one summary row (classes
≪ rows by construction — a QI space near row-cardinality is the
finding, not a scale problem, and the distinct-tuple shuffle bounds it
either way).

Reference anchor: extraction-only reference (SURVEY.md §2); extends the
engine-mandated curation family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import round_half_away
from .registry import register

K_ANON = 5
BAL_BUCKET = 1000.0


def k_anonymity(ds, *, qi_cols, k: int = K_ANON):
    """Summary k-anonymity report over pre-bucketed QI columns."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(list(qi_cols), sort=False).size().rename("cnt") \
            .reset_index()
        return g

    def _merge_class(df: pd.DataFrame) -> pd.DataFrame:
        out = df.iloc[:1][list(qi_cols)].copy()
        out["cnt"] = np.int64(df["cnt"].sum())
        return out

    def _summary(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df["cnt"].to_numpy(np.int64)
        unsafe = cnt < k
        total = int(cnt.sum())
        n_unsafe_rows = int(cnt[unsafe].sum())
        return pd.DataFrame({
            "k": pd.Series([k], dtype="int64"),
            "n_classes": pd.Series([len(cnt)], dtype="int64"),
            "n_unsafe_classes": pd.Series([int(unsafe.sum())],
                                          dtype="int64"),
            "n_unsafe_rows": pd.Series([n_unsafe_rows], dtype="int64"),
            "min_class_size": pd.Series([int(cnt.min())], dtype="int64"),
            "unsafe_row_share": round_half_away(
                np.array([n_unsafe_rows / total]), 6),
        })

    classes = (
        ds.map_batches(_partial, batch_format="pandas")
        .groupby(list(qi_cols)).map_groups(_merge_class,
                                           batch_format="pandas")
    )
    withk = classes.map_batches(
        lambda t: t.append_column("__one", pa.array([0] * t.num_rows,
                                                    pa.int32())),
        batch_format="pyarrow", zero_copy_batch=True)
    return withk.groupby("__one").map_groups(
        lambda df: _summary(df.drop(columns="__one")),
        batch_format="pandas")


def _q_customer_k_anonymity(sf_dir: str):
    import pyarrow.compute as pc
    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_mktsegment", "c_acctbal"])

    def _bucket(batch: pa.Table) -> pa.Table:
        bal = batch.column("c_acctbal")
        return pa.table({
            "c_nationkey": batch.column("c_nationkey"),
            "c_mktsegment": batch.column("c_mktsegment"),
            "bal_bucket": pc.floor(
                pc.divide(bal, pa.scalar(BAL_BUCKET))).cast(pa.int64()),
        })

    return k_anonymity(
        ds.map_batches(_bucket, batch_format="pyarrow",
                       zero_copy_batch=True),
        qi_cols=("c_nationkey", "c_mktsegment", "bal_bucket"))


register(
    "customer_k_anonymity",
    _q_customer_k_anonymity,
    f"""
    WITH c AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / {BAL_BUCKET}) AS BIGINT)
                   AS bal_bucket,
               count(*) AS cnt
        FROM customer GROUP BY 1, 2, 3
    )
    SELECT CAST({K_ANON} AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(CASE WHEN cnt < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unsafe_classes,
           CAST(COALESCE(sum(cnt) FILTER (cnt < {K_ANON}), 0) AS BIGINT)
               AS n_unsafe_rows,
           CAST(min(cnt) AS BIGINT) AS min_class_size,
           round(COALESCE(sum(cnt) FILTER (cnt < {K_ANON}), 0)
                 / CAST(sum(cnt) AS DOUBLE), 6) AS unsafe_row_share
    FROM c
    """,
)
