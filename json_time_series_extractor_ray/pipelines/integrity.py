"""Referential-integrity report: for each foreign-key relation, the
number of distinct FK values and how many are ORPHANS (no matching
primary key) — the cross-table data-quality check an ingest pipeline
runs before anything joins.

Scale shape, per relation:

* the fact side reduces to DISTINCT key values first (per-block Arrow
  dedup combiner + 64-way shard dedup — the ``tpch._sharded_distinct``
  pattern), so the join input is key-cardinality-bounded, never
  fact-row-bounded;
* orphan detection is the existing ``joins.shuffle_join(how='anti')``
  — one bounded co-partition shuffle per relation, shuffling only key
  columns;
* each relation folds to a single (relation, n_keys, n_orphans) row.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .registry import register

# (relation name, fact table, fk column, dim table, pk column)
RELATIONS = (
    ("events.user_id -> customer.c_custkey",
     "events", "user_id", "customer", "c_custkey"),
    ("lineitem.l_orderkey -> orders.o_orderkey",
     "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders.o_custkey -> customer.c_custkey",
     "orders", "o_custkey", "customer", "c_custkey"),
)


def orphan_counts(fact_ds, fk: str, dim_ds, pk: str,
                  fk_type=pa.int64()) -> tuple:
    """(n distinct FK values, n orphans) via distinct combiner + ONE
    anti shuffle join."""
    from .joins import shuffle_join
    from .tpch import _sharded_distinct

    keys = _sharded_distinct(fact_ds, [fk], fk)
    # drop null FKs: SQL's NOT IN / NOT EXISTS never counts a null key
    # as an orphan, and the distinct count below excludes them too
    def _nonnull(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_valid(batch.column(fk)))

    keys = keys.map_batches(_nonnull, batch_format="pyarrow",
                            zero_copy_batch=True)
    schema = pa.schema([(fk, fk_type)])
    dim_schema = pa.schema([(pk, fk_type)])
    orphans = shuffle_join(keys, dim_ds, on=fk, right_on=pk, how="anti",
                           left_schema=schema, right_schema=dim_schema)
    return keys.count(), orphans.count()


def referential_integrity_report(sf_dir: str) -> pd.DataFrame:
    import ray

    rows = []
    for name, fact, fk, dim, pk in RELATIONS:
        fact_ds = ray.data.read_parquet(f"{sf_dir}/{fact}.parquet",
                                        columns=[fk])
        dim_ds = ray.data.read_parquet(f"{sf_dir}/{dim}.parquet",
                                       columns=[pk])
        n_keys, n_orphans = orphan_counts(fact_ds, fk, dim_ds, pk)
        rows.append((name, n_keys, n_orphans))
    return pd.DataFrame({
        "relation": [r[0] for r in rows],
        "n_fk_values": pd.array([r[1] for r in rows], dtype="int64"),
        "n_orphans": pd.array([r[2] for r in rows], dtype="int64"),
    }).sort_values("relation", ignore_index=True)


def _rel_sql(name, fact, fk, dim, pk) -> str:
    return f"""
    SELECT '{name}' AS relation,
           CAST(count(DISTINCT {fk}) AS BIGINT) AS n_fk_values,
           CAST(count(DISTINCT CASE WHEN NOT EXISTS (
                    SELECT 1 FROM {dim} d WHERE d.{pk} = f.{fk})
                THEN {fk} END) AS BIGINT) AS n_orphans
    FROM {fact} f WHERE {fk} IS NOT NULL
    """


register(
    "referential_integrity",
    referential_integrity_report,
    " UNION ALL ".join(_rel_sql(*r) for r in RELATIONS)
    + " ORDER BY relation",
)
