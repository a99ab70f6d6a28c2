"""Skew-aware shuffle equi-join: salt hot probe keys, replicate the
matching build rows.

``joins.shuffle_join`` hash-routes each key to ONE shard task, so a hot
key (a celebrity user, a default/sentinel id) concentrates its entire
row mass in one straggler.  The classic remedy (Hive/Spark skew join):

1. DETECT hot keys with a distributed pre-aggregated count — per-block
   ``value_counts`` partials, ONE small shuffle over distinct keys, a
   filter to ``count >= hot_threshold``.  Only the (guarded-tiny) hot
   set ever reaches the driver.
2. SALT: hot LEFT rows get a round-robin salt ``0..num_salts-1``; hot
   RIGHT rows are REPLICATED once per salt; cold rows on both sides get
   salt 0.  The surrogate key ``"<key>#<salt>"`` then feeds the plain
   ``shuffle_join``, which spreads a hot key over ``num_salts`` shard
   tasks.
3. Each (left row, right row) pair meets in exactly ONE salted shard
   (the left row's salt), so the join OUTPUT is exactly the unsalted
   join's output — proven by the registered query sharing its oracle
   with the unsalted join family.

Supported modes: ``inner``, ``left``, ``semi``, ``anti``.  FULL OUTER is
refused: a replicated right row whose salt bucket happens to hold no
left rows of that key would surface as a spurious unmatched row.

Scale shape: detection shuffles per-block DISTINCT-key partials (for
skewed data that is far below row count); replication multiplies ONLY
the hot right rows by ``num_salts``; everything else is one
``shuffle_join``.  Cost knobs (``num_salts``, ``hot_threshold``) trade
replication volume against straggler width.

Reference anchor: extraction-only reference (SURVEY.md §2); extends the
engine-mandated join family (§2.6) alongside ``rollup.py``'s hot-key
salting for aggregates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .joins import shuffle_join
from .registry import register

#: Hot keys land on the driver (a set broadcast into the salt stages) —
#: bounded loudly.  A workload with more hot keys than this needs a
#: higher hot_threshold (or range partitioning), not a bigger list.
MAX_HOT_KEYS = 100_000


def _detect_hot_keys(ds, key: str, hot_threshold: int) -> list:
    """Exact hot-key list via pre-aggregated distributed count."""

    def _partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vc = pc.value_counts(batch.column(key))
        return pa.table({
            key: vc.field("values"),
            "cnt": vc.field("counts").cast(pa.int64()),
        })

    def _hot_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(
            batch.column("sum(cnt)"), pa.scalar(int(hot_threshold))))

    counts = (
        ds.select_columns([key])
        .map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key).sum("cnt")
        .map_batches(_hot_only, batch_format="pyarrow",
                     zero_copy_batch=True)
    )
    rows = counts.take_all()
    if len(rows) > MAX_HOT_KEYS:
        raise ValueError(
            f"skew join detected {len(rows)} hot keys "
            f"(> MAX_HOT_KEYS={MAX_HOT_KEYS}); raise hot_threshold — a "
            "mostly-hot key space gains nothing from salting"
        )
    return [r[key] for r in rows]


def skew_join(left_ds, right_ds, *, on, right_on: str | None = None,
              how: str = "inner", num_salts: int = 8,
              hot_threshold: int = 500_000,
              left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None,
              num_shards: int | None = None):
    """``shuffle_join`` with hot-key salting.  Same output contract:
    left columns then the right's non-key columns."""
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(
            f"skew_join supports inner/left/semi/anti, got {how!r} "
            "(FULL OUTER cannot salt: an empty salt bucket would emit a "
            "replicated right row as spuriously unmatched — use "
            "shuffle_join for outer)")
    right_key = right_on or on
    if left_schema is None:
        left_schema = left_ds.schema()
    if right_schema is None:
        right_schema = right_ds.schema()

    hot = _detect_hot_keys(left_ds, on, hot_threshold)
    if not hot:
        return shuffle_join(left_ds, right_ds, on=on, right_on=right_on,
                            how=how, left_schema=left_schema,
                            right_schema=right_schema,
                            **({"num_shards": num_shards} if num_shards
                               else {}))
    hot_set = set(hot)

    def _salt_left(batch: pa.Table) -> pa.Table:
        k = batch.column(on).to_pandas()
        is_hot = k.isin(hot_set).to_numpy()
        salt = np.zeros(len(k), dtype=np.int64)
        salt[is_hot] = np.arange(int(is_hot.sum()), dtype=np.int64) \
            % num_salts
        skew = k.astype(str).to_numpy(dtype=object)
        skew = np.char.add(np.char.add(skew.astype(str), "#"),
                           salt.astype(str))
        return batch.append_column("__skewkey",
                                   pa.array(skew, pa.string()))

    def _salt_right(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # null right keys never match inner/left/semi/anti — drop before
        # replication (shuffle_join would drop them anyway)
        batch = batch.filter(pc.is_valid(batch.column(right_key)))
        k = batch.column(right_key).to_pandas()
        is_hot = k.isin(hot_set).to_numpy()
        base = k.astype(str).to_numpy(dtype=object).astype(str)
        cold = batch.filter(pa.array(~is_hot)).append_column(
            "__skewkey",
            pa.array(np.char.add(base[~is_hot], "#0"), pa.string()))
        nh = int(is_hot.sum())
        if nh == 0:
            out = cold
        else:
            idx = np.repeat(np.flatnonzero(is_hot), num_salts)
            salts = np.tile(np.arange(num_salts), nh).astype(str)
            reps = batch.take(pa.array(idx)).append_column(
                "__skewkey",
                pa.array(np.char.add(np.char.add(base[idx], "#"), salts),
                         pa.string()))
            out = pa.concat_tables([cold, reps])
        return out.drop_columns([right_key])

    lschema2 = pa.schema(
        list(zip(left_schema.names, left_schema.types))
        + [("__skewkey", pa.string())])
    rschema2 = pa.schema(
        [(n, t) for n, t in zip(right_schema.names, right_schema.types)
         if n != right_key] + [("__skewkey", pa.string())])

    joined = shuffle_join(
        left_ds.map_batches(_salt_left, batch_format="pyarrow",
                            zero_copy_batch=True),
        right_ds.map_batches(_salt_right, batch_format="pyarrow",
                             zero_copy_batch=True),
        on="__skewkey", how=how,
        left_schema=lschema2, right_schema=rschema2,
        **({"num_shards": num_shards} if num_shards else {}))
    return joined.drop_columns(["__skewkey"])


def _q_events_customer_nation(sf_dir: str):
    import ray

    left = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                 columns=["event_id", "user_id"])
    right = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                  columns=["c_custkey", "c_nationkey"])
    # hot_threshold=50 fires on the driver data's heavy users, so the
    # oracle proves parity THROUGH the salted path, not around it
    return skew_join(left, right, on="user_id", right_on="c_custkey",
                     how="inner", num_salts=4, hot_threshold=50)


register(
    "events_customer_nation_skewjoin",
    _q_events_customer_nation,
    """
    SELECT e.event_id, e.user_id, c.c_nationkey
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    """,
)
