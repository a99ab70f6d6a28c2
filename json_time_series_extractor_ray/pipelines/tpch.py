"""Eight more TPC-H-shaped relational pipelines (Q6, Q13, Q14, Q15, Q17,
and Q4/Q16/Q19 adapted to the fixture's columns — the tables lack
``l_commitdate`` / ``l_shipmode`` / ``l_container`` / ``partsupp``, so
the adapted variants keep each query's SHAPE (correlated-EXISTS semi
join, promo share, disjunctive predicate pushdown, count-distinct
rollup) over the columns that exist).

Scale shapes, per query:

* Q6 / Q19 / Q14 are pure combiner aggregates: every predicate is
  vectorized per block (Q19's part attributes and Q14's promo flag
  arrive via a broadcast dimension map, never a shuffle), each block
  reduces to ONE partial row, and ``Dataset.sum`` folds the partials —
  the shuffle moves O(blocks) rows at any corpus size.
* Q4's correlated EXISTS (``l_shipdate > o_orderdate + 60 days``)
  rewrites as ``max(l_shipdate) per order > o_orderdate + 60 days``:
  a per-block (orderkey, max) combiner, one bounded groupby-max, then
  ONE fact-x-fact shuffle join against the date-pruned orders — the
  join's right side is pre-deduped to one row per orderkey so no group
  can explode.
* Q16 runs distinct twice, each time AFTER a cardinality-reducing step:
  distinct (partkey, suppkey) over the fact table, broadcast-attach the
  part dims, distinct (brand, type, size, suppkey), then a tiny count
  combiner.  The part dimension is driver-built with the same loud
  ``MAX_BROADCAST_DIM_ROWS`` guard as TPC-H Q5 (`relational._dim_map`).

Float discipline: revenue sums round to 2 (cents; the noise margin rule
of ``revenue_by_nation``), derived ratios round to 6 over the already-
rounded sums so both engines divide identical inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ._util import round_half_away
from .registry import register

Q6_LO, Q6_HI = "1996-01-01", "1997-01-01"
Q6_DISC_LO, Q6_DISC_HI = 0.02, 0.04
Q6_QTY_LT = 24.0

Q14_LO, Q14_HI = "1996-03-01", "1996-04-01"

Q4_LO, Q4_HI = "1996-07-01", "1996-10-01"
Q4_LATE_DAYS = 60

Q16_EXCL_BRAND = "Brand#13"
Q16_EXCL_TYPE = "PROMO"

# Q19 disjunction: (brand, qty_lo, qty_hi, size_lo, size_hi)
Q19_ARMS = (
    ("Brand#12", 1.0, 11.0, 1, 5),
    ("Brand#23", 10.0, 20.0, 1, 10),
    ("Brand#34", 20.0, 30.0, 1, 15),
)


def _global_fold(ds, cols: list[str]) -> dict:
    """Fold per-block partial rows into one dict of sums (tiny: the
    aggregate input is one row per block)."""
    out = ds.sum(cols)
    if out is None:  # empty dataset (e.g. the date filter pruned all rows)
        return {c: 0 for c in cols}
    if not isinstance(out, dict):  # single column returns a scalar
        out = {f"sum({cols[0]})": out}
    return {c: out[f"sum({c})"] or 0 for c in cols}


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change (filter + global combiner aggregate)
# ---------------------------------------------------------------------------

def forecast_revenue_change(li_ds) -> pd.DataFrame:
    """TPC-H Q6: potential revenue increase from eliminating small
    discounts on low-quantity lineitems shipped in one year."""

    def _partial(batch: pa.Table) -> pa.Table:
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        price = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False)
        keep = (disc >= Q6_DISC_LO) & (disc <= Q6_DISC_HI) & (qty < Q6_QTY_LT)
        return pa.table({
            "rev": pa.array([float((price[keep] * disc[keep]).sum())],
                            pa.float64()),
            "n": pa.array([int(keep.sum())], pa.int64()),
        })

    f = _global_fold(
        li_ds.map_batches(_partial, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["rev", "n"])
    return pd.DataFrame({
        "revenue": [round_half_away(np.float64(f["rev"]), 2)],
        "n_items": pd.array([int(f["n"])], dtype="int64"),
    })


def _q_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    import datetime as dt

    import pyarrow.dataset as pads
    import ray

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate")
                >= dt.datetime.fromisoformat(Q6_LO))
        & (pads.field("l_shipdate") < dt.datetime.fromisoformat(Q6_HI)),
    )
    return forecast_revenue_change(li)


register(
    "forecast_revenue_change",
    _q_forecast_revenue,
    f"""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q6_LO} 00:00:00'
      AND l_shipdate <  TIMESTAMP '{Q6_HI} 00:00:00'
      AND l_discount BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
      AND l_quantity < {Q6_QTY_LT}
    """,
)


# ---------------------------------------------------------------------------
# Q14 — promotion revenue share (broadcast dim + combiner aggregate)
# ---------------------------------------------------------------------------

def promo_revenue_effect(li_ds, promo_parts: frozenset) -> pd.DataFrame:
    """TPC-H Q14: share of one month's discounted revenue from promo
    parts.  ``promo_parts`` is broadcast once (``ray.put``); each block
    reduces to one (promo_rev, total_rev) partial."""
    import ray

    promo_ref = ray.put(promo_parts)

    def _partial(batch: pa.Table) -> pa.Table:
        promo = ray.get(promo_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        price = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        rev = price * (1.0 - disc)
        is_promo = pd.Series(pk).isin(promo).to_numpy()
        return pa.table({
            "promo_rev": pa.array([float(rev[is_promo].sum())],
                                  pa.float64()),
            "total_rev": pa.array([float(rev.sum())], pa.float64()),
        })

    f = _global_fold(
        li_ds.map_batches(_partial, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["promo_rev", "total_rev"])
    promo2 = round_half_away(np.float64(f["promo_rev"]), 2)
    total2 = round_half_away(np.float64(f["total_rev"]), 2)
    return pd.DataFrame({
        "promo_revenue_pct": [round_half_away(100.0 * promo2 / total2, 6)],
        "promo_rev": [promo2],
        "total_rev": [total2],
    })


def _q_promo_revenue(sf_dir: str) -> pd.DataFrame:
    import datetime as dt

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray

    from .relational import MAX_BROADCAST_DIM_ROWS

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    if part.num_rows > MAX_BROADCAST_DIM_ROWS:
        raise ValueError(
            f"part has {part.num_rows} rows (> {MAX_BROADCAST_DIM_ROWS}); "
            "broadcast promo map no longer applies — shuffle_join the "
            "part dimension instead")
    promo = frozenset(
        part.filter(pc.equal(part.column("p_type"),
                             pa.scalar(Q16_EXCL_TYPE)))
        .column("p_partkey").to_pylist())
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate")
                >= dt.datetime.fromisoformat(Q14_LO))
        & (pads.field("l_shipdate") < dt.datetime.fromisoformat(Q14_HI)),
    )
    return promo_revenue_effect(li, promo)


register(
    "promo_revenue_effect",
    _q_promo_revenue,
    f"""
    WITH agg AS (
        SELECT
            round(sum(CASE WHEN p.p_type = '{Q16_EXCL_TYPE}'
                           THEN l.l_extendedprice * (1 - l.l_discount)
                           ELSE 0 END), 2) AS promo_rev,
            round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                AS total_rev
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '{Q14_LO} 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '{Q14_HI} 00:00:00'
    )
    SELECT round(100.0 * promo_rev / total_rev, 6) AS promo_revenue_pct,
           promo_rev, total_rev
    FROM agg
    """,
)


# ---------------------------------------------------------------------------
# Q4 (adapted) — order priority checking via max-shipdate semi join
# ---------------------------------------------------------------------------

def order_priority_checking(orders_ds, li_maxship_ds, *,
                            late_days: int = Q4_LATE_DAYS) -> pd.DataFrame:
    """Orders per priority, placed in one quarter, where at least one
    lineitem shipped more than ``late_days`` after the order date.

    ``EXISTS(l_shipdate > o_orderdate + D)`` == ``max(l_shipdate) >
    o_orderdate + D``, so the right side arrives pre-reduced to one row
    per orderkey (see :func:`lineitem_max_shipdate`) and the shuffle
    join cannot explode any group.
    """
    from .joins import shuffle_join

    orders_schema = pa.schema([
        ("o_orderkey", pa.int64()),
        ("o_orderdate", pa.timestamp("ns")),
        ("o_orderpriority", pa.string()),
    ])
    max_schema = pa.schema([
        ("l_orderkey", pa.int64()),
        ("max_ship", pa.timestamp("ns")),
    ])
    joined = shuffle_join(orders_ds, li_maxship_ds,
                          on="o_orderkey", right_on="l_orderkey",
                          left_schema=orders_schema,
                          right_schema=max_schema)
    late_ns = np.int64(late_days) * 86_400_000_000_000

    def _late_counts(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").cast(pa.timestamp("ns")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        ms = batch.column("max_ship").cast(pa.timestamp("ns")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        pri = batch.column("o_orderpriority").to_pandas()[ms > od + late_ns]
        g = pri.value_counts().sort_index()
        return pa.table({
            "o_orderpriority": pa.array(g.index, pa.string()),
            "n": pa.array(g.to_numpy(np.int64), pa.int64()),
        })

    merged = (
        joined.map_batches(_late_counts, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("o_orderpriority").sum("n")
    ).to_pandas()
    return pd.DataFrame({
        "o_orderpriority": merged["o_orderpriority"],
        "order_count": merged["sum(n)"].astype("int64"),
    }).sort_values("o_orderpriority").reset_index(drop=True)


def lineitem_max_shipdate(li_ds):
    """Per-orderkey max shipdate: per-block Arrow group-max combiner
    (bounds every block to its distinct orderkeys), one groupby-max."""

    def _local(batch: pa.Table) -> pa.Table:
        g = batch.group_by("l_orderkey").aggregate([("l_shipdate", "max")])
        return pa.table({
            "l_orderkey": g.column("l_orderkey"),
            "ms": g.column("l_shipdate_max").cast(pa.timestamp("ns")),
        })

    local = li_ds.map_batches(_local, batch_format="pyarrow",
                              zero_copy_batch=True)
    merged = local.groupby("l_orderkey").max("ms")

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": batch.column("l_orderkey").cast(pa.int64()),
            "max_ship": batch.column("max(ms)").cast(pa.timestamp("ns")),
        })

    return merged.map_batches(_shape, batch_format="pyarrow",
                              zero_copy_batch=True)


def _q_order_priority(sf_dir: str) -> pd.DataFrame:
    import datetime as dt

    import pyarrow.dataset as pads
    import ray

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=(pads.field("o_orderdate")
                >= dt.datetime.fromisoformat(Q4_LO))
        & (pads.field("o_orderdate") < dt.datetime.fromisoformat(Q4_HI)),
    )
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_shipdate"])
    return order_priority_checking(orders, lineitem_max_shipdate(li))


register(
    "order_priority_checking",
    _q_order_priority,
    f"""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '{Q4_LO} 00:00:00'
      AND o_orderdate <  TIMESTAMP '{Q4_HI} 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate
                + INTERVAL {Q4_LATE_DAYS} DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)


# ---------------------------------------------------------------------------
# Q16 (adapted) — supplier counts per (brand, type, size)
# ---------------------------------------------------------------------------

def _sharded_distinct(ds, cols: list[str], key_col: str,
                      num_shards: int = 64):
    """Distinct over ``cols``: per-block Arrow dedup combiner, then ONE
    groupby on a HASH SHARD of ``key_col`` (64 groups) with a pandas
    drop_duplicates per shard — same result as ``enrich.distinct`` but
    without the one-Ray-group-per-distinct-key overhead (60k tiny
    groups cost ~68 s at sf0.01; 64 shard groups cost ~2 s)."""
    from ._util import hash_shards

    def _local(batch: pa.Table) -> pa.Table:
        t = batch.select(cols).group_by(cols).aggregate([])
        return t.append_column(
            "shard", pa.array(hash_shards(
                pd.Series(t.column(key_col).to_numpy(
                    zero_copy_only=False)).astype(str),
                num_shards), pa.int32()))

    def _dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(cols)[cols]

    return (
        ds.map_batches(_local, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("shard").map_groups(_dedup, batch_format="pandas")
    )


def part_supplier_counts(li_ds, part_dims: dict) -> "object":
    """Distinct suppliers that shipped each (brand, type, size), via
    lineitem as the part-supplier relation.  Two distincts, both after
    a cardinality-reducing step; the part dims broadcast once."""
    import ray

    pairs = _sharded_distinct(li_ds, ["l_partkey", "l_suppkey"],
                              "l_partkey")
    # split the dims into three column maps ONCE, broadcast one ref
    keys = list(part_dims)
    maps = {
        "p_brand": pd.Series([part_dims[k][0] for k in keys], index=keys),
        "p_type": pd.Series([part_dims[k][1] for k in keys], index=keys),
        "p_size": pd.Series([part_dims[k][2] for k in keys], index=keys,
                            dtype="int64"),
    }
    dims_ref = ray.put(maps)

    def _attach(batch: pa.Table) -> pa.Table:
        dims = ray.get(dims_ref)
        pk = pd.Series(batch.column("l_partkey").to_numpy(
            zero_copy_only=False))
        brand = pk.map(dims["p_brand"])
        keep = brand.notna().to_numpy()
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "p_brand": pa.array(brand[keep], pa.string()),
            "p_type": pa.array(pk.map(dims["p_type"])[keep], pa.string()),
            "p_size": pa.array(
                pk.map(dims["p_size"])[keep].to_numpy(np.int64), pa.int64()),
            "l_suppkey": pa.array(sk, pa.int64()),
        })

    quads = _sharded_distinct(
        pairs.map_batches(_attach, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["p_brand", "p_type", "p_size", "l_suppkey"], "l_suppkey")

    def _count(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["p_brand", "p_type", "p_size"]).aggregate(
            [("l_suppkey", "count")])
        return pa.table({
            "p_brand": g.column("p_brand"),
            "p_type": g.column("p_type"),
            "p_size": g.column("p_size"),
            "n": g.column("l_suppkey_count").cast(pa.int64()),
        })

    merged = (
        quads.map_batches(_count, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby(["p_brand", "p_type", "p_size"]).sum("n")
    ).to_pandas()
    out = pd.DataFrame({
        "p_brand": merged["p_brand"],
        "p_type": merged["p_type"],
        "p_size": merged["p_size"].astype("int64"),
        "supplier_cnt": merged["sum(n)"].astype("int64"),
    })
    return out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True]).reset_index(drop=True)


def _q_part_supplier(sf_dir: str):
    import pyarrow.parquet as pq
    import ray

    from .relational import MAX_BROADCAST_DIM_ROWS

    part = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"])
    if part.num_rows > MAX_BROADCAST_DIM_ROWS:
        raise ValueError(
            f"part has {part.num_rows} rows (> {MAX_BROADCAST_DIM_ROWS}); "
            "broadcast part dims no longer apply — shuffle_join instead")
    mask = pc.and_(
        pc.not_equal(part.column("p_brand"), pa.scalar(Q16_EXCL_BRAND)),
        pc.not_equal(part.column("p_type"), pa.scalar(Q16_EXCL_TYPE)))
    part = part.filter(mask)
    dims = {
        k: (b, t, int(s)) for k, b, t, s in zip(
            part.column("p_partkey").to_pylist(),
            part.column("p_brand").to_pylist(),
            part.column("p_type").to_pylist(),
            part.column("p_size").to_pylist())
    }
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_partkey", "l_suppkey"])
    return part_supplier_counts(li, dims)


register(
    "part_supplier_counts",
    _q_part_supplier,
    f"""
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> '{Q16_EXCL_BRAND}'
      AND p.p_type <> '{Q16_EXCL_TYPE}'
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)


# ---------------------------------------------------------------------------
# Q19 (adapted) — disjunctive brand/quantity/size revenue
# ---------------------------------------------------------------------------

def brand_quantity_revenue(li_ds, part_dims: dict) -> pd.DataFrame:
    """Revenue over a 3-arm disjunction of (brand, quantity range, size
    range) predicates; part attributes broadcast, predicate vectorized,
    one partial row per block."""
    import ray

    keys = list(part_dims)
    maps = {
        "brand": pd.Series([part_dims[k][0] for k in keys], index=keys),
        "size": pd.Series([float(part_dims[k][1]) for k in keys],
                          index=keys),
    }
    dims_ref = ray.put(maps)

    def _partial(batch: pa.Table) -> pa.Table:
        dims = ray.get(dims_ref)
        pk = pd.Series(batch.column("l_partkey").to_numpy(
            zero_copy_only=False))
        brand = pk.map(dims["brand"]).to_numpy()
        size = pk.map(dims["size"]).to_numpy(dtype=float, na_value=np.nan)
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        price = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        keep = np.zeros(len(pk), dtype=bool)
        for b, qlo, qhi, slo, shi in Q19_ARMS:
            keep |= ((brand == b) & (qty >= qlo) & (qty <= qhi)
                     & (size >= slo) & (size <= shi))
        rev = price[keep] * (1.0 - disc[keep])
        return pa.table({
            "rev": pa.array([float(rev.sum())], pa.float64()),
            "n": pa.array([int(keep.sum())], pa.int64()),
        })

    f = _global_fold(
        li_ds.map_batches(_partial, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["rev", "n"])
    return pd.DataFrame({
        "revenue": [round_half_away(np.float64(f["rev"]), 2)],
        "n_items": pd.array([int(f["n"])], dtype="int64"),
    })


def _q_brand_quantity(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq
    import ray

    from .relational import MAX_BROADCAST_DIM_ROWS

    brands = {b for b, *_ in Q19_ARMS}
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    part = part.filter(pc.is_in(part.column("p_brand"),
                                value_set=pa.array(sorted(brands))))
    if part.num_rows > MAX_BROADCAST_DIM_ROWS:
        raise ValueError(
            f"part has {part.num_rows} rows after brand pruning "
            f"(> {MAX_BROADCAST_DIM_ROWS}); shuffle_join instead")
    dims = {
        k: (b, int(s)) for k, b, s in zip(
            part.column("p_partkey").to_pylist(),
            part.column("p_brand").to_pylist(),
            part.column("p_size").to_pylist())
    }
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"])
    return brand_quantity_revenue(li, dims)


def _q19_arm_sql(arm) -> str:
    b, qlo, qhi, slo, shi = arm
    return (f"(p.p_brand = '{b}' AND l.l_quantity BETWEEN {qlo} AND {qhi}"
            f" AND p.p_size BETWEEN {slo} AND {shi})")


register(
    "brand_quantity_revenue",
    _q_brand_quantity,
    f"""
    SELECT round(coalesce(
               sum(l.l_extendedprice * (1 - l.l_discount)), 0), 2)
               AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE {' OR '.join(_q19_arm_sql(a) for a in Q19_ARMS)}
    """,
)


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (LEFT-join histogram)
# ---------------------------------------------------------------------------

def customer_order_distribution(orders_ds, n_customers: int):
    """TPC-H Q13: histogram of per-customer order counts, INCLUDING the
    zero bucket.  Shape: per-block custkey-count combiner -> ONE
    custkey groupby (bounded by customer count) -> per-block histogram
    combiner -> tiny c_count groupby; the zero bucket is
    ``n_customers - customers_with_orders`` (two scalars), never an
    anti-join over the fact table."""

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("o_custkey").aggregate([("o_custkey", "count")])
        return pa.table({
            "o_custkey": g.column("o_custkey"),
            "n": g.column("o_custkey_count").cast(pa.int64()),
        })

    per_cust = (
        orders_ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
        .groupby("o_custkey").sum("n")
    )

    def _hist(batch: pa.Table) -> pa.Table:
        g = batch.group_by("sum(n)").aggregate([("sum(n)", "count")])
        return pa.table({
            "c_count": g.column("sum(n)").cast(pa.int64()),
            "custdist": g.column("sum(n)_count").cast(pa.int64()),
        })

    hist = (
        per_cust.map_batches(_hist, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("c_count").sum("custdist")
    ).to_pandas()
    out = pd.DataFrame({
        "c_count": hist["c_count"].astype("int64"),
        "custdist": hist["sum(custdist)"].astype("int64"),
    })
    zero = n_customers - int(out["custdist"].sum())
    if zero < 0:
        # More distinct o_custkey values than customer rows: orders holds
        # custkeys absent from customer, so the scalar zero-bucket
        # derivation (and the nonzero buckets, which count orphans as
        # customers) is invalid for this input.  Run the
        # `referential_integrity` query to locate the orphans, or
        # semi-join orders against customer before this histogram.
        raise ValueError(
            f"customer_order_distribution: {-zero} more distinct "
            f"o_custkey values than customer rows ({n_customers}) — "
            "orders references custkeys absent from customer; see the "
            "referential_integrity query"
        )
    if zero > 0:
        out = pd.concat([out, pd.DataFrame(
            {"c_count": pd.array([0], dtype="int64"),
             "custdist": pd.array([zero], dtype="int64")})],
            ignore_index=True)
    return out.sort_values(["custdist", "c_count"],
                           ascending=[False, False],
                           ignore_index=True)


def _q_order_distribution(sf_dir: str):
    import pyarrow.parquet as pq
    import ray

    n_customers = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey"])
    return customer_order_distribution(orders, n_customers)


register(
    "customer_order_distribution",
    _q_order_distribution,
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)


# ---------------------------------------------------------------------------
# Q15 — top supplier(s) by windowed revenue
# ---------------------------------------------------------------------------

Q15_LO, Q15_HI = "1996-01-01", "1996-04-01"


def top_supplier_revenue(li_ds, supp_names: dict):
    """TPC-H Q15: the supplier(s) achieving the maximum revenue over one
    quarter.  Revenue per supplier is ROUND-2 on both engines BEFORE the
    max comparison so float ties cannot diverge; names attach via a
    broadcast supplier map."""
    import ray

    def _partial(batch: pa.Table) -> pa.Table:
        rev = (batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False)
            * (1.0 - batch.column("l_discount").to_numpy(
                zero_copy_only=False)))
        df = pd.DataFrame({
            "l_suppkey": batch.column("l_suppkey").to_numpy(
                zero_copy_only=False),
            "rev": rev,
        })
        g = df.groupby("l_suppkey", sort=False)["rev"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    merged = (
        li_ds.map_batches(_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("l_suppkey").sum("rev")
    ).to_pandas()
    rev2 = round_half_away(merged["sum(rev)"].to_numpy(), 2)
    best = rev2.max()
    keep = merged[rev2 == best].copy()
    names_ref = supp_names  # tiny, already driver-side
    out = pd.DataFrame({
        "s_suppkey": keep["l_suppkey"].astype("int64"),
        "s_name": keep["l_suppkey"].map(names_ref),
        "total_revenue": rev2[rev2 == best],
    })
    return out.sort_values("s_suppkey", ignore_index=True)


def _q_top_supplier(sf_dir: str):
    import datetime as dt

    import pyarrow.dataset as pads
    import ray

    supp_names = _q_top_supplier_names(sf_dir)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate")
                >= dt.datetime.fromisoformat(Q15_LO))
        & (pads.field("l_shipdate") < dt.datetime.fromisoformat(Q15_HI)),
    )
    return top_supplier_revenue(li, supp_names)


def _q_top_supplier_names(sf_dir: str) -> dict:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/supplier.parquet",
                      columns=["s_suppkey", "s_name"])
    return dict(zip(t.column("s_suppkey").to_pylist(),
                    t.column("s_name").to_pylist()))


register(
    "top_supplier_revenue",
    _q_top_supplier,
    f"""
    WITH rev AS (
        SELECT l_suppkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{Q15_LO} 00:00:00'
          AND l_shipdate <  TIMESTAMP '{Q15_HI} 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
)


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated avg via broadcast)
# ---------------------------------------------------------------------------

Q17_BRAND = "Brand#23"
Q17_FRACTION = 0.2


def small_quantity_revenue(li_pass1, li_pass2_fn,
                           brand_parts: frozenset) -> pd.DataFrame:
    """TPC-H Q17: weekly-equivalent revenue lost to small orders —
    lineitems of one brand's parts whose quantity is below
    ``Q17_FRACTION`` x that part's average quantity.

    The correlated scalar subquery becomes: pass 1 computes each
    brand-part's (sum qty, n) via the usual combiner (bounded by the
    brand's part count), the per-part threshold broadcasts as a map,
    pass 2 filters rows against the broadcast threshold and folds one
    (revenue, n) partial per block.  Avg uses the rounded-moments rule
    (round-6 sum / n) so both engines compare against the identical
    threshold."""
    import ray

    def _p1(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        keep = pd.Series(pk).isin(brand_parts).to_numpy()
        df = pd.DataFrame({
            "l_partkey": pk[keep],
            "q": batch.column("l_quantity").to_numpy(
                zero_copy_only=False)[keep],
        })
        g = df.groupby("l_partkey", sort=False).agg(
            s=("q", "sum"), n=("q", "size")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    stats = (
        li_pass1.map_batches(_p1, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("l_partkey").sum(["s", "n"])
    ).to_pandas()
    thr = pd.Series(
        Q17_FRACTION * (round_half_away(stats["sum(s)"].to_numpy(), 6)
                        / stats["sum(n)"].to_numpy()),
        index=stats["l_partkey"].to_numpy())
    thr_ref = ray.put(thr)

    def _p2(batch: pa.Table) -> pa.Table:
        t = ray.get(thr_ref)
        pk = pd.Series(batch.column("l_partkey").to_numpy(
            zero_copy_only=False))
        lim = pk.map(t).to_numpy(dtype=float, na_value=np.nan)
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        keep = qty < lim  # NaN (non-brand part) compares False
        price = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False)[keep]
        return pa.table({
            "rev": pa.array([float(price.sum())], pa.float64()),
            "n": pa.array([int(keep.sum())], pa.int64()),
        })

    f = _global_fold(
        li_pass2_fn().map_batches(_p2, batch_format="pyarrow",
                                  zero_copy_batch=True),
        ["rev", "n"])
    rev2 = round_half_away(np.float64(f["rev"]), 2)
    return pd.DataFrame({
        "avg_yearly": [round_half_away(np.float64(rev2 / 7.0), 2)],
        "n_items": pd.array([int(f["n"])], dtype="int64"),
    })


def _q_small_quantity(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq
    import ray

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    brand_parts = frozenset(
        part.filter(pc.equal(part.column("p_brand"),
                             pa.scalar(Q17_BRAND)))
        .column("p_partkey").to_pylist())

    def _li():
        return ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice"])

    return small_quantity_revenue(_li(), _li, brand_parts)


register(
    "small_quantity_revenue",
    _q_small_quantity,
    f"""
    WITH stats AS (
        SELECT l.l_partkey,
               {Q17_FRACTION} * (round(sum(l.l_quantity), 6) / count(*))
                   AS lim
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = '{Q17_BRAND}'
        GROUP BY l.l_partkey
    ),
    hit AS (
        SELECT round(coalesce(sum(l.l_extendedprice), 0), 2) AS rev,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem l JOIN stats s ON s.l_partkey = l.l_partkey
        WHERE l.l_quantity < s.lim
    )
    SELECT round(rev / 7.0, 2) AS avg_yearly, n_items FROM hit
    """,
)
