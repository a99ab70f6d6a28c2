"""Graph analytics over relationship graphs aggregated from fact tables.

``trade_pagerank``: PageRank over the nation-to-nation trade graph
(customer nation -> supplier nation, weighted by lineitem count).  The
pattern this demonstrates — distinct from the sharded connected
components in ``dedup`` — is the ITERATIVE solve over an AGGREGATED
graph:

* the expensive part is building the edge list from the fact tables —
  one lineitem ⋈ orders shuffle plus two broadcast dimension lookups and
  a per-block (src, dst) count combiner, so the exchange carries
  O(blocks x k²) partial rows, never lineitems;
* the aggregated graph is tiny (k = |nations|), so the fixed-iteration
  power method runs driver-side on the collected k x k matrix — the
  same "sketch partials -> driver merge" discipline as ``kmeans_fit`` /
  ``sketches``.  For graphs whose NODE set scales with the corpus, this
  driver solve does not apply; use the per-shard forest contraction in
  ``dedup.near_dup_clusters_distributed`` as the scale pattern instead
  (documented non-goal here).

Hash parity: ranks are rounded to 6 decimals after EVERY iteration on
both engines (the repo's rounded-moments rule), so each iteration's
inputs are identical doubles and cross-engine summation-order noise
(~1e-16 over <=k in-edge terms) cannot accumulate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import round_half_away
from .registry import register

PR_DAMPING = 0.85
PR_ITERS = 10


def nation_trade_edges(sf_dir: str):
    """(src_nation, dst_nation, weight) — customer nation -> supplier
    nation, weight = number of lineitems shipped along that pair.  One
    orderkey shuffle; both nation lookups are broadcast dimensions."""
    import ray

    from .enrich import broadcast_join
    from .joins import parquet_schema, shuffle_join
    from .relational import _dim_map

    cust_map = _dim_map(f"{sf_dir}/customer.parquet", "c_custkey",
                        "c_nationkey", None)
    supp_map = _dim_map(f"{sf_dir}/supplier.parquet", "s_suppkey",
                        "s_nationkey", None)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    li_schema = parquet_schema(
        f"{sf_dir}/lineitem.parquet", ["l_orderkey", "l_suppkey"])
    orders_schema = parquet_schema(
        f"{sf_dir}/orders.parquet", ["o_orderkey", "o_custkey"])
    j = shuffle_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                     left_schema=li_schema, right_schema=orders_schema)
    j = broadcast_join(j, cust_map, key="o_custkey",
                       value_name="src_nation", value_type=pa.int64())
    j = broadcast_join(j, supp_map, key="l_suppkey",
                       value_name="dst_nation", value_type=pa.int64())

    def _count_partial(batch: pa.Table) -> pa.Table:
        return batch.select(["src_nation", "dst_nation"]) \
            .group_by(["src_nation", "dst_nation"]) \
            .aggregate([("dst_nation", "count")]) \
            .rename_columns(["src_nation", "dst_nation", "w"])

    def _count_merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src_nation": df["src_nation"].iloc[:1],
            "dst_nation": df["dst_nation"].iloc[:1],
            "weight": [int(df["w"].sum())],
        })

    return (
        j.map_batches(_count_partial, batch_format="pyarrow",
                      zero_copy_batch=True)
        .groupby(["src_nation", "dst_nation"]).map_groups(
            _count_merge, batch_format="pandas")
    )


def pagerank_from_edges(edges_df: pd.DataFrame, *, damping: float = PR_DAMPING,
                        n_iters: int = PR_ITERS,
                        round_digits: int = 6) -> pd.DataFrame:
    """Fixed-iteration weighted PageRank on a collected edge list
    (columns src_nation / dst_nation / weight).  Deterministic: node
    order sorted, ranks rounded per iteration.  Every node is assumed to
    have out-weight > 0 (true for the trade graph; asserted)."""
    nodes = np.unique(np.r_[edges_df["src_nation"].to_numpy(np.int64),
                            edges_df["dst_nation"].to_numpy(np.int64)])
    idx = {int(n): i for i, n in enumerate(nodes)}
    k = len(nodes)
    W = np.zeros((k, k))
    for s, d, w in zip(edges_df["src_nation"], edges_df["dst_nation"],
                       edges_df["weight"]):
        W[idx[int(s)], idx[int(d)]] += float(w)
    out_w = W.sum(axis=1)
    assert (out_w > 0).all(), "dangling node in trade graph"
    # column-stochastic transition: P[d, s] = W[s, d] / out_w[s]
    P = (W / out_w[:, None]).T
    r = round_half_away(np.full(k, 1.0 / k), round_digits)
    teleport = (1.0 - damping) / k
    for _ in range(n_iters):
        r = round_half_away(teleport + damping * (P @ r), round_digits)
    return pd.DataFrame({"n_nationkey": nodes.astype(np.int64),
                         "pagerank": r})


def _q_trade_pagerank(sf_dir: str):
    import pyarrow.parquet as pq

    edges = nation_trade_edges(sf_dir).to_pandas()  # k x k rows, tiny
    pr = pagerank_from_edges(edges)
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"]).to_pandas()
    out = pr.merge(nation, on="n_nationkey", sort=False)
    return out[["n_nationkey", "n_name", "pagerank"]] \
        .sort_values("n_nationkey").reset_index(drop=True)


def _pagerank_sql(n_iters: int = PR_ITERS, damping: float = PR_DAMPING) -> str:
    """Power method unrolled as chained CTEs (one per iteration — SQL
    recursive CTEs forbid aggregating over the recursive reference), each
    applying the same round-6 as the engine so identical doubles feed
    every step.  The per-step expression mirrors
    ``pagerank_from_edges``: teleport + damping * Σ rank(src) * w / ow."""
    steps = []
    for i in range(1, n_iters + 1):
        steps.append(f"""
    r{i} AS (
        SELECT n.node,
               round((1.0 - {damping}) / kk.k
                     + {damping} * coalesce((
                         SELECT sum(p.rank * e.w / outw.ow)
                         FROM e
                         JOIN outw ON outw.src = e.src
                         JOIN r{i - 1} p ON p.node = e.src
                         WHERE e.dst = n.node
                     ), 0.0), 6) AS rank
        FROM nodes n CROSS JOIN kk
    )""")
    return f"""
    WITH e AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               CAST(count(*) AS DOUBLE) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    ),
    outw AS (SELECT src, sum(w) AS ow FROM e GROUP BY 1),
    nodes AS (
        SELECT src AS node FROM e
        UNION SELECT dst FROM e
    ),
    kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM nodes),
    r0 AS (SELECT node, round(1.0 / k, 6) AS rank FROM nodes, kk),
    {",".join(steps)}
    SELECT n_nationkey, n_name, rank AS pagerank
    FROM r{n_iters} JOIN nation ON n_nationkey = node
    """


register("nation_trade_pagerank", _q_trade_pagerank, _pagerank_sql())
