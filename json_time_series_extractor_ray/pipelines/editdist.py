"""Exact edit-distance similarity self-join (record linkage / fuzzy dedup).

Finds every pair of DISTINCT ``p_name`` strings within Levenshtein
distance ``EDIT_DIST_MAX``, with the number of parts carrying each name.
Pairing distinct NAMES (not part rows) keeps the output linear in name
cardinality — joining back to rows would square a hot name's count, and
the count columns carry the same information.

Scale shape (no all-pairs comparison anywhere):

1. ONE shuffle collapses the table to distinct names + counts.
2. Deletion-neighborhood blocking (FastSS / SymSpell): each name emits
   every variant reachable by deleting <= d characters (including
   itself).  If ``lev(a, b) <= d``, an optimal alignment's common
   subsequence is reachable from BOTH sides by <= d deletions, so their
   neighborhoods intersect — the blocking is LOSSLESS.  Variants ship as
   stable 64-bit hashes (collisions only add candidates; the verify step
   keeps the result exact).
3. ``groupby(variant)`` co-locates candidates; each bucket verifies its
   pairs with the exact O(len^2) DP (unit costs — DuckDB
   ``levenshtein`` semantics) and a loud quadratic guard.
4. One final tiny shuffle dedupes pairs found via multiple shared
   variants.

Neighborhood size is O(len^d) per name, so names are capped at
``MAX_NAME_LEN`` (the remedy for long strings is PassJoin-style
positional segment blocking, which trades neighborhood size for
substring probes).

Reference anchor: extraction-only reference (SURVEY.md §2); extends the
engine-mandated dedup/record-linkage family (§2.6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _read
from .registry import register

#: Maximum Levenshtein distance for a reported pair.
EDIT_DIST_MAX = 2

#: Deletion neighborhoods are O(len^d); beyond this, use segment blocking.
MAX_NAME_LEN = 512

#: Candidate buckets verify pairwise — guard the quadratic loudly.
MAX_BUCKET_NAMES = 10_000


def _levenshtein(a, b) -> int:
    """Unit-cost Levenshtein (insert/delete/substitute) over UTF-8 BYTES —
    DuckDB's ``levenshtein`` is byte-oriented (``levenshtein('','wídget')``
    is 7, not 6), so exact oracle parity requires byte semantics.  Two
    rolling rows; inputs here are short (blocked candidates), so the
    O(len^2) DP is the whole cost."""
    if isinstance(a, str):
        a = a.encode("utf-8")
    if isinstance(b, str):
        b = b.encode("utf-8")
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = np.arange(lb + 1, dtype=np.int64)
    cur = np.empty(lb + 1, dtype=np.int64)
    bs = np.frombuffer(b, dtype=np.uint8)
    for i in range(la):
        cur[0] = i + 1
        sub = prev[:-1] + (bs != a[i])
        # np.minimum over the two non-sequential choices, then the
        # insert chain (cur[j-1] + 1) needs a sequential pass
        best = np.minimum(sub, prev[1:] + 1)
        run = cur[0]
        for j in range(lb):
            run = min(run + 1, best[j])
            cur[j + 1] = run
        prev, cur = cur, prev
    return int(prev[lb])


def _deletion_variants(name, d: int) -> set:
    """All byte strings reachable from ``name`` by deleting up to ``d``
    BYTES (including ``name`` itself) — byte-level to pair with the
    byte-level DP above."""
    if isinstance(name, str):
        name = name.encode("utf-8")
    out = {name}
    frontier = {name}
    for _ in range(d):
        nxt = set()
        for s in frontier:
            for i in range(len(s)):
                nxt.add(s[:i] + s[i + 1:])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


def _emit_variants(batch: pd.DataFrame, d: int) -> pd.DataFrame:
    names = batch["name"].to_numpy()
    counts = batch["n_parts"].to_numpy()
    too_long = max((len(n) for n in names), default=0)
    if too_long > MAX_NAME_LEN:
        raise ValueError(
            f"edit-distance blocking saw a {too_long}-char name "
            f"(> MAX_NAME_LEN={MAX_NAME_LEN}); deletion neighborhoods are "
            "O(len^d) — switch to PassJoin positional segment blocking for "
            "long strings, or raise MAX_NAME_LEN knowingly"
        )
    v_names, v_counts, v_keys = [], [], []
    for name, cnt in zip(names, counts):
        vs = list(_deletion_variants(name, d))
        v_names.extend([name] * len(vs))
        v_counts.extend([cnt] * len(vs))
        v_keys.extend(vs)
    return pd.DataFrame({
        # stable cross-process 64-bit bucket key; collisions only add
        # candidates (verified below), never results
        "vhash": pd.util.hash_array(np.asarray(v_keys, dtype=object)),
        "name": pd.Series(v_names, dtype=object),
        "n_parts": pd.Series(v_counts, dtype="int64"),
    })


def _verify_bucket(df: pd.DataFrame, d: int) -> pd.DataFrame:
    uniq = df.drop_duplicates("name")
    if len(uniq) > MAX_BUCKET_NAMES:
        raise ValueError(
            f"edit-distance candidate bucket holds {len(uniq)} distinct "
            f"names (> MAX_BUCKET_NAMES={MAX_BUCKET_NAMES}); verification "
            "is quadratic per bucket — deepen the blocking (larger d "
            "split, positional segments) or raise the cap knowingly"
        )
    names = sorted(uniq["name"].tolist())
    counts = dict(zip(uniq["name"], uniq["n_parts"]))
    a_out, b_out, dist_out = [], [], []
    for i in range(len(names)):
        ni = names[i]
        for j in range(i + 1, len(names)):
            nj = names[j]
            if abs(len(ni.encode("utf-8")) - len(nj.encode("utf-8"))) > d:
                continue
            dist = _levenshtein(ni, nj)
            if dist <= d:
                a_out.append(ni)
                b_out.append(nj)
                dist_out.append(dist)
    if not a_out:
        # typed empty Arrow: a zero-row object-dtype pandas block trips
        # Ray's size estimator on most buckets (no close pairs is the
        # common case)
        return pa.table({
            "name_a": pa.array([], pa.string()),
            "name_b": pa.array([], pa.string()),
            "dist": pa.array([], pa.int64()),
            "n_parts_a": pa.array([], pa.int64()),
            "n_parts_b": pa.array([], pa.int64()),
        })
    return pd.DataFrame({
        "name_a": pd.Series(a_out, dtype=object),
        "name_b": pd.Series(b_out, dtype=object),
        "dist": pd.Series(dist_out, dtype="int64"),
        "n_parts_a": pd.Series([counts[n] for n in a_out], dtype="int64"),
        "n_parts_b": pd.Series([counts[n] for n in b_out], dtype="int64"),
    })


def edit_distance_pairs(parts_ds, *, name_col: str = "p_name",
                        d: int = EDIT_DIST_MAX):
    """Distinct-name pairs within Levenshtein distance ``d``."""
    names = (
        parts_ds.groupby(name_col).count()
        .map_batches(
            lambda t: t.rename_columns(["name", "n_parts"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )
    variants = names.map_batches(
        lambda df: _emit_variants(df, d), batch_format="pandas"
    )
    pairs = variants.groupby("vhash").map_groups(
        lambda df: _verify_bucket(df, d), batch_format="pandas"
    )
    # the same pair surfaces once per shared variant — final tiny dedupe
    return pairs.groupby(["name_a", "name_b"]).map_groups(
        lambda df: df.iloc[:1], batch_format="pandas"
    )


#: Driver-side union-find over the near-pair edges (the SMALL blocked
#: output, same bound rationale as dedup.near_dup_clusters).
MAX_EDGES = 5_000_000


def entity_clusters(parts_ds, *, name_col: str = "p_name",
                    d: int = EDIT_DIST_MAX, max_edges: int = MAX_EDGES):
    """Entity resolution over names: connected components of the
    edit-distance near-pair graph.  One row per cluster with the
    representative (minimum) name, member-name count, and total part
    count — the record-linkage composition of ``edit_distance_pairs``.

    Scale shape: the pair list is the sparse BLOCKED join output
    (collected under a loud ``max_edges`` guard and union-found
    driver-side, exactly the ``dedup.near_dup_clusters`` contract); the
    label map broadcasts once and the distinct-name table streams
    through assignment + ONE cluster groupby.
    """
    import ray

    try:
        pairs = edit_distance_pairs(parts_ds, name_col=name_col, d=d) \
            .select_columns(["name_a", "name_b"]).take_all(limit=max_edges)
    except ValueError as exc:
        raise ValueError(
            f"entity_clusters saw > {max_edges} near-pair edges; tighten "
            "the distance threshold or deepen the blocking before "
            "collecting the pair graph") from exc
    # union-find with the min-root convention, over string names
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for r in pairs:
        ra, rb = find(r["name_a"]), find(r["name_b"])
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    labels = {x: find(x) for x in list(parent)}
    labels_ref = ray.put(labels)

    names = (
        parts_ds.groupby(name_col).count()
        .map_batches(
            lambda t: t.rename_columns(["name", "n_parts"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )

    def _assign(batch: pa.Table) -> pa.Table:
        table = ray.get(labels_ref)
        roots = [table.get(n, n) for n in batch.column("name").to_pylist()]
        return batch.append_column("cluster_rep",
                                   pa.array(roots, pa.string()))

    def _agg(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cluster_rep": df["cluster_rep"].iloc[:1],
            "n_names": pd.Series([len(df)], dtype="int64"),
            "n_parts": pd.Series([int(df["n_parts"].sum())],
                                 dtype="int64"),
        })

    return (
        names.map_batches(_assign, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("cluster_rep").map_groups(_agg, batch_format="pandas")
    )


register(
    "part_name_entity_clusters",
    lambda sf: entity_clusters(
        _read(sf, "part", ["p_partkey", "p_name"])
        .drop_columns(["p_partkey"])),
    f"""
    WITH RECURSIVE
    d AS (
        SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n_parts
        FROM part GROUP BY 1
    ),
    e AS (
        SELECT a.name AS na, b.name AS nb
        FROM d a JOIN d b ON a.name <> b.name
        WHERE abs(length(a.name) - length(b.name)) <= {EDIT_DIST_MAX}
          AND levenshtein(a.name, b.name) <= {EDIT_DIST_MAX}
    ),
    reach(name, root) AS (
        SELECT name, name FROM d
        UNION
        SELECT e.nb, r.root FROM reach r JOIN e ON e.na = r.name
    ),
    lab AS (SELECT name, min(root) AS root FROM reach GROUP BY 1)
    SELECT lab.root AS cluster_rep,
           CAST(count(*) AS BIGINT) AS n_names,
           CAST(sum(d.n_parts) AS BIGINT) AS n_parts
    FROM lab JOIN d USING (name)
    GROUP BY 1
    """,
)


register(
    "part_name_near_pairs",
    lambda sf: edit_distance_pairs(
        _read(sf, "part", ["p_partkey", "p_name"])
        .drop_columns(["p_partkey"])),
    f"""
    WITH d AS (
        SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n_parts
        FROM part GROUP BY 1
    )
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM d a
    JOIN d b ON a.name < b.name
    WHERE abs(length(a.name) - length(b.name)) <= {EDIT_DIST_MAX}
      AND levenshtein(a.name, b.name) <= {EDIT_DIST_MAX}
    """,
)
