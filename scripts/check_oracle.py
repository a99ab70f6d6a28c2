"""Local stand-in for the driver's correctness gate.

Runs every ``__ray_entry__.queries()`` entry at the given sf_dir, runs the
matching ``oracle_sql()`` in DuckDB with the testdata tables registered as
views, and compares row count, column names, and order-insensitive values
(sorted by all columns).  Usage::

    python scripts/check_oracle.py [sf_dir] [query ...]
    python scripts/check_oracle.py --strict [sf_dir] [query ...]

``--strict`` compares dtype-faithful value reprs (``1234`` vs ``1234.0``,
``-0.0`` vs ``0.0`` are FAILURES) — mirroring the driver's value hash,
which is representation-sensitive where the default numeric compare is
not (round-1 lesson: two queries passed numerically but failed the
driver hash on exactly such repr diffs).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def _repr_col(s: pd.Series) -> pd.Series:
    """Dtype-faithful canonical repr per value (driver-hash stand-in)."""
    if np.issubdtype(s.dtype, np.floating):
        return pd.Series([repr(float(v)) for v in s.to_numpy()])
    if np.issubdtype(s.dtype, np.integer):
        return pd.Series([repr(int(v)) for v in s.to_numpy()])
    return s.fillna("<null>").astype(str)


def compare_strict(name: str, ours: pd.DataFrame, oracle: pd.DataFrame) -> bool:
    if sorted(ours.columns) != sorted(oracle.columns) or len(ours) != len(oracle):
        print("  STRICT FAIL: shape/columns differ")
        return False
    a, b = canon(ours), canon(oracle)
    ok = True
    for c in a.columns:
        av, bv = _repr_col(a[c]), _repr_col(b[c])
        bad = np.where((av != bv).to_numpy())[0]
        if len(bad):
            print(f"  STRICT FAIL col {c} ({a[c].dtype} vs {b[c].dtype}): "
                  f"{len(bad)} repr diffs, first rows {bad[:5].tolist()}")
            for i in bad[:3]:
                print(f"    ours={av.iloc[i]} oracle={bv.iloc[i]}")
            ok = False
    return ok


def compare(name: str, ours: pd.DataFrame, oracle: pd.DataFrame) -> bool:
    ok = True
    if len(ours) != len(oracle):
        print(f"  FAIL rows: ours={len(ours)} oracle={len(oracle)}")
        ok = False
    if sorted(ours.columns) != sorted(oracle.columns):
        print(f"  FAIL cols: ours={sorted(ours.columns)} oracle={sorted(oracle.columns)}")
        return False
    if not ok:
        return False
    a, b = canon(ours), canon(oracle)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating):
            same = np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True)
        else:
            same = (pd.Series(av).fillna("<null>") == pd.Series(bv).fillna("<null>")).all()
        if not same:
            bad = np.where(
                ~(pd.Series(av).fillna("<n>").astype(str) == pd.Series(bv).fillna("<n>").astype(str))
            )[0][:5]
            print(f"  FAIL col {c}: first diffs at rows {bad.tolist()}")
            for i in bad[:3]:
                print(f"    ours={av[i]!r} oracle={bv[i]!r}")
            ok = False
    return ok


def main():
    argv = [a for a in sys.argv[1:] if a != "--strict"]
    strict = "--strict" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    unknown = sorted(only - set(qs))
    if unknown:
        # A typo in a sweep invocation must NOT fake a green run by
        # silently selecting nothing (round-3 verdict item 3).  Checked
        # before ray.init so the failure is instant.
        print(f"ERROR: unknown query name(s): {unknown}")
        sys.exit(2)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        print(f"[{name}]")
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as exc:
            print(f"  ERROR running query: {exc!r}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"  rows-only: {len(ours)} rows, cols={sorted(ours.columns)}")
            continue
        try:
            oracle = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            print(f"  ERROR in oracle SQL: {exc!r}")
            failures.append(name)
            continue
        good = compare(name, ours, oracle)
        if good and strict:
            good = compare_strict(name, ours, oracle)
        if good:
            print(f"  OK ({len(ours)} rows)")
        else:
            failures.append(name)

    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
