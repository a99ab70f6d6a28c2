"""Per-stage profile of any registered query.

Runs one ``__ray_entry__.queries()`` entry and prints Ray Data's
operator-level stats (wall time, CPU time, blocks, rows, memory) so
perf work targets the stage that actually dominates.  Usage::

    python scripts/profile_query.py <query> [sf_dir] [--cpus N]

Dataset results print their ``ds.stats()``; driver-side results
(pandas/Arrow) time the call as a whole.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, log_to_driver=False)

    import ray.data

    import __ray_entry__ as e

    fn = e.queries()[args.query]
    t0 = time.perf_counter()
    out = fn(args.sf_dir)
    if isinstance(out, ray.data.Dataset):
        out = out.materialize()
        wall = time.perf_counter() - t0
        print(out.stats())
        n = out.count()
    else:
        wall = time.perf_counter() - t0
        n = len(out)
    print(f"\n== {args.query}: {n} rows in {wall:.2f}s "
          f"(sf_dir={args.sf_dir}, cpus={args.cpus})")
    ray.shutdown()


if __name__ == "__main__":
    main()
