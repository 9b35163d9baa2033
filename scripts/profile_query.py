"""Per-stage profile of any registered query: wall time + Ray Data's
operator-level stats, so a slow query can be attributed to its stage
(encode vs shuffle vs verify) instead of guessed at.

Usage:  python scripts/profile_query.py <query> [sf_dir] [--cpus N]

Prints the query's wall time, row count, and the `Dataset.stats()`
report of the materialized result (operator wall times, block counts,
memory).  Runs `host_speed()` first so the numbers carry their
calibration context (this VM throttles >2x between minutes —
BASELINE.md).
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("query")
    p.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    p.add_argument("--cpus", type=int, default=32)
    ns = p.parse_args()
    name, sf_dir, cpus = ns.query, ns.sf_dir, ns.cpus

    sys.path.insert(0, ".")
    from bench import host_speed

    print("host_speed:", host_speed())

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as entry

    queries = entry.queries()
    if name not in queries:
        print(f"unknown query {name!r}; known: {sorted(queries)}")
        return 2
    t0 = time.time()
    res = queries[name](sf_dir)
    if hasattr(res, "materialize"):
        res = res.materialize()
        n = res.count()
        stats = res.stats()
    else:  # pandas
        n, stats = len(res), "(pandas result — no Ray stats)"
    wall = time.time() - t0
    print(f"\n{name} @ {sf_dir}: {wall:.2f}s, {n} rows\n")
    print(stats)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
