"""Profile one registered query: execute it and print Ray Data's
per-operator stats (wall time, blocks, rows, memory) so hotspots are
measured rather than guessed.

Usage: python tools/profile_query.py <query> [sf_dir]

The driver pattern mirrors tools/check_oracles.py: this script owns the
Ray session (library code never calls ray.init)."""

from __future__ import annotations

import os
import sys
import time
import warnings

# runnable from anywhere; workers import vector_ray via the driver cwd
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    warnings.filterwarnings("ignore")
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from vector_ray.entry_queries import QUERIES

    if name not in QUERIES:
        print(f"unknown query {name!r}; known: {', '.join(sorted(QUERIES))}")
        return 2

    t0 = time.perf_counter()
    result = QUERIES[name](sf_dir)
    if hasattr(result, "materialize"):  # ray Dataset
        result = result.materialize()
        rows = result.count()
        stats = result.stats()
    else:  # pandas / pyarrow
        rows = len(result)
        stats = "(driver-side result; no dataset stats)"
    wall = time.perf_counter() - t0
    print(f"query={name} sf_dir={sf_dir} rows={rows} wall={wall:.3f}s")
    print(stats)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
