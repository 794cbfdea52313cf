"""Engine-side timing sweep: run every registry query at an sf dir and
print per-query wall time (slowest first) — the profiler that found
the round-5 graph-family Dataset-overhead problem, kept as a tool.

Usage: python tools/time_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import warnings


def main() -> int:
    warnings.filterwarnings("ignore")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=32, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    from vector_ray._compat import register_package_for_workers
    from vector_ray.entry_queries import QUERIES

    register_package_for_workers()
    rows: list[tuple[float, str, int | str]] = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            r = fn(sf_dir)
            n = r.count() if hasattr(r, "count") else len(r)
        except Exception as e:
            rows.append((time.perf_counter() - t0, name, f"ERR {type(e).__name__}"))
            continue
        rows.append((time.perf_counter() - t0, name, n))
        print(f"{rows[-1][0]:8.2f}s  {name}", flush=True)
    print("\n=== slowest first ===")
    for secs, name, n in sorted(rows, reverse=True):
        print(f"{secs:8.2f}s  {name:40s} {n}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
