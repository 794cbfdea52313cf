"""Graph-family sf1-scale leg (round-4 judge item #6): run PageRank on
a synthetic graph LARGER than the broadcast_limit (4M nodes), so
``mode="auto"`` would pick the bucketed path, and verify the bucketed
result is BYTE-IDENTICAL to the broadcast result on the same graph —
the same cross-mode equality the ppr_events_bucketed oracle pins at
fixture scale, now at the scale the bucketed path exists for.

The graph is deterministic (multiplicative-hash ring): N nodes, E
edges with src = (i*2654435761) % N, dst = (i*40503 + 7) % N —
generated distributed (ray range → map_batches), never on the driver.

Usage: python tools/graph_sf1_leg.py [n_nodes] [n_edges] [iters]
Prints one JSON line with both wall times and the equality verdict.
"""

from __future__ import annotations

import json
import sys
import time
import warnings


def main() -> int:
    warnings.filterwarnings("ignore")
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 25_000_000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import numpy as np
    import pyarrow as pa
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(__import__("os").environ.get("GRAPH_LEG_CPUS", "32")), include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    from vector_ray._compat import register_package_for_workers
    from vector_ray.functions.graph import pagerank

    register_package_for_workers()
    import ray.data as rd

    def edges(batch: pa.Table) -> pa.Table:
        i = np.asarray(batch["id"], dtype=np.uint64)
        srcs = (i * np.uint64(2654435761)) % np.uint64(n_nodes)
        dsts = (i * np.uint64(40503) + np.uint64(7)) % np.uint64(n_nodes)
        return pa.table(
            {
                "src": pa.array(srcs.astype(np.int64)),
                "dst": pa.array(dsts.astype(np.int64)),
            }
        )

    def build():
        return rd.range(n_edges).map_batches(
            edges, batch_format="pyarrow"
        ).materialize()

    es = build()

    t0 = time.perf_counter()
    bucketed = pagerank(es, mode="bucketed", iters=iters)
    bt = bucketed.sort("node").to_arrow_refs()
    b_tbl = pa.concat_tables([ray.get(r) for r in bt])
    t_bucketed = time.perf_counter() - t0

    t0 = time.perf_counter()
    br_tbl = pagerank(es, mode="broadcast", iters=iters)
    t_broadcast = time.perf_counter() - t0

    b_node = np.asarray(b_tbl["node"], dtype=np.int64)
    b_rank = np.asarray(b_tbl["rank"], dtype=np.float64)
    order = np.argsort(np.asarray(br_tbl["node"], dtype=np.int64))
    r_node = np.asarray(br_tbl["node"], dtype=np.int64)[order]
    r_rank = np.asarray(br_tbl["rank"], dtype=np.float64)[order]
    byte_equal = bool(
        len(b_node) == len(r_node)
        and np.array_equal(b_node, r_node)
        and b_rank.tobytes() == r_rank.tobytes()
    )
    print(
        json.dumps(
            {
                "n_nodes": n_nodes,
                "n_edges": n_edges,
                "iters": iters,
                "rows": int(len(b_node)),
                "sec_bucketed": round(t_bucketed, 1),
                "sec_broadcast": round(t_broadcast, 1),
                "byte_equal": byte_equal,
            }
        )
    )
    ray.shutdown()
    return 0 if byte_equal else 1


if __name__ == "__main__":
    raise SystemExit(main())
