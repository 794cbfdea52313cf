"""Per-component metrics — the NodeMetrics analog.

The reference tracks received/sent events & bytes and errors per
component (shared/src/messages.rs:103-122, ui config.rs:277-293). Here a
zero-CPU Ray actor accumulates per-stage counters; stages report per
batch with fire-and-forget remote calls (no backpressure on the data
path). The snapshot is written into the run's checkpoint/lineage records
(vector_ray.state.checkpoint).
"""

from __future__ import annotations

from collections import defaultdict

import ray


@ray.remote(num_cpus=0, max_restarts=-1)
class MetricsHub:
    """Counters are best-effort observability: if the hub's node dies the
    actor restarts EMPTY (``max_restarts=-1``) and later adds resume —
    jobs must never fail over metrics. Exact row/token accounting lives
    in the checkpoint markers (aggregate partials), not here; use
    ``safe_snapshot`` from job code."""

    def __init__(self):
        self._c: dict[str, dict[str, float]] = defaultdict(
            lambda: {"rows": 0, "bytes": 0, "batches": 0, "errors": 0}
        )

    def add(self, component: str, rows: int, nbytes: int, errors: int = 0) -> None:
        c = self._c[component]
        c["rows"] += rows
        c["bytes"] += nbytes
        c["batches"] += 1
        c["errors"] += errors

    def snapshot(self) -> dict:
        return {k: dict(v) for k, v in self._c.items()}

    def reset(self) -> None:
        self._c.clear()


def safe_snapshot(hub) -> dict:
    """Fetch a hub snapshot without letting a dead/restarting metrics
    actor fail the JOB (metrics are advisory; correctness is in the
    checkpoint markers). Returns {} when the hub is unreachable."""
    try:
        return ray.get(hub.snapshot.remote(), timeout=30)
    except Exception:
        return {}


def instrument(ds, component: str, hub):
    """Append a zero-copy counting pass after a stage's output."""
    if hub is None:
        return ds

    def count(batch):
        hub.add.remote(component, batch.num_rows, batch.nbytes)
        return batch

    return ds.map_batches(count, batch_format="pyarrow", zero_copy_batch=True)


def to_prometheus(snapshot: dict, prefix: str = "vector_ray") -> str:
    """Render a MetricsHub snapshot in the Prometheus text exposition
    format (v0.0.4, public spec) — the pull-endpoint payload an ops
    stack scrapes. Counter semantics match the reference's NodeMetrics
    (received/sent totals per component, messages.rs:103-122):

        vector_ray_rows_total{component="parse"} 16000
        vector_ray_bytes_total{component="parse"} 5242880
        ...

    Pure formatting — no Ray calls; pass ``safe_snapshot(hub)``."""
    names = {
        "rows": ("rows_total", "Rows processed per component"),
        "bytes": ("bytes_total", "Bytes processed per component"),
        "batches": ("batches_total", "Batches processed per component"),
        "errors": ("errors_total", "Errors recorded per component"),
    }
    lines: list[str] = []
    for key, (suffix, help_text) in names.items():
        metric = f"{prefix}_{suffix}"
        lines.append(f"# HELP {metric} {help_text}")
        lines.append(f"# TYPE {metric} counter")
        for component in sorted(snapshot):
            value = snapshot[component].get(key, 0)
            label = (
                component.replace("\\", "\\\\")
                .replace('"', '\\"')
                .replace("\n", "\\n")
            )
            out = int(value) if float(value).is_integer() else value
            lines.append(f'{metric}{{component="{label}"}} {out}')
    return "\n".join(lines) + "\n"
