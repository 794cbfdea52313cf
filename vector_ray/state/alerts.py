"""Alert threshold evaluation over aggregated job metrics — the
reference's alert-condition model (vectorize-cli/src/alerts/mod.rs:56-79:
``HighLatency{threshold_ms}``, ``LowThroughput{min_events_per_minute}``,
``GroupDegraded{unhealthy_percentage}``) re-expressed over the
MetricsHub / flagship-summary numbers this engine actually produces.

Pure driver-side predicate checks over ALREADY-AGGREGATED numbers (the
reference evaluates them over fleet-rollup metrics the same way,
api/health.rs:281-330) — no data-plane cost at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Alert:
    """One fired alert: which rule, which component, observed vs bound."""

    rule: str
    component: str
    observed: float
    threshold: float

    def __str__(self) -> str:  # the reference renders alerts as one line
        return (
            f"ALERT {self.rule} [{self.component}]: "
            f"observed {self.observed:g} vs threshold {self.threshold:g}"
        )


def evaluate_alerts(
    snapshot: dict,
    *,
    elapsed_s: float,
    min_events_per_minute: float | None = None,
    max_latency_s: float | None = None,
    max_error_pct: float | None = None,
) -> list[Alert]:
    """Evaluate the three reference alert conditions against a
    MetricsHub ``snapshot()`` (per-component ``rows/bytes/batches/
    errors`` counters) plus the job wall time.

    - ``LowThroughput``: per-component rows/minute below the floor
      (alerts/mod.rs:66 ``min_events_per_minute``).
    - ``HighLatency``: whole-job wall seconds above the bound — batch
      analog of per-event latency (alerts/mod.rs:61 ``threshold_ms``).
    - ``GroupDegraded``: per-component error batches as a percentage of
      all batches above the bound (alerts/mod.rs:71
      ``unhealthy_percentage``; errors stand in for unhealthy members).
    """
    fired: list[Alert] = []
    minutes = max(elapsed_s, 1e-9) / 60.0
    for component, c in sorted(snapshot.items()):
        if min_events_per_minute is not None:
            epm = c.get("rows", 0) / minutes
            if epm < min_events_per_minute:
                fired.append(
                    Alert("LowThroughput", component, epm, min_events_per_minute)
                )
        if max_error_pct is not None:
            batches = max(c.get("batches", 0), 1)
            pct = 100.0 * c.get("errors", 0) / batches
            if pct > max_error_pct:
                fired.append(
                    Alert("GroupDegraded", component, pct, max_error_pct)
                )
    if max_latency_s is not None and elapsed_s > max_latency_s:
        fired.append(Alert("HighLatency", "__job__", elapsed_s, max_latency_s))
    return fired
