"""Pipeline spec → Ray Data DAG compiler and runner.

The spec shape mirrors the reference's ``PipelineConfig`` — three
string-keyed maps ``sources`` / ``transforms`` / ``sinks``, components as
``{"type": ..., **options}`` with transforms/sinks adding ``inputs``
(shared/src/config.rs:12-127). Multi-output routing uses the
``"node.port"`` input syntax — the ``Connection.from_port`` analog
(config.rs:224-231). Multiple ``inputs`` union their streams
(validation/mod.rs:475-490 → ``Dataset.union``).

Compilation is topological; each node becomes one lazy ``Dataset``.
Nodes consumed by more than one downstream edge are materialized once
(pinned blocks in the object store) so the shared prefix is not
re-executed per consumer — for all-Parquet route fan-out at scale,
prefer the single-pass partitioned write in
``vector_ray.pipelines.flagship`` instead (SURVEY.md §7.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from vector_ray.sinks import SINKS, SinkResult
from vector_ray.sources import SOURCES
from vector_ray.stages import TRANSFORMS
from vector_ray.stages.core import route_port
from vector_ray.validate import ValidationError, validate_spec

KNOWN_TYPES = set(SOURCES) | set(TRANSFORMS) | set(SINKS)


@dataclass
class PipelineSpec:
    sources: dict[str, dict] = field(default_factory=dict)
    transforms: dict[str, dict] = field(default_factory=dict)
    sinks: dict[str, dict] = field(default_factory=dict)
    # taps: bounded event sampling of any node, without altering its
    # output — the batch analog of the reference's live tap service
    # (vectorize-cli/src/tap/mod.rs:31-88: default_limit 10,
    # rate-limited). {"tap_name": {"node": "parse"[, "limit": 10]}}
    taps: dict[str, dict] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "PipelineSpec":
        return cls(
            sources=dict(d.get("sources") or {}),
            transforms=dict(d.get("transforms") or {}),
            sinks=dict(d.get("sinks") or {}),
            taps=dict(d.get("taps") or {}),
        )

    def to_dict(self) -> dict:
        d = {
            "sources": self.sources,
            "transforms": self.transforms,
            "sinks": self.sinks,
        }
        if self.taps:
            d["taps"] = self.taps
        return d


@dataclass
class PipelineContext:
    metrics: Any = None  # MetricsHub actor handle or None
    objects: dict[str, Any] = field(default_factory=dict)


@dataclass
class RunResult:
    sinks: dict[str, SinkResult]
    metrics: dict | None = None
    # tap_name -> list of sampled event dicts (bounded by the tap limit)
    taps: dict[str, list] = field(default_factory=dict)


def _as_spec(spec) -> PipelineSpec:
    if isinstance(spec, PipelineSpec):
        return spec
    return PipelineSpec.from_dict(spec)


def _node_refs(cfg: dict) -> list[str]:
    """Every upstream node ref a transform/sink names: its ``inputs``
    plus, for two-input transforms (join), the ``right`` option."""
    refs = list(cfg.get("inputs") or [])
    if cfg.get("right"):
        refs.append(str(cfg["right"]))
    return refs


def _topo_order(spec: PipelineSpec) -> list[str]:
    """Kahn's algorithm over transform nodes (sources have no inputs)."""
    deps: dict[str, set[str]] = {}
    for name, cfg in spec.transforms.items():
        deps[name] = {
            ref.split(".", 1)[0]
            for ref in _node_refs(cfg)
            if ref.split(".", 1)[0] in spec.transforms
        }
    order, ready = [], [n for n, d in deps.items() if not d]
    remaining = {n: set(d) for n, d in deps.items() if d}
    while ready:
        n = ready.pop()
        order.append(n)
        for m in list(remaining):
            remaining[m].discard(n)
            if not remaining[m]:
                ready.append(m)
                del remaining[m]
    if remaining:
        raise ValueError(f"cycle among transforms: {sorted(remaining)}")
    return order


def build_pipeline(spec, ctx: PipelineContext | None = None) -> dict[str, Any]:
    """Compile the spec into {node_name: Dataset}. Lazy — nothing executes
    until a sink consumes."""
    spec = _as_spec(spec)
    ctx = ctx or PipelineContext()
    result = validate_spec(spec.to_dict(), known_types=KNOWN_TYPES)
    if not result.ok:
        raise ValidationError(result)

    # consumer fan-out count per upstream node (materialize shared nodes)
    consumers: dict[str, int] = {}
    for cfg in list(spec.transforms.values()) + list(spec.sinks.values()):
        for ref in _node_refs(cfg):
            consumers[ref.split(".", 1)[0]] = (
                consumers.get(ref.split(".", 1)[0], 0) + 1
            )

    node_ds: dict[str, Any] = {}

    def resolve(ref: str):
        base, _, port = ref.partition(".")
        ds = node_ds[base]
        if port:
            return route_port(ds, port)
        return ds

    def gather(cfg: dict):
        inputs = cfg.get("inputs") or []
        parts = [resolve(r) for r in inputs]
        ds = parts[0]
        if len(parts) > 1:
            ds = ds.union(*parts[1:])
        return ds

    for name, cfg in spec.sources.items():
        ds = SOURCES[cfg["type"]]({k: v for k, v in cfg.items() if k != "type"}, ctx)
        if consumers.get(name, 0) > 1:
            ds = ds.materialize()
        node_ds[name] = ds

    for name in _topo_order(spec):
        cfg = spec.transforms[name]
        options = {k: v for k, v in cfg.items() if k not in ("type", "inputs")}
        if cfg.get("right"):
            # two-input transform (join): the right side is a node ref,
            # resolved here and handed to the stage as a Dataset
            options = dict(options)
            options["_right_ds"] = resolve(str(cfg["right"]))
        ds = TRANSFORMS[cfg["type"]](gather(cfg), options, ctx)
        if ctx.metrics is not None:
            from vector_ray.state.metrics import instrument

            ds = instrument(ds, name, ctx.metrics)
        if consumers.get(name, 0) > 1:
            ds = ds.materialize()
        node_ds[name] = ds

    return node_ds


def run_pipeline(spec, ctx: PipelineContext | None = None) -> RunResult:
    """Build and execute: consume every sink, return per-sink results and
    (when a MetricsHub is attached) the per-component metrics snapshot —
    the functional-test execution contract (inject → run → capture →
    count, reference functional_test.rs:114-197)."""
    import ray

    spec = _as_spec(spec)
    ctx = ctx or PipelineContext()
    node_ds = build_pipeline(spec, ctx)

    sink_results: dict[str, SinkResult] = {}
    for name, cfg in spec.sinks.items():
        inputs = cfg.get("inputs") or []
        parts = []
        for ref in inputs:
            base, _, port = ref.partition(".")
            ds = node_ds[base]
            parts.append(route_port(ds, port) if port else ds)
        ds = parts[0]
        if len(parts) > 1:
            ds = ds.union(*parts[1:])
        options = {k: v for k, v in cfg.items() if k not in ("type", "inputs")}
        sink_results[name] = SINKS[cfg["type"]](ds, options, ctx)

    # taps: bounded deterministic samples of any node's stream, read
    # AFTER the sinks so a tap on a shared (materialized) node reuses
    # pinned blocks; on an unshared node the limit() pushes down into
    # the streaming executor, so only ~limit rows are recomputed. The
    # per-tap cap mirrors the reference's rate-limit posture — a tap is
    # a peek, never a full export (use a sink for that).
    _TAP_MAX = 1000
    taps: dict[str, list] = {}

    def _tap_error(code: str, tname: str, msg: str):
        from vector_ray.validate import Issue, ValidationResult

        res = ValidationResult()
        res.issues.append(
            Issue(severity="error", code=code, message=msg, component=tname)
        )
        return ValidationError(res)

    for tname, tcfg in spec.taps.items():
        ref = str(tcfg.get("node", ""))
        base = ref.split(".", 1)[0]
        if base not in node_ds:
            raise _tap_error(
                "INVALID_INPUT", tname,
                f"tap references non-existent node {base!r}",
            )
        limit = int(tcfg.get("limit", 10))  # tap/mod.rs default_limit
        if not 1 <= limit <= _TAP_MAX:
            raise _tap_error(
                "INVALID_OPTION", tname,
                f"tap limit must be in [1, {_TAP_MAX}] (a tap is a "
                "bounded peek, not an export)",
            )
        port = ref.partition(".")[2]
        ds = node_ds[base]
        if port:
            ds = route_port(ds, port)
        taps[tname] = ds.limit(limit).take_all()

    metrics = None
    if ctx.metrics is not None:
        # stage fns report fire-and-forget; wait for the hub's view to
        # settle before reading. Two phases: first wait (bounded) until
        # every instrumented transform has reported at least once — two
        # consecutive EMPTY snapshots also compare equal, so the
        # stability check alone returns too early when worker sends are
        # still in flight under load (observed flake: KeyError on a
        # component the job definitely ran). A stage whose input was
        # empty never reports (its batch fn never ran) — hence the
        # deadline rather than a hard requirement.
        import time

        from vector_ray.state.metrics import safe_snapshot

        # only transforms upstream of a consumed sink (or tap) ever
        # execute — a dangling transform's batch fn never runs, so
        # waiting for it to report would always stall the full deadline
        roots = [
            ref.split(".", 1)[0]
            for cfg in spec.sinks.values()
            for ref in _node_refs(cfg)
        ] + [
            str(tcfg.get("node", "")).split(".", 1)[0]
            for tcfg in spec.taps.values()
        ]
        expected: set[str] = set()
        frontier = [r for r in roots if r in (spec.transforms or {})]
        while frontier:
            name = frontier.pop()
            if name in expected:
                continue
            expected.add(name)
            frontier.extend(
                ref.split(".", 1)[0]
                for ref in _node_refs(spec.transforms[name])
                if ref.split(".", 1)[0] in spec.transforms
            )
        deadline = time.monotonic() + 3.0
        metrics = safe_snapshot(ctx.metrics)
        while not expected <= set(metrics) and time.monotonic() < deadline:
            time.sleep(0.05)
            metrics = safe_snapshot(ctx.metrics)
        for _ in range(20):
            time.sleep(0.05)
            again = safe_snapshot(ctx.metrics)
            if again == metrics:
                break
            metrics = again
    return RunResult(sinks=sink_results, metrics=metrics, taps=taps)
