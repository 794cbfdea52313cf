"""Functional-test harness — the analog of the reference's Layer-4
functional testing service (vectorize-cli/src/validation/functional_test.rs).

Contract (functional_test.rs:114-197):

1. **Config rewrite** (``generate_test_spec``, mirroring
   ``generate_test_config`` functional_test.rs:221-296): replace the
   named (or first) source with an in-memory injection source carrying
   the sample events (the stdin/json analog), and replace ALL sinks with
   a single collect sink ``__test_output`` wired to every original
   sink's inputs.
2. **Run** the rewritten pipeline; capture output events.
3. **Result** (functional_test.rs:42-87): ``{input_events,
   output_events, output_count, dropped_count = input - output,
   duration_ms, errors, status}``.

Results are kept in a bounded in-memory history (max 100, matching
functional_test.rs:97-109).
"""

from __future__ import annotations

import time
from collections import OrderedDict

import pyarrow as pa

from vector_ray.pipeline import PipelineSpec, run_pipeline

TEST_OUTPUT_SINK = "__test_output"


def generate_test_spec(
    spec, sample_events: list[dict] | pa.Table, source: str | None = None
) -> PipelineSpec:
    """Rewrite a pipeline spec for functional testing (the
    generate_test_config analog)."""
    spec = spec if isinstance(spec, PipelineSpec) else PipelineSpec.from_dict(spec)
    if not spec.sources:
        raise ValueError("pipeline has no sources to replace")
    target = source or next(iter(spec.sources))
    if target not in spec.sources:
        raise ValueError(f"source '{target}' not found")

    sources = dict(spec.sources)
    if isinstance(sample_events, pa.Table):
        sources[target] = {"type": "inline", "table": sample_events}
    else:
        sources[target] = {"type": "inline", "rows": list(sample_events)}

    # every original sink's inputs feed the single test output sink
    sink_inputs: list[str] = []
    for cfg in spec.sinks.values():
        for ref in cfg.get("inputs") or []:
            if ref not in sink_inputs:
                sink_inputs.append(ref)
    sinks = {TEST_OUTPUT_SINK: {"type": "collect", "inputs": sink_inputs}}
    return PipelineSpec(sources=sources, transforms=dict(spec.transforms), sinks=sinks)


class FunctionalTestService:
    """Run functional tests and keep a bounded result history
    (functional_test.rs:97-151)."""

    def __init__(self, max_results: int = 100):
        self.max_results = max_results
        self._results: OrderedDict[str, dict] = OrderedDict()
        self._n = 0

    def run_test(
        self,
        spec,
        sample_events: list[dict] | pa.Table,
        source: str | None = None,
    ) -> dict:
        n_input = (
            sample_events.num_rows
            if isinstance(sample_events, pa.Table)
            else len(sample_events)
        )
        t0 = time.perf_counter()
        errors: list[str] = []
        output_events: list[dict] = []
        status = "completed"
        try:
            test_spec = generate_test_spec(spec, sample_events, source)
            result = run_pipeline(test_spec)
            out = result.sinks[TEST_OUTPUT_SINK]
            output_events = out.table.to_pylist() if out.table is not None else []
        except Exception as e:  # noqa: BLE001 — harness reports, not raises
            status = "failed"
            errors.append(f"{type(e).__name__}: {e}")
        duration_ms = int((time.perf_counter() - t0) * 1000)
        record = {
            "status": status,
            "input_events": n_input,
            "output_events": output_events,
            "output_count": len(output_events),
            "dropped_count": n_input - len(output_events),
            "duration_ms": duration_ms,
            "errors": errors,
        }
        self._n += 1
        test_id = f"test-{self._n:06d}"
        self._results[test_id] = record
        while len(self._results) > self.max_results:
            self._results.popitem(last=False)
        return {"test_id": test_id, **record}

    def get_result(self, test_id: str) -> dict | None:
        return self._results.get(test_id)


def run_functional_test(spec, sample_events, source: str | None = None) -> dict:
    """One-shot convenience wrapper."""
    return FunctionalTestService().run_test(spec, sample_events, source)
