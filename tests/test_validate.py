"""Table-driven validation tests — mirrors the reference's validator
suite (validation/mod.rs:423-939): missing type, dangling inputs,
warning codes, empty configs, complex multi-branch configs.
"""

import pytest

from vector_ray.pipeline import KNOWN_TYPES, PipelineSpec, build_pipeline
from vector_ray.validate import ValidationError, validate_spec

VALID = {
    "sources": {"in": {"type": "inline", "rows": [{"a": 1}]}},
    "transforms": {"t": {"type": "test_basic", "inputs": ["in"]}},
    "sinks": {"out": {"type": "collect", "inputs": ["t"]}},
}


def test_valid_minimal():
    res = validate_spec(VALID, known_types=KNOWN_TYPES)
    assert res.ok and not res.issues


def test_missing_type():
    spec = {
        "sources": {"in": {"type": "inline", "rows": []}},
        "sinks": {"out": {"inputs": ["in"]}},
    }
    res = validate_spec(spec)
    assert not res.ok
    assert "MISSING_TYPE" in res.codes()


def test_invalid_input_reference():
    spec = {
        "sources": {"in": {"type": "inline", "rows": []}},
        "sinks": {"out": {"type": "collect", "inputs": ["nope"]}},
    }
    res = validate_spec(spec)
    assert "INVALID_INPUT" in res.codes()


def test_sink_not_valid_as_input():
    spec = {
        "sources": {"in": {"type": "inline", "rows": []}},
        "sinks": {
            "a": {"type": "collect", "inputs": ["in"]},
            "b": {"type": "collect", "inputs": ["a"]},
        },
    }
    res = validate_spec(spec)
    assert "INVALID_INPUT" in res.codes()


def test_route_port_reference_is_valid():
    spec = {
        "sources": {"in": {"type": "inline", "rows": []}},
        "transforms": {
            "r": {"type": "route", "inputs": ["in"], "route": {"e": ".x == 1"}}
        },
        "sinks": {"out": {"type": "collect", "inputs": ["r.e"]}},
    }
    res = validate_spec(spec, known_types=KNOWN_TYPES)
    assert res.ok


def test_warnings_no_sources_no_sinks():
    res = validate_spec({})
    assert {"NO_SOURCES", "NO_SINKS"} <= res.codes()
    assert res.ok  # warnings only


def test_warning_missing_inputs():
    spec = {
        "sources": {"in": {"type": "inline", "rows": []}},
        "transforms": {"t": {"type": "test_basic"}},
        "sinks": {"out": {"type": "collect", "inputs": ["t"]}},
    }
    res = validate_spec(spec)
    assert "MISSING_INPUTS" in res.codes()


def test_unknown_type():
    spec = {
        "sources": {"in": {"type": "martian_antenna"}},
        "sinks": {"out": {"type": "collect", "inputs": ["in"]}},
    }
    res = validate_spec(spec, known_types=KNOWN_TYPES)
    assert "UNKNOWN_TYPE" in res.codes()


def test_build_raises_on_invalid():
    with pytest.raises(ValidationError):
        build_pipeline(
            {
                "sources": {"in": {"type": "inline", "rows": []}},
                "sinks": {"out": {"type": "collect", "inputs": ["ghost"]}},
            }
        )


def test_multi_branch_complex_config_validates():
    # analog of validation/mod.rs:857-893 complex config test
    spec = PipelineSpec(
        sources={
            "s1": {"type": "inline", "rows": []},
            "s2": {"type": "inline", "rows": []},
        },
        transforms={
            "parse": {"type": "remap", "inputs": ["s1", "s2"], "ops": []},
            "router": {
                "type": "route",
                "inputs": ["parse"],
                "route": {"a": ".x == 1", "b": ".x == 2"},
            },
            "agg": {
                "type": "aggregate",
                "inputs": ["router.a"],
                "group_by": ["g"],
                "aggregates": {"n": {"fn": "count"}},
            },
        },
        sinks={
            "p1": {"type": "collect", "inputs": ["agg"]},
            "p2": {"type": "collect", "inputs": ["router.b", "router._unmatched"]},
        },
    )
    res = validate_spec(spec.to_dict(), known_types=KNOWN_TYPES)
    assert res.ok
