"""Pipeline taps — the batch analog of the reference's live tap service
(tap/mod.rs: default_limit 10, bounded rate-limited sampling): a tap
attaches to any DAG node, returns a bounded sample, and never alters
node outputs."""

import pytest

from vector_ray import run_pipeline
from vector_ray.validate import ValidationError


def _spec(taps):
    return {
        "sources": {"logs": {"type": "demo_logs", "count": 500,
                             "override_num_blocks": 2}},
        "transforms": {
            "parse": {"type": "remap", "inputs": ["logs"],
                      "ops": [{"op": "parse_kv", "field": "message",
                               "keys": ["level", "status"],
                               "types": {"status": "int"}}]},
            "router": {"type": "route", "inputs": ["parse"],
                       "route": {"err": '.level == "error"'}},
        },
        "sinks": {"all": {"type": "collect", "inputs": ["parse"]}},
        "taps": taps,
    }


def test_tap_default_limit_and_output_unchanged(ray_session):
    res = run_pipeline(_spec({"peek": {"node": "parse"}}))
    assert len(res.taps["peek"]) == 10  # reference default_limit
    assert "level" in res.taps["peek"][0]
    # sink output unchanged by the tap
    assert res.sinks["all"].count == 500


def test_tap_port_and_custom_limit(ray_session):
    res = run_pipeline(
        _spec({"errs": {"node": "router.err", "limit": 3}})
    )
    assert len(res.taps["errs"]) <= 3
    assert all(r["level"] == "error" for r in res.taps["errs"])


def test_tap_validation(ray_session):
    with pytest.raises(ValidationError, match="INVALID_INPUT"):
        run_pipeline(_spec({"bad": {"node": "nope"}}))
    with pytest.raises(ValidationError, match="INVALID_OPTION"):
        run_pipeline(_spec({"big": {"node": "parse", "limit": 10_000}}))
