"""TOML round-trip (config.rs:404-424 analog) and CLI smoke tests."""

import json
import subprocess
import sys

from vector_ray import toml_io
from vector_ray.pipeline import PipelineSpec

SPEC = PipelineSpec(
    sources={"logs": {"type": "demo_logs", "count": 200, "override_num_blocks": 2}},
    transforms={
        "parse": {
            "type": "remap",
            "inputs": ["logs"],
            "ops": [
                {"op": "parse_kv", "field": "message", "keys": ["level", "status"],
                 "types": {"status": "int"}}
            ],
        },
        "router": {
            "type": "route",
            "inputs": ["parse"],
            "route": {"errors": '.level == "error"', "bad": ".status >= 400"},
        },
    },
    sinks={
        "err": {"type": "blackhole", "inputs": ["router.errors"]},
        "rest": {"type": "blackhole", "inputs": ["router._unmatched", "router.bad"]},
    },
)


def test_toml_round_trip():
    text = toml_io.dumps(SPEC)
    back = toml_io.loads(text)
    assert back.to_dict() == SPEC.to_dict()
    # and a second round trip is stable
    assert toml_io.dumps(back) == text


def test_toml_escaping():
    spec = PipelineSpec(
        sources={"s": {"type": "inline", "rows": []}},
        sinks={"o": {"type": "collect", "inputs": ["s"],
                     "note": 'quote " backslash \\ newline \n done'}},
    )
    back = toml_io.loads(toml_io.dumps(spec))
    assert back.sinks["o"]["note"] == 'quote " backslash \\ newline \n done'


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "vector_ray", *args],
        capture_output=True, text=True, cwd="/root/repo",
    )


def test_cli_validate_and_run(tmp_path):
    spec_path = tmp_path / "pipe.toml"
    toml_io.dump(SPEC, str(spec_path))

    v = run_cli("validate", str(spec_path))
    assert v.returncode == 0 and "valid" in v.stdout

    bad = tmp_path / "bad.toml"
    bad.write_text('[sinks.o]\ntype = "collect"\ninputs = ["ghost"]\n')
    v2 = run_cli("validate", str(bad))
    assert v2.returncode == 1 and "INVALID_INPUT" in v2.stdout

    r = run_cli("--num-cpus", "4", "run", str(spec_path))
    assert r.returncode == 0, r.stderr[-500:]
    out = json.loads(r.stdout[r.stdout.index("{"):])
    assert out["err"]["kind"] == "blackhole"
    assert out["err"]["count"] + out["rest"]["count"] == 200


def test_cli_functional_test(tmp_path):
    spec_path = tmp_path / "pipe.toml"
    toml_io.dump(SPEC, str(spec_path))
    events = tmp_path / "events.json"
    events.write_text(json.dumps(
        [{"message": "level=error status=500"},
         {"message": "level=info status=200"}]
    ))
    r = run_cli("--num-cpus", "4", "test", str(spec_path), "--events", str(events))
    assert r.returncode == 0, r.stderr[-500:]
    result = json.loads(r.stdout[r.stdout.index("{"):])
    assert result["input_events"] == 2
    # both events match some route (errors / bad / _unmatched all sink)
    assert result["output_count"] == 2
