"""Sink-side encoding codecs (stages/encode.py) + csv/json sinks."""

from __future__ import annotations

import glob
import json

import pyarrow as pa
import pytest

import ray
import ray.data as rd


def _collect(ds) -> pa.Table:
    tables = [t for t in ray.get(ds.materialize().to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables, promote_options="default") if tables else pa.table({})


@pytest.fixture
def events_tbl():
    return pa.table(
        {
            "event_id": [1, 2, 3],
            "event_type": ["click", "view", None],
            "value": [1.5, 2.0, 3.25],
        }
    )


def test_encode_json_round_trip(ray_session, events_tbl):
    from vector_ray.stages.core import remap
    from vector_ray.stages.encode import encode

    ds = rd.from_arrow(events_tbl)
    enc = encode(ds, {"codec": "json", "fields": ["event_type", "value"]})
    lines = _collect(enc)["message"].to_pylist()
    assert all(json.loads(ln)["value"] in (1.5, 2.0, 3.25) for ln in lines)
    # decode twin
    dec = remap(
        enc.map_batches(lambda t: t.select(["event_id", "message"]), batch_format="pyarrow"),
        {"ops": [{"op": "parse_json", "field": "message",
                  "keys": ["event_type", "value"],
                  "types": {"event_type": "string", "value": "float"}}]},
    )
    out = _collect(dec).sort_by("event_id")
    assert out["event_type"].to_pylist() == ["click", "view", None]
    assert out["value"].to_pylist() == [1.5, 2.0, 3.25]


def test_encode_logfmt(events_tbl):
    from vector_ray.stages.encode import compile_encode

    out = compile_encode({"codec": "logfmt", "fields": ["event_type", "value"]})(
        events_tbl
    )
    lines = out["message"].to_pylist()
    assert lines[0] == "event_type=click value=1.5"
    assert lines[2] == "event_type=null value=3.25"


def test_encode_native_json_round_trip(ray_session, events_tbl):
    from vector_ray.stages.core import remap
    from vector_ray.stages.encode import encode

    ds = rd.from_arrow(events_tbl)
    enc = encode(ds, {"codec": "native_json", "fields": ["event_type", "value"]})
    dec = remap(
        enc.map_batches(lambda t: t.select(["event_id", "message"]), batch_format="pyarrow"),
        {"ops": [{"op": "parse_native_json", "field": "message",
                  "keys": ["event_type", "value"],
                  "types": {"event_type": "string", "value": "float"}}]},
    )
    out = _collect(dec).sort_by("event_id")
    assert out["__kind"].to_pylist() == ["log"] * 3
    assert out["value"].to_pylist() == [1.5, 2.0, 3.25]


def test_encode_native_round_trip(ray_session, events_tbl):
    from vector_ray.stages.core import remap
    from vector_ray.stages.encode import encode

    ds = rd.from_arrow(events_tbl)
    enc = encode(ds, {"codec": "native", "fields": ["event_type", "value"]})
    dec = remap(
        enc.map_batches(lambda t: t.select(["event_id", "message"]), batch_format="pyarrow"),
        {"ops": [{"op": "parse_native", "field": "message",
                  "keys": ["event_type", "value"],
                  "types": {"event_type": "string", "value": "float"}}]},
    )
    out = _collect(dec).sort_by("event_id")
    assert out["event_type"].to_pylist() == ["click", "view", None]
    assert out["value"].to_pylist() == [1.5, 2.0, 3.25]


def test_encode_text_and_unknown_codec(events_tbl):
    from vector_ray.stages.encode import compile_encode
    from vector_ray.vrl import VrlError

    out = compile_encode({"codec": "text", "field": "event_type"})(events_tbl)
    assert out["message"].to_pylist() == ["click", "view", None]
    with pytest.raises(VrlError, match="unknown encode codec"):
        compile_encode({"codec": "avro"})


def test_csv_json_sinks(ray_session, events_tbl, tmp_path):
    from vector_ray.sinks import SINKS

    ds = rd.from_arrow(events_tbl)
    r1 = SINKS["csv"](ds, {"path": str(tmp_path / "c")})
    r2 = SINKS["json"](rd.from_arrow(events_tbl), {"path": str(tmp_path / "j")})
    assert r1.kind == "csv" and glob.glob(f"{tmp_path}/c/*")
    files = glob.glob(f"{tmp_path}/j/*")
    assert files
    rows = [json.loads(ln) for f in files for ln in open(f) if ln.strip()]
    assert {r["event_id"] for r in rows} == {1, 2, 3}


def test_encode_registered_in_transforms():
    from vector_ray.stages import TRANSFORMS

    assert "encode" in TRANSFORMS
