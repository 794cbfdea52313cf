"""Native protobuf codec (stages/native_codec.py) and IVF ANN
(functions/similarity.ivf_topk) tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data as rd


def _collect(ds) -> pa.Table:
    tables = [t for t in ray.get(ds.materialize().to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables, promote_options="default") if tables else pa.table({})


# ---------------------------------------------------------------------------
# native codec
# ---------------------------------------------------------------------------


def test_native_log_round_trip():
    from vector_ray.stages.native_codec import compile_parse_native, encode_log_rows

    t = pa.table(
        {
            "event_id": [1, 2, 3],
            "event_type": ["click", None, "view"],
            "value": [1.5, 2.25, None],
            "flag": [True, False, None],
        }
    )
    enc = encode_log_rows(t, keys=["event_type", "value", "flag"]).select(
        ["event_id", "message"]
    )
    dec = compile_parse_native(
        {
            "op": "parse_native",
            "field": "message",
            "keys": ["event_type", "value", "flag"],
            "types": {"event_type": "string", "value": "float", "flag": "bool"},
        }
    )(enc)
    assert dec["__kind"].to_pylist() == ["log"] * 3
    assert dec["event_type"].to_pylist() == ["click", None, "view"]
    assert dec["value"].to_pylist() == [1.5, 2.25, None]
    assert dec["flag"].to_pylist() == [True, False, None]


def test_native_double_bit_exact():
    # protobuf doubles round-trip bit-exactly (unlike decimal JSON)
    from vector_ray.stages.native_codec import compile_parse_native, encode_log_rows

    vals = [0.1, 1 / 3, np.nextafter(1.0, 2.0), -1e-300]
    t = pa.table({"value": pa.array(vals, pa.float64())})
    enc = encode_log_rows(t, keys=["value"]).select(["message"])
    dec = compile_parse_native(
        {"op": "parse_native", "field": "message", "keys": ["value"],
         "types": {"value": "float"}}
    )(enc)
    assert dec["value"].to_pylist() == vals


def test_native_metric_round_trip():
    from vector_ray.stages.native_codec import compile_parse_native, encode_metric_rows

    t = pa.table(
        {
            "name": ["latency", "qps"],
            "kind": ["absolute", "incremental"],
            "value": [1.25, 9.0],
            "host": ["a", "b"],
        }
    )
    enc = encode_metric_rows(t, tag_fields=["host"]).select(["message"])
    dec = compile_parse_native({"op": "parse_native", "field": "message"})(enc)
    assert dec["__kind"].to_pylist() == ["metric", "metric"]
    assert dec["metric_name"].to_pylist() == ["latency", "qps"]
    assert dec["metric_kind"].to_pylist() == ["absolute", "incremental"]
    assert dec["metric_value"].to_pylist() == [1.25, 9.0]


def test_native_wire_format_is_protobuf():
    # independent check against a hand-assembled wire message:
    # Event{log=Log{fields=[Field{key="k", value=Value{string_v="v"}}]}}
    from vector_ray.stages.native_codec import compile_parse_native

    value_msg = b"\x0a\x01v"                      # field 1 (string_v) = "v"
    field_msg = b"\x0a\x01k" + b"\x12" + bytes([len(value_msg)]) + value_msg
    log_msg = b"\x0a" + bytes([len(field_msg)]) + field_msg
    event = b"\x0a" + bytes([len(log_msg)]) + log_msg
    t = pa.table({"message": pa.array([event], pa.binary())})
    dec = compile_parse_native(
        {"op": "parse_native", "field": "message", "keys": ["k"],
         "types": {"k": "string"}}
    )(t)
    assert dec["__kind"].to_pylist() == ["log"]
    assert dec["k"].to_pylist() == ["v"]


def test_native_bad_type_declaration():
    from vector_ray.stages.native_codec import compile_parse_native
    from vector_ray.vrl import VrlError

    with pytest.raises(VrlError, match="parse_native types"):
        compile_parse_native(
            {"op": "parse_native", "field": "m", "keys": ["x"],
             "types": {"x": "decimal"}}
        )


def test_native_with_length_delimited_framing(ray_session):
    # byte-stream representation: many Event messages per payload,
    # length_delimited framing then parse_native — the Vector
    # source-decode pipeline shape (framing -> codec)
    from vector_ray.stages.core import remap
    from vector_ray.stages.framing import frame
    from vector_ray.stages.native_codec import encode_log_rows

    t = pa.table({"event_id": [1, 2, 3, 4], "v": [10, 20, 30, 40]})
    enc = encode_log_rows(t, keys=["event_id", "v"])
    msgs = enc["message"].to_pylist()
    stream = b"".join(len(m).to_bytes(4, "big") + m for m in msgs)
    ds = rd.from_arrow(pa.table({"payload": pa.array([stream], pa.binary())}))
    framed = frame(ds, {"method": "length_delimited", "field": "payload"})
    dec = remap(
        framed,
        {
            "ops": [
                {"op": "parse_native", "field": "payload",
                 "keys": ["event_id", "v"],
                 "types": {"event_id": "int", "v": "int"}}
            ]
        },
    )
    out = _collect(dec)
    assert sorted(out["event_id"].to_pylist()) == [1, 2, 3, 4]
    assert sorted(out["v"].to_pylist()) == [10, 20, 30, 40]


# ---------------------------------------------------------------------------
# IVF ANN
# ---------------------------------------------------------------------------


def test_ivf_full_probe_matches_brute_force(ray_session):
    from vector_ray.functions.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(4)
    mat = rng.standard_normal((200, 16))
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(200)]
    q = mat[13]
    exact = brute_force_topk(rd.from_items(rows), q, k=8).to_pandas()
    ivf = ivf_topk(
        rd.from_items(rows), q, k=8, n_centroids=8, n_probe=8
    ).to_pandas()
    assert ivf.vec_id.tolist() == exact.vec_id.tolist()
    assert ivf.score.tolist() == exact.score.tolist()


def test_ivf_pruned_probe_recall(ray_session):
    # clustered corpus: pruning to the query's own cluster still finds
    # its true neighbors (the IVF contract)
    from vector_ray.functions.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((4, 16)) * 5
    mat = np.vstack([c + rng.standard_normal((50, 16)) * 0.3 for c in centers])
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(len(mat))]
    q = mat[25]  # inside cluster 0
    exact = set(brute_force_topk(rd.from_items(rows), q, k=10).to_pandas().vec_id)
    ivf = set(
        ivf_topk(rd.from_items(rows), q, k=10, n_centroids=4, n_probe=1)
        .to_pandas()
        .vec_id
    )
    recall = len(ivf & exact) / 10
    assert recall >= 0.9, f"IVF recall {recall} too low on clustered corpus"


def test_ivf_centroids_deterministic(ray_session):
    from vector_ray.functions.similarity import train_ivf_centroids

    rng = np.random.default_rng(6)
    mat = rng.standard_normal((100, 8))
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(100)]
    c1 = train_ivf_centroids(rd.from_items(rows), n_centroids=5)
    c2 = train_ivf_centroids(rd.from_items(rows), n_centroids=5)
    assert np.array_equal(c1, c2)
