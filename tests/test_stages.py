"""Per-operator unit tests on tiny in-memory tables (the reference's
unit-test layer, SURVEY.md §5)."""

import pyarrow as pa
import pytest

import ray

from vector_ray import run_pipeline
from vector_ray.sinks import SinkResult


def run_one(transform: dict, rows: list[dict] | pa.Table, ray_session=None) -> SinkResult:
    spec = {
        "sources": {"in": {"type": "inline", **({"table": rows} if isinstance(rows, pa.Table) else {"rows": rows})}},
        "transforms": {"t": {**transform, "inputs": ["in"]}},
        "sinks": {"out": {"type": "collect", "inputs": ["t"]}},
    }
    return run_pipeline(spec).sinks["out"]


EVENTS = [
    {"id": 1, "user": "a", "ts": 0.5, "kind": "click", "v": 1.0},
    {"id": 2, "user": "a", "ts": 1.1, "kind": "click", "v": 2.0},
    {"id": 3, "user": "b", "ts": 1.2, "kind": "view", "v": 3.0},
    {"id": 4, "user": "a", "ts": 1.7, "kind": "click", "v": 4.0},
    {"id": 5, "user": "b", "ts": 2.4, "kind": "view", "v": 5.0},
    {"id": 6, "user": "a", "ts": 2.5, "kind": "buy", "v": 6.0},
]


def test_filter(ray_session):
    out = run_one({"type": "filter", "condition": '.kind == "click"'}, EVENTS)
    assert sorted(r["id"] for r in out.table.to_pylist()) == [1, 2, 4]


def test_remap_set_and_program(ray_session):
    out = run_one(
        {"type": "remap", "source": '.v2 = .v * 2\n.tag = "x"\ndel(.kind)'},
        EVENTS,
    )
    rows = sorted(out.table.to_pylist(), key=lambda r: r["id"])
    assert rows[0]["v2"] == 2.0 and rows[0]["tag"] == "x"
    assert "kind" not in out.table.column_names


def test_remap_parse_regex(ray_session):
    rows = [{"msg": "GET /api/x 200 12ms"}, {"msg": "POST /y 500 99ms"}]
    out = run_one(
        {
            "type": "remap",
            "ops": [
                {
                    "op": "parse_regex",
                    "field": "msg",
                    "pattern": r"(?P<method>\w+) (?P<path>\S+) (?P<code>\d+)",
                    "types": {"code": "int"},
                }
            ],
        },
        rows,
    )
    got = sorted(out.table.to_pylist(), key=lambda r: r["code"])
    assert got[0]["method"] == "GET" and got[1]["code"] == 500


def test_remap_parse_json(ray_session):
    rows = [{"message": '{"a": 1, "b": "x"}'}, {"message": '{"a": 2}'}]
    out = run_one(
        {"type": "remap", "ops": [{"op": "parse_json", "field": "message", "keys": ["a", "b"]}]},
        rows,
    )
    got = sorted(out.table.to_pylist(), key=lambda r: r["a"])
    assert got[0]["a"] == 1 and got[0]["b"] == "x"
    assert got[1]["a"] == 2 and got[1]["b"] is None


def test_route_first_match_wins(ray_session):
    spec = {
        "sources": {"in": {"type": "inline", "rows": EVENTS}},
        "transforms": {
            "r": {
                "type": "route",
                "inputs": ["in"],
                "route": {"clicks": '.kind == "click"', "big": ".v >= 2"},
            }
        },
        "sinks": {
            "clicks": {"type": "collect", "inputs": ["r.clicks"]},
            "big": {"type": "collect", "inputs": ["r.big"]},
            "rest": {"type": "collect", "inputs": ["r._unmatched"]},
        },
    }
    res = run_pipeline(spec)
    assert sorted(r["id"] for r in res.sinks["clicks"].table.to_pylist()) == [1, 2, 4]
    # id 2,4 are clicks (first match) so big only gets non-click v>=2
    assert sorted(r["id"] for r in res.sinks["big"].table.to_pylist()) == [3, 5, 6]
    assert res.sinks["rest"].count == 0


def test_sample_deterministic(ray_session):
    rows = [{"id": i} for i in range(100)]
    out = run_one({"type": "sample", "rate": 10, "key_field": "id"}, rows)
    assert sorted(r["id"] for r in out.table.to_pylist()) == list(range(0, 100, 10))


def test_dedupe(ray_session):
    rows = [
        {"k": "a", "id": 2}, {"k": "a", "id": 1},
        {"k": "b", "id": 3}, {"k": "c", "id": 4}, {"k": "c", "id": 5},
    ]
    out = run_one(
        {"type": "dedupe", "fields": {"match": ["k"]}, "order_by": ["id"]}, rows
    )
    got = sorted(out.table.to_pylist(), key=lambda r: r["k"])
    assert [(r["k"], r["id"]) for r in got] == [("a", 1), ("b", 3), ("c", 4)]


def test_throttle(ray_session):
    out = run_one(
        {
            "type": "throttle",
            "threshold": 1,
            "window_secs": 1.0,
            "key_field": "user",
            "ts_field": "ts",
            "order_by": ["ts", "id"],
        },
        EVENTS,
    )
    # windows: user a → (0:id1) (1:id2) (2:id6); user b → (1:id3) (2:id5)
    assert sorted(r["id"] for r in out.table.to_pylist()) == [1, 2, 3, 5, 6]


def test_reduce(ray_session):
    out = run_one(
        {
            "type": "reduce",
            "group_by": ["user"],
            "merge_strategies": {"v": "sum", "ts": "max", "kind": "first"},
            "order_by": ["id"],
            "count_field": "n",
        },
        EVENTS,
    )
    got = {r["user"]: r for r in out.table.to_pylist()}
    assert got["a"]["v"] == 13.0 and got["a"]["n"] == 4 and got["a"]["kind"] == "click"
    assert got["b"]["ts"] == 2.4 and got["b"]["n"] == 2


def test_aggregate_two_phase(ray_session):
    out = run_one(
        {
            "type": "aggregate",
            "group_by": ["kind"],
            "aggregates": {
                "n": {"fn": "count"},
                "total": {"fn": "sum", "field": "v"},
                "avg": {"fn": "mean", "field": "v"},
                "vmax": {"fn": "max", "field": "v"},
            },
            "round": 4,
        },
        EVENTS,
    )
    got = {r["kind"]: r for r in out.table.to_pylist()}
    assert got["click"]["n"] == 3 and got["click"]["total"] == 7.0
    assert got["click"]["avg"] == pytest.approx(7.0 / 3, abs=1e-4)
    assert got["view"]["vmax"] == 5.0
    assert list(out.table.column_names) == ["kind", "n", "total", "avg", "vmax"]


def test_log_to_metric_and_back(ray_session):
    spec = {
        "sources": {"in": {"type": "inline", "rows": EVENTS}},
        "transforms": {
            "m": {
                "type": "log_to_metric",
                "inputs": ["in"],
                "metrics": [
                    {
                        "type": "counter",
                        "name": "events_total",
                        "namespace": "app",
                        "tags": {"kind": ".kind"},
                    },
                    {
                        "type": "counter",
                        "name": "value_total",
                        "namespace": "app",
                        "field": "v",
                        "increment_by_value": True,
                        "tags": {"kind": ".kind"},
                    },
                ],
            },
            "agg": {
                "type": "aggregate",
                "inputs": ["m"],
                "group_by": ["name", "kind"],
                "aggregates": {"value": {"fn": "sum", "field": "value"}},
            },
            "back": {"type": "metric_to_log", "inputs": ["m"]},
        },
        "sinks": {
            "agg": {"type": "collect", "inputs": ["agg"]},
            "logs": {"type": "collect", "inputs": ["back"]},
        },
    }
    res = run_pipeline(spec)
    agg = {(r["name"], r["kind"]): r["value"] for r in res.sinks["agg"].table.to_pylist()}
    assert agg[("events_total", "click")] == 3.0
    assert agg[("value_total", "view")] == 8.0
    assert "metric_name" in res.sinks["logs"].table.column_names


def test_tag_cardinality_limit(ray_session):
    rows = [{"tag": t, "id": i} for i, t in enumerate(["a"] * 5 + ["b"] * 3 + ["c"] * 1)]
    out = run_one(
        {"type": "tag_cardinality_limit", "fields": ["tag"], "value_limit": 2,
         "limit_exceeded_action": "drop_event"},
        rows,
    )
    assert sorted({r["tag"] for r in out.table.to_pylist()}) == ["a", "b"]
    out2 = run_one(
        {"type": "tag_cardinality_limit", "fields": ["tag"], "value_limit": 2,
         "limit_exceeded_action": "drop_tag"},
        rows,
    )
    assert out2.count == 9
    assert sum(1 for r in out2.table.to_pylist() if r["tag"] is None) == 1


def test_enrich_stage(ray_session):
    lookup = pa.table({"source": ["web", "books"], "grp": ["crawl", "curated"]})
    rows = [{"id": 1, "source": "web"}, {"id": 2, "source": "books"},
            {"id": 3, "source": "unknown"}]
    out = run_one(
        {"type": "enrich", "table": lookup, "key": "source", "concurrency": 1},
        rows,
    )
    got = {r["id"]: r["grp"] for r in out.table.to_pylist()}
    assert got == {1: "crawl", 2: "curated", 3: None}
    out2 = run_one(
        {"type": "enrich", "table": lookup, "key": "source", "on_miss": "drop",
         "concurrency": 1},
        rows,
    )
    assert sorted(r["id"] for r in out2.table.to_pylist()) == [1, 2]


def test_pyscript_udf(ray_session):
    def double(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.set_column(t.column_names.index("v"), "v", pc.multiply(t["v"], 2))

    out = run_one({"type": "pyscript", "fn": double}, EVENTS)
    assert sum(r["v"] for r in out.table.to_pylist()) == 42.0


def test_union_of_sources(ray_session):
    spec = {
        "sources": {
            "s1": {"type": "inline", "rows": [{"x": 1}]},
            "s2": {"type": "inline", "rows": [{"x": 2}]},
        },
        "transforms": {"t": {"type": "test_basic", "inputs": ["s1", "s2"]}},
        "sinks": {"out": {"type": "collect", "inputs": ["t"]}},
    }
    res = run_pipeline(spec)
    assert sorted(r["x"] for r in res.sinks["out"].table.to_pylist()) == [1, 2]


def test_metrics_hub(ray_session):
    from vector_ray.pipeline import PipelineContext
    from vector_ray.state.metrics import MetricsHub

    hub = MetricsHub.remote()
    spec = {
        "sources": {"in": {"type": "inline", "rows": EVENTS}},
        "transforms": {"f": {"type": "filter", "inputs": ["in"],
                             "condition": '.kind == "click"'}},
        "sinks": {"out": {"type": "collect", "inputs": ["f"]}},
    }
    res = run_pipeline(spec, PipelineContext(metrics=hub))
    assert res.metrics["f"]["rows"] == 3


def test_assert_schema_modes(ray_session):
    """Data-contract gate: drop filters violations, label annotates,
    error raises with per-column counts; allowed nulls pass range
    checks while not_null rejects them."""
    import ray
    import ray.data as rd

    from vector_ray.stages.core import assert_schema
    from vector_ray.vrl import VrlError

    t = pa.table(
        {
            "value": pa.array([5.0, -1.0, None, 50.0, 2e9], pa.float64()),
            "event_type": ["click", "click", "view", "weird", "view"],
            "doc_id": ["doc-1", "doc-2", "x-3", "doc-4", "doc-5"],
        }
    )
    spec = {
        "columns": {
            "value": {"min": 0, "max": 1e9},
            "event_type": {"in": ["click", "view"]},
            "doc_id": {"regex": "doc-.*"},
        }
    }

    def collect(ds):
        tables = [
            x for x in ray.get(ds.materialize().to_arrow_refs()) if x.num_rows
        ]
        return pa.concat_tables(tables) if tables else pa.table({})

    assert collect(assert_schema(rd.from_arrow(t), spec))[
        "doc_id"
    ].to_pylist() == ["doc-1"]
    # nulls pass range checks unless not_null is declared
    loose = collect(
        assert_schema(rd.from_arrow(t), {"columns": {"value": {"min": 0}}})
    )
    assert sorted(loose["doc_id"].to_pylist()) == [
        "doc-1", "doc-4", "doc-5", "x-3"]
    strict = collect(
        assert_schema(
            rd.from_arrow(t), {"columns": {"value": {"min": 0, "not_null": True}}}
        )
    )
    assert sorted(strict["doc_id"].to_pylist()) == ["doc-1", "doc-4", "doc-5"]
    labeled = collect(
        assert_schema(rd.from_arrow(t), {**spec, "on_violation": "label"})
    )
    assert labeled.num_rows == 5
    assert labeled["__valid"].to_pylist().count(True) == 1
    with pytest.raises(Exception, match="contract violations"):
        collect(assert_schema(rd.from_arrow(t), {**spec, "on_violation": "error"}))
    with pytest.raises(VrlError):
        assert_schema(rd.from_arrow(t), {"columns": {}, "on_violation": "nope"})
    with pytest.raises(Exception, match="missing"):
        collect(
            assert_schema(rd.from_arrow(t), {"columns": {"nope": {"min": 1}}})
        )


def test_join_spec_transform(ray_session):
    """Two-input join in the spec DAG: the `right` option names an
    upstream node (validated, topo-ordered, fan-out-counted like any
    edge); bucketed hash join runs per bucket."""
    from vector_ray import run_pipeline
    from vector_ray.validate import ValidationError

    res = run_pipeline(
        {
            "sources": {
                "users": {
                    "type": "inline",
                    "rows": [
                        {"uid": 1, "name": "ann"},
                        {"uid": 2, "name": "bo"},
                        {"uid": 3, "name": "cy"},
                    ],
                },
                "orders": {
                    "type": "inline",
                    "rows": [
                        {"uid": 1, "total": 10},
                        {"uid": 1, "total": 5},
                        {"uid": 3, "total": 7},
                        {"uid": 9, "total": 99},
                    ],
                },
            },
            "transforms": {
                "j": {
                    "type": "join",
                    "inputs": ["orders"],
                    "right": "users",
                    "key": "uid",
                    "how": "inner",
                    "num_buckets": 4,
                }
            },
            "sinks": {"out": {"type": "collect", "inputs": ["j"]}},
        }
    )
    t = res.sinks["out"].table
    rows = sorted(
        (r["uid"], r["total"], r["name"]) for r in t.to_pylist()
    )
    assert rows == [(1, 5, "ann"), (1, 10, "ann"), (3, 7, "cy")]

    # dangling right ref -> INVALID_INPUT at validation time
    with pytest.raises(ValidationError) as ei:
        run_pipeline(
            {
                "sources": {"a": {"type": "demo_logs", "count": 5}},
                "transforms": {
                    "j": {"type": "join", "inputs": ["a"],
                          "right": "nope", "key": "x"}
                },
                "sinks": {"s": {"type": "blackhole", "inputs": ["j"]}},
            }
        )
    assert "INVALID_INPUT" in str(ei.value)


def test_asof_join_spec_transform(ray_session):
    from vector_ray import run_pipeline

    res = run_pipeline(
        {
            "sources": {
                "events": {
                    "type": "inline",
                    "rows": [
                        {"host": "a", "ts": 100, "msg": "x"},
                        {"host": "a", "ts": 250, "msg": "y"},
                        {"host": "b", "ts": 50, "msg": "z"},
                    ],
                },
                "configs": {
                    "type": "inline",
                    "rows": [
                        {"host": "a", "ts": 90, "ver": 1},
                        {"host": "a", "ts": 200, "ver": 2},
                        {"host": "b", "ts": 400, "ver": 7},
                    ],
                },
            },
            "transforms": {
                "j": {
                    "type": "asof_join",
                    "inputs": ["events"],
                    "right": "configs",
                    "by": "host",
                    "on": "ts",
                    "num_buckets": 2,
                }
            },
            "sinks": {"out": {"type": "collect", "inputs": ["j"]}},
        }
    )
    rows = sorted(
        (r["host"], r["ts"], r.get("ver"))
        for r in res.sinks["out"].table.to_pylist()
    )
    # backward: event@100 -> ver1(@90), event@250 -> ver2(@200),
    # b@50 has no earlier config -> null
    assert rows == [("a", 100, 1), ("a", 250, 2), ("b", 50, None)]
