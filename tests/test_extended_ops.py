"""Tests for windows, datadog-search conditions, parse codecs, and the
functional-test harness."""

import pyarrow as pa
import pytest

import ray.data as rd

from vector_ray import run_pipeline
from vector_ray.datadog import compile_datadog
from vector_ray.testing import generate_test_spec, run_functional_test
from vector_ray.vrl import VrlError

EVENTS = [
    {"id": 1, "user": "a", "ts": 10.0, "v": 1.0},
    {"id": 2, "user": "a", "ts": 70.0, "v": 2.0},
    {"id": 3, "user": "a", "ts": 75.0, "v": 3.0},
    {"id": 4, "user": "b", "ts": 80.0, "v": 4.0},
    {"id": 5, "user": "a", "ts": 300.0, "v": 5.0},
]


def test_tumbling_window(ray_session):
    from vector_ray.stages.window import window

    ds = rd.from_items(EVENTS)
    out = window(
        ds,
        {
            "type": "tumbling",
            "size_secs": 60,
            "ts_field": "ts",
            "key_field": "user",
            "aggregates": {"n": {"fn": "count"}, "total": {"fn": "sum", "field": "v"}},
        },
    ).to_pandas()
    got = {(r.user, r.window_start): (r.n, r.total) for r in out.itertuples()}
    assert got[("a", 0.0)] == (1, 1.0)
    assert got[("a", 60.0)] == (2, 5.0)
    assert got[("b", 60.0)] == (1, 4.0)
    assert got[("a", 300.0)] == (1, 5.0)


def test_sliding_window(ray_session):
    from vector_ray.stages.window import window

    ds = rd.from_items(EVENTS[:1])  # ts=10, size 60 slide 30
    out = window(
        ds,
        {
            "type": "sliding",
            "size_secs": 60,
            "slide_secs": 30,
            "ts_field": "ts",
            "aggregates": {"n": {"fn": "count"}},
        },
    ).to_pandas()
    # ts=10 belongs to windows starting at -30 and 0
    assert sorted(out.window_start) == [-30.0, 0.0]
    assert (out.n == 1).all()


def test_session_window(ray_session):
    from vector_ray.stages.window import window

    ds = rd.from_items(EVENTS)
    out = window(
        ds,
        {
            "type": "session",
            "gap_secs": 30,
            "ts_field": "ts",
            "key_field": "user",
            "aggregates": {"n": {"fn": "count"}, "total": {"fn": "sum", "field": "v"}},
        },
    ).to_pandas()
    a = out[out.user == "a"].sort_values("session_start")
    # user a: sessions {10}, {70,75}, {300}
    assert list(a.n) == [1, 2, 1]
    assert list(a.session_start) == [10.0, 70.0, 300.0]
    assert list(a.session_end) == [10.0, 75.0, 300.0]
    b = out[out.user == "b"]
    assert list(b.n) == [1]


DD_TBL = pa.table(
    {
        "service": ["web", "webapp", "db", None],
        "status": ["error", "warn", "ok", "error"],
        "code": [500, 400, 200, 503],
        "message": ["disk ERROR", "slow request", "fine", "boom"],
    }
)


def dd(q):
    return compile_datadog(q)(DD_TBL).to_pylist()


def test_datadog_equality_and_wildcards():
    assert dd("service:web") == [True, False, False, False]
    assert dd("service:web*") == [True, True, False, False]
    assert dd("service:*b") == [True, False, True, False]
    assert dd("service:*eb*") == [True, True, False, False]


def test_datadog_bool_ops():
    assert dd("service:web* AND status:error") == [True, False, False, False]
    assert dd("service:db OR status:error") == [True, False, True, True]
    assert dd("-service:web") == [False, True, True, True]
    assert dd("NOT (service:web OR service:db)") == [False, True, False, True]
    # adjacency = AND
    assert dd("service:web* status:warn") == [False, True, False, False]


def test_datadog_value_groups_and_numeric():
    assert dd("status:(error OR warn)") == [True, True, False, True]
    assert dd("code:>=500") == [True, False, False, True]
    assert dd("code:<500") == [False, True, True, False]


def test_datadog_bare_term_searches_message():
    assert dd("ERROR") == [True, False, False, False]
    assert dd('"slow request"') == [False, True, False, False]


def test_datadog_filter_stage(ray_session):
    spec = {
        "sources": {"in": {"type": "inline", "table": DD_TBL}},
        "transforms": {
            "f": {
                "type": "filter",
                "inputs": ["in"],
                "condition": "service:web* AND code:>=400",
                "condition_type": "datadog_search",
            }
        },
        "sinks": {"out": {"type": "collect", "inputs": ["f"]}},
    }
    res = run_pipeline(spec)
    assert res.sinks["out"].count == 2


def test_datadog_bad_syntax():
    with pytest.raises(VrlError):
        compile_datadog("service:(a OR")


def test_parse_syslog(ray_session):
    rows = [
        {"message": "<13>Feb  5 17:32:18 host-a ingestd[123]: started ok"},
        {"message": "Feb 15 03:02:01 host-b cron: job done"},
    ]
    spec = {
        "sources": {"in": {"type": "inline", "rows": rows}},
        "transforms": {
            "p": {"type": "remap", "inputs": ["in"],
                  "ops": [{"op": "parse_syslog", "field": "message"}]}
        },
        "sinks": {"out": {"type": "collect", "inputs": ["p"]}},
    }
    got = sorted(
        run_pipeline(spec).sinks["out"].table.to_pylist(),
        key=lambda r: r["hostname"],
    )
    assert got[0]["priority"] == 13 and got[0]["procid"] == 123
    assert got[0]["appname"] == "ingestd" and got[0]["body"] == "started ok"
    assert got[1]["priority"] is None and got[1]["appname"] == "cron"


def test_parse_apache_common(ray_session):
    rows = [{"message": '1.2.3.4 - frank [10/Oct/2000:13:55:36 -0700] "GET /x.gif HTTP/1.0" 200 2326'}]
    spec = {
        "sources": {"in": {"type": "inline", "rows": rows}},
        "transforms": {
            "p": {"type": "remap", "inputs": ["in"],
                  "ops": [{"op": "parse_apache_common", "field": "message"}]}
        },
        "sinks": {"out": {"type": "collect", "inputs": ["p"]}},
    }
    r = run_pipeline(spec).sinks["out"].table.to_pylist()[0]
    assert r["client"] == "1.2.3.4" and r["method"] == "GET"
    assert r["status"] == 200 and r["size"] == 2326


def test_generate_test_spec_rewrite():
    # golden rewrite check — mirror of the reference's
    # test_generate_test_config (functional_test.rs:434-462)
    spec = {
        "sources": {"logs": {"type": "demo_logs", "count": 100}},
        "transforms": {"f": {"type": "filter", "inputs": ["logs"],
                             "condition": '.level == "error"'}},
        "sinks": {
            "s1": {"type": "parquet", "inputs": ["f"], "path": "/tmp/x"},
            "s2": {"type": "console", "inputs": ["logs"]},
        },
    }
    rewritten = generate_test_spec(spec, [{"level": "error"}])
    assert rewritten.sources["logs"]["type"] == "inline"
    assert list(rewritten.sinks) == ["__test_output"]
    assert rewritten.sinks["__test_output"]["inputs"] == ["f", "logs"]
    assert rewritten.sinks["__test_output"]["type"] == "collect"


def test_run_functional_test(ray_session):
    spec = {
        "sources": {"logs": {"type": "demo_logs", "count": 100}},
        "transforms": {"f": {"type": "filter", "inputs": ["logs"],
                             "condition": '.level == "error"'}},
        "sinks": {"out": {"type": "parquet", "inputs": ["f"], "path": "/tmp/x"}},
    }
    events = [{"level": "error", "id": 1}, {"level": "info", "id": 2},
              {"level": "error", "id": 3}]
    result = run_functional_test(spec, events)
    assert result["status"] == "completed"
    assert result["input_events"] == 3
    assert result["output_count"] == 2
    assert result["dropped_count"] == 1
    assert {e["id"] for e in result["output_events"]} == {1, 3}
    assert result["duration_ms"] >= 0


def test_functional_test_reports_failure(ray_session):
    spec = {
        "sources": {"logs": {"type": "demo_logs", "count": 10}},
        "transforms": {"f": {"type": "filter", "inputs": ["logs"],
                             "condition": ".level =="}},  # bad VRL
        "sinks": {"out": {"type": "blackhole", "inputs": ["f"]}},
    }
    result = run_functional_test(spec, [{"level": "x"}])
    assert result["status"] == "failed"
    assert result["errors"] and "VrlError" in result["errors"][0]


def test_parse_gelf(ray_session):
    rows = [{"payload": '{"version": "1.1", "host": "h1", "short_message": "boom", "level": 3}'}]
    spec = {
        "sources": {"in": {"type": "inline", "rows": rows}},
        "transforms": {
            "p": {"type": "remap", "inputs": ["in"],
                  "ops": [{"op": "parse_gelf", "field": "payload"}]}
        },
        "sinks": {"out": {"type": "collect", "inputs": ["p"]}},
    }
    r = run_pipeline(spec).sinks["out"].table.to_pylist()[0]
    assert r["host"] == "h1" and r["message"] == "boom" and r["level"] == 3
    assert "short_message" not in r


def test_parse_json_malformed_rows_null(ray_session):
    rows = [{"p": '{"a": 1}'}, {"p": "not json"}, {"p": '["array"]'}, {"p": None}]
    spec = {
        "sources": {"in": {"type": "inline", "rows": rows}},
        "transforms": {"t": {"type": "remap", "inputs": ["in"],
                             "ops": [{"op": "parse_json", "field": "p", "keys": ["a"]}]}},
        "sinks": {"out": {"type": "collect", "inputs": ["t"]}},
    }
    got = run_pipeline(spec).sinks["out"].table.to_pylist()
    assert [r["a"] for r in got] == [1, None, None, None]


def test_datadog_quoted_field_value():
    t = pa.table({"service": ["web server", "web", None]})
    got = compile_datadog('service:"web server"')(t).to_pylist()
    assert got == [True, False, False]


def test_parse_json_heterogeneous_types(ray_session):
    rows = [{"p": '{"k": 1}'}, {"p": '{"k": "x"}'}]
    spec = {
        "sources": {"in": {"type": "inline", "rows": rows}},
        "transforms": {"t": {"type": "remap", "inputs": ["in"],
                             "ops": [{"op": "parse_json", "field": "p",
                                      "keys": ["k"], "types": {"k": "string"}}]}},
        "sinks": {"out": {"type": "collect", "inputs": ["t"]}},
    }
    got = sorted(
        run_pipeline(spec).sinks["out"].table.to_pylist(), key=lambda r: r["k"]
    )
    # declared type makes the schema stable across blocks; conflicting
    # values coerce instead of crashing
    assert [r["k"] for r in got] == ["1", "x"]


def test_moving_window_agg(ray_session):
    """Bounded trailing-window aggregates match a sequential per-key
    reference for every fn, including the first rows' partial windows."""
    import collections

    import numpy as np
    import ray

    from vector_ray.stages.grouped import moving

    rng = np.random.default_rng(9)
    m = 300
    t = pa.table(
        {
            "user_id": rng.integers(0, 5, m),
            "event_id": np.arange(m),
            "ts": pa.array(
                np.sort(rng.integers(0, 10**6, m)).astype("datetime64[us]")
            ),
            "value": np.round(rng.uniform(0, 100, m), 2),
        }
    )
    for fn in ("mean", "sum", "min", "max"):
        out_ds = moving(
            rd.from_arrow(t).repartition(4),
            {
                "group_by": "user_id",
                "order_by": ["ts", "event_id"],
                "field": "value",
                "n": 4,
                "fn": fn,
                "round": 4,
            },
        )
        out = pa.concat_tables(
            [
                x
                for x in ray.get(out_ds.materialize().to_arrow_refs())
                if x.num_rows
            ]
        ).sort_by("event_id")
        rows = sorted(
            zip(
                t["user_id"].to_pylist(),
                t["ts"].to_pylist(),
                t["event_id"].to_pylist(),
                t["value"].to_pylist(),
            )
        )
        hist = collections.defaultdict(list)
        want = {}
        for u, _, eid, v in rows:
            hist[u].append(v)
            w = hist[u][-4:]
            r = {
                "mean": sum(w) / len(w),
                "sum": sum(w),
                "min": min(w),
                "max": max(w),
            }[fn]
            want[eid] = round(round(r, 9), 4)
        got = dict(
            zip(out["event_id"].to_pylist(), out[f"mov_{fn}_value"].to_pylist())
        )
        assert all(abs(got[e] - want[e]) < 1e-9 for e in want), fn
    with pytest.raises(ValueError):
        moving(rd.from_arrow(t), {"group_by": "user_id", "order_by": ["ts"],
                                  "field": "value", "n": 4, "fn": "median"})


def test_moving_window_null_semantics(ray_session):
    """Nulls are ignored like SQL window aggregates: they don't poison
    the cumsum difference, don't count toward the mean divisor, and an
    all-null window yields NULL."""
    import ray

    from vector_ray.stages.grouped import moving

    t = pa.table(
        {
            "k": ["a"] * 6 + ["b"] * 2,
            "i": list(range(6)) + [0, 1],
            "value": pa.array(
                [1.0, None, 3.0, 4.0, 5.0, 6.0, None, None], pa.float64()
            ),
        }
    )
    out_ds = moving(
        rd.from_arrow(t),
        {"group_by": "k", "order_by": ["i"], "field": "value", "n": 3,
         "fn": "mean", "round": 6},
    )
    out = pa.concat_tables(
        [x for x in ray.get(out_ds.materialize().to_arrow_refs()) if x.num_rows]
    ).sort_by([("k", "ascending"), ("i", "ascending")])
    got = out["mov_mean_value"].to_pylist()
    # a: windows [1], [1,N], [1,N,3], [N,3,4], [3,4,5], [4,5,6]
    assert got[:6] == [1.0, 1.0, 2.0, 3.5, 4.0, 5.0]
    # b: all-null windows -> NULL
    assert got[6] is None and got[7] is None
    # min over nulls
    out2_ds = moving(
        rd.from_arrow(t),
        {"group_by": "k", "order_by": ["i"], "field": "value", "n": 3,
         "fn": "min"},
    )
    out2 = pa.concat_tables(
        [x for x in ray.get(out2_ds.materialize().to_arrow_refs()) if x.num_rows]
    ).sort_by([("k", "ascending"), ("i", "ascending")])
    assert out2["mov_min_value"].to_pylist() == [
        1.0, 1.0, 1.0, 3.0, 3.0, 4.0, None, None]


def test_parquet_sink_compression_option(ray_session, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from vector_ray import run_pipeline

    out = str(tmp_path / "zstd_out")
    run_pipeline(
        {
            "sources": {"a": {"type": "demo_logs", "count": 200}},
            "sinks": {
                "o": {
                    "type": "parquet",
                    "inputs": ["a"],
                    "path": out,
                    "compression": "zstd",
                }
            },
        }
    )
    f = glob.glob(out + "/*.parquet")[0]
    md = pq.ParquetFile(f).metadata
    assert md.row_group(0).column(0).compression == "ZSTD"


def test_ewma_recurrence(ray_session):
    """Bucketed step-vectorized EWMA equals the sequential per-key
    recurrence with per-step 9-decimal pinning, across partitionings."""
    import numpy as np
    import ray

    from vector_ray.stages.grouped import ewma

    rng = np.random.default_rng(11)
    m = 400
    t = pa.table(
        {
            "user_id": rng.integers(0, 7, m),
            "event_id": np.arange(m),
            "ts": pa.array(
                np.sort(rng.integers(0, 10**6, m)).astype("datetime64[us]")
            ),
            "value": np.round(rng.uniform(0, 100, m), 2),
        }
    )

    def rnd9(v):
        return float(np.sign(v) * np.floor(abs(v) * 1e9 + 0.5) / 1e9)

    want, last = {}, {}
    for u, _, eid, v in sorted(
        zip(
            t["user_id"].to_pylist(),
            t["ts"].to_pylist(),
            t["event_id"].to_pylist(),
            t["value"].to_pylist(),
        )
    ):
        y = rnd9(v) if u not in last else rnd9(0.3 * v + 0.7 * last[u])
        last[u] = y
        want[eid] = round(round(y, 9), 4)

    for parts in (1, 4):
        out_ds = ewma(
            rd.from_arrow(t).repartition(parts),
            {
                "group_by": "user_id",
                "order_by": ["ts", "event_id"],
                "field": "value",
                "alpha": 0.3,
                "round": 4,
                "num_buckets": 3,
            },
        )
        out = pa.concat_tables(
            [
                x
                for x in ray.get(out_ds.materialize().to_arrow_refs())
                if x.num_rows
            ]
        )
        assert out.num_rows == m
        assert "__bucket" not in out.column_names
        got = dict(
            zip(out["event_id"].to_pylist(), out["ewma_value"].to_pylist())
        )
        assert all(abs(got[e] - want[e]) < 1e-9 for e in want), parts
    with pytest.raises(ValueError):
        ewma(rd.from_arrow(t), {"group_by": "user_id", "order_by": ["ts"],
                                "field": "value", "alpha": 0.0})


def test_ewma_null_poisons_tail(ray_session):
    """A null value yields a null EWMA and poisons the rest of that
    key's sequence — the SQL NULL-arithmetic recurrence semantics."""
    import ray

    from vector_ray.stages.grouped import ewma

    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "ts": pa.array([0, 1, 2, 0, 1], pa.int64()),
            "value": pa.array([10.0, None, 5.0, 4.0, 8.0], pa.float64()),
        }
    )
    out_ds = ewma(
        rd.from_arrow(t),
        {
            "group_by": "user_id",
            "order_by": ["ts", "event_id"],
            "field": "value",
            "alpha": 0.5,
            "round": 4,
        },
    )
    out = pa.concat_tables(
        [
            x
            for x in ray.get(out_ds.materialize().to_arrow_refs())
            if x.num_rows
        ]
    ).sort_by("event_id")
    got = out["ewma_value"].to_pylist()
    assert got[0] == 10.0
    assert got[1] is None and got[2] is None  # null poisons the tail
    assert got[3] == 4.0 and got[4] == 6.0


def test_retention_cohorts(ray_session):
    """Day- and week-unit cohort retention match a brute-force
    reference (week flooring is ISO Monday like date_trunc('week'))."""
    import collections
    import datetime as dt

    import numpy as np
    import ray

    from vector_ray.stages.grouped import retention

    rng = np.random.default_rng(5)
    m = 500
    t = pa.table(
        {
            "user_id": rng.integers(0, 40, m),
            "ts": pa.array(
                (rng.integers(0, 45, m) * 86400_000_000
                 + rng.integers(0, 86400_000_000, m)).astype("datetime64[us]")
            ),
        }
    )

    for unit, span in (("day", 1), ("week", 7)):
        got_ds = retention(
            rd.from_arrow(t).repartition(4),
            {"group_by": "user_id", "ts_field": "ts", "unit": unit},
        )
        got = pa.concat_tables(
            [
                x
                for x in ray.get(got_ds.materialize().to_arrow_refs())
                if x.num_rows
            ]
        )
        first, active = {}, collections.defaultdict(set)
        for u, ts in zip(t["user_id"].to_pylist(), t["ts"].to_pylist()):
            d = (ts - dt.datetime(1970, 1, 1)).days
            if unit == "week":
                d = d - (d + 3) % 7
            first[u] = min(first.get(u, d), d)
        for u, ts in zip(t["user_id"].to_pylist(), t["ts"].to_pylist()):
            d = (ts - dt.datetime(1970, 1, 1)).days
            if unit == "week":
                d = d - (d + 3) % 7
            cohort = dt.date(1970, 1, 1) + dt.timedelta(days=first[u])
            active[(str(cohort), (d - first[u]) // span)].add(u)
        want = {k: len(v) for k, v in active.items()}
        got_map = {
            (c, p): n
            for c, p, n in zip(
                got["cohort"].to_pylist(),
                got["period"].to_pylist(),
                got["n_users"].to_pylist(),
            )
        }
        assert got_map == want, unit
        if unit == "week":
            # week starts are Mondays
            assert all(
                dt.date.fromisoformat(c).weekday() == 0
                for c in got["cohort"].to_pylist()
            )
    with pytest.raises(ValueError):
        retention(rd.from_arrow(t), {"group_by": "user_id", "unit": "month"})


def test_bm25_topk(ray_session):
    """BM25 scores match a brute-force reference; ranking is by rounded
    score desc then doc id; docs without query terms never appear."""
    import math

    import numpy as np

    from vector_ray.functions.text import bm25_topk

    docs = [
        "hash join beats loop join",          # both terms, short
        "sort merge join",                     # one term
        "hash hash hash",                      # repeated term
        "nothing relevant here at all",        # no terms
        "hash join hash join hash join",       # dense in both
    ]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    out = bm25_topk(
        rd.from_arrow(t).repartition(3), ["hash", "join"], k=3
    ).to_pandas()

    def rnd9(v):
        return float(np.sign(v) * np.floor(abs(v) * 1e9 + 0.5) / 1e9)

    split = [d.split(" ") for d in docs]
    n, avgdl = 5, sum(len(s) for s in split) / 5
    want = {}
    for i, s in enumerate(split):
        sc = 0.0
        for term in ("hash", "join"):
            tf = s.count(term)
            if tf == 0:
                continue
            df = sum(term in x for x in split)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            sc += rnd9(idf * ((tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len(s) / avgdl))))
        if sc > 0:
            want[i] = round(round(rnd9(sc), 9), 4)
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert list(out["doc_id"]) == [d for d, _ in top]
    assert all(abs(a - b) < 1e-9 for a, b in zip(out["score"], [s for _, s in top]))
    assert 3 not in set(out["doc_id"])  # no-term doc excluded
    with pytest.raises(ValueError):
        bm25_topk(rd.from_arrow(t), [])


def test_decay_halflife(ray_session):
    """A value one half-life old contributes half its weight; the
    decayed count of k same-aged events is k times one weight."""
    import numpy as np

    from vector_ray.stages.grouped import decay

    ref = "2024-01-08 00:00:00"  # exactly 7 days after the epoch below
    t = pa.table(
        {
            "event_type": pa.array(["a", "a", "b"], pa.string()),
            "ts": pa.array(
                np.array(
                    ["2024-01-08T00:00:00", "2024-01-01T00:00:00",
                     "2024-01-08T00:00:00"],
                    dtype="datetime64[us]",
                )
            ),
            "value": pa.array([10.0, 10.0, 4.0], pa.float64()),
        }
    )
    out = (
        decay(
            rd.from_arrow(t),
            {"group_by": "event_type", "ts_field": "ts", "field": "value",
             "ref_ts": ref, "halflife_s": 7 * 86400, "round": 4},
        )
        .to_pandas()
        .set_index("event_type")
    )
    assert out.loc["a", "decayed_sum"] == 15.0  # 10 + 10/2
    assert out.loc["a", "decayed_n"] == 1.5
    assert out.loc["b", "decayed_sum"] == 4.0
    with pytest.raises(ValueError):
        decay(rd.from_arrow(t), {"group_by": "event_type", "field": "value",
                                 "ref_ts": ref, "halflife_s": 0})


def test_cusum_detects_shift(ray_session):
    """CUSUM stays near zero on in-control data and ramps past the
    threshold after a sustained upward shift; matches the sequential
    recurrence with per-step pinning."""
    import numpy as np
    import ray

    from vector_ray.stages.grouped import cusum

    vals = [10.0] * 5 + [25.0] * 5  # target 10, slack 2 -> drift +13 after shift
    t = pa.table(
        {
            "k": pa.array(["a"] * 10, pa.string()),
            "i": pa.array(range(10), pa.int64()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    out_ds = cusum(
        rd.from_arrow(t).repartition(2),
        {"group_by": "k", "order_by": ["i"], "field": "value",
         "target": 10.0, "slack": 2.0, "threshold": 20.0, "round": 4},
    )
    out = pa.concat_tables(
        [x for x in ray.get(out_ds.materialize().to_arrow_refs()) if x.num_rows]
    ).sort_by("i")
    s, prev = [], 0.0
    for v in vals:
        prev = round(round(max(0.0, prev + ((v - 10.0) - 2.0)), 9), 9)
        s.append(round(round(prev, 9), 4))
    assert out["cusum_value"].to_pylist() == s
    assert out["alert_value"].to_pylist() == [1 if x > 20.0 else 0 for x in s]
    assert out["alert_value"].to_pylist()[:5] == [0] * 5  # in-control: no alert
    assert out["alert_value"].to_pylist()[-3:] == [1, 1, 1]


def test_coalesce_intervals(ray_session):
    """Overlapping and touching spans merge; disjoint spans don't;
    counts track how many raw spans each merged range covers."""
    import ray

    from vector_ray.stages.grouped import coalesce_intervals

    t = pa.table(
        {
            "k": pa.array(["a"] * 4 + ["b"] * 2, pa.string()),
            "s": pa.array([0.0, 5.0, 10.0, 30.0, 1.0, 2.0], pa.float64()),
            "e": pa.array([6.0, 10.0, 12.0, 40.0, 9.0, 3.0], pa.float64()),
        }
    )
    out_ds = coalesce_intervals(
        rd.from_arrow(t).repartition(3),
        {"group_by": "k", "start_field": "s", "end_field": "e"},
    )
    rows = sorted(
        (r["k"], r["span_start"], r["span_end"], r["n_merged"])
        for r in out_ds.take_all()
    )
    # a: [0,6]+[5,10](overlap)+[10,12](touch) -> [0,12]x3; [30,40] alone
    # b: [2,3] nests inside [1,9] -> [1,9]x2
    assert rows == [
        ("a", 0.0, 12.0, 3),
        ("a", 30.0, 40.0, 1),
        ("b", 1.0, 9.0, 2),
    ]


def test_inverted_index_df_band(ray_session):
    """Postings are exact and sorted; min_df/max_df drop whole words,
    never truncate a kept word's postings."""
    from vector_ray.functions.text import inverted_index

    docs = ["x y", "x z", "x y w", "q"]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    full = inverted_index(rd.from_arrow(t).repartition(2)).take_all()
    by_word = {}
    for r in full:
        by_word.setdefault(r["word"], []).append((r["doc_id"], r["df"]))
    assert by_word["x"] == [(0, 3), (1, 3), (2, 3)]
    assert by_word["y"] == [(0, 2), (2, 2)]
    assert by_word["q"] == [(3, 1)]
    banded = inverted_index(
        rd.from_arrow(t), min_df=2, max_df=2
    ).take_all()
    words = {r["word"] for r in banded}
    assert words == {"y"}  # x (df=3) and singletons dropped whole
    assert sorted(r["doc_id"] for r in banded) == [0, 2]


def test_robust_z_outlier_immunity(ray_session):
    """Median/MAD scoring: one huge outlier doesn't shift the scores of
    normal rows (unlike mean/stddev z); an all-constant key gives NULL."""
    import numpy as np

    from vector_ray.stages.grouped import robust_z

    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 1000.0]
    t = pa.table(
        {
            "k": pa.array(["a"] * 6 + ["c"] * 3, pa.string()),
            "event_id": pa.array(range(9), pa.int64()),
            "value": pa.array(vals + [7.0] * 3, pa.float64()),
        }
    )
    out = (
        robust_z(rd.from_arrow(t).repartition(2),
                 {"group_by": "k", "field": "value", "round": 4})
        .to_pandas()
        .sort_values("event_id")
    )
    x = np.array(vals)
    med = np.quantile(x, 0.5)
    mad = np.quantile(np.abs(x - med), 0.5)
    want = np.sign(x - med) * np.floor(np.abs((x - med) / (1.4826 * mad)) * 1e9 + 0.5) / 1e9
    want = np.sign(want) * np.floor(np.abs(want) * 1e4 + 0.5) / 1e4
    got = out[out.k == "a"]["robust_z"].to_numpy()
    assert np.allclose(got, want)
    assert abs(got[2]) < 1.0  # median row stays near zero despite the outlier
    assert out[out.k == "c"]["robust_z"].isna().all()  # MAD=0 -> NULL


def test_cdc_merge_semantics(ray_session):
    """Highest version wins per key, an update beats a same-version base
    row, and a winning delete removes the key entirely."""
    from vector_ray.functions.dataops import cdc_merge

    base = pa.table(
        {
            "k": pa.array([1, 2, 3, 4], pa.int64()),
            "v": pa.array(["a", "b", "c", "d"], pa.string()),
        }
    )
    updates = pa.table(
        {
            "k": pa.array([2, 3, 3, 4], pa.int64()),
            "v": pa.array(["b2", "c2", "c3", "dX"], pa.string()),
            "version": pa.array([1, 1, 2, 0], pa.int64()),
            "op": pa.array(["upsert", "upsert", "delete", "upsert"], pa.string()),
        }
    )
    got = {
        r["k"]: r["v"]
        for r in cdc_merge(
            rd.from_arrow(base).repartition(2), rd.from_arrow(updates), "k"
        ).take_all()
    }
    # k=1 untouched; k=2 upserted; k=3 deleted at v2; k=4: same-version
    # update beats base
    assert got == {1: "a", 2: "b2", 4: "dX"}


def test_cusum_null_resets_like_sql(ray_session):
    """A null value resets the CUSUM score to 0 for that row (DuckDB
    GREATEST(0.0, NULL) = 0.0) and the recurrence continues — no tail
    poisoning."""
    import ray

    from vector_ray.stages.grouped import cusum

    t = pa.table(
        {
            "k": pa.array(["a"] * 4, pa.string()),
            "i": pa.array(range(4), pa.int64()),
            "value": pa.array([20.0, None, 20.0, 20.0], pa.float64()),
        }
    )
    out = pa.concat_tables(
        [
            x
            for x in ray.get(
                cusum(
                    rd.from_arrow(t),
                    {"group_by": "k", "order_by": ["i"], "field": "value",
                     "target": 10.0, "slack": 0.0, "threshold": 100.0},
                ).materialize().to_arrow_refs()
            )
            if x.num_rows
        ]
    ).sort_by("i")
    assert out["cusum_value"].to_pylist() == [10.0, 0.0, 10.0, 20.0]


def test_robust_z_ignores_null_rows(ray_session):
    """Nulls don't poison the key: median/MAD compute over non-null
    values (like quantile_cont) and only the null rows score null."""
    from vector_ray.stages.grouped import robust_z

    t = pa.table(
        {
            "k": pa.array(["a"] * 4, pa.string()),
            "event_id": pa.array(range(4), pa.int64()),
            "value": pa.array([1.0, 2.0, 3.0, None], pa.float64()),
        }
    )
    out = (
        robust_z(rd.from_arrow(t), {"group_by": "k", "field": "value"})
        .to_pandas()
        .sort_values("event_id")
    )
    vals = out["robust_z"].tolist()
    assert vals[0] is not None and abs(vals[1]) < 1e-12 and vals[2] is not None
    assert out["robust_z"].isna().tolist() == [False, False, False, True]


def test_coalesce_intervals_invariants(ray_session):
    """Randomized invariants: merged spans are disjoint and
    non-touching, cover exactly the input union, contain every input
    interval, and n_merged sums to the row count."""
    import numpy as np

    from vector_ray.stages.grouped import coalesce_intervals

    rng = np.random.default_rng(17)
    for trial in range(5):
        m = int(rng.integers(1, 120))
        s = rng.integers(0, 300, m).astype(np.float64)
        e = s + rng.integers(0, 40, m)
        t = pa.table(
            {
                "k": pa.array(rng.integers(0, 3, m)),
                "s": pa.array(s),
                "e": pa.array(e),
            }
        )
        out = coalesce_intervals(
            rd.from_arrow(t).repartition(int(rng.integers(1, 4))),
            {"group_by": "k", "start_field": "s", "end_field": "e"},
        ).to_pandas()
        assert out["n_merged"].sum() == m
        for key, grp in out.groupby("k"):
            spans = sorted(zip(grp["span_start"], grp["span_end"]))
            for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
                assert e1 < s2  # disjoint AND non-touching
            ins = [
                (a, b)
                for kk, a, b in zip(
                    t["k"].to_pylist(), t["s"].to_pylist(), t["e"].to_pylist()
                )
                if kk == key
            ]
            for a, b in ins:  # every input inside exactly one span
                assert sum(1 for s1, e1 in spans if s1 <= a and b <= e1) == 1
            # covered length equals the union of inputs (sweep check)
            pts = sorted(set([p for ab in ins for p in ab]))
            covered = sum(
                p2 - p1
                for p1, p2 in zip(pts, pts[1:])
                if any(a <= p1 and p2 <= b for a, b in ins)
            )
            assert abs(sum(e1 - s1 for s1, e1 in spans) - covered) < 1e-9


def test_transitions_markov_edges(ray_session):
    """Transition counts match a brute-force pairing of each key's
    ordered stream; single-event keys contribute nothing."""
    import collections

    from vector_ray.stages.grouped import transitions

    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "i": pa.array([0, 1, 2, 0, 1, 0], pa.int64()),
            "s": pa.array(["a", "b", "a", "a", "a", "x"], pa.string()),
        }
    )
    got = {
        (r["src"], r["dst"]): r["n"]
        for r in transitions(
            rd.from_arrow(t).repartition(3),
            {"group_by": "k", "order_by": ["i"], "state_field": "s"},
        ).take_all()
    }
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("a", "a"): 1}


def test_group_normalize(ray_session):
    """GRPO-style per-group reward whitening: z = (x-mean)/stddev_samp
    within each key; null rewards score null without poisoning the
    group; <2-row and constant groups score null; partition-invariant."""
    import numpy as np

    from vector_ray.stages.grouped import group_normalize

    t = pa.table(
        {
            "k": pa.array(["a"] * 4 + ["b"] + ["c"] * 3 + ["d"] * 3,
                          pa.string()),
            "event_id": pa.array(range(11), pa.int64()),
            "value": pa.array(
                [1.0, 2.0, 3.0, 4.0,   # a: mean 2.5, std ~1.29
                 9.0,                  # b: single row -> null
                 7.0, 7.0, 7.0,        # c: constant -> null
                 1.0, None, 3.0],      # d: null passes through
                pa.float64(),
            ),
        }
    )
    out = (
        group_normalize(
            rd.from_arrow(t).repartition(3),
            {"group_by": "k", "field": "value", "round": 6,
             "num_buckets": 4},
        )
        .to_pandas()
        .sort_values("event_id")
    )
    z = out["advantage"].tolist()
    std_a = np.std([1, 2, 3, 4], ddof=1)
    exp_a = [(v - 2.5) / std_a for v in [1, 2, 3, 4]]
    assert np.allclose(z[:4], [round(e, 6) for e in exp_a])
    assert np.isnan(z[4]) and all(np.isnan(v) for v in z[5:8])
    # d: two non-null values 1,3 -> mean 2, std sqrt(2)
    assert np.isclose(z[8], round((1 - 2) / np.sqrt(2), 6))
    assert np.isnan(z[9])
    assert np.isclose(z[10], round((3 - 2) / np.sqrt(2), 6))

    one = (
        group_normalize(
            rd.from_arrow(t),
            {"group_by": "k", "field": "value", "round": 6},
        )
        .to_pandas()
        .sort_values("event_id")
    )
    assert np.allclose(
        one["advantage"].fillna(-9).tolist(),
        out["advantage"].fillna(-9).tolist(),
    )


def test_group_normalize_large_magnitude_and_null_keys(ray_session):
    """Two review regressions: (a) the variance must be two-pass stable
    — values 1e8+{0..3} have true sample std ~1.29, which the one-pass
    sum-of-squares form got 26% wrong; (b) null INT keys must form ONE
    group (SQL PARTITION BY), not NaN singletons."""
    import numpy as np

    from vector_ray.stages.grouped import group_normalize

    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 1, None, None, None], pa.int64()),
            "event_id": pa.array(range(7), pa.int64()),
            "value": pa.array(
                [1e8, 1e8 + 1, 1e8 + 2, 1e8 + 3, 10.0, 20.0, 30.0],
                pa.float64(),
            ),
        }
    )
    out = (
        group_normalize(
            rd.from_arrow(t).repartition(3),
            {"group_by": "k", "field": "value", "round": 6},
        )
        .to_pandas()
        .sort_values("event_id")
    )
    z = out["advantage"].tolist()
    std = np.std([0.0, 1.0, 2.0, 3.0], ddof=1)  # shift-invariant truth
    exp = [round((v - 1.5) / std, 6) for v in [0.0, 1.0, 2.0, 3.0]]
    assert np.allclose(z[:4], exp), z[:4]
    # the three null-key rows form one group: mean 20, std 10
    assert np.allclose(z[4:], [-1.0, 0.0, 1.0]), z[4:]


def test_preference_pairs_null_keys_and_nan_scores(ray_session):
    """Null group keys and NaN scores are dropped instead of crashing
    (null int key -> float64 NaN round-trip) or silently winning (NaN
    sorts above everything in SQL)."""
    import numpy as np

    from vector_ray.functions.curation import preference_pairs

    t = pa.table(
        {
            "prompt_id": pa.array([1, 1, 1, None, None], pa.int64()),
            "doc_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
            "score": pa.array(
                [5.0, float("nan"), 1.0, 9.0, 2.0], pa.float64()
            ),
        }
    )
    out = pa.concat_tables(
        [
            b
            for b in [
                __import__("ray").get(r)
                for r in preference_pairs(
                    rd.from_arrow(t).repartition(2), margin=0.0
                ).materialize().to_arrow_refs()
            ]
            if b.num_rows
        ]
    )
    assert out.num_rows == 1
    r = out.to_pylist()[0]
    # NaN row 11 excluded -> pair is (10, 12); null-key rows dropped
    assert (r["chosen_id"], r["rejected_id"]) == (10, 12)


def test_edit_distance_pairs(ray_session):
    """Blocked Levenshtein join: engine distances must equal a
    straight-line per-pair DP reference on an adversarial fixture
    (shared prefixes, equal strings, insert/delete/substitute mixes)."""
    import numpy as np
    import ray.data as rd

    from vector_ray.functions.dedup import edit_distance_pairs

    def ref_lev(a, b):
        dp = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            prev = dp[0]
            dp[0] = i
            for j in range(1, len(b) + 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                            prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return dp[-1]

    texts = [
        "prefix_one alpha beta gamma",
        "prefix_one alpha beta gamma",      # identical -> dist 0
        "prefix_one alpha beta gamm",       # delete
        "prefix_one alpha bXta gamma",      # substitute
        "prefix_one alpha beta gamma!!",    # insert
        "prefix_two entirely different",    # other block
        "prefix_two entirely same-ish",
        "zz",                               # singleton block
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = (
        edit_distance_pairs(
            rd.from_arrow(t), block_prefix=10, max_chars=40, max_dist=40
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if texts[i][:10] == texts[j][:10]:
                want.append((i, j, ref_lev(texts[i][:40], texts[j][:40])))
    got = list(zip(out["a"], out["b"], out["dist"]))
    assert sorted(got) == sorted(want)
    assert got and (0, 1, 0) in got
