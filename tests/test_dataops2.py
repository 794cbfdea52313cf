"""Unit tests for schema-inferring JSON flatten and incremental rollup
maintenance (functions/dataops.py) — the edge behaviors the sf0.01
oracles don't isolate: cross-batch type widening, malformed rows,
zero-count key drops, brand-new keys."""

import pyarrow as pa

import ray.data as rd

from vector_ray.functions.dataops import flatten_json, incremental_rollup


def test_flatten_json_type_widening(ray_session):
    # "a" is int in one row and string in another -> widens to string;
    # "b" stays int; "c" appears in only one row -> null elsewhere
    t = pa.table(
        {
            "id": [1, 2, 3],
            "props": [
                '{"a": 1, "b": 2}',
                '{"a": "x", "c": 7}',
                '{"b": 5}',
            ],
        }
    )
    out = flatten_json(
        rd.from_arrow(t).repartition(3), field="props", keep=["id"]
    )
    rows = {r["id"]: r for r in out.take_all()}
    assert rows[1]["a"] == "1" and rows[2]["a"] == "x" and rows[3]["a"] is None
    assert rows[1]["b"] == 2 and rows[3]["b"] == 5
    assert rows[2]["c"] == 7 and rows[1]["c"] is None


def test_flatten_json_malformed_rows(ray_session):
    t = pa.table(
        {"id": [1, 2, 3], "props": ['{"k": 1}', "not json", ""]}
    )
    out = flatten_json(rd.from_arrow(t), field="props", keep=["id"])
    rows = {r["id"]: r for r in out.take_all()}
    assert rows[1]["k"] == 1
    assert rows[2]["k"] is None and rows[3]["k"] is None


def test_incremental_rollup_drop_and_insert(ray_session):
    base = rd.from_arrow(
        pa.table({"k": [1, 2], "sum_v": [10, 20], "n": [2, 1]})
    )
    # key 2 fully deleted (count -> 0); key 3 brand new; key 1 net +5
    deltas = rd.from_arrow(
        pa.table(
            {
                "k": [1, 2, 3, 1],
                "v": [9, 20, 7, 4],
                "sign": [1, -1, 1, -1],
            }
        )
    )
    out = {r["k"]: r for r in incremental_rollup(base, deltas, key="k").take_all()}
    assert set(out) == {1, 3}  # key 2 dropped at count 0
    assert out[1]["sum_v"] == 15 and out[1]["n"] == 2
    assert out[3]["sum_v"] == 7 and out[3]["n"] == 1


def test_incremental_rollup_untouched_keys_pass_through(ray_session):
    base = rd.from_arrow(pa.table({"k": [5], "sum_v": [100], "n": [3]}))
    deltas = rd.from_arrow(pa.table({"k": [9], "v": [1], "sign": [1]}))
    out = {r["k"]: r for r in incremental_rollup(base, deltas, key="k").take_all()}
    assert out[5]["sum_v"] == 100 and out[5]["n"] == 3
    assert out[9]["n"] == 1
